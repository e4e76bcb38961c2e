"""Blocked Fellegi-Sunter record linkage."""

import math

import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.linkage import fellegi_sunter_link

COMPS = [
    {"name": "nm", "col": "name", "m": 0.9, "u": 0.01},
    {"name": "bal", "col": "bal", "m": 0.95, "u": 0.05,
     "agree": lambda x, y: F.abs(x - y) <= 0.5},
]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "rec_id long, name string, bal double, blk long")


def test_weights_match_loglikelihood_closed_form(spark):
    a = _df(spark, [(1, "alice", 10.0, 0)])
    b = _df(spark, [(1, "alice", 10.2, 0), (2, "bob", 99.0, 0)])
    got = {r["b_id"]: r for r in
           fellegi_sunter_link(a, b, ["blk"], COMPS).collect()}
    w_match = math.log2(0.9 / 0.01) + math.log2(0.95 / 0.05)
    w_miss = math.log2((1 - 0.9) / (1 - 0.01)) \
        + math.log2((1 - 0.95) / (1 - 0.05))
    assert got[1]["weight"] == pytest.approx(w_match, abs=1e-6)
    assert got[1]["nm_agree"] and got[1]["bal_agree"]
    assert got[2]["weight"] == pytest.approx(w_miss, abs=1e-6)
    assert not got[2]["nm_agree"] and not got[2]["bal_agree"]


def test_blocking_prunes_cross_block_pairs(spark):
    a = _df(spark, [(1, "alice", 10.0, 0)])
    b = _df(spark, [(9, "alice", 10.0, 7)])  # same fields, other block
    assert fellegi_sunter_link(a, b, ["blk"], COMPS).collect() == []


def test_min_weight_filters(spark):
    a = _df(spark, [(1, "alice", 10.0, 0)])
    b = _df(spark, [(1, "alice", 10.0, 0), (2, "zz", 0.0, 0)])
    got = fellegi_sunter_link(a, b, ["blk"], COMPS,
                              min_weight=5.0).collect()
    assert [r["b_id"] for r in got] == [1]


def test_rejects_degenerate_parameters(spark):
    a = _df(spark, [(1, "alice", 10.0, 0)])
    bad = [{"name": "nm", "col": "name", "m": 0.5, "u": 0.5}]
    with pytest.raises(ValueError):
        fellegi_sunter_link(a, a, ["blk"], bad)


def test_null_blocking_key_pairs_null_with_null(spark):
    # eqNullSafe: NULL blocks pair together (documented), not with 0
    a = _df(spark, [(1, "alice", 10.0, None)])
    b = _df(spark, [(2, "alice", 10.0, None), (3, "alice", 10.0, 0)])
    got = fellegi_sunter_link(a, b, ["blk"], COMPS).collect()
    assert [r["b_id"] for r in got] == [2]
