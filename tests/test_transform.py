"""Continuous pivot transform: tick protocol semantics and plan."""

import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.transform import pivot_full, transform_tick

AGGS = lambda: [F.count(F.lit(1)).alias("n"),  # noqa: E731
                F.round(F.sum("v"), 3).alias("total")]


@pytest.fixture()
def source(spark):
    rows = [("u1", 1, 1.0), ("u1", 2, 2.0), ("u2", 1, 5.0),
            ("u3", 3, 7.0)]
    return spark.createDataFrame(rows, "k string, sync int, v double")


def _as_map(df):
    return {r.k: (r.n, r.total) for r in df.collect()}


def test_bootstrap_equals_full_pivot(spark, source):
    dest, ckpt = transform_tick(source, None, ["k"], AGGS(), "sync", None)
    assert _as_map(dest) == _as_map(pivot_full(source, ["k"], AGGS()))
    assert ckpt.collect()[0]["checkpoint"] == 3


def test_incremental_tick_matches_batch(spark, source):
    early = source.filter(F.col("sync") <= 1)
    dest1, c1 = transform_tick(early, None, ["k"], AGGS(), "sync", None)
    ck = c1.collect()[0]["checkpoint"]
    dest2, _ = transform_tick(source, dest1, ["k"], AGGS(), "sync", ck)
    assert _as_map(dest2) == _as_map(pivot_full(source, ["k"], AGGS()))


def test_noop_tick_passes_dest_through(spark, source):
    dest1, c1 = transform_tick(source, None, ["k"], AGGS(), "sync", None)
    ck = c1.collect()[0]["checkpoint"]
    dest2, _ = transform_tick(source, dest1, ["k"], AGGS(), "sync", ck)
    assert _as_map(dest2) == _as_map(dest1)


def test_unchanged_entities_not_recomputed(spark, source):
    # u2 has no rows past the checkpoint: its dest row must come from
    # prev_dest (left_anti branch), not a recompute — pin via a marker
    dest1, c1 = transform_tick(
        source.filter(F.col("sync") <= 1), None, ["k"], AGGS(), "sync",
        None)
    marked = dest1.withColumn(
        "total", F.when(F.col("k") == "u2", F.lit(-99.0))
        .otherwise(F.col("total")))
    ck = c1.collect()[0]["checkpoint"]
    dest2, _ = transform_tick(source, marked, ["k"], AGGS(), "sync", ck)
    got = _as_map(dest2)
    assert got["u2"] == (1, -99.0)      # passed through untouched
    assert got["u1"] == (2, 3.0)        # dirty: recomputed in full
    assert got["u3"] == (1, 7.0)


def test_dirty_semi_join_is_broadcast(spark, source):
    dest1, c1 = transform_tick(source, None, ["k"], AGGS(), "sync", None)
    dest2, _ = transform_tick(source, dest1, ["k"], AGGS(), "sync", 1)
    plan = dest2._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
