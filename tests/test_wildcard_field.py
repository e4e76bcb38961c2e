"""ES wildcard-field analog: gram pruning must never change semantics.

Equality oracle is Python fnmatch (glob semantics, no char classes used)
on lowercase values; pruning is pinned by counting candidate ids from
the posting intersection directly.
"""

from __future__ import annotations

import fnmatch
import random

import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.wildcard_field import (
    build_gram_postings,
    glob_to_like,
    required_grams,
    wildcard_field_match,
)

VOCAB = ["window", "merge", "batch", "customer", "vector", "stream",
         "key", "agg", "sort", "query", "scan"]

PATTERNS = ["*window*merge*", "*cust?mer*", "key*", "*agg", "*qu??y*",
            "*vector*", "window*", "*sort*scan*", "*zzz*", "*"]


def _corpus():
    rng = random.Random(7)
    return [(i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 12))))
            for i in range(80)]


def test_required_grams():
    assert required_grams("*window*") == ["dow", "ind", "ndo", "win"]
    assert required_grams("*cust?mer*") == ["cus", "mer", "ust"]
    assert required_grams("*qu??y*") == []          # runs all < 3
    assert required_grams("*") == []
    assert required_grams("AbCd*") == ["abc", "bcd"]  # lowercased


def test_glob_to_like_escapes():
    assert glob_to_like("a*b?c") == "a%b_c"
    assert glob_to_like("100%_done") == "100\\%\\_done"


@pytest.mark.parametrize("pattern", PATTERNS)
def test_matches_fnmatch_oracle(spark, pattern):
    rows = _corpus()
    df = spark.createDataFrame(rows, ["id", "val"])
    got = sorted(r.id for r in
                 wildcard_field_match(df, "val", "id", pattern).collect())
    want = sorted(i for i, v in rows
                  if fnmatch.fnmatchcase(v.lower(), pattern.lower()))
    assert got == want, pattern


def test_prebuilt_postings_prune_candidates(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, ["id", "val"])
    postings = build_gram_postings(df, "val", "id")
    grams = required_grams("*window*merge*")
    cands = (postings.where(F.col("gram").isin(grams))
             .groupBy("_wid").agg(F.countDistinct("gram").alias("n"))
             .where(F.col("n") == len(grams)))
    n_cands, n_total = cands.count(), len(rows)
    assert 0 < n_cands < n_total  # pruning actually prunes
    # and the pruned path returns the same ids as the fallback scan
    via_idx = sorted(r.id for r in wildcard_field_match(
        df, "val", "id", "*window*merge*", postings=postings).collect())
    want = sorted(i for i, v in rows
                  if fnmatch.fnmatchcase(v, "*window*merge*"))
    assert via_idx == want
