"""search_as_you_type analog: the shingle subfield must boost adjacency."""

from __future__ import annotations

from pyspark.sql import functions as F

from connectors_spark.operators.sayt import shingle_rows, subfield_weights


def test_shingle_rows_adjacent_pairs(spark):
    df = spark.createDataFrame(
        [(0, "big batch window"), (1, "big"), (2, "")], ["doc_id", "text"])
    got = {(r.doc_id, r.shingle) for r in shingle_rows(df).collect()}
    assert got == {(0, "big batch"), (0, "batch window")}


def test_adjacency_outranks_scattered(spark):
    # d0 has the query terms ADJACENT, d1 has them scattered; both docs
    # contain each term exactly once with equal doc length.
    docs = spark.createDataFrame(
        [(0, "big batch sort merge line"),
         (1, "big sort batch merge line"),
         (2, "sort merge line key table")],
        ["doc_id", "text"])
    clauses = spark.createDataFrame(
        [("q", "big batch", False)],
        "query_id string, part string, is_prefix boolean")
    w = {r.doc_id: r.w
         for r in subfield_weights(shingle_rows(docs), clauses).collect()}
    assert 0 in w and w[0] > 0
    assert 1 not in w and 2 not in w  # only the adjacent doc gets the boost


def test_shingle_prefix_expansion(spark):
    docs = spark.createDataFrame(
        [(0, "window merge scan"), (1, "window merge sort"),
         (2, "merge scan window")],
        ["doc_id", "text"])
    clauses = spark.createDataFrame(
        [("q", "merge sc", True)],
        "query_id string, part string, is_prefix boolean")
    got = sorted(r.doc_id for r in
                 subfield_weights(shingle_rows(docs), clauses).collect())
    assert got == [0, 2]  # "merge scan" matches the prefix, "merge sort" not


def test_subfield_stats_are_per_field(spark):
    # idf of a shingle present in 1 of 2 shingle-bearing docs must use
    # n=2 (docs WITH the subfield), not the corpus size 3.
    docs = spark.createDataFrame(
        [(0, "big batch"), (1, "sort merge"), (2, "key")],
        ["doc_id", "text"])
    clauses = spark.createDataFrame(
        [("q", "big batch", False)],
        "query_id string, part string, is_prefix boolean")
    import math
    w = subfield_weights(shingle_rows(docs), clauses).collect()
    assert len(w) == 1
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))  # n=2, df=1
    tfn = 1 / (1 + 1.2 * (1 - 0.75 + 0.75 * 1 / 1.0))  # tf=1, dl=avgdl=1
    assert abs(w[0].w - idf * tfn) < 1e-9
