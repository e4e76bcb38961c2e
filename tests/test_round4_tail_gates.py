"""Semantics pins for the round-4 tail gates (beyond the DuckDB hash)."""

from __future__ import annotations

from connectors_spark.entry_queries import (
    _CTX_BUDGET,
    _MGET_IDS,
    q_context_budget_truncate,
    q_fingerprint_analyzer,
    q_mget_docs,
)

SF = "/root/testdata/sf0.001"


def test_truncation_keeps_system_and_fits_budget(spark):
    rows = q_context_budget_truncate(spark, SF).collect()
    by_conv: dict = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    assert by_conv
    for turns in by_conv.values():
        turns.sort(key=lambda r: r.turn_idx)
        # every system turn is pinned
        assert all(r.keep == 1 for r in turns if r.role == "system")
        non_sys = [r for r in turns if r.role != "system"]
        kept = [r for r in non_sys if r.keep == 1]
        # kept non-system turns form a SUFFIX and fit the budget
        if kept:
            cut = min(r.turn_idx for r in kept)
            assert all(r.keep == 1 for r in non_sys if r.turn_idx >= cut)
            assert sum(r.n_tok for r in kept) <= _CTX_BUDGET
        # greedy-maximal: adding the next-older dropped turn overflows
        dropped = [r for r in non_sys if r.keep == 0]
        if dropped:
            nxt = max(dropped, key=lambda r: r.turn_idx)
            assert sum(r.n_tok for r in kept) + nxt.n_tok > _CTX_BUDGET


def test_mget_preserves_request_order_and_flags_missing(spark):
    rows = {r.req_id: r for r in q_mget_docs(spark, SF).collect()}
    assert len(rows) == len(_MGET_IDS)
    for i, d in enumerate(_MGET_IDS):
        assert rows[i].doc_id == d
        if d >= 100000:  # absent at every SF in testdata
            assert rows[i].found == 0 and rows[i].n_chars is None
    assert any(r.found == 1 for r in rows.values())


def test_fingerprint_is_order_and_multiplicity_invariant(spark):
    df = spark.createDataFrame(
        [(1, "b a c a"), (2, "c b a"), (3, "a b d")],
        "doc_id long, text string")
    from pyspark.sql import functions as F
    from connectors_spark.functions.analysis import tokens_col
    fp = df.select(
        "doc_id",
        F.md5(F.array_join(
            F.array_sort(F.array_distinct(tokens_col(F.col("text")))),
            " ")).alias("fp"))
    got = {r.doc_id: r.fp for r in fp.collect()}
    assert got[1] == got[2]  # same token SET -> same fingerprint
    assert got[1] != got[3]
