"""chunk_token_windows, cross_source_overlap, conv_lang_consistency:
closed-form expectations, coverage/overlap properties, plan shape."""

import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.dedup import cross_source_overlap
from connectors_spark.operators.pretrain import chunk_token_windows
from connectors_spark.operators.transcript_qc import conv_lang_consistency


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_chunk_windows_boundaries_closed_form(spark):
    ten = " ".join(f"t{i}" for i in range(10))
    out = chunk_token_windows(_docs(spark, [ten]), window=4, stride=3) \
        .orderBy("chunk_idx").collect()
    assert [(r["chunk_idx"], r["start_tok"], r["n_tok"]) for r in out] == \
        [(0, 0, 4), (1, 3, 4), (2, 6, 4)]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[2]["chunk_text"] == "t6 t7 t8 t9"


def test_chunk_windows_short_and_empty_docs(spark):
    out = chunk_token_windows(
        _docs(spark, ["a b c", "", "a b c d e"]), window=4, stride=3)
    rows = sorted([(r["doc_id"], r["chunk_idx"], r["n_tok"])
                   for r in out.collect()])
    # 3 tokens -> one short chunk; empty -> none; 5 -> ceil(1/3)+1 = 2
    assert rows == [(0, 0, 3), (2, 0, 4), (2, 1, 2)]


def test_chunk_windows_full_coverage_and_overlap(spark):
    texts = [" ".join(f"w{i}" for i in range(n)) for n in (1, 4, 9, 17, 32)]
    out = chunk_token_windows(_docs(spark, texts), window=8, stride=5)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rows in by_doc.items():
        n = len(texts[d].split())
        rows.sort(key=lambda r: r["chunk_idx"])
        # union of [start, start+n_tok) covers exactly [0, n)
        assert rows[0]["start_tok"] == 0
        assert rows[-1]["start_tok"] + rows[-1]["n_tok"] == n
        for a, b in zip(rows, rows[1:]):
            assert b["start_tok"] == a["start_tok"] + 5
            assert b["start_tok"] < a["start_tok"] + a["n_tok"]  # overlap


def test_chunk_windows_validates_params(spark):
    with pytest.raises(ValueError):
        chunk_token_windows(_docs(spark, ["a"]), window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_token_windows(_docs(spark, ["a"]), window=4, stride=0)


def test_chunk_windows_map_only_plan(spark):
    plan = chunk_token_windows(_docs(spark, ["a b c"]), window=4, stride=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# ------------------------------------------------- cross-source overlap
def test_cross_source_overlap_closed_form(spark):
    p1 = "alpha beta gamma"          # shared by s1, s2, s3
    p2 = "delta epsilon zeta"        # shared by s1, s2 (twice in s1)
    p3 = "eta theta iota"            # only s3
    df = spark.createDataFrame(
        [(p1, "s1"), (p1, "s2"), (p1, "s3"),
         (p2, "s1"), (p2 + " tail", "s1"), (p2, "s2"),
         (p3, "s3"), ("", "s1")],
        "text string, source string")
    got = {(r["src_a"], r["src_b"]): r["n_shared"]
           for r in cross_source_overlap(df, prefix_len=3).collect()}
    # p1 in all three pairs; p2 links only (s1, s2) — distinct per
    # source, so the s1 double-occurrence counts once
    assert got == {("s1", "s2"): 2, ("s1", "s3"): 1, ("s2", "s3"): 1}


def test_cross_source_overlap_no_corpus_self_join(spark):
    df = spark.createDataFrame(
        [("alpha beta", "s1"), ("alpha beta", "s2")],
        "text string, source string")
    plan = cross_source_overlap(df, prefix_len=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # pair expansion, not self-join


# --------------------------------------------- conv lang consistency
def test_conv_lang_consistency_fixture(spark):
    from connectors_spark.entry_queries import _mlang_rows
    df = spark.createDataFrame(
        _mlang_rows(), "conv_id int, turn_idx int, text string")
    out = {r["conv_id"]: r for r in conv_lang_consistency(df).collect()}
    assert out[0]["dominant_lang"] == "en" and out[0]["n_switches"] == 0
    assert out[0]["consistent"] == 1
    assert out[1]["n_switches"] == 1 and out[1]["consistent"] == 0
    assert out[2]["n_switches"] == 3          # en/de alternator
    assert out[3]["n_turns"] == 1 and out[3]["consistent"] == 1
    assert out[4]["n_switches"] == 2          # en -> und -> en
    assert out[4]["dominant_lang"] == "en" and out[4]["n_dominant"] == 2


def test_conv_lang_windows_are_conv_partitioned(spark):
    from connectors_spark.entry_queries import _mlang_rows
    df = spark.createDataFrame(
        _mlang_rows(), "conv_id int, turn_idx int, text string")
    plan = conv_lang_consistency(df) \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "conv_id" in spec, plan
