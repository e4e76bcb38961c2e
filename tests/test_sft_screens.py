"""Shingle / word-delimiter analysis stages + SFT screening ops
(refusal_screen, code_fence_qc): engine-vs-Python-oracle parity on
hostile inputs, closed-form fixture expectations, plan shape."""

from pyspark.sql import functions as F

from connectors_spark.functions.analysis import (
    shingles_col,
    shingles_py,
    tokens_col,
    word_delimiter_col,
    word_delimiter_py,
)
from connectors_spark.operators.transcript_qc import (
    code_fence_qc,
    refusal_screen,
)


# ------------------------------------------------------------- shingles
_SHINGLE_TEXTS = [
    "the quick brown fox",
    "one",
    "",
    "a a a a",            # repeated tokens -> repeated shingles kept
    "Tabs\tand  spaces",  # analyzer splits/lowercases first
]


def test_shingles_col_matches_python_oracle(spark):
    from connectors_spark.functions.analysis import tokenize_py
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_SHINGLE_TEXTS)], "i int, t string")
    for kw in (dict(min_shingle_size=2, max_shingle_size=2),
               dict(min_shingle_size=2, max_shingle_size=3),
               dict(min_shingle_size=2, max_shingle_size=3,
                    output_unigrams=False)):
        got = {r["i"]: r["sh"] for r in df.select(
            "i", shingles_col(tokens_col(F.col("t")), **kw).alias("sh")
        ).collect()}
        for i, t in enumerate(_SHINGLE_TEXTS):
            assert got[i] == shingles_py(tokenize_py(t), **kw), (t, kw)


def test_shingles_emission_order_is_position_major():
    # Lucene graph order: at each position, unigram then 2- then 3-gram
    assert shingles_py(["a", "b", "c"], 2, 3) == [
        "a", "a b", "a b c", "b", "b c", "c"]


def test_shingles_rejects_bad_sizes():
    import pytest
    with pytest.raises(ValueError):
        shingles_py(["a"], min_shingle_size=1, max_shingle_size=2)
    with pytest.raises(ValueError):
        shingles_py(["a"], min_shingle_size=3, max_shingle_size=2)


# ------------------------------------------------------- word delimiter
_WDG_CASES = {
    "PowerShot500": ["Power", "Shot", "500"],
    "Wi-Fi": ["Wi", "Fi"],
    "XMLHttpRequest": ["XML", "Http", "Request"],
    "O'Neil's": ["O", "Neil"],
    "j2se": ["j", "2", "se"],
    "500mg": ["500", "mg"],
    "snake_case_token": ["snake", "case", "token"],
    "McDonald's": ["Mc", "Donald"],
    "A1B2c3": ["A", "1", "B", "2", "c", "3"],
    "__init__": ["init"],
    "42": ["42"],
    "": [],
    "abc": ["abc"],
}


def test_word_delimiter_golden_vectors_and_spark_parity(spark):
    for raw, exp in _WDG_CASES.items():
        assert word_delimiter_py(raw) == exp, raw
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(_WDG_CASES)], "i int, r string")
    got = {row["i"]: row["p"] for row in df.select(
        "i", word_delimiter_col(F.col("r")).alias("p")).collect()}
    for i, raw in enumerate(_WDG_CASES):
        assert got[i] == _WDG_CASES[raw], raw


def test_word_delimiter_preserve_original(spark):
    # multi-part input keeps the original token prepended; single-part
    # identical input is NOT doubled
    assert word_delimiter_py("Wi-Fi", preserve_original=True) == \
        ["Wi-Fi", "Wi", "Fi"]
    assert word_delimiter_py("abc", preserve_original=True) == ["abc"]
    df = spark.createDataFrame([("Wi-Fi",), ("abc",)], "r string")
    got = [r["p"] for r in df.select(
        word_delimiter_col(F.col("r"), preserve_original=True).alias("p")
    ).collect()]
    assert got == [["Wi-Fi", "Wi", "Fi"], ["abc"]]


# ------------------------------------------------------ refusal screen
def _sft_df(spark):
    from connectors_spark.entry_queries import _sft_screen_rows
    return spark.createDataFrame(
        _sft_screen_rows(),
        "conv_id int, turn_idx int, role string, text string")


def test_refusal_screen_closed_form(spark):
    out = {r["conv_id"]: r for r in refusal_screen(_sft_df(spark)).collect()}
    # conv 0: 4 assistant turns, exactly the "I cannot help" one refuses
    assert out[0]["n_assistant"] == 4 and out[0]["n_refusals"] == 1
    assert out[0]["first_refusal_turn"] == 3
    assert abs(out[0]["refusal_rate"] - 0.25) < 1e-12
    # conv 1 and 3: every assistant turn is a (differently templated)
    # refusal — case variants and will-not forms both match
    for c in (1, 3):
        assert out[c]["n_refusals"] == out[c]["n_assistant"] == 2, c
    # conv 4: near-miss negatives ("I can help", "Sorry, but",
    # "an ai model") must NOT match
    assert out[4]["n_refusals"] == 0
    assert out[4]["first_refusal_turn"] is None
    # conv 5 has no assistant turns -> absent
    assert 5 not in out


def test_refusal_screen_custom_patterns(spark):
    out = refusal_screen(_sft_df(spark),
                         patterns=[r"(?i)\bthe answer is 42\b"]).collect()
    hits = {r["conv_id"]: r["n_refusals"] for r in out}
    assert hits[4] == 1 and hits[0] == 0


# ---------------------------------------------------- code fence QC
def test_code_fence_qc_closed_form(spark):
    rows = {(r["conv_id"], r["turn_idx"]): r
            for r in code_fence_qc(_sft_df(spark)).collect()}
    # conv0 turn1: one balanced block (2 fences); turn5 truncated (1)
    assert rows[(0, 1)]["n_fences"] == 2 and rows[(0, 1)]["balanced"] == 1
    assert rows[(0, 5)]["n_fences"] == 1 and rows[(0, 5)]["ends_open"] == 1
    # conv2 turn1: two balanced blocks -> 4 fences
    assert rows[(2, 1)]["n_fences"] == 4 and rows[(2, 1)]["balanced"] == 1
    # fence-free turns are filtered out entirely
    assert (0, 3) not in rows and (1, 1) not in rows
    # user turns never appear even if they contained fences
    assert all(k[0] != 5 for k in rows)


def test_code_fence_qc_no_shuffle_plan(spark):
    plan = code_fence_qc(_sft_df(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_shingle_gate_plan_is_take_ordered(spark):
    from connectors_spark.entry_queries import q_shingle_tokens
    plan = q_shingle_tokens(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


# ----------------------------------------- significant-terms heuristics
def test_significant_terms_scored_closed_form(spark):
    import math
    # 4 docs, fg = docs 0-1. "apple" in both fg docs only; "the" in all.
    docs = spark.createDataFrame(
        [(0, "apple pie"), (1, "apple tart"),
         (2, "plain bread"), (3, "plain toast")],
        "doc_id long, text string")
    out = {r["term"]: r for r in
           __import__("connectors_spark.functions.text",
                      fromlist=["significant_terms_scored"])
           .significant_terms_scored(
               docs, F.col("doc_id") < 2, top_n=10).collect()}
    a = out["apple"]
    # cells for apple: n11=2, n12=0, n21=0, n22=2, N=4
    # chi2 = 4*(2*2-0)^2 / (2*2*2*2) = 4
    assert abs(a["chi_square"] - 4.0) < 1e-9
    # MI = 2 * (2/4)*log2(4*2/(2*2)) = log2(2) = 1.0
    assert abs(a["mutual_info"] - 1.0) < 1e-9
    assert abs(a["pct_of_bg"] - 1.0) < 1e-9
    # jlh = (1 - 0.5) * (1 / 0.5) = 1.0
    assert abs(a["jlh"] - 1.0) < 1e-9
    # a term balanced across fg/bg carries no signal: chi2 = 0, MI = 0
    # (x in one fg and one bg doc; a term in EVERY doc has a degenerate
    # zero marginal and scores NULL by the denom guard — also covered)
    assert out["pie"]["chi_square"] is not None
    docs2 = spark.createDataFrame(
        [(0, "x y"), (1, "z w"), (2, "x y"), (3, "z w")],
        "doc_id long, text string")
    out2 = {r["term"]: r for r in
            __import__("connectors_spark.functions.text",
                       fromlist=["significant_terms_scored"])
            .significant_terms_scored(
                docs2, F.col("doc_id") < 2, top_n=10).collect()}
    assert abs(out2["x"]["chi_square"]) < 1e-9
    assert abs(out2["x"]["mutual_info"]) < 1e-9
    assert abs(out2["x"]["jlh"]) < 1e-9


def test_significant_terms_scored_jlh_matches_base_gate(spark):
    from connectors_spark.functions.text import (
        significant_terms, significant_terms_scored)
    docs = spark.createDataFrame(
        [(i, f"w{i % 3} common w{i % 5}") for i in range(12)],
        "doc_id long, text string")
    fg = F.col("doc_id") % 4 == 0
    base = {r["term"]: r["score"]
            for r in significant_terms(docs, fg, top_n=50).collect()}
    menu = {r["term"]: r["jlh"]
            for r in significant_terms_scored(docs, fg, top_n=50).collect()}
    assert base == menu


def test_index_phrases_equivalence_all_agree(spark, sf_dir):
    from connectors_spark.entry_queries import q_index_phrases_equivalence
    rows = q_index_phrases_equivalence(spark, sf_dir).collect()
    assert len(rows) > 0
    # the shingle term space and the positional index select the SAME
    # documents for an exact 2-term phrase — no one-sided matches
    assert all(r["agree"] == 1 for r in rows), [
        tuple(r) for r in rows if r["agree"] != 1]


def test_shingle_and_wdg_fuzz_parity(spark):
    """Hypothesis fuzz: the Spark Column implementations of shingles
    and word_delimiter match their Python oracles on arbitrary ASCII
    strings (one batched Spark pass over all examples)."""
    from hypothesis import given, settings, strategies as st
    from connectors_spark.functions.analysis import tokenize_py

    alphabet = st.sampled_from(
        list("abcXYZ019 '_-.") + ["'s", "```"])
    texts = st.lists(
        st.text(alphabet=st.characters(
            whitelist_categories=(), whitelist_characters=
            "abcdefgXYZ019 '_-."), min_size=0, max_size=24),
        min_size=1, max_size=24)

    @settings(max_examples=20, deadline=None)
    @given(texts)
    def check(batch):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(batch)], "i int, t string")
        got = {r["i"]: (r["sh"], r["wd"]) for r in df.select(
            "i",
            shingles_col(tokens_col(F.col("t")), 2, 3).alias("sh"),
            word_delimiter_col(F.col("t")).alias("wd")).collect()}
        for i, t in enumerate(batch):
            assert got[i][0] == shingles_py(tokenize_py(t), 2, 3), t
            assert got[i][1] == word_delimiter_py(t), t

    check()
