"""LLM-pipeline ops: repetition metrics, contamination, filter stack."""

from pyspark.sql import functions as F

from connectors_spark.functions.text import (
    contamination_overlap, repetition_metrics,
)
from connectors_spark.operators.pretrain import pretrain_filter


def test_repetition_metrics_hand_computed(spark):
    rows = [
        (1, "a b c d"),          # all unique: top word 1/4, top 2gram 2/4
        (2, "x x x x"),          # degenerate: everything 1.0
        (3, "a b a b a"),        # top word 3/5; "a b" x2 -> 4/5; 3grams
                                 # "a b a" x2 -> 6/5 capped at 1.0
        (4, ""),                 # zero tokens -> all 0.0
        (5, "q r"),              # too short for 3-grams -> dup 0.0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert got[1].n_tokens == 4
    assert abs(got[1].top_word_frac - 0.25) < 1e-9
    assert abs(got[1].top_2gram_frac - 0.5) < 1e-9
    assert got[1].dup_3gram_frac == 0.0
    assert got[2].top_word_frac == 1.0
    assert got[2].top_2gram_frac == 1.0   # "x x" x3 -> 6/4 capped
    assert got[2].dup_3gram_frac == 1.0   # "x x x" x2 -> 6/4 capped
    assert abs(got[3].top_word_frac - 0.6) < 1e-9
    assert abs(got[3].top_2gram_frac - 0.8) < 1e-9
    assert got[3].dup_3gram_frac == 1.0
    assert got[4].n_tokens == 0 and got[4].top_word_frac == 0.0
    assert got[5].dup_3gram_frac == 0.0


def test_contamination_overlap_detects_copies(spark):
    evl = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, evl, "eval"),
        (2, evl, "train"),                          # exact copy -> 1.0
        (3, "completely different words here now ok", "train"),  # 0.0
        (4, "the quick brown fox jumps away from here ok", "train"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in contamination_overlap(
        docs, F.col("source") == "eval", n=5).collect()}
    assert set(got) == {2, 3, 4}  # eval doc itself excluded
    assert got[2].overlap_frac == 1.0
    assert got[3].overlap_frac == 0.0
    # doc 4 shares exactly the one 5-gram "the quick brown fox jumps"
    assert got[4].n_hit == 1 and 0.0 < got[4].overlap_frac < 1.0


def test_pretrain_filter_rules_and_dedup(spark):
    long_ok = " ".join(f"w{i}" for i in range(30))
    rows = [
        (1, long_ok, "en"),            # keep
        (2, long_ok, "en"),            # exact dup of 1 -> dropped
        (3, long_ok, "fr"),            # wrong lang
        (4, "short text", "en"),       # too short
        (5, " ".join(["spam"] * 40), "en"),  # repetitive
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in pretrain_filter(docs).collect()}
    assert got[1].keep and got[1].keep_dedup
    assert not got[2].keep and not got[2].keep_dedup  # later id loses
    assert got[2].keep_lang and got[2].keep_len and got[2].keep_rep
    assert not got[3].keep_lang and not got[3].keep
    assert not got[4].keep_len and not got[4].keep
    assert not got[5].keep_rep and not got[5].keep
