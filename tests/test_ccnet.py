"""CCNet perplexity buckets: reference-like docs head, garbled docs tail."""

from __future__ import annotations

from connectors_spark.functions.text import ccnet_perplexity_buckets


def test_garbled_doc_lands_in_tail(spark):
    common = "the table scan reads the table fast"
    rows = [(i, common, "en") for i in range(0, 9)]          # ids 0,5 are ref
    rows.append((9, "zzq qxv vqk kjz zzq qxv", "en"))        # garbled
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r for r in ccnet_perplexity_buckets(df).collect()}
    assert out[9].bucket == "tail"
    assert out[1].bucket == "head"
    # reference-like docs all score identically and above the garbled one
    assert out[1].avg_log2p > out[9].avg_log2p


def test_language_without_reference_drops(spark):
    # lang 'xx' has no doc_id % 5 == 0 row -> no LM -> absent from output
    rows = [(0, "a b c d", "en"), (5, "a b c e", "en"),
            (1, "a b c f", "en"), (3, "g h i j", "xx")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = ccnet_perplexity_buckets(df).collect()
    assert sorted(r.lang for r in out) == ["en", "en", "en"]


def test_buckets_are_per_language_terciles(spark):
    rows = []
    for lang in ("en", "fr"):
        for i in range(6):
            did = i * 5 + (0 if i == 0 else 1) + (100 if lang == "fr" else 0)
            rows.append((did, f"w{i} w{(i+1) % 6} w{i} w{(i+2) % 6}", lang))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = ccnet_perplexity_buckets(df).collect()
    for lang in ("en", "fr"):
        buckets = [r.bucket for r in out if r.lang == lang]
        assert buckets.count("head") == 2
        assert buckets.count("middle") == 2
        assert buckets.count("tail") == 2
