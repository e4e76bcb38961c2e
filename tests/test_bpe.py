"""BPE merge learning: rank-identical to the published algorithm."""

from __future__ import annotations

import random

from connectors_spark.operators.bpe import (
    bpe_reference,
    learn_bpe,
    word_symbol_frame,
)


def _vocab_df(spark, word_freqs):
    from pyspark.sql import functions as F
    rows = [(w, f) for w, f in word_freqs.items()]
    wf = spark.createDataFrame(rows, "word string, freq long")
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit("▁")))
    return wf.select("word", "freq", syms.alias("syms"))


def test_matches_reference_on_classic_example(spark):
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = learn_bpe(_vocab_df(spark, wf), 8)
    want = bpe_reference(wf, 8)
    assert got == want
    # the classic first merges: ('e','s') then ('es','t')
    assert got[0][:2] == ("e", "s") and got[1][:2] == ("es", "t")


def test_matches_reference_on_random_corpus(spark):
    rng = random.Random(11)
    words = ["".join(rng.choice("abcdef") for _ in range(rng.randint(1, 7)))
             for _ in range(60)]
    wf = {}
    for w in words:
        wf[w] = wf.get(w, 0) + rng.randint(1, 9)
    got = learn_bpe(_vocab_df(spark, wf), 12)
    want = bpe_reference(wf, 12)
    assert got == want


def test_early_stop_when_fully_merged(spark):
    wf = {"ab": 3}
    got = learn_bpe(_vocab_df(spark, wf), 50)
    want = bpe_reference(wf, 50)
    assert got == want
    assert len(got) == 2  # a+b, ab+marker -> single symbol, then stop


def test_word_symbol_frame_shape(spark):
    docs = spark.createDataFrame([(0, "big big batch")], ["doc_id", "text"])
    rows = {r.word: (r.freq, r.syms)
            for r in word_symbol_frame(docs).collect()}
    assert rows["big"] == (2, ["b", "i", "g", "▁"])
    assert rows["batch"][0] == 1


def test_encode_matches_reference(spark):
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_reference(wf, 8)
    from connectors_spark.operators.bpe import encode_reference, encode_words
    words = spark.createDataFrame(
        [(w,) for w in ["lowest", "newer", "wide", "low", "unseen"]],
        ["word"])
    got = {r.word: r.n_bpe for r in encode_words(words, merges).collect()}
    for w in got:
        assert got[w] == len(encode_reference(w, merges)), w
    # 'low' was fully merged during learning -> encodes to 1 symbol
    assert got["low"] == len(encode_reference("low", merges))


def test_encode_no_merges_is_chars(spark):
    from connectors_spark.operators.bpe import encode_words
    words = spark.createDataFrame([("abc",)], ["word"])
    got = encode_words(words, []).collect()[0]
    assert got.n_bpe == 4  # a b c marker
