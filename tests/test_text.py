"""Text-analysis functions: language ID, quality, token counts, fingerprint."""

import pytest

from connectors_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_features,
    token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat is on the mat and the dog is in the house"),
        (2, "der Hund und die Katze das ist gut und nicht schlecht"),
        (3, "le chat est dans les maisons et une souris est dans le jardin"),
        (4, "xyzzy plugh qwerty"),          # no markers
        (5, ""),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lang_id(spark, docs):
    got = {r.doc_id: (r.pred_lang, r.n_hits) for r in lang_id(docs).collect()}
    assert got[1][0] == "en" and got[1][1] >= 5
    assert got[2][0] == "de"
    assert got[3][0] == "fr"
    assert got[4] == ("und", 0)
    assert got[5] == ("und", 0) and got[6] == ("und", 0)


def test_quality_features(spark, docs):
    got = {r.doc_id: r for r in quality_features(docs).collect()}
    text = "the cat is on the mat and the dog is in the house"
    r1 = got[1]
    assert r1.n_tokens == len(text.split())
    assert r1.n_chars == len(text)
    assert 0.0 < r1.quality <= 1.0
    # stopword ratio: the(4)+is(2)+on? 'on' in stop list, and/in/a...
    assert r1.stopword_ratio > 0.4
    assert got[5].n_tokens == 0 and got[5].quality is not None


def test_token_counts(spark, docs):
    got = {r.doc_id: r for r in token_counts(docs).collect()}
    assert got[1].n_ws_tokens == 13 and got[1].n_tokens == 13
    # subwords: ceil(len/4) per token
    text = "the cat is on the mat and the dog is in the house"
    exp = sum(-(-len(t) // 4) for t in text.split())
    assert got[1].n_subwords == exp
    assert got[5].n_ws_tokens == 0 and got[5].n_subwords == 0


def test_fingerprint(spark, docs):
    import hashlib

    got = {r.doc_id: r.fp for r in fingerprint(docs).collect()}
    text = "the cat is on the mat and the dog is in the house"
    exp = min(
        hashlib.md5(text[i:i + 8].encode()).hexdigest()
        for i in range(len(text) - 7)
    )
    assert got[1] == exp
    # short text falls back to whole-text md5
    short = spark.createDataFrame([(9, "abc")], "doc_id long, text string")
    fp = fingerprint(short).first().fp
    assert fp == hashlib.md5(b"abc").hexdigest()
    # robust to a distant edit (min 8-gram usually unchanged)
    edited = spark.createDataFrame(
        [(1, text + " zz")], "doc_id long, text string"
    )
    assert fingerprint(edited).first().fp == exp


def test_highlight_snippets(spark):
    from connectors_spark.functions.text import highlight_snippets

    docs = spark.createDataFrame(
        [(1, "The QUICK brown fox jumps over the lazy dog near the river"),
         (2, "nothing relevant here"),
         (3, "fox")],
        "doc_id long, text string",
    )
    qterms = spark.createDataFrame(
        [("q1", "quick"), ("q1", "fox"), ("q2", "zzz")],
        "query_id string, term string",
    )
    got = {(r.query_id, r.doc_id): r
           for r in highlight_snippets(docs, qterms, window=10).collect()}
    assert set(got) == {("q1", 1), ("q1", 3)}
    r = got[("q1", 1)]
    assert r.pos == 5  # 'quick' (case-insensitive) before 'fox' at 17
    assert r.snippet == "The QUICK brown fox!"[:20].replace("!", " ")
    assert got[("q1", 3)].pos == 1 and got[("q1", 3)].snippet == "fox"


def test_analyze_text_offsets_positions_gaps(spark):
    from connectors_spark.functions.analysis import analyze_text

    probes = spark.createDataFrame(
        [("p0", "The QUICK brown-fox!"), ("p1", ""), ("p2", "  x  ")],
        "input_id string, text string")
    out = analyze_text(probes, stop_words=["the"])
    rows = sorted(
        (r.input_id, r.position, r.token, r.start_offset, r.end_offset)
        for r in out.collect())
    # "the" removed but its position 0 stays a GAP; offsets index the
    # ORIGINAL string (0-based start, exclusive end)
    assert rows == [
        ("p0", 1, "quick", 4, 9),
        ("p0", 2, "brown", 10, 15),
        ("p0", 3, "fox", 16, 19),
        ("p2", 0, "x", 2, 3),
    ]
    src = "The QUICK brown-fox!"
    for _, _, tok, s, e in rows[:3]:
        assert src[s:e].lower() == tok
    stemmed = {r.token: r.stemmed for r in out.collect()}
    assert stemmed["quick"] == "quick"


def test_ngram_novelty_semantics(spark):
    from connectors_spark.functions.text import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "a b c d"),          # first doc: all grams novel
         (2, "a b c d"),          # exact dup: zero novelty
         (3, "a b c x"),          # shares "a b c", adds "b c x"
         (4, "q r")],             # < 3 tokens: no grams, kept
        "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.n_novel, r.novelty_frac)
           for r in ngram_novelty(docs, n=3).collect()}
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (2, 1, 0.5)
    assert got[4] == (0, 0, 0.0)
