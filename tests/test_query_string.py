"""query_string parser + scorer (ES query_string analog)."""

from pyspark.sql import functions as F

from connectors_spark.operators.build import build_index
from connectors_spark.operators.query_string import (
    parse_query_string, score_query_string,
)


def test_parse_roles_boosts_phrases():
    p = parse_query_string('spark +query -window "table scan" merge^2.5')
    assert ("should", "spark", 1.0) in p["clauses"]
    assert ("must", "query", 1.0) in p["clauses"]
    assert ("must_not", "window", 1.0) in p["clauses"]
    assert ("should", "merge", 2.5) in p["clauses"]
    assert p["phrases"] == [("must", ["table", "scan"])]


def test_parse_lenient_edges():
    # field-scoped tokens dropped; ~ ignored; () whitespace; one-word
    # "phrase" degrades to a term; empty quotes vanish
    p = parse_query_string('title:spark merge~ (data batch) "hash" "" -"a b"')
    terms = [(r, t) for r, t, _ in p["clauses"]]
    assert ("should", "spark") not in terms and ("should", "title") not in terms
    assert ("should", "merge") in terms
    assert ("should", "data") in terms and ("should", "batch") in terms
    assert ("should", "hash") in terms
    assert ("must_not", ["a", "b"]) in p["phrases"]
    # uppercase + punctuation normalize like the index analyzer
    p2 = parse_query_string("+Spark! MERGE^2")
    assert ("must", "spark", 1.0) in p2["clauses"]
    assert ("should", "merge", 2.0) in p2["clauses"]


def test_parse_fuzz_never_crashes_and_is_typed():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def run(s):
        p = parse_query_string(s)
        for role, term, boost in p["clauses"]:
            assert role in ("must", "should", "must_not")
            assert term and term == term.lower()
            # Lucene allows boost 0 (clause gates matching, adds no
            # score); the syntax cannot produce a negative boost
            assert boost >= 0
        for role, terms in p["phrases"]:
            assert role in ("must", "must_not")
            assert len(terms) >= 2

    run()


def test_score_query_string_semantics(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta"),          # no gamma
        (3, "alpha gamma delta"),   # no beta
        (4, "beta gamma delta"),    # no alpha -> excluded by +alpha
        (5, "alpha beta gamma bad"),  # excluded by -bad
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, with_positions=True)
    out = score_query_string(
        idx,
        [{"query_id": "q", "query_string": "+alpha -bad gamma", "k": 10}],
    ).collect()
    got = {r.doc_id for r in out}
    assert got == {1, 2, 3}  # must alpha, not bad; gamma optional
    # boost scales the should contribution: doc 1/3 (have gamma) gain
    plain = {r.doc_id: r.score for r in out}
    boosted = {
        r.doc_id: r.score
        for r in score_query_string(
            idx, [{"query_id": "q", "query_string": "+alpha -bad gamma^3",
                   "k": 10}]).collect()
    }
    assert boosted[1] > plain[1] and boosted[3] > plain[3]
    assert abs(boosted[2] - plain[2]) < 1e-12  # no gamma -> unchanged


def test_score_query_string_phrase_filter(spark):
    rows = [
        (1, "fast table scan wins"),   # has phrase
        (2, "table fast scan"),        # words, wrong order
        (3, "fast wins again"),        # no phrase
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, with_positions=True)
    out = score_query_string(
        idx, [{"query_id": "q", "query_string": '"table scan" fast', "k": 10}]
    ).collect()
    assert {r.doc_id for r in out} == {1}
    out2 = score_query_string(
        idx, [{"query_id": "q", "query_string": '-"table scan" fast',
               "k": 10}]
    ).collect()
    assert {r.doc_id for r in out2} == {2, 3}
