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


def test_parse_field_scoped():
    p = parse_query_string('author:smith +lang:fr -source:bad^2 title:"a b"')
    assert ("should", "author", "smith", 1.0) in p["scoped"]
    assert ("must", "lang", "fr", 1.0) in p["scoped"]
    assert ("must_not", "source", "bad", 2.0) in p["scoped"]
    # scoped phrase loses its scope: gates on the default field
    assert ("must", ["a", "b"]) in p["phrases"]
    # scoped tokens never leak into the default-field clause list
    assert all(t not in ("smith", "fr", "bad", "author", "lang", "source")
               for _, t, _ in p["clauses"])


def test_parse_fuzz_scoped_typed():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="ab:+-^\". 12", max_size=40))
    def run(s):
        p = parse_query_string(s)
        for role, fld, term, boost in p["scoped"]:
            assert role in ("must", "should", "must_not")
            assert fld and fld == fld.lower()
            assert term and term == term.lower()
            assert boost >= 0

    run()


def test_score_query_string_field_scoped(spark):
    rows = [
        (1, "alpha beta", "fr", "src1"),
        (2, "alpha beta", "en", "src1"),
        (3, "alpha gamma", "fr", "src2"),
        (4, "beta gamma", "fr", "src1"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    idx = build_index(docs, with_positions=True)
    fidx = {
        "lang": build_index(docs.select("doc_id",
                                        F.col("lang").alias("text")),
                            with_positions=False),
        "source": build_index(docs.select("doc_id",
                                          F.col("source").alias("text")),
                              with_positions=False),
    }
    def run(qs):
        return {r.doc_id for r in score_query_string(
            idx, [{"query_id": "q", "query_string": qs, "k": 10}],
            field_indexes=fidx).collect()}

    # scoped must restricts; default-field should still scores
    assert run("+lang:fr alpha") == {1, 3, 4}
    # scoped must_not excludes
    assert run("alpha -source:src2") == {1, 2}
    # scoped should pulls in docs by field match alone
    assert run("gamma source:src1") == {1, 2, 3, 4}
    # combined scoped must + scoped must_not + default must
    assert run("+lang:fr -source:src2 +beta") == {1, 4}
    # unmapped field: must empties, should inert, must_not excludes nothing
    assert run("+author:smith alpha") == set()
    assert run("author:smith alpha") == {1, 2, 3}
    assert run("alpha -author:smith") == {1, 2, 3}
    # field stats are per-field: lang:fr scores with the lang index's df
    out = score_query_string(
        idx, [{"query_id": "q", "query_string": "lang:fr^2 alpha", "k": 10}],
        field_indexes=fidx).collect()
    assert {r.doc_id for r in out} == {1, 2, 3, 4}


def test_score_query_string_phrase_scored(spark):
    import math
    from connectors_spark import BM25_B, BM25_K1

    rows = [
        (1, "table scan table scan x"),   # phrase twice
        (2, "table scan x here"),         # phrase once
        (3, "scan table x wrong order"),  # no phrase
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, with_positions=True)
    # the shared term 'x' admits every doc as a candidate (docs enter
    # only via scoring-clause hits); the phrase then gates and scores
    q = [{"query_id": "q", "query_string": '"table scan" x', "k": 10}]
    gated = {r.doc_id: r.score
             for r in score_query_string(idx, q).collect()}
    scored = {r.doc_id: r.score
              for r in score_query_string(idx, q,
                                          phrase_scoring=True).collect()}
    assert set(gated) == set(scored) == {1, 2}
    # filter-context run: phrase adds no score; with phrase_scoring the
    # doc containing the phrase TWICE outranks the single occurrence by
    # more than term stats alone
    assert scored[1] > gated[1] and scored[2] > gated[2]
    # exact contract: extra = sum(term idfs) * tf_norm(pf, dl)
    n, avgdl = idx.n_docs, idx.avgdl
    dfs = {r.term: r.df for r in idx.lexicon.collect()}
    dls = {r.doc_id: r.dl for r in idx.docs.collect()}
    for doc, pf in ((1, 2), (2, 1)):
        sidf = sum(math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
                   for t in ("table", "scan"))
        tfn = pf / (pf + BM25_K1 * (1 - BM25_B + BM25_B * dls[doc] / avgdl))
        assert abs((scored[doc] - gated[doc]) - sidf * tfn) < 1e-9, doc


def test_nested_query_same_element_semantics(spark):
    """ES nested vs flat-object mapping: conditions must hold on ONE
    element. Doc 2 has qty>=45 in one element and flag='R' in ANOTHER —
    a flat mapping would false-positive it; nested must not."""
    from connectors_spark.operators.query import nested_query

    rows = [
        (1, [(50, "R", 10.0), (5, "N", 1.0)]),   # same-element match
        (2, [(50, "N", 10.0), (5, "R", 1.0)]),   # cross-element only
        (3, [(50, "R", 2.0), (60, "R", 3.0)]),   # two matching elements
        (4, [(5, "N", 1.0)]),                     # none
    ]
    df = spark.createDataFrame(
        rows,
        "id long, items array<struct<qty:long,flag:string,price:double>>")
    pred = lambda e: (e["flag"] == "R") & (e["qty"] >= 45)  # noqa: E731
    price = lambda e: e["price"]  # noqa: E731

    out = {r.id: r for r in nested_query(
        df, "items", pred, price, "sum").collect()}
    assert set(out) == {1, 3}
    assert out[1].n_matching == 1 and out[1].nested_score == 10.0
    assert out[3].n_matching == 2 and out[3].nested_score == 5.0
    # the flat cross-element evaluation WOULD match doc 2 — pin the trap
    flat = df.filter(
        F.exists("items", lambda e: e["flag"] == "R")
        & F.exists("items", lambda e: e["qty"] >= 45))
    assert {r.id for r in flat.collect()} == {1, 2, 3}

    for mode, exp in (("max", 3.0), ("min", 2.0), ("avg", 2.5),
                      ("count", 2.0)):
        got = {r.id: r.nested_score for r in nested_query(
            df, "items", pred, price, mode).collect()}
        assert got[3] == exp, (mode, got[3])
    import pytest as _pt
    with _pt.raises(ValueError):
        nested_query(df, "items", pred, price, "bogus")
    # plan stays JVM-side: no explode, no Python eval
    plan = nested_query(df, "items", pred, price,
                        "sum")._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan and "EvalPython" not in plan


def test_rrf_fuse_contract(spark):
    """RRF: score = sum 1/(k+rank) over the lists that retrieved the
    doc; absent lists contribute nothing; ties break doc_id ASC."""
    from connectors_spark.operators.query import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rank int")
    out = {r.doc_id: (r.rank, r.score)
           for r in rrf_fuse([a, b], rank_k=60, top_n=10,
                             round_to=None).collect()}
    assert abs(out[20][1] - (1 / 62 + 1 / 61)) < 1e-12
    assert abs(out[10][1] - 1 / 61) < 1e-12
    assert abs(out[40][1] - 1 / 62) < 1e-12
    # 20 fused first; 10 (1/61) beats 40 (1/62); 30 last
    assert [d for d, (rk, _) in sorted(out.items(), key=lambda kv: kv[1][0])] \
        == [20, 10, 40, 30]


def test_collapse_field_contract(spark):
    from connectors_spark.operators.query import collapse_field

    rows = [(1, 5.0, "en"), (2, 4.0, "en"), (3, 3.0, "fr"),
            (4, 5.0, "fr"), (5, 1.0, "de")]
    df = spark.createDataFrame(rows, "doc_id long, score double, lang string")
    out = {r.lang: r for r in collapse_field(df, "lang", 10).collect()}
    assert out["en"].doc_id == 1 and out["en"].group_size == 2
    assert out["fr"].doc_id == 4 and out["fr"].group_size == 2
    assert out["de"].doc_id == 5 and out["de"].group_size == 1


def test_parse_simple_query_string_operators():
    from connectors_spark.operators.query_string import (
        parse_simple_query_string as p)

    assert p("table + scan | merge")["alts"] == [
        [("term", "table"), ("term", "scan")], [("term", "merge")]]
    assert p("a+b -c* | d") == {
        "alts": [[("term", "a"), ("term", "b")], [("term", "d")]],
        "must_not": ["c"], "phrases": []}
    # trailing star -> prefix clause; quoted multiword -> phrase gate
    got = p('fast quer* -slow "batch merge"')
    assert got["alts"] == [[("term", "fast")], [("prefix", "quer")]]
    assert got["must_not"] == ["slow"]
    assert got["phrases"] == [("must", ["batch", "merge"])]
    # leniency: connective garbage parses to nothing, never raises
    assert p('+ | * ""') == {"alts": [], "must_not": [], "phrases": []}


def test_simple_query_string_dnf_semantics(spark):
    """A doc matching only part of an AND-group contributes nothing;
    completing the group scores the sum; prefix clauses score 1.0."""
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query_string import (
        score_simple_query_string)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta"), (3, "beta zeta")],
        "doc_id long, text string",
    )
    idx = build_index(docs, with_positions=False)
    out = score_simple_query_string(
        idx, [{"query_id": "q", "query_string": "alpha +beta | zet*",
               "k": 10}],
    ).collect()
    by_doc = {r.doc_id: r.score for r in out}
    # doc 2 has alpha but not beta -> alternative [alpha, beta] fails,
    # and it has no zet* term -> absent entirely
    assert set(by_doc) == {1, 3}
    assert by_doc[3] == 1.0  # zet* only: constant prefix score
    assert 0.0 < by_doc[1] != 1.0  # alpha+beta BM25 sum


def test_expand_query_graph_paths():
    from connectors_spark.operators.query import expand_query_graph

    paths = expand_query_graph(
        [("q", "a hash join b"), ("r", "merge x merge")],
        [("hash join", "merge"), ("merge", "hash join")])
    by_q = {}
    for qid, p, text in paths:
        by_q.setdefault(qid, []).append(text)
    assert by_q["q"] == ["a hash join b", "a merge b"]
    # two occurrences -> two single-application paths
    assert by_q["r"] == ["merge x merge", "hash join x merge",
                         "merge x hash join"]


def test_score_topk_graph_sums_paths(spark):
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import (
        score_topk_dataframe, score_topk_graph, queries_df)

    docs = spark.createDataFrame(
        [(1, "hash join fast"), (2, "merge fast"), (3, "other text")],
        "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    out = score_topk_graph(
        idx, spark, [("q", "hash join")],
        [("hash join", "merge")], k=10, round_scores=6)
    got = {r.doc_id: r.score for r in out.collect()}
    # doc 1 matches path 0, doc 2 matches path 1 — both returned
    assert set(got) == {1, 2}
    # path-sum equals the plain per-path scores summed
    p0 = score_topk_dataframe(
        idx, queries_df(spark, [{"query_id": "q", "query_text":
                                 "hash join", "k": 100}]),
        round_scores=6)
    s1 = {r.doc_id: r.score for r in p0.collect()}
    assert got[1] == s1[1]
