"""Analyzer-chain stemmers: golden vectors, three-way parity
(Column expr == SQL == Python), and engine-vs-oracle rank identity with
the snowball 'english' stemmer (reference analyzer chains:
app/connectors_service/connectors/es/language_data.yml:10-13)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from connectors_spark.functions.stem import (
    english_py,
    fr_elision_col,
    fr_elision_py,
    minimal_english_col,
    minimal_english_py,
    minimal_english_sql,
)

# Lucene EnglishMinimalStemFilter semantics (S-stemmer)
MINIMAL_VECTORS = {
    "tables": "table", "queries": "query", "windows": "window",
    "keys": "key", "class": "class", "us": "us", "values": "value",
    "hashes": "hashe", "batches": "batche", "skies": "sky",
    "ties": "ty", "goes": "goes", "dies": "dy", "as": "as",
    "gas": "ga", "aliases": "aliase", "is": "is", "s": "s",
    "table": "table", "axes": "axe", "eyes": "eye",
}

# snowball English (Porter2) — public algorithm vectors
PORTER2_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "tie",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "motoring": "motor", "sing": "sing",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "news": "news", "dying": "die",
    "lying": "lie", "tying": "tie", "skis": "ski", "skies": "sky",
    "relational": "relat", "national": "nation", "conditional": "condit",
    "generate": "generat", "generates": "generat", "generated": "generat",
    "generating": "generat", "running": "run", "runner": "runner",
    "quickly": "quick", "consign": "consign", "knit": "knit",
    "bias": "bias", "cosmos": "cosmos", "andes": "andes",
    "early": "earli", "only": "onli", "singly": "singl",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
}


def test_minimal_english_golden():
    for w, e in MINIMAL_VECTORS.items():
        assert minimal_english_py(w) == e, w


def test_porter2_golden():
    for w, e in PORTER2_VECTORS.items():
        assert english_py(w) == e, w


def test_porter2_stable_on_corpus_vocab():
    """Deterministic, non-empty, and idempotent on the testdata vocab
    (build and query sides stem independently, so re-stemming an
    already-stemmed query token must be a no-op for these words)."""
    vocab = ("key agg row scan slow fast table value part hash merge batch "
             "line sort window spark order data column join small customer "
             "query big stream group vector filter dup the a").split()
    for w in vocab:
        s = english_py(w)
        assert s and s == english_py(w)       # deterministic, non-empty
        assert english_py(s) == s, (w, s)     # idempotent on this vocab


def test_minimal_english_three_way_parity(spark):
    """Column expression == DuckDB SQL == Python on a hostile word list."""
    words = sorted(set(MINIMAL_VECTORS) | {
        "", "x", "xy", "xys", "miss", "bus", "abyss", "toes", "shoes",
        "lies", "pies", "aies", "eies", "oies", "ss", "es", "ies",
        "t00001s", "a1s", "99s",
    })
    words = [w for w in words if w]
    py = {w: minimal_english_py(w) for w in words}
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got_col = {r.w: r.s for r in
               df.select("w", minimal_english_col(F.col("w")).alias("s")).collect()}
    assert got_col == py
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    got_sql = dict(con.execute(
        f"SELECT w, {minimal_english_sql('w')} FROM (VALUES {vals}) v(w)"
    ).fetchall())
    assert got_sql == py


def test_fr_elision_parity(spark):
    words = ["l'avion", "qu'il", "jusqu'au", "j'aime", "d'accord",
             "avion", "l'", "quoiqu'elle", "xyz'abc"]
    py = {w: fr_elision_py(w) for w in words}
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r.w: r.s for r in
           df.select("w", fr_elision_col(F.col("w")).alias("s")).collect()}
    assert got == py
    assert py["l'avion"] == "avion" and py["jusqu'au"] == "au"
    assert py["xyz'abc"] == "xyz'abc"  # not an article: untouched


def test_stemmed_build_matches_oracle_snowball(spark):
    """build_index(stemmer='english') == NumPy oracle with the same
    stemmer on a plural/inflection-heavy corpus — the doc-side stemming
    path (the DuckDB gate covers minimal_english; this covers snowball)."""
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import queries_df, score_topk_dataframe
    from connectors_spark.oracle import OracleIndex
    from connectors_spark.functions.analysis import ENGLISH_STOP, tokenize_py

    rows = [
        ("d1", "the tables were merged and sorted by running queries"),
        ("d2", "a query merges sorted tables quickly"),
        ("d3", "windows grouping customers generated streams"),
        ("d4", "streaming values hashed into partitions"),
        ("d5", "generate a table of sorted values"),
        ("d6", "she ties the skis early, only singly"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    idx = build_index(docs, stop_words=ENGLISH_STOP, with_positions=False,
                      stemmer="english")
    oracle = OracleIndex(rows, stop_words=ENGLISH_STOP, stemmer="english")
    assert idx.n_docs == oracle.n_docs
    assert idx.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)

    queries = [
        {"query_id": "q1", "query_text": "merging tables", "k": 5},
        {"query_id": "q2", "query_text": "sorted queries", "k": 5},
        {"query_id": "q3", "query_text": "customer generation", "k": 5},
        {"query_id": "q4", "query_text": "tie ski", "k": 5},
    ]
    qrows = [{"query_id": q["query_id"],
              "query_text": " ".join(
                  tokenize_py(q["query_text"], ENGLISH_STOP, "english")),
              "k": q["k"]} for q in queries]
    got = sorted(
        score_topk_dataframe(idx, queries_df(spark, qrows)).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    exp = sorted(oracle.score_queryset(queries), key=lambda e: (e[0], e[1]))
    assert [(g.query_id, g.rank, g.doc_id) for g in got] == [e[:3] for e in exp]
    for g, e in zip(got, exp):
        assert g.score == pytest.approx(e[3], rel=1e-9)
    # the stemmer actually did work: inflected query hits base-form docs
    q1_docs = [g.doc_id for g in got if g.query_id == "q1"]
    assert "d1" in q1_docs and "d2" in q1_docs


def test_minimal_chain_stays_jvm(spark):
    """lowercase -> stop -> minimal_english compiles to pure JVM
    expressions: no Python evaluation node in the plan."""
    from connectors_spark.functions.analysis import ENGLISH_STOP, tokenize

    docs = spark.createDataFrame([("d1", "the tables")], "doc_id string, text string")
    out = tokenize(docs, stop_words=ENGLISH_STOP, stemmer="minimal_english")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cjk_bigram_three_way_parity(spark):
    """cjk_bigram stage (ja/ko/zh analyzers, language_data.yml:74-85):
    Column expr == DuckDB SQL == Python on mixed-script inputs."""
    from connectors_spark.functions.analysis import (
        cjk_tokenize_py, cjk_tokenize_sql_duckdb, cjk_tokens_col,
    )

    texts = [
        "Spark入門ガイド2024",
        "こんにちは world",
        "中",                        # lone CJK char stays a unigram
        "한국어 형태소 분석",
        "plain ascii only",
        "混合mixedテキスト",
        "",
    ]
    py = {t: cjk_tokenize_py(t) for t in texts}
    assert py["Spark入門ガイド2024"] == [
        "spark", "入門", "門ガ", "ガイ", "イド", "2024"]
    assert py["中"] == ["中"]

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got_col = {r.t: list(r.toks) for r in
               df.select("t", cjk_tokens_col(F.col("t")).alias("toks")).collect()}
    assert got_col == py

    con = duckdb.connect()
    vals = ", ".join("(?)" for _ in texts)
    got_sql = dict(con.execute(
        f"SELECT t, {cjk_tokenize_sql_duckdb('t')} FROM (VALUES {vals}) v(t)",
        texts,
    ).fetchall())
    assert {k: list(v) for k, v in got_sql.items()} == py


# KStem (Krovetz 1993; ES/Lucene `light_english`) — public behaviors:
# dictionary words unchanged, plurals singularized, past/-ing to base
# form with e-restoration and undoubling, derivational endings only when
# the result is a known word, NO -ly stripping ("quickly" stays).
KSTEM_VECTORS = {
    "foxes": "fox", "churches": "church", "hashes": "hash",
    "tables": "table", "queries": "query", "flies": "fly", "cats": "cat",
    "class": "class", "bus": "bus", "news": "news",
    "walked": "walk", "hoped": "hope", "hoping": "hope",
    "running": "run", "hopping": "hop", "jumping": "jump",
    "quickly": "quickly",            # kstem does not strip -ly
    "tried": "try", "agreed": "agree",  # real word, unlike porter2 "agre"
    "happiness": "happy", "filing": "file", "boxes": "box",
    "dies": "die", "sing": "sing", "feed": "feed",
    # direct conflations (irregulars)
    "children": "child", "indices": "index", "mice": "mouse",
    "data": "data",
    # unknown words: conservative fall-through rules
    "t00042": "t00042", "zzzs": "zzz", "frobnicating": "frobnicat",
}


def test_kstem_golden():
    from connectors_spark.functions.stem import kstem_py

    for w, e in KSTEM_VECTORS.items():
        assert kstem_py(w) == e, (w, kstem_py(w), e)


def test_kstem_lexicon_words_never_touched():
    """KStem's defining property: a dictionary word is returned as-is."""
    from connectors_spark.functions.stem import KSTEM_LEXICON, kstem_py

    for w in KSTEM_LEXICON:
        assert kstem_py(w) == w, w


def test_kstem_idempotent_and_caller_lexicon():
    from connectors_spark.functions.stem import kstem_py

    for w in KSTEM_VECTORS:
        s = kstem_py(w)
        assert kstem_py(s) == s, (w, s)
    # caller-supplied lexicon (e.g. corpus vocabulary) gates e-restoration
    assert kstem_py("frobnicated", frozenset({"frobnicate"})) == "frobnicate"
    assert kstem_py("frobnicated") == "frobnicat"


def test_kstem_build_matches_oracle(spark):
    """build_index(stemmer='kstem') == NumPy oracle rank-identity —
    closes the round-2 'exact light_english gap' item (VERDICT r2 #2):
    the en-default analyzer chain now has a KStem-algorithmic stage
    (reference: app/connectors_service/connectors/es/language_data.yml:
    10-13)."""
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import queries_df, score_topk_dataframe
    from connectors_spark.oracle import OracleIndex
    from connectors_spark.functions.analysis import ENGLISH_STOP, tokenize_py

    rows = [
        ("d1", "the tables were merged and sorted while running queries"),
        ("d2", "a query merges sorted tables quickly"),
        ("d3", "windows grouped customers and agreed plans"),
        ("d4", "streams hashed values into boxes and churches"),
        ("d5", "hoping to file the tried cases early"),
        ("d6", "children walked the mice across indices"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    idx = build_index(docs, stop_words=ENGLISH_STOP, with_positions=False,
                      stemmer="kstem")
    oracle = OracleIndex(rows, stop_words=ENGLISH_STOP, stemmer="kstem")
    assert idx.n_docs == oracle.n_docs
    assert idx.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)

    queries = [
        {"query_id": "q1", "query_text": "merging tables", "k": 5},
        {"query_id": "q2", "query_text": "sorted queries", "k": 5},
        {"query_id": "q3", "query_text": "child mouse index", "k": 5},
        {"query_id": "q4", "query_text": "hashing boxes", "k": 5},
    ]
    qrows = [{"query_id": q["query_id"],
              "query_text": " ".join(
                  tokenize_py(q["query_text"], ENGLISH_STOP, "kstem")),
              "k": q["k"]} for q in queries]
    got = sorted(
        score_topk_dataframe(idx, queries_df(spark, qrows)).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    exp = sorted(oracle.score_queryset(queries), key=lambda e: (e[0], e[1]))
    assert [(g.query_id, g.rank, g.doc_id) for g in got] == [e[:3] for e in exp]
    for g, e in zip(got, exp):
        assert g.score == pytest.approx(e[3], rel=1e-9)
    # the stemmer did real work: inflected/irregular queries hit docs
    q3_docs = [g.doc_id for g in got if g.query_id == "q3"]
    assert "d6" in q3_docs


def test_kstem_base_inflected_collision_recall(spark):
    """Regression for the r3 recall bug: build and query stem
    independently, so a doc token and a query typed against its base
    form must conflate identically ('aliases' indexed and the query
    'alias' must meet at the same stem). Engine vs NumPy oracle rank
    identity on a base/inflected collision corpus."""
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import queries_df, score_topk_dataframe
    from connectors_spark.oracle import OracleIndex
    from connectors_spark.functions.analysis import ENGLISH_STOP, tokenize_py
    from connectors_spark.functions.stem import kstem_py

    # every pair: (inflected in doc, base in query) and the reverse
    pairs = [("aliases", "alias"), ("biases", "bias"), ("lenses", "lens"),
             ("atlases", "atlas"), ("canvases", "canvas"),
             ("analyses", "analysis"), ("crises", "crisis")]
    for infl, base in pairs:
        assert kstem_py(infl) == kstem_py(base), (infl, base)

    rows = [("d%d" % i, "the %s were counted" % infl)
            for i, (infl, _) in enumerate(pairs)]
    rows += [("b%d" % i, "one %s was counted" % base)
             for i, (_, base) in enumerate(pairs)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    idx = build_index(docs, stop_words=ENGLISH_STOP, with_positions=False,
                      stemmer="kstem")
    oracle = OracleIndex(rows, stop_words=ENGLISH_STOP, stemmer="kstem")

    queries = ([{"query_id": "base%d" % i, "query_text": base, "k": 4}
                for i, (_, base) in enumerate(pairs)]
               + [{"query_id": "infl%d" % i, "query_text": infl, "k": 4}
                  for i, (infl, _) in enumerate(pairs)])
    qrows = [{"query_id": q["query_id"],
              "query_text": " ".join(
                  tokenize_py(q["query_text"], ENGLISH_STOP, "kstem")),
              "k": q["k"]} for q in queries]
    got = sorted(
        score_topk_dataframe(idx, queries_df(spark, qrows)).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    exp = sorted(oracle.score_queryset(queries), key=lambda e: (e[0], e[1]))
    assert [(g.query_id, g.rank, g.doc_id) for g in got] == [e[:3] for e in exp]
    # the recall property itself: base query finds the inflected doc
    # and vice versa, for every pair
    by_q = {}
    for g in got:
        by_q.setdefault(g.query_id, []).append(g.doc_id)
    for i in range(len(pairs)):
        assert "d%d" % i in by_q.get("base%d" % i, []), pairs[i]
        assert "b%d" % i in by_q.get("infl%d" % i, []), pairs[i]


def test_kstem_properties_random_words():
    """Property coverage for kstem on arbitrary lowercase words:
    deterministic, non-empty, never longer than input+1 (e-restoration
    adds at most one char), idempotent (a stemmed form re-stems to
    itself — build and query sides stem independently)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from connectors_spark.functions.stem import kstem_py

    @settings(max_examples=400, deadline=None)
    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=0,
                   max_size=14))
    def check(w):
        s = kstem_py(w)
        assert s == kstem_py(w)
        assert s != "" or w == ""
        assert len(s) <= len(w) + 1
        assert kstem_py(s) == s, (w, s)

    check()
