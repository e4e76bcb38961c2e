"""Round-4 operators: dup spans, temperature mix, rank_eval, int8
quantization, grok, soundex, bigram LM — edge cases the DuckDB gates
cannot reach (empty inputs, flat vectors, missing judgments)."""

import math

import pytest
from pyspark.sql import functions as F


def test_dup_span_stats_short_and_duplicated(spark):
    from connectors_spark.operators.dedup import dup_span_stats

    body = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, body),                          # 5 windows (12 - 8 + 1)
        (2, body + " unique tail token"),   # shares doc 1's windows
        (3, "too short"),                   # < 8 tokens: absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dup_span_stats(df, window=8).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_windows == 5 and out[1].n_dup == 5
    assert out[2].n_dup == 5  # its copies of doc-1 windows are dups
    assert out[2].n_windows == 8 and out[2].dup_frac == 0.625


def test_temperature_mix_rates(spark):
    """alpha=1 is proportional sampling; alpha=0 splits the budget
    uniformly across strata regardless of size."""
    from connectors_spark.operators.pretrain import temperature_mix

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "rare").otherwise("common")
        .alias("lang"),
    )
    # alpha=1: rate = budget / corpus for every stratum
    r1 = temperature_mix(df, alpha=1.0, budget=100)
    rates = {r.stratum: r.rate for r in r1.select("stratum", "rate")
             .distinct().collect()}
    assert rates == {"rare": 0.1, "common": 0.1}
    # alpha=0: each stratum targets budget/2 docs -> rare oversampled
    r0 = temperature_mix(df, alpha=0.0, budget=100)
    rates0 = {r.stratum: r.rate for r in r0.select("stratum", "rate")
              .distinct().collect()}
    assert rates0["rare"] == 0.5 and rates0["common"] == pytest.approx(
        50 / 900, abs=1e-6)


def test_rank_eval_metrics_exact(spark):
    from connectors_spark.operators.query import rank_eval

    ranked = spark.createDataFrame(
        [("q", 1, 10, 9.0), ("q", 2, 11, 8.0), ("q", 3, 12, 7.0),
         ("qq", 1, 20, 5.0)],
        "query_id string, rank int, doc_id long, score double",
    )
    judgments = spark.createDataFrame(
        [("q", 11, 1.0), ("q", 99, 1.0), ("qq", 77, 1.0)],
        "query_id string, doc_id long, rel double",
    )
    out = {r.query_id: r for r in rank_eval(ranked, judgments, k=3).collect()}
    q = out["q"]
    assert q.precision_k == pytest.approx(1 / 3, abs=1e-6)
    assert q.recall_k == 0.5          # 1 of 2 judged-relevant retrieved
    assert q.mrr == 0.5               # first relevant at rank 2
    dcg = 1 / math.log2(3)
    idcg = 1 + 1 / math.log2(3)       # min(k, n_rel)=2 ideal hits
    assert q.ndcg_k == pytest.approx(round(dcg / idcg, 6), abs=1e-6)
    qq = out["qq"]                    # no relevant retrieved
    assert (qq.precision_k, qq.recall_k, qq.mrr, qq.ndcg_k) == (0, 0, 0, 0)


def test_quantize_int8_flat_and_roundtrip(spark):
    from connectors_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0, 255.0]), (2, [3.5, 3.5, 3.5])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert out[1].qmin == 0.0 and out[1].qscale == 1.0
    assert out[1].cos_orig_deq == 1.0  # ints on the grid: lossless
    # flat vector: scale 0, all-zero codes, cosine defined as 1.0
    assert out[2].qscale == 0.0 and out[2].cos_orig_deq == 1.0


def test_grok_compiler_unknown_and_unnamed():
    from connectors_spark.functions.scalars import grok_to_regex

    rex, fields = grok_to_regex("%{INT} -> %{WORD:w}")
    assert fields == ["w"] and rex.startswith("(?:")
    with pytest.raises(KeyError):
        grok_to_regex("%{NOSUCHPATTERN:x}")


def test_soundex_reference_vectors():
    from connectors_spark.functions.text import soundex_py

    # the canonical Knuth/census vectors incl. the H/W rules
    assert soundex_py("Robert") == soundex_py("Rupert") == "R163"
    assert soundex_py("Ashcraft") == "A261"   # c after h collapses with s
    assert soundex_py("Tymczak") == "T522"
    assert soundex_py("Pfister") == "P236"
    assert soundex_py("Honeyman") == "H555"
    assert soundex_py("") == ""


def test_ngram_lm_score_prefers_predictable(spark):
    from connectors_spark.functions.text import ngram_lm_score

    rows = [(1, "a b a b a b a b"),      # one dominant transition
            (2, "a q b z a m b k"),      # scattered transitions
            (3, "single")]               # no bigram: absent
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in ngram_lm_score(df).collect()}
    assert set(out) == {1, 2}
    assert out[1].avg_log2p > out[2].avg_log2p
    assert out[1].n_bigrams == 7


def test_simple_query_string_parser_never_raises_property():
    """The lenient contract, property-tested: ANY string parses without
    raising, every clause value is a normalized alnum run, and terms
    never leak into must_not (or vice versa)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from connectors_spark.operators.query_string import (
        parse_simple_query_string)

    @settings(max_examples=300, deadline=None)
    @given(st.text(
        alphabet=st.sampled_from('ab c"|+-*^:~()\\'), max_size=40))
    def check(q):
        p = parse_simple_query_string(q)
        for alt in p["alts"]:
            assert alt, "empty AND-group emitted"
            for kind, val in alt:
                assert kind in ("term", "prefix")
                assert val and val == val.lower() and val.isalnum()
        for t in p["must_not"]:
            assert t and t.isalnum()
        for role, terms in p["phrases"]:
            assert role in ("must", "must_not") and len(terms) >= 2

    check()


def test_grok_regex_matches_python_re_and_spark_semantics():
    """Compiled grok regexes stay inside the Java-regex/RE2 shared
    subset: compile under Python re (RE2-compatible constructs only
    are used) for every library pattern."""
    import re

    from connectors_spark.functions.scalars import (
        GROK_PATTERNS, grok_to_regex)

    for name in GROK_PATTERNS:
        rex, fields = grok_to_regex(f"x %{{{name}:v}} y")
        assert fields == ["v"]
        re.compile(rex)  # must be a valid pattern

    # literal regex text between references survives verbatim
    rex, _ = grok_to_regex(r"^\[%{WORD:a}\]$")
    assert re.match(rex, "[hello]")


# ---------------------------------------------------------------- rescore


def test_rescore_outside_window_never_surfaces(spark):
    """A doc that would win on the rescore query alone but misses the
    first-pass window must not appear (ES contract: rescore reorders
    the window, it does not recall new docs)."""
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import queries_df, rescore_window

    rows = [(1, "alpha alpha alpha"), (2, "alpha beta"),
            (3, "zeta zeta zeta zeta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [{"query_id": "q", "query_text": "alpha",
                              "k": 2}])
    rdf = queries_df(spark, [{"query_id": "q", "query_text": "zeta",
                              "k": 2}])
    out = rescore_window(idx, qdf, rdf, window_size=2,
                         rescore_query_weight=100.0).collect()
    got = {r.doc_id for r in out}
    assert 3 not in got, "doc 3 matches only the rescore query"
    assert got == {1, 2}


def test_rescore_reorders_within_window(spark):
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import queries_df, rescore_window

    rows = [(1, "alpha alpha alpha"), (2, "alpha beta beta beta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [{"query_id": "q", "query_text": "alpha",
                              "k": 2}])
    rdf = queries_df(spark, [{"query_id": "q", "query_text": "beta",
                              "k": 2}])
    base = {r.doc_id: r.rank for r in rescore_window(
        idx, qdf, rdf, window_size=2, rescore_query_weight=0.0).collect()}
    heavy = {r.doc_id: r.rank for r in rescore_window(
        idx, qdf, rdf, window_size=2, rescore_query_weight=50.0).collect()}
    assert base[1] == 1, "doc 1 wins on the base query"
    assert heavy[2] == 1, "rescore weight flips the order inside the window"


# ------------------------------------------------------------ cross_fields


def test_cross_fields_blends_df_across_fields(spark):
    """A term frequent in field B must be discounted in field A too
    (shared blended idf) — the defining difference vs most_fields."""
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import (
        queries_df, score_cross_fields, score_multi_match)

    # 'common' is rare in text (1 doc) but ubiquitous in src (all docs)
    rows = [(1, "common alpha", "common"), (2, "beta gamma", "common"),
            (3, "delta beta", "common"), (4, "epsilon zeta", "common")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    idx_t = build_index(docs.select("doc_id", "text"), with_positions=False)
    idx_s = build_index(
        docs.select("doc_id", F.col("src").alias("text")),
        with_positions=False)
    qdf = queries_df(spark, [{"query_id": "q", "query_text": "common",
                              "k": 4}])
    cross = {r.doc_id: r.score for r in score_cross_fields(
        [(idx_t, 1.0), (idx_s, 1.0)], qdf).collect()}
    most = {r.doc_id: r.score for r in score_multi_match(
        [(idx_t, 1.0), (idx_s, 1.0)], qdf).collect()}
    # every doc matches via src; blended df = max(1, 4) = 4 -> tiny idf
    assert set(cross) == {1, 2, 3, 4}
    # most_fields scores doc 1 with text-field idf for df=1 (rare) PLUS
    # the src contribution; cross_fields uses the blended (large) df
    # everywhere, so doc 1's cross score is far below its most score
    assert cross[1] < most[1]


def test_cross_fields_requires_known_tie_breaker_range(spark):
    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import (
        queries_df, score_cross_fields)

    rows = [(1, "alpha beta", "gamma")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    idx_t = build_index(docs.select("doc_id", "text"), with_positions=False)
    idx_s = build_index(
        docs.select("doc_id", F.col("src").alias("text")),
        with_positions=False)
    qdf = queries_df(spark, [{"query_id": "q", "query_text": "alpha gamma",
                              "k": 1}])
    # tie_breaker=1.0 degenerates to sum-over-fields of blended-idf terms
    out = score_cross_fields([(idx_t, 1.0), (idx_s, 1.0)], qdf,
                             tie_breaker=1.0).collect()
    assert len(out) == 1 and out[0].doc_id == 1


def test_mapping_infer_promotion_lattice(spark):
    from connectors_spark.operators.mapping_infer import infer_mapping

    kv = spark.createDataFrame(
        [("a", "1"), ("a", "2.5"),            # long+double -> double
         ("b", "true"), ("b", "false"),       # boolean
         ("c", "2024-01-01"), ("c", "2024-01-02 03:04:05"),  # date
         ("d", "1"), ("d", "x"),              # long+text -> text
         ("e", "true"), ("e", "7"),           # bool+numeric -> text
         ("f", "2024-01-01"), ("f", "9"),     # date+numeric -> text
         ("g", None), ("g", None),            # all null -> no mapping
         ("h", "123456789012345678901234")],  # >18 digits -> text
        "field string, val string")
    got = {r.field: (r.es_type, r.n_values)
           for r in infer_mapping(kv).collect()}
    assert got["a"] == ("double", 2)
    assert got["b"] == ("boolean", 2)
    assert got["c"] == ("date", 2)
    assert got["d"] == ("text", 2)
    assert got["e"] == ("text", 2)
    assert got["f"] == ("text", 2)
    assert got["g"] == (None, 0)
    assert got["h"] == ("text", 1)


def test_ngram_blocklist_filter_semantics(spark, tmp_path):
    import shutil, os
    # build a private sf dir with a crafted documents table
    # blocklist anatomy (top-20 by df desc, gram asc): the 4 shared
    # boilerplate grams (df>=2) lead; doc 4's 28 aaa-prefixed df-1
    # grams fill the lexicographic tail, so docs 2/3's unique grams
    # (q-/z-prefixed) stay OFF the list
    filler = " ".join(f"aaa{i:03d}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, "the same old thing " * 5),       # all grams df=2 (doc 5)
         (2, "the same old thing qone qtwo qthree qfour qfive"),
         (3, "zebra zonal zoom zest zeal zinc zing zip zone zero "
             "zoned zoningx zippy zesty zealot"),
         (4, filler),
         (5, "the same old thing " * 5)],      # exact dup of doc 1
        "doc_id long, text string")
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    from connectors_spark.entry_queries import q_ngram_blocklist_filter
    got = {r.doc_id: (r.block_frac, r.keep)
           for r in q_ngram_blocklist_filter(spark, d).collect()}
    # doc 1: every distinct gram is in the global head -> dropped
    assert got[1][0] == 1.0 and got[1][1] == 0
    # doc 3: z-prefixed grams stay off the blocklist -> kept, frac 0
    assert got[3] == (0.0, 1)
    # doc 2 shares the boilerplate head but keeps its unique tail
    assert 0.0 < got[2][0] < 1.0 and got[2][1] == 1


def test_quality_percentile_ranks_within_source(spark, tmp_path):
    import os
    docs = spark.createDataFrame(
        [(1, "a", "s1", 10), (2, "b", "s1", 20), (3, "c", "s1", 30),
         (4, "d", "s2", 5)],
        "doc_id long, text string, source string, n_chars long")
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    from connectors_spark.entry_queries import (
        q_quality_percentile_by_source)
    got = {r.doc_id: (r.pct_src, r.decile_src)
           for r in q_quality_percentile_by_source(spark, d).collect()}
    assert got[1] == (0.0, 0)
    assert got[2] == (0.5, 5)
    assert got[3] == (1.0, 9)
    assert got[4] == (0.0, 0)  # singleton source: percent_rank 0


def test_global_rank_matches_window_and_is_part_invariant(spark):
    from pyspark.sql import Window
    import pyspark.sql.functions as F
    from connectors_spark.operators.ordering import global_rank

    df = spark.createDataFrame(
        [(i, (i * 37) % 11) for i in range(200)], "id long, v long")
    expect = {
        r.id: r.rank for r in df.withColumn(
            "rank", F.row_number().over(
                Window.orderBy(F.desc("v"), F.asc("id")))).collect()}
    for parts in (3, 32):
        got = {r.id: r.rank
               for r in global_rank(df, ["v", "id"],
                                    ascending=[False, True],
                                    num_parts=parts).collect()}
        assert got == expect, f"num_parts={parts}"


def test_global_rank_plan_has_no_window(spark):
    from connectors_spark.operators.ordering import global_rank

    df = spark.range(100).selectExpr("id", "id % 7 AS v")
    out = global_rank(df, ["v", "id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "rangepartitioning" in plan.lower() or "RangePartitioning" in plan


def test_global_rank_validates_inputs(spark):
    import pytest as _pytest
    from connectors_spark.operators.ordering import global_rank

    df = spark.range(5).selectExpr("id", "id AS rank")
    with _pytest.raises(ValueError, match="already exists"):
        global_rank(df, ["id"])
    with _pytest.raises(ValueError, match="ascending"):
        global_rank(df.selectExpr("id"), ["id"], ascending=[True, False])


def test_cidr_match_semantics(spark):
    import pytest as _pytest
    from connectors_spark.operators.query import cidr_match, parse_cidr

    df = spark.createDataFrame(
        [(1, "10.0.0.1"), (2, "10.63.255.255"), (3, "10.64.0.0"),
         (4, "10.127.255.255"), (5, "10.128.0.0"), (6, "192.168.1.1")],
        "id long, ip string")
    got = {r.id: r.m for r in df.select(
        "id", cidr_match(F.col("ip"), "10.64.0.0/10").alias("m")
    ).collect()}
    # /10 network 10.64.0.0 spans 10.64.0.0 - 10.127.255.255
    assert got == {1: False, 2: False, 3: True, 4: True,
                   5: False, 6: False}
    # non-strict base normalization + /32 exact + validation
    assert parse_cidr("10.64.1.2/10") == parse_cidr("10.64.0.0/10")
    base, mask = parse_cidr("1.2.3.4/32")
    assert mask == 0xFFFFFFFF
    with _pytest.raises(ValueError):
        parse_cidr("::1/128")


def test_zorder_key_reference_and_locality(spark):
    from connectors_spark.operators.zorder import (
        zorder_key2, zorder_layout, zorder_py)

    pts = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(pts, "a long, b long")
    got = {(r.a, r.b): r.z for r in df.select(
        "a", "b", zorder_key2(F.col("a"), F.col("b")).alias("z")
    ).collect()}
    for a, b in pts:
        assert got[(a, b)] == zorder_py(a, b), (a, b)
    # locality: quadrant ordering — all of [0,4)x[0,4) sorts before
    # any of [4,8)x[4,8) (the defining Z-curve property)
    lo = max(got[(a, b)] for a in range(4) for b in range(4))
    hi = min(got[(a, b)] for a in range(4, 8) for b in range(4, 8))
    assert lo < hi
    # layout runs end-to-end and preserves rows
    laid = zorder_layout(df, "a", "b")
    assert sorted((r.a, r.b) for r in laid.collect()) == sorted(pts)
    assert "zkey" in laid.columns
