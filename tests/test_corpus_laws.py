"""Corpus-law analytics: Zipf OLS fit, Heaps vocabulary growth,
lexical diversity — closed-form vs independent Python references."""

import math

from pyspark.sql import functions as F

from connectors_spark.functions.text import (
    lexical_diversity, vocab_growth, zipf_fit)


def test_zipf_fit_closed_form(spark):
    # exact power law f = 12 / rank: a x12, b x6, c x4, d x3
    docs = spark.createDataFrame(
        [(0, " ".join(["a"] * 12)), (1, " ".join(["b"] * 6)),
         (2, " ".join(["c"] * 4 + ["d"] * 3))],
        "doc_id long, text string")
    row = zipf_fit(docs, max_rank=10).collect()[0]
    # independent OLS on the micro-lifted points
    pts = [(1, 12), (2, 6), (3, 4), (4, 3)]  # (rank, freq)
    xu = [round(round(math.log(r), 6) * 1e6) for r, _ in pts]
    yu = [round(round(math.log(f), 6) * 1e6) for _, f in pts]
    n = float(len(pts))
    sx, sy = float(sum(xu)), float(sum(yu))
    sxx = float(sum(x * x for x in xu))
    sxy = float(sum(x * y for x, y in zip(xu, yu)))
    syy = float(sum(y * y for y in yu))
    cov, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert row.n_terms == 4
    assert row.slope == round(cov / varx, 6)
    assert row.intercept == round((sy - cov / varx * sx) / n / 1e6, 6)
    assert row.r2 == round(cov * cov / (varx * vary), 6)
    # f*r = 12 exactly -> ln f = ln 12 - ln r: collinear up to the
    # 6dp micro-rounding -> r2 ~ 1, slope ~ -1
    assert row.r2 > 0.999999
    assert -1.00001 < row.slope < -0.99999


def test_zipf_fit_respects_max_rank(spark):
    docs = spark.createDataFrame(
        [(0, "a a a b b c")], "doc_id long, text string")
    assert zipf_fit(docs, max_rank=2).collect()[0].n_terms == 2


def test_vocab_growth_curve(spark):
    # ids 0..9, 2 buckets of 5 docs; vocab grows only in new terms
    rows = [(i, "t%d common" % (i // 5)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.bucket: r for r in vocab_growth(docs, n_buckets=2).collect()}
    assert set(out) == {0, 1}
    assert out[0].n_docs == 5 and out[1].n_docs == 5
    assert out[0].cum_tokens == 10 and out[1].cum_tokens == 20
    # bucket 0 introduces {t0, common}; bucket 1 adds only t1
    assert out[0].cum_vocab == 2 and out[1].cum_vocab == 3


def test_vocab_growth_totals_and_monotone(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sorted(vocab_growth(docs).collect(), key=lambda r: r.bucket)
    total_tokens = out[-1].cum_tokens
    total_vocab = out[-1].cum_vocab
    from connectors_spark.functions.analysis import tokens_col
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("t"))
    assert total_tokens == toks.count()
    assert total_vocab == toks.distinct().count()
    for a, b in zip(out, out[1:]):
        assert b.cum_tokens >= a.cum_tokens
        assert b.cum_vocab >= a.cum_vocab


def test_lexical_diversity_closed_form(spark):
    docs = spark.createDataFrame(
        [(0, "a a b c"),        # 4 tokens, 3 types, 2 hapax
         (1, "x"),              # 1 token: herdan NULL
         (2, "")],              # 0 tokens: absent
        "doc_id long, text string")
    out = {r.doc_id: r for r in lexical_diversity(docs).collect()}
    assert set(out) == {0, 1}
    r0 = out[0]
    assert (r0.n_tokens, r0.n_types, r0.n_hapax) == (4, 3, 2)
    assert r0.ttr == 0.75
    assert r0.rttr == round(3 / math.sqrt(4), 6)
    assert r0.herdan_c == round(math.log(3) / math.log(4), 6)
    assert r0.hapax_ratio == 0.5
    assert out[1].herdan_c is None and out[1].ttr == 1.0


# -------------------------------------------------------- sentence BLEU
def _bleu_rows(spark, rows):
    from connectors_spark.functions.text import bleu_pairs
    pairs = spark.createDataFrame(
        rows, "pair_id long, cand_text string, ref_text string")
    return {r.pair_id: r for r in bleu_pairs(pairs).collect()}


def test_bleu_identity_pair_scores_zero_log(spark):
    out = _bleu_rows(spark, [(0, "a b c d e", "a b c d e")])
    r = out[0]
    assert (r.p1, r.p2, r.p3, r.p4) == (1.0, 1.0, 1.0, 1.0)
    assert r.cand_len == 5 and r.ref_len == 5
    assert r.log_bleu == 0.0  # BP=1, all precisions 1


def test_bleu_closed_form(spark):
    import math

    # cand: a b c d x  / ref: a b c d e -> clip: 4/5, 3/4, 2/3, 1/2
    out = _bleu_rows(spark, [(1, "a b c d x", "a b c d e")])
    r = out[1]
    assert (r.p1, r.p2, r.p3, r.p4) == (0.8, 0.75, round(2 / 3, 6), 0.5)
    from decimal import ROUND_HALF_UP, Decimal

    def half_up(x, nd):
        # Spark's round() is HALF_UP over BigDecimal.valueOf(double),
        # i.e. over the SHORTEST DECIMAL REPR, not the exact binary —
        # Decimal(repr(x)) reproduces that
        return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd),
                                               rounding=ROUND_HALF_UP))

    lnp = [int(half_up(half_up(math.log(p), 6) * 1e6, 0))
           for p in (4 / 5, 3 / 4, 2 / 3, 1 / 2)]
    exp = half_up((sum(lnp) / 4.0 + 0) / 1e6, 6)  # equal len: BP term 0
    assert r.log_bleu == exp


def test_bleu_zero_and_short_cases(spark):
    out = _bleu_rows(spark, [
        (0, "x y z w q", "a b c d e"),   # zero overlap -> NULL
        (1, "a b c", "a b c"),           # cand shorter than max_n -> NULL
        (2, "a b c d", "a b c d e f g h")])  # brevity penalty active
    assert out[0].log_bleu is None and out[0].p1 == 0.0
    assert out[1].log_bleu is None and out[1].p1 == 1.0
    r = out[2]
    assert (r.p1, r.p2, r.p3, r.p4) == (1.0, 1.0, 1.0, 1.0)
    # ln BP = 1 - 8/4 = -1
    assert r.log_bleu == -1.0


def test_bleu_clipping(spark):
    # cand repeats 'a' 5x, ref has 'a' twice -> clip1 = 2
    out = _bleu_rows(spark, [(0, "a a a a a", "a b a c d")])
    assert out[0].p1 == round(2 / 5, 6)


# -------------------------------------------------- Simple Good-Turing
def test_good_turing_closed_form(spark):
    import math

    from connectors_spark.functions.text import good_turing_estimate

    # freqs: a,b,c x1; d,e x2; f x3 -> N1=3, N2=2, N3=1, N=10 tokens
    docs = spark.createDataFrame(
        [(0, "a b c d d e"), (1, "e f f f")], "doc_id long, text string")
    out = {r.r: r for r in good_turing_estimate(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert [out[r].n_r for r in (1, 2, 3)] == [3, 2, 1]
    assert out[1].p0 == 0.3  # N1/N = 3/10
    # independent Z/OLS replay
    z = {1: 3 / (0.5 * 2), 2: 2 / (0.5 * 2), 3: 1 / (0.5 * (4 - 2))}
    xu = {r: round(round(math.log(r), 6) * 1e6) for r in z}
    yu = {r: round(round(math.log(v), 6) * 1e6) for r, v in z.items()}
    n = 3.0
    sx, sy = float(sum(xu.values())), float(sum(yu.values()))
    sxx = float(sum(v * v for v in xu.values()))
    sxy = float(sum(xu[r] * yu[r] for r in z))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out[1].slope_b == round(b, 6)
    for r in (1, 2, 3):
        assert out[r].r_star == round((r + 1.0) * ((r + 1.0) / r) ** b, 6)
    # proper SGT needs b < -1 on Zipfian data; this toy set is just
    # decreasing, so only sanity-check the direction
    assert b < 0


def test_good_turing_unseen_mass_drops_with_coverage(spark, sf_dir):
    from connectors_spark.functions.text import good_turing_estimate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = good_turing_estimate(docs).collect()
    p0 = rows[0].p0
    # closed 31-word vocabulary at sf0.001+: almost no singleton terms
    assert 0.0 <= p0 < 0.05
    assert all(r.r_star > 0 for r in rows)


# ------------------------------------------------ regexp/prefix queries
def test_term_pattern_query_modes(spark):
    import pytest as _pytest

    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import term_pattern_query

    docs = spark.createDataFrame(
        [(0, "spark spam sort"), (1, "spark table"), (2, "other")],
        "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    pre = {r.doc_id: r.n_terms_matched for r in
           term_pattern_query(idx, "sp", mode="prefix").collect()}
    assert pre == {0: 2, 1: 1}  # spark+spam / spark; doc2 absent
    rx = {r.doc_id: r.n_terms_matched for r in
          term_pattern_query(idx, "s[a-z]*k", mode="regexp").collect()}
    assert rx == {0: 1, 1: 1}  # only 'spark' full-matches
    assert term_pattern_query(idx, "zzz", mode="prefix").count() == 0
    with _pytest.raises(ValueError):
        term_pattern_query(idx, "x", mode="glob")
