"""Rank correlation (Kendall/Spearman), ROC-AUC, readability,
moving_fn model family — closed-form oracles."""

import math

import pytest

from pyspark.sql import functions as F


def _runs(spark, perm_b):
    """run_a ranks docs 1..n in order d0..d{n-1}; run_b applies perm_b
    (list of doc indices in run_b rank order)."""
    n = len(perm_b)
    a = spark.createDataFrame(
        [("q", i + 1, f"d{i}") for i in range(n)],
        "query_id string, rank int, doc_id string")
    b = spark.createDataFrame(
        [("q", r + 1, f"d{perm_b[r]}") for r in range(n)],
        "query_id string, rank int, doc_id string")
    return a, b


def test_rank_correlation_identity_and_reversal(spark):
    from connectors_spark.operators.query import rank_correlation

    a, b = _runs(spark, [0, 1, 2, 3, 4])
    r = rank_correlation(a, b, k=5).collect()[0]
    assert (r.overlap_m, r.tau, r.rho) == (5, 1.0, 1.0)
    a, b = _runs(spark, [4, 3, 2, 1, 0])
    r = rank_correlation(a, b, k=5).collect()[0]
    assert (r.tau, r.rho) == (-1.0, -1.0)


def test_rank_correlation_single_swap(spark):
    from connectors_spark.operators.query import rank_correlation

    # one adjacent swap among 4: C=5, D=1 -> tau = 4/6; sum d^2 = 2
    # -> rho = 1 - 12/(4*15) = 0.8
    a, b = _runs(spark, [0, 2, 1, 3])
    r = rank_correlation(a, b, k=4).collect()[0]
    assert r.n_concordant == 5 and r.n_discordant == 1
    assert r.tau == round(4 / 6, 6)
    assert r.rho == 0.8


def test_rank_correlation_partial_overlap_and_degenerate(spark):
    from connectors_spark.operators.query import rank_correlation

    # run_b shares only d0, d2 with run_a; within the intersection
    # their relative order agrees -> tau = rho = 1 over m=2
    a = spark.createDataFrame(
        [("q", 1, "d0"), ("q", 2, "d1"), ("q", 3, "d2")],
        "query_id string, rank int, doc_id string")
    b = spark.createDataFrame(
        [("q", 1, "d0"), ("q", 2, "x"), ("q", 3, "d2")],
        "query_id string, rank int, doc_id string")
    r = rank_correlation(a, b, k=3).collect()[0]
    assert (r.overlap_m, r.tau, r.rho) == (2, 1.0, 1.0)
    # m < 2 -> NULL statistics, query still present
    c = spark.createDataFrame(
        [("q", 1, "zz")], "query_id string, rank int, doc_id string")
    r = rank_correlation(a, c, k=3).collect()[0]
    assert r.overlap_m == 0 and r.tau is None and r.rho is None


def test_rank_correlation_matches_scipy_formulas(spark):
    from connectors_spark.operators.query import rank_correlation

    perm = [3, 0, 4, 1, 5, 2]
    a, b = _runs(spark, perm)
    r = rank_correlation(a, b, k=6).collect()[0]
    n = len(perm)
    rb = {f"d{doc}": i + 1 for i, doc in enumerate(perm)}
    ra = {f"d{i}": i + 1 for i in range(n)}
    conc = disc = 0
    docs = sorted(ra, key=ra.get)
    for i in range(n):
        for j in range(i + 1, n):
            d = (rb[docs[j]] - rb[docs[i]])
            conc += d > 0
            disc += d < 0
    tau = (conc - disc) * 2.0 / (n * (n - 1))
    sum_d2 = sum((ra[d] - rb[d]) ** 2 for d in ra)
    rho = 1 - 6 * sum_d2 / (n * (n * n - 1))
    assert r.tau == round(tau, 6)
    assert r.rho == round(rho, 6)


def test_roc_auc_closed_form(spark):
    from connectors_spark.operators.classifier import roc_auc

    # perfect separation
    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "score double, y int")
    r = roc_auc(df).collect()[0]
    assert (r.n, r.n_pos, r.n_neg, r.auc, r.gini) == (4, 2, 2, 1.0, 1.0)
    # one inversion among 2x2: 3 of 4 pairs correct
    df = spark.createDataFrame(
        [(0.9, 1), (0.3, 1), (0.5, 0), (0.1, 0)], "score double, y int")
    r = roc_auc(df).collect()[0]
    assert r.auc == 0.75 and r.gini == 0.5


def test_roc_auc_ties_use_midranks(spark):
    from connectors_spark.operators.classifier import roc_auc

    # all scores equal -> AUC exactly 0.5 via midranks
    df = spark.createDataFrame(
        [(0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0)], "score double, y int")
    assert roc_auc(df).collect()[0].auc == 0.5
    # tie between one pos and one neg: pairs = (1 win + 0.5 tie)/2
    df = spark.createDataFrame(
        [(0.9, 1), (0.5, 1), (0.5, 0)], "score double, y int")
    assert roc_auc(df).collect()[0].auc == 0.75


def test_roc_auc_degenerate_single_class(spark):
    from connectors_spark.operators.classifier import roc_auc

    df = spark.createDataFrame([(0.9, 1), (0.5, 1)], "score double, y int")
    r = roc_auc(df).collect()[0]
    assert r.auc is None and r.gini is None and r.n_pos == 2


def test_roc_auc_matches_sklearn_formula(spark):
    from connectors_spark.operators.classifier import roc_auc

    rows = [(round(((i * 37) % 11) / 10.0, 6), 1 if i % 3 == 0 else 0)
            for i in range(60)]
    df = spark.createDataFrame(rows, "score double, y int")
    got = roc_auc(df).collect()[0]
    # independent midrank computation
    import collections
    by = collections.Counter()
    npos_by = collections.Counter()
    for s, y in rows:
        by[s] += 1
        npos_by[s] += y
    c = 0
    r2 = 0
    for s in sorted(by):
        c_lt, c_le = c, c + by[s]
        r2 += npos_by[s] * (c_lt + c_le + 1)
        c = c_le
    n_pos = sum(y for _, y in rows)
    n_neg = len(rows) - n_pos
    auc = (r2 - n_pos * (n_pos + 1)) / (2 * n_pos * n_neg)
    assert got.auc == round(auc, 6)


def test_readability_closed_form(spark):
    from connectors_spark.functions.text import readability

    df = spark.createDataFrame(
        [(1, "The cat sat on the mat. It was flat!"),
         (2, ""),
         (3, "zzz zz z")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in readability(df).collect()}
    r = rows[1]
    # words=9, sentences=2, vowel runs: e,a,a,o,e,a,i,a,a -> 9
    assert (r.n_words, r.n_sentences, r.n_syllables) == (9, 2, 9)
    w, s, y = 9, 2, 9
    assert r.flesch == round(206.835 - 1.015 * w / s - 84.6 * y / w, 6)
    assert r.fk_grade == round(0.39 * w / s + 11.8 * y / w - 15.59, 6)
    # empty text -> zero words -> NULL scores
    assert rows[2].n_words == 0 and rows[2].flesch is None
    # all-consonant tokens: 0 syllables, scores still defined
    assert rows[3].n_syllables == 0 and rows[3].flesch is not None


def test_moving_fn_weights_rows_sum_to_one(spark):
    from connectors_spark.operators.timeseries import moving_fn_weights

    rows = moving_fn_weights(7)
    for L in range(1, 8):
        sub = [r for r in rows if r[0] == L]
        assert len(sub) == L
        assert sum(r[2] for r in sub) == sub[0][3]          # lwa
        assert sum(r[4] for r in sub) == sub[0][5]          # ewma
        assert sum(r[6] for r in sub) == sub[0][7]          # holt


def test_moving_fn_models_matches_float_recurrences(spark):
    from connectors_spark.operators.timeseries import moving_fn_models

    xs = [5, 9, 2, 14, 7, 3, 11, 8, 6]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(xs)], "g string, t int, n int")
    out = {r.t: r for r in
           moving_fn_models(df, "g", "t", "n", window=7).collect()}
    assert len(out) == len(xs)
    a, bt, W = 0.3, 0.1, 7
    for t in range(len(xs)):
        win = xs[max(0, t - W + 1): t + 1]
        L = len(win)
        lwa = sum((i + 1) * v for i, v in enumerate(win)) / (L * (L + 1) / 2)
        ew = win[0]
        for v in win[1:]:
            ew = a * v + (1 - a) * ew
        s, b = win[0], 0.0
        for v in win[1:]:
            sn = a * v + (1 - a) * (s + b)
            b = bt * (sn - s) + (1 - bt) * b
            s = sn
        assert out[t].lwa == pytest.approx(lwa, abs=2e-6)
        assert out[t].ewma == pytest.approx(ew, abs=2e-6)
        assert out[t].holt == pytest.approx(s, abs=2e-6)


def test_moving_fn_models_window_restart_per_key(spark):
    from connectors_spark.operators.timeseries import moving_fn_models

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 20), ("b", 0, 100)],
        "g string, t int, n int")
    out = {(r.g, r.t): r for r in
           moving_fn_models(df, "g", "t", "n", window=7).collect()}
    # first bucket of each key: every model equals the value itself
    assert out[("a", 0)].lwa == 10.0 == out[("a", 0)].holt
    assert out[("b", 0)].ewma == 100.0
    # second bucket: lwa = (1*10+2*20)/3, ewma/holt seeded at 10
    assert out[("a", 1)].lwa == round(50 / 3, 6)
    assert out[("a", 1)].ewma == 0.3 * 20 + 0.7 * 10


def test_chrf_identity_and_disjoint(spark):
    from connectors_spark.functions.text import chrf_pairs

    df = spark.createDataFrame(
        [(1, "Hello World", "hello  world"),   # identical after strip
         (2, "abc", "xyz"),                    # fully disjoint chars
         (3, "", "")],
        "pair_id long, cand_text string, ref_text string")
    rows = {r.pair_id: r for r in chrf_pairs(df, max_n=3).collect()}
    assert rows[1].chrf == 1.0 and rows[1].f3 == 1.0
    assert rows[2].chrf == 0.0 and rows[2].f1 == 0.0
    assert rows[3].chrf is None


def test_chrf_closed_form_single_order(spark):
    from connectors_spark.functions.text import chrf_pairs

    # cand "aab", ref "ab": unigrams m = min(2,1)+min(1,1) = 2,
    # tc=3, tr=2 -> F = 5*2/(4*2+3) = 10/11
    df = spark.createDataFrame(
        [(1, "aab", "ab")], "pair_id long, cand_text string, ref_text string")
    r = chrf_pairs(df, max_n=1).collect()[0]
    assert r.f1 == round(round(5 * 2 * 1e6 / 11) / 1e6, 6)
    assert r.chrf == r.f1


def test_chrf_recall_weighted(spark):
    from connectors_spark.functions.text import chrf_pairs

    # beta=2 weights recall: a candidate missing ref content scores
    # LOWER than a candidate with extra content, at equal overlap
    df = spark.createDataFrame(
        [(1, "ab", "abcd"),    # recall 2/4, precision 2/2
         (2, "abcd", "ab")],   # recall 2/2, precision 2/4
        "pair_id long, cand_text string, ref_text string")
    rows = {r.pair_id: r for r in chrf_pairs(df, max_n=1).collect()}
    assert rows[1].f1 < rows[2].f1


def test_tool_call_runs_islands(spark):
    from connectors_spark.operators.transcript_qc import tool_call_runs

    rows = [
        # conv 1: search x3 (loop), code, search again (new run)
        (1, 1, "a", "search"), (1, 3, "a", "search"), (1, 5, "a", "search"),
        (1, 7, "a", "code"), (1, 9, "a", "search"),
        # conv 2: no tools
        (2, 1, "a", ""),
    ]
    df = spark.createDataFrame(
        rows, "conv_id int, turn_idx int, role string, tool string")
    out = sorted(tool_call_runs(df).collect(),
                 key=lambda r: (r.conv_id, r.start_turn))
    assert [(r.tool, r.start_turn, r.end_turn, r.run_len, r.is_loop)
            for r in out] == [
        ("search", 1, 5, 3, True),
        ("code", 7, 7, 1, False),
        ("search", 9, 9, 1, False)]
    assert all(r.conv_id == 1 for r in out)


def test_tool_call_runs_interleaved_tools_split(spark):
    from connectors_spark.operators.transcript_qc import tool_call_runs

    # s c s c s: three separate search runs, two code runs — the
    # island trick must NOT merge non-adjacent same-tool calls
    rows = [(1, t, "a", tool) for t, tool in
            enumerate(["s", "c", "s", "c", "s"])]
    df = spark.createDataFrame(
        rows, "conv_id int, turn_idx int, role string, tool string")
    out = tool_call_runs(df).collect()
    assert len(out) == 5 and all(r.run_len == 1 for r in out)


def test_score_covariate_bias_perfect_line(spark):
    from connectors_spark.operators.classifier import score_covariate_bias

    # score = x/1000 exactly -> slope 0.001, r2 = 1
    df = spark.createDataFrame(
        [(float(x) / 1000, x) for x in range(100, 200)],
        "score double, x int")
    out = score_covariate_bias(df, n_bins=5)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r.r2 == 1.0 for r in rows)
    assert all(r.slope == 0.001 for r in rows)
    # bucket means follow the line
    lo = min(r.mean_x for r in rows)
    hi = max(r.mean_x for r in rows)
    assert lo < hi


def test_score_covariate_bias_no_correlation_and_degenerate(spark):
    from connectors_spark.operators.classifier import score_covariate_bias

    # constant score -> vy = 0 -> r2 NULL, slope 0
    df = spark.createDataFrame(
        [(0.5, x) for x in range(50)], "score double, x int")
    r = score_covariate_bias(df, n_bins=5).collect()[0]
    assert r.r2 is None and r.slope == 0.0
    # constant x -> undefined slope AND r2
    df = spark.createDataFrame(
        [(float(i % 7) / 10, 42) for i in range(50)], "score double, x int")
    r = score_covariate_bias(df, n_bins=5).collect()[0]
    assert r.slope is None and r.r2 is None
