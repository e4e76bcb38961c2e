"""Bit-vector hamming kNN (ES dense_vector element_type: bit) and the
Wilson lower-confidence-bound leaderboard."""

import math

import numpy as np

from connectors_spark.operators.graph import wilson_lower_bound
from connectors_spark.operators.similarity import (
    binary_hamming_topk,
    sign_bit_codes,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


# ------------------------------------------------------- sign-bit packing
def test_sign_bit_codes_known_words(spark):
    # 40 dims (NOT a multiple of 32): word0 = bits 0..31, word1 = bits 32..39
    v = [0.0] * 40          # >= 0 everywhere -> all bits set
    v2 = [-1.0] * 40
    v2[0] = 1.0             # only bit 0 of word 0
    v2[35] = 2.5            # only bit 3 of word 1
    out = {r.vec_id: list(r.code)
           for r in sign_bit_codes(_emb_df(spark, [v, v2]), dim=40).collect()}
    assert out[0] == [2**32 - 1, 2**8 - 1]
    assert out[1] == [1, 8]


def _np_hamming(V, qi):
    B = V >= 0
    return (B != B[qi]).sum(axis=1)


def test_hamming_topk_matches_numpy(spark):
    rng = np.random.RandomState(7)
    V = rng.randn(30, 40)
    df = _emb_df(spark, V)
    qs = df.filter("vec_id % 10 = 0")
    out = binary_hamming_topk(df, qs, k=5, dim=40).toPandas()
    for qi in (0, 10, 20):
        ham = _np_hamming(V, qi)
        expect = sorted(
            (int(h), i) for i, h in enumerate(ham) if i != qi)[:5]
        got = [tuple(x) for x in out[out.query_id == qi]
               .sort_values("rank")[["hamming", "vec_id"]].values]
        assert [(h, i) for h, i in expect] == got


def test_hamming_rescore_matches_numpy(spark):
    rng = np.random.RandomState(11)
    V = rng.randn(40, 32)
    df = _emb_df(spark, V)
    qs = df.filter("vec_id % 13 = 0")
    k, mult = 4, 3
    out = binary_hamming_topk(df, qs, k=k, dim=32,
                              rescore_mult=mult).toPandas()
    assert set(out.columns) == {"query_id", "rank", "vec_id", "cos"}
    Vf = np.stack([np.asarray(v, dtype=np.float32).astype(np.float64)
                   for v in V.astype(np.float32)])
    for qi in (0, 13, 26, 39):
        ham = _np_hamming(Vf, qi)
        cand = sorted((int(h), i) for i, h in enumerate(ham)
                      if i != qi)[: k * mult]
        q = Vf[qi]
        cos = {
            i: round(float(Vf[i] @ q)
                     / (np.linalg.norm(Vf[i]) * np.linalg.norm(q)), 6)
            for _, i in cand
        }
        expect = sorted(cos.items(), key=lambda t: (-t[1], t[0]))[:k]
        got = [(int(r.vec_id), float(r.cos))
               for r in out[out.query_id == qi]
               .sort_values("rank").itertuples()]
        assert [(i, c) for i, c in expect] == got


def test_hamming_self_excluded_and_bounded(spark):
    V = np.eye(6)
    df = _emb_df(spark, V)
    out = binary_hamming_topk(df, df, k=3, dim=6).toPandas()
    assert (out.vec_id != out.query_id).all()
    assert out.groupby("query_id")["rank"].max().le(3).all()


# --------------------------------------------------------------- Wilson
def _wilson(wins, n, z=1.96):
    p = wins / n
    z2 = z * z
    return round(
        (p + z2 / (2 * n) - z * math.sqrt(p * (1 - p) / n
                                          + z2 / (4 * n * n)))
        / (1 + z2 / n), 6)


def test_wilson_closed_form(spark):
    comps = spark.createDataFrame(
        [("a", "b")] * 3 + [("b", "a")] * 1 + [("a", "c")] * 2,
        "winner string, loser string")
    out = {r.item: r for r in wilson_lower_bound(comps).collect()}
    assert (out["a"].wins, out["a"].n) == (5, 6)
    assert (out["b"].wins, out["b"].n) == (1, 4)
    assert (out["c"].wins, out["c"].n) == (0, 2)
    for it in "abc":
        assert out[it].wilson_lb == _wilson(out[it].wins, out[it].n)


def test_wilson_low_sample_cannot_outrank(spark):
    # 2/2 wins (perfect but tiny) must rank BELOW 90/100 wins
    rows = ([("tiny", "x")] * 2
            + [("big", "y")] * 90 + [("y", "big")] * 10)
    comps = spark.createDataFrame(rows, "winner string, loser string")
    out = {r.item: r.wilson_lb for r in wilson_lower_bound(comps).collect()}
    assert out["big"] > out["tiny"]
    # zero-win item gets lb 0
    assert out["x"] == 0.0


# --------------------------------------------------------------- ROUGE-N
def test_rouge2_clipping_closed_form(spark):
    from connectors_spark.functions.text import rouge_n_overlap

    pairs = spark.createDataFrame(
        [
            # cand bigrams: [a b, b a, a b] ; ref bigrams: [a b, b c]
            # clip: min(2,1) for 'a b' = 1 -> P=1/3, R=1/2, F1=2/5
            (0, "a b a b", "a b c"),
            # identical -> P=R=F1=1
            (1, "x y z", "x y z"),
            # disjoint -> all 0
            (2, "p q", "r s"),
            # cand too short for bigrams -> P=0 (no div-by-zero), R=0
            (3, "p", "r s"),
        ],
        "pair_id long, cand_text string, ref_text string")
    out = {r.pair_id: r for r in rouge_n_overlap(pairs, n=2).collect()}
    assert (out[0].n_cand_grams, out[0].n_ref_grams, out[0].clip) == (3, 2, 1)
    assert (out[0].precision, out[0].recall, out[0].f1) == (
        round(1 / 3, 6), 0.5, 0.4)
    assert (out[1].precision, out[1].recall, out[1].f1) == (1.0, 1.0, 1.0)
    assert (out[2].clip, out[2].f1) == (0, 0.0)
    assert (out[3].n_cand_grams, out[3].precision, out[3].f1) == (0, 0.0, 0.0)


def test_rouge1_unigram_mode(spark):
    from connectors_spark.functions.text import rouge_n_overlap

    pairs = spark.createDataFrame(
        [(0, "the cat the", "the dog")],
        "pair_id long, cand_text string, ref_text string")
    r = rouge_n_overlap(pairs, n=1).collect()[0]
    # cand: the x2, cat x1; ref: the, dog -> clip = min(2,1) = 1
    assert (r.n_cand_grams, r.n_ref_grams, r.clip) == (3, 2, 1)
    assert r.precision == round(1 / 3, 6) and r.recall == 0.5


# --------------------------------------------------- calibration bins
def test_reliability_bins_closed_form(spark):
    from connectors_spark.operators.classifier import reliability_bins

    rows = [
        # bin 0: scores 0.0, 0.05; labels 0, 1 -> mean_s 0.025, mean_l 0.5
        (0.0, 0), (0.05, 1),
        # bin 9: score 1.0 folds into the TOP bin (not bin 10)
        (1.0, 1), (0.95, 1),
        # bin 5: perfectly calibrated cell -> gap 0
        (0.5, 1), (0.5, 0),
    ]
    df = spark.createDataFrame(rows, "score double, y int")
    out = {r.bin: r for r in reliability_bins(df).collect()}
    assert set(out) == {0, 5, 9}
    b0 = out[0]
    assert (b0.n, b0.mean_score, b0.mean_label) == (2, 0.025, 0.5)
    assert b0.gap == 0.475 and b0.ece_term == round(0.475 * 2 / 6, 6)
    assert out[9].n == 2 and out[9].mean_score == 0.975
    assert out[9].gap == 0.025
    assert out[5].gap == 0.0 and out[5].ece_term == 0.0
    # ECE = sum of terms
    ece = sum(r.ece_term for r in out.values())
    # each term is rounded to 6 decimals, so the sum carries <= n_bins
    # half-ulps of that rounding
    assert abs(ece - (0.475 * 2 + 0.025 * 2 + 0.0 * 2) / 6) < 2e-6


def test_reliability_bins_respects_n_bins(spark):
    from connectors_spark.operators.classifier import reliability_bins

    df = spark.createDataFrame(
        [(0.24, 0), (0.26, 1), (0.74, 0), (0.76, 1)], "score double, y int")
    out = {r.bin for r in reliability_bins(df, n_bins=4).collect()}
    assert out == {0, 1, 2, 3}


# ------------------------------------------------------ LTR feature log
def test_ltr_features_closed_form(spark):
    import math

    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import (
        ltr_feature_log, queries_df, score_topk_dataframe)

    docs = spark.createDataFrame(
        [(0, "spark spark fast"), (1, "spark slow"), (2, "other text")],
        "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [
        {"query_id": "q", "query_text": "spark fast", "k": 3}])
    out = {r.doc_id: r for r in ltr_feature_log(idx, qdf).collect()}
    # only docs 0 and 1 match any term
    assert set(out) == {0, 1}
    assert (out[0].n_matched, out[0].tf_sum, out[0].dl) == (2, 3, 3)
    assert (out[1].n_matched, out[1].tf_sum, out[1].dl) == (1, 1, 2)
    # idf_sum replays ES idf with the micro-unit convention
    def idf(df):
        return round(math.log(1.0 + (3 - df + 0.5) / (df + 0.5)), 6)
    assert out[0].idf_sum == round(
        (round(idf(2) * 1e6) + round(idf(1) * 1e6)) / 1e6, 6)
    assert out[1].idf_sum == round(round(idf(2) * 1e6) / 1e6, 6)
    # the candidate set and ranks are exactly the first-stage top-k
    topk = {(r.query_id, r.doc_id): r for r in
            score_topk_dataframe(idx, qdf, round_scores=6).collect()}
    for r in out.values():
        assert topk[("q", r.doc_id)].rank == r.rank
        assert topk[("q", r.doc_id)].score == r.score


# ------------------------------------------------------------- QPP
def test_qpp_closed_form_with_unindexed_term(spark):
    import math

    from connectors_spark.operators.build import build_index
    from connectors_spark.operators.query import (
        queries_df, query_performance_predict)

    docs = spark.createDataFrame(
        [(0, "spark fast engine"), (1, "spark slow"), (2, "other text")],
        "doc_id long, text string")
    idx = build_index(docs, with_positions=False)
    qdf = queries_df(spark, [
        {"query_id": "easy", "query_text": "engine", "k": 5},
        {"query_id": "broad", "query_text": "spark", "k": 5},
        {"query_id": "oov", "query_text": "spark zzmissing", "k": 5},
    ])
    out = {r.query_id: r for r in
           query_performance_predict(idx, qdf).collect()}

    def idf6(df):
        return round(math.log(1.0 + (3 - df + 0.5) / (df + 0.5)), 6)

    easy = out["easy"]
    assert (easy.n_terms, easy.n_indexed) == (1, 1)
    assert easy.max_idf == round(round(idf6(1) * 1e6) / 1e6, 6)
    assert easy.scope == round(1 / 3, 6)
    broad = out["broad"]
    assert broad.scope == round(2 / 3, 6)
    # broad (df=2) must read as LESS specific than easy (df=1)
    assert broad.max_idf < easy.max_idf
    oov = out["oov"]
    assert (oov.n_terms, oov.n_indexed) == (2, 1)
    assert oov.sum_idf == broad.sum_idf  # the OOV term adds nothing
