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
