"""MRL truncation: unit renorm, rank invariance, recall-vs-dim behavior."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from connectors_spark.operators.similarity import (
    brute_force_cosine_topk,
    matryoshka_truncate,
)


def _emb_df(spark, n=40, d=16, seed=3):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(d)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_renorm_produces_unit_vectors(spark):
    df, _ = _emb_df(spark)
    out = matryoshka_truncate(df, 8, renorm=True)
    norms = out.select(F.aggregate(
        "embedding", F.lit(0.0), lambda a, x: a + x * x).alias("n2")).collect()
    assert all(abs(r.n2 - 1.0) < 1e-9 for r in norms)
    assert out.select(F.size("embedding")).first()[0] == 8


def test_renorm_does_not_change_ranking(spark):
    df, _ = _emb_df(spark)
    qs_raw = matryoshka_truncate(df, 8, renorm=False).filter("vec_id % 13 = 0")
    qs_rn = matryoshka_truncate(df, 8, renorm=True).filter("vec_id % 13 = 0")
    raw = brute_force_cosine_topk(
        matryoshka_truncate(df, 8, renorm=False), qs_raw, k=5)
    rn = brute_force_cosine_topk(
        matryoshka_truncate(df, 8, renorm=True), qs_rn, k=5)
    a = sorted((r.query_id, r.rank, r.vec_id) for r in raw.collect())
    b = sorted((r.query_id, r.rank, r.vec_id) for r in rn.collect())
    assert a == b


def test_truncated_matches_numpy_oracle(spark):
    import numpy as np
    df, rows = _emb_df(spark)
    dim, k = 8, 5
    got = {(r.query_id, r.rank): r.vec_id
           for r in brute_force_cosine_topk(
               matryoshka_truncate(df, dim, renorm=False),
               matryoshka_truncate(df, dim, renorm=False)
               .filter("vec_id % 13 = 0"), k=k).collect()}
    M = np.array([v[:dim] for _i, v in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q in range(0, 40, 13):
        sims = M @ M[q]
        order = sorted((i for i in range(40) if i != q),
                       key=lambda i: (-round(sims[i], 6), i))[:k]
        for rank, vid in enumerate(order, start=1):
            assert got[(q, rank)] == vid


def test_zero_prefix_vector_stays_zero_and_dtype_consistent(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 8 + [1.0] * 8), (2, [1.0] * 16)],
        "vec_id long, embedding array<double>")
    rn = matryoshka_truncate(df, 8, renorm=True)
    raw = matryoshka_truncate(df, 8, renorm=False)
    assert dict(rn.dtypes)["embedding"] == dict(raw.dtypes)["embedding"]
    z = rn.filter("vec_id = 1").first().embedding
    assert z == [0.0] * 8  # not NULLs
