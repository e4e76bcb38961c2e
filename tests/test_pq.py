"""Product Quantization: code shape, ADC exactness on codeword-source
vectors, cluster-level recall on separated data."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from connectors_spark.operators.similarity import (
    pq_adc_topk,
    pq_codebooks_sampled,
    pq_encode,
)

M, K, D = 4, 8, 16


def _clustered(spark, n_per=12, n_clusters=4, seed=11):
    rng = random.Random(seed)
    centers = [[rng.uniform(-5, 5) for _ in range(D)]
               for _ in range(n_clusters)]
    rows = []
    for i in range(n_per * n_clusters):
        c = i // n_per  # block layout: id-stride codebook sampling
        rows.append((i, [centers[c][j] + rng.gauss(0, 0.05)  # hits all
                         for j in range(D)]))
    return (spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"), rows)


def test_codes_shape_and_range(spark):
    df, rows = _clustered(spark)
    cb = pq_codebooks_sampled(df, m_subs=M, k_codes=K)
    codes = pq_encode(df, cb, m_subs=M).collect()
    per_vec: dict = {}
    for r in codes:
        per_vec.setdefault(r.vec_id, []).append(r)
        assert 0 <= r.code < K and 0 <= r.m < M
    assert all(len(v) == M for v in per_vec.values())
    assert len(per_vec) == len(rows)


def test_adc_exact_for_codeword_source_vectors(spark):
    df, rows = _clustered(spark)
    n = len(rows)
    step = max(1, n // K)
    cb = pq_codebooks_sampled(df, m_subs=M, k_codes=K)
    codes = pq_encode(df, cb, m_subs=M)
    qs = df.filter(F.col("vec_id") == 1)
    got = {r.vec_id: r.approx_dot
           for r in pq_adc_topk(codes, cb, qs, k=n, m_subs=M).collect()}
    qv = dict(rows)[1]
    for vid, v in rows:
        # codeword-source vectors quantize to themselves: ADC == true dot
        if vid % step == 0 and vid < K * step and vid != 1:
            true = sum(a * b for a, b in zip(qv, v))
            assert abs(got[vid] - true) < 1e-4, vid


def test_recall_vs_exact_dot(spark):
    df, rows = _clustered(spark)
    cb = pq_codebooks_sampled(df, m_subs=M, k_codes=K)
    codes = pq_encode(df, cb, m_subs=M)
    qs = df.filter(F.col("vec_id") % 7 == 0)
    k = 5
    top = pq_adc_topk(codes, cb, qs, k=k, m_subs=M).collect()
    approx: dict = {}
    for r in top:
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    vecs = dict(rows)
    n_per = 12
    for qid, got in approx.items():
        qv = vecs[qid]
        exact = sorted(
            (vid for vid in vecs if vid != qid),
            key=lambda vid: (-sum(a * b for a, b in zip(qv, vecs[vid])),
                             vid))[:k]
        # PQ cannot rank within quantization noise (cluster jitter
        # 0.05), but it MUST agree at cluster granularity: the ADC
        # top-k and the exact top-k draw from the same cluster set
        assert {v // n_per for v in got} == {v // n_per for v in exact}, \
            (qid, sorted(got), exact)


def test_refined_codebooks_plug_into_encode_and_adc(spark):
    """kmeans_refine output (any (m, code, cw) frame) drives the same
    encode/ADC pipeline — the production training hook."""
    from connectors_spark.operators.similarity import kmeans_refine

    df, rows = _clustered(spark)
    cb = pq_codebooks_sampled(df, m_subs=M, k_codes=K)
    # refine subspace 0's codebook with one Lloyd round over the
    # subspace-0 data, then splice it back
    ds = D // M
    sub0 = df.select(
        "vec_id", F.slice("embedding", 1, ds).alias("embedding"))
    cents0 = cb.filter(F.col("m") == 0).select(
        F.col("code").alias("cell"), F.col("cw").alias("cv"))
    refined0 = kmeans_refine(sub0, cents0, rounds=1).select(
        F.lit(0).alias("m"), F.col("cell").alias("code"),
        F.col("cv").alias("cw"))
    cb2 = cb.filter(F.col("m") != 0).unionByName(refined0)
    codes = pq_encode(df, cb2, m_subs=M)
    qs = df.filter(F.col("vec_id") % 7 == 0)
    top = pq_adc_topk(codes, cb2, qs, k=3, m_subs=M).collect()
    assert len(top) == 3 * qs.count()
    per_vec = codes.groupBy("vec_id").count().collect()
    assert all(r["count"] == M for r in per_vec)
