"""Incremental IVF vector store: init == one-shot IVF; upsert/delete
reflected; rank identity vs an independent frozen-centroid oracle."""

from __future__ import annotations

import math
import random

from connectors_spark.operators.similarity import ivf_cosine_topk
from connectors_spark.operators.vector_store import (
    delete_vectors,
    init_vector_store,
    query_topk,
    read_live,
    upsert_vectors,
)

MOD, NPROBE, K = 10, 3, 5


def _vecs(n, d=16, seed=5, offset=0):
    rng = random.Random(seed + offset)
    return [(i + offset, [rng.gauss(0, 1) for _ in range(d)])
            for i in range(n)]


def _df(spark, rows):
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<double>")


def _topk(df):
    return sorted((r.query_id, r.rank, r.vec_id, r.cos)
                  for r in df.collect())


def _cos6(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(dot / (na * nb), 6)


def _oracle_topk(live: dict, centroids: dict, queries: dict,
                 k: int, nprobe: int):
    """Pure-Python IVF-Flat with FROZEN centroids — mirrors the store's
    conventions (rounded cosine, lowest-id tie-breaks)."""
    assign = {}
    for vid, v in live.items():
        best = min(((-_cos6(v, cv), cell)
                    for cell, cv in centroids.items()))
        assign[vid] = best[1]
    out = []
    for qid, q in queries.items():
        probes = [cell for _, cell in sorted(
            ((-_cos6(q, cv), cell) for cell, cv in centroids.items())
        )[:nprobe]]
        cand = [vid for vid, v in live.items()
                if assign[vid] in probes and vid != qid]
        ranked = sorted(cand,
                        key=lambda vid: (-_cos6(q, live[vid]), vid))[:k]
        for r, vid in enumerate(ranked, start=1):
            out.append((qid, r, vid, _cos6(q, live[vid])))
    return sorted(out)


def test_init_matches_oneshot_ivf(spark, tmp_path):
    rows = _vecs(60)
    df = _df(spark, rows)
    store = str(tmp_path / "vs")
    init_vector_store(spark, store, df, centroid_mod=MOD)
    qs = df.filter("vec_id % 13 = 0")
    got = _topk(query_topk(spark, store, qs, k=K, nprobe=NPROBE))
    ref = _topk(ivf_cosine_topk(df, qs, k=K, centroid_mod=MOD,
                                nprobe=NPROBE))
    assert got == ref


def test_upsert_and_delete_then_rank_identical_to_oracle(spark,
                                                         tmp_path):
    rows = _vecs(60)
    df = _df(spark, rows)
    store = str(tmp_path / "vs")
    init_vector_store(spark, store, df, centroid_mod=MOD)

    new_rows = _vecs(5, offset=100)
    changed = [(7, [1.0] * 16), (21, [0.5] * 16), (33, [-1.0] * 16)]
    upsert_vectors(spark, store, _df(spark, new_rows + changed))
    delete_vectors(store, [2, 3, 44, 55])

    live_ids = {r.vec_id for r in read_live(spark, store).collect()}
    assert 100 in live_ids and 7 in live_ids
    assert 2 not in live_ids and 55 not in live_ids
    assert read_live(spark, store).filter("vec_id = 7") \
        .first().embedding == [1.0] * 16

    qs = _df(spark, rows).filter("vec_id % 13 = 0")
    got = _topk(query_topk(spark, store, qs, k=K, nprobe=NPROBE))

    live = {vid: emb for vid, emb in rows}
    for vid, emb in new_rows + changed:
        live[vid] = emb
    for vid in (2, 3, 44, 55):
        live.pop(vid, None)
    centroids = {vid: emb for vid, emb in rows if vid % MOD == 0}
    queries = {vid: emb for vid, emb in rows if vid % 13 == 0}
    assert got == _oracle_topk(live, centroids, queries, K, NPROBE)


def test_readd_after_delete(spark, tmp_path):
    rows = _vecs(30)
    store = str(tmp_path / "vs")
    init_vector_store(spark, store, _df(spark, rows), centroid_mod=MOD)
    delete_vectors(store, [5])
    assert 5 not in {r.vec_id
                     for r in read_live(spark, store).collect()}
    upsert_vectors(spark, store, _df(spark, [(5, [2.0] * 16)]))
    live5 = read_live(spark, store).filter("vec_id = 5").collect()
    assert len(live5) == 1 and live5[0].embedding == [2.0] * 16


def test_duplicate_vec_id_in_batch_rejected(spark, tmp_path):
    import pytest

    path = str(tmp_path / "store_dup")
    init_vector_store(spark, path, _df(spark, _vecs(20)), centroid_mod=MOD)
    rows = _vecs(3, offset=100)
    dup = _df(spark, rows + [rows[0]])  # vec_id 100 twice in one batch
    with pytest.raises(ValueError, match="duplicate vec_id"):
        upsert_vectors(spark, path, dup)
    # store unchanged: the live view still has exactly the init rows
    assert read_live(spark, path).count() == 20


def test_upsert_batch_over_id_budget_rejected(spark, tmp_path):
    """The driver-side id collection is bounded by contract: a batch
    beyond max_batch_ids fails fast (before any generation write)."""
    import os

    import pytest

    from connectors_spark.operators.vector_store import (
        init_vector_store, upsert_vectors,
    )

    path = str(tmp_path / "vs")
    base = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>")
    init_vector_store(spark, path, base)
    batch = spark.createDataFrame(
        [(100 + i, [0.5, float(i)]) for i in range(5)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="max_batch_ids"):
        upsert_vectors(spark, path, batch, max_batch_ids=3)
    assert not os.path.exists(os.path.join(path, "gen-1.parquet"))
    # under the bound the same batch lands
    assert upsert_vectors(spark, path, batch, max_batch_ids=5) == 1
