"""ANN operators vs a NumPy oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.similarity import (
    brute_force_cosine_topk,
    ivf_cosine_topk,
)

N, DIM = 400, 16


@pytest.fixture(scope="module")
def vecs_np():
    rng = np.random.RandomState(11)
    return rng.randn(N, DIM).astype(np.float32)


@pytest.fixture(scope="module")
def vecs(spark, vecs_np):
    rows = [(i, vecs_np[i].tolist()) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _oracle_topk(vecs_np, qids, k):
    v = vecs_np.astype(np.float64)
    norms = np.sqrt((v * v).sum(axis=1))
    out = {}
    for qi in qids:
        cos = np.round(v @ v[qi] / (norms * norms[qi]), 6)
        cand = [(c, i) for i, c in enumerate(cos) if i != qi]
        cand.sort(key=lambda t: (-t[0], t[1]))
        out[qi] = cand[:k]
    return out


def test_brute_force_matches_oracle(spark, vecs, vecs_np):
    qids = [0, 50, 100]
    qdf = vecs.filter(F.col("vec_id").isin(qids))
    got = brute_force_cosine_topk(vecs, qdf, k=5).collect()
    exp = _oracle_topk(vecs_np, qids, 5)
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)
    for qi in qids:
        assert [r.vec_id for r in by_q[qi]] == [i for _, i in exp[qi]]
        assert np.allclose([r.cos for r in by_q[qi]],
                           [c for c, _ in exp[qi]], atol=1e-6)


def test_ivf_recall_and_exactness_of_scores(spark, vecs, vecs_np):
    qids = [0, 100, 200]
    qdf = vecs.filter(F.col("vec_id").isin(qids))
    got = ivf_cosine_topk(vecs, qdf, k=5, centroid_mod=20, nprobe=8).collect()
    exp = _oracle_topk(vecs_np, qids, 5)
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)
    exp_sets = {qi: {i for _, i in exp[qi]} for qi in qids}
    hits = total = 0
    for qi in qids:
        assert len(by_q[qi]) == 5
        got_ids = {r.vec_id for r in by_q[qi]}
        hits += len(got_ids & exp_sets[qi])
        total += 5
        # every returned cos is the exact cosine (scores never approximated)
        v = vecs_np.astype(np.float64)
        norms = np.sqrt((v * v).sum(axis=1))
        for r in by_q[qi]:
            exact = round(float(v[r.vec_id] @ v[qi] / (norms[r.vec_id] * norms[qi])), 6)
            assert r.cos == pytest.approx(exact, abs=1e-6)
    assert hits / total >= 0.5  # nprobe=8/20 cells -> decent recall


def test_embedding_near_dups_finds_perturbed(spark):
    """SRP-LSH + exact-cosine verify: perturbed copies are found at a
    production threshold; random vectors never pair."""
    import random

    from connectors_spark.operators.similarity import embedding_near_dups

    rng = random.Random(7)
    dim = 32

    def vec():
        return [rng.gauss(0, 1) for _ in range(dim)]

    base = [vec() for _ in range(20)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # ids 100+i: tiny perturbation of i -> cos ~ 0.999
        rows.append((100 + i, [float(x + rng.gauss(0, 0.02)) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = embedding_near_dups(df, threshold=0.95, dim=dim)
    got = {(r.doc_a, r.doc_b) for r in out.collect()}
    expected = {(i, 100 + i) for i in range(20)}
    # SRP with 4x4 bands has ~1 collision-miss in thousands at cos~0.999;
    # demand full recall here (deterministic planes, fixed seed)
    assert got == expected


def test_embedding_near_dups_identical_blowup_bounded(spark):
    """Thousands of identical embeddings: the star-edge bucket cap keeps
    candidate pairs O(n)."""
    from connectors_spark.operators.similarity import embedding_near_dups

    n = 3000
    rows = [(i, [1.0] * 16) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_near_dups(df, threshold=0.99, dim=16, bucket_cap=64)
    pairs = out.count()
    assert pairs == n - 1  # star around vec 0, not n*(n-1)/2


def test_ivf_kmeans_rounds_improve_recall(spark):
    """Lloyd refinement of the deterministic seed centroids improves
    IVF recall on clustered data with badly-placed seeds."""
    import random

    from connectors_spark.operators.similarity import (
        brute_force_cosine_topk, ivf_cosine_topk,
    )

    rng = random.Random(11)
    dim, n_clusters, per = 16, 8, 40
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
    rows = []
    # round-robin cluster membership => the every-50th seeds all land in
    # even clusters (50 % 8 == 2): a deliberately bad seeding
    for vid in range(n_clusters * per):
        c = centers[vid % n_clusters]
        rows.append((vid, [float(x + rng.gauss(0, 0.15)) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    queries = df.filter(F.col("vec_id") % 79 == 3)

    exact = {(r.query_id, r.vec_id)
             for r in brute_force_cosine_topk(df, queries, k=10).collect()}

    def recall(rounds):
        got = {(r.query_id, r.vec_id)
               for r in ivf_cosine_topk(df, queries, k=10, centroid_mod=50,
                                        nprobe=2, kmeans_rounds=rounds).collect()}
        return len(exact & got) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0, (r0, r2)
    assert r2 > 0.5, (r0, r2)  # refined centroids give usable recall


def test_fixed_centroid_count_independent_of_corpus_size(spark):
    """The scale-correct seeding: n_centroids fixes the broadcast size
    regardless of corpus size (the legacy centroid_mod sampler yields
    n/mod centroids — O(n) broadcast at 1e9 vectors, the r3 scale
    finding). Also deterministic across calls."""
    from connectors_spark.operators.similarity import init_centroids_fixed

    rng = np.random.RandomState(7)
    for n in (100, 1000):
        rows = [(i, rng.randn(8).astype(np.float32).tolist())
                for i in range(n)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cents = init_centroids_fixed(df, 32)
        assert cents.count() == 32, n
        a = sorted(r.cell for r in cents.collect())
        b = sorted(r.cell for r in init_centroids_fixed(df, 32).collect())
        assert a == b  # deterministic


def test_ivf_fixed_centroids_recall(spark, vecs, vecs_np):
    """n_centroids default path: exact per-candidate scores and usable
    recall vs brute force (approximate method — candidate SET may
    differ, scores of returned candidates may not)."""
    qids = [0, 100, 200, 300]
    qdf = vecs.filter(F.col("vec_id").isin(qids))
    got = ivf_cosine_topk(vecs, qdf, k=10, n_centroids=20, nprobe=8).collect()
    exp = _oracle_topk(vecs_np, qids, 10)
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)
    # scores of whatever candidates IVF returns are the exact cosines
    v = vecs_np.astype(np.float64)
    norms = np.sqrt((v * v).sum(axis=1))
    hits = total = 0
    for qi in qids:
        assert len(by_q[qi]) > 0
        for r in by_q[qi]:
            true_cos = round(float(v[r.vec_id] @ v[qi]
                                   / (norms[r.vec_id] * norms[qi])), 6)
            assert abs(r.cos - true_cos) <= 1e-6
        exact_ids = {i for _, i in exp[qi]}
        hits += sum(1 for r in by_q[qi] if r.vec_id in exact_ids)
        total += len(exp[qi])
    assert hits / total > 0.3, hits / total  # pruned search, random corpus


def test_ivf_rejects_both_seeding_modes(spark, vecs):
    with pytest.raises(ValueError):
        ivf_cosine_topk(vecs, vecs.limit(1), centroid_mod=10, n_centroids=10)


def test_semdedup_keeps_peripheral_member(spark):
    from connectors_spark.operators.similarity import (
        init_centroids_fixed, kmeans_refine, semdedup)

    # two tight clusters on orthogonal axes; within cluster A, vectors
    # 1 and 2 are near-identical (cos ~1), 3 is distinct; cluster B has
    # a lone vector plus a near-dup pair (5, 6)
    rows = [
        (1, [1.0, 0.02, 0.0]), (2, [1.0, 0.021, 0.0]),
        (3, [0.6, 0.8, 0.0]),
        (4, [0.0, 0.8, 0.6]), (5, [0.01, 0.0, 1.0]),
        (6, [0.011, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0])],
        "cell long, cv array<double>")
    out = semdedup(emb, 0.995, cents)
    got = {r.vec_id: (r.cell, r.keep) for r in out.collect()}
    assert len(got) == 6
    assert got[3] == (0, True)                  # distinct -> kept
    # pair (1,2): keep the LOWER centroid-similarity member
    ccos = {r.vec_id: r.ccos for r in out.collect()}
    kept_a = 1 if ccos[1] < ccos[2] else 2
    assert got[kept_a][1] is True
    assert got[3 - kept_a][1] is False
    # cluster B: 4 is kept (not a dup of 5/6 at tau), one of 5/6 drops
    assert got[4][1] is True
    assert sorted([got[5][1], got[6][1]]) == [False, True]
    # fixed-size seeding + refine path still yields a full assignment
    seeds = init_centroids_fixed(emb, 2)
    ref = kmeans_refine(emb, seeds, rounds=1)
    out2 = semdedup(emb, 0.995, ref)
    assert out2.count() == 6
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan


def test_standardize_embeddings_stats(spark):
    import numpy as np
    from connectors_spark.operators.similarity import (
        standardize_embeddings)

    rng = np.random.default_rng(2)
    vecs = rng.normal(loc=[5.0, -3.0, 0.0], scale=[2.0, 0.5, 1.0],
                      size=(50, 3))
    vecs[:, 2] = 7.0  # zero-variance dim
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<double>")
    out = standardize_embeddings(df)
    mat = np.array([r.std_embedding for r in
                    sorted(out.collect(), key=lambda r: r.vec_id)])
    # standardized: mean ~0, population std ~1 per non-constant dim
    assert np.allclose(mat[:, :2].mean(axis=0), 0.0, atol=1e-9)
    assert np.allclose(mat[:, :2].std(axis=0), 1.0, atol=1e-9)
    # zero-variance dim maps to exactly 0
    assert (mat[:, 2] == 0.0).all()
    # matches the NumPy reference transform
    ref = (vecs[:, :2] - vecs[:, :2].mean(axis=0)) / vecs[:, :2].std(axis=0)
    assert np.allclose(mat[:, :2], ref, atol=1e-9)


def test_pca_matches_numpy_reference(spark):
    import numpy as np
    from connectors_spark.operators.similarity import pca_fit, pca_project

    rng = np.random.default_rng(4)
    # anisotropic cloud: variance concentrated in 2 known directions
    base = rng.normal(size=(200, 2)) @ np.diag([5.0, 2.0])
    mix = rng.normal(size=(2, 6)) * 0.2
    X = base @ np.array([[1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0]]) \
        + rng.normal(size=(200, 6)) * 0.05 + np.arange(6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(200)],
        "vec_id long, embedding array<double>")
    comps, mean, ratio = pca_fit(df, k=2)
    # NumPy reference on the same data
    Xc = X - X.mean(axis=0)
    vals, vecs = np.linalg.eigh(np.cov(X.T, bias=True))
    order = np.argsort(vals)[::-1][:2]
    ref = vecs[:, order].T
    for i in range(2):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    assert np.allclose(comps, ref, atol=1e-8)
    assert ratio > 0.95  # two directions dominate by construction
    # distributed projection == NumPy projection
    proj = {r.vec_id: r.pc for r in pca_project(df, comps, mean).collect()}
    ref_proj = Xc @ np.asarray(comps).T
    for i in range(200):
        assert np.allclose(proj[i], ref_proj[i], atol=1e-8)


def test_pca_partition_invariant(spark):
    import numpy as np
    from connectors_spark.operators.similarity import pca_fit

    rng = np.random.default_rng(8)
    X = rng.normal(size=(90, 4))
    rows = [(i, [float(x) for x in X[i]]) for i in range(90)]
    a = pca_fit(spark.createDataFrame(rows, "vec_id long, "
                "embedding array<double>").repartition(1), k=2)
    b = pca_fit(spark.createDataFrame(rows, "vec_id long, "
                "embedding array<double>").repartition(7), k=2)
    assert np.allclose(a[0], b[0], atol=1e-9)
    assert np.allclose(a[1], b[1], atol=1e-12)


def test_knn_outliers_planted_isolate(spark):
    # 6 clustered vectors + 1 isolate: the isolate must top the ranking
    import numpy as np
    from connectors_spark.operators.similarity import knn_distance_outliers

    rng = np.random.default_rng(7)
    base = rng.normal(0, 0.05, 8)
    rows = [(i, (base + rng.normal(0, 0.01, 8) + 1.0).tolist())
            for i in range(6)]
    rows.append((99, (-np.ones(8)).tolist()))  # opposite direction
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_distance_outliers(df, k=3, top_n=7).collect()
    assert out[0]["vec_id"] == 99
    assert out[0]["score"] > out[1]["score"] + 0.5  # decisively isolated


def test_nndescent_graph_shape_and_determinism(spark, vecs):
    """NN-descent graph (Dong et al. 2011): degree <= k, no self-edges,
    exact rounded cosines on every edge, and the edge set is identical
    across input partitionings (the engine-determinism convention)."""
    from connectors_spark.operators.similarity import nndescent_knn_graph

    g1 = nndescent_knn_graph(vecs, k=5, iters=1, centroid_mod=20)
    rows = g1.collect()
    by_node = {}
    for r in rows:
        assert r.vec_id != r.nbr
        by_node.setdefault(r.vec_id, []).append((r.rank, r.nbr, r.cos))
    for node, edges in by_node.items():
        assert len(edges) <= 5
        ranks = sorted(r for r, _, _ in edges)
        assert ranks == list(range(1, len(edges) + 1))

    g2 = nndescent_knn_graph(vecs.repartition(7), k=5, iters=1,
                             centroid_mod=20)
    assert sorted((r.vec_id, r.rank, r.nbr, r.cos) for r in g2.collect()) \
        == sorted((r.vec_id, r.rank, r.nbr, r.cos) for r in rows)


def test_nndescent_iterations_improve_graph(spark, vecs, vecs_np):
    """Each NN-descent round may only improve (never worsen) the summed
    edge cosine per node — candidates always include the current
    neighbors — and the refined graph's edges get closer to the true
    kNN than the cell-seeded graph."""
    from connectors_spark.operators.similarity import nndescent_knn_graph

    def edge_quality(iters):
        g = nndescent_knn_graph(vecs, k=5, iters=iters, centroid_mod=20)
        got = {}
        for r in g.collect():
            got.setdefault(r.vec_id, set()).add(r.nbr)
        exp = _oracle_topk(vecs_np, list(got), 5)
        hits = sum(len(nbrs & {i for _, i in exp[n]})
                   for n, nbrs in got.items())
        total = sum(len(nbrs) for nbrs in got.values())
        return hits / total

    q0, q2 = edge_quality(0), edge_quality(2)
    assert q2 >= q0
    # random isotropic Gaussians are the hard case for any graph
    # method (no cluster structure to exploit) — assert a measured
    # floor here; the clustered test below pins the strong bound
    assert q2 >= 0.25


def test_nndescent_clustered_corpus_recovers_true_neighbors(spark):
    """On clustered data — the case graph indexes exist for — the
    refined graph's edges are almost entirely true nearest neighbors,
    and beam search attains near-exact recall."""
    from connectors_spark.operators.similarity import (
        graph_beam_topk, nndescent_knn_graph,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(20, 16) * 5.0
    # block layout (cluster = i // 20): the mod-20 entry seed then has
    # exactly one member per cluster — i % 20 would park EVERY seed in
    # cluster 0 and beam search could never leave it (entry coverage
    # depends on seed diversity; same reason HNSW carries upper layers)
    pts = np.vstack([
        centers[i // 20] + rng.randn(16) * 0.3 for i in range(400)
    ]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(400)],
        "vec_id long, embedding array<float>")

    graph = nndescent_knn_graph(df, k=5, iters=2, centroid_mod=20)
    got = {}
    for r in graph.collect():
        got.setdefault(r.vec_id, set()).add(r.nbr)
    exp = _oracle_topk(pts, list(got), 5)
    hits = sum(len(nbrs & {i for _, i in exp[n]}) for n, nbrs in got.items())
    total = sum(len(nbrs) for nbrs in got.values())
    assert hits / total >= 0.8

    qids = [0, 111, 222, 333]
    qdf = df.filter(F.col("vec_id").isin(qids))
    res = graph_beam_topk(df, qdf, graph, k=5, beam=4, hops=2,
                          centroid_mod=20).collect()
    qexp = _oracle_topk(pts, qids, 5)
    q_hits = sum(1 for r in res
                 if r.vec_id in {i for _, i in qexp[r.query_id]})
    assert q_hits / (len(qids) * 5) >= 0.8


def test_graph_beam_search_recall_and_exact_scores(spark, vecs, vecs_np):
    """Beam search over the NN-descent graph: returned cosines are the
    exact rounded values (approximation affects WHICH candidates are
    seen, never their scores), recall@5 is decent at beam 4, and a
    wider beam never lowers recall on this corpus."""
    from connectors_spark.operators.similarity import (
        graph_beam_topk, nndescent_knn_graph,
    )

    qids = [0, 100, 200, 300]
    qdf = vecs.filter(F.col("vec_id").isin(qids))
    graph = nndescent_knn_graph(vecs, k=5, iters=2, centroid_mod=20)
    exp = _oracle_topk(vecs_np, qids, 5)

    def recall(beam):
        got = graph_beam_topk(vecs, qdf, graph, k=5, beam=beam, hops=2,
                              centroid_mod=20).collect()
        v = vecs_np.astype(np.float64)
        norms = np.sqrt((v * v).sum(axis=1))
        hits = 0
        for r in got:
            exact = round(float(v[r.vec_id] @ v[r.query_id]
                                / (norms[r.vec_id] * norms[r.query_id])), 6)
            assert r.cos == pytest.approx(exact, abs=1e-6)
            if r.vec_id in {i for _, i in exp[r.query_id]}:
                hits += 1
        return hits / (len(qids) * 5)

    r2, r6 = recall(2), recall(6)
    assert r6 >= r2
    assert r6 >= 0.5
