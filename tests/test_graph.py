"""PageRank + kNN-graph semantics (operators/graph.py)."""

import pytest

from connectors_spark.operators.graph import knn_edges, pagerank


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


def test_pagerank_uniform_ring_stays_uniform(spark):
    # directed ring: every node has in-degree 1 = out-degree 1 ->
    # uniform 1/n is the exact fixed point at every iteration
    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long")
    got = _ranks(pagerank(edges, iters=4))
    for v in got.values():
        assert v == pytest.approx(1.0 / n, rel=1e-12)


def test_pagerank_mass_conserved_without_danglers(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (1, 0), (2, 1)], "src long, dst long")
    got = _ranks(pagerank(edges, damping=0.85, iters=5))
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_star_matches_hand_computation(spark):
    # 3 leaves all point at hub 0; hub points at leaf 1.
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 1)], "src long, dst long")
    d, n = 0.85, 4
    # one iteration by hand from uniform 1/4
    base = (1 - d) / n
    r = {v: 1 / n for v in range(4)}
    expect1 = {
        0: base + d * (r[1] + r[2] + r[3]),
        1: base + d * r[0],
        2: base,
        3: base,
    }
    got = _ranks(pagerank(edges, damping=d, iters=1))
    for v in range(4):
        assert got[v] == pytest.approx(expect1[v], rel=1e-12)


def test_pagerank_explicit_nodes_include_isolated(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,), (9,)], "node long")
    got = _ranks(pagerank(edges, nodes=nodes, damping=0.85, iters=3))
    assert set(got) == {0, 1, 9}
    assert got[9] == pytest.approx((1 - 0.85) / 3, rel=1e-12)


def test_pagerank_weighted_edges(spark):
    # src 0 splits 3:1 between 1 and 2
    edges = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, w double")
    got = _ranks(pagerank(edges, damping=1.0, iters=1, weight="w"))
    assert got[1] / got[2] == pytest.approx(3.0, rel=1e-12)


def test_knn_edges_shape(spark):
    vs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
         (3, [0.1, 0.9])],
        "vec_id long, embedding array<float>")
    e = knn_edges(vs, k=2)
    rows = [(r.src, r.dst) for r in e.collect()]
    # every node emits exactly k edges, never to itself
    from collections import Counter
    out = Counter(s for s, _ in rows)
    assert set(out.values()) == {2}
    assert all(s != t for s, t in rows)
    # 0's nearest is 1 (cos ~0.994) before 3
    assert (0, 1) in rows


def test_personalized_pagerank_seeds_hold_authority(spark):
    # ring of 4; seed all teleport mass on node 0
    edges = spark.createDataFrame(
        [(i, (i + 1) % 4) for i in range(4)], "src long, dst long")
    seeds = spark.createDataFrame([(0, 1.0)], "node long, w double")
    got = _ranks(pagerank(edges, damping=0.85, iters=8, teleport=seeds))
    # mass conserved; node 0 holds the most (teleport returns there)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    assert got[0] == max(got.values())
    # downstream decay: 1 > 2 > 3 (authority decays along the ring)
    assert got[1] > got[2] > got[3]


def test_personalized_teleport_validation(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    zero = spark.createDataFrame([(0, 0.0)], "node long, w double")
    with pytest.raises(ValueError, match="sum > 0"):
        pagerank(edges, teleport=zero)


def test_uniform_teleport_equals_default(spark):
    n = 5
    edges = spark.createDataFrame(
        [(i, (i + 2) % n) for i in range(n)] +
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long")
    uni = spark.createDataFrame([(i, 3.0) for i in range(n)],
                                "node long, w double")
    a = _ranks(pagerank(edges, iters=4))
    b = _ranks(pagerank(edges, iters=4, teleport=uni))
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-12)


def test_pagerank_matches_dense_numpy_oracle(spark):
    """Independent oracle: dense NumPy power iteration on a random
    60-node graph (seeded), uniform and personalized variants."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 60
    pairs = {(int(a), int(b))
             for a, b in zip(rng.integers(0, n, 300),
                             rng.integers(0, n, 300)) if a != b}
    # ensure no dangling nodes (operator documents that precondition)
    srcs = {a for a, _ in pairs}
    for v in range(n):
        if v not in srcs:
            pairs.add((v, (v + 1) % n))
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")

    d, iters = 0.85, 6
    P = np.zeros((n, n))
    for a, b in pairs:
        P[a, b] = 1.0
    P = P / P.sum(axis=1, keepdims=True)

    def dense(t):
        r = t.copy()
        for _ in range(iters):
            r = (1 - d) * t + d * (P.T @ r)
        return r

    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    got = _ranks(pagerank(edges, nodes=nodes, damping=d, iters=iters))
    exp = dense(np.full(n, 1.0 / n))
    for v in range(n):
        assert got[v] == pytest.approx(exp[v], rel=1e-9), v

    t = np.zeros(n)
    t[3], t[11] = 0.75, 0.25
    seeds = spark.createDataFrame([(3, 3.0), (11, 1.0)],
                                  "node long, w double")
    gotp = _ranks(pagerank(edges, nodes=nodes, damping=d, iters=iters,
                           teleport=seeds))
    expp = dense(t)
    for v in range(n):
        assert gotp[v] == pytest.approx(expp[v], rel=1e-9, abs=1e-15), v


def test_graph_explore_planted_structure(spark):
    # seed docs: "seed alpha", twice; alpha docs also carry "beta";
    # "gamma" lives only outside the frontier; "noise" is everywhere.
    rows = [
        (1, "seed alpha noise"),
        (2, "seed alpha noise"),
        (3, "alpha beta noise"),
        (4, "alpha beta noise"),
        (5, "gamma noise"),
        (6, "gamma noise"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from connectors_spark.operators.graph import graph_explore

    out = graph_explore(docs, "seed", per_hop=1)
    got = {(r["hop"], r["source"], r["term"]): r["overlap_df"]
           for r in out.collect()}
    # hop 1: alpha (in both seed docs, rare in corpus) beats noise
    # (everywhere -> JLH ~ 0)
    assert (1, "seed", "alpha") in got
    assert got[(1, "seed", "alpha")] == 2
    # hop 2: frontier = alpha docs {1,2,3,4}; beta is the significant
    # new term (seed/alpha excluded as seen), edge sourced at alpha
    assert (2, "alpha", "beta") in got
    assert got[(2, "alpha", "beta")] == 2
    assert len(got) == 2
