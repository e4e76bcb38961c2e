"""Degree-oriented exact triangle counting + clustering coefficient."""

from connectors_spark.operators.graph import triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _got(spark, pairs):
    return {r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
            for r in triangle_counts(_edges(spark, pairs)).collect()}


def test_k4_complete_graph(spark):
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _got(spark, pairs)
    # every node: degree 3, C(3,2)=3 triangles through it, clustering 1
    assert got == {i: (3, 3, 1.0) for i in range(4)}


def test_path_and_pendant(spark):
    # path 1-2-3: no triangle; middle node clustering 0, leaves NULL
    got = _got(spark, [(1, 2), (2, 3)])
    assert got[2] == (2, 0, 0.0)
    assert got[1] == (1, 0, None)
    assert got[3] == (1, 0, None)


def test_single_triangle_with_pendant(spark):
    got = _got(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    # node 3: degree 3, one triangle -> 2*1/(3*2)
    assert got[3] == (3, 1, round(1 / 3, 6))
    assert got[4] == (1, 0, None)


def test_directed_duplicates_and_self_loops_collapse(spark):
    # both directions + a self loop must not double-count
    got = _got(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1)])
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (2, 1, 1.0)
