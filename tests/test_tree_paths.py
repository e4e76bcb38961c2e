"""Parent-pointer forest resolution via pointer doubling."""

from pyspark.sql import functions as F

from connectors_spark.operators.graph import tree_paths


def _nodes(spark, pairs):
    return spark.createDataFrame(pairs, "node_id long, parent_id long")


def test_forest_roots_depths_paths(spark):
    #   0 -> 1 -> 3        10 (root) -> 11
    #     \> 2
    n = _nodes(spark, [(0, None), (1, 0), (2, 0), (3, 1),
                       (10, None), (11, 10)])
    got = {r["node_id"]: (r["root_id"], r["depth"], r["path"])
           for r in tree_paths(n, max_depth=8).collect()}
    assert got[0] == (0, 0, "0")
    assert got[1] == (0, 1, "0/1")
    assert got[2] == (0, 1, "0/2")
    assert got[3] == (0, 2, "0/1/3")
    assert got[10] == (10, 0, "10")
    assert got[11] == (10, 1, "10/11")


def test_deep_chain_at_max_depth(spark):
    depth = 8
    rows = [(0, None)] + [(i, i - 1) for i in range(1, depth + 1)]
    got = {r["node_id"]: (r["root_id"], r["depth"], r["path"])
           for r in tree_paths(_nodes(spark, rows),
                               max_depth=depth).collect()}
    assert got[depth] == (0, depth,
                          "/".join(str(i) for i in range(depth + 1)))
    assert all(got[i][1] == i for i in range(depth + 1))


def test_cycle_and_dangling_parent_yield_null(spark):
    # 1 <-> 2 cycle; 5's parent 99 does not exist; 7 -> 0 is fine
    n = _nodes(spark, [(0, None), (1, 2), (2, 1), (5, 99), (7, 0)])
    got = {r["node_id"]: (r["root_id"], r["depth"])
           for r in tree_paths(n, max_depth=8).collect()}
    assert got[1] == (None, None)
    assert got[2] == (None, None)
    assert got[5] == (None, None)
    assert got[7] == (0, 1)
    assert got[0] == (0, 0)


def test_without_path_drops_column_same_answers(spark):
    n = _nodes(spark, [(0, None), (1, 0), (2, 1)])
    out = tree_paths(n, max_depth=8, with_path=False)
    assert "path" not in out.columns
    got = {r["node_id"]: (r["root_id"], r["depth"])
           for r in out.collect()}
    assert got == {0: (0, 0), 1: (0, 1), 2: (0, 2)}


def test_deep_chain_resolves_in_log_rounds(spark):
    # depth-200 chain under max_depth=4096: 13 doubling rounds with
    # lineage cuts every 3 — a sequential per-level walk (200 joins)
    # or an uncut 3^13-node plan would not finish in test time
    depth = 200
    rows = [(0, None)] + [(i, i - 1) for i in range(1, depth + 1)]
    got = {r["node_id"]: (r["root_id"], r["depth"])
           for r in tree_paths(_nodes(spark, rows), max_depth=4096,
                               with_path=False).collect()}
    assert got[depth] == (0, depth)
    assert got[1] == (0, 1)


def test_max_depth_cutoff_is_exact(spark):
    # doubling rounds can reach past max_depth — the contract must
    # still NULL anything deeper than max_depth exactly
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 8)]
    got = {r["node_id"]: (r["root_id"], r["depth"])
           for r in tree_paths(_nodes(spark, rows), max_depth=5,
                               with_path=False).collect()}
    assert got[5] == (0, 5)
    assert got[6] == (None, None)
    assert got[7] == (None, None)
