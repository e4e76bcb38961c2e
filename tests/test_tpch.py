"""Plan-shape assertions for the TPC-H-classic OLAP gates: the scan,
broadcast, and top-k strategies these queries rely on at 100 TB must
appear in the physical plan (correctness itself is DuckDB-hash-gated
via entry_queries)."""

from connectors_spark.entry_queries import (
    q_tpch_pricing_summary,
    q_tpch_regional_revenue,
    q_tpch_shipping_priority,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_and_partial_agg(spark, sf_dir):
    df = q_tpch_pricing_summary(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split(
        "PushedFilters")[1][:220]
    # map-side combine: a partial HashAggregate below the exchange
    assert plan.count("HashAggregate") >= 2
    assert "SortAggregate" not in plan
    # only needed columns reach the scan
    rs = plan.split("ReadSchema:")[1][:400]
    assert "l_partkey" not in rs and "l_suppkey" not in rs


def test_q3_broadcasts_customer_and_takeordered(spark, sf_dir):
    df = q_tpch_shipping_priority(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q5_star_join_broadcasts_dims(spark, sf_dir):
    df = q_tpch_regional_revenue(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # supplier+nation+region side
    assert "CartesianProduct" not in plan
    got = {r.n_name: r.revenue for r in df.collect()}
    assert got, "ASIA region must produce revenue rows"
    assert all(v > 0 for v in got.values())
