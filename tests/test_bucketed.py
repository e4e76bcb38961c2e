"""Bucketed co-located joins: the write-once-shuffle-never-again plan
(sources/bucketed.py). The Exchange-free join is the point — pinned on
the physical plan, not just on row equality."""

import pytest
from pyspark.sql import functions as F

from connectors_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture()
def no_broadcast_no_aqe(spark):
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_bucketed_join_is_exchange_free(spark, no_broadcast_no_aqe):
    left = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("a"))
    right = spark.range(400).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("b"))
    write_bucketed(left, "bkt_left", "k", 4, sort_by="k")
    write_bucketed(right, "bkt_right", "k", 4, sort_by="k")
    try:
        out = bucketed_join(spark, "bkt_left", "bkt_right", "k")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # row correctness against the plain (shuffled) join
        expect = sorted(tuple(r) for r in left.join(right, "k").collect())
        got = sorted(tuple(r) for r in out.collect())
        assert got == expect and len(got) == 400
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_unbucketed_join_pays_the_exchange(spark, no_broadcast_no_aqe):
    # the control: same join without bucketing shuffles both sides
    left = spark.range(500).select(F.col("id").alias("k"))
    right = spark.range(400).select(F.col("id").alias("k"))
    plan = left.join(right, "k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" in plan
