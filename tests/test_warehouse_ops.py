"""Warehouse/analytics shapes — closed-form oracles: SCD Type-2
intervalization, weekly cohort retention, and the chunked
interval-containment join (incl. the no-dup and no-cartesian
properties)."""

from datetime import datetime

from pyspark.sql import functions as F


def test_scd2_compresses_runs_and_orders_versions(spark):
    from connectors_spark.operators.transform import scd2_intervals

    rows = [(7, datetime(2024, 1, 1, 0, 0, i), a)
            for i, a in enumerate(["a", "a", "b", "b", "a"])]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, attr string")
    out = sorted(scd2_intervals(df, "user_id", "ts", "attr").collect(),
                 key=lambda r: r.version)
    assert [r.attr for r in out] == ["a", "b", "a"]
    assert [r.version for r in out] == [1, 2, 3]
    # intervals chain exactly: each valid_to == next valid_from
    assert out[0].valid_to_us == out[1].valid_from_us
    assert out[1].valid_to_us == out[2].valid_from_us
    assert out[2].valid_to_us is None and out[2].is_current
    assert not out[0].is_current and not out[1].is_current


def test_cohort_retention_matrix(spark):
    from connectors_spark.operators.transform import cohort_retention

    w0, w1 = datetime(2024, 1, 1, 12), datetime(2024, 1, 8, 12)
    rows = [(1, w0), (1, w1), (2, w0), (3, w1)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort_week, r.week_offset):
           (r.n_active, r.cohort_size, r.retention)
           for r in cohort_retention(df).collect()}
    assert got[("2024-01-01", 0)] == (2, 2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 2, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1, 1.0)
    assert len(got) == 3


def _ij(spark, intervals, points, width=100):
    from connectors_spark.operators.joins import interval_containment_join

    iv = spark.createDataFrame(intervals, "k long, iid long, lo long, hi long")
    pt = spark.createDataFrame(points, "k long, pid long, t long")
    return interval_containment_join(iv, pt, key="k", chunk_width=width)


def test_interval_join_boundaries_and_chunk_crossing(spark):
    # [95, 195) spans chunks 0 and 1 at width 100
    out = _ij(spark, [(1, 10, 95, 195)],
              [(1, 0, 94), (1, 1, 95), (1, 2, 150), (1, 3, 194),
               (1, 4, 195), (2, 5, 150)])
    got = sorted(r.pid for r in out.collect())
    assert got == [1, 2, 3]          # inclusive lo, exclusive hi, keyed
    # a pair meets in exactly ONE chunk -> no duplicates by construction
    assert out.count() == out.dropDuplicates(["iid", "pid"]).count()


def test_interval_join_no_cartesian_in_plan(spark):
    out = _ij(spark, [(1, 10, 0, 100)], [(1, 1, 50)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_scd2_null_attr_first_row_kept_and_null_runs_not_compressed(spark):
    """NULL-attr semantics pinned to the SQL twin (`prev IS NULL OR attr
    IS DISTINCT FROM prev`): a key whose FIRST attr is NULL keeps that
    row, and every row following a NULL-attr row survives (NULL runs are
    not compressed)."""
    from connectors_spark.operators.transform import scd2_intervals

    rows = [(7, datetime(2024, 1, 1, 0, 0, i), a)
            for i, a in enumerate([None, None, "x", "x", None])]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, attr string")
    out = sorted(scd2_intervals(df, "user_id", "ts", "attr").collect(),
                 key=lambda r: r.version)
    # kept rows: i=0 (first, NULL), i=1 (prev attr NULL), i=2 (change to
    # x), i=4 (change to NULL); i=3 (x after x, prev non-NULL) compressed
    assert [r.attr for r in out] == [None, None, "x", None]
    assert [r.version for r in out] == [1, 2, 3, 4]
    assert out[-1].is_current and out[-1].valid_to_us is None
    # intervals still chain
    for a, b in zip(out, out[1:]):
        assert a.valid_to_us == b.valid_from_us
