"""ES anomaly-detection analog: robust rolling-baseline scoring.

The reference platform pairs synced indices with Elastic ML anomaly
jobs (single-metric count jobs over a datafeed are the canonical
setup). The production ML model is proprietary; this implements the
standard PUBLIC robust-statistics equivalent: per entity, bucket the
metric by day, keep a trailing window, and score each bucket by its
deviation from the window MEDIAN in units of the scaled MAD (median
absolute deviation; 1.4826*MAD estimates sigma for normal data —
textbook robust z-score). Deterministic, engine-portable (the DuckDB
twin uses the same closed-form expressions).

Scale shape: the day-bucket aggregation is ONE map-side-combined agg
that collapses the corpus to (entities x days) rows — ~O(10^4) even at
100 TB of raw events — so the trailing-window pass (collect_list over a
7-row frame) runs on the tiny bucket frame, never on raw rows. The
rolling median/MAD are computed from the sorted trailing array with
JVM higher-order functions; no UDF, no unpartitioned window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIGMA_SCALE = 1.4826  # MAD -> sigma under normality (public constant)
# Integer count windows frequently have MAD exactly 0 (a majority-equal
# window), which would make ANY deviation score huge. Floor the sigma
# estimate at one count unit — the standard robust-scoring guard.
SCALE_FLOOR = 1.0


def _sorted_median(arr_col: str) -> str:
    """SQL fragment: exact median of a SORTED array column (1-based
    element_at; averages the two middle elements on even length).
    Written as a portable expression so the DuckDB oracle can carry the
    identical arithmetic."""
    n = f"size({arr_col})"
    i1 = f"cast(({n} - 1) div 2 as int) + 1"
    i2 = f"cast({n} div 2 as int) + 1"
    # explicit DOUBLE: a bare `/ 2.0` is DECIMAL division in Spark SQL
    # (and DuckDB), which would leak Decimal objects into the result
    return (f"cast((element_at({arr_col}, {i1}) + "
            f"element_at({arr_col}, {i2})) / 2.0 as double)")


def rolling_mad_anomaly(
    daily: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    window: int = 7,
    threshold: float = 3.0,
) -> DataFrame:
    """Score each (key, bucket) row of an already-bucketed metric frame
    against its trailing `window` buckets (inclusive): robust z-score
    |x - median| / max(1.4826 * MAD, SCALE_FLOOR). Adds med, mad, score
    (rounded to 6), is_anomaly. The first buckets score against their
    shorter prefix window, matching an ES job's warm-up behavior."""
    w = (Window.partitionBy(key_col).orderBy(time_col)
         .rowsBetween(-(window - 1), 0))
    out = daily.withColumn(
        "_arr", F.array_sort(F.collect_list(F.col(value_col)).over(w)))
    out = out.withColumn("med", F.expr(_sorted_median("_arr")))
    out = out.withColumn(
        "_devs",
        F.array_sort(F.transform(
            F.col("_arr"), lambda v: F.abs(v - F.col("med")))))
    out = out.withColumn("mad", F.expr(_sorted_median("_devs")))
    score = F.round(
        F.abs(F.col(value_col) - F.col("med"))
        / F.greatest(F.lit(SIGMA_SCALE) * F.col("mad"),
                     F.lit(SCALE_FLOOR)), 6)
    return (
        out.withColumn("score", score)
        .withColumn("is_anomaly", F.col("score") > threshold)
        .drop("_arr", "_devs")
    )


def alert_episodes(
    daily: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    threshold: float,
    throttle_days: int = 2,
) -> DataFrame:
    """ES Watcher analog (public X-Pack watcher docs: input search ->
    condition -> action with `throttle_period`): a bucket BREACHES when
    its metric crosses the condition threshold; an action FIRES only at
    the start of a breach episode — a breach with no prior breach
    within `throttle_days` — so a sustained incident produces one
    action, not one per bucket, exactly what throttle_period exists
    for. Adds columns breached, fired.

    Deterministic lag formulation (no sequential state): fired =
    breached AND (previous breached bucket is absent or older than the
    throttle window). Runs on the already-aggregated bucket frame
    (entities x days), so the lag window is partitioned per key over a
    tiny series at any corpus scale."""
    breached = daily.withColumn(
        "breached", F.col(value_col) >= F.lit(threshold))
    w = Window.partitionBy(key_col).orderBy(time_col)
    # carry the last breach time forward: max over strictly-prior rows
    last_breach = F.max(
        F.when(F.col("breached"), F.col(time_col))).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    fired = (
        F.col("breached")
        & (last_breach.isNull()
           | (F.datediff(F.col(time_col), last_breach)
              > F.lit(throttle_days)))
    )
    return breached.withColumn("fired", fired)
