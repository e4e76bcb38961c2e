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

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# ES|QL CHANGE_POINT processes a BOUNDED series (the published command
# truncates its input; values beyond the cap are ignored with a
# warning). We guard instead of silently truncating.
CHANGE_POINT_CAP = 10_000

_ERFC_P = 0.3275911
_ERFC_A = (0.254829592, -0.284496736, 1.421413741,
           -1.453152027, 1.061405429)


def _erfc_as(x: float) -> float:
    """Abramowitz & Stegun 7.1.26 erfc approximation (|err| < 1.5e-7),
    chosen over math.erfc deliberately: the identical closed form is
    expressible in the DuckDB oracle SQL, so engine and oracle compute
    bit-matching p-values (same Horner order, same IEEE doubles)."""
    t = 1.0 / (1.0 + _ERFC_P * x)
    poly = ((((_ERFC_A[4] * t + _ERFC_A[3]) * t + _ERFC_A[2]) * t
             + _ERFC_A[1]) * t + _ERFC_A[0]) * t
    return poly * math.exp(-x * x)


def change_point(
    df: DataFrame,
    value_col: str,
    time_col: str,
    type_col: str = "type",
    pvalue_col: str = "pvalue",
) -> DataFrame:
    """ES|QL `CHANGE_POINT value ON key` analog: detect the single most
    likely step change in a time-ordered metric series and annotate THAT
    row with (type, pvalue); every other row gets nulls — the documented
    ES|QL output shape. Detection is the classic binary-segmentation
    step: for every split with >= 2 points on each side, the pooled-
    variance standardized mean shift |m1-m2| / sqrt(s2p*(1/n1+1/n2));
    the argmax split (statistic rounded to 9, earliest split wins ties)
    is the change point, its two-sided normal p-value comes from the
    A&S erfc above, and type is `step_change` when p <= 0.05 else
    `indeterminable` (ES's own "no significant change" verdict).

    Scale shape: the ES command is spec-bounded to a small series (cap
    guarded at CHANGE_POINT_CAP), so ONE applyInPandas group is the
    correct physical plan — the input is an already-aggregated bucket
    frame, never raw events."""
    out_fields = list(df.schema.fields) + [
        T.StructField(type_col, T.StringType()),
        T.StructField(pvalue_col, T.DoubleType()),
    ]
    schema = T.StructType(
        [T.StructField("_g", T.IntegerType())] + out_fields)
    in_cols = df.columns

    def fn(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        n = len(pdf)
        if n > CHANGE_POINT_CAP:
            raise ValueError(
                f"CHANGE_POINT input has {n} rows > cap {CHANGE_POINT_CAP};"
                " aggregate first")
        types = [None] * n
        pvals = [None] * n
        if n >= 4:
            x = pdf[value_col].astype(float).to_numpy()
            best_stat, best_i = -1.0, None
            for i in range(2, n - 1):
                a, b = x[:i], x[i:]
                s2p = (((len(a) - 1) * a.var(ddof=1)
                        + (len(b) - 1) * b.var(ddof=1)) / (n - 2))
                stat = (abs(float(a.mean()) - float(b.mean()))
                        / math.sqrt(max(s2p, 1e-9)
                                    * (1.0 / len(a) + 1.0 / len(b))))
                stat = round(stat, 9)
                if stat > best_stat:
                    best_stat, best_i = stat, i
            pv = round(_erfc_as(best_stat * 0.7071067811865476), 9)
            types[best_i] = ("step_change" if pv <= 0.05
                             else "indeterminable")
            pvals[best_i] = pv
        out = pdf[in_cols].copy()
        out[type_col] = pd.Series(types, dtype=object)
        out[pvalue_col] = pd.Series(pvals, dtype=float)
        return out

    return (
        df.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda pdf: fn(pdf).assign(_g=1), schema)
        .drop("_g")
    )
