"""Time-series composition operators: as-of join and bucket gap-fill.

Two operators the reference's event-stream consumers reach for that
Spark has no built-in for (reference-scale rationale: the sync-cursor
protocol in elastic/connectors replays "state as of a timestamp" —
`connectors/sync_job_runner.py`'s cursor semantics — and Kibana-style
dashboards over its job-stats stream need dense time buckets):

- ``asof_join``: for every left row, the single latest right row at or
  before (or strictly before) the left row's timestamp, per key. The
  classic implementation is a range join (cross product within key,
  then max-ts filter) — quadratic per key and a scale-killer on dense
  keys. This one is the union-tag formulation: tag both sides, union,
  and take ``last(payload, ignorenulls)`` over ONE per-key
  ts-ordered window. One shuffle on the key, linear in rows, no
  intermediate blow-up — the 100 TB shape.

- ``gapfill``: fixed-width time buckets per key densified to a
  contiguous spine (``sequence`` + explode — no driver loop), with
  last-observation-carried-forward and linear interpolation fills,
  each one window pass inside the same per-key shuffle.

Both are pure DataFrame compositions (no UDF, whole-stage codegen
throughout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("__ts", "__tag", "__pay", "__m")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    strict: bool = False,
    tolerance_sec: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row picks the latest right row with
    ``right.ts <= left.ts`` (``strict=True``: ``<``) sharing the key;
    unmatched left rows keep NULL right columns (LEFT OUTER semantics,
    matching DuckDB/pandas ``merge_asof`` backward direction).

    ``tolerance_sec`` drops matches older than the window (the match
    becomes NULL, the left row stays). Ties among right rows at the
    same (key, ts) are resolved by the LAST one in ``right_cols``
    order of the underlying sort — pre-deduplicate the right side to
    one row per (key, ts) when that matters for determinism.

    Plan shape: unionByName → one hash shuffle on the key → one
    ordered window (`last ignorenulls` over unbounded-preceding) →
    filter. Never materializes a per-key cross product.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in keys and c != right_ts]
    for c in _RESERVED:
        if c in left.columns or c in right.columns:
            raise ValueError(f"column name {c!r} is reserved by asof_join")

    # Tag ordering decides inclusivity at equal timestamps: the window
    # is rowsBetween(unboundedPreceding, currentRow), so a right row
    # sorting BEFORE the left row at the same ts is visible (inclusive
    # <=); sorting AFTER hides it (strict <).
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    pay = F.struct(
        F.col(right_ts).cast("timestamp").alias("__mts"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).cast("timestamp").alias("__ts"),
        pay.alias("__pay"),
        F.lit(right_tag).alias("__tag"),
    )
    l = left.select(
        "*",
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(left_tag).alias("__tag"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__pay", ignorenulls=True).over(w)
    out = u.withColumn("__m", matched).filter(F.col("__tag") == left_tag)

    if tolerance_sec is not None:
        in_window = (
            F.col("__ts").cast("double")
            - F.col("__m.__mts").cast("double")
        ) <= F.lit(float(tolerance_sec))
        out = out.withColumn(
            "__m", F.when(in_window, F.col("__m")))

    taken = set(left.columns)
    sel = [F.col(c) for c in left.columns]
    mts_name = right_ts + suffix if right_ts in taken else right_ts
    sel.append(F.col("__m.__mts").alias(mts_name))
    for c in right_cols:
        name = c + suffix if c in taken else c
        sel.append(F.col("__m." + c).alias(name))
    return out.select(*sel)


def gapfill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    bucket_sec: int,
    agg: str = "avg",
) -> DataFrame:
    """Hypertable-style gap-fill: bucket ``ts`` into ``bucket_sec``-wide
    epochs per ``key``, aggregate ``value`` (avg/sum/min/max/count),
    densify each key's range to a contiguous bucket spine, and emit
    three fill columns per bucket:

    - ``v``       — the real aggregate (NULL on gap buckets)
    - ``locf_v``  — last observation carried forward
    - ``interp_v``— linear interpolation between the surrounding real
      buckets; trailing gaps fall back to LOCF, leading gaps stay NULL
      (TimescaleDB ``interpolate``/``locf`` semantics).

    The spine comes from ``sequence(min_bucket, max_bucket, step)`` +
    explode — per-key, distributed, no driver loop; min==max yields a
    one-element spine so the ascending-sequence contract always holds.
    All three fills ride two window passes inside one per-key shuffle.
    """
    aggs = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
            "count": F.count}
    if agg not in aggs:
        raise ValueError(f"unknown agg {agg!r}; one of {sorted(aggs)}")
    step = int(bucket_sec)
    bucket = (F.floor(F.col(ts).cast("timestamp").cast("long") / step)
              * step).cast("long")
    b = (
        df.select(F.col(key), bucket.alias("bucket"), F.col(value))
        .groupBy(key, "bucket")
        .agg(aggs[agg](value).alias("v"))
    )
    spine = (
        b.groupBy(key)
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            key,
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.lit(step))
            ).alias("bucket"),
        )
    )
    j = spine.join(b, [key, "bucket"], "left")

    w_prev = (Window.partitionBy(key).orderBy("bucket")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_next = (Window.partitionBy(key).orderBy("bucket")
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    real_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    locf = F.last("v", ignorenulls=True).over(w_prev)
    pb = F.last(real_bucket, ignorenulls=True).over(w_prev)
    nv = F.first("v", ignorenulls=True).over(w_next)
    nb = F.first(real_bucket, ignorenulls=True).over(w_next)
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            locf.isNotNull() & nv.isNotNull(),
            locf + (nv - locf) * (F.col("bucket") - pb) / (nb - pb),
        )
        .otherwise(locf)
    )
    return j.select(
        key,
        "bucket",
        "v",
        locf.alias("locf_v"),
        interp.alias("interp_v"),
    )


def moving_fn_weights(window: int = 7, alpha_num: int = 3,
                      beta_num: int = 1, denom: int = 10):
    """Exact integer coefficient tables for the ES `moving_fn` model
    family (linearWeightedAvg / ewma / holt) over a trailing window —
    exposed so the Spark operator and its DuckDB twin embed IDENTICAL
    literals (python computes once, both engines consume; the
    rbo_suffix_weights convention).

    Every model is LINEAR in the window's values, so each (window
    length L, age a) pair gets an exact rational coefficient; rows are
    returned as integers over a per-(L, model) common denominator:

        rows: (L, age, lwa_w, lwa_den, ewma_num, ewma_den,
               holt_num, holt_den)          for L in 1..window,
                                                age in 0..L-1 (0=newest)

    lwa:  weight L-a over L(L+1)/2 (ES linearWeightedAvg).
    ewma: avg := alpha*v + (1-alpha)*avg folded oldest->newest,
          avg seeded with the oldest value (ES MovingFunctions.ewma,
          default alpha = 0.3).
    holt: s_1 = x_1, b_1 = 0;  for t >= 2
          s_t = alpha*x_t + (1-alpha)*(s_{t-1} + b_{t-1}),
          b_t = beta*(s_t - s_{t-1}) + (1-beta)*b_{t-1};
          emitted value is the smoothed level s_L (ES
          MovingFunctions.holt, defaults alpha = 0.3, beta = 0.1).
    """
    from fractions import Fraction
    from math import lcm

    a = Fraction(alpha_num, denom)
    bt = Fraction(beta_num, denom)
    rows = []
    for L in range(1, window + 1):
        # coefficient vectors over x_1..x_L (1-based, oldest first)
        ewma = [Fraction(0)] * L
        ewma[0] = Fraction(1)
        for i in range(1, L):
            ewma = [(1 - a) * c for c in ewma]
            ewma[i] += a
        s = [Fraction(0)] * L
        b = [Fraction(0)] * L
        s[0] = Fraction(1)
        for i in range(1, L):
            prev_s = list(s)
            s = [(1 - a) * (sc + bc) for sc, bc in zip(prev_s, b)]
            s[i] += a
            b = [bt * (sn - sp) + (1 - bt) * bc
                 for sn, sp, bc in zip(s, prev_s, b)]
        e_den = lcm(*[c.denominator for c in ewma])
        h_den = lcm(*[c.denominator for c in s])
        lwa_den = L * (L + 1) // 2
        for i in range(L):
            age = L - 1 - i
            rows.append((L, age, L - age, lwa_den,
                         int(ewma[i] * e_den), e_den,
                         int(s[i] * h_den), h_den))
    return rows


def moving_fn_models(buckets: DataFrame, key_col: str, order_col: str,
                     value_col: str, window: int = 7,
                     round_to: int = 6) -> DataFrame:
    """ES `moving_fn` pipeline-agg model family over an already-
    aggregated bucket frame: trailing-window linearWeightedAvg, ewma
    (alpha 0.3) and holt double-exponential smoothing (alpha 0.3,
    beta 0.1) per parent bucket key — the full MovingFunctions menu
    beyond facet_moving_fn's unweightedAvg/serial_diff.

    Determinism: every model is a weighted sum with EXACT INTEGER
    coefficients from moving_fn_weights (the recurrences are linear, so
    they unroll to per-(window-length, age) rationals cleared to a
    common denominator) — each output is a single division of exact
    integer sums, so both engines hash identically even though holt is
    "sequential" on paper.

    Plan shape: the window never touches raw rows — it is a bounded
    self-join of the (keys x buckets) frame against itself at offsets
    0..window-1 plus a broadcast coefficient lookup (window(window+1)/2
    rows). Like ES, the recurrence restarts inside each trailing
    window, which is what makes it embarrassingly parallel (no
    unbounded running state)."""
    rows = moving_fn_weights(window)
    spark = buckets.sparkSession
    coef = spark.createDataFrame(
        rows, "L int, age int, lwa_w long, lwa_den long, "
              "ewma_num long, ewma_den long, holt_num long, "
              "holt_den long")
    rn = F.row_number().over(Window.partitionBy("k").orderBy("o"))
    b = buckets.select(
        F.col(key_col).alias("k"), F.col(order_col).alias("o"),
        F.col(value_col).cast("long").alias("v")).withColumn("rn", rn)
    cur = b.select("k", "o", "v", F.col("rn").alias("rn_t"),
                   F.least(F.col("rn"), F.lit(window)).alias("L"))
    past = b.select(F.col("k").alias("k2"), F.col("v").alias("x"),
                    F.col("rn").alias("rn_s"))
    pairs = cur.join(
        past,
        (cur["k"] == past["k2"])
        & (past["rn_s"] <= cur["rn_t"])
        & (past["rn_s"] > cur["rn_t"] - window)
    ).withColumn("age", F.col("rn_t") - F.col("rn_s"))
    j = pairs.join(F.broadcast(coef), ["L", "age"])
    agg = j.groupBy("k", "o", "v").agg(
        F.sum(F.col("lwa_w") * F.col("x")).alias("lwa_n"),
        F.max("lwa_den").alias("lwa_d"),
        F.sum(F.col("ewma_num") * F.col("x")).alias("ewma_n"),
        F.max("ewma_den").alias("ewma_d"),
        F.sum(F.col("holt_num") * F.col("x")).alias("holt_n"),
        F.max("holt_den").alias("holt_d"))
    return agg.select(
        F.col("k").alias(key_col), F.col("o").alias(order_col),
        F.col("v").alias(value_col),
        F.round(F.col("lwa_n").cast("double")
                / F.col("lwa_d").cast("double"), round_to).alias("lwa"),
        F.round(F.col("ewma_n").cast("double")
                / F.col("ewma_d").cast("double"), round_to).alias("ewma"),
        F.round(F.col("holt_n").cast("double")
                / F.col("holt_d").cast("double"), round_to).alias("holt"))


def counter_rate(df: DataFrame, series_col: str = "series",
                 ts_col: str = "ts", value_col: str = "value",
                 round_to: int = 6) -> DataFrame:
    """Reset-aware counter rate — ES TSDB `rate` on
    `time_series_counter` fields (and PromQL `increase`/`rate`): a
    monotone cumulative counter that RESTARTS (process restart, shard
    relocation) must not contribute a huge negative delta; the
    documented semantics is the sum of POSITIVE adjacent deltas, with
    a reset's post-restart value counted as its own increase (the
    counter restarted from 0).

    increase = sum over adjacent samples of
                 (v_i - v_{i-1})  if v_i >= v_{i-1}   (normal growth)
                 (v_i)            otherwise            (reset: regrowth
                                                        from zero)
    rate = increase / (t_last - t_first) seconds.

    -> (series, n_samples, increase, span_sec, rate_per_sec). One
    series-partitioned lag window + one series agg — bounded by
    samples-per-series, the TSDB _tsid shape."""
    base = df.select(
        F.col(series_col).alias("series"),
        F.col(ts_col).cast("timestamp").cast("double").alias("t"),
        F.col(value_col).cast("double").alias("v"))
    seq = base.withColumn("pv", F.lag("v").over(
        Window.partitionBy("series").orderBy("t")))
    delta = F.when(F.col("pv").isNull(), F.lit(0.0)) \
        .when(F.col("v") >= F.col("pv"), F.col("v") - F.col("pv")) \
        .otherwise(F.col("v"))
    agg = seq.groupBy("series").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.round(F.sum(delta), round_to).alias("increase"),
        (F.max("t") - F.min("t")).alias("span_sec"))
    return agg.select(
        "series", "n_samples", "increase",
        F.round("span_sec", round_to).alias("span_sec"),
        F.round(F.when(F.col("span_sec") > 0,
                       F.col("increase") / F.col("span_sec")),
                round_to).alias("rate_per_sec"))


def histogram_quantile(buckets: DataFrame, metric_col: str = "metric",
                       le_col: str = "le", count_col: str = "cnt",
                       qs: tuple = (0.5, 0.9, 0.99),
                       round_to: int = 6) -> DataFrame:
    """PromQL `histogram_quantile` over le-bucketed counts (the
    public promql/quantile.go algorithm, also ES percentile-on-
    histogram-field semantics): per metric, cumulative counts over
    the ascending `le` ladder; the q-quantile lives in the first
    bucket whose cumulative count reaches rank = q * total and is
    linearly interpolated inside that bucket —
        lower + (le - lower) * (rank - cum_prev) / cnt
    with lower = previous bucket's le (0 for the first bucket, the
    Prometheus convention). A crossing that lands in the +Inf bucket
    returns the largest finite le (Prometheus's documented clamp); a
    crossing in the first bucket whose le <= 0 returns that le itself
    (promql/quantile.go — interpolation from 0 would exceed the
    bucket's upper bound).
    Input counts are PER-BUCKET observation counts (the operator
    builds the cumulative itself — equivalent to Prometheus's
    wire-cumulative buckets, and what raw data yields directly).

    -> (metric, q, quantile) for q in `qs`, q in (0, 1].

    Plan: the bucket frame is metric x ladder (tiny — the corpus was
    already collapsed by the upstream bucket-count agg); two windows
    over it partitioned by metric, an explode bounded by len(qs), and
    the crossing filter. Nothing here scales with raw observations;
    the corpus-sized work is the upstream map-side-combined count."""
    inf = float("inf")
    w = Window.partitionBy("metric").orderBy("le")
    wall = Window.partitionBy("metric")
    b = buckets.select(F.col(metric_col).alias("metric"),
                       F.col(le_col).cast("double").alias("le"),
                       F.col(count_col).cast("long").alias("cnt"))
    c = (b.withColumn("cum", F.sum("cnt").over(w))
          .withColumn("total", F.sum("cnt").over(wall))
          .withColumn("_ple", F.lag("le").over(w))
          .withColumn("lower", F.coalesce(F.col("_ple"), F.lit(0.0)))
          .withColumn("max_finite",
                      F.max(F.when(F.col("le") != F.lit(inf),
                                   F.col("le"))).over(wall)))
    e = c.withColumn("q", F.explode(F.array(*[F.lit(float(q))
                                              for q in qs])))
    rank = F.col("q") * F.col("total")
    cum_prev = F.col("cum") - F.col("cnt")
    hit = e.filter((F.col("cum") >= rank) & (cum_prev < rank)
                   & (F.col("total") > 0))
    interp = (F.col("lower") + (F.col("le") - F.col("lower"))
              * ((rank - cum_prev) / F.col("cnt")))
    # promql/quantile.go: a crossing in the FIRST bucket with a
    # non-positive upper bound returns the bound itself — interpolating
    # from lower=0 would land ABOVE the bucket's upper bound
    qty = (F.when(F.col("le") == F.lit(inf), F.col("max_finite"))
            .when(F.col("_ple").isNull() & (F.col("le") <= 0),
                  F.col("le"))
            .otherwise(interp))
    return hit.select("metric", "q",
                      F.round(qty, round_to).alias("quantile"))


def predict_linear(df: DataFrame, series_col: str = "series",
                   ts_col: str = "ts", value_col: str = "value",
                   horizon_sec: int = 3600,
                   round_to: int = 6) -> DataFrame:
    """PromQL `predict_linear` / ES ML forecast analog: per series, an
    OLS line over (epoch-seconds, value) and its extrapolation
    horizon_sec past the series' last sample.

    Exactness contract (the repo's integer-OLS convention,
    classifier.py:score_covariate_bias): x = epoch seconds CENTERED on
    the per-series minimum (keeps magnitudes small), y = value lifted
    to exact MILLI-units; all sufficient statistics are summed as
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so the slope numerator
    and denominator are bit-identical integers on any engine and any
    partitioning — the single double division happens once, at the
    end. Constant-x (single-timestamp) series emit NULL slope and
    prediction.

    Plan: one series-keyed min agg (broadcast back), one
    map-side-combined stats agg per series — no windows, nothing
    scales past O(series).

    -> (series, n, slope, predicted) with slope in value/sec rounded
    round_to+3, predicted at (last_ts + horizon) rounded round_to."""
    dec = "decimal(38,0)"
    base = df.select(
        F.col(series_col).alias("series"),
        # epoch SECONDS: micros/1e6 truncated toward zero — DuckDB's
        # `//` also truncates (verified: -1500000//1000000 = -1), so
        # sub-second and pre-epoch stamps land identically on both
        # engines; |micros| < 2^53 keeps the double intermediate exact
        (F.unix_micros(F.col(ts_col).cast("timestamp"))
         / F.lit(1_000_000)).cast("long").alias("t"),
        F.round(F.col(value_col) * 1e3).cast("long").alias("y"))
    mins = base.groupBy("series").agg(F.min("t").alias("t0"),
                                      F.max("t").alias("t1"))
    b = base.join(F.broadcast(mins), "series").withColumn(
        "x", (F.col("t") - F.col("t0")).cast("long"))
    stats = b.groupBy("series").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        # cast the OPERANDS, not the product: an int64 x*y would wrap
        # silently (ansi off) for counter-scale values before the cast
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
        F.max(F.col("t1") - F.col("t0")).alias("xlast"))
    n = F.col("n").cast(dec)
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope_milli = F.when(vx > 0, cov / vx)          # milli-units/sec
    x_pred = (F.col("xlast") + F.lit(horizon_sec)).cast("double")
    intercept_milli = (F.col("sy").cast("double")
                       - slope_milli * F.col("sx").cast("double")) \
        / F.col("n").cast("double")
    pred = (intercept_milli + slope_milli * x_pred) / 1e3
    return stats.select(
        "series", "n",
        F.round(slope_milli / 1e3, round_to + 3).alias("slope"),
        F.round(pred, round_to).alias("predicted"))
