"""ES transforms: entity-centric pivot with continuous (incremental)
mode.

The ES `_transform` API pivots a document index into an entity-centric
dest index (group_by + aggs) and, in continuous mode, keeps the dest up
to date by checkpointing a sync time field: each run identifies the
entities whose SOURCE documents changed since the last checkpoint,
recomputes ONLY those entities' aggregates in full, and upserts them
into the dest (public Elastic transform docs; the reference's synced
content indices are the canonical transform sources).

Scale shape of a continuous tick at 100 TB:
- the changed-row scan is a pushed-down range filter on the sync column
  (partition pruning on a time-partitioned source);
- dirty keys are the DISTINCT group keys of changed rows — typically a
  tiny fraction, broadcast;
- the recompute scans the source ONCE with a broadcast LEFT SEMI on
  dirty keys (filter reaches the scan), so aggregation cost is
  proportional to the dirty entities' rows, not the corpus;
- the dest merge is an anti-join (drop dirty entities' stale rows) +
  union of the fresh rows — dest is entity-sized, far smaller than the
  source.
Checkpoint is `max(sync_col)` of the processed snapshot; re-running the
same tick is a no-op (watermark idempotence, the ILM/streaming
convention elsewhere in this repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pivot_full(source: DataFrame, group_cols: list[str],
               aggs: list) -> DataFrame:
    """The batch pivot: one map-side-combined groupBy. `aggs` is a list
    of already-aliased aggregate Columns."""
    return source.groupBy(*group_cols).agg(*aggs)


def transform_tick(
    source: DataFrame,
    prev_dest: DataFrame | None,
    group_cols: list[str],
    aggs: list,
    sync_col: str,
    last_checkpoint,
) -> tuple[DataFrame, DataFrame]:
    """One continuous-transform run. Returns (dest, new_checkpoint_df)
    where new_checkpoint_df is a 1-row frame holding max(sync_col) of
    the source snapshot (collect it when persisting the checkpoint —
    kept lazy here so the caller controls execution).

    prev_dest=None bootstraps with a full pivot (ES's first checkpoint
    behaves the same way). With a dest, only entities having source
    rows with sync_col > last_checkpoint are recomputed and upserted;
    unchanged entities' dest rows pass through untouched — byte
    identical, never recomputed."""
    ckpt = source.agg(F.max(sync_col).alias("checkpoint"))
    if prev_dest is None:
        return pivot_full(source, group_cols, aggs), ckpt

    changed = source.filter(F.col(sync_col) > F.lit(last_checkpoint))
    dirty = changed.select(*group_cols).distinct()
    fresh = pivot_full(
        source.join(F.broadcast(dirty), group_cols, "left_semi"),
        group_cols, aggs)
    kept = prev_dest.join(F.broadcast(dirty), group_cols, "left_anti")
    return kept.unionByName(fresh), ckpt


def scd2_intervals(df: DataFrame, key_col: str, ts_col: str,
                   attr_col: str) -> DataFrame:
    """SCD Type-2 intervalization — compress an append-only change
    feed into validity intervals (the warehouse history-table build;
    the batch twin of connectors' sync-cursor "state as of ts"
    semantics): per key ordered by time, keep only rows where the
    tracked attribute CHANGES (null-safe compare, first row always
    kept), then each survivor's interval runs to the next change —
    valid_to NULL marks the current version.

    NULL-attr semantics (pinned to the published SQL twin): a row is
    kept when it has no predecessor OR its attr differs null-safely
    from the predecessor's — i.e. `prev IS NULL OR attr IS DISTINCT
    FROM prev`. Because a NULL predecessor attr also satisfies the
    first disjunct, runs of NULL attrs are NOT compressed (each row
    after a NULL-attr row survives). The earlier formulation
    (`NOT attr <=> lag(attr)` alone) silently DROPPED a key's first
    row when its attr was NULL, diverging from the twin.

    Tie/determinism: ordering is (ts, attr) so same-timestamp updates
    order identically on any engine; timestamps are carried as epoch
    micros (exact int64 — no string-format drift).

    -> (key, attr, valid_from_us, valid_to_us, version, is_current).

    Plan: two windows on the SAME (key) partitioning (lag for change
    detection, lead/row_number over the already-compressed frame) —
    Catalyst reuses one exchange; per-key window width is the key's
    update count, never the corpus."""
    k = F.col(key_col)
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    a = F.col(attr_col)
    w = Window.partitionBy("key").orderBy("t", "attr")
    s = df.select(k.alias("key"), a.alias("attr"), t.alias("t"))
    d = s.withColumn("_pa", F.lag("attr").over(w))
    c = d.filter(
        F.col("_pa").isNull() | ~F.col("attr").eqNullSafe(F.col("_pa"))
    ).drop("_pa")
    w2 = Window.partitionBy("key").orderBy("t", "attr")
    v = (c.withColumn("valid_to_us", F.lead("t").over(w2))
          .withColumn("version",
                      F.row_number().over(w2).cast("long")))
    return v.select(
        F.col("key").alias(key_col), "attr",
        F.col("t").alias("valid_from_us"), "valid_to_us", "version",
        F.col("valid_to_us").isNull().alias("is_current"))


def cohort_retention(df: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort-retention matrix (the canonical product-analytics
    rollup): every entity's cohort is its first-activity ISO week;
    retention at week offset n is the fraction of the cohort active n
    weeks after (distinct-entity semantics — multiple events in a
    week count once). Week offsets use exact arithmetic: both sides
    are week-truncated dates, so datediff/7 is an exact small
    integer.

    -> (cohort_week, week_offset, n_active, cohort_size, retention).

    Plan: one entity-keyed agg for cohorts, one distinct over
    (entity, week), one equi-join on the entity key (co-partitioned
    with the agg), then the matrix agg runs on the tiny cohorts x
    offsets frame. Nothing here is ever wider than one shuffle of
    distinct (entity, week) pairs."""
    ent = F.col(key_col).alias("ent")
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    cohorts = (df.select(ent, F.col(ts_col).alias("ts"))
               .groupBy("ent").agg(F.min("ts").alias("first_ts"))
               .select("ent", F.date_trunc("week", "first_ts")
                       .cast("date").alias("cohort")))
    act = df.select(ent, wk.alias("wk")).distinct()
    j = act.join(cohorts, "ent")
    offset = (F.datediff("wk", "cohort") / 7).cast("long")
    m = (j.groupBy(F.col("cohort"), offset.alias("week_offset"))
         .agg(F.count(F.lit(1)).alias("n_active")))
    sizes = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    return (m.join(sizes, "cohort")
            .select(F.col("cohort").cast("string").alias("cohort_week"),
                    "week_offset", "n_active", "cohort_size",
                    F.round(F.col("n_active") / F.col("cohort_size"), 6)
                    .alias("retention")))


def window_funnel(events: DataFrame, steps: list[str],
                  window_us: int, key_col: str = "user_id",
                  ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """(key, funnel_level) — ordered-step funnel conversion (the
    ClickHouse windowFunnel / product-analytics funnel): per key, the
    deepest step k reachable by a chain t1 < t2 < ... < tk of events
    matching steps[0..k-1] in order with tk - t1 <= window_us.
    Greedy earliest-next chains are optimal here (choosing the
    minimal next-step time only enlarges every later choice), so the
    exact level comes from chain times m2..mk computed as:

    - m_{i+1} at any row = min ts of a step-(i+1) event STRICTLY
      after it — one per-key window with a descending RANGE frame
      (UNBOUNDED PRECEDING .. -1 == ts >= cur+1, the strict-greater
      trick; identical frame semantics in DuckDB), and
    - m_{i+2}..m_k pulled onto step-i rows by a co-keyed equi-join on
      (key, m_{i+1}) against the step-(i+1) chain rows — k-2 joins
      total, all on the SAME key partitioning, join width 1 (chain
      rows are distinct per (key, ts) after dedup of identical-ts
      duplicates, which carry identical chain tails by construction).

    Keys with matching events but no step-1 event report level 0.
    Scale: one key-keyed exchange feeds every window and join; no
    step1 x step2 pair blowup (the naive shape) — per-key cost is
    O(events log events) sort, the TSDB funnel shape."""
    if len(steps) < 2:
        raise ValueError("need at least 2 funnel steps")
    if len(set(steps)) != len(steps):
        # a type naming two stages would silently bind to only the
        # earliest one — repeated-step funnels need a stateful matcher
        raise ValueError("funnel steps must be distinct event types")
    k = len(steps)
    step_idx = F.lit(None).cast("int")
    for i, s in enumerate(reversed(steps)):
        step_idx = F.when(F.col(type_col) == s,
                          F.lit(k - 1 - i)).otherwise(step_idx)
    e = (events.select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            step_idx.alias("step"))
         .filter(F.col("step").isNotNull()))
    w = (Window.partitionBy("key").orderBy(F.col("t").desc())
         .rangeBetween(Window.unboundedPreceding, -1))
    # ALL next-step minima from ONE window pass (one per-key sort
    # total — not one re-sort per funnel stage; the oracle's wm CTE
    # is the same single pass)
    em = e.select(
        "key", "t", "step",
        *[F.min(F.when(F.col("step") == i, F.col("t"))).over(w)
          .alias(f"m{i}") for i in range(1, k)])

    # chain rows for the LAST transition first, then walk backwards
    chain = (em.filter(F.col("step") == k - 2)
             .select("key", "t", f"m{k-1}").distinct())
    for i in range(k - 3, -1, -1):
        nxt = (em.filter(F.col("step") == i)
               .select("key", "t", f"m{i+1}").distinct())
        right = chain.select(
            F.col("key").alias("_k"), F.col("t").alias("_t"),
            *[F.col(f"m{j}").alias(f"_m{j}") for j in range(i + 2, k)])
        chain = (nxt.join(right,
                          (nxt["key"] == right["_k"])
                          & (nxt[f"m{i+1}"] == right["_t"]), "left")
                 .select("key", "t", f"m{i+1}",
                         *[F.col(f"_m{j}").alias(f"m{j}")
                           for j in range(i + 2, k)]))
    # level per step-0 start: deepest j with m_1..m_j set and within window
    lvl = F.lit(1)
    ok = F.lit(True)
    for j in range(1, k):
        ok = ok & F.col(f"m{j}").isNotNull() \
             & (F.col(f"m{j}") - F.col("t") <= window_us)
        lvl = F.when(ok, j + 1).otherwise(lvl)
    starts = chain.select("key", lvl.alias("lvl"))
    keys = e.select("key").distinct()
    agg = starts.groupBy("key").agg(F.max("lvl").alias("funnel_level"))
    return (keys.join(agg, "key", "left")
            .select(F.col("key"),
                    F.coalesce(F.col("funnel_level"), F.lit(0))
                    .cast("long").alias("funnel_level")))
