"""ES index-lifecycle-management (ILM) analog over the serving store.

Reference context: ES ILM moves an index through phases — among them
force-merge (segment consolidation) and delete, with the delete phase
optionally gated on a snapshot ("wait_for_snapshot") so data leaves the
cluster only after it is durable in a repository. The store here
already has the primitives: zero-downtime compaction behind the CURRENT
pointer (operators/delta.py:maybe_compact_store = force-merge +
generation GC) and content-addressed snapshots
(operators/snapshot.py). `lifecycle_tick` is the policy driver a
scheduler (plans/cron.py) calls periodically: snapshot the live
generation FIRST, then compact — so every generation the GC later
removes is already restorable from the repository. Idempotent per
generation: an already-snapshotted generation is skipped, and
compaction only fires past the policy thresholds.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from connectors_spark.operators.delta import maybe_compact_store, resolve_current
from connectors_spark.operators.index import read_meta
from connectors_spark.operators.snapshot import list_snapshots, snapshot_index


def lifecycle_tick(spark: SparkSession, store: str, repo: str | None = None,
                   max_dead_ratio: float = 0.2,
                   max_tombstones: int = 5_000_000,
                   keep_previous: int = 1) -> dict:
    """One ILM evaluation pass. Returns the actions taken:
    {"snapshot": <generation name or None>, "compacted": bool}."""
    cur = resolve_current(store)
    meta = read_meta(cur)
    deltas = meta.get("deltas", [])
    watermark = int(deltas[-1]["gen"]) if deltas else 0
    # idempotence keys on (generation, delta watermark): a generation
    # that gained deltas since its last snapshot is dirty again and gets
    # a fresh (incremental — unchanged blobs are re-linked) snapshot
    name = f"{os.path.basename(cur)}@{watermark}"
    actions = {"snapshot": None, "compacted": False}
    if repo is not None and name not in list_snapshots(repo):
        snapshot_index(store, repo, name)
        actions["snapshot"] = name
    actions["compacted"] = maybe_compact_store(
        spark, store, max_dead_ratio=max_dead_ratio,
        max_tombstones=max_tombstones, keep_previous=keep_previous)
    return actions


# --------------------------------------------------------------- planners
# Set-at-a-time ILM policy evaluation: the tick above acts on ONE store;
# real deployments run thousands of indices/streams, so the policy scan
# itself must be a DataFrame job (one pass over the catalog, no
# per-index driver loop). Both planners below are pure integer/column
# math — no UDFs, no collects — so they stay inside whole-stage codegen
# and scale to any catalog size.

from pyspark.sql import Column, DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def rollover_plan(indices: DataFrame, now_col: Column,
                  max_age_days: int = 30,
                  max_size_bytes: int = 50 * 2**30,
                  max_docs: int = 200_000_000,
                  warm_after_days: int = 7,
                  cold_after_days: int = 30,
                  delete_after_days: int = 90) -> DataFrame:
    """ES ILM rollover + phase planner over an index-catalog frame.

    Input columns: index_name, created_ts (timestamp), size_bytes
    (bigint), docs (bigint). Mirrors ES ILM semantics (reference
    context: connectors keeps one content index per connector and
    relies on ES-side ILM for retention): the WRITE index rolls over
    when ANY of max_age / max_size / max_docs trips, and every index is
    assigned a lifecycle phase (hot/warm/cold/delete) from its age.
    Age is integer days — datediff — so the plan is reproducible
    regardless of evaluation-time sub-day jitter. One projection over
    the catalog: embarrassingly parallel at any index count.
    """
    age = F.datediff(F.to_date(now_col), F.to_date("created_ts"))
    rollover = (
        (age >= F.lit(max_age_days))
        | (F.col("size_bytes") >= F.lit(max_size_bytes))
        | (F.col("docs") >= F.lit(max_docs))
    )
    phase = (
        F.when(age >= F.lit(delete_after_days), F.lit("delete"))
        .when(age >= F.lit(cold_after_days), F.lit("cold"))
        .when(age >= F.lit(warm_after_days), F.lit("warm"))
        .otherwise(F.lit("hot"))
    )
    return indices.select(
        "index_name",
        age.cast("int").alias("age_days"),
        F.col("size_bytes").cast("long").alias("size_bytes"),
        F.col("docs").cast("long").alias("docs"),
        rollover.cast("int").alias("rollover"),
        phase.alias("phase"),
    )


def tiered_merge_plan(segments: DataFrame, merge_factor: int = 4,
                      floor_units: int = 1) -> DataFrame:
    """Lucene TieredMergePolicy-style merge planning as one windowed
    projection (the planner behind ES force-merge / background merging;
    the store's actual consolidation is operators/delta.py
    compact_index — this plans WHICH segments merge together when
    consolidation is partial rather than total).

    Input columns: index_name, seg_id (bigint), size_units (bigint).
    Tier = floor(log2(size)) computed EXACTLY via the binary-string
    length of the integer size (`bin()`), never float log — a segment
    on a power-of-two boundary lands in the same tier on every engine.
    Within (index, tier), segments are ordered size-desc (seg_id
    tie-break) and greedily grouped merge_factor at a time; a group
    with >=2 members becomes one merge task (merge_id), singletons are
    kept. Windows are partitioned by (index, tier) — thousands of
    indices plan in parallel; no global window, no driver loop.
    """
    sz = F.greatest(F.col("size_units").cast("long"), F.lit(int(floor_units)))
    tiered = segments.select(
        "index_name", F.col("seg_id").cast("long").alias("seg_id"),
        F.col("size_units").cast("long").alias("size_units"),
        (F.length(F.bin(sz)) - F.lit(1)).cast("int").alias("tier"),
    )
    w = Window.partitionBy("index_name", "tier").orderBy(
        F.col("size_units").desc(), F.col("seg_id"))
    grouped = tiered.withColumn(
        "grp", ((F.row_number().over(w) - F.lit(1))
                / F.lit(int(merge_factor))).cast("int"))
    wg = Window.partitionBy("index_name", "tier", "grp")
    sized = grouped.withColumn("grp_n", F.count(F.lit(1)).over(wg))
    return sized.select(
        "index_name", "seg_id", "size_units", "tier",
        F.when(F.col("grp_n") >= 2,
               F.concat_ws("/", F.col("index_name"),
                           F.col("tier").cast("string"),
                           F.col("grp").cast("string")))
        .alias("merge_id"),
        F.when(F.col("grp_n") >= 2, F.lit("merge"))
        .otherwise(F.lit("keep")).alias("action"),
    )
