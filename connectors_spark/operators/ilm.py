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
