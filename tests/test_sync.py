"""Create/update/skip/delete matrix — mirrors the reference's sink tests
(reference: app/connectors_service/tests/test_sink.py:489-944 parametrized
get_docs matrices) and the ftest delete-then-resync flow
(reference: app/connectors_service/tests/ftest.sh:414-418)."""

from datetime import datetime

from pyspark.sql import functions as F

from connectors_spark.operators.build import with_doc_id
from connectors_spark.operators.sync import (
    classify_sync_ops,
    incremental_extract,
    ingestion_stats,
)
from connectors_spark.synth import synth_transcripts


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, ts timestamp")


T1 = datetime(2025, 1, 1)
T2 = datetime(2025, 2, 1)


def test_classification_matrix(spark):
    extracted = _mk(spark, [("new", T1), ("same", T1), ("moved", T2)])
    manifest = _mk(spark, [("same", T1), ("moved", T1), ("gone", T1)])
    ops = {r.doc_id: r.op for r in classify_sync_ops(extracted, manifest).collect()}
    assert ops == {"new": "create", "same": "skip", "moved": "update",
                   "gone": "delete"}


def test_no_skip_when_disabled(spark):
    extracted = _mk(spark, [("same", T1)])
    manifest = _mk(spark, [("same", T1)])
    ops = {r.doc_id: r.op
           for r in classify_sync_ops(extracted, manifest, skip_unchanged=False).collect()}
    assert ops == {"same": "update"}


def test_delete_then_resync_counts(spark):
    """Seeded 2% deletion: engine must emit exactly those deletes."""
    t = with_doc_id(synth_transcripts(spark, 50, seed=7)).cache()
    manifest = t.select("doc_id", "ts")
    deleted = t.filter(F.pmod(F.xxhash64("doc_id"), F.lit(50)) == 0)
    survivors = t.join(deleted, "doc_id", "left_anti")
    ops = classify_sync_ops(survivors.select("doc_id", "ts"), manifest)
    by_op = {r.op: r.n for r in ops.groupBy("op").agg(F.count("*").alias("n")).collect()}
    n_del = deleted.count()
    assert n_del > 0
    assert by_op.get("delete", 0) == n_del
    assert by_op.get("skip", 0) == t.count() - n_del
    assert "create" not in by_op and "update" not in by_op
    # the delete set is exactly the removed ids
    got = {r.doc_id for r in ops.filter("op = 'delete'").collect()}
    exp = {r.doc_id for r in deleted.select("doc_id").collect()}
    assert got == exp


def test_ingestion_stats(spark):
    extracted = _mk(spark, [("new", T1), ("same", T1), ("moved", T2)])
    manifest = _mk(spark, [("same", T1), ("moved", T1), ("gone", T1)])
    ops = classify_sync_ops(extracted, manifest)
    payload = extracted.withColumn("text", F.lit("x" * 10))
    row = ingestion_stats(ops, payload).first()
    assert row.indexed_document_count == 2
    assert row.deleted_document_count == 1
    assert row.skipped_document_count == 1
    assert row.indexed_document_volume > 0


def test_incremental_extract(spark):
    src = _mk(spark, [("a", T1), ("b", T2)])
    got = incremental_extract(src, T1)
    assert [r.doc_id for r in got.collect()] == ["b"]


def test_access_control_sync_ops(spark):
    """Identity extraction + ACL diff (reference es/sink.py:826-856)."""
    from connectors_spark.operators.access_control import (
        access_control_sync, extract_identities,
    )

    events = spark.createDataFrame(
        [(1, "2025-01-02 00:00:00", 10, "click"),
         (2, "2025-01-03 00:00:00", 10, "error"),
         (3, "2025-01-02 00:00:00", 20, "view")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ids = extract_identities(events)
    got = {r.doc_id: r for r in ids.collect()}
    assert got["user:10"].access_control == ["user:10", "type:click", "type:error"]
    assert str(got["user:10"].ts) == "2025-01-03 00:00:00"

    manifest = spark.createDataFrame(
        [("user:10", "2025-01-03 00:00:00"),   # same ts -> skip
         ("user:30", "2025-01-01 00:00:00")],  # not live -> delete
        "doc_id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ops = {r.doc_id: (r.op, r.access_control)
           for r in access_control_sync(ids, manifest).collect()}
    assert ops["user:10"][0] == "skip"
    assert ops["user:20"] == ("create", ["user:20", "type:view"])
    assert ops["user:30"] == ("delete", None)
