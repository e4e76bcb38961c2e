"""Content-index merge sink + sync-job catalog state machine."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from connectors_spark.plans.jobs import (
    ClaimConflict,
    InvalidTransition,
    JobCatalog,
)
from connectors_spark.sources.sink import (
    full_sync,
    merge_content_index,
    read_content_index,
)

T1, T2 = datetime(2025, 1, 1), datetime(2025, 2, 1)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, ts timestamp, body string")


def test_merge_upsert_delete(spark, tmp_path):
    path = str(tmp_path / "ci")
    rec = merge_content_index(
        spark, path, upserts=_docs(spark, [("a", T1, "A"), ("b", T1, "B")])
    )
    assert rec["rows"] == 2
    # update a, insert c, delete b
    rec = merge_content_index(
        spark, path,
        upserts=_docs(spark, [("a", T2, "A2"), ("c", T1, "C")]),
        delete_ids=spark.createDataFrame([("b",)], "doc_id string"),
    )
    got = {r.doc_id: r.body for r in read_content_index(spark, path).collect()}
    assert got == {"a": "A2", "c": "C"}
    assert rec["indexed_document_count"] == 2
    assert rec["deleted_document_count"] == 1
    assert rec["prev"] is not None  # previous generation retained


def test_full_sync_diff_semantics(spark, tmp_path):
    path = str(tmp_path / "ci2")
    full_sync(spark, path, _docs(spark, [("a", T1, "A"), ("b", T1, "B"),
                                         ("c", T1, "C")]))
    # second sync: a unchanged, b re-dated, c gone, d new
    rec = full_sync(spark, path, _docs(
        spark, [("a", T1, "A"), ("b", T2, "B2"), ("d", T1, "D")]
    ))
    got = {r.doc_id: (r.ts, r.body)
           for r in read_content_index(spark, path).collect()}
    assert set(got) == {"a", "b", "d"}
    assert got["b"] == (T2, "B2")
    assert rec["indexed_document_count"] == 2  # b update + d create, a skipped
    assert rec["deleted_document_count"] == 1  # c


def test_job_lifecycle(tmp_path):
    cat = JobCatalog(str(tmp_path / "jobs"))
    j1 = cat.create("conn-1")
    j2 = cat.create("conn-1")
    assert [d["id"] for d in cat.pending_jobs()] == [j1, j2]

    doc = cat.claim(j1, worker="w1")
    assert doc["status"] == "in_progress" and doc["worker_hostname"] == "w1"
    # second claim loses the CAS
    with pytest.raises((ClaimConflict, InvalidTransition)):
        cat.claim(j1, worker="w2")

    cat.update_stats(j1, indexed_document_count=10, deleted_document_count=2)
    cat.heartbeat(j1)
    cat.finish(j1, "completed", sync_cursor={"ts": "2025-01-01"})
    done = cat.get(j1)
    assert done["status"] == "completed"
    assert done["sync_cursor"] == {"ts": "2025-01-01"}
    assert done["indexed_document_count"] == 10

    # terminal states are frozen
    with pytest.raises(InvalidTransition):
        cat.finish(j1, "error")
    # pending -> completed is illegal (must claim first)
    with pytest.raises(InvalidTransition):
        cat.finish(j2, "completed")


def test_heartbeat_and_stats_are_cas_guarded(tmp_path):
    """heartbeat/update_stats must not clobber a racing status change
    (reference if_seq_no/if_primary_term, es/index.py:211-221)."""
    cat = JobCatalog(str(tmp_path / "jobs3"))
    j = cat.create("conn-3")
    cat.claim(j, worker="w1")

    seq0 = cat.get(j)["seq_no"]
    cat.heartbeat(j)
    assert cat.get(j)["seq_no"] == seq0 + 1  # bumped under CAS

    # a writer holding a stale seq loses
    stale = cat.get(j)
    cat.update_stats(j, indexed_document_count=5)
    with pytest.raises(ClaimConflict):
        cat._write(j, stale, expect_seq=stale["seq_no"] - 1)

    # heartbeat racing a finish re-reads and preserves the newer status
    cat.finish(j, "completed")
    cat.heartbeat(j)
    done = cat.get(j)
    assert done["status"] == "completed"
    assert done["indexed_document_count"] == 5


def test_idle_cleanup(tmp_path):
    import time

    cat = JobCatalog(str(tmp_path / "jobs2"))
    j = cat.create("conn-2")
    cat.claim(j, worker="w1")
    assert cat.cleanup_idle() == []  # fresh heartbeat
    assert cat.cleanup_idle(now=time.time() + 301) == [j]
    assert cat.get(j)["status"] == "error"


def test_submit_build_entrypoint(spark, tmp_path):
    """The spark-submit main: parquet in -> encoded index out, wrapped in
    the full job lifecycle (claim, heartbeats, counters, completion)."""
    import argparse
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from submit_build import build_main

    from connectors_spark.operators.index import IndexReader
    from connectors_spark.plans.jobs import JobCatalog
    from connectors_spark.synth import synth_transcripts

    src = str(tmp_path / "transcripts")
    synth_transcripts(spark, 25, seed=9).write.parquet(src)
    args = argparse.Namespace(
        input=src, index=str(tmp_path / "idx"), format="parquet",
        n_buckets=8, shard_cap=500, positions=False,
        jobs_dir=str(tmp_path / "jobs"), heartbeat_s=0.5,
    )
    result = build_main(spark, args)
    assert result["status"] == "completed" and result["n_docs"] > 0

    doc = JobCatalog(args.jobs_dir).get(result["job_id"])
    assert doc["status"] == "completed"
    assert doc["indexed_document_count"] == result["n_docs"]
    assert doc["last_seen"] is not None
    assert doc["sync_cursor"]["index"] == args.index

    reader = IndexReader(spark, args.index, cache=False)
    out = reader.topk([{"query_id": "q", "query_text": "t00001", "k": 5}])
    assert out.count() > 0
