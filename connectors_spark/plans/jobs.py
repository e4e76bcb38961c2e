"""Sync-job catalog: status state machine, CAS claims, heartbeats, stats.

Mirrors the reference's `.elastic-connectors-sync-jobs` protocol
(reference: app/connectors_service/connectors/protocol/connectors.py:
105-113 status enum, 84-93 counters, 1024-1060 job creation, 381-399 CAS
claim; heartbeat app/connectors_service/connectors/sync_job_runner.py:
38,480-493; idle cleanup app/connectors_service/connectors/services/
job_cleanup.py:49-80) as a file-backed catalog: one JSON doc per job,
optimistic concurrency via atomic create/replace (the file-system analog
of if_seq_no/if_primary_term compare-and-swap,
reference: app/connectors_service/connectors/es/index.py:211-221).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from connectors_spark import commitfs

PENDING, IN_PROGRESS = "pending", "in_progress"
COMPLETED, ERROR, CANCELED, SUSPENDED = "completed", "error", "canceled", "suspended"
TERMINAL = {COMPLETED, ERROR, CANCELED, SUSPENDED}
_TRANSITIONS = {
    PENDING: {IN_PROGRESS, CANCELED},
    IN_PROGRESS: TERMINAL,
}
IDLE_TIMEOUT_S = 300  # reference: protocol/connectors.py:998


class InvalidTransition(ValueError):
    pass


class ClaimConflict(RuntimeError):
    pass


class CasDocStore:
    """File-backed doc store with optimistic concurrency: one JSON doc
    per id, seq_no compare-and-swap on every write (the file-system
    analog of Elasticsearch's if_seq_no/if_primary_term,
    reference: app/connectors_service/connectors/es/index.py:211-221,
    es/client.py:279-297 with_concurrency_control). Shared by the
    sync-job catalog and the connector catalog."""

    def __init__(self, path: str):
        self.dir = path
        os.makedirs(path, exist_ok=True)

    def _file(self, doc_id: str) -> str:
        return os.path.join(self.dir, f"{doc_id}.json")

    def get(self, doc_id: str) -> dict:
        with open(self._file(doc_id)) as f:
            return json.load(f)

    def _write(self, doc_id: str, doc: dict, expect_new: bool = False,
               expect_seq: int | None = None) -> None:
        path = self._file(doc_id)
        if expect_new and os.path.exists(path):
            raise ClaimConflict(doc_id)
        if expect_seq is not None:
            cur = self.get(doc_id)
            if cur["seq_no"] != expect_seq:
                raise ClaimConflict(
                    f"{doc_id}: seq {cur['seq_no']} != expected {expect_seq}"
                )
            doc["seq_no"] = expect_seq + 1
        commitfs.put_json_atomic(path, doc)

    def _cas_update(self, doc_id: str, mutate, retries: int = 5) -> dict:
        """Read-modify-write under seq_no CAS, re-reading on conflict —
        the reference's if_seq_no/if_primary_term retry loop
        (es/index.py:211-221). `mutate(doc)` must touch only its own
        fields so a retry never resurrects stale state; returning the
        sentinel False from mutate skips the write."""
        last: ClaimConflict | None = None
        for _ in range(retries):
            doc = self.get(doc_id)
            seq = doc["seq_no"]
            if mutate(doc) is False:
                return doc
            try:
                self._write(doc_id, doc, expect_seq=seq)
                return doc
            except ClaimConflict as e:
                last = e
        raise ClaimConflict(f"{doc_id}: CAS retries exhausted") from last


class JobCatalog(CasDocStore):
    def create(self, connector_id: str, job_type: str = "full",
               sync_cursor: dict | None = None) -> str:
        job_id = f"job-{uuid.uuid4().hex[:12]}"
        doc = {
            "id": job_id, "connector_id": connector_id, "job_type": job_type,
            "status": PENDING, "created_at": time.time(), "last_seen": None,
            "worker_hostname": None, "sync_cursor": sync_cursor, "seq_no": 0,
            "indexed_document_count": 0, "indexed_document_volume": 0,
            "deleted_document_count": 0, "error": None,
        }
        self._write(job_id, doc, expect_new=True)
        return job_id

    def _transition(self, doc: dict, new_status: str) -> None:
        allowed = _TRANSITIONS.get(doc["status"], set())
        if new_status not in allowed:
            raise InvalidTransition(f"{doc['status']} -> {new_status}")
        doc["status"] = new_status

    def claim(self, job_id: str, worker: str) -> dict:
        """CAS claim: only one worker wins (sync_job_runner.py:131-140)."""
        doc = self.get(job_id)
        seq = doc["seq_no"]
        self._transition(doc, IN_PROGRESS)
        doc["worker_hostname"] = worker
        doc["last_seen"] = time.time()
        self._write(job_id, doc, expect_seq=seq)
        return doc

    def heartbeat(self, job_id: str) -> None:
        def mut(doc):
            doc["last_seen"] = time.time()
        self._cas_update(job_id, mut)

    def update_stats(self, job_id: str, **counters) -> None:
        def mut(doc):
            for k, v in counters.items():
                doc[k] = v
        self._cas_update(job_id, mut)

    def finish(self, job_id: str, status: str = COMPLETED,
               error: str | None = None, sync_cursor: dict | None = None) -> None:
        doc = self.get(job_id)
        seq = doc["seq_no"]
        self._transition(doc, status)
        doc["error"] = error
        if sync_cursor is not None:
            # cursor persisted only on successful completion
            # (sync_job_runner.py:340-353)
            doc["sync_cursor"] = sync_cursor
        self._write(job_id, doc, expect_seq=seq)

    def cancel(self, job_id: str, spark=None) -> None:
        """Cooperative cancellation: mark the job canceled (CAS) and
        interrupt its running Spark jobs via cancelJobGroup — the engine
        analog of the reference's task.cancel() fan-out
        (app/connectors_service/connectors/es/sink.py:984-1028)."""
        def mut(doc):
            self._transition(doc, CANCELED)
        self._cas_update(job_id, mut)
        if spark is not None:
            spark.sparkContext.cancelJobGroup(job_id)

    def run_cancellable(self, spark, job_id: str, fn):
        """Run fn() with every Spark job it launches tagged by `job_id`,
        so cancel(job_id, spark) interrupts them mid-stage. A cancelled
        run returns None (cooperative stop, not an error); any other
        failure propagates after the job is marked error."""
        sc = spark.sparkContext
        sc.setJobGroup(job_id, f"sync job {job_id}", interruptOnCancel=True)
        try:
            return fn()
        except Exception as e:
            doc = self.get(job_id)
            if doc["status"] == CANCELED:
                return None
            if doc["status"] == IN_PROGRESS:
                self.finish(job_id, ERROR, error=str(e)[:500])
            raise
        finally:
            sc.setJobGroup("", "")

    def pending_jobs(self) -> list[dict]:
        """Sorted created_at ASC (protocol/connectors.py:1083)."""
        docs = []
        for name in os.listdir(self.dir):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    docs.append(json.load(f))
        return sorted(
            (d for d in docs if d["status"] == PENDING),
            key=lambda d: d["created_at"],
        )

    def cleanup_idle(self, now: float | None = None) -> list[str]:
        """Jobs idle > 300 s marked error (job_cleanup.py:49-80)."""
        now = now or time.time()
        out = []
        for name in os.listdir(self.dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.dir, name)) as f:
                doc = json.load(f)
            if (doc["status"] == IN_PROGRESS and doc["last_seen"]
                    and now - doc["last_seen"] > IDLE_TIMEOUT_S):
                seq = doc["seq_no"]
                doc["status"] = ERROR
                doc["error"] = "idle timeout"
                try:
                    self._write(doc["id"], doc, expect_seq=seq)
                except ClaimConflict:
                    continue  # job progressed since read — not idle
                out.append(doc["id"])
        return out
