"""M5: kill-and-resume — a build killed mid-flight resumes from the
manifest and produces a byte-identical query surface (no duplicate or
missing postings). Mirrors the reference's suspended-job semantics
(reference: app/connectors_service/connectors/sync_job_runner.py:197-204).
"""

import pytest

from connectors_spark.operators.build import build_index_transcripts, with_doc_id
from connectors_spark.operators.index import query_index
from connectors_spark.oracle import OracleIndex
from connectors_spark.plans.checkpoint import BuildManifest, resumable_write_encoded_index
from connectors_spark.synth import synth_queries, synth_transcripts


class Boom(RuntimeError):
    pass


def test_kill_and_resume_identical(spark, tmp_path):
    path = str(tmp_path / "idx")
    t = synth_transcripts(spark, 80, seed=42).cache()
    idx = build_index_transcripts(t, with_positions=False)

    # kill after the 2nd encode group
    state = {"encodes": 0}

    def killer(unit):
        if unit.startswith("encode:"):
            state["encodes"] += 1
            if state["encodes"] == 2:
                raise Boom(unit)

    with pytest.raises(Boom):
        resumable_write_encoded_index(
            idx, path, n_buckets=8, n_groups=4, shard_cap=500, on_unit_done=killer
        )
    done_before = BuildManifest(path).done_units()
    assert "docmap" in done_before and "postings_raw" in done_before
    assert sum(u.startswith("encode:") for u in done_before) == 2
    assert "meta" not in done_before

    # resume: must not redo completed units
    redone = []
    resumable_write_encoded_index(
        idx, path, n_buckets=8, n_groups=4, shard_cap=500,
        on_unit_done=redone.append,
    )
    assert all(u not in done_before for u in redone)
    recs = {r["unit"]: r for r in BuildManifest(path).records()}
    assert all(r["status"] == "completed" for r in recs.values())
    assert recs["encode:0"]["wall_ms"] >= 0 and recs["encode:0"]["rows"] > 0

    # resumed index is rank/score-identical to the oracle
    rows = with_doc_id(t).select("doc_id", "text").collect()
    oracle = OracleIndex([(r.doc_id, r.text) for r in rows])
    queries = synth_queries(25, seed=3)
    got = sorted(
        query_index(spark, path, queries, kernel="auto").collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    exp = oracle.score_queryset(queries)
    assert [(g.query_id, g.rank, g.doc_id) for g in got] == [e[:3] for e in exp]
    for g, e in zip(got, exp):
        assert g.score == pytest.approx(e[3], rel=1e-9)

    # idempotence: a third run is a no-op
    n_manifest = len(BuildManifest(path).records())
    resumable_write_encoded_index(idx, path, n_buckets=8, n_groups=4, shard_cap=500)
    assert len(BuildManifest(path).records()) == n_manifest
