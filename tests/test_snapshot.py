"""ES _snapshot/restore analog: content-addressed incremental snapshots
of the index store, restore rank-identity, blob dedup across snapshots,
and reference-counted deletion (operators/snapshot.py)."""

import os

import pytest

from connectors_spark.operators.build import build_index_transcripts
from connectors_spark.operators.delta import incremental_update
from connectors_spark.operators.index import IndexReader, write_encoded_index
from connectors_spark.operators.snapshot import (
    delete_snapshot,
    list_snapshots,
    restore_index,
    snapshot_index,
)
from connectors_spark.synth import synth_queries, synth_transcripts

from tests.test_delta import _snapshots

QUERIES = None


def _topk(spark, path):
    queries = synth_queries(12, seed=7) + [
        {"query_id": "fresh", "query_text": "freshterm", "k": 10}]
    reader = IndexReader(spark, path, cache=False)
    return [(r.query_id, r.rank, r.doc_id, r.score)
            for r in sorted(reader.topk(queries).collect(),
                            key=lambda r: (r.query_id, r.rank))]


@pytest.fixture(scope="module")
def snapped(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("snapshot")
    idx, repo = str(base / "idx"), str(base / "repo")
    s0, s1 = _snapshots(spark)
    write_encoded_index(
        build_index_transcripts(s0, with_positions=False), idx,
        n_buckets=8, shard_cap=300)
    res0 = _topk(spark, idx)
    m0 = snapshot_index(idx, repo, "snap-gen0")
    rec = incremental_update(spark, idx, s1)
    assert rec is not None and rec["gen"] == 1
    res1 = _topk(spark, idx)
    m1 = snapshot_index(idx, repo, "snap-gen1")
    return idx, repo, res0, res1, m0, m1


def test_snapshot_is_incremental(snapped):
    _idx, repo, _r0, _r1, m0, m1 = snapped
    # into an empty repo, uploads = distinct contents (identical files —
    # e.g. empty _SUCCESS markers — share one blob even within a snapshot)
    assert m0["uploaded"] == len(set(m0["files"].values()))
    assert m0["uploaded"] + m0["reused"] == m0["n_files"]
    # gen-1 snapshot re-links every unchanged gen-0 file: only the delta
    # dir + the rewritten meta.json upload
    assert m1["reused"] > 0
    assert m1["uploaded"] < m1["n_files"]
    assert list_snapshots(repo) == ["snap-gen0", "snap-gen1"]


def test_restore_rank_identity(spark, snapped, tmp_path):
    idx, repo, res0, res1, _m0, _m1 = snapped
    r0 = restore_index(repo, "snap-gen0", str(tmp_path / "r0"))
    r1 = restore_index(repo, "snap-gen1", str(tmp_path / "r1"))
    assert _topk(spark, r0) == res0, "restore answers as of snapshot time"
    assert _topk(spark, r1) == res1
    assert res0 != res1  # the delta actually changed results


def test_restore_refuses_existing_dest(snapped, tmp_path):
    _idx, repo = snapped[0], snapped[1]
    dest = tmp_path / "taken"
    dest.mkdir()
    with pytest.raises(FileExistsError):
        restore_index(repo, "snap-gen0", str(dest))


def test_duplicate_snapshot_name_rejected(snapped):
    idx, repo = snapped[0], snapped[1]
    with pytest.raises(FileExistsError):
        snapshot_index(idx, repo, "snap-gen0")


def test_delete_gc_keeps_shared_blobs(spark, snapped, tmp_path):
    idx, repo, _res0, res1, _m0, m1 = snapped
    blob_dir = os.path.join(repo, "blobs")
    before = len(os.listdir(blob_dir))
    removed = delete_snapshot(repo, "snap-gen0")
    # gen-0-only blobs go; everything gen-1 references survives
    assert removed > 0
    assert len(os.listdir(blob_dir)) == before - removed
    assert list_snapshots(repo) == ["snap-gen1"]
    r = restore_index(repo, "snap-gen1", str(tmp_path / "after_gc"))
    assert _topk(spark, r) == res1, "surviving snapshot restores intact"


def test_ccr_follow_incremental_and_idempotent(spark, snapped,
                                               tmp_path_factory):
    from connectors_spark.operators.snapshot import ccr_follow

    idx, repo, res0, res1, m0, m1 = snapped
    base = tmp_path_factory.mktemp("ccr")
    follower = str(base / "follower")
    state = str(base / "follow_state.json")

    # first tick applies the NEWEST snapshot (gen1) from scratch
    r1 = ccr_follow(repo, follower, state)
    assert r1["applied"] == "snap-gen1" and not r1["up_to_date"]
    assert r1["copied"] == len(m1["files"])
    # follower answers queries rank-identically to the leader at gen1
    assert _topk(spark, follower) == res1

    # second tick: no new snapshot -> no-op
    r2 = ccr_follow(repo, follower, state)
    assert r2 == {"applied": "snap-gen1", "copied": 0, "deleted": 0,
                  "up_to_date": True}

    # a new leader snapshot -> the next tick copies ONLY changed blobs
    from connectors_spark.operators.delta import incremental_update
    from tests.test_delta import _snapshots
    _s0, s1 = _snapshots(spark)
    extra = s1.limit(40)
    rec = incremental_update(spark, idx, extra)
    assert rec is not None
    from connectors_spark.operators.snapshot import snapshot_index
    m2 = snapshot_index(idx, repo, "snap-gen2")
    unchanged = set(m1["files"].items()) & set(m2["files"].items())
    r3 = ccr_follow(repo, follower, state)
    assert r3["applied"] == "snap-gen2"
    assert r3["copied"] == len(m2["files"]) - len(unchanged)
    assert r3["copied"] < len(m2["files"])      # incremental, not full
    assert _topk(spark, follower) == _topk(spark, idx)

    # crash-safety: stale state file replay is clean (idempotent apply)
    import json
    with open(state) as fh:
        st = json.load(fh)
    st["applied"] = "snap-gen1"
    with open(state, "w") as fh:
        json.dump(st, fh)
    r4 = ccr_follow(repo, follower, state)
    assert r4["applied"] == "snap-gen2" and r4["copied"] == 0
    assert _topk(spark, follower) == _topk(spark, idx)
