"""ES `_snapshot` / restore analog for the index store.

Reference context: connectors delegates durability to Elasticsearch,
whose snapshot module copies immutable segment files into a blob
repository, deduplicating unchanged segments across snapshots and
restoring by materializing a snapshot's file set into a fresh index
(docs: ES snapshot-restore module). This is the same design over this
engine's index store (operators/delta.py generation dirs + CURRENT
pointer; operators/index.py postings manifest):

- A repository is a directory with a content-addressed `blobs/` pool
  (sha256 of file bytes) plus one JSON manifest per snapshot mapping
  index-relative paths -> blob hashes. Index files are immutable once
  committed (postings/docmap/delta files are write-once; meta.json is
  tiny), so snapshot N+1 re-links the blobs snapshot N already stored
  and uploads only new generations/deltas — ES's incremental-snapshot
  behavior.
- Only MANIFESTED postings are captured (read through the same
  postings_manifest.json the readers resolve), so loser-attempt orphan
  files never enter the repository.
- Restore materializes a snapshot into a destination dir (hard links
  when the repo and destination share a filesystem, byte copies
  otherwise) — an IndexReader over the restore answers exactly as the
  source index did at snapshot time.
- Deleting a snapshot drops its manifest and garbage-collects blobs no
  remaining snapshot references (refcount at delete time, like ES).

At cluster scale the blob pool is an object-store prefix and the
hashing runs where the files live; the manifest/commit protocol is
unchanged — the repository metadata is tiny (one JSON per snapshot),
and all data movement is whole immutable files.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from connectors_spark import commitfs

from connectors_spark.operators.delta import resolve_current
from connectors_spark.operators.index import POSTINGS_MANIFEST

_SNAP_SUFFIX = ".snap.json"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _index_files(index_dir: str) -> list[str]:
    """Index-relative paths of every file a reader can resolve: meta,
    docmap, manifested postings (orphans excluded), the manifest itself,
    and the full delta chain."""
    rels: list[str] = []
    meta = os.path.join(index_dir, "meta.json")
    if not os.path.exists(meta):
        raise FileNotFoundError(f"not an index dir (no meta.json): {index_dir}")
    rels.append("meta.json")
    mf = os.path.join(index_dir, POSTINGS_MANIFEST)
    if os.path.exists(mf):
        rels.append(POSTINGS_MANIFEST)
        with open(mf) as f:
            for rel in json.load(f)["files"]:
                rels.append(os.path.join("postings", rel))
    else:  # committer-written index: the directory listing IS the truth
        for root, _d, files in os.walk(os.path.join(index_dir, "postings")):
            for fn in files:
                rels.append(os.path.relpath(os.path.join(root, fn), index_dir))
    for sub in ("docmap", "delta"):
        top = os.path.join(index_dir, sub)
        if os.path.isdir(top):
            for root, _d, files in os.walk(top):
                for fn in files:
                    rels.append(
                        os.path.relpath(os.path.join(root, fn), index_dir))
    return sorted(rels)


def _link_or_copy(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copyfile(src, dst)


def snapshot_index(index_path: str, repo: str, name: str) -> dict:
    """Snapshot the index's CURRENT generation into `repo` under `name`.
    Returns the snapshot manifest. Incremental: blobs already present
    in the repository (from any earlier snapshot) are not re-written."""
    index_dir = resolve_current(index_path)
    blob_dir = os.path.join(repo, "blobs")
    os.makedirs(blob_dir, exist_ok=True)
    snap_path = os.path.join(repo, name + _SNAP_SUFFIX)
    if os.path.exists(snap_path):
        raise FileExistsError(f"snapshot exists: {name}")
    files, reused, uploaded = {}, 0, 0
    for rel in _index_files(index_dir):
        src = os.path.join(index_dir, rel)
        digest = _sha256(src)
        blob = os.path.join(blob_dir, digest)
        if os.path.exists(blob):
            reused += 1
        else:
            tmp = blob + f".tmp-{os.getpid()}"
            _link_or_copy(src, tmp)
            os.replace(tmp, blob)
            uploaded += 1
        files[rel] = digest
    manifest = {"name": name, "files": files,
                "n_files": len(files), "uploaded": uploaded, "reused": reused}
    commitfs.put_json_atomic(snap_path, manifest)
    return manifest


def list_snapshots(repo: str) -> list[str]:
    if not os.path.isdir(repo):
        return []
    return sorted(f[: -len(_SNAP_SUFFIX)] for f in os.listdir(repo)
                  if f.endswith(_SNAP_SUFFIX))


def _load_manifest(repo: str, name: str) -> dict:
    with open(os.path.join(repo, name + _SNAP_SUFFIX)) as f:
        return json.load(f)


def restore_index(repo: str, name: str, dest: str) -> str:
    """Materialize snapshot `name` into `dest` (must not exist). Hard
    links from the blob pool when possible, so a same-filesystem restore
    moves no bytes. Returns `dest`, ready for IndexReader."""
    if os.path.exists(dest):
        raise FileExistsError(f"restore destination exists: {dest}")
    manifest = _load_manifest(repo, name)
    blob_dir = os.path.join(repo, "blobs")
    tmp = dest + f".restoring-{os.getpid()}"
    for rel, digest in manifest["files"].items():
        src, dst = os.path.join(blob_dir, digest), os.path.join(tmp, rel)
        if rel.endswith(".json"):
            # metadata is the one file class a later writer may replace
            # in place — byte-copy it so no write path can ever reach a
            # blob through a hard link; bulk parquet stays linked
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copyfile(src, dst)
        else:
            _link_or_copy(src, dst)
    os.replace(tmp, dest)
    return dest


def delete_snapshot(repo: str, name: str) -> int:
    """Drop the snapshot and GC blobs no remaining snapshot references.
    Returns the number of blobs removed."""
    os.remove(os.path.join(repo, name + _SNAP_SUFFIX))
    live: set[str] = set()
    for other in list_snapshots(repo):
        live.update(_load_manifest(repo, other)["files"].values())
    removed = 0
    blob_dir = os.path.join(repo, "blobs")
    if os.path.isdir(blob_dir):
        for fn in os.listdir(blob_dir):
            if fn not in live and not fn.startswith("."):
                os.remove(os.path.join(blob_dir, fn))
                removed += 1
    return removed


# ---------------------------------------------------------------- CCR

def ccr_follow(repo: str, follower_dir: str, state_path: str) -> dict:
    """ES cross-cluster replication (CCR) analog over the snapshot
    repository: one follower catch-up tick. ES's follower pulls the
    leader's newly-written immutable segment files and advances a
    checkpoint; here the leader's durability stream IS the repository
    (content-addressed blobs + per-snapshot manifests), so following =
    restore-the-delta: for the newest snapshot not yet applied,
    materialize only files whose blob hash differs from what the
    follower already has, delete follower files the snapshot no longer
    lists, and advance the checkpoint file. Idempotent: a re-run after
    a crash (or with no new snapshot) is a no-op. Returns the tick
    report {applied, copied, deleted, up_to_date}.

    Scale shape: file-level and incremental — per tick the work is
    O(changed blobs), never a full re-copy; the state is one tiny JSON
    (snapshot name + per-file hashes), exactly ES's shard-level
    retention-lease bookkeeping made explicit."""
    import json
    import os
    import shutil

    snaps = list_snapshots(repo)
    state = {"applied": None, "files": {}}
    if os.path.exists(state_path):
        with open(state_path) as fh:
            state = json.load(fh)
    if not snaps:
        return {"applied": state["applied"], "copied": 0, "deleted": 0,
                "up_to_date": True}
    target = snaps[-1]
    if target == state["applied"]:
        return {"applied": target, "copied": 0, "deleted": 0,
                "up_to_date": True}
    manifest = _load_manifest(repo, target)
    want: dict = manifest["files"]
    have: dict = state.get("files", {})
    copied = 0
    for rel, digest in want.items():
        if have.get(rel) == digest:
            continue
        dst = os.path.join(follower_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if os.path.exists(dst):
            os.remove(dst)              # hard-linked blobs are immutable
        _link_or_copy(os.path.join(repo, "blobs", digest), dst)
        copied += 1
    deleted = 0
    for rel in set(have) - set(want):
        path = os.path.join(follower_dir, rel)
        if os.path.exists(path):
            os.remove(path)
            deleted += 1
    # checkpoint LAST (crash before this line -> clean re-apply)
    commitfs.put_json_atomic(
        state_path, {"applied": target, "files": want})
    return {"applied": target, "copied": copied, "deleted": deleted,
            "up_to_date": False}


def slm_retention_plan(snaps, now_col, expire_after_days: int = 30,
                       min_count: int = 5, max_count: int = 50):
    """ES SLM (snapshot lifecycle management) retention as one windowed
    projection over a snapshot catalog — the policy behind
    `delete_snapshot` sweeps on the repository above.

    ES retention semantics (slm retention: expire_after / min_count /
    max_count), per policy: order snapshots newest-first;
    - any snapshot beyond max_count is deleted regardless of age;
    - an expired snapshot (age >= expire_after) is deleted ONLY while
      more than min_count remain — the newest min_count survive even
      when all are expired.

    Input columns: policy (string), snap_name (string), created_ts
    (timestamp). Output adds age_days, rn (1 = newest) and action
    ('keep'/'delete'). One window partitioned by policy — catalogs of
    thousands of policies plan in a single pass; integer-day age keeps
    the plan reproducible across evaluation jitter.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    age = F.datediff(F.to_date(now_col), F.to_date("created_ts"))
    w = Window.partitionBy("policy").orderBy(
        F.col("created_ts").desc(), F.col("snap_name"))
    ranked = snaps.select(
        "policy", "snap_name",
        age.cast("int").alias("age_days"),
        F.row_number().over(w).alias("rn"),
    )
    delete = (
        (F.col("rn") > F.lit(max_count))
        | ((F.col("age_days") >= F.lit(expire_after_days))
           & (F.col("rn") > F.lit(min_count)))
    )
    return ranked.withColumn(
        "action", F.when(delete, F.lit("delete")).otherwise(F.lit("keep")))
