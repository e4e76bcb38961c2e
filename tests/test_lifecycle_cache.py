"""ES request-cache and ILM analogs: generation-keyed response caching
with exact write invalidation (operators/search_cache.py), and the
snapshot-before-compact lifecycle policy driver (operators/ilm.py)."""

import os

from connectors_spark.operators.build import build_index_transcripts
from connectors_spark.operators.delta import (
    incremental_update,
    init_store,
    resolve_current,
)
from connectors_spark.operators.ilm import lifecycle_tick
from connectors_spark.operators.index import IndexReader, write_encoded_index
from connectors_spark.operators.search_cache import RequestCache
from connectors_spark.operators.snapshot import restore_index
from connectors_spark.synth import synth_queries

from tests.test_delta import _snapshots


def _mkstore(spark, tmp_path):
    store, scratch = str(tmp_path / "store"), str(tmp_path / "scratch")
    s0, s1 = _snapshots(spark)
    write_encoded_index(
        build_index_transcripts(s0, with_positions=False), scratch,
        n_buckets=8, shard_cap=300)
    init_store(store, from_index=scratch)
    return store, s0, s1


def test_request_cache_hits_and_write_invalidation(spark, tmp_path):
    store, _s0, s1 = _mkstore(spark, tmp_path)
    queries = synth_queries(8, seed=3)
    cache = RequestCache(spark, store)

    first = cache.topk(queries)
    again = cache.topk(queries)
    assert cache.stats() == {"hits": 1, "misses": 1, "entries": 1}
    assert again == first, "cached response is the same rows"
    # a different request is its own entry
    cache.topk(queries, kernel="wand")
    assert cache.misses == 2

    # ANY visible write moves the version: the old entry never serves
    rec = incremental_update(spark, store, s1)
    assert rec is not None
    fresh = cache.topk(queries)
    assert cache.misses == 3
    assert fresh != first, "post-write response reflects the update"
    # and the refreshed result is what a cold reader computes
    cold = IndexReader(spark, store, cache=False).topk(queries).collect()
    key = lambda rows: sorted((r.query_id, r.rank, r.doc_id) for r in rows)
    assert key(fresh) == key(cold)


def test_request_cache_lru_eviction(spark, tmp_path):
    store, _s0, _s1 = _mkstore(spark, tmp_path)
    cache = RequestCache(spark, store, capacity=2)
    q = synth_queries(3, seed=4)
    cache.topk([q[0]])
    cache.topk([q[1]])
    cache.topk([q[2]])          # evicts q[0]
    assert cache.stats()["entries"] == 2
    cache.topk([q[2]])          # still cached
    assert cache.hits == 1
    cache.topk([q[0]])          # was evicted -> miss
    assert cache.misses == 4


def test_lifecycle_tick_snapshots_before_compaction(spark, tmp_path):
    store, _s0, s1 = _mkstore(spark, tmp_path)
    repo = str(tmp_path / "repo")
    queries = synth_queries(10, seed=5) + [
        {"query_id": "fresh", "query_text": "freshterm", "k": 10}]

    # phase 1: nothing dead yet — snapshot only, no force-merge
    gen1 = os.path.basename(resolve_current(store))
    acts = lifecycle_tick(spark, store, repo=repo, max_dead_ratio=0.001)
    assert acts == {"snapshot": f"{gen1}@0", "compacted": False}
    # idempotent: same generation is not re-snapshotted
    acts = lifecycle_tick(spark, store, repo=repo, max_dead_ratio=0.001)
    assert acts["snapshot"] is None

    rec = incremental_update(spark, store, s1)
    assert rec is not None and rec["n_tombstones"] > 0
    pre = sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9))
                 for r in IndexReader(spark, store, cache=False)
                 .topk(queries).collect())

    # phase 2: thresholds exceeded — snapshot the dirty generation,
    # THEN force-merge (new generation promoted, old one GC-eligible)
    acts = lifecycle_tick(spark, store, repo=repo, max_dead_ratio=0.001,
                          keep_previous=0)
    assert acts["compacted"] is True
    assert acts["snapshot"] == f"{gen1}@{rec['gen']}", \
        "dirty generation re-snapshotted at its new watermark, pre-merge"
    gen2 = os.path.basename(resolve_current(store))
    assert gen2 != gen1

    post = sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9))
                  for r in IndexReader(spark, store, cache=False)
                  .topk(queries).collect())
    assert post == pre, "force-merge preserves results"

    # the GC'd pre-merge generation is restorable from the repository
    # and answers exactly as it did before the merge
    restored = restore_index(repo, acts["snapshot"], str(tmp_path / "rest"))
    back = sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9))
                  for r in IndexReader(spark, restored, cache=False)
                  .topk(queries).collect())
    assert back == pre
