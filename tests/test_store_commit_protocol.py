"""Store-level commit protocol (VERDICT r4 #1/#7): crash between the
generation data-write and the pointer swap leaves readers on the old
generation with no half-state; two racing compactors — exactly one
promotes, the loser retires its generation dir cleanly; the pointer
protocol runs unchanged on the object-store double (no rename)."""

import os

from pyspark.sql import functions as F

from connectors_spark.commitfs import InMemoryObjectStore
from connectors_spark.operators import delta
from connectors_spark.operators.build import build_index_transcripts, with_doc_id
from connectors_spark.operators.delta import (
    compact_index,
    current_gen,
    incremental_update,
    init_store,
    maybe_compact_store,
    promote,
    resolve_current,
    try_promote,
)
from connectors_spark.operators.index import IndexReader, write_encoded_index
from connectors_spark.oracle import OracleIndex
from connectors_spark.synth import synth_queries, synth_transcripts


def _store_with_deltas(spark, tmp_path, name="store"):
    s0 = synth_transcripts(spark, 40, seed=7).cache()
    h = F.pmod(F.xxhash64(F.concat_ws(":", "conv_id", "turn_idx")), F.lit(20))
    s1 = s0.filter(h != 0).withColumn(
        "text",
        F.when(h == 1, F.concat(F.col("text"), F.lit(" drift"))).otherwise(
            F.col("text")),
    ).withColumn(
        "ts",
        F.when(h == 1, F.col("ts") + F.expr("INTERVAL 1 HOUR")).otherwise(
            F.col("ts")),
    ).cache()
    store = str(tmp_path / name)
    scratch = str(tmp_path / f"{name}_scratch")
    write_encoded_index(
        build_index_transcripts(s0, with_positions=False), scratch,
        n_buckets=4, shard_cap=200,
    )
    init_store(store, from_index=scratch)
    rec = incremental_update(spark, store, s1)
    assert rec is not None and rec["n_tombstones"] > 0
    return store, s1


def _topk(spark, store, queries):
    reader = IndexReader(spark, store, cache=False)
    return sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9))
        for r in reader.topk(queries, kernel="wand").collect()
    )


def test_crash_between_genwrite_and_pointer_swap(spark, tmp_path):
    """Kill the compactor AFTER the new generation's files are fully
    written but BEFORE the pointer commit: readers keep resolving (and
    answering from) the old generation — never a mix — and a retried
    compaction completes normally."""
    store, s1 = _store_with_deltas(spark, tmp_path)
    queries = synth_queries(10, seed=3)
    gen_before = current_gen(store)
    before = _topk(spark, store, queries)

    # the compactor writes its full generation dir ... and dies here
    orphan = os.path.join(store, "gen-orphan-crashed")
    compact_index(spark, resolve_current(store), orphan)
    assert os.path.exists(os.path.join(orphan, "meta.json"))

    # no half-state: the pointer never moved, results are identical
    assert current_gen(store) == gen_before
    assert _topk(spark, store, queries) == before

    # retry wins cleanly; ranks are unchanged by compaction
    assert maybe_compact_store(spark, store, max_dead_ratio=0.001) is True
    assert current_gen(store) != gen_before
    assert _topk(spark, store, queries) == before
    # the crashed attempt's orphan is non-current and GC-eligible
    from connectors_spark.operators.delta import gc_store
    gc_store(store, keep_previous=0)
    assert not os.path.exists(orphan)

    rows = with_doc_id(s1).select("doc_id", "text").collect()
    oracle = OracleIndex([(r.doc_id, r.text) for r in rows])
    got = _topk(spark, store, queries)
    want = sorted(
        (qid, rank, doc, round(score, 9))
        for qid, rank, doc, score in oracle.score_queryset(queries)
    )
    assert got == want


def test_racing_compactors_exactly_one_promotes(spark, tmp_path, monkeypatch):
    """Writer-vs-writer CAS on the pointer: a rival commit lands between
    our compaction and our promote — maybe_compact_store loses the CAS,
    deletes its own (never-visible) generation, and reports False; the
    rival's generation stays live."""
    store, _ = _store_with_deltas(spark, tmp_path)
    cur_name = current_gen(store)

    # the rival compacts the SAME live generation into its own dir
    rival = "gen-rival"
    compact_index(spark, os.path.join(store, cur_name),
                  os.path.join(store, rival))

    orig = delta.compact_index

    def compact_then_rival_commits(spark_, src, dst):
        orig(spark_, src, dst)
        # interleave: the rival's pointer commit lands first
        assert try_promote(store, rival, expected_gen=cur_name,
                           writer_id="rival")

    monkeypatch.setattr(delta, "compact_index", compact_then_rival_commits)
    gens_before = {d for d in os.listdir(store) if d.startswith("gen-")}
    assert maybe_compact_store(spark, store, max_dead_ratio=0.001) is False
    assert current_gen(store) == rival
    # the loser's generation dir is gone — it retired cleanly
    gens_after = {d for d in os.listdir(store) if d.startswith("gen-")}
    assert gens_after == gens_before
    # and a second CAS from the stale expected state also loses
    assert try_promote(store, "gen-stale", expected_gen=cur_name) is False


def test_pointer_protocol_on_object_store_double():
    """promote / resolve_current / try_promote run unchanged over a
    store with NO rename primitive (the S3/GCS model)."""
    fs = InMemoryObjectStore()
    store = "mem://bucket/idx_store"
    assert current_gen(store, fs=fs) is None
    promote(store, "gen-1", fs=fs)
    assert current_gen(store, fs=fs) == "gen-1"
    assert resolve_current(store, fs=fs) == os.path.join(store, "gen-1")
    # CAS: one of two racing promotes from gen-1 wins
    a = try_promote(store, "gen-2a", expected_gen="gen-1", fs=fs,
                    writer_id="a")
    b = try_promote(store, "gen-2b", expected_gen="gen-1", fs=fs,
                    writer_id="b")
    assert [a, b] == [True, False]
    assert current_gen(store, fs=fs) == "gen-2a"


def test_legacy_current_file_still_resolves(tmp_path):
    """Stores written before the commit log (bare CURRENT file) resolve
    and CAS-promote correctly; the first promote starts the log."""
    store = str(tmp_path / "legacy")
    os.makedirs(store)
    with open(os.path.join(store, "CURRENT"), "w") as f:
        f.write("gen-old")
    assert current_gen(store) == "gen-old"
    # CAS against the legacy state works (expected = legacy gen)
    assert try_promote(store, "gen-new", expected_gen="gen-bogus") is False
    assert try_promote(store, "gen-new", expected_gen="gen-old") is True
    assert current_gen(store) == "gen-new"
    # the log is now authoritative even though CURRENT still says old
    with open(os.path.join(store, "CURRENT")) as f:
        assert f.read().strip() == "gen-old"
