"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
   "sf": ..., "extra": {...}}

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32) -> local[N] and shuffle partitions

Stages benched (wall seconds each):
  index_build_transcripts  synth transcripts (scaled to sf) -> compressed
                           on-disk index (tokenize/agg/encode/write)
  bm25_queryset_dataframe  200-query BM25 top-k, one DataFrame plan
  bm25_queryset_wand       same query set through the compressed index
  bm25_documents_gate      flagship gate query on the sf documents table
  sync_diff_events         full-outer create/update/skip/delete diff
Extra: turns/sec for the build, wand p95 over sequential single queries.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TURNS_PER_SF = 2_000_000  # sf0.1 -> ~200k turns (~18.4 turns/conv avg)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from connectors_spark.session import get_spark
    from connectors_spark.synth import synth_queries, synth_transcripts
    from connectors_spark.operators.build import build_index_transcripts
    from connectors_spark.operators.index import IndexReader, build_and_write_index
    from connectors_spark.operators.query import queries_df, score_topk_dataframe
    from connectors_spark import entry_queries

    # measured task-parallelism sweet spot on this host is ~16 (the box
    # reports 32 hardware threads but sustains ~16 busy cores; see
    # BENCH/BASELINE.md) — cap shuffle/task parallelism, keep local[cpus]
    par = int(os.environ.get("SPARK_GRAFT_PARALLELISM", str(min(cpus, 16))))
    extra = {"spark.ui.showConsoleProgress": "false"}
    tmpfs = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if tmpfs:
        # single local disk is a constant shared resource; shuffle and the
        # scratch index go to tmpfs (cluster analog: per-executor disks)
        shuffle_dir = os.path.join(tmpfs, "spark-bench-local")
        os.makedirs(shuffle_dir, exist_ok=True)
        extra["spark.local.dir"] = shuffle_dir
    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=par,
        extra_conf=extra,
    )

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()
                return self
            def __exit__(self, *a):
                timings[name] = round(time.time() - self.t0, 3)
        return _T()

    def timed_best_of(name, fn, n=2):
        # this host throttles unpredictably (single-run stage timings vary
        # up to 2x between identical runs; see BENCH/BASELINE.md) — scoring
        # stages report best-of-n so the headline tracks the engine, not
        # the noise. The build stage stays single-run (too long to repeat).
        best = None
        for _ in range(n):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    n_convs = max(50, int(TURNS_PER_SF * sf / 18.4))
    idx_path = tempfile.mkdtemp(prefix="bench_idx_", dir=tmpfs)
    try:
        transcripts = synth_transcripts(spark, n_convs, seed=42)
        with timed("index_build_transcripts"):
            meta = build_and_write_index(
                transcripts, idx_path, n_buckets=max(16, cpus),
                shard_cap=1 << 18,
            )
        n_turns = meta["n_docs"]
        extra["turns_indexed"] = n_turns
        extra["build_turns_per_sec"] = round(
            n_turns / timings["index_build_transcripts"], 1
        )
        # physical index footprint (compression evidence)
        idx_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(idx_path) for f in fs
        )
        extra["index_bytes"] = idx_bytes
        extra["index_bytes_per_turn"] = round(idx_bytes / max(1, n_turns), 1)

        queries = synth_queries(200, seed=42)
        # materialize the logical index once; scoring stages then measure
        # scoring, not re-tokenization
        idx = build_index_transcripts(transcripts, with_positions=False)
        idx.postings.persist().count()
        idx.docs.count()
        idx.lexicon.count()  # lexicon (df per term) is part of the index
        qdf = queries_df(spark, queries)
        timed_best_of("bm25_queryset_dataframe", lambda: score_topk_dataframe(
            idx, qdf).write.format("noop").mode("overwrite").save())

        reader = IndexReader(spark, idx_path)
        reader.postings.count()  # warm cache
        timed_best_of("bm25_queryset_wand", lambda: reader.topk(
            queries, kernel="auto").write.format("noop").mode("overwrite").save())
        # theta-seed A/B in the SAME JVM (cross-process comparisons on
        # this host are weather; see BENCH/BASELINE.md): the headline
        # above uses the seeded default; record the unseeded twin so a
        # regression in either path is attributable to the engine
        t0 = time.time()
        reader.topk(queries, kernel="auto", seed_theta=False).write.format(
            "noop").mode("overwrite").save()
        extra["wand_batch_unseeded_sec"] = round(time.time() - t0, 3)
        extra["wand_batch_seeded_sec"] = timings["bm25_queryset_wand"]

        # p95 single-query latency through the cached compressed index
        lat = []
        for q in queries[:40]:
            t0 = time.time()
            reader.topk([q], kernel="auto").collect()
            lat.append(time.time() - t0)
        lat.sort()
        extra["wand_single_query_p95_sec"] = round(lat[int(0.95 * len(lat)) - 1], 3)
        extra["wand_single_query_p50_sec"] = round(lat[len(lat) // 2], 3)

        # low-latency serving path: shard rows pulled once, kernel on driver
        reader.topk_local(queries[:3])  # warm (pandas conversion etc.)
        lat2 = []
        for q in queries[:60]:
            t0 = time.time()
            reader.topk_local([q], kernel="auto")
            lat2.append(time.time() - t0)
        lat2.sort()
        extra["serve_local_p95_sec"] = round(lat2[int(0.95 * len(lat2)) - 1], 4)
        extra["serve_local_p50_sec"] = round(lat2[len(lat2) // 2], 4)

        with timed("bm25_documents_gate"):
            entry_queries.q_bm25_topk(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        with timed("sync_diff_events"):
            entry_queries.q_sync_diff(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        # LLM-pipeline extras (extras-only: the headline total stays
        # comparable across rounds): banded MinHash-LSH near-dup and
        # map-only token-window chunking over the sf documents table,
        # with per-doc throughput
        n_docs = entry_queries._read(spark, sf_dir, "documents").count()
        gates = entry_queries.queries()
        for key, gate in (("dedup_minhash", "dedup_minhash_lsh"),
                          ("chunking", "doc_chunk_windows")):
            t0 = time.time()
            gates[gate](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            dt = time.time() - t0
            extra[f"{key}_sec"] = round(dt, 3)
            extra[f"{key}_docs_per_sec"] = round(n_docs / dt, 1)
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)

    print(json.dumps({
        "metric": "index-build + BM25 top-k wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
