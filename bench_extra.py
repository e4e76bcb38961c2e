"""Optimization-round profiler (guide §1): isolates the sub-stages of the
headline bench with noop sinks so each cost is attributable. bench.py is
FROZEN for measurement; this file only produces evidence for
OPTIMIZATION_r06.md. Prints one JSON line with per-stage seconds.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TURNS_PER_SF = 2_000_000


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    stages = os.environ.get("BENCH_EXTRA_STAGES", "all").split(",")

    from pyspark.sql import functions as F

    from connectors_spark.session import get_spark
    from connectors_spark.synth import synth_queries, synth_transcripts
    from connectors_spark.operators.build import (
        build_index_transcripts, with_doc_id,
    )
    from connectors_spark.operators.index import (
        IndexReader, build_and_write_index,
    )
    from connectors_spark.operators.query import queries_df, score_topk_dataframe
    from connectors_spark.functions.analysis import tokens_col

    par = int(os.environ.get("SPARK_GRAFT_PARALLELISM", str(min(cpus, 16))))
    extra = {"spark.ui.showConsoleProgress": "false"}
    tmpfs = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if tmpfs:
        shuffle_dir = os.path.join(tmpfs, "spark-bench-local")
        os.makedirs(shuffle_dir, exist_ok=True)
        extra["spark.local.dir"] = shuffle_dir
    spark = get_spark(
        "bench_extra", master=f"local[{cpus}]", shuffle_partitions=par,
        extra_conf=extra,
    )
    sc = spark.sparkContext

    t: dict[str, float] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        print(f"  {name}: {t[name]}s", file=sys.stderr)
        return out

    n_convs = max(50, int(TURNS_PER_SF * sf / 18.4))
    idx_path = tempfile.mkdtemp(prefix="bx_idx_", dir=tmpfs)
    try:
        transcripts = synth_transcripts(spark, n_convs, seed=42)

        if "synth" in stages or "all" in stages:
            # cost of text synthesis alone (lazy plan evaluated in build)
            timed("synth_noop", lambda: noop(transcripts))
            timed("synth_noop2", lambda: noop(transcripts))
            # synthesis + tokenize + dl (the `docs` pass of the build)
            base = with_doc_id(transcripts)
            docs = base.select(
                "doc_id", "ts",
                F.size(tokens_col(F.col("text"))).cast("long").alias("dl"),
            )
            timed("docs_dl_noop", lambda: noop(docs))
            # synthesis + tokenize + explode (the token stream)
            toks = base.select(
                "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
            )
            timed("toks_explode_noop", lambda: noop(toks))
            # + the postings aggregation (shuffle + partial agg)
            postings = toks.groupBy("term", "doc_id").agg(
                F.count(F.lit(1)).alias("tf")
            )
            timed("postings_agg_noop", lambda: noop(postings))

        if "build" in stages or "all" in stages:
            timed("build_full", lambda: build_and_write_index(
                transcripts, idx_path, n_buckets=max(16, cpus),
                shard_cap=1 << 18,
            ))
            timed("build_full2", lambda: (
                build_and_write_index(
                    transcripts, idx_path, n_buckets=max(16, cpus),
                    shard_cap=1 << 18,
                )
            ))

        if "score" in stages or "all" in stages:
            queries = synth_queries(200, seed=42)
            idx = build_index_transcripts(transcripts, with_positions=False)
            idx.postings.persist().count()
            idx.docs.count()
            idx.lexicon.count()
            qdf = queries_df(spark, queries)
            for i in (1, 2, 3):
                timed(f"score_df_{i}", lambda: noop(
                    score_topk_dataframe(idx, qdf)))

        if "wand" in stages or "all" in stages:
            if not os.path.exists(os.path.join(idx_path, "meta.json")):
                timed("build_for_wand", lambda: build_and_write_index(
                    transcripts, idx_path, n_buckets=max(16, cpus),
                    shard_cap=1 << 18,
                ))
            queries = synth_queries(200, seed=42)
            reader = IndexReader(spark, idx_path)
            reader.postings.count()
            for i in (1, 2):
                timed(f"wand_batch_{i}", lambda: noop(
                    reader.topk(queries, kernel="auto")))
            lat = []
            for q in queries[:40]:
                t0 = time.time()
                reader.topk([q], kernel="auto").collect()
                lat.append(time.time() - t0)
            lat.sort()
            t["wand_single_p50"] = round(lat[len(lat) // 2], 3)
            t["wand_single_p95"] = round(lat[int(0.95 * len(lat)) - 1], 3)
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)

    print(json.dumps({"profile": t, "sf": sf, "cpus": cpus}))


if __name__ == "__main__":
    main()
