"""spark-submit entry point: build an encoded index from transcripts.

The north-star deployment shape (BASELINE.json): `spark-submit
--py-files connectors_spark.zip tools/submit_build.py --input
<transcripts> --index <dir>` on a multi-executor cluster. Locally the
same main() runs inside any SparkSession (tests drive it in-process).

The run is a first-class sync job: it registers in the JobCatalog
(pending -> claimed -> in_progress), heartbeats from a daemon thread
while the build runs (idle-cleanup safe), executes under
run_cancellable (cancel(job_id) interrupts the running Spark stages),
and lands counters + the index meta on the completed job doc — the
reference's sync-job lifecycle (svc/sync_job_runner.py) around a Spark
build.

    spark-submit --py-files connectors_spark.zip tools/submit_build.py \
      --input /data/transcripts --index /data/index \
      --n-buckets 256 --shard-cap 1048576 [--positions] \
      [--format iceberg] [--jobs-dir /data/jobs]

Packaging: `cd /root/repo && zip -r connectors_spark.zip connectors_spark`.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_main(spark, args) -> dict:
    from connectors_spark.operators.build import build_index_transcripts
    from connectors_spark.operators.index import (
        build_and_write_index, read_meta, write_encoded_index,
    )
    from connectors_spark.plans.jobs import JobCatalog

    if args.format == "parquet":
        transcripts = spark.read.parquet(args.input)
    else:  # catalog table (iceberg/delta/hive — whatever the cluster has)
        transcripts = spark.read.table(args.input)

    cat = JobCatalog(args.jobs_dir)
    job_id = cat.create("submit_build", job_type="full")
    cat.claim(job_id, worker=socket.gethostname())

    stop = threading.Event()

    def beat():
        while not stop.wait(args.heartbeat_s):
            cat.heartbeat(job_id)

    hb = threading.Thread(target=beat, daemon=True)
    hb.start()

    def run():
        t0 = time.time()
        if args.positions:
            # positional index goes through the generic builder
            idx = build_index_transcripts(transcripts, with_positions=True)
            write_encoded_index(idx, args.index, n_buckets=args.n_buckets,
                                shard_cap=args.shard_cap)
            meta = read_meta(args.index)
        else:
            meta = build_and_write_index(
                transcripts, args.index,
                n_buckets=args.n_buckets, shard_cap=args.shard_cap,
            )
        wall = time.time() - t0
        return {
            "job_id": job_id,
            "n_docs": meta["n_docs"],
            "avgdl": meta["avgdl"],
            "build_sec": round(wall, 2),
            "docs_per_sec": round(meta["n_docs"] / wall, 1),
        }

    try:
        result = cat.run_cancellable(spark, job_id, run)
    finally:
        stop.set()
    if result is None:  # cancelled cooperatively
        return {"job_id": job_id, "status": "canceled"}
    cat.update_stats(job_id, indexed_document_count=result["n_docs"])
    cat.finish(job_id, "completed",
               sync_cursor={"built_at": time.time(), "index": args.index})
    result["status"] = "completed"
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="transcripts parquet dir (or table name with --format table)")
    p.add_argument("--index", required=True, help="output index directory")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "table"],
                   help="'table' reads via the session catalog (Iceberg etc.)")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--shard-cap", type=int, default=1 << 20)
    p.add_argument("--positions", action="store_true",
                   help="build a positional index (phrase queries)")
    p.add_argument("--jobs-dir", default="/tmp/connectors_spark_jobs")
    p.add_argument("--heartbeat-s", type=float, default=10.0)
    args = p.parse_args(argv)

    from connectors_spark.session import get_spark

    spark = get_spark("submit_build")
    result = build_main(spark, args)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
