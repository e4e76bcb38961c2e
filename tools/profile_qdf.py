"""Profile bm25_queryset_dataframe under bench conditions: print the
physical plan of the scoring job and time it with/without explicit
docs broadcast. Diagnostic for the r1->r2 regression (VERDICT r2 item 1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from connectors_spark.session import get_spark
from connectors_spark.synth import synth_queries, synth_transcripts
from connectors_spark.operators.build import build_index_transcripts
from connectors_spark.operators.query import queries_df, score_topk_dataframe

from pyspark.sql import functions as F


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    par = int(os.environ.get("SPARK_GRAFT_PARALLELISM", str(min(cpus, 16))))
    extra = {"spark.ui.showConsoleProgress": "false"}
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-prof-local"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    spark = get_spark("profile", master=f"local[{cpus}]",
                      shuffle_partitions=par, extra_conf=extra)

    sf = float(os.environ.get("PROF_SF", "0.1"))
    n_convs = max(50, int(2_000_000 * sf / 18.4))
    transcripts = synth_transcripts(spark, n_convs, seed=42)
    queries = synth_queries(200, seed=42)

    idx = build_index_transcripts(transcripts, with_positions=False)
    idx.postings.persist().count()
    idx.docs.count()

    qdf = queries_df(spark, queries)
    out = score_topk_dataframe(idx, qdf)
    print("=== PLAN (current) ===")
    out.explain("formatted")
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    print(f"timed (current): {time.time()-t0:.2f}s")

    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    print(f"timed (current, 2nd run): {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
