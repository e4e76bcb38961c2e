"""Stage-level breakdown of the bm25_queryset_dataframe job + variants."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from connectors_spark.session import get_spark
from connectors_spark.synth import synth_queries, synth_transcripts
from connectors_spark.operators.build import build_index_transcripts
from connectors_spark.operators.query import (
    queries_df, query_terms, score_topk_dataframe,
)
from connectors_spark.operators.score import idf_col, tf_norm_col
from connectors_spark import BM25_B, BM25_K1

from pyspark.sql import Window
from pyspark.sql import functions as F


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    par = int(os.environ.get("SPARK_GRAFT_PARALLELISM", str(min(cpus, 16))))
    extra = {"spark.ui.showConsoleProgress": "false"}
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-prof-local"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    spark = get_spark("profile2", master=f"local[{cpus}]",
                      shuffle_partitions=par, extra_conf=extra)

    sf = float(os.environ.get("PROF_SF", "0.1"))
    n_convs = max(50, int(2_000_000 * sf / 18.4))
    transcripts = synth_transcripts(spark, n_convs, seed=42)
    queries = synth_queries(200, seed=42)

    idx = build_index_transcripts(transcripts, with_positions=False)
    t0 = time.time(); n_post = idx.postings.persist().count()
    print(f"postings rows={n_post} materialize {time.time()-t0:.2f}s")
    idx.docs.count()

    qdf = queries_df(spark, queries)
    qterms = query_terms(qdf)

    # piece 1: lexicon df branch alone
    t0 = time.time()
    lex = idx.lexicon.join(F.broadcast(qterms.select("term").distinct()), "term")
    n_lex = lex.count()
    print(f"lexicon branch: {time.time()-t0:.2f}s ({n_lex} matched terms)")

    # piece 2: matched row count (postings x qterms)
    t0 = time.time()
    n_matched = idx.postings.join(F.broadcast(qterms), "term").count()
    print(f"matched rows: {n_matched} in {time.time()-t0:.2f}s")

    t0 = time.time()
    n_dmatch = idx.postings.join(
        F.broadcast(qterms.select("term").distinct()), "term").count()
    print(f"distinct-term matched rows: {n_dmatch} in {time.time()-t0:.2f}s")

    # full current path
    for i in range(2):
        t0 = time.time()
        score_topk_dataframe(idx, qdf).write.format("noop").mode("overwrite").save()
        print(f"current full: {time.time()-t0:.2f}s (run {i+1})")

    # variant: persist lexicon first (lexicon is part of the index)
    lexp = idx.lexicon.persist()
    lexp.count()
    idx2 = type(idx)(postings=idx.postings, docs=idx.docs, lexicon=lexp,
                     n_docs=idx.n_docs, avgdl=idx.avgdl)
    for i in range(2):
        t0 = time.time()
        score_topk_dataframe(idx2, qdf).write.format("noop").mode("overwrite").save()
        print(f"persisted-lexicon full: {time.time()-t0:.2f}s (run {i+1})")

    # variant: distinct-term scoring, expand to queries just before agg
    def score_distinct(index, qdf_):
        qt = query_terms(qdf_)
        dterms = qt.select("term").distinct()
        lexm = index.lexicon.join(F.broadcast(dterms), "term")
        tw = (
            index.postings.join(F.broadcast(dterms), "term")
            .join(F.broadcast(lexm), "term")
            .join(F.broadcast(index.docs.select("doc_id", "dl")), "doc_id")
            .select(
                "term", "doc_id",
                (idf_col(index.n_docs, F.col("df"))
                 * tf_norm_col(F.col("tf"), F.col("dl"), index.avgdl,
                               BM25_K1, BM25_B)).alias("w"),
            )
        )
        contrib = tw.join(F.broadcast(qt), "term").select(
            "query_id", "k", "doc_id", "w")
        scored = contrib.groupBy("query_id", "k", "doc_id").agg(
            F.sum("w").alias("score"))
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= F.col("k"))
                .select("query_id", "rank", "doc_id", "score"))

    for i in range(2):
        t0 = time.time()
        score_distinct(idx2, qdf).write.format("noop").mode("overwrite").save()
        print(f"distinct-term full: {time.time()-t0:.2f}s (run {i+1})")


if __name__ == "__main__":
    main()
