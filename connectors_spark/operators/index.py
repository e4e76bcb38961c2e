"""Encoded-index lifecycle: build -> write (bucketed parquet) -> query.

Physical layout (the part Elasticsearch/Lucene owns in the reference):

  index_dir/
    meta.json                 n_docs, avgdl, k1, b, n_buckets, shard cap
    docmap/                   (doc_idx, doc_id, dl) parquet
    postings/bucket=<i>/      encoded shards (schema.ENCODED_POSTINGS_SCHEMA)

- bucket = pmod(xxhash64(term), n_buckets): query-side partition pruning —
  a query touches only its terms' buckets (SURVEY §3.4).
- hot-term sharding: a term with df > shard_cap splits into
  ceil(df/shard_cap) shards by pmod(xxhash64(doc_id), n_shards); caps the
  Arrow group size per applyInPandas task (Zipf head safety, SURVEY §7.3#2)
  while keeping every shard sorted by doc_idx (WAND treats shards of one
  term as disjoint sorted lists).
- encoding itself is groupBy(term, shard).applyInPandas over Arrow batches
  — the only Python in the build, vectorized NumPy inside.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connectors_spark import BM25_B, BM25_K1
from connectors_spark.functions.codec import encode_shard
from connectors_spark.operators.build import IndexFrames, assign_doc_indices
from connectors_spark.operators.score import idf_np, tf_norm_np
from connectors_spark.operators.wand import topk_auto, topk_exact, topk_wand
from connectors_spark.schema import ENCODED_POSTINGS_SCHEMA

DEFAULT_SHARD_CAP = 1 << 20  # 1M postings per encoded shard
DEFAULT_BUCKETS = 64


def write_encoded_index(
    index: IndexFrames,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    shard_cap: int = DEFAULT_SHARD_CAP,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> None:
    spark = index.postings.sparkSession
    docmap = assign_doc_indices(index.docs)
    docmap.write.mode("overwrite").parquet(f"{path}/docmap")
    docmap = spark.read.parquet(f"{path}/docmap")

    avgdl, n_docs = index.avgdl, index.n_docs
    p = (
        index.postings.select("term", "doc_id", "tf")
        .join(docmap.select("doc_id", "doc_idx", "dl"), "doc_id")
        .join(index.lexicon, "term")  # df column; Zipf head is heavy -> AQE skew join
        .withColumn(
            "n_shards",
            F.greatest(F.lit(1), F.ceil(F.col("df") / F.lit(shard_cap))).cast("int"),
        )
        .withColumn(
            "shard",
            F.pmod(F.xxhash64("doc_id"), F.col("n_shards")).cast("int"),
        )
    )

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        shard = int(pdf["shard"].iloc[0])
        dfreq = int(pdf["df"].iloc[0])
        tf = pdf["tf"].to_numpy(dtype=np.int64)
        dl = pdf["dl"].to_numpy(dtype=np.int64)
        tfn = tf_norm_np(tf, dl, avgdl, k1, b)
        enc = encode_shard(pdf["doc_idx"].to_numpy(dtype=np.int64), tf, dl, tfn)
        return pd.DataFrame(
            [{
                "term": term,
                "bucket": -1,  # filled by a column expr after
                "shard": shard,
                "df": dfreq,
                **enc,
            }]
        )

    encoded = (
        p.groupBy("term", "shard")
        .applyInPandas(encode_group, schema=ENCODED_POSTINGS_SCHEMA)
        .withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
    )
    encoded.write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/postings")

    meta = {
        "n_docs": n_docs, "avgdl": avgdl, "k1": k1, "b": b,
        "n_buckets": n_buckets, "shard_cap": shard_cap,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def read_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def query_index(
    spark: SparkSession,
    path: str,
    queries: list[dict],
    kernel: str = "auto",
) -> DataFrame:
    """(query_id, rank, doc_id, score) via the compressed index.

    Plan: qterms (tiny, broadcast) -> bucket-pruned postings scan ->
    per-query applyInPandas running the WAND/exact kernel -> docmap join.
    """
    from connectors_spark.functions.analysis import tokenize_py

    meta = read_meta(path)
    n_docs, avgdl, k1, b = meta["n_docs"], meta["avgdl"], meta["k1"], meta["b"]
    n_buckets = meta["n_buckets"]

    qrows = []
    for q in queries:
        for term in sorted(set(tokenize_py(q["query_text"]))):
            qrows.append((q["query_id"], int(q.get("k", 10)), term))
    if not qrows:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id string, score double"
        )
    qterms = spark.createDataFrame(qrows, "query_id string, k int, term string")
    buckets = sorted(
        {r.bkt for r in qterms.select(
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("bkt")
        ).distinct().collect()}
    )

    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin(buckets)
    )
    hits = postings.join(F.broadcast(qterms), "term")

    kern = {"auto": topk_auto, "exact": topk_exact, "wand": topk_wand}[kernel]

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        k = int(pdf["k"].iloc[0])
        shards_by_term: list[tuple[float, list]] = []
        for term, grp in sorted(pdf.groupby("term"), key=lambda kv: kv[0]):
            dfreq = int(grp["df"].iloc[0])
            idf = float(idf_np(n_docs, dfreq))
            rows = [row for _, row in grp.iterrows()]
            shards_by_term.append((idf, rows))
        doc_idx, scores = kern(shards_by_term, k, avgdl, k1, b)
        return pd.DataFrame({
            "query_id": qid,
            "rank": np.arange(1, len(doc_idx) + 1, dtype=np.int32),
            "doc_idx": doc_idx,
            "score": scores,
        })

    ranked = hits.groupBy("query_id").applyInPandas(
        score_group,
        schema="query_id string, rank int, doc_idx long, score double",
    )
    docmap = spark.read.parquet(f"{path}/docmap")
    # ranked is tiny (|queries| * k) — broadcast it against the docmap scan
    return (
        docmap.select("doc_idx", "doc_id")
        .join(F.broadcast(ranked), "doc_idx")
        .select("query_id", "rank", "doc_id", "score")
    )
