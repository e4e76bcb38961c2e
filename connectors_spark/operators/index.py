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


def bucket_of(term: str, n_buckets: int) -> int:
    """Driver-side twin of bucket_col — lets the query planner prune
    partitions without a Spark job."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def bucket_col(term: F.Column | str, n_buckets: int) -> F.Column:
    """Executor-side term->bucket (same value as bucket_of)."""
    c = F.col(term) if isinstance(term, str) else term
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")


def shard_cols(shard_cap: int) -> list:
    """n_shards/shard columns splitting hot terms by doc hash."""
    n_shards = F.greatest(
        F.lit(1), F.ceil(F.col("df") / F.lit(shard_cap))
    ).cast("int")
    return [
        n_shards.alias("n_shards"),
        F.pmod(F.xxhash64("doc_id"), n_shards).cast("int").alias("shard"),
    ]


def make_encode_partition(avgdl: float, k1: float, b: float):
    """Streaming per-partition encoder for mapInPandas.

    Input partitions are hash-distributed by (term, shard) and sorted by
    (term, shard, doc_idx); Arrow may split one run across batches, so the
    tail run of every batch is carried into the next. One pandas call per
    PARTITION (not per term) — the per-group overhead that dominates
    groupBy().applyInPandas with Zipf-tail terms disappears.
    """

    out_cols = [f.name for f in ENCODED_POSTINGS_SCHEMA.fields]

    def encode_partition(batches):
        carry: pd.DataFrame | None = None
        out: list[dict] = []

        def flush(g: pd.DataFrame):
            tf = g["tf"].to_numpy(dtype=np.int64)
            dl = g["dl"].to_numpy(dtype=np.int64)
            pos = list(g["positions"]) if "positions" in g.columns else None
            if pos is not None and (not len(pos) or pos[0] is None
                                    or (isinstance(pos[0], float))):
                pos = None  # positions column present but null (disabled)
            enc = encode_shard(
                g["doc_idx"].to_numpy(dtype=np.int64), tf, dl,
                tf_norm_np(tf, dl, avgdl, k1, b), positions=pos,
            )
            out.append({
                "term": g["term"].iloc[0],
                "bucket": int(g["bucket"].iloc[0]),
                "shard": int(g["shard"].iloc[0]),
                "df": int(g["df"].iloc[0]),
                **enc,
            })

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            key = pdf["term"].astype(str) + "\x00" + pdf["shard"].astype(str)
            last = key.iloc[-1]
            tail = key == last  # sorted => the run is contiguous at the end
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                for _, g in body.groupby(["term", "shard"], sort=False):
                    flush(g)
            if len(out) >= 2048:
                yield pd.DataFrame(out, columns=out_cols)
                out = []
        if carry is not None and len(carry):
            flush(carry)
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return encode_partition


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
    # postings feed both the lexicon agg and the encode shuffle — pin them
    # for the duration of the build (the resumable path materializes to
    # parquet instead, plans/checkpoint.py)
    postings = index.postings.persist()
    try:
        encoded = encode_postings(
            postings, docmap, index.lexicon, avgdl,
            n_buckets=n_buckets, shard_cap=shard_cap, k1=k1, b=b,
        )
        # encoded rows are small compressed blobs: a cheap second shuffle
        # onto bucket boundaries means partitionBy emits one file per
        # bucket instead of (tasks x buckets) small files
        encoded = encoded.repartition(n_buckets, "bucket")
        encoded.write.mode("overwrite").partitionBy("bucket").parquet(
            f"{path}/postings"
        )
    finally:
        postings.unpersist()

    meta = {
        "n_docs": n_docs, "avgdl": avgdl, "gen0_avgdl": avgdl, "k1": k1,
        "b": b, "n_buckets": n_buckets, "shard_cap": shard_cap, "deltas": [],
        "positions": "positions" in index.postings.columns,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def encode_postings(
    postings: DataFrame,
    docmap: DataFrame,
    lexicon: DataFrame,
    avgdl: float,
    n_buckets: int = DEFAULT_BUCKETS,
    shard_cap: int = DEFAULT_SHARD_CAP,
    k1: float = BM25_K1,
    b: float = BM25_B,
    num_partitions: int | None = None,
) -> DataFrame:
    """(uncompressed postings, docmap, lexicon) -> encoded shard rows.

    Shuffle plan: one repartition on (term, shard) + in-partition sort,
    then a single streaming mapInPandas pass. The lexicon join feeds df
    (shard fan-out for the Zipf head); AQE skew-join handles the join-side
    skew, sharding bounds the group size."""
    spark = postings.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    pos_cols = ["positions"] if "positions" in postings.columns else []
    p = (
        postings.select("term", "doc_id", "tf", *pos_cols)
        .join(docmap.select("doc_id", "doc_idx", "dl"), "doc_id")
        .join(lexicon, "term")
        .select("term", "doc_idx", "tf", "dl", "df", *pos_cols,
                *shard_cols(shard_cap))
        .withColumn("bucket", bucket_col("term", n_buckets))
    )
    sorted_p = p.repartition(num_partitions, "term", "shard").sortWithinPartitions(
        "term", "shard", "doc_idx"
    )
    return sorted_p.mapInPandas(
        make_encode_partition(avgdl, k1, b), schema=ENCODED_POSTINGS_SCHEMA
    )


def build_and_write_index(
    transcripts: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    shard_cap: int = DEFAULT_SHARD_CAP,
    k1: float = BM25_K1,
    b: float = BM25_B,
    num_partitions: int | None = None,
) -> dict:
    """Fused fast path: transcripts -> encoded index in minimal shuffles.

    Shuffle-volume design (the thing that matters at 10^12 turns):
    - dl is computed as size(tokens) on the BASE table (no explode, no
      per-token shuffle, no join-back);
    - doc_idx is assigned BEFORE tokenization, so every downstream
      shuffle keys on int64 doc_idx instead of the 'conv-…:…' string id;
    - lexicon df comes back via an explicit broadcast join;
    - total wide ops: docmap range-assign (docs only), groupBy(term,
      doc_idx) on the token stream, df partial-agg, repartition(term,
      shard) of compact long-keyed postings. The generic
      write_encoded_index path keeps the (doc_id, text) API; this one is
      the throughput builder used by bench/scaling.
    Returns meta.
    """
    from connectors_spark.functions.analysis import tokens_col
    from connectors_spark.operators.build import assign_doc_indices, with_doc_id

    spark = transcripts.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    base = with_doc_id(transcripts)
    id_cols = ["doc_id"] + (["ts"] if "ts" in base.columns else [])
    # docs is one narrow row per doc but feeds ~5 passes (range sampling,
    # counts, row_number, stats) — pin it
    docs = base.select(
        *id_cols, F.size(tokens_col(F.col("text"))).cast("long").alias("dl")
    ).persist()
    docmap = assign_doc_indices(docs)
    docmap.write.mode("overwrite").parquet(f"{path}/docmap")
    docmap = spark.read.parquet(f"{path}/docmap")
    docs.unpersist()

    n_docs, sum_dl = docmap.agg(F.count(F.lit(1)), F.sum("dl")).first()
    n_docs = int(n_docs)
    avgdl = float(sum_dl) / n_docs if n_docs else 0.0

    base_idx = base.select("doc_id", "text").join(
        docmap.select("doc_id", "doc_idx", "dl"), "doc_id"
    )
    toks = base_idx.select(
        "doc_idx", "dl", F.explode(tokens_col(F.col("text"))).alias("term")
    )
    postings = toks.groupBy("term", "doc_idx").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    ).persist()
    lexicon = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    p = (
        postings.join(F.broadcast(lexicon), "term")
        .select("term", "doc_idx", "tf", "dl", "df",
                *_shard_cols_by_idx(shard_cap))
        .withColumn("bucket", bucket_col("term", n_buckets))
    )
    try:
        encoded = p.repartition(num_partitions, "term", "shard").sortWithinPartitions(
            "term", "shard", "doc_idx"
        ).mapInPandas(
            make_encode_partition(avgdl, k1, b), schema=ENCODED_POSTINGS_SCHEMA
        )
        encoded = encoded.repartition(n_buckets, "bucket")
        encoded.write.mode("overwrite").partitionBy("bucket").parquet(
            f"{path}/postings"
        )
    finally:
        postings.unpersist()

    meta = {
        "n_docs": n_docs, "avgdl": avgdl, "gen0_avgdl": avgdl, "k1": k1,
        "b": b, "n_buckets": n_buckets, "shard_cap": shard_cap, "deltas": [],
        "positions": False,  # fused builder tokenizes without positions
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _shard_cols_by_idx(shard_cap: int) -> list:
    """shard columns when the doc key is already the int64 doc_idx."""
    n_shards = F.greatest(
        F.lit(1), F.ceil(F.col("df") / F.lit(shard_cap))
    ).cast("int")
    return [
        n_shards.alias("n_shards"),
        F.pmod(F.xxhash64("doc_idx"), n_shards).cast("int").alias("shard"),
    ]


def read_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


class IndexReader:
    """Cached handle on an encoded index — reuse across queries so
    per-query latency is kernel time, not parquet listing/scan time.

    Understands incremental generations (operators/delta.py): postings =
    base union deltas; tombstoned doc_idx are masked in the kernels; per-
    term dead counts correct df for exact idf; stored block-max bounds are
    scaled by max(1, avgdl_live/avgdl_at_build)."""

    def __init__(self, spark: SparkSession, path: str, cache: bool = True):
        import numpy as _np

        self.spark = spark
        self.path = path
        self.meta = read_meta(path)
        deltas = self.meta.get("deltas", [])
        self.gen_avgdl = {0: self.meta.get("gen0_avgdl", self.meta["avgdl"])}
        postings = spark.read.parquet(f"{path}/postings").withColumn(
            "_gen", F.lit(0)
        )
        docmap = spark.read.parquet(f"{path}/docmap").select("doc_idx", "doc_id")
        dead_df = None
        tombs = []
        for d in deltas:
            g = int(d["gen"])
            self.gen_avgdl[g] = float(d["avgdl_at_build"])
            gdir = f"{path}/delta/{g}"
            postings = postings.unionByName(
                spark.read.parquet(f"{gdir}/postings").withColumn("_gen", F.lit(g))
            )
            docmap = docmap.unionByName(
                spark.read.parquet(f"{gdir}/docmap").select("doc_idx", "doc_id")
            )
            t = spark.read.parquet(f"{gdir}/tombstones")
            tombs.append(_np.array(
                [r.doc_idx for r in t.collect()], dtype=_np.int64))
        if deltas:
            # latest generation carries the cumulative per-term dead counts
            last = f"{path}/delta/{int(deltas[-1]['gen'])}"
            dead_df = spark.read.parquet(f"{last}/dead_df")
        self.dead = (
            _np.sort(_np.concatenate(tombs)) if tombs
            else _np.zeros(0, dtype=_np.int64)
        )
        self.dead_df = dead_df
        self.postings, self.docmap = postings, docmap
        if cache:
            self.postings = self.postings.persist()
            self.docmap = self.docmap.persist()

    def unpersist(self):
        self.postings.unpersist()
        self.docmap.unpersist()

    def topk(self, queries: list[dict], kernel: str = "auto") -> DataFrame:
        """(query_id, rank, doc_id, score) for the query batch.

        Plan: qterms (tiny, broadcast) -> bucket-pruned postings scan ->
        per-query applyInPandas running the WAND/exact kernel -> broadcast
        top-k back against the docmap.
        """
        from connectors_spark.functions.analysis import tokenize_py

        meta = self.meta
        n_docs, avgdl = meta["n_docs"], meta["avgdl"]
        k1, b, n_buckets = meta["k1"], meta["b"], meta["n_buckets"]

        qrows, buckets = [], set()
        for q in queries:
            for term in sorted(set(tokenize_py(q["query_text"]))):
                qrows.append((q["query_id"], int(q.get("k", 10)), term))
                buckets.add(bucket_of(term, n_buckets))
        if not qrows:
            return self.spark.createDataFrame(
                [], "query_id string, rank int, doc_id string, score double"
            )
        qterms = self.spark.createDataFrame(
            qrows, "query_id string, k int, term string"
        )
        hits = self.postings.filter(
            F.col("bucket").isin(sorted(buckets))
        ).join(F.broadcast(qterms), "term")
        if self.dead_df is not None:
            hits = hits.join(F.broadcast(
                self.dead_df.withColumnRenamed("dead", "_dead")), "term", "left")
        else:
            hits = hits.withColumn("_dead", F.lit(0))

        kern = {"auto": topk_auto, "exact": topk_exact, "wand": topk_wand}[kernel]
        dead_ids = self.dead
        gen_avgdl = self.gen_avgdl

        def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
            qid = pdf["query_id"].iloc[0]
            k = int(pdf["k"].iloc[0])
            shards_by_term: list[tuple[float, list]] = []
            for term, grp in sorted(pdf.groupby("term"), key=lambda kv: kv[0]):
                _d = grp["_dead"].iloc[0]
                dead_n = 0 if pd.isna(_d) else int(_d)
                # live df: total postings across generations minus dead hits
                df_live = int(grp["n_docs"].sum()) - dead_n
                if df_live <= 0:
                    continue
                idf = float(idf_np(n_docs, df_live))
                rows = []
                for _, row in grp.iterrows():
                    g = int(row["_gen"]) if "_gen" in row.index else 0
                    row["_ub_scale"] = max(1.0, avgdl / gen_avgdl.get(g, avgdl))
                    rows.append(row)
                shards_by_term.append((idf, rows))
            doc_idx, scores = kern(shards_by_term, k, avgdl, k1, b, dead_ids)
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
        return (
            self.docmap.join(F.broadcast(ranked), "doc_idx")
            .select("query_id", "rank", "doc_id", "score")
        )


    def topk_local(self, queries: list[dict], kernel: str = "auto") -> list[tuple]:
        """Low-latency serving path: ONE bucket-pruned collect pulls the
        query terms' shard rows to the driver, then the kernel runs
        in-process — no per-query Spark job. Term shard rows and dead
        counts are LRU-cached on the reader, so repeat-term queries skip
        the cluster entirely (the hot-query-set regime of a search tier).
        This is the ES-search-latency analog; `topk` is the
        bulk-throughput path. Returns [(query_id, rank, doc_id, score)]."""
        from connectors_spark.functions.analysis import tokenize_py

        meta = self.meta
        n_docs, avgdl = meta["n_docs"], meta["avgdl"]
        k1, b, n_buckets = meta["k1"], meta["b"], meta["n_buckets"]
        kern = {"auto": topk_auto, "exact": topk_exact, "wand": topk_wand}[kernel]
        if not hasattr(self, "_term_cache"):
            self._term_cache: dict[str, list] = {}
            self._dead_cache: dict[str, int] = {}

        per_q = []
        all_terms = set()
        for q in queries:
            terms = sorted(set(tokenize_py(q["query_text"])))
            per_q.append((q["query_id"], int(q.get("k", 10)), terms))
            all_terms.update(terms)
        if not all_terms:
            return []
        missing = sorted(t for t in all_terms if t not in self._term_cache)
        if missing:
            buckets = sorted({bucket_of(t, n_buckets) for t in missing})
            rows = (
                self.postings.filter(F.col("bucket").isin(buckets))
                .filter(F.col("term").isin(missing))
                .toPandas()
            )
            for t in missing:
                self._term_cache[t] = []
                self._dead_cache[t] = 0
            for _, row in rows.iterrows():
                g = int(row["_gen"]) if "_gen" in row.index else 0
                row["_ub_scale"] = max(
                    1.0, avgdl / self.gen_avgdl.get(g, avgdl)
                )
                self._term_cache[row["term"]].append(row)
            if self.dead_df is not None:
                dd = self.dead_df.filter(F.col("term").isin(missing)).collect()
                for r in dd:
                    self._dead_cache[r.term] = int(r.dead)
        by_term = self._term_cache
        dead_by_term = self._dead_cache
        # resolve doc_idx -> doc_id lazily, one lookup per result batch
        out, need_idx = [], set()
        interim = []
        for qid, k, terms in per_q:
            shards = []
            for t in terms:
                trs = by_term.get(t)
                if not trs:
                    continue
                df_live = sum(int(r["n_docs"]) for r in trs) - dead_by_term.get(t, 0)
                if df_live <= 0:
                    continue
                shards.append((float(idf_np(n_docs, df_live)), trs))
            doc_idx, scores = kern(shards, k, avgdl, k1, b, self.dead)
            interim.append((qid, doc_idx, scores))
            need_idx.update(int(i) for i in doc_idx)
        if need_idx:
            id_rows = self.docmap.filter(
                F.col("doc_idx").isin(sorted(need_idx))
            ).collect()
            idmap = {r.doc_idx: r.doc_id for r in id_rows}
        else:
            idmap = {}
        for qid, doc_idx, scores in interim:
            for r, (di, s) in enumerate(zip(doc_idx, scores), start=1):
                out.append((qid, r, idmap[int(di)], float(s)))
        return out


    def phrase_topk(self, phrases: list[dict]) -> list[tuple]:
        """Exact-phrase top-k over the compressed positional index:
        [(query_id, rank, doc_id, score)]. Candidate docs = posting
        intersection of the phrase terms; adjacency verified from the
        delta-encoded position streams; ranked by the phrase terms' BM25
        sum (ties score DESC, doc ASC). Requires an index built
        with positions (build_index(with_positions=True) ->
        write_encoded_index)."""
        from connectors_spark.functions.analysis import tokenize_py
        from connectors_spark.functions.codec import (
            decode_shard, decode_shard_positions,
        )
        from connectors_spark.operators.score import tf_norm_np

        meta = self.meta
        n_docs, avgdl = meta["n_docs"], meta["avgdl"]
        k1, b, n_buckets = meta["k1"], meta["b"], meta["n_buckets"]

        per_q, all_terms = [], set()
        for q in phrases:
            terms = tokenize_py(q["query_text"])
            per_q.append((q["query_id"], int(q.get("k", 10)), terms))
            all_terms.update(terms)
        if not all_terms:
            return []
        buckets = sorted({bucket_of(t, n_buckets) for t in all_terms})
        rows = (
            self.postings.filter(F.col("bucket").isin(buckets))
            .filter(F.col("term").isin(sorted(all_terms)))
            .toPandas()
        )
        # decoded per term: doc_idx -> (tf, dl, positions)
        term_docs: dict[str, dict[int, tuple]] = {}
        term_total: dict[str, int] = {}
        for _, row in rows.iterrows():
            d, tf, dl = decode_shard(row)
            pos = decode_shard_positions(row)
            if pos is None:
                raise ValueError(
                    "index was built without positions; rebuild with "
                    "with_positions=True for phrase queries"
                )
            m = term_docs.setdefault(row["term"], {})
            for i in range(len(d)):
                m[int(d[i])] = (int(tf[i]), int(dl[i]), pos[i])
            term_total[row["term"]] = term_total.get(row["term"], 0) + len(d)

        out = []
        for qid, k, terms in per_q:
            if not terms or any(t not in term_docs for t in terms):
                continue
            cand = set(term_docs[terms[0]])
            for t in terms[1:]:
                cand &= set(term_docs[t])
            matched = []
            for doc in cand:
                if len(self.dead) and int(np.searchsorted(self.dead, doc)) < len(self.dead) \
                        and self.dead[np.searchsorted(self.dead, doc)] == doc:
                    continue
                starts = set(term_docs[terms[0]][doc][2].tolist())
                ok = True
                for i, t in enumerate(terms[1:], start=1):
                    starts &= {int(p) - i for p in term_docs[t][doc][2]}
                    if not starts:
                        ok = False
                        break
                if ok:
                    matched.append(doc)
            scored = []
            for doc in matched:
                s = 0.0
                for t in sorted(set(terms)):
                    tf, dl, _ = term_docs[t][doc]
                    idf = float(idf_np(n_docs, term_total[t]))
                    s += idf * float(tf_norm_np(tf, dl, avgdl, k1, b))
                scored.append((doc, s))
            scored.sort(key=lambda it: (-it[1], it[0]))
            id_rows = self.docmap.filter(
                F.col("doc_idx").isin([d for d, _ in scored[:k]])
            ).collect()
            idmap = {r.doc_idx: r.doc_id for r in id_rows}
            for r, (doc, s) in enumerate(scored[:k], start=1):
                out.append((qid, r, idmap[int(doc)], float(s)))
        return out


def query_index(
    spark: SparkSession,
    path: str,
    queries: list[dict],
    kernel: str = "auto",
) -> DataFrame:
    """One-shot convenience wrapper (no caching) around IndexReader."""
    return IndexReader(spark, path, cache=False).topk(queries, kernel)
