"""Inverted-index build: tokenize -> postings -> doc stats -> lexicon.

Replaces the reference's per-record Extractor->MemQueue->Sink pipeline
(reference: app/connectors_service/connectors/es/sink.py:6-19,577-719)
with declarative Spark stages. Everything in this module is pure JVM
expression code — tokenization via split/posexplode (no Python UDF),
aggregation via Catalyst partial+final hash aggregates (map-side combine
absorbs the Zipf hot-term skew for the counting aggregates).

Scale notes (10^12-turn design):
- groupBy(term, doc_id) keys are near-unique per token stream => skew-free.
- groupBy(term) for df uses partial aggregation; the Zipf head collapses
  map-side, so the shuffle carries ~P rows per hot term, not the postings.
- doc-index assignment is ONE sample-balanced range shuffle (no global
  single-point sort, no count pass) — see `assign_doc_indices`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connectors_spark.functions.analysis import tokenize


def with_doc_id(transcripts: DataFrame) -> DataFrame:
    """doc_id = conv_id || ':' || turn_idx (string identity, mirrors the
    reference's composite `_id`, reference: app/connectors_service/
    connectors/sources/slack/datasource.py:205-207). Ids beyond 512 UTF-8
    bytes fall back to their md5 hex — the reference's long-id contract
    (app/connectors_service/connectors/sync_job_runner.py:416-446,
    libs/connectors_sdk/connectors_sdk/utils.py:58-62)."""
    from connectors_spark.functions.scalars import hash_id

    return transcripts.withColumn(
        "doc_id", hash_id(F.concat_ws(":", F.col("conv_id"), F.col("turn_idx")))
    )


@dataclass
class IndexFrames:
    """Logical index: all DataFrames lazily defined, caller persists."""

    postings: DataFrame   # (term, doc_id, tf, positions)
    docs: DataFrame       # (doc_id, dl)
    lexicon: DataFrame    # (term, df)
    n_docs: int
    avgdl: float


def build_index(docs_base: DataFrame, stop_words: list[str] | None = None,
                with_positions: bool = True, text_col: str = "text",
                doc_id_col: str = "doc_id", stemmer: str = "none",
                denormalize_dl: bool = False) -> IndexFrames:
    """Build over any table with (doc_id, text) — e.g. the documents
    testdata table or doc-id'd transcripts (see build_index_transcripts).

    denormalize_dl=True stores dl ON the posting rows (one extra build-
    time join, amortized over every query): the DataFrame scorers then
    skip the per-query dl join entirely — the scale path once n_docs
    exceeds the scorer's broadcast threshold (the impact-ordered-index
    denormalization trick; encoded shards already store dls)."""
    if doc_id_col != "doc_id":
        docs_base = docs_base.withColumn("doc_id", F.col(doc_id_col))
    toks = tokenize(docs_base, text_col, "doc_id", stop_words, stemmer)

    aggs = [F.count(F.lit(1)).alias("tf")]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    postings = toks.groupBy("term", "doc_id").agg(*aggs)
    if not with_positions:
        postings = postings.withColumn(
            "positions", F.lit(None).cast("array<int>")
        )

    # every doc counts toward N and avgdl, including zero-token docs;
    # ts (when present) rides along into the docmap -> it IS the index
    # manifest used for incremental diffing (J1-J3)
    id_cols = ["doc_id"] + (["ts"] if "ts" in docs_base.columns else [])
    docs = (
        docs_base.select(*id_cols)
        .join(toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")),
              "doc_id", "left")
        .select(*id_cols, F.coalesce("dl", F.lit(0)).alias("dl"))
    )
    # docs is tiny (one row per doc) and consumed by the stats agg below,
    # doc-id assignment and the scorer join — pin it so the tokenize
    # pipeline under it runs once
    docs = docs.persist()

    # lexicon is PART of the logical index (one row per distinct term) —
    # mark it persisted so repeated scoring jobs don't re-aggregate df
    # from the full postings every time (measured: the un-cached lexicon
    # branch cost the 200-query bench ~12s per run at sf0.1)
    lexicon = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df")).persist()

    n_docs, sum_dl = docs.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).first()
    avgdl = float(sum_dl) / float(n_docs) if n_docs else 0.0
    if denormalize_dl:
        postings = postings.join(docs.select("doc_id", "dl"), "doc_id")
    return IndexFrames(postings=postings, docs=docs, lexicon=lexicon,
                       n_docs=int(n_docs), avgdl=avgdl)


def build_index_transcripts(transcripts: DataFrame, **kw) -> IndexFrames:
    return build_index(with_doc_id(transcripts), **kw)


def salted_agg(df: DataFrame, keys: list[str], partial_aggs: list,
               final_aggs: list, salt_from: str, n_salts: int = 16) -> DataFrame:
    """Explicit two-stage salted aggregation for Zipf-head keys.

    Catalyst's map-side combine already collapses *algebraic* aggregates
    (count/sum/min/max) per task, so plain groupBy is skew-safe for those.
    This helper is for aggregations whose per-key state is LARGE
    (collect_list/collect_set-style), where a 10^11-row hot key would blow
    a single reducer: stage 1 groups by (keys..., pmod(xxhash64(salt_from),
    n_salts)) bounding any task's state to 1/n_salts of the key, stage 2
    merges the n_salts partials. (North-star requirement: salted two-stage
    aggregation for hot terms; see SURVEY §2.4.)

    partial_aggs/final_aggs: lists of Column aggregates; each final agg
    must consume the column its partial produced (same alias).
    """
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).alias("_salt")
    stage1 = df.groupBy(*keys, salt).agg(*partial_aggs)
    return stage1.groupBy(*keys).agg(*final_aggs)


def salted_collect_positions(toks: DataFrame, n_salts: int = 16) -> DataFrame:
    """(term, doc_id, tf, positions) via salted two-stage collect — the
    posting-row builder that stays safe when one (term, doc) pair is
    pathologically large."""
    return salted_agg(
        toks,
        keys=["term", "doc_id"],
        partial_aggs=[
            F.count(F.lit(1)).alias("_tf"),
            F.collect_list("pos").alias("_pos"),
        ],
        final_aggs=[
            F.sum("_tf").alias("tf"),
            F.sort_array(F.flatten(F.collect_list("_pos"))).alias("positions"),
        ],
        salt_from="pos",
        n_salts=n_salts,
    )


def assign_doc_indices(docs: DataFrame, num_ranges: int | None = None,
                       start_idx: int = 0) -> DataFrame:
    """(doc_idx, doc_id, dl): int64 ids ORDERED like doc_id, one shuffle.

    doc_idx = monotonically_increasing_id() over range-partitioned,
    in-partition-sorted rows (+ start_idx). Range boundaries are ordered
    and mono ids are partition-major, so the ids are globally ordered by
    doc_id — but NOT dense: id = shuffle_pid * 2^33 + local_row. Dense is
    not a requirement anywhere downstream; what is required:
    (a) order-compatibility with doc_id for tie-breaking — holds;
    (b) int64 for the delta-gap varint codec — holds (gaps jump at
        partition boundaries, a few extra varint bytes per partition);
    (c) balanced residues mod every power-of-two shard count (the
        doc-space sharding/grouping in operators/index.py) — holds:
        local rows are dense and 2^33 ≡ 0 (mod 2^j) for every real shard
        count, so doc_idx % 2^j == local_row % 2^j.

    LIMIT: monotonically_increasing_id packs the local row number into the
    lower 33 bits, so any single range partition holding >= 2^33 (~8.6B)
    rows would silently bleed into the next partition's id space and break
    invariants (a)-(c). Guarded two ways: (1) size num_ranges so that even
    a pessimistic rows/partition stays far below 2^33 (caller can raise
    num_ranges; at 10^12 docs, num_ranges >= 1024 keeps the mean ~10^9);
    (2) a per-row Catalyst check — embedded in the doc_idx expression so
    column pruning cannot drop it — raises the moment local_row overflows
    (id >> 33 no longer equals spark_partition_id). Zero extra jobs.

    vs the round-1 two-pass version: no second traversal, no per-
    partition count collect, no window shuffle, no broadcast join-back —
    at 10^12 docs this stage is one range shuffle, full stop. (The range
    partitioner still samples the input once to pick boundaries.)
    """
    spark = docs.sparkSession
    if num_ranges is None:
        num_ranges = max(spark.sparkContext.defaultParallelism, 8)
    ranged = docs.repartitionByRange(num_ranges, "doc_id").sortWithinPartitions("doc_id")
    keep = list(docs.columns)
    # materialize the nondeterministic id ONCE in an inner projection
    # (CollapseProject will not inline a multi-referenced nondeterministic
    # alias, so both uses below read the same value)
    with_mono = ranged.select(
        F.monotonically_increasing_id().alias("_mono"),
        F.spark_partition_id().cast("long").alias("_pid"),
        *keep,
    )
    # overflow guard: mono id = (pid << 33) | local_row; if local_row ever
    # reaches 2^33 the shifted prefix exceeds the real partition id.
    doc_idx = F.when(
        F.shiftright(F.col("_mono"), 33) == F.col("_pid"),
        F.col("_mono") + F.lit(start_idx),
    ).otherwise(
        F.raise_error(F.lit(
            "assign_doc_indices: >2^33 rows in one range partition — "
            "raise num_ranges (rows/partition must stay below 2^33)"
        )).cast("long")
    )
    return with_mono.select(doc_idx.alias("doc_idx"), *keep)


def static_prune_postings(index: IndexFrames, keep_n: int,
                          k1: float | None = None,
                          b: float | None = None,
                          salt_buckets: int = 32) -> IndexFrames:
    """Impact-ordered static index pruning (Carmel et al., SIGIR 2001;
    Anh & Moffat impact ordering): keep only the top `keep_n` postings
    per term by BM25 impact, dropping the long low-impact tail of hot
    terms. Within a term the idf factor is constant, so impact order is
    the tf-normalization order w = tf(k1+1) / (tf + k1(1-b+b·dl/avgdl))
    — high-tf postings in short docs survive. Global statistics (df,
    dl, avgdl, n_docs) are kept from the UNPRUNED corpus, the standard
    static-pruning setup: pruning changes candidate recall, never the
    weight a surviving posting scores with.

    Skew shape: a naive per-term window sends a stop-word's entire
    posting list (O(n_docs) rows at web scale) through one task. This
    runs the selection in TWO stages — partial top-keep_n within
    (term, doc-hash salt bucket), then final top-keep_n over the
    <= salt_buckets * keep_n survivors — so no task ever sees more
    than max(partition_slice, salt_buckets * keep_n) rows of one term.
    Both stages rank by the same deterministic total order
    (impact DESC, doc_id ASC), so the result is identical to the
    single-window form the DuckDB twin uses.
    """
    from connectors_spark import BM25_B, BM25_K1
    from pyspark.sql import Window

    k1 = BM25_K1 if k1 is None else k1
    b = BM25_B if b is None else b
    p = index.postings.join(index.docs, "doc_id")
    impact = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                                      + F.lit(b) * F.col("dl")
                                      / F.lit(float(index.avgdl))))
    )
    p = p.withColumn("_impact", impact)
    w1 = Window.partitionBy(
        "term", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    ).orderBy(F.desc("_impact"), F.asc("doc_id"))
    partial = p.withColumn("_r", F.row_number().over(w1)).where(
        F.col("_r") <= keep_n)
    w2 = Window.partitionBy("term").orderBy(
        F.desc("_impact"), F.asc("doc_id"))
    keep_cols = index.postings.columns
    pruned = (partial.withColumn("_r2", F.row_number().over(w2))
              .where(F.col("_r2") <= keep_n)
              .select(*keep_cols))
    return IndexFrames(postings=pruned, docs=index.docs,
                       lexicon=index.lexicon, n_docs=index.n_docs,
                       avgdl=index.avgdl)
