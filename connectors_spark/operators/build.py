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
- doc-index assignment is a two-pass range partitioning (sample-balanced,
  no single-point global sort) — see `assign_doc_indices`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
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
                doc_id_col: str = "doc_id", stemmer: str = "none") -> IndexFrames:
    """Build over any table with (doc_id, text) — e.g. the documents
    testdata table or doc-id'd transcripts (see build_index_transcripts)."""
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

    lexicon = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    n_docs, sum_dl = docs.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).first()
    avgdl = float(sum_dl) / float(n_docs) if n_docs else 0.0
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
    """(doc_idx, doc_id, dl): dense int64 ids, ordered by doc_id string.

    Two-pass, no global single-partition sort: range-partition by doc_id
    (sampled balanced ranges), count per partition, prefix-sum the counts
    on the driver (P integers), then per-partition row_number + offset.
    This is the scalable classic for dense-id assignment; at 10^12 docs
    each range partition sorts independently.
    """
    spark = docs.sparkSession
    if num_ranges is None:
        num_ranges = max(spark.sparkContext.defaultParallelism, 8)
    ranged = docs.repartitionByRange(num_ranges, "doc_id").sortWithinPartitions("doc_id")
    # persist: the frame is traversed twice (count pass + assign pass) and
    # range boundaries come from sampling — pin them
    ranged = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    counts = {r["_pid"]: r["n"] for r in
              ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    # partition ids are ordered by range => prefix sum gives offsets
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy("doc_id")
    keep = [c for c in docs.columns]
    return (
        ranged.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), "_pid")
        .select((F.col("_rn") + F.col("_off") + F.lit(start_idx)).alias("doc_idx"), *keep)
    )
