"""ES `search_as_you_type` field type analog.

Elasticsearch's search_as_you_type mapping (public docs) materializes
shingle SUBFIELDS next to the root text field — `._2gram` (adjacent
token pairs), `._3gram` — and a `multi_match` of type `bool_prefix`
queries all of them at once: every query term but the last matches as a
normal term, the trailing partial term as a prefix, and consecutive
query terms additionally match the shingle subfields so that docs with
the terms ADJACENT outrank docs with them scattered. Each subfield is
an independent `should` clause scored with that field's OWN BM25
statistics (its df / dl / avgdl); the doc score is the sum.

Spark-first shape:
- shingle extraction is one `transform` inside the tokens array (no
  position self-join), exploded once -> (doc_id, shingle); tf / dl /
  df / corpus stats are three map-side-combinable aggregations, the
  same build shape as the root term index.
- clause expansion (trailing prefix) is a broadcast of the tiny clause
  table against the shingle lexicon — identical to the root
  match_bool_prefix expansion.
- scoring: one (query, doc) agg over the union of root and shingle
  contributions — a single shuffle keyed the same way as every other
  scoring gate.

At 100 TB the shingle postings frame is built once next to the term
index (same salting / same partitioning) and is strictly smaller than
the positional index it can replace for adjacency-boosted completion.

Reference context: connectors feed title-like fields that ES teams
routinely map search_as_you_type for completion UIs; the sync layer
itself is field-type agnostic (sdk/source.py document payloads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from connectors_spark import BM25_B, BM25_K1
from connectors_spark.functions.analysis import tokens_col
from connectors_spark.operators.score import idf_col, tf_norm_col

__all__ = ["shingle_rows", "subfield_weights"]


def shingle_rows(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """(doc_id, shingle) — one row per adjacent-token n-gram, built
    inside the tokens array (guarding `sequence(1, 0)`'s descending
    range on short docs)."""
    arr = tokens_col(F.col(text_col))
    grams = F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(arr, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col).alias("doc_id"),
                     F.explode(grams).alias("shingle"))


def subfield_weights(sh: DataFrame, clauses: DataFrame,
                     k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """BM25 contributions of a shingle subfield.

    `sh`: (doc_id, shingle) rows; `clauses`: (query_id, part,
    is_prefix). Returns (query_id, doc_id, w) — one row per matched
    (query, shingle, doc), ready to be summed with the root field's
    contributions. Subfield stats (n, avgdl) are computed over docs
    that HAVE the subfield (>= n tokens), matching per-field Lucene
    norms."""
    shtf = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("tf"))
    shdl = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    shdf = shtf.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    stats = shdl.agg(F.count(F.lit(1)).cast("double").alias("n"),
                     F.avg("dl").alias("avgdl"))
    expanded = (shdf.join(
        F.broadcast(clauses),
        (F.col("is_prefix") & F.col("shingle").startswith(F.col("part")))
        | (~F.col("is_prefix") & (F.col("shingle") == F.col("part"))))
        .select("query_id", "shingle", "df").distinct())
    return (expanded
            .join(shtf, "shingle")
            .join(shdl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select("query_id", "doc_id",
                    (idf_col(F.col("n"), F.col("df"))
                     * tf_norm_col(F.col("tf"), F.col("dl"),
                                   F.col("avgdl"), k1, b)).alias("w")))
