"""Transcript structure validation — the SFT-ingest sanity screen.

Multi-turn conversation corpora routinely contain structurally broken
conversations (truncated exports, merged turns, resumed sessions):
before any training use, a pipeline flags conversations whose turn
structure violates the chat contract. Checks, per conversation:

- starts_ok:     first turn is `system` or `user` (never assistant)
- system_ok:     `system` turns appear only at turn 0
- alternates_ok: consecutive NON-system turns alternate roles
                 (no user-user or assistant-assistant adjacency)
- no_gaps:       turn_idx is exactly 0..n-1 (no holes, no dupes)
- no_empty:      every turn has at least one token
- valid:         all of the above

Shape: two windows, both PARTITIONED BY conv_id (never global), then
one conv-keyed bool_and aggregation — a single shuffle on the
conversation key at any corpus size. The reference's sync pipeline
performs the same class of edge validation before indexing
(reference: connectors/sync_job_runner.py validation hooks +
sdk/source.py document sanity checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from connectors_spark.functions.analysis import tokens_col

__all__ = ["transcript_structure_qc"]


def transcript_structure_qc(df: DataFrame,
                            conv_col: str = "conv_id",
                            turn_col: str = "turn_idx",
                            role_col: str = "role",
                            text_col: str = "text") -> DataFrame:
    """(conv_id, n_turns, starts_ok, alternates_ok, system_ok, no_gaps,
    no_empty, valid) — flags as ints for portable hashing."""
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    base = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        F.size(tokens_col(F.col(text_col))).alias("ntok"),
    ).withColumn("rn", F.row_number().over(w)) \
     .withColumn("prev_idx", F.lag("turn_idx").over(w))
    # alternation is checked on the non-system subsequence only
    wns = Window.partitionBy("conv_id").orderBy("turn_idx")
    nonsys = (base.filter(F.col("role") != "system")
              .withColumn("prev_role", F.lag("role").over(wns))
              .groupBy("conv_id")
              .agg(F.bool_and(F.col("prev_role").isNull()
                              | (F.col("role") != F.col("prev_role")))
                   .alias("alternates_ok")))
    agg = base.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.bool_and(F.when(F.col("rn") == 1,
                          F.col("role").isin("system", "user"))
                   .otherwise(F.lit(True))).alias("starts_ok"),
        F.bool_and((F.col("rn") == 1) | (F.col("role") != "system"))
        .alias("system_ok"),
        (F.bool_and((F.col("rn") == 1)
                    | (F.col("turn_idx") == F.col("prev_idx") + 1))
         & (F.min("turn_idx") == 0)).alias("no_gaps"),
        F.bool_and(F.col("ntok") > 0).alias("no_empty"),
    )
    out = agg.join(nonsys, "conv_id", "left").withColumn(
        "alternates_ok", F.coalesce("alternates_ok", F.lit(True)))
    flags = ["starts_ok", "alternates_ok", "system_ok", "no_gaps",
             "no_empty"]
    valid = None
    for f in flags:
        c = F.col(f)
        valid = c if valid is None else (valid & c)
    return out.select(
        "conv_id", "n_turns",
        *[F.col(f).cast("int").alias(f) for f in flags],
        valid.cast("int").alias("valid"))


def turn_boilerplate(df: DataFrame, min_convs: int = 2,
                     conv_col: str = "conv_id", turn_col: str = "turn_idx",
                     role_col: str = "role",
                     text_col: str = "text") -> DataFrame:
    """Cross-conversation boilerplate turns: a normalized turn text that
    recurs in >= min_convs DISTINCT conversations is template noise
    (canned greetings, tool banners, refusal templates) — the
    transcript-level counterpart of the n-gram boilerplate blocklist.

    Returns every turn with (norm, conv_df, is_boilerplate). Shape: one
    text-keyed agg for conv_df (map-side combinable count-distinct via
    two-level agg) + one join back on the text key; the Zipf head of
    template texts is the usual skew — AQE skew-join territory at
    100 TB."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(conv_col).alias("conv_id"),
                     F.col(turn_col).alias("turn_idx"),
                     F.col(role_col).alias("role"),
                     norm.alias("norm"))
    # exact distinct, expressed as two stacked aggs so the first stage
    # combines map-side on (norm, conv)
    conv_df = (base.select("norm", "conv_id").distinct()
               .groupBy("norm").agg(F.count(F.lit(1)).alias("conv_df")))
    return (base.join(conv_df, "norm")
            .select("conv_id", "turn_idx", "role", "norm", "conv_df",
                    (F.col("conv_df") >= min_convs).cast("int")
                    .alias("is_boilerplate")))
