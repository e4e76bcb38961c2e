"""Pretraining-corpus filter pipeline: the composed keep/drop verdict a
large-scale LLM training-data pipeline computes per document before
tokenization (Gopher/C4-style rule stack, public: Rae et al. 2021 §A1,
Raffel et al. 2020 §2.2) — language gate, length gate, repetition gate,
exact-dedup gate, one boolean column per rule plus the final AND.

This is deliberately a COMPOSITION of the engine's own primitives
(functions/text.py metrics + hash dedup), not new math: the value at
100 TB is that all gates are computed in ONE pass-shaped DAG — the
repetition metrics' two doc-keyed shuffles, the md5 window for
first-occurrence dedup, and the scalar gates fuse into a single plan
with no driver loop and no re-scan per rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from connectors_spark.functions.text import repetition_metrics


def pretrain_filter(
    df: DataFrame,
    lang_allow: tuple[str, ...] = ("en",),
    min_tokens: int = 20,
    max_top_word_frac: float = 0.15,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """-> (id, n_tokens, keep_lang, keep_len, keep_rep, keep_dedup,
    keep). keep_dedup keeps only the FIRST occurrence (lowest id) of
    each exact text duplicate (md5 group — same identity rule as
    operators/dedup.exact_dup_groups)."""
    rep = repetition_metrics(df, text_col=text_col, id_col=id_col)
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    first = df.select(
        F.col(id_col), F.col(lang_col),
        F.row_number().over(w).alias("_rn"),
    )
    out = first.join(rep, id_col)
    keep_lang = F.col(lang_col).isin(*lang_allow)
    keep_len = F.col("n_tokens") >= min_tokens
    keep_rep = F.col("top_word_frac") <= max_top_word_frac
    keep_dedup = F.col("_rn") == 1
    return out.select(
        F.col(id_col), "n_tokens",
        keep_lang.alias("keep_lang"),
        keep_len.alias("keep_len"),
        keep_rep.alias("keep_rep"),
        keep_dedup.alias("keep_dedup"),
        (keep_lang & keep_len & keep_rep & keep_dedup).alias("keep"),
    )


KNUTH = 2654435761  # Knuth multiplicative hash constant
U32 = 1 << 32


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.7,
    budget: int = 200,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """Temperature-scaled mixture sampling — derive per-stratum sampling
    rates FROM corpus statistics instead of taking them as input (the
    multilingual-mix standard, p_s ~ n_s^alpha: alpha=1 is proportional,
    alpha->0 uniform over strata; Conneau & Lample 2019 §3.1, used for
    the mBERT/XLM-R language mixes): stratum weight n_s^alpha is
    normalized to a target doc count budget * p_s, clamped at the
    stratum size, and applied as a deterministic Knuth-hash sample.

    -> (doc_id, stratum, rate) for the sampled docs; `rate` is rounded
    to 6 dp BEFORE the keep comparison so the float power is never
    compared at full precision (cross-engine pow() can differ in the
    last ulp — rounding makes the decision identical everywhere).

    Plan shape: one map-side-combined groupBy for stratum counts (tiny:
    one row per stratum), broadcast back, sampling itself is a pushed-
    down filter — no shuffle of the corpus at any scale."""
    from pyspark.sql.functions import broadcast

    stats = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_s")
    )
    z = stats.agg(F.sum(F.pow("n_s", F.lit(alpha))).alias("z"))
    rates = stats.crossJoin(broadcast(z)).select(
        "stratum",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(budget)) * F.pow("n_s", F.lit(alpha))
                / F.col("z") / F.col("n_s"),
            ), 6,
        ).alias("rate"),
    )
    u = ((F.col(id_col) * KNUTH) % U32) / F.lit(float(U32))
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.col(stratum_col).alias("stratum"), u.alias("_u"))
        .join(broadcast(rates), "stratum")
        .filter(F.col("_u") < F.col("rate"))
        .select("doc_id", "stratum", "rate")
    )


def chunk_documents(df: DataFrame, chunk_tokens: int = 32, stride: int = 24,
                    text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, chunk_id, start_tok, n_toks, chunk_md5): overlapping
    token-window chunking — the retrieval-pipeline prep step (ES
    semantic_text chunking / the standard RAG splitter): chunk i covers
    tokens [i*stride, i*stride + chunk_tokens); stride < chunk_tokens
    gives the overlap that keeps sentence context at chunk borders.
    Docs shorter than one chunk emit a single chunk; empty docs none.

    JVM sequence/slice/md5 per row — no shuffle, no UDF: chunking at
    100 TB is embarrassingly parallel and stays inside the parquet
    scan stage."""
    from connectors_spark.functions.analysis import tokens_col

    W, S = int(chunk_tokens), int(stride)
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= 0, 0).when(n <= W, 1).otherwise(
        (F.ceil((n - W) / F.lit(float(S)))).cast("int") + 1)
    chunks = F.when(n_chunks > 0, F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            (i * S).cast("int").alias("start_tok"),
            F.least(F.lit(W), n - i * S).cast("int").alias("n_toks"),
            F.md5(F.array_join(F.slice(toks, i * S + 1, W), " "))
            .alias("chunk_md5"),
        ),
    )).otherwise(F.array().cast(
        "array<struct<chunk_id:int,start_tok:int,n_toks:int,"
        "chunk_md5:string>>"))
    return (
        df.select(F.col(id_col).alias("doc_id"), chunks.alias("_c"))
        .select("doc_id", F.explode("_c").alias("c"))
        .select("doc_id", "c.chunk_id", "c.start_tok", "c.n_toks",
                "c.chunk_md5")
    )
