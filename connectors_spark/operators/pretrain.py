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
