"""Canonical analyzer — shared verbatim by build side, query side and oracles.

The reference delegates analysis to Elasticsearch's standard analyzer
(reference: app/connectors_service/connectors/es/language_data.yml:1-111;
index creation app/connectors_service/connectors/es/management_client.py:53-59).
We define the engine's analyzer once: lowercase, split on runs of
non-alphanumeric characters, drop empties. It is expressed as pure JVM
Column expressions (whole-stage-codegen'd — no Python in the hot path)
and mirrored 1:1 by `tokenize_py` for the NumPy oracle and by
`TOKENIZE_SQL_DUCKDB` for the DuckDB correctness oracle.

Optional `_english_`-style stop-word removal mirrors language_data.yml's
en filter chain; OFF by default so build and query stay parity-simple.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connectors_spark import TOKEN_SPLIT_RE

_PY_SPLIT = re.compile(TOKEN_SPLIT_RE)

# Lucene's `_english_` stop set (public Lucene EnglishAnalyzer default).
ENGLISH_STOP = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()


def tokens_col(text: Column) -> Column:
    """array<string> of tokens for a text column (JVM-side, codegen)."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def tokenize(df: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id",
             stop_words: list[str] | None = None) -> DataFrame:
    """(doc_id, pos, term) — one row per token; pos indexes the token stream."""
    toks = tokens_col(F.col(text_col))
    if stop_words:
        toks = F.filter(toks, lambda t: ~t.isin(*stop_words))
    return df.select(
        F.col(doc_id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "term"),
    )


def tokenize_py(text: str, stop_words: list[str] | None = None) -> list[str]:
    """Single-process mirror of `tokens_col` for the NumPy oracle."""
    toks = [t for t in _PY_SPLIT.split((text or "").lower()) if t]
    if stop_words:
        stop = set(stop_words)
        toks = [t for t in toks if t not in stop]
    return toks


def tokenize_sql_duckdb(text_expr: str) -> str:
    """DuckDB fragment producing the same token array as `tokens_col`."""
    return (
        f"list_filter(regexp_split_to_array(lower({text_expr}), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )
