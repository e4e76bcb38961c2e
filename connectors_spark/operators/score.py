"""Exact BM25 scoring — ONE formula, three renderings (Column / NumPy / SQL).

Elasticsearch-default BM25 (k1=1.2, b=0.75) with single-shard (global df)
semantics — the reference never overrides `similarity` at index creation
(reference: app/connectors_service/connectors/es/management_client.py:53-59),
so content indices score with Lucene's default:

    idf    = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_n   = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score  = sum over matched query terms of idf * tf_n

Ties break (score DESC, doc_id ASC) — deterministic, testable rank identity.
All three renderings below are kept literally in one file so parity is by
construction, not by convention.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from connectors_spark import BM25_B, BM25_K1


def idf_col(n_docs: Column | int, df: Column) -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    return F.log(
        F.lit(1.0) + (n.cast("double") - df + 0.5) / (df.cast("double") + 0.5)
    )


def tf_norm_col(tf: Column, dl: Column, avgdl: Column | float,
                k1: float = BM25_K1, b: float = BM25_B) -> Column:
    a = F.lit(avgdl) if isinstance(avgdl, float) else avgdl
    return tf.cast("double") / (
        tf.cast("double") + k1 * (1.0 - b + b * dl.cast("double") / a)
    )


def idf_np(n_docs: int, df):
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5)
                  / (np.asarray(df, dtype=np.float64) + 0.5))


def tf_norm_np(tf, dl, avgdl: float, k1: float = BM25_K1, b: float = BM25_B):
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def idf_sql(n_expr: str, df_expr: str) -> str:
    """ANSI-SQL idf fragment (runs in both Spark SQL and DuckDB)."""
    return f"ln(1.0 + (({n_expr}) - ({df_expr}) + 0.5) / (({df_expr}) + 0.5))"


def tf_norm_sql(tf_expr: str, dl_expr: str, avgdl_expr: str,
                k1: float = BM25_K1, b: float = BM25_B) -> str:
    """ANSI-SQL tf-normalization fragment."""
    return (
        f"(({tf_expr}) * 1.0) / (({tf_expr}) + {k1} * "
        f"(1.0 - {b} + {b} * ({dl_expr}) / ({avgdl_expr})))"
    )


def bm25_sql(n_expr: str, df_expr: str, tf_expr: str, dl_expr: str,
             avgdl_expr: str, k1: float = BM25_K1, b: float = BM25_B) -> str:
    """ANSI-SQL fragment (runs in both Spark SQL and DuckDB)."""
    idf = idf_sql(n_expr, df_expr)
    tfn = tf_norm_sql(tf_expr, dl_expr, avgdl_expr, k1, b)
    return f"({idf}) * ({tfn})"
