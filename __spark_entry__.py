"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship BM25 top-k over sf0.001 documents.
queries()       — one entry per implemented operator (SURVEY.md §2),
                  registered in connectors_spark/entry_queries.py.
oracle_sql()    — DuckDB-runnable ANSI SQL twin for each query; column
                  names/rounding match the Spark side exactly.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from connectors_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entry_queries.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
