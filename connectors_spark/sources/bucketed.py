"""Bucketed-table co-location: shuffle-free repeated joins.

The 100 TB move the brief's join strategy calls for: when a fact table
is joined on the same key by many queries (the sync diff's content ⋈
checkpoint, doc-keyed enrichments), write BOTH sides bucketed by that
key — every bucketed scan then reports HashPartitioning(key, n) to
Catalyst, and a same-bucket-count join needs NO Exchange on either
side (and no Sort either, when ``sort_by`` matches the join key). The
shuffle is paid ONCE at write time and amortized over every
subsequent join; tests/test_bucketed.py pins the Exchange-free plan.

Bucketed output requires the table catalog (`saveAsTable`) — plain
``.parquet(path)`` writes cannot carry bucket metadata. Tables land in
``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int, sort_by: str | None = None,
                   mode: str = "overwrite") -> None:
    """Write `df` as a parquet table bucketed (and optionally sorted)
    by `key` — the one-time shuffle that makes later joins on `key`
    exchange-free."""
    w = df.write.format("parquet").mode(mode).bucketBy(
        int(n_buckets), key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str,
                  right_table: str, key: str,
                  how: str = "inner") -> DataFrame:
    """Join two same-key, same-bucket-count tables. With bucketing
    enabled (spark.sql.sources.bucketing.enabled, default true) the
    plan contains no Exchange on either side."""
    return spark.table(left_table).join(
        spark.table(right_table), key, how)
