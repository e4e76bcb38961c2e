"""Distributed global ordering: row_number over a TOTAL order without
the single-task `Window.orderBy(...)` — the scalable replacement for
the classic 100×-scale bottleneck (every row through one task).

Same two-pass shape as the corpus packer's prefix-sum
(operators/pretrain.py:doc_offsets): range-partition on the order
keys, sort within partitions, collect ONE count per partition
(O(partitions) driver traffic), prefix-sum those, broadcast, then a
per-partition Arrow pass assigns rank = partition offset + local row
index. Every task touches only its own key range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sort_exprs(cols: list[str],
                ascending: list[bool] | None) -> list[Column]:
    asc = ascending or [True] * len(cols)
    if len(asc) != len(cols):
        raise ValueError("ascending must match cols length")
    return [F.asc(c) if a else F.desc(c) for c, a in zip(cols, asc)]


def global_rank(
    df: DataFrame,
    cols: list[str],
    ascending: list[bool] | None = None,
    rank_col: str = "rank",
    num_parts: int = 32,
) -> DataFrame:
    """Add ``rank_col`` = 1-based row_number in the global (cols,
    ascending) order. The order MUST be total (include a unique
    tie-break column, e.g. the id) — ties straddling a range-partition
    boundary would otherwise make ranks partitioning-dependent.

    Plan: one range shuffle on the order keys + in-partition sort
    (Spark's distributed sort), one O(partitions) count collect, one
    mapInPandas — no global window, no driver-side data loop."""
    if rank_col in df.columns:
        raise ValueError(f"column {rank_col!r} already exists")
    exprs = _sort_exprs(cols, ascending)
    spark = df.sparkSession
    parts = (
        df.repartitionByRange(int(num_parts), *exprs)
        .sortWithinPartitions(*exprs)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["c"]
        for r in parts.groupBy("_pid").agg(
            F.count(F.lit(1)).alias("c")).collect()
    }
    acc, offs = 0, {}
    for pid in sorted(counts):
        offs[pid] = acc
        acc += int(counts[pid])
    b = spark.sparkContext.broadcast(offs)

    out_fields = ", ".join(
        f"`{name}` {dtype}" for name, dtype in parts.drop("_pid").dtypes
    ) + f", `{rank_col}` bigint"

    def gen(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = int(b.value.get(int(pdf["_pid"].iloc[0]), 0))
            n = len(pdf)
            out = pdf.drop(columns=["_pid"])
            out[rank_col] = range(run + 1, run + n + 1)
            run += n
            yield out

    return parts.mapInPandas(gen, schema=out_fields)
