"""Order-sensitive aggregations at scale: range-partitioned chunking +
associative (monoid) combine.

A metric like "longest consecutive run" needs its group's rows in
order — the naive shape (applyInPandas per group) puts EVERY row of a
group through one task, which is exactly the bottleneck a 100 TB
5-bucket corpus hits. The scalable shape mirrors doc_offsets'
distributed prefix-sum: range-partition by (key, order), summarize each
partition's slice of each key into a constant-size chunk summary with
one streaming pass (mapInPandas), then merge each key's <= num_parts
summaries in partition order with the metric's associative combine —
a per-key frame of chunk summaries, never of rows.

The run-length monoid (prefix, suffix, best, len, all_set) is the
classic segment-tree combine; any order-sensitive metric with an
associative summary fits this harness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge(a: tuple, b: tuple) -> tuple:
    """Combine two adjacent chunk summaries (prefix, suffix, best, n)."""
    pa, sa, ba, na = a
    pb, sb, bb, nb = b
    prefix = pa + (pb if pa == na else 0)
    suffix = sb + (sa if nb == pb else 0)
    best = max(ba, bb, sa + pb)
    return (prefix, suffix, best, na + nb)


def longest_run(df: DataFrame, key_col: str, order_cols: list,
                flag_col: str, num_parts: int = 32) -> DataFrame:
    """(key, max_run): length of the longest consecutive stretch of
    rows with `flag_col`=1 per key, in `order_cols` order — computed
    without ever putting one key's full row stream through one task."""
    cols = [key_col, *order_cols, flag_col]
    parts = (
        df.select(*cols)
        .repartitionByRange(int(num_parts), key_col, *order_cols)
        .sortWithinPartitions(key_col, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )

    summary_schema = (
        f"{key_col} string, _pid int, prefix long, suffix long, "
        "best long, n long"
    )

    def _summary_np(a: "np.ndarray") -> tuple:
        # (prefix, suffix, best, n) of a 0/1 array via RLE — vectorized
        n = int(a.size)
        if n == 0:
            return (0, 0, 0, 0)
        change = np.flatnonzero(np.diff(a)) + 1
        runs = np.split(a, change)
        one_lens = [len(r) for r in runs if r[0] == 1]
        best = max(one_lens) if one_lens else 0
        prefix = len(runs[0]) if runs[0][0] == 1 else 0
        suffix = len(runs[-1]) if runs[-1][0] == 1 else 0
        return (prefix, suffix, best, n)

    def summarize(batches):
        # streaming per-partition pass; keys arrive contiguously in
        # sort order, so per-key state merges at most once per batch
        state: dict = {}
        order: list = []
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
            for k, g in pdf.groupby(key_col, sort=False):
                k = str(k)
                cur = _summary_np(
                    (g[flag_col].to_numpy() != 0).astype(np.int64))
                if k not in state:
                    state[k] = cur
                    order.append(k)
                else:
                    state[k] = _merge(state[k], cur)
        if pid is None:
            return
        yield pd.DataFrame(
            [(k, pid, *state[k]) for k in order],
            columns=[key_col, "_pid", "prefix", "suffix", "best", "n"],
        )

    summaries = parts.mapInPandas(summarize, summary_schema)

    out_schema = f"{key_col} string, max_run long"

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_pid")
        acc = (0, 0, 0, 0)
        for r in pdf.itertuples():
            acc = _merge(acc, (r.prefix, r.suffix, r.best, r.n))
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "max_run": [acc[2]]})

    return summaries.groupBy(key_col).applyInPandas(combine, out_schema)
