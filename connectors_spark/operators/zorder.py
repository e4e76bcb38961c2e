"""Z-order (Morton) clustering keys: multi-column data layout for
min/max data skipping.

The lakehouse move for two-column range predicates (Delta's OPTIMIZE
ZORDER BY, public technique): interleave the bits of the columns'
bounded ranks so rows close in BOTH dimensions land close in the sort
order — parquet row-group min/max stats then prune on either column,
not just the leading sort key. This module computes the key as pure
JVM bit expressions (shiftright/and/shiftleft loop, whole-stage
codegen); writing is just `df.orderBy(zkey)` / repartitionByRange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-dimension bits; 2 dims -> 32-bit key


def zorder_key2(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of two NON-NEGATIVE integer columns already
    bounded to `bits` bits (clamp/rank upstream): bit i of `a` lands at
    key bit 2i+1, bit i of `b` at 2i. Pure JVM expression tree."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = key + F.shiftleft(abit, 2 * i + 1) + F.shiftleft(bbit, 2 * i)
    return key


def zorder_key2_sql(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB twin generated from the same loop (oracle-parity
    convention)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def zorder_py(a: int, b: int, bits: int = ZORDER_BITS) -> int:
    """Python reference for tests."""
    key = 0
    for i in range(bits):
        key |= ((a >> i) & 1) << (2 * i + 1)
        key |= ((b >> i) & 1) << (2 * i)
    return key


def zorder_layout(df: DataFrame, a: str, b: str,
                  bits: int = ZORDER_BITS,
                  key_col: str = "zkey") -> DataFrame:
    """Attach the Morton key and return the frame range-sorted by it —
    the write-side layout step (`.write.parquet` after this gives
    row groups whose min/max stats prune on BOTH columns)."""
    out = df.withColumn(
        key_col, zorder_key2(F.col(a), F.col(b), bits))
    return out.repartitionByRange(
        df.sparkSession.sparkContext.defaultParallelism, key_col
    ).sortWithinPartitions(key_col)
