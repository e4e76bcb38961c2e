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


# Predicate windows on the 16-bit rank space (middle eighth of `a`,
# middle quarter of `b`) — monotone rank scaling makes rank predicates
# equivalent to value predicates.
SKIP_A_LO, SKIP_A_HI = 6 * 65536 // 16, 8 * 65536 // 16
SKIP_B_LO, SKIP_B_HI = 6 * 65536 // 16, 10 * 65536 // 16


def layout_skip_report(df: DataFrame, a: str, b: str,
                       n_files: int = 16) -> DataFrame:
    """Zone-map (file min/max) pruning audit — the measurement that
    justifies `zorder_layout` at 100 TB: how many files a reader skips
    under each write layout, for each predicate shape.

    Layouts: `linear` = sorted by `b` (time-ordered ingest, the default
    lakehouse layout); `zorder` = sorted by the Morton interleave of
    16-bit range-ranks of (a, b). File assignment is the deterministic
    value-range shard floor(key * n_files / key_space) — window-free
    (no global row_number), parallelism-invariant. Predicates:
    `a_only` (middle eighth of the `a` range) and `a_and_b` (that,
    plus the middle quarter of `b`). A file is skipped when its
    [min, max] envelope of any predicate column misses the window —
    exactly parquet row-group / Iceberg manifest pruning semantics.

    -> (layout, predicate, n_files, n_skipped, skip_ratio, rows_total,
    rows_skipped, rows_matched). The classic result this measures:
    time-linear layouts prune NOTHING for pure-`a` predicates, z-order
    prunes on both dimensions at once.

    Plan: one tiny global min/max agg (broadcast back), one map-side-
    combinable (layout, file) agg over a single corpus scan per layout,
    then constant-size arithmetic. No windows, no joins wider than the
    16-row file-stats frame."""
    stats = df.agg(
        F.min(a).cast("long").alias("amin"),
        F.max(a).cast("long").alias("amax"),
        F.min(F.col(b).cast("long")).alias("bmin"),
        F.max(F.col(b).cast("long")).alias("bmax"))
    base = df.select(F.col(a).cast("long").alias("_a"),
                     F.col(b).cast("long").alias("_b")) \
        .crossJoin(F.broadcast(stats))
    ra = F.floor((F.col("_a") - F.col("amin")) * 65536
                 / (F.col("amax") - F.col("amin") + 1)).cast("long")
    rb = F.floor((F.col("_b") - F.col("bmin")) * 65536
                 / (F.col("bmax") - F.col("bmin") + 1)).cast("long")
    ranked = base.select(ra.alias("ra"), rb.alias("rb"))

    match_a = (F.col("ra") >= SKIP_A_LO) & (F.col("ra") < SKIP_A_HI)
    match_b = (F.col("rb") >= SKIP_B_LO) & (F.col("rb") < SKIP_B_HI)

    out = []
    for layout, key, space in (
            ("linear", F.col("rb"), 65536),
            ("zorder", zorder_key2(F.col("ra"), F.col("rb")), 1 << 32)):
        files = (ranked
                 .withColumn("file_id",
                             F.floor(key * F.lit(n_files) / F.lit(space))
                             .cast("int"))
                 .groupBy("file_id")
                 .agg(F.min("ra").alias("min_ra"), F.max("ra").alias("max_ra"),
                      F.min("rb").alias("min_rb"), F.max("rb").alias("max_rb"),
                      F.count(F.lit(1)).alias("n_rows"),
                      F.sum(match_a.cast("int")).alias("m_a"),
                      F.sum((match_a & match_b).cast("int")).alias("m_ab")))
        skip_a = (F.col("max_ra") < SKIP_A_LO) | (F.col("min_ra") >= SKIP_A_HI)
        skip_b = (F.col("max_rb") < SKIP_B_LO) | (F.col("min_rb") >= SKIP_B_HI)
        for pred, skipped, matched in (("a_only", skip_a, "m_a"),
                                       ("a_and_b", skip_a | skip_b, "m_ab")):
            out.append(files.agg(
                F.lit(layout).alias("layout"),
                F.lit(pred).alias("predicate"),
                F.count(F.lit(1)).cast("long").alias("n_files"),
                F.sum(skipped.cast("int")).cast("long").alias("n_skipped"),
                F.round(F.sum(skipped.cast("int")) / F.count(F.lit(1)), 6)
                .alias("skip_ratio"),
                F.sum("n_rows").cast("long").alias("rows_total"),
                F.sum(F.when(skipped, F.col("n_rows")).otherwise(0))
                .cast("long").alias("rows_skipped"),
                F.sum(matched).cast("long").alias("rows_matched")))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res
