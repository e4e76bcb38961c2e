"""Scale-technique joins: bloom-pruned shuffle joins and salted skew
joins — the two structural moves a 100 TB join plan reaches for when
AQE's automatic handling isn't enough (reference-scale rationale: the
sync diff joins of operators/sync.py meet both shapes — a huge
content-table side against a small checkpoint side, and Zipf-skewed
keys).

Both are pure-composition operators (no UDF): bloom membership compiles
to JVM array/bit expressions over a broadcast literal bitmask, salting
to a deterministic hash column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _bit(key_col, i: int, m: int):
    """k-th bloom bit position of a key: engine-portable md5 math
    (same scheme as the hll/cms/bloom gates)."""
    return (
        F.conv(F.substring(
            F.md5(F.concat_ws("|", F.lit(str(i)),
                              key_col.cast("string"))), 1, 8),
            16, 10).cast("long") % m
    )


def bloom_prune_join(big: DataFrame, small: DataFrame, key: str,
                     m_bits: int = 1 << 16, k: int = 4,
                     how: str = "inner") -> DataFrame:
    """Join `big` to `small` on `key`, pruning the big side with a
    bloom filter of the small side's keys BEFORE the shuffle: the
    small side's k bit positions are collected into an m-bit mask
    (m/64 longs — one driver round-trip bounded by m, NOT by rows),
    embedded as an array<long> literal, and membership is a pure JVM
    expression `mask[bit>>6] & (1<<(bit&63))` ANDed over the k hashes
    — no UDF, no extra shuffle, evaluated inside the big side's scan
    stage. No false negatives (bloom guarantee), and the real join
    removes false positives, so the result is EXACTLY the plain join
    (pinned in tests). Use when the big side is orders of magnitude
    larger and mostly non-matching — the shuffle then moves only the
    surviving fraction."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom_prune_join: unsupported how={how!r}")
    n_words = m_bits // 64
    words = [0] * n_words
    kc = F.col(key)
    bit_rows = (
        small.select(F.array(*[
            _bit(kc, i, m_bits) for i in range(k)]).alias("bits"))
        .select(F.explode("bits").alias("b")).distinct().collect()
    )
    for r in bit_rows:
        b = int(r["b"])
        words[b >> 6] |= 1 << (b & 63)
    # signed-long wrap for the Spark literal
    mask = F.array(*[
        F.lit(w - (1 << 64) if w >= (1 << 63) else w).cast("long")
        for w in words])
    big = big.withColumn("_mask", mask)
    for i in range(k):
        big = big.withColumn(f"_b{i}", _bit(kc, i, m_bits))
    hits = [
        f"(element_at(_mask, CAST(_b{i} DIV 64 AS INT) + 1) & "
        f"shiftleft(CAST(1 AS BIGINT), CAST(_b{i} % 64 AS INT))) != 0"
        for i in range(k)
    ]
    pruned = big.filter(F.expr(" AND ".join(hits))).drop(
        "_mask", *[f"_b{i}" for i in range(k)])
    return pruned.join(small, key, how)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: the big side adds a deterministic salt
    (hash of the full row, mod n_salts) so one hot key's rows spread
    over n_salts shuffle partitions; the small side is replicated
    n_salts times (explode of a literal range — small x n_salts rows,
    the price of the spread). Result is EXACTLY the plain join for
    inner/left joins (row-equality pinned in tests, including
    duplicate rows). Use when one key dominates the distribution and
    the single hot shuffle partition would straggle — the same
    Zipf-head motivation as build.py's salted aggregations."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: unsupported how={how!r}")
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]),
                  F.lit(n_salts))
    bigs = big.withColumn("_salt", salt)
    smalls = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = bigs.join(smalls, [key, "_salt"], how)
    return out.drop("_salt")


def terms_lookup_filter(
    corpus: DataFrame,
    lookup: DataFrame,
    field: str,
    lookup_field: str | None = None,
) -> DataFrame:
    """ES terms-lookup query analog: the term SET is not a literal in the
    query body but fetched from another document at search time
    ({"terms": {"f": {"index": ..., "id": ..., "path": ...}}} — the
    reference's content indices are queried through exactly this DSL
    surface; delegation point at reference
    app/connectors_service/connectors/es/sink.py:212-248).

    `lookup` is the (tiny) frame holding the fetched document's term
    array, one term per row in `lookup_field`; `corpus` keeps rows whose
    `field` matches ANY fetched term. Compiles to a broadcast LEFT SEMI
    join — the 100 TB shape: the lookup doc is bounded (ES caps the
    terms-lookup list at 65k terms), so it broadcasts; the corpus scan
    keeps its partitioning, no shuffle, and the semi-join predicate is
    pushable ahead of any downstream agg.
    """
    lf = lookup_field or field
    keys = F.broadcast(
        lookup.select(F.col(lf).alias(field)).where(F.col(field).isNotNull())
        .distinct()
    )
    return corpus.join(keys, on=field, how="left_semi")


def interval_containment_join(intervals: DataFrame, points: DataFrame,
                              key: str, lo_col: str = "lo",
                              hi_col: str = "hi", t_col: str = "t",
                              chunk_width: int = 600_000_000) -> DataFrame:
    """Interval-containment join WITHOUT the cross-product trap: match
    every point t to every interval [lo, hi) sharing `key` — the
    incident-attribution / session-containment join. The naive plan
    (join on key, filter lo <= t < hi) explodes on hot keys: one key
    with 10^4 intervals x 10^5 points is 10^9 post-join rows before
    the filter. The scale shape is time-chunk bucketing: each interval
    is exploded to the fixed-width chunks it covers, points carry
    their single chunk, and the join runs on (key, chunk) equality —
    a plain equi-join whose per-task width is bounded by activity per
    chunk, never per key. A (point, interval) pair can only meet in
    the point's one chunk, so no dedup pass is needed.

    `chunk_width` is in the units of lo/hi/t (epoch micros by
    convention); the explode factor is ceil(duration / chunk_width)
    + 1 — pick chunk_width near the typical interval duration.
    Chunk ids use exact integer division (x DIV w), never float
    floor(x / w), which mis-buckets near chunk boundaries at
    epoch-microsecond magnitudes.

    -> one row per contained (interval row, point row): all interval
    columns + the point's columns (t and any extras)."""
    w = int(chunk_width)
    ck = intervals.withColumn(
        "_chunk", F.explode(F.sequence(
            F.expr(f"{lo_col} DIV {w}"),
            F.expr(f"({hi_col} - 1) DIV {w}"))))
    pt = points.withColumn("_chunk", F.expr(f"{t_col} DIV {w}"))
    out = ck.join(pt, [key, "_chunk"]).filter(
        (F.col(t_col) >= F.col(lo_col)) & (F.col(t_col) < F.col(hi_col)))
    return out.drop("_chunk")
