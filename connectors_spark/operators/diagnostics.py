"""Pre-flight distribution diagnostics — the "partitioning / shuffle /
skew handled explicitly" leg of the north rule needs MEASUREMENT, not
just mitigation: before committing a 100-TB groupBy/join to a key, a
pipeline should know how that key's mass lands on the shuffle's hash
partitions and which keys are the heavy hitters.

`shuffle_skew_report` answers that with one combine-friendly pass:
per-partition row mass, key counts, the heaviest key, and a load factor
(1.0 = perfectly balanced; the max load factor IS the straggler
multiplier a shuffle on this key will suffer). The partition function
is the engine-portable md5 bucket (same construction the sampling /
split operators use), so the report is reproducible in any engine —
it models A hash partitioner honestly rather than chasing a specific
JVM hash implementation.

Companion mitigations elsewhere in the repo: salting (build.py's salted
two-stage agg), broadcast (scorer plans), AQE skew-join (session conf).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffle_skew_report(df: DataFrame, key_col: str,
                        n_partitions: int = 32,
                        round_to: int = 6) -> DataFrame:
    """Per-partition skew report for a planned shuffle on `key_col`.

    Returns one row per NON-EMPTY partition: (partition, n_rows,
    n_keys, heaviest_key, heaviest_n, load_factor) with load_factor =
    n_rows * n_partitions / total_rows — a single division of exact
    integers. The heaviest key per partition is elected by (count,
    key) descending, fully deterministic.

    Plan shape: ONE map-side-combinable groupBy on the key (the frame
    after it is lexicon-sized, not corpus-sized); everything downstream
    aggregates that frame. The heavy-key election is max-count-per-
    partition + equi-join back — no windows. Empty partitions are
    absent (their load factor is 0 by definition)."""
    part = (F.conv(F.substring(F.md5(F.col("key")), 1, 8), 16, 10)
            .cast("long") % n_partitions)
    keys = (df.select(F.col(key_col).cast("string").alias("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("partition", part.cast("int")))
    pa = keys.groupBy("partition").agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("_max_cnt"))
    heav = (keys.join(pa.select("partition", "_max_cnt"), "partition")
            .filter(F.col("cnt") == F.col("_max_cnt"))
            .groupBy("partition")
            .agg(F.max("key").alias("heaviest_key")))
    total = keys.agg(F.sum("cnt").alias("_total"))
    out = (pa.join(heav, "partition")
           .crossJoin(F.broadcast(total)))
    return out.select(
        "partition",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_keys").cast("long").alias("n_keys"),
        "heaviest_key",
        F.col("_max_cnt").cast("long").alias("heaviest_n"),
        F.round((F.col("n_rows") * n_partitions).cast("double")
                / F.col("_total").cast("double"), round_to)
        .alias("load_factor"))
