"""Deterministic transcript + query-set synthesis, fully distributed.

Everything derives from xxhash64(seed, conv, turn, i) so the data is
identical regardless of parallelism or partitioning — a requirement for
the two-parallelism scaling benchmark (same input at local[N] and
local[4N]) and for kill-and-resume tests. No wall-clock anywhere
(ts is a pure function of the seed).

Term ranks are log-uniform => P(rank r) ~ 1/r, i.e. a Zipf(1) vocabulary,
so hot-term skew is realistic ("the-like" terms with huge posting lists).
Generation is pure JVM expression code (codegen'd); synthesizing 10M turns
is a narrow single-stage scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 50_000
MAX_CONV_LEN = 64
MIN_TOKENS, MAX_TOKENS = 5, 400
BASE_TS = "2025-01-01 00:00:00"


def _h01(*cols) -> F.Column:
    """Deterministic uniform(0,1) from the given columns."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1_000_000_000)) + 0.5) / 1e9


def zipf_rank_sql(u_sql: str, vocab: int) -> str:
    """SQL fragment: log-uniform rank in [1, vocab-1] => P(r) ~ 1/r."""
    return f"cast(exp(({u_sql}) * {math.log(vocab)}) as long)"


def synth_transcripts(
    spark: SparkSession, n_convs: int, seed: int = 42, parallelism: int | None = None
) -> DataFrame:
    """Deterministic transcripts (conv_id, turn_idx, role, text, tool, ts)."""
    s = F.lit(seed)
    convs = spark.range(n_convs, numPartitions=parallelism).select(
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
        F.col("id").alias("cnum"),
    )
    convs = convs.withColumn(
        "conv_len",
        (F.lit(2) + F.exp(_h01(s, F.lit("len"), F.col("cnum")) * math.log(MAX_CONV_LEN - 1)))
        .cast("int"),
    )
    turns = convs.select(
        "conv_id",
        "cnum",
        F.explode(F.sequence(F.lit(0), F.col("conv_len") - 1)).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    role_u = _h01(s, F.lit("role"), F.col("cnum"), F.col("turn_idx"))
    role = (
        F.when(role_u < 0.05, F.lit("system"))
        .when(role_u < 0.15, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    n_tok_u = _h01(s, F.lit("ntok"), F.col("cnum"), F.col("turn_idx"))
    n_tok = (
        F.lit(MIN_TOKENS)
        + F.exp(n_tok_u * math.log(MAX_TOKENS - MIN_TOKENS)).cast("int")
    )
    # ~1% empty turns (the reference tolerates empty text docs)
    n_tok = F.when(_h01(s, F.lit("empty"), F.col("cnum"), F.col("turn_idx")) < 0.01, F.lit(0)).otherwise(n_tok)

    cnum, tix = F.col("cnum"), F.col("turn_idx")
    u_sql = f"(pmod(xxhash64({seed}, cnum, turn_idx, i), 1000000000) + 0.5) / 1e9"
    rank_sql = zipf_rank_sql(u_sql, VOCAB_SIZE)
    turns = turns.withColumn("n_tok", n_tok)
    turns = turns.withColumn(
        "text",
        F.array_join(
            F.expr(
                f"transform(sequence(1, n_tok), i -> concat('t', lpad(cast({rank_sql} as string), 5, '0')))"
            ),
            " ",
        ),
    )

    tool_u = _h01(s, F.lit("tool"), cnum, tix)
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("search"), F.lit("bash"), F.lit("python"), F.lit("browser")),
            (F.pmod(F.xxhash64(s, F.lit("tname"), cnum, tix), F.lit(4)) + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))

    ts = F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(
        secs=(
            F.pmod(F.xxhash64(s, F.lit("t0"), cnum), F.lit(86400 * 365))
            + tix * (F.lit(30) + F.pmod(F.xxhash64(s, F.lit("dt"), cnum, tix), F.lit(300)))
        ).cast("double")
    )

    return turns.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        F.col("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def synth_queries(n_queries: int = 200, seed: int = 42) -> list[dict]:
    """Seeded BM25 query set: mix of hot/rare terms, absent terms, 1-6 terms."""
    import numpy as np

    rng = np.random.RandomState(seed + 1)
    queries = []
    for i in range(n_queries):
        n_terms = int(rng.randint(1, 7))
        terms = []
        for _ in range(n_terms):
            u = rng.random_sample()
            if u < 0.03:
                terms.append(f"zz{rng.randint(0, 1000):04d}absent")
            else:
                rank = max(1, int(math.exp(rng.random_sample() * math.log(VOCAB_SIZE))))
                terms.append(f"t{rank:05d}")
        k = int(rng.choice([10, 10, 10, 10, 1, 100]))
        queries.append({"query_id": f"q-{i:04d}", "query_text": " ".join(terms), "k": k})
    return queries
