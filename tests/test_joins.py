"""bloom_prune_join / salted_join: exact equality with the plain join,
plus the structural claims (pruning actually prunes; salting actually
spreads)."""

from pyspark.sql import functions as F

from connectors_spark.operators.joins import bloom_prune_join, salted_join


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bloom_prune_join_equals_plain_join(spark, sf_dir):
    big = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity")
    small = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
        .limit(50)
    )
    exp = _sorted_rows(big.join(small, "l_orderkey", "inner"))
    got = _sorted_rows(bloom_prune_join(big, small, "l_orderkey"))
    assert got == exp and len(got) > 0

    # the filter must actually prune: candidates << big side
    n_big = big.count()
    n_match = big.join(small, "l_orderkey", "left_semi").count()
    n_sem = bloom_prune_join(big, small, "l_orderkey",
                             how="left_semi").count()
    assert n_sem == n_match < n_big


def test_bloom_prune_join_no_false_negatives_tiny_mask(spark):
    # even an overloaded 64-bit mask (guaranteed false positives)
    # returns the exact join — FPs die in the real join
    big = spark.createDataFrame(
        [(i, i * 10) for i in range(200)], "k long, v long")
    small = spark.createDataFrame(
        [(i, f"s{i}") for i in range(0, 200, 17)], "k long, s string")
    exp = _sorted_rows(big.join(small, "k"))
    got = _sorted_rows(bloom_prune_join(big, small, "k", m_bits=64, k=2))
    assert got == exp


def test_salted_join_equals_plain_join_with_skew_and_dups(spark):
    rows = [(1, i) for i in range(500)] + [(2, 0), (2, 0), (3, 7)]
    big = spark.createDataFrame(rows, "k long, v long")
    small = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (9, "unmatched")], "k long, s string")
    for how in ("inner", "left"):
        exp = _sorted_rows(big.join(small, "k", how))
        got = _sorted_rows(salted_join(big, small, "k", n_salts=8,
                                       how=how))
        assert got == exp, how

    # the hot key's rows actually spread across salts
    salt = F.pmod(F.hash("k", "v"), F.lit(8))
    n_distinct_salts = (big.filter(F.col("k") == 1)
                        .select(salt.alias("s")).distinct().count())
    assert n_distinct_salts > 1
