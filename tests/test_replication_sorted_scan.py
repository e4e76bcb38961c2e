"""CCR follower replay (operators/replication.py) and index-sorted
early-termination top-k (operators/sorted_scan.py)."""

import pyspark.sql.functions as F
import pytest

from connectors_spark.operators.replication import (
    bootstrap_state, follower_apply)
from connectors_spark.operators.sorted_scan import (
    block_stats, prune_blocks, sorted_topk)


def _ops(spark, rows):
    return spark.createDataFrame(
        rows, "seq_no long, id string, op_type string, v double")


OPS = [
    (1, "a", "index", 1.0),
    (2, "b", "index", 2.0),
    (3, "a", "index", 1.5),   # a rewritten
    (4, "c", "index", 3.0),
    (5, "b", "delete", 0.0),  # b deleted
    (6, "d", "index", 4.0),
    (7, "c", "index", 3.5),
    (8, "e", "index", 5.0),
    (9, "e", "delete", 0.0),
    (10, "e", "index", 5.5),  # e resurrected after delete
]


def _state_dict(df):
    return {r["id"]: (r["seq_no"], r["v"]) for r in df.collect()}


class TestFollowerApply:
    def test_checkpoint_resume_equals_full_replay(self, spark):
        ops = _ops(spark, OPS)
        full = _state_dict(bootstrap_state(ops))
        for ckpt in (0, 3, 5, 9, 10):
            base = bootstrap_state(ops, upto=ckpt)
            got = _state_dict(follower_apply(base, ops, ckpt))
            assert got == full, f"checkpoint {ckpt} diverged"

    def test_full_replay_semantics(self, spark):
        full = _state_dict(bootstrap_state(_ops(spark, OPS)))
        # b stays deleted; e resurrected by the later index op
        assert full == {"a": (3, 1.5), "c": (7, 3.5),
                        "d": (6, 4.0), "e": (10, 5.5)}

    def test_idempotent_reapply(self, spark):
        ops = _ops(spark, OPS)
        base = bootstrap_state(ops, upto=5)
        once = follower_apply(base, ops, 5)
        # retried batch: apply the SAME suffix onto the already-advanced
        # state — the CCR retry case; last-write-wins must converge
        twice = follower_apply(once, ops, 5)
        assert _state_dict(once) == _state_dict(twice)

    def test_empty_suffix_is_noop(self, spark):
        ops = _ops(spark, OPS)
        base = bootstrap_state(ops, upto=10)
        assert _state_dict(follower_apply(base, ops, 10)) == \
            _state_dict(base)


def _blocked(spark, n=400, block=50, shuffle=False):
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 3 % n if shuffle else F.col("id"))
        .cast("double").alias("key"),
    )
    return df.withColumn(
        "blk", (F.col("event_id") / block).cast("long"))


class TestSortedTopk:
    def test_prunes_on_sorted_layout(self, spark):
        df = _blocked(spark, shuffle=False)  # key == write order
        out, info = sorted_topk(df, "blk", "key", 20,
                                extra_order=["event_id"])
        got = [r["event_id"] for r in out.collect()]
        assert got == list(range(20))
        assert info["blocks_read"] < info["blocks_total"]
        assert info["blocks_read"] <= 2  # k=20 sits in the first block

    def test_correct_on_uncorrelated_layout(self, spark):
        df = _blocked(spark, shuffle=True)  # blocks don't track the key
        out, info = sorted_topk(df, "blk", "key", 15,
                                extra_order=["event_id"])
        exact = (df.orderBy("key", "event_id").limit(15)
                 .select("event_id", "key").collect())
        assert [tuple(r) for r in
                out.select("event_id", "key").collect()] == \
            [tuple(r) for r in exact]
        # graceful degradation: unpruned but never wrong
        assert info["blocks_read"] <= info["blocks_total"]

    def test_fewer_than_k_rows(self, spark):
        df = _blocked(spark, n=7, block=3)
        out, info = sorted_topk(df, "blk", "key", 50)
        assert out.count() == 7
        assert info["blocks_read"] == info["blocks_total"]

    def test_empty(self, spark):
        df = _blocked(spark).where(F.lit(False))
        out, info = sorted_topk(df, "blk", "key", 5)
        assert out.count() == 0
        assert info == {"blocks_total": 0, "blocks_read": 0}

    def test_prune_blocks_pure(self):
        from pyspark.sql import Row
        rows = [Row(blk="b2", key_min=10, key_max=19, cnt=5),
                Row(blk="b1", key_min=0, key_max=9, cnt=5),
                Row(blk="b3", key_min=20, key_max=29, cnt=5)]
        prefix, cum = prune_blocks(rows, 7)
        assert prefix == ["b1", "b2"] and cum == 10

    def test_duplicate_keys_across_block_boundary(self, spark):
        # every key duplicated 4x so the k-th value T spans blocks;
        # candidate closure (min <= T) must pull the later block in
        df = spark.range(100).select(
            F.col("id").alias("event_id"),
            (F.col("id") / 4).cast("long").cast("double").alias("key"),
            (F.col("id") / 20).cast("long").alias("blk"))
        out, _ = sorted_topk(df, "blk", "key", 22,
                             extra_order=["event_id"])
        exact = df.orderBy("key", "event_id").limit(22) \
                  .select("event_id").collect()
        assert [r["event_id"] for r in out.collect()] == \
            [r["event_id"] for r in exact]

    def test_block_stats_shape(self, spark):
        st = block_stats(_blocked(spark, n=100, block=25),
                         "blk", "key").collect()
        assert len(st) == 4
        assert all(r["cnt"] == 25 for r in st)
