"""Watermarked stream-stream attribution join == its batch twin."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from connectors_spark.streaming.incremental import stream_stream_attribute

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


IMPS = [  # (user_id, imp_ts, imp_id)
    (1, _mins(0), "i1"),
    (1, _mins(30), "i2"),
    (2, _mins(5), "i3"),
    (3, _mins(0), "i4"),
]
CLKS = [  # (user_id, click_ts, click_id)
    (1, _mins(4), "c1"),     # matches i1 (4 min after)
    (1, _mins(33), "c2"),    # matches i2, NOT i1 (33 min > within)
    (2, _mins(16), "c3"),    # 11 min after i3 -> outside within
    (4, _mins(2), "c4"),     # no impression for user 4
]
EXPECTED = {("i1", "c1"), ("i2", "c2")}


def test_stream_stream_matches_batch_semantics(spark, tmp_path):
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        IMPS, "user_id int, imp_ts timestamp, imp_id string"
    ).write.parquet(imp_dir)
    spark.createDataFrame(
        CLKS, "user_id int, click_ts timestamp, click_id string"
    ).write.parquet(clk_dir)

    imp_s = spark.readStream.schema(
        "user_id int, imp_ts timestamp, imp_id string").parquet(imp_dir)
    clk_s = spark.readStream.schema(
        "user_id int, click_ts timestamp, click_id string").parquet(clk_dir)
    joined = stream_stream_attribute(imp_s, clk_s, within="10 minutes")
    q = (joined.writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.imp_id, r.click_id)
           for r in spark.read.parquet(out_dir).collect()}
    assert got == EXPECTED

    # batch twin over the same frames agrees
    bi = spark.createDataFrame(
        IMPS, "user_id int, imp_ts timestamp, imp_id string")
    bc = spark.createDataFrame(
        CLKS, "user_id int, click_ts timestamp, click_id string")
    batch = bi.join(
        bc,
        (bi.user_id == bc.user_id)
        & (bc.click_ts >= bi.imp_ts)
        & (bc.click_ts <= bi.imp_ts + F.expr("interval 10 minutes")),
    ).select("imp_id", "click_id")
    assert {(r.imp_id, r.click_id) for r in batch.collect()} == EXPECTED
