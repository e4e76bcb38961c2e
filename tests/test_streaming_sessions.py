"""Native session_window vs the custom lag/cumsum sessionizer: two
independent implementations of 30-min-gap sessions must agree on the
session partition of every user's events."""

from pyspark.sql import functions as F

from connectors_spark.streaming.incremental import session_window_stats


def test_session_window_agrees_with_custom_sessionizer(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    native = session_window_stats(events, gap="30 minutes")
    got = sorted(
        (r.user_id, r.n_events, r.total_value)
        for r in native.collect())

    from connectors_spark.entry_queries import q_sessionize
    custom = q_sessionize(spark, sf_dir)
    exp = sorted(
        (r.user_id, r.n_events, r.total_value)
        for r in custom.collect())
    assert got == exp
    assert len(got) > 0


def test_session_window_runs_as_a_stream(spark, sf_dir, tmp_path):
    """The same aggregation must run under Structured Streaming
    (availableNow over the parquet source, memory sink)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the file stream source needs a DIRECTORY; testdata is one file
    src = str(tmp_path / "events_dir")
    events.write.parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .parquet(src)
              # parquet stores TIMESTAMP_NTZ; watermarks need TIMESTAMP
              .withColumn("ts", F.col("ts").cast("timestamp")))
    # watermark wider than the data span: parquet file order is not
    # event-time order (memory: dropDuplicatesWithinWatermark pitfall)
    agg = session_window_stats(
        stream.withWatermark("ts", "365 days"), gap="30 minutes")
    q = (agg.writeStream.format("memory").queryName("sess_test")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM sess_test").collect()[0].n
    exp = session_window_stats(events, gap="30 minutes").count()
    assert got == exp > 0
