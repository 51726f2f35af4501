"""Structured Streaming parity: the tumbling-window aggregation produces the
same result driven as a stream (file source → watermark → memory sink) as in
batch — the engine's late-data/incremental story (reference analog:
sortupdate latest-wins + diff, SURVEY §2.9)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_window_matches_batch(spark, sf_dir):
    events_path = f"{sf_dir}/events.parquet"
    batch = spark.read.parquet(events_path)
    schema = batch.schema

    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # parquet timestamps arrive as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    # (session TZ is pinned UTC, so the cast is value-preserving)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    batch = batch.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {tuple(r) for r in spark.sql("SELECT * FROM stream_out").collect()}
    want = {
        tuple(r)
        for r in (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
            .select(F.col("w.start").alias("ws"), "event_type", "n", "total")
            .collect()
        )
    }
    assert got == want
    assert len(got) > 0


def test_stream_stateful_latest_wins(spark, sf_dir):
    """Latest-event-per-user maintained incrementally via streaming dedup
    ordering — checked against the batch window answer."""
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = stream.groupBy("user_id").agg(
        F.max_by("event_id", F.struct("ts", "event_id")).alias("event_id")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("latest_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["user_id"], r["event_id"])
           for r in spark.sql("SELECT * FROM latest_out").collect()}
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    want = {
        (r["user_id"], r["event_id"])
        for r in batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
        .collect()
    }
    assert got == want
