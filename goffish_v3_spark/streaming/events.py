"""Structured Streaming operators over the ``events`` stream.

The reference is strictly batch BSP (SURVEY.md §2.D — no streaming layer);
these operators are the engine's streaming surface for event feeds at scale:
watermarked tumbling/sliding window aggregation and stateful sessionization.

Each operator has a ``*_batch`` twin with identical semantics on a static
DataFrame — used by the DuckDB oracle comparisons — plus a true
``readStream`` runner that drives the same aggregation through a streaming
query into a memory sink (exercised in tests; on a cluster the sink is
Kafka/Iceberg and the trigger is continuous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_stream(spark: SparkSession, parquet_path: str) -> DataFrame:
    """File-source stream over a single parquet file (the file source wants a
    directory, so point it at the parent with a glob filter)."""
    import os

    schema = spark.read.parquet(parquet_path).schema
    if os.path.isdir(parquet_path):
        return spark.readStream.schema(schema).parquet(parquet_path)
    d, fname = os.path.split(parquet_path)
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", fname)
        .parquet(d)
    )


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts per event_type:
    ``(window_start, event_type, n, total_value)``."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def windowed_counts_stream(
    spark: SparkSession,
    parquet_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "windowed_counts",
) -> DataFrame:
    """Run the same aggregation as a real streaming query over a file source
    with a watermark for late data, drain it synchronously into a memory
    sink, and return the materialized result.

    Late rows beyond the watermark are dropped in ``append`` mode on a
    cluster; here the memory sink uses ``complete`` so the batch twin and the
    streamed result agree exactly on finite input.
    """
    stream = _read_stream(spark, parquet_path)
    # watermarks require TIMESTAMP (ltz); session TZ is UTC so the round-trip
    # through ltz and back to ntz is value-preserving
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessionization: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Batch twin of the streaming
    ``session_window`` aggregation — same session boundaries.

    Returns ``(user_id, session_start, n_events, total_value)``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # parquet timestamps may load as TIMESTAMP_NTZ, which has no direct long
    # cast; go through timestamp_ltz (session TZ is pinned to UTC)
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sessioned = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .drop("session_id")
    )


def sessionize_stream(
    spark: SparkSession,
    parquet_path: str,
    gap_minutes: int = 30,
    query_name: str = "sessions",
) -> DataFrame:
    """True streaming sessionization with ``session_window`` (stateful,
    watermark-gated) drained into a memory sink."""
    stream = _read_stream(spark, parquet_path).withColumn(
        "ts", F.col("ts").cast("timestamp_ltz")
    )
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            "user_id",
            F.col("sw.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
