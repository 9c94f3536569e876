"""Structured Streaming surface.

The reference is pure batch (SURVEY.md §1.2: "no streaming abstractions");
this module is part of the north-star extension surface: the same event
aggregations the batch engine exposes (``events_tumbling_5min``), expressed
as incremental streaming plans with watermarked state.

Design rules applied:

- **watermark before stateful ops** — bounds state for late data; without it
  a windowed agg on an unbounded stream never evicts.
- **availableNow trigger for backfill/tests** — processes the existing files
  as a bounded stream with the same incremental plan, so batch/stream parity
  is testable (tests/test_streaming.py asserts stream results == the batch
  twin query).
- at scale, the parquet source here stands in for Kafka; the plan shape
  (source -> watermark -> window agg -> sink) is identical.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream. Streaming sources need an explicit schema
    (no inference), and the nanos-timestamp normalization of
    sources/readers.py applies here too via the legacy flag + rebuild."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = StructType(
        [f if f.name != "ts" else StructField("ts", LongType()) for f in EVENT_SCHEMA]
    )
    # The file stream source monitors a *directory*. Test fixtures are single
    # parquet files, so expose one through a temp-dir symlink; real deployments
    # point at an ingest directory (or Kafka) and take the direct branch.
    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(path, os.path.join(d, os.path.basename(path)))
        path = d
    stream = spark.readStream.schema(raw_schema).parquet(path)
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the streaming twin
    of the batch ``events_tumbling_5min`` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user (built-in session_window — gap-based state
    merge; the custom applyInPandasWithState route is only needed for
    non-time session semantics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def run_to_memory(result: DataFrame, name: str, timeout_sec: int = 120) -> DataFrame:
    """Run a streaming plan over the currently-available data (availableNow)
    into an in-memory table and return it as a batch DataFrame."""
    query = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_sec)
    spark = result.sparkSession
    return spark.table(name)
