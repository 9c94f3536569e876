"""Streaming plans must agree with their batch twins over the same files."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_spark_sql_spark.sources.readers import load_table
from map_spark_sql_spark.streaming import read_event_stream, run_to_memory, tumbling_counts

SF_DIR = "/root/testdata/sf0.001"


def test_tumbling_counts_matches_batch(spark):
    stream = read_event_stream(spark, f"{SF_DIR}/events.parquet")
    got = run_to_memory(tumbling_counts(stream), "t_tumbling")
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    g = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert g == b and len(g) > 0


def test_session_windows_runs(spark):
    from map_spark_sql_spark.streaming import session_windows

    stream = read_event_stream(spark, f"{SF_DIR}/events.parquet")
    got = run_to_memory(session_windows(stream), "t_sessions")
    rows = got.collect()
    assert len(rows) > 0
    r = rows[0]
    assert r.session_end >= r.session_start
    assert r.n_events >= 1
