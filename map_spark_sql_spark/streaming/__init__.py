from map_spark_sql_spark.streaming.events import (
    custom_sessionize,
    dedup_events,
    hopping_counts,
    purchase_view_join,
    read_event_stream,
    run_to_memory,
    session_windows,
    tumbling_counts,
    upsert_to_snapshot,
)

__all__ = [
    "custom_sessionize",
    "dedup_events",
    "hopping_counts",
    "purchase_view_join",
    "read_event_stream",
    "run_to_memory",
    "session_windows",
    "tumbling_counts",
    "upsert_to_snapshot",
]
