from map_spark_sql_spark.streaming.events import (
    custom_sessionize,
    hopping_counts,
    purchase_view_join,
    read_event_stream,
    run_to_memory,
    session_windows,
    tumbling_counts,
)

__all__ = [
    "custom_sessionize",
    "hopping_counts",
    "purchase_view_join",
    "read_event_stream",
    "run_to_memory",
    "session_windows",
    "tumbling_counts",
]
