from map_spark_sql_spark.streaming.events import (
    read_event_stream,
    run_to_memory,
    session_windows,
    tumbling_counts,
)

__all__ = ["read_event_stream", "run_to_memory", "session_windows", "tumbling_counts"]
