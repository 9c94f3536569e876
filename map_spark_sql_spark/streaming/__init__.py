from map_spark_sql_spark.streaming.documents import (
    ingest_documents,
    read_corpus,
    read_document_stream,
)
from map_spark_sql_spark.streaming.events import (
    custom_sessionize,
    error_burst_alerts,
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
    "error_burst_alerts",
    "dedup_events",
    "hopping_counts",
    "ingest_documents",
    "purchase_view_join",
    "read_corpus",
    "read_document_stream",
    "read_event_stream",
    "run_to_memory",
    "session_windows",
    "tumbling_counts",
    "upsert_to_snapshot",
]
