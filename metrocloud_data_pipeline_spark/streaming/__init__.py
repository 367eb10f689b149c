from .pipeline import (
    alert_columns,
    continuous_aggregate,
    dedup_within_watermark,
    last_reading_state,
    run_alert_stream,
    run_ingest_stream,
    session_aggregate,
    stateful_anomaly_context,
    stream_raw_files,
    streaming_alert_eval,
)

__all__ = [
    "alert_columns",
    "continuous_aggregate",
    "dedup_within_watermark",
    "last_reading_state",
    "run_alert_stream",
    "run_ingest_stream",
    "session_aggregate",
    "stateful_anomaly_context",
    "stream_raw_files",
    "streaming_alert_eval",
]
