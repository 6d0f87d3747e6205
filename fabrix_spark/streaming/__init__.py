from .ingest import (
    EVENTS_SCHEMA,
    foreach_batch_save,
    read_stream_json,
    read_stream_parquet,
    run_available_now,
    session_window,
    sliding_window,
    stream_dedup,
    stream_interval_join,
    tumbling_window,
)
from .stateful import running_totals, stateful_rolling_zscore, stateful_sessionize

__all__ = [
    "EVENTS_SCHEMA",
    "foreach_batch_save",
    "read_stream_json",
    "read_stream_parquet",
    "run_available_now",
    "running_totals",
    "session_window",
    "sliding_window",
    "stateful_rolling_zscore",
    "stateful_sessionize",
    "stream_dedup",
    "stream_interval_join",
    "tumbling_window",
]
