from .sinks import stream_to_parquet
from .stateful import streaming_dedup, streaming_enrich, streaming_user_totals
from .windows import (
    hypertable_rollup,
    session_window_agg,
    sessionize,
    sliding_window_agg,
    streaming_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "hypertable_rollup",
    "session_window_agg",
    "sessionize",
    "sliding_window_agg",
    "stream_to_parquet",
    "streaming_dedup",
    "streaming_enrich",
    "streaming_user_totals",
    "streaming_window_agg",
    "tumbling_window_agg",
]
