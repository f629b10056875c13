from .stateful import streaming_user_totals
from .windows import (
    session_window_agg,
    sessionize,
    sliding_window_agg,
    streaming_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "session_window_agg",
    "sessionize",
    "sliding_window_agg",
    "streaming_user_totals",
    "streaming_window_agg",
    "tumbling_window_agg",
]
