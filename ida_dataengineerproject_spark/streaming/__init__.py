from .events import (  # noqa: F401
    read_events_stream,
    tumbling_counts,
    session_window_stats,
    streaming_dedup,
)
