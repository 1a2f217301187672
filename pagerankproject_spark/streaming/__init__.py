from .events import (
    windowed_event_counts,
    sessionize,
    stream_windowed_event_counts,
    sql_windowed_event_counts,
    sql_sessionize,
)

__all__ = [
    "windowed_event_counts",
    "sessionize",
    "stream_windowed_event_counts",
    "sql_windowed_event_counts",
    "sql_sessionize",
]
