from .pipeline import (  # noqa: F401
    custom_sessionize,
    dedup_stream,
    hourly_counts,
    read_event_stream,
    run_to_memory,
    session_stats,
    user_running_stats,
)
