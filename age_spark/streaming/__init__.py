from .stream import (  # noqa: F401
    read_event_stream,
    session_aggregate,
    sliding_counts,
    streaming_exact_dedup,
    running_user_counts,
    tumbling_counts,
    with_event_time,
)
