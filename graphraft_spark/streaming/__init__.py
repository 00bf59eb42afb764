from graphraft_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_memory",
    "sliding_counts",
    "tumbling_counts",
]
