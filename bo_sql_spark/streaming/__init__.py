from bo_sql_spark.streaming.events import (
    events_stream,
    run_to_memory,
    sessionize,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)

__all__ = [
    "events_stream",
    "run_to_memory",
    "tumbling_counts",
    "sliding_counts",
    "sessionize",
    "stream_dedup",
]
