from sales_etl_spark.streaming.windows import (
    tumbling_agg,
    sliding_agg,
    session_agg,
    read_events_stream,
    stream_tumbling_counts,
    stream_dedup,
)

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "read_events_stream",
    "stream_tumbling_counts",
    "stream_dedup",
]
