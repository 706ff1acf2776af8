from ominimo_dynamic_data_pipeline_spark.streaming.ops import (
    read_events_stream,
    session_counts,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
    validated_split_writer,
)

__all__ = [
    "read_events_stream",
    "session_counts",
    "sliding_counts",
    "stream_dedup",
    "tumbling_counts",
    "validated_split_writer",
]
