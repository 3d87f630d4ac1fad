"""Structured Streaming surface: the same operators over unbounded frames.

The batch operators in logflow.operators are expression-based, so they
apply unchanged to streaming DataFrames; this package adds the pieces that
are streaming-specific: source builders, the single-pass multi-sink branch
(foreachBatch + persist), watermarked windows, and stateful processing.
"""

from logflow.streaming.sources import file_record_stream, kafka_record_stream, rate_record_stream
from logflow.streaming.branch_sink import start_branch_query
from logflow.streaming.windows import hourly_type_counts, sliding_value_avg, session_spans

__all__ = [
    "file_record_stream",
    "kafka_record_stream",
    "rate_record_stream",
    "start_branch_query",
    "hourly_type_counts",
    "sliding_value_avg",
    "session_spans",
]
