"""logflow — a PySpark-native analytics engine for correlated record streams.

Re-expresses the capabilities of timtebeek/kafka-streams-log-correlation
(Kafka-record data model, trace enrich/branch/route operators, Zipkin-style
trace analytics) as an idiomatic Spark DataFrame library, extended with the
relational + LLM-data-pipeline operator surface described in SURVEY.md §2.

Design stance (SURVEY.md §7): public API = functions returning DataFrames;
trace semantics = derived columns; "topology" = composition of DataFrame
transformations; streaming = the same functions applied to streaming frames.
"""

from logflow.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
