"""Schemas for the engine's data plane (SURVEY.md §1.4, FIXTURES.md §1).

The fundamental abstraction mirrors the reference's keyed Kafka record
stream (reference: StreamsConfig.java:30-31): a DataFrame whose rows carry
(key, value, topic, partition, offset, ts, headers).  Headers are an
ordered multimap — ``array<struct<key:string, value:binary>>`` — exactly
Kafka's model (duplicate keys allowed, last-wins reads; reference
StreamsConfigTest.java:64 ``lastHeader``).

Secondary abstractions: trace context (B3 single-header format, reference
StreamsConfigTest.java:92), span (Zipkin model, reference README.adoc:133),
and the correlated log row (MDC model, reference README.adoc:93-114).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Kafka record frame (matches spark-sql-kafka source with includeHeaders) ---

HEADER_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("value", T.BinaryType(), True),
        ]
    )
)

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.LongType(), True),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("headers", HEADER_TYPE, True),
    ]
)

# --- Trace context decoded from the `b3` header ("{traceId}-{spanId}-{sampled}") ---

TRACE_CONTEXT_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType(), True),
        T.StructField("span_id", T.StringType(), True),
        T.StructField("parent_span_id", T.StringType(), True),
        T.StructField("sampled", T.BooleanType(), True),
    ]
)

# --- Span table (Zipkin model; FIXTURES.md §1.2) ---

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType(), False),
        T.StructField("span_id", T.StringType(), False),
        T.StructField("parent_id", T.StringType(), True),
        T.StructField("name", T.StringType(), False),
        T.StructField("service", T.StringType(), False),
        T.StructField("remote_service", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("duration_us", T.LongType(), False),
        T.StructField("kafka_topic", T.StringType(), True),
    ]
)

# --- Correlated log row (MDC model; FIXTURES.md §1.3) ---

LOG_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("level", T.StringType(), False),
        T.StructField("app", T.StringType(), False),
        T.StructField("trace_id", T.StringType(), True),
        T.StructField("span_id", T.StringType(), True),
        T.StructField("exportable", T.BooleanType(), True),
        T.StructField("logger", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
        T.StructField("baggage", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Topic names from the reference (StreamsConfig.java:20-22).
TOPIC_INPUT = "numbers"
TOPIC_ODD = "odd-numbers"
TOPIC_EVEN = "even-numbers"

#: TPC-H-ish + LLM-pipeline tables the driver provides (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
