"""Trace-context expressions: B3 header codec + deterministic span ids.

The reference propagates W3C/B3-style trace context via a single `b3`
header of the form ``"{traceId}-{spanId}-{sampled}"`` (reference:
StreamsConfigTest.java:92) and opens a fresh child span per instrumented
stage — same traceId, new spanId (asserted by StreamsConfigTest.java:64-66).

Brave generates span ids with an RNG; that is untestable and non-idempotent
under micro-batch replay, so this engine derives span ids DETERMINISTICALLY:
``md5(trace_id:stage:offset)`` truncated to 16 hex chars (SURVEY.md §4.2).
Determinism preserves the reference's observable contract ("same traceId,
new spanId per stage") while making every test reproducible and every
streaming retry idempotent. md5 is used (not sha2) because the DuckDB
oracle computes the identical value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACE_ID_HEX = 32
SPAN_ID_HEX = 16


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def trace_id_for(seed: Column | str) -> Column:
    """128-bit (32 hex) deterministic trace id from a seed column."""
    return F.md5(F.concat(F.lit("trace:"), _c(seed).cast("string")))


def span_id_for(seed: Column | str) -> Column:
    """64-bit (16 hex) deterministic root span id from a seed column."""
    return F.substring(F.md5(F.concat(F.lit("span:"), _c(seed).cast("string"))), 1, SPAN_ID_HEX)


def child_span_id(trace_id: Column | str, stage: str, offset: Column | str) -> Column:
    """New child span id for an instrumented stage.

    Same trace_id + distinct stage name + record offset → unique, stable id
    per (record, stage); mirrors Brave's child-span-per-stage behavior
    (reference StreamsConfig.java:32-45) minus the RNG.
    """
    return F.substring(
        F.md5(F.concat_ws(":", _c(trace_id), F.lit(stage), _c(offset).cast("string"))),
        1,
        SPAN_ID_HEX,
    )


def b3_single_header(trace_id: Column | str, span_id: Column | str, sampled: Column | bool = True) -> Column:
    """Encode the single-header B3 wire format ``{traceId}-{spanId}-{0|1}``."""
    flag = (
        F.when(_c(sampled), F.lit("1")).otherwise(F.lit("0"))
        if isinstance(sampled, Column)
        else F.lit("1" if sampled else "0")
    )
    return F.concat_ws("-", _c(trace_id), _c(span_id), flag)


def parse_b3(b3: Column | str) -> Column:
    """Decode a single-header B3 string into the trace-context struct.

    Returns struct(trace_id, span_id, parent_span_id=NULL, sampled).
    parent_span_id is NULL at decode time — the consumed span becomes the
    parent of the first locally created child span.
    """
    parts = F.split(_c(b3), "-")
    return F.struct(
        F.element_at(parts, 1).alias("trace_id"),
        F.element_at(parts, 2).alias("span_id"),
        F.lit(None).cast("string").alias("parent_span_id"),
        (F.element_at(parts, 3) == F.lit("1")).alias("sampled"),
    )
