"""Kafka header-multimap expressions.

Headers are ``array<struct<key:string, value:binary>>`` — the exact shape
of the Spark Kafka source with ``includeHeaders=true``.  An array (not a
map) preserves duplicate keys and ordering, matching Kafka's model; reads
are last-wins, matching ``ConsumerRecord.headers().lastHeader(name)``
(reference StreamsConfigTest.java:64,109,111).

All pure built-in higher-order functions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def last_header(headers: Column | str, name: str) -> Column:
    """Binary value of the LAST header with the given key (Kafka lastHeader)."""
    matches = F.filter(_c(headers), lambda h: h["key"] == F.lit(name))
    return F.element_at(matches, -1)["value"]


def header_value_str(headers: Column | str, name: str) -> Column:
    """Last header value decoded as UTF-8 string (NULL when absent)."""
    return last_header(headers, name).cast("string")


def put_header(headers: Column | str, name: str, value: Column | str) -> Column:
    """Append a header (string value encoded UTF-8). Duplicates allowed —
    appending is how Kafka producers add headers; last-wins on read."""
    entry = F.struct(
        F.lit(name).alias("key"),
        F.encode(_c(value) if isinstance(value, Column) else F.lit(value), "utf-8").alias("value"),
    )
    base = _c(headers)
    return F.when(base.isNull(), F.array(entry)).otherwise(F.concat(base, F.array(entry)))
