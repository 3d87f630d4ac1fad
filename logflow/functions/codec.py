"""Fixed-serde codecs (reference application.yml:17-21).

The reference pins ``StringSerde`` keys and ``IntegerSerde`` values —
a 4-byte big-endian int (written by TestProducer.java:25).  These helpers
decode/encode that wire format with built-in expressions only, so raw
Kafka bytes never need a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def int_be_decode(value: Column | str) -> Column:
    """Decode 4-byte big-endian binary → int (Kafka IntegerSerde)."""
    return F.conv(F.hex(_c(value)), 16, 10).cast("int")


def int_be_encode(value: Column | str) -> Column:
    """Encode int → 4-byte big-endian binary (Kafka IntegerSerde)."""
    return F.to_binary(F.lpad(F.hex(_c(value).cast("int")), 8, "0"), F.lit("hex"))
