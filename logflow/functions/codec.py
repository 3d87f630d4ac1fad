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
    """Decode 4-byte big-endian binary → int (Kafka IntegerSerde).

    Signed two's complement: conv() yields the UNSIGNED value (0..2^32-1);
    values with the sign bit set are shifted down by 2^32 — a direct
    .cast('int') would raise a cast-overflow under ANSI mode for any
    negative serde int (e.g. FFFFFFFF).
    """
    u = F.conv(F.hex(_c(value)), 16, 10).cast("long")
    return F.when(u >= F.lit(2147483648), u - F.lit(4294967296)).otherwise(u).cast("int")


def int_be_encode(value: Column | str) -> Column:
    """Encode int → 4-byte big-endian binary (Kafka IntegerSerde).

    hex() of a negative int emits 16 chars (64-bit two's complement); the
    low 8 hex chars are exactly the 4-byte big-endian representation, so
    pad to 16 and keep the tail — lpad alone would keep the HIGH bytes.
    """
    h = F.lpad(F.hex(_c(value).cast("int")), 16, "0")
    return F.to_binary(F.substring(h, -8, 8), F.lit("hex"))
