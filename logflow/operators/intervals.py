"""Interval analytics: peak-concurrency sweep with a distributed prefix sum.

The classic interval-overlap question (how many spans are active at once)
is a running sum over +1/-1 boundary deltas — inherently ordered, which
is exactly what a distributed engine must NOT do globally. The operator
decomposes it two-phase, the same trick as operators/packing.py:

1. per-(day,hour) net delta sums → a DAY-partitioned window over that
   TINY frame (<= 25 rows per day) yields each hour's carry-in base;
2. the big running sum is then (day,hour)-partitioned — bounded
   partitions — offset by the hour base.

Tie semantics: ordering (t, delta) puts span-ends (-1) before span-starts
(+1) at equal timestamps, so touching spans never overlap; the default
RANGE window frame gives all tied rows the run-end cumsum, and within a
run of identical deltas the prefix values form the same set under any
permutation, so MAX over the day is deterministic cross-engine.

Spans are clipped at midnight so days are independent (a span crossing
midnight counts in its start day only, truncated; documented semantics,
not an accident).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_max_concurrency(
    df: DataFrame, ts_col: str = "ts", span_minutes: int = 5
) -> DataFrame:
    """Per-day peak concurrency of ``span_minutes``-length spans opened at
    each ``ts_col`` — columns (day, max_concurrent, n_spans)."""
    day = F.date_trunc("day", ts_col)
    spans = df.select(
        day.alias("day"),
        F.col(ts_col).alias("t0"),
        F.least(
            F.col(ts_col) + F.expr(f"INTERVAL {span_minutes} MINUTES"),
            day + F.expr("INTERVAL 1 DAY"),
        ).alias("t1"),
    )
    deltas = spans.select(
        "day", F.col("t0").alias("t"), F.lit(1).alias("delta")
    ).unionAll(spans.select("day", F.col("t1").alias("t"), F.lit(-1).alias("delta")))
    deltas = deltas.withColumn("hr", F.date_trunc("hour", "t"))
    hourly = deltas.groupBy("day", "hr").agg(F.sum("delta").alias("net"))
    w_base = (
        Window.partitionBy("day").orderBy("hr").rowsBetween(Window.unboundedPreceding, -1)
    )
    base = hourly.select(
        "day", "hr", F.coalesce(F.sum("net").over(w_base), F.lit(0)).alias("base")
    )
    w_run = Window.partitionBy("day", "hr").orderBy("t", "delta")
    run = deltas.join(base, ["day", "hr"]).select(
        "day", "delta", (F.col("base") + F.sum("delta").over(w_run)).alias("conc")
    )
    return run.groupBy("day").agg(
        F.max("conc").cast("long").alias("max_concurrent"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).cast("long").alias("n_spans"),
    )
