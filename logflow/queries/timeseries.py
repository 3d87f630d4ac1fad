"""Time-series operators over the events table: gap fill + forward fill.

Sensor/metrics pipelines need a DENSE series per key (one row per hour,
including hours with no events) before rolling metrics, anomaly scoring,
or model features make sense. The operator: per-user hourly aggregate →
explode the user's [first_hour, last_hour] range into a dense grid →
left-join observations onto the grid → forward-fill gaps with the last
observed value (``last_value IGNORE NULLS`` over an ordered frame).

Determinism: hour buckets via date_trunc on the NTZ timestamp (timezone-
free in both engines — never unix_timestamp on NTZ, see CLAUDE.md);
hourly sums are exact DECIMAL, rounded once; the fill window orders by
(user, hour) which is unique per partition, so the filled value is the
same in any execution order.

100 TB story: the grid explode is bounded by span-hours per key (not by
event count) and is map-side after the per-key span agg; the fill is ONE
shuffle on user_id that the hourly agg, the grid build, and the window
all share (Catalyst chains them on one partitioning). Keys with years of
span at second granularity switch the grid to coarser buckets or a
bounded lookback — grid size is an explicit, auditable choice here, not
an accident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logflow.queries import register
from logflow.sources.tables import load_table


@register(
    "ts_gap_fill_forward",
    """
WITH f AS (SELECT user_id, ts, value FROM events WHERE user_id % 10 = 0),
h AS (SELECT user_id, date_trunc('hour', ts) AS hr,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS hourly_value,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM f GROUP BY user_id, date_trunc('hour', ts)),
span AS (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM h GROUP BY user_id),
grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
         FROM span),
j AS (SELECT g.user_id, g.hr, h.hourly_value,
             COALESCE(h.n_events, 0) AS n_events
      FROM grid g LEFT JOIN h ON g.user_id = h.user_id AND g.hr = h.hr)
SELECT user_id, hr, n_events, hourly_value,
       last_value(hourly_value IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       hourly_value IS NULL AS is_gap
FROM j
""",
    doc="Dense hourly series per user with forward fill: per-user hourly "
    "sums, a generate_series/sequence grid over each user's observed "
    "span, and last_value(IGNORE NULLS) to carry the previous "
    "observation across gap hours. The grid explode is bounded by span-"
    "hours per key, not event count; hourly agg + grid + fill window all "
    "share ONE user_id shuffle. The first grid hour always has an "
    "observation (span starts at the first event), so filled_value is "
    "never NULL. user_id%10 sampling keeps the checked result compact; "
    "the operator itself is sampling-free.",
)
def ts_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") % 10 == 0)
    h = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hr"))
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(12,4)")), 2)
            .cast("double")
            .alias("hourly_value"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    span = h.groupBy("user_id").agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
    )
    j = grid.join(h, ["user_id", "hr"], "left_outer").select(
        "user_id",
        "hr",
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        "hourly_value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "hr",
        "n_events",
        "hourly_value",
        F.last("hourly_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("hourly_value").isNull().alias("is_gap"),
    )
