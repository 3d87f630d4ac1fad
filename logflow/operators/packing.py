"""Training-shard packing: assign documents to fixed token-budget shards.

The last step of a training-data pipeline: order the corpus
deterministically, accumulate token counts, and cut a new shard every
``budget`` tokens.  The core primitive is a GLOBAL cumulative sum — the
naive form (`Window.orderBy(id)` with no partition key) collapses the
whole table into ONE task, which is exactly what dies at 100 TB.

Scalable form (two-phase, the textbook distributed prefix-sum):

1. range-repartition by the order key (Spark's sort machinery — samples
   key quantiles, so partitions are balanced and key-ordered ACROSS
   partitions);
2. local running sum per partition (window partitioned by
   `spark_partition_id()` — parallel, no cross-partition traffic);
3. per-partition totals (tiny frame: one row per partition) get their own
   running sum on the driver-scale side, then broadcast-join back as
   offsets.

Total shuffled data beyond the sort itself: one row per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame, order_col: str, value_col: str, out_col: str = "running"
) -> DataFrame:
    """Cumulative sum of ``value_col`` in ``order_col`` order, inclusive of
    the current row — distributed via range partitioning + offset join."""
    parted = df.repartitionByRange(F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parted.withColumn("__local", F.sum(value_col).over(local_w))
    totals_w = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One row per partition: the single-task window here is over ~hundreds
    # of rows regardless of table size.
    offsets = (
        local.groupBy("__pid")
        .agg(F.sum(value_col).alias("__ptotal"))
        .withColumn("__offset", F.sum("__ptotal").over(totals_w) - F.col("__ptotal"))
        .select("__pid", "__offset")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local")
    )


def token_shards(
    df: DataFrame, id_col: str, token_count_col: str, budget: int
) -> DataFrame:
    """Assign each row a ``shard_id``: contiguous fill in ``id_col`` order,
    new shard each time the running token total crosses ``budget``.

    ``shard_id = tokens_before_this_row DIV budget`` — integer arithmetic
    end-to-end (no float rounding at shard boundaries).
    """
    cum = global_running_sum(df, id_col, token_count_col, out_col="__cum")
    return (
        cum.withColumn("__before", (F.col("__cum") - F.col(token_count_col)).cast("long"))
        .withColumn("shard_id", F.expr(f"__before DIV {int(budget)}"))
        .drop("__cum", "__before")
    )
