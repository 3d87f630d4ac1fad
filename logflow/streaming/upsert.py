"""foreachBatch exactly-once keyed upsert sink (streaming MERGE INTO).

Structured Streaming's built-in file sinks are append-only; the standard
way to maintain a keyed TABLE from a stream (CDC apply, latest-state
materialization) is ``foreachBatch`` + a merge against the current table.
foreachBatch is only at-least-once — a crashed micro-batch is REPLAYED
with the same ``batch_id`` after restart — so the sink must be idempotent
per batch id. This implementation gets exactly-once semantics from two
pieces:

* **versioned snapshots**: each applied batch writes a full new snapshot
  directory ``v_{batch_id}`` (merge of the previous snapshot with the
  batch, latest-row-wins per key) and then atomically repoints a
  ``_latest`` pointer file (``os.replace``). Readers always see a
  complete snapshot — never a half-written merge.
* **batch-id dedup**: a replayed batch id finds its snapshot already
  committed (pointer at or past it) and becomes a no-op.

This is the same commit protocol Delta/Iceberg implement with manifest
logs, reduced to its parquet-only core; the snapshot rewrite is the
honest cost — at 100 TB table size a production sink partitions the
table and rewrites only the partitions the batch touches (the batch's
key→partition pruning makes the merge proportional to the CHANGED data,
the same argument as `cdc_apply_upsert`'s doc in queries/relational.py).

Batch-mode semantics of the same merge are covered by the oracle-backed
``cdc_apply_upsert`` query; this module contributes the streaming driver
and its crash/replay idempotence, tested in tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _latest_version(target_dir: str) -> int | None:
    ptr = os.path.join(target_dir, "_latest")
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as f:
        return int(f.read().strip())


def read_upsert_table(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """Read the current committed snapshot (None before the first commit)."""
    v = _latest_version(target_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(target_dir, f"v_{v}"))


def apply_upsert_batch(
    batch: DataFrame,
    batch_id: int,
    target_dir: str,
    keys: list[str],
    order_col: str,
) -> None:
    """Merge one micro-batch into the keyed table, idempotently.

    Latest-wins within the batch by ``order_col`` (ties broken by the
    keys themselves being unique per group after the window), then the
    batch overrides the previous snapshot per key.
    """
    spark = batch.sparkSession
    prev_version = _latest_version(target_dir)
    if prev_version is not None and batch_id <= prev_version:
        return  # replayed batch: already committed, no-op

    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    latest = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    current = read_upsert_table(spark, target_dir)
    if current is None:
        merged = latest
    else:
        merged = current.join(latest.select(*keys), keys, "left_anti").unionByName(latest)

    out = os.path.join(target_dir, f"v_{batch_id}")
    merged.write.mode("overwrite").parquet(out)
    tmp = os.path.join(target_dir, "_latest.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(batch_id))
    os.replace(tmp, os.path.join(target_dir, "_latest"))


def upsert_sink(
    stream: DataFrame,
    target_dir: str,
    keys: list[str],
    order_col: str,
    checkpoint: str,
):
    """Start a foreachBatch upsert of ``stream`` into ``target_dir``."""
    os.makedirs(target_dir, exist_ok=True)
    return (
        stream.writeStream.foreachBatch(
            lambda b, i: apply_upsert_batch(b, i, target_dir, keys, order_col)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
