"""Custom stateful streaming operator (SURVEY §2.2 "streaming: stateful").

The built-in streaming aggregation already covers the incremental
dependency graph (Q3) in update mode; this module provides the CUSTOM
state path — ``applyInPandasWithState`` — for operators whose semantics a
streaming agg can't express (per-key running state with arbitrary
transition logic).  The demo op is an incremental per-key total that
emits the updated running (count, sum) for every key touched by a
micro-batch: the streaming form of ``groupBy(key).agg(count, sum)`` whose
per-batch outputs converge to the batch result (asserted in tests).

Scale notes: state is partitioned by the grouping key across executors
(HDFS/RocksDB-backed state store at cluster scale), each Arrow batch
carries one key's rows, and state size is O(distinct keys) — the shape
that keeps a 100 TB/day stream's state bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTAL_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_running_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})


def running_totals(records: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Incremental (count, sum) per key over a stream.

    Emits one row per key per micro-batch the key appears in, carrying the
    running totals since stream start; the latest row per key equals the
    batch ``groupBy(key).count/sum`` over everything seen so far.
    """
    from pyspark.sql import functions as F

    keyed = records.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
