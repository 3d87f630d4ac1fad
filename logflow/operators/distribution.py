"""Distribution-comparison operators over cogrouped samples.

The cogroup → applyInPandas surface (SURVEY §2.2 UDF row, generalized):
two DataFrames co-partitioned on a key, each group pair handed to a
pandas function as two local frames. This is the API for per-key
algorithms that need BOTH sides materialized and sorted — beyond what a
join expresses row-wise.

Scale contract: one co-partitioned shuffle of each side on the group key;
per-group work is done in Arrow batches worker-side. A group's two
samples must fit in a worker's memory — pick the grouping key so they do
(here: a bounded hash bucket). When a group can grow unboundedly, use the
equivalent window-SQL formulation instead (fully distributed — it is this
operator's oracle, tests/parity prove the two agree).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def ks_distance_cogrouped(
    a: DataFrame, b: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per group.

    For each group key present on BOTH sides: sorts each sample, evaluates
    both empirical CDFs at every observed point (ties counted as peers —
    ``searchsorted side='right'``, matching SQL RANGE frames), and returns
    the max absolute CDF gap as ``ks_raw`` (UNROUNDED — integer-count
    divisions are IEEE-exact, so the caller's Spark-side ``F.round`` is
    the only rounding, per the repo's cross-engine rule: never round in
    pandas/numpy).

    The right side's value column is renamed before the cogroup: when both
    inputs derive from the same source with identical column names, Spark's
    column pruning drops the duplicate-named attribute from the right
    frame (observed: right pandas frame arrives with only the key column).
    """
    out_cols = [group_col, "n_a", "n_b", "ks_raw"]
    b = b.withColumnRenamed(value_col, "__value_b")

    def ks(key: tuple, pa: pd.DataFrame, pb: pd.DataFrame) -> pd.DataFrame:
        if len(pa) == 0 or len(pb) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        xa = np.sort(pa[value_col].to_numpy(dtype=np.float64))
        xb = np.sort(pb["__value_b"].to_numpy(dtype=np.float64))
        xs = np.concatenate([xa, xb])
        fa = np.searchsorted(xa, xs, side="right") / len(xa)
        fb = np.searchsorted(xb, xs, side="right") / len(xb)
        gap = float(np.max(np.abs(fa - fb)))
        return pd.DataFrame(
            {group_col: [key[0]], "n_a": [len(xa)], "n_b": [len(xb)], "ks_raw": [gap]}
        )

    # Derive the group column's type from the input schema — hardcoding
    # 'long' would Arrow-mismatch for string/int32 group keys.
    gtype = a.schema[group_col].dataType.simpleString()
    schema = f"{group_col} {gtype}, n_a long, n_b long, ks_raw double"
    return (
        a.groupBy(group_col)
        .cogroup(b.groupBy(group_col))
        .applyInPandas(ks, schema)
    )
