"""Join operators beyond the plain equi-join (SURVEY.md §2.2 join matrix).

Plain inner/outer/semi/anti joins are ``df.join(...)`` — AQE picks
broadcast/SMJ/SHJ at runtime.  This module adds the composite patterns:
as-of joins (Spark has no native ASOF) and helpers that make the intended
physical strategy explicit (broadcast for dims).

Scale notes: the as-of join is implemented with the union+window trick —
ONE shuffle on the join key, no range-explosion, no per-row lookups.  The
naive alternative (range join + row_number) produces |left|×|matching
right| intermediate rows; the union trick stays linear in |left|+|right|,
which is the difference between working and not working at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    strict: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: each left row gets the latest right row with
    ``right_ts <= left_ts`` (``<`` when strict) matching the equi-keys.
    Left rows with no prior right row get NULLs (left-join semantics).

    Implementation: union both sides aligned by name, sort within each key
    partition by (ts, side-order), and carry the most recent right payload
    forward with ``last(ignorenulls=True)`` — a single shuffle on ``on``.

    Equivalent to DuckDB's ``ASOF LEFT JOIN`` (the oracle uses that).
    """
    right_cols = right_cols or [c for c in right.columns if c not in on and c != right_ts]
    payload = F.struct(*[F.col(c) for c in right_cols], F.col(right_ts).alias(right_ts))

    # At equal ts, right rows sort BEFORE left rows for <= semantics
    # (side 0 < 1); AFTER for strict < (side 2 > 1).
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(2 if strict else 0).alias("__side"),
        payload.alias("__payload"),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [
        F.col("__match")[c].alias(f"{c}{suffix}" if c in left.columns else c)
        for c in right_cols
    ]
    out_cols.append(F.col("__match")[right_ts].alias(f"{right_ts}{suffix}"))
    return matched.filter(F.col("__side") == 1).select(*out_cols)


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Equi-join with an explicit broadcast hint on the dimension side —
    no shuffle of the fact table, the property that survives 100× scale."""
    return fact.join(F.broadcast(dim), on, how)
