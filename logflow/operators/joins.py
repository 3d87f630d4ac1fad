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

import os

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

    # __payload as the final sort key makes right-side ties at equal ts
    # deterministic (struct comparison, field order = right_cols + right_ts);
    # without it the winner among equal-ts right rows is partition-order-
    # dependent.  Requires orderable payload columns (no maps) — true for
    # every engine use; callers with map payloads should pre-serialize.
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__payload")
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


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Nearest as-of join: each left row gets the right row minimizing
    ``|right_ts - left_ts|`` over the equi-keys; ties between the latest
    prior (``right_ts <= left_ts``) and earliest later (``>``) candidate
    go to the PRIOR row.  Left rows with no right rows at all get NULLs.

    Same union+window machinery as :func:`asof_join` — ONE shuffle on
    ``on``, both directions resolved in a single sorted pass (a backward
    frame carrying the latest prior payload and a forward frame carrying
    the earliest later payload), no range explosion.  Deterministic at
    equal timestamps: prior winner = max payload struct, later winner =
    min payload struct (mirror the ordering in any SQL oracle).
    """
    right_cols = right_cols or [c for c in right.columns if c not in on and c != right_ts]
    payload = F.struct(*[F.col(c) for c in right_cols], F.col(right_ts).alias(right_ts))
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    # Right rows at equal ts sort BEFORE left rows (side 0 < 1): the
    # backward frame sees them (<= semantics) and the forward frame,
    # which starts at the current row, does not (> semantics).
    order = ["__ts", "__side", "__payload"]
    wb = (
        Window.partitionBy(*on)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = (
        merged.withColumn("__prev", F.last("__payload", ignorenulls=True).over(wb))
        .withColumn("__next", F.first("__payload", ignorenulls=True).over(wf))
        .withColumn("__pts", F.col("__prev")[right_ts])
        .withColumn("__nts", F.col("__next")[right_ts])
    )
    # exact micros (timestamps are NTZ and carry sub-second parts; a
    # cast-to-long would truncate to seconds)
    gap_prev = F.expr("timestampdiff(MICROSECOND, __pts, __ts)")
    gap_next = F.expr("timestampdiff(MICROSECOND, __ts, __nts)")
    pick_prev = F.col("__next").isNull() | (
        F.col("__prev").isNotNull() & (gap_prev <= gap_next)
    )
    matched = matched.withColumn(
        "__match", F.when(pick_prev, F.col("__prev")).otherwise(F.col("__next"))
    )
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


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to heavy key skew: the skewed (probe) side gets a
    uniform random-ish salt derived from a hash of its whole row, the other
    (build) side is replicated ``salt`` ways, and the join runs on
    ``on + [salt]`` — a hot key's rows spread over ``salt`` reducers instead
    of landing on one straggler task.

    The salt is `pmod(hash(all probe columns), salt)` rather than `rand()`
    so the operator stays deterministic under task retries (a retried task
    re-salts identically — no lost/duplicated matches under speculative
    execution).  Cost: build side bytes ×``salt`` through the shuffle, so
    use for genuinely skewed probe⋈moderate build, not fact⋈fact.

    AQE's skew-split (`spark.sql.adaptive.skewJoin`) handles most skew at
    runtime; this explicit form covers the cases AQE can't see — skew
    materializing only after a preceding stage, or single-key hotspots
    beyond the split factor.
    """
    sk = skewed.withColumn("__salt", F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(salt)))
    rep = other.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return sk.join(rep, on + ["__salt"], how).drop("__salt")


def range_band_join(
    fact: DataFrame,
    bands: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
    bin_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Range (theta) join of ``fact.value`` into ``[lo, hi)`` bands,
    executed as a codegen'd broadcast HASH join instead of a
    BroadcastNestedLoopJoin.

    The standard range-join binning rewrite: pick a bin width (default =
    the narrowest band, computed driver-side from the small band table),
    explode each band into every integer bin it overlaps, equi-join on
    ``floor(value / width)``, and re-check the exact ``lo <= value < hi``
    residual.  A BNLJ evaluates every band predicate against every fact
    row with no codegen'd key (O(|fact|·|bands|) predicate evaluations);
    the binned form is a hash probe per row — the same plan shape an
    equi-join gets, so it holds at 100 TB and at thousands of bands.
    Bands must be small (broadcast side); overlapping bands are fine
    (a fact row matches each band whose range contains it).
    """
    rows = bands.select(lo, hi).collect()  # band table is dim-sized by contract
    if not rows:
        return fact.join(F.broadcast(bands), F.lit(False), how)
    if bin_width is not None:  # `or` would silently discard an explicit 0.0
        if bin_width <= 0:
            raise ValueError(f"bin_width must be positive, got {bin_width}")
        width = bin_width
    else:
        positive = [r[hi] - r[lo] for r in rows if r[hi] > r[lo]]
        # all-degenerate bands (hi <= lo) match nothing — don't crash on
        # min([]); the degenerate rows are filtered below
        width = min(positive) if positive else 1.0
    # degenerate bands can never satisfy lo <= v < hi, and an INVERTED
    # band (hi < lo) would make F.sequence DESCEND (one fabricated bin
    # per unit of the gap — the sequence trap documented in
    # operators/multimodal.py): drop them before the explode
    bands = bands.filter(F.col(hi) > F.col(lo))
    binned = bands.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(width)).cast("long"),
                # hi is exclusive: a band ending exactly on a bin edge does
                # not reach into the next bin, hence ceil(hi/w) - 1.
                (F.ceil(F.col(hi) / F.lit(width)) - F.lit(1)).cast("long"),
            )
        ),
    )
    probe = fact.withColumn("__bin", F.floor(F.col(value) / F.lit(width)).cast("long"))
    out = probe.join(
        F.broadcast(binned),
        (probe["__bin"] == binned["__bin"])
        & (F.col(value) >= F.col(lo))
        & (F.col(value) < F.col(hi)),
        how,
    )
    return out.drop("__bin")


def bucketed_join(
    spark,
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    buckets: int = 8,
    table_prefix: str = "logflow_bucketed",
    how: str = "inner",
) -> DataFrame:
    """Shuffle-free co-located join via bucketed tables.

    Writes both sides as bucketed+sorted managed tables on the join keys,
    then joins the bucketed reads: Spark's scan reports the bucketing as
    the output partitioning, so the sort-merge join needs NO Exchange on
    either side (asserted in tests/test_relational.py).

    This is the 100 TB pattern for a fact⋈fact join repeated across many
    queries: pay the shuffle once at ingest (the bucketed write), amortize
    it over every subsequent join/aggregation on the same key.  The bucket
    count is fixed at write time — size it to the target table (~128 MB per
    bucket-file per partition); both sides must use the same count for
    co-location.
    """
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    names = []
    for side, df in (("l", left), ("r", right)):
        tbl = f"{table_prefix}_{side}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        # The in-memory catalog forgets tables across sessions but leaves
        # their files; a stale location fails the next managed-table write.
        if warehouse.scheme in ("", "file"):
            shutil.rmtree(os.path.join(warehouse.path, tbl), ignore_errors=True)
        (
            # Repartition on the bucket keys first: every write task then
            # holds whole buckets, so each bucket is ONE file instead of
            # one-per-input-task (32 tasks x 8 buckets = 256 small files
            # otherwise). This shuffle IS the pay-once-at-ingest cost the
            # pattern amortizes.
            df.repartition(buckets, *[F.col(c) for c in on])
            .write.mode("overwrite")
            .bucketBy(buckets, *on)
            .sortBy(*on)
            .saveAsTable(tbl)
        )
        names.append(tbl)
    # The merge hint keeps the planner on sort-merge: a broadcast pick would
    # ignore the bucketing ("Bucketed: false (disabled by query planner)")
    # and the whole point here is the Exchange-free co-located SMJ.
    return spark.table(names[0]).hint("merge").join(spark.table(names[1]), on, how)
