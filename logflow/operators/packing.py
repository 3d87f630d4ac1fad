"""Training-shard packing: assign documents to fixed token-budget shards.

The last step of a training-data pipeline: order the corpus
deterministically, accumulate token counts, and cut a new shard every
``budget`` tokens.  The core primitive is a GLOBAL cumulative sum — the
naive form (`Window.orderBy(id)` with no partition key) collapses the
whole table into ONE task, which is exactly what dies at 100 TB.

Scalable form (two-phase, the textbook distributed prefix-sum):

1. split the key domain into range buckets whose edges are DETERMINISTIC
   constants (driver-collected approxQuantile of the leading key, inlined
   into the plan as literals — balanced-ish buckets, and crucially the
   SAME bucket id for a row on every traversal of the plan);
2. local running sum per bucket (window partitioned by the bucket id —
   parallel, no cross-bucket traffic);
3. per-bucket totals (tiny frame: one row per bucket) get their own
   running sum on the driver-scale side, then broadcast-join back as
   offsets.

The bucket id is a pure function of the row's key against literal edges.
An earlier form used ``repartitionByRange`` + ``spark_partition_id()``;
that partition id is NOT stable across the two traversals of the subtree
(offsets branch vs. main branch): AQE may coalesce the identical shuffle
differently per traversal, mis-keying the offset join and silently
dropping/duplicating rows (observed at sf0.1: the natural-order zonemap
branch lost ~half its rows, varying run to run).  Literal quantile edges
make the bucket assignment plan-independent.

Total extra work beyond the sort itself: one approxQuantile pass over the
leading key + one row per bucket shuffled.  Bucket count defaults to
``spark.sql.shuffle.partitions`` so per-bucket task size tracks cluster
sizing at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _leading_numeric(df: DataFrame, key: str) -> Column:
    """A numeric expression order-consistent with ``key`` (timestamps →
    epoch micros; numerics pass through)."""
    dt = df.schema[key].dataType
    if isinstance(dt, T.TimestampNTZType):
        # unix_micros rejects NTZ; timestampdiff from the NTZ epoch is the
        # exact monotone micros mapping with no timezone involved.
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {key})"
        )
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(key))
    if isinstance(dt, T.DateType):
        return F.unix_date(F.col(key))
    return F.col(key)


def range_bucket_ids(
    df: DataFrame,
    keys: list[str],
    out_col: str = "__pid",
    n_buckets: int | None = None,
    edges: list[float] | None = None,
) -> DataFrame:
    """Attach a deterministic range-bucket id: ``out_col`` is monotone
    nondecreasing in the lexicographic ``keys`` order, with edges taken
    from a driver-side approxQuantile of the leading key (inlined literal
    constants — identical on every traversal of the resulting plan).

    Rows sharing the leading-key value always share a bucket, so a
    per-bucket ``ORDER BY keys`` window concatenated in bucket order is a
    true global sort.
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    lead = _leading_numeric(df, keys[0])
    if edges is None:
        # callers ordering the SAME frame several ways can precompute all
        # edge lists in ONE multi-column approxQuantile pass (see
        # quantile_probes) and pass them in — one driver action instead
        # of one per ordering
        probes = quantile_probes(n_buckets)
        edges = df.select(lead.alias("__lead")).stat.approxQuantile(
            "__lead", probes, 0.001
        )
    uniq: list[float] = []
    for e in edges:
        if not uniq or e > uniq[-1]:
            uniq.append(e)
    pid = F.lit(0)
    for e in uniq:
        pid = pid + F.when(lead > F.lit(e), 1).otherwise(0)
    return df.withColumn(out_col, pid.cast("int"))


def quantile_probes(n_buckets: int) -> list[float]:
    """The probe fractions :func:`range_bucket_ids` uses for ``n_buckets``
    — exposed so callers can run ONE multi-column ``approxQuantile`` for
    several orderings of the same frame and pass each column's edges back
    via the ``edges`` parameter."""
    return [i / n_buckets for i in range(1, n_buckets)]


def default_bucket_count(spark) -> int:
    """The bucket count :func:`range_bucket_ids` defaults to."""
    return int(spark.conf.get("spark.sql.shuffle.partitions", "32"))


def _offset_join(bucketed: DataFrame, value_col: Column) -> DataFrame:
    """Broadcast per-bucket prefix totals back onto the bucketed frame.

    ``bucketed`` must carry ``__pid``; ``value_col`` is the quantity whose
    per-bucket totals are prefix-summed.  Adds ``__offset`` (sum of prior
    buckets' totals) and ``__grand`` (the global total) to every row.
    """
    out = _offset_join_multi(bucketed, [value_col])
    return out.withColumnRenamed("__offset0", "__offset").withColumnRenamed(
        "__grand0", "__grand"
    )


def _offset_join_multi(bucketed: DataFrame, value_cols: list[Column]) -> DataFrame:
    """:func:`_offset_join` for several quantities in ONE bucket-totals
    pass: adds ``__offset{i}`` / ``__grand{i}`` per value column.  One
    groupBy + one broadcast regardless of how many running sums ride the
    same ordering (a second single-column call would pay a second
    traversal of the bucketed subtree)."""
    totals_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    all_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # One row per bucket; the single-task windows here are bounded by the
    # bucket count, not the data.
    offsets = (
        bucketed.groupBy("__pid")
        .agg(*[F.sum(v).alias(f"__ptotal{i}") for i, v in enumerate(value_cols)])
        .select(
            "__pid",
            *[
                (F.sum(f"__ptotal{i}").over(totals_w) - F.col(f"__ptotal{i}")).alias(
                    f"__offset{i}"
                )
                for i in range(len(value_cols))
            ],
            *[
                F.sum(f"__ptotal{i}").over(all_w).cast("long").alias(f"__grand{i}")
                for i in range(len(value_cols))
            ],
        )
    )
    return bucketed.join(F.broadcast(offsets), "__pid")


def global_running_sum(
    df: DataFrame, order_col: str, value_col: str, out_col: str = "running"
) -> DataFrame:
    """Cumulative sum of ``value_col`` in ``order_col`` order, inclusive of
    the current row — distributed via deterministic range buckets + offset
    join."""
    return global_running_sums(df, order_col, [value_col], [out_col])


def global_running_sums(
    df: DataFrame, order_col: str, value_cols: list[str], out_cols: list[str]
) -> DataFrame:
    """Several cumulative sums sharing one ``order_col`` ordering, in ONE
    range-bucket pass (one quantile probe, one per-bucket window, one
    broadcast offset join — a per-column loop would multiply all three)."""
    bucketed = range_bucket_ids(df, [order_col])
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed
    for i, v in enumerate(value_cols):
        local = local.withColumn(f"__local{i}", F.sum(v).over(local_w))
    out = _offset_join_multi(local, [F.col(v) for v in value_cols])
    for i, oc in enumerate(out_cols):
        out = out.withColumn(
            oc, (F.col(f"__local{i}") + F.col(f"__offset{i}")).cast("long")
        )
    return out.drop(
        "__pid",
        *[f"__local{i}" for i in range(len(value_cols))],
        *[f"__offset{i}" for i in range(len(value_cols))],
        *[f"__grand{i}" for i in range(len(value_cols))],
    )


def global_row_number(
    df: DataFrame,
    keys: list[str],
    out_col: str = "rn",
    total_col: str | None = None,
    edges: list[float] | None = None,
) -> DataFrame:
    """Global 1-indexed ``row_number()`` under ``ORDER BY keys`` without a
    single-partition sort — deterministic range buckets on the leading
    key, per-bucket ``row_number``, broadcast prefix-count offsets.

    ``keys`` must be a unique composite (ties would make the total order,
    and hence the positions, ill-defined).  When ``total_col`` is given the
    output also carries the table's total row count on every row (derived
    from the same per-bucket totals frame — no extra pass or 1-row
    crossJoin needed by callers that, e.g., turn positions into ntile
    buckets).
    """
    bucketed = range_bucket_ids(df, keys, edges=edges)
    local_w = Window.partitionBy("__pid").orderBy(*keys)
    local = bucketed.withColumn("__local", F.row_number().over(local_w))
    out = (
        _offset_join(local, F.lit(1))
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local", "__offset")
    )
    if total_col is not None:
        out = out.withColumnRenamed("__grand", total_col)
    else:
        out = out.drop("__grand")
    return out


def global_ntile(
    df: DataFrame,
    keys: list[str],
    n_tiles: int,
    out_col: str = "tile",
    edges: list[float] | None = None,
) -> DataFrame:
    """Exact ``ntile(n_tiles) OVER (ORDER BY keys)`` without a
    single-partition sort: global positions from :func:`global_row_number`
    plus the closed-form ntile bucket formula (with q = n DIV t and
    r = n % t, the first r buckets hold q+1 rows — SQL-standard, matching
    Spark and DuckDB ntile exactly).  ``keys`` must be a unique composite.
    """
    n = int(n_tiles)
    g = global_row_number(df, keys, out_col="__rn", total_col="__n", edges=edges)
    # CASE branches evaluate lazily, so the q=0 division is never reached
    # (p < r implies the first branch when q == 0).
    bucket = F.expr(
        f"CASE WHEN (__rn - 1) < (__n % {n}) * (__n DIV {n} + 1) "
        f"THEN (__rn - 1) DIV (__n DIV {n} + 1) "
        f"ELSE (__n % {n}) + ((__rn - 1) - (__n % {n}) * (__n DIV {n} + 1)) DIV (__n DIV {n}) "
        f"END + 1"
    )
    return g.withColumn(out_col, bucket.cast("int")).drop("__rn", "__n")


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
