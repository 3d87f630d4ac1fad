"""Pipeline-operations diagnostics: key-skew profile, join-cardinality guard.

Operating a 100 TB pipeline means never launching a shuffle blind. These
two queries are the pre-flight checks a job submits BEFORE the expensive
stage, each costing one partial-agg'd count per side — orders of
magnitude cheaper than the blown join or straggler stage they prevent:

* ``diag_key_skew`` — per-key count profile of a prospective shuffle key
  (top hot keys, their share of all rows, how many keys exceed 2× the
  mean). Output drives the mitigation choice: skew under ~2× → plain
  shuffle; a few hot keys → salting (join_salted_skew); one mega-key →
  isolate-and-broadcast.
* ``diag_join_cardinality`` — EXACT join fan-out prediction from the two
  sides' per-key counts: |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k), computed by
  joining the two (small) count tables. Catches the classic
  many-to-many explosion before it runs; also reports the single worst
  key's contribution.

All outputs are exact integers or exact-sum ratios — no sampling, no
sketches — because the count tables are tiny relative to the data (one
row per distinct key after map-side combine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logflow.operators.cache import track
from logflow.queries import register
from logflow.sources.tables import load_table


@register(
    "diag_key_skew",
    """
WITH counts AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS total_rows,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt
  FROM counts
),
hot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hot_keys
  FROM counts CROSS JOIN base
  WHERE cnt * n_keys > 2 * total_rows
),
stats AS (SELECT * FROM base CROSS JOIN hot),
ranked AS (
  SELECT o_custkey, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, o_custkey) AS BIGINT) AS rnk
  FROM counts
)
SELECT r.rnk, r.o_custkey, r.cnt,
       ROUND(CAST(r.cnt AS DOUBLE) / s.total_rows, 6) AS share,
       s.n_keys, s.total_rows, s.max_cnt, s.n_hot_keys
FROM ranked r CROSS JOIN stats s
WHERE r.rnk <= 5
""",
    doc="Shuffle-key pre-flight: per-key counts of orders.o_custkey, the "
    "top-5 hot keys with their row share, and how many keys exceed 2x "
    "the mean (cnt·n_keys > 2·total, kept in integers so the hot-key "
    "test needs no float threshold). One partial-agg'd count shuffle — "
    "the cost of knowing whether the NEXT shuffle needs salting. "
    "Top-5 via TakeOrdered-style selection with key tiebreak.",
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    base = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    hot = (
        counts.crossJoin(F.broadcast(base))
        .filter(F.col("cnt") * F.col("n_keys") > 2 * F.col("total_rows"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_hot_keys"))
    )
    stats = base.crossJoin(F.broadcast(hot))
    w = Window.orderBy(F.desc("cnt"), "o_custkey")
    ranked = (
        counts.orderBy(F.desc("cnt"), "o_custkey")
        .limit(5)
        .select("o_custkey", "cnt", F.row_number().over(w).cast("long").alias("rnk"))
    )
    return ranked.crossJoin(F.broadcast(stats)).select(
        "rnk",
        "o_custkey",
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("total_rows"), 6).alias("share"),
        "n_keys",
        "total_rows",
        "max_cnt",
        "n_hot_keys",
    )


@register(
    "diag_join_cardinality",
    """
WITH lc AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS lcnt
            FROM lineitem GROUP BY l_orderkey),
oc AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS ocnt
       FROM orders GROUP BY o_orderkey)
SELECT CAST(COUNT(lcnt) AS BIGINT) AS n_keys_left,
       CAST(COUNT(ocnt) AS BIGINT) AS n_keys_right,
       CAST(COUNT(CASE WHEN lcnt IS NOT NULL AND ocnt IS NOT NULL THEN 1 END)
            AS BIGINT) AS n_common_keys,
       CAST(COALESCE(SUM(lcnt * ocnt), 0) AS BIGINT) AS est_output_rows,
       CAST(COALESCE(MAX(lcnt * ocnt), 0) AS BIGINT) AS max_key_contrib
FROM lc FULL OUTER JOIN oc USING (k)
""",
    doc="Join fan-out guard for lineitem⋈orders on the order key: EXACT "
    "predicted output size Σ cnt_L(k)·cnt_R(k) from the two per-key "
    "count tables (each one partial-agg'd count, tiny vs the fact "
    "data), plus the worst single key's contribution. Run before a "
    "many-to-many join to catch row explosion at plan time instead of "
    "at 3am; all-BIGINT output, no estimation error to argue about.",
)
def diag_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    lc = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("lcnt")
    )
    oc = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("ocnt")
    )
    # ONE full-outer join + ONE aggregate yields all five metrics — the
    # separate per-side key counts would re-scan each fact table twice
    # (measured 2x the per-query floor).
    contrib = F.col("lcnt") * F.col("ocnt")
    return lc.join(oc, "k", "full_outer").agg(
        F.count("lcnt").cast("long").alias("n_keys_left"),
        F.count("ocnt").cast("long").alias("n_keys_right"),
        F.count(F.when(F.col("lcnt").isNotNull() & F.col("ocnt").isNotNull(), 1))
        .cast("long")
        .alias("n_common_keys"),
        F.coalesce(F.sum(contrib), F.lit(0)).cast("long").alias("est_output_rows"),
        F.coalesce(F.max(contrib), F.lit(0)).cast("long").alias("max_key_contrib"),
    )


_PSI_SQL = """
WITH binned AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END AS period,
         CAST(least(9, greatest(0, CAST(floor(value / 50) AS BIGINT))) AS BIGINT) AS bin
  FROM events
),
grid AS (
  SELECT DISTINCT b.event_type, g.bin
  FROM binned b, (SELECT unnest(range(0, 10)) AS bin) g
),
cnts AS (
  SELECT g.event_type, g.bin,
         CAST(1 + COALESCE(a.c, 0) AS BIGINT) AS ca,
         CAST(1 + COALESCE(b.c, 0) AS BIGINT) AS cb
  FROM grid g
  LEFT JOIN (SELECT event_type, bin, COUNT(*) AS c FROM binned WHERE period = 0
             GROUP BY event_type, bin) a USING (event_type, bin)
  LEFT JOIN (SELECT event_type, bin, COUNT(*) AS c FROM binned WHERE period = 1
             GROUP BY event_type, bin) b USING (event_type, bin)
),
tot AS (
  SELECT event_type,
         CAST(SUM(ca) AS BIGINT) AS ta, CAST(SUM(cb) AS BIGINT) AS tb
  FROM cnts GROUP BY event_type
)
SELECT c.event_type,
       CAST(ROUND(SUM(CAST(ROUND(
           (CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)
           * ln((CAST(ca AS DOUBLE) / ta) / (CAST(cb AS DOUBLE) / tb)),
         6) AS DECIMAL(18,6))), 4) AS DOUBLE) AS psi,
       CAST(MIN(ta) AS BIGINT) AS n_a, CAST(MIN(tb) AS BIGINT) AS n_b
FROM cnts c JOIN tot t ON c.event_type = t.event_type
GROUP BY c.event_type
"""


@register(
    "diag_psi_value_drift",
    _PSI_SQL,
    doc="Population Stability Index between the first and second half of "
    "the event stream, per event type: value distribution over 10 fixed "
    "bins (width 50, clamped), Laplace +1 smoothing so empty bins "
    "contribute finite mass, PSI = Σ (pa−pb)·ln(pa/pb). The ML-ops "
    "drift gate: PSI < 0.1 stable, > 0.25 retrain/alert. Cross-engine: "
    "per-bin contributions rounded to 6dp then summed as exact "
    "DECIMAL(18,6) (order-independent), the same ln-determinism recipe "
    "as bm25_search. Plan: one scan of events, two partial-agg'd "
    "counts, a 50-row bin grid join — entirely dimension-sized after "
    "the first aggregation, so the pattern costs one fact pass at any "
    "scale.",
)
def diag_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    binned = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), 0)
        .otherwise(1)
        .alias("period"),
        F.least(
            F.lit(9), F.greatest(F.lit(0), F.floor(F.col("value") / 50).cast("long"))
        )
        .cast("long")
        .alias("bin"),
    )
    grid = (
        binned.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(spark.range(10).select(F.col("id").alias("bin"))))
    )
    a = (
        binned.filter(F.col("period") == 0)
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    b = (
        binned.filter(F.col("period") == 1)
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cnts = (
        grid.join(a.withColumnRenamed("c", "ca0"), ["event_type", "bin"], "left_outer")
        .join(b.withColumnRenamed("c", "cb0"), ["event_type", "bin"], "left_outer")
        .select(
            "event_type",
            "bin",
            (F.lit(1) + F.coalesce("ca0", F.lit(0))).cast("long").alias("ca"),
            (F.lit(1) + F.coalesce("cb0", F.lit(0))).cast("long").alias("cb"),
        )
    )
    tot = cnts.groupBy("event_type").agg(
        F.sum("ca").cast("long").alias("ta"), F.sum("cb").cast("long").alias("tb")
    )
    pa = F.col("ca").cast("double") / F.col("ta")
    pb = F.col("cb").cast("double") / F.col("tb")
    contrib = F.round((pa - pb) * F.log(pa / pb), 6).cast("decimal(18,6)")
    return (
        cnts.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.sum(contrib), 4).cast("double").alias("psi"),
            F.min("ta").cast("long").alias("n_a"),
            F.min("tb").cast("long").alias("n_b"),
        )
    )


@register(
    "diag_value_histogram",
    """
WITH b AS (
  SELECT LEAST(CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT), 19) AS bucket,
         o_totalprice
  FROM orders
)
SELECT bucket,
       CAST(bucket * 25000.0 AS DOUBLE) AS bucket_lo,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS bucket_total,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS share
FROM b
GROUP BY bucket
""",
    doc="Equi-width value histogram (20 × 25k buckets over order totals) — "
    "the distribution profile a planner or skew check reads before "
    "choosing partition bounds. Bucketing is FLOOR(x/width) on the "
    "IEEE-identical quotient then LEAST-capped (never width_bucket, "
    "whose boundary conventions differ across engines), so every row "
    "lands in the same bucket everywhere; totals are exact decimal. The "
    "share window runs over the 20-row result, not the fact table. At "
    "100 TB: pure map-side bucketing + one 20-group partial agg — the "
    "cheapest possible full-scan profile, no sampling bias.",
)
def diag_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("long"), F.lit(19).cast("long")
    )
    per_bucket = orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("tot"),
    )
    w_all = Window.partitionBy()
    return per_bucket.select(
        "bucket",
        (F.col("bucket") * F.lit(25000.0)).cast("double").alias("bucket_lo"),
        F.col("cnt").cast("long").alias("n_orders"),
        F.round("tot", 2).cast("double").alias("bucket_total"),
        F.round(
            F.col("cnt").cast("double") / F.sum("cnt").over(w_all).cast("double"), 6
        ).alias("share"),
    )


@register(
    "diag_column_profile",
    """
SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_orderkey) AS DOUBLE) AS min_val,
       CAST(MAX(o_orderkey) AS DOUBLE) AS max_val
FROM orders
UNION ALL
SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
       MIN(o_totalprice), MAX(o_totalprice)
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
       NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
       NULL, NULL
FROM orders
""",
    doc="ANALYZE-style column profile (row count, null count, EXACT "
    "distinct count, numeric min/max per column) — the statistics pass a "
    "planner or data-quality gate runs before choosing join strategies "
    "and partition bounds. Spark side is ONE aggregate over one scan "
    "(multiple exact COUNT(DISTINCT)s expand internally but share the "
    "scan) reshaped map-side into one row per column; the oracle's "
    "UNION-ALL form recomputes per column but produces identical exact "
    "values. At 100 TB: the expand multiplies rows by #distinct-agg "
    "columns pre-shuffle — the documented cost of EXACT ndv; the sketch "
    "alternative is agg_approx_distinct's HLL path.",
)
def diag_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    stats = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").alias("min_cust"),
        F.max("o_custkey").alias("max_cust"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.count("o_orderpriority").alias("nn_prio"),
        F.countDistinct("o_orderpriority").alias("nd_prio"),
    )
    dnull = F.lit(None).cast("double")
    row = lambda name, nn, nd, mn, mx: F.struct(  # noqa: E731
        F.lit(name).alias("col_name"),
        F.col("n").cast("long").alias("n_rows"),
        (F.col("n") - F.col(nn)).cast("long").alias("n_null"),
        F.col(nd).cast("long").alias("n_distinct"),
        (F.col(mn).cast("double") if mn else dnull).alias("min_val"),
        (F.col(mx).cast("double") if mx else dnull).alias("max_val"),
    )
    profile = F.array(
        row("o_orderkey", "nn_key", "nd_key", "min_key", "max_key"),
        row("o_custkey", "nn_cust", "nd_cust", "min_cust", "max_cust"),
        row("o_totalprice", "nn_price", "nd_price", "min_price", "max_price"),
        row("o_orderstatus", "nn_status", "nd_status", None, None),
        row("o_orderpriority", "nn_prio", "nd_prio", None, None),
    )
    return stats.select(F.explode(profile).alias("p")).select("p.*")


_CORR_SUMS_SQL = """
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(14,4))) AS DOUBLE) AS sq,
         CAST(SUM(CAST(ROUND(l_extendedprice, 4) AS DECIMAL(14,4))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(ROUND(l_discount, 4) AS DECIMAL(14,4))) AS DOUBLE) AS sd,
         CAST(SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(20,4))
                * CAST(ROUND(l_quantity, 4) AS DECIMAL(20,4))) AS DOUBLE) AS sqq,
         CAST(SUM(CAST(ROUND(l_extendedprice, 4) AS DECIMAL(20,4))
                * CAST(ROUND(l_extendedprice, 4) AS DECIMAL(20,4))) AS DOUBLE) AS spp,
         CAST(SUM(CAST(ROUND(l_discount, 4) AS DECIMAL(20,4))
                * CAST(ROUND(l_discount, 4) AS DECIMAL(20,4))) AS DOUBLE) AS sdd,
         CAST(SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(20,4))
                * CAST(ROUND(l_extendedprice, 4) AS DECIMAL(20,4))) AS DOUBLE) AS sqp,
         CAST(SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(20,4))
                * CAST(ROUND(l_discount, 4) AS DECIMAL(20,4))) AS DOUBLE) AS sqd,
         CAST(SUM(CAST(ROUND(l_extendedprice, 4) AS DECIMAL(20,4))
                * CAST(ROUND(l_discount, 4) AS DECIMAL(20,4))) AS DOUBLE) AS spd
  FROM lineitem
"""


@register(
    "diag_correlation_matrix",
    f"""
WITH s AS ({_CORR_SUMS_SQL})
SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
       CAST(n AS BIGINT) AS n,
       ROUND((n * sqp - sq * sp)
             / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 6) AS pearson_r
FROM s
UNION ALL
SELECT 'l_quantity', 'l_discount', CAST(n AS BIGINT),
       ROUND((n * sqd - sq * sd)
             / sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd)), 6)
FROM s
UNION ALL
SELECT 'l_extendedprice', 'l_discount', CAST(n AS BIGINT),
       ROUND((n * spd - sp * sd)
             / sqrt((n * spp - sp * sp) * (n * sdd - sd * sd)), 6)
FROM s
""",
    doc="Pairwise Pearson correlation matrix over lineitem's numeric "
    "measures in ONE aggregate, one scan: all nine power sums are exact "
    "DECIMAL accumulations (values rounded to 4dp and cast BEFORE any "
    "product, so every sum is order-independent integer-scaled "
    "arithmetic), then each r is derived with an IDENTICAL double "
    "expression in both engines — identical inputs through the same IEEE "
    "op sequence give identical output, rounded once at the end. "
    "(Spark's built-in corr() is a streaming co-moment — numerically "
    "fine but merge-order-dependent in its low bits, so it cannot be "
    "hash-compared cross-engine; the power-sum form can.) The pytest "
    "cross-checks every r against a pandas recompute, so the values are "
    "semantically pinned, not just parity-pinned. At 100 TB this is one "
    "partial-agg'd map-side pass — the profile step before feature "
    "selection or drift monitoring.",
)
def diag_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)

    def d(c: str):
        return F.round(F.col(c), 4).cast("decimal(20,4)")

    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d("l_quantity")).cast("double").alias("sq"),
        F.sum(d("l_extendedprice")).cast("double").alias("sp"),
        F.sum(d("l_discount")).cast("double").alias("sd"),
        F.sum(d("l_quantity") * d("l_quantity")).cast("double").alias("sqq"),
        F.sum(d("l_extendedprice") * d("l_extendedprice")).cast("double").alias("spp"),
        F.sum(d("l_discount") * d("l_discount")).cast("double").alias("sdd"),
        F.sum(d("l_quantity") * d("l_extendedprice")).cast("double").alias("sqp"),
        F.sum(d("l_quantity") * d("l_discount")).cast("double").alias("sqd"),
        F.sum(d("l_extendedprice") * d("l_discount")).cast("double").alias("spd"),
    )

    def r(sxy: str, sx: str, sy: str, sxx: str, syy: str):
        n = F.col("n")
        return F.round(
            (n * F.col(sxy) - F.col(sx) * F.col(sy))
            / F.sqrt(
                (n * F.col(sxx) - F.col(sx) * F.col(sx))
                * (n * F.col(syy) - F.col(sy) * F.col(sy))
            ),
            6,
        )

    pairs = [
        ("l_quantity", "l_extendedprice", r("sqp", "sq", "sp", "sqq", "spp")),
        ("l_quantity", "l_discount", r("sqd", "sq", "sd", "sqq", "sdd")),
        ("l_extendedprice", "l_discount", r("spd", "sp", "sd", "spp", "sdd")),
    ]
    # one aggregate row exploded into the matrix rows — a unionAll of three
    # selects over `s` would re-derive (or at best ReusedExchange) the
    # aggregate per branch; this keeps it literally one scan, one agg.
    rows = F.array(
        *[
            F.struct(
                F.lit(cx).alias("col_x"),
                F.lit(cy).alias("col_y"),
                F.col("n").cast("long").alias("n"),
                expr.alias("pearson_r"),
            )
            for cx, cy, expr in pairs
        ]
    )
    return s.select(F.explode(rows).alias("m")).select("m.*")


@register(
    "diag_groupwise_ols",
    """
WITH d AS (
  SELECT event_type,
         CAST(date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00', ts)
              AS BIGINT) AS x,
         CAST(ROUND(value, 4) AS DECIMAL(20,4)) AS y,
         -- y scaled to an exact integer (y has scale 4, so *10000 has a
         -- zero fraction): y_int*y_int sums are exact integer arithmetic
         -- in BOTH engines, where SUM(y*y) on decimals rounds the product
         -- to scale 6 in Spark ((20,4)x(20,4) adjusts to DECIMAL(38,6))
         -- but stays scale 8 in DuckDB — divergent once y carries 3-4
         -- decimal digits.
         CAST(y * 10000 AS BIGINT) AS y_int
  FROM events
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(20,0)) * CAST(x AS DECIMAL(20,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y_int AS DECIMAL(20,0)) * CAST(y_int AS DECIMAL(20,0)))
              AS DOUBLE) / 100000000.0 AS syy,
         CAST(SUM(y * x) AS DOUBLE) AS sxy
  FROM d GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       ROUND(((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0))
             * 3600000000.0, 8) AS slope_per_hour,
       ROUND(sy / n - ((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0))
                      * (sx / n),
             6) AS intercept,
       ROUND(CASE WHEN n * syy - sy * sy = 0 THEN 1.0
                  ELSE ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                       / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0) END,
             6) AS r2
FROM s
""",
    doc="Group-wise OLS: closed-form slope/intercept/R² of value-vs-time "
    "per event type in ONE aggregate, one scan — the per-segment trend "
    "fit behind drift dashboards and burn-rate alerts. Same determinism "
    "recipe as diag_correlation_matrix: x is an exact integer "
    "MICROSECOND offset from an NTZ epoch (hour units diverge cross-"
    "engine for pre-epoch timestamps; micros probed identical), y "
    "rounds to DECIMAL(20,4) pre-product, every power sum is exact "
    "integer-scaled arithmetic (order-independent), and the closed-form "
    "expressions run the IDENTICAL IEEE op sequence in both engines on "
    "those identical sums; the slope rescales to per-hour at output. "
    "Degenerate groups: zero y-variance pins R²=1; zero x-variance "
    "NULLIFs every affected ratio in BOTH engines (unguarded double "
    "division is DIVIDE_BY_ZERO under Spark ANSI but NULL in DuckDB). "
    "At 100 TB: one partial-agg'd map-side pass — per-key model fitting "
    "without ML infrastructure (the distributed closed-form normal "
    "equation).",
)
def diag_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # x in exact integer MICROSECONDS from an NTZ epoch literal: the HOUR
    # unit diverges cross-engine for pre-epoch timestamps (Spark
    # timestampdiff truncates toward zero, DuckDB date_diff counts hour
    # boundaries — probed: 0 vs -1 for 23:30 the day before), and a plain
    # TIMESTAMP literal against the NTZ column would coerce through the
    # vanilla driver session's timezone. Micros are boundary-free.
    x = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts) "
        "AS BIGINT)"
    )
    y = F.round(F.col("value"), 4).cast("decimal(20,4)")
    # y_int: y scaled to an exact BIGINT (scale-4 decimal * 10000 has a
    # zero fraction, so the cast is exact in both engines). syy sums
    # y_int*y_int in DECIMAL(20,0) products — exact integer arithmetic —
    # because SUM(y*y) on scale-4 decimals rounds the product to scale 6
    # in Spark ((20,4)x(20,4) adjusts to DECIMAL(38,6)) while DuckDB
    # keeps scale 8 exact, diverging once y carries 3-4 decimal digits.
    d = ev.select(
        "event_type",
        x.alias("x"),
        y.alias("y"),
        (y * F.lit(10000)).cast("bigint").alias("y_int"),
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(20,0)") * F.col("x").cast("decimal(20,0)"))
        .cast("double")
        .alias("sxx"),
        (
            F.sum(
                F.col("y_int").cast("decimal(20,0)") * F.col("y_int").cast("decimal(20,0)")
            ).cast("double")
            / F.lit(100000000.0)
        ).alias("syy"),
        F.sum(F.col("y") * F.col("x")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # NULLIF guards every variance denominator: a zero-x-variance group
    # (e.g. a singleton event type after regeneration) must yield NULL in
    # BOTH engines — an unguarded double division throws DIVIDE_BY_ZERO
    # under Spark's default ANSI mode where DuckDB returns NULL.
    slope_us = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    r2 = F.when(n * syy - sy * sy == 0, F.lit(1.0)).otherwise(
        ((n * sxy - sx * sy) * (n * sxy - sx * sy))
        / F.nullif((n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0))
    )
    return s.select(
        "event_type",
        n.cast("long").alias("n"),
        F.round(slope_us * F.lit(3600000000.0), 8).alias("slope_per_hour"),
        F.round(sy / n - slope_us * (sx / n), 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


@register(
    "dq_constraint_audit",
    """
WITH o AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_custkey,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS nonpositive_price,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_orderkeys
  FROM orders
),
l AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
         CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS nonpositive_qty,
         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS bad_discount
  FROM lineitem
),
orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS orphan_lineitems
  FROM lineitem li LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NULL
),
cust AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS orphan_orders
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
)
SELECT 'orders' AS tbl, 'row_count' AS rule, n_orders AS violations, TRUE AS informational FROM o
UNION ALL SELECT 'orders', 'null_custkey', null_custkey, FALSE FROM o
UNION ALL SELECT 'orders', 'nonpositive_totalprice', nonpositive_price, FALSE FROM o
UNION ALL SELECT 'orders', 'duplicate_orderkeys', dup_orderkeys, FALSE FROM o
UNION ALL SELECT 'orders', 'orphan_custkey_fk', orphan_orders, FALSE FROM cust
UNION ALL SELECT 'lineitem', 'row_count', n_lineitems, TRUE FROM l
UNION ALL SELECT 'lineitem', 'nonpositive_quantity', nonpositive_qty, FALSE FROM l
UNION ALL SELECT 'lineitem', 'discount_out_of_range', bad_discount, FALSE FROM l
UNION ALL SELECT 'lineitem', 'orphan_orderkey_fk', orphan_lineitems, FALSE FROM orphans
""",
    doc="Data-contract audit (the dbt-test / expectations suite as one "
    "query): per-table null checks, range checks, primary-key "
    "uniqueness, and both foreign-key orphan directions "
    "(lineitem→orders, orders→customer), emitted as a (table, rule, "
    "violations) report where non-informational rows must be 0 for the "
    "contract to hold (pytest enforces exactly that, plus that the "
    "informational row counts match the tables). All exact integer "
    "counts. Plan: one aggregate per table + two left-anti-shaped "
    "orphan joins on their natural keys; at 100 TB each rule rides an "
    "existing scan (Catalyst merges the counters into ONE aggregate "
    "per table) and the FK checks are the only shuffles — the audit "
    "costs less than the first wrong join it prevents.",
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    o = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_custkey"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("nonpositive_price"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("dup_orderkeys"),
    )
    l = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("nonpositive_qty"),
        F.sum(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0))
        .cast("long")
        .alias("bad_discount"),
    )
    orphan_li = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphan_lineitems"))
    )
    orphan_o = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphan_orders"))
    )

    def rows(src, items):
        arr = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    F.lit(r).alias("rule"),
                    F.col(c).alias("violations"),
                    F.lit(info).alias("informational"),
                )
                for t, r, c, info in items
            ]
        )
        return src.select(F.explode(arr).alias("m")).select("m.*")

    return (
        rows(
            o,
            [
                ("orders", "row_count", "n_orders", True),
                ("orders", "null_custkey", "null_custkey", False),
                ("orders", "nonpositive_totalprice", "nonpositive_price", False),
                ("orders", "duplicate_orderkeys", "dup_orderkeys", False),
            ],
        )
        .unionAll(rows(orphan_o, [("orders", "orphan_custkey_fk", "orphan_orders", False)]))
        .unionAll(
            rows(
                l,
                [
                    ("lineitem", "row_count", "n_lineitems", True),
                    ("lineitem", "nonpositive_quantity", "nonpositive_qty", False),
                    ("lineitem", "discount_out_of_range", "bad_discount", False),
                ],
            )
        )
        .unionAll(
            rows(orphan_li, [("lineitem", "orphan_orderkey_fk", "orphan_lineitems", False)])
        )
    )


@register(
    "diag_benford_first_digit",
    """
WITH d AS (
  SELECT substr(CAST(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2)) AS VARCHAR),
                1, 1) AS digit
  FROM lineitem WHERE l_extendedprice >= 1.0),
obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs)
SELECT CAST(digit AS BIGINT) AS digit,
       n,
       ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS obs_share,
       ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_share,
       ROUND(ABS(ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6)
                 - ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)), 6) AS abs_dev
FROM obs CROSS JOIN tot
ORDER BY digit
""",
    doc="Benford first-significant-digit audit over lineitem prices — the "
    "classic anomaly screen for fabricated or truncated numeric columns "
    "(a synthetic uniform price generator fails it; organic multi-"
    "magnitude data passes). The first digit is taken from the DECIMAL "
    "STRING rendering (ROUND-then-cast per the house double→decimal "
    "rule), never from floor(x/10^floor(log10 x)) float math — string "
    "extraction is exact in both engines. Expected shares are "
    "log10(1+1/d) rounded once at 6dp; observed shares are exact "
    "BIGINT/BIGINT divisions. One partial-agg shuffle over 9 digit "
    "groups + a 1-row broadcast total: at 100 TB this is a single "
    "map-side-combined pass over one column (column-pruned scan).",
)
def diag_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    d = li.filter(F.col("l_extendedprice") >= 1.0).select(
        F.substring(
            F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)").cast("string"),
            1,
            1,
        ).alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    obs_share = F.round(F.col("n").cast("double") / F.col("total").cast("double"), 6)
    benford = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6)
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("digit").cast("long").alias("digit"),
            "n",
            obs_share.alias("obs_share"),
            benford.alias("benford_share"),
            F.round(F.abs(obs_share - benford), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@register(
    "diag_entropy_profile",
    """
WITH h AS (
  SELECT event_type, hour(ts) AS hr, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, hour(ts)),
tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY event_type),
terms AS (
  SELECT h.event_type, tot.n,
         CAST(ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                    * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS term
  FROM h JOIN tot ON h.event_type = tot.event_type)
SELECT event_type,
       MAX(n) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(-SUM(term) AS DOUBLE) AS entropy_nats,
       ROUND(CAST(-SUM(term) AS DOUBLE) / ln(24.0), 6) AS norm_entropy
FROM terms
GROUP BY event_type
ORDER BY event_type
""",
    doc="Shannon entropy of each event type's hour-of-day activity "
    "profile, with the ln(24)-normalized [0,1] form — the diagnostic "
    "separating always-on machine traffic (entropy near 1) from "
    "business-hours human traffic. Each p·ln(p) term follows the ln "
    "recipe: the probability is an exact BIGINT/BIGINT quotient, ln of "
    "an identical double, one 6dp round, DECIMAL-summed exactly — no "
    "float-order exposure. At 100 TB: one map-side-combined count "
    "shuffle into at most |types|×24 cells; everything after is "
    "cell-table-sized.",
)
def diag_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    h = ev.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = h.groupBy("event_type").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    terms = h.join(tot, "event_type").select(
        "event_type",
        "n",
        F.round(p * F.log(p), 6).cast("decimal(18,6)").alias("term"),
    )
    ent = (-F.sum("term")).cast("double")
    return (
        terms.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            ent.alias("entropy_nats"),
            F.round(ent / F.log(F.lit(24.0)), 6).alias("norm_entropy"),
        )
        .orderBy("event_type")
    )


@register(
    "diag_chi2_independence",
    """
WITH o AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY event_type, isodow(ts)),
rt AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS row_tot FROM o GROUP BY event_type),
ct AS (SELECT dow, CAST(SUM(obs) AS BIGINT) AS col_tot FROM o GROUP BY dow),
g AS (SELECT CAST(SUM(obs) AS BIGINT) AS grand FROM o),
cells AS (
  SELECT o.event_type, o.dow, o.obs,
         CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(grand AS DOUBLE) AS e
  FROM o JOIN rt ON o.event_type = rt.event_type
         JOIN ct ON o.dow = ct.dow CROSS JOIN g),
terms AS (
  SELECT event_type, dow, obs, ROUND(e, 4) AS expected,
         CAST(ROUND((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e) / e, 6)
              AS DECIMAL(18,6)) AS term
  FROM cells)
SELECT event_type, dow, obs, expected,
       CAST(term AS DOUBLE) AS chi2_term,
       CAST(SUM(term) OVER () AS DOUBLE) AS chi2_total
FROM terms
ORDER BY event_type, dow
""",
    doc="Chi-square independence test between event type and ISO "
    "day-of-week (the drift screen for 'did the weekly traffic mix "
    "change'): expected cell counts from exact BIGINT marginals in one "
    "identical IEEE expression, per-cell (O-E)²/E rounded once at 6dp "
    "and DECIMAL-summed into the statistic — order-independent, so the "
    "windowed grand total is bit-stable. Spark's weekday(ts)+1 is "
    "pinned to DuckDB's isodow (Monday=1; dayofweek DIVERGES: Spark "
    "1=Sunday, DuckDB 0=Sunday — never use it cross-engine). At 100 "
    "TB: one count shuffle into |types|×7 cells; marginals and the "
    "window run on the cell table.",
)
def diag_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    o = ev.groupBy(
        "event_type", (F.expr("weekday(ts)") + 1).cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("event_type").agg(F.sum("obs").alias("row_tot"))
    ct = o.groupBy("dow").agg(F.sum("obs").alias("col_tot"))
    g = o.agg(F.sum("obs").alias("grand"))
    e = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("grand").cast("double")
    )
    cells = (
        o.join(rt, "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(g))
        .select("event_type", "dow", "obs", e.alias("e"))
    )
    diff = F.col("obs").cast("double") - F.col("e")
    terms = cells.select(
        "event_type",
        "dow",
        F.col("obs").cast("long").alias("obs"),
        F.round(F.col("e"), 4).alias("expected"),
        F.round(diff * diff / F.col("e"), 6).cast("decimal(18,6)").alias("term"),
    )
    w_all = Window.partitionBy()
    return (
        terms.select(
            "event_type",
            "dow",
            "obs",
            "expected",
            F.col("term").cast("double").alias("chi2_term"),
            F.sum("term").over(w_all).cast("double").alias("chi2_total"),
        )
        .orderBy("event_type", "dow")
    )


@register(
    "diag_iqr_outliers",
    """
WITH q AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         quantile_disc(value, 0.25) AS q1,
         quantile_disc(value, 0.75) AS q3
  FROM events GROUP BY event_type)
SELECT e.event_type, q.n,
       ROUND(q.q1, 4) AS q1, ROUND(q.q3, 4) AS q3,
       CAST(SUM(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM events e JOIN q ON e.event_type = q.event_type
GROUP BY e.event_type, q.n, q.q1, q.q3
ORDER BY e.event_type
""",
    doc="Tukey IQR-fence outlier screen per event type: DISCRETE (selected, "
    "never interpolated) quartiles — Spark side selects by row_number "
    "rank ceil(p·n) over (value, event_id), exactly DuckDB's "
    "quantile_disc element (probed across n=4..10) — so q1/q3 are "
    "existing data values, "
    "identical doubles in both engines, and the 1.5·IQR fences and "
    "outlier comparisons are bit-stable with zero float-summation "
    "exposure. At 100 TB: quartile selection is one sort-within-"
    "partition window per event_type (no global sort) + a rank filter; "
    "the recount pass broadcasts the 5-row fence table against the "
    "fact scan.",
)
def diag_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    cnt = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    sel = lambda p: F.ceil(F.lit(p) * F.col("n")).cast("int")  # noqa: E731
    q = (
        ranked.filter((F.col("rn") == sel(0.25)) | (F.col("rn") == sel(0.75)))
        .groupBy("event_type", "n")
        .agg(
            F.max(F.when(F.col("rn") == sel(0.25), F.col("value"))).alias("q1"),
            F.max(F.when(F.col("rn") == sel(0.75), F.col("value"))).alias("q3"),
        )
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "n", "q1", "q3")
        .agg(
            F.sum(F.when(F.col("value") < lo, 1).otherwise(0)).cast("long").alias("n_low"),
            F.sum(F.when(F.col("value") > hi, 1).otherwise(0)).cast("long").alias("n_high"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round("q1", 4).alias("q1"),
            F.round("q3", 4).alias("q3"),
            "n_low",
            "n_high",
        )
        .orderBy("event_type")
    )


@register(
    "diag_woe_binning",
    """
WITH b AS (
  SELECT o_orderkey, o_orderstatus,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
  FROM orders),
c AS (
  SELECT bin,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
         CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
  FROM b GROUP BY bin),
t AS (SELECT CAST(SUM(n_good) AS BIGINT) AS g_tot, CAST(SUM(n_bad) AS BIGINT) AS b_tot
      FROM c),
woe AS (
  SELECT bin, n_good, n_bad,
         CAST(ROUND(ln((CAST(n_good AS DOUBLE) / g_tot)
                       / (CAST(n_bad AS DOUBLE) / b_tot)), 6)
              AS DECIMAL(18,6)) AS woe,
         CAST(ROUND((CAST(n_good AS DOUBLE) / g_tot
                     - CAST(n_bad AS DOUBLE) / b_tot)
                    * ROUND(ln((CAST(n_good AS DOUBLE) / g_tot)
                               / (CAST(n_bad AS DOUBLE) / b_tot)), 6), 6)
              AS DECIMAL(18,6)) AS iv_term
  FROM c CROSS JOIN t)
SELECT CAST(bin AS BIGINT) AS bin, n_good, n_bad,
       CAST(woe AS DOUBLE) AS woe,
       CAST(SUM(iv_term) OVER () AS DOUBLE) AS information_value
FROM woe
ORDER BY bin
""",
    doc="Weight-of-evidence binning + information value (the credit-"
    "scoring feature screen) of order price deciles against the "
    "finished/open outcome: NTILE(10) over the totally-ordered "
    "(price, orderkey) key — deterministic bin edges cross-engine — "
    "then WoE = ln of a ratio of exact BIGINT-derived shares (the ln "
    "recipe: identical-double argument, one 6dp round) and IV as the "
    "decimal sum of once-rounded terms. At 100 TB the NTILE global "
    "sort is the one expensive stage — production swaps it for "
    "approx-quantile bin EDGES (one pass) + a broadcast bin lookup, "
    "the same downstream algebra; here the exact form keeps the "
    "oracle bit-stable. Window runs once; everything after is 10 rows.",
)
def diag_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    b = o.select(
        "o_orderstatus",
        F.ntile(10).over(Window.orderBy("o_totalprice", "o_orderkey")).alias("bin"),
    )
    c = b.groupBy("bin").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_good"),
        F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0)).alias("n_bad"),
    )
    t = c.agg(F.sum("n_good").alias("g_tot"), F.sum("n_bad").alias("b_tot"))
    pg = F.col("n_good").cast("double") / F.col("g_tot")
    pb = F.col("n_bad").cast("double") / F.col("b_tot")
    woe = F.round(F.log(pg / pb), 6)
    rows = c.crossJoin(F.broadcast(t)).select(
        "bin",
        F.col("n_good").cast("long").alias("n_good"),
        F.col("n_bad").cast("long").alias("n_bad"),
        woe.cast("decimal(18,6)").alias("woe"),
        F.round((pg - pb) * woe, 6).cast("decimal(18,6)").alias("iv_term"),
    )
    return (
        rows.select(
            F.col("bin").cast("long").alias("bin"),
            "n_good",
            "n_bad",
            F.col("woe").cast("double").alias("woe"),
            F.sum("iv_term").over(Window.partitionBy()).cast("double").alias(
                "information_value"
            ),
        )
        .orderBy("bin")
    )


@register(
    "diag_equidepth_histogram",
    """
WITH e AS (
  SELECT event_type, quantile_disc(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
           AS edges
  FROM events GROUP BY event_type),
b AS (
  SELECT ev.event_type,
         CAST(len(list_filter(e.edges, x -> ev.value > x)) AS BIGINT) AS bucket
  FROM events ev JOIN e ON ev.event_type = e.event_type)
SELECT event_type, bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b
GROUP BY event_type, bucket
ORDER BY event_type, bucket
""",
    doc="Equi-DEPTH (decile) histogram per event type — the companion to "
    "the equi-width diag_value_histogram and the shape optimizers "
    "actually want for selectivity estimates. Edges are DISCRETE "
    "quantiles (selection rank ceil(p·n), probed equal to DuckDB "
    "quantile_disc — the diag_iqr_outliers pin), so they are existing "
    "data values identical in both engines, and the bucket id is an "
    "exact comparison count against the 9-element broadcast edge "
    "array. Buckets are near-equal-count up to ties at edge values "
    "(discrete edges make tie handling exact, not fuzzy). At 100 TB: "
    "one within-partition sort window per group selects the edges, "
    "one broadcast-join counting pass bins the table — two "
    "map-side-combined shuffles total.",
)
def diag_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    cnt = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    ps = spark.createDataFrame([(i / 10.0,) for i in range(1, 10)], "p double")
    edges = (
        ranked.crossJoin(F.broadcast(ps))
        .filter(F.col("rn") == F.ceil(F.col("p") * F.col("n")).cast("int"))
        .groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("p", "value"))
            ).alias("pe")
        )
        .select(
            "event_type", F.transform("pe", lambda x: x["value"]).alias("edges")
        )
    )
    return (
        ev.join(F.broadcast(edges), "event_type")
        .select(
            "event_type",
            F.size(F.filter("edges", lambda x: F.col("value") > x))
            .cast("long")
            .alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("event_type", "bucket")
    )


@register(
    "dq_referential_audit",
    """
WITH rels AS (
  SELECT 'customer.nation' AS relationship,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_child,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans
  UNION ALL
  SELECT 'supplier.nation',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier s
          WHERE NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = s.s_nationkey))
  UNION ALL
  SELECT 'orders.customer',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'lineitem.orders',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem.part',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'lineitem.supplier',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM supplier s
                            WHERE s.s_suppkey = l.l_suppkey)))
SELECT relationship, n_child, n_orphans,
       CASE WHEN n_orphans = 0 THEN 1 ELSE 0 END AS fk_holds
FROM rels
ORDER BY relationship
""",
    doc="Whole-schema referential-integrity audit: every declared "
    "foreign-key edge of the star schema (customer/supplier → nation, "
    "orders → customer, lineitem → orders/part/supplier) checked as a "
    "LEFT ANTI join counting orphans — the governance sweep a "
    "warehouse runs after every load, complementing "
    "dq_constraint_audit's single-table rules. Each anti join "
    "broadcasts its parent key set (PKs - no row multiplication) and "
    "ALL of a child table's edges are counted in ONE conditional "
    "aggregate over ONE scan (lineitem: 3 edges, 1 pass). Counts are exact "
    "BIGINTs; fk_holds is the machine-readable gate bit. At 100 TB "
    "this is six broadcast-anti passes over two fact scans — no "
    "full-table shuffle anywhere.",
)
def dq_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE scan per child table, not one per FK edge: every parent key set
    # left-joins (broadcast, keys are PKs so no multiplication) onto the
    # child in a single pass, and a conditional aggregate counts all of
    # that child's orphan kinds at once — lineitem's three edges cost one
    # lineitem scan, not six (the naive per-edge count() form measured
    # 3.2 s at sf0.1; this plan ~1 s). At 100 TB small parents (nation,
    # part, supplier) broadcast; a parent too big to broadcast (orders)
    # drops to a shuffle join with a Bloom pre-filter — same single-pass
    # conditional-count shape either way.
    def keyed(df: DataFrame, col: str, out: str) -> DataFrame:
        return F.broadcast(df.select(F.col(col).alias(out)))

    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)

    def orphan(flag_col: str):
        return F.sum(F.when(F.col(flag_col).isNull(), 1).otherwise(0)).cast("long")

    # ZERO driver-side actions (round-5 verdict note): each child table's
    # 1-row conditional aggregate is reshaped into relationship rows
    # (stack for lineitem's 3 edges) and the four branches are unioned
    # into ONE returned plan — the caller's single action runs all four
    # scans as stages of one job instead of four serialized jobs.
    li_rel = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(keyed(orders, "o_orderkey", "k_o"), F.col("l_orderkey") == F.col("k_o"), "left")
        .join(keyed(part, "p_partkey", "k_p"), F.col("l_partkey") == F.col("k_p"), "left")
        .join(keyed(supp, "s_suppkey", "k_s"), F.col("l_suppkey") == F.col("k_s"), "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            orphan("k_o").alias("m_o"),
            orphan("k_p").alias("m_p"),
            orphan("k_s").alias("m_s"),
        )
        .selectExpr(
            "stack(3, 'lineitem.orders', m_o, 'lineitem.part', m_p,"
            " 'lineitem.supplier', m_s) AS (relationship, n_orphans)",
            "n AS n_child",
        )
    )

    def one_edge(child: DataFrame, fk: str, parent: DataFrame, pk: str, rel: str) -> DataFrame:
        return (
            child.select(fk)
            .join(keyed(parent, pk, "k"), F.col(fk) == F.col("k"), "left")
            .agg(F.count(F.lit(1)).cast("long").alias("n_child"), orphan("k").alias("n_orphans"))
            .select(F.lit(rel).alias("relationship"), "n_orphans", "n_child")
        )

    return (
        li_rel.unionByName(one_edge(cust, "c_nationkey", nat, "n_nationkey", "customer.nation"))
        .unionByName(one_edge(supp, "s_nationkey", nat, "n_nationkey", "supplier.nation"))
        .unionByName(one_edge(orders, "o_custkey", cust, "c_custkey", "orders.customer"))
        .select(
            "relationship",
            "n_child",
            "n_orphans",
            F.when(F.col("n_orphans") == 0, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("fk_holds"),
        )
        .orderBy("relationship")
    )


@register(
    "diag_observe_metrics",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events,
       (SELECT CAST(ROUND(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))), 2)
               AS DOUBLE) FROM events) AS sum_value,
       (SELECT CAST(MIN(date_diff('microsecond',
                TIMESTAMP '2024-01-01 00:00:00', ts)) AS BIGINT)
        FROM events) AS first_us,
       (SELECT CAST(MAX(date_diff('microsecond',
                TIMESTAMP '2024-01-01 00:00:00', ts)) AS BIGINT)
        FROM events) AS last_us,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_groups,
       (SELECT CAST(MAX(n) AS BIGINT) FROM daily) AS max_daily_events
""",
    doc="Pipeline observability via Spark's Observation API: data-quality "
    "counters (row count, exact decimal value total, event-time bounds) "
    "attach to the INPUT scan and output-shape metrics (group count, "
    "max group size) to the aggregated OUTPUT — both collected as a "
    "side effect of the ONE production pass (a noop-format write "
    "triggers it), zero extra scans, no second job. This is the "
    "monitoring contract a 100 TB ingest needs: the freshness/volume/"
    "sum-control numbers a separate audit query would re-read the "
    "whole table for ride along in the task metrics channel (observe "
    "compiles to AggregatingAccumulator, merged on the driver per "
    "task — no shuffle, no plan change). Metrics are deterministic "
    "aggregates (count/sum-of-decimal/min/max in exact micros), so "
    "the oracle recomputes them relationally and the returned 1-row "
    "frame hash-matches.",
)
def diag_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    ev = load_table(spark, "events", sf_dir)
    xus = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)"
        " AS BIGINT)"
    )
    obs_in = Observation("logflow_input")
    obs_out = Observation("logflow_output")
    observed = ev.observe(
        obs_in,
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_value"),
        F.min(xus).alias("first_us"),
        F.max(xus).alias("last_us"),
    )
    daily = observed.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    audited = daily.observe(
        obs_out,
        F.count(F.lit(1)).alias("n_groups"),
        F.max("n").alias("max_daily_events"),
    )
    # ONE action drives the pipeline and fills both observations
    audited.write.format("noop").mode("overwrite").save()
    m = {**obs_in.get, **obs_out.get}
    row = (
        int(m["n_events"]),
        float(m["sum_value"]),
        int(m["first_us"]),
        int(m["last_us"]),
        int(m["n_groups"]),
        int(m["max_daily_events"]),
    )
    return spark.createDataFrame(
        [row],
        "n_events long, sum_value double, first_us long, last_us long, "
        "n_groups long, max_daily_events long",
    )


_HUBER_K = 50  # clip half-width in value units (integer: exact in decimals)


@register(
    "diag_huber_location",
    f"""
WITH d AS (
  SELECT event_type, CAST(ROUND(value, 4) AS DECIMAL(18,4)) AS y FROM events
),
m0 AS (
  SELECT event_type,
         CAST(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 4) AS DECIMAL(18,4)) AS m,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM d GROUP BY event_type
),
r1 AS (
  SELECT d.event_type,
         LEAST(GREATEST(d.y, m0.m - {_HUBER_K}), m0.m + {_HUBER_K}) AS cy,
         CASE WHEN d.y < m0.m - {_HUBER_K} OR d.y > m0.m + {_HUBER_K}
              THEN 1 ELSE 0 END AS clipped
  FROM d JOIN m0 ON d.event_type = m0.event_type
),
m1 AS (
  SELECT event_type,
         CAST(ROUND(CAST(SUM(cy) AS DOUBLE) / COUNT(*), 4) AS DECIMAL(18,4)) AS m,
         CAST(SUM(clipped) AS BIGINT) AS n_clipped
  FROM r1 GROUP BY event_type
),
r2 AS (
  SELECT d.event_type,
         LEAST(GREATEST(d.y, m1.m - {_HUBER_K}), m1.m + {_HUBER_K}) AS cy,
         CASE WHEN d.y < m1.m - {_HUBER_K} OR d.y > m1.m + {_HUBER_K}
              THEN 1 ELSE 0 END AS clipped
  FROM d JOIN m1 ON d.event_type = m1.event_type
),
m2 AS (
  SELECT event_type,
         CAST(ROUND(CAST(SUM(cy) AS DOUBLE) / COUNT(*), 4) AS DECIMAL(18,4)) AS m,
         CAST(SUM(clipped) AS BIGINT) AS n_clipped
  FROM r2 GROUP BY event_type
)
SELECT m0.event_type,
       m0.n,
       CAST(m0.m AS DOUBLE) AS mean_raw,
       CAST(m1.m AS DOUBLE) AS huber_m1,
       CAST(m2.m AS DOUBLE) AS huber_m2,
       m1.n_clipped AS n_clipped_r1,
       m2.n_clipped AS n_clipped_r2
FROM m0
JOIN m1 ON m0.event_type = m1.event_type
JOIN m2 ON m0.event_type = m2.event_type
ORDER BY m0.event_type
""",
    doc=f"Huber M-estimator of location per event type: two unrolled IRLS "
    f"rounds of 'mean of values clipped to the current estimate ±{_HUBER_K}' "
    "— the robust central tendency that, unlike the median, refines "
    "with plain (re-weighted) AGGREGATES, and unlike the trimmed mean, "
    "adapts its clip window to the current estimate. Heavy-tailed "
    "telemetry (the value column is right-skewed) pulls the raw mean "
    "up; the clipped rounds walk it back toward the bulk — n_clipped "
    "per round quantifies the tail mass treated as outlying. "
    "Determinism: values round to DECIMAL(18,4) once, clip bounds are "
    "the 4-dp estimate ± an INTEGER constant (exact decimal compare "
    "and min/max in both engines), per-round sums are exact decimal "
    "arithmetic, and each estimate re-rounds to 4 dp before feeding "
    "the next round — the PageRank fixed-point recipe applied to a "
    "statistical estimator. At 100 TB each round is ONE map-side-"
    "combined aggregate (broadcast join of 5 group means back onto "
    "the scan); rounds are O(1) passes, not per-row iteration.",
)
def diag_huber_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = ev.select(
        "event_type", F.round(F.col("value"), 4).cast("decimal(18,4)").alias("y")
    )
    k = F.lit(_HUBER_K)

    def mean4(col):
        return F.round(F.sum(col).cast("double") / F.count(F.lit(1)), 4).cast(
            "decimal(18,4)"
        )

    m0 = d.groupBy("event_type").agg(
        mean4(F.col("y")).alias("m"), F.count(F.lit(1)).cast("long").alias("n")
    )

    def irls_round(m_prev):
        lo, hi = F.col("m") - k, F.col("m") + k
        r = d.join(F.broadcast(m_prev.select("event_type", "m")), "event_type").select(
            "event_type",
            F.least(F.greatest(F.col("y"), lo), hi).alias("cy"),
            F.when((F.col("y") < lo) | (F.col("y") > hi), 1).otherwise(0).alias(
                "clipped"
            ),
        )
        return r.groupBy("event_type").agg(
            mean4(F.col("cy")).alias("m"),
            F.sum("clipped").cast("long").alias("n_clipped"),
        )

    m1 = irls_round(m0)
    m2 = irls_round(m1)
    return (
        m0.select("event_type", "n", F.col("m").cast("double").alias("mean_raw"))
        .join(
            m1.select(
                "event_type",
                F.col("m").cast("double").alias("huber_m1"),
                F.col("n_clipped").alias("n_clipped_r1"),
            ),
            "event_type",
        )
        .join(
            m2.select(
                "event_type",
                F.col("m").cast("double").alias("huber_m2"),
                F.col("n_clipped").alias("n_clipped_r2"),
            ),
            "event_type",
        )
        .select(
            "event_type",
            "n",
            "mean_raw",
            "huber_m1",
            "huber_m2",
            "n_clipped_r1",
            "n_clipped_r2",
        )
        .orderBy("event_type")
    )


@register(
    "diag_group_median_arrow",
    """
WITH c AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events
),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
         AS median_lo_cents,
       CAST(MAX(CASE WHEN rn = n // 2 + 1 THEN cents END) AS BIGINT)
         AS median_hi_cents
FROM r
GROUP BY event_type
ORDER BY event_type
""",
    doc="Exact per-group median via groupBy().applyInArrow — the GROUPED "
    "Arrow UDF (Spark 4), completing the Arrow UDF surface next to "
    "mapInArrow (map-side) and cogroup applyInPandas: each group "
    "arrives as one pyarrow.Table, the kernel selects the lower/upper "
    "median by integer index on the sorted cents column (pure "
    "selection on exact BIGINTs — no float math, no np.round, nothing "
    "engine-specific), and returns a 1-row Arrow table. The oracle is "
    "the row_number selection identity: lower median = element at "
    "(n+1)//2, upper = n//2+1. At 100 TB per-group medians shuffle "
    "once on the group key and each group sorts independently — for "
    "groups too big for one task, quantile_exact_twopass is the "
    "two-pass selection form; this is the grouped-kernel form for "
    "bounded groups (the common per-segment case).",
)
def diag_group_median_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = load_table(spark, "events", sf_dir)
    c = ev.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )

    def median(key: tuple, table: pa.Table) -> pa.Table:
        cents = pc.array_sort_indices(table.column("cents"))
        sorted_cents = pc.take(table.column("cents"), cents)
        n = len(sorted_cents)
        lo = sorted_cents[(n + 1) // 2 - 1].as_py()
        hi = sorted_cents[n // 2].as_py()
        return pa.Table.from_pydict(
            {
                "event_type": [key[0]],
                "n": [n],
                "median_lo_cents": [lo],
                "median_hi_cents": [hi],
            },
            schema=pa.schema(
                [
                    pa.field("event_type", pa.string()),
                    pa.field("n", pa.int64()),
                    pa.field("median_lo_cents", pa.int64()),
                    pa.field("median_hi_cents", pa.int64()),
                ]
            ),
        )

    return (
        c.groupBy("event_type")
        .applyInArrow(
            median,
            "event_type string, n long, median_lo_cents long, median_hi_cents long",
        )
        .orderBy("event_type")
    )


@register(
    "diag_hll_sketch_union",
    None,  # estimates are DataSketches-internal — rows-only; pytest bounds the error
    doc="MERGEABLE distinct-count sketches (Apache DataSketches HLL via "
    "Spark 4's hll_sketch_agg / hll_union_agg / hll_sketch_estimate): "
    "each day builds ONE user sketch (partial-aggregated map-side like "
    "any agg), the month's distinct-user estimate is the UNION of the "
    "30 daily sketches — no re-scan of history, the pattern that "
    "replaces month-end COUNT(DISTINCT) over 100 TB with a sketch "
    "table of kilobytes/day. Output: per-day exact vs sketch estimate "
    "+ the global union estimate vs global exact. No DuckDB oracle "
    "(sketch binaries and estimates are library-internal): evidence is "
    "the pytest error bound — lgConfigK=14 gives ~0.8% standard "
    "error, asserted at 4 sigma — and the union-vs-exact identity on "
    "the same frame.",
)
def diag_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
    )
    per_day = daily.select(
        "day",
        "exact_users",
        F.hll_sketch_estimate("sk").cast("long").alias("est_users"),
    )
    total = daily.agg(
        F.lit(None).cast("timestamp_ntz").alias("day"),
        F.lit(None).cast("long").alias("exact_users"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_users"),
    )
    return per_day.unionByName(total).orderBy(F.col("day").asc_nulls_last())


_TS_SAMPLE = 40  # bounded per-group sample (pairs <= 40*39/2 = 780)


@register(
    "diag_theil_sen_slope",
    f"""
WITH pts AS (
  SELECT event_type,
         CAST(date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00', ts)
              AS BIGINT) AS x,
         ROUND(value, 4) AS y,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS BIGINT) AS rn
  FROM events),
s AS (SELECT * FROM pts WHERE rn <= {_TS_SAMPLE}),
slopes AS (
  SELECT a.event_type,
         (b.y - a.y) / ((CAST(b.x AS DOUBLE) - CAST(a.x AS DOUBLE)) / 1000000.0)
           AS slope,
         a.rn AS i, b.rn AS j
  FROM s a JOIN s b
    ON a.event_type = b.event_type AND a.rn < b.rn AND a.x <> b.x),
ranked AS (
  SELECT event_type, slope,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY slope, i, j) AS BIGINT) AS sr,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs
  FROM slopes)
SELECT event_type, n_pairs,
       ROUND(slope * 1000000, 6) AS slope_ppm_per_sec
FROM ranked
WHERE sr = (n_pairs + 1) // 2
ORDER BY event_type
""",
    doc="Theil-Sen robust trend slope per event type: the EXACT lower "
    "median of all pairwise slopes over a bounded deterministic sample "
    f"(first {_TS_SAMPLE} points per group by (ts, event_id) — pairwise "
    "work is O(sample²), never corpus²), the 29%-breakdown-point "
    "complement to the OLS (diag_groupwise_ols) and Huber "
    "(diag_huber_location) estimators: a single wild outlier moves OLS "
    "arbitrarily but shifts a slope MEDIAN by at most one rank. "
    "Cross-engine exactness: y rounds to 4 dp (identical doubles), x is "
    "exact epoch micros, so every pairwise (Δy)/(Δx/1e6) runs the "
    "identical IEEE sequence in both engines, and the median is "
    "SELECTED by rank (row_number at (n+1)//2 with (i,j) tiebreaks), "
    "never interpolated — engine quantile interpolation formulas are "
    "not trusted. Same-x pairs are excluded (ANSI divide-by-zero "
    "guard). At 100 TB: the sample bound makes per-group cost constant; "
    "the self-join shuffles only sample-scale rows on the group key.",
)
def diag_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pts = (
        ev.select(
            "event_type",
            F.expr(
                "CAST(timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ'2024-01-01 00:00:00', ts) AS BIGINT)"
            ).alias("x"),
            F.round("value", 4).alias("y"),
            "ts",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _TS_SAMPLE)
        .select("event_type", "x", "y", "rn")
    )
    a = pts.select(
        "event_type", F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("rn").alias("i")
    )
    b = pts.select(
        F.col("event_type").alias("et2"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("rn").alias("j"),
    )
    slopes = a.join(
        b,
        (F.col("event_type") == F.col("et2"))
        & (F.col("i") < F.col("j"))
        & (F.col("xa") != F.col("xb")),
    ).select(
        "event_type",
        (
            (F.col("yb") - F.col("ya"))
            / ((F.col("xb").cast("double") - F.col("xa").cast("double")) / F.lit(1000000.0))
        ).alias("slope"),
        "i",
        "j",
    )
    ws = Window.partitionBy("event_type").orderBy("slope", "i", "j")
    wn = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(ws).cast("long").alias("sr"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n_pairs"),
    )
    return (
        ranked.filter(F.col("sr") == F.expr("(n_pairs + 1) DIV 2"))
        .select(
            "event_type",
            "n_pairs",
            F.round(F.col("slope") * 1000000, 6).alias("slope_ppm_per_sec"),
        )
        .orderBy("event_type")
    )


@register(
    "diag_gini_concentration",
    """
WITH spend AS (
  SELECT c.c_custkey, c.c_mktsegment,
         COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(20,2))), 0) AS x
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_mktsegment),
ranked AS (
  SELECT c_mktsegment, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                 ORDER BY x, c_custkey) AS BIGINT) AS i
  FROM spend),
m AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx,
         SUM(i * x) AS six
  FROM ranked GROUP BY c_mktsegment)
SELECT c_mktsegment,
       n AS n_customers,
       CAST(ROUND(sx, 2) AS DOUBLE) AS total_spend,
       ROUND(2.0 * CAST(six AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
FROM m
ORDER BY c_mktsegment
""",
    doc="Gini concentration of customer spend per market segment — the "
    "inequality gate a mixture/revenue pipeline runs to detect "
    "whale-dominated segments (complements diag_key_skew's top-k view "
    "with a single summary statistic). Uses the rank formula "
    "G = 2*SUM(i*x_i)/(n*SUM(x)) - (n+1)/n over ascending spend: spends "
    "sum as exact DECIMAL (order-independent), ranks are BIGINTs with a "
    "custkey tiebreak (tied spends contribute identically under any "
    "tie order, so the tiebreak never changes G), and the final formula "
    "is one identical IEEE expression of exact operands. Zero-order "
    "customers enter at x=0 (LEFT JOIN) — excluding them understates "
    "concentration. At 100 TB: one fact shuffle on custkey + one "
    "segment-partitioned sort; the moment rollup is segment-scale.",
)
def diag_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    spend = (
        cust.join(
            orders.select(F.col("o_custkey").alias("c_custkey"), "o_totalprice"),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(20,2)")),
                F.lit(0).cast("decimal(20,2)"),
            ).alias("x")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("x", "c_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w).cast("long"))
    m = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    nd = F.col("n").cast("double")
    gini = (
        F.lit(2.0) * F.col("six").cast("double") / (nd * F.col("sx").cast("double"))
        - (nd + F.lit(1.0)) / nd
    )
    return m.select(
        "c_mktsegment",
        F.col("n").alias("n_customers"),
        F.round(F.col("sx"), 2).cast("double").alias("total_spend"),
        F.round(gini, 6).alias("gini"),
    ).orderBy("c_mktsegment")


@register(
    "diag_mann_whitney_value",
    """
WITH v AS (SELECT event_type, ROUND(value, 4) AS y FROM events),
grp AS (
  SELECT event_type, y,
         CAST(RANK() OVER (ORDER BY y) AS BIGINT) AS rlo,
         CAST(COUNT(*) OVER (PARTITION BY y) AS BIGINT) AS t
  FROM v),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
tie AS (
  SELECT CAST(COALESCE(SUM(t * t * t - t), 0) AS BIGINT) AS tie3
  FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS t FROM v GROUP BY y) WHERE t > 1),
r AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n1,
         CAST(SUM(2 * rlo + t - 1) AS BIGINT) AS sumr_x2
  FROM grp GROUP BY event_type)
SELECT r.event_type, r.n1, (tot.n - r.n1) AS n2,
       CAST(r.sumr_x2 - r.n1 * (r.n1 + 1) AS BIGINT) AS u1_x2,
       ROUND((CAST(r.sumr_x2 - r.n1 * (r.n1 + 1) AS DOUBLE) / 2.0
              - CAST(r.n1 * (tot.n - r.n1) AS DOUBLE) / 2.0)
             / NULLIF(sqrt((CAST(r.n1 AS DOUBLE) * CAST(tot.n - r.n1 AS DOUBLE) / 12.0)
                    * (CAST(tot.n + 1 AS DOUBLE)
                       - CAST(tie.tie3 AS DOUBLE)
                         / (CAST(tot.n AS DOUBLE) * CAST(tot.n - 1 AS DOUBLE)))), 0.0),
             6) AS z_u
FROM r CROSS JOIN tot CROSS JOIN tie
ORDER BY r.event_type
""",
    doc="Mann-Whitney U (one-vs-rest) on event values per type: does a "
    "type's value distribution sit stochastically higher than the "
    "others'? — the nonparametric A/B gate that survives the "
    "heavy-tailed values where a t-test misleads. One GLOBAL ranking "
    "serves every comparison: average ranks for ties are carried as "
    "the exact INTEGER 2*avg_rank = 2*rank_lo + t - 1 (so per-type rank "
    "sums are exact BIGINTs, immune to float summation order), "
    "U1 arrives doubled as the exact integer u1_x2, and the "
    "tie-corrected normal z is one identical IEEE expression with a "
    "NULLIF guard for the all-values-tied edge. At 100 TB the plan "
    "never sorts row-scale data: rows pre-aggregate to (type, value) "
    "and (value) count tables (map-side combined, bounded by the "
    "4-dp value DOMAIN, not the row count), rank-lows come from a "
    "running sum over the value-scale table, and rank sums distribute "
    "as n_ty-weighted group contributions.",
)
def diag_mann_whitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v = ev.select("event_type", F.round("value", 4).alias("y"))
    # (type, value) and (value) count tables — the only corpus-scale pass
    vy = v.groupBy("event_type", "y").agg(F.count(F.lit(1)).cast("long").alias("n_ty"))
    yt = vy.groupBy("y").agg(F.sum("n_ty").cast("long").alias("t"))
    # rank-low of each distinct value = 1 + #rows strictly below it: a
    # running sum over the VALUE-scale table (never a row-scale sort)
    wr = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    yr = yt.select(
        "y",
        "t",
        (F.coalesce(F.sum("t").over(wr), F.lit(0)) + 1).cast("long").alias("rlo"),
    )
    tot = yt.agg(F.sum("t").cast("long").alias("n"))
    tie = yt.filter(F.col("t") > 1).agg(
        F.coalesce(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")), F.lit(0)
        )
        .cast("long")
        .alias("tie3")
    )
    r = (
        vy.join(yr, "y")
        .groupBy("event_type")
        .agg(
            F.sum("n_ty").cast("long").alias("n1"),
            F.sum(F.col("n_ty") * (2 * F.col("rlo") + F.col("t") - 1))
            .cast("long")
            .alias("sumr_x2"),
        )
    )
    n = F.col("n")
    n1 = F.col("n1")
    n2 = (n - n1).cast("long")
    u1x2 = (F.col("sumr_x2") - n1 * (n1 + 1)).cast("long")
    var = (
        (n1.cast("double") * n2.cast("double") / F.lit(12.0))
        * (
            (n + 1).cast("double")
            - F.col("tie3").cast("double") / (n.cast("double") * (n - 1).cast("double"))
        )
    )
    z = (u1x2.cast("double") / F.lit(2.0) - (n1 * n2).cast("double") / F.lit(2.0)) / F.nullif(
        F.sqrt(var), F.lit(0.0)
    )
    return (
        r.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tie))
        .select(
            "event_type",
            "n1",
            n2.alias("n2"),
            u1x2.alias("u1_x2"),
            F.round(z, 6).alias("z_u"),
        )
        .orderBy("event_type")
    )


@register(
    "dq_functional_dependency",
    """
WITH fd1 AS (
  SELECT 'customer: custkey -> nationkey' AS fd,
         CAST(COUNT(*) AS BIGINT) AS n_lhs,
         CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
  FROM (SELECT c_custkey, COUNT(DISTINCT c_nationkey) AS nd
        FROM customer GROUP BY c_custkey)),
fd2 AS (
  SELECT 'customer: nationkey -> mktsegment',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS nd
        FROM customer GROUP BY c_nationkey)),
fd3 AS (
  SELECT 'orders: custkey -> orderpriority',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS nd
        FROM orders GROUP BY o_custkey)),
fd4 AS (
  SELECT 'lineitem: partkey -> suppkey',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS nd
        FROM lineitem GROUP BY l_partkey)),
fd5 AS (
  SELECT 'nation: regionkey -> name',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT n_regionkey, COUNT(DISTINCT n_name) AS nd
        FROM nation GROUP BY n_regionkey)),
fds AS (SELECT * FROM fd1 UNION ALL SELECT * FROM fd2 UNION ALL
        SELECT * FROM fd3 UNION ALL SELECT * FROM fd4 UNION ALL
        SELECT * FROM fd5)
SELECT fd, n_lhs, n_violating,
       CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS fd_holds,
       ROUND(CAST(n_violating AS DOUBLE) / n_lhs, 4) AS violation_ratio
FROM fds
ORDER BY fd
""",
    doc="Functional-dependency discovery/audit (the profiling step behind "
    "schema normalization and dedup-key design): for each candidate "
    "X -> Y, count the X-groups whose Y is not unique. Five candidates "
    "span the spectrum — the PK-backed FD that must hold "
    "(custkey -> nationkey) through denormalization casualties "
    "(partkey -> suppkey: each part ships from multiple suppliers). "
    "Each FD is one partial-agg'd groupBy + a 1-row conditional "
    "rollup; the five 1-row results union into ONE returned plan "
    "(the dq_referential_audit zero-driver-actions shape). All counts "
    "exact BIGINTs. At 100 TB each audit is a single shuffle on its "
    "LHS — and an FD that holds is a free generalized bucketing/"
    "pruning key downstream.",
)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    nat = load_table(spark, "nation", sf_dir)

    def audit(df: DataFrame, lhs: str, rhs: str, label: str) -> DataFrame:
        return (
            df.groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("nd"))
            .agg(
                F.lit(label).alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_lhs"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
            )
        )

    fds = (
        audit(cust, "c_custkey", "c_nationkey", "customer: custkey -> nationkey")
        .unionByName(
            audit(cust, "c_nationkey", "c_mktsegment", "customer: nationkey -> mktsegment")
        )
        .unionByName(
            audit(orders, "o_custkey", "o_orderpriority", "orders: custkey -> orderpriority")
        )
        .unionByName(audit(li, "l_partkey", "l_suppkey", "lineitem: partkey -> suppkey"))
        .unionByName(audit(nat, "n_regionkey", "n_name", "nation: regionkey -> name"))
    )
    return fds.select(
        "fd",
        "n_lhs",
        "n_violating",
        F.when(F.col("n_violating") == 0, 1).otherwise(0).cast("long").alias("fd_holds"),
        F.round(F.col("n_violating").cast("double") / F.col("n_lhs"), 4).alias(
            "violation_ratio"
        ),
    ).orderBy("fd")


@register(
    "dq_table_fingerprint",
    """
WITH f AS (
  SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(concat('0x', substr(md5(concat(
               CAST(o_orderkey AS VARCHAR), '|', CAST(o_custkey AS VARCHAR), '|',
               o_orderstatus, '|', CAST(ROUND(o_totalprice, 2) AS VARCHAR))), 1, 8))
             AS BIGINT)) AS BIGINT) AS fingerprint
  FROM orders
  UNION ALL
  SELECT 'customer', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(concat('0x', substr(md5(concat(
               CAST(c_custkey AS VARCHAR), '|', CAST(c_nationkey AS VARCHAR), '|',
               c_mktsegment)), 1, 8)) AS BIGINT)) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT 'nation', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(concat('0x', substr(md5(concat(
               CAST(n_nationkey AS VARCHAR), '|', n_name, '|',
               CAST(n_regionkey AS VARCHAR))), 1, 8)) AS BIGINT)) AS BIGINT)
  FROM nation)
SELECT tbl, n_rows, fingerprint FROM f ORDER BY tbl
""",
    doc="Order-independent TABLE FINGERPRINT for cross-replica / "
    "cross-engine reconciliation: each row canonicalizes to a "
    "delimited string, hashes to md5, and the first 8 hex digits "
    "(32 bits — the exact int64 sum holds through ~2e9 rows; widen the "
    "accumulator to DECIMAL(38,0) past that) SUM exactly — "
    "an order- and partitioning-independent integer signature, so two "
    "replicas (or an engine pair, as the oracle demonstrates "
    "literally) compare one row per table instead of shipping data. "
    "Numeric columns round-canonicalize before casting to string "
    "(ROUND(x,2) renders identically in both engines). Pure map-side "
    "+ 1-row agg per table, unioned into one plan: the cheapest "
    "possible full-table audit at 100 TB — one scan, no shuffle.",
)
def dq_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fp(df: DataFrame, tbl: str, parts: list) -> DataFrame:
        h = F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 8), 16, 10).cast(
            "long"
        )
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(h).cast("long").alias("fingerprint"),
        )

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    return (
        fp(
            orders,
            "orders",
            [
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                F.round("o_totalprice", 2).cast("string"),
            ],
        )
        .unionByName(
            fp(
                cust,
                "customer",
                [
                    F.col("c_custkey").cast("string"),
                    F.col("c_nationkey").cast("string"),
                    F.col("c_mktsegment"),
                ],
            )
        )
        .unionByName(
            fp(
                nat,
                "nation",
                [
                    F.col("n_nationkey").cast("string"),
                    F.col("n_name"),
                    F.col("n_regionkey").cast("string"),
                ],
            )
        )
        .orderBy("tbl")
    )


# Poisson(1) inverse-CDF thresholds (cumulative e^-1/k! for k = 0..6),
# precomputed in Python and inlined as the SAME repr literals into both
# engines (the ab_sprt_monitor constant recipe). Weights cap at 7
# (P[W > 7] ~ 1e-5 — the cap is part of the operator's definition and is
# applied identically in both engines).
_POIS1_CDF = [
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
]
_BOOT_B = 32


def _pois_case_sql(u: str) -> str:
    whens = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS1_CDF)
    )
    return f"CASE {whens} ELSE 7 END"


@register(
    "diag_bootstrap_ci",
    f"""
WITH base AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x_cents
  FROM events),
u AS (
  SELECT event_type, x_cents, r.b,
         CAST(concat('0x', substr(md5(concat('boot:', CAST(event_id AS VARCHAR),
              ':', CAST(r.b AS VARCHAR))), 1, 8)) AS BIGINT)
           / 4294967296.0 AS u
  FROM base CROSS JOIN range(0, {_BOOT_B}) AS r(b)),
reps AS (
  SELECT event_type, b,
         CAST(SUM({_pois_case_sql('u')}) AS BIGINT) AS sw,
         CAST(SUM(({_pois_case_sql('u')}) * x_cents) AS BIGINT) AS swx
  FROM u GROUP BY event_type, b),
means AS (
  SELECT event_type, b,
         CAST(swx AS DOUBLE) / NULLIF(CAST(sw AS DOUBLE), 0.0) AS m,
         ROW_NUMBER() OVER (PARTITION BY event_type
           ORDER BY CAST(swx AS DOUBLE) / NULLIF(CAST(sw AS DOUBLE), 0.0), b) AS rn
  FROM reps WHERE sw > 0),
pt AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(x_cents) AS BIGINT) AS sx
  FROM base GROUP BY event_type)
SELECT p.event_type, p.n_rows,
       ROUND(CAST(p.sx AS DOUBLE) / CAST(p.n_rows AS DOUBLE) / 100.0, 4) AS mean_value,
       ROUND(MAX(CASE WHEN rn = 2 THEN m END) / 100.0, 4) AS boot_lo,
       ROUND(MAX(CASE WHEN rn = {_BOOT_B - 1} THEN m END) / 100.0, 4) AS boot_hi
FROM pt p JOIN means USING (event_type)
GROUP BY p.event_type, p.n_rows, p.sx
ORDER BY p.event_type
""",
    doc=f"Poisson-bootstrap confidence interval for the per-type mean "
    "event value — THE scale-correct resampling: instead of drawing "
    f"n-row resamples (impossible at 100 TB), each row gets {_BOOT_B} "
    "independent Poisson(1) weights (the n→∞ limit of multinomial "
    "resampling; Chamandy et al. 2012 'Estimating uncertainty for "
    "massive data streams'), so every replicate is a weighted SUM in "
    "the SAME single pass — map-side, no data movement, replicate "
    "count × group rows of extra shuffle only. Weights are DETERMINISTIC "
    "(md5-keyed uniforms through the inlined Poisson inverse-CDF "
    "thresholds — identical repr literals both engines), sums are exact "
    "BIGINT cents, replicate means are one IEEE division each (bit-"
    "identical operands → bit-identical doubles → identical rank "
    "order), and the interval takes the 2nd / 31st order statistics "
    "(~93.75% coverage with B=32) by unique-key ROW_NUMBER. The "
    "per-type windows order 32 rows each — bounded, never row-scale.",
)
def diag_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("x_cents"),
    )
    u = base.select(
        "event_type",
        "x_cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        "event_id",
    ).select(
        "event_type",
        "x_cents",
        "b",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("boot:"),
                            F.col("event_id").cast("string"),
                            F.lit(":"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    w = F.expr(_pois_case_sql("u"))
    reps = u.groupBy("event_type", "b").agg(
        F.sum(w).cast("long").alias("sw"),
        F.sum(w * F.col("x_cents")).cast("long").alias("swx"),
    )
    m = F.col("swx").cast("double") / F.nullif(F.col("sw").cast("double"), F.lit(0.0))
    wn = Window.partitionBy("event_type").orderBy(m, "b")
    # sw = 0 replicates (probability e^-n per group) would give a NULL mean
    # whose sort position differs cross-engine (Spark NULLS FIRST, DuckDB
    # NULLS LAST) — exclude them before ranking, identically in the oracle.
    means = reps.filter(F.col("sw") > 0).select(
        "event_type", "b", m.alias("m"), F.row_number().over(wn).alias("rn")
    )
    pt = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("x_cents").cast("long").alias("sx"),
    )
    return (
        pt.join(means, "event_type")
        .groupBy("event_type", "n_rows", "sx")
        .agg(
            F.max(F.when(F.col("rn") == 2, F.col("m"))).alias("lo"),
            F.max(F.when(F.col("rn") == _BOOT_B - 1, F.col("m"))).alias("hi"),
        )
        .select(
            "event_type",
            "n_rows",
            F.round(
                F.col("sx").cast("double") / F.col("n_rows").cast("double") / 100.0, 4
            ).alias("mean_value"),
            F.round(F.col("lo") / 100.0, 4).alias("boot_lo"),
            F.round(F.col("hi") / 100.0, 4).alias("boot_hi"),
        )
        .orderBy("event_type")
    )


#: z for a 95% two-sided Wilson interval — Python repr, inlined into both
#: engines verbatim.
_WILSON_Z = "1.959963984540054"


@register(
    "diag_wilson_ci",
    f"""
WITH seg AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS BIGINT) AS s
  FROM customer GROUP BY c_mktsegment)
SELECT c_mktsegment, n, s,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_hat,
       ROUND(((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               + ({_WILSON_Z} * {_WILSON_Z}) / (2.0 * CAST(n AS DOUBLE))
               - {_WILSON_Z} * sqrt(((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE)
                   + ({_WILSON_Z} * {_WILSON_Z})
                     / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + ({_WILSON_Z} * {_WILSON_Z}) / CAST(n AS DOUBLE)), 6) AS wilson_lo,
       ROUND(((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               + ({_WILSON_Z} * {_WILSON_Z}) / (2.0 * CAST(n AS DOUBLE))
               + {_WILSON_Z} * sqrt(((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE)
                   + ({_WILSON_Z} * {_WILSON_Z})
                     / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + ({_WILSON_Z} * {_WILSON_Z}) / CAST(n AS DOUBLE)), 6) AS wilson_hi
FROM seg
ORDER BY c_mktsegment
""",
    doc="Wilson score interval per market segment for the share of "
    "high-balance customers — the CI that stays valid near p=0/1 and "
    "small n where the naive Wald interval collapses (Wilson 1927; the "
    "standard ratio-metric error bar in experimentation platforms). "
    "Counts are exact BIGINTs; p-hat and both bounds are FIXED IEEE "
    "expression trees over (s, n, z) with the z literal inlined "
    "identically in both engines (sqrt is correctly rounded per "
    "IEEE-754, so the whole tree is bit-identical cross-engine — same "
    "recipe as ab_sprt_monitor's constants). One groupBy; segment-scale "
    "everything after.",
)
def diag_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    seg = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("c_acctbal") > 5000.0, 1).otherwise(0))
        .cast("long")
        .alias("s"),
    )
    z = float(_WILSON_Z)
    nn = F.col("n").cast("double")
    p = F.col("s").cast("double") / nn
    half = F.lit(z) * F.sqrt(
        (p * (F.lit(1.0) - p)) / nn + F.lit(z) * F.lit(z) / (F.lit(4.0) * nn * nn)
    )
    denom = F.lit(1.0) + F.lit(z) * F.lit(z) / nn
    center = p + F.lit(z) * F.lit(z) / (F.lit(2.0) * nn)
    return seg.select(
        "c_mktsegment",
        "n",
        "s",
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("c_mktsegment")


@register(
    "diag_cramers_v",
    """
WITH j AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS pri
  FROM orders JOIN customer ON o_custkey = c_custkey),
o AS (SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS obs FROM j GROUP BY seg, pri),
rt AS (SELECT seg, CAST(SUM(obs) AS BIGINT) AS row_tot FROM o GROUP BY seg),
ct AS (SELECT pri, CAST(SUM(obs) AS BIGINT) AS col_tot FROM o GROUP BY pri),
g AS (SELECT CAST(SUM(obs) AS BIGINT) AS grand FROM o),
terms AS (
  SELECT CAST(ROUND(
           (CAST(obs AS DOUBLE)
              - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(grand AS DOUBLE))
           * (CAST(obs AS DOUBLE)
              - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(grand AS DOUBLE))
           / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(grand AS DOUBLE)),
           6) AS DECIMAL(18,6)) AS term
  FROM o JOIN rt ON o.seg = rt.seg JOIN ct ON o.pri = ct.pri CROSS JOIN g),
dims AS (SELECT CAST(COUNT(DISTINCT seg) AS BIGINT) AS r,
                CAST(COUNT(DISTINCT pri) AS BIGINT) AS c FROM o),
stat AS (SELECT CAST(SUM(term) AS DOUBLE) AS chi2 FROM terms)
SELECT g.grand AS n_rows, dims.r AS n_segments, dims.c AS n_priorities,
       ROUND(stat.chi2, 4) AS chi2,
       ROUND(sqrt(stat.chi2 / NULLIF(CAST(g.grand AS DOUBLE)
             * CAST(LEAST(dims.r, dims.c) - 1 AS DOUBLE), 0.0)), 6) AS cramers_v
FROM stat CROSS JOIN dims CROSS JOIN g
""",
    doc="Cramér's V — the EFFECT SIZE the chi-square test lacks: how "
    "strongly is customer market segment associated with order "
    "priority, on a 0..1 scale comparable across tables of any size "
    "(chi2 alone grows with n; V = sqrt(chi2 / (n·(min(r,c)-1))) does "
    "not). Same determinism recipe as diag_chi2_independence: expected "
    "counts from exact BIGINT marginals in one identical IEEE "
    "expression, per-cell terms rounded once at 6dp and DECIMAL-summed "
    "(order-independent), dimensions as exact distinct counts, the "
    "final sqrt a correctly-rounded IEEE op over identical operands. "
    "At 100 TB: one fact join + count shuffle into r×c cells; "
    "everything after is cell-scale.",
)
def diag_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    j = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == cust.c_custkey,
    ).select(F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri"))
    o = j.groupBy("seg", "pri").agg(F.count(F.lit(1)).cast("long").alias("obs"))
    rt = o.groupBy("seg").agg(F.sum("obs").cast("long").alias("row_tot"))
    ct = o.groupBy("pri").agg(F.sum("obs").cast("long").alias("col_tot"))
    g = o.agg(F.sum("obs").cast("long").alias("grand"))
    e = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("grand").cast("double")
    )
    diff = F.col("obs").cast("double") - e
    terms = (
        o.join(rt, "seg")
        .join(F.broadcast(ct), "pri")
        .crossJoin(F.broadcast(g))
        .select(F.round(diff * diff / e, 6).cast("decimal(18,6)").alias("term"))
    )
    dims = o.agg(
        F.countDistinct("seg").cast("long").alias("r"),
        F.countDistinct("pri").cast("long").alias("c"),
    )
    stat = terms.agg(F.sum("term").cast("double").alias("chi2"))
    # NULLIF the data-dependent denominator (repo invariant): a degenerate
    # 1-category dimension would make Spark ANSI throw DIVIDE_BY_ZERO while
    # DuckDB returns NULL.
    v = F.sqrt(
        F.col("chi2")
        / F.nullif(
            F.col("grand").cast("double")
            * (F.least(F.col("r"), F.col("c")) - 1).cast("double"),
            F.lit(0.0),
        )
    )
    return (
        stat.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(g))
        .select(
            F.col("grand").alias("n_rows"),
            F.col("r").alias("n_segments"),
            F.col("c").alias("n_priorities"),
            F.round(F.col("chi2"), 4).alias("chi2"),
            F.round(v, 6).alias("cramers_v"),
        )
    )


@register(
    "diag_winsorized_mean",
    """
WITH v AS (SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
d AS (SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS c
      FROM v GROUP BY event_type, cents),
t AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM d GROUP BY event_type),
r AS (SELECT event_type, cents, c,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS cum
      FROM d),
b AS (SELECT r.event_type, t.n,
             CAST(MIN(CASE WHEN cum >= (10 * t.n + 99) // 100 THEN cents END)
                  AS BIGINT) AS lo,
             CAST(MIN(CASE WHEN cum >= (90 * t.n + 99) // 100 THEN cents END)
                  AS BIGINT) AS hi
      FROM r JOIN t ON r.event_type = t.event_type
      GROUP BY r.event_type, t.n),
w AS (SELECT d.event_type, b.n, b.lo, b.hi,
             CAST(SUM(CASE WHEN cents < lo THEN c * lo
                           WHEN cents > hi THEN c * hi
                           ELSE c * cents END) AS BIGINT) AS s_w,
             CAST(SUM(c * cents) AS BIGINT) AS s_raw
      FROM d JOIN b ON d.event_type = b.event_type
      GROUP BY d.event_type, b.n, b.lo, b.hi)
SELECT event_type, n AS n_rows,
       ROUND(CAST(lo AS DOUBLE) / 100.0, 2) AS p10_value,
       ROUND(CAST(hi AS DOUBLE) / 100.0, 2) AS p90_value,
       ROUND(CAST(s_raw AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 4) AS raw_mean,
       ROUND(CAST(s_w AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 4) AS winsorized_mean
FROM w
ORDER BY event_type
""",
    doc="10/90 winsorized mean per event type next to the raw mean — the "
    "robust-location estimator between the median (throws away "
    "magnitude) and the raw mean (one whale moves it): values beyond "
    "the exact p10/p90 order statistics are CLAMPED to them, not "
    "dropped (vs a trimmed mean), so n stays constant. Everything is "
    "VALUE-DOMAIN scale: distinct-cents counts, one running-count "
    "window per type, bounds by exact integer rank selection "
    "(k = ceil(p·n/100), percentile_disc semantics — never engine "
    "quantile interpolation), and the winsorized sum is an exact "
    "BIGINT of clamped cents; the one IEEE division comes last. At "
    "100 TB: one event pass map-side-combines into the (type, cents) "
    "table; windows run on the bounded value domain.",
)
def diag_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # NULL values would shift the cumulative-rank window cross-engine (Spark
    # NULLS FIRST vs DuckDB NULLS LAST) and inflate n while being excluded
    # from the clamped sum — keep the window domain NULL-free by construction.
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    d = v.groupBy("event_type", "cents").agg(F.count(F.lit(1)).cast("long").alias("c"))
    t = d.groupBy("event_type").agg(F.sum("c").cast("long").alias("n"))
    wc = Window.partitionBy("event_type").orderBy("cents")
    r = d.select(
        "event_type", "cents", "c", F.sum("c").over(wc).cast("long").alias("cum")
    )
    k10 = F.expr("(10 * n + 99) DIV 100")
    k90 = F.expr("(90 * n + 99) DIV 100")
    b = (
        r.join(t, "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.min(F.when(F.col("cum") >= k10, F.col("cents"))).cast("long").alias("lo"),
            F.min(F.when(F.col("cum") >= k90, F.col("cents"))).cast("long").alias("hi"),
        )
    )
    clamped = (
        F.when(F.col("cents") < F.col("lo"), F.col("c") * F.col("lo"))
        .when(F.col("cents") > F.col("hi"), F.col("c") * F.col("hi"))
        .otherwise(F.col("c") * F.col("cents"))
    )
    w = (
        d.join(F.broadcast(b), "event_type")
        .groupBy("event_type", "n", "lo", "hi")
        .agg(
            F.sum(clamped).cast("long").alias("s_w"),
            F.sum(F.col("c") * F.col("cents")).cast("long").alias("s_raw"),
        )
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    return w.select(
        "event_type",
        F.col("n").alias("n_rows"),
        F.round(dd("lo") / 100.0, 2).alias("p10_value"),
        F.round(dd("hi") / 100.0, 2).alias("p90_value"),
        F.round(dd("s_raw") / dd("n") / 100.0, 4).alias("raw_mean"),
        F.round(dd("s_w") / dd("n") / 100.0, 4).alias("winsorized_mean"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Privacy / experimentation analytics (round 8): k-anonymity audit, CUPED
# variance reduction, delta-method ratio-metric CI.
# --------------------------------------------------------------------------


@register(
    "privacy_k_anonymity",
    """
WITH qi AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band
  FROM customer),
g AS (SELECT c_nationkey, c_mktsegment, bal_band,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM qi GROUP BY c_nationkey, c_mktsegment, bal_band),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(k) AS BIGINT) AS n_rows FROM g),
thr AS (SELECT CAST(unnest([2, 5, 10, 20]) AS BIGINT) AS kt)
SELECT kt AS k_threshold, tot.n_groups, tot.n_rows,
       CAST(COALESCE(SUM(CASE WHEN k < kt THEN 1 END), 0) AS BIGINT)
         AS n_groups_below,
       CAST(COALESCE(SUM(CASE WHEN k < kt THEN k END), 0) AS BIGINT)
         AS n_rows_at_risk,
       ROUND(CAST(COALESCE(SUM(CASE WHEN k < kt THEN k END), 0) AS DOUBLE)
             / NULLIF(CAST(tot.n_rows AS DOUBLE), 0.0), 6) AS pct_rows_at_risk
FROM g CROSS JOIN thr CROSS JOIN tot
GROUP BY kt, tot.n_groups, tot.n_rows
ORDER BY k_threshold
""",
    doc="k-anonymity audit (Sweeney 2002) over the quasi-identifier tuple "
    "(nation, market segment, $1000 balance band) — the re-identification "
    "screen a training-data release pipeline runs before publishing "
    "user-derived rows: a record is k-anonymous when at least k-1 others "
    "share its QI tuple. Reports, for each k in {2,5,10,20}, how many QI "
    "equivalence classes fall below k and how many rows they expose. "
    "Counts are exact BIGINTs; the one ratio is a NULLIF-guarded IEEE "
    "division. At 100 TB: one map-side-combined groupBy to QI-class "
    "scale, then a 4-row broadcast threshold fan-out over the class "
    "table — generalization search (coarser bands until min-k holds) "
    "re-runs the same aggregate per candidate lattice level.",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    g = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("k").cast("long").alias("n_rows"),
    )
    thr = spark.createDataFrame([(2,), (5,), (10,), (20,)], "kt long")
    below = F.when(F.col("k") < F.col("kt"), F.col("k"))
    return (
        g.crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(tot))
        .groupBy("kt", "n_groups", "n_rows")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("k") < F.col("kt"), 1)), F.lit(0)
            )
            .cast("long")
            .alias("n_groups_below"),
            F.coalesce(F.sum(below), F.lit(0)).cast("long").alias("n_rows_at_risk"),
        )
        .select(
            F.col("kt").alias("k_threshold"),
            "n_groups",
            "n_rows",
            "n_groups_below",
            "n_rows_at_risk",
            F.round(
                F.col("n_rows_at_risk").cast("double")
                / F.nullif(F.col("n_rows").cast("double"), F.lit(0.0)),
                6,
            ).alias("pct_rows_at_risk"),
        )
        .orderBy("k_threshold")
    )


#: common oracle prelude for the A/B experiment queries: per-user pre/post
#: exact cents + a deterministic md5 arm assignment, split at the exact
#: micros midpoint of the event stream.
_AB_USER_SQL = """
e AS (SELECT user_id, value,
             date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) AS tsm
      FROM events),
mid AS (SELECT (MIN(tsm) + MAX(tsm)) // 2 AS m FROM e),
u AS (
  SELECT user_id,
         CAST(concat('0x', substr(md5(concat('arm:', CAST(user_id AS VARCHAR))),
              1, 8)) AS BIGINT) % 2 AS arm,
         CAST(COALESCE(SUM(CASE WHEN tsm < m THEN
              CAST(ROUND(value, 4) AS DECIMAL(14,4)) END), 0) * 100 AS BIGINT)
           AS pre,
         CAST(COALESCE(SUM(CASE WHEN tsm >= m THEN
              CAST(ROUND(value, 4) AS DECIMAL(14,4)) END), 0) * 100 AS BIGINT)
           AS post,
         CAST(SUM(CASE WHEN tsm >= m THEN 1 ELSE 0 END) AS BIGINT) AS n_post
  FROM e CROSS JOIN mid GROUP BY user_id)
"""


@register(
    "ab_cuped_adjustment",
    f"""
WITH {_AB_USER_SQL.strip()},
gm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pre) AS BIGINT) AS sx, CAST(SUM(post) AS BIGINT) AS sy,
         CAST(SUM(pre*pre) AS BIGINT) AS sxx, CAST(SUM(pre*post) AS BIGINT) AS sxy
  FROM u),
am AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_a,
         CAST(SUM(pre) AS BIGINT) AS sx, CAST(SUM(post) AS BIGINT) AS sy,
         CAST(SUM(pre*pre) AS BIGINT) AS sxx,
         CAST(SUM(post*post) AS BIGINT) AS syy,
         CAST(SUM(pre*post) AS BIGINT) AS sxy
  FROM u GROUP BY arm)
SELECT arm, n_a AS n_users,
       ROUND(CAST(am.sy AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0, 4) AS mean_post,
       ROUND((CAST(am.sy AS DOUBLE)
              - (CAST(gm.n*gm.sxy - gm.sx*gm.sy AS DOUBLE)
                 / NULLIF(CAST(gm.n*gm.sxx - gm.sx*gm.sx AS DOUBLE), 0.0))
                * (CAST(am.sx AS DOUBLE)
                   - CAST(n_a AS DOUBLE) * (CAST(gm.sx AS DOUBLE) / CAST(gm.n AS DOUBLE))))
             / CAST(n_a AS DOUBLE) / 100.0, 4) AS mean_adjusted,
       ROUND((CAST(am.n_a*am.syy - am.sy*am.sy AS DOUBLE)
              / NULLIF(CAST(am.n_a AS DOUBLE) * CAST(am.n_a - 1 AS DOUBLE), 0.0))
             / 10000.0, 4) AS var_post,
       ROUND(((CAST(am.n_a*am.syy - am.sy*am.sy AS DOUBLE)
               - 2.0 * (CAST(gm.n*gm.sxy - gm.sx*gm.sy AS DOUBLE)
                        / NULLIF(CAST(gm.n*gm.sxx - gm.sx*gm.sx AS DOUBLE), 0.0))
                     * CAST(am.n_a*am.sxy - am.sx*am.sy AS DOUBLE)
               + (CAST(gm.n*gm.sxy - gm.sx*gm.sy AS DOUBLE)
                  / NULLIF(CAST(gm.n*gm.sxx - gm.sx*gm.sx AS DOUBLE), 0.0))
                 * (CAST(gm.n*gm.sxy - gm.sx*gm.sy AS DOUBLE)
                    / NULLIF(CAST(gm.n*gm.sxx - gm.sx*gm.sx AS DOUBLE), 0.0))
                 * CAST(am.n_a*am.sxx - am.sx*am.sx AS DOUBLE))
              / NULLIF(CAST(am.n_a AS DOUBLE) * CAST(am.n_a - 1 AS DOUBLE), 0.0))
             / 10000.0, 4) AS var_adjusted
FROM am CROSS JOIN gm
ORDER BY arm
""",
    doc="CUPED variance reduction (Deng et al. 2013) for an A/B readout: "
    "each user's post-period value is adjusted by theta*(pre - mean_pre) "
    "with theta = cov(pre,post)/var(pre) fit on ALL users (the standard "
    "pre-experiment-covariate control that cuts metric variance without "
    "bias). Users are split by a deterministic md5 arm hash; pre/post "
    "are exact DECIMAL-summed cents split at the exact micros midpoint "
    "of the stream. Every moment (global and per-arm) is an exact "
    "BIGINT sum; theta, the adjusted means, and both variances are ONE "
    "identical NULLIF-guarded IEEE expression tree over those exact "
    "operands — the adjusted variance uses var(y) - 2*theta*cov + "
    "theta^2*var(x), so no per-user adjusted column is ever "
    "materialized. At 100 TB: one user-keyed shuffle to per-user scale, "
    "then two map-side-combined moment aggregates (1 row global, 2 rows "
    "by arm).",
)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _ab_user_frame(spark, sf_dir)
    gm = u.agg(
        F.count(F.lit(1)).cast("long").alias("gn"),
        F.sum("pre").cast("long").alias("gsx"),
        F.sum("post").cast("long").alias("gsy"),
        F.sum(F.col("pre") * F.col("pre")).cast("long").alias("gsxx"),
        F.sum(F.col("pre") * F.col("post")).cast("long").alias("gsxy"),
    )
    am = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_a"),
        F.sum("pre").cast("long").alias("sx"),
        F.sum("post").cast("long").alias("sy"),
        F.sum(F.col("pre") * F.col("pre")).cast("long").alias("sxx"),
        F.sum(F.col("post") * F.col("post")).cast("long").alias("syy"),
        F.sum(F.col("pre") * F.col("post")).cast("long").alias("sxy"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    theta = (F.col("gn") * F.col("gsxy") - F.col("gsx") * F.col("gsy")).cast(
        "double"
    ) / F.nullif(
        (F.col("gn") * F.col("gsxx") - F.col("gsx") * F.col("gsx")).cast("double"),
        F.lit(0.0),
    )
    mean_pre = dd("gsx") / dd("gn")
    nn1 = F.nullif(dd("n_a") * (F.col("n_a") - 1).cast("double"), F.lit(0.0))
    var_post = (F.col("n_a") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    ) / nn1
    cov_a = (F.col("n_a") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx_a = (F.col("n_a") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_adj = (
        (F.col("n_a") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
        - F.lit(2.0) * theta * cov_a
        + theta * theta * varx_a
    ) / nn1
    return (
        am.crossJoin(F.broadcast(gm))
        .select(
            "arm",
            F.col("n_a").alias("n_users"),
            F.round(dd("sy") / dd("n_a") / 100.0, 4).alias("mean_post"),
            F.round(
                (dd("sy") - theta * (dd("sx") - dd("n_a") * mean_pre))
                / dd("n_a")
                / 100.0,
                4,
            ).alias("mean_adjusted"),
            F.round(var_post / 10000.0, 4).alias("var_post"),
            F.round(var_adj / 10000.0, 4).alias("var_adjusted"),
        )
        .orderBy("arm")
    )


def _ab_user_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _AB_USER_SQL: per-user (arm, pre, post, n_post)."""
    ev = load_table(spark, "events", sf_dir)
    e = ev.select(
        "user_id",
        "value",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        ).alias("tsm"),
    )
    mid = e.agg(F.expr("(MIN(tsm) + MAX(tsm)) DIV 2").alias("m"))
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("arm:"), F.col("user_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    dec = F.round(F.col("value"), 4).cast("decimal(14,4)")
    return (
        e.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            (
                F.coalesce(
                    F.sum(F.when(F.col("tsm") < F.col("m"), dec)), F.lit(0)
                )
                * 100
            )
            .cast("long")
            .alias("pre"),
            (
                F.coalesce(
                    F.sum(F.when(F.col("tsm") >= F.col("m"), dec)), F.lit(0)
                )
                * 100
            )
            .cast("long")
            .alias("post"),
            F.sum(F.when(F.col("tsm") >= F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("n_post"),
        )
        .select(
            "user_id",
            arm.alias("arm"),
            "pre",
            "post",
            "n_post",
        )
    )


#: z for the 95% two-sided delta-method interval — Python repr inlined
#: into both engines verbatim (the _WILSON_Z recipe).
_DELTA_Z = "1.959963984540054"


@register(
    "ab_delta_method_ratio",
    f"""
WITH {_AB_USER_SQL.strip()},
am AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(post) AS BIGINT) AS sx, CAST(SUM(n_post) AS BIGINT) AS sn,
         CAST(SUM(post*post) AS BIGINT) AS sxx,
         CAST(SUM(n_post*n_post) AS BIGINT) AS snn,
         CAST(SUM(post*n_post) AS BIGINT) AS sxn
  FROM u GROUP BY arm),
r AS (
  SELECT arm, n, sx, sn,
         CAST(sx AS DOUBLE) / NULLIF(CAST(sn AS DOUBLE), 0.0) AS ratio,
         (CAST(n*sxx - sx*sx AS DOUBLE)
          - 2.0 * (CAST(sx AS DOUBLE) / NULLIF(CAST(sn AS DOUBLE), 0.0))
                * CAST(n*sxn - sx*sn AS DOUBLE)
          + (CAST(sx AS DOUBLE) / NULLIF(CAST(sn AS DOUBLE), 0.0))
            * (CAST(sx AS DOUBLE) / NULLIF(CAST(sn AS DOUBLE), 0.0))
            * CAST(n*snn - sn*sn AS DOUBLE))
         / NULLIF(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE), 0.0) AS s2
  FROM am)
SELECT arm, n AS n_users,
       ROUND(ratio / 100.0, 4) AS revenue_per_event,
       ROUND(sqrt(s2 / CAST(n AS DOUBLE))
             / NULLIF(CAST(sn AS DOUBLE) / CAST(n AS DOUBLE), 0.0) / 100.0, 4)
         AS se,
       ROUND((ratio - {_DELTA_Z} * sqrt(s2 / CAST(n AS DOUBLE))
              / NULLIF(CAST(sn AS DOUBLE) / CAST(n AS DOUBLE), 0.0)) / 100.0, 4)
         AS ci_lo,
       ROUND((ratio + {_DELTA_Z} * sqrt(s2 / CAST(n AS DOUBLE))
              / NULLIF(CAST(sn AS DOUBLE) / CAST(n AS DOUBLE), 0.0)) / 100.0, 4)
         AS ci_hi
FROM r
ORDER BY arm
""",
    doc="Delta-method confidence interval for a RATIO metric (post-period "
    "revenue per event) per experiment arm — the standard error the "
    "naive per-event t-test gets wrong because events cluster within "
    "users (the randomization unit): Var(X̄/N̄) is first-order-expanded "
    "to (s_X² - 2R·s_XN + R²·s_N²)/(n·N̄²) from USER-level moments "
    "(Deng, Knoblich & Lu 2018). Same deterministic md5 arms and exact "
    "cents as ab_cuped_adjustment; every moment is an exact BIGINT sum, "
    "ratio/SE/bounds are one identical NULLIF-guarded IEEE tree with "
    "the z literal inlined verbatim in both engines. At 100 TB: one "
    "user-keyed shuffle, then a 2-row moment aggregate — the interval "
    "is map-side-combinable end to end.",
)
def ab_delta_method_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _ab_user_frame(spark, sf_dir)
    am = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("post").cast("long").alias("sx"),
        F.sum("n_post").cast("long").alias("sn"),
        F.sum(F.col("post") * F.col("post")).cast("long").alias("sxx"),
        F.sum(F.col("n_post") * F.col("n_post")).cast("long").alias("snn"),
        F.sum(F.col("post") * F.col("n_post")).cast("long").alias("sxn"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    ratio = dd("sx") / F.nullif(dd("sn"), F.lit(0.0))
    s2 = (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        - F.lit(2.0) * ratio * (F.col("n") * F.col("sxn") - F.col("sx") * F.col("sn")).cast("double")
        + ratio * ratio * (F.col("n") * F.col("snn") - F.col("sn") * F.col("sn")).cast("double")
    ) / F.nullif(dd("n") * (F.col("n") - 1).cast("double"), F.lit(0.0))
    z = float(_DELTA_Z)
    se = F.sqrt(s2 / dd("n")) / F.nullif(dd("sn") / dd("n"), F.lit(0.0))
    return am.select(
        "arm",
        F.col("n").alias("n_users"),
        F.round(ratio / 100.0, 4).alias("revenue_per_event"),
        F.round(se / 100.0, 4).alias("se"),
        F.round((ratio - F.lit(z) * se) / 100.0, 4).alias("ci_lo"),
        F.round((ratio + F.lit(z) * se) / 100.0, 4).alias("ci_hi"),
    ).orderBy("arm")


@register(
    "diag_spearman_rank_corr",
    """
WITH j AS (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS pv,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bv
  FROM orders JOIN customer ON o_custkey = c_custkey),
d1 AS (SELECT seg, pv, CAST(COUNT(*) AS BIGINT) AS c FROM j GROUP BY seg, pv),
r1 AS (SELECT seg, pv,
              2 * CAST(SUM(c) OVER (PARTITION BY seg ORDER BY pv) AS BIGINT)
                - c + 1 AS ra
       FROM d1),
d2 AS (SELECT seg, bv, CAST(COUNT(*) AS BIGINT) AS c FROM j GROUP BY seg, bv),
r2 AS (SELECT seg, bv,
              2 * CAST(SUM(c) OVER (PARTITION BY seg ORDER BY bv) AS BIGINT)
                - c + 1 AS rb
       FROM d2),
rr AS (SELECT j.seg, r1.ra, r2.rb
       FROM j JOIN r1 ON j.seg = r1.seg AND j.pv = r1.pv
              JOIN r2 ON j.seg = r2.seg AND j.bv = r2.bv),
m AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ra) AS BIGINT) AS sa, CAST(SUM(rb) AS BIGINT) AS sb,
             CAST(SUM(ra*ra) AS BIGINT) AS saa, CAST(SUM(rb*rb) AS BIGINT) AS sbb,
             CAST(SUM(ra*rb) AS BIGINT) AS sab
      FROM rr GROUP BY seg)
SELECT seg AS c_mktsegment, n,
       ROUND(CAST(n*sab - sa*sb AS DOUBLE)
             / NULLIF(sqrt(CAST(n*saa - sa*sa AS DOUBLE))
                      * sqrt(CAST(n*sbb - sb*sb AS DOUBLE)), 0.0), 6)
         AS spearman_rho
FROM m
ORDER BY c_mktsegment
""",
    doc="Spearman rank correlation between order value and the ordering "
    "customer's account balance, per market segment — the MONOTONE "
    "association screen that survives outliers and nonlinearity where "
    "Pearson (diag_correlation_matrix) does not. Tie-averaged ranks are "
    "computed on the VALUE DOMAIN (distinct cents + a cumulative-count "
    "window — the diag_mann_whitney_value restructuring, never a "
    "row-scale sort) and DOUBLED to stay integer (avg rank = 2*cum - c "
    "+ 1 in half-units); rank moments are exact BIGINT sums and the "
    "final rho is one NULLIF-guarded IEEE expression. At 100 TB: one "
    "fact join, two domain-scale rank tables joined back by value, one "
    "segment-keyed moment aggregate. Rank products bound int64 to ~2e9 "
    "rows/segment; past that the moment accumulators widen to "
    "DECIMAL(38,0) unchanged.",
)
def diag_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    j = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment", "c_acctbal")),
        orders.o_custkey == cust.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("pv"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bv"),
    )

    def rank_table(col: str, out: str) -> DataFrame:
        d = j.groupBy("seg", col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        w = Window.partitionBy("seg").orderBy(col)
        return d.select(
            F.col("seg").alias(f"seg_{out}"),
            F.col(col).alias(f"{col}_k"),
            (2 * F.sum("c").over(w).cast("long") - F.col("c") + 1).alias(out),
        )

    r1 = rank_table("pv", "ra")
    r2 = rank_table("bv", "rb")
    rr = (
        j.join(
            r1, (F.col("seg") == F.col("seg_ra")) & (F.col("pv") == F.col("pv_k"))
        )
        .join(r2, (F.col("seg") == F.col("seg_rb")) & (F.col("bv") == F.col("bv_k")))
        .select("seg", "ra", "rb")
    )
    m = rr.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ra").cast("long").alias("sa"),
        F.sum("rb").cast("long").alias("sb"),
        F.sum(F.col("ra") * F.col("ra")).cast("long").alias("saa"),
        F.sum(F.col("rb") * F.col("rb")).cast("long").alias("sbb"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("sab"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    ) * F.sqrt((F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double"))
    return m.select(
        F.col("seg").alias("c_mktsegment"),
        "n",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("spearman_rho"),
    ).orderBy("c_mktsegment")


@register(
    "diag_kruskal_wallis",
    """
WITH v AS (SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
d AS (SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS c
      FROM v GROUP BY event_type, cents),
dv AS (SELECT cents, CAST(SUM(c) AS BIGINT) AS ct FROM d GROUP BY cents),
cumv AS (SELECT cents, ct,
                CAST(SUM(ct) OVER (ORDER BY cents) AS BIGINT) AS cum
         FROM dv),
grp AS (
  SELECT d.event_type,
         CAST(SUM(d.c) AS BIGINT) AS n_j,
         CAST(SUM(d.c * (2 * cumv.cum - cumv.ct + 1)) AS BIGINT) AS r2_j
  FROM d JOIN cumv ON d.cents = cumv.cents
  GROUP BY d.event_type),
nn AS (SELECT CAST(SUM(n_j) AS BIGINT) AS n,
              CAST(COUNT(*) AS BIGINT) AS k FROM grp),
terms AS (
  SELECT CAST(ROUND((CAST(r2_j AS DOUBLE) / 2.0) * (CAST(r2_j AS DOUBLE) / 2.0)
                    / CAST(n_j AS DOUBLE), 6) AS DECIMAL(38,6)) AS t
  FROM grp),
ties AS (SELECT CAST(SUM(ct*ct*ct - ct) AS BIGINT) AS st FROM dv),
h AS (
  SELECT nn.n, nn.k,
         12.0 / (CAST(nn.n AS DOUBLE) * CAST(nn.n + 1 AS DOUBLE))
           * CAST((SELECT SUM(t) FROM terms) AS DOUBLE)
           - 3.0 * CAST(nn.n + 1 AS DOUBLE) AS h_raw,
         1.0 - CAST(ties.st AS DOUBLE)
             / NULLIF(CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
                      * CAST(nn.n AS DOUBLE) - CAST(nn.n AS DOUBLE), 0.0) AS cc
  FROM nn CROSS JOIN ties)
SELECT n AS n_rows, k AS n_groups, CAST(k - 1 AS BIGINT) AS df,
       ROUND(h_raw, 4) AS h_statistic,
       ROUND(h_raw / NULLIF(cc, 0.0), 4) AS h_tie_corrected
FROM h
""",
    doc="Kruskal-Wallis one-way rank test: does the event-value "
    "distribution differ across event types? The k-group generalization "
    "of diag_mann_whitney_value, with the same VALUE-DOMAIN layout: "
    "tie-averaged ranks come from distinct-cents counts + one global "
    "cumulative window (doubled to stay integer), per-group rank sums "
    "are exact BIGINTs, the per-group H terms are rounded once at 6dp "
    "and DECIMAL-summed (order-independent — a float sum across groups "
    "is engine-order-dependent), and the tie correction "
    "1 - Σ(t³-t)/(N³-N) uses exact integer tie counts. At 100 TB: one "
    "map-side-combined rollup to the value domain, windows on the "
    "bounded domain, a k-row group aggregate. The t³ sums bound int64 "
    "to ~2e6 distinct-value multiplicities; past that the accumulator "
    "widens to DECIMAL(38,0).",
)
def diag_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    d = v.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    dv = d.groupBy("cents").agg(F.sum("c").cast("long").alias("ct"))
    wc = Window.orderBy("cents")
    cumv = dv.select(
        "cents", "ct", F.sum("ct").over(wc).cast("long").alias("cum")
    )
    grp = (
        d.join(cumv, "cents")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n_j"),
            F.sum(F.col("c") * (2 * F.col("cum") - F.col("ct") + 1))
            .cast("long")
            .alias("r2_j"),
        )
    )
    nn = grp.agg(
        F.sum("n_j").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    term = F.round(
        (F.col("r2_j").cast("double") / 2.0)
        * (F.col("r2_j").cast("double") / 2.0)
        / F.col("n_j").cast("double"),
        6,
    ).cast("decimal(38,6)")
    terms = grp.select(term.alias("t")).agg(F.sum("t").cast("double").alias("ts"))
    ties = dv.agg(
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("st")
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    h_raw = (
        F.lit(12.0) / (dd("n") * (F.col("n") + 1).cast("double")) * F.col("ts")
        - F.lit(3.0) * (F.col("n") + 1).cast("double")
    )
    cc = F.lit(1.0) - dd("st") / F.nullif(
        dd("n") * dd("n") * dd("n") - dd("n"), F.lit(0.0)
    )
    return (
        nn.crossJoin(F.broadcast(terms))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_rows"),
            F.col("k").alias("n_groups"),
            (F.col("k") - 1).cast("long").alias("df"),
            F.round(h_raw, 4).alias("h_statistic"),
            F.round(h_raw / F.nullif(cc, F.lit(0.0)), 4).alias("h_tie_corrected"),
        )
    )


@register(
    "diag_levene_brown_forsythe",
    """
WITH v AS (SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
d AS (SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS c
      FROM v GROUP BY event_type, cents),
t AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM d GROUP BY event_type),
r AS (SELECT event_type, cents, c,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT)
               AS cum
      FROM d),
med AS (SELECT r.event_type,
               CAST(MIN(CASE WHEN cum >= (t.n + 1) // 2 THEN cents END)
                    AS BIGINT) AS m
        FROM r JOIN t ON r.event_type = t.event_type
        GROUP BY r.event_type),
z AS (SELECT d.event_type, ABS(d.cents - med.m) AS z, d.c
      FROM d JOIN med ON d.event_type = med.event_type),
gm AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_j,
              CAST(SUM(c * z) AS BIGINT) AS s_j,
              CAST(SUM(c * z * z) AS BIGINT) AS q_j
       FROM z GROUP BY event_type),
gt AS (SELECT CAST(SUM(n_j) AS BIGINT) AS n, CAST(SUM(s_j) AS BIGINT) AS s,
              CAST(COUNT(*) AS BIGINT) AS k,
              CAST(SUM(q_j) AS BIGINT) AS q
       FROM gm),
parts AS (SELECT CAST(ROUND(CAST(s_j AS DOUBLE) * CAST(s_j AS DOUBLE)
                            / CAST(n_j AS DOUBLE), 6) AS DECIMAL(38,6)) AS sq
          FROM gm),
comp AS (SELECT gt.n, gt.k,
                CAST((SELECT SUM(sq) FROM parts) AS DOUBLE) AS ssq,
                CAST(gt.s AS DOUBLE) * CAST(gt.s AS DOUBLE)
                  / CAST(gt.n AS DOUBLE) AS grand_sq,
                CAST(gt.q AS DOUBLE) AS q
         FROM gt)
SELECT n AS n_rows, k AS n_groups,
       CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
       ROUND((CAST(n - k AS DOUBLE) * (ssq - grand_sq))
             / NULLIF(CAST(k - 1 AS DOUBLE) * (q - ssq), 0.0), 4)
         AS f_statistic
FROM comp
""",
    doc="Brown-Forsythe (median-centered Levene) test for equal variances "
    "across event types — the robust heteroscedasticity screen run "
    "before trusting a pooled-variance comparison (the median centering "
    "keeps the test honest under the skewed value distributions real "
    "event streams have). Group medians are EXACT lower medians from "
    "the value-domain cumulative window (percentile_disc semantics, "
    "never engine interpolation); absolute deviations and all ANOVA "
    "moments are exact BIGINTs on the (type, cents) domain; per-group "
    "S²/n terms are rounded once at 6dp and DECIMAL-summed (the "
    "diag_kruskal_wallis recipe — a float sum across groups is engine-"
    "order-dependent); the F ratio is one NULLIF-guarded IEEE "
    "expression. At 100 TB: one map-side-combined rollup to the value "
    "domain, per-type windows on the bounded domain, then k-row "
    "arithmetic.",
)
def diag_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    d = v.groupBy("event_type", "cents").agg(F.count(F.lit(1)).cast("long").alias("c"))
    t = d.groupBy("event_type").agg(F.sum("c").cast("long").alias("n"))
    wc = Window.partitionBy("event_type").orderBy("cents")
    r = d.select(
        "event_type", "cents", "c", F.sum("c").over(wc).cast("long").alias("cum")
    )
    med = (
        r.join(t, "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("cents"))
            )
            .cast("long")
            .alias("m")
        )
    )
    z = d.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("cents") - F.col("m")).alias("z"), "c"
    )
    gm = z.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n_j"),
        F.sum(F.col("c") * F.col("z")).cast("long").alias("s_j"),
        F.sum(F.col("c") * F.col("z") * F.col("z")).cast("long").alias("q_j"),
    )
    gt = gm.agg(
        F.sum("n_j").cast("long").alias("n"),
        F.sum("s_j").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("q_j").cast("long").alias("q"),
    )
    sq = F.round(
        F.col("s_j").cast("double")
        * F.col("s_j").cast("double")
        / F.col("n_j").cast("double"),
        6,
    ).cast("decimal(38,6)")
    parts = gm.select(sq.alias("sq")).agg(F.sum("sq").cast("double").alias("ssq"))
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    grand_sq = dd("s") * dd("s") / dd("n")
    f_stat = ((F.col("n") - F.col("k")).cast("double") * (F.col("ssq") - grand_sq)) / F.nullif(
        (F.col("k") - 1).cast("double") * (dd("q") - F.col("ssq")), F.lit(0.0)
    )
    return (
        gt.crossJoin(F.broadcast(parts))
        .select(
            F.col("n").alias("n_rows"),
            F.col("k").alias("n_groups"),
            (F.col("k") - 1).cast("long").alias("df1"),
            (F.col("n") - F.col("k")).cast("long").alias("df2"),
            F.round(f_stat, 4).alias("f_statistic"),
        )
    )


@register(
    "privacy_l_diversity",
    """
WITH qi AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band
  FROM customer),
sens AS (
  SELECT qi.c_nationkey, qi.c_mktsegment, qi.bal_band, o.o_orderpriority
  FROM qi JOIN orders o ON o.o_custkey = qi.c_custkey),
cls AS (
  SELECT c_nationkey, c_mktsegment, bal_band,
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS l_distinct,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM sens GROUP BY c_nationkey, c_mktsegment, bal_band)
SELECT l_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows
FROM cls
GROUP BY l_distinct
ORDER BY l_distinct
""",
    doc="l-diversity audit (Machanavajjhala et al. 2007) — the attack "
    "k-anonymity misses: a QI equivalence class whose SENSITIVE "
    "attribute (order priority of the customers' orders) takes only one "
    "value leaks it to anyone who can place a target in the class, no "
    "matter how large k is. Reports the histogram of QI classes (same "
    "nation × segment × $1000-band tuple as privacy_k_anonymity) by "
    "their count of distinct sensitive values; classes at l_distinct=1 "
    "are the disclosure set. Exact BIGINT counts throughout. At "
    "100 TB: one fact join, one map-side-combined distinct-count "
    "rollup to QI-class scale, one l-sized histogram.",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    qi = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    )
    sens = orders.join(
        F.broadcast(qi), orders.o_custkey == qi.c_custkey
    ).select("c_nationkey", "c_mktsegment", "bal_band", "o_orderpriority")
    cls = sens.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.countDistinct("o_orderpriority").cast("long").alias("l_distinct"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    return (
        cls.groupBy("l_distinct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
        .orderBy("l_distinct")
    )


@register(
    "ab_two_proportion_ztest",
    f"""
WITH {_AB_USER_SQL.strip()},
am AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN post > 0 THEN 1 ELSE 0 END) AS BIGINT) AS s
  FROM u GROUP BY arm),
w AS (
  SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
         MAX(CASE WHEN arm = 0 THEN s END) AS s0,
         MAX(CASE WHEN arm = 1 THEN n END) AS n1,
         MAX(CASE WHEN arm = 1 THEN s END) AS s1
  FROM am)
SELECT n0, s0, n1, s1,
       ROUND(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS p0,
       ROUND(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS p1,
       ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             / NULLIF(sqrt((CAST(s0 + s1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 - CAST(s0 + s1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))),
                0.0), 4) AS z_statistic,
       CAST(CASE WHEN ABS((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                  / NULLIF(sqrt((CAST(s0 + s1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 - CAST(s0 + s1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))),
                    0.0)) > {_DELTA_Z} THEN 1 ELSE 0 END AS BIGINT)
         AS significant_95
FROM w
""",
    doc="Pooled two-proportion z-test on post-period conversion (any "
    "post-midpoint activity) between the deterministic md5 experiment "
    "arms — the binary-outcome member of the A/B family next to "
    "ab_cuped_adjustment (continuous), ab_delta_method_ratio (ratio) "
    "and ab_sprt_monitor (sequential). Counts are exact BIGINTs; p0, "
    "p1, the pooled SE and z are one identical NULLIF-guarded IEEE "
    "tree with the 1.96 critical value inlined as the shared repr "
    "literal. At 100 TB: one user-keyed shuffle, a 2-row conditional "
    "aggregate, then constant arithmetic — fully map-side-combinable.",
)
def ab_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _ab_user_frame(spark, sf_dir)
    am = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("post") > 0, 1).otherwise(0)).cast("long").alias("s"),
    )
    w = am.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("s"))).alias("s1"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    p0 = dd("s0") / dd("n0")
    p1 = dd("s1") / dd("n1")
    pp = (F.col("s0") + F.col("s1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / dd("n0") + F.lit(1.0) / dd("n1")))
    z = (p1 - p0) / F.nullif(se, F.lit(0.0))
    return w.select(
        "n0",
        "s0",
        "n1",
        "s1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        F.round(z, 4).alias("z_statistic"),
        F.when(F.abs(z) > float(_DELTA_Z), 1)
        .otherwise(0)
        .cast("long")
        .alias("significant_95"),
    )


#: z for 80% power (one-sided 0.84162...) — Python repr inlined verbatim.
_POWER_ZB = "0.8416212335729143"


@register(
    "ab_power_analysis",
    f"""
WITH {_AB_USER_SQL.strip()},
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(post) AS BIGINT) AS sy,
         CAST(SUM(post*post) AS BIGINT) AS syy
  FROM u),
mde AS (SELECT CAST(unnest([1, 2, 5, 10]) AS BIGINT) AS mde_pct)
SELECT mde_pct, m.n AS n_users_observed,
       ROUND(CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE) / 100.0, 4) AS mean_post,
       ROUND(sqrt(CAST(m.n*m.syy - m.sy*m.sy AS DOUBLE)
                  / NULLIF(CAST(m.n AS DOUBLE) * CAST(m.n - 1 AS DOUBLE), 0.0))
             / 100.0, 4) AS sd_post,
       CAST(CEIL(2.0 * ({_DELTA_Z} + {_POWER_ZB}) * ({_DELTA_Z} + {_POWER_ZB})
                 * (CAST(m.n*m.syy - m.sy*m.sy AS DOUBLE)
                    / NULLIF(CAST(m.n AS DOUBLE) * CAST(m.n - 1 AS DOUBLE), 0.0))
                 / NULLIF((CAST(mde_pct AS DOUBLE) / 100.0
                           * CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE))
                          * (CAST(mde_pct AS DOUBLE) / 100.0
                             * CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE)), 0.0))
            AS BIGINT) AS n_per_arm_required
FROM m CROSS JOIN mde
ORDER BY mde_pct
""",
    doc="A/B sample-size (power) analysis from the observed metric "
    "distribution: for each minimum-detectable-effect (1/2/5/10% of the "
    "current post-period mean), the required users per arm at "
    "alpha=0.05 two-sided / 80% power via the standard normal "
    "approximation n = 2(z_a+z_b)^2 sigma^2 / delta^2 — the pre-launch "
    "planning twin of ab_two_proportion_ztest's post-hoc verdict. "
    "Variance comes from exact BIGINT cents moments; both z constants "
    "are inlined repr literals; each row is one identical NULLIF-"
    "guarded IEEE tree ending in a single CEIL. At 100 TB: one user-"
    "keyed shuffle, a 1-row moment aggregate, a 4-row broadcast MDE "
    "grid.",
)
def ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _ab_user_frame(spark, sf_dir)
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("post").cast("long").alias("sy"),
        F.sum(F.col("post") * F.col("post")).cast("long").alias("syy"),
    )
    mde = spark.createDataFrame([(1,), (2,), (5,), (10,)], "mde_pct long")
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    var = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    ) / F.nullif(dd("n") * (F.col("n") - 1).cast("double"), F.lit(0.0))
    mean = dd("sy") / dd("n")
    delta = dd("mde_pct") / 100.0 * mean
    zsum = float(_DELTA_Z) + float(_POWER_ZB)
    n_req = F.ceil(
        F.lit(2.0) * F.lit(zsum) * F.lit(zsum) * var
        / F.nullif(delta * delta, F.lit(0.0))
    ).cast("long")
    return (
        m.crossJoin(F.broadcast(mde))
        .select(
            "mde_pct",
            F.col("n").alias("n_users_observed"),
            F.round(mean / 100.0, 4).alias("mean_post"),
            F.round(F.sqrt(var) / 100.0, 4).alias("sd_post"),
            n_req.alias("n_per_arm_required"),
        )
        .orderBy("mde_pct")
    )


def _qq_z_literals() -> dict[int, str]:
    """Standard-normal inverse-CDF values at p = 5..95 step 5, computed
    once from the stdlib (exactly-once Python) and inlined as the SAME
    repr literals into both engines (the _WILSON_Z recipe — engine
    inverse-CDFs would be a cross-engine ulp risk)."""
    from statistics import NormalDist

    return {p: repr(NormalDist().inv_cdf(p / 100)) for p in range(5, 100, 5)}


_QQ_Z = _qq_z_literals()


def _qq_z_case(col: str) -> str:
    whens = " ".join(f"WHEN {p} THEN {z}" for p, z in _QQ_Z.items())
    return f"CASE {col} {whens} END"


@register(
    "diag_qq_normal_points",
    f"""
WITH v AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents*cents) AS BIGINT) AS q FROM v),
d AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY cents),
r AS (SELECT cents, CAST(SUM(c) OVER (ORDER BY cents) AS BIGINT) AS cum FROM d),
ps AS (SELECT CAST(unnest(range(1, 20)) * 5 AS BIGINT) AS p),
ks AS (SELECT p, (p * m.n + 99) // 100 AS k FROM ps CROSS JOIN m),
sq AS (SELECT ks.p, CAST(MIN(CASE WHEN r.cum >= ks.k THEN r.cents END) AS BIGINT)
              AS sample_cents
       FROM r CROSS JOIN ks GROUP BY ks.p)
SELECT sq.p AS pct,
       ROUND(CAST(sq.sample_cents AS DOUBLE) / 100.0, 2) AS sample_q,
       ROUND((CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE)
              + ({_qq_z_case("sq.p")})
                * sqrt((CAST(m.n AS DOUBLE) * CAST(m.q AS DOUBLE)
                        - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)))
                / CAST(m.n AS DOUBLE)) / 100.0, 2) AS normal_q
FROM sq CROSS JOIN m
ORDER BY pct
""",
    doc="Normal Q-Q plot points (19 ventiles): exact sample quantiles of "
    "the event-value distribution next to the fitted-normal quantiles "
    "mu + z_p*sigma — the one-look normality diagnostic behind every "
    "'can I use a z-test here' decision. Sample quantiles use the "
    "value-domain rank-selection recipe (percentile_disc semantics, "
    "k = ceil(p*n/100), never engine interpolation); z_p values are "
    "stdlib inverse-CDF repr literals inlined identically in both "
    "engines; mu/sigma come from exact BIGINT moments in one identical "
    "IEEE tree. At 100 TB: one map-side moment pass + one value-domain "
    "rollup; rank selection joins the 19-row broadcast target table.",
)
def diag_qq_normal_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v = ev.filter(F.col("value").isNotNull()).select(
        F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    m = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("q"),
    )
    d = v.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wc = Window.orderBy("cents")
    r = d.select("cents", F.sum("c").over(wc).cast("long").alias("cum"))
    ps = spark.range(1, 20).select((F.col("id") * 5).cast("long").alias("p"))
    ks = ps.crossJoin(F.broadcast(m)).select(
        "p", F.expr("(p * n + 99) DIV 100").alias("k")
    )
    sq = (
        r.crossJoin(F.broadcast(ks))
        .groupBy("p")
        .agg(
            F.min(F.when(F.col("cum") >= F.col("k"), F.col("cents")))
            .cast("long")
            .alias("sample_cents")
        )
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    zc = F.expr(_qq_z_case("p"))
    sigma = F.sqrt(dd("n") * dd("q") - dd("s") * dd("s")) / dd("n")
    return (
        sq.crossJoin(F.broadcast(m))
        .select(
            F.col("p").alias("pct"),
            F.round(dd("sample_cents") / 100.0, 2).alias("sample_q"),
            F.round((dd("s") / dd("n") + zc * sigma) / 100.0, 2).alias("normal_q"),
        )
        .orderBy("pct")
    )


#: chi-square 95% critical value at 1 df — repr literal, both engines.
_SRM_CHI2_95 = "3.841458820694124"


@register(
    "ab_srm_check",
    f"""
WITH {_AB_USER_SQL.strip()},
am AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY arm),
w AS (SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
             MAX(CASE WHEN arm = 1 THEN n END) AS n1 FROM am)
SELECT n0, n1,
       ROUND(CAST(n0 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE), 6) AS share_arm0,
       ROUND(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
             / NULLIF(CAST(n0 + n1 AS DOUBLE), 0.0), 4) AS chi2_statistic,
       CAST(CASE WHEN CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                      / NULLIF(CAST(n0 + n1 AS DOUBLE), 0.0) > {_SRM_CHI2_95}
                 THEN 1 ELSE 0 END AS BIGINT) AS srm_detected
FROM w
""",
    doc="Sample-ratio-mismatch check — the FIRST gate on any A/B readout: "
    "a chi-square goodness-of-fit test of the observed arm sizes "
    "against the designed 50/50 split (for equal expected counts the "
    "statistic reduces EXACTLY to (n0-n1)²/(n0+n1) — pure integer "
    "numerator, one NULLIF-guarded division). An SRM means the "
    "assignment or logging pipeline is biased and every downstream "
    "metric comparison is invalid (Fabijan et al. 2019). Uses the "
    "shared deterministic md5 arms; the 3.84 critical value (chi², "
    "1 df, 95%) is a repr literal inlined in both engines. At 100 TB: "
    "one user-keyed shuffle, a 2-row count, constant arithmetic.",
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _ab_user_frame(spark, sf_dir)
    am = u.groupBy("arm").agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = am.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    chi2 = (
        (F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))
    ).cast("double") / F.nullif((F.col("n0") + F.col("n1")).cast("double"), F.lit(0.0))
    return w.select(
        "n0",
        "n1",
        F.round(dd("n0") / (F.col("n0") + F.col("n1")).cast("double"), 6).alias(
            "share_arm0"
        ),
        F.round(chi2, 4).alias("chi2_statistic"),
        F.when(chi2 > float(_SRM_CHI2_95), 1)
        .otherwise(0)
        .cast("long")
        .alias("srm_detected"),
    )


@register(
    "diag_ols_influence",
    """
WITH daily AS (
  SELECT event_type,
         date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00',
                   date_trunc('day', ts)) // 86400000000 AS x,
         CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(14,4))) * 100 AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, date_trunc('day', ts)),
m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(x*y) AS BIGINT) AS sxy,
         CAST(SUM(y*y) AS BIGINT) AS syy
  FROM daily GROUP BY event_type),
sc AS (
  SELECT event_type, n, sx, sy, sxx, sxy, syy,
         CAST(n*sxy - sx*sy AS DOUBLE) / NULLIF(CAST(n*sxx - sx*sx AS DOUBLE), 0.0) AS b,
         (CAST(n*syy - sy*sy AS DOUBLE)
          - (CAST(n*sxy - sx*sy AS DOUBLE)
             / NULLIF(CAST(n*sxx - sx*sx AS DOUBLE), 0.0))
            * (CAST(n*sxy - sx*sy AS DOUBLE)
               / NULLIF(CAST(n*sxx - sx*sx AS DOUBLE), 0.0))
            * CAST(n*sxx - sx*sx AS DOUBLE) / CAST(n AS DOUBLE))
         / CAST(n AS DOUBLE) / NULLIF(CAST(n - 2 AS DOUBLE), 0.0) AS s2
  FROM m),
pts AS (
  SELECT d.event_type, d.x, d.y, sc.n,
         1.0 / CAST(sc.n AS DOUBLE)
           + CAST((sc.n * d.x - sc.sx) * (sc.n * d.x - sc.sx) AS DOUBLE)
             / NULLIF(CAST(sc.n AS DOUBLE) * CAST(sc.n*sc.sxx - sc.sx*sc.sx AS DOUBLE),
                      0.0) AS h,
         CAST(d.y AS DOUBLE)
           - (CAST(sc.sy AS DOUBLE) / CAST(sc.n AS DOUBLE)
              - sc.b * CAST(sc.sx AS DOUBLE) / CAST(sc.n AS DOUBLE))
           - sc.b * CAST(d.x AS DOUBLE) AS e,
         sc.s2
  FROM daily d JOIN sc ON d.event_type = sc.event_type),
cooks AS (
  SELECT event_type, x, y,
         ROUND(h, 6) AS leverage,
         ROUND(e * e * h
               / NULLIF(2.0 * s2 * (1.0 - h) * (1.0 - h), 0.0), 6) AS cooks_d
  FROM pts),
ranked AS (
  SELECT event_type, x, y, leverage, cooks_d,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cooks_d DESC, x) AS pos
  FROM cooks)
SELECT event_type, CAST(x AS BIGINT) AS day_index,
       ROUND(CAST(y AS DOUBLE) / 100.0, 2) AS daily_value,
       leverage, cooks_d, CAST(pos AS BIGINT) AS pos
FROM ranked WHERE pos <= 2
ORDER BY event_type, pos
""",
    doc="OLS influence diagnostics (leverage + Cook's distance) on each "
    "type's daily-value trend fit: the top-2 days whose removal would "
    "most move the regression — the screen that separates 'trend is "
    "real' from 'trend is two weird days' before anyone acts on "
    "diag_groupwise_ols' slopes. Everything derives from ONE exact "
    "BIGINT moment pass: leverage h = 1/n + (nx-Sx)²/(n·Sxx_c), "
    "residuals from the closed-form fit, s² = (Syy_c - b²Sxx_c)/(n(n-2)) "
    "— identical NULLIF-guarded IEEE trees both engines, Cook's D "
    "rounded once before the (D desc, day) ranking so the pick is "
    "deterministic. At 100 TB: one daily rollup, a type-scale moment "
    "aggregate broadcast back, day-domain windows.",
)
def diag_ols_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("dday"))
        .agg(
            (F.sum(F.round(F.col("value"), 4).cast("decimal(14,4)")) * 100)
            .cast("long")
            .alias("y")
        )
        .select(
            "event_type",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00',"
                " dday) DIV 86400000000"
            ).alias("x"),
            "y",
        )
    )
    daily = track(daily.persist())
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    sxx_n = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / F.nullif(sxx_n, F.lit(0.0))
    s2 = (
        (
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            - b * b * sxx_n / dd("n")
        )
        / dd("n")
        / F.nullif((F.col("n") - 2).cast("double"), F.lit(0.0))
    )
    sc = m.select("event_type", "n", "sx", "sy", "sxx", b.alias("b"), s2.alias("s2"))
    pts = daily.join(F.broadcast(sc), "event_type")
    h = F.lit(1.0) / dd("n") + (
        (F.col("n") * F.col("x") - F.col("sx"))
        * (F.col("n") * F.col("x") - F.col("sx"))
    ).cast("double") / F.nullif(
        dd("n") * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
        F.lit(0.0),
    )
    e = (
        dd("y")
        - (dd("sy") / dd("n") - F.col("b") * dd("sx") / dd("n"))
        - F.col("b") * dd("x")
    )
    cooks = pts.select(
        "event_type",
        "x",
        "y",
        F.round(h, 6).alias("leverage"),
        F.round(
            e * e * h
            / F.nullif(
                F.lit(2.0) * F.col("s2") * (F.lit(1.0) - h) * (F.lit(1.0) - h),
                F.lit(0.0),
            ),
            6,
        ).alias("cooks_d"),
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("cooks_d"), "x")
    return (
        cooks.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 2)
        .select(
            "event_type",
            F.col("x").cast("long").alias("day_index"),
            F.round(dd("y") / 100.0, 2).alias("daily_value"),
            "leverage",
            "cooks_d",
            F.col("pos").cast("long").alias("pos"),
        )
        .orderBy("event_type", "pos")
    )


# --------------------------------------------------------------------------
# Lorenz curve points — the distributional view behind diag_gini_
# concentration's single number: cumulative spend share vs cumulative
# customer share at exact population deciles.
# --------------------------------------------------------------------------

_LORENZ_TILES = 10


@register(
    "diag_lorenz_curve",
    f"""
WITH spend AS (
  SELECT c.c_custkey,
         CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(20,2))), 0) * 100
              AS BIGINT) AS cents
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey),
ranked AS (
  SELECT cents, CAST(ntile({_LORENZ_TILES}) OVER (ORDER BY cents, c_custkey)
                     AS BIGINT) AS decile
  FROM spend),
d AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM ranked GROUP BY decile),
t AS (SELECT CAST(SUM(n_customers) AS BIGINT) AS tot_n,
             CAST(SUM(cents) AS BIGINT) AS tot_cents FROM d)
SELECT decile, n_customers,
       CAST(ROUND(cents / 100.0, 2) AS DOUBLE) AS decile_spend,
       ROUND(CAST(SUM(n_customers) OVER (ORDER BY decile) AS DOUBLE)
             / CAST(tot_n AS DOUBLE), 6) AS cum_cust_share,
       ROUND(CAST(SUM(cents) OVER (ORDER BY decile) AS DOUBLE)
             / NULLIF(CAST(tot_cents AS DOUBLE), 0.0), 6) AS cum_spend_share
FROM d CROSS JOIN t
ORDER BY decile
""",
    doc=f"Lorenz curve at {_LORENZ_TILES} population deciles of customer "
    "spend (zero-order customers included at x=0 via the LEFT JOIN, "
    "exactly diag_gini_concentration's population) — the curve whose "
    "area deficit IS the Gini: each point is (cumulative customer "
    "share, cumulative spend share) after sorting customers by spend "
    "ascending. Spends are exact DECIMAL sums converted to BIGINT "
    "cents before any further arithmetic; the decile cut is exact "
    "ntile over the unique (cents, custkey) composite; shares are "
    "identical IEEE divisions of exact integers. Spark side replaces "
    "the oracle's single-partition ntile window with operators/"
    "packing.global_ntile (quantile-edge range buckets + per-bucket "
    "row_number + broadcast prefix offsets) — no global sort at any "
    "scale; the cumulative window then runs on the 10-row decile "
    "frame. At 100 TB: one custkey shuffle for the spend rollup, one "
    "range-bucket shuffle for the cut, constant-size everything after.",
)
def diag_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logflow.operators.cache import track
    from logflow.operators.packing import global_ntile

    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    spend = (
        cust.join(
            orders.select(F.col("o_custkey").alias("c_custkey"), "o_totalprice"),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey")
        .agg(
            (
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(20,2)")),
                    F.lit(0).cast("decimal(20,2)"),
                )
                * 100
            )
            .cast("long")
            .alias("cents")
        )
    )
    # eager-persist above the fork: spend feeds global_ntile's
    # approxQuantile probe + offsets branch + main branch — unpersisted,
    # the customer⋈orders rollup re-executes 3× (r9 ADVICE).
    spend = track(spend.persist())
    spend.count()
    tiled = global_ntile(spend, ["cents", "c_custkey"], _LORENZ_TILES, "decile")
    d = tiled.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
    )
    # 10-row frame feeding the totals agg AND the output branch: left
    # lazy, both branches re-ran the ntile window + rollup over the
    # persisted spend (interleaved A/B ~9.7 vs ~7.2 s)
    d = d.coalesce(1).localCheckpoint(eager=True)
    t = d.agg(
        F.sum("n_customers").cast("long").alias("tot_n"),
        F.sum("cents").cast("long").alias("tot_cents"),
    )
    cum_w = Window.orderBy("decile")  # 10-row frame: bounded window
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n_customers",
            F.round(F.col("cents") / F.lit(100.0), 2).cast("double").alias(
                "decile_spend"
            ),
            F.round(
                F.sum("n_customers").over(cum_w).cast("double")
                / F.col("tot_n").cast("double"),
                6,
            ).alias("cum_cust_share"),
            F.round(
                F.sum("cents").over(cum_w).cast("double")
                / F.nullif(F.col("tot_cents").cast("double"), F.lit(0.0)),
                6,
            ).alias("cum_spend_share"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Delete-a-group jackknife — the variance estimate for the global mean
# when rows arrive in G natural clusters (nations): leave one group out,
# recompute, spread of the G replicates estimates the sampling variance.
# --------------------------------------------------------------------------

_JK_SCALE = 1_000_000  # replicate means rounded to 1e-6 cents fixed point


@register(
    "diag_jackknife_variance",
    f"""
WITH o AS (
  SELECT c.c_nationkey AS grp,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(cents) AS BIGINT) AS s_g
      FROM o GROUP BY grp),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS gg, CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(s_g) AS BIGINT) AS s FROM g),
reps AS (
  SELECT CAST(ROUND(CAST(s - s_g AS DOUBLE) / CAST(n - n_g AS DOUBLE)
                    * {_JK_SCALE}, 0) AS BIGINT) AS theta_fp
  FROM g CROSS JOIN tot),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS gg,
         CAST(SUM(theta_fp) AS BIGINT) AS st,
         SUM(CAST(theta_fp AS DECIMAL(20,0)) * CAST(theta_fp AS DECIMAL(20,0)))
           AS stt
  FROM reps)
SELECT m.gg AS n_groups, tot.n AS n_rows,
       ROUND(CAST(tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE) / 100.0, 6)
         AS mean_price,
       ROUND(CAST(m.st AS DOUBLE) / CAST(m.gg AS DOUBLE) / {_JK_SCALE}.0
             / 100.0, 6) AS jack_mean_price,
       ROUND(sqrt(CAST(m.gg - 1 AS DOUBLE) / CAST(m.gg AS DOUBLE)
                  * (CAST(m.gg AS DOUBLE) * CAST(stt AS DOUBLE)
                     - CAST(m.st AS DOUBLE) * CAST(m.st AS DOUBLE))
                  / (CAST(m.gg AS DOUBLE) * CAST(m.gg AS DOUBLE)))
             / {_JK_SCALE}.0 / 100.0, 6) AS jackknife_se
FROM m CROSS JOIN tot
""",
    doc="Delete-a-group jackknife standard error of the mean order price, "
    "groups = customer nations (the survey-statistics variance recipe "
    "when rows cluster naturally and a delete-one jackknife would need "
    "N replicates): each replicate mean (S-s_g)/(N-n_g) is ONE "
    "identical IEEE division of exact BIGINT cents, rounded once to "
    "1e-6 fixed point; the spread uses the moment identity "
    "G*sum(t^2)-(sum t)^2 over DECIMAL(20,0)-widened products (int128 "
    "in DuckDB per the width>18 rule — theta_fp^2 ~ 1e22 overflows "
    "int64) so the variance numerator is EXACT and the final sqrt is "
    "one identical IEEE expression. At 100 TB: one fact join + one "
    "group-scale rollup; replicates are G-scale arithmetic, never a "
    "second data pass — the resampling-free alternative to "
    "diag_bootstrap_ci's Poisson replicates.",
)
def diag_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logflow.operators.cache import track

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    o = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
        "o_custkey",
    ).select(
        F.col("c_nationkey").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    # eager-persist above the fork: g (group-scale, ~25 rows) feeds the tot
    # aggregate AND the reps projection, and tot itself is broadcast twice
    # — unpersisted, the orders⋈customer rollup re-executes per branch
    # (r9 ADVICE).
    g = track(
        o.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("cents").cast("long").alias("s_g"),
        )
        .coalesce(1)
        .persist()
    )
    g.count()
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("gg"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
    )
    reps = g.crossJoin(F.broadcast(tot)).select(
        F.round(
            (F.col("s") - F.col("s_g")).cast("double")
            / (F.col("n") - F.col("n_g")).cast("double")
            * _JK_SCALE,
            0,
        )
        .cast("long")
        .alias("theta_fp")
    )
    m = reps.agg(
        F.count(F.lit(1)).cast("long").alias("gg"),
        F.sum("theta_fp").cast("long").alias("st"),
        F.sum(
            F.col("theta_fp").cast("decimal(20,0)")
            * F.col("theta_fp").cast("decimal(20,0)")
        ).alias("stt"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    ggd = dd("gg")
    var_num = ggd * dd("stt") - dd("st") * dd("st")
    return m.crossJoin(F.broadcast(tot.select("n", "s"))).select(
        F.col("gg").alias("n_groups"),
        F.col("n").alias("n_rows"),
        F.round(dd("s") / dd("n") / F.lit(100.0), 6).alias("mean_price"),
        F.round(
            dd("st") / ggd / F.lit(float(_JK_SCALE)) / F.lit(100.0), 6
        ).alias("jack_mean_price"),
        F.round(
            F.sqrt((ggd - 1) / ggd * var_num / (ggd * ggd))
            / F.lit(float(_JK_SCALE))
            / F.lit(100.0),
            6,
        ).alias("jackknife_se"),
    )


# --------------------------------------------------------------------------
# t-closeness — the third rung of the privacy-audit ladder after
# k-anonymity (class sizes) and l-diversity (distinct sensitive values):
# does any QI class' SENSITIVE-VALUE DISTRIBUTION differ too much from
# the population's? EMD over the ordered balance bands.
# --------------------------------------------------------------------------

_TCL_BANDS = 6  # floor((acctbal + 1000) / 2000): TPC-H balances -> 0..5


def _tcl_cols(prefix: str) -> str:
    return ", ".join(
        f"CAST(SUM(CASE WHEN band = {j} THEN 1 ELSE 0 END) AS BIGINT) AS {prefix}{j}"
        for j in range(_TCL_BANDS)
    )


def _tcl_emd_terms() -> str:
    """|r_0| + ... + |r_(m-2)| where r_j = sum_(k<=j) (c_k*N - t_k*n_g).

    Written as explicit left-associated sums of the 6 fixed band
    columns — no window, no float until the single final division."""
    runs = []
    for j in range(_TCL_BANDS - 1):
        runs.append(
            "ABS(" + " + ".join(f"(c{k} * n - t{k} * n_g)" for k in range(j + 1)) + ")"
        )
    return " + ".join(runs)


@register(
    "privacy_t_closeness",
    f"""
WITH s AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR((c_acctbal + 1000.0) / 2000.0) AS BIGINT) AS band
  FROM customer),
g AS (SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_g,
             {_tcl_cols("c")}
      FROM s GROUP BY c_nationkey, c_mktsegment),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, {_tcl_cols("t")} FROM s)
SELECT c_nationkey, c_mktsegment, n_g,
       CAST({_tcl_emd_terms()} AS BIGINT) AS emd_num,
       ROUND(CAST({_tcl_emd_terms()} AS DOUBLE)
             / ({_TCL_BANDS - 1}.0 * CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE)),
             6) AS t_closeness
FROM g CROSS JOIN tot
ORDER BY t_closeness DESC, c_nationkey, c_mktsegment
LIMIT 40
""",
    doc="t-closeness audit (Li/Li/Venkatasubramanian 2007) over the "
    "(nation, segment) QI classes with the ORDERED sensitive attribute "
    f"band = floor((acctbal+1000)/2000) ({_TCL_BANDS} bands): per class, "
    "the Earth-Mover's Distance between the class' band distribution "
    "and the population's, EMD_ordered = (1/(m-1)) * sum_j |running "
    "prefix diff| — completes the privacy ladder after "
    "privacy_k_anonymity (sizes) and privacy_l_diversity (distinct "
    "counts), catching classes that are large AND diverse yet skewed. "
    "The prefix diffs are computed over common denominators (c_k*N - "
    "t_k*n_g, exact BIGINTs; bounded by n_g*N*m ~ 1e11 at sf0.1) as "
    "explicit left-associated 6-band expressions — no window, no float "
    "until the single final division, which is identical IEEE both "
    "engines. Precondition: the n_g*N*m bound crosses int64 around "
    "N ~ 4e8 rows with m=6 (hot classes first); past that, widen the "
    "prefix-diff terms to DECIMAL(38,0) (int128 in DuckDB per the "
    "width>18 rule — the diag_mahalanobis_outliers path) with "
    "identical semantics. Top-40 worst classes with full key tiebreak. "
    "At 100 TB: "
    "ONE map-side-combined groupBy to QI-class scale with 6 "
    "conditional sums + a broadcast 1-row population histogram — the "
    "audit costs one aggregate regardless of class count.",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    s = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor((F.col("c_acctbal") + 1000.0) / 2000.0).cast("long").alias("band"),
    )
    band_sums = lambda p: [  # noqa: E731
        F.sum(F.when(F.col("band") == j, 1).otherwise(0))
        .cast("long")
        .alias(f"{p}{j}")
        for j in range(_TCL_BANDS)
    ]
    g = s.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"), *band_sums("c")
    )
    tot = s.agg(F.count(F.lit(1)).cast("long").alias("n"), *band_sums("t"))
    emd = F.expr(_tcl_emd_terms())
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_g",
            emd.cast("long").alias("emd_num"),
            F.round(
                emd.cast("double")
                / (
                    F.lit(float(_TCL_BANDS - 1))
                    * F.col("n_g").cast("double")
                    * F.col("n").cast("double")
                ),
                6,
            ).alias("t_closeness"),
        )
        .orderBy(F.desc("t_closeness"), "c_nationkey", "c_mktsegment")
        .limit(40)
    )


# --------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov over the value DOMAIN — the
# all-scale twin of ks_click_purchase_drift's cogroup form: the statistic
# is a pure integer max over pre-aggregated value counts, never a
# per-group array collect.
# --------------------------------------------------------------------------


@register(
    "diag_ks_exact_value",
    """
WITH v AS (
  SELECT event_type, ROUND(value, 4) AS y FROM events
  WHERE event_type IN ('click', 'view')),
d AS (
  SELECT y,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
           AS c1,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
           AS c2
  FROM v GROUP BY y),
t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM d),
r AS (
  SELECT CAST(SUM(c1) OVER (ORDER BY y) AS BIGINT) AS r1,
         CAST(SUM(c2) OVER (ORDER BY y) AS BIGINT) AS r2
  FROM d),
m AS (
  SELECT CAST(MAX(ABS(r1 * t.n2 - r2 * t.n1)) AS BIGINT) AS d_num
  FROM r CROSS JOIN t)
SELECT t.n1, t.n2, m.d_num,
       ROUND(CAST(m.d_num AS DOUBLE)
             / NULLIF(CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE), 0.0), 6)
         AS ks_stat,
       ROUND(sqrt(CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)
                  / (CAST(t.n1 AS DOUBLE) + CAST(t.n2 AS DOUBLE)))
             * CAST(m.d_num AS DOUBLE)
             / NULLIF(CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE), 0.0), 6)
         AS ks_scaled
FROM t CROSS JOIN m
""",
    doc="Exact two-sample Kolmogorov-Smirnov statistic between click and "
    "view event values, computed entirely over the VALUE DOMAIN: rows "
    "pre-aggregate to per-4dp-value counts, ECDF gaps are the exact "
    "integers |R1*n2 - R2*n1| (common-denominator form — no float "
    "ECDFs), and D = max/(n1*n2) with the effective-sample scaling "
    "sqrt(n1*n2/(n1+n2))*D are single identical IEEE expressions of "
    "exact BIGINTs. The cogroup/pandas form of the same test "
    "(ks_click_purchase_drift) collects each group; THIS form is the "
    "100 TB path — one map-side-combined groupBy bounded by the value "
    "domain, one domain-scale running sum (distributable via "
    "range-bucket prefix sums), one max. The integer max also makes "
    "the statistic hash-exact where float ECDF subtraction would be "
    "summation-order-noise.",
)
def diag_ks_exact_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_type", F.round("value", 4).alias("y")
    )
    d = v.groupBy("y").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    from logflow.operators.cache import track
    from logflow.operators.packing import global_running_sums

    # eager-persist above the fork: d feeds the totals aggregate plus the
    # prefix-sum's probe/offsets/main branches (r9 ADVICE).
    d = track(d.persist())
    d.count()
    t = d.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    # both ECDF running sums in ONE distributed range-bucket prefix pass —
    # the doc's 100 TB claim implemented, not a single-task global window
    # (y is unique post-groupBy, so the ordering needs no tiebreak).
    r = global_running_sums(d, "y", ["c1", "c2"], ["r1", "r2"]).select("r1", "r2")
    m = r.crossJoin(F.broadcast(t)).agg(
        F.max(F.abs(F.col("r1") * F.col("n2") - F.col("r2") * F.col("n1")))
        .cast("long")
        .alias("d_num")
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    prod = F.nullif(dd("n1") * dd("n2"), F.lit(0.0))
    return t.crossJoin(F.broadcast(m)).select(
        "n1",
        "n2",
        "d_num",
        F.round(dd("d_num") / prod, 6).alias("ks_stat"),
        F.round(
            F.sqrt(dd("n1") * dd("n2") / (dd("n1") + dd("n2")))
            * dd("d_num")
            / prod,
            6,
        ).alias("ks_scaled"),
    )


# --------------------------------------------------------------------------
# Variance inflation factors — the collinearity screen on top of the
# correlation machinery: how much does each predictor's variance blow up
# when the OTHER two are in the regression?
# --------------------------------------------------------------------------


def _vif_r2(j: int) -> str:
    """R_j^2 of predictor j on the other two, from pairwise correlations:
    R1^2 = (r12^2 + r13^2 - 2*r12*r13*r23) / (1 - r23^2) and cyclic.
    Built ONCE as expression text over columns r12/r13/r23 — identical
    operand order in both engines."""
    a, b, c = {
        1: ("r12", "r13", "r23"),
        2: ("r12", "r23", "r13"),
        3: ("r13", "r23", "r12"),
    }[j]
    return f"(({a}*{a} + {b}*{b}) - 2.0*{a}*{b}*{c}) / (1.0 - {c}*{c})"


def _vif_corr(i: int, j: int) -> str:
    """Pearson r from exact BIGINT moments — one identical expression."""
    return (
        f"(CAST(n AS DOUBLE)*CAST(s{i}{j} AS DOUBLE)"
        f" - CAST(s{i} AS DOUBLE)*CAST(s{j} AS DOUBLE))"
        f" / sqrt((CAST(n AS DOUBLE)*CAST(s{i}{i} AS DOUBLE)"
        f" - CAST(s{i} AS DOUBLE)*CAST(s{i} AS DOUBLE))"
        f" * (CAST(n AS DOUBLE)*CAST(s{j}{j} AS DOUBLE)"
        f" - CAST(s{j} AS DOUBLE)*CAST(s{j} AS DOUBLE)))"
    )


_VIF_NAMES = {1: "quantity", 2: "discount_cents", 3: "tax_cents"}


_VIF_SQL = (
    """
WITH x AS (
  SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS x1,
         CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2,
         CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS x3
  FROM lineitem),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(x3) AS BIGINT) AS s3,
         CAST(SUM(x1*x1) AS BIGINT) AS s11, CAST(SUM(x2*x2) AS BIGINT) AS s22,
         CAST(SUM(x3*x3) AS BIGINT) AS s33,
         CAST(SUM(x1*x2) AS BIGINT) AS s12, CAST(SUM(x1*x3) AS BIGINT) AS s13,
         CAST(SUM(x2*x3) AS BIGINT) AS s23
  FROM x),
r AS (SELECT n, """
    + ", ".join(f"{_vif_corr(i, j)} AS r{i}{j}" for i, j in ((1, 2), (1, 3), (2, 3)))
    + """ FROM m)
SELECT feature, n_rows, ROUND(r2_others, 6) AS r2_others,
       ROUND(1.0 / (1.0 - r2_others), 6) AS vif
FROM (
"""
    + "\n  UNION ALL ".join(
        f"SELECT '{_VIF_NAMES[j]}' AS feature, n AS n_rows,"
        f" {_vif_r2(j)} AS r2_others FROM r"
        for j in (1, 2, 3)
    )
    + """
) ORDER BY feature
"""
)


@register(
    "diag_vif",
    _VIF_SQL,
    doc="Variance inflation factors for the (quantity, discount, tax) "
    "design — the multicollinearity screen a regression pipeline runs "
    "before trusting coefficients (VIF_j = 1/(1-R_j^2), R_j^2 from "
    "regressing predictor j on the other two; the 3-predictor R^2 has "
    "the closed pairwise-correlation form, so no per-feature refit): "
    "completes the regression-diagnostics shelf next to "
    "diag_correlation_matrix (raw r), diag_groupwise_ols (fit) and "
    "diag_ols_influence (leverage). All second moments are exact "
    "BIGINTs over integer-scaled features in ONE map-side-combined "
    "pass; every correlation and the R^2/VIF ladder are expression "
    "text generated once and inlined into BOTH engines (identical "
    "operand order -> identical IEEE results). At 100 TB: one "
    "aggregate, constant-size arithmetic after — adding features "
    "costs O(k^2) moments in the same single pass.",
)
def diag_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    x = li.select(
        F.round("l_quantity", 0).cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x2"),
        F.round(F.col("l_tax") * 100, 0).cast("long").alias("x3"),
    )
    m = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.sum(f"x{i}").cast("long").alias(f"s{i}") for i in (1, 2, 3)],
        *[
            F.sum(F.col(f"x{i}") * F.col(f"x{j}")).cast("long").alias(f"s{i}{j}")
            for i, j in ((1, 1), (2, 2), (3, 3), (1, 2), (1, 3), (2, 3))
        ],
    )
    r = m.select(
        "n",
        *[
            F.expr(_vif_corr(i, j)).alias(f"r{i}{j}")
            for i, j in ((1, 2), (1, 3), (2, 3))
        ],
    )
    # ONE pass: the 3-feature fan-out is a stack over the 1-row frame,
    # never three traversals of the lineitem aggregate (the ROC lesson)
    stack_args = ", ".join(
        f"'{_VIF_NAMES[j]}', {_vif_r2(j)}" for j in (1, 2, 3)
    )
    return (
        r.select(
            F.expr(f"stack(3, {stack_args}) AS (feature, r2_others)"),
            F.col("n").alias("n_rows"),
        )
        .select(
            "feature",
            "n_rows",
            F.round("r2_others", 6).alias("r2_others"),
            F.round(F.lit(1.0) / (F.lit(1.0) - F.col("r2_others")), 6).alias(
                "vif"
            ),
        )
        .orderBy("feature")
    )


# --------------------------------------------------------------------------
# Bivariate Mahalanobis outlier gate — the correlation-aware 2-D fence
# that diag_iqr_outliers' per-column fences cannot express: a point can
# be inside both marginals yet far off the joint ellipse.
# --------------------------------------------------------------------------

#: chi-square(2 df) quantiles at 95 / 99 / 99.9% — literature constants,
#: inlined as identical literals in both engines.
_MAHA_THRESH = ["5.991464547107979", "9.210340371976184", "13.815510557964274"]


def _maha_d2() -> str:
    """Mahalanobis^2 as one expression over exact integer operands:
    d2 = (C*dxn^2 - 2*B*dxn*dyn + A*dyn^2) / (A*C - B*B), with
    A = n*sxx - sx^2 (and cyclic) and dxn = n*x - sx — the n^4 factors
    cancel, every operand is exact, identical text both engines."""
    a = "(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))"
    b = "(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))"
    c = "(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))"
    dxn = "CAST(n*x - sx AS DOUBLE)"
    dyn = "CAST(n*y - sy AS DOUBLE)"
    return (
        f"({c}*{dxn}*{dxn} - 2.0*{b}*{dxn}*{dyn} + {a}*{dyn}*{dyn})"
        f" / ({a}*{c} - {b}*{b})"
    )


_MAHA_SQL = (
    """
WITH x AS (
  SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS y
  FROM lineitem),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(x*y) AS BIGINT) AS sxy,
         CAST(SUM(y*y) AS BIGINT) AS syy
  FROM x),
d AS (SELECT """
    + _maha_d2()
    + """ AS d2 FROM x CROSS JOIN m)
SELECT chi2_threshold, n_outliers, n_rows,
       ROUND(CAST(n_outliers AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
         AS outlier_share
FROM (
"""
    + "\n  UNION ALL ".join(
        f"SELECT CAST({t} AS DOUBLE) AS chi2_threshold,"
        f" CAST(COALESCE(SUM(CASE WHEN d2 > {t} THEN 1 END), 0) AS BIGINT)"
        f" AS n_outliers, CAST(COUNT(*) AS BIGINT) AS n_rows FROM d"
        for t in _MAHA_THRESH
    )
    + """
) ORDER BY chi2_threshold
"""
)


@register(
    "diag_mahalanobis_outliers",
    _MAHA_SQL,
    doc="Bivariate Mahalanobis outlier gate on (quantity, price): counts "
    "rows whose squared Mahalanobis distance from the joint centroid "
    "exceeds the chi-square(2) fences at 95/99/99.9% — the "
    "correlation-aware screen that catches points inside both "
    "marginal IQR fences but far off the joint ellipse. The n^4 "
    "normalization cancels, so d2 = (C*dxn^2 - 2B*dxn*dyn + A*dyn^2)"
    "/(AC - B^2) is ONE generated-once expression whose operands "
    "(n*x - sx, moment complements) are all exact integers — both "
    "engines compute bit-identical doubles per row, making the fence "
    "counts exact matches (a knife-edge comparison only bites when "
    "expressions differ; these are textually identical). At 100 TB: "
    "one moment pass + one broadcast-moments conditional-count pass; "
    "the Spark side folds the 3-threshold grid into one aggregate + "
    "stack instead of the oracle's 3-scan UNION (values identical). "
    "Moment magnitudes: integer dollars/quantities keep sums < 1e17 "
    "at sf100; past that the moment accumulators widen to "
    "DECIMAL(38,0) with identical semantics.",
)
def diag_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    x = li.select(
        F.round("l_quantity", 0).cast("long").alias("x"),
        F.round("l_extendedprice", 0).cast("long").alias("y"),
    )
    m = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    d = x.crossJoin(F.broadcast(m)).select(F.expr(_maha_d2()).alias("d2"))
    aggs = [
        F.coalesce(F.sum(F.when(F.col("d2") > float(t), 1)), F.lit(0))
        .cast("long")
        .alias(f"o{i}")
        for i, t in enumerate(_MAHA_THRESH)
    ]
    wide = d.agg(*aggs, F.count(F.lit(1)).cast("long").alias("n_rows"))
    stack_args = ", ".join(
        f"CAST({t} AS DOUBLE), o{i}" for i, t in enumerate(_MAHA_THRESH)
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(_MAHA_THRESH)}, {stack_args})"
                " AS (chi2_threshold, n_outliers)"
            ),
            "n_rows",
        )
        .select(
            "chi2_threshold",
            "n_outliers",
            "n_rows",
            F.round(
                F.col("n_outliers").cast("double") / F.col("n_rows").cast("double"),
                6,
            ).alias("outlier_share"),
        )
        .orderBy("chi2_threshold")
    )


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR over the A/B suite's per-metric z-tests — the
# multiple-comparisons gate a metrics platform runs when one experiment
# reads out MANY metrics: control the expected fraction of false
# discoveries at q, not the per-test alpha.
# --------------------------------------------------------------------------

_BH_Q_NUM, _BH_Q_DEN = 1, 10  # q = 0.10
# Literal grid covers any family size up to 40 — 4x the regenerated
# testdata's largest event_type family ever observed (5), because a
# family with m > _BH_MMAX would match NOTHING in the inner grid join
# and the query would silently return an empty (yet parity-green)
# result.  tests/test_diagnostics.py::test_bh_fdr_stepup_shape asserts
# the family actually fits the grid at every seed (r10 ADVICE item).
_BH_MMAX = 40


def _bh_grid() -> list[tuple[int, int, float]]:
    """(k, m, zcrit) for every 1 <= k <= m <= _BH_MMAX, where zcrit is the
    two-sided z threshold equivalent to the BH rung p <= (k/m)*q:
    zcrit = Phi^-1(1 - (k*q/m)/2).  Computed ONCE in Python and inlined as
    identical literals into both engines — the BH comparison then never
    evaluates a normal CDF in-engine (no exp/erf ulp exposure at all; the
    z-space form of the test is exactly equivalent because p(z) is
    strictly decreasing in |z|)."""
    from statistics import NormalDist

    nd = NormalDist()
    q = _BH_Q_NUM / _BH_Q_DEN
    return [
        (k, m, nd.inv_cdf(1.0 - (k * q / m) / 2.0))
        for m in range(1, _BH_MMAX + 1)
        for k in range(1, m + 1)
    ]


_BH_GRID_SQL = ", ".join(f"({k}, {m}, {z!r})" for k, m, z in _bh_grid())


@register(
    "ab_benjamini_hochberg",
    f"""
WITH e AS (
  SELECT user_id, event_type, value,
         date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) AS tsm
  FROM events),
mid AS (SELECT (MIN(tsm) + MAX(tsm)) // 2 AS m FROM e),
u AS (
  SELECT event_type, user_id,
         CAST(concat('0x', substr(md5(concat('arm:', CAST(user_id AS VARCHAR))),
              1, 8)) AS BIGINT) % 2 AS arm,
         CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(14,4))) * 100 AS BIGINT) AS post
  FROM e CROSS JOIN mid WHERE tsm >= m GROUP BY event_type, user_id),
g AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 0 THEN post ELSE 0 END) AS BIGINT) AS s0,
         CAST(SUM(CASE WHEN arm = 1 THEN post ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN arm = 0 THEN post*post ELSE 0 END) AS BIGINT) AS ss0,
         CAST(SUM(CASE WHEN arm = 1 THEN post*post ELSE 0 END) AS BIGINT) AS ss1
  FROM u GROUP BY event_type),
z AS (
  SELECT event_type, n0, n1,
         (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
         / NULLIF(sqrt(
             CAST(n0*ss0 - s0*s0 AS DOUBLE)
               / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE))
               / CAST(n0 AS DOUBLE)
             + CAST(n1*ss1 - s1*s1 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
               / CAST(n1 AS DOUBLE)), 0.0) AS zval
  FROM g WHERE n0 >= 2 AND n1 >= 2),
zr AS (
  SELECT event_type, n0, n1, zval,
         CAST(ROW_NUMBER() OVER (ORDER BY ROUND(abs(zval), 6) DESC, event_type)
              AS BIGINT) AS rnk,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM z WHERE zval IS NOT NULL),
grid AS (SELECT k, gm, CAST(zcrit AS DOUBLE) AS zcrit
         FROM (VALUES {_BH_GRID_SQL}) AS t(k, gm, zcrit)),
j AS (
  SELECT zr.event_type, zr.n0, zr.n1, zr.zval, zr.rnk, zr.m, grid.zcrit,
         CASE WHEN ROUND(abs(zr.zval), 6) >= grid.zcrit THEN zr.rnk END AS hitk
  FROM zr JOIN grid ON grid.k = zr.rnk AND grid.gm = zr.m),
km AS (SELECT MAX(hitk) AS kmax FROM j)
SELECT event_type, n0, n1,
       ROUND(zval, 6) AS z,
       rnk AS rank,
       ROUND(zcrit, 6) AS z_critical,
       CAST(CASE WHEN kmax IS NOT NULL AND rnk <= kmax THEN 1 ELSE 0 END
            AS BIGINT) AS rejected
FROM j CROSS JOIN km
ORDER BY rank
""",
    doc="Benjamini-Hochberg FDR (q=0.10) across the A/B experiment's "
    "per-metric readouts: one Welch-style two-sample z per event_type "
    "(arm means of per-user post-period spend; same md5 arm hash and "
    "exact-micros midpoint as the whole _ab_user_frame suite, so the "
    "family shares the experiment's arms/splits), then the BH step-up "
    "rule in Z-SPACE — the rung p_(k) <= (k/m)q is equivalently "
    "|z|_(k) >= Phi^-1(1-(kq/m)/2), and those thresholds are a "
    "(k, m) literal grid inlined identically into both engines, so NO "
    "normal CDF (no exp/erf ulp risk) is ever evaluated in-engine. "
    "z itself is one identical IEEE expression over exact BIGINT "
    "moments (NULLIF-guarded denominator), ranked by its 6dp rounding "
    "with the event_type tiebreak (the rank-on-rounded rule). "
    "Precondition: n*ss terms cross int64 around ~1e5 users with "
    "1e6-cent spends — widen to DECIMAL(38,0) past that. At 100 TB: "
    "one (type,user) shuffle, one type-scale moment rollup; the BH "
    "step-up runs on the metric-family domain (here <= 5 rows).",
)
def ab_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    e = ev.select(
        "user_id",
        "event_type",
        "value",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        ).alias("tsm"),
    )
    mid = e.agg(F.expr("(MIN(tsm) + MAX(tsm)) DIV 2").alias("m"))
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("arm:"), F.col("user_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    u = (
        e.crossJoin(F.broadcast(mid))
        .filter(F.col("tsm") >= F.col("m"))
        .groupBy("event_type", "user_id")
        .agg(
            (F.sum(F.round(F.col("value"), 4).cast("decimal(14,4)")) * 100)
            .cast("long")
            .alias("post")
        )
        .select("event_type", "user_id", arm.alias("arm"), "post")
    )
    g = u.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("post")).otherwise(0))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(F.col("arm") == 1, F.col("post")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("arm") == 0, F.col("post") * F.col("post")).otherwise(0))
        .cast("long")
        .alias("ss0"),
        F.sum(F.when(F.col("arm") == 1, F.col("post") * F.col("post")).otherwise(0))
        .cast("long")
        .alias("ss1"),
    )
    zval = F.expr(
        "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
        " / NULLIF(sqrt("
        " CAST(n0*ss0 - s0*s0 AS DOUBLE)"
        " / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE))"
        " / CAST(n0 AS DOUBLE)"
        " + CAST(n1*ss1 - s1*s1 AS DOUBLE)"
        " / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))"
        " / CAST(n1 AS DOUBLE)), 0.0)"
    )
    z = (
        g.filter((F.col("n0") >= 2) & (F.col("n1") >= 2))
        .select("event_type", "n0", "n1", zval.alias("zval"))
        .filter(F.col("zval").isNotNull())
    )
    # metric-family-domain window (<= #event_types rows): bounded
    w = Window.orderBy(F.desc(F.round(F.abs(F.col("zval")), 6)), "event_type")
    # eager-persist above the fork: the metric-family frame feeds both the
    # kmax aggregate and the final projection — unpersisted, the events
    # scan + user rollup re-execute per branch.
    zr = track(
        z.select(
            "event_type",
            "n0",
            "n1",
            "zval",
            F.row_number().over(w).cast("long").alias("rnk"),
            F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("m"),
        )
        .coalesce(1)
        .persist()
    )
    zr.count()
    grid = spark.createDataFrame(_bh_grid(), "k long, gm long, zcrit double")
    j = zr.join(
        F.broadcast(grid),
        (F.col("k") == F.col("rnk")) & (F.col("gm") == F.col("m")),
    ).select(
        "event_type",
        "n0",
        "n1",
        "zval",
        "rnk",
        "zcrit",
        F.when(
            F.round(F.abs(F.col("zval")), 6) >= F.col("zcrit"), F.col("rnk")
        ).alias("hitk"),
    )
    km = j.agg(F.max("hitk").alias("kmax"))
    return (
        j.crossJoin(F.broadcast(km))
        .select(
            "event_type",
            "n0",
            "n1",
            F.round("zval", 6).alias("z"),
            F.col("rnk").alias("rank"),
            F.round("zcrit", 6).alias("z_critical"),
            F.when(F.col("kmax").isNotNull() & (F.col("rnk") <= F.col("kmax")), 1)
            .otherwise(0)
            .cast("long")
            .alias("rejected"),
        )
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# Exact-randomization permutation test on the A/B suite's experiment —
# the nonparametric twin of ab_two_proportion_ztest/ab_cuped_adjustment:
# no normal approximation anywhere, the null distribution is built from
# md5-DETERMINISTIC re-labelings so every replicate is reproducible and
# the whole test stays oracle-checkable (RNG-based permutation is not).
# --------------------------------------------------------------------------

_PERM_R = 64  # deterministic re-labelings; p-value resolution 1/65


def _perm_bit(r: int, *, duck: bool) -> str:
    """Deterministic 0/1 re-label for replicate ``r`` from md5(user_id)."""
    if duck:
        return (
            f"CAST(concat('0x', substr(md5(concat('perm:{r}:', "
            f"CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 2"
        )
    return (
        f"CAST(conv(substring(md5(concat('perm:{r}:', "
        f"CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2"
    )


def _perm_diff(s1: str, n1: str) -> str:
    """Mean difference from one arm's exact integer sums vs the rest —
    the IDENTICAL IEEE expression in both engines (the denominator
    NULLIF guard covers degenerate all-one-side relabelings)."""
    return (
        f"CAST({s1} AS DOUBLE) / CAST(NULLIF({n1}, 0) AS DOUBLE)"
        f" - CAST(st - {s1} AS DOUBLE) / CAST(NULLIF(nt - {n1}, 0) AS DOUBLE)"
    )


def _perm_sql() -> str:
    reps = ",\n         ".join(
        f"CAST(SUM(CASE WHEN {_perm_bit(r, duck=True)} = 1 THEN post ELSE 0 END)"
        f" AS BIGINT) AS s1_{r},"
        f" CAST(SUM({_perm_bit(r, duck=True)}) AS BIGINT) AS n1_{r}"
        for r in range(_PERM_R)
    )
    extreme = " + ".join(
        f"COALESCE(CASE WHEN abs({_perm_diff(f's1_{r}', f'n1_{r}')})"
        f" >= abs({_perm_diff('s1o', 'n1o')}) THEN 1 END, 0)"
        for r in range(_PERM_R)
    )
    return f"""
WITH {_AB_USER_SQL.strip()},
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nt,
         CAST(SUM(post) AS BIGINT) AS st,
         CAST(SUM(CASE WHEN arm = 1 THEN post ELSE 0 END) AS BIGINT) AS s1o,
         CAST(SUM(arm) AS BIGINT) AS n1o,
         {reps}
  FROM u)
SELECT nt AS n_users, n1o AS n_treat,
       ROUND(({_perm_diff('s1o', 'n1o')}) / 100.0, 6) AS diff_obs,
       CAST({extreme} AS BIGINT) AS n_extreme,
       ROUND((1.0 + CAST({extreme} AS DOUBLE)) / {_PERM_R + 1}.0, 6) AS p_value
FROM g
"""


@register(
    "ab_permutation_test",
    _perm_sql(),
    doc="Exact-randomization permutation test of the experiment's "
    "post-period per-user spend difference (same md5 arms / exact-"
    f"micros midpoint as the whole _ab_user_frame suite): {_PERM_R} "
    "deterministic md5 re-labelings of users build the null "
    "distribution — each replicate's arm-mean difference derives from "
    "exact BIGINT cent sums (order-independent), and the observed-vs-"
    "replicate comparison is the IDENTICAL IEEE expression in both "
    "engines, so even the >= tie cases agree bit-for-bit. p = (1 + "
    "#extreme)/(R+1), the standard add-one permutation estimate — no "
    "normal CDF, no RNG, fully hash-checkable. At 100 TB: ONE pass — "
    "all replicate sums are conditional aggregates in a single "
    "map-side-combined agg (the Poisson-bootstrap layout); no "
    "user-level shuffle beyond the shared per-user rollup.",
)
def ab_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _ab_user_frame(spark, sf_dir)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("nt"),
        F.sum("post").cast("long").alias("st"),
        F.sum(F.when(F.col("arm") == 1, F.col("post")).otherwise(0))
        .cast("long")
        .alias("s1o"),
        F.sum("arm").cast("long").alias("n1o"),
    ]
    for r in range(_PERM_R):
        bit = F.expr(_perm_bit(r, duck=False))
        aggs.append(
            F.sum(F.when(bit == 1, F.col("post")).otherwise(0))
            .cast("long")
            .alias(f"s1_{r}")
        )
        aggs.append(F.sum(bit).cast("long").alias(f"n1_{r}"))
    g = u.agg(*aggs)
    extreme = " + ".join(
        f"COALESCE(CASE WHEN abs({_perm_diff(f's1_{r}', f'n1_{r}')})"
        f" >= abs({_perm_diff('s1o', 'n1o')}) THEN 1 END, 0)"
        for r in range(_PERM_R)
    )
    return g.select(
        F.col("nt").alias("n_users"),
        F.col("n1o").alias("n_treat"),
        F.expr(f"ROUND(({_perm_diff('s1o', 'n1o')}) / 100.0, 6)").alias("diff_obs"),
        F.expr(f"CAST({extreme} AS BIGINT)").alias("n_extreme"),
        F.expr(
            f"ROUND((1.0 + CAST({extreme} AS DOUBLE)) / {_PERM_R + 1}.0, 6)"
        ).alias("p_value"),
    )


# --------------------------------------------------------------------------
# Kendall tau-b on the bucketed value DOMAIN — completes the correlation
# suite (Pearson: diag_correlation_matrix, Spearman: diag_spearman_rank_
# corr) with the concordance measure, computed at grid scale instead of
# the O(n²) pair definition (the diag_mann_whitney value-domain rule).
# --------------------------------------------------------------------------


@register(
    "diag_kendall_tau",
    """
WITH pts AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) // 1000 AS y
  FROM lineitem),
cells AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM pts GROUP BY x, y),
xs AS (SELECT DISTINCT x FROM cells),
ys AS (SELECT DISTINCT y FROM cells),
dense AS (
  SELECT xs.x, ys.y, COALESCE(cells.c, 0) AS c
  FROM xs CROSS JOIN ys
  LEFT JOIN cells ON cells.x = xs.x AND cells.y = ys.y),
rc AS (  -- rowcum(x, y) = sum over x' <= x within column y
  SELECT x, y, c,
         CAST(SUM(c) OVER (PARTITION BY y ORDER BY x) AS BIGINT) AS rowcum
  FROM dense),
pf AS (  -- F(x, y) = sum over x' <= x, y' <= y (2D prefix on the DENSE grid)
  SELECT x, y, c, rowcum,
         CAST(SUM(rowcum) OVER (PARTITION BY x ORDER BY y) AS BIGINT) AS f
  FROM rc),
marg AS (
  SELECT p.x, p.y, p.c, p.rowcum, p.f,
         CAST(SUM(p.c) OVER (PARTITION BY p.x) AS BIGINT) AS cx_here,
         CAST(SUM(p.c) OVER (PARTITION BY p.y) AS BIGINT) AS cy_here
  FROM pf p),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
rmg AS (  -- R(x) = # points with x' <= x; Cl(y) = # with y' <= y
  SELECT m.*,
         CAST(SUM(cx_one) OVER (ORDER BY m.x) AS BIGINT) AS rx,
         CAST(SUM(cy_one) OVER (ORDER BY m.y) AS BIGINT) AS cy
  FROM (SELECT marg.*,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY x ORDER BY y) = 1
                    THEN cx_here ELSE 0 END AS cx_one,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY y ORDER BY x) = 1
                    THEN cy_here ELSE 0 END AS cy_one
        FROM marg) m),
terms AS (
  SELECT CAST(SUM(c * (n - rx - cy + f)) AS BIGINT) AS conc,
         CAST(SUM(c * ((cy - cy_here) - (f - rowcum))) AS BIGINT) AS disc
  FROM rmg CROSS JOIN tot),
ties AS (
  SELECT CAST(SUM(tx * (tx - 1) // 2) AS BIGINT) AS n1
  FROM (SELECT CAST(SUM(c) AS BIGINT) AS tx FROM cells GROUP BY x)),
ties2 AS (
  SELECT CAST(SUM(ty * (ty - 1) // 2) AS BIGINT) AS n2
  FROM (SELECT CAST(SUM(c) AS BIGINT) AS ty FROM cells GROUP BY y))
SELECT n,
       CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs,
       conc AS concordant, disc AS discordant, n1 AS ties_x, n2 AS ties_y,
       ROUND(CAST(conc - disc AS DOUBLE)
             / sqrt(CAST(n * (n - 1) // 2 - n1 AS DOUBLE)
                    * CAST(n * (n - 1) // 2 - n2 AS DOUBLE)), 6) AS tau_b
FROM tot CROSS JOIN terms CROSS JOIN ties CROSS JOIN ties2
""",
    doc="Kendall tau-b between quantity and (1k-bucketed) extended price "
    "— the concordance member of the correlation suite. Instead of the "
    "O(n²) pair definition, counts are computed on the DENSIFIED "
    "(x, y) value-domain grid (50 x ~105 cells): concordant pairs per "
    "cell = n - R(x) - C(y) + F(x,y) and discordant = (C(y<) - "
    "F(x, y<)) from one 2D prefix sum composed of two 1D grid-scale "
    "windows (zero-filled cells make the composition exact), tie "
    "corrections from the margins — every count an exact BIGINT, the "
    "tau-b division the only float. At 100 TB: one (x, y) grid "
    "aggregate shuffle; everything after runs on the bounded domain "
    "grid (the diag_mann_whitney value-domain rule), never on rows.",
)
def diag_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    pts = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.expr("CAST(floor(l_extendedprice) AS BIGINT) DIV 1000").alias("y"),
    )
    cells = (
        pts.groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .coalesce(1)
        .localCheckpoint(eager=True)  # grid-scale; feeds dense + ties + tot
    )
    xs = cells.select("x").distinct()
    ys = cells.select("y").distinct()
    dense = (
        xs.crossJoin(ys)
        .join(cells, ["x", "y"], "left")
        .select("x", "y", F.coalesce("c", F.lit(0)).alias("c"))
    )
    rc = dense.withColumn(
        "rowcum",
        F.sum("c").over(Window.partitionBy("y").orderBy("x")).cast("long"),
    )
    pf = rc.withColumn(
        "f", F.sum("rowcum").over(Window.partitionBy("x").orderBy("y")).cast("long")
    )
    marg = pf.select(
        "*",
        F.sum("c").over(Window.partitionBy("x")).cast("long").alias("cx_here"),
        F.sum("c").over(Window.partitionBy("y")).cast("long").alias("cy_here"),
    )
    one = marg.select(
        "*",
        F.when(
            F.row_number().over(Window.partitionBy("x").orderBy("y")) == 1,
            F.col("cx_here"),
        )
        .otherwise(0)
        .alias("cx_one"),
        F.when(
            F.row_number().over(Window.partitionBy("y").orderBy("x")) == 1,
            F.col("cy_here"),
        )
        .otherwise(0)
        .alias("cy_one"),
    )
    w_rx = Window.orderBy("x").rangeBetween(Window.unboundedPreceding, 0)
    w_cy = Window.orderBy("y").rangeBetween(Window.unboundedPreceding, 0)
    rmg = one.select(
        "*",
        F.sum("cx_one").over(w_rx).cast("long").alias("rx"),
        F.sum("cy_one").over(w_cy).cast("long").alias("cy"),
    )
    tot = cells.agg(F.sum("c").cast("long").alias("n")).localCheckpoint(eager=True)
    terms = rmg.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.col("c") * (F.col("n") - F.col("rx") - F.col("cy") + F.col("f"))
        )
        .cast("long")
        .alias("conc"),
        F.sum(
            F.col("c")
            * ((F.col("cy") - F.col("cy_here")) - (F.col("f") - F.col("rowcum")))
        )
        .cast("long")
        .alias("disc"),
    )
    n1 = (
        cells.groupBy("x")
        .agg(F.sum("c").cast("long").alias("tx"))
        .agg(F.sum(F.expr("tx * (tx - 1) DIV 2")).cast("long").alias("n1"))
    )
    n2 = (
        cells.groupBy("y")
        .agg(F.sum("c").cast("long").alias("ty"))
        .agg(F.sum(F.expr("ty * (ty - 1) DIV 2")).cast("long").alias("n2"))
    )
    return (
        tot.crossJoin(F.broadcast(terms))
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "n",
            F.expr("CAST(n * (n - 1) DIV 2 AS BIGINT)").alias("n_pairs"),
            F.col("conc").alias("concordant"),
            F.col("disc").alias("discordant"),
            F.col("n1").alias("ties_x"),
            F.col("n2").alias("ties_y"),
            F.expr(
                "ROUND(CAST(conc - disc AS DOUBLE)"
                " / sqrt(CAST(n * (n - 1) DIV 2 - n1 AS DOUBLE)"
                " * CAST(n * (n - 1) DIV 2 - n2 AS DOUBLE)), 6)"
            ).alias("tau_b"),
        )
    )


# --------------------------------------------------------------------------
# Differentially-private noisy histogram (r12): the two-sided-geometric
# (discrete Laplace) mechanism with DETERMINISTIC noise — md5-uniform per
# bucket through a literal integer inverse-CDF table, so the release is
# reproducible, engine-identical, and still distributed exactly like the
# real mechanism would be.
# --------------------------------------------------------------------------

_DP_EPS = 1.0  # epsilon; sensitivity of a disjoint-bucket count histogram = 1


def _dp_noise_case(u32: str) -> str:
    """CASE mapping a uniform 32-bit integer to two-sided-geometric noise.

    P(Z = k) = (1-a)/(1+a) * a^|k|, a = exp(-eps): the discrete Laplace
    mechanism (Ghosh-Roughgarden-Sundararajan 2009 — the universally
    optimal mechanism for counts).  Thresholds are floor(F(k) * 2^32)
    BIGINT literals computed here once (math.exp in Python only, never
    in-engine), tails clamped to +-8 (P(|Z|>8) ~ 2e-4 at eps=1); the
    comparison chain is pure integer — no engine float arithmetic at all.
    """
    import math

    a = math.exp(-_DP_EPS)
    p0 = (1 - a) / (1 + a)
    ks = list(range(-8, 8))
    cdf = []
    acc = 0.0
    for k in ks:
        acc += p0 * a ** abs(k) if k != 0 else p0
        # tail below -8 folded into the first bucket by construction of
        # the running sum starting at k=-8 (F(-8) includes P(Z<=-8)).
        cdf.append(acc)
    # prepend the true lower tail: F(-8) = P(Z <= -8)
    tail = sum(p0 * a ** abs(k) for k in range(-100, -8))
    cdf = [c + tail for c in cdf]
    whens = " ".join(
        f"WHEN {u32} < {int(math.floor(c * 4294967296))} THEN {k}"
        for k, c in zip(ks, cdf)
    )
    return f"CASE {whens} ELSE 8 END"


_DP_U32_DUCK = (
    "CAST(concat('0x', substr(md5(concat('dp:', event_type, ':', "
    "CAST(dow AS VARCHAR))), 1, 8)) AS BIGINT)"
)
_DP_U32_SPARK = (
    "CAST(conv(substring(md5(concat('dp:', event_type, ':', "
    "CAST(dow AS STRING))), 1, 8), 16, 10) AS BIGINT)"
)

_DP_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         (date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
          // 86400000000) % 7 AS dow,
         CAST(count(*) AS BIGINT) AS true_cnt
  FROM events GROUP BY 1, 2),
n AS (
  SELECT event_type, dow, true_cnt,
         CAST({_dp_noise_case(_DP_U32_DUCK)} AS BIGINT) AS noise
  FROM b)
SELECT event_type, dow,
       greatest(true_cnt + noise, 0) AS noisy_cnt,
       CAST({_DP_EPS} AS DOUBLE) AS epsilon
FROM n
ORDER BY event_type, dow
"""


@register(
    "privacy_dp_noisy_histogram",
    _DP_ORACLE,
    doc="Differentially-private release of the event_type x day-of-week "
    "count histogram via the discrete-Laplace (two-sided geometric) "
    "mechanism at eps=1: disjoint buckets have sensitivity 1, so "
    "per-bucket noise gives eps-DP for the whole table. Noise is "
    "DETERMINISTIC-for-testing: md5(bucket key) -> uniform 32-bit int -> "
    "literal integer inverse-CDF thresholds (computed once in Python — "
    "no engine float arithmetic, the Poisson-bootstrap literal-table "
    "rule), so both engines release identical integers; swap the hash "
    "input for a secret per-release salt and the mechanism is the real "
    "one. True counts never leave the plan (output clamped at 0). At "
    "100 TB: one partial-agg'd shuffle for the histogram; the noise map "
    "is a per-row projection over bucket-scale rows.",
)
def privacy_dp_noisy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    b = ev.select(
        "event_type",
        F.expr(
            "(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
            " DIV 86400000000) % 7"
        ).alias("dow"),
    ).groupBy("event_type", "dow").agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    n = b.withColumn(
        "noise", F.expr(_dp_noise_case(_DP_U32_SPARK)).cast("long")
    )
    return n.select(
        "event_type",
        "dow",
        F.greatest(F.col("true_cnt") + F.col("noise"), F.lit(0).cast("long")).alias(
            "noisy_cnt"
        ),
        F.lit(_DP_EPS).cast("double").alias("epsilon"),
    ).orderBy("event_type", "dow")


# --------------------------------------------------------------------------
# Benford's-law conformance audit (r12): first-significant-digit
# distribution of money amounts vs log10(1 + 1/d) — the classic fraud /
# data-fabrication screen.
# --------------------------------------------------------------------------


def _benford_ppm() -> list[int]:
    """round(log10(1 + 1/d) * 1e6) literals for d = 1..9 (Python math
    only — the engines never touch a logarithm)."""
    import math

    return [int(round(math.log10(1.0 + 1.0 / d) * 1_000_000)) for d in range(1, 10)]


_BENFORD_VALUES = ", ".join(
    f"({d}, {p})" for d, p in zip(range(1, 10), _benford_ppm())
)

_BENFORD_ORACLE = f"""
WITH obs AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM orders GROUP BY 1),
tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs),
exp_t(digit, ppm) AS (VALUES {_BENFORD_VALUES})
SELECT e.digit,
       COALESCE(o.n_obs, 0) AS n_obs,
       CAST(e.ppm AS BIGINT) AS expected_ppm,
       t.n AS n_total,
       ROUND(CAST(1000000 * COALESCE(o.n_obs, 0) - t.n * e.ppm AS DOUBLE)
             * CAST(1000000 * COALESCE(o.n_obs, 0) - t.n * e.ppm AS DOUBLE)
             / CAST(1000000 * t.n * e.ppm AS DOUBLE), 6) AS chi2_term
FROM exp_t e
CROSS JOIN tot t
LEFT JOIN obs o ON o.digit = e.digit
ORDER BY e.digit
"""


@register(
    "diag_benford_law",
    _BENFORD_ORACLE,
    doc="Benford's-law first-digit audit of order totals: observed "
    "first-significant-digit counts (exact — the digit comes from the "
    "integer cents' decimal string, never from a float log) against "
    "round(log10(1+1/d)*1e6) literal expectations, with the per-digit "
    "chi-square term (obs - n*p)^2 / (n*p) emitted PER ROW so no "
    "cross-engine float summation exists: every term divides one "
    "exactly-derived double by another (identical IEEE inputs -> "
    "identical quotient, the module's division rule). Digits with zero "
    "observations still emit (COALESCE row from the literal table). At "
    "100 TB: one 9-bucket partial-agg'd count — the cheapest fraud "
    "screen a pipeline can run.",
)
def diag_benford_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    obs = (
        orders.select(
            F.expr(
                "CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
                " AS STRING), 1, 1) AS BIGINT)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    exp_rows = ", ".join(f"({d}, {p})" for d, p in zip(range(1, 10), _benford_ppm()))
    exp_t = spark.sql(
        f"SELECT digit, ppm FROM (VALUES {exp_rows}) AS t(digit, ppm)"
    ).select(F.col("digit").cast("long").alias("digit"), F.col("ppm").cast("long").alias("ppm"))
    j = (
        exp_t.crossJoin(F.broadcast(tot))
        .join(obs, "digit", "left")
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0).cast("long")).alias("n_obs"),
            F.col("ppm").alias("expected_ppm"),
            F.col("n").alias("n_total"),
            (F.lit(1000000) * F.coalesce("n_obs", F.lit(0).cast("long"))
             - F.col("n") * F.col("ppm")).alias("num"),
        )
    )
    return j.select(
        "digit",
        "n_obs",
        "expected_ppm",
        "n_total",
        F.round(
            F.col("num").cast("double") * F.col("num").cast("double")
            / (F.lit(1000000) * F.col("n_total") * F.col("expected_ppm")).cast("double"),
            6,
        ).alias("chi2_term"),
    ).orderBy("digit")
