"""SQL-surface / engine-feature operators: exact distributed selection,
SQL-scripting session variables, and DataFrame transposition.

Reference tie-in: the reference exposes its pipeline through a declarative
config surface (StreamsConfig.java); these queries cover the Spark-4 SQL
surface a user migrating real dashboards onto this engine reaches for —
exact percentiles without a global sort, parameterized two-step queries
via session variables (DECLARE / SET VAR / EXECUTE IMMEDIATE), and the
row/column pivot of a metrics frame (`DataFrame.transpose`, Spark 4.0+).

Cross-engine determinism: money values go through the repo's ROUND-then-
cast idiom into exact integer cents; every reported value is either a
BIGINT or a single IEEE division of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logflow.queries import register
from logflow.sources.tables import load_table

#: Histogram bucket width for the two-pass selection, in cents ($655.36).
#: Bucket COUNT is price-range/width — ~1.1k buckets on the TPC-H-ish
#: o_totalprice domain — so the driver-side histogram is bounded by the
#: VALUE DOMAIN, not the row count (the collect survives any SF).
_QBUCKET = 65536

_QUANTILE_PCTS = (25, 50, 75)


@register(
    "quantile_exact_twopass",
    """
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
s AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c),
ks AS (SELECT p, (p * n + 99) // 100 AS k
       FROM (VALUES (25), (50), (75)) t(p) CROSS JOIN n)
SELECT CAST(ks.p AS BIGINT) AS pct, CAST(ks.k AS BIGINT) AS k,
       CAST(s.cents AS DOUBLE) / 100 AS value
FROM ks JOIN s ON s.rn = ks.k
ORDER BY pct
""",
    doc="EXACT p25/p50/p75 of order totals by two-pass distributed "
    "selection — the scalable alternative to both a global sort "
    "(shuffles the world) and approx_percentile (wrong answer). Pass 1 "
    "is a map-side-combined histogram over fixed 65536-cent buckets; "
    "the driver walks the ~1.1k-row cumulative histogram (bounded by "
    "the VALUE DOMAIN, not row count) to locate each target bucket and "
    "its within-bucket rank. Pass 2 scans again but shuffles ONLY the "
    "rows of the ≤3 target buckets (a ~1/1000 slice) into per-bucket "
    "sorts; the k-th element is picked by row_number against the "
    "broadcast target table. k = ceil(p·n/100) in pure integer math "
    "(percentile_disc semantics); values are exact ROUND-to-cents "
    "BIGINTs, so ties are value-identical and the pick is "
    "deterministic. At 100 TB: two columnar scans of one column, one "
    "tiny shuffle — vs. percentile_disc's full-data rangepartition "
    "sort. The DuckDB oracle IS the full sort, proving both roads "
    "meet.",
)
def quantile_exact_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    c = orders.select(cents.alias("cents"))
    hist = (
        c.groupBy(F.expr(f"cents DIV {_QBUCKET}").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # bounded: ≤ price-domain/65536 rows (~1.1k)
    )
    buckets = sorted((r["bucket"], r["cnt"]) for r in hist)
    n = sum(cnt for _, cnt in buckets)
    targets = []  # (bucket, rank_in_bucket, pct, k)
    for p in _QUANTILE_PCTS:
        k = (p * n + 99) // 100  # ceil(p*n/100), exact integer math
        cum = 0
        for b, cnt in buckets:
            if cum + cnt >= k:
                targets.append((b, k - cum, p, k))
                break
            cum += cnt
    tdf = spark.createDataFrame(
        targets, "bucket long, rank long, pct long, k long"
    )
    w = Window.partitionBy("bucket").orderBy("cents")
    slice_ = (
        c.withColumn("bucket", F.expr(f"cents DIV {_QBUCKET}"))
        .filter(F.col("bucket").isin([t[0] for t in targets]))
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        slice_.join(
            F.broadcast(tdf),
            (slice_["bucket"] == tdf["bucket"]) & (slice_["rn"] == tdf["rank"]),
        )
        .select(
            "pct",
            "k",
            (F.col("cents").cast("double") / F.lit(100)).alias("value"),
        )
        .orderBy("pct")
    )


@register(
    "sqlvar_dynamic_threshold",
    """
WITH c AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
s AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c),
thr AS (SELECT s.cents AS thr_cents FROM s CROSS JOIN n
        WHERE s.rn = (95 * n.n + 99) // 100)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN c.cents > thr.thr_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above,
       CAST(MIN(thr.thr_cents) AS DOUBLE) / 100 AS thr_value
FROM c CROSS JOIN thr
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Parameterized two-step analytics via Spark 4 SQL-scripting "
    "session variables: DECLARE OR REPLACE VARIABLE + SET VAR computes "
    "an exact p95 revenue threshold (integer-cents selection, same "
    "percentile_disc math as quantile_exact_twopass), then the main "
    "aggregation references the variable as a plan-time CONSTANT — "
    "Catalyst constant-folds it, so the second query's filter is an "
    "ordinary comparison, not a join against a scalar subquery "
    "(re-planned per run, exactly how a dashboard parameterizes 'show "
    "me orders above the p95'). The oracle fuses both steps into one "
    "statement — proving the variable hop is semantically invisible. "
    "At 100 TB: step 1 is one sort-free selection (the full-sort window "
    "here is the compact demo form; quantile_exact_twopass is the "
    "scale form), step 2 one map-side-combined agg.",
)
def sqlvar_dynamic_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("lf_sqlvar_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE lf_thr_cents BIGINT")
    spark.sql(
        """
        SET VAR lf_thr_cents = (
          WITH c AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                       AS cents FROM lf_sqlvar_orders),
          n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
          s AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c)
          SELECT s.cents FROM s CROSS JOIN n
          WHERE s.rn = (95 * n.n + 99) DIV 100)
        """
    )
    return spark.sql(
        """
        SELECT o_orderpriority, n_orders, n_above,
               CAST(lf_thr_cents AS DOUBLE) / 100 AS thr_value
        FROM (
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(CASE WHEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                               > lf_thr_cents THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_above
          FROM lf_sqlvar_orders GROUP BY o_orderpriority)
        ORDER BY o_orderpriority
        """
    )


@register(
    "transpose_band_metrics",
    """
WITH m AS (
  SELECT l_orderkey % 3 AS band,
         CAST(COUNT(*) AS DOUBLE) AS n_rows,
         CAST(SUM(CAST(ROUND(l_quantity, 2) AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_qty,
         ROUND(CAST(SUM(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2)))
                    AS DOUBLE) / COUNT(*), 4) AS avg_price
  FROM lineitem GROUP BY l_orderkey % 3)
SELECT k.key,
       MAX(CASE WHEN band = 0 THEN v END) AS band_0,
       MAX(CASE WHEN band = 1 THEN v END) AS band_1,
       MAX(CASE WHEN band = 2 THEN v END) AS band_2
FROM (
  SELECT band, 'n_rows' AS key, n_rows AS v FROM m
  UNION ALL SELECT band, 'sum_qty', sum_qty FROM m
  UNION ALL SELECT band, 'avg_price', avg_price FROM m) k
GROUP BY k.key
ORDER BY k.key
""",
    doc="Metrics-frame pivot via Spark 4's DataFrame.transpose: a 3-row "
    "aggregate (per orderkey mod-3 band — a schema-stable derived key, "
    "immune to testdata regeneration) flips into one row per METRIC "
    "with one column per band, the layout every metrics dashboard "
    "renders. transpose() requires homogeneous value types (all "
    "measures cast to DOUBLE through the exact decimal-sum idiom) and "
    "takes column headers from the first column's values — the input "
    "is pre-sorted on the band label so headers are positionally "
    "deterministic. The oracle is the classic conditional-aggregation "
    "unpivot+pivot, proving transpose is sugar over it. At 100 TB: "
    "transpose runs on the 3-row AGGREGATE (driver-scale), never the "
    "fact table — the heavy lifting stays one map-side-combined agg.",
)
def transpose_band_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    m = (
        li.groupBy(F.pmod(F.col("l_orderkey"), F.lit(3)).alias("band"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_rows"),
            F.sum(F.round(F.col("l_quantity"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.round(
                F.sum(F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                4,
            ).alias("avg_price"),
        )
        .select(
            F.concat(F.lit("band_"), F.col("band")).alias("label"),
            "n_rows",
            "sum_qty",
            "avg_price",
        )
        .orderBy("label")
    )
    return m.transpose().orderBy("key")


@register(
    "sqlscript_doubling_threshold",
    """
WITH ks AS (
  SELECT CAST(k AS BIGINT) AS k,
         CAST(100 AS BIGINT) * (CAST(1 AS BIGINT) << CAST(k AS INT)) AS t
  FROM range(0, 21) r(k)
),
c AS (
  SELECT ks.k, ks.t,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
          WHERE o_totalprice >= ks.t) AS n
  FROM ks
),
pick AS (
  SELECT * FROM c WHERE n < 1000 OR k = 20 ORDER BY k LIMIT 1
)
SELECT k AS k_steps, CAST(t AS DOUBLE) AS threshold, n AS n_qualifying
FROM pick
""",
    doc="Control-flow analytics via Spark 4 SQL SCRIPTING (BEGIN/DECLARE/"
    "WHILE/SET): a WHILE loop doubles a revenue threshold until fewer "
    "than 1000 orders qualify (capped at 20 doublings) — the 'find the "
    "knob value that bounds the result' search an operator otherwise "
    "scripts in Python around the engine. Each iteration is a full "
    "engine query (COUNT under the candidate threshold) whose result "
    "feeds the loop condition — state lives in script variables, not a "
    "driver program. Deterministic: the trajectory is a pure function "
    "of the data, so the oracle replays it SET-FREE as a generate-"
    "series over all 21 candidate thresholds picking the first "
    "qualifying row (the declarative unrolling of the loop). At "
    "100 TB each probe is one scan-bound count — and because the "
    "threshold doubles, the whole search is <= 21 probes regardless "
    "of data size (binary-search-style convergence, not a per-row "
    "loop).",
)
def sqlscript_doubling_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("lf_script_orders")
    return spark.sql(
        """
        BEGIN
          DECLARE t BIGINT DEFAULT 100;
          DECLARE k BIGINT DEFAULT 0;
          DECLARE n BIGINT DEFAULT 0;
          SET n = (SELECT COUNT(*) FROM lf_script_orders WHERE o_totalprice >= t);
          WHILE n >= 1000 AND k < 20 DO
            SET t = t * 2;
            SET k = k + 1;
            SET n = (SELECT COUNT(*) FROM lf_script_orders
                     WHERE o_totalprice >= t);
          END WHILE;
          SELECT CAST(k AS BIGINT) AS k_steps,
                 CAST(t AS DOUBLE) AS threshold,
                 CAST(n AS BIGINT) AS n_qualifying;
        END
        """
    )


@register(
    "sqlparam_identifier_query",
    """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))), 2)
            AS DOUBLE) AS revenue
FROM orders
WHERE o_totalprice >= 150000.0 AND o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Parameterized SQL + IDENTIFIER clause (Spark 4): the query text "
    "contains ZERO inlined values — the table name binds through "
    "IDENTIFIER(:tbl) (SQL-injection-safe dynamic table reference, the "
    "thing string-formatted SQL cannot do safely) and the filter "
    "constants bind as named parameters via spark.sql(..., args={...}) "
    "— the prepared-statement surface a multi-tenant 100 TB platform "
    "uses so ONE analyzed plan template serves every tenant/table "
    "combination. Catalyst sees the bound literals (here 150000.0) at "
    "analysis time, so pushdown/pruning work exactly as with inline "
    "constants. Money sums use the decimal-before-sum idiom; the "
    "oracle is the same query with the bindings resolved.",
)
def sqlparam_identifier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    orders.createOrReplaceTempView("sqlparam_orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS revenue
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"tbl": "sqlparam_orders_v", "min_price": 150000.0, "status": "O"},
    )


# --------------------------------------------------------------------------
# Ordered LISTAGG (SQL:2016 WITHIN GROUP) — Spark 4's listagg against
# DuckDB's ordered string_agg: deterministic string aggregation, the
# report-friendly "top names as one cell" surface.
# --------------------------------------------------------------------------


@register(
    "agg_listagg_ordered",
    """
WITH cn AS (
  SELECT c.c_mktsegment, n.n_name, CAST(COUNT(*) AS BIGINT) AS n_cust
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY c.c_mktsegment, n.n_name),
ranked AS (
  SELECT c_mktsegment, n_name, n_cust,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY n_cust DESC, n_name) AS rn
  FROM cn)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_listed,
       string_agg(n_name, ',' ORDER BY rn) AS top_nations
FROM ranked WHERE rn <= 5
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    doc="SQL:2016 ordered string aggregation: per market segment, the "
    "top-5 nations by customer count as ONE comma-joined cell — Spark "
    "4's listagg(...) WITHIN GROUP (ORDER BY ...) against DuckDB's "
    "string_agg(... ORDER BY ...), the deterministic form of the "
    "report-cell aggregation that is silently nondeterministic "
    "without the mandatory order clause. The rank window carries the "
    "full (count DESC, name) tiebreak so the list CONTENT and ORDER "
    "are both exact; the string comparison is a byte-exact hash "
    "match. At 100 TB: one dim-broadcast join + segment-scale window "
    "over nation-cardinality rows; listagg concatenates bounded "
    "top-5 lists, never unbounded cells.",
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    cn = (
        cust.join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_name"
                )
            ),
            "c_nationkey",
        )
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("n_cust"), "n_name")
    ranked = cn.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_listed"),
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY rn)"
            ).alias("top_nations"),
        )
        .orderBy("c_mktsegment")
    )
