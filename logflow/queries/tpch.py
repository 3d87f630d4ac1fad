"""TPC-H widening, part 2: Q7/Q8/Q9/Q13/Q22 adapted to the driver tables.

These five close the remaining *plan shapes* the earlier TPC-H set
(q1/q3/q5/q6/q10/q14/q15/q16/q18/q19 in relational.py) does not cover:

* Q7  — one dimension joined in TWO ROLES (supplier nation vs customer
  nation) with a cross-role inequality predicate.
* Q8  — conditional market-share ratio (CASE inside both numerator and
  denominator of a per-group division).
* Q9  — multi-fact profit expression spanning four tables with mixed-sign
  decimal arithmetic.
* Q13 — LEFT OUTER join with a predicate INSIDE the join condition,
  followed by a double aggregation (count per customer, then histogram
  of counts — zero-order customers must survive).
* Q22 — uncorrelated scalar aggregate threshold + NOT EXISTS anti join
  in one WHERE clause.

Adaptations to the available schema (no partsupp / l_shipmode /
l_commitdate / c_phone in the driver data): Q8's "market" is a region of
customer nations; Q9's supply cost is modeled as 10% of p_retailprice;
Q13 filters urgent orders inside the join condition; Q22's "country code
prefix" becomes a market-segment subset and "no past orders" becomes "no
urgent orders".  Shapes — and the Catalyst features they exercise — are
unchanged.

Reference parity note: the reference engine (see SURVEY.md §2.1) exposes a
generic stream/table join-and-aggregate surface (StreamsBuilder topology,
kafka-streams-log-correlation); these queries are the batch-relational
closure of that surface, mandated by SURVEY.md §2.2 rows 59-64 and the
driver's relational north star.

All follow the cross-engine determinism rules in queries/__init__.py:
decimal-exact sums → ROUND → DOUBLE, ratios as exact-sum/exact-count in
IEEE double, BIGINT counts, unique-key sort tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logflow.queries import register
from logflow.sources.tables import load_table


def _dec(col: str, prec: int = 12, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal({prec},{scale})")


def _money(sum_col: F.Column, ndigits: int = 2) -> F.Column:
    return F.round(sum_col, ndigits).cast("double")


_VOLUME_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
)


def _volume() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")


@register(
    "q7_nation_volume",
    f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         {_VOLUME_SQL} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
    AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
    AND n1.n_name <> n2.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7 volume shipping: the nation dimension participates in TWO "
    "roles (seller side via supplier, buyer side via customer) with a "
    "cross-role inequality. Both role joins are broadcasts of the 25-row "
    "dim — at 100 TB the only shuffles are the two fact-fact key joins "
    "(lineitem⋈orders⋈customer); the nation IN-filters cut each fact "
    "early because they push through the broadcast join onto the "
    "s_nationkey/c_nationkey columns via Catalyst's join-predicate "
    "inference. year() on TIMESTAMP_NTZ is timezone-free in both engines.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = ["NATION_1", "NATION_2", "NATION_3", "NATION_4"]
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(nations))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(nations))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_money(F.sum(_volume())).alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {_VOLUME_SQL} AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
""",
    doc="TPC-H Q8 national market share: conditional ratio — the CASE'd "
    "nation volume over total volume per order-year. Numerator and "
    "denominator are both exact DECIMAL sums, divided once as IEEE "
    "doubles, so the quotient is bit-identical cross-engine. Dims "
    "(part-filter, nation×2, region, supplier) all broadcast; the only "
    "big shuffles are lineitem⋈orders⋈customer. The p_type filter prunes "
    "lineitem via the broadcast part join before either fact shuffle.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast("decimal(12,2)")
    all_nations = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _volume().alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(zero))
    return all_nations.groupBy("o_year").agg(
        F.round(nation_vol.cast("double") / F.sum("volume").cast("double"), 4).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    """
SELECT nation, o_year,
       CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))
           - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(4,2))
             * CAST(l_quantity AS DECIMAL(12,2)) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
""",
    doc="TPC-H Q9 product-type profit (supply cost modeled as 10% of "
    "p_retailprice — no partsupp table in the driver data): mixed-sign "
    "decimal expression over part⋈lineitem⋈supplier⋈orders⋈nation. The "
    "LIKE filter prunes part BEFORE the broadcast join, which prunes "
    "lineitem before its orders shuffle — selectivity flows fact-ward. "
    "Decimal subtraction keeps negative amounts exact; one ROUND at the "
    "end. At 100 TB: one broadcast (filtered part), one small-dim "
    "broadcast (nation via supplier), one fact-fact shuffle join.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%gear%"))
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    amount = _volume() - (
        _dec("p_retailprice")
        * F.lit(0.1).cast("decimal(4,2)")
        * _dec("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_money(F.sum("amount")).alias("sum_profit"))
    )


@register(
    "q13_order_count_distribution",
    """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
    doc="TPC-H Q13 customer order-count distribution: the predicate lives "
    "INSIDE the left-outer join condition (not a post-filter — customers "
    "whose only orders are urgent must appear with c_count=0), then a "
    "double aggregation folds per-customer counts into a histogram. "
    "COUNT(o_orderkey) counts only matched rows — the outer-join NULL "
    "convention both engines share. At 100 TB: one shuffle join on "
    "custkey, one partial-agg'd count, then a tiny histogram agg.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").cast("long").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).cast("long").alias("custdist"))


@register(
    "q22_dormant_balance",
    """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer
    WHERE c_acctbal > 0.0
      AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_mktsegment
""",
    doc="TPC-H Q22 global-sales-opportunity shape: an uncorrelated scalar "
    "aggregate (segment-wide mean balance, computed as exact-decimal-sum "
    "over exact-count so the threshold double is bit-identical in both "
    "engines) gates the outer scan, composed with a NOT EXISTS anti join "
    "in the same WHERE. Catalyst plans the scalar subquery as a 1-row "
    "broadcast and the NOT EXISTS as a left-anti shuffle join; the "
    "segment IN-filter is pushed to both customer scans. Adaptation: "
    "phone-prefix country codes → market segments, 'no orders' → 'no "
    "urgent orders' (every synthetic customer has orders).",
)
def q22_dormant_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
          AND c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
            FROM customer
            WHERE c_acctbal > 0.0
              AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
          )
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
          )
        GROUP BY c_mktsegment
        """
    )
