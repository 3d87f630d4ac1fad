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
