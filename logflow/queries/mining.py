"""Pattern-mining / evaluation operators: association rules, streaks,
skyline, AUC, PMI collocations.

Reference tie-in: the reference's topology is a fixed pipeline over keyed
records (StreamsConfig.java); these queries extend the same declarative
surface to the classic data-mining shapes a production analytics engine is
asked for — market-basket rules over order baskets, gaps-and-islands
streaks over event days, Pareto frontiers over part attributes, ranking-
quality (AUC) evaluation for in-engine classifiers, and PMI collocation
extraction for the LLM-corpus plane.

Cross-engine determinism: every ratio is a single IEEE division of exact
BIGINT (or decimal-rounded) operands with identical parenthesization in
both engines, then ROUND — the ln/log calls follow the PSI "ln recipe"
(round the argument's exact-integer ratio only once, 6 dp output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logflow.queries import register
from logflow.sources.tables import load_table


@register(
    "assoc_rules_copurchase",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c_i FROM li GROUP BY l_partkey),
freq AS (SELECT l_orderkey, li.l_partkey, c_i FROM li JOIN item ON li.l_partkey = item.l_partkey
         WHERE c_i >= 2),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM li),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(COUNT(*) AS BIGINT) AS c_ab,
         MAX(a.c_i) AS c_a, MAX(b.c_i) AS c_b
  FROM freq a JOIN freq b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2)
SELECT pa, pb, c_ab, c_a, c_b,
       ROUND(CAST(c_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6) AS support,
       ROUND(CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE), 6) AS confidence,
       ROUND((CAST(c_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE))
             / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)), 6) AS lift
FROM pairs, n
ORDER BY c_ab DESC, pa, pb
LIMIT 100
""",
    doc="Market-basket association rules over order baskets (basket = the "
    "distinct parts of one order): frequent co-purchased pairs with "
    "support / confidence / lift. Baskets are built with ONE order-key "
    "shuffle (collect_set dedups parts within the order); pairs explode "
    "MAP-SIDE from each basket's sorted array (pa < pb by construction), "
    "so the pair count is partially aggregated before its shuffle. The "
    "Apriori item floor is implied, not pre-joined: c_ab >= 2 forces "
    "c_a, c_b >= 2, so pruning items first cannot change the output "
    "(A/B-verified row-identical). At 100 TB: one fact-scale shuffle, "
    "pair blow-up bounded by basket width (TPC-H ≤ 7 lines/order), "
    "per-item counts are vocabulary-sized broadcasts, the basket total "
    "is a 1-row broadcast. Metrics are single IEEE divisions of exact "
    "BIGINTs, identically parenthesized in both engines.",
)
def assoc_rules_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallelize=False: the first shuffle right below supplies the
    # downstream parallelism (the _copurchase_edges r13 rule)
    li = load_table(spark, "lineitem", sf_dir, parallelize=False)
    # one shuffle on the order key; sorted distinct parts per basket
    baskets = li.groupBy(F.col("l_orderkey").alias("o")).agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    # 3 consumers (basket total, item counts, pair explosion) — bounded
    # at order-count scale; checkpoint truncates the lineitem lineage
    baskets = baskets.localCheckpoint(eager=True)
    n = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    item = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("c_i"))
    )
    # ps is a materialized attribute (not an expression chain), so the
    # nested transform references it without re-inlining work per element
    pair_expr = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("pr"))
        .select("pr.pa", "pr.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    ia = F.broadcast(item.select(F.col("p").alias("pa"), F.col("c_i").alias("c_a")))
    ib = F.broadcast(item.select(F.col("p").alias("pb"), F.col("c_i").alias("c_b")))
    pairs = pairs.join(ia, "pa").join(ib, "pb")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        pairs.crossJoin(F.broadcast(n))
        .select(
            "pa",
            "pb",
            "c_ab",
            "c_a",
            "c_b",
            F.round(d("c_ab") / d("n_baskets"), 6).alias("support"),
            F.round(d("c_ab") / d("c_a"), 6).alias("confidence"),
            F.round((d("c_ab") * d("n_baskets")) / (d("c_a") * d("c_b")), 6).alias(
                "lift"
            ),
        )
        .orderBy(F.desc("c_ab"), "pa", "pb")
        .limit(100)
    )


@register(
    "streak_longest_daily",
    """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
n AS (SELECT user_id, d,
             date_diff('day', DATE '1970-01-01', d) AS dayno,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM d),
isl AS (SELECT user_id, MIN(d) AS streak_start,
               CAST(COUNT(*) AS BIGINT) AS streak_days
        FROM n GROUP BY user_id, dayno - rn),
best AS (SELECT user_id, streak_start, streak_days,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY streak_days DESC, streak_start) AS pick
         FROM isl)
SELECT user_id, streak_days, CAST(streak_start AS TIMESTAMP) AS streak_start
FROM best WHERE pick = 1
ORDER BY streak_days DESC, user_id
LIMIT 300
""",
    doc="Gaps-and-islands: each user's longest run of consecutive active "
    "days (earliest such run on ties). The island key is the classic "
    "dayno - row_number() — pure integer date arithmetic, so islands "
    "are engine-exact. At 100 TB: the distinct, both windows, and the "
    "island aggregate all share ONE user_id hash partitioning (Catalyst "
    "chains them without re-shuffling); per-user state is bounded by "
    "active days, never event count.",
)
def streak_longest_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    n = d.select(
        "user_id",
        "d",
        F.datediff("d", F.lit("1970-01-01")).alias("dayno"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("d"))
        .alias("rn"),
    )
    isl = (
        n.groupBy("user_id", (F.col("dayno") - F.col("rn")).alias("island"))
        .agg(
            F.min("d").alias("streak_start"),
            F.count(F.lit(1)).cast("long").alias("streak_days"),
        )
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), "streak_start"
    )
    return (
        isl.withColumn("pick", F.row_number().over(pick))
        .filter(F.col("pick") == 1)
        .select(
            "user_id",
            "streak_days",
            F.col("streak_start").cast("timestamp").alias("streak_start"),
        )
        .orderBy(F.desc("streak_days"), "user_id")
        .limit(300)
    )


@register(
    "skyline_pareto_parts",
    """
WITH p AS (SELECT p_partkey, p_size,
                  CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
           FROM part WHERE p_partkey % 3 = 0)
SELECT p_partkey, price_cents, CAST(p_size AS BIGINT) AS p_size
FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM p q
  WHERE q.price_cents <= p.price_cents AND q.p_size >= p.p_size
    AND (q.price_cents < p.price_cents OR q.p_size > p.p_size))
ORDER BY price_cents, p_partkey
""",
    doc="2-D Pareto frontier (skyline) over parts: minimize price, "
    "maximize size — no part on the frontier is beaten on both axes. "
    "The oracle states dominance directly (NOT EXISTS); the engine side "
    "is the DISTRIBUTED formulation: bucket by price band, per-band max "
    "size (band-count-sized), a running max over bands as the broadcast "
    "carry-in, then a per-band RANGE window for the strictly-cheaper max "
    "— the same two-phase prefix-max decomposition as the interval "
    "concurrency sweep, so no global single-partition sort ever forms. "
    "A row survives iff its size beats every strictly-cheaper row's max "
    "and ties the max at its own price point. Prices are exact integer "
    "cents; equal (price, size) duplicates are mutually non-dominating "
    "in both formulations.",
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).filter(F.col("p_partkey") % 3 == 0)
    p = part.select(
        "p_partkey",
        F.col("p_size").cast("long").alias("p_size"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    ).withColumn("band", F.expr("price_cents DIV 10000"))
    # phase 1: per-band max (band-count-sized — one tiny aggregate)
    bmax = p.groupBy("band").agg(F.max("p_size").alias("band_max"))
    carry = bmax.select(
        "band",
        F.max("band_max")
        .over(
            Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("carry_max"),
    )
    # phase 2: within-band strictly-cheaper max, seeded by the carry-in
    wband = (
        Window.partitionBy("band")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    scored = (
        p.join(F.broadcast(carry), "band")
        .withColumn("in_band_max", F.max("p_size").over(wband))
        .withColumn(
            "cheaper_max",
            F.greatest(
                F.coalesce(F.col("carry_max"), F.lit(-1)),
                F.coalesce(F.col("in_band_max"), F.lit(-1)),
            ),
        )
        .withColumn(
            "at_price_max",
            F.max("p_size").over(Window.partitionBy("band", "price_cents")),
        )
    )
    return (
        scored.filter(
            (F.col("p_size") > F.col("cheaper_max"))
            & (F.col("p_size") == F.col("at_price_max"))
        )
        .select("p_partkey", "price_cents", "p_size")
        .orderBy("price_cents", "p_partkey")
    )


@register(
    "auc_label_separability",
    """
WITH s AS (
  SELECT vec_id,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
         ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / 64, 6) AS score
  FROM embeddings),
r AS (SELECT vec_id, y, score,
             RANK() OVER (ORDER BY score) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY score) AS BIGINT) AS ties
      FROM s),
agg AS (SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(1 - y) AS BIGINT) AS n_neg,
               SUM(CASE WHEN y = 1
                        THEN rk + (ties - 1) / 2.0 ELSE 0 END) AS rank_sum
        FROM r)
SELECT n_pos, n_neg,
       ROUND((rank_sum - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1) / 2)
             / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) AS auc,
       ROUND(2 * ((rank_sum - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1) / 2)
             / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))) - 1, 6) AS gini
FROM agg
""",
    doc="Ranking-quality evaluation IN-ENGINE: tie-corrected AUC "
    "(Mann-Whitney rank-sum) of a deterministic embedding score against "
    "a binarized label, plus the Gini coefficient — the metric loop run "
    "over every classifier the corpus plane trains (quality filters, "
    "contamination detectors) without leaving the engine. Ties share an "
    "average rank (rank + (ties-1)/2 — exact halves in doubles), the "
    "rank sum stays far under 2^52, and the final AUC is one IEEE "
    "division of identical operands in both engines. The global rank "
    "window is EVAL-SET-sized by design (scored samples, not the "
    "corpus) — the same bounded-sample contract as knn_recall_eval; "
    "range-partitioned ranking takes over if an eval set ever outgrows "
    "one partition.",
)
def auc_label_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    score = F.round(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / 64,
        6,
    )
    s = emb.select(
        "vec_id",
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
        score.alias("score"),
    )
    r = s.select(
        "y",
        F.rank().over(Window.orderBy("score")).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("score"))
        .cast("long")
        .alias("ties"),
    )
    agg = r.agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
        F.sum(
            F.when(
                F.col("y") == 1, F.col("rk") + (F.col("ties") - 1) / 2.0
            ).otherwise(0.0)
        ).alias("rank_sum"),
    )
    np, nn = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    auc = (F.col("rank_sum") - np * (np + 1) / 2) / (np * nn)
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(auc, 6).alias("auc"),
        F.round(2 * auc - 1, 6).alias("gini"),
    )


@register(
    "pmi_collocations",
    r"""
WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> x <> '') AS toks
           FROM documents),
uni AS (SELECT unnest(toks) AS w FROM t),
u AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w FROM uni GROUP BY w),
n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM uni),
bg AS (SELECT x[1] AS w1, x[2] AS w2
       FROM (SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS x
             FROM t WHERE len(toks) >= 2)),
b AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_12 FROM bg GROUP BY w1, w2),
n2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bigrams FROM bg)
SELECT w1, w2, c_12, u1.c_w AS c_1, u2.c_w AS c_2,
       ROUND(LN(((CAST(c_12 AS DOUBLE) * CAST(n_tokens AS DOUBLE))
                 / (CAST(u1.c_w AS DOUBLE) * CAST(u2.c_w AS DOUBLE)))
                * (CAST(n_tokens AS DOUBLE) / CAST(n_bigrams AS DOUBLE))), 6) AS pmi
FROM b JOIN u u1 ON b.w1 = u1.w
       JOIN u u2 ON b.w2 = u2.w, n1, n2
WHERE c_12 >= 5
ORDER BY pmi DESC, w1, w2
LIMIT 100
""",
    doc="PMI collocation extraction over the document corpus: bigrams "
    "whose co-occurrence beats the independence baseline, ln p(w1,w2) / "
    "(p(w1)p(w2)) with a min-count floor — the classic phrase/collocation "
    "detector for tokenizer vocab design and corpus QA (complements "
    "text_bigram_logprob, which scores docs under the conditional LM "
    "rather than ranking the pairs). Bigrams are the zip-of-slices form "
    "(each slice evaluates the token array once — the transform/"
    "element_at trap measured 10× slower), counts are map-side partial "
    "aggregates into vocabulary-sized tables, totals are 1-row "
    "broadcasts, and the PMI argument is assembled with IDENTICAL "
    "parenthesization in both engines before the single ln (the PSI ln "
    "recipe). At 100 TB the only corpus-scale work is the explode; "
    "everything after is vocab-scale joins on uniform token keys.",
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logflow.functions.text import tokenize

    docs = load_table(spark, "documents", sf_dir)
    toks = tokenize("text")
    sz = F.size(toks)
    zipped = F.when(
        sz >= 2, F.arrays_zip(F.slice(toks, 1, sz - 1), F.slice(toks, 2, sz - 1))
    )
    uni = docs.select(F.explode_outer(toks).alias("w")).filter(
        F.col("w").isNotNull()
    )
    u = uni.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c_w"))
    n1 = uni.agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    bg = (
        docs.select(F.explode_outer(zipped).alias("x"))
        .filter(F.col("x").isNotNull())
        .select(F.col("x.0").alias("w1"), F.col("x.1").alias("w2"))
    )
    b = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c_12"))
    n2 = bg.agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pmi = F.round(
        F.log(
            ((d("c_12") * d("n_tokens")) / (d("c_1") * d("c_2")))
            * (d("n_tokens") / d("n_bigrams"))
        ),
        6,
    )
    return (
        b.filter(F.col("c_12") >= 5)
        .join(u.select(F.col("w").alias("w1"), F.col("c_w").alias("c_1")), "w1")
        .join(u.select(F.col("w").alias("w2"), F.col("c_w").alias("c_2")), "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select("w1", "w2", "c_12", "c_1", "c_2", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(100)
    )


@register(
    "seq_regex_funnel",
    """
WITH sym AS (
  SELECT user_id, ts, event_id, upper(substr(event_type, 1, 1)) AS c
  FROM events),
seq AS (
  SELECT user_id, string_agg(c, '' ORDER BY ts, event_id) AS s
  FROM sym GROUP BY user_id)
SELECT user_id,
       CAST(strlen(s) AS BIGINT) AS seq_len,
       CAST(len(regexp_extract_all(s, 'S[CV]*P')) AS BIGINT) AS n_funnels,
       CAST(COALESCE(list_max(list_transform(regexp_extract_all(s, 'C+'),
                                             x -> strlen(x))), 0)
            AS BIGINT) AS max_click_run
FROM seq
WHERE len(regexp_extract_all(s, 'S[CV]*P')) >= 1
ORDER BY n_funnels DESC, user_id
LIMIT 200
""",
    doc="MATCH_RECOGNIZE-style sequence pattern matching over per-user "
    "event streams, expressed as regex over a symbolized event string: "
    "each user's events (ordered by ts with the unique event_id "
    "tiebreak) map to one char (S=signup C=click P=purchase V=view "
    "E=error), and the funnel 'signup, then only clicks/views, then "
    "purchase' is the regex S[CV]*P counted non-overlapping. Both "
    "engines count leftmost non-overlapping matches identically for "
    "this star-free-ambiguity pattern, so counts are exact. At 100 TB: "
    "one shuffle groups each user's events (array_sort on the struct "
    "does the ordering map-side after the shuffle — no global sort), "
    "per-user strings are session-sized, and the regex scan is "
    "JVM-codegen per row. The same symbolization feeds "
    "path_common_trigrams; this query adds the PATTERN(A B* C) "
    "semantics SQL:2016 row-pattern matching provides.",
)
def seq_regex_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    sym = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.upper(F.substring("event_type", 1, 1)).alias("c"),
    )
    seq = sym.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "c"))),
                lambda x: x["c"],
            ),
            "",
        ).alias("s")
    )
    n_funnels = F.regexp_count(F.col("s"), F.lit(r"S[CV]*P"))
    runs = F.regexp_extract_all(F.col("s"), F.lit(r"C+"), 0)
    return (
        seq.select(
            "user_id",
            F.length("s").cast("long").alias("seq_len"),
            n_funnels.cast("long").alias("n_funnels"),
            F.coalesce(
                F.array_max(F.transform(runs, lambda x: F.length(x))), F.lit(0)
            )
            .cast("long")
            .alias("max_click_run"),
        )
        .filter(F.col("n_funnels") >= 1)
        .orderBy(F.desc("n_funnels"), "user_id")
        .limit(200)
    )


@register(
    "segment_overlap_jaccard",
    """
WITH up AS (SELECT DISTINCT event_type, user_id FROM events),
sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
       FROM up GROUP BY event_type),
ix AS (
  SELECT a.event_type AS seg_a, b.event_type AS seg_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM up a JOIN up b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type)
SELECT seg_a, seg_b, n_both, sa.n_users AS n_a, sb.n_users AS n_b,
       ROUND(CAST(n_both AS DOUBLE)
             / CAST(sa.n_users + sb.n_users - n_both AS DOUBLE), 6) AS jaccard,
       ROUND(CAST(n_both AS DOUBLE) / CAST(LEAST(sa.n_users, sb.n_users) AS DOUBLE),
             6) AS containment
FROM ix JOIN sz sa ON sa.event_type = seg_a JOIN sz sb ON sb.event_type = seg_b
ORDER BY seg_a, seg_b
""",
    doc="Audience-overlap matrix between behavioral segments (users who "
    "ever fired each event type): pairwise intersection sizes via a "
    "self-join of the DISTINCT (segment, user) table on the user key, "
    "with Jaccard and containment coefficients from exact BIGINT "
    "counts (one identical IEEE division each). At 100 TB: the "
    "distinct-pair table is one map-side-combined shuffle; the "
    "self-join fans out only per-user segment memberships (bounded by "
    "|segments|, here 5, so ≤ C(5,2) pair rows per user), and the "
    "result is |segments|² — driver-safe at any user count.",
)
def segment_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    up = ev.select("event_type", "user_id").distinct()
    sz = up.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    b = up.select(F.col("event_type").alias("seg_b"), "user_id")
    ix = (
        up.select(F.col("event_type").alias("seg_a"), "user_id")
        .join(b, "user_id")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        ix.join(F.broadcast(sz.select(F.col("event_type").alias("seg_a"), F.col("n_users").alias("n_a"))), "seg_a")
        .join(F.broadcast(sz.select(F.col("event_type").alias("seg_b"), F.col("n_users").alias("n_b"))), "seg_b")
        .select(
            "seg_a",
            "seg_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double"),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("n_both").cast("double")
                / F.least(F.col("n_a"), F.col("n_b")).cast("double"),
                6,
            ).alias("containment"),
        )
        .orderBy("seg_a", "seg_b")
    )


@register(
    "seq_run_length_encode",
    """
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn_t
  FROM events),
runs AS (
  SELECT user_id, event_type, rn - rn_t AS grp,
         CAST(COUNT(*) AS BIGINT) AS run_len,
         MIN(ts) AS run_start
  FROM s GROUP BY user_id, event_type, rn - rn_t)
SELECT user_id, event_type, run_len, run_start
FROM runs
WHERE run_len >= 3
ORDER BY run_len DESC, user_id, event_type, run_start
LIMIT 100
""",
    doc="Run-length encoding of per-user event streams (the gaps-and-"
    "islands trick generalized from calendar days to arbitrary ordered "
    "sequences): rn - rn_per_type is constant exactly within a "
    "maximal run of one event type, so one GROUP BY recovers every "
    "run with its length and start. Surfaces repeated-action bursts "
    "(3+ consecutive same-type events — rage clicks, error storms). "
    "Both ROW_NUMBERs share the (ts, event_id) unique total order, so "
    "runs are identical cross-engine; counts exact. At 100 TB: both "
    "windows and the run aggregate share ONE user_id shuffle.",
)
def seq_run_length_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
    )
    return (
        s.groupBy("user_id", "event_type", "grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("run_len"),
            F.min("ts").alias("run_start"),
        )
        .filter(F.col("run_len") >= 3)
        .select("user_id", "event_type", "run_len", "run_start")
        .orderBy(F.desc("run_len"), "user_id", "event_type", "run_start")
        .limit(100)
    )


# SPRT constants: H0 p=0.15 vs H1 p=0.25, alpha=beta=0.05. The log
# values are PYTHON-evaluated literals inlined into BOTH engines' text —
# engine ln() (JVM vs libm) can differ in the last ulp, a Python repr
# literal cannot.
_SPRT_K1 = 0.5108256237659907  # ln(p1/p0), per-success increment
_SPRT_K2 = -0.12516314295400605  # ln((1-p1)/(1-p0)), per-failure increment
_SPRT_A = 2.9444389791664403  # accept-H1 threshold  ln((1-beta)/alpha)
_SPRT_B = -2.9444389791664403  # accept-H0 threshold  ln(beta/(1-alpha))


@register(
    "ab_sprt_monitor",
    f"""
WITH trials AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS success,
         ts, event_id
  FROM events),
walk AS (
  SELECT arm,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS n,
         CAST(SUM(success) OVER w AS BIGINT) AS s,
         CAST(COUNT(*) OVER (PARTITION BY arm) AS BIGINT) AS n_total
  FROM trials
  WINDOW w AS (PARTITION BY arm ORDER BY ts, event_id)),
scored AS (
  SELECT arm, n, s, n_total,
         CAST(s AS DOUBLE) * {_SPRT_K1} + CAST(n - s AS DOUBLE) * {_SPRT_K2} AS llr
  FROM walk),
flagged AS (
  SELECT arm, n, s, llr,
         CASE WHEN llr >= {_SPRT_A} OR llr <= {_SPRT_B} THEN 1 ELSE 0 END AS crossed
  FROM scored),
picked AS (
  SELECT arm, n, s, llr, crossed,
         ROW_NUMBER() OVER (PARTITION BY arm
                            ORDER BY CASE WHEN crossed = 1 THEN 0 ELSE 1 END,
                                     CASE WHEN crossed = 1 THEN n ELSE -n END) AS rn
  FROM flagged)
SELECT arm,
       CASE WHEN llr >= {_SPRT_A} THEN 'accept_h1'
            WHEN llr <= {_SPRT_B} THEN 'accept_h0'
            ELSE 'continue' END AS decision,
       n AS n_events, s AS n_success,
       ROUND(llr, 6) AS llr
FROM picked WHERE rn = 1
ORDER BY arm
""",
    doc="Sequential probability ratio test (Wald 1945) replayed over each "
    "experiment arm's event stream (arm = user_id parity, success = "
    "purchase): the earliest event at which the cumulative "
    "log-likelihood ratio crosses the accept/reject boundary IS the "
    "sequential decision — the always-valid alternative to fixed-"
    "horizon A/B peeking. Exactness: llr after n trials is "
    "s*K1 + (n-s)*K2 with s an exact window-summed BIGINT and K1/K2 "
    "Python-repr literals inlined into BOTH engines (never engine "
    "ln()), so every llr is an identical 2-term IEEE expression; the "
    "first-crossing row is RANK-selected (crossings first by n, else "
    "the final row reports 'continue'). At 100 TB the walk is one "
    "window over arm-partitioned event order — the same shape as any "
    "running-total audit — and the decision table is arm-scale.",
)
def ab_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    trials = ev.select(
        (F.col("user_id") % 2).cast("long").alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("success"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("arm").orderBy("ts", "event_id")
    walk = trials.select(
        "arm",
        F.row_number().over(w).cast("long").alias("n"),
        F.sum("success").over(w).cast("long").alias("s"),
    )
    llr = F.col("s").cast("double") * F.lit(_SPRT_K1) + (
        F.col("n") - F.col("s")
    ).cast("double") * F.lit(_SPRT_K2)
    flagged = walk.select(
        "arm",
        "n",
        "s",
        llr.alias("llr"),
        F.when((llr >= _SPRT_A) | (llr <= _SPRT_B), 1).otherwise(0).alias("crossed"),
    )
    wp = Window.partitionBy("arm").orderBy(
        F.when(F.col("crossed") == 1, 0).otherwise(1),
        F.when(F.col("crossed") == 1, F.col("n")).otherwise(-F.col("n")),
    )
    decision = (
        F.when(F.col("llr") >= _SPRT_A, F.lit("accept_h1"))
        .when(F.col("llr") <= _SPRT_B, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
    )
    return (
        flagged.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(
            "arm",
            decision.alias("decision"),
            F.col("n").alias("n_events"),
            F.col("s").alias("n_success"),
            F.round("llr", 6).alias("llr"),
        )
        .orderBy("arm")
    )


# --------------------------------------------------------------------------
# Markov removal-effect attribution: the multi-touch attribution model.
# --------------------------------------------------------------------------

_MK_CHANNELS = ["click", "view", "signup", "error"]  # transient touch states
_MK_STEPS = 12  # fixed K-step unrolling of the absorbing chain


def _mk_prob_cols() -> str:
    """tm CTE columns: p_<src>_<dst> = c(src,dst)/c(src,*), 0.0 if absent."""
    cols = []
    for s in ["start"] + _MK_CHANNELS:
        for t in _MK_CHANNELS + ["conv"]:
            cols.append(
                f"COALESCE(CAST(SUM(CASE WHEN src = '{s}' AND dst = '{t}' THEN cnt"
                f" ELSE 0 END) AS DOUBLE)"
                f" / NULLIF(SUM(CASE WHEN src = '{s}' THEN cnt ELSE 0 END), 0),"
                f" 0.0) AS p_{s}_{t}"
            )
    return ",\n         ".join(cols)


def _mk_step_expr(s: str, removed: str | None, prev: str) -> str:
    """p_{k+1}(s) = p(s,conv) + sum over kept channels of p(s,t)*p_k(t) —
    a FIXED left-associated term order, identical text in both engines."""
    terms = [f"p_{s}_conv"]
    for t in _MK_CHANNELS:
        if t != removed:
            terms.append(f"p_{s}_{t} * {prev}_{t}")
    return " + ".join(terms)


def _mk_chain_ctes(tag: str, removed: str | None) -> str:
    """Unrolled K-step conversion-probability chain for one scenario."""
    states = ["start"] + [c for c in _MK_CHANNELS if c != removed]
    parts = []
    prev_cte, prev_col = "tm", None
    for k in range(1, _MK_STEPS + 1):
        col = f"x{tag}{k}"
        exprs = []
        for s in states:
            if k == 1:
                exprs.append(f"p_{s}_conv AS {col}_{s}")
            else:
                exprs.append(f"{_mk_step_expr(s, removed, f'x{tag}{k - 1}')} AS {col}_{s}")
        parts.append(f"c{tag}{k} AS (SELECT *, {', '.join(exprs)} FROM {prev_cte})")
        prev_cte = f"c{tag}{k}"
    return ",\n".join(parts), prev_cte


def _mk_sql() -> str:
    full_ctes, full_last = _mk_chain_ctes("f", None)
    # every chain extends tm with new columns; chain them sequentially so
    # the final CTE carries all scenarios' step-K columns
    chained = [full_ctes]
    prev = full_last
    for ch in _MK_CHANNELS:
        ctes, last = _mk_chain_ctes(ch[0], ch)
        ctes = ctes.replace("FROM tm)", f"FROM {prev})", 1)
        chained.append(ctes)
        prev = last
    effects = " + ".join(
        f"GREATEST(1.0 - x{ch[0]}{_MK_STEPS}_start / NULLIF(xf{_MK_STEPS}_start, 0.0), 0.0)"
        for ch in _MK_CHANNELS
    )
    rows: list[str] = []
    for ch in _MK_CHANNELS:
        eff = (
            f"GREATEST(1.0 - x{ch[0]}{_MK_STEPS}_start"
            f" / NULLIF(xf{_MK_STEPS}_start, 0.0), 0.0)"
        )
        rows.append(
            f"SELECT '{ch}' AS channel,"
            f" ROUND(xf{_MK_STEPS}_start, 6) AS p_conv_full,"
            f" ROUND(x{ch[0]}{_MK_STEPS}_start, 6) AS p_conv_removed,"
            f" ROUND({eff}, 6) AS removal_effect,"
            f" ROUND({eff} / NULLIF({effects}, 0.0), 4) AS attribution_share"
            f" FROM {prev}"
        )
    return f"""
WITH fp AS (
  SELECT user_id, ts AS fpts, event_id AS fpeid FROM (
    SELECT user_id, ts, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
journey AS (
  SELECT e.user_id, e.ts, e.event_id,
         CASE WHEN e.event_type = 'purchase' THEN 'conv' ELSE e.event_type END
           AS cur
  FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
  WHERE fp.user_id IS NULL OR e.ts < fp.fpts
     OR (e.ts = fp.fpts AND e.event_id <= fp.fpeid)),
seq AS (
  SELECT user_id, cur,
         LAG(cur, 1, 'start') OVER w AS prev,
         LEAD(cur) OVER w AS nxt
  FROM journey
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
trans AS (
  SELECT prev AS src, cur AS dst, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM seq GROUP BY prev, cur
  UNION ALL
  SELECT cur, 'null', CAST(COUNT(*) AS BIGINT)
  FROM seq WHERE nxt IS NULL AND cur <> 'conv' GROUP BY cur),
tm AS (
  SELECT {_mk_prob_cols()}
  FROM trans),
{",{chr10}".format(chr10=chr(10)).join(chained)}
SELECT channel, p_conv_full, p_conv_removed, removal_effect, attribution_share
FROM ({" UNION ALL ".join(rows)})
ORDER BY channel
"""


@register(
    "attribution_markov_removal",
    _mk_sql(),
    doc=f"Markov-chain multi-touch attribution by REMOVAL EFFECT "
    "(Anderl et al. 2014) — the model-based alternative to the "
    "heuristic last-touch / time-decay attributions already in the "
    "suite: user journeys (events up to the first purchase) become an "
    "absorbing Markov chain over touch states; a channel's credit is "
    "how much the start->conversion probability DROPS when the "
    "channel is removed. Deterministic throughout: transition "
    "probabilities are exact-integer-count ratios pivoted into FIXED "
    f"columns, the chain is unrolled {_MK_STEPS} fixed steps with an "
    "explicit left-associated term order per state (never a SUM over "
    "grouped rows, whose float accumulation order is engine-chosen; "
    "+/* are exactly-rounded IEEE ops so the same tree is "
    "bit-identical in Python, Spark, and DuckDB), and rounding stays "
    "engine-side. At 100 TB: the journeys pass is one user-"
    "partitioned window, transitions a tiny groupBy; the collected "
    "transition matrix is CONSTANT-size (state-count^2 doubles on one "
    "row) regardless of data volume, so the chain math is bounded "
    "driver work like the collected PQ codebooks.",
)
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    wfp = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(wfp))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("fpts"), F.col("event_id").alias("fpeid"))
    )
    journey = (
        ev.join(F.broadcast(fp), "user_id", "left")
        .filter(
            F.col("fpts").isNull()
            | (F.col("ts") < F.col("fpts"))
            | ((F.col("ts") == F.col("fpts")) & (F.col("event_id") <= F.col("fpeid")))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_type") == "purchase", F.lit("conv"))
            .otherwise(F.col("event_type"))
            .alias("cur"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = journey.select(
        "cur",
        F.lag("cur", 1, "start").over(w).alias("prev"),
        F.lead("cur").over(w).alias("nxt"),
    )
    # Pivot to fixed probability columns in ONE conditional aggregation
    # straight off the window output (a single pass; the previous
    # groupBy-UNION-groupBy form consumed `seq` twice, recomputing the
    # user window per branch). The terminal "null" pseudo-transition only
    # ever affects the DENOMINATOR (it is never a p_{s,t} numerator), so
    # tot(s) = #(prev = s) + #(terminal rows with cur = s). All counts are
    # exact integer sums — order-independent, identical in both engines.
    aggs = []
    terminal = F.col("nxt").isNull() & (F.col("cur") != "conv")
    for s in ["start"] + _MK_CHANNELS:
        tot = (
            F.sum(F.when(F.col("prev") == s, 1).otherwise(0))
            + F.sum(F.when(terminal & (F.col("cur") == s), 1).otherwise(0))
        ).cast("long")
        for t in _MK_CHANNELS + ["conv"]:
            num = F.sum(
                F.when((F.col("prev") == s) & (F.col("cur") == t), 1).otherwise(0)
            ).cast("long")
            aggs.append(
                F.coalesce(
                    num.cast("double") / F.nullif(tot, F.lit(0)), F.lit(0.0)
                ).alias(f"p_{s}_{t}")
            )
    # The transition matrix is CONSTANT-size regardless of data volume:
    # (1+channels) x (channels+1) doubles on ONE row. Collect it (bounded,
    # like the 16-row PQ codebooks in llm.py) and run the K-step chain in
    # Python. The previous form unrolled the 5 scenarios x 12 steps as 60
    # chained Spark selects over a growing ~280-column projection; Catalyst
    # re-analysis of that plan cost ~13 s DRIVER-side at any SF (20.9 s
    # total at sf0.1). The chain arithmetic below keeps the oracle's exact
    # left-associated term order — +/* are exactly-rounded IEEE ops, so
    # Python, Spark, and DuckDB produce bit-identical doubles for the same
    # expression tree. Rounding stays ENGINE-side (Spark F.round is
    # half-away-from-zero like DuckDB ROUND; Python round() is half-to-even
    # and must not be used — CLAUDE.md determinism rules).
    p = seq.agg(*aggs).first().asDict()

    def run_chain(removed: str | None) -> float:
        states = ["start"] + [c for c in _MK_CHANNELS if c != removed]
        x_prev: dict[str, float] = {}
        for k in range(1, _MK_STEPS + 1):
            x_cur: dict[str, float] = {}
            for s in states:
                e = p[f"p_{s}_conv"]
                if k > 1:
                    for t in _MK_CHANNELS:
                        if t != removed:
                            e = e + p[f"p_{s}_{t}"] * x_prev[t]
                x_cur[s] = e
            x_prev = x_cur
        return x_prev["start"]

    full = run_chain(None)
    removed = {ch: run_chain(ch) for ch in _MK_CHANNELS}

    def eff(ch: str) -> float:
        # GREATEST(1.0 - removed/NULLIF(full, 0.0), 0.0): both engines'
        # GREATEST skips NULL, so full == 0 degenerates to 0.0.
        if full == 0.0:
            return 0.0
        return max(1.0 - removed[ch] / full, 0.0)

    total_eff = eff(_MK_CHANNELS[0])
    for ch in _MK_CHANNELS[1:]:
        total_eff = total_eff + eff(ch)
    out = spark.createDataFrame(
        [
            (
                ch,
                full,
                removed[ch],
                eff(ch),
                (eff(ch) / total_eff) if total_eff != 0.0 else None,
            )
            for ch in _MK_CHANNELS
        ],
        "channel string, full double, rm double, eff double, sh double",
    )
    return out.select(
        "channel",
        F.round("full", 6).alias("p_conv_full"),
        F.round("rm", 6).alias("p_conv_removed"),
        F.round("eff", 6).alias("removal_effect"),
        F.round("sh", 4).alias("attribution_share"),
    ).orderBy("channel")


@register(
    "assoc_rules_triples",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c_i FROM li GROUP BY l_partkey),
freq AS (SELECT l_orderkey, li.l_partkey, c_i
         FROM li JOIN item ON li.l_partkey = item.l_partkey WHERE c_i >= 2),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM li),
p2 AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM freq a JOIN freq b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2),
items2 AS (SELECT DISTINCT pa AS pk FROM p2 UNION SELECT DISTINCT pb FROM p2),
b2 AS (SELECT l_orderkey, l_partkey FROM freq
       WHERE l_partkey IN (SELECT pk FROM items2)),
t AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, c.l_partkey AS pc,
         CAST(COUNT(*) AS BIGINT) AS c_abc
  FROM b2 a
  JOIN b2 b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN b2 c ON b.l_orderkey = c.l_orderkey AND a.l_orderkey = c.l_orderkey
           AND b.l_partkey < c.l_partkey
  GROUP BY a.l_partkey, b.l_partkey, c.l_partkey)
SELECT t.pa, t.pb, t.pc, t.c_abc, p2.c_ab, item.c_i AS c_c,
       ROUND(CAST(t.c_abc AS DOUBLE) / CAST(n.n_baskets AS DOUBLE), 6) AS support,
       ROUND(CAST(t.c_abc AS DOUBLE) / CAST(p2.c_ab AS DOUBLE), 6) AS conf_ab_c,
       ROUND((CAST(t.c_abc AS DOUBLE) * CAST(n.n_baskets AS DOUBLE))
             / (CAST(p2.c_ab AS DOUBLE) * CAST(item.c_i AS DOUBLE)), 6) AS lift_ab_c
FROM t
JOIN p2 ON t.pa = p2.pa AND t.pb = p2.pb
JOIN item ON t.pc = item.l_partkey
CROSS JOIN n
ORDER BY t.c_abc DESC, t.pa, t.pb, t.pc
LIMIT 100
""",
    doc="Frequent 3-itemsets with {a,b}→c rules — the Apriori LEVEL-2 "
    "extension of assoc_rules_copurchase. Monotonicity is applied twice "
    "before the cubic join ever runs: items below the support floor are "
    "pruned first (as in the pair query), then the 3-way self-join runs "
    "ONLY over items that appear in some frequent PAIR (a triple's every "
    "sub-pair must be frequent — classic Apriori candidate restriction), "
    "so the basket table feeding the triple join is the doubly-reduced "
    "one; the reported set is the TOP-100 candidate triples by frequency "
    "(a rank floor, not an absolute one — the fixed c_abc>=2 floor went "
    "degenerate-empty at sf0.1 as the co-purchase graph thins with SF, "
    "r11 verdict item 4). Rule metrics: support c_abc/n, confidence of {a,b}→c "
    "(c_abc/c_ab via a join back to the level-2 counts), and lift vs the "
    "consequent's base rate. At 100 TB: baskets are built with ONE "
    "order-key shuffle (collect_set dedups within the order); pairs AND "
    "triples explode MAP-SIDE from each basket's sorted array (strictly "
    "increasing positions, so pa<pb<pc by construction) with partial "
    "aggregation before their shuffles; the Apriori candidate "
    "restriction applies as a broadcast array_intersect of each basket "
    "with the frequent-pair item set (vocabulary-scale); level counts "
    "are vocabulary-scale and the basket total a 1-row broadcast. "
    "Triple blow-up is bounded by basket width (TPC-H ≤ 7 lines/order) "
    "choose 3 over the intersected baskets only. All counts exact "
    "BIGINTs; metrics are single IEEE divisions identically "
    "parenthesized; deterministic LIMIT via the unique (pa,pb,pc) "
    "tiebreak.",
)
def assoc_rules_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallelize=False: the first shuffle right below supplies the
    # downstream parallelism (the _copurchase_edges r13 rule)
    li = load_table(spark, "lineitem", sf_dir, parallelize=False)
    # one shuffle on the order key; sorted distinct parts per basket.
    # Consumers: basket total, item counts, pair explosion, b2 — bounded
    # at order-count scale; checkpoint truncates the lineitem lineage.
    baskets = li.groupBy(F.col("l_orderkey").alias("o")).agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    baskets = baskets.localCheckpoint(eager=True)
    n = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    item = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("c_i"))
    )
    # ps is a materialized attribute, so the nested transforms reference
    # it without re-inlining work per element (the bigram O(len^2) trap
    # does not apply); pa < pb by sorted-array position
    pair_expr = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"
    )
    p2 = (
        baskets.select(F.explode(pair_expr).alias("pr"))
        .select("pr.pa", "pr.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    # consumers: items2 (both columns), c_ab lookup join — pair-scale
    p2 = p2.localCheckpoint(eager=True)
    # Apriori candidate restriction: keep only items appearing in some
    # frequent pair. Explode + broadcast SEMI-JOIN + regroup — NOT
    # array_intersect against a 1-row broadcast array, which rebuilds
    # its membership structure per row (probed 17.3 s for this one pass
    # at sf0.1 with a ~6k-item set vs ~1 s for the join form)
    items2 = (
        p2.select(F.col("pa").alias("p"))
        .unionByName(p2.select(F.col("pb").alias("p")))
        .distinct()
    )
    b2 = (
        baskets.select("o", F.explode("ps").alias("p"))
        .join(F.broadcast(items2), "p", "leftsemi")
        .groupBy("o")
        .agg(F.sort_array(F.collect_list("p")).alias("ps"))
        .filter(F.size("ps") >= 3)
    )
    triple_expr = F.expr(
        "flatten(flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), (y, j) -> "
        "transform(slice(ps, i + j + 3, size(ps)), z -> "
        "struct(x AS pa, y AS pb, z AS pc))))))"
    )
    t = (
        b2.select(F.explode(triple_expr).alias("tr"))
        .select("tr.pa", "tr.pb", "tr.pc")
        .groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).cast("long").alias("c_abc"))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        t.join(p2, ["pa", "pb"])
        .join(
            item.select(F.col("p").alias("pc"), F.col("c_i").alias("c_c")),
            "pc",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "pa",
            "pb",
            "pc",
            "c_abc",
            "c_ab",
            "c_c",
            F.round(d("c_abc") / d("n_baskets"), 6).alias("support"),
            F.round(d("c_abc") / d("c_ab"), 6).alias("conf_ab_c"),
            F.round(
                (d("c_abc") * d("n_baskets")) / (d("c_ab") * d("c_c")), 6
            ).alias("lift_ab_c"),
        )
        .orderBy(F.desc("c_abc"), "pa", "pb", "pc")
        .limit(100)
    )


@register(
    "rfm_quintile_segments",
    """
WITH mx AS (SELECT MAX(o_orderdate) AS dmax FROM orders),
cust AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS monetary,
         MAX(o_orderdate) AS last_order
  FROM orders GROUP BY o_custkey),
base AS (
  SELECT o_custkey, frequency, monetary,
         CAST(monetary * 100 AS BIGINT) AS m_cents,
         date_diff('microsecond', last_order, dmax) // 86400000000 AS recency_days
  FROM cust CROSS JOIN mx),
q AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_q,
         ntile(5) OVER (ORDER BY -frequency, o_custkey) AS f_q,
         ntile(5) OVER (ORDER BY -m_cents, o_custkey) AS m_q
  FROM base)
SELECT r_q, f_q,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN m_q <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
       ROUND(CAST(SUM(monetary) AS DOUBLE), 2) AS monetary_total,
       ROUND(CAST(SUM(monetary) AS DOUBLE) / COUNT(*), 2) AS monetary_avg,
       CAST(MIN(recency_days) AS BIGINT) AS recency_min,
       CAST(MAX(recency_days) AS BIGINT) AS recency_max
FROM q
GROUP BY r_q, f_q
ORDER BY r_q, f_q
""",
    doc="RFM (recency / frequency / monetary) quintile segmentation — the "
    "classic CRM report: every customer scored 1-5 on each axis "
    "(1 = most recent / most frequent / highest spend), reported as the "
    "R×F grid with high-value (top-40% monetary) membership. The "
    "quintiles are exact ntile(5) over UNIQUE composites (metric + "
    "custkey tiebreak) — Spark computes them with "
    "operators/packing.global_ntile (quantile-edge range buckets + "
    "per-bucket row_number + broadcast offsets), so there is NO "
    "single-partition customer sort at any scale; DESC axes order by "
    "the negated exact value. Monetary is decimal-before-sum (exact "
    "cents); recency is a micros diff DIV'd to days (engine-identical "
    "for the post-epoch data); averages are one IEEE division of exact "
    "operands. At 100 TB: the per-customer rollup is one fact shuffle; "
    "everything after is customer-scale with broadcast offsets. The THREE "
    "global_ntile passes are deliberate: each axis orders by a different "
    "key, so each genuinely needs its own quantile edges + bucket "
    "row_number — all three run over the SAME persisted customer-scale "
    "aggregate (never the fact table), so the cost is 3× a bounded pass, "
    "not 3× the fact scan.",
)
def rfm_quintile_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logflow.operators.packing import global_ntile

    orders = load_table(spark, "orders", sf_dir)
    cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")).alias("monetary"),
        F.max("o_orderdate").alias("last_order"),
    )
    mx = orders.agg(F.max("o_orderdate").alias("dmax"))
    base = cust.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        "frequency",
        "monetary",
        (F.col("monetary") * 100).cast("long").alias("m_cents"),
        F.expr(
            "timestampdiff(MICROSECOND, last_order, dmax) DIV 86400000000"
        ).alias("recency_days"),
        (-F.col("frequency")).alias("neg_f"),
    )
    base = base.withColumn("neg_m", -F.col("m_cents"))
    # customer-scale and bounded -> eager localCheckpoint, not persist:
    # the three ntile branches + metric join re-expanded the orders-agg
    # lineage statically to 86 Exchange nodes under persist (the r10
    # static-plan-bloat rule); checkpoint truncates it
    base = base.coalesce(8).localCheckpoint(eager=True)
    # ONE multi-column approxQuantile pass computes all three axes' range
    # bucket edges (one driver action instead of three — each ntile pass
    # otherwise runs its own single-column quantile job over base)
    from logflow.operators.packing import default_bucket_count, quantile_probes

    nb = default_bucket_count(spark)
    e_r, e_f, e_m = base.stat.approxQuantile(
        ["recency_days", "neg_f", "neg_m"], quantile_probes(nb), 0.001
    )
    # each pass just ADDS its tile column, so chain them on the full frame
    # instead of joining three projected outputs back on o_custkey (3
    # customer-scale shuffle joins removed)
    joined = global_ntile(
        base, ["recency_days", "o_custkey"], 5, out_col="r_q", edges=e_r
    )
    joined = global_ntile(joined, ["neg_f", "o_custkey"], 5, out_col="f_q", edges=e_f)
    joined = global_ntile(joined, ["neg_m", "o_custkey"], 5, out_col="m_q", edges=e_m)
    return (
        joined.groupBy("r_q", "f_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(F.when(F.col("m_q") <= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_high_value"),
            F.round(F.sum("monetary").cast("double"), 2).alias("monetary_total"),
            F.round(
                F.sum("monetary").cast("double") / F.count(F.lit(1)), 2
            ).alias("monetary_avg"),
            F.min("recency_days").cast("long").alias("recency_min"),
            F.max("recency_days").cast("long").alias("recency_max"),
        )
        .orderBy("r_q", "f_q")
    )


@register(
    "fifo_inventory_matching",
    """
WITH b AS (
  SELECT l_partkey AS pk,
         CAST(ROUND(l_quantity, 0) AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice / l_quantity * 100, 0) AS BIGINT) AS uc,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) OVER (
              PARTITION BY l_partkey
              ORDER BY l_shipdate, l_orderkey, l_linenumber) AS BIGINT) AS cum
  FROM lineitem WHERE l_returnflag <> 'R'),
s AS (
  SELECT l_partkey AS pk,
         CAST(ROUND(l_quantity, 0) AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice / l_quantity * 100, 0) AS BIGINT) AS uc,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) OVER (
              PARTITION BY l_partkey
              ORDER BY l_shipdate, l_orderkey, l_linenumber) AS BIGINT) AS cum
  FROM lineitem WHERE l_returnflag = 'R'),
m AS (
  SELECT b.pk,
         LEAST(b.cum, s.cum) - GREATEST(b.cum - b.q, s.cum - s.q) AS mq,
         s.uc - b.uc AS margin_c
  FROM b JOIN s ON b.pk = s.pk
    AND b.cum > s.cum - s.q AND s.cum > b.cum - b.q)
SELECT p_brand,
       CAST(SUM(mq) AS BIGINT) AS matched_qty,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       ROUND(CAST(SUM(mq * margin_c) AS DOUBLE) / 100.0, 2) AS realized_margin
FROM m JOIN part ON pk = p_partkey
GROUP BY p_brand
ORDER BY p_brand
""",
    doc="FIFO inventory lot matching — the cost-allocation primitive "
    "behind realized-P&L and inventory-aging reports: per part, buy "
    "lots (non-returned lines) and sell lots (returned lines) are laid "
    "on the SAME cumulative-quantity axis in ship order, and lot i "
    "matches lot j exactly on the overlap of their [cum-q, cum) unit "
    "intervals — the classic running-sum interval-intersection "
    "formulation that turns sequential FIFO state into one declarative "
    "self-join. Quantities are exact BIGINTs, unit prices exact cents "
    "(one identical IEEE division rounded once), matched quantity and "
    "margin are exact integer arithmetic. At 100 TB: both running-sum "
    "windows partition by part (bounded per-part fan-in, no global "
    "sort); the overlap join is an equi-join on part + interval "
    "predicates with per-part bounded multiplicity (each buy matches "
    "O(1) amortized sells — total matches <= buys + sells); the "
    "streaming twin holds per-part watermarked state.",
)
def fifo_inventory_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)

    def lots(pred) -> DataFrame:
        w = Window.partitionBy("l_partkey").orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber"
        )
        q = F.round("l_quantity", 0).cast("long")
        return li.filter(pred).select(
            F.col("l_partkey").alias("pk"),
            q.alias("q"),
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100, 0)
            .cast("long")
            .alias("uc"),
            F.sum(q).over(w).cast("long").alias("cum"),
        )

    b = lots(F.col("l_returnflag") != "R").select(
        F.col("pk"),
        F.col("q").alias("bq"),
        F.col("uc").alias("buc"),
        F.col("cum").alias("bcum"),
    )
    s = lots(F.col("l_returnflag") == "R").select(
        F.col("pk").alias("spk"),
        F.col("q").alias("sq"),
        F.col("uc").alias("suc"),
        F.col("cum").alias("scum"),
    )
    m = b.join(
        s,
        (F.col("pk") == F.col("spk"))
        & (F.col("bcum") > F.col("scum") - F.col("sq"))
        & (F.col("scum") > F.col("bcum") - F.col("bq")),
    ).select(
        "pk",
        (
            F.least(F.col("bcum"), F.col("scum"))
            - F.greatest(F.col("bcum") - F.col("bq"), F.col("scum") - F.col("sq"))
        ).alias("mq"),
        (F.col("suc") - F.col("buc")).alias("margin_c"),
    )
    return (
        m.join(F.broadcast(part.select("p_partkey", "p_brand")), m.pk == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum("mq").cast("long").alias("matched_qty"),
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.round(
                F.sum(F.col("mq") * F.col("margin_c")).cast("double") / 100.0, 2
            ).alias("realized_margin"),
        )
        .orderBy("p_brand")
    )


@register(
    "finance_pvm_bridge",
    """
WITH yr AS (
  SELECT CAST(MIN(date_part('year', l_shipdate)) AS BIGINT) AS y0,
         CAST(MAX(date_part('year', l_shipdate)) AS BIGINT) AS y1
  FROM lineitem),
base AS (
  SELECT p.p_brand, date_part('year', l.l_shipdate) AS y,
         CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, date_part('year', l.l_shipdate)),
w AS (
  SELECT b0.p_brand,
         b0.q AS q0, b0.rev_c AS rev0_c, b1.q AS q1, b1.rev_c AS rev1_c
  FROM base b0 JOIN base b1 ON b0.p_brand = b1.p_brand
  CROSS JOIN yr
  WHERE b0.y = yr.y0 AND b1.y = yr.y1 AND b0.q > 0 AND b1.q > 0)
SELECT p_brand,
       ROUND(CAST(rev0_c AS DOUBLE) / 100.0, 2) AS revenue_p0,
       ROUND(CAST(rev1_c AS DOUBLE) / 100.0, 2) AS revenue_p1,
       ROUND((CAST(rev1_c AS DOUBLE) / CAST(q1 AS DOUBLE)
              - CAST(rev0_c AS DOUBLE) / CAST(q0 AS DOUBLE))
             * CAST(q1 AS DOUBLE) / 100.0, 2) AS price_effect,
       ROUND(CAST(rev0_c AS DOUBLE) / CAST(q0 AS DOUBLE)
             * CAST(q1 - q0 AS DOUBLE) / 100.0, 2) AS volume_effect
FROM w
ORDER BY p_brand
""",
    doc="Price-volume-mix bridge — the FP&A waterfall decomposing each "
    "brand's revenue change between the first and last shipping year "
    "into a PRICE effect ((p1-p0)*q1) and a VOLUME effect (p0*(q1-q0)), "
    "which sum EXACTLY to the revenue delta by construction (the "
    "two-factor Laspeyres/Paasche split). Quantities and revenue cents "
    "are exact BIGINT sums; average prices and both effects are one "
    "identical IEEE expression tree over those exact operands, rounded "
    "once. Brands active in only one period are excluded (their bridge "
    "is pure entry/exit, not price/volume). At 100 TB: one fact join + "
    "brand×year rollup (map-side combined), then a brand-scale "
    "self-join — the report is brand-sized.",
)
def finance_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    yr = li.agg(
        F.min(F.year("l_shipdate")).cast("long").alias("y0"),
        F.max(F.year("l_shipdate")).cast("long").alias("y1"),
    )
    base = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == part.p_partkey)
        .groupBy("p_brand", F.year("l_shipdate").alias("y"))
        .agg(
            F.sum(F.round("l_quantity", 0).cast("long")).cast("long").alias("q"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("rev_c"),
        )
    )
    b0 = base.select(
        "p_brand", F.col("y").alias("ya"),
        F.col("q").alias("q0"), F.col("rev_c").alias("rev0_c"),
    )
    b1 = base.select(
        F.col("p_brand").alias("brand_b"), F.col("y").alias("yb"),
        F.col("q").alias("q1"), F.col("rev_c").alias("rev1_c"),
    )
    w = (
        b0.join(b1, F.col("p_brand") == F.col("brand_b"))
        .crossJoin(F.broadcast(yr))
        .filter(
            (F.col("ya") == F.col("y0"))
            & (F.col("yb") == F.col("y1"))
            & (F.col("q0") > 0)
            & (F.col("q1") > 0)
        )
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    p0 = dd("rev0_c") / dd("q0")
    p1 = dd("rev1_c") / dd("q1")
    return w.select(
        "p_brand",
        F.round(dd("rev0_c") / 100.0, 2).alias("revenue_p0"),
        F.round(dd("rev1_c") / 100.0, 2).alias("revenue_p1"),
        F.round((p1 - p0) * dd("q1") / 100.0, 2).alias("price_effect"),
        F.round(p0 * (F.col("q1") - F.col("q0")).cast("double") / 100.0, 2).alias(
            "volume_effect"
        ),
    ).orderBy("p_brand")


# --------------------------------------------------------------------------
# Shapley-value attribution — the cooperative-game member of the
# attribution family (last-touch / time-decay / position / Markov
# removal): channels are players, the characteristic function is the
# observed conversion rate per EXACT touch-set, and credit is the exact
# 3-player Shapley average of marginal contributions.
# --------------------------------------------------------------------------

#: channel -> bitmask lane (click=1, signup=2, view=4)
_SHAP_CHANNELS = [("click", 1), ("signup", 2), ("view", 4)]


def _shap_phi(bit: int) -> str:
    """phi_i = sum over S not containing i of w(|S|) * (v(S+i) - v(S)),
    n = 3: w(0) = w(2) = 1/3, w(1) = 1/6. One literal expression over the
    8 per-mask conversion rates v0..v7 — identical text both engines."""
    others = [m for m in range(8) if not (m & bit)]
    terms = []
    for s in others:
        size = bin(s).count("1")
        w = "3.0" if size in (0, 2) else "6.0"
        terms.append(f"(v{s | bit} - v{s}) / {w}")
    return " + ".join(terms)


def _shap_wide_sql() -> str:
    """The 1-row wide frame: per-mask user counts, converter counts and
    v_m = conversion rate (0 when the mask is unpopulated)."""
    cols = []
    for m in range(8):
        cols.append(
            f"CAST(COALESCE(SUM(CASE WHEN mask = {m} THEN n_u END), 0) AS BIGINT)"
            f" AS n{m}"
        )
        cols.append(
            f"CAST(COALESCE(SUM(CASE WHEN mask = {m} THEN n_c END), 0) AS BIGINT)"
            f" AS c{m}"
        )
    return ", ".join(cols)


_SHAP_SQL = (
    """
WITH u AS (
  SELECT user_id,
         CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              + 2 * MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              + 4 * MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS mask,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM events GROUP BY user_id),
bym AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_u,
               CAST(SUM(conv) AS BIGINT) AS n_c
        FROM u GROUP BY mask),
wide AS (SELECT """
    + _shap_wide_sql()
    + " FROM bym),\nrates AS (SELECT *, "
    + ", ".join(
        f"CAST(c{m} AS DOUBLE) / NULLIF(CAST(n{m} AS DOUBLE), 0.0) AS vr{m}"
        for m in range(8)
    )
    + " FROM wide),\nv AS (SELECT *, "
    + ", ".join(f"COALESCE(vr{m}, 0.0) AS v{m}" for m in range(8))
    + " FROM rates)\n"
    + "SELECT channel, n_exposed, ROUND(shapley, 6) AS shapley_credit FROM (\n"
    + "\n  UNION ALL ".join(
        f"SELECT '{ch}' AS channel, CAST("
        + " + ".join(f"n{m}" for m in range(8) if m & bit)
        + f" AS BIGINT) AS n_exposed, {_shap_phi(bit)} AS shapley FROM v"
        for ch, bit in _SHAP_CHANNELS
    )
    + "\n) ORDER BY channel"
)


@register(
    "attribution_shapley",
    _SHAP_SQL,
    doc="Shapley-value attribution over the 3-channel touch game (click/"
    "signup/view -> purchase): per user, the EXACT set of channels "
    "touched is a 3-bit mask; v(S) is the observed conversion rate of "
    "users with exactly that touch set (empty cells contribute 0); "
    "each channel's credit is the exact 3-player Shapley value "
    "phi_i = sum_S w(|S|)(v(S+i)-v(S)) with w = 1/3, 1/6, 1/3 — the "
    "axiomatically fair division the heuristic attribution family "
    "approximates, and the complement to attribution_markov_removal's "
    "path-based counterfactual. Determinism: masks and per-mask "
    "counts are exact integers; each v_m is ONE identical IEEE "
    "division; phi is a generated-once literal expression (identical "
    "text both engines, left-associated). At 100 TB: one groupBy("
    "user) with 4 conditional maxes, one 8-row mask rollup, then "
    "constant-size arithmetic — the whole game fits in one stage "
    "regardless of corpus size; k channels cost a 2^k-row rollup "
    "(tractable to ~20 channels, sampled-permutation Shapley beyond).",
)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    u = ev.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
            + 2 * F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            + 4 * F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
        )
        .cast("long")
        .alias("mask"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("conv"),
    )
    bym = u.groupBy("mask").agg(
        F.count(F.lit(1)).cast("long").alias("n_u"),
        F.sum("conv").cast("long").alias("n_c"),
    )
    wide_cols = []
    for m in range(8):
        wide_cols.append(
            F.coalesce(F.sum(F.when(F.col("mask") == m, F.col("n_u"))), F.lit(0))
            .cast("long")
            .alias(f"n{m}")
        )
        wide_cols.append(
            F.coalesce(F.sum(F.when(F.col("mask") == m, F.col("n_c"))), F.lit(0))
            .cast("long")
            .alias(f"c{m}")
        )
    wide = bym.agg(*wide_cols)
    v = wide.select(
        "*",
        *[
            F.coalesce(
                F.col(f"c{m}").cast("double")
                / F.nullif(F.col(f"n{m}").cast("double"), F.lit(0.0)),
                F.lit(0.0),
            ).alias(f"v{m}")
            for m in range(8)
        ],
    )
    parts = []
    for ch, bit in _SHAP_CHANNELS:
        exposed = " + ".join(f"n{m}" for m in range(8) if m & bit)
        parts.append(
            v.select(
                F.lit(ch).alias("channel"),
                F.expr(f"CAST({exposed} AS BIGINT)").alias("n_exposed"),
                F.round(F.expr(_shap_phi(bit)), 6).alias("shapley_credit"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("channel")


# --------------------------------------------------------------------------
# Session edit distance — behavioral drift per user: how differently does
# the SECOND half of a user's event stream read vs the first half?
# Levenshtein over the compressed event-initial strings.
# --------------------------------------------------------------------------


@register(
    "seq_session_edit_distance",
    """
WITH e AS (
  SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS ch
  FROM events),
s AS (
  SELECT user_id, string_agg(ch, '' ORDER BY ts, event_id) AS seq
  FROM e GROUP BY user_id),
h AS (
  SELECT user_id,
         substr(seq, 1, len(seq) // 2) AS s1,
         substr(seq, len(seq) // 2 + 1, len(seq)) AS s2
  FROM s WHERE len(seq) >= 4),
d AS (
  SELECT CAST(levenshtein(s1, s2) AS BIGINT) AS edit_dist FROM h)
SELECT edit_dist, CAST(COUNT(*) AS BIGINT) AS n_users
FROM d
GROUP BY edit_dist
ORDER BY edit_dist
""",
    doc="Per-user behavioral drift: the event stream compresses to a "
    "string of event-type initials in exact (ts, event_id) order; the "
    "first and second halves are compared with LEVENSHTEIN (builtin "
    "both engines, exact integer) and the corpus reports the "
    "edit-distance histogram — stable routines cluster near 0, "
    "behavior shifts (or bot takeovers) push mass right. The ordered "
    "string build is Spark's array_sort-of-structs (lexicographic "
    "struct ordering == the oracle's string_agg ORDER BY ts, "
    "event_id — the unique-tiebreak window rule applied to "
    "aggregation order); halves split at len DIV 2 identically. At "
    "100 TB: one user-keyed shuffle; per-user strings are "
    "session-bounded (the longest observed user stream is ~hundreds "
    "of chars, and levenshtein is O(|s1|*|s2|) per user, "
    "embarrassingly parallel); the histogram is distance-scale.",
)
def seq_session_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    e = ev.select(
        "user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("ch")
    )
    s = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "ch"))
                ),
                lambda x: x["ch"],
            ),
            "",
        ).alias("seq")
    )
    h = s.filter(F.length("seq") >= 4).select(
        F.expr("substr(seq, 1, length(seq) DIV 2)").alias("s1"),
        F.expr("substr(seq, length(seq) DIV 2 + 1, length(seq))").alias("s2"),
    )
    return (
        h.select(F.levenshtein("s1", "s2").cast("long").alias("edit_dist"))
        .groupBy("edit_dist")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("edit_dist")
    )


# --------------------------------------------------------------------------
# Item-item Jaccard similarity — collaborative-filtering candidate
# generation over order baskets: "customers who bought A also bought B",
# normalized by how popular A and B are on their own.
# --------------------------------------------------------------------------

_IIJ_SCALE = 1_000_000
_IIJ_MIN_W = 2
_IIJ_TOPK = 50


@register(
    "reco_item_item_jaccard",
    f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
freq AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_orders FROM op GROUP BY p),
pairs AS (
  SELECT a.p AS item_a, b.p AS item_b, CAST(COUNT(*) AS BIGINT) AS w
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING COUNT(*) >= {_IIJ_MIN_W}),
j AS (
  SELECT item_a, item_b, w, fa.n_orders AS na, fb.n_orders AS nb,
         CAST((w * {_IIJ_SCALE}) // (fa.n_orders + fb.n_orders - w) AS BIGINT)
           AS jaccard_fp
  FROM pairs
  JOIN freq fa ON fa.p = item_a
  JOIN freq fb ON fb.p = item_b)
SELECT item_a, item_b, w AS n_co_orders, na, nb, jaccard_fp,
       ROUND(CAST(w AS DOUBLE) / CAST(na + nb - w AS DOUBLE), 6) AS jaccard
FROM j
ORDER BY jaccard_fp DESC, item_a, item_b
LIMIT {_IIJ_TOPK}
""",
    doc=f"Item-item collaborative-filtering candidates: Jaccard similarity "
    "of the ORDER SETS of part pairs (bipartite basket overlap, the "
    "'also bought' normalization that raw co-purchase counts miss — "
    "two blockbusters co-occur constantly without being related; "
    "Jaccard divides that out). Distinct from graph_link_prediction, "
    "which scores NON-edges by shared graph neighbors; this ranks "
    "EXISTING co-purchase pairs by direct basket overlap. Pairs come "
    f"from the one-shuffle basket build (w >= {_IIJ_MIN_W} pruning "
    "before the per-item frequency joins); the ranking key (w*1e6) "
    "DIV (na+nb-w) is pure BIGINT, ties break on the (a, b) pair. At "
    "100 TB: pair fan-out is bounded by parts-per-order; the two "
    "frequency joins are item-scale broadcasts; the top-k never "
    "sorts row-scale data (takeOrdered semantics under LIMIT).",
)
def reco_item_item_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallelize=False: the first shuffle right below supplies the
    # downstream parallelism (the _copurchase_edges r13 rule)
    li = load_table(spark, "lineitem", sf_dir, parallelize=False)
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    freq = op.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    ppo = op.groupBy("o").agg(F.collect_set("p").alias("ps"))
    pairs = (
        ppo.select(F.explode("ps").alias("u"), "ps")
        .select("u", F.explode("ps").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .groupBy(F.col("u").alias("item_a"), F.col("v").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .filter(F.col("w") >= _IIJ_MIN_W)
    )
    j = (
        pairs.join(
            freq.select(F.col("p").alias("item_a"), F.col("n_orders").alias("na")),
            "item_a",
        )
        .join(
            freq.select(F.col("p").alias("item_b"), F.col("n_orders").alias("nb")),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            F.col("w").alias("n_co_orders"),
            "na",
            "nb",
            F.expr(
                f"CAST((w * {_IIJ_SCALE}) DIV (na + nb - w) AS BIGINT)"
            ).alias("jaccard_fp"),
            F.round(
                F.col("w").cast("double")
                / (F.col("na") + F.col("nb") - F.col("w")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return j.orderBy(F.desc("jaccard_fp"), "item_a", "item_b").limit(_IIJ_TOPK)


# --------------------------------------------------------------------------
# Grid-cell DBSCAN over the (quantity, price) plane — density clustering
# restructured to CELL scale: quantize points to an exact integer grid,
# call a cell dense when it carries at least the mean per-cell load, and
# merge 8-adjacent dense cells with the connected-components machinery.
# --------------------------------------------------------------------------

_DBSCAN_PRICE_BIN = 2000.0  # price band width; quantity is already integer
_DBSCAN_KEYW = 1000  # cell key = cx * KEYW + cy (cy < KEYW by construction)

_DBSCAN_OFFSETS = [
    (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
]


@register(
    "cluster_dbscan_grid",
    f"""
WITH RECURSIVE pts AS (
  SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS cx,
         CAST(FLOOR(l_extendedprice / {_DBSCAN_PRICE_BIN}) AS BIGINT) AS cy
  FROM lineitem),
cells AS (
  SELECT cx, cy, cx * {_DBSCAN_KEYW} + cy AS key,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pts GROUP BY cx, cy),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_pts,
               CAST(COUNT(*) AS BIGINT) AS n_cells FROM cells),
dense AS (
  SELECT c.cx, c.cy, c.key, c.cnt FROM cells c CROSS JOIN tot
  WHERE c.cnt * tot.n_cells >= tot.n_pts),
off AS (SELECT * FROM (VALUES {", ".join(f"({dx}, {dy})" for dx, dy in _DBSCAN_OFFSETS)}) AS o(dx, dy)),
e AS (
  SELECT a.key AS u, b.key AS v
  FROM dense a CROSS JOIN off
  JOIN dense b ON b.cx = a.cx + off.dx AND b.cy = a.cy + off.dy
  WHERE a.key < b.key),
bid AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
lab AS (
  SELECT key AS id, key AS comp FROM dense
  UNION
  SELECT bid.v AS id, lab.comp FROM lab JOIN bid ON bid.u = lab.id),
cl AS (SELECT id, MIN(comp) AS comp FROM lab GROUP BY id)
SELECT CAST(cl.comp AS BIGINT) AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(d.cnt) AS BIGINT) AS n_points,
       CAST(MIN(d.cx) AS BIGINT) AS qty_min,
       CAST(MAX(d.cx) AS BIGINT) AS qty_max,
       CAST(MIN(d.cy) AS BIGINT) AS price_band_min,
       CAST(MAX(d.cy) AS BIGINT) AS price_band_max
FROM cl JOIN dense d ON d.key = cl.id
GROUP BY cl.comp
ORDER BY cluster_id
""",
    doc="Grid-cell DBSCAN over (l_quantity, l_extendedprice): points "
    f"quantize to EXACT integer cells (quantity x {_DBSCAN_PRICE_BIN:.0f}-"
    "wide price bands — floor on positive doubles, engine-identical), a "
    "cell is dense iff cnt * n_cells >= n_points (at-least-mean load: "
    "scale-free, pure BIGINT — no float epsilon anywhere), and clusters "
    "are connected components of the 8-adjacency graph over dense cells "
    "(grid DBSCAN a la Gunawan 2013: cell-level density + neighbor-cell "
    "merge approximates point DBSCAN with eps = one cell, at CELL-scale "
    "cost). The merge is driver-side min-label union-find over the "
    "DATA-INDEPENDENT cell domain (<= ~2.7k cells by grid geometry at "
    "any row count — bounded driver work, the attribution_markov "
    "contract; the distributed two-phase CC operator exists for "
    "data-scale graphs and measured 7 s of pure stage floor here); "
    "singleton dense cells are their own roots. The oracle is the exact "
    "recursive-CTE transitive min over the same bidirected cell graph — "
    "integer min labels, so convergence equals the closure EXACTLY. "
    "Noise = points in sparse cells, deliberately not emitted (the "
    "report is cluster-scale). At 100 TB: ONE map-side-combined "
    "groupBy to the bounded cell domain (~2.6k cells here), then "
    "everything — density rule, adjacency equi-join on shifted cells, "
    "CC, rollup — runs at cell scale; the point set is never joined "
    "or sorted.",
)
def cluster_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logflow.operators.cache import track

    li = load_table(spark, "lineitem", sf_dir)
    pts = li.select(
        F.round("l_quantity", 0).cast("long").alias("cx"),
        F.floor(F.col("l_extendedprice") / _DBSCAN_PRICE_BIN).cast("long").alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cells = cells.select(
        "cx", "cy", (F.col("cx") * _DBSCAN_KEYW + F.col("cy")).alias("key"), "cnt"
    )
    tot = cells.agg(
        F.sum("cnt").cast("long").alias("n_pts"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    # eager-persist above the fork: the dense-cell frame (bounded by the
    # grid domain) feeds the adjacency join twice, the self-loop seeds,
    # and the final rollup join — unpersisted, the full point-scale
    # groupBy re-executes per branch.
    dense = track(
        cells.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * F.col("n_cells") >= F.col("n_pts"))
        .select("cx", "cy", "key", "cnt")
        .coalesce(1)
        .persist()
    )
    dense.count()
    # The dense-cell MERGE runs on the driver: the cell domain is a
    # DATA-INDEPENDENT constant (quantity rounds to <= ~50 integer values
    # x <= ~53 price bands => <= ~2.7k cells regardless of row count), so
    # union-find over it is bounded driver work — the
    # attribution_markov_removal contract. The distributed alternative
    # (two_phase_connected_components, used by graph_cc_two_phase on
    # genuinely data-scale graphs) measured 7.0 s here purely in
    # iterative stage floors on a constant-size problem; the collect is
    # O(cells), the mapping broadcasts back, and the per-point rollup
    # stays distributed.
    cells_local = [(r["cx"], r["cy"], r["key"]) for r in dense.collect()]
    by_xy = {(cx, cy): key for cx, cy, key in cells_local}
    parent: dict[int, int] = {key: key for _, _, key in cells_local}

    def find(k: int) -> int:
        while parent[k] != k:
            parent[k] = parent[parent[k]]
            k = parent[k]
        return k

    for cx, cy, key in cells_local:
        for dx, dy in _DBSCAN_OFFSETS:
            nb = by_xy.get((cx + dx, cy + dy))
            if nb is not None:
                ra, rb = find(key), find(nb)
                if ra != rb:
                    # min-label union so comp = min member key, matching
                    # the oracle's transitive-min exactly
                    parent[max(ra, rb)] = min(ra, rb)
    mapping = spark.createDataFrame(
        [(key, find(key)) for _, _, key in cells_local], "key long, comp long"
    )
    return (
        dense.join(F.broadcast(mapping), "key")
        .groupBy(F.col("comp").cast("long").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("cnt").cast("long").alias("n_points"),
            F.min("cx").cast("long").alias("qty_min"),
            F.max("cx").cast("long").alias("qty_max"),
            F.min("cy").cast("long").alias("price_band_min"),
            F.max("cy").cast("long").alias("price_band_max"),
        )
        .orderBy("cluster_id")
    )


# --------------------------------------------------------------------------
# PrefixSpan sequential patterns — the sequence-mining twin of
# assoc_rules_triples: frequent SUBSEQUENCES (order matters, gaps allowed)
# of per-user event-type streams, with exact distinct-user supports.
# --------------------------------------------------------------------------

_PS_SUP_DEN = 2  # minsup = n_users DIV 2 (50% of users)


@register(
    "seq_prefixspan",
    f"""
WITH ev AS (
  SELECT user_id, event_type AS t,
         date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) AS tsm
  FROM events),
nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ev),
ms AS (SELECT n_users, n_users // {_PS_SUP_DEN} AS minsup FROM nu),
e1 AS (SELECT user_id, t AS a, MIN(tsm) AS t1 FROM ev GROUP BY user_id, t),
f1 AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS sup
       FROM e1 GROUP BY a
       HAVING COUNT(*) >= (SELECT minsup FROM ms)),
e1f AS (SELECT e1.user_id, e1.a, e1.t1 FROM e1 JOIN f1 ON e1.a = f1.a),
evf AS (SELECT ev.user_id, ev.t, ev.tsm FROM ev JOIN f1 ON ev.t = f1.a),
e2 AS (SELECT b.user_id, p.a, b.t AS b, MIN(b.tsm) AS t2
       FROM evf b JOIN e1f p ON b.user_id = p.user_id AND b.tsm > p.t1
       GROUP BY b.user_id, p.a, b.t),
f2 AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS sup
       FROM e2 GROUP BY a, b
       HAVING COUNT(*) >= (SELECT minsup FROM ms)),
e2f AS (SELECT e2.user_id, e2.a, e2.b, e2.t2
        FROM e2 JOIN f2 ON e2.a = f2.a AND e2.b = f2.b),
f3 AS (SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS sup FROM (
         SELECT s.user_id, p.a, p.b, s.t AS c
         FROM evf s JOIN e2f p ON s.user_id = p.user_id AND s.tsm > p.t2
         GROUP BY s.user_id, p.a, p.b, s.t)
       GROUP BY a, b, c
       HAVING COUNT(*) >= (SELECT minsup FROM ms))
SELECT pattern, length, support,
       ROUND(CAST(support AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS support_frac
FROM (
  SELECT a AS pattern, CAST(1 AS BIGINT) AS length, sup AS support FROM f1
  UNION ALL
  SELECT concat(a, '>', b), CAST(2 AS BIGINT), sup FROM f2
  UNION ALL
  SELECT concat(a, '>', b, '>', c), CAST(3 AS BIGINT), sup FROM f3
) CROSS JOIN nu
ORDER BY length, support DESC, pattern
""",
    doc="PrefixSpan-style sequential-pattern mining over per-user event "
    "streams: frequent subsequences (order matters, gaps allowed, strict "
    "ts inequality) of lengths 1-3 with EXACT distinct-user supports, "
    "minsup = 50% of users. Projection uses the earliest-occurrence "
    "greedy invariant — a pattern a>b>c is supported by a user iff "
    "min-ts(a), then min ts of b after it, then any c after THAT exist; "
    "greedy earliest occurrence is complete for subsequence matching, so "
    "supports are exact (no enumeration of all occurrences). Apriori "
    "pruning between levels: length-k candidates extend only frequent "
    "length-(k-1) patterns with frequent items, so the per-user join "
    "fan-out is bounded by |L1| <= |event-type domain| per level, never "
    "the raw sequence length squared. Exact-micros timestamps, BIGINT "
    "supports — hash-stable cross-engine. At 100 TB: ONE user-keyed "
    "shuffle establishes the partitioning every level reuses (groupBys "
    "and prefix joins are all user-keyed — no per-level re-shuffle); "
    "the frequent-set joins are broadcast (type-domain-scale); pattern "
    "space is bounded by |T|+|T|^2+|T|^3, a compile-time-ish constant "
    "independent of row count.",
)
def seq_prefixspan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logflow.operators.cache import track

    # parallelize=False: the explicit user_id repartition below is the
    # frame's real layout — the scan rebalance was a redundant exchange
    ev = load_table(spark, "events", sf_dir, parallelize=False).select(
        "user_id",
        F.col("event_type").alias("t"),
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        ).alias("tsm"),
    )
    # EVERY level of the pattern growth is keyed on user_id (the e1/e2
    # groupBys and both prefix joins): establish that partitioning ONCE
    # and persist it, so all downstream user-keyed operations reuse the
    # exchange (guide §2.4) — interleaved A/B won every pair 3-4x vs the
    # per-level shuffles. Width = defaultParallelism (cores locally,
    # cluster cores at scale), not a constant.
    ev = track(
        ev.repartition(spark.sparkContext.defaultParallelism, "user_id").persist()
    )
    nu = ev.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    # 1-row / type-domain-scale frames feed MANY plan branches: eager
    # localCheckpoint truncates the logical plan (the ml_class_prf1
    # lesson — persist alone leaves the lineage re-expanding per branch;
    # unchecked this query planned 101 Exchange nodes).
    ms = nu.select(
        "n_users", F.expr(f"n_users DIV {_PS_SUP_DEN}").alias("minsup")
    ).localCheckpoint(eager=True)
    e1 = track(
        ev.groupBy("user_id", F.col("t").alias("a"))
        .agg(F.min("tsm").alias("t1"))
        .persist()
    )
    f1 = (
        e1.groupBy("a")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .crossJoin(F.broadcast(ms))
        .filter(F.col("sup") >= F.col("minsup"))
        .select("a", "sup")
    ).localCheckpoint(eager=True)
    e1f = e1.join(F.broadcast(f1.select("a")), "a")
    evf = track(ev.join(F.broadcast(f1.select(F.col("a").alias("t"))), "t").persist())
    e2 = track(
        evf.alias("b")
        .join(e1f.alias("p"), "user_id")
        .filter(F.col("b.tsm") > F.col("p.t1"))
        .groupBy("user_id", "p.a", F.col("b.t").alias("b"))
        .agg(F.min("b.tsm").alias("t2"))
        .persist()
    )
    f2 = (
        e2.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .crossJoin(F.broadcast(ms))
        .filter(F.col("sup") >= F.col("minsup"))
        .select("a", "b", "sup")
    ).localCheckpoint(eager=True)
    e2f = e2.join(F.broadcast(f2.select("a", "b")), ["a", "b"])
    f3 = (
        evf.alias("s")
        .join(e2f.alias("p"), "user_id")
        .filter(F.col("s.tsm") > F.col("p.t2"))
        .groupBy("user_id", "p.a", "p.b", F.col("s.t").alias("c"))
        .agg(F.lit(1).alias("one"))
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .crossJoin(F.broadcast(ms))
        .filter(F.col("sup") >= F.col("minsup"))
        .select("a", "b", "c", "sup")
    )
    out = (
        f1.select(
            F.col("a").alias("pattern"),
            F.lit(1).cast("long").alias("length"),
            F.col("sup").alias("support"),
        )
        .unionByName(
            f2.select(
                F.concat_ws(">", "a", "b").alias("pattern"),
                F.lit(2).cast("long").alias("length"),
                F.col("sup").alias("support"),
            )
        )
        .unionByName(
            f3.select(
                F.concat_ws(">", "a", "b", "c").alias("pattern"),
                F.lit(3).cast("long").alias("length"),
                F.col("sup").alias("support"),
            )
        )
    )
    return (
        out.crossJoin(F.broadcast(nu))
        .select(
            "pattern",
            "length",
            "support",
            F.round(
                F.col("support").cast("double") / F.col("n_users").cast("double"), 6
            ).alias("support_frac"),
        )
        .orderBy("length", F.desc("support"), "pattern")
    )
