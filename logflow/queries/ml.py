"""In-engine ML training/evaluation operators: Naive Bayes text
classification (train + apply + confusion matrix) entirely as DataFrame
algebra.

Reference tie-in: the reference pipeline enriches keyed records with
derived attributes (StreamsConfig.java's mapValues stage); these queries
extend that derivation surface to supervised model FITTING — the model is
itself a small DataFrame (vocab × classes), built with the same shuffles
as any aggregate, and scoring is a hash join of the token stream against
the broadcast model. No driver-side math, no MLlib dependency: training at
100 TB is exactly two partial-agg shuffles over the token stream.

Cross-engine determinism: every log-probability follows the
text_unigram_logprob recipe — the argument is an exact BIGINT/BIGINT
double quotient (identical in both engines), ``log2`` of an identical
double is rounded ONCE at 6 dp and carried as DECIMAL(18,6); per-document
scores are exact decimal SUMs (order-independent), so the argmax and the
confusion matrix are bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logflow.functions.text import tokenize
from logflow.queries import register
from logflow.sources.tables import load_table

#: DuckDB mirror of logflow.functions.text.tokenize (pinned rules).
TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"


@register(
    "ml_nb_lang_confusion",
    f"""
WITH train AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 <> 0),
test  AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 = 0),
ttok AS (SELECT lang, unnest({TOKS}) AS tok FROM train),
cwc AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM ttok GROUP BY lang, tok),
nc AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_c FROM cwc GROUP BY lang),
v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vsize FROM ttok),
cls AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS d_c FROM train GROUP BY lang),
dtot AS (SELECT CAST(SUM(d_c) AS BIGINT) AS d_all FROM cls),
prior AS (
  SELECT cls.lang,
         CAST(ROUND(log2(CAST(d_c AS DOUBLE) / CAST(d_all AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS lp0,
         nc.n_c
  FROM cls CROSS JOIN dtot JOIN nc ON cls.lang = nc.lang),
model AS (
  SELECT cwc.lang, cwc.tok,
         CAST(ROUND(log2(CAST(cwc.cnt + 1 AS DOUBLE)
                         / CAST(nc.n_c + v.vsize AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS lp
  FROM cwc JOIN nc ON cwc.lang = nc.lang CROSS JOIN v),
unk AS (
  SELECT nc.lang,
         CAST(ROUND(log2(1.0 / CAST(nc.n_c + v.vsize AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS lpu
  FROM nc CROSS JOIN v),
tetok AS (SELECT doc_id, lang AS lang_true, unnest({TOKS}) AS tok FROM test),
scored_tok AS (
  SELECT t.doc_id, t.lang_true, u.lang AS lang_pred,
         COALESCE(m.lp, u.lpu) AS lp
  FROM tetok t
  CROSS JOIN unk u
  LEFT JOIN model m ON m.tok = t.tok AND m.lang = u.lang),
doc_scores AS (
  SELECT doc_id, lang_true, lang_pred, SUM(lp) AS tok_score
  FROM scored_tok GROUP BY doc_id, lang_true, lang_pred),
final_scores AS (
  SELECT d.doc_id, d.lang_true, d.lang_pred,
         d.tok_score + p.lp0 AS score
  FROM doc_scores d JOIN prior p ON d.lang_pred = p.lang),
pred AS (
  SELECT doc_id, lang_true, lang_pred,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang_pred) AS rk
  FROM final_scores)
SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred WHERE rk = 1
GROUP BY lang_true, lang_pred
ORDER BY lang_true, lang_pred
""",
    doc="Multinomial Naive Bayes language classifier trained IN-ENGINE on "
    "an 80/20 deterministic split (doc_id mod 5) of the documents table "
    "and evaluated as a confusion matrix over the held-out fold. "
    "Training is two partial-agg shuffles (per-class token counts, "
    "per-class totals); the fitted model is a vocab × classes DataFrame "
    "— dictionary-sized at any corpus scale, so scoring broadcasts it "
    "and the test token stream never shuffles (the only wide exchange "
    "is the per-(doc,class) score roll-up on doc_id). Laplace-smoothed "
    "log2 likelihoods follow the unigram-logprob determinism recipe: "
    "exact BIGINT ratio → one log2 → round 6dp → DECIMAL sum, so argmax "
    "is bit-stable cross-engine (ties broken by class name). At 100 TB "
    "the shape is unchanged: model stays vocab-sized, scores roll up "
    "map-side-combined on the document key.",
)
def ml_nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)

    ttok = train.select("lang", F.explode(tokenize("text")).alias("tok"))
    cwc = ttok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    nc = cwc.groupBy("lang").agg(F.sum("cnt").alias("n_c"))
    v = ttok.agg(F.countDistinct("tok").alias("vsize"))

    cls = train.groupBy("lang").agg(F.count(F.lit(1)).alias("d_c"))
    dtot = cls.agg(F.sum("d_c").alias("d_all"))
    prior = (
        cls.crossJoin(F.broadcast(dtot))
        .join(F.broadcast(nc), "lang")
        .select(
            "lang",
            F.round(F.log2(F.col("d_c").cast("double") / F.col("d_all").cast("double")), 6)
            .cast("decimal(18,6)")
            .alias("lp0"),
            "n_c",
        )
    )
    model = (
        cwc.join(F.broadcast(nc), "lang")
        .crossJoin(F.broadcast(v))
        .select(
            "lang",
            "tok",
            F.round(
                F.log2(
                    (F.col("cnt") + 1).cast("double")
                    / (F.col("n_c") + F.col("vsize")).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    unk = (
        nc.crossJoin(F.broadcast(v))
        .select(
            "lang",
            F.round(
                F.log2(F.lit(1.0) / (F.col("n_c") + F.col("vsize")).cast("double")), 6
            )
            .cast("decimal(18,6)")
            .alias("lpu"),
        )
    )

    tetok = test.select(
        "doc_id", F.col("lang").alias("lang_true"), F.explode(tokenize("text")).alias("tok")
    )
    scored_tok = (
        tetok.crossJoin(F.broadcast(unk.withColumnRenamed("lang", "lang_pred")))
        .join(
            F.broadcast(model.withColumnRenamed("lang", "lang_pred")),
            ["tok", "lang_pred"],
            "left",
        )
        .select(
            "doc_id",
            "lang_true",
            "lang_pred",
            F.coalesce(F.col("lp"), F.col("lpu")).alias("lp"),
        )
    )
    doc_scores = scored_tok.groupBy("doc_id", "lang_true", "lang_pred").agg(
        F.sum("lp").alias("tok_score")
    )
    final_scores = doc_scores.join(
        F.broadcast(prior.withColumnRenamed("lang", "lang_pred").select("lang_pred", "lp0")),
        "lang_pred",
    ).select(
        "doc_id",
        "lang_true",
        "lang_pred",
        (F.col("tok_score") + F.col("lp0")).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang_pred"))
    pred = final_scores.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        pred.groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang_true", "lang_pred")
    )
