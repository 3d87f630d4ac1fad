"""Distributed BPE tokenizer training: corpus word-freq + merge steps.

Byte-pair-encoding training is the canonical tokenizer-building step of
an LLM data pipeline. The key production insight (shared by HF
tokenizers): only the FIRST phase — word frequencies — touches the
corpus; every merge iteration then runs over the weighted VOCABULARY
(words × freq), which is orders of magnitude smaller. This operator does
exactly that: one corpus-scale explode+count shuffle, then each merge
step is a vocab-scale bigram count (partial-agg'd), a 1-row argmax, and
a map-side delimiter-guarded replace.

Two merge steps are unrolled so the whole training run stays a single
Catalyst plan with a plain (non-recursive) DuckDB oracle; a real run
loops the same update N-thousand times driver-side with the vocab
persisted (the dedup_cluster_canonical iteration pattern).

Determinism: pair counts are exact BIGINT sums; the winning pair is
argmax by (count DESC, symbol_a, symbol_b) — lexicographic tiebreak, no
floats anywhere. Greedy leftmost non-overlapping merge application is
identical in Spark's replace() (Java String semantics) and DuckDB's
replace(): both scan left-to-right and continue AFTER the replacement
(verified: ' a a a ' -> ' aa a '), which is standard BPE behavior. The
spaced representation keeps a sentinel space on both ends so the
pattern ' a b ' can never match across symbol boundaries (symbol 'xa'
followed by 'b' is ' xa b ' — no match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logflow.functions.text import tokenize
from logflow.queries import register
from logflow.queries.llm import TOKS
from logflow.sources.tables import load_table

_STEPS = 2

_BPE_SQL = f"""
WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(toks) AS w
        FROM (SELECT {TOKS} AS toks FROM documents))
  GROUP BY w
),
w0 AS (SELECT freq, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS sp FROM words),
pc1 AS (
  SELECT s[i] AS sym_a, s[i+1] AS sym_b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, string_split(trim(sp), ' ') AS s FROM w0),
       LATERAL (SELECT unnest(range(1, len(s))) AS i)
  GROUP BY s[i], s[i+1]
),
best1 AS (SELECT CAST(1 AS BIGINT) AS step, sym_a, sym_b, sym_a || sym_b AS merged, cnt
          FROM pc1 ORDER BY cnt DESC, sym_a, sym_b LIMIT 1),
w1 AS (SELECT freq,
              replace(sp, ' ' || sym_a || ' ' || sym_b || ' ', ' ' || merged || ' ') AS sp
       FROM w0 CROSS JOIN best1),
pc2 AS (
  SELECT s[i] AS sym_a, s[i+1] AS sym_b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, string_split(trim(sp), ' ') AS s FROM w1),
       LATERAL (SELECT unnest(range(1, len(s))) AS i)
  GROUP BY s[i], s[i+1]
),
best2 AS (SELECT CAST(2 AS BIGINT) AS step, sym_a, sym_b, sym_a || sym_b AS merged, cnt
          FROM pc2 ORDER BY cnt DESC, sym_a, sym_b LIMIT 1)
SELECT step, sym_a, sym_b, merged, cnt FROM best1
UNION ALL
SELECT step, sym_a, sym_b, merged, cnt FROM best2
"""


def _bigram_counts(cur: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol pair counts over the spaced vocab."""
    syms = cur.select("freq", F.split(F.trim(F.col("sp")), " ").alias("s"))
    n = F.size("s")
    pairs = F.zip_with(
        F.slice("s", F.lit(1), F.greatest(n - 1, F.lit(0))),
        F.slice("s", F.lit(2), F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("sym_a"), b.alias("sym_b")),
    )
    return (
        syms.select("freq", F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy(F.col("p.sym_a").alias("sym_a"), F.col("p.sym_b").alias("sym_b"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


@register(
    "bpe_merge_steps",
    _BPE_SQL,
    doc=f"Distributed BPE training, first {_STEPS} merge steps: corpus-scale "
    "work is ONE explode+count shuffle (word frequencies); every merge "
    "then runs over the weighted vocabulary — bigram partial-agg, exact-"
    "integer argmax with lexicographic tiebreak, 1-row broadcast of the "
    "winning pair, map-side delimiter-guarded replace (greedy leftmost, "
    "identical semantics in Spark/Java replace and DuckDB replace). At "
    "100 TB the corpus pass is unchanged and the ~30k-merge loop runs "
    "driver-side over the persisted vocab, each step costing vocab-size "
    "work — the HF-tokenizers layout, distributed.",
)
def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode_outer(tokenize(F.col("text"))).alias("w"))
        .filter(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    spaced = F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 "))
    cur = words.select("freq", spaced.alias("sp"))
    merges: list[DataFrame] = []
    for step in range(1, _STEPS + 1):
        best = (
            _bigram_counts(cur)
            .orderBy(F.desc("cnt"), "sym_a", "sym_b")
            .limit(1)
            .select(
                F.lit(step).cast("long").alias("step"),
                "sym_a",
                "sym_b",
                F.concat("sym_a", "sym_b").alias("merged"),
                "cnt",
            )
        )
        merges.append(best)
        pat = F.concat(F.lit(" "), F.col("sym_a"), F.lit(" "), F.col("sym_b"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("merged"), F.lit(" "))
        cur = cur.crossJoin(F.broadcast(best.select("sym_a", "sym_b", "merged"))).select(
            "freq", F.replace(F.col("sp"), pat, rep).alias("sp")
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out
