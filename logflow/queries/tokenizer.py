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
    # merge loop lives in operators/bpe.py:bpe_merge_table (shared with
    # the hypothesis property suite, which drives it with random
    # vocabularies against a pure-Python greedy-merge reference)
    from logflow.operators.bpe import bpe_merge_table

    docs = load_table(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode_outer(tokenize(F.col("text"))).alias("w"))
        .filter(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return bpe_merge_table(words, _STEPS)


_ENCODE_SQL = f"""
WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(toks) AS w
        FROM (SELECT {TOKS} AS toks FROM documents))
  GROUP BY w
),
w0 AS (SELECT w, freq, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS sp FROM words),
pc1 AS (
  SELECT s[i] AS sym_a, s[i+1] AS sym_b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, string_split(trim(sp), ' ') AS s FROM w0),
       LATERAL (SELECT unnest(range(1, len(s))) AS i)
  GROUP BY s[i], s[i+1]
),
best1 AS (SELECT sym_a, sym_b, sym_a || sym_b AS merged
          FROM pc1 ORDER BY cnt DESC, sym_a, sym_b LIMIT 1),
w1 AS (SELECT w, freq,
              replace(sp, ' ' || sym_a || ' ' || sym_b || ' ', ' ' || merged || ' ') AS sp
       FROM w0 CROSS JOIN best1),
pc2 AS (
  SELECT s[i] AS sym_a, s[i+1] AS sym_b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, string_split(trim(sp), ' ') AS s FROM w1),
       LATERAL (SELECT unnest(range(1, len(s))) AS i)
  GROUP BY s[i], s[i+1]
),
best2 AS (SELECT sym_a, sym_b, sym_a || sym_b AS merged
          FROM pc2 ORDER BY cnt DESC, sym_a, sym_b LIMIT 1),
w2 AS (SELECT w,
              replace(sp, ' ' || sym_a || ' ' || sym_b || ' ', ' ' || merged || ' ') AS sp
       FROM w1 CROSS JOIN best2),
dt AS (
  SELECT doc_id, unnest(toks) AS w
  FROM (SELECT doc_id, {TOKS} AS toks FROM documents WHERE doc_id % 50 = 0)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(length(w)) AS BIGINT) AS n_syms0,
       CAST(SUM(len(string_split(trim(sp), ' '))) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(len(string_split(trim(sp), ' '))) AS DOUBLE)
             / CAST(SUM(length(w)) AS DOUBLE), 6) AS compression
FROM dt JOIN w2 USING (w)
GROUP BY doc_id
"""


@register(
    "bpe_encode_corpus",
    _ENCODE_SQL,
    doc=f"BPE tokenizer APPLICATION — the other half of bpe_merge_steps: "
    f"train {_STEPS} merges over the full-corpus vocabulary, apply them "
    "to the VOCABULARY (operators/bpe.py:bpe_apply_table), then encode a "
    "doc sample by one hash join from the exploded corpus onto the "
    "(word -> symbols) table: per doc, token counts before (chars) and "
    "after merges plus the compression ratio. The scale property is the "
    "join shape: merge application never touches documents — a 100 TB "
    "encode is corpus-explode ⋈ vocab, with the same delimiter-guarded "
    "replace semantics all engines share (see bpe_merge_reference). "
    "Exact integer counts; one IEEE division for the ratio, rounded. "
    "doc_id%50 sampling keeps the checked result compact; the operator "
    "itself is sampling-free.",
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logflow.operators.bpe import bpe_apply_table

    docs = load_table(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode_outer(tokenize(F.col("text"))).alias("w"))
        .filter(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    vocab = bpe_apply_table(words, _STEPS).select(
        "w", F.size(F.split(F.trim(F.col("sp")), " ")).alias("n_sym")
    )
    dt = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", F.explode_outer(tokenize(F.col("text"))).alias("w"))
        .filter(F.col("w").isNotNull())
    )
    j = dt.join(vocab, "w")
    n_tokens = F.sum("n_sym").cast("long")
    n_syms0 = F.sum(F.length("w")).cast("long")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        n_syms0.alias("n_syms0"),
        n_tokens.alias("n_tokens"),
        F.round(n_tokens.cast("double") / n_syms0.cast("double"), 6).alias("compression"),
    )
