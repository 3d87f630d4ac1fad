"""Round-3 corpus operators: PII redaction, duplicated-chunk filtering,
BM25 search, inverted-index build, SemDeDup-style embedding pruning.

These extend the LLM-data-pipeline surface (llm.py) with the remaining
ops a production training-data pipeline runs between raw crawl and
tokenized shards:

* ``pii_redaction``       — regex scrub of emails / IPs / phone numbers
  (C4-style); pure map-side, zero shuffle.
* ``dup_chunk_filter``    — Gopher-style duplicated-content measure:
  fraction of a document's non-overlapping 10-token chunks that occur
  elsewhere in the corpus; gate at 20%.
* ``bm25_search``         — Okapi BM25 scoring of a fixed query against
  the corpus (k1=1.2, b=0.75), distributed top-k.
* ``inverted_index_postings`` — capped posting lists + df/tf stats per
  term (the retrieval-index build step).
* ``semdedup_prune``      — SemDeDup (Abbas et al. 2023): cluster
  embeddings, then prune near-duplicates within each cluster only —
  pairwise cost bounded by cluster size, never corpus².

The synthetic ``documents`` text carries no natural PII, so
``pii_redaction`` first injects deterministic doc_id-derived PII into the
text identically in both engines — the oracle then verifies the regex
scrub byte-exactly via md5.

Determinism notes (on top of queries/__init__.py rules): BM25 per-term
contributions are rounded to 6 decimals BEFORE the per-doc sum (the sum
is then an exact DECIMAL(18,6) add, order-independent); cosine is rounded
to 6 decimals before any compare (same convention as llm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logflow.functions.text import tokenize
from logflow.operators.similarity import _dot, _norm
from logflow.queries import register
from logflow.queries.llm import TOKS, _dd_sim
from logflow.sources.tables import load_table

# --- PII patterns: Java-regex ∩ RE2 compatible (no lookaround/backrefs) ---
_RE_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_RE_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_RE_PHONE = r"\b555-\d{4}\b"


@register(
    "pii_redaction",
    f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              || CASE WHEN doc_id % 2 = 0 THEN ' cc admin@corp.org' ELSE '' END
              || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
              || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS txt
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(txt, '{_RE_EMAIL}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(txt, '{_RE_IP}')) AS BIGINT) AS n_ip,
       CAST(len(regexp_extract_all(txt, '{_RE_PHONE}')) AS BIGINT) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(txt,
            '{_RE_EMAIL}', '<EMAIL>', 'g'),
            '{_RE_IP}', '<IP>', 'g'),
            '{_RE_PHONE}', '<PHONE>', 'g')) AS red_md5
FROM injected
""",
    doc="C4-style PII scrub: count + redact emails / IPv4s / phone numbers "
    "with patterns valid in both Java regex (Spark, codegen'd) and RE2 "
    "(DuckDB oracle) — no lookarounds or backreferences. The synthetic "
    "corpus has no natural PII, so deterministic doc_id-derived PII is "
    "injected identically in both engines first; the md5 of the redacted "
    "text then proves the scrub byte-exact. At 100 TB this is the ideal "
    "operator: pure map-side narrow transform, zero shuffle, regexes "
    "evaluated inside whole-stage codegen, scales linearly with "
    "executors. Row-level counts let the pipeline report PII incidence "
    "per source without a second pass.",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    did = F.col("doc_id")
    txt = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com"),
        F.when(did % 2 == 0, F.lit(" cc admin@corp.org")).otherwise(F.lit("")),
        F.lit(" from 10."),
        (did % 256).cast("string"),
        F.lit(".0.1"),
        F.lit(" call 555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    injected = docs.select("doc_id", txt.alias("txt"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("txt"), _RE_EMAIL, "<EMAIL>"), _RE_IP, "<IP>"
        ),
        _RE_PHONE,
        "<PHONE>",
    )
    return injected.select(
        "doc_id",
        F.regexp_count("txt", F.lit(_RE_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count("txt", F.lit(_RE_IP)).cast("long").alias("n_ip"),
        F.regexp_count("txt", F.lit(_RE_PHONE)).cast("long").alias("n_phone"),
        F.md5(red).alias("red_md5"),
    )


@register(
    "dup_chunk_filter",
    f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
d AS (SELECT doc_id, toks, CAST(floor(len(toks) / 10) AS BIGINT) AS n_chunks
      FROM t WHERE len(toks) >= 10),
c AS (SELECT doc_id, n_chunks, unnest(range(0, n_chunks)) AS i, toks FROM d),
ch AS (SELECT doc_id, n_chunks,
              md5(array_to_string(toks[(i*10+1):(i*10+10)], ' ')) AS h
       FROM c),
g AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS cnt FROM ch GROUP BY h)
SELECT doc_id,
       n_chunks,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       ROUND(CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / n_chunks, 4)
         AS dup_frac,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / n_chunks <= 0.2
         AS kept
FROM ch JOIN g USING (h)
GROUP BY doc_id, n_chunks
""",
    doc="Gopher-style duplicated-content gate: split each document into "
    "non-overlapping 10-token chunks, count global chunk frequency, and "
    "flag documents where >20% of chunks also occur elsewhere (boiler"
    "plate, mirrored pages, templated spam). Unlike MinHash (whole-doc "
    "similarity) this catches PARTIAL duplication inside otherwise-"
    "unique documents. Plan: one explode, one partial-agg'd count by "
    "chunk md5, one hash-join back, one per-doc agg — three shuffles "
    "all on uniform md5 keys (no skew). At 100 TB the chunk-count table "
    "is the big intermediate; a production run drops singleton chunks "
    "early (cnt>1 filter before the join-back, ~90% of mass here) or "
    "swaps the join for a Bloom filter of duplicated hashes.",
)
def dup_chunk_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    d = t.select(
        "doc_id", "toks", F.floor(F.size("toks") / 10).cast("long").alias("n_chunks")
    )
    # No `size(toks) >= 10` row filter — Catalyst would push it below the
    # projection and re-inline the tokenize into a scan-level Filter
    # (hof-in-filter; 2x tokenize per doc at 100 TB). Short docs get an
    # EMPTY chunk array instead and drop out at the explode_outer's
    # output-side null filter — same row set, one tokenize per doc.
    chunks_arr = F.when(
        F.col("n_chunks") >= 1,
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1),
            lambda i: F.md5(F.array_join(F.slice(F.col("toks"), i * 10 + 1, 10), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ch = d.select(
        "doc_id", "n_chunks", F.explode_outer(chunks_arr).alias("h")
    ).filter(F.col("h").isNotNull())
    g = ch.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    dup = F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).cast("long")
    per_doc = (
        ch.join(g, "h")
        .groupBy("doc_id", "n_chunks")
        .agg(dup.alias("n_dup_chunks"))
    )
    frac = F.col("n_dup_chunks").cast("double") / F.col("n_chunks")
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_dup_chunks",
        F.round(frac, 4).alias("dup_frac"),
        (frac <= 0.2).alias("kept"),
    )


_BM25_TERMS = ("window", "hash", "merge")
_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "bm25_search",
    f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
stats AS (SELECT CAST(SUM(dl) AS DOUBLE) / SUM(CASE WHEN dl > 0 THEN 1 ELSE 0 END)
                   AS avgdl,
                 CAST(SUM(CASE WHEN dl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
          FROM d),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM (SELECT doc_id, unnest(toks) AS term FROM t)
       WHERE term IN ({_BM25_IN})
       GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         SUM(CAST(ROUND(
               ln((n - df + 0.5) / (df + 0.5) + 1)
               * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)),
             6) AS DECIMAL(18,6))) AS s
  FROM tf JOIN df USING (term) JOIN d USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(ROUND(s, 4) AS DOUBLE) AS score, rank
FROM (SELECT doc_id, s,
             CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank
      FROM scored)
WHERE rank <= 20
""",
    doc="Okapi BM25 (k1=1.2, b=0.75) for the fixed query "
    f"{_BM25_TERMS}: postings restricted to query terms at explode "
    "time (the isin filter runs before any shuffle — the corpus-wide "
    "term table never materializes), df and the 1-row avgdl stats "
    "broadcast back, top-20 via TakeOrderedAndProject (per-partition "
    "partial top-k, no global sort). Cross-engine: each per-term "
    "contribution is rounded to 6dp and summed as DECIMAL(18,6) — "
    "order-independent exact addition — so ranking compares identical "
    "values; ln() may differ in the last ulp between libm and the JVM, "
    "absorbed by the 6dp round. At 100 TB this is the standard "
    "two-broadcast scatter-gather retrieval scoring pass.",
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    # dl stays unfiltered (empty docs contribute 0 to sum(dl) and are
    # excluded from the count via the CASE guard) — a `size(toks) > 0` row
    # filter would re-inline the tokenize below the projection.
    d = t.select("doc_id", F.size("toks").cast("long").alias("dl"))
    nonzero = F.sum(F.when(F.col("dl") > 0, 1).otherwise(0))
    stats = d.agg(
        (F.sum("dl").cast("double") / nonzero).alias("avgdl"),
        nonzero.cast("long").alias("n"),
    )
    # explode_outer, not explode: plain explode adds an implicit
    # size(toks)>0 filter that Catalyst pushes below the projection,
    # re-inlining the tokenize; the isin filter sits on the generate's
    # OUTPUT and also discards the null from empty docs.
    tf = (
        t.select("doc_id", F.explode_outer("toks").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    contrib = F.round(
        idf
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))),
        6,
    ).cast("decimal(18,6)")
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(d, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("s"))
    )
    top = scored.orderBy(F.desc("s"), "doc_id").limit(20)
    w = Window.orderBy(F.desc("s"), "doc_id")
    return top.select(
        "doc_id",
        F.round("s", 4).cast("double").alias("score"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


@register(
    "inverted_index_postings",
    f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM (SELECT doc_id, unnest(toks) AS term FROM t)
       GROUP BY doc_id, term),
r AS (SELECT *, row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM tf)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       string_agg(CASE WHEN rn <= 10 THEN CAST(doc_id AS VARCHAR) END, ','
                  ORDER BY doc_id) AS postings10
FROM r
GROUP BY term
HAVING COUNT(*) >= 5
""",
    doc="Inverted-index build: per term, document frequency, total term "
    "frequency, and the first 10 postings (sorted doc_ids, serialized "
    "for cross-engine compare). One explode → (doc,term) partial-agg'd "
    "count → per-term agg; posting lists are CAPPED so no reducer "
    "materializes an unbounded list — the cap is what makes the op safe "
    "for stop-word-frequency terms at 100 TB (a real index writes "
    "postings as bucketed segment files instead of one row; df/total_tf "
    "here are exactly the segment-merge statistics). HAVING df>=5 "
    "models the min-df vocabulary cut.",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    # explode_outer + output-side null filter (not plain explode, whose
    # implicit size>0 filter re-inlines the tokenize below the projection).
    tf = (
        t.select("doc_id", F.explode_outer("toks").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    postings = F.array_join(
        F.transform(
            F.slice(F.array_sort(F.collect_list("doc_id")), 1, 10),
            lambda x: x.cast("string"),
        ),
        ",",
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
            postings.alias("postings10"),
        )
        .filter(F.col("df") >= 5)
    )


_SEM_MIN_STRIDE = 4
_SEM_TAU = 0.4


def _sem_stride(n: int) -> int:
    """Centroid stride from the corpus count: every stride-th vec_id seeds
    a centroid, so k = ceil(n/stride) GROWS with the corpus and expected
    cluster size stays ~stride. stride = floor(sqrt(n)) balances the two
    cost terms (assignment n·k and within-cluster pairs k·stride²) at
    O(n^1.5) each. isqrt == DuckDB FLOOR(SQRT(..)) for all n < 2^52
    (IEEE sqrt is correctly rounded; the nearest representable double to
    sqrt(k²-1) is below k until k² > 2^52)."""
    import math

    return max(_SEM_MIN_STRIDE, math.isqrt(n))


@register(
    "semdedup_prune",
    f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
p AS (SELECT GREATEST({_SEM_MIN_STRIDE},
        CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)) AS stride FROM e),
c AS (SELECT vec_id AS centroid_id, embedding AS cvec
      FROM e, p WHERE vec_id % p.stride = 0),
sim AS (SELECT e.vec_id, c.centroid_id,
               {_dd_sim('e.embedding', 'c.cvec')} AS sim
        FROM e CROSS JOIN c),
assign AS (SELECT vec_id, centroid_id FROM (
             SELECT vec_id, centroid_id,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY sim DESC, centroid_id) AS rn
             FROM sim) WHERE rn = 1),
pruned AS (
  SELECT DISTINCT a.centroid_id, b.vec_id AS victim
  FROM assign a JOIN assign b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE {_dd_sim('ea.embedding', 'eb.embedding')} >= {_SEM_TAU}
)
SELECT g.centroid_id,
       CAST(g.n_members AS BIGINT) AS n_members,
       CAST(COALESCE(p.n_pruned, 0) AS BIGINT) AS n_pruned
FROM (SELECT centroid_id, COUNT(*) AS n_members FROM assign GROUP BY centroid_id) g
LEFT JOIN (SELECT centroid_id, COUNT(*) AS n_pruned FROM pruned GROUP BY centroid_id) p
  USING (centroid_id)
""",
    doc="SemDeDup (Abbas et al. 2023, arXiv:2303.09540): assign every "
    "embedding to its nearest centroid (cosine), then prune "
    "near-duplicates (sim >= "
    f"{_SEM_TAU}, keep-lowest-id) WITHIN clusters only — the pairwise "
    "step is O(k·cluster²), never corpus². k is DERIVED FROM THE CORPUS "
    "COUNT: every stride-th vec_id seeds a centroid with stride = "
    "floor(sqrt(n)) (deterministic and oracle-expressible — no global "
    "row_number window, just a map-side modulus), so k ≈ √n grows with "
    "the data and expected cluster size stays ~√n: both the assignment "
    "(n·k) and the pair join (k·cluster²) are O(n^1.5), the balanced "
    "optimum for one-level clustering. Past that regime a production "
    "run goes hierarchical (coarse-quantize the centroids IVF-style so "
    "assignment probes a subset) and refines seeds with Lloyd steps on "
    "dedup_cluster_canonical's convergence loop. Centroids broadcast "
    "(assign is map-side); the within-cluster self-join shuffles once "
    "on centroid_id. τ=0.4 fits the synthetic embedding similarity "
    "range (max pairwise cosine ≈0.51; production text embeddings use "
    "τ≈0.95+). Cosines rounded to 6dp before compare, assignment "
    "tie-broken by centroid_id.",
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    e = emb.select("vec_id", "embedding")
    # Corpus count → stride (one metadata-scale job; the 100 TB analogue
    # reads the table's row-count statistic). The oracle recomputes the
    # identical stride in SQL from the same table.
    stride = _sem_stride(e.count())
    cents = e.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    sim = F.round(
        _dot(F.col("embedding"), F.col("cvec"))
        / (_norm(F.col("embedding")) * _norm(F.col("cvec"))),
        6,
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "centroid_id")
    # embedding + its norm ride along through the assignment: the pair join
    # below then computes only the dot product per candidate pair (norms
    # would otherwise be recomputed per PAIR — 2×64 multiplies + 2 sqrt on
    # every one of the O(cluster²) candidates, measured ~3× the per-pair
    # cost). The self-joined subtree is identical on both sides, so Spark
    # reuses its shuffle via ReusedExchange.
    assign = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "centroid_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"), "centroid_id")
    )
    ea = assign.select(
        "centroid_id",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    eb = assign.select(
        F.col("centroid_id").alias("centroid_b"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pair_sim = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    pruned = (
        ea.join(
            eb,
            (F.col("centroid_id") == F.col("centroid_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .filter(pair_sim >= _SEM_TAU)
        .select("centroid_id", F.col("id_b").alias("victim"))
        .distinct()
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pruned"))
    )
    members = assign.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return members.join(pruned, "centroid_id", "left_outer").select(
        "centroid_id",
        "n_members",
        F.coalesce(F.col("n_pruned"), F.lit(0).cast("long")).alias("n_pruned"),
    )


@register(
    "corpus_diversity",
    f"""
WITH tok AS (
  SELECT source, unnest(toks) AS term
  FROM (SELECT source, {TOKS} AS toks FROM documents)
),
tf AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
       FROM tok GROUP BY source, term),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM tf GROUP BY source)
SELECT tf.source,
       CAST(ROUND(SUM(CAST(ROUND(
             -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n),
           6) AS DECIMAL(18,6))), 4) AS DOUBLE) AS shannon_entropy,
       ROUND(CAST(MIN(n_types) AS DOUBLE) / MIN(n), 6) AS type_token_ratio,
       CAST(MIN(n) AS BIGINT) AS n_tokens,
       CAST(MIN(n_types) AS BIGINT) AS n_types
FROM tf JOIN tot ON tf.source = tot.source
GROUP BY tf.source
""",
    doc="Per-source lexical diversity for mixture design: Shannon entropy "
    "of the token distribution (-Σ p·ln p, nats) and type-token ratio. "
    "Low-entropy sources are repetitive/templated (candidates for down-"
    "weighting or harsher dedup); the measure pairs with "
    "corpus_mixture_weights to decide sampling temperatures. Cross-"
    "engine: per-term contributions rounded to 6dp then summed as exact "
    "DECIMAL (the bm25/PSI ln recipe). Plan: one explode + two partial-"
    "agg'd counts — the per-(source,term) table after map-side combine "
    "is vocabulary-sized, not corpus-sized.",
)
def corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = (
        docs.select("source", F.explode_outer(tokenize(F.col("text"))).alias("term"))
        .filter(F.col("term").isNotNull())
    )
    tf = tok.groupBy("source", "term").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"), F.count(F.lit(1)).cast("long").alias("n_types")
    )
    p = F.col("c").cast("double") / F.col("n")
    contrib = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    return (
        tf.join(tot, "source")
        .groupBy("source")
        .agg(
            F.round(F.sum(contrib), 4).cast("double").alias("shannon_entropy"),
            F.round(F.min("n_types").cast("double") / F.min("n"), 6).alias(
                "type_token_ratio"
            ),
            F.min("n").cast("long").alias("n_tokens"),
            F.min("n_types").cast("long").alias("n_types"),
        )
    )


_CHUNK_C = 40  # chunk size (tokens)
_CHUNK_S = 30  # stride (tokens) -> 10-token overlap


@register(
    "corpus_chunk_documents",
    f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents WHERE doc_id % 25 = 0),
s AS (SELECT doc_id, toks, len(toks) AS sz FROM t WHERE len(toks) > 0),
n AS (SELECT doc_id, toks, sz,
             CASE WHEN sz <= {_CHUNK_C} THEN 1
                  ELSE (sz - {_CHUNK_C} + {_CHUNK_S} - 1) // {_CHUNK_S} + 1
             END AS nc
      FROM s),
c AS (SELECT doc_id, i AS chunk_idx,
             toks[i * {_CHUNK_S} + 1 : least(i * {_CHUNK_S} + {_CHUNK_C}, sz)] AS ct
      FROM n, LATERAL (SELECT unnest(range(0, nc)) AS i))
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(ct) AS BIGINT) AS n_toks,
       md5(array_to_string(ct, ' ')) AS chunk_md5
FROM c
""",
    doc=f"RAG document chunking: overlapping {_CHUNK_C}-token windows at "
    f"stride {_CHUNK_S} ({_CHUNK_C - _CHUNK_S}-token overlap) — the "
    "retrieval-corpus prep step between cleaning and embedding. The "
    "token-array table is materialized EAGERLY before the chunk "
    "explode (LSH-signature pattern): exploding chunk indices over an "
    "UNCACHED tokenize chain re-inlines the chain per CHUNK (~sz/stride "
    "re-tokenizations per doc — the CLAUDE.md transform/element_at "
    "family of traps); from the cached column each chunk is one slice. "
    "Chunk count is an exact integer ceil ((sz-C+S-1) DIV S + 1), so "
    "coverage is provable: chunk 0 starts at token 1, consecutive "
    "starts differ by the stride, the final chunk always reaches the "
    "last token (pytest). Spark slice() and DuckDB list[a:b] both clamp "
    "at the array end — same elements, hash-identical chunk md5s. "
    "doc_id%25 sampling keeps the checked result compact; the operator "
    "is sampling-free, and at 100 TB the materialize step IS the "
    "written intermediate table an embedding job would read.",
)
def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logflow.operators.cache import track

    # Empty-doc guard on the RAW text (text matches \S iff tokenize is
    # non-empty): a .filter(size(toks) > 0) over the projection would be
    # pushed below it as size(tokenize(...)) > 0, re-inlining the chain
    # into the Filter — 2x tokenize during cache materialization (the
    # CLAUDE.md hof-in-filter trap, flagged by explain_audit in round 4).
    docs = load_table(spark, "documents", sf_dir).filter(
        (F.col("doc_id") % 25 == 0) & F.col("text").rlike(r"\S")
    )
    t = track(docs.select("doc_id", tokenize(F.col("text")).alias("toks")).persist())
    t.count()  # materialize BEFORE the per-chunk consumer (see doc)
    sz = F.size("toks")
    nc = F.when(sz <= _CHUNK_C, 1).otherwise(
        F.expr(f"(size(toks) - {_CHUNK_C} + {_CHUNK_S} - 1) DIV {_CHUNK_S} + 1")
    )
    c = t.select(
        "doc_id", "toks", F.explode(F.sequence(F.lit(0), nc - 1)).alias("chunk_idx")
    )
    ct = F.slice(F.col("toks"), F.col("chunk_idx") * _CHUNK_S + 1, _CHUNK_C)
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(ct).cast("long").alias("n_toks"),
        F.md5(F.array_join(ct, " ")).alias("chunk_md5"),
    )


@register(
    "tfidf_cosine_pairs",
    f"""
WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM sub),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({TOKS}) AS tok FROM sub) GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
kept AS (
  SELECT df.tok, df.df,
         CAST(ROUND((ln((CAST(n.n_docs AS DOUBLE) + 1.0)
                        / (CAST(df.df AS DOUBLE) + 1.0)) + 1.0) * 1000, 0)
              AS BIGINT) AS idf3
  FROM df CROSS JOIN n
  WHERE df.df >= 2 AND 2 * df.df <= n.n_docs),
w AS (
  SELECT tf.doc_id, tf.tok, tf.tf * kept.idf3 AS wfp
  FROM tf JOIN kept ON tf.tok = kept.tok),
nrm AS (
  SELECT doc_id, sqrt(CAST(SUM(wfp * wfp) AS DOUBLE)) AS nn
  FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.wfp * b.wfp) AS BIGINT) AS dot_fp,
         CAST(COUNT(*) AS BIGINT) AS n_shared_terms
  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b, n_shared_terms,
       ROUND(CAST(dot_fp AS DOUBLE) / (na.nn * nb.nn), 6) AS cosine
FROM dots JOIN nrm na ON na.doc_id = doc_a JOIN nrm nb ON nb.doc_id = doc_b
ORDER BY cosine DESC, doc_a, doc_b
LIMIT 20
""",
    doc="Vector-space-model document similarity: pairwise cosine over "
    "SPARSE tf-idf vectors via the inverted index (postings self-join "
    "on shared terms → per-pair dot products), the classic IR sibling "
    "of the dense knn_cosine family. Weights are integer fixed point "
    "(tf × 1e3-scaled idf, idf rounded once from an exact-ratio ln), "
    "so dots and norm-squares are exact BIGINT sums and the cosine is "
    "one identical IEEE expression. Two explosion guards, both "
    "contract-style (cf. dedup_ngram_jaccard): the mod-10 doc subset "
    "bounds the pair space, and max_df = 50% prunes hub terms so the "
    "postings join fans out at most df² per kept term. At 100 TB the "
    "production form keeps both guards (shard-local pair generation + "
    "df-capped vocabulary — stopword-dense terms carry no signal and "
    "all the join cost), exactly as written here.",
)
def tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    sub = docs.filter(F.col("doc_id") % 10 == 0)
    n = sub.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        sub.select("doc_id", F.explode(tokenize("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf3 = F.round(
        (
            F.log(
                (F.col("n_docs").cast("double") + 1.0)
                / (F.col("df").cast("double") + 1.0)
            )
            + 1.0
        )
        * 1000,
        0,
    ).cast("long")
    kept = (
        df.crossJoin(F.broadcast(n))
        .filter((F.col("df") >= 2) & (2 * F.col("df") <= F.col("n_docs")))
        .select("tok", idf3.alias("idf3"))
    )
    w = tf.join(F.broadcast(kept), "tok").select(
        "doc_id", "tok", (F.col("tf") * F.col("idf3")).alias("wfp")
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wfp") * F.col("wfp")).cast("double")).alias("nn")
    )
    b = w.select(F.col("doc_id").alias("doc_b"), "tok", F.col("wfp").alias("wfp_b"))
    dots = (
        w.select(F.col("doc_id").alias("doc_a"), "tok", F.col("wfp").alias("wfp_a"))
        .join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("wfp_a") * F.col("wfp_b")).cast("long").alias("dot_fp"),
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
        )
    )
    return (
        dots.join(
            F.broadcast(nrm.select(F.col("doc_id").alias("doc_a"), F.col("nn").alias("na"))),
            "doc_a",
        )
        .join(
            F.broadcast(nrm.select(F.col("doc_id").alias("doc_b"), F.col("nn").alias("nb"))),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared_terms",
            F.round(F.col("dot_fp").cast("double") / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), "doc_a", "doc_b")
        .limit(20)
    )


@register(
    "search_rrf_fusion",
    f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
stats AS (SELECT CAST(SUM(dl) AS DOUBLE) / SUM(CASE WHEN dl > 0 THEN 1 ELSE 0 END)
                   AS avgdl,
                 CAST(SUM(CASE WHEN dl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
          FROM d),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM (SELECT doc_id, unnest(toks) AS term FROM t)
       WHERE term IN ({_BM25_IN})
       GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
bm_scored AS (
  SELECT tf.doc_id,
         SUM(CAST(ROUND(
               ln((n - df + 0.5) / (df + 0.5) + 1)
               * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)),
             6) AS DECIMAL(18,6))) AS s
  FROM tf JOIN df USING (term) JOIN d USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id),
bm AS (SELECT doc_id, rank FROM (
         SELECT doc_id,
                CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank
         FROM bm_scored) WHERE rank <= 20),
ql_scored AS (
  SELECT tf.doc_id,
         SUM(CAST(ROUND(CAST(tf AS DOUBLE) / dl, 6) AS DECIMAL(18,6))) AS s
  FROM tf JOIN d USING (doc_id)
  GROUP BY tf.doc_id),
ql AS (SELECT doc_id, rank FROM (
         SELECT doc_id,
                CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank
         FROM ql_scored) WHERE rank <= 20),
fused AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         CAST(COALESCE(a.rank, 0) AS BIGINT) AS rank_bm25,
         CAST(COALESCE(b.rank, 0) AS BIGINT) AS rank_ql,
         COALESCE(1.0 / (60 + a.rank), 0.0)
           + COALESCE(1.0 / (60 + b.rank), 0.0) AS rrf
  FROM bm a FULL JOIN ql b ON a.doc_id = b.doc_id)
SELECT doc_id, rank_bm25, rank_ql, fused_rank, ROUND(rrf * 1000, 6) AS rrf_x1000
FROM (SELECT doc_id, rank_bm25, rank_ql, rrf,
             CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
               AS fused_rank
      FROM fused)
WHERE fused_rank <= 10
ORDER BY fused_rank
""",
    doc="Reciprocal-rank fusion (Cormack et al. 2009, k=60) of two REAL "
    "retrieval systems over the same fixed query: Okapi BM25 "
    "(bm25_search's exact pipeline, reused as a subroutine) and a "
    "length-normalized query-likelihood ranking (sum of tf/dl per "
    "query term) — the standard way hybrid lexical+semantic search "
    "merges rankers without score calibration, since RRF consumes "
    "RANKS only. Each system contributes 1/(60+rank) for its top-20 "
    "(absent -> 0, FULL OUTER join); both contributions and their "
    "2-term sum are identical IEEE doubles, so the fused ordering is "
    "engine-identical with a doc_id tiebreak. At 100 TB each ranker is "
    "its own bounded top-k (partial top-k per partition, no global "
    "sort) and the fusion join touches 2x20 rows.",
)
def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    bm = bm25_search(spark, sf_dir).select("doc_id", F.col("rank").alias("rank_a"))
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    d = t.select("doc_id", F.size("toks").cast("long").alias("dl"))
    tf = (
        t.select("doc_id", F.explode_outer("toks").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    ql_scored = (
        tf.join(d, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.round(F.col("tf").cast("double") / F.col("dl"), 6).cast(
                    "decimal(18,6)"
                )
            ).alias("s")
        )
    )
    wq = Window.orderBy(F.desc("s"), "doc_id")
    ql = (
        ql_scored.withColumn("rank_b", F.row_number().over(wq).cast("long"))
        .filter(F.col("rank_b") <= 20)
        .select("doc_id", "rank_b")
    )
    fused = bm.join(ql, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("rank_a", F.lit(0)).cast("long").alias("rank_bm25"),
        F.coalesce("rank_b", F.lit(0)).cast("long").alias("rank_ql"),
        (
            F.coalesce(F.lit(1.0) / (F.col("rank_a") + 60), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.col("rank_b") + 60), F.lit(0.0))
        ).alias("rrf"),
    )
    wf = Window.orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= 10)
        .select(
            "doc_id",
            "rank_bm25",
            "rank_ql",
            "fused_rank",
            F.round(F.col("rrf") * 1000, 6).alias("rrf_x1000"),
        )
        .orderBy("fused_rank")
    )


# --------------------------------------------------------------------------
# Bigram novelty scoring — the training-data "how much of this document
# is new text" gate: the fraction of a doc's distinct word bigrams that
# appear in NO other document (df == 1).  Sequence-level novelty, the
# complement of the containment/Jaccard dedup family (which measures
# overlap; this measures what overlap leaves behind).
# --------------------------------------------------------------------------


@register(
    "corpus_bigram_novelty",
    f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM t WHERE len(toks) >= 2),
posts AS (SELECT doc_id, unnest(bg) AS g FROM bg),
df AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM posts GROUP BY g),
nov AS (
  SELECT p.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM posts p JOIN df ON df.g = p.g
  GROUP BY p.doc_id)
SELECT doc_id, n_bigrams, n_novel,
       ROUND(CAST(n_novel AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6) AS novelty
FROM nov
ORDER BY doc_id
""",
    doc="Per-document bigram novelty: the fraction of a doc's DISTINCT "
    "word bigrams whose document frequency is exactly 1 (they appear "
    "nowhere else in the corpus) — the sequence-level freshness score "
    "a training-data pipeline uses to downweight boilerplate-heavy "
    "documents (complement of the dedup family: dedup measures "
    "overlap, novelty measures what overlap leaves behind). Bigrams "
    "are built with the positional zip (each array evaluated once per "
    "row — the O(len^2) transform trap is documented at "
    "text_bigram_logprob); df and the novel-count are exact BIGINTs "
    "via one posting join against the corpus-wide df table. At "
    "100 TB: one bigram explode + one gram-keyed df shuffle + one "
    "doc-keyed rollup; df could swap to a broadcast Bloom of the "
    "df>1 grams — documented swap.",
)
def corpus_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logflow.operators.cache import track

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    # positional-zip bigrams (arrays_zip of two slices: each slice
    # evaluates toks once per row; a transform(sequence(...)) form would
    # re-inline toks into every element_at — the measured 10x trap)
    bg = toks.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(arrays_zip(slice(toks, 1, size(toks) - 1),"
                " slice(toks, 2, size(toks) - 1)),"
                " p -> concat(p['0'], ' ', p['1']))"
            )
        ).alias("bg"),
    )
    # explode_outer + output-side null filter, NOT plain explode: plain
    # explode makes Catalyst synthesize a size(bg) > 0 filter and push it
    # below the projection, re-inlining the whole tokenize+zip chain into
    # the scan (the queries/corpus.py explode rule)
    posts = track(
        bg.select("doc_id", F.explode_outer("bg").alias("g"))
        .filter(F.col("g").isNotNull())
        .persist()
    )
    posts.count()  # feeds the df build AND the novelty join
    df = posts.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("df"))
    nov = (
        posts.join(df, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return nov.select(
        "doc_id",
        "n_bigrams",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_bigrams").cast("double"), 6
        ).alias("novelty"),
    ).orderBy("doc_id")
