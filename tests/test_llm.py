"""Oracle parity + semantic checks for dedup/similarity/text queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

LLM_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "knn_cosine_brute",
    "knn_cosine_ivf",
    "knn_cosine_numpy",
    "text_quality",
    "text_lang_id",
    "text_token_count",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "dedup_cluster_canonical",
    "pack_token_shards",
    "corpus_build_pipeline",
    "text_robust_zscore",
    "text_vocab_topk",
    "sample_hash_weighted",
    "text_clean_normalize",
    "text_repetition_ratio",
    "corpus_dedup_stats",
    "knn_recall_eval",
    "embedding_quantize_int8",
    "contamination_ngram_overlap",
    "text_unigram_logprob",
    "corpus_mixture_weights",
    "fuzzy_match_part_names",
    "quality_classifier_infer",
]


@pytest.mark.parametrize("name", LLM_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    from tests.oracle import check_query

    check_query(spark, duck, name, sf_dir)


def test_numpy_knn_matches_expression_knn(spark, sf_dir):
    """The Arrow/BLAS path must return the same neighbors as the
    expression path (both rank on sim rounded to 6dp)."""
    from logflow.queries import load_all

    reg = load_all()
    expr = reg["knn_cosine_brute"].fn(spark, sf_dir).toPandas()
    vec = reg["knn_cosine_numpy"].fn(spark, sf_dir).toPandas()
    key = ["qid", "rank"]
    e = expr.sort_values(key).reset_index(drop=True)
    v = vec.sort_values(key).reset_index(drop=True)
    assert (e["neighbor_id"] == v["neighbor_id"]).all()
    assert (e["sim"] - v["sim"]).abs().max() < 1e-9


def test_minhash_finds_exact_duplicates(spark):
    """A doc and its exact copy must share all buckets → candidate pair
    with jaccard 1.0; an unrelated doc must not pair with them."""
    from logflow.operators.dedup import minhash_lsh_pairs

    text_a = "the quick brown fox jumps over the lazy dog again and again today"
    text_c = "completely different words entirely unrelated content nothing shared here at all folks"
    df = spark.createDataFrame(
        [(1, text_a), (2, text_a), (3, text_c)], "doc_id long, text string"
    )
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in minhash_lsh_pairs(df, "doc_id", "text").collect()}
    assert pairs.get((1, 2)) == 1.0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_identical_docs_same_hash(spark):
    from logflow.operators.dedup import simhash_16

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zeta eta theta iota")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.simhash, r.n_bucket) for r in simhash_16(df, "doc_id", "text").collect()}
    assert rows[1][0] == rows[2][0]
    assert rows[1][1] == 2
    assert rows[3][0] != rows[1][0]


def test_knn_self_similarity(spark, sf_dir):
    """A corpus vector used as its own query must rank itself first with sim 1."""
    from logflow.operators.similarity import cosine_topk
    from logflow.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") == 42).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = cosine_topk(emb, q, "vec_id", "embedding", k=1).collect()
    assert len(out) == 1 and out[0].neighbor_id == 42 and abs(out[0].sim - 1.0) < 1e-9


def test_stratified_sample_fractions(spark, sf_dir):
    """sampleBy fractions land within binomial tolerance per stratum and
    the sample is reproducible for a fixed seed."""
    import zlib

    from logflow.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    fractions = {s: 0.25 * (1 + zlib.crc32(s.encode()) % 4) for s in totals}
    from logflow.queries import load_all

    q = load_all()["sample_stratified"]
    got1 = {r.source: r.n_sampled for r in q.fn(spark, sf_dir).collect()}
    got2 = {r.source: r.n_sampled for r in q.fn(spark, sf_dir).collect()}
    assert got1 == got2  # seeded determinism
    for s, n in totals.items():
        f = fractions[s]
        expect = f * n
        # 4-sigma binomial bound (plus slack for tiny strata)
        tol = 4 * (n * f * (1 - f)) ** 0.5 + 2
        assert abs(got1.get(s, 0) - expect) <= tol, (s, got1.get(s), expect, tol)


def test_quantize_int8_roundtrip_elementwise(spark, sf_dir):
    """The registered query emits scalar summaries (driver comparator needs
    scalar columns); here the full quantized array is checked element-wise
    against numpy, and reconstruction error is bounded by half a step."""
    import numpy as np

    from logflow.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", sf_dir).limit(50)
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x))))
    qv = F.transform(
        "embedding", lambda x: F.round(xd(x) / F.col("scale") * 127, 0).cast("int")
    )
    rows = (
        emb.select("vec_id", "embedding", scale.alias("scale"))
        .filter(F.col("scale") > 0)
        .select("vec_id", "embedding", "scale", qv.alias("qv"))
        .collect()
    )
    assert rows
    for r in rows:
        x = np.asarray(r.embedding, dtype=np.float64)
        q = np.asarray(r.qv, dtype=np.int64)
        assert q.min() >= -127 and q.max() <= 127
        recon = q * (r.scale / 127.0)
        # max error is half a quantization step
        assert np.abs(recon - x).max() <= (r.scale / 127.0) * 0.5 + 1e-12


def test_hash_sampler_invariant_to_partitioning(spark, sf_dir):
    """The whole point of hash-threshold sampling vs RNG sampleBy: the kept
    row set is a pure function of the data, so repartitioning (or task
    retries / speculative execution re-running a partition) cannot change
    it. Compute the kept doc_id set under three different partitionings
    and assert identity."""
    from pyspark.sql import functions as F

    from logflow.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("smp:"), F.col("doc_id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long") / F.lit(4294967296.0)
    wt = F.lit(0.25) * (
        F.lit(1) + F.conv(F.substring(F.md5(F.col("source")), 1, 2), 16, 10).cast("long") % 4
    )
    def kept(df):
        return {r.doc_id for r in df.filter(u < wt).select("doc_id").collect()}

    base = kept(docs)
    assert base  # non-degenerate
    assert kept(docs.repartition(3)) == base
    assert kept(docs.repartition(64, "source")) == base
    assert kept(docs.coalesce(1)) == base
