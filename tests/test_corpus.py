"""Oracle parity + invariants for the round-3 corpus operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

CORPUS_QUERIES = [
    "pii_redaction",
    "dup_chunk_filter",
    "bm25_search",
    "inverted_index_postings",
    "semdedup_prune",
    "tfidf_cosine_pairs",
]


@pytest.mark.parametrize("name", CORPUS_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    from tests.oracle import check_query

    check_query(spark, duck, name, sf_dir)


def test_pii_redaction_leaves_no_pii_behind(spark, sf_dir):
    """Re-running the PII counters on the REDACTED text must find zero
    matches — i.e. the scrub actually removed everything it counted."""
    from logflow.queries.corpus import _RE_EMAIL, _RE_IP, _RE_PHONE, pii_redaction
    from logflow.sources.tables import load_table

    pdf = pii_redaction(spark, sf_dir).toPandas()
    assert (pdf["n_email"] >= 1).all() and (pdf["n_ip"] >= 1).all()
    # rebuild the redacted text the same way and scan it again
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
    red = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(txt, _RE_EMAIL, "<EMAIL>"), _RE_IP, "<IP>"),
        _RE_PHONE,
        "<PHONE>",
    )
    leftovers = (
        docs.select(
            (
                F.regexp_count(red, F.lit(_RE_EMAIL))
                + F.regexp_count(red, F.lit(_RE_IP))
                + F.regexp_count(red, F.lit(_RE_PHONE))
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert leftovers == 0


def test_dup_chunk_gate_consistency(spark, sf_dir):
    from logflow.queries import load_all

    pdf = load_all()["dup_chunk_filter"].fn(spark, sf_dir).toPandas()
    assert (pdf["n_dup_chunks"] <= pdf["n_chunks"]).all()
    assert ((pdf["dup_frac"] <= 0.2) == pdf["kept"]).all()


def test_bm25_ranks_are_dense_and_scores_monotone(spark, sf_dir):
    from logflow.queries import load_all

    pdf = (
        load_all()["bm25_search"].fn(spark, sf_dir).toPandas().sort_values("rank")
    )
    assert list(pdf["rank"]) == list(range(1, len(pdf) + 1))
    assert (pdf["score"].diff().dropna() <= 1e-9).all()  # non-increasing


def test_inverted_index_postings_sorted_and_capped(spark, sf_dir):
    from logflow.queries import load_all

    pdf = load_all()["inverted_index_postings"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for p in pdf["postings10"]:
        ids = [int(x) for x in p.split(",")]
        assert ids == sorted(ids) and len(ids) <= 10
    assert (pdf["total_tf"] >= pdf["df"]).all()


def test_semdedup_partitions_corpus_and_bounds_prunes(spark, sf_dir):
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["semdedup_prune"].fn(spark, sf_dir).toPandas()
    n_vecs = load_table(spark, "embeddings", sf_dir).count()
    assert int(pdf["n_members"].sum()) == n_vecs  # every vector assigned once
    assert (pdf["n_pruned"] < pdf["n_members"]).all()  # keeper survives per cluster


def test_semdedup_k_scales_with_corpus_and_clusters_stay_bounded(spark, sf_dir):
    """The round-3 weak flag: k must DERIVE from the corpus count, not a
    constant — as n grows, the centroid count grows (~√n) and the max
    cluster size stays within a constant multiple of the √n stride, so
    the within-cluster pair join never reverts to O((n/const)²)."""
    import math

    from logflow.queries import load_all

    fn = load_all()["semdedup_prune"].fn
    small = fn(spark, sf_dir).toPandas()  # sf0.001: n=500
    large = fn(spark, "/root/testdata/sf0.1").toPandas()  # n=2000
    n_small = int(small["n_members"].sum())
    n_large = int(large["n_members"].sum())
    assert n_large > n_small  # precondition: corpora actually differ
    assert len(large) > len(small)  # more centroids on the bigger corpus
    for pdf, n in ((small, n_small), (large, n_large)):
        stride = max(4, math.isqrt(n))
        assert len(pdf) >= n // stride  # k ~ n/stride, never collapses
        assert int(pdf["n_members"].max()) <= 8 * stride  # bounded clusters


def test_chunking_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "corpus_chunk_documents", sf_dir)


def test_chunking_covers_every_token(spark, sf_dir):
    """Coverage proof: chunk 0 starts at token 1, consecutive chunks step
    by the stride, every chunk is full-size except possibly the last,
    and the last chunk always reaches the document's final token."""
    from pyspark.sql import functions as F

    from logflow.functions.text import tokenize
    from logflow.queries import load_all
    from logflow.queries.corpus import _CHUNK_C, _CHUNK_S
    from logflow.sources.tables import load_table

    pdf = load_all()["corpus_chunk_documents"].fn(spark, sf_dir).toPandas()
    sizes = {
        r.doc_id: r.sz
        for r in load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", F.size(tokenize(F.col("text"))).alias("sz"))
        .collect()
    }
    for doc_id, g in pdf.groupby("doc_id"):
        g = g.sort_values("chunk_idx").reset_index(drop=True)
        sz = sizes[doc_id]
        assert list(g["chunk_idx"]) == list(range(len(g)))
        assert (g["n_toks"].iloc[:-1] == _CHUNK_C).all()  # all but last full
        last_start = (len(g) - 1) * _CHUNK_S
        assert last_start + g["n_toks"].iloc[-1] == sz  # reaches the end
        if sz > _CHUNK_C:  # no chunk fully contained in the previous one
            assert g["n_toks"].iloc[-1] > _CHUNK_C - _CHUNK_S or len(g) == 1


def test_tfidf_cosine_bounds_and_contract(spark, sf_dir):
    """Cosines in (0,1]; both docs from the mod-10 subset; shared-term
    counts positive; descending order with tiebreaks."""
    import pytest

    from logflow.queries import load_all

    pdf = load_all()["tfidf_cosine_pairs"].fn(spark, sf_dir).toPandas()
    if len(pdf) == 0:
        pytest.skip("max_df pruning left no pairable terms at this SF/seed")
    assert ((pdf["cosine"] > 0) & (pdf["cosine"] <= 1.0 + 1e-9)).all()
    assert (pdf["doc_a"] % 10 == 0).all() and (pdf["doc_b"] % 10 == 0).all()
    assert (pdf["doc_a"] < pdf["doc_b"]).all()
    assert (pdf["n_shared_terms"] > 0).all()
    assert (pdf["cosine"].diff().dropna() <= 1e-12).all()


def test_rrf_fusion_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "search_rrf_fusion", sf_dir)


def test_rrf_fusion_laws(spark, sf_dir):
    """Fused scores recompute from the two rank columns; a doc ranked by
    BOTH systems always beats a doc ranked by neither at equal single
    ranks; every bm25 top-1 doc appears in the fused top-10."""
    from logflow.queries import load_all

    reg = load_all()
    pdf = reg["search_rrf_fusion"].fn(spark, sf_dir).toPandas()
    assert 0 < len(pdf) <= 10
    for _, r in pdf.iterrows():
        want = (1.0 / (60 + r.rank_bm25) if r.rank_bm25 else 0.0) + (
            1.0 / (60 + r.rank_ql) if r.rank_ql else 0.0
        )
        assert r.rrf_x1000 == round(want * 1000, 6)
    bm = reg["bm25_search"].fn(spark, sf_dir).toPandas()
    top1 = bm[bm["rank"] == 1].doc_id.iloc[0]
    assert top1 in set(pdf.doc_id)


def test_bigram_novelty_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "corpus_bigram_novelty", sf_dir)


def test_bigram_novelty_ledger(spark, sf_dir):
    """novelty in [0,1]; n_novel <= n_bigrams; the df=1 ledger balances:
    sum over docs of n_novel equals the number of corpus bigram types
    with document frequency exactly 1."""
    from logflow.functions.text import tokenize
    from logflow.queries import load_all
    from logflow.sources.tables import load_table
    from pyspark.sql import functions as F

    pdf = load_all()["corpus_bigram_novelty"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert ((pdf["novelty"] >= 0) & (pdf["novelty"] <= 1)).all()
    assert (pdf["n_novel"] <= pdf["n_bigrams"]).all()
    df1 = int(pdf["n_novel"].sum())
    toks = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", tokenize(F.col("text")).alias("t"))
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(arrays_zip(slice(t, 1, size(t) - 1),"
                    " slice(t, 2, size(t) - 1)), p -> concat(p['0'], ' ', p['1']))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.explode_outer("bg").alias("g"))
        .filter(F.col("g").isNotNull())
    )
    n_df1 = toks.groupBy("g").count().filter(F.col("count") == 1).count()
    assert df1 == n_df1
