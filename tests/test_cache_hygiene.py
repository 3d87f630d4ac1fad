"""Cache-hygiene contract: library persists are tracked and releasable.

Operators that persist intermediates (LSH signatures, co-purchase edges,
prefix-filter token tables, TPC-H q11 per-part aggregate) register them
with logflow.operators.cache.track; a consumer composing several queries
in one session calls release_all() after materializing each result.
This sweep runs every persisting query family, materializes it, releases,
and asserts NO persisted RDD block survives — the library leaks nothing
a caller cannot reclaim.
"""

from __future__ import annotations

from logflow.operators.cache import release_all
from logflow.queries import load_all

PERSISTING_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_incremental_minhash",
    "dedup_prefix_jaccard",
    "graph_triangle_count",
    "graph_triangle_degree_ordered",
    "graph_kcore_peel",
    "q11_important_parts",
    "heavy_hitters_tokens",
    "corpus_chunk_documents",
    "knn_ivf_kmeans",
    "knn_recall_eval",
    # assoc_rules_copurchase/_triples moved to eager localCheckpoints in
    # the r12 optimization round (no tracked persist left to release);
    # seq_prefixspan keeps tracked persists and covers the mining family
    "seq_prefixspan",
    "graph_link_prediction",
    "ml_logreg_gd",
    "ml_calibration_bins",
    "ml_pca_power_iteration",
    "graph_cc_two_phase",
    "graph_label_prop_communities",
    "graph_bfs_levels",
    "sessionize_incremental_merge",
]


def _n_persistent_rdds(spark) -> int:
    """Tracked-persist leak count: persistent RDDs EXCLUDING local
    checkpoints. Checkpoint blocks ARE the data of the result frame that
    holds them (unpersisting one breaks later reads — verified: the read
    fails, there is no lineage to recompute), so they are owned by the
    result's lifetime and reclaimed by Spark's ContextCleaner on GC —
    release_all() neither can nor should drop them."""
    return sum(
        0 if jrdd.rdd().isLocallyCheckpointed() else 1
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values())
    )


def test_release_all_clears_every_library_persist(spark, sf_dir):
    registry = load_all()
    for name in PERSISTING_QUERIES:
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        assert _n_persistent_rdds(spark) > 0, f"{name}: expected a tracked persist"
        release_all()
        assert _n_persistent_rdds(spark) == 0, f"{name}: persisted blocks leaked"
        spark.catalog.clearCache()  # belt-and-braces between query families


def test_release_all_is_idempotent_and_safe(spark):
    assert release_all() == 0
    assert release_all() == 0
