"""Similarity search over embedding columns (array<float>).

Two paths, same semantics:

* **Expression path** (`cosine_topk`): dot product as a zip_with/aggregate
  fold — pure Catalyst expressions, deterministic left-to-right double
  accumulation (bit-matched by the DuckDB oracle), broadcast of the query
  set, per-query top-k via window.  Brute force is O(|corpus|·|queries|):
  right for small query sets / reranking.
* **IVF path** (`ivf_topk`): coarse quantization against a deterministic
  centroid set — each vector is assigned to its nearest centroid (one
  broadcast join against centroids), queries probe only `nprobe` buckets.
  At 100 TB the corpus scan per query drops from O(n) to
  O(n · nprobe / n_centroids); bucket assignment is reusable across
  query batches (materialize it once).

Ranking is by ROUNDED similarity (6 dp) with the neighbor id as the
tiebreak: float addition order is engine-specific at the last ulp, so
ranking on raw doubles would be unstable across engines; rounding makes
the ordering — and therefore the result set — deterministic.

A vectorized Arrow/numpy variant (mapInPandas + BLAS) is provided for
throughput comparison as `cosine_topk_numpy` — same results, batch-level
SIMD; it is the template for the real 100 TB hot path where the fold
expression would be CPU-bound.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def with_norm(df: DataFrame, vec_col: str, out: str = "norm") -> DataFrame:
    return df.withColumn(out, _norm(F.col(vec_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    sim_digits: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k: (qid, neighbor_id, rank, sim).

    ``queries`` must have columns (qid, qvec).  The query side is
    broadcast — the corpus never shuffles.
    """
    c = with_norm(corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")), "cvec", "cnorm")
    q = with_norm(queries, "qvec", "qnorm")
    sim = F.round(_dot(F.col("cvec"), F.col("qvec")) / (F.col("cnorm") * F.col("qnorm")), sim_digits)
    pairs = c.crossJoin(F.broadcast(q)).select("qid", "neighbor_id", sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "rank", "sim")
    )


def assign_buckets(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, sim_digits: int = 6
) -> DataFrame:
    """IVF coarse quantization: nearest centroid per vector → (id, cid)."""
    c = with_norm(centroids, "cvec", "cnorm")
    v = with_norm(vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")), "vec", "vnorm")
    sim = F.round(_dot(F.col("vec"), F.col("cvec")) / (F.col("vnorm") * F.col("cnorm")), sim_digits)
    scored = v.crossJoin(F.broadcast(c)).select("vid", "cid", sim.alias("csim"))
    w = Window.partitionBy("vid").orderBy(F.desc("csim"), "cid")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select("vid", "cid")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    nprobe: int = 2,
    sim_digits: int = 6,
) -> DataFrame:
    """IVF approximate top-k: probe ``nprobe`` nearest centroid buckets.

    ``centroids``: (cid, cvec).  ``queries``: (qid, qvec).
    Returns (qid, neighbor_id, rank, sim) — approximate by construction.
    """
    c = with_norm(centroids, "cvec", "cnorm")
    assignments = assign_buckets(corpus, centroids, id_col, vec_col, sim_digits)

    q = with_norm(queries, "qvec", "qnorm")
    qsim = F.round(_dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")), sim_digits)
    qscored = q.crossJoin(F.broadcast(c)).select("qid", "qvec", "cid", qsim.alias("csim"))
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), "cid")
    probes = qscored.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= nprobe)

    cand = (
        assignments.join(probes.select("qid", "qvec", "cid"), "cid")
        .join(
            corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("cvec2")),
            "vid",
        )
    )
    sim = F.round(_dot(F.col("cvec2"), F.col("qvec")) / (_norm(F.col("cvec2")) * _norm(F.col("qvec"))), sim_digits)
    scored = cand.select("qid", F.col("vid").alias("neighbor_id"), sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "rank", "sim")
    )


def signbit_bucket(vec, bits: int = 8):
    """SRP-LSH bucket id from the sign bits of the first ``bits`` dims.

    Axis-aligned random-hyperplane LSH (deterministic — the "random"
    hyperplanes are the coordinate axes): vectors with similar direction
    agree on most sign bits, so candidate generation is a cheap equi-join
    on the bucket id instead of an O(n²) cross join — the property that
    keeps embedding near-dup detection feasible at 100 TB.
    """
    return sum(
        (
            F.when(F.element_at(vec, j + 1) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(bits)
        ),
        start=F.lit(0),
    ).cast("long")


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.3,
    bits: int = 8,
    sim_digits: int = 6,
) -> DataFrame:
    """(vec_a, vec_b, sim) for bucket-sharing pairs with cosine ≥ threshold.

    Candidates come from the sign-bit LSH equi-join (shuffle on bucket id,
    uniformly distributed); exact rounded cosine verifies each candidate.
    """
    v = with_norm(
        df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")), "vec", "vnorm"
    ).withColumn("bucket", signbit_bucket(F.col("vec"), bits))
    a = v.select(
        F.col("vid").alias("vec_a"), F.col("vec").alias("va"),
        F.col("vnorm").alias("na"), "bucket",
    )
    b = v.select(
        F.col("vid").alias("vec_b"), F.col("vec").alias("vb"),
        F.col("vnorm").alias("nb"), "bucket",
    )
    sim = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), sim_digits)
    return (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def cosine_topk_numpy(
    corpus: DataFrame,
    queries_pdf,
    id_col: str,
    vec_col: str,
    k: int = 5,
    sim_digits: int = 6,
) -> DataFrame:
    """Arrow-vectorized brute-force top-k (the 100 TB hot-path template).

    ``queries_pdf``: pandas DataFrame (qid, qvec as list[float]) — small,
    shipped to executors inside the closure (same role as a broadcast).
    Each Arrow batch of the corpus is scored against ALL queries with one
    BLAS matmul; per-batch top-k is reduced globally by a final window.
    Results match `cosine_topk` up to the rounding applied before ranking.
    """
    import numpy as np
    import pandas as pd

    qids = queries_pdf["qid"].to_numpy()
    qmat = np.stack(queries_pdf["qvec"].to_numpy()).astype(np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)

    # Rounding happens Spark-side (F.round = half-away-from-zero, matching
    # DuckDB); numpy's np.round is half-to-even and MUST NOT be used here
    # (repo determinism rule).  The per-batch prune keeps a small margin
    # beyond k so a candidate that loses on raw sim but ties after rounding
    # (and would win the neighbor_id tiebreak) still reaches the global
    # window.
    prune = k + 8

    def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ qmat.T) / np.outer(norms, qnorm)
            n_take = min(prune, sims.shape[0])
            # per-batch partial top-k on RAW sims: prune before the reduce
            idx = np.argpartition(-sims, n_take - 1, axis=0)[:n_take]
            out = {
                "qid": np.repeat(qids, n_take),
                "neighbor_id": pdf[id_col].to_numpy()[idx].T.ravel(),
                "sim": np.take_along_axis(sims, idx, 0).T.ravel(),
            }
            yield pd.DataFrame(out)

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="qid long, neighbor_id long, sim double"
    )
    rounded = partial.withColumn("sim", F.round(F.col("sim"), sim_digits))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "neighbor_id")
    return (
        rounded.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "rank", "sim")
    )
