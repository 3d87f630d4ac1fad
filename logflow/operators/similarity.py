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


def _assign_nearest(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    sim_digits: int = 6,
    keep_vec: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment, MAP-SIDE: the k centroids collapse to a
    single array row (collect_list of a k-row frame — bounded by the index
    fanout, never the corpus), broadcast, and the per-vector argmax is one
    codegen ``array_max(transform(...))`` over (rounded sim, -cid) structs —
    identical ranking to ``ORDER BY sim DESC, cid`` (struct comparison is
    field-by-field; negating cid turns the ascending tiebreak into a max).

    This is the shape that matters at 100 TB: assignment is embarrassingly
    parallel — no n×k crossJoin row blow-up, no window sort, no shuffle at
    all — where the previous window formulation shuffled n×k scored rows
    per pass (measured 2× on kmeans training at sf0.1 from the extra
    exchanges alone). ``keep_vec`` carries the vector through for
    consumers that need (cid, vec) without re-joining the corpus.
    """
    c = with_norm(centroids, "cvec", "cnorm")
    carr = c.agg(F.collect_list(F.struct("cid", "cvec", "cnorm")).alias("cents"))
    v = with_norm(
        vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")), "vec", "vnorm"
    )
    best = F.array_max(
        F.transform(
            F.col("cents"),
            lambda cc: F.struct(
                F.round(
                    _dot(F.col("vec"), cc["cvec"]) / (F.col("vnorm") * cc["cnorm"]),
                    sim_digits,
                ).alias("csim"),
                (-cc["cid"]).alias("negcid"),
            ),
        )
    )
    out = v.crossJoin(F.broadcast(carr)).select(
        "vid", (-best["negcid"]).alias("cid"), *(["vec"] if keep_vec else [])
    )
    return out


def assign_buckets(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, sim_digits: int = 6
) -> DataFrame:
    """IVF coarse quantization: nearest centroid per vector → (id, cid)."""
    return _assign_nearest(vectors, centroids, id_col, vec_col, sim_digits)


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
    # keep_vec: the candidate vectors ride along through the bucket join —
    # no second corpus shuffle to re-fetch them by vid.
    assignments = _assign_nearest(
        corpus, centroids, id_col, vec_col, sim_digits, keep_vec=True
    ).withColumnRenamed("vec", "cvec2")

    q = with_norm(queries, "qvec", "qnorm")
    qsim = F.round(_dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")), sim_digits)
    qscored = q.crossJoin(F.broadcast(c)).select("qid", "qvec", "cid", qsim.alias("csim"))
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), "cid")
    probes = qscored.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= nprobe)

    cand = assignments.join(F.broadcast(probes.select("qid", "qvec", "cid")), "cid")
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


def kmeans_iterate(
    corpus: DataFrame,
    seeds: DataFrame,
    id_col: str,
    vec_col: str,
    iters: int = 2,
    sim_digits: int = 6,
) -> DataFrame:
    """Fixed-iteration Lloyd k-means for IVF coarse quantizers → (cid, cvec).

    ``seeds``: (cid, cvec) initial centroids (deterministic — the caller
    picks them, e.g. the lowest-id vectors). Each iteration is (1) a
    nearest-centroid assignment (broadcast centroids, rounded-sim +
    cid tiebreak — identical ranking to :func:`assign_buckets`) and (2) a
    per-(cid, dim) EXACT mean: elements round to DECIMAL(18,6) before the
    sum, so the numerator is order-independent integer-scaled arithmetic
    and mean = exact-sum-as-double / exact-count is the identical IEEE
    division in any engine — this is what keeps a trained index
    oracle-checkable (the DuckDB mirror unrolls the same ``iters``
    updates as nested CTEs, the PageRank pattern). Cosine ranking is
    scale-invariant, so the plain mean IS spherical k-means here —
    normalizing the centroid would not change any assignment or probe.

    Empty clusters drop out (no assigned rows → no mean); both engines
    agree because the assignment ranking is identical.

    At 100 TB: per iteration, one broadcast-join assignment pass over the
    corpus and one explode + groupBy into k·d cells — textbook
    distributed k-means, no driver-side math, cost linear in corpus size
    times ``iters`` (a fixed small constant, not data-dependent
    convergence — deliberate: a convergence loop would make the oracle
    unexpressible and the job's cost unpredictable at scale). The
    trained centroids are persisted EAGERLY (k rows, lineage = the whole
    training job): IVF retrieval consumes them in 2+ plan branches
    (corpus assignment + query probes), and an unpersisted 8-row frame
    re-runs the full training per branch (the CLAUDE.md multi-consumer
    lineage trap — measured ~2× on knn_ivf_kmeans). track()ed so
    release_all() reclaims the blocks.
    """
    from logflow.operators.cache import track

    cent = seeds
    for _ in range(iters):
        assigned = _assign_nearest(
            corpus, cent, id_col, vec_col, sim_digits, keep_vec=True
        )
        dims = assigned.select("cid", F.posexplode("vec").alias("d", "x"))
        cell = dims.groupBy("cid", "d").agg(
            (
                F.sum(F.round(F.col("x"), 6).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        cent = (
            cell.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
            .select("cid", F.expr("transform(dm, s -> s.m)").alias("cvec"))
        )
    cent = track(cent.coalesce(1).persist())
    cent.count()
    return cent


def pq_adc_topk(
    corpus: DataFrame,
    queries_pdf,
    codebook_pdf,
    id_col: str,
    vec_col: str,
    k: int = 10,
    m: int = 8,
    scale: int = 10_000,
) -> DataFrame:
    """Product-quantization ANN: encode + ADC top-k in one corpus pass.

    ``codebook_pdf``: pandas (cid, cvec) — the per-subspace codebooks are
    the sub-vectors of these donor rows (deterministic, bounded; a trained
    codebook would come from :func:`kmeans_iterate` per subspace).
    ``queries_pdf``: pandas (qid, qvec).

    Everything is int64 fixed point (elements rounded half-away to
    ``scale``), so encode, the per-query lookup tables, and every ADC
    distance are EXACT integers — bit-identical to the long-form SQL
    oracle, no float summation order anywhere.  Per Arrow batch: vectors
    reshape to (n, m, dsub); codes = argmin over centroids of the exact
    squared L2 per subspace (np.argmin's first-occurrence rule IS the
    smallest-cid tiebreak); ADC distances come from the per-query
    (m × n_centroids) table the batch indexes into — the PQ trick that
    replaces a 64-dim distance with m table lookups.  The per-batch prune
    keeps each query's top-k in the exact global order (dist, id) via
    lexsort, which makes the prune provably lossless; a final window
    reduces batches.

    At 100 TB: the corpus is scanned ONCE map-side (codebook + queries
    ride the closure like a broadcast); only n_queries·k·#batches rows
    reach the reduce window.  Codes are 8 bytes/vector here (m=8, k=16 →
    4 bits/subspace) — the compression that lets a trillion-vector index
    fit a cluster's RAM.
    """
    import numpy as np
    import pandas as pd

    def to_int(a: "np.ndarray") -> "np.ndarray":
        scaled = a.astype(np.float64) * scale
        return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)

    qids = queries_pdf["qid"].to_numpy()
    qmat = to_int(np.stack(queries_pdf["qvec"].to_numpy()))
    cmat = to_int(np.stack(codebook_pdf["cvec"].to_numpy()))
    dim = qmat.shape[1]
    dsub = dim // m
    # C[s, cid, pos]; rows of codebook_pdf must already be cid-sorted
    cent = cmat.reshape(len(cmat), m, dsub).transpose(1, 0, 2)
    qsub = qmat.reshape(len(qids), m, dsub)
    # LUT[q, s, cid] = exact squared L2 between query sub-vector and centroid
    lut = ((qsub[:, :, None, :] - cent[None, :, :, :]) ** 2).sum(axis=3)

    def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            x = to_int(np.stack(pdf[vec_col].to_numpy())).reshape(len(pdf), m, dsub)
            d2 = ((x[:, :, None, :] - cent[None, :, :, :]) ** 2).sum(axis=3)
            codes = np.argmin(d2, axis=2)  # first occurrence == smallest cid
            # adc[n, q] = sum_s LUT[q, s, codes[n, s]]
            adc = lut[:, np.arange(m)[None, :], codes].sum(axis=2).T
            out_q, out_id, out_d = [], [], []
            for qi in range(len(qids)):
                order = np.lexsort((ids, adc[:, qi]))[: min(k, len(ids))]
                out_q.append(np.full(len(order), qids[qi]))
                out_id.append(ids[order])
                out_d.append(adc[order, qi])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_id),
                    "adc_dist": np.concatenate(out_d),
                }
            )

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="qid long, neighbor_id long, adc_dist long"
    )
    w = Window.partitionBy("qid").orderBy("adc_dist", "neighbor_id")
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "rank", "adc_dist")
    )


def ivfpq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebook_pdf,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 2,
    m: int = 8,
    scale: int = 10_000,
    sim_digits: int = 6,
) -> DataFrame:
    """Composed IVF-PQ ANN — the production index layout (Jégou et al.
    2011, §IV): a coarse quantizer routes each query to ``nprobe`` cells,
    and PQ-ADC scores ONLY the vectors inside the probed cells.

    Composition of the two existing halves, unchanged semantics each:

    * routing = :func:`_assign_nearest` / the probe window from
      :func:`ivf_topk` (rounded cosine + cid tiebreak, map-side broadcast
      assignment);
    * scoring = the int64 fixed-point encode/LUT/ADC math of
      :func:`pq_adc_topk`, applied to the CANDIDATE frame (qid, vid, vec)
      instead of a full corpus scan.

    Distances stay exact integers, so the long-form SQL oracle is
    bit-identical. At 100 TB this is the layout that serves: the corpus
    is scanned once to assign cells + once to encode codes (both
    map-side, fused here into the candidate pass), per-query work is
    |corpus|·nprobe/n_cells table lookups, and the reduce sees only
    n_queries·k rows per candidate batch.
    """
    import numpy as np
    import pandas as pd

    def to_int(a: "np.ndarray") -> "np.ndarray":
        scaled = a.astype(np.float64) * scale
        return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)

    # -- routing: cell assignment (vectors ride along) + query probes --
    assigned = _assign_nearest(
        corpus, centroids, id_col, vec_col, sim_digits, keep_vec=True
    )
    c = with_norm(centroids, "cvec", "cnorm")
    q = with_norm(queries, "qvec", "qnorm")
    qsim = F.round(
        _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")),
        sim_digits,
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), "cid")
    probes = (
        q.crossJoin(F.broadcast(c))
        .select("qid", "cid", qsim.alias("csim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("qid", "cid")
    )
    cand = assigned.join(F.broadcast(probes), "cid").select("qid", "vid", "vec")

    # -- PQ-ADC scoring of the candidate set (exact int64, closure LUTs) --
    queries_pdf = queries.select("qid", "qvec").toPandas()  # bounded query set
    qids = queries_pdf["qid"].to_numpy()
    qmat = to_int(np.stack(queries_pdf["qvec"].to_numpy()))
    cmat = to_int(np.stack(codebook_pdf["cvec"].to_numpy()))
    dim = qmat.shape[1]
    dsub = dim // m
    cent = cmat.reshape(len(cmat), m, dsub).transpose(1, 0, 2)
    qsub = qmat.reshape(len(qids), m, dsub)
    lut = ((qsub[:, :, None, :] - cent[None, :, :, :]) ** 2).sum(axis=3)
    qidx = {int(v): i for i, v in enumerate(qids)}

    def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = to_int(np.stack(pdf["vec"].to_numpy())).reshape(len(pdf), m, dsub)
            d2 = ((x[:, :, None, :] - cent[None, :, :, :]) ** 2).sum(axis=3)
            codes = np.argmin(d2, axis=2)  # first occurrence == smallest cid
            qi = pdf["qid"].map(qidx).to_numpy(dtype=np.int64)
            adc = lut[qi[:, None], np.arange(m)[None, :], codes].sum(axis=1)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy(),
                    "neighbor_id": pdf["vid"].to_numpy(),
                    "adc_dist": adc,
                }
            )

    partial = cand.mapInPandas(score, schema="qid long, neighbor_id long, adc_dist long")
    w = Window.partitionBy("qid").orderBy("adc_dist", "neighbor_id")
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "rank", "adc_dist")
    )


def ivfpq_residual_topk(
    corpus: DataFrame,
    centroids_pdf,
    codebook_pdf,
    queries_pdf,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 2,
    m: int = 8,
    scale: int = 10_000,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the production FAISS layout
    (Jégou et al. 2011 §IV.A: quantize ``r = x - q1(x)``, not ``x``):
    residuals concentrate around the origin, so one shared codebook
    covers every cell at much lower distortion than raw-vector PQ.

    Everything is exact int64 fixed point (``round(x*scale)``): cell
    assignment = argmin integer squared L2 to the coarse centroids
    (smallest-cid tiebreak), per-subspace codes = argmin integer L2
    between the RESIDUAL sub-vector and the codebook, and the ADC
    distance for a query probing cell c uses the query's residual
    w.r.t. THAT cell's centroid — so the whole index, including the
    per-(query, cell) lookup tables, is hash-checkable against a
    long-form SQL oracle.

    ``centroids_pdf`` (cid, cvec) / ``codebook_pdf`` (cid, cvec) /
    ``queries_pdf`` (qid, qvec) are bounded driver-side frames (model
    scale, cid-sorted here); the corpus pass is ONE mapInPandas that
    assigns, encodes and ADC-scores map-side — at 100 TB the only
    shuffle is the final per-query top-k window over n_queries*k-ish
    candidate rows per partition.
    """
    import numpy as np
    import pandas as pd

    def to_int(a: "np.ndarray") -> "np.ndarray":
        scaled = a.astype(np.float64) * scale
        return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)

    cent = to_int(np.stack(centroids_pdf.sort_values("cid")["cvec"].to_numpy()))
    cb = to_int(np.stack(codebook_pdf.sort_values("cid")["cvec"].to_numpy()))
    qp = queries_pdf.sort_values("qid")
    qids = qp["qid"].to_numpy()
    qmat = to_int(np.stack(qp["qvec"].to_numpy()))
    dim = cent.shape[1]
    dsub = dim // m
    cbs = cb.reshape(len(cb), m, dsub).transpose(1, 0, 2)  # [s, code, pos]

    # query probes + per-(query, probed-cell) residual LUTs, all int64
    qd2 = ((qmat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probe_cells = np.argsort(qd2, axis=1, kind="stable")[:, :nprobe]  # ties -> cid
    # lut[qi, pi, s, code]
    qres = qmat[:, None, :] - cent[probe_cells]  # [q, probe, dim]
    qsub = qres.reshape(len(qids), nprobe, m, dsub)
    lut = ((qsub[:, :, :, None, :] - cbs[None, None, :, :, :]) ** 2).sum(axis=4)
    # cell -> list of (query index, probe slot) probing it
    by_cell: dict[int, list[tuple[int, int]]] = {}
    for qi in range(len(qids)):
        for pi in range(nprobe):
            by_cell.setdefault(int(probe_cells[qi, pi]), []).append((qi, pi))

    def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            x = to_int(np.stack(pdf[vec_col].to_numpy()))
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            cells = np.argmin(d2, axis=1)  # first occurrence == smallest cid
            res = (x - cent[cells]).reshape(len(ids), m, dsub)
            rd2 = ((res[:, :, None, :] - cbs[None, :, :, :]) ** 2).sum(axis=3)
            codes = np.argmin(rd2, axis=2)  # smallest code id on ties
            out_q, out_id, out_d = [], [], []
            for cell, probers in by_cell.items():
                sel = np.nonzero(cells == cell)[0]
                if not len(sel):
                    continue
                csel = codes[sel]
                for qi, pi in probers:
                    adc = lut[qi, pi, np.arange(m)[None, :], csel].sum(axis=1)
                    out_q.append(np.full(len(sel), qids[qi]))
                    out_id.append(ids[sel])
                    out_d.append(adc)
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_id),
                    "adc_dist": np.concatenate(out_d),
                }
            )

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="qid long, neighbor_id long, adc_dist long"
    )
    w = Window.partitionBy("qid").orderBy("adc_dist", "neighbor_id")
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "rank", "adc_dist")
    )
