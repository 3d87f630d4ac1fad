"""Reusable graph operators: fixed-point PageRank iteration.

Factored out of queries/graph.py so the same update runs over ANY edge
DataFrame — the driver query binds it to the part co-purchase graph, the
property suite drives it with adversarial random graphs against a pure-
Python reference (tests/test_properties.py). See queries/graph.py for
the determinism rationale (BIGINT fixed-point, truncating division,
exact integer sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1e12 fixed-point rank scale
D_NUM, D_DEN = 85, 100  # damping 0.85 as a ratio


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    assume_distinct: bool = False,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Damped PageRank over a directed edge list ``(u, v)``, entirely in
    scaled-BIGINT arithmetic.

    Returns ``(u, outdeg, r)`` where ``r`` is the final fixed-point rank
    (``r / SCALE`` ≈ the probability mass). Only nodes with at least one
    OUT-edge are ranked (matching the oracle's node set); dangling-node
    redistribution is out of scope for this operator.

    ``seeds`` switches the teleport to PERSONALIZED PageRank: the (1-d)
    restart mass is split over the seed node set (one ``u`` column;
    must be a subset of the ranked nodes) instead of all nodes, and the
    initial mass starts on the seeds. Same fixed-point arithmetic —
    base mass for a seed is ``(1-d)·SCALE DIV (D_DEN·|S|)``, zero
    elsewhere.

    The model (and the pure-Python reference) is defined over DISTINCT
    edges — duplicate (u, v) rows would silently inflate outdeg and
    double-count contributions. Dedup is therefore applied here by
    default; callers whose edge list is already distinct (e.g. built by
    a groupBy on (u, v)) pass ``assume_distinct=True`` to skip the
    redundant shuffle.

    The rank table is broadcast into each iteration's join (one row per
    node — small side by construction); the edge list is the caller's to
    persist/bucket, since it is iteration-invariant.
    """
    if not assume_distinct:
        edges = edges.select("u", "v").distinct()
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    base = SCALE * D_DEN - SCALE * D_NUM  # (1-d) mass numerator, pre-scaled
    if seeds is None:
        nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n"))
        degm = deg.crossJoin(F.broadcast(nn))
        init = f"CAST({SCALE} DIV n AS BIGINT)"
        tele = f"{base} DIV ({D_DEN} * n)"
    else:
        sd = seeds.select("u").distinct()
        ns = sd.agg(F.count(F.lit(1)).cast("long").alias("ns"))
        degm = deg.join(
            F.broadcast(sd.withColumn("is_seed", F.lit(1))), "u", "left_outer"
        ).crossJoin(F.broadcast(ns))
        init = f"CAST(CASE WHEN is_seed IS NOT NULL THEN {SCALE} DIV ns ELSE 0 END AS BIGINT)"
        tele = f"CASE WHEN is_seed IS NOT NULL THEN {base} DIV ({D_DEN} * ns) ELSE 0 END"
    # degm (one row per ranked node, bounded) is re-referenced by every
    # iteration's rank rebuild; left lazy, each reference re-embeds the
    # deg aggregate and the seed-marker join in the static plan (66
    # Exchanges for plain PageRank, 186 for PPR at 3 iterations).
    # Eager-checkpoint it once — the r10 bounded-frame rule.
    degm = degm.coalesce(4).localCheckpoint(eager=True)
    r = degm.select("u", "outdeg", F.expr(init).alias("r"))
    for _ in range(iters):
        contrib = (
            edges.join(F.broadcast(r.withColumnRenamed("u", "src")), edges.u == F.col("src"))
            .groupBy("v")
            .agg(F.sum(F.expr("r DIV outdeg")).alias("s"))
        )
        r = (
            degm.join(contrib, degm.u == contrib.v, "left_outer")
            .select(
                degm.u.alias("u"),
                "outdeg",
                F.expr(
                    f"CAST({tele} + "
                    f"({D_NUM} * COALESCE(s, 0)) DIV {D_DEN} AS BIGINT)"
                ).alias("r"),
            )
        )
    return r


def pagerank_fixed_point_reference(edges: list[tuple[int, int]], iters: int = 3) -> dict[int, int]:
    """Pure-Python model of :func:`pagerank_fixed_point` (property-test
    oracle). Mirrors the integer arithmetic exactly: Python ``//`` on
    non-negative ints == Spark ``DIV`` == DuckDB ``//``."""
    out: dict[int, list[int]] = {}
    for u, v in set(edges):
        out.setdefault(u, []).append(v)
    nodes = sorted(out)
    n = len(nodes)
    r = {u: SCALE // n for u in nodes}
    base = SCALE * D_DEN - SCALE * D_NUM
    for _ in range(iters):
        s: dict[int, int] = {u: 0 for u in nodes}
        for u in nodes:
            c = r[u] // len(out[u])
            for v in out[u]:
                if v in s:
                    s[v] += c
        r = {u: base // (D_DEN * n) + (D_NUM * s[u]) // D_DEN for u in nodes}
    return r


def triangle_counts_ordered(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts via ID-ordered wedge joins.

    ``edges`` stores each undirected edge ONCE with ``u < v``. A triangle
    a<b<c is generated exactly once by joining (a,b)⋈(b,c) and closing
    with (a,c); per-node counts sum each corner. Baseline formulation —
    correct, but the wedge count is driven by high-id-side degrees, so a
    skewed hub can generate O(deg²) wedges.
    """
    ab = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = edges.select(F.col("u").alias("a2"), F.col("v").alias("c2"))
    tri = (
        ab.join(bc, "b")
        .join(ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .select("a", "b", "c")
    )
    nodes = (
        tri.select(F.col("a").alias("n"))
        .unionAll(tri.select(F.col("b").alias("n")))
        .unionAll(tri.select(F.col("c").alias("n")))
    )
    return nodes.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def triangle_counts_degree_ordered(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts with DEGREE-ordered orientation — the
    O(m^1.5) refinement (Latapy 2008; the compact-forward algorithm).

    Each undirected edge is re-oriented from its lower- to higher-rank
    endpoint under the total order rank = (degree, id). Wedges are then
    built only from the out-edges of each triangle's LOWEST-rank corner:
    a hub of degree d ranks above almost all neighbors, so it contributes
    almost no out-wedges — total wedge work is bounded by O(m^1.5)
    REGARDLESS of degree skew, where the id-ordered baseline degrades to
    O(d_max²) on hub-heavy graphs. Per-node counts are provably identical
    to the id-ordered form (each triangle has a unique rank-lowest corner;
    property-tested on random graphs in tests/test_properties.py), so the
    two share one oracle.

    At 100 TB: the degree table is one partial-agg'd shuffle over the
    edge list; orientation is a node-keyed equi-join; the wedge and
    closure joins shuffle on uniform (node, node) keys.
    """
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    # node-scale frame joined TWICE (du and dv sides): left lazy, the
    # degree aggregate re-runs per reference inside the orientation job
    # (interleaved A/B ~7.2 vs ~5.2 s at sf0.1)
    deg = deg.coalesce(1).localCheckpoint(eager=True)
    ed = edges.join(
        deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u"
    ).join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # The oriented table feeds three plan branches (both wedge sides + the
    # closure probe); materialize EAGERLY like the LSH signature table —
    # a lazy persist races across parallel stages and each branch would
    # re-run the degree computation + orientation joins (measured 6.5 s vs
    # 0.7 s at sf0.01 without it). Edge-sized, the "write the oriented
    # edge list once" phase of a real 100 TB run.
    from logflow.operators.cache import track

    o = track(
        ed.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
        )
        .coalesce(4)
        .persist()
    )
    o.count()
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("ddst").alias("db"))
    e2 = o.select(F.col("src").alias("a2"), F.col("dst").alias("c"), F.col("ddst").alias("dc"))
    # out-wedge from the lowest-rank corner: rank(b) < rank(c)
    rank_lt = (F.col("db") < F.col("dc")) | (
        (F.col("db") == F.col("dc")) & (F.col("b") < F.col("c"))
    )
    e3 = o.select(F.col("src").alias("b2"), F.col("dst").alias("c2"))
    tri = (
        e1.join(e2, (F.col("a") == F.col("a2")) & rank_lt)
        .join(e3, (F.col("b") == F.col("b2")) & (F.col("c") == F.col("c2")))
        .select("a", "b", "c")
    )
    nodes = (
        tri.select(F.col("a").alias("n"))
        .unionAll(tri.select(F.col("b").alias("n")))
        .unionAll(tri.select(F.col("c").alias("n")))
    )
    return nodes.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def two_phase_connected_components(
    edges: DataFrame, max_iterations: int = 25
) -> DataFrame:
    """Connected components by alternating large-star / small-star edge
    rewrites (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the O(log²n)-round scheme whose per-round cost
    is independent of component DIAMETER, complementing
    operators/dedup.py:connected_components (min-label propagation, one
    round per diameter hop): path-shaped graphs with diameter in the
    thousands finish in ~log² rounds here while label propagation would
    run thousands.

    ``edges``: undirected edge list ``(u, v)``, any orientation, self
    loops ignored. Returns ``(node, comp)`` with ``comp`` = min node id
    of the component.

    Per round, each step is one groupBy + one join on the CURRENT edge
    set (which only shrinks toward the star forest): large-star hangs
    every neighbor larger than ``u`` off ``u``'s minimum neighborhood
    node; small-star re-parents every smaller neighbor (and ``u``) onto
    the minimum. Both preserve connectivity and strictly reduce a
    monovariant, so termination is guaranteed; convergence is detected
    when the canonical edge set reaches a fixpoint (count + set-diff —
    exact, no checksums). localCheckpoint truncates the per-round
    lineage; the edge frame is coalesced by measured size so a small
    graph doesn't pay 32-task scheduling per step (CLAUDE.md iterative-
    algorithm rules).
    """
    e = (
        edges.select(
            F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_parts = max(1, e.count() // 100_000 + 1)
    e = e.coalesce(n_parts)
    # Node set from the RAW endpoints (before the hi != lo filter): a node
    # whose only edges are self-loops must still emit as its own singleton
    # component — deriving nodes from the filtered edge set would silently
    # drop it (round-5 advice).
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
        .coalesce(n_parts)
    )

    def canonical(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
            )
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )

    for _ in range(max_iterations):
        bid = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        # large-star: m(u) = min(Γ(u) ∪ {u}); attach strictly-larger
        # neighbors to m
        m = bid.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        ls = canonical(
            bid.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        # small-star on the large-star output: orient big→small, re-parent
        # each smaller neighbor (and the center) onto the minimum
        dirE = ls.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        sm = dirE.groupBy("u").agg(F.min("v").alias("m"))
        ss = canonical(
            dirE.join(sm, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(sm.select(F.col("u").alias("a"), F.col("m").alias("b")))
        ).localCheckpoint(eager=False)
        same = (
            ss.count() == e.count()
            and ss.exceptAll(e.select("hi", "lo")).count() == 0
        )
        e = ss.coalesce(n_parts)
        if same:
            star = e.select(F.col("hi").alias("node"), F.col("lo").alias("comp"))
            return nodes.join(star, "node", "left").select(
                "node", F.coalesce("comp", "node").alias("comp")
            )
    raise RuntimeError(
        f"two_phase_connected_components did not converge in {max_iterations} rounds"
    )
