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
    edges: DataFrame, iters: int = 3, assume_distinct: bool = False
) -> DataFrame:
    """Damped PageRank over a directed edge list ``(u, v)``, entirely in
    scaled-BIGINT arithmetic.

    Returns ``(u, outdeg, r)`` where ``r`` is the final fixed-point rank
    (``r / SCALE`` ≈ the probability mass). Only nodes with at least one
    OUT-edge are ranked (matching the oracle's node set); dangling-node
    redistribution is out of scope for this operator.

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
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n"))
    r = deg.crossJoin(F.broadcast(nn)).select(
        "u", "outdeg", F.expr(f"CAST({SCALE} DIV n AS BIGINT)").alias("r")
    )
    base = SCALE * D_DEN - SCALE * D_NUM  # (1-d) mass numerator, pre-scaled
    for _ in range(iters):
        contrib = (
            edges.join(F.broadcast(r.withColumnRenamed("u", "src")), edges.u == F.col("src"))
            .groupBy("v")
            .agg(F.sum(F.expr("r DIV outdeg")).alias("s"))
        )
        r = (
            deg.crossJoin(F.broadcast(nn))
            .join(contrib, deg.u == contrib.v, "left_outer")
            .select(
                "u",
                "outdeg",
                F.expr(
                    f"CAST({base} DIV ({D_DEN} * n) + "
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
