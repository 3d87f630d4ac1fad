"""Property-based checks (hypothesis) for the hand-rolled operators.

The oracle suite pins behavior on the driver tables; these pin the
*algorithms* against brute-force references on adversarial small inputs —
the place where off-by-one tie handling or a missed edge case hides.
Spark jobs are slow per example, so example counts stay small and inputs
stay tiny; the point is shrinking counterexamples, not volume.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


edges_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(**SETTINGS)
@given(edges=edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    from logflow.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "vec_a long, vec_b long"
    )
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    want = _union_find_components(edges)
    assert got == want


asof_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=12
)


@settings(**SETTINGS)
@given(left=asof_rows, right=asof_rows, strict=st.booleans())
def test_asof_join_matches_naive(spark, left, right, strict):
    from logflow.operators.joins import asof_join

    base = datetime.datetime(2024, 1, 1)
    ts = lambda m: base + datetime.timedelta(minutes=m)
    ldf = spark.createDataFrame(
        [(k, ts(m), i) for i, (k, m) in enumerate(left)], "k long, ts timestamp, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, ts(m), i) for i, (k, m) in enumerate(right)], "k long, ts timestamp, rid long"
    )
    out = {
        r.lid: r.rid
        for r in asof_join(ldf, rdf, ["k"], "ts", "ts", ["rid"], strict=strict).collect()
    }
    for i, (k, m) in enumerate(left):
        # naive reference: latest right row at/before m (strictly before when
        # strict), max rid breaking timestamp ties (matches last() over the
        # (ts, insertion-order) sort in the union trick)
        cands = [
            (rm, j)
            for j, (rk, rm) in enumerate(right)
            if rk == k and (rm < m if strict else rm <= m)
        ]
        want = max(cands)[1] if cands else None
        assert out.get(i) == want, (i, k, m, cands)
