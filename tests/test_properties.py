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


band_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(1, 13)), min_size=1, max_size=6
)


@settings(**SETTINGS)
@given(
    values=st.lists(st.floats(0, 60, allow_nan=False, width=32), min_size=1, max_size=25),
    raw_bands=band_strategy,
)
def test_range_band_join_matches_naive(spark, values, raw_bands):
    """Binned rewrite == naive theta join, including bands that end exactly
    on a bin edge, overlapping bands, and values outside every band."""
    from logflow.operators.joins import range_band_join

    bands = [(f"b{i}", float(lo), float(lo + w)) for i, (lo, w) in enumerate(raw_bands)]
    fact = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "fid long, v double"
    )
    bdf = spark.createDataFrame(bands, "band string, lo double, hi double")
    got = {
        (r.fid, r.band)
        for r in range_band_join(fact, bdf, value="v").select("fid", "band").collect()
    }
    want = {
        (i, name)
        for i, v in enumerate(values)
        for name, lo, hi in bands
        if lo <= v < hi
    }
    assert got == want


def test_ks_distance_identical_samples_is_zero(spark):
    """KS(a, a) must be exactly 0 for every group, and KS of disjoint
    ranges must be exactly 1 — the two analytic fixpoints of the
    statistic (catches off-by-one CDF evaluation, tie handling)."""
    from pyspark.sql import functions as F

    from logflow.operators.distribution import ks_distance_cogrouped

    base = spark.range(200).select(
        (F.col("id") % 4).alias("grp"), (F.col("id") * 1.5).alias("value")
    )
    same = ks_distance_cogrouped(base, base, "grp", "value").collect()
    assert len(same) == 4
    assert all(r.ks_raw == 0.0 for r in same)

    lo = spark.range(100).select((F.col("id") % 2).alias("grp"), (F.col("id") * 1.0).alias("value"))
    hi = spark.range(100).select(
        (F.col("id") % 2).alias("grp"), (F.col("id") * 1.0 + 1000.0).alias("value")
    )
    apart = ks_distance_cogrouped(lo, hi, "grp", "value").collect()
    assert all(r.ks_raw == 1.0 for r in apart)

    # Non-long group keys must work too (output schema derives the key type
    # from the input instead of hardcoding long).
    s = base.select(F.concat(F.lit("g"), F.col("grp")).alias("grp"), "value")
    str_key = ks_distance_cogrouped(s, s, "grp", "value").collect()
    assert sorted(r.grp for r in str_key) == ["g0", "g1", "g2", "g3"]
    assert all(r.ks_raw == 0.0 for r in str_key)


def test_cdc_apply_output_keys_unique_and_flags_disjoint(spark, sf_dir):
    """The CDC snapshot must have exactly one row per key, and a row can
    be inserted or updated but never both."""
    from logflow.queries import load_all

    out = load_all()["cdc_apply_upsert"].fn(spark, sf_dir)
    total = out.count()
    assert out.select("o_orderkey").distinct().count() == total
    assert out.filter(F.col("updated") & F.col("inserted")).count() == 0


def test_contamination_ratio_bounds(spark, sf_dir):
    """0 <= n_hit <= n_grams and the flag is exactly n_hit > 0."""
    from logflow.queries import load_all

    rows = load_all()["contamination_ngram_overlap"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hit <= r.n_grams
        assert r.contaminated == (r.n_hit > 0)
        assert 0.0 <= r.overlap_ratio <= 1.0


def test_scd2_exactly_one_open_version_per_key(spark, sf_dir):
    """SCD2 invariant: every key has exactly one open (valid_to IS NULL)
    version."""
    from logflow.queries import load_all

    rows = load_all()["scd2_customer_history"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.n_open == 1 for r in rows)


@given(edges=edges_strategy, iters=st.integers(1, 3))
@settings(**SETTINGS)
def test_pagerank_fixed_point_matches_reference(spark, edges, iters):
    """The BIGINT fixed-point PageRank update must agree EXACTLY (integer
    equality, no tolerance) with a pure-Python model on random graphs —
    the property the cross-engine oracle determinism rests on."""
    from logflow.operators.graph import pagerank_fixed_point, pagerank_fixed_point_reference

    # feed the RAW edge list (duplicates included): the operator's default
    # dedup must reduce it to the distinct-edge model the reference uses
    df = spark.createDataFrame(sorted(edges), "u long, v long")
    got = {r.u: r.r for r in pagerank_fixed_point(df, iters=iters).collect()}
    want = pagerank_fixed_point_reference(list(set(edges)), iters=iters)
    assert got == want


words_strategy = st.dictionaries(
    keys=st.text(alphabet="abcd", min_size=1, max_size=6),
    values=st.integers(1, 9),
    min_size=1,
    max_size=8,
)


@given(word_freqs=words_strategy, steps=st.integers(1, 2))
@settings(**SETTINGS)
def test_bpe_merges_match_greedy_reference(spark, word_freqs, steps):
    """The Spark replace-based BPE merge must produce the same merge
    sequence (pairs, merged symbols, exact counts) as a pure-Python
    greedy leftmost reference — including 'aaa'-style overlap handling
    and lexicographic argmax ties."""
    from logflow.operators.bpe import bpe_merge_reference, bpe_merge_table

    want = bpe_merge_reference(word_freqs, steps)
    df = spark.createDataFrame(list(word_freqs.items()), "w string, freq long")
    got = [
        (r.step, r.sym_a, r.sym_b, r.merged, r.cnt)
        for r in bpe_merge_table(df, steps).orderBy("step").collect()
    ]
    # reference stops early when no pairs remain (all 1-char words);
    # Spark's argmax-of-empty yields no row for that step too
    assert got == want


# docs as small token soups over a tiny alphabet — maximizes shared-token
# collisions, tie ranks (equal df), and boundary sizes (1-token docs,
# docs where ceil(t*sz) lands exactly on an integer: the IEEE-ceil trap)
docs_strategy = st.lists(
    st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=10),
    min_size=2,
    max_size=8,
)


@settings(**SETTINGS)
@given(docs=docs_strategy)
def test_prefix_jaccard_lossless_vs_bruteforce(spark, docs):
    """Prefix filtering must return EXACTLY the Jaccard >= 4/5 pair set —
    no false negatives (the correctness guarantee) and no false
    positives (the verify step) — on adversarial tiny corpora: tied
    document frequencies, single-token docs, exact threshold multiples."""
    from logflow.operators.dedup import prefix_filter_jaccard_join

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filter_jaccard_join(df, "doc_id", "text", 4, 5).collect()
    }
    sets = {i: set(toks) for i, toks in enumerate(docs)}
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                ix = len(sets[a] & sets[b])
                un = len(sets[a] | sets[b])
                if un and ix * 5 >= 4 * un:
                    want[(a, b)] = round(ix / un, 6)
    assert got == want


times_strategy = st.lists(
    st.tuples(
        st.integers(0, 1),            # day index
        st.integers(0, 24 * 60 - 1),  # minute of day (incl. spans that clip)
        st.integers(0, 59),           # second
    ),
    min_size=1,
    max_size=24,
)


def _brute_max_concurrency(stamps, span_minutes=5):
    """Single-pass sweep per day: ends sort before starts at equal t
    (touching spans don't overlap); spans clip at midnight."""
    by_day = {}
    for ts in stamps:
        day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        end = min(ts + datetime.timedelta(minutes=span_minutes),
                  day + datetime.timedelta(days=1))
        by_day.setdefault(day, []).append((ts, 1))
        by_day[day].append((end, -1))
    out = {}
    for day, deltas in by_day.items():
        cur = peak = 0
        for _, d in sorted(deltas):  # (t, delta): -1 sorts before +1
            cur += d
            peak = max(peak, cur)
        out[day] = (peak, len(deltas) // 2)
    return out


@settings(**SETTINGS)
@given(times=times_strategy)
def test_interval_max_concurrency_matches_sweep(spark, times):
    """The two-phase (hour-base + bounded run window) decomposition must
    equal the sequential sweep on adversarial inputs: duplicate
    timestamps, spans touching exactly (end == next start), spans
    clipping at midnight, hours with only -1 deltas."""
    from logflow.operators.intervals import interval_max_concurrency

    base = datetime.datetime(2024, 3, 1)
    stamps = [
        base + datetime.timedelta(days=d, minutes=m, seconds=s)
        for d, m, s in times
    ]
    df = spark.createDataFrame([(t,) for t in stamps], "ts timestamp")
    got = {
        r.day: (r.max_concurrent, r.n_spans)
        for r in interval_max_concurrency(df, "ts", 5).collect()
    }
    assert got == _brute_max_concurrency(stamps)


def test_range_band_join_degenerate_and_inverted_bands(spark):
    """hi <= lo bands match nothing and must not crash or fabricate bins
    (an inverted band would make sequence() DESCEND); bin_width=0 is a
    loud error, not a silently recomputed width."""
    import pytest as _pytest

    from logflow.operators.joins import range_band_join

    fact = spark.createDataFrame([(1, 5.0), (2, 50.0)], "fid long, v double")
    bands = spark.createDataFrame(
        [("empty", 5.0, 5.0), ("inverted", 1e9, 0.0)], "band string, lo double, hi double"
    )
    assert range_band_join(fact, bands, value="v").count() == 0
    mixed = spark.createDataFrame(
        [("ok", 0.0, 10.0), ("inverted", 1e9, 0.0)], "band string, lo double, hi double"
    )
    got = {(r.fid, r.band) for r in range_band_join(fact, mixed, value="v").collect()}
    assert got == {(1, "ok")}
    with _pytest.raises(ValueError):
        range_band_join(fact, mixed, value="v", bin_width=0.0)


@settings(**SETTINGS)
@given(edges=edges_strategy)
def test_triangle_degree_ordered_matches_id_ordered_and_brute(spark, edges):
    """Both wedge formulations must agree with each other AND with a
    brute-force per-node triangle count on random graphs — the proof that
    degree-ordering changes only the join order, never the result."""
    from itertools import combinations

    from logflow.operators.graph import (
        triangle_counts_degree_ordered,
        triangle_counts_ordered,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges}
    df = spark.createDataFrame(sorted(und), "u long, v long")
    got_id = {r.n: r.n_triangles for r in triangle_counts_ordered(df).collect()}
    got_deg = {r.n: r.n_triangles for r in triangle_counts_degree_ordered(df).collect()}
    nodes = sorted({x for e in und for x in e})
    brute: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for x in (a, b, c):
                brute[x] = brute.get(x, 0) + 1
    assert got_id == brute
    assert got_deg == brute


# ---- deterministic range-bucket prefix machinery (operators/packing.py) ----
#
# These helpers replaced a spark_partition_id()-keyed form that silently
# dropped rows when AQE coalesced the two traversals of the same shuffle
# differently (round 7). The properties below pin the contract that bug
# violated: positions are a PERMUTATION, every row survives, and ntile
# matches the closed-form definition — across duplicate-heavy leading
# keys, tiny/large frames, and timestamp keys.

rownum_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 10_000)),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[1],
)


@settings(**SETTINGS)
@given(rows=rownum_rows)
def test_global_row_number_is_the_sort_permutation(spark, rows):
    from logflow.operators.packing import global_row_number

    df = spark.createDataFrame(rows, "lead long, uid long")
    got = (
        global_row_number(df, ["lead", "uid"], out_col="rn", total_col="n")
        .toPandas()
        .sort_values("rn")
    )
    assert list(got["rn"]) == list(range(1, len(rows) + 1))
    assert (got["n"] == len(rows)).all()
    expect = sorted(rows)
    assert [tuple(x) for x in got[["lead", "uid"]].to_records(index=False)] == expect


@settings(**SETTINGS)
@given(rows=rownum_rows, n_tiles=st.integers(1, 7))
def test_global_ntile_matches_closed_form(spark, rows, n_tiles):
    from logflow.operators.packing import global_ntile

    df = spark.createDataFrame(rows, "lead long, uid long")
    got = (
        global_ntile(df, ["lead", "uid"], n_tiles, out_col="t")
        .toPandas()
        .sort_values(["lead", "uid"])
    )
    n = len(rows)
    q, r = divmod(n, n_tiles)
    want = []
    for p in range(n):
        if p < r * (q + 1):
            want.append(p // (q + 1) + 1)
        else:
            want.append(r + (p - r * (q + 1)) // q + 1)
    assert list(got["t"]) == want


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 100)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_global_running_sum_matches_prefix(spark, rows):
    from logflow.operators.packing import global_running_sum

    df = spark.createDataFrame(rows, "k long, v long")
    got = (
        global_running_sum(df, "k", "v", out_col="run")
        .toPandas()
        .sort_values("k")
    )
    acc, want = 0, []
    for _, v in sorted(rows):
        acc += v
        want.append(acc)
    assert list(got["run"]) == want
