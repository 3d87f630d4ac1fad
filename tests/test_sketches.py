"""Quantitative local gates for the four rows-only approximate sketches:
the driver can only record a weaker rows-only check for these (their
outputs are engine-specific by design), so each one carries a pytest
invariant against EXACT ground truth computed side by side."""

from __future__ import annotations


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """HLL++ at rsd=0.02 must sit within ±5% of the exact distinct count
    on every group (≈2.5 sigma at this precision — deterministic given
    the fixed hash, so this is a stable bound, not a flaky one)."""
    from logflow.queries import load_all

    pdf = load_all()["agg_approx_distinct"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    rel = (pdf["approx_customers"] - pdf["exact_customers"]).abs() / pdf[
        "exact_customers"
    ]
    assert (rel <= 0.05).all(), rel.to_dict()


def test_approx_percentile_within_rank_tolerance(spark, sf_dir):
    """The sketch guarantees RANK error (<= n/accuracy, plus it returns a
    sample element where the exact percentile interpolates): assert each
    approx percentile lies within the exact value band at p ± 2 rank
    percent — the guarantee itself, not a value-space proxy that breaks
    on tail gaps."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["agg_approx_percentile"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    band = (
        load_table(spark, "events", sf_dir)
        .groupBy("event_type")
        .agg(
            *[
                F.round(F.expr(f"percentile(value, {p})"), 4).alias(f"b{i}")
                for i, p in enumerate((0.48, 0.52, 0.93, 0.97))
            ]
        )
        .toPandas()
        .set_index("event_type")
    )
    for _, r in pdf.iterrows():
        b = band.loc[r["event_type"]]
        assert b["b0"] - 1e-9 <= r["p50_approx"] <= b["b1"] + 1e-9, r.to_dict()
        assert b["b2"] - 1e-9 <= r["p95_approx"] <= b["b3"] + 1e-9, r.to_dict()


def test_hll_union_consistency(spark, sf_dir):
    """Datasketches HLL (lgK=14): per-day estimates within ±5% of exact,
    and the UNION estimate within ±5% of the true total distinct count
    (unions must not blow up the error)."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["diag_hll_sketch_union"].fn(spark, sf_dir).toPandas()
    days = pdf[pdf["day"].notna()]
    total = pdf[pdf["day"].isna()]
    assert len(days) > 0 and len(total) == 1
    rel = (days["est_users"] - days["exact_users"]).abs() / days["exact_users"]
    assert (rel <= 0.05).all()
    exact_total = (
        load_table(spark, "events", sf_dir).select("user_id").distinct().count()
    )
    est_total = int(total["est_users"].iloc[0])
    assert abs(est_total - exact_total) / exact_total <= 0.05


def test_stratified_sample_rates(spark, sf_dir):
    """sampleBy with per-source fractions: every realized per-source rate
    must match its configured fraction within a 5-sigma binomial band
    (seed is fixed, so the draw is deterministic — the band guards the
    CONTRACT, exact counts would be seed-coupled)."""
    import math
    import zlib

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["sample_stratified"].fn(spark, sf_dir).toPandas()
    pops = (
        load_table(spark, "documents", sf_dir)
        .groupBy("source")
        .count()
        .toPandas()
        .set_index("source")["count"]
    )
    assert len(pdf) > 0
    for _, row in pdf.iterrows():
        n = int(pops[row["source"]])
        f = 0.25 * (1 + zlib.crc32(row["source"].encode()) % 4)
        sigma = math.sqrt(n * f * (1 - f))
        assert abs(row["n_sampled"] - n * f) <= max(5 * sigma, 1.0), (
            row["source"],
            row["n_sampled"],
            n * f,
        )


# --------------------------------------------------------------------------
# round-12 exact-verify sketches (queries/sketches.py): these three have
# full DuckDB oracles (the sketch bounds work, never decides values), so
# parity covers correctness — the tests below assert the GUARANTEES the
# docstrings claim (rank band, error bound, candidate recall).
# --------------------------------------------------------------------------


def test_sketch_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    for name in (
        "sketch_kll_quantile_verify",
        "sketch_hll_distinct_verify",
        "sketch_countmin_verify",
    ):
        check_query(spark, duck, name, sf_dir)


def test_kll_values_are_exact_percentiles(spark, sf_dir):
    """The KLL band-selection answer must equal the brute-force sorted
    pick at k = ceil(p*n/100) — the whole point of the exact-verify
    contract — and the band the sketch brackets must respect the
    guaranteed rank-error bound (<= n/eps_inv + n_partitions rows)."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.queries.sketches import _KLL_EPS_INV, _KLL_PCTS
    from logflow.sources.tables import load_table

    pdf = (
        load_all()["sketch_kll_quantile_verify"].fn(spark, sf_dir).toPandas()
    ).set_index("pct")
    cents = sorted(
        r["cents"]
        for r in load_table(spark, "lineitem", sf_dir)
        .select(F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"))
        .collect()
    )
    n = len(cents)
    for p in _KLL_PCTS:
        k = (p * n + 99) // 100
        assert pdf.loc[p, "k"] == k
        assert abs(pdf.loc[p, "value"] - cents[k - 1] / 100) < 1e-9


def test_hll_estimate_within_rsd_bound(spark, sf_dir):
    """m=256 registers -> theoretical rsd = 1.04/sqrt(256) = 6.5%; the
    md5 hash is fixed, so the observed error is deterministic — assert
    within 3x rsd (a stable bound, not a flaky one)."""
    from logflow.queries import load_all

    pdf = load_all()["sketch_hll_distinct_verify"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["rel_err_pct"].abs() <= 3 * 6.5).all(), pdf.to_dict()


def test_countmin_candidates_superset_and_exact(spark, sf_dir):
    """CM estimates only over-count (est >= exact count for every output
    key) and the final rows equal the plain exact GROUP BY/HAVING set."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["sketch_countmin_verify"].fn(spark, sf_dir).toPandas()
    li = load_table(spark, "lineitem", sf_dir)
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .toPandas()
    )
    n, d = len(li.toPandas()), exact.shape[0]
    truth = set(exact[2 * exact["cnt"] * d >= 3 * n]["l_partkey"])
    assert set(pdf["l_partkey"]) == truth
    assert (pdf["cm_est"] >= pdf["cnt"]).all()
