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
