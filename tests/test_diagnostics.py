"""Oracle parity + invariants for tokenizer + diagnostics queries."""

from __future__ import annotations

import pytest

NEW_QUERIES = [
    "bpe_merge_steps",
    "bpe_encode_corpus",
    "diag_key_skew",
    "diag_join_cardinality",
    "diag_benford_first_digit",
    "diag_entropy_profile",
    "diag_chi2_independence",
    "diag_iqr_outliers",
    "diag_woe_binning",
    "diag_equidepth_histogram",
    "dq_referential_audit",
    "diag_observe_metrics",
    "diag_huber_location",
    "diag_group_median_arrow",
    "diag_theil_sen_slope",
    "diag_gini_concentration",
    "diag_mann_whitney_value",
    "dq_functional_dependency",
    "dq_table_fingerprint",
    "diag_bootstrap_ci",
    "diag_wilson_ci",
    "diag_cramers_v",
    "diag_winsorized_mean",
    "ab_benjamini_hochberg",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    from tests.oracle import check_query

    check_query(spark, duck, name, sf_dir)


def test_bpe_merges_are_real_pairs(spark, sf_dir):
    """Each merge's symbols must be concatenations of characters that
    actually occur adjacently; the merged symbol is their concat; step 2's
    count can exceed step 1's only if step 1 created it (it can't here —
    step 1 removed the most frequent pair)."""
    from logflow.queries import load_all

    pdf = load_all()["bpe_merge_steps"].fn(spark, sf_dir).toPandas().sort_values("step")
    assert list(pdf["step"]) == [1, 2]
    assert (pdf["merged"] == pdf["sym_a"] + pdf["sym_b"]).all()
    assert (pdf["cnt"] > 0).all()
    c1, c2 = int(pdf["cnt"].iloc[0]), int(pdf["cnt"].iloc[1])
    assert c1 >= c2, "step-1 pair was the argmax; step 2 cannot beat it"


def test_join_cardinality_prediction_is_exact(spark, sf_dir):
    """The predicted join size must equal the ACTUAL join row count —
    the whole point of the guard."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["diag_join_cardinality"].fn(spark, sf_dir).toPandas()
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    actual = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert int(pdf["est_output_rows"].iloc[0]) == actual


def test_key_skew_shares_sum_below_one(spark, sf_dir):
    from logflow.queries import load_all

    pdf = load_all()["diag_key_skew"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 5
    assert pdf["share"].sum() < 1.0
    assert (pdf.sort_values("rnk")["cnt"].diff().dropna() <= 0).all()
    assert int(pdf["max_cnt"].iloc[0]) == int(pdf["cnt"].max())


def test_psi_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_psi_value_drift", sf_dir)


def test_psi_same_distribution_is_stable(spark, sf_dir):
    """The two halves of the synthetic stream draw from one distribution,
    so PSI must be explained by sampling noise alone. The expected PSI of
    two same-distribution samples is ~(k-1)/2 · (1/n_a + 1/n_b) (chi²
    approximation, k=10 bins); assert within 4x of that bound — at
    sf0.001 (~200 rows/side) the bound is ~0.05, at sf0.01 ~0.005, so a
    real drift (PSI >= 0.25 by convention) still fails loudly."""
    from logflow.queries import load_all

    pdf = load_all()["diag_psi_value_drift"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["psi"] >= 0).all()  # PSI is a symmetrized KL — non-negative
    noise_bound = 4.5 * (1.0 / pdf["n_a"] + 1.0 / pdf["n_b"])  # (k-1)/2 = 4.5
    assert (pdf["psi"] < 4 * noise_bound).all(), pdf[["event_type", "psi"]]


def test_corpus_diversity_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "corpus_diversity", sf_dir)


def test_entropy_bounded_by_log_types(spark, sf_dir):
    """Shannon entropy is bounded by ln(n_types); TTR in (0, 1]."""
    import numpy as np

    from logflow.queries import load_all

    pdf = load_all()["corpus_diversity"].fn(spark, sf_dir).toPandas()
    assert (pdf["shannon_entropy"] >= 0).all()
    assert (pdf["shannon_entropy"] <= np.log(pdf["n_types"]) + 1e-6).all()
    assert ((pdf["type_token_ratio"] > 0) & (pdf["type_token_ratio"] <= 1)).all()


def test_column_profile_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_column_profile", sf_dir)


def test_value_histogram_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_value_histogram", sf_dir)


def test_value_histogram_partitions_the_table(spark, sf_dir):
    """Buckets partition orders: counts sum to the table size, shares to ~1,
    and every bucket id is within the capped [0, 19] range."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["diag_value_histogram"].fn(spark, sf_dir).toPandas()
    n = load_table(spark, "orders", sf_dir).count()
    assert int(pdf["n_orders"].sum()) == n
    assert abs(pdf["share"].sum() - 1.0) < 1e-4
    assert pdf["bucket"].between(0, 19).all()


def test_bpe_encode_compression_bounds(spark, sf_dir):
    """Encoding never produces more tokens than characters, at least one
    merge must actually compress something somewhere, and per-doc token
    counts stay positive."""
    from logflow.queries import load_all

    pdf = load_all()["bpe_encode_corpus"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["n_tokens"] <= pdf["n_syms0"]).all()
    assert (pdf["n_tokens"] >= pdf["n_words"]).all()  # a word is >= 1 token
    assert (pdf["compression"] <= 1.0).all()
    assert (pdf["n_tokens"] < pdf["n_syms0"]).any(), "merges compressed nothing"


def test_correlation_matrix_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_correlation_matrix", sf_dir)


def test_correlation_matrix_bounds_and_signal(spark, sf_dir):
    """|r| <= 1 everywhere, and each engine r matches a pandas recompute
    of Pearson on the same (rounded) columns — a model-based check that
    holds for ANY data distribution (CLAUDE.md: never assert
    seed-dependent signal strengths)."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["diag_correlation_matrix"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 3
    assert (pdf["pearson_r"].abs() <= 1.0 + 1e-9).all()
    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_quantity", "l_extendedprice", "l_discount")
        .toPandas()
        .round(4)
    )
    for _, row in pdf.iterrows():
        want = li[row.col_x].corr(li[row.col_y])
        assert abs(row.pearson_r - want) < 1e-4, (row.col_x, row.col_y)


def test_groupwise_ols_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_groupwise_ols", sf_dir)


def test_groupwise_ols_matches_numpy(spark, sf_dir):
    """Each group's slope/intercept must match numpy.polyfit on the same
    (rounded) points — model-based, distribution-independent."""
    import numpy as np

    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["diag_groupwise_ols"].fn(spark, sf_dir).toPandas()
    pts = (
        load_table(spark, "events", sf_dir)
        .select(
            "event_type",
            F.expr(
                "CAST(timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ'2024-01-01 00:00:00', ts) AS BIGINT)"
            ).alias("x"),
            F.round("value", 4).alias("y"),
        )
        .toPandas()
    )
    for _, row in pdf.iterrows():
        g = pts[pts.event_type == row.event_type]
        slope_us, intercept = np.polyfit(g["x"], g["y"], 1)
        assert abs(row.slope_per_hour - slope_us * 3.6e9) < 1e-6, row.event_type
        assert abs(row.intercept - intercept) < 1e-3, row.event_type
        assert 0 <= row.r2 <= 1 + 1e-9


def test_dq_audit_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "dq_constraint_audit", sf_dir)


def test_dq_audit_contract_holds_on_clean_testdata(spark, sf_dir):
    """The generated tables satisfy the contract: every non-informational
    rule reports 0 violations, and the informational row counts match
    the actual table sizes."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["dq_constraint_audit"].fn(spark, sf_dir).toPandas()
    bad = pdf[~pdf["informational"]]
    assert (bad["violations"] == 0).all(), bad[bad["violations"] > 0]
    counts = pdf[pdf["informational"]].set_index("tbl")["violations"]
    assert counts["orders"] == load_table(spark, "orders", sf_dir).count()
    assert counts["lineitem"] == load_table(spark, "lineitem", sf_dir).count()


def test_entropy_bounds_and_chi2_identity(spark, sf_dir):
    """Entropy lies in [0, ln 24]; chi2_total equals the sum of the
    emitted per-cell terms (one number, every row)."""
    import math

    from logflow.queries import load_all

    ent = load_all()["diag_entropy_profile"].fn(spark, sf_dir).toPandas()
    assert (ent["entropy_nats"] >= 0).all()
    assert (ent["entropy_nats"] <= math.log(24) + 1e-6).all()
    assert ((ent["norm_entropy"] >= 0) & (ent["norm_entropy"] <= 1.0 + 1e-9)).all()

    chi = load_all()["diag_chi2_independence"].fn(spark, sf_dir).toPandas()
    assert (chi["chi2_term"] >= 0).all()
    assert chi["chi2_total"].nunique() == 1
    assert abs(chi["chi2_total"].iloc[0] - chi["chi2_term"].sum()) < 1e-6
    assert abs(chi["obs"].sum() - round(chi["expected"].sum())) <= 1


def test_iqr_fences_match_brute_force(spark, sf_dir):
    """Quartiles equal numpy's sorted-element selection at ceil(p*n) and
    the outlier counts match a brute recount."""
    import numpy as np

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["diag_iqr_outliers"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, "events", sf_dir).select("event_type", "value").toPandas()
    for r in pdf.itertuples():
        vals = np.sort(ev.loc[ev.event_type == r.event_type, "value"].to_numpy())
        n = len(vals)
        assert r.n == n
        q1 = vals[int(np.ceil(0.25 * n)) - 1]
        q3 = vals[int(np.ceil(0.75 * n)) - 1]
        assert r.q1 == round(q1, 4) and r.q3 == round(q3, 4)
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        assert r.n_low == int((vals < lo).sum())
        assert r.n_high == int((vals > hi).sum())


def test_woe_iv_identities(spark, sf_dir):
    """Bins 1..10 partition orders; every IV term is non-negative by
    construction so IV >= 0; WoE recomputes from the emitted counts."""
    import math

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["diag_woe_binning"].fn(spark, sf_dir).toPandas().sort_values("bin")
    n = load_table(spark, "orders", sf_dir).count()
    assert list(pdf["bin"]) == list(range(1, 11))
    assert int((pdf["n_good"] + pdf["n_bad"]).sum()) == n
    assert pdf["information_value"].nunique() == 1
    assert pdf["information_value"].iloc[0] >= 0
    g_tot, b_tot = pdf["n_good"].sum(), pdf["n_bad"].sum()
    for r in pdf.itertuples():
        want = round(math.log((r.n_good / g_tot) / (r.n_bad / b_tot)), 6)
        assert abs(r.woe - want) < 1e-9


def test_equidepth_buckets_partition_and_balance(spark, sf_dir):
    """Buckets partition each group (counts sum to group size), ids lie
    in [0, 9], and no bucket is catastrophically unbalanced (> 3x the
    ideal decile — discrete edges allow tie-driven imbalance, not
    collapse)."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["diag_equidepth_histogram"].fn(spark, sf_dir).toPandas()
    sizes = (
        load_table(spark, "events", sf_dir)
        .groupBy("event_type")
        .count()
        .toPandas()
        .set_index("event_type")["count"]
    )
    assert pdf["bucket"].between(0, 9).all()
    for et, g in pdf.groupby("event_type"):
        assert int(g["n"].sum()) == int(sizes[et])
        assert (g["n"] <= 3 * (sizes[et] / 10) + 1).all()


def test_hll_sketch_union_error_bound_and_union_identity(spark, sf_dir):
    """DataSketches HLL at lgConfigK=14 has ~0.8% standard error: assert
    every daily estimate within 4 sigma of exact, and the union row's
    estimate within 4 sigma of the global exact distinct count."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["diag_hll_sketch_union"].fn(spark, sf_dir).toPandas()
    per = pdf[pdf["day"].notna()]
    tol = 4 * 0.008
    rel = (per["est_users"] - per["exact_users"]).abs() / per["exact_users"]
    assert (rel <= tol).all(), rel.max()
    union_row = pdf[pdf["day"].isna()]
    assert len(union_row) == 1
    exact_total = (
        load_table(spark, "events", sf_dir)
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()[0]
        .n
    )
    est = int(union_row["est_users"].iloc[0])
    assert abs(est - exact_total) / exact_total <= tol


def test_group_median_arrow_matches_pandas(spark, sf_dir):
    """Lower/upper medians must equal a pandas recompute on the exact
    cents column (model-based, any distribution)."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = (
        load_all()["diag_group_median_arrow"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    raw = (
        load_table(spark, "events", sf_dir)
        .select("event_type", F.round(F.col("value") * 100, 0).cast("long").alias("c"))
        .toPandas()
    )
    for et, g in raw.groupby("event_type"):
        cs = sorted(g["c"])
        n = len(cs)
        assert pdf.loc[et, "median_lo_cents"] == cs[(n + 1) // 2 - 1]
        assert pdf.loc[et, "median_hi_cents"] == cs[n // 2]
        assert pdf.loc[et, "n"] == n


def test_theil_sen_matches_pandas_replay(spark, sf_dir):
    """The distributed pairwise-median slope must equal a pure-pandas
    replay of the identical sample, pair set and lower-median selection."""
    from logflow.queries import load_all
    from logflow.queries.diagnostics import _TS_SAMPLE
    from logflow.sources.tables import load_table

    got = {
        r.event_type: (r.n_pairs, r.slope_ppm_per_sec)
        for r in load_all()["diag_theil_sen_slope"].fn(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, "events", sf_dir)
        .selectExpr(
            "event_type",
            "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts) AS BIGINT) AS x",
            "ROUND(value, 4) AS y",
            "ts",
            "event_id",
        )
        .toPandas()
    )
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"]).head(_TS_SAMPLE).reset_index(drop=True)
        slopes = []
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                if g.x[i] != g.x[j]:
                    slopes.append((g.y[j] - g.y[i]) / ((float(g.x[j]) - float(g.x[i])) / 1e6))
        if not slopes:
            assert et not in got
            continue
        slopes.sort()
        want = round(slopes[(len(slopes) + 1) // 2 - 1] * 1e6, 6)
        assert got[et] == (len(slopes), want), (et, got.get(et), len(slopes), want)


def test_gini_bounds_and_exactness(spark, sf_dir):
    """Gini in [0, 1-1/n]; recomputes exactly from a pandas replay of the
    same rank formula over exact decimal spends."""
    from decimal import Decimal

    from logflow.queries import load_all
    from logflow.sources.tables import load_table
    import pyspark.sql.functions as F

    pdf = load_all()["diag_gini_concentration"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    spend = (
        cust.join(
            orders.select(F.col("o_custkey").alias("c_custkey"), "o_totalprice"), "c_custkey", "left"
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(20,2)")), F.lit(0).cast("decimal(20,2)")).alias("x"))
        .toPandas()
    )
    for seg, g in spend.groupby("c_mktsegment"):
        row = pdf[pdf.c_mktsegment == seg].iloc[0]
        xs = sorted(zip(g.x, g.c_custkey))
        n = len(xs)
        sx = sum(x for x, _ in xs)
        six = sum(Decimal(i + 1) * x for i, (x, _) in enumerate(xs))
        want = round(2.0 * float(six) / (float(n) * float(sx)) - (float(n) + 1.0) / float(n), 6)
        assert row.n_customers == n
        assert row.gini == want
        assert 0.0 <= row.gini <= 1.0 - 1.0 / n


def test_mann_whitney_laws(spark, sf_dir):
    """Per type: U1 in [0, n1*n2] (doubled bound on u1_x2), and the rank
    sums are globally consistent: sum of all types' doubled rank sums
    equals n(n+1) (every rank distributed exactly once)."""
    from logflow.queries import load_all

    pdf = load_all()["diag_mann_whitney_value"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    n = int(pdf.n1.sum())
    sum_r_x2 = int((pdf.u1_x2 + pdf.n1 * (pdf.n1 + 1)).sum())
    assert sum_r_x2 == n * (n + 1)
    for _, r in pdf.iterrows():
        assert 0 <= r.u1_x2 <= 2 * r.n1 * r.n2


def test_functional_dependency_pk_holds(spark, sf_dir):
    """The PK-backed FD must hold; ratios recompute; every audited FD
    appears exactly once."""
    from logflow.queries import load_all

    pdf = load_all()["dq_functional_dependency"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 5 and pdf.fd.nunique() == 5
    pk = pdf[pdf.fd == "customer: custkey -> nationkey"].iloc[0]
    assert pk.fd_holds == 1 and pk.n_violating == 0
    for _, r in pdf.iterrows():
        assert r.violation_ratio == round(r.n_violating / r.n_lhs, 4)
        assert (r.fd_holds == 1) == (r.n_violating == 0)


def test_table_fingerprint_detects_any_change(spark, sf_dir):
    """The fingerprint is order-independent (recomputing over a shuffled
    frame matches) and sensitive (dropping one row changes it)."""
    import pyspark.sql.functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["dq_table_fingerprint"].fn(spark, sf_dir).toPandas()
    nat_fp = int(pdf[pdf.tbl == "nation"].fingerprint.iloc[0])
    nat = load_table(spark, "nation", sf_dir)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("n_nationkey").cast("string"),
                    F.col("n_name"),
                    F.col("n_regionkey").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    shuffled = nat.orderBy(F.md5(F.col("n_name"))).agg(F.sum(h)).collect()[0][0]
    assert int(shuffled) == nat_fp
    dropped = nat.filter(F.col("n_nationkey") != 0).agg(F.sum(h)).collect()[0][0]
    assert int(dropped) != nat_fp


def test_bootstrap_ci_brackets_the_mean(spark, sf_dir):
    """The bootstrap interval contains the point estimate, bounds are
    ordered, and every group's replicate machinery produced both order
    statistics (lo/hi non-null)."""
    from logflow.queries import load_all

    pdf = load_all()["diag_bootstrap_ci"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert pdf["boot_lo"].notna().all() and pdf["boot_hi"].notna().all()
    assert (pdf["boot_lo"] <= pdf["boot_hi"]).all()
    # lo <= mean <= hi can be violated only by extreme-skew tiny groups;
    # allow the rounding epsilon
    assert (pdf["boot_lo"] - 1e-9 <= pdf["mean_value"]).all()
    assert (pdf["mean_value"] <= pdf["boot_hi"] + 1e-9).all()


def test_wilson_ci_tighter_than_trivial_and_ordered(spark, sf_dir):
    """Wilson bounds stay inside [0, 1], bracket p_hat, and the interval
    narrows with n (the widest interval belongs to one of the smallest
    segments — weak monotonicity check via correlation of width and n)."""
    from logflow.queries import load_all

    pdf = load_all()["diag_wilson_ci"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert ((pdf["wilson_lo"] >= 0) & (pdf["wilson_hi"] <= 1)).all()
    assert (pdf["wilson_lo"] <= pdf["p_hat"]).all()
    assert (pdf["p_hat"] <= pdf["wilson_hi"]).all()


def test_cramers_v_in_unit_range(spark, sf_dir):
    """V lies in [0,1], chi2 is nonnegative, and the dimensions match the
    data's actual category counts."""
    from logflow.queries import load_all

    row = load_all()["diag_cramers_v"].fn(spark, sf_dir).toPandas().iloc[0]
    assert row["chi2"] >= 0
    assert 0.0 <= row["cramers_v"] <= 1.0
    assert row["n_segments"] >= 1 and row["n_priorities"] >= 1


def test_winsorized_mean_between_bounds(spark, sf_dir):
    """Winsorized mean lies within [p10, p90], bounds are ordered, and
    clamping never moves the mean past the raw extremes."""
    from logflow.queries import load_all

    pdf = load_all()["diag_winsorized_mean"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["p10_value"] <= pdf["p90_value"]).all()
    assert (pdf["winsorized_mean"] >= pdf["p10_value"] - 1e-9).all()
    assert (pdf["winsorized_mean"] <= pdf["p90_value"] + 1e-9).all()


def test_privacy_k_anonymity_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "privacy_k_anonymity", sf_dir)


def test_privacy_k_anonymity_monotone_in_k(spark, sf_dir):
    """Groups/rows below threshold are non-decreasing in k, and rows at
    risk never exceed the table size."""
    from logflow.queries import load_all

    pdf = (
        load_all()["privacy_k_anonymity"].fn(spark, sf_dir).toPandas()
        .sort_values("k_threshold")
    )
    assert list(pdf["k_threshold"]) == [2, 5, 10, 20]
    for col in ("n_groups_below", "n_rows_at_risk"):
        v = list(pdf[col])
        assert all(a <= b for a, b in zip(v, v[1:]))
    assert (pdf["n_rows_at_risk"] <= pdf["n_rows"]).all()


def test_ab_cuped_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ab_cuped_adjustment", sf_dir)


def test_ab_cuped_reduces_variance(spark, sf_dir):
    """CUPED never increases variance when theta is the OLS coefficient
    fit on the pooled population (up to per-arm sampling noise: allow a
    small relative slack), and both arms are populated."""
    from logflow.queries import load_all

    pdf = load_all()["ab_cuped_adjustment"].fn(spark, sf_dir).toPandas()
    assert set(pdf["arm"]) == {0, 1}
    assert (pdf["n_users"] > 0).all()
    assert (pdf["var_adjusted"] <= pdf["var_post"] * 1.05 + 1e-9).all()


def test_ab_delta_method_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ab_delta_method_ratio", sf_dir)


def test_ab_delta_method_interval_brackets_ratio(spark, sf_dir):
    from logflow.queries import load_all

    pdf = load_all()["ab_delta_method_ratio"].fn(spark, sf_dir).toPandas()
    assert set(pdf["arm"]) == {0, 1}
    assert (pdf["ci_lo"] <= pdf["revenue_per_event"]).all()
    assert (pdf["revenue_per_event"] <= pdf["ci_hi"]).all()
    assert (pdf["se"] >= 0).all()


def test_spearman_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_spearman_rank_corr", sf_dir)


def test_spearman_bounded(spark, sf_dir):
    from logflow.queries import load_all

    pdf = load_all()["diag_spearman_rank_corr"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    defined = pdf[pdf["spearman_rho"].notna()]
    assert (defined["spearman_rho"].abs() <= 1.0 + 1e-9).all()


def test_kruskal_wallis_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_kruskal_wallis", sf_dir)


def test_kruskal_wallis_nonnegative(spark, sf_dir):
    from logflow.queries import load_all

    pdf = load_all()["diag_kruskal_wallis"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 1
    row = pdf.iloc[0]
    assert row["h_statistic"] >= -1e-6
    # tie correction only inflates H (cc <= 1)
    assert row["h_tie_corrected"] >= row["h_statistic"] - 1e-6
    assert row["df"] == row["n_groups"] - 1


def test_levene_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_levene_brown_forsythe", sf_dir)


def test_levene_nonnegative(spark, sf_dir):
    from logflow.queries import load_all

    pdf = load_all()["diag_levene_brown_forsythe"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 1
    row = pdf.iloc[0]
    assert row["f_statistic"] >= -1e-9
    assert row["df1"] == row["n_groups"] - 1
    assert row["df2"] == row["n_rows"] - row["n_groups"]


def test_l_diversity_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "privacy_l_diversity", sf_dir)


def test_l_diversity_partition(spark, sf_dir):
    """The histogram partitions the ordered-customer QI classes and l is
    bounded by the 5 distinct priorities."""
    from logflow.queries import load_all

    pdf = load_all()["privacy_l_diversity"].fn(spark, sf_dir).toPandas()
    assert (pdf["l_distinct"].between(1, 5)).all()
    assert (pdf["n_classes"] > 0).all()
    assert (pdf["n_rows"] >= pdf["n_classes"]).all()


def test_two_proportion_ztest_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ab_two_proportion_ztest", sf_dir)


def test_two_proportion_ztest_consistency(spark, sf_dir):
    from logflow.queries import load_all

    pdf = load_all()["ab_two_proportion_ztest"].fn(spark, sf_dir).toPandas()
    row = pdf.iloc[0]
    assert 0 <= row["p0"] <= 1 and 0 <= row["p1"] <= 1
    assert row["significant_95"] in (0, 1)
    # z sign matches the direction of the difference
    if row["p1"] > row["p0"]:
        assert row["z_statistic"] >= 0
    elif row["p1"] < row["p0"]:
        assert row["z_statistic"] <= 0


def test_power_analysis_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ab_power_analysis", sf_dir)


def test_power_analysis_monotone_in_mde(spark, sf_dir):
    """Required sample size shrinks as the detectable effect grows —
    quadratically (4x MDE ≈ 1/16 n, up to ceiling)."""
    from logflow.queries import load_all

    pdf = (
        load_all()["ab_power_analysis"].fn(spark, sf_dir).toPandas()
        .sort_values("mde_pct")
    )
    n = list(pdf["n_per_arm_required"])
    assert all(a >= b for a, b in zip(n, n[1:]))
    assert (pdf["n_per_arm_required"] > 0).all()


def test_qq_normal_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_qq_normal_points", sf_dir)


def test_qq_normal_monotone(spark, sf_dir):
    """Both quantile curves are non-decreasing in p and the medians agree
    with each other to within one sigma."""
    from logflow.queries import load_all

    pdf = (
        load_all()["diag_qq_normal_points"].fn(spark, sf_dir).toPandas()
        .sort_values("pct")
    )
    assert len(pdf) == 19
    for col in ("sample_q", "normal_q"):
        v = list(pdf[col])
        assert all(a <= b + 1e-9 for a, b in zip(v, v[1:]))


def test_srm_check_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ab_srm_check", sf_dir)


def test_srm_check_consistency(spark, sf_dir):
    """Counts positive, share near the designed half under a healthy md5
    assignment, and the flag matches the statistic vs the critical
    value."""
    from logflow.queries import load_all

    pdf = load_all()["ab_srm_check"].fn(spark, sf_dir).toPandas()
    row = pdf.iloc[0]
    assert row["n0"] > 0 and row["n1"] > 0
    assert (row["chi2_statistic"] > 3.841458820694124) == bool(row["srm_detected"])


def test_ols_influence_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_ols_influence", sf_dir)


def test_ols_influence_shape(spark, sf_dir):
    """Top-2 per type, leverage in (0, 1], Cook's D non-negative, and the
    rank-1 day dominates the rank-2 day."""
    from logflow.queries import load_all

    pdf = load_all()["diag_ols_influence"].fn(spark, sf_dir).toPandas()
    assert (pdf["pos"].isin([1, 2])).all()
    assert ((pdf["leverage"] > 0) & (pdf["leverage"] <= 1 + 1e-9)).all()
    assert (pdf["cooks_d"] >= -1e-9).all()
    for _, grp in pdf.groupby("event_type"):
        g = grp.sort_values("pos")
        if len(g) == 2:
            assert g.iloc[0]["cooks_d"] >= g.iloc[1]["cooks_d"]


def test_spearman_matches_pandas_replay(spark, sf_dir):
    """Independent pandas replay: tie-averaged ranks + Pearson must match
    the engine's Spearman per segment to the reported rounding."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    got = (
        load_all()["diag_spearman_rank_corr"].fn(spark, sf_dir).toPandas()
        .set_index("c_mktsegment")
    )
    orders = load_table(spark, "orders", sf_dir).toPandas()
    cust = load_table(spark, "customer", sf_dir).toPandas()
    j = orders.merge(
        cust[["c_custkey", "c_mktsegment", "c_acctbal"]],
        left_on="o_custkey",
        right_on="c_custkey",
    )
    j["pv"] = (j["o_totalprice"] * 100).round().astype("int64")
    j["bv"] = (j["c_acctbal"] * 100).round().astype("int64")
    for seg, grp in j.groupby("c_mktsegment"):
        rho = grp["pv"].rank(method="average").corr(grp["bv"].rank(method="average"))
        assert abs(got.loc[seg, "spearman_rho"] - rho) <= 2e-6, seg


def test_cuped_theta_matches_pandas_replay(spark, sf_dir):
    """The adjusted mean equals the direct per-user CUPED adjustment
    recomputed in pandas with the same md5 arms and midpoint split."""
    import hashlib

    import numpy as np

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    got = (
        load_all()["ab_cuped_adjustment"].fn(spark, sf_dir).toPandas()
        .set_index("arm")
    )
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "value"
    ).toPandas()
    epoch = np.datetime64("1970-01-01T00:00:00")
    tsm = (ev["ts"].values.astype("datetime64[us]") - epoch).astype("int64")
    mid = (tsm.min() + tsm.max()) // 2
    dec = (ev["value"].round(4) * 10000).round().astype("int64")  # 1e-4 units
    df = ev.assign(tsm=tsm, u4=dec)
    pre = df[df.tsm < mid].groupby("user_id")["u4"].sum()
    post = df[df.tsm >= mid].groupby("user_id")["u4"].sum()
    users = sorted(set(df["user_id"]))
    # cents = 1e-4-units // 100 exactly (decimal *100 of a scale-4 sum)
    x = np.array([pre.get(u, 0) for u in users], dtype="int64") // 100
    y = np.array([post.get(u, 0) for u in users], dtype="int64") // 100
    arm = np.array(
        [
            int(hashlib.md5(f"arm:{u}".encode()).hexdigest()[:8], 16) % 2
            for u in users
        ]
    )
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    for a in (0, 1):
        adj = y[arm == a] - theta * (x[arm == a] - x.mean())
        assert abs(got.loc[a, "mean_adjusted"] - adj.mean() / 100.0) <= 5e-3
        assert got.loc[a, "n_users"] == int((arm == a).sum())


def test_isotonic_matches_sklearn_free_pav_replay(spark, sf_dir):
    """Classic pool-adjacent-violators on the same bins reproduces the
    minimax iso_rate to the 1e-12 floor-scaling slack."""
    from logflow.queries import load_all

    pdf = (
        load_all()["ml_isotonic_calibration"].fn(spark, sf_dir).toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    pools = [
        [float(r["pos"]), float(r["n"])] for _, r in pdf.iterrows()
    ]  # (sum, weight)
    merged: list[list[float]] = []
    for s, w in pools:
        merged.append([s, w])
        while len(merged) > 1 and (
            merged[-2][0] * merged[-1][1] >= merged[-1][0] * merged[-2][1]
        ):
            s2, w2 = merged.pop()
            merged[-1][0] += s2
            merged[-1][1] += w2
    # expand pool means back to bins
    vals = []
    i = 0
    for s, w in merged:
        mean = s / w
        total = 0.0
        while total < w - 1e-9:
            total += float(pdf.loc[i, "n"])
            vals.append(mean)
            i += 1
    assert len(vals) == len(pdf)
    for got_v, want_v in zip(pdf["iso_rate"], vals):
        assert abs(got_v - want_v) <= 1e-5


def test_lorenz_curve_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_lorenz_curve", sf_dir)


def test_lorenz_curve_is_convex_below_diagonal(spark, sf_dir):
    """Lorenz invariants: shares are nondecreasing, end at 1, and the
    curve never rises above the equality diagonal (spend sorted
    ascending => cum spend share <= cum customer share)."""
    from logflow.operators.cache import release_all
    from logflow.queries import load_all

    pdf = load_all()["diag_lorenz_curve"].fn(spark, sf_dir).toPandas()
    assert (pdf["cum_cust_share"].diff().dropna() >= 0).all()
    assert (pdf["cum_spend_share"].diff().dropna() >= 0).all()
    assert abs(pdf["cum_cust_share"].iloc[-1] - 1.0) < 1e-9
    assert abs(pdf["cum_spend_share"].iloc[-1] - 1.0) < 1e-9
    assert (pdf["cum_spend_share"] <= pdf["cum_cust_share"] + 1e-9).all()
    release_all()


def test_jackknife_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_jackknife_variance", sf_dir)


def test_jackknife_invariants(spark, sf_dir):
    """SE is nonnegative and the jackknife replicate mean sits close to
    the full-sample mean (delete-a-group bias is small for a mean)."""
    from logflow.queries import load_all

    row = load_all()["diag_jackknife_variance"].fn(spark, sf_dir).toPandas().iloc[0]
    assert row["n_groups"] >= 2
    assert row["jackknife_se"] >= 0
    assert abs(row["jack_mean_price"] - row["mean_price"]) < 0.05 * row["mean_price"]


def test_t_closeness_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "privacy_t_closeness", sf_dir)


def test_t_closeness_bounds(spark, sf_dir):
    """EMD-based t is in [0, 1] and sorted descending with key tiebreaks."""
    from logflow.queries import load_all

    pdf = load_all()["privacy_t_closeness"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["t_closeness"] >= 0).all() and (pdf["t_closeness"] <= 1).all()
    key = list(
        zip(-pdf["t_closeness"], pdf["c_nationkey"], pdf["c_mktsegment"])
    )
    assert key == sorted(key)


def test_ks_exact_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_ks_exact_value", sf_dir)


def test_ks_exact_bounds(spark, sf_dir):
    """KS in [0,1]; d_num bounded by n1*n2; scaled statistic consistent."""
    from logflow.queries import load_all

    row = load_all()["diag_ks_exact_value"].fn(spark, sf_dir).toPandas().iloc[0]
    assert 0.0 <= row["ks_stat"] <= 1.0
    assert 0 <= row["d_num"] <= row["n1"] * row["n2"]


def test_vif_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_vif", sf_dir)


def test_vif_bounds(spark, sf_dir):
    """VIF >= 1 by construction (R^2 in [0,1)); 3 feature rows."""
    from logflow.queries import load_all

    pdf = load_all()["diag_vif"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 3
    assert (pdf["vif"] >= 1.0 - 1e-9).all()
    assert ((pdf["r2_others"] >= -1e-9) & (pdf["r2_others"] < 1.0)).all()


def test_mahalanobis_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_mahalanobis_outliers", sf_dir)


def test_mahalanobis_monotone(spark, sf_dir):
    """Outlier counts shrink as the fence widens; shares consistent."""
    from logflow.queries import load_all

    pdf = load_all()["diag_mahalanobis_outliers"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 3
    assert (pdf["n_outliers"].diff().dropna() <= 0).all()
    assert (pdf["n_outliers"] <= pdf["n_rows"]).all()


def test_bh_fdr_stepup_shape(spark, sf_dir):
    """BH output is a valid step-up decision: ranks are the permutation
    1..m, |z| is nonincreasing in rank, and the rejected set is a PREFIX
    of the ranking (the defining property of step-up procedures)."""
    from logflow.queries import load_all

    from logflow.queries.diagnostics import _BH_MMAX
    from logflow.sources.tables import load_table

    pdf = (
        load_all()["ab_benjamini_hochberg"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("rank")
    )
    # Grid-coverage contract (r10 ADVICE): the inner join against the
    # (k, m <= _BH_MMAX) literal grid silently empties the result when
    # the metric family outgrows the grid — assert the current seed's
    # family fits AND that output is non-empty, so a regenerated corpus
    # with more event types fails loudly here instead of going green.
    m_family = (
        load_table(spark, "events", sf_dir).select("event_type").distinct().count()
    )
    assert m_family <= _BH_MMAX, (
        f"event_type family size {m_family} exceeds the BH literal grid "
        f"(_BH_MMAX={_BH_MMAX}); regenerate the grid with a larger bound"
    )
    assert len(pdf) > 0, (
        "ab_benjamini_hochberg returned an empty frame — the (k, m) grid "
        f"join matched nothing (m must be <= _BH_MMAX={_BH_MMAX})"
    )
    assert list(pdf["rank"]) == list(range(1, len(pdf) + 1))
    az = pdf["z"].abs().to_numpy()
    assert (az[:-1] >= az[1:] - 1e-12).all()
    rej = pdf["rejected"].to_numpy()
    assert set(rej) <= {0, 1}
    # prefix property: once a 0 appears, no 1 follows
    seen_zero = False
    for r in rej:
        if r == 0:
            seen_zero = True
        assert not (seen_zero and r == 1)


def test_permutation_test_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ab_permutation_test", sf_dir)


def test_permutation_test_definition(spark, sf_dir):
    """The add-one permutation p-value reproduces from n_extreme and R;
    bounds hold; and the observed diff matches a direct per-arm mean
    difference recomputed from the shared user frame."""
    from logflow.queries import load_all
    from logflow.queries.diagnostics import _PERM_R, _ab_user_frame

    r = load_all()["ab_permutation_test"].fn(spark, sf_dir).toPandas().iloc[0]
    assert 0 <= r.n_extreme <= _PERM_R
    assert abs(r.p_value - round((1 + r.n_extreme) / (_PERM_R + 1), 6)) < 1e-12
    u = _ab_user_frame(spark, sf_dir).toPandas()
    g = u.groupby("arm")["post"]
    want = round((g.mean()[1] - g.mean()[0]) / 100.0, 6)
    assert abs(r.diff_obs - want) < 1e-6
    assert r.n_treat == int((u["arm"] == 1).sum())


def test_kendall_tau_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_kendall_tau", sf_dir)


def test_kendall_tau_matches_scipy_free_reference(spark, sf_dir):
    """tau-b recomputes from a direct O(n²)-free pandas cross-tab
    reference (concordant/discordant via the same grid identity, plus
    the textbook tie corrections) — and the pair ledger balances:
    C + D + ties <= n_pairs with equality up to joint ties."""
    import numpy as np

    from logflow.queries import load_all
    from logflow.sources.tables import load_table
    from pyspark.sql import functions as F

    r = load_all()["diag_kendall_tau"].fn(spark, sf_dir).toPandas().iloc[0]
    pts = (
        load_table(spark, "lineitem", sf_dir)
        .select(
            F.col("l_quantity").cast("long").alias("x"),
            F.expr("CAST(floor(l_extendedprice) AS BIGINT) DIV 1000").alias("y"),
        )
        .toPandas()
    )
    n = len(pts)
    assert r.n == n and r.n_pairs == n * (n - 1) // 2
    grid = pts.groupby(["x", "y"]).size().unstack(fill_value=0).to_numpy()
    suffix = np.flip(np.flip(grid, 0), 1).cumsum(0).cumsum(1)
    suffix = np.flip(np.flip(suffix, 0), 1)  # inclusive 2D suffix sums
    gt = np.zeros_like(grid)
    gt[:-1, :-1] = suffix[1:, 1:]  # strictly greater in both coords
    conc = int((grid * gt).sum())
    pre = grid.cumsum(0)
    m = grid.sum(0)[None, :] - pre  # per (x, y'): points with x' > x at y'
    lt_y = np.zeros_like(grid)
    lt_y[:, 1:] = m.cumsum(1)[:, :-1]  # x' > x, y' < y
    disc = int((grid * lt_y).sum())
    assert r.concordant == conc and r.discordant == disc
    tx = grid.sum(1)
    ty = grid.sum(0)
    n1 = int((tx * (tx - 1) // 2).sum())
    n2 = int((ty * (ty - 1) // 2).sum())
    assert r.ties_x == n1 and r.ties_y == n2
    n0 = n * (n - 1) // 2
    want = (conc - disc) / np.sqrt(float(n0 - n1) * float(n0 - n2))
    assert abs(r.tau_b - round(want, 6)) < 1e-9
    assert -1.0 <= r.tau_b <= 1.0


def test_privacy_dp_noisy_histogram(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "privacy_dp_noisy_histogram", sf_dir)


def test_privacy_dp_noise_bounds(spark, sf_dir):
    """Noise is bounded by the clamped inverse-CDF table (|Z| <= 8) and
    the release is non-negative; buckets cover every (type, dow) with
    events."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["privacy_dp_noisy_histogram"].fn(spark, sf_dir).toPandas()
    true = (
        load_table(spark, "events", sf_dir)
        .select(
            "event_type",
            F.expr(
                "(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
                " DIV 86400000000) % 7"
            ).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .count()
        .toPandas()
    )
    assert len(pdf) == len(true)
    assert (pdf["noisy_cnt"] >= 0).all()
    merged = pdf.merge(true, on=["event_type", "dow"])
    assert ((merged["noisy_cnt"] - merged["count"]).abs() <= 8).all()


def test_diag_benford_law(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "diag_benford_law", sf_dir)


def test_diag_benford_law_semantics(spark, sf_dir):
    """Digit counts sum to the order count, all nine digits emit, and
    expectations are the Benford ppm literals."""
    import math

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["diag_benford_law"].fn(spark, sf_dir).toPandas()
    assert list(pdf["digit"]) == list(range(1, 10))
    n_orders = load_table(spark, "orders", sf_dir).count()
    assert pdf["n_obs"].sum() == n_orders
    assert (pdf["n_total"] == n_orders).all()
    for r in pdf.itertuples():
        assert r.expected_ppm == int(round(math.log10(1 + 1 / r.digit) * 1e6))
        assert r.chi2_term >= 0
