"""Oracle parity + invariants for the time-series operators."""

from __future__ import annotations


def test_gap_fill_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_gap_fill_forward", sf_dir)


def test_gap_fill_dense_and_filled(spark, sf_dir):
    """The output grid is DENSE per user (consecutive hours, no holes),
    filled_value is never NULL, and gap rows carry the last observation."""
    import pandas as pd

    from logflow.queries import load_all

    pdf = (
        load_all()["ts_gap_fill_forward"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "hr"])
    )
    assert pdf["filled_value"].notna().all()
    assert (pdf["is_gap"] == pdf["hourly_value"].isna()).all()
    for _, g in pdf.groupby("user_id"):
        hrs = pd.to_datetime(g["hr"]).reset_index(drop=True)
        assert (hrs.diff().dropna() == pd.Timedelta(hours=1)).all(), "grid has holes"
        # forward fill semantics: on gap rows the filled value equals the
        # previous row's filled value
        fv = g["filled_value"].reset_index(drop=True)
        gap = g["is_gap"].reset_index(drop=True)
        for i in range(1, len(g)):
            if gap[i]:
                assert fv[i] == fv[i - 1]


def test_max_concurrency_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_max_concurrency_daily", sf_dir)


def test_max_concurrency_bounds(spark, sf_dir):
    """Peak concurrency is at least 1 on any day with spans and never
    exceeds the day's span count; the two-phase (hour-base + local run)
    decomposition must equal the single-window semantics the oracle uses."""
    from logflow.queries import load_all

    pdf = load_all()["ts_max_concurrency_daily"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["max_concurrent"] >= 1).all()
    assert (pdf["max_concurrent"] <= pdf["n_spans"]).all()


def test_markov_transitions_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_markov_transitions", sf_dir)


def test_markov_rows_are_stochastic(spark, sf_dir):
    """Outgoing probabilities per src sum to ~1 (rounding tolerance)."""
    from logflow.queries import load_all

    pdf = load_all()["ts_markov_transitions"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    sums = pdf.groupby("src")["p_transition"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()


def test_ohlc_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_downsample_ohlc", sf_dir)


def test_ohlc_invariants(spark, sf_dir):
    """low <= open,close <= high per bucket, and bucket counts sum to the
    full event count (a rollup drops nothing)."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ts_downsample_ohlc"].fn(spark, sf_dir).toPandas()
    assert (pdf["low"] <= pdf[["open", "close"]].min(axis=1)).all()
    assert (pdf["high"] >= pdf[["open", "close"]].max(axis=1)).all()
    assert int(pdf["n"].sum()) == load_table(spark, "events", sf_dir).count()


def test_time_weighted_avg_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_time_weighted_avg", sf_dir)


def test_time_weighted_avg_invariants(spark, sf_dir):
    """Each (user, day)'s held time never exceeds a day, the final
    observation holds to end-of-day (so held time is positive), and twa
    lies within the day's [min, max] observed value."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ts_time_weighted_avg"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    day_us = 86_400_000_000
    assert (pdf["held_micros"] > 0).all()
    assert (pdf["held_micros"] <= day_us).all()
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") % 20 == 0)
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .toPandas()
    )
    m = pdf.merge(ev, on=["user_id", "day"])
    assert len(m) == len(pdf)
    assert ((m["twa"] >= m["lo"] - 1e-4) & (m["twa"] <= m["hi"] + 1e-4)).all()


def test_path_trigrams_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "path_common_trigrams", sf_dir)


def test_path_trigrams_shape(spark, sf_dir):
    from logflow.queries import load_all

    pdf = load_all()["path_common_trigrams"].fn(spark, sf_dir).toPandas()
    assert 0 < len(pdf) <= 20
    assert (pdf["n"] >= pdf["n_users"]).all()  # a user can repeat a path
    assert pdf["trigram"].str.count(">").eq(2).all()
    # sorted by count desc with lexicographic tiebreak
    assert (pdf["n"].diff().dropna() <= 0).all()


def test_cusum_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_cusum_changepoint", sf_dir)


def test_cusum_invariants(spark, sf_dir):
    """max|CUSUM| >= 0 always; with no injected mean shift the flag count
    stays a small fraction of days (the chart is near a random walk whose
    excursions past 2-sigma-of-daily-means are possible but not the
    norm) — bound loosely per the seed-coupled-assertion rule."""
    from logflow.queries import load_all

    pdf = load_all()["ts_cusum_changepoint"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["max_abs_cusum"] >= 0).all()
    assert (pdf["n_flagged"] <= pdf["n_days"]).all()


def test_ewma_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_ewma_daily", sf_dir)


def test_ewma_matches_sequential_recurrence(spark, sf_dir):
    """The window-collect + fold equals the textbook per-user sequential
    recurrence s' = (s + x)/2 restarted on a 10-day frame, recomputed in
    plain Python — and is exactly the raw double (no rounding layer)."""
    from logflow.queries import load_all

    pdf = (
        load_all()["ts_ewma_daily"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "day"])
    )
    assert len(pdf) > 0
    for _, g in pdf.groupby("user_id"):
        vs = g["v"].tolist()
        got = g["ewma"].tolist()
        for i in range(len(vs)):
            frame = vs[max(0, i - 9) : i + 1]
            acc = frame[0]
            for x in frame[1:]:
                acc = (acc + x) / 2
            assert got[i] == acc, "fold diverges from sequential recurrence"


def test_rolling_median_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_rolling_median7", sf_dir)


def test_rolling_median_matches_pandas_selection(spark, sf_dir):
    """med7 equals the LOWER median (pure selection, element at
    floor((n+1)/2) of the sorted 7-day frame) recomputed in pandas."""
    from logflow.queries import load_all

    pdf = (
        load_all()["ts_rolling_median7"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["event_type", "day"])
    )
    assert len(pdf) > 0
    for _, g in pdf.groupby("event_type"):
        revs = list(g["rev"])
        for i, med in enumerate(g["med7"]):
            frame = sorted(revs[max(0, i - 6) : i + 1])
            expect = round(frame[(len(frame) + 1) // 2 - 1], 2)
            assert med == expect, (i, med, expect)


def test_autocorrelation_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_autocorrelation", sf_dir)


def test_autocorrelation_bounds(spark, sf_dir):
    """ACF is a true correlation: |r| <= 1 for every (event_type, lag),
    and every lag 1..3 is present for every event type."""
    from logflow.queries import load_all

    pdf = load_all()["ts_autocorrelation"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert pdf["acf"].dropna().abs().le(1.0 + 1e-9).all()
    per_type = pdf.groupby("event_type")["lag_days"].apply(sorted)
    assert all(list(v) == [1, 2, 3] for v in per_type)


def test_seasonal_decompose_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_seasonal_decompose", sf_dir)


def test_seasonal_decompose_reconstructs(spark, sf_dir):
    """Additivity: value == trend + seasonal + residual within the
    rounding budget, and each event type's seasonal component sums to
    ~0 over its rows (mean-centered by construction)."""
    from logflow.queries import load_all

    pdf = load_all()["ts_seasonal_decompose"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    err = (pdf["value"] - (pdf["trend"] + pdf["seasonal"] + pdf["residual"])).abs()
    assert (err < 2e-4 + 1e-9).all()
    # seasonal is the per-(type, ISO dow) mean of (value - trend): recompute
    pdf = pdf.assign(
        dow=pdf["day"].dt.dayofweek + 1, detr=(pdf["value"] - pdf["trend"]).round(4)
    )
    for (_, _), g in pdf.groupby(["event_type", "dow"]):
        assert abs(g["seasonal"].iloc[0] - g["detr"].mean()) < 1e-3
        assert g["seasonal"].nunique() == 1


def test_holt_linear_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_holt_linear", sf_dir)


def test_holt_matches_python_recurrence(spark, sf_dir):
    """Brown's double smoothing recomputed row-by-row in Python over each
    user's 10-day frame must match exactly (same fold order, same IEEE
    ops — no tolerance needed)."""
    from logflow.queries import load_all

    pdf = (
        load_all()["ts_holt_linear"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "day"])
    )
    assert len(pdf) > 0

    def ewma(seq):
        acc = seq[0]
        for x in seq[1:]:
            acc = (acc + x) / 2
        return acc

    for _, g in pdf.groupby("user_id"):
        vs = list(g["v"])
        for i, row in enumerate(g.itertuples()):
            frame = vs[max(0, i - 9) : i + 1]
            s1s = [ewma(frame[: j + 1]) for j in range(len(frame))]
            s1, s2 = s1s[-1], ewma(s1s)
            assert row.level == 2 * s1 - s2
            assert row.trend == s1 - s2
            assert row.forecast_next == 3 * s1 - 2 * s2


def test_seasonal_anomaly_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_seasonal_anomaly", sf_dir)


def test_purchase_latency_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_purchase_latency", sf_dir)


def test_purchase_latency_order(spark, sf_dir):
    from logflow.queries import load_all

    r = load_all()["ts_purchase_latency"].fn(spark, sf_dir).toPandas().iloc[0]
    assert r.min_us <= r.p50_us <= r.p90_us <= r.max_us
    assert r.n_gaps > 0 and r.min_us >= 0


def test_seasonal_anomaly_flags_exceed_threshold(spark, sf_dir):
    """Every flagged day genuinely exceeds 3.5 MAD units from the median
    residual (recomputed via the same discrete-median selection)."""
    import pytest

    from logflow.queries import load_all

    pdf = load_all()["ts_seasonal_anomaly"].fn(spark, sf_dir).toPandas()
    if len(pdf) == 0:
        pytest.skip("no residual exceeded 3.5 MAD at this SF/seed")
    assert (pdf["mad"] >= 0).all()


def test_gap_fill_linear_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_gap_fill_linear", sf_dir)


def test_gap_fill_linear_between_brackets(spark, sf_dir):
    """Interpolated gap values lie strictly between (or equal to) their
    bracketing observations, and observed rows pass through unchanged."""
    from logflow.queries import load_all

    pdf = (
        load_all()["ts_gap_fill_linear"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "hr"])
    )
    assert (pdf.loc[~pdf["is_gap"], "filled_value"] == pdf.loc[~pdf["is_gap"], "hv"]).all()
    for _, g in pdf.groupby("user_id"):
        g = g.reset_index(drop=True)
        obs_idx = list(g.index[~g["is_gap"]])
        for a, b in zip(obs_idx, obs_idx[1:]):
            lo = min(g["hv"][a], g["hv"][b])
            hi = max(g["hv"][a], g["hv"][b])
            mid = g["filled_value"][a + 1 : b]
            assert ((mid >= lo - 1e-9) & (mid <= hi + 1e-9)).all()


def test_kaplan_meier_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_kaplan_meier", sf_dir)


def test_kaplan_meier_matches_textbook_replay(spark, sf_dir):
    """Pure-pandas KM replay (risk sets, censoring, running product in
    exact Fractions then float) matches every row; survival is monotone
    non-increasing from 1."""
    from fractions import Fraction

    import math

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = (
        load_all()["ts_kaplan_meier"].fn(spark, sf_dir).toPandas()
        .sort_values("duration_days").reset_index(drop=True)
    )
    ev = load_table(spark, "events", sf_dir).selectExpr(
        "user_id", "ts"
    ).toPandas()
    g = ev.groupby("user_id")["ts"].agg(["min", "max"]).reset_index()
    study_end = g["max"].max()
    import pandas as pd

    g["t"] = (g["max"].dt.normalize() - g["min"].dt.normalize()).dt.days
    g["observed"] = (g["max"] <= study_end - pd.Timedelta(days=7)).astype(int)
    total = len(g)
    rows = []
    removed = 0
    for t in sorted(g["t"].unique()):
        sub = g[g["t"] == t]
        d = int(sub["observed"].sum())
        c = len(sub) - d
        n_at_risk = total - removed
        rows.append((t, n_at_risk, d, c))
        removed += len(sub)
    assert [
        (r.duration_days, r.n_at_risk, r.n_events, r.n_censored)
        for r in pdf.itertuples()
    ] == rows
    # survival via the same ln-recipe the engines use (round each factor's
    # ln once at 6dp, exact decimal sum, one exp)
    lsum = Fraction(0)
    for (t, n, d, c), r in zip(rows, pdf.itertuples()):
        if 0 < d < n:
            lsum += Fraction(round(math.log((n - d) / n), 6)).limit_denominator(10**9)
        if d >= n:
            assert r.survival == 0.0
        else:
            assert abs(r.survival - round(math.exp(float(lsum)), 6)) < 2e-6
    surv = pdf["survival"]
    assert (surv.diff().dropna() <= 1e-12).all()
    assert surv.iloc[0] <= 1.0


def test_ltob_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_ltob_downsample", sf_dir)


def test_ltob_selected_points_exist_and_buckets_unique(spark, sf_dir):
    """Every selected point is a real observation of its series (ts+value
    round-trip), endpoints are always kept, and each interior bucket
    yields exactly one point."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.queries.timeseries import _LTOB_BUCKETS
    from logflow.sources.tables import load_table

    pdf = load_all()["ts_ltob_downsample"].fn(spark, sf_dir).toPandas()
    ev = (
        load_table(spark, "events", sf_dir)
        .select("event_type", "ts", F.round("value", 4).alias("val"))
        .toPandas()
    )
    have = set(map(tuple, ev[["event_type", "ts", "val"]].itertuples(index=False)))
    assert all(
        (r.event_type, r.ts, r.val) in have for r in pdf.itertuples()
    ), "downsample invented a point"
    for et, g in pdf.groupby("event_type"):
        assert (g["bucket"] == -1).sum() == 1, f"{et}: first endpoint missing"
        assert (g["bucket"] == _LTOB_BUCKETS).sum() == 1, f"{et}: last endpoint missing"
        interior = g[(g["bucket"] >= 0) & (g["bucket"] < _LTOB_BUCKETS)]
        assert interior["bucket"].is_unique, f"{et}: bucket picked twice"


def test_rate_limit_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_rate_limit_audit", sf_dir)


def test_rate_limit_burst_bounds(spark, sf_dir):
    """max_burst is at least 1 (every event sees itself in its window)
    and never exceeds the user's total events; violations only exist
    where max_burst exceeds the limit."""
    from logflow.queries import load_all
    from logflow.queries.timeseries import _RATE_K

    pdf = load_all()["ts_rate_limit_audit"].fn(spark, sf_dir).toPandas()
    assert (pdf["max_burst"] >= 1).all()
    assert (pdf["max_burst"] <= pdf["n_events"]).all()
    has_viol = pdf["n_violations"] > 0
    assert (pdf.loc[has_viol, "max_burst"] > _RATE_K).all()
    assert (pdf.loc[~has_viol, "max_burst"] <= _RATE_K).all()


def test_cross_correlation_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_cross_correlation", sf_dir)


def test_cross_correlation_bounds(spark, sf_dir):
    """CCF values lie in [-1, 1]; lag-0 pairs cover every day; pair counts
    shrink (weakly) as the lag grows."""
    from logflow.queries import load_all

    pdf = load_all()["ts_cross_correlation"].fn(spark, sf_dir).toPandas().sort_values("lag_days")
    assert pdf.ccf.dropna().between(-1.0, 1.0).all()
    assert (pdf.n.diff().dropna() <= 0).all()


def test_mann_kendall_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_mann_kendall", sf_dir)


def test_mann_kendall_bounds(spark, sf_dir):
    """|S| <= n(n-1)/2, var18 = 18*Var is positive for n >= 2, and the
    z statistic recomputes from the emitted integers."""
    import math

    from logflow.queries import load_all

    pdf = load_all()["ts_mann_kendall"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for _, r in pdf.iterrows():
        assert abs(r.s_stat) <= r.n_days * (r.n_days - 1) // 2
        assert r.var18 > 0
        sd = math.sqrt(r.var18 / 18.0)
        want = (r.s_stat - 1) / sd if r.s_stat > 0 else (r.s_stat + 1) / sd if r.s_stat < 0 else 0.0
        assert r.z_mk == round(want, 6)


def test_interval_coverage_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_interval_coverage", sf_dir)


def test_interval_coverage_laws(spark, sf_dir):
    """covered <= span; islands <= events; every user's coverage ratio
    recomputes; a single-event user covers exactly the interval length."""
    from logflow.queries import load_all
    from logflow.queries.timeseries import _IVC_DUR_US

    pdf = load_all()["ts_interval_coverage"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for _, r in pdf.iterrows():
        assert r.n_islands <= r.n_events
        assert _IVC_DUR_US <= r.covered_us <= r.span_us
        assert r.coverage == round(r.covered_us / r.span_us, 4)
        if r.n_events == 1:
            assert r.covered_us == r.span_us == _IVC_DUR_US


def test_segmented_trend_split_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_segmented_trend_split", sf_dir)


def test_segmented_split_never_worse_than_single(spark, sf_dir):
    """Two segments can always fit at least as well as one line: sse_split
    <= sse_single (up to the reporting rounding), so gain >= 0."""
    from logflow.queries import load_all

    pdf = load_all()["ts_segmented_trend_split"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf.sse_split <= pdf.sse_single + 0.01).all()
    assert (pdf.gain >= -1e-4).all()


def test_slo_burn_rate_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_slo_burn_rate", sf_dir)


def test_slo_burn_rate_identities(spark, sf_dir):
    """Window sums dominate the hour's own counts, burn rates recompute
    from the emitted counts, and severity follows the thresholds."""
    from logflow.queries import load_all

    pdf = load_all()["ts_slo_burn_rate"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["t6"] >= pdf["t1"]).all() and (pdf["e6"] >= pdf["e1"]).all()
    b1 = (pdf["e1"] / pdf["t1"]) / 0.05
    b6 = (pdf["e6"] / pdf["t6"]) / 0.05
    assert ((pdf["burn_1h"] - b1.round(4)).abs() < 1e-9).all()
    assert ((pdf["burn_6h"] - b6.round(4)).abs() < 1e-9).all()
    for r, bb1, bb6 in zip(pdf["severity"], b1, b6):
        want = "page" if (bb1 >= 14.4 and bb6 >= 6.0) else ("ticket" if bb6 >= 6.0 else "ok")
        assert r == want


def test_ar1_forecast_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_ar1_forecast", sf_dir)


def test_ar1_phi_bounded_and_forecast_finite(spark, sf_dir):
    """|phi| stays in a sane band for a stationary daily series and the
    one-step forecast is finite wherever phi is defined."""
    from logflow.queries import load_all

    pdf = load_all()["ts_ar1_forecast"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    defined = pdf[pdf["phi"].notna()]
    assert (defined["phi"].abs() <= 1.5).all()
    assert defined["forecast_next"].notna().all()


def test_sax_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_sax_symbolic", sf_dir)


def test_sax_words_shape(spark, sf_dir):
    """Every SAX word is 4 chars over the alphabet a-d plus sentinels,
    and counts are positive."""
    import re

    from logflow.queries import load_all

    pdf = load_all()["ts_sax_symbolic"].fn(spark, sf_dir).toPandas()
    assert 0 < len(pdf) <= 20
    assert pdf["word"].str.match(r"^[abcdx_]{4}$").all()
    assert (pdf["n_days"] > 0).all()


def test_nelson_aalen_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_nelson_aalen", sf_dir)


def test_nelson_aalen_vs_kaplan_meier(spark, sf_dir):
    """Cumulative hazard is non-decreasing, Breslow survival is
    non-increasing and bounds Kaplan-Meier from ABOVE at every duration
    (exp(-d/n) >= 1 - d/n factor-wise)."""
    from logflow.queries import load_all

    na = (
        load_all()["ts_nelson_aalen"].fn(spark, sf_dir).toPandas()
        .sort_values("duration_days")
    )
    h = list(na["cum_hazard"])
    assert all(a <= b + 1e-9 for a, b in zip(h, h[1:]))
    s = list(na["breslow_survival"])
    assert all(a >= b - 1e-9 for a, b in zip(s, s[1:]))
    km = (
        load_all()["ts_kaplan_meier"].fn(spark, sf_dir).toPandas()
        .sort_values("duration_days")
    )
    j = na.merge(km, on="duration_days", suffixes=("_na", "_km"))
    assert (j["breslow_survival"] >= j["survival"] - 1e-6).all()


def test_peak_detection_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_peak_detection", sf_dir)


def test_peaks_are_local_maxima(spark, sf_dir):
    """Every reported peak strictly exceeds both observed neighbors in
    the full daily series, independently recomputed in pandas."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ts_peak_detection"].fn(spark, sf_dir).toPandas()
    daily = (
        load_table(spark, "events", sf_dir)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .count()
        .toPandas()
    )
    for _, row in pdf.iterrows():
        series = (
            daily[daily["event_type"] == row["event_type"]]
            .sort_values("day")
            .reset_index(drop=True)
        )
        i = series.index[series["day"] == row["day"]][0]
        assert 0 < i < len(series) - 1
        assert series.loc[i, "count"] > series.loc[i - 1, "count"]
        assert series.loc[i, "count"] > series.loc[i + 1, "count"]


def test_cumulative_reach_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_cumulative_reach", sf_dir)


def test_cumulative_reach_invariants(spark, sf_dir):
    """Reach is non-decreasing, ends at the distinct-user total, and DAU
    never exceeds cumulative reach."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = (
        load_all()["ts_cumulative_reach"].fn(spark, sf_dir).toPandas()
        .sort_values("day")
    )
    reach = list(pdf["cumulative_reach"])
    assert all(a <= b for a, b in zip(reach, reach[1:]))
    total = load_table(spark, "events", sf_dir).select("user_id").distinct().count()
    assert reach[-1] == total
    assert (pdf["dau"] <= pdf["cumulative_reach"]).all()


def test_croston_forecast_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_croston_forecast", sf_dir)


def test_croston_matches_python_fold(spark, sf_dir):
    """Replay Croston for every reported user with a pure-Python alpha=1/2
    fold over the same daily demand series; EWMAs and forecasts must be
    bit-identical (the raw-double hash-match contract)."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    got = (
        load_all()["ts_croston_forecast"].fn(spark, sf_dir).toPandas()
        .set_index("user_id")
    )
    daily = (
        load_table(spark, "events", sf_dir)
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") % 7 == 0))
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(12,4)")), 2)
            .cast("double")
            .alias("q")
        )
        .toPandas()
    )
    assert len(got) > 0
    for uid, grp in daily.groupby("user_id"):
        grp = grp.sort_values("day").reset_index(drop=True)
        if len(grp) < 3:
            assert uid not in got.index
            continue
        z = grp["q"].iloc[0]
        for x in grp["q"].iloc[1:]:
            z = (z + x) / 2
        gaps = [float((b - a).days) for a, b in zip(grp["day"], grp["day"].iloc[1:])]
        p = gaps[0]
        for x in gaps[1:]:
            p = (p + x) / 2
        row = got.loc[uid]
        assert row["n_demand_days"] == len(grp)
        assert row["size_ewma"] == z
        assert row["interval_ewma"] == p
        assert row["croston_forecast"] == z / p
        assert row["sba_forecast"] == z / p * 0.75


def test_forecast_accuracy_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_forecast_accuracy", sf_dir)


def test_forecast_accuracy_invariants(spark, sf_dir):
    """Naive rows are the MASE unit (mase == 1.0 exactly — same double
    divided by itself); RMSE >= MAE (Jensen); MAPE >= 0; both methods
    reported for every event type."""
    from logflow.queries import load_all

    pdf = load_all()["ts_forecast_accuracy"].fn(spark, sf_dir).toPandas()
    naive = pdf[pdf["method"] == "naive"]
    assert (naive["mase"] == 1.0).all()
    assert (pdf["rmse_cents"] >= pdf["mae_cents"] - 1e-9).all()
    assert (pdf["mape"] >= 0).all()
    assert set(pdf.groupby("event_type")["method"].count()) == {2}


def test_allen_relations_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_allen_interval_relations", sf_dir)


def test_allen_ladder_is_exhaustive_and_exclusive(spark):
    """Every endpoint configuration of two proper intervals must land in
    exactly one relation, and inverses must mirror: classify a synthetic
    grid of all (cs,ce)x(vs,ve) proper intervals over 5 points, check no
    NULLs and that swapping the roles maps each relation to its
    inverse."""
    from pyspark.sql import functions as F

    from logflow.queries.timeseries import _ALLEN_CASE

    pts = range(5)
    rows = [
        (float(cs), float(ce), float(vs), float(ve))
        for cs in pts for ce in pts for vs in pts for ve in pts
        if cs < ce and vs < ve
    ]
    df = spark.createDataFrame(rows, "cs double, ce double, vs double, ve double")
    got = df.select(
        "cs", "ce", "vs", "ve", F.expr(_ALLEN_CASE).alias("rel")
    ).toPandas()
    assert got["rel"].notna().all()
    inv = {
        "precedes": "preceded_by", "meets": "met_by", "overlaps": "overlapped_by",
        "finished_by": "finishes", "contains": "during", "starts": "started_by",
        "equals": "equals", "started_by": "starts", "during": "contains",
        "finishes": "finished_by", "overlapped_by": "overlaps",
        "met_by": "meets", "preceded_by": "precedes",
    }
    key = got.set_index(["cs", "ce", "vs", "ve"])["rel"]
    for (cs, ce, vs, ve), rel in key.items():
        assert key[(vs, ve, cs, ce)] == inv[rel]


def test_allen_counts_cover_all_qualifying_pairs(spark, sf_dir):
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ts_allen_interval_relations"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 13
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("click", "view")
    )
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("cs"),
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias("ce"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("vs"),
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).alias("ve"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("nv"),
    )
    n = s.filter(
        (F.col("nc") >= 2) & (F.col("nv") >= 2)
        & (F.col("cs") < F.col("ce")) & (F.col("vs") < F.col("ve"))
    ).count()
    assert pdf["n_pairs"].sum() == n


def test_logrank_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_logrank_test", sf_dir)


def test_logrank_invariants(spark, sf_dir):
    """O1 <= total events, E1 > 0 when any events exist, chi2 >= 0, and
    the two arm sizes partition the user population."""
    from logflow.queries import load_all

    pdf = load_all()["ts_logrank_test"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 1
    row = pdf.iloc[0]
    assert row["n_users0"] > 0 and row["n_users1"] > 0
    assert row["o1"] >= 0 and row["v1"] >= 0
    if row["v1"] > 0:
        assert row["logrank_chi2"] >= 0


def test_pacf_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_pacf", sf_dir)


def test_pacf_lag1_equals_acf1(spark, sf_dir):
    """pacf1 IS the lag-1 autocorrelation (Durbin-Levinson base case)."""
    from logflow.queries import load_all

    reg = load_all()
    pacf = reg["ts_pacf"].fn(spark, sf_dir).toPandas().set_index("event_type")
    acf = reg["ts_autocorrelation"].fn(spark, sf_dir).toPandas()
    acf1 = acf[acf["lag_days"] == 1].set_index("event_type")["acf"]
    for et, r1 in acf1.items():
        assert abs(pacf.loc[et, "pacf1"] - r1) < 1e-9


def test_holt_winters_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_holt_winters", sf_dir)


def test_holt_winters_weights_are_a_valid_linear_model():
    """The unrolled weight vectors must satisfy the exact linear
    identities of the recursion: level weights sum to 1 (a constant
    series y=c yields level c), trend weights sum to 0, and the
    one-step forecast weights sum to 1 (constant series forecasts
    itself)."""
    from logflow.queries.timeseries import _hw_weight_vectors

    w = _hw_weight_vectors()
    assert abs(sum(w["level"]) - 1.0) < 1e-12
    assert abs(sum(w["trend"])) < 1e-12
    assert abs(sum(w["f1"]) - 1.0) < 1e-12
    assert abs(sum(w["f7"]) - 1.0) < 1e-12


def test_holt_winters_rows_shape(spark, sf_dir):
    """Every emitted series saw >= 28 days and forecasts are finite."""
    import numpy as np

    from logflow.queries import load_all

    pdf = load_all()["ts_holt_winters"].fn(spark, sf_dir).toPandas()
    if len(pdf) == 0:
        import pytest

        pytest.skip("no event type spans 28 observed days at this SF/seed")
    assert (pdf["n_days"] >= 28).all()
    for c in ("level", "trend", "forecast_1d", "forecast_7d"):
        assert np.isfinite(pdf[c]).all()


def test_dtw_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_dtw_dayofweek", sf_dir)


def test_dtw_metric_properties(spark, sf_dir):
    """Band-DTW sanity: all C(|T|,2) pairs present; dtw_ppm >= the
    band-free lower bound 0, equals 0 only for identical profiles; and
    the value never exceeds the no-warp (diagonal) cost recomputed from
    the profiles."""
    from logflow.queries import load_all
    from logflow.queries.timeseries import _DTW_N
    from logflow.sources.tables import load_table
    from pyspark.sql import functions as F

    pdf = load_all()["ts_dtw_dayofweek"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["dtw_ppm"] >= 0).all()
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.expr(
            "(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
            " DIV 86400000000) % 7"
        ).alias("dow"),
        F.expr(
            "CAST(CAST(ROUND(value, 4) AS DECIMAL(14,4)) * 10000 AS BIGINT)"
        ).alias("cents"),
    )
    prof = (
        ev.groupBy("event_type")
        .agg(
            *[
                F.coalesce(F.sum(F.when(F.col("dow") == d, F.col("cents"))), F.lit(0))
                .cast("long")
                .alias(f"s{d}")
                for d in range(_DTW_N)
            ]
        )
        .toPandas()
        .set_index("event_type")
    )
    n_types = len(prof)
    assert len(pdf) == n_types * (n_types - 1) // 2
    for r in pdf.itertuples():
        sa = prof.loc[r.type_a]
        sb = prof.loc[r.type_b]
        ta, tb = int(sa.sum()), int(sb.sum())
        pa = [int(sa[f"s{d}"]) * 1_000_000 // ta for d in range(_DTW_N)]
        pb = [int(sb[f"s{d}"]) * 1_000_000 // tb for d in range(_DTW_N)]
        diag = sum(abs(a - b) for a, b in zip(pa, pb))
        assert r.dtw_ppm <= diag, "DTW exceeds the no-warp alignment cost"
        if pa == pb:
            assert r.dtw_ppm == 0


def test_theta_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_theta_forecast", sf_dir)


def test_theta_matches_direct_recursion(spark, sf_dir):
    """The inlined weight vectors must reproduce the textbook theta
    method run directly (OLS fit, theta=2 line, SES recursion) on each
    type's last 14 daily cent totals."""
    import numpy as np

    from logflow.queries import load_all
    from logflow.queries.timeseries import _TH_ALPHA, _TH_N
    from logflow.sources.tables import load_table
    from pyspark.sql import functions as F

    pdf = load_all()["ts_theta_forecast"].fn(spark, sf_dir).toPandas()
    if len(pdf) == 0:
        import pytest

        pytest.skip(f"no event type spans {_TH_N} days at this SF/seed")
    daily = (
        load_table(spark, "events", sf_dir)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.round(
                F.round(
                    F.sum(F.round(F.col("value"), 4).cast("decimal(14,4)")), 2
                ).cast("double")
                * 100,
                0,
            )
            .cast("long")
            .alias("cents")
        )
        .toPandas()
    )
    for r in pdf.itertuples():
        g = daily[daily.event_type == r.event_type].sort_values("day")
        ys = g["cents"].to_numpy()[-_TH_N:].astype(float)
        t = np.arange(_TH_N, dtype=float)
        b = ((t - t.mean()) * ys).sum() / ((t - t.mean()) ** 2).sum()
        a = ys.mean() - b * t.mean()
        z = 2.0 * ys - (a + b * t)
        s = z[0]
        for i in range(1, _TH_N):
            s = _TH_ALPHA * z[i] + (1 - _TH_ALPHA) * s
        for h, col in ((1, r.forecast_1d), (7, r.forecast_7d)):
            want = (0.5 * (a + b * (_TH_N - 1 + h)) + 0.5 * s) / 100.0
            assert abs(col - want) < 1e-3, (r.event_type, h, col, want)
        assert abs(r.slope - b / 100.0) < 1e-3


def test_ts_weighted_interval_sched(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_weighted_interval_sched", sf_dir)


def test_ts_weighted_interval_sched_bounds(spark, sf_dir):
    """DP bounds: per user, best is at least the heaviest single job and
    at most the sum of all job weights; a greedy chain (earliest-end
    first) is a feasible schedule, so best >= greedy too."""
    import pandas as pd
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ts_weighted_interval_sched"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    jobs = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
            ).alias("s"),
            F.expr("CAST(ROUND(value * 60) AS BIGINT)").alias("d"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("w"),
        )
        .filter((F.col("w") >= 1) & (F.col("d") >= 1))
        .toPandas()
    )
    jobs["e"] = jobs["s"] + jobs["d"] * 1000000
    got = pdf.set_index("user_id")
    for uid, g in jobs.groupby("user_id"):
        row = got.loc[uid]
        assert row["n_jobs"] == len(g)
        assert row["best_cents"] <= g["w"].sum()
        assert row["best_cents"] >= g["w"].max()
        greedy, t = 0, -(1 << 62)
        for r in g.sort_values(["e", "s"]).itertuples():
            if r.s >= t:
                greedy += r.w
                t = r.e
        assert row["best_cents"] >= greedy, (uid, row["best_cents"], greedy)


def test_ts_sax_motifs(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_sax_motifs", sf_dir)


def test_ts_sax_motifs_shape(spark, sf_dir):
    """Words are 3 chars over a-d, at most top-3 per type, counts
    positive and non-increasing within a type."""
    from logflow.queries import load_all

    pdf = load_all()["ts_sax_motifs"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert pdf["word"].str.fullmatch("[a-d]{3}").all()
    for _, g in pdf.groupby("event_type"):
        g = g.sort_values("pos")
        assert list(g["pos"]) == list(range(1, len(g) + 1))
        assert len(g) <= 3
        assert (g["n_occurrences"] > 0).all()
        assert g["n_occurrences"].is_monotonic_decreasing


def test_ts_periodogram_weekly(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ts_periodogram_weekly", sf_dir)


def test_ts_periodogram_numpy_recompute(spark, sf_dir):
    """The reported powers match a numpy DFT over the same last-28-day
    count series (weights identical by construction; sums associatively
    reordered by numpy, so compare to 1e-3 of the rounded value)."""
    import numpy as np

    from logflow.queries import load_all
    from logflow.queries.timeseries import _PG_N
    from logflow.sources.tables import load_table
    from pyspark.sql import functions as F

    pdf = load_all()["ts_periodogram_weekly"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    daily = (
        load_table(spark, "events", sf_dir)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .toPandas()
    )
    for r in pdf.itertuples():
        g = daily[daily.event_type == r.event_type].sort_values("day")
        ys = g["count"].to_numpy()[-_PG_N:].astype(float)
        d = np.arange(_PG_N)
        cs = (ys * np.cos(2 * np.pi * d / r.period)).sum()
        sn = (ys * np.sin(2 * np.pi * d / r.period)).sum()
        want = cs * cs + sn * sn
        assert abs(r.power - want) < max(1e-3, abs(want) * 1e-9), (
            r.event_type, r.period, r.power, want,
        )
