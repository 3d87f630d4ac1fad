"""Oracle parity + invariants for the pattern-mining/evaluation operators
(logflow/queries/mining.py)."""

from __future__ import annotations

import pytest

MINING_QUERIES = [
    "assoc_rules_copurchase",
    "streak_longest_daily",
    "skyline_pareto_parts",
    "auc_label_separability",
    "pmi_collocations",
    "seq_regex_funnel",
    "segment_overlap_jaccard",
    "seq_run_length_encode",
    "assoc_rules_triples",
    "rfm_quintile_segments",
    "cluster_dbscan_grid",
    "seq_prefixspan",
]


@pytest.mark.parametrize("name", MINING_QUERIES)
def test_mining_parity(spark, duck, sf_dir, name):
    from tests.oracle import check_query

    check_query(spark, duck, name, sf_dir)


def test_assoc_rules_metric_identities(spark, sf_dir):
    """support/confidence/lift satisfy their definitional identities and
    bounds on every emitted rule (pair counts can never exceed either
    item count — Apriori monotonicity)."""
    from logflow.queries import load_all

    pdf = load_all()["assoc_rules_copurchase"].fn(spark, sf_dir).toPandas()
    if len(pdf) == 0:
        pytest.skip("no pair reached the support floor at this SF/seed")
    assert (pdf["c_ab"] <= pdf[["c_a", "c_b"]].min(axis=1)).all()
    assert ((pdf["confidence"] > 0) & (pdf["confidence"] <= 1)).all()
    assert (pdf["support"] > 0).all()
    assert (pdf["lift"] > 0).all()
    assert (pdf["pa"] < pdf["pb"]).all()


def test_streaks_really_consecutive(spark, sf_dir):
    """Every reported longest streak is a genuine run: re-derive each
    user's day set and verify the [start, start+len) window is fully
    active and not extendable on the left."""
    import pandas as pd

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["streak_longest_daily"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    ev = (
        load_table(spark, "events", sf_dir)
        .selectExpr("user_id", "to_date(ts) AS d")
        .distinct()
        .toPandas()
    )
    days_by_user = {u: set(g["d"]) for u, g in ev.groupby("user_id")}
    for r in pdf.head(50).itertuples():
        days = days_by_user[r.user_id]
        start = pd.Timestamp(r.streak_start).date()
        run = [start + pd.Timedelta(days=i) for i in range(r.streak_days)]
        assert all(pd.Timestamp(x).date() in days for x in run)
        assert (start - pd.Timedelta(days=1)) not in days, "run extends left"


def test_skyline_is_exactly_the_undominated_set(spark, sf_dir):
    """The distributed two-phase formulation equals the brute-force
    dominance definition recomputed in pandas."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    got = (
        load_all()["skyline_pareto_parts"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["price_cents", "p_partkey"])
        .reset_index(drop=True)
    )
    pts = (
        load_table(spark, "part", sf_dir)
        .filter("p_partkey % 3 = 0")
        .selectExpr(
            "p_partkey",
            "CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents",
            "CAST(p_size AS BIGINT) AS p_size",
        )
        .toPandas()
    )
    rows = pts.to_records(index=False)
    keep = []
    for k, pc, sz in rows:
        dominated = any(
            (qc <= pc and qs >= sz and (qc < pc or qs > sz)) for _, qc, qs in rows
        )
        if not dominated:
            keep.append((k, pc, sz))
    expect = sorted(keep, key=lambda t: (t[1], t[0]))
    assert [tuple(r) for r in got.to_records(index=False)] == expect


def test_auc_matches_sklearn_free_reference(spark, sf_dir):
    """Tie-corrected rank-sum AUC equals a direct pairwise computation
    (wins + half-ties over all pos/neg pairs) on the same scores."""
    import numpy as np

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    row = load_all()["auc_label_separability"].fn(spark, sf_dir).toPandas().iloc[0]
    emb = (
        load_table(spark, "embeddings", sf_dir)
        .selectExpr(
            "CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y",
            "round(aggregate(transform(embedding, x -> CAST(x AS DOUBLE)),"
            " 0D, (a, x) -> a + x) / 64, 6) AS s",
        )
        .toPandas()
    )
    pos = emb.loc[emb.y == 1, "s"].to_numpy()
    neg = emb.loc[emb.y == 0, "s"].to_numpy()
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - auc) < 1e-6
    assert abs(row["gini"] - (2 * auc - 1)) < 1e-6


def test_pmi_is_symmetric_in_definition(spark, sf_dir):
    """PMI recomputes exactly from the emitted counts (the ln argument is
    a pure function of c_12, c_1, c_2 and the corpus totals), and every
    emitted pair meets the count floor."""
    import numpy as np

    from logflow.functions.text import tokenize
    from logflow.queries import load_all
    from logflow.sources.tables import load_table
    from pyspark.sql import functions as F

    pdf = load_all()["pmi_collocations"].fn(spark, sf_dir).toPandas()
    if len(pdf) == 0:
        pytest.skip("no bigram reached the count floor at this SF/seed")
    assert (pdf["c_12"] >= 5).all()
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(F.explode(tokenize("text")).alias("w"))
    n1 = toks.count()
    n2 = toks.count() - docs.filter(F.size(tokenize("text")) >= 1).count()
    got = pdf["pmi"].to_numpy()
    want = np.round(
        np.log(
            ((pdf.c_12.to_numpy() * float(n1)) / (pdf.c_1.to_numpy() * pdf.c_2.to_numpy()))
            * (float(n1) / float(n2))
        ),
        6,
    )
    assert np.allclose(got, want, atol=2e-6)


def test_seq_funnel_matches_python_re(spark, sf_dir):
    """Re-derive each reported user's symbol string and recount funnels
    and click runs with Python's re module — the regex semantics must
    agree engine-for-engine."""
    import re

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["seq_regex_funnel"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    ev = (
        load_table(spark, "events", sf_dir)
        .selectExpr("user_id", "ts", "event_id", "upper(substr(event_type,1,1)) AS c")
        .toPandas()
    )
    by_user = {
        u: "".join(g.sort_values(["ts", "event_id"])["c"])
        for u, g in ev.groupby("user_id")
    }
    for r in pdf.head(50).itertuples():
        s = by_user[r.user_id]
        assert r.seq_len == len(s)
        assert r.n_funnels == len(re.findall(r"S[CV]*P", s))
        runs = re.findall(r"C+", s)
        assert r.max_click_run == (max(len(x) for x in runs) if runs else 0)


def test_segment_overlap_identities(spark, sf_dir):
    """Overlap bounds: n_both <= min(n_a, n_b); jaccard/containment in
    (0,1]; all C(5,2) pairs present when every segment is non-empty."""
    from logflow.queries import load_all

    pdf = load_all()["segment_overlap_jaccard"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["n_both"] <= pdf[["n_a", "n_b"]].min(axis=1)).all()
    assert ((pdf["jaccard"] > 0) & (pdf["jaccard"] <= 1)).all()
    assert ((pdf["containment"] > 0) & (pdf["containment"] <= 1)).all()
    assert (pdf["jaccard"] <= pdf["containment"] + 1e-9).all()


def test_rle_runs_are_really_consecutive(spark, sf_dir):
    """Re-derive each reported user's ordered event-type sequence and
    verify a maximal run of exactly run_len at run_start."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["seq_run_length_encode"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["run_len"] >= 3).all()
    ev = (
        load_table(spark, "events", sf_dir)
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
    )
    seqs = {
        u: list(zip(g.sort_values(["ts", "event_id"])["ts"], g.sort_values(["ts", "event_id"])["event_type"]))
        for u, g in ev.groupby("user_id")
    }
    for r in pdf.head(30).itertuples():
        seq = seqs[r.user_id]
        idx = next(i for i, (t, _) in enumerate(seq) if t == r.run_start)
        run = [et for _, et in seq[idx : idx + r.run_len]]
        assert all(et == r.event_type for et in run), (r, run)
        if idx > 0:
            assert seq[idx - 1][1] != r.event_type, "run extends left"
        if idx + r.run_len < len(seq):
            assert seq[idx + r.run_len][1] != r.event_type, "run extends right"


def test_sprt_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ab_sprt_monitor", sf_dir)


def test_sprt_laws(spark, sf_dir):
    """Each arm yields one row; llr recomputes from (n, s); a decision row
    must actually sit outside the thresholds, a continue row inside; and
    the decision point is the FIRST crossing (llr at n-1 within bounds is
    not checkable without replay, but s <= n and thresholds hold)."""
    from logflow.queries import load_all
    from logflow.queries.mining import _SPRT_A, _SPRT_B, _SPRT_K1, _SPRT_K2

    pdf = load_all()["ab_sprt_monitor"].fn(spark, sf_dir).toPandas()
    assert sorted(pdf.arm) == [0, 1]
    for _, r in pdf.iterrows():
        assert 0 <= r.n_success <= r.n_events
        want = round(r.n_success * _SPRT_K1 + (r.n_events - r.n_success) * _SPRT_K2, 6)
        assert r.llr == want
        if r.decision == "accept_h1":
            assert r.llr >= round(_SPRT_A, 6)
        elif r.decision == "accept_h0":
            assert r.llr <= round(_SPRT_B, 6)
        else:
            assert _SPRT_B < r.llr < _SPRT_A


def test_markov_attribution_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "attribution_markov_removal", sf_dir)


def test_markov_attribution_laws(spark, sf_dir):
    """Removing a channel can only remove conversion paths, so
    p_conv_removed <= p_conv_full; effects lie in [0,1]; shares are
    non-negative and sum to ~1 (4dp rounding slack)."""
    from logflow.queries import load_all

    pdf = load_all()["attribution_markov_removal"].fn(spark, sf_dir).toPandas()
    assert sorted(pdf.channel) == ["click", "error", "signup", "view"]
    assert pdf.p_conv_full.nunique() == 1
    full = pdf.p_conv_full.iloc[0]
    assert 0 < full <= 1
    for _, r in pdf.iterrows():
        assert r.p_conv_removed <= r.p_conv_full + 1e-6
        assert 0.0 <= r.removal_effect <= 1.0
        assert r.attribution_share >= 0.0
    assert abs(pdf.attribution_share.sum() - 1.0) < 5e-4


def test_assoc_triples_apriori_monotonicity(spark, sf_dir):
    """Every emitted triple respects Apriori monotonicity (the triple
    count can never exceed its {a,b} pair count or c's item count),
    ordering is canonical, and the rule metrics stay in bounds."""
    from logflow.queries import load_all

    pdf = load_all()["assoc_rules_triples"].fn(spark, sf_dir).toPandas()
    if len(pdf) == 0:
        pytest.skip("no triple reached the support floor at this SF/seed")
    assert (pdf["c_abc"] <= pdf["c_ab"]).all()
    assert (pdf["c_abc"] <= pdf["c_c"]).all()
    assert ((pdf["conf_ab_c"] > 0) & (pdf["conf_ab_c"] <= 1)).all()
    assert (pdf["support"] > 0).all()
    assert (pdf["lift_ab_c"] > 0).all()
    assert ((pdf["pa"] < pdf["pb"]) & (pdf["pb"] < pdf["pc"])).all()


def test_rfm_grid_partitions_customers(spark, sf_dir):
    """The R×F grid partitions the customer base exactly (cell counts sum
    to the distinct buyer count), every axis's marginal is a valid
    quintile split (sizes differ by at most 1), and high-value membership
    is bounded by the cell size."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["rfm_quintile_segments"].fn(spark, sf_dir).toPandas()
    n_buyers = (
        load_table(spark, "orders", sf_dir).select("o_custkey").distinct().count()
    )
    assert pdf["n_customers"].sum() == n_buyers
    assert (pdf["n_high_value"] <= pdf["n_customers"]).all()
    assert set(pdf["r_q"]).issubset(set(range(1, 6)))
    assert set(pdf["f_q"]).issubset(set(range(1, 6)))
    r_marginal = pdf.groupby("r_q")["n_customers"].sum()
    assert r_marginal.max() - r_marginal.min() <= 1


def test_fifo_matching_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "fifo_inventory_matching", sf_dir)


def test_fifo_matched_qty_is_min_side(spark, sf_dir):
    """Total matched units equal the min(total buys, total sells) summed
    per part — the FIFO conservation law."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["fifo_inventory_matching"].fn(spark, sf_dir).toPandas()
    got = int(pdf["matched_qty"].sum())
    li = load_table(spark, "lineitem", sf_dir)
    q = F.round("l_quantity", 0).cast("long")
    per = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") != "R", q).otherwise(0)).alias("b"),
            F.sum(F.when(F.col("l_returnflag") == "R", q).otherwise(0)).alias("s"),
        )
        .select(F.least("b", "s").alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    assert got == int(per or 0)


def test_pvm_bridge_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "finance_pvm_bridge", sf_dir)


def test_pvm_bridge_reconciles(spark, sf_dir):
    """price + volume effects reconcile the revenue delta exactly (the
    two-factor split is exact by construction, up to cent rounding)."""
    from logflow.queries import load_all

    pdf = load_all()["finance_pvm_bridge"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    delta = pdf["revenue_p1"] - pdf["revenue_p0"]
    recon = pdf["price_effect"] + pdf["volume_effect"]
    assert ((delta - recon).abs() <= 0.05).all()


def test_shapley_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "attribution_shapley", sf_dir)


def test_shapley_efficiency_axiom(spark, sf_dir):
    """Shapley credits sum to v(grand coalition) - v(empty set) — the
    efficiency axiom, a strong end-to-end correctness check on the
    per-mask rate pipeline."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table
    from pyspark.sql import functions as F

    pdf = load_all()["attribution_shapley"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 3
    ev = load_table(spark, "events", sf_dir)
    u = ev.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
            + 2 * F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            + 4 * F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
        ).alias("mask"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    rows = {
        r["mask"]: (r["n"], r["c"])
        for r in u.groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c"))
        .collect()
    }
    v = lambda m: (rows[m][1] / rows[m][0]) if m in rows and rows[m][0] else 0.0
    assert abs(pdf["shapley_credit"].sum() - (v(7) - v(0))) < 1e-4


def test_session_edit_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "seq_session_edit_distance", sf_dir)


def test_session_edit_bounds(spark, sf_dir):
    """Edit distance between two halves is bounded by the longer half."""
    from logflow.queries import load_all

    pdf = load_all()["seq_session_edit_distance"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["edit_dist"] >= 0).all()
    assert (pdf["n_users"] > 0).all()


def test_item_item_jaccard_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "reco_item_item_jaccard", sf_dir)


def test_item_item_jaccard_bounds(spark, sf_dir):
    """Jaccard in (0, 1]; co-order count bounded by both item counts;
    sorted by the fixed-point key with pair tiebreak."""
    from logflow.queries import load_all

    pdf = load_all()["reco_item_item_jaccard"].fn(spark, sf_dir).toPandas()
    if len(pdf) == 0:
        import pytest

        pytest.skip("no pair reaches the co-order floor at this SF")
    assert (pdf["n_co_orders"] <= pdf[["na", "nb"]].min(axis=1)).all()
    assert ((pdf["jaccard"] > 0) & (pdf["jaccard"] <= 1.0)).all()
    key = list(zip(-pdf["jaccard_fp"], pdf["item_a"], pdf["item_b"]))
    assert key == sorted(key)


def test_dbscan_grid_invariants(spark, sf_dir):
    """Clusters are disjoint cell sets with coherent bounding boxes: the
    cluster id is one of its own member cell keys (the min), boxes nest
    inside the data's grid domain, and the at-least-mean density rule
    means every cluster's per-cell load >= the global mean load."""
    from logflow.queries import load_all

    pdf = load_all()["cluster_dbscan_grid"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["n_cells"] >= 1).all()
    assert (pdf["n_points"] >= pdf["n_cells"]).all()
    assert (pdf["qty_min"] <= pdf["qty_max"]).all()
    assert (pdf["price_band_min"] <= pdf["price_band_max"]).all()
    # cluster_id = min member key = qty*KEYW + band for some member cell:
    # it must be >= the box's min corner key and <= its max corner key
    lo = pdf["qty_min"] * 1000 + pdf["price_band_min"]
    hi = pdf["qty_max"] * 1000 + pdf["price_band_max"]
    assert ((pdf["cluster_id"] >= lo) & (pdf["cluster_id"] <= hi)).all()


def test_prefixspan_apriori_monotone(spark, sf_dir):
    """Sequential-pattern supports obey Apriori monotonicity: every
    frequent a>b has support <= support(a); every a>b>c has support <=
    support(a>b). Supports never exceed the user count."""
    from logflow.queries import load_all

    pdf = load_all()["seq_prefixspan"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0  # length-1 patterns always reach 50% at any seed
    sup = dict(zip(pdf["pattern"], pdf["support"]))
    assert (pdf["support_frac"] <= 1.0).all()
    for pat, s in sup.items():
        parts = pat.split(">")
        if len(parts) >= 2:
            prefix = ">".join(parts[:-1])
            # the prefix must itself be frequent (Apriori) and dominate
            assert prefix in sup and s <= sup[prefix], (pat, s, sup.get(prefix))
