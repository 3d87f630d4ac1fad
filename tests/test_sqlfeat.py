"""Oracle parity + invariants for the SQL-surface feature operators
(logflow/queries/sqlfeat.py)."""

from __future__ import annotations

import pytest

SQLFEAT_QUERIES = [
    "quantile_exact_twopass",
    "sqlvar_dynamic_threshold",
    "transpose_band_metrics",
    "sqlscript_doubling_threshold",
]


@pytest.mark.parametrize("name", SQLFEAT_QUERIES)
def test_sqlfeat_parity(spark, duck, sf_dir, name):
    from tests.oracle import check_query

    check_query(spark, duck, name, sf_dir)


def test_twopass_quantiles_match_full_sort(spark, sf_dir):
    """The two-pass selection picks EXACTLY the element a full sort picks
    (percentile_disc semantics, k = ceil(p*n/100)), for every target p."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["quantile_exact_twopass"].fn(spark, sf_dir).toPandas()
    cents = sorted(
        load_table(spark, "orders", sf_dir)
        .selectExpr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c")
        .toPandas()["c"]
    )
    n = len(cents)
    for _, row in pdf.iterrows():
        k = (int(row["pct"]) * n + 99) // 100
        assert int(row["k"]) == k
        assert row["value"] == cents[k - 1] / 100
    assert list(pdf["pct"]) == [25, 50, 75]
    assert pdf["value"].is_monotonic_increasing


def test_sqlvar_threshold_is_p95_and_counts_partition(spark, sf_dir):
    """The session-variable threshold equals the exact p95 element, and
    the per-priority counts partition the orders table."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = load_all()["sqlvar_dynamic_threshold"].fn(spark, sf_dir).toPandas()
    orders = load_table(spark, "orders", sf_dir).selectExpr(
        "o_orderpriority", "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c"
    ).toPandas()
    cents = sorted(orders["c"])
    n = len(cents)
    thr = cents[(95 * n + 99) // 100 - 1]
    assert (pdf["thr_value"] == thr / 100).all()
    assert int(pdf["n_orders"].sum()) == n
    assert int(pdf["n_above"].sum()) == int((orders["c"] > thr).sum())
    # ~5% of rows sit above a p95 threshold (ties can only shrink it)
    assert pdf["n_above"].sum() <= n - (95 * n + 99) // 100 + 1


def test_transpose_shape_and_reconstruction(spark, sf_dir):
    """transpose() output is one row per metric, one column per band, and
    transposing back recovers the original aggregate values."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    pdf = (
        load_all()["transpose_band_metrics"].fn(spark, sf_dir).toPandas().set_index("key")
    )
    assert sorted(pdf.index) == ["avg_price", "n_rows", "sum_qty"]
    assert list(pdf.columns) == ["band_0", "band_1", "band_2"]
    li = load_table(spark, "lineitem", sf_dir).selectExpr(
        "pmod(l_orderkey, 3) AS band", "l_quantity"
    ).toPandas()
    for b in range(3):
        assert pdf.loc["n_rows", f"band_{b}"] == float((li["band"] == b).sum())


def test_sqlscript_threshold_is_tight(spark, sf_dir):
    """The scripted loop must stop at the FIRST qualifying doubling: the
    returned threshold has count < 1000 (unless capped), and half of it
    (the previous probe) still had count >= 1000 when k > 0."""
    from pyspark.sql import functions as F

    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    row = load_all()["sqlscript_doubling_threshold"].fn(spark, sf_dir).collect()[0]
    orders = load_table(spark, "orders", sf_dir)

    def n_at(t):
        return orders.filter(F.col("o_totalprice") >= t).count()

    assert row.n_qualifying == n_at(row.threshold)
    if row.k_steps < 20:
        assert row.n_qualifying < 1000
    if row.k_steps > 0:
        assert n_at(row.threshold / 2) >= 1000


def test_sqlparam_identifier_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "sqlparam_identifier_query", sf_dir)


def test_sqlparam_binding_equals_inline(spark, sf_dir):
    """The parameterized form must produce exactly what the same query
    with inlined literals produces (binding is transparent to results)."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    got = load_all()["sqlparam_identifier_query"].fn(spark, sf_dir).toPandas()
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("sqlparam_orders_v2")
    want = spark.sql(
        """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS revenue
        FROM sqlparam_orders_v2
        WHERE o_totalprice >= 150000.0 AND o_orderstatus = 'O'
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    ).toPandas()
    assert got.equals(want)


def test_listagg_parity(spark, duck, sf_dir):
    from tests.oracle import check_query

    check_query(spark, duck, "agg_listagg_ordered", sf_dir)


def test_listagg_shape(spark, sf_dir):
    """<= 5 nations per segment, comma-joined, count column consistent."""
    from logflow.queries import load_all

    pdf = load_all()["agg_listagg_ordered"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for _, r in pdf.iterrows():
        names = r["top_nations"].split(",")
        assert 1 <= len(names) <= 5
        assert len(names) == r["n_listed"]
