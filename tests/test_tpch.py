"""Oracle parity + invariants for the round-3 TPC-H plan-shape queries."""

from __future__ import annotations

import pytest

TPCH_QUERIES = [
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q13_order_count_distribution",
    "q22_dormant_balance",
]


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    from tests.oracle import check_query

    check_query(spark, duck, name, sf_dir)


def test_q13_histogram_covers_every_customer(spark, sf_dir):
    """The order-count histogram must partition the customer table: zero-
    order customers survive the left outer join (the predicate is inside
    the join condition, not a post-filter)."""
    from logflow.queries import load_all
    from logflow.sources.tables import load_table

    hist = load_all()["q13_order_count_distribution"].fn(spark, sf_dir).toPandas()
    n_customers = load_table(spark, "customer", sf_dir).count()
    assert int(hist["custdist"].sum()) == n_customers


def test_q8_share_is_a_proper_fraction(spark, sf_dir):
    from logflow.queries import load_all

    pdf = load_all()["q8_market_share"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert ((pdf["mkt_share"] >= 0.0) & (pdf["mkt_share"] <= 1.0)).all()


def test_q7_excludes_intra_nation_flows(spark, sf_dir):
    from logflow.queries import load_all

    pdf = load_all()["q7_nation_volume"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["supp_nation"] != pdf["cust_nation"]).all()
