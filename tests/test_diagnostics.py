"""Oracle parity + invariants for tokenizer + diagnostics queries."""

from __future__ import annotations

import pytest

NEW_QUERIES = ["bpe_merge_steps", "diag_key_skew", "diag_join_cardinality"]


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
