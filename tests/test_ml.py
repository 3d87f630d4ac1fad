"""Oracle parity + invariants for the in-engine ML operators
(logflow/queries/ml.py)."""

from __future__ import annotations

import pytest

ML_QUERIES = [
    "ml_nb_lang_confusion",
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
