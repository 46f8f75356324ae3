"""Asymmetric containment pairs + pair-set metrics (operators/dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import dedup

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "alpha beta gamma delta"),            # prefix-quoted inside 1
    (3, "totally unrelated words only here"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_containment_is_directional(docs):
    rows = {
        (r["src_doc_id"], r["dst_doc_id"]): r["containment"]
        for r in dedup.ngram_containment_pairs(docs, threshold=0.0).collect()
    }
    # doc2's 2 trigram shingles both appear in doc1 (6 shingles)
    assert rows[(2, 1)] == 1.0
    assert rows[(1, 2)] == pytest.approx(2 / 6)
    assert (3, 1) not in rows and (1, 3) not in rows
    # the threshold keeps only the quoted direction
    kept = {
        (r["src_doc_id"], r["dst_doc_id"])
        for r in dedup.ngram_containment_pairs(docs, threshold=0.8).collect()
    }
    assert kept == {(2, 1)}


def test_containment_vs_jaccard_on_quotes(docs):
    """The motivating case: a full quote scores 1.0 containment but
    dilutes below 0.5 Jaccard."""
    jac = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert jac[(1, 2)] == pytest.approx(2 / 6)  # union-diluted


def test_pair_set_metrics_counts(spark):
    pred = spark.createDataFrame(
        # directed + duplicated: canonicalization must collapse them
        [(1, 2), (2, 1), (3, 4), (5, 6)], "doc_id_a long, doc_id_b long"
    )
    truth = spark.createDataFrame(
        [(2, 1), (4, 3), (7, 8)], "doc_id_a long, doc_id_b long"
    )
    row = dedup.pair_set_metrics(pred, truth).collect()[0]
    assert (row["n_predicted"], row["n_truth"], row["tp"]) == (3, 3, 2)
    assert (row["fp"], row["fn"]) == (1, 1)
    assert row["precision"] == row["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["f1"] == pytest.approx(2 / 3, abs=1e-6)


def test_pair_set_metrics_empty_truth(spark):
    pred = spark.createDataFrame([(1, 2)], "doc_id_a long, doc_id_b long")
    truth = pred.limit(0)
    row = dedup.pair_set_metrics(pred, truth).collect()[0]
    assert row["recall"] is None and row["f1"] is None
    assert row["precision"] == 0.0 and row["fp"] == 1
