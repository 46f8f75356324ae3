"""Deterministic sampling kernels: reproducibility and rate shape."""

from __future__ import annotations

import pytest

from integritychecksforvldbs_spark.operators import sampling, text
from integritychecksforvldbs_spark.sources.loader import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, f"{SF_DIR}/documents.parquet").cache()


def test_deterministic_sample_stable_under_repartition(docs):
    """The same rows come back regardless of physical layout — the
    property df.sample() lacks."""
    a = {r["doc_id"] for r in sampling.deterministic_sample(docs, 8).collect()}
    b = {
        r["doc_id"]
        for r in sampling.deterministic_sample(docs.repartition(13), 8).collect()
    }
    assert a == b and len(a) > 0


def test_deterministic_sample_salts_partition_corpus(docs):
    """Salts 0..k-1 give disjoint samples that cover the corpus."""
    n = docs.count()
    seen: set[int] = set()
    for salt in range(4):
        s = {
            r["doc_id"]
            for r in sampling.deterministic_sample(docs, 4, salt=salt).collect()
        }
        assert not (seen & s)
        seen |= s
    assert len(seen) == n
    with pytest.raises(ValueError):
        sampling.deterministic_sample(docs, 4, salt=4)


def test_stratified_sample_rates(docs):
    """Observed per-stratum rates are near the requested per-mille
    (hash uniformity), zero for unlisted strata, and rows reproduce."""
    rates = {"en": 1000, "de": 500, "fr": 0}
    out = sampling.stratified_sample(docs, "lang", rates)
    by_lang = {r["lang"]: r["cnt"] for r in out.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    totals = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    assert by_lang.get("en", 0) == totals["en"]  # rate 1000 = keep all
    assert "fr" not in by_lang  # rate 0 = drop all
    if "de" in totals and totals["de"] >= 20:
        frac = by_lang.get("de", 0) / totals["de"]
        assert 0.25 < frac < 0.75  # 500/1000 within loose hash bounds
    # strata not in the dict default to 0
    assert set(by_lang) <= set(rates)
    with pytest.raises(ValueError):
        sampling.stratified_sample(docs, "lang", {"en": 1001})


def test_vocabulary_topk_shape(docs):
    vocab = text.vocabulary(docs, k=50).collect()
    # the sf0.001 synthetic vocabulary is small; k caps, never pads
    assert 0 < len(vocab) <= 50
    assert len(vocab) == text.vocabulary(docs, k=1000).count() or len(vocab) == 50
    counts = [r["n_occurrences"] for r in vocab]
    assert counts == sorted(counts, reverse=True)
    for r in vocab:
        assert r["n_docs"] <= r["n_occurrences"]
        assert r["token"] == r["token"].lower()


def test_split_assign_partitions_and_is_stable(tables, duck):
    from integritychecksforvldbs_spark.operators import sampling as S
    from pyspark.sql import functions as F

    docs = tables["documents"].select("doc_id", "lang")
    out = S.split_assign(docs, val_per_mille=100, test_per_mille=100)
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == docs.count()  # every row labeled, none dropped
    assert set(rows.values()) == {"train", "val", "test"}
    # repartitioning cannot move a row between splits
    again = {
        r["doc_id"]: r["split"]
        for r in S.split_assign(
            docs.repartition(7), val_per_mille=100, test_per_mille=100
        ).collect()
    }
    assert again == rows
    # the splits agree with deterministic_sample's bucket space:
    # disjoint by construction with the DuckDB oracle
    want = {
        d: s
        for d, _l, s in duck.execute(
            S.split_assign_oracle(
                "(SELECT doc_id, lang FROM documents) d",
                val_per_mille=100,
                test_per_mille=100,
            )
        ).fetchall()
    }
    assert want == rows

    import pytest as _pytest

    with _pytest.raises(ValueError, match="room for train"):
        S.split_assign(docs, val_per_mille=600, test_per_mille=500)


def test_training_order_reproducible_and_seed_divergent(docs):
    from integritychecksforvldbs_spark.operators.sampling import (
        training_order,
    )

    a = [r["doc_id"] for r in training_order(docs, seed=1).collect()]
    b = [r["doc_id"] for r in training_order(docs, seed=1).collect()]
    c = [r["doc_id"] for r in training_order(docs, seed=2).collect()]
    assert a == b  # same seed: byte-identical order
    assert a != c  # different seed: different permutation
    assert sorted(a) == sorted(c)  # …of the same corpus


def test_upsample_epochs_copy_counts(spark):
    from integritychecksforvldbs_spark.operators.sampling import (
        upsample_epochs,
    )

    df = spark.createDataFrame(
        [(i, "w" if i % 2 == 0 else "x") for i in range(200)],
        "doc_id long, source string",
    )
    out = upsample_epochs(
        df, {"w": 3000, "x": 250}, default_per_mille=1000
    )
    rows = out.groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in rows}
    # w: exactly 3 copies of all 100; x: ~25% of 100, deterministic
    assert got["w"] == 300
    assert 10 <= got["x"] <= 40
    # epoch_idx is dense per row: every copy 0..n-1 present
    w_idx = sorted(
        r["epoch_idx"]
        for r in out.filter("source = 'w' AND doc_id = 0").collect()
    )
    assert w_idx == [0, 1, 2]
    # rate 0 drops; rerun is identical (determinism)
    assert upsample_epochs(df, {"w": 0, "x": 0}).count() == 0
    again = {r["source"]: r["count"]
             for r in upsample_epochs(
                 df, {"w": 3000, "x": 250}
             ).groupBy("source").count().collect()}
    assert again == got


def test_weighted_sample_deterministic_and_partition_independent(spark):
    df = spark.createDataFrame(
        [(i, "w" * (1 + i % 5)) for i in range(500)], "doc_id long, text string"
    )
    kw = dict(k=50, weight_expr="length(text)", seed=3)
    a = sampling.weighted_sample(df.repartition(3), **kw).collect()
    b = sampling.weighted_sample(df.repartition(17), **kw).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    c = sampling.weighted_sample(df, seed=4, k=50, weight_expr="length(text)")
    assert sorted(r["doc_id"] for r in c.collect()) != sorted(
        r["doc_id"] for r in a
    )  # seed-divergent


def test_weighted_sample_prefers_heavy_rows(spark):
    # 250 light rows (weight 1) vs 250 heavy rows (weight 50): the
    # heavy tier must dominate the sample (binomial tail at fixed
    # seeds makes this deterministic, not statistical)
    df = spark.createDataFrame(
        [(i, 1.0 if i < 250 else 50.0) for i in range(500)],
        "doc_id long, w double",
    )
    got = sampling.weighted_sample(df, k=100, weight_expr="w", seed=0).collect()
    heavy = sum(1 for r in got if r["doc_id"] >= 250)
    assert heavy > 80


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = sampling.weighted_sample(df, k=10, weight_expr="w", seed=0)
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 5]


def test_weighted_sample_plan_is_takeordered(spark):
    df = spark.range(1000).selectExpr("id AS doc_id", "1.0 AS w")
    plan = sampling.weighted_sample(
        df, k=10, weight_expr="w", seed=0
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition heap, no global sort
