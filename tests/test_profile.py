"""Column profiling: pinned null/NDV/min-max semantics, cross-engine
equality on the fixture, and the one-scan plan shape."""

from __future__ import annotations

import pytest

from integritychecksforvldbs_spark.operators import profile
from integritychecksforvldbs_spark.sources.bucketing import plan_data_shuffles

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def test_profile_pinned_values(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, None), (2, "a"), (None, "a")],
        "k int, s string",
    )
    out = {r["column_name"]: r for r in profile.profile_df(df).collect()}
    assert out["k"]["n_rows"] == 4
    assert out["k"]["n_nulls"] == 1
    assert out["k"]["n_distinct"] == 2  # NULL excluded from NDV
    assert (out["k"]["min_value"], out["k"]["max_value"]) == ("1", "2")
    assert out["s"]["n_nulls"] == 1
    assert out["s"]["n_distinct"] == 2
    assert (out["s"]["min_value"], out["s"]["max_value"]) == ("a", "b")


def test_profile_unknown_column_raises(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="unknown"):
        profile.profile_df(df, ["nope"])


def test_profile_matches_duckdb(tables, duck):
    spark_rows = sorted(
        tuple(r) for r in profile.profile_df(tables["documents"], DOC_COLS).collect()
    )
    oracle_rows = sorted(
        duck.execute(profile.profile_oracle("documents", DOC_COLS)).fetchall()
    )
    assert spark_rows == oracle_rows


def test_profile_is_one_scan(tables):
    """All per-column aggregates ride ONE scan: the multi-distinct
    Expand collapses map-side, so the plan needs at most one hash
    shuffle of partial states, and must not re-scan per column."""
    df = profile.profile_df(tables["documents"], DOC_COLS)
    assert plan_data_shuffles(df) <= 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_skew_profile_pinned(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k int"
    )
    r = profile.key_skew_profile(df, ["k"]).first()
    assert (r["n_keys"], r["n_rows"], r["max_key_rows"]) == (3, 5, 3)
    assert r["skew_factor"] == 1.8  # 3 / (5/3)


def test_heavy_hitters_rides_take_ordered(tables):
    df = profile.heavy_hitters(tables["orders"], ["o_custkey"], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort
    rows = df.collect()
    assert len(rows) == 5
    counts = [r["n_rows"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_histogram_buckets_partition_the_table(tables):
    docs = tables["documents"]
    hist = profile.histogram_fixed(docs, "n_chars", 100)
    rows = hist.collect()
    assert sum(r["n_rows"] for r in rows) == docs.count()
    for r in rows:
        assert r["bucket"] * 100 <= r["min_value"] <= r["max_value"] < (r["bucket"] + 1) * 100
