"""Equi-depth histogram and profile-drift monitor (operators/profile.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import profile

COLS = "k long, v long"


def test_equidepth_bucket_sizes_and_ranges(spark):
    df = spark.createDataFrame([(i, i * 7 % 50) for i in range(100)], COLS)
    h = profile.histogram_equidepth(df, "v", 8, ["k"]).collect()
    sizes = {r["bucket"]: r["n_rows"] for r in h}
    assert sum(sizes.values()) == 100
    assert set(sizes) == set(range(1, 9))
    # equi-depth: bucket sizes differ by at most one
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # bucket value ranges are non-decreasing in bucket order
    ordered = sorted(h, key=lambda r: r["bucket"])
    for prev, nxt in zip(ordered, ordered[1:]):
        assert prev["max_value"] <= nxt["min_value"] or (
            # ties on v may straddle the boundary value itself
            prev["max_value"] == nxt["min_value"]
        )
        assert prev["min_value"] <= prev["max_value"]


def test_equidepth_is_deterministic_under_ties(spark):
    """All-equal values: the tiebreak makes bucketing reproducible."""
    df = spark.createDataFrame([(i, 42) for i in range(10)], COLS)
    a = sorted(map(tuple, profile.histogram_equidepth(df, "v", 3, ["k"]).collect()))
    b = sorted(map(tuple, profile.histogram_equidepth(df, "v", 3, ["k"]).collect()))
    assert a == b
    assert sum(r[1] for r in a) == 10


def _profiles(spark, rows_a, rows_b):
    a = spark.createDataFrame(rows_a, COLS)
    b = spark.createDataFrame(rows_b, COLS)
    return (
        profile.profile_df(a, ["k", "v"]),
        profile.profile_df(b, ["k", "v"]),
    )


def test_drift_identity_is_clean(spark):
    rows = [(i, i % 5) for i in range(50)]
    pa, pb = _profiles(spark, rows, rows)
    out = profile.profile_drift(pa, pb).collect()
    assert len(out) == 2
    assert all(not r["any_drift"] for r in out)


def test_drift_flags_fire_per_cause(spark):
    rows = [(i, i % 5) for i in range(50)]
    # candidate: triple the rows (rows_drift), v gains nulls + a new
    # extreme value (nulls_drift + range_drift)
    rows_b = [(i, None if i % 10 == 0 else i % 5) for i in range(150)]
    rows_b[0] = (0, 999)
    pa, pb = _profiles(spark, rows, rows_b)
    got = {r["column_name"]: r for r in profile.profile_drift(pa, pb).collect()}
    assert got["k"]["rows_drift"] and got["v"]["rows_drift"]
    assert got["v"]["nulls_drift"] and not got["k"]["nulls_drift"]
    assert got["v"]["range_drift"] and got["k"]["range_drift"]  # k max moved too
    assert got["v"]["any_drift"]


def test_drift_missing_column_always_flags(spark):
    a = spark.createDataFrame([(1, 2)], COLS)
    b = spark.createDataFrame([(1,)], "k long")
    out = {
        r["column_name"]: r
        for r in profile.profile_drift(
            profile.profile_df(a, ["k", "v"]), profile.profile_df(b, ["k"])
        ).collect()
    }
    assert out["v"]["any_drift"] and out["v"]["rows_drift"]
    assert not out["k"]["any_drift"]
