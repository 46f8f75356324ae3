"""Skew-aware joins (operators/skewjoin.py): exact result parity with
the plain join, plan shapes, hot-key detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import skewjoin


@pytest.fixture(scope="module")
def skewed(spark):
    """A big side where one key holds half the rows (the hot key) and
    a small dimension side."""
    big = spark.range(0, 4000).select(
        F.when(F.col("id") < 2000, F.lit(7))
        .otherwise(F.col("id") % 50)
        .cast("long")
        .alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("d")
    )
    return big.cache(), small.cache()


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_join_inner_equals_plain(spark, skewed):
    big, small = skewed
    plain = big.join(small, ["k"], "inner")
    salted = skewjoin.salted_join(big, small, ["k"], n_salt=8)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_left_keeps_unmatched(spark, skewed):
    big, small = skewed
    dim = small.filter("k < 10")  # keys 10..49 unmatched on the left
    plain = big.join(dim, ["k"], "left")
    salted = skewjoin.salted_join(big, dim, ["k"], n_salt=4, how="left")
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_plan_explodes_small_side(spark, skewed):
    big, small = skewed
    plan = skewjoin.salted_join(big, small, ["k"], n_salt=8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Generate explode" in plan or "explode" in plan.lower()
    # the join key really includes the salt (hot key spreads 8 ways)
    assert "_salt" in plan


def test_salted_join_rejects_unsound_modes_and_collisions(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError, match="inner/left"):
        skewjoin.salted_join(big, small, ["k"], how="right")
    with pytest.raises(ValueError, match="_salt"):
        skewjoin.salted_join(big.withColumn("_salt", F.lit(1)), small, ["k"])


def test_detect_hot_keys_exact_and_sampled(spark, skewed):
    big, _ = skewed
    hot = skewjoin.detect_hot_keys(big, ["k"], min_rows=1000)
    assert [(r["k"], r["n_rows"]) for r in hot.collect()] == [(7, 2040)]
    # sampled detection still finds the 2000-row key at a 500-row bar
    hot_s = skewjoin.detect_hot_keys(
        big, ["k"], min_rows=500, sample_fraction=0.2
    )
    assert 7 in {r["k"] for r in hot_s.collect()}


def test_split_skew_join_equals_plain(spark, skewed):
    big, small = skewed
    plain = big.join(small, ["k"], "inner")
    split = skewjoin.split_skew_join(big, small, ["k"], min_rows=1000)
    assert _sorted_rows(split.select(*plain.columns)) == _sorted_rows(plain)
    # left mode: unmatched cold keys survive once
    dim = small.filter("k < 10")
    plain_l = big.join(dim, ["k"], "left")
    split_l = skewjoin.split_skew_join(
        big, dim, ["k"], min_rows=1000, how="left"
    )
    assert _sorted_rows(split_l.select(*plain_l.columns)) == _sorted_rows(plain_l)


def test_split_skew_join_hot_path_is_broadcast(spark, skewed):
    big, small = skewed
    hot = skewjoin.detect_hot_keys(big, ["k"], min_rows=1000)
    plan = skewjoin.split_skew_join(big, small, ["k"], hot=hot)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the hot slice never shuffles


def test_split_skew_join_no_hot_keys_degenerates_cleanly(spark, skewed):
    big, small = skewed
    out = skewjoin.split_skew_join(big, small, ["k"], min_rows=10**9)
    assert _sorted_rows(out.select("k", "v", "d")) == _sorted_rows(
        big.join(small, ["k"], "inner")
    )
