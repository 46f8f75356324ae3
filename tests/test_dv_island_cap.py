"""Island cap on the deletion-vector WRITE path (round-10 item #1).

The auto copy-vs-DV gate bounds matched COUNT (DV_MAX_FRACTION of the
touched files' live rows) but count says nothing about FRAGMENTATION:
a scattered sub-20% delete — every Nth row, a predicate on a
high-entropy column — is one island per row, and the write path
collects islands to the driver.  At 100 TB that collect is a driver
OOM.  ``matched_ranges`` therefore collects through a LIMIT(cap + 1)
probe (the driver never holds more than cap+1 island rows; executors
stop early) and raises ``IslandCapExceeded`` above the cap
(``DV_MAX_ISLANDS``); ``strategy="auto"`` falls back to copy-on-write
for the statement, a user-forced ``strategy="dv"`` surfaces the error.

These tests pin: the boundary (cap islands OK, cap+1 raises), the auto
fallback on a scattered every-Nth-row delete that stays under the
fraction gate, forced-dv refusal, the contiguous shape (same row count,
ONE island) still taking the DV path under the same cap, and the
fallback on the UPDATE and MERGE paths.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import deletion_vectors as dvmod
from integritychecksforvldbs_spark.sources import versioned


def _mk(spark, n, parts=4):
    return (
        spark.range(0, n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        .coalesce(parts)
    )


def _data_files(path):
    return sorted(glob.glob(os.path.join(path, "data", "*", "*.parquet")))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# matched_ranges: the cap itself
# ---------------------------------------------------------------------------


def _scatter(spark, n_islands):
    # every-other position: one island per row, n_islands islands
    return spark.createDataFrame(
        [("f", i * 2) for i in range(n_islands)], "f string, p long"
    )


def test_matched_ranges_at_cap_ok(spark):
    out = dvmod.matched_ranges(_scatter(spark, 8), "f", "p", max_islands=8)
    assert out == {"f": [[i * 2, i * 2] for i in range(8)]}


def test_matched_ranges_above_cap_raises(spark):
    with pytest.raises(dvmod.IslandCapExceeded) as ei:
        dvmod.matched_ranges(_scatter(spark, 9), "f", "p", max_islands=8)
    assert ei.value.cap == 8
    assert "strategy='copy'" in str(ei.value)


def test_matched_ranges_cap_counts_islands_not_rows(spark):
    # 1000 contiguous positions = ONE island: far under an 8-island cap
    df = spark.range(0, 1000).select(
        F.lit("f").alias("f"), F.col("id").alias("p")
    )
    out = dvmod.matched_ranges(df, "f", "p", max_islands=8)
    assert out == {"f": [[0, 999]]}


def test_matched_ranges_default_reads_module_cap(spark, monkeypatch):
    monkeypatch.setattr(dvmod, "DV_MAX_ISLANDS", 4)
    with pytest.raises(dvmod.IslandCapExceeded):
        dvmod.matched_ranges(_scatter(spark, 5), "f", "p")
    # None disables the cap entirely
    out = dvmod.matched_ranges(_scatter(spark, 5), "f", "p", max_islands=None)
    assert sum(len(r) for r in out.values()) == 5


# ---------------------------------------------------------------------------
# DML integration: auto falls back to copy, forced dv refuses
# ---------------------------------------------------------------------------


def test_scattered_delete_auto_falls_back_to_copy(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(dvmod, "DV_MAX_ISLANDS", 50)
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 10_000), path)
    before = _data_files(path)
    # every 10th row: 1000 matched = 10% of live (under DV_MAX_FRACTION
    # = 0.2, so the fraction gate WANTS the DV path) but 1000 islands
    v, n = versioned.delete_where(spark, path, "k % 10 = 3")
    assert n == 1000
    # fell back to copy-on-write: no deletion vectors, files rewritten
    assert versioned.dv_info(path) == {}
    assert _data_files(path) != before
    got = versioned.read(spark, path)
    assert got.count() == 9000
    assert got.filter("k % 10 = 3").count() == 0


def test_scattered_delete_forced_dv_raises(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(dvmod, "DV_MAX_ISLANDS", 50)
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 10_000), path)
    before = _data_files(path)
    with pytest.raises(dvmod.IslandCapExceeded):
        versioned.delete_where(spark, path, "k % 10 = 3", strategy="dv")
    # nothing committed, nothing rewritten
    assert _data_files(path) == before
    assert versioned.read(spark, path).count() == 10_000


def test_contiguous_delete_same_size_still_dv(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(dvmod, "DV_MAX_ISLANDS", 50)
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 10_000, parts=1), path)
    before = _data_files(path)
    # same 1000-row volume as the scattered test but ONE island
    v, n = versioned.delete_where(spark, path, "k >= 2000 and k < 3000")
    assert n == 1000
    assert versioned.dv_info(path) != {}
    assert _data_files(path) == before  # merge-on-read: bytes untouched
    assert versioned.read(spark, path).count() == 9000


def test_scattered_update_auto_falls_back_to_copy(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(dvmod, "DV_MAX_ISLANDS", 50)
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 10_000), path)
    v, n = versioned.update_where(
        spark, path, "k % 10 = 3", {"v": "concat(v, '!')"}
    )
    assert n == 1000
    assert versioned.dv_info(path) == {}
    got = versioned.read(spark, path)
    assert got.filter("v like '%!'").count() == 1000
    assert got.count() == 10_000


def test_scattered_merge_auto_falls_back_to_copy(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(dvmod, "DV_MAX_ISLANDS", 50)
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 10_000), path)
    source = (
        spark.range(0, 10_000)
        .filter("id % 10 = 3")
        .select(
            F.col("id").alias("k"),
            F.lit(99).alias("g"),
            F.lit("merged").alias("v"),
        )
    )
    versioned.merge_into(spark, path, source, keys=["k"])
    assert versioned.dv_info(path) == {}
    got = versioned.read(spark, path)
    assert got.count() == 10_000
    assert _rows(got.filter("g = 99").select("k")) == _rows(
        source.select("k")
    )
