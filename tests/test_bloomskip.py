"""Bloom-filter file skipping (sources/bloomskip.py): no false
negatives, real skipping on clustered layouts, append safety."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import bloomskip
from integritychecksforvldbs_spark.sources.loader import load_table


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    """8 files, each holding a disjoint key range (the layout sorted
    compaction produces)."""
    dest = str(tmp_path_factory.mktemp("bloom") / "tbl")
    df = spark.range(0, 8000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    df.repartitionByRange(8, "k").write.mode("overwrite").parquet(dest)
    return dest


def test_bloom_skips_and_finds_everything(spark, clustered):
    bloomskip.build_bloom_index(spark, clustered, "k")
    hits = misses = 0
    for probe in (0, 1234, 4567, 7999):
        kept, skipped = bloomskip.bloom_prune(spark, clustered, "k", probe)
        assert skipped, f"clustered layout must skip files for k={probe}"
        rows = bloomskip.bloom_read(spark, clustered, "k", probe).collect()
        assert [r["k"] for r in rows] == [probe]  # zero false negatives
        hits += len(kept)
        misses += len(skipped)
    assert misses > hits  # most files skip for point probes


def test_bloom_absent_value_skips_all_or_matches_empty(spark, clustered):
    out = bloomskip.bloom_read(spark, clustered, "k", 999_999)
    assert out.count() == 0


def test_bloom_unindexed_appended_file_is_kept(spark, clustered, tmp_path):
    """A file added AFTER the index build must always be scanned."""
    import shutil

    dest = str(tmp_path / "tbl2")
    shutil.copytree(clustered, dest)
    bloomskip.build_bloom_index(spark, dest, "k")
    spark.createDataFrame([(100_000, 1)], "k long, v long").coalesce(
        1
    ).write.mode("append").parquet(dest)
    rows = bloomskip.bloom_read(spark, dest, "k", 100_000).collect()
    assert [r["k"] for r in rows] == [100_000]


def test_bloom_equality_matches_full_scan(spark, clustered):
    bloomskip.build_bloom_index(spark, clustered, "v")
    got = bloomskip.bloom_read(spark, clustered, "v", 42).count()
    want = (
        load_table(spark, clustered).filter(F.col("v") == 42).count()
    )
    assert got == want and want > 0
    # v is scattered across every file: bloom keeps them all (no
    # false negatives possible), and the result is still exact
    kept, skipped = bloomskip.bloom_prune(spark, clustered, "v", 42)
    assert not skipped


def test_bloom_prune_paths_agree(spark, clustered):
    """Driver-loop and semi-join prune implement ONE decision rule:
    identical (kept, skipped) on present, absent, and appended-file
    probes."""
    bloomskip.build_bloom_index(spark, clustered, "k")
    for probe in (4242, 10**9):  # present value / absent value
        via_driver = bloomskip.bloom_prune(
            spark, clustered, "k", probe, driver_limit=10**9
        )
        via_join = bloomskip.bloom_prune(
            spark, clustered, "k", probe, driver_limit=0
        )
        assert via_driver == via_join


def test_bloom_read_semijoin_no_false_negatives(spark, clustered, monkeypatch):
    monkeypatch.setattr(bloomskip, "DRIVER_PRUNE_LIMIT", 0)
    got = bloomskip.bloom_read(spark, clustered, "k", 4242)
    assert [tuple(r) for r in got.collect()] == [(4242, 4242 % 97)]
