"""Zone-map data skipping (sources/zonemap.py): pruning really skips
files on a sorted layout, never loses rows, and keeps stats-less
files."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import zonemap
from integritychecksforvldbs_spark.sources.loader import load_table
from integritychecksforvldbs_spark.sources.maintenance import compact_table

SF_DIR = "/root/testdata/sf0.001"
# o_orderdate is a parquet timestamp — zone bounds are timestamps too
LO, HI = datetime(1996, 1, 1), datetime(1996, 12, 31, 23, 59, 59)


@pytest.fixture(scope="module")
def sorted_orders(spark, tmp_path_factory):
    """orders rewritten date-sorted into 8 files with disjoint
    o_orderdate ranges via sorted compaction — whose write path must
    emit stats-bearing TIMESTAMP_MICROS (Spark's default INT96 has NO
    footer min/max, which would silently disable all pruning)."""
    dest = str(tmp_path_factory.mktemp("zm") / "orders_by_date")
    compact_table(
        spark,
        f"{SF_DIR}/orders.parquet",
        dest,
        target_bytes=max(1, table_bytes(f"{SF_DIR}/orders.parquet") // 8),
        sort_by=["o_orderdate"],
    )
    return dest


def table_bytes(path: str) -> int:
    import os

    return os.path.getsize(path)


def test_zone_map_covers_all_files(spark, sorted_orders):
    zm = zonemap.build_zone_map(spark, sorted_orders, "o_orderdate")
    assert len(zm) >= 4  # compaction planned ~8 range-disjoint files
    assert all(e.has_stats for e in zm)
    total = load_table(spark, f"{SF_DIR}/orders.parquet").count()
    assert sum(e.n_rows for e in zm) == total


def test_pruning_skips_files_and_loses_nothing(spark, sorted_orders):
    zm = zonemap.build_zone_map(spark, sorted_orders, "o_orderdate")
    kept, skipped = zonemap.prune_files(zm, LO, HI)
    assert skipped, "a year filter over a date-sorted layout must skip files"
    assert len(kept) + len(skipped) == len(zm)

    got = zonemap.zonemap_read(spark, sorted_orders, "o_orderdate", LO, HI)
    want = (
        load_table(spark, f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderdate").between(F.lit(LO), F.lit(HI)))
    )
    assert got.count() == want.count()
    assert (
        got.agg(F.sum("o_orderkey")).collect()[0][0]
        == want.agg(F.sum("o_orderkey")).collect()[0][0]
    )


def test_unsorted_layout_prunes_nothing_but_stays_correct(spark):
    """On the raw (unsorted) table every file overlaps the range —
    nothing skips, the result is still exact."""
    src = f"{SF_DIR}/orders.parquet"
    zm = zonemap.build_zone_map(spark, src, "o_orderdate")
    kept, skipped = zonemap.prune_files(zm, LO, HI)
    assert not skipped
    got = zonemap.zonemap_read(spark, src, "o_orderdate", LO, HI).count()
    want = (
        load_table(spark, src)
        .filter(F.col("o_orderdate").between(F.lit(LO), F.lit(HI)))
        .count()
    )
    assert got == want


def test_empty_range_returns_empty_with_schema(spark, sorted_orders):
    out = zonemap.zonemap_read(
        spark, sorted_orders, "o_orderdate", datetime(2050, 1, 1), datetime(2050, 1, 2)
    )
    assert out.count() == 0
    assert "o_totalprice" in out.columns


def test_statsless_files_are_never_skipped(spark, tmp_path):
    """Files written without statistics must always be scanned."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dest = tmp_path / "nostats"
    dest.mkdir()
    pq.write_table(
        pa.table({"k": [1, 2, 3]}),
        str(dest / "part-0.parquet"),
        write_statistics=False,
    )
    pq.write_table(pa.table({"k": [100, 101]}), str(dest / "part-1.parquet"))
    zm = zonemap.build_zone_map(spark, str(dest), "k")
    by_stats = {e.has_stats: e for e in zm}
    assert False in by_stats and True in by_stats
    kept, skipped = zonemap.prune_files(zm, 1, 3)
    # the stats file (100..101) skips; the stats-less one must stay
    assert by_stats[False].path in kept and by_stats[True].path in skipped
    rows = zonemap.zonemap_read(spark, str(dest), "k", 1, 3).collect()
    assert sorted(r["k"] for r in rows) == [1, 2, 3]


def test_missing_column_never_skips(spark, sorted_orders):
    zm = zonemap.build_zone_map(spark, sorted_orders, "no_such_col")
    assert all(not e.has_stats for e in zm)
    kept, skipped = zonemap.prune_files(zm, 0, 1)
    assert not skipped
