"""Small-file compaction: census → plan → rewrite, row-identical
output, file counts bounded by the plan, and sorted compaction
producing disjoint per-file key ranges (the footer-pruning layout)."""

from __future__ import annotations

import os

import pytest
import pyarrow.parquet as pq

from integritychecksforvldbs_spark.sources import maintenance as mnt
from integritychecksforvldbs_spark.sources.loader import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fragmented(spark, tmp_path_factory):
    """documents shattered into ~40 tiny part files."""
    d = str(tmp_path_factory.mktemp("frag"))
    load_table(spark, f"{SF_DIR}/documents.parquet").repartition(40).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_census_and_plan(fragmented):
    stats = mnt.table_file_stats(fragmented)
    assert stats.n_files == 40
    assert stats.total_bytes > 0
    # tiny fixture vs 256 MB target -> everything fits one file
    assert mnt.compaction_plan(stats) == 1
    assert mnt.needs_compaction(stats)
    # a table already at target density does not need compaction
    healthy = mnt.FileStats(n_files=4, total_bytes=4 * mnt.DEFAULT_TARGET_BYTES)
    assert not mnt.needs_compaction(healthy)
    assert not mnt.needs_compaction(mnt.FileStats(1, 10))  # single file never


def test_compact_row_identical(spark, fragmented, tmp_path):
    dest = str(tmp_path / "compacted")
    before, after = mnt.compact_table(spark, fragmented, dest)
    assert before.n_files == 40 and after.n_files == 1
    src_rows = sorted(
        tuple(r) for r in load_table(spark, fragmented).collect()
    )
    dst_rows = sorted(tuple(r) for r in load_table(spark, dest).collect())
    assert src_rows == dst_rows


def test_compact_respects_target_bytes(spark, fragmented, tmp_path):
    """A small target forces multiple output files per the plan."""
    stats = mnt.table_file_stats(fragmented)
    target = stats.total_bytes // 3  # -> plan of 4 files (ceil 3.x)
    dest = str(tmp_path / "split")
    _, after = mnt.compact_table(spark, fragmented, dest, target_bytes=target)
    assert after.n_files == mnt.compaction_plan(stats, target)
    assert after.n_files >= 3


def test_sorted_compaction_disjoint_ranges(spark, fragmented, tmp_path):
    """sort_by writes range-partitioned files whose parquet footer
    min/max doc_id ranges are pairwise disjoint — the layout that lets
    range predicates skip whole files."""
    stats = mnt.table_file_stats(fragmented)
    dest = str(tmp_path / "sorted")
    mnt.compact_table(
        spark,
        fragmented,
        dest,
        target_bytes=stats.total_bytes // 3,
        sort_by=["doc_id"],
    )
    ranges = []
    for f in os.listdir(dest):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(dest, f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = min(
            md.row_group(g).column(idx["doc_id"]).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx["doc_id"]).statistics.max
            for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 3
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next


# ---------------------------------------------------------------------------
# z-order compaction
# ---------------------------------------------------------------------------


def _file_ranges(dest: str, col: str) -> list[tuple]:
    """Per-file (min, max) footer statistics for ``col``."""
    out = []
    for f in os.listdir(dest):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(dest, f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = min(
            md.row_group(g).column(idx[col]).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx[col]).statistics.max
            for g in range(md.num_row_groups)
        )
        out.append((lo, hi))
    return out


def _files_overlapping(ranges: list[tuple], lo, hi) -> int:
    return sum(1 for a, b in ranges if not (b < lo or a > hi))


def test_zorder_row_identical(spark, fragmented, tmp_path):
    dest = str(tmp_path / "zordered")
    before, after = mnt.zorder_compact(
        spark, fragmented, dest, zorder_by=["doc_id", "n_chars"]
    )
    assert before.n_files == 40 and after.n_files == 1
    src_rows = sorted(tuple(r) for r in load_table(spark, fragmented).collect())
    dst_rows = sorted(tuple(r) for r in load_table(spark, dest).collect())
    assert src_rows == dst_rows


def test_zorder_skips_on_both_columns(spark, fragmented, tmp_path):
    """The point of the z-curve: with files range-partitioned on the
    interleaved key, BOTH doc_id and n_chars footer ranges are
    selective.  A single-column sort gives its trailing column
    full-span ranges in every file (zero skipping)."""
    stats = mnt.table_file_stats(fragmented)
    target = stats.total_bytes // 7  # -> 8 output files
    zdest = str(tmp_path / "z")
    mnt.zorder_compact(
        spark, fragmented, zdest, zorder_by=["doc_id", "n_chars"],
        target_bytes=target,
    )
    sdest = str(tmp_path / "s")
    mnt.compact_table(
        spark, fragmented, sdest, target_bytes=target, sort_by=["doc_id"]
    )
    n_files = len(_file_ranges(zdest, "doc_id"))
    assert n_files >= 6

    rows = load_table(spark, fragmented).select("doc_id", "n_chars").collect()
    ids = sorted(r["doc_id"] for r in rows)
    chars = sorted(r["n_chars"] for r in rows)
    # quarter-range predicate on each dimension
    id_lo, id_hi = ids[0], ids[len(ids) // 4]
    ch_lo, ch_hi = chars[0], chars[len(chars) // 4]

    z_id = _files_overlapping(_file_ranges(zdest, "doc_id"), id_lo, id_hi)
    z_ch = _files_overlapping(_file_ranges(zdest, "n_chars"), ch_lo, ch_hi)
    s_id = _files_overlapping(_file_ranges(sdest, "doc_id"), id_lo, id_hi)
    s_ch = _files_overlapping(_file_ranges(sdest, "n_chars"), ch_lo, ch_hi)

    # sort_by its leading column: perfect pruning there...
    assert s_id <= 2
    # ...but the trailing dimension spans every file
    assert s_ch == n_files
    # z-order prunes on BOTH dimensions
    assert z_id < n_files
    assert z_ch < n_files
    # and is strictly better than linear sort on the non-sort dimension
    assert z_ch < s_ch


def test_zorder_nulls_cluster_low(spark, tmp_path):
    """NULL key values land in bucket 0 — clustered, not scattered."""
    import pyspark.sql.functions as F

    df = spark.range(0, 400).select(
        F.col("id").alias("a"),
        F.when(F.col("id") % 7 == 0, None).otherwise(400 - F.col("id")).alias("b"),
    )
    src = str(tmp_path / "nsrc")
    df.repartition(10).write.mode("overwrite").parquet(src)
    dest = str(tmp_path / "nz")
    stats = mnt.table_file_stats(src)
    mnt.zorder_compact(
        spark, src, dest, zorder_by=["a", "b"],
        target_bytes=max(1, stats.total_bytes // 4),
    )
    got = sorted(tuple(r) for r in load_table(spark, dest).collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
