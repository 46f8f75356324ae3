"""Round-8 advisor findings, pinned.

1. (high) versioned_datasource.latestOffset walked the contiguous
   frontier from startingVersion on every reader instantiation; after
   a routine vacuum(keep_versions=K) the hole at the vacuumed range
   raised FileNotFoundError on every trigger, so a RESTARTED stream
   whose checkpoint was already past the vacuumed range could never
   run again.  Fixed: the walk seeds at the retained horizon
   (oldest committed version - 1); the loud error stays in
   _files_between, which knows the batch range the stream needs.
2. (medium) a FAILED footer read in zonemap._read_zones returned
   n_rows=0 — indistinguishable from a genuinely empty file — so
   versioned commit recorded the file as trustworthy-empty forever:
   row_count answered 0 and read_where always pruned it.  Fixed:
   failure is n_rows=-1, and commit raises (the files were just
   written by this job; an unreadable footer is a real error).
3. (low) merge_into's duplicate-source check aggregated with
   .count(), whose output column "count" is ambiguous whenever a key
   column is itself named count.  Fixed: a reserved alias.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned
from integritychecksforvldbs_spark.sources.zonemap import _read_zones


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# 1. stream restart survives vacuum of versions behind its checkpoint
# ---------------------------------------------------------------------------


def _stream_reader(path, starting_version=0):
    from pyspark.sql.types import LongType, StructField, StructType

    from integritychecksforvldbs_spark.sources.versioned_datasource import (
        _VersionedStreamReader,
    )

    return _VersionedStreamReader(
        path, starting_version,
        StructType([StructField("k", LongType(), True)]),
    )


def test_restarted_stream_survives_vacuum_behind_checkpoint(
    spark, tmp_path
):
    """Twelve commits (checkpoint at v10), vacuum retains the last
    two: a reader whose checkpoint (batch start) is past the vacuumed
    range must keep running — latestOffset seeds at the retained
    horizon instead of raising on the expired hole."""
    path = str(tmp_path / "tbl")
    for i in range(12):
        versioned.commit(spark, _mk(spark, i * 3, (i + 1) * 3), path)
    versioned.vacuum(path, keep_versions=2, min_age_s=0)
    # v11 checkpointed, chain expired: only the retained tail remains
    assert versioned._versions(path) == [11, 12]
    r = _stream_reader(path)  # a RESTART re-instantiates the reader
    assert r.latestOffset() == {"version": 12}
    # the batch its checkpoint actually needs resolves fine
    files = r._files_between(11, 12)
    assert len(files) >= 1
    # a second trigger keeps working (frontier caches past the hole)
    assert r.latestOffset() == {"version": 12}


def test_replay_from_vacuumed_range_still_fails_loudly(spark, tmp_path):
    """The loud error lives where it belongs: a batch RANGE that needs
    an expired manifest cannot be served and must not be skipped."""
    path = str(tmp_path / "tbl")
    for i in range(12):
        versioned.commit(spark, _mk(spark, i * 3, (i + 1) * 3), path)
    versioned.vacuum(path, keep_versions=2, min_age_s=0)
    r = _stream_reader(path)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        r._files_between(0, 12)


def test_mid_log_hole_still_raises(spark, tmp_path):
    """An EXTERNALLY damaged log (hole between retained manifests) is
    not the vacuum case and still fails loudly at latestOffset."""
    path = str(tmp_path / "tbl")
    for i in range(3):
        versioned.commit(spark, _mk(spark, i * 3, (i + 1) * 3), path)
    os.unlink(os.path.join(path, "_versions", "v0000000002.json"))
    r = _stream_reader(path)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        r.latestOffset()


# ---------------------------------------------------------------------------
# 2. footer-read failure is an error, never "empty"
# ---------------------------------------------------------------------------


def test_read_zones_distinguishes_failure_from_empty(spark, tmp_path):
    good = str(tmp_path / "good")
    _mk(spark, 0, 10).coalesce(1).write.parquet(good)
    fname = next(
        os.path.join(good, n)
        for n in os.listdir(good)
        if n.endswith(".parquet")
    )
    e = _read_zones(fname, ["k"])["k"]
    assert e.n_rows == 10 and e.has_stats
    # truncate the file: the footer read now FAILS
    with open(fname, "r+b") as f:
        f.truncate(8)
    bad = _read_zones(fname, ["k"])["k"]
    assert bad.n_rows == -1 and not bad.has_stats
    # a genuinely empty part-file is trustworthy n_rows=0
    empty = str(tmp_path / "empty")
    _mk(spark, 0, 10).filter("k < 0").coalesce(1).write.parquet(empty)
    ename = next(
        os.path.join(empty, n)
        for n in os.listdir(empty)
        if n.endswith(".parquet")
    )
    ez = _read_zones(ename, ["k"])["k"]
    assert ez.n_rows == 0


def test_commit_refuses_unreadable_footer_instead_of_empty_stats(
    spark, tmp_path, monkeypatch
):
    """The poisoned-manifest scenario: if a freshly written file's
    footer cannot be read at census time, commit must raise — not
    record n_rows=0 and let row_count/read_where silently drop the
    file's rows forever."""
    from integritychecksforvldbs_spark.sources import zonemap

    path = str(tmp_path / "tbl")
    orig = zonemap.build_zone_maps

    def failing(spark_, data_dir, columns):
        zm = orig(spark_, data_dir, columns)
        return {
            c: [
                zonemap.ZoneEntry(e.path, -1, None, None, 0, False)
                for e in entries
            ]
            for c, entries in zm.items()
        }

    monkeypatch.setattr(zonemap, "build_zone_maps", failing)
    with pytest.raises(IOError, match="unreadable"):
        versioned.commit(spark, _mk(spark, 0, 5), path)
    # nothing committed: the table has no poisoned version
    assert versioned._versions(path) == []


def test_empty_dataframe_commit_still_records_trustworthy_zero(
    spark, tmp_path
):
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 5).filter("k < 0"), path)
    assert versioned.row_count(spark, path) == 0


# ---------------------------------------------------------------------------
# 3. merge_into works when a key column is named "count"
# ---------------------------------------------------------------------------


def test_merge_into_key_column_named_count(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "count long, v string"),
        path,
    )
    src = spark.createDataFrame([(2, "B"), (3, "c")], "count long, v string")
    versioned.merge_into(spark, path, src, keys=["count"])
    assert _rows(versioned.read(spark, path)) == [
        (1, "a"), (2, "B"), (3, "c")
    ]
    # and the duplicate-source error still fires under that name
    dup = spark.createDataFrame(
        [(9, "x"), (9, "y")], "count long, v string"
    )
    with pytest.raises(ValueError, match="not unique"):
        versioned.merge_into(spark, path, dup, keys=["count"])
