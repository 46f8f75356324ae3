"""File-scoped DELETE and MERGE: only the touched files are rewritten.

The r7-era implementations rewrote the WHOLE snapshot as an overwrite
commit — O(table) IO for a one-row upsert.  Both operations now probe
which files hold matching rows (column-pruned, filter-pushed scan),
rewrite only those, and commit the swap as a replace delta — the Delta
DELETE/MERGE rewrite discipline, where a selective mutation on a
clustered layout touches a handful of files out of millions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


@pytest.fixture()
def banded(spark, tmp_path):
    """Five single-file commits with disjoint key bands 0-9 ... 40-49,
    so per-file stats make every file's touch-set provable."""
    path = str(tmp_path / "tbl")
    for i in range(5):
        versioned.commit(
            spark, _mk(spark, i * 10, (i + 1) * 10).coalesce(1), path
        )
    return path


def test_delete_rewrites_only_files_holding_matches(spark, banded):
    path = banded
    before = versioned._snapshot(path, 5)["files"]
    v, n = versioned.delete_where(spark, path, "k >= 23 AND k <= 27")
    assert n == 5
    raw = versioned._read_manifest(path, v)
    # exactly ONE file (the 20-29 band) was swapped
    assert len(raw["remove_files"]) == 1
    assert len(raw["add_files"]) == 1
    untouched = set(before) - set(raw["remove_files"])
    after = set(versioned._snapshot(path, v)["files"])
    assert untouched < after  # the other four files: same bytes, same entries
    assert _rows(
        versioned.read(spark, path).select("k")
    ) == [(i,) for i in range(50) if not (23 <= i <= 27)]
    # carried stats still fold correctly for the untouched bands
    summ = versioned.stats_summary(path, ["k"])
    assert summ["k"] == {"min": 0, "max": 49, "n_nulls": 0, "ok": True}


def test_delete_whole_file_band_adds_no_files(spark, banded):
    path = banded
    v, n = versioned.delete_where(spark, path, "k >= 10 AND k < 20")
    assert n == 10
    raw = versioned._read_manifest(path, v)
    assert len(raw["remove_files"]) == 1 and raw["add_files"] == []
    assert versioned.row_count(spark, path) == 40


def test_delete_no_match_is_data_change_false_audit(spark, banded):
    path = banded
    v, n = versioned.delete_where(spark, path, "k > 999")
    assert n == 0
    raw = versioned._read_manifest(path, v)
    assert raw["data_change"] is False
    assert raw["remove_files"] == [] and raw["add_files"] == []
    # the audit version burns no stream: a reader crossing it emits
    # nothing and does not raise (data_change=false skip)
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from integritychecksforvldbs_spark.sources.versioned_datasource import (
        _VersionedStreamReader,
    )

    r = _VersionedStreamReader(
        path,
        0,
        StructType(
            [
                StructField("k", LongType(), True),
                StructField("v", StringType(), True),
            ]
        ),
    )
    assert r._files_between(v - 1, v) == []


def test_merge_rewrites_only_files_holding_matched_keys(spark, banded):
    path = banded
    before = versioned._snapshot(path, 5)["files"]
    src = spark.createDataFrame(
        [(35, "UPDATED"), (999, "NEW")], "k long, v string"
    )
    # strategy="copy" pins the copy-on-write physical form this test
    # is about (auto would take the merge-on-read DV path for a
    # 1-of-10-rows match; that shape is pinned in test_versioned_dv.py)
    v = versioned.merge_into(spark, path, src, keys=["k"], strategy="copy")
    raw = versioned._read_manifest(path, v)
    # only the 30-39 band held a matched key
    assert len(raw["remove_files"]) == 1
    assert set(before) - set(raw["remove_files"]) < set(
        versioned._snapshot(path, v)["files"]
    )
    got = dict(
        (r["k"], r["v"]) for r in versioned.read(spark, path).collect()
    )
    assert got[35] == "UPDATED" and got[999] == "NEW" and len(got) == 51
    assert got[34] == "v34"  # neighbors in the rewritten file survive


def test_merge_insert_only_touches_nothing(spark, banded):
    path = banded
    src = spark.createDataFrame([(100, "x"), (101, "y")], "k long, v string")
    v = versioned.merge_into(spark, path, src, keys=["k"])
    raw = versioned._read_manifest(path, v)
    assert raw["remove_files"] == []  # pure insert: zero rewrites
    assert versioned.row_count(spark, path) == 52


def test_merge_on_null_key_still_file_scoped(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(
        spark,
        spark.createDataFrame(
            [(None, "n"), (1, "a")], "k long, v string"
        ).coalesce(1),
        path,
    )
    versioned.commit(
        spark,
        spark.createDataFrame([(2, "b")], "k long, v string").coalesce(1),
        path,
    )
    src = spark.createDataFrame([(None, "N")], "k long, v string")
    v = versioned.merge_into(spark, path, src, keys=["k"])
    raw = versioned._read_manifest(path, v)
    assert len(raw["remove_files"]) == 1  # only the NULL-holding file
    assert _rows(versioned.read(spark, path)) == [
        (1, "a"), (2, "b"), (None, "N")  # None sorts last in _rows
    ]


def test_delete_plus_vacuum_is_physical_erasure(spark, tmp_path):
    """The right-to-be-forgotten contract, end to end: after a
    file-scoped DELETE and vacuum(keep_versions=1), the deleted rows'
    file is GONE FROM DISK — even though live sibling files share its
    directory — and no retained version can resolve the rows.
    (r8 self-review high finding: the replace-delta DELETE plus
    chain-pinning vacuum silently kept erased data readable; vacuum
    now checkpoints the oldest retained tip and reclaims at file
    granularity.)"""
    import os

    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 300), path)
    # cluster into 3 banded files sharing ONE data directory
    versioned.optimize(spark, path, zorder_by=["k"], n_files=3)
    v_del, n = versioned.delete_where(spark, path, "k >= 0 AND k <= 50")
    raw = versioned._read_manifest(path, v_del)
    assert len(raw["remove_files"]) == 1
    victim = versioned._local(raw["remove_files"][0])
    siblings = [
        versioned._local(f)
        for f in versioned._snapshot(path, v_del)["files"]
        if os.path.dirname(versioned._local(f)) == os.path.dirname(victim)
    ]
    assert os.path.exists(victim) and siblings
    removed = versioned.vacuum(path, keep_versions=1, min_age_s=0)
    assert victim in removed
    assert not os.path.exists(victim)  # the PII bytes are GONE
    for s in siblings:
        assert os.path.exists(s)  # live files in the same dir survive
    # the retained tip got a checkpoint and still answers exactly
    assert versioned._versions(path) == [v_del]
    assert versioned.read(spark, path).count() == 300 - n
    with pytest.raises(FileNotFoundError):
        versioned.read(spark, path, version=v_del - 1)
