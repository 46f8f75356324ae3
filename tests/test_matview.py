"""Incremental materialized rollups (sources/matview.py): refresh
folds the change feed into the rollup and must equal a full rebuild
bit-for-bit on integer measures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import matview, versioned

KEYS = ["g"]
MEASURES = {"cents": "cents"}


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, cents long")


def _snap(spark, rollup):
    return {
        (r["g"]): (r["n_rows"], r["cents"])
        for r in matview.read_rollup(spark, rollup).collect()
    }


def _rebuild_snap(spark, table, tmp_path, name):
    p = str(tmp_path / name)
    matview.build_rollup(spark, table, p, KEYS, MEASURES)
    return _snap(spark, p)


def test_refresh_after_append_equals_rebuild(spark, tmp_path):
    tbl, rp = str(tmp_path / "t"), str(tmp_path / "r")
    versioned.commit(spark, _mk(spark, [("a", 1, 10), ("b", 2, 20)]), tbl)
    matview.build_rollup(spark, tbl, rp, KEYS, MEASURES)
    assert _snap(spark, rp) == {"a": (1, 10), "b": (1, 20)}
    versioned.commit(
        spark, _mk(spark, [("a", 3, 5), ("c", 4, 7)]), tbl
    )
    v, src_v = matview.refresh_rollup(spark, tbl, rp)
    assert src_v == 2
    got = _snap(spark, rp)
    assert got == {"a": (2, 15), "b": (1, 20), "c": (1, 7)}
    assert got == _rebuild_snap(spark, tbl, tmp_path, "r2")


def test_refresh_after_delete_subtracts_and_drops_empty_keys(spark, tmp_path):
    tbl, rp = str(tmp_path / "t"), str(tmp_path / "r")
    versioned.commit(
        spark,
        _mk(spark, [("a", 1, 10), ("a", 2, 4), ("b", 3, 20)]),
        tbl,
    )
    matview.build_rollup(spark, tbl, rp, KEYS, MEASURES)
    versioned.delete_where(spark, tbl, "g = 'b' OR id = 2")
    matview.refresh_rollup(spark, tbl, rp)
    got = _snap(spark, rp)
    assert got == {"a": (1, 10)}  # b vanished entirely, a shrank
    assert got == _rebuild_snap(spark, tbl, tmp_path, "r2")


def test_refresh_noop_when_source_unmoved(spark, tmp_path):
    tbl, rp = str(tmp_path / "t"), str(tmp_path / "r")
    versioned.commit(spark, _mk(spark, [("a", 1, 10)]), tbl)
    v0, s0 = matview.build_rollup(spark, tbl, rp, KEYS, MEASURES)
    v1, s1 = matview.refresh_rollup(spark, tbl, rp)
    assert (v1, s1) == (v0, s0)  # no empty commit
    assert len(versioned.history(rp)) == 1


def test_compaction_rewrite_diffs_to_empty_feed(spark, tmp_path):
    tbl, rp = str(tmp_path / "t"), str(tmp_path / "r")
    versioned.commit(spark, _mk(spark, [("a", 1, 10), ("b", 2, 20)]), tbl)
    versioned.commit(spark, _mk(spark, [("c", 3, 30)]), tbl)
    matview.build_rollup(spark, tbl, rp, KEYS, MEASURES)
    versioned.compact(spark, tbl, n_files=1)  # layout-only rewrite
    matview.refresh_rollup(spark, tbl, rp)
    assert _snap(spark, rp) == {"a": (1, 10), "b": (1, 20), "c": (1, 30)}


def test_merge_into_source_reflected(spark, tmp_path):
    tbl, rp = str(tmp_path / "t"), str(tmp_path / "r")
    versioned.commit(spark, _mk(spark, [("a", 1, 10), ("b", 2, 20)]), tbl)
    matview.build_rollup(spark, tbl, rp, KEYS, MEASURES)
    # upsert: id 2 moves from b/20 to a/25, id 5 lands new in b
    versioned.merge_into(
        spark, tbl, _mk(spark, [("a", 2, 25), ("b", 5, 1)]), ["id"]
    )
    matview.refresh_rollup(spark, tbl, rp)
    got = _snap(spark, rp)
    assert got == {"a": (2, 35), "b": (1, 1)}
    assert got == _rebuild_snap(spark, tbl, tmp_path, "r2")


def test_reserved_and_missing_metadata_rejected(spark, tmp_path):
    tbl, rp = str(tmp_path / "t"), str(tmp_path / "r")
    versioned.commit(spark, _mk(spark, [("a", 1, 10)]), tbl)
    with pytest.raises(ValueError, match="n_rows"):
        matview.build_rollup(spark, tbl, rp, KEYS, {"n_rows": "cents"})
    versioned.commit(spark, _mk(spark, [("a", 1, 10)]), str(tmp_path / "r"))
    with pytest.raises(ValueError, match="rollup metadata"):
        matview.refresh_rollup(spark, tbl, str(tmp_path / "r"))


def test_rollup_is_itself_versioned(spark, tmp_path):
    """Every refresh is a new rollup version — the rollup time-travels
    like any table, so 'what did the aggregate say yesterday' stays
    answerable."""
    tbl, rp = str(tmp_path / "t"), str(tmp_path / "r")
    versioned.commit(spark, _mk(spark, [("a", 1, 10)]), tbl)
    matview.build_rollup(spark, tbl, rp, KEYS, MEASURES)
    versioned.commit(spark, _mk(spark, [("a", 2, 7)]), tbl)
    matview.refresh_rollup(spark, tbl, rp)
    v1 = {
        r["g"]: r["cents"]
        for r in versioned.read(spark, rp, version=1).collect()
    }
    assert v1 == {"a": 10}
    assert _snap(spark, rp) == {"a": (2, 17)}


def test_refresh_folds_dv_deletes_and_updates(spark, tmp_path):
    """The change feed is deletion-vector-aware (r9), so a rollup
    refresh across merge-on-read DML equals a full rebuild."""
    tbl, rp = str(tmp_path / "t"), str(tmp_path / "r")
    versioned.commit(
        spark,
        _mk(spark, [("a", 1, 10), ("a", 2, 25), ("b", 3, 1), ("b", 4, 6)]),
        tbl,
    )
    matview.build_rollup(spark, tbl, rp, KEYS, MEASURES)
    versioned.delete_where(spark, tbl, "id = 2", strategy="dv")
    versioned.update_where(
        spark, tbl, "id = 3", {"cents": "cents + 100"}, strategy="dv"
    )
    matview.refresh_rollup(spark, tbl, rp)
    got = _snap(spark, rp)
    assert got == {"a": (1, 10), "b": (2, 107)}
    assert got == _rebuild_snap(spark, tbl, tmp_path, "r2")
