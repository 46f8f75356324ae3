"""r13: IDENTITY partition layouts evolve metadata-only through
``set_partition_spec`` (previously refused — the r12 verdict's last
"missing" item).  The retired identity dirs enter the spec history as
``{"fn": "identity"}`` records; old files keep their hive dirs (their
stripped column reconstructs per file via basePath discovery —
``_identity_dir_keys``), new files carry the column in their footers,
and one snapshot mixes both layouts exactly.  Iceberg's per-file
spec-id contract, both directions."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [
            (
                k,
                datetime.datetime(2024, 1, 1 + (k % 6), 6, 0, 0),
                k * 2,
                k % 3,
            )
            for k in range(lo, hi)
        ],
        "k long, ts timestamp, v long, g long",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_identity_to_transform_metadata_only(spark, tmp_path):
    path = str(tmp_path / "i2t")
    versioned.commit(spark, _mk(spark, 0, 60), path, partition_by=["g"])
    man1 = versioned._resolve_manifest(path, None)
    files1 = sorted(man1["files"])
    assert all("g=" in f for f in files1)
    v = versioned.set_partition_spec(spark, path, ["day(ts)"])
    assert v == 2
    man2 = versioned._resolve_manifest(path, None)
    # metadata-only: not a byte moved
    assert sorted(man2["files"]) == files1
    assert man2["partition_spec_history"] == {
        "g": {"fn": "identity", "src": "g"}
    }
    # the old files' stripped g still reconstructs per file
    assert _rows(versioned.read(spark, path)) == _rows(_mk(spark, 0, 60))
    # appends land under the NEW spec, with g in their footers
    versioned.commit(spark, _mk(spark, 60, 90), path)
    man3 = versioned._resolve_manifest(path, None)
    new_files = sorted(set(man3["files"]) - set(files1))
    assert new_files and all("ts_day=" in f for f in new_files)
    assert all("g=" not in f for f in new_files)
    # the mixed snapshot answers exactly
    assert _rows(versioned.read(spark, path)) == _rows(_mk(spark, 0, 90))
    # pruning: g bounds kill old identity dirs; ts bounds kill new
    # day dirs — each file by whichever dir values its stats carry
    man = versioned._resolve_manifest(path, None)
    kept_g, _ = versioned._prune_manifest_files(man, {"g": (2, 2)})
    assert 0 < len(kept_g) < len(man["files"])
    assert all("g=0" not in f and "g=1" not in f for f in kept_g)
    lo = datetime.datetime(2024, 1, 1)
    hi = datetime.datetime(2024, 1, 2, 23, 59, 59)
    kept_ts, _ = versioned._prune_manifest_files(man, {"ts": (lo, hi)})
    assert 0 < len(kept_ts) < len(man["files"])
    got = versioned.read_where(spark, path, {"g": (2, 2)}).filter(
        "g = 2"
    )
    want = [t for t in _rows(_mk(spark, 0, 90)) if t[3] == 2]
    assert _rows(got) == sorted(want)


def test_transform_to_identity_metadata_only(spark, tmp_path):
    path = str(tmp_path / "t2i")
    versioned.commit(
        spark, _mk(spark, 0, 50), path, partition_by=["day(ts)"]
    )
    files1 = sorted(versioned._resolve_manifest(path, None)["files"])
    v = versioned.set_partition_spec(spark, path, ["g"])
    assert v == 2
    man2 = versioned._resolve_manifest(path, None)
    assert sorted(man2["files"]) == files1  # not a byte moved
    assert man2["partition_by"] == ["g"]
    assert versioned._partition_transforms(man2) == {}
    assert man2["partition_spec_history"] == {
        "ts_day": {"fn": "day", "src": "ts"}
    }
    versioned.commit(spark, _mk(spark, 50, 80), path)
    man3 = versioned._resolve_manifest(path, None)
    new_files = sorted(set(man3["files"]) - set(files1))
    assert new_files and all("g=" in f for f in new_files)
    assert _rows(versioned.read(spark, path)) == _rows(_mk(spark, 0, 80))
    # DML across the boundary rewrites touched files under the
    # ACTIVE identity spec and keeps answers exact
    v, n = versioned.delete_where(spark, path, "k % 10 = 3")
    assert n == 8
    want = [t for t in _rows(_mk(spark, 0, 80)) if t[0] % 10 != 3]
    assert _rows(versioned.read(spark, path)) == sorted(want)


def test_identity_round_trip_and_rekey_refusal(spark, tmp_path):
    path = str(tmp_path / "rt")
    versioned.commit(spark, _mk(spark, 0, 30), path, partition_by=["g"])
    versioned.set_partition_spec(spark, path, ["day(ts)"])
    # re-activating the identical identity spec pops its history row
    versioned.set_partition_spec(spark, path, ["g"])
    man = versioned._resolve_manifest(path, None)
    assert "g" not in man["partition_spec_history"]
    assert man["partition_spec_history"] == {
        "ts_day": {"fn": "day", "src": "ts"}
    }
    assert _rows(versioned.read(spark, path)) == _rows(_mk(spark, 0, 30))
    # appends after the round trip land back under stripped g dirs
    versioned.commit(spark, _mk(spark, 30, 45), path)
    man2 = versioned._resolve_manifest(path, None)
    newf = sorted(set(man2["files"]) - set(man["files"]))
    assert newf and all("g=" in f for f in newf)
    assert _rows(versioned.read(spark, path)) == _rows(_mk(spark, 0, 45))


def test_optimize_migrates_mixed_snapshot(spark, tmp_path):
    """OPTIMIZE after an identity evolution rewrites everything under
    the active spec — the bytes-moving migration, now optional."""
    path = str(tmp_path / "om")
    versioned.commit(spark, _mk(spark, 0, 40), path, partition_by=["g"])
    versioned.set_partition_spec(spark, path, ["day(ts)"])
    versioned.commit(spark, _mk(spark, 40, 60), path)
    versioned.optimize(spark, path)
    man = versioned._resolve_manifest(path, None)
    assert all("g=" not in f for f in man["files"])
    assert _rows(versioned.read(spark, path)) == _rows(_mk(spark, 0, 60))
