"""Round-9 ADVICE + verdict fixes on the versioned log.

1. vacuum expires manifests NEWEST-FIRST, so a crash (or concurrent
   reader) at any intermediate state leaves only delta chains that
   still resolve — and a log a pre-r9 interrupted vacuum already broke
   (orphan delta whose base is gone) no longer bricks history()/
   vacuum() forever (ADVICE r9, medium, versioned.py vacuum).
2. version_at walks the log newest-first and stops at the first
   version committed at-or-before the timestamp — O(versions-after)
   manifest reads, not a full-log JSON parse per TIMESTAMP AS OF
   (ADVICE r9, low).
3. The ``_latest`` pointer (Delta's ``_last_checkpoint`` idea): one
   GET plus a bounded forward probe resolves the latest version — no
   full log LIST per read (VERDICT r8 "Next round" #2); correctness
   never depends on it (stale-low pointers probe forward, missing/
   damaged pointers fall back to the listing).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# 1. vacuum expiry order + broken-chain resilience
# ---------------------------------------------------------------------------


def test_vacuum_expires_manifests_newest_first(spark, tmp_path, monkeypatch):
    """The removal sequence vacuum issues is strictly descending, so a
    delta is always removed before the base it folds through."""
    path = str(tmp_path / "tbl")
    for i in range(7):  # v1..v7: v1 full, v2..v7 deltas (ckpt at 10 never hit)
        versioned.commit(spark, _mk(spark, i, i + 1), path)
    removed_order = []
    orig = versioned._remove_manifest

    def spy(p, v):
        removed_order.append(v)
        orig(p, v)

    monkeypatch.setattr(versioned, "_remove_manifest", spy)
    versioned.vacuum(path, keep_versions=2, min_age_s=0.0)
    expired = [v for v in removed_order if v <= 5]
    assert expired == sorted(expired, reverse=True), removed_order
    # survivors still read
    assert len(_rows(versioned.read(spark, path))) == 7


def test_vacuum_survives_pre_r9_broken_chain(spark, tmp_path):
    """A log where an interrupted ascending-order vacuum deleted a
    delta's base but not the delta itself: history() skips the
    unresolvable expired delta instead of raising, vacuum() completes
    and removes the orphan manifest, and the retained tip still
    reads."""
    path = str(tmp_path / "tbl")
    for i in range(5):  # v1 full, v2..v5 deltas
        versioned.commit(spark, _mk(spark, i, i + 1), path)
    # materialize the tip's fold as a checkpoint (what a completed
    # vacuum would have done), then simulate the interrupted state:
    # v1 (the base) deleted, v2 (an expired delta) still present
    versioned._write_checkpoint(path, 5)
    versioned._remove_manifest(path, 1)
    # history() must not raise, and must still report the resolvable tip
    hist = versioned.history(path)
    assert 5 in [vi.version for vi in hist]
    assert 2 not in [vi.version for vi in hist]  # unresolvable orphan skipped
    # vacuum can now run to completion and removes the orphan manifest
    versioned.vacuum(path, keep_versions=1, min_age_s=0.0)
    assert versioned._read_manifest(path, 2) is None
    assert len(_rows(versioned.read(spark, path))) == 5
    # and a second vacuum is a no-op, not an error
    versioned.vacuum(path, keep_versions=1, min_age_s=0.0)


# ---------------------------------------------------------------------------
# 2. version_at: newest-first early stop
# ---------------------------------------------------------------------------


def test_version_at_reads_o_versions_after_timestamp(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "tbl")
    for i in range(12):
        versioned.commit(spark, _mk(spark, i, i + 1), path)
    ts_latest = versioned._committed_at(
        path, 12, versioned._read_manifest(path, 12)
    )
    reads = []
    orig = versioned._read_manifest

    def spy(p, v):
        reads.append(v)
        return orig(p, v)

    monkeypatch.setattr(versioned, "_read_manifest", spy)
    assert versioned.version_at(path, ts_latest + 1.0) == 12
    # newest-first with early stop: one manifest read, not twelve
    assert len(reads) == 1 and reads[0] == 12
    reads.clear()
    ts_v10 = versioned._committed_at(
        path, 10, versioned._read_manifest(path, 10)
    )
    monkeypatch.setattr(versioned, "_read_manifest", spy)
    assert versioned.version_at(path, ts_v10) == 10
    assert set(reads) == {12, 11, 10}


def test_version_at_still_errors_before_first_commit(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 3), path)
    ts = versioned._committed_at(path, 1, versioned._read_manifest(path, 1))
    with pytest.raises(FileNotFoundError):
        versioned.version_at(path, ts - 100.0)


# ---------------------------------------------------------------------------
# 3. the _latest pointer
# ---------------------------------------------------------------------------


def test_latest_pointer_bounds_manifest_io(spark, tmp_path, monkeypatch):
    """On a long log, resolving the latest version costs one hint GET
    + one manifest read + one miss probe — not O(#versions) listing
    plus reads (the object-store LIST-per-read hazard)."""
    path = str(tmp_path / "tbl")
    for i in range(25):
        versioned.commit(spark, _mk(spark, i, i + 1), path)
    reads, lists = [], []
    orig_read, orig_versions = versioned._read_manifest, versioned._versions

    def spy_read(p, v):
        reads.append(v)
        return orig_read(p, v)

    def spy_versions(p):
        lists.append(p)
        return orig_versions(p)

    monkeypatch.setattr(versioned, "_read_manifest", spy_read)
    monkeypatch.setattr(versioned, "_versions", spy_versions)
    v, man = versioned._latest_committed(path)
    assert v == 25 and man["version"] == 25
    assert lists == []  # never listed the log
    # hint read + v25 body (+ its delta chain fold) + one v26 miss;
    # chain length is bounded by CHECKPOINT_EVERY, never O(history)
    assert len(reads) <= versioned.CHECKPOINT_EVERY + 2


def test_latest_pointer_stale_low_probes_forward(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for i in range(5):
        versioned.commit(spark, _mk(spark, i, i + 1), path)
    # regress the pointer as a lagging racer would leave it
    versioned._write_latest_hint(path, 2)
    v, man = versioned._latest_committed(path)
    assert v == 5
    assert len(_rows(versioned.read(spark, path))) == 5


def test_latest_pointer_missing_or_damaged_falls_back(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for i in range(3):
        versioned.commit(spark, _mk(spark, i, i + 1), path)
    hint = os.path.join(path, "_versions", "_latest.json")
    os.unlink(hint)  # a table predating the pointer
    assert versioned._latest_committed(path)[0] == 3
    with open(hint, "w") as f:
        f.write("{not json")  # a torn/damaged pointer
    assert versioned._latest_committed(path)[0] == 3
    with open(hint, "w") as f:
        json.dump({"version": 999}, f)  # names a version that never existed
    assert versioned._latest_committed(path)[0] == 3


def test_latest_pointer_probe_steps_over_legacy_corpse(spark, tmp_path):
    """A verified legacy bodyless claim dir between the pointer and a
    later committed version must not stop the forward probe."""
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 2), path)  # v1
    versioned._write_latest_hint(path, 1)
    os.makedirs(os.path.join(path, "_versions", "v0000000002"))  # corpse
    versioned.commit(spark, _mk(spark, 2, 4), path)  # lands at v3
    v, man = versioned._latest_committed(path)
    assert v == 3
    assert len(_rows(versioned.read(spark, path))) == 4


def test_latest_pointer_written_by_every_commit_kind(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 4), path)
    assert versioned._read_latest_hint(path) == 1
    versioned.delete_where(spark, path, "k = 1")
    assert versioned._read_latest_hint(path) == 2
    versioned.rollback(spark, path, version=1)
    assert versioned._read_latest_hint(path) == 3
    dst = str(tmp_path / "clone")
    versioned.clone(spark, path, dst)
    assert versioned._read_latest_hint(dst) == 1
