"""Parquet checkpoint bodies (round-10 item #4).

Checkpoints used to serialize the full folded snapshot — every file
entry, stat, and DV ref — as ONE JSON document: pinned O(commit) for
append deltas, but a cold fold re-parsed O(files) JSON, and at 100 TB
/ ~100k files that is ~20 MB of driver JSON per checkpoint write and
per cold read.  Full-snapshot bodies at or above
``CKPT_PARQUET_MIN_FILES`` entries now externalize the file list to a
parquet sidecar (``vN~files-<uuid>.parquet``, zstd, one row per file,
stats/DV payloads as JSON strings) that the body points at via
``ckpt_files`` — the same move Delta made from JSON to parquet
checkpoints.  ``_read_manifest`` materializes the sidecar back to the
inline shape (pure pyarrow — the Python Data Source planner worker
still works), small snapshots keep human-readable inline JSON, and
backend-logged tables always inline (ClaimBackend payloads are JSON
documents by contract).

Pinned here: the externalized body shape and its O(1) JSON size, exact
read/time-travel/DML equivalence over parquet-checkpointed tables,
sidecar lifecycle (vacuum reclaims expired versions' sidecars and
age-guarded orphans, keeps referenced ones), the backend inline
fallback, and the fold cost at a 100k-file synthetic snapshot.
"""

from __future__ import annotations

import glob
import json
import os
import time

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _mk(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        .coalesce(1)
    )


def _sidecars(path):
    return sorted(
        glob.glob(os.path.join(path, "_versions", "v*~files-*.parquet"))
    )


def _raw_json(path, v):
    with open(
        os.path.join(path, "_versions", versioned._vname(v) + ".json")
    ) as f:
        return json.load(f)


@pytest.fixture()
def small_threshold(monkeypatch):
    monkeypatch.setattr(versioned, "CKPT_PARQUET_MIN_FILES", 1)


def test_checkpoint_externalizes_filelist(spark, tmp_path, small_threshold):
    path = str(tmp_path / "tbl")
    for i in range(12):
        versioned.commit(spark, _mk(spark, i * 10, (i + 1) * 10), path)
    # v10 is a checkpoint version: its raw body must point at a parquet
    # sidecar instead of inlining the file list
    raw = _raw_json(path, 10)
    assert "files" not in raw and raw["ckpt_files"].endswith(".parquet")
    assert raw["n_files"] == 10
    assert _sidecars(path)
    # materialized reads are shape-identical: folds, time travel, counts
    assert versioned.read(spark, path).count() == 120
    assert versioned.read(spark, path, version=10).count() == 100
    assert versioned.read(spark, path, version=7).count() == 70
    snap = versioned._snapshot(path, 10)
    assert len(snap["files"]) == 10 and len(snap["stats"]) == 10


def test_dml_over_parquet_checkpoint(spark, tmp_path, small_threshold):
    path = str(tmp_path / "tbl")
    for i in range(10):
        versioned.commit(spark, _mk(spark, i * 10, (i + 1) * 10), path)
    assert "ckpt_files" in _raw_json(path, 10)
    v, n = versioned.delete_where(spark, path, "k in (5, 15)")
    assert n == 2
    v, n = versioned.update_where(
        spark, path, "k = 7", {"v": "'seven'"}
    )
    assert n == 1
    got = versioned.read(spark, path)
    assert got.count() == 98
    assert got.filter("k = 7").collect()[0]["v"] == "seven"
    # DVs written by the DML fold through the parquet checkpoint at the
    # NEXT checkpoint version too
    for i in range(10, 18):
        versioned.commit(spark, _mk(spark, i * 100, i * 100 + 1), path)
    raw20 = _raw_json(path, 20)
    assert "ckpt_files" in raw20
    assert versioned.read(spark, path).filter("k = 5").count() == 0


def test_vacuum_reclaims_expired_and_orphan_sidecars(
    spark, tmp_path, small_threshold
):
    path = str(tmp_path / "tbl")
    for i in range(22):
        versioned.commit(spark, _mk(spark, i * 10, (i + 1) * 10), path)
    before = _sidecars(path)
    assert len(before) >= 2  # v10 and v20 checkpoints at least
    # an unreferenced orphan (CAS-loser shape)
    orphan = os.path.join(
        path, "_versions", "v0000000020~files-deadbeef0000.parquet"
    )
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    # age everything so the min-age guard lets vacuum act
    old = time.time() - 7 * 24 * 3600
    for p in glob.glob(os.path.join(path, "_versions", "*")):
        os.utime(p, (old, old))
    versioned.vacuum(path, keep_versions=1)
    after = _sidecars(path)
    assert orphan not in after
    # the retained tip (v22, delta over the v20 checkpoint) still
    # resolves: its chain's sidecar survives
    assert versioned.read(spark, path).count() == 220
    # every surviving sidecar is referenced by a surviving body
    for p in after:
        v = int(os.path.basename(p)[1:11])
        refs = set()
        for name in (
            versioned._vname(v) + ".json",
            versioned._ckpt_key(v) + ".json",
        ):
            fp = os.path.join(path, "_versions", name)
            if os.path.exists(fp):
                with open(fp) as f:
                    b = json.load(f)
                if b.get("ckpt_files"):
                    refs.add(b["ckpt_files"])
        assert os.path.basename(p) in refs


def test_backend_log_keeps_inline_bodies(spark, tmp_path, small_threshold):
    from integritychecksforvldbs_spark.plans.queue import (
        ConditionalStoreBackend,
    )

    path = str(tmp_path / "tbl")
    versioned.use_log_backend(path, ConditionalStoreBackend())
    try:
        for i in range(10):
            versioned.commit(
                spark, _mk(spark, i * 10, (i + 1) * 10), path
            )
        assert versioned.read(spark, path).count() == 100
        assert versioned.read(spark, path, version=10).count() == 100
        assert _sidecars(path) == []  # backend payloads stay JSON
    finally:
        versioned.use_log_backend(path, None)


def test_fold_cost_100k_file_synthetic_snapshot(tmp_path):
    """The r9 verdict's cost pin: a cold fold of a ~100k-file snapshot
    must not hinge on parsing a ~20 MB JSON document — the JSON body
    stays O(1) bytes and the materializing read is vectorized."""
    path = str(tmp_path / "big")
    n = 100_000
    files = [f"{path}/data/aa/{i:06d}.parquet" for i in range(n)]
    stats = {
        f: {"n_rows": 5, "min": {"k": i}, "max": {"k": i + 4}}
        for i, f in enumerate(files)
    }
    meta = {
        "version": 1,
        "mode": "overwrite",
        "parent": None,
        "committed_at": time.time(),
        "constraints": {},
        "schema": None,
        "schema_json": None,
    }
    body = versioned._full_body(path, 1, meta, files, stats, {})
    assert "files" not in body and body["n_files"] == n
    assert versioned._install_manifest(path, 1, body)
    json_bytes = os.path.getsize(
        os.path.join(path, "_versions", "v0000000001.json")
    )
    assert json_bytes < 4096  # O(commit) body, not O(files)
    t0 = time.perf_counter()
    snap = versioned._snapshot(path, 1)
    elapsed = time.perf_counter() - t0
    assert len(snap["files"]) == n
    assert snap["stats"][files[123]]["max"]["k"] == 127
    # generous wall bound: the vectorized read of 100k entries is
    # ~100-300 ms; a 20 MB JSON re-parse plus re-serialize is what
    # this guards against regressing toward
    assert elapsed < 5.0
