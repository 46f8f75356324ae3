"""Incremental compaction: replace commits with ``data_change: false``.

``compact_files`` is the steady-state answer to streaming sinks
dribbling small files: rewrite ONLY the snapshot's small files into
target-sized ones and commit the swap as a replace delta
(``remove_files`` + ``add_files``), so maintenance IO scales with the
small files, never the table — the Delta ``OPTIMIZE`` bin-packing
primitive, where :func:`versioned.optimize`/:func:`versioned.compact`
remain the O(table) full re-cluster.  Because no ROW changes, the
streaming source skips the version and the change feed is empty:
layout maintenance is invisible to every consumer.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _sizes(path, v):
    man = versioned._snapshot(path, v)
    return {
        f: os.path.getsize(versioned._local(f)) for f in man["files"]
    }


@pytest.fixture()
def dribbled(spark, tmp_path):
    """A table with one big file and five dribbled small commits."""
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 200_000).coalesce(1), path)
    for i in range(5):
        versioned.commit(
            spark,
            _mk(spark, 200_000 + i * 3, 200_000 + (i + 1) * 3).coalesce(1),
            path,
        )
    return path


def test_compact_rewrites_only_small_files(spark, dribbled):
    path = dribbled
    sizes = _sizes(path, 6)
    big = max(sizes, key=sizes.get)
    v, rewritten, added = versioned.compact_files(
        spark, path, min_bytes=sizes[big]
    )
    assert v == 7 and rewritten == 5 and added == 1
    after = versioned._snapshot(path, v)
    assert big in after["files"]  # the big file was NOT rewritten
    assert len(after["files"]) == 2
    # rows identical, metadata count identical, stats ride the swap
    assert _rows(versioned.read(spark, path)) == [
        (i,) for i in range(200_015)
    ]
    assert versioned.row_count(spark, path) == 200_015
    assert set(after["stats"]) == set(after["files"])
    # the body is a REPLACE delta: O(swap) metadata, not O(table)
    raw = versioned._read_manifest(path, v)
    assert raw["mode"] == "replace" and raw["data_change"] is False
    assert set(raw["remove_files"]) == set(sizes) - {big}
    # pre-compaction versions still time-travel
    assert versioned.row_count(spark, path, version=6) == 200_015


def test_compact_noop_when_nothing_to_pack(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 10).coalesce(1), path)
    v, rewritten, added = versioned.compact_files(spark, path)
    assert (v, rewritten, added) == (None, 0, 0)
    assert versioned._versions(path) == [1]  # no version burned


def test_change_feed_is_empty_across_compaction(spark, dribbled):
    path = dribbled
    v, _, _ = versioned.compact_files(spark, path, min_bytes=1 << 30)
    feed = versioned.changes(spark, path, 6, v)
    assert feed.count() == 0


def test_stream_skips_compaction_and_never_reemits(spark, dribbled):
    from pyspark.sql.types import LongType, StructField, StructType

    from integritychecksforvldbs_spark.sources.versioned_datasource import (
        _VersionedStreamReader,
    )

    path = dribbled
    v, _, _ = versioned.compact_files(spark, path, min_bytes=1 << 30)
    versioned.commit(spark, _mk(spark, 300, 303).coalesce(1), path)  # v8
    # force a FULL checkpoint containing the rewritten files, then one
    # more append — the stream must not re-emit rewrites at the
    # checkpoint diff
    versioned.commit(spark, _mk(spark, 303, 306).coalesce(1), path)  # v9
    versioned.commit(spark, _mk(spark, 306, 309).coalesce(1), path)  # v10 ckpt
    r = _VersionedStreamReader(
        path, 0, StructType([StructField("k", LongType(), True)])
    )
    assert r.latestOffset() == {"version": 10}
    # the compaction batch itself emits nothing
    assert r._files_between(v - 1, v) == []
    # cumulative stream = pre-compaction snapshot + post appends: the
    # REWRITTEN files never stream (their rows already did)
    pre = set(versioned._snapshot(path, 6)["files"])
    post = set()
    for n in (8, 9, 10):
        post |= set(versioned._snapshot(path, n)["files"]) - set(
            versioned._snapshot(path, n - 1)["files"]
        )
    assert set(r._files_between(0, 10)) == pre | post


def test_compaction_conflicts_when_race_removed_its_files(
    spark, dribbled, monkeypatch
):
    path = dribbled
    orig = versioned._install_manifest
    state = {"armed": True}

    def hooked(p, vv, man):
        if state["armed"]:
            state["armed"] = False
            versioned.commit(
                spark, _mk(spark, 0, 3), path, mode="overwrite"
            )
        return orig(p, vv, man)

    monkeypatch.setattr(versioned, "_install_manifest", hooked)
    with pytest.raises(versioned.ConflictError, match="removed"):
        versioned.compact_files(spark, path, min_bytes=1 << 30)
    # the racing overwrite's state is intact
    assert _rows(versioned.read(spark, path)) == [(0,), (1,), (2,)]


def test_compaction_rebases_past_racing_append(
    spark, dribbled, monkeypatch
):
    path = dribbled
    orig = versioned._install_manifest
    state = {"armed": True}

    def hooked(p, vv, man):
        if state["armed"]:
            state["armed"] = False
            versioned.commit(spark, _mk(spark, 500, 503).coalesce(1), path)
        return orig(p, vv, man)

    monkeypatch.setattr(versioned, "_install_manifest", hooked)
    sizes = _sizes(path, 6)
    big = max(sizes, key=sizes.get)
    v, rewritten, added = versioned.compact_files(
        spark, path, min_bytes=sizes[big]
    )
    assert v == 8 and rewritten == 5  # re-based past the append at v7
    assert _rows(versioned.read(spark, path)) == sorted(
        [(i,) for i in range(200_015)] + [(500,), (501,), (502,)]
    )


def test_vacuum_after_compaction_expires_replaced_files(spark, dribbled):
    import os

    path = dribbled
    sizes = _sizes(path, 6)
    big = max(sizes, key=sizes.get)
    small = [versioned._local(f) for f in sizes if f != big]
    v, _, _ = versioned.compact_files(spark, path, min_bytes=sizes[big])
    versioned.vacuum(path, keep_versions=1, min_age_s=0)
    # the compaction tip got a checkpoint; everything below expired,
    # including the replaced small files\' bytes
    assert versioned._versions(path) == [v]
    for f in small:
        assert not os.path.exists(f)
    assert versioned.row_count(spark, path) == 200_015


def test_stream_survives_full_optimize_and_compact(spark, dribbled):
    """optimize/compact are layout-only replace commits now: a stream
    crossing them emits nothing extra and does not raise (previously
    they were overwrite commits, which KILLED any stream of the
    table)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from integritychecksforvldbs_spark.sources.versioned_datasource import (
        _VersionedStreamReader,
    )

    path = dribbled
    pre = set(versioned._snapshot(path, 6)["files"])
    v_opt, _, _ = versioned.optimize(spark, path, n_files=2)
    v_cmp, _, _ = versioned.compact(spark, path, n_files=1)
    versioned.commit(spark, _mk(spark, 400, 403).coalesce(1), path)
    r = _VersionedStreamReader(
        path, 0, StructType([StructField("k", LongType(), True)])
    )
    latest = r.latestOffset()["version"]
    assert latest == v_cmp + 1
    assert r._files_between(6, v_opt) == []  # layout versions: silent
    got = set(r._files_between(0, latest))
    post = set(versioned._snapshot(path, latest)["files"]) - set(
        versioned._snapshot(path, v_cmp)["files"]
    )
    assert got == pre | post  # original files + the new append only
    # and the feed across both rewrites is empty
    assert versioned.changes(spark, path, 6, v_cmp).count() == 0


def test_compact_files_zorder_tightens_stats(spark, tmp_path):
    """Clustered incremental compaction: the bin-packed files come
    out range-disjoint on the z-order key, so manifest-stats pruning
    starts skipping where the dribbled layout could not."""
    path = str(tmp_path / "tbl")
    # shuffled dribble: every small file spans ~the full key range
    for i in range(6):
        versioned.commit(
            spark,
            spark.range(0, 600).filter(f"id % 6 = {i}")
            .select(F.col("id").alias("k")).coalesce(1),
            path,
        )
    man_before = versioned._resolve_manifest(path, None)
    _, skipped_before = versioned._prune_manifest_files(
        man_before, {"k": (0, 49)}
    )
    v, rewritten, added = versioned.compact_files(
        spark, path, min_bytes=1 << 30, zorder_by=["k"],
        target_bytes=1,  # force multiple output files to band
    )
    assert rewritten == 6 and added >= 2
    man_after = versioned._resolve_manifest(path, None)
    _, skipped_after = versioned._prune_manifest_files(
        man_after, {"k": (0, 49)}
    )
    assert len(skipped_after) > len(skipped_before)
    assert versioned.read(spark, path).count() == 600
