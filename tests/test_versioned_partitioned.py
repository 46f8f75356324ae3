"""Partition-column layout for versioned tables (round-11: the last
format-level gap the r9/r10 verdicts carried).

``commit(..., partition_by=["c"])`` lays data files out hive-style
under ``data/c=value/`` — the reference scopes CHECKFILEGROUP to one
filegroup (DatabaseIntegrityCheck.sql:1476-1487); a partition is this
format's filegroup — and folds each file's partition values into its
manifest stats as exact min==max bounds, so every existing stats
consumer (read_where pruning, DML probe candidates, partition-scoped
compaction) is partition-aware with no new code path.  Scans
reconstruct the partition columns JVM-side via Spark's ``basePath``
partition discovery; the arrow Python Data Source parses them from
the file path.

Pinned here: the on-disk layout; append inheritance + mismatch
refusal; exact partition pruning of DML probes and read_where; DML
(delete/update/merge, copy and DV strategies) preserving the layout;
rename-of-partition-column safety (physical dir names immutable) and
drop refusal; optimize/compact re-splitting by partition;
partition-scoped compact_files(where=...); vacuum's recursive walk
(incl. nested two-column layouts — the one-level walk would have
whole-dir-reclaimed partially-referenced partition dirs); null
partition values; the Python Data Source batch + stream reads; the
change feed; clone; SQL CREATE TABLE ... PARTITIONED BY; and the
feature gate.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned
from integritychecksforvldbs_spark.sources import versioned_datasource as vds
from integritychecksforvldbs_spark.sources.versioned_sql import (
    register_table,
    versioned_sql,
)


def _mk(spark, lo, hi, buckets=4):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % buckets).cast("int").alias("c"),
        (F.col("id") * 2).alias("v"),
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def _top_dirs(path):
    return sorted(os.listdir(os.path.join(path, "data")))


@pytest.fixture()
def ptbl(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned.commit(spark, _mk(spark, 0, 100), path, partition_by=["c"])
    return path


def test_layout_and_round_trip(spark, ptbl):
    dirs = [d for d in _top_dirs(ptbl) if not d.startswith(".")]
    assert dirs == ["c=0", "c=1", "c=2", "c=3"]
    man = versioned._resolve_manifest(ptbl, None)
    assert man["partition_by"] == ["c"]
    assert "partitioned-layout" in man["required_features"]
    got = versioned.read(spark, ptbl)
    assert got.columns == ["k", "c", "v"]  # declared order restored
    assert _rows(got) == _rows(_mk(spark, 0, 100))


def test_append_inherits_and_mismatch_refused(spark, ptbl):
    versioned.commit(spark, _mk(spark, 100, 120), ptbl)
    assert versioned.read(spark, ptbl).count() == 120
    man = versioned._resolve_manifest(ptbl, None)
    assert man["partition_by"] == ["c"]
    assert all("/data/c=" in f or "\\data\\c=" in f for f in man["files"])
    with pytest.raises(ValueError, match="laid out by"):
        versioned.commit(
            spark, _mk(spark, 120, 130), ptbl, partition_by=["v"]
        )
    # an unpartitioned table refuses a partitioned append the same way
    flat = ptbl + "_flat"
    versioned.commit(spark, _mk(spark, 0, 10), flat)
    with pytest.raises(ValueError, match="laid out by"):
        versioned.commit(
            spark, _mk(spark, 10, 20), flat, partition_by=["c"]
        )


def test_partition_pruning_is_exact(spark, ptbl):
    versioned.commit(spark, _mk(spark, 100, 140), ptbl)
    man = versioned._resolve_manifest(ptbl, None)
    cand = versioned._dml_candidates(man, "c = 2")
    assert cand and all("c=2" in f for f in cand)
    assert len(cand) == sum(1 for f in man["files"] if "c=2" in f)
    # read_where plans only that partition's files and answers exactly
    got = versioned.read_where(spark, ptbl, {"c": (2, 2)})
    assert _rows(got.filter("c = 2")) == _rows(
        versioned.read(spark, ptbl).filter("c = 2")
    )


def test_dml_preserves_layout_copy_and_dv(spark, ptbl):
    # copy-path DELETE scoped to one partition
    v, n = versioned.delete_where(
        spark, ptbl, "c = 1 AND k < 50", strategy="copy"
    )
    assert n == 13  # k in {1,5,...,49} ∩ k%4==1
    # DV-path DELETE on another partition
    v, n2 = versioned.delete_where(
        spark, ptbl, "c = 2 AND k = 2", strategy="dv"
    )
    assert n2 == 1
    v, nu = versioned.update_where(
        spark, ptbl, "c = 3 AND k < 20", {"v": "v + 1000"}
    )
    assert nu == 5
    man = versioned._resolve_manifest(ptbl, None)
    for f in man["files"]:
        seg = versioned._partition_segments(f)
        assert "c" in seg  # every file still lives under c=value/
    exp = (
        _mk(spark, 0, 100)
        .filter("NOT (c = 1 AND k < 50) AND NOT (c = 2 AND k = 2)")
        .select(
            "k", "c",
            F.when((F.col("c") == 3) & (F.col("k") < 20),
                   F.col("v") + 1000).otherwise(F.col("v")).alias("v"),
        )
    )
    assert _rows(versioned.read(spark, ptbl)) == _rows(exp)


def test_dml_probe_scans_only_matching_partition(
    spark, ptbl, monkeypatch
):
    calls = []
    real = versioned._scan_live_pos

    def spy(spark_, man_, files=None):
        calls.append(files)
        return real(spark_, man_, files)

    monkeypatch.setattr(versioned, "_scan_live_pos", spy)
    versioned.delete_where(spark, ptbl, "c = 3 AND k < 8")
    monkeypatch.undo()
    probed = calls[0]
    assert probed and all("c=3" in f for f in probed)


def test_rename_partition_column_and_drop_refusal(spark, ptbl):
    versioned.rename_column(ptbl, "c", "bucket")
    versioned.commit(
        spark,
        spark.range(100, 110).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("bucket"),
            (F.col("id") * 2).alias("v"),
        ),
        ptbl,
    )
    got = versioned.read(spark, ptbl)
    assert got.columns == ["k", "bucket", "v"]
    assert got.count() == 110
    assert got.filter("bucket = 1").count() == 28  # 25 + 101,105,109
    # physical dirs keep the original name: the layout is rename-proof
    assert any(d.startswith("c=") for d in _top_dirs(ptbl))
    with pytest.raises(ValueError, match="partitioned by"):
        versioned.drop_column(ptbl, "bucket")


def test_merge_when_dv_on_partitioned_mapped_table(spark, ptbl):
    versioned.rename_column(ptbl, "c", "bucket")
    src = spark.range(5).select(
        F.col("id").alias("k"), F.lit(777).cast("long").alias("v")
    )
    v, m = versioned.merge_when(
        spark, ptbl, src, ["k"],
        [{"when": "matched", "action": "update", "set": {"v": "s.v"}}],
        strategy="dv",
    )
    assert m["n_updated"] == 5
    got = versioned.read(spark, ptbl).filter("k < 5")
    assert sorted(r.v for r in got.collect()) == [777] * 5
    # partition column values survived the merge-on-read rewrite
    assert sorted(r.bucket for r in got.collect()) == [0, 0, 1, 2, 3]


def test_optimize_and_scoped_compaction(spark, tmp_path):
    path = str(tmp_path / "t")
    # dribble five single-file commits per partition shape
    for lo in range(0, 50, 10):
        versioned.commit(
            spark, _mk(spark, lo, lo + 10, buckets=2).coalesce(1),
            path, partition_by=["c"],
        )
    before = versioned._resolve_manifest(path, None)
    # scoped compaction touches ONLY partition c=1's files
    v, rewritten, added = versioned.compact_files(
        spark, path, min_bytes=1 << 30, where="c = 1"
    )
    assert rewritten == 5
    man = versioned._resolve_manifest(path, None)
    untouched = [f for f in before["files"] if "c=0" in f]
    assert all(f in man["files"] for f in untouched)
    assert all(
        "c=" in os.path.basename(os.path.dirname(f)) for f in man["files"]
    )
    assert _rows(versioned.read(spark, path)) == _rows(
        _mk(spark, 0, 50, buckets=2)
    )
    # whole-table optimize keeps the layout too
    v, b, a = versioned.optimize(spark, path)
    man = versioned._resolve_manifest(path, None)
    assert all(
        "c=" in os.path.basename(os.path.dirname(f)) for f in man["files"]
    )
    assert _rows(versioned.read(spark, path)) == _rows(
        _mk(spark, 0, 50, buckets=2)
    )


def test_vacuum_recursive_and_partial_partition_dirs(spark, tmp_path):
    path = str(tmp_path / "t")
    # nested TWO-column layout: data/c=../d=../file
    df = spark.range(40).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("int").alias("c"),
        (F.col("id") % 3).cast("string").alias("d"),
    )
    versioned.commit(spark, df, path, partition_by=["c", "d"])
    versioned.commit(
        spark,
        spark.range(40, 60).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("int").alias("c"),
            (F.col("id") % 3).cast("string").alias("d"),
        ),
        path,
    )
    # delete one partition's rows via copy rewrite, then expire history
    versioned.delete_where(spark, path, "c = 1 AND d = '2'", strategy="copy")
    want = _rows(versioned.read(spark, path))
    removed = versioned.vacuum(path, keep_versions=1, min_age_s=0.0)
    assert removed  # something expired
    # the partially-referenced partition dirs survived with live files
    assert _rows(versioned.read(spark, path)) == want
    # no removed path is still referenced
    man = versioned._resolve_manifest(path, None)
    live = {versioned._local(f) for f in man["files"]}
    assert not (set(removed) & live)


def test_null_partition_values_round_trip(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(20).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise((F.col("id") % 2).cast("int"))
        .alias("c"),
    )
    versioned.commit(spark, df, path, partition_by=["c"])
    got = versioned.read(spark, path)
    assert got.filter("c IS NULL").count() == 4
    assert _rows(got) == _rows(df)
    # the null sentinel folds as nulls=n_rows so IS NULL probes keep it
    man = versioned._resolve_manifest(path, None)
    null_files = [
        f for f in man["files"] if "__HIVE_DEFAULT_PARTITION__" in f
    ]
    assert null_files
    for f in null_files:
        ent = man["stats"][f]["cols"]["c"]
        assert ent["min"] is None and ent["max"] is None
        assert ent["nulls"] == man["stats"][f]["n_rows"]


def test_python_datasource_batch_stream_and_cdf(spark, tmp_path):
    vds.register(spark)
    path = str(tmp_path / "t")
    versioned.commit(
        spark, _mk(spark, 0, 30).coalesce(2), path, partition_by=["c"]
    )
    versioned.commit(spark, _mk(spark, 30, 40).coalesce(1), path)
    native = versioned.read(spark, path)
    pyds = spark.read.format("versioned").load(path)
    assert _rows(pyds.select("k", "c", "v")) == _rows(native)
    out = str(tmp_path / "out")
    (
        spark.readStream.format("versioned")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert _rows(spark.read.parquet(out).select("k", "c", "v")) == _rows(
        native
    )
    ch = versioned.changes(spark, path, 1, 2)
    assert ch.filter("_change_type = 'insert'").count() == 10
    assert ch.filter("c IS NULL").count() == 0


def test_clone_carries_partitioning(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    versioned.commit(spark, _mk(spark, 0, 20), src, partition_by=["c"])
    versioned.clone(spark, src, dst)
    man = versioned._resolve_manifest(dst, None)
    assert man["partition_by"] == ["c"]
    versioned.commit(spark, _mk(spark, 20, 30), dst)  # inherits
    assert versioned.read(spark, dst).count() == 30


def test_sql_create_partitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    register_table("p11", path)
    try:
        versioned_sql(
            spark,
            "CREATE TABLE p11 PARTITIONED BY (c) AS "
            "VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 10, 'c') "
            "AS v(k, c, s)",
        )
        man = versioned._resolve_manifest(path, None)
        assert man["partition_by"] == ["c"]
        dirs = [d for d in _top_dirs(path) if not d.startswith(".")]
        assert dirs == ["c=10", "c=20"]
        row = versioned_sql(spark, "DESCRIBE DETAIL p11").collect()[0]
        assert row["partition_by"] == "c"
    finally:
        register_table("p11", None)


def test_unsupported_partition_type_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(5).select(
        F.col("id").alias("k"), F.array(F.col("id")).alias("c")
    )
    with pytest.raises(TypeError, match="partition column type"):
        versioned.commit(spark, df, path, partition_by=["c"])
    assert not os.path.exists(os.path.join(path, "_versions"))


def test_sql_optimize_where_partition_scoped(spark, tmp_path):
    """OPTIMIZE <t> WHERE c = 1 bin-packs ONLY that partition's files
    (Delta's scoped OPTIMIZE), leaving the out-of-scope partition's
    layout untouched, and WITH AUTO REFRESH rides the bloom verb."""
    path = str(tmp_path / "t")
    register_table("p11o", path)
    try:
        for lo in range(0, 40, 10):
            versioned.commit(
                spark, _mk(spark, lo, lo + 10, buckets=2).coalesce(1),
                path, partition_by=["c"],
            )
        before = versioned._resolve_manifest(path, None)
        n_c0 = sum(1 for f in before["files"] if "c=0" in f)
        row = versioned_sql(spark, "OPTIMIZE p11o WHERE c = 1").collect()[0]
        assert row["files_before"] == 4 and row["files_after"] >= 1
        man = versioned._resolve_manifest(path, None)
        assert sum(1 for f in man["files"] if "c=0" in f) == n_c0
        assert [f for f in before["files"] if "c=0" in f] == [
            f for f in man["files"] if "c=0" in f
        ]
        assert _rows(versioned.read(spark, path)) == _rows(
            _mk(spark, 0, 40, buckets=2)
        )
        # single in-scope file: nothing to bin-pack, clean metrics row
        row = versioned_sql(
            spark, "OPTIMIZE p11o WHERE c = 1"
        ).collect()[0]
        assert row["files_before"] <= 1 or row["files_after"] >= 1
        # bloom auto-refresh SQL form
        versioned_sql(
            spark,
            "CREATE BLOOMFILTER INDEX ON p11o FOR COLUMNS (k) "
            "WITH AUTO REFRESH",
        )
        man = versioned._resolve_manifest(path, None)
        (cfg,) = man["bloom"].values()
        assert cfg.get("auto") is True
    finally:
        register_table("p11o", None)


def test_bloom_rollback_and_evolution_on_partitioned(spark, ptbl):
    """Cross-feature coverage on the partitioned layout: Bloom
    point-probe pruning composes with partition dirs, rollback
    restores a pre-delete snapshot (the replace body carries the
    layout), and additive schema evolution null-fills old files
    through the basePath scan."""
    # bloom over the scattered v column (k-clustered, v-scattered? v
    # is k*2 — use k to get real pruning on the probe path instead)
    versioned.build_bloom(spark, ptbl, "k")
    man = versioned._resolve_manifest(ptbl, None)
    kept = versioned._bloom_prune_files(
        spark, man, {"k": 42}, man["files"]
    )
    assert 0 < len(kept) < len(man["files"])
    # the survivors still live under partition dirs
    assert all("c=" in os.path.basename(os.path.dirname(f)) for f in kept)

    # delete then rollback: layout + values restored
    before = _rows(versioned.read(spark, ptbl))
    v_good = versioned._latest_committed(ptbl)[0]
    versioned.delete_where(spark, ptbl, "c = 1")
    assert versioned.read(spark, ptbl).filter("c = 1").count() == 0
    versioned.rollback(spark, ptbl, version=v_good)
    assert _rows(versioned.read(spark, ptbl)) == before
    man = versioned._resolve_manifest(ptbl, None)
    assert man["partition_by"] == ["c"]

    # additive evolution: the appended column null-fills the old
    # files through the basePath discovery scan
    versioned.add_column(ptbl, "note", "string")
    versioned.commit(
        spark,
        spark.range(100, 105).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("c"),
            (F.col("id") * 2).alias("v"),
            F.lit("new").alias("note"),
        ),
        ptbl,
    )
    got = versioned.read(spark, ptbl)
    assert got.columns == ["k", "c", "v", "note"]
    assert got.filter("note IS NULL").count() == 100
    assert got.filter("note = 'new'").count() == 5
