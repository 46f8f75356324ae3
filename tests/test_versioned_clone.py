"""SHALLOW CLONE: zero-copy table branches.

``clone`` creates a new versioned table whose first commit REFERENCES
the source snapshot's files — no data moves, O(manifest) regardless of
table size (Delta's ``SHALLOW CLONE``).  From then on the tables are
independent: writes land under each table's own data root, a clone's
DML merely un-references source files, and the clone's vacuum walks
only its own data root so it can never delete source bytes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _ks(df):
    return sorted(r["k"] for r in df.collect())


@pytest.fixture()
def src(spark, tmp_path):
    path = str(tmp_path / "src")
    versioned.commit(spark, _mk(spark, 0, 10).coalesce(1), path)
    versioned.commit(spark, _mk(spark, 10, 20).coalesce(1), path)
    return path


def test_clone_is_zero_copy_and_reads_equal(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    v = versioned.clone(spark, src, dst)
    assert v == 1
    assert _ks(versioned.read(spark, dst)) == list(range(20))
    # ZERO data copied: the clone has no data directory at all
    assert not os.path.exists(os.path.join(dst, "data"))
    # stats came along: metadata-only COUNT answers without IO
    assert versioned.row_count(spark, dst) == 20
    # time-travel clone
    dst1 = str(tmp_path / "dst1")
    versioned.clone(spark, src, dst1, version=1)
    assert _ks(versioned.read(spark, dst1)) == list(range(10))
    # cloning onto an existing log refuses
    with pytest.raises(FileExistsError):
        versioned.clone(spark, src, dst)


def test_clone_divergence_never_touches_source(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    versioned.clone(spark, src, dst)
    versioned.commit(spark, _mk(spark, 100, 103).coalesce(1), dst)
    v_del, n = versioned.delete_where(spark, dst, "k < 10")
    assert n == 10
    # the clone sees its own history; the source is untouched
    assert _ks(versioned.read(spark, dst)) == list(range(10, 20)) + [
        100, 101, 102
    ]
    assert _ks(versioned.read(spark, src)) == list(range(20))
    # the delete merely UN-referenced a source file — bytes intact
    removed_ref = versioned._read_manifest(dst, v_del)["remove_files"][0]
    assert os.path.exists(versioned._local(removed_ref))
    # vacuum on the clone can never delete source bytes
    versioned.vacuum(dst, keep_versions=1, min_age_s=0)
    assert os.path.exists(versioned._local(removed_ref))
    assert _ks(versioned.read(spark, src)) == list(range(20))


def test_clone_carries_constraints(spark, tmp_path):
    src = str(tmp_path / "src")
    versioned.commit(spark, _mk(spark, 0, 5), src)
    versioned.set_constraints(spark, src, {"k_nonneg": "k >= 0"})
    dst = str(tmp_path / "dst")
    versioned.clone(spark, src, dst)
    assert versioned.constraints(dst) == {"k_nonneg": "k >= 0"}
    with pytest.raises(versioned.ConstraintViolation):
        versioned.commit(
            spark, spark.createDataFrame([(-1,)], "k long"), dst
        )


def test_clone_streams_as_initial_load(spark, src, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from integritychecksforvldbs_spark.sources.versioned_datasource import (
        _VersionedStreamReader,
    )

    dst = str(tmp_path / "dst")
    versioned.clone(spark, src, dst)
    versioned.commit(spark, _mk(spark, 100, 103).coalesce(1), dst)
    r = _VersionedStreamReader(
        dst, 0, StructType([StructField("k", LongType(), True)])
    )
    assert r.latestOffset() == {"version": 2}
    files = r._files_between(0, 2)
    assert set(files) == set(versioned._snapshot(dst, 2)["files"])


def test_clone_cli(spark, src, tmp_path, capsys):
    import json

    from integritychecksforvldbs_spark.table_cli import main

    dst = str(tmp_path / "dst")
    main(["versioned-clone", "--src", src, "--dst", dst])
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s == {"cmd": "versioned-clone", "dst": dst, "n_rows": 20}
