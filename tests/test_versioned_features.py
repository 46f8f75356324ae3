"""Protocol feature gating (round-10 wave 10) — Delta's
reader-version / table-features idea reduced to core: every installed
body is stamped with the format features required to interpret it
(`required_features`), and `_read_manifest` refuses a body whose
features this reader does not implement — so a renamed column can
never be silently null-filled by a reader that predates column
mapping, and an unknown future feature fails loudly before any data
is interpreted.  Body-level stamping is complete coverage: mapping/
bloom ride every body via commit inheritance, DV entries appear in
every full body and DML delta, folds parse every chain body, and
vacuum's checkpoint sidecars are stamped and gated the same way.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _mk(spark, path):
    versioned.commit(
        spark,
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id int, name string"
        ),
        path,
    )
    return path


def test_plain_tables_carry_no_feature_key(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    versioned.commit(
        spark, spark.createDataFrame([(3, "c")], "id int, name string"), t
    )
    for v in (1, 2):
        assert "required_features" not in versioned._read_manifest(t, v)


def test_features_track_what_bodies_use(spark, tmp_path):
    t = str(tmp_path / "t")
    # one multi-row file, so a point delete yields a real sidecar (a
    # fully-dead file would be optimized into a plain removal)
    versioned.commit(
        spark, spark.range(0, 100).selectExpr("id", "id*2 AS v").coalesce(1), t
    )
    versioned.rename_column(t, "v", "val")
    man = versioned._read_manifest(t, 2)
    assert man["required_features"] == ["column-mapping"]
    versioned.delete_where(spark, t, "id = 1", strategy="dv")
    assert versioned.dv_info(t), "point delete should write a sidecar"
    man = versioned._read_manifest(t, 3)
    assert set(man["required_features"]) == {
        "column-mapping", "deletion-vectors",
    }
    versioned.build_bloom(spark, t, "id")
    man = versioned._read_manifest(t, 4)
    assert "bloom-index" in man["required_features"]
    # appends inherit the stamps with the metadata they ride on
    versioned.commit(
        spark,
        spark.createDataFrame([(900, 1)], "id long, val long"),
        t,
    )
    man = versioned._read_manifest(t, 5)
    assert "column-mapping" in man["required_features"]
    assert "bloom-index" in man["required_features"]


def test_unknown_future_feature_refused_loudly(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    base = dict(versioned._read_manifest(t, 1))
    forged = {
        **base,
        "version": 2,
        "parent": 1,
        "required_features": ["quantum-compression"],
    }
    with open(
        os.path.join(t, "_versions", "v0000000002.json"), "w"
    ) as f:
        json.dump(forged, f)
    with pytest.raises(
        versioned.VersionedFeatureError, match="quantum-compression"
    ):
        versioned.read(spark, t)
    with pytest.raises(versioned.VersionedFeatureError):
        versioned.history(t)


def test_vacuum_checkpoint_sidecars_are_stamped(spark, tmp_path):
    t = str(tmp_path / "t")
    versioned.commit(spark, spark.range(3).selectExpr("id as k"), t)
    versioned.rename_column(t, "k", "key")
    for i in range(3):
        versioned.commit(
            spark, spark.range(10 + i, 11 + i).selectExpr("id as key"), t
        )
    removed = versioned.vacuum(t, keep_versions=2, min_age_s=0.0)
    tip = versioned._latest_committed(t)
    assert tip is not None
    # the oldest retained version resolves via its ~ckpt sidecar (the
    # base chain expired); the sidecar carries the stamp
    hist = [vi.version for vi in versioned.history(t)]
    ck = versioned._read_ckpt(t, hist[0])
    if ck is not None:  # only when the retained tip WAS a delta
        assert "column-mapping" in (ck.get("required_features") or [])
    got = versioned.read(spark, t)
    assert got.columns == ["key"]
