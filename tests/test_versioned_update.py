"""``update_where`` — file-scoped UPDATE completing the DML triad —
plus ``startingTimestamp`` streams and ``vacuum(dry_run=True)``."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("price"),
        F.concat(F.lit("v"), F.col("id")).alias("label"),
    )


@pytest.fixture()
def banded(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for i in range(3):
        versioned.commit(
            spark, _mk(spark, i * 10, (i + 1) * 10).coalesce(1), path
        )
    return path


def test_update_transforms_matching_rows_only(spark, banded):
    path = banded
    v, n = versioned.update_where(
        spark, path, "k >= 12 AND k <= 14",
        {"price": "price * 10", "label": "concat(label, '!')"},
    )
    assert n == 3
    got = {
        r["k"]: (r["price"], r["label"])
        for r in versioned.read(spark, path).collect()
    }
    assert got[13] == (260.0, "v13!")
    assert got[11] == (22.0, "v11")   # same file, unmatched: verbatim
    assert got[25] == (50.0, "v25")   # untouched file: verbatim
    assert len(got) == 30
    # file-scoped: only the 10-19 band was swapped
    raw = versioned._read_manifest(path, v)
    assert raw["mode"] == "update" and raw["data_change"] is True
    assert len(raw["remove_files"]) == 1
    # pre-update state stays time-travelable
    assert versioned.read(
        spark, path, version=3
    ).filter("k = 13 AND price = 26.0").count() == 1


def test_update_assignments_see_pre_update_row(spark, banded):
    """Standard UPDATE semantics: every SET expression evaluates
    against the OLD row, so swapping two columns works."""
    path = banded
    versioned.update_where(
        spark, path, "k = 5",
        {"price": "cast(k as double)", "k": "cast(price as bigint)"},
    )
    got = versioned.read(spark, path).filter("label = 'v5'").collect()[0]
    assert (got["k"], got["price"]) == (10, 5.0)


def test_update_no_match_is_audit_only(spark, banded):
    path = banded
    v, n = versioned.update_where(spark, path, "k > 999", {"price": "0.0"})
    assert n == 0
    raw = versioned._read_manifest(path, v)
    assert raw["data_change"] is False and raw["remove_files"] == []
    assert versioned.row_count(spark, path) == 30


def test_update_rejects_unknown_column(spark, banded):
    with pytest.raises(ValueError, match="unknown column"):
        versioned.update_where(spark, banded, "k = 1", {"nope": "1"})


def test_update_null_condition_rows_not_matched(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(
        spark,
        spark.createDataFrame(
            [(1, 5), (2, None), (3, 50)], "id long, x long"
        ),
        path,
    )
    v, n = versioned.update_where(spark, path, "x > 10", {"x": "x + 1"})
    assert n == 1
    got = {r["id"]: r["x"] for r in versioned.read(spark, path).collect()}
    assert got == {1: 5, 2: None, 3: 51}


def test_update_rebases_after_racing_commit(spark, banded, monkeypatch):
    path = banded
    real = versioned._commit_replace
    hits = {"n": 0}

    def racing(*args, **kw):
        if hits["n"] == 0:
            hits["n"] += 1
            versioned.commit(spark, _mk(spark, 100, 102).coalesce(1), path)
        return real(*args, **kw)

    monkeypatch.setattr(versioned, "_commit_replace", racing)
    _, n = versioned.update_where(
        spark, path, "k >= 100", {"price": "0.0"}
    )
    # the raced append's rows were re-evaluated and updated
    assert n == 2
    assert versioned.read(spark, path).filter(
        "k >= 100 AND price = 0.0"
    ).count() == 2


def test_update_cli(spark, tmp_path, capsys):
    import json

    from integritychecksforvldbs_spark.table_cli import main

    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 10).coalesce(1), path)
    main(
        [
            "versioned-update", "--table", path,
            "--where", "k < 3", "--set", "price=price+100, label='x'",
        ]
    )
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["cmd"] == "versioned-update" and s["n_updated"] == 3
    assert versioned.read(spark, path).filter("price >= 100").count() == 3


def test_starting_timestamp_stream_option(spark, tmp_path):
    from integritychecksforvldbs_spark.sources import (
        versioned_datasource as vds,
    )

    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 3).coalesce(1), path)
    t1 = time.time()
    time.sleep(0.05)
    versioned.commit(spark, _mk(spark, 3, 6).coalesce(1), path)

    class _Opts(dict):
        pass

    ds = vds.VersionedDataSource(_Opts(path=path, startingTimestamp=t1))
    from pyspark.sql.types import LongType, StructField, StructType

    r = ds.streamReader(StructType([StructField("k", LongType(), True)]))
    # base offset resolved to v1: only the post-timestamp commit streams
    assert r.initialOffset() == {"version": 1}
    assert len(r._files_between(1, 2)) == 1
    # older than the table: replay everything
    ds0 = vds.VersionedDataSource(
        _Opts(path=path, startingTimestamp=t1 - 3600)
    )
    assert ds0.streamReader(
        StructType([StructField("k", LongType(), True)])
    ).initialOffset() == {"version": 0}
    with pytest.raises(ValueError, match="not both"):
        vds.VersionedDataSource(
            _Opts(path=path, startingTimestamp=t1, startingVersion=1)
        ).streamReader(StructType([StructField("k", LongType(), True)]))


def test_vacuum_dry_run_reports_without_removing(spark, tmp_path):
    import os

    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 5).coalesce(1), path)
    versioned.commit(spark, _mk(spark, 0, 3).coalesce(1), path,
                     mode="overwrite")
    would = versioned.vacuum(path, keep_versions=1, min_age_s=0,
                             dry_run=True)
    assert len(would) == 1
    assert all(os.path.exists(d) for d in would)  # nothing deleted
    assert versioned._versions(path) == [1, 2]    # manifests intact
    assert versioned.read(spark, path, version=1).count() == 5
    removed = versioned.vacuum(path, keep_versions=1, min_age_s=0)
    assert removed == would  # the report was exact
    assert not os.path.exists(would[0])


def test_update_raises_instead_of_silently_nulling(spark, banded):
    """A SET expression whose type cannot losslessly widen into the
    column must raise — a blind cast would NULL the matched rows with
    ANSI off (self-review finding)."""
    with pytest.raises(ValueError, match="cast explicitly"):
        versioned.update_where(spark, banded, "k = 1", {"k": "'oops'"})
    # lossless widenings keep working implicitly
    v, n = versioned.update_where(spark, banded, "k = 1", {"price": "7"})
    assert n == 1
    assert versioned.read(spark, banded).filter(
        "k = 1 AND price = 7.0"
    ).count() == 1


def test_probe_column_name_collision_is_safe(spark, tmp_path):
    """A table column literally named like the probe's internal file
    column must not be shadowed inside the predicate (self-review
    finding: withColumn REPLACES same-named columns)."""
    path = str(tmp_path / "tbl")
    versioned.commit(
        spark,
        spark.createDataFrame(
            [(1, "keep"), (2, "x")], "k long, __icv_probe_file string"
        ).coalesce(1),
        path,
    )
    v, n = versioned.delete_where(
        spark, path, "__icv_probe_file = 'x'"
    )
    assert n == 1
    assert sorted(
        r["__icv_probe_file"]
        for r in versioned.read(spark, path).collect()
    ) == ["keep"]


def test_vacuum_cli_dry_run(spark, tmp_path, capsys):
    import json
    import os

    from integritychecksforvldbs_spark.table_cli import main

    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 5).coalesce(1), path)
    versioned.commit(
        spark, _mk(spark, 0, 2).coalesce(1), path, mode="overwrite"
    )
    main(
        [
            "versioned-vacuum", "--table", path, "--keep-versions", "1",
            "--min-age-s", "0", "--dry-run",
        ]
    )
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["dry_run"] is True and len(s["removed_paths"]) == 1
    assert os.path.exists(s["removed_paths"][0])  # report-only


def test_split_assignments_handles_quotes_and_parens():
    from integritychecksforvldbs_spark.table_cli import _split_assignments

    assert _split_assignments("a=round(b, 2), c=map('x,y', 1)") == [
        "a=round(b, 2)", "c=map('x,y', 1)"
    ]
    assert _split_assignments('a="x,y", b=2') == ['a="x,y"', "b=2"]
    assert _split_assignments("a='it''s, ok', b=1") == [
        "a='it''s, ok'", "b=1"
    ]
