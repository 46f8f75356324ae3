"""Commit-time CHECK constraints on versioned tables.

The reference's whole purpose is integrity CHECKING of stored data
(DBCC CHECKDB over committed pages, IntegrityChecks_VLDB.sql); this is
the prevention-side complement for the engine's own tables: a SQL
predicate registered on the table that every data-adding commit must
satisfy or be refused — Delta's ``ALTER TABLE ADD CONSTRAINT`` CHECK
semantics (violation = predicate definitively FALSE; NULL passes).
The active map rides every manifest body, so it versions, time-travels
and rolls back with the data it governed; validation scans only the
commit's own freshly written files (O(commit), refused files stay
invisible orphans for vacuum).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("price"),
    )


@pytest.fixture()
def constrained(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 10), path)
    versioned.set_constraints(
        spark, path,
        {"k_nonneg": "k >= 0", "price_positive": "price >= 0"},
    )
    return path


def test_set_constraints_is_metadata_only_and_versioned(spark, constrained):
    path = constrained
    assert versioned.constraints(path) == {
        "k_nonneg": "k >= 0", "price_positive": "price >= 0",
    }
    raw = versioned._read_manifest(path, 2)
    assert raw["mode"] == "set_constraints"
    assert raw["data_change"] is False  # streams skip it
    assert versioned.row_count(spark, path) == 10
    # the pre-constraint version shows the empty map (time travel)
    assert versioned.constraints(path, version=1) == {}


def test_violating_append_is_refused_and_burns_no_version(
    spark, constrained
):
    path = constrained
    bad = spark.createDataFrame([(-1, 2.0)], "k long, price double")
    with pytest.raises(versioned.ConstraintViolation, match="k_nonneg"):
        versioned.commit(spark, bad, path)
    assert versioned._versions(path) == [1, 2]  # nothing installed
    assert versioned.row_count(spark, path) == 10
    # the refused files are invisible orphans vacuum reclaims
    removed = versioned.vacuum(path, min_age_s=0)
    assert removed
    # a VALID append passes and carries the map forward
    v = versioned.commit(spark, _mk(spark, 10, 12), path)
    assert versioned.constraints(path, version=v) == versioned.constraints(
        path
    )


def test_null_predicate_rows_pass_like_sql_check(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(
        spark,
        spark.createDataFrame([(1, 5.0)], "k long, price double"),
        path,
    )
    versioned.set_constraints(spark, path, {"p": "price > 0"})
    with_null = spark.createDataFrame(
        [(2, None)], "k long, price double"
    )
    v = versioned.commit(spark, with_null, path)  # NULL check passes
    assert versioned.row_count(spark, path) == 2


def test_add_constraint_existing_violations_refused(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(
        spark,
        spark.createDataFrame([(1,), (-5,)], "k long"),
        path,
    )
    with pytest.raises(
        versioned.ConstraintViolation, match="existing rows"
    ):
        versioned.set_constraints(spark, path, {"k_nonneg": "k >= 0"})
    assert versioned.constraints(path) == {}


def test_update_and_merge_enforce_but_delete_does_not(spark, constrained):
    path = constrained
    with pytest.raises(versioned.ConstraintViolation, match="update_where"):
        versioned.update_where(spark, path, "k = 3", {"price": "-1.0"})
    with pytest.raises(versioned.ConstraintViolation, match="merge_into"):
        versioned.merge_into(
            spark, path,
            spark.createDataFrame([(-9, 1.0)], "k long, price double"),
            keys=["k"],
        )
    # a valid update/merge still lands
    versioned.update_where(spark, path, "k = 3", {"price": "99.0"})
    versioned.merge_into(
        spark, path,
        spark.createDataFrame([(100, 1.0)], "k long, price double"),
        keys=["k"],
    )
    # DELETE only removes rows — no validation needed, never refused
    v, n = versioned.delete_where(spark, path, "k = 4")
    assert n == 1
    assert versioned.row_count(spark, path) == 10


def test_rollback_restores_the_target_versions_map(spark, constrained):
    path = constrained
    versioned.set_constraints(spark, path, {})  # v3 drops them
    assert versioned.constraints(path) == {}
    versioned.rollback(spark, path, 2)  # back to the constrained state
    assert versioned.constraints(path) == {
        "k_nonneg": "k >= 0", "price_positive": "price >= 0",
    }
    # and they ENFORCE again
    with pytest.raises(versioned.ConstraintViolation):
        versioned.commit(
            spark,
            spark.createDataFrame([(-1, 1.0)], "k long, price double"),
            path,
        )


def test_drop_constraints_allows_previously_refused_rows(
    spark, constrained
):
    path = constrained
    versioned.set_constraints(spark, path, {})
    v = versioned.commit(
        spark,
        spark.createDataFrame([(-1, 1.0)], "k long, price double"),
        path,
    )
    assert versioned.row_count(spark, path) == 11


def test_constraints_survive_layout_maintenance(spark, constrained):
    path = constrained
    versioned.commit(spark, _mk(spark, 10, 13).coalesce(1), path)
    versioned.compact_files(spark, path, min_bytes=1 << 30)
    versioned.optimize(spark, path, n_files=1)
    assert versioned.constraints(path) == {
        "k_nonneg": "k >= 0", "price_positive": "price >= 0",
    }


def test_constraints_cli(spark, tmp_path, capsys):
    import json

    from integritychecksforvldbs_spark.table_cli import main

    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 5).coalesce(1), path)
    main(
        [
            "versioned-constraints", "--table", path,
            "--set", "k_nonneg=k >= 0",
        ]
    )
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["version"] == 2 and s["constraints"] == {"k_nonneg": "k >= 0"}
    main(["versioned-constraints", "--table", path])
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["constraints"] == {"k_nonneg": "k >= 0"}
