"""CREATE TABLE AS / DESCRIBE DETAIL SQL verbs + MERGE alias scoping
(round-10 polish wave).

CTAS completes the SQL front door's lifecycle: a SQL-first user can
now create, append, mutate, inspect, and maintain a versioned table
without touching the Python API.  DESCRIBE DETAIL answers from
manifest metadata only (no data file opens) — the Delta verb of the
same name.  The alias-scoping check diagnoses ANSI MERGE's branch
rules eagerly: a NOT-MATCHED-BY-SOURCE clause has no source row and a
NOT-MATCHED insert has no target row, so referencing the absent side
is an immediate error instead of an analyzer NULL surprise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned
from integritychecksforvldbs_spark.sources.versioned_sql import (
    register_table,
    versioned_sql,
)


@pytest.fixture()
def reg(tmp_path):
    path = str(tmp_path / "tbl")
    register_table("ct", path)
    yield path
    register_table("ct", None)


def test_ctas_creates_and_refuses_overwrite(spark, reg):
    m = versioned_sql(
        spark, "CREATE TABLE ct AS VALUES (1, 'a'), (2, 'b')"
    ).collect()[0]
    assert m["version"] == 1 and m["n_rows"] == 2
    assert versioned.read(spark, reg).count() == 2
    with pytest.raises(ValueError, match="OR REPLACE"):
        versioned_sql(spark, "CREATE TABLE ct AS VALUES (3, 'c')")
    m = versioned_sql(
        spark, "CREATE OR REPLACE TABLE ct AS VALUES (3, 'c')"
    ).collect()[0]
    assert m["n_rows"] == 1
    assert [tuple(r) for r in versioned.read(spark, reg).collect()] == [
        (3, "c")
    ]
    # history preserved: v1 still time-travels
    assert versioned.read(spark, reg, version=1).count() == 2


def test_ctas_from_select_over_registered_table(spark, reg, tmp_path):
    versioned_sql(spark, "CREATE TABLE ct AS VALUES (1, 10), (2, 20)")
    register_table("ct2", str(tmp_path / "tbl2"))
    try:
        m = versioned_sql(
            spark,
            "CREATE TABLE ct2 AS SELECT col1, col2 * 2 AS col2 FROM ct",
        ).collect()[0]
        assert m["n_rows"] == 2
        got = versioned_sql(spark, "SELECT * FROM ct2 ORDER BY col1")
        assert [tuple(r) for r in got.collect()] == [(1, 20), (2, 40)]
    finally:
        register_table("ct2", None)


def test_describe_detail_metadata_only(spark, reg):
    versioned_sql(
        spark,
        "CREATE TABLE ct AS SELECT id AS k, id * 2 AS d FROM range(100)",
    )
    versioned_sql(spark, "DELETE FROM ct WHERE k = 7")  # DV or copy
    row = versioned_sql(spark, "DESCRIBE DETAIL ct").collect()[0]
    assert row["version"] == 2
    assert row["n_rows"] == 99
    assert row["n_files"] >= 1
    assert row["n_constraints"] == 0
    assert "k" in (row["schema"] or "")
    if row["n_dvs"]:
        assert row["dv_dead_rows"] == 1


def test_merge_nmbs_cannot_reference_source(spark, reg):
    versioned_sql(spark, "CREATE TABLE ct AS VALUES (1, 'a')")
    src = spark.createDataFrame([(1, "z")], "col1 int, col2 string")
    with pytest.raises(ValueError, match="cannot reference the source"):
        versioned.merge_when(
            spark, reg, src, ["col1"],
            [{"when": "not_matched_by_source", "action": "update",
              "set": {"col2": "s.col2"}}],
        )
    # inside a string literal it's data, not a reference
    v, m = versioned.merge_when(
        spark, reg, src, ["col1"],
        [{"when": "not_matched_by_source", "action": "update",
          "set": {"col2": "'s.not_a_ref'"}}],
    )
    assert m == {"n_updated": 0, "n_deleted": 0, "n_inserted": 0}


def test_merge_insert_cannot_reference_target(spark, reg):
    versioned_sql(spark, "CREATE TABLE ct AS VALUES (1, 'a')")
    src = spark.createDataFrame([(2, "z")], "col1 int, col2 string")
    with pytest.raises(ValueError, match="cannot reference the target"):
        versioned.merge_when(
            spark, reg, src, ["col1"],
            [{"when": "not_matched", "action": "insert",
              "values": {"col1": "s.col1", "col2": "t.col2"}}],
        )
