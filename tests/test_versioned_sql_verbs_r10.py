"""Round-10 wave-7 SQL front-door verbs + the mapped-table stream.

``ALTER TABLE ADD/DROP CONSTRAINT`` routes to
:func:`versioned.set_constraints` (ADD validates the live rows first —
Delta's semantics), ``CREATE BLOOMFILTER INDEX ... FOR COLUMNS`` to
:func:`versioned.build_bloom` (Delta's public syntax), ``DROP TABLE``
unbinds a registration WITHOUT touching bytes (external-table
semantics), ``SHOW TABLES`` lists registrations.  Plus the streaming
Python Data Source over a COLUMN-MAPPED table: physical read names
resolve through the current mapping, so a stream started after a
rename replays pre-rename files correctly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned
from integritychecksforvldbs_spark.sources.versioned_sql import (
    register_table,
    versioned_sql,
)


def test_sql_constraint_lifecycle(spark, tmp_path):
    t = str(tmp_path / "t")
    register_table("w7c", t)
    versioned_sql(
        spark,
        "CREATE TABLE w7c AS VALUES (1,'a',10),(2,'b',20) AS v(id,name,qty)",
    )
    versioned_sql(spark, "ALTER TABLE w7c ADD CONSTRAINT pos CHECK (qty > 0)")
    assert versioned.constraints(t) == {"pos": "qty > 0"}
    with pytest.raises(versioned.ConstraintViolation):
        versioned_sql(spark, "INSERT INTO w7c VALUES (3,'c',-5)")
    with pytest.raises(ValueError, match="already exists"):
        versioned_sql(
            spark, "ALTER TABLE w7c ADD CONSTRAINT pos CHECK (qty > 1)"
        )
    # ADD validates the existing rows first (Delta's semantics)
    with pytest.raises(versioned.ConstraintViolation):
        versioned_sql(
            spark, "ALTER TABLE w7c ADD CONSTRAINT big CHECK (qty > 15)"
        )
    versioned_sql(spark, "ALTER TABLE w7c DROP CONSTRAINT pos")
    assert versioned.constraints(t) == {}
    versioned_sql(spark, "INSERT INTO w7c VALUES (3,'c',-5)")
    with pytest.raises(ValueError, match="no constraint"):
        versioned_sql(spark, "ALTER TABLE w7c DROP CONSTRAINT nope")


def test_sql_bloom_index_and_show_drop(spark, tmp_path):
    t = str(tmp_path / "t")
    register_table("w7b", t)
    versioned_sql(
        spark,
        "CREATE TABLE w7b AS VALUES (1,'a',10),(2,'b',20) AS v(id,name,qty)",
    )
    versioned_sql(
        spark, "CREATE BLOOMFILTER INDEX ON TABLE w7b FOR COLUMNS (name, id)"
    )
    man = versioned._resolve_manifest(t, None)
    assert set(man.get("bloom") or {}) == {"name", "id"}
    detail = versioned_sql(spark, "DESCRIBE DETAIL w7b").collect()[0]
    assert detail["n_bloom_indexes"] == 2
    assert detail["n_mapped_columns"] == 0
    rows = versioned_sql(spark, "SHOW TABLES").collect()
    assert any(r.table == "w7b" for r in rows)
    versioned_sql(spark, "DROP TABLE w7b")
    rows = versioned_sql(spark, "SHOW TABLES").collect()
    assert not any(r.table == "w7b" for r in rows)
    # external-table semantics: bytes and history survive the DROP
    assert versioned.read(spark, t).count() == 2
    with pytest.raises(ValueError, match="unknown versioned table"):
        versioned_sql(spark, "DROP TABLE w7b")
    versioned_sql(spark, "DROP TABLE IF EXISTS w7b")  # idempotent form


def test_stream_reads_mapped_table(spark, tmp_path):
    from integritychecksforvldbs_spark.sources.versioned_datasource import (
        register,
    )

    register(spark)
    t = str(tmp_path / "t")
    versioned.commit(
        spark,
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id int, name string"
        ),
        t,
    )
    versioned.rename_column(t, "name", "label")
    versioned.commit(
        spark,
        spark.createDataFrame([(3, "c")], "id int, label string"),
        t,
    )
    out = str(tmp_path / "out")
    (
        spark.readStream.format("versioned")
        .load(t)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out)
    assert set(got.columns) == {"id", "label"}
    rows = sorted((r.id, r.label) for r in got.collect())
    # pre-rename files replay under the CURRENT logical name, with
    # their values (physical identity), not nulls
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_sql_add_columns_nested_types(spark, tmp_path):
    """r10 verdict gap #2: _split_top tracked only () and quotes, so
    ``map<string,int>`` split at its comma and failed type parse.
    Angle-depth is opt-in (type lists only — in predicates < and > are
    comparisons).  Pinned: SQL round-trip == Python API for map/array/
    struct adds, multi-column statements included."""
    from pyspark.sql import types as T

    t = str(tmp_path / "t")
    register_table("w11n", t)
    try:
        versioned_sql(
            spark, "CREATE TABLE w11n AS VALUES (1,'a') AS v(id,name)"
        )
        versioned_sql(
            spark,
            "ALTER TABLE w11n ADD COLUMNS m map<string,int>, "
            "tags array<string>, "
            "pt struct<x: double, y: map<string, array<int>>>",
        )
        sch = versioned.read(spark, t).schema
        assert sch["m"].dataType == T.MapType(
            T.StringType(), T.IntegerType()
        )
        assert sch["tags"].dataType == T.ArrayType(T.StringType())
        assert sch["pt"].dataType == T.StructType(
            [
                T.StructField("x", T.DoubleType()),
                T.StructField(
                    "y",
                    T.MapType(
                        T.StringType(), T.ArrayType(T.IntegerType())
                    ),
                ),
            ]
        )
        # the loud failure for malformed types is retained
        with pytest.raises(Exception):
            versioned_sql(
                spark, "ALTER TABLE w11n ADD COLUMNS bad map<string,"
            )
    finally:
        register_table("w11n", None)


def test_sql_drop_table_if_exists_any_whitespace(spark):
    """r10 advice (low): the handler substring-probed 'IF EXISTS'
    while the regex accepted arbitrary whitespace, so double-spaced
    ``IF  EXISTS`` on an unknown table raised."""
    m = versioned_sql(
        spark, "DROP TABLE IF  EXISTS never_registered_w11"
    ).collect()[0]
    assert m["n_dropped"] == 0
    versioned_sql(spark, "DROP TABLE if\n  exists never_registered_w11")
    with pytest.raises(ValueError, match="unknown versioned table"):
        versioned_sql(spark, "DROP TABLE never_registered_w11")
