"""ALTER TABLE schema evolution — column mapping (round-10 wave 5).

RENAME and DROP COLUMN are metadata-only: the immutable data files
keep each column under its PHYSICAL name forever, and the manifest's
``column_mapping`` binds logical (user-facing) names to them — the
public Delta column-mapping discipline (name mode), original code.
``retired_cols`` pins the anti-resurrection rule: a physical name that
ever left the live schema is never re-bound, so re-adding a dropped
column yields NULLs, not the orphaned bytes.

Pinned here: ALTER round trips (API and SQL bridge), data preservation
across renames, null-fill of added columns, no-resurrection on
drop+re-add, DML / merge families / maintenance / clone / rollback on
mapped tables, stats pruning through the mapping, CDF conformance to
the tip schema across a rename, the Python Data Source on mapped
tables, and constraint-reference refusals.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned
from integritychecksforvldbs_spark.sources.versioned_sql import (
    register_table,
    versioned_sql,
)


def _mk(spark, path, rows=None):
    df = spark.createDataFrame(
        rows
        or [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id int, name string, qty int",
    )
    versioned.commit(spark, df, path)
    return path


def test_rename_preserves_data_and_time_travel(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v = versioned.rename_column(t, "name", "label")
    assert v == 2
    got = versioned.read(spark, t)
    assert got.columns == ["id", "label", "qty"]
    assert sorted(r.label for r in got.collect()) == ["a", "b", "c"]
    # the pre-rename snapshot still answers under the old name
    old = versioned.read(spark, t, version=1)
    assert old.columns == ["id", "name", "qty"]
    assert sorted(r.name for r in old.collect()) == ["a", "b", "c"]


def test_add_column_null_fills_and_append_supplies_it(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    versioned.add_column(t, "score", "double")
    got = versioned.read(spark, t)
    assert got.columns == ["id", "name", "qty", "score"]
    assert got.filter(F.col("score").isNull()).count() == 3
    versioned.commit(
        spark,
        spark.createDataFrame(
            [(4, "d", 40, 1.5)], "id int, name string, qty int, score double"
        ),
        t,
    )
    rows = {r.id: r.score for r in versioned.read(spark, t).collect()}
    assert rows == {1: None, 2: None, 3: None, 4: 1.5}


def test_drop_then_readd_never_resurrects(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    versioned.drop_column(t, "qty")
    assert versioned.read(spark, t).columns == ["id", "name"]
    versioned.add_column(t, "qty", "int")
    vals = [r.qty for r in versioned.read(spark, t).collect()]
    assert vals == [None, None, None]
    # the retired physical name is pinned in the manifest
    man = versioned._resolve_manifest(t, None)
    assert "qty" in versioned._retired(man)
    assert versioned._mapping(man)["qty"] != "qty"


def test_append_evolution_also_retires(spark, tmp_path):
    """A schema-evolving append that REMOVES a column retires its
    physical name the same way ALTER DROP does."""
    t = _mk(spark, str(tmp_path / "t"))
    versioned.commit(
        spark,
        spark.createDataFrame([(4, "d")], "id int, name string"),
        t,
        allow_schema_change=True,
    )
    versioned.add_column(t, "qty", "int")
    vals = [r.qty for r in versioned.read(spark, t).collect()]
    assert vals == [None] * 4  # the old qty=10/20/30 bytes stay dead


def test_dml_and_pruning_on_renamed_column(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    versioned.commit(
        spark, df.repartitionByRange(8, "id"), t
    )
    versioned.rename_column(t, "id", "ident")
    # stats pruning translates the logical name to the physical key
    man = versioned._resolve_manifest(t, None)
    kept, skipped = versioned._prune_manifest_files(
        man, {"ident": (990, None)}
    )
    assert skipped, "range-clustered files should prune on the new name"
    out = versioned.read_where(spark, t, {"ident": (990, None)})
    assert out.count() == 10
    v, n = versioned.delete_where(spark, t, "ident >= 500")
    assert n == 500
    assert versioned.read(spark, t).count() == 500
    v, n = versioned.update_where(spark, t, "ident = 0", {"v": "999"})
    assert n == 1
    got = {r.ident: r.v for r in versioned.read(spark, t).collect()}
    assert got[0] == 999


def test_merge_families_on_mapped_table(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    versioned.rename_column(t, "name", "nm")
    src = spark.createDataFrame(
        [(2, "B2", 99), (9, "new", 90)], "id int, nm string, qty int"
    )
    versioned.merge_into(spark, t, src, ["id"])
    got = {r.id: r.nm for r in versioned.read(spark, t).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}
    src2 = spark.createDataFrame(
        [(1, "A!", 5), (7, "g", 70)], "id int, nm string, qty int"
    )
    v, metrics = versioned.merge_when(
        spark, t, src2, ["id"],
        [
            {"when": "matched", "action": "update", "set": {"nm": "s.nm"}},
            {"when": "not_matched", "action": "insert", "values": "*"},
            {"when": "not_matched_by_source", "action": "delete"},
        ],
    )
    assert metrics == {"n_updated": 1, "n_deleted": 3, "n_inserted": 1}
    got = {r.id: r.nm for r in versioned.read(spark, t).collect()}
    assert got == {1: "A!", 7: "g"}


def test_maintenance_clone_rollback_on_mapped_table(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    versioned.rename_column(t, "name", "nm")
    versioned.compact(spark, t, n_files=1)
    assert sorted(r.nm for r in versioned.read(spark, t).collect()) == [
        "a", "b", "c",
    ]
    versioned.optimize(spark, t, zorder_by=["id"])
    assert sorted(r.nm for r in versioned.read(spark, t).collect()) == [
        "a", "b", "c",
    ]
    c = str(tmp_path / "clone")
    versioned.clone(spark, t, c)
    assert sorted(r.nm for r in versioned.read(spark, c).collect()) == [
        "a", "b", "c",
    ]
    versioned.rollback(spark, t, version=1)
    got = versioned.read(spark, t)
    assert got.columns == ["id", "name", "qty"]
    assert sorted(r.name for r in got.collect()) == ["a", "b", "c"]


def test_dv_table_survives_rename(spark, tmp_path):
    t = str(tmp_path / "t")
    versioned.commit(
        spark, spark.range(0, 100).withColumn("v", F.col("id") * 2), t
    )
    versioned.delete_where(spark, t, "id = 5", strategy="dv")
    assert versioned.dv_info(t), "point delete should take the DV path"
    versioned.rename_column(t, "id", "ident")
    got = versioned.read(spark, t)
    assert got.count() == 99
    assert got.filter("ident = 5").count() == 0
    # merge-on-read + mapping compose on the positional write path too
    v, n = versioned.delete_where(spark, t, "ident = 7", strategy="dv")
    assert versioned.read(spark, t).count() == 98


def test_constraints_block_rename_and_drop(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    versioned.set_constraints(spark, t, {"pos": "qty > 0"})
    with pytest.raises(ValueError, match="constraint"):
        versioned.rename_column(t, "qty", "quantity")
    with pytest.raises(ValueError, match="constraint"):
        versioned.drop_column(t, "qty")
    # a string literal mentioning the name is NOT a reference
    versioned.set_constraints(spark, t, {"named": "name != 'qty'"})
    versioned.rename_column(t, "qty", "quantity")
    # constraints keep working on the mapped table
    with pytest.raises(versioned.ConstraintViolation):
        versioned.set_constraints(spark, t, {"big": "quantity > 100"})


def test_alter_validation(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="already exists"):
        versioned.add_column(t, "name", "string")
    with pytest.raises(ValueError, match="no column"):
        versioned.rename_column(t, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        versioned.rename_column(t, "name", "qty")
    with pytest.raises(ValueError, match="no column"):
        versioned.drop_column(t, "nope")
    versioned.drop_column(t, "name")
    versioned.drop_column(t, "qty")
    with pytest.raises(ValueError, match="only column"):
        versioned.drop_column(t, "id")


def test_sql_bridge_alter_round_trip(spark, tmp_path):
    t = str(tmp_path / "t")
    register_table("evo_sql", t)
    versioned_sql(
        spark,
        "CREATE TABLE evo_sql AS VALUES (1,'a',10),(2,'b',20) "
        "AS v(id, name, qty)",
    )
    versioned_sql(spark, "ALTER TABLE evo_sql RENAME COLUMN name TO label")
    versioned_sql(
        spark, "ALTER TABLE evo_sql ADD COLUMNS (score double, note string)"
    )
    versioned_sql(spark, "ALTER TABLE evo_sql DROP COLUMN qty")
    out = versioned_sql(spark, "SELECT * FROM evo_sql ORDER BY id")
    assert out.columns == ["id", "label", "score", "note"]
    versioned_sql(spark, "UPDATE evo_sql SET score = 1.5 WHERE label = 'b'")
    versioned_sql(spark, "INSERT INTO evo_sql VALUES (3,'c',2.5,'x')")
    got = sorted(
        (r.id, r.score)
        for r in versioned_sql(
            spark, "SELECT id, score FROM evo_sql"
        ).collect()
    )
    assert got == [(1, None), (2, 1.5), (3, 2.5)]
    with pytest.raises(ValueError, match="ALTER TABLE"):
        versioned_sql(spark, "ALTER TABLE evo_sql SET TBLPROPERTIES x")


def test_changes_conform_to_tip_schema(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    versioned.rename_column(t, "name", "label")
    versioned.commit(
        spark,
        spark.createDataFrame(
            [(4, "d", 40)], "id int, label string, qty int"
        ),
        t,
    )
    versioned.delete_where(spark, t, "label = 'a'")
    ch = versioned.changes(spark, t, 1)
    assert set(ch.columns) == {"id", "label", "qty", "_change_type"}
    got = sorted(
        (r.id, r.label, r._change_type) for r in ch.collect()
    )
    assert got == [(1, "a", "delete"), (4, "d", "insert")]


def test_changes_conform_across_add_and_drop(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    versioned.drop_column(t, "qty")
    versioned.add_column(t, "score", "double")
    # rewrite so the old files LEAVE the visible set across the range
    versioned.update_where(
        spark, t, "id = 1", {"name": "'A'"}, strategy="copy"
    )
    ch = versioned.changes(spark, t, 1)
    assert set(ch.columns) == {"id", "name", "score", "_change_type"}
    rows = {(r.id, r.name, r._change_type): r.score for r in ch.collect()}
    # the departed row conforms to the tip: dropped qty projected
    # out, added score null-filled; unchanged rows cancel in the diff
    assert set(rows) == {(1, "A", "insert"), (1, "a", "delete")}
    assert all(v is None for v in rows.values())


def test_datasource_batch_read_on_mapped_table(spark, tmp_path):
    from integritychecksforvldbs_spark.sources.versioned_datasource import (
        register,
    )

    register(spark)
    t = _mk(spark, str(tmp_path / "t"))
    versioned.rename_column(t, "name", "label")
    versioned.add_column(t, "score", "double")
    versioned.drop_column(t, "qty")
    got = spark.read.format("versioned").load(t)
    assert got.columns == ["id", "label", "score"]
    rows = sorted((r.id, r.label, r.score) for r in got.collect())
    assert rows == [(1, "a", None), (2, "b", None), (3, "c", None)]
    old = spark.read.format("versioned").option("version", "1").load(t)
    assert old.columns == ["id", "name", "qty"]
    assert old.count() == 3


def test_pruning_and_pushdown_pass_through_mapping(spark, tmp_path):
    """The scale contract of the mapping: the logical→physical rename
    is a pure projection Catalyst sees through, so a narrow consumer
    still prunes the parquet ReadSchema to the PHYSICAL column and
    pushes its predicate into the scan — a mapped table pays zero at
    100 TB."""
    import re

    t = str(tmp_path / "t")
    versioned.commit(
        spark,
        spark.range(1000).selectExpr(
            "id AS a", "id*2 AS b", "id*3 AS c", "CAST(id AS STRING) AS s"
        ),
        t,
    )
    versioned.rename_column(t, "b", "bee")
    plan = (
        versioned.read(spark, t)
        .select("bee")
        .filter("bee > 100")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    rs = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert rs and "struct<b:bigint>" in rs.group(1), plan
    pf = re.search(r"PushedFilters: ([^\n]+)", plan)
    assert pf and "GreaterThan(b,100)" in pf.group(1), plan


def test_cyclic_rename_chain_swaps_atomically(spark, tmp_path):
    """a→tmp, b→a, tmp→b leaves the mapping ``{a: b, b: a}`` — a
    CYCLE.  withColumnsRenamed applies its map sequentially and would
    collapse both columns onto one name; the atomic select projection
    must keep the two columns distinct with values tracking names."""
    t = str(tmp_path / "t")
    versioned.commit(
        spark,
        spark.createDataFrame([(1, 100, 200)], "k int, a int, b int"),
        t,
    )
    versioned.rename_column(t, "a", "tmp")
    versioned.rename_column(t, "b", "a")
    versioned.rename_column(t, "tmp", "b")
    assert versioned._mapping(versioned._resolve_manifest(t, None)) == {
        "a": "b", "b": "a",
    }
    got = versioned.read(spark, t)
    assert sorted(got.columns) == ["a", "b", "k"]
    r = got.collect()[0]
    assert r["a"] == 200 and r["b"] == 100
    # DML and the write path round-trip through the swap
    versioned.update_where(spark, t, "a = 200", {"b": "b + 1"})
    r = versioned.read(spark, t).collect()[0]
    assert r["b"] == 101 and r["a"] == 200


def test_append_racing_alter_conflicts_not_erases(
    spark, tmp_path, monkeypatch
):
    """An ALTER landing between an append's base load and its CAS
    must surface as ConflictError — before the prepared_against check
    the append's re-based retry installed its STALE schema/mapping in
    the new top body and silently ERASED the rename (the fold reads
    only the top body's metadata)."""
    t = _mk(spark, str(tmp_path / "t"))
    real = versioned._latest_committed
    lied = {"done": False}

    def interleave(p):
        out = real(p)
        if not lied["done"] and out is not None and out[0] >= 1:
            lied["done"] = True
            monkeypatch.setattr(versioned, "_latest_committed", real)
            versioned.rename_column(t, "name", "label")
            monkeypatch.setattr(versioned, "_latest_committed", interleave)
        return out

    monkeypatch.setattr(versioned, "_latest_committed", interleave)
    with pytest.raises(versioned.ConflictError, match="schema/mapping"):
        versioned.commit(
            spark,
            spark.createDataFrame(
                [(4, "d", 40)], "id int, name string, qty int"
            ),
            t,
        )
    monkeypatch.undo()
    # the rename SURVIVED the losing append
    man = versioned._resolve_manifest(t, None)
    assert versioned._mapping(man) == {"label": "name"}
    got = versioned.read(spark, t)
    assert got.columns == ["id", "label", "qty"]
    assert sorted(r.label for r in got.collect()) == ["a", "b", "c"]
    # and a reloaded retry (new schema) lands cleanly
    versioned.commit(
        spark,
        spark.createDataFrame(
            [(4, "d", 40)], "id int, label string, qty int"
        ),
        t,
    )
    assert versioned.read(spark, t).count() == 4


def test_mapping_rides_every_body_form(spark, tmp_path):
    """Delta bodies, checkpoint bodies, and the parquet-externalized
    checkpoint all carry the mapping — reads stay correct across
    CHECKPOINT_EVERY boundaries."""
    t = _mk(spark, str(tmp_path / "t"))
    versioned.rename_column(t, "name", "label")
    for i in range(versioned.CHECKPOINT_EVERY + 2):
        versioned.commit(
            spark,
            spark.createDataFrame(
                [(100 + i, f"x{i}", i)], "id int, label string, qty int"
            ),
            t,
        )
    got = versioned.read(spark, t)
    assert got.columns == ["id", "label", "qty"]
    assert got.filter(F.col("label").isNull()).count() == 0
    man = versioned._resolve_manifest(t, None)
    assert versioned._mapping(man) == {"label": "name"}
