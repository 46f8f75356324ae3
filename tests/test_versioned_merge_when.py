"""Conditional MERGE WHEN clauses (round-10 item #2) + SQL INSERT (#3).

The r9 verdict's top missing items: the SQL bridge supported only the
upsert-all MERGE and had no INSERT at all.  ``versioned.merge_when``
now implements the general clause form — ``WHEN MATCHED [AND cond]
THEN UPDATE SET …/DELETE``, conditional ``INSERT * | (cols) VALUES``,
and ``WHEN NOT MATCHED BY SOURCE THEN UPDATE/DELETE`` — which is
exactly the reference's three-branch inventory MERGE (matched update,
not-matched insert, not-matched-by-source deactivate, IC:454-484);
the SQL bridge parses the full grammar and dispatches (upsert-all
stays on merge_into), and ``INSERT INTO t VALUES …|SELECT …`` routes
to versioned.commit with constraints and schema discipline riding
along.

Pinned here: each branch family's semantics, first-true-clause-wins
ordering, SQL == API round-trips, metrics rows, the DV/copy strategy
split on the general path (including the island-cap fallback), type
discipline (lossless-only implicit casts), and INSERT alignment
(positional, named + NULL-fill, constraint refusal, drift refusal).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import deletion_vectors as dvmod
from integritychecksforvldbs_spark.sources import versioned
from integritychecksforvldbs_spark.sources.versioned_sql import (
    register_table,
    versioned_sql,
)


def _mk(spark, lo, hi):
    # inventory-shaped rows: key, qty, active flag
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 10).cast("long").alias("qty"),
            F.lit(1).cast("int").alias("active"),
        )
        .coalesce(1)
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 100), path)
    register_table("inv", path)
    yield path
    register_table("inv", None)


def _source(spark):
    # keys 90..109: 90-99 match, 100-109 are new; qty = 1000 + k
    return spark.range(90, 110).select(
        F.col("id").alias("k"),
        (F.lit(1000) + F.col("id")).cast("long").alias("qty"),
    )


THREE_BRANCH = [
    {"when": "matched", "cond": "s.qty > t.qty", "action": "update",
     "set": {"qty": "s.qty"}},
    {"when": "not_matched", "action": "insert",
     "values": {"k": "s.k", "qty": "s.qty", "active": "1"}},
    {"when": "not_matched_by_source", "cond": "t.k < 5",
     "action": "update", "set": {"active": "0"}},
]


def _expected_three_branch(spark):
    # rows 0..4 deactivated; 5..89 untouched; 90..99 qty := 1000+k;
    # 100..109 inserted active
    base = _mk(spark, 0, 100)
    return _rows(
        base.select(
            "k",
            F.when(F.col("k") >= 90, F.lit(1000) + F.col("k"))
            .otherwise(F.col("qty"))
            .cast("long")
            .alias("qty"),
            F.when(F.col("k") < 5, F.lit(0))
            .otherwise(F.col("active"))
            .cast("int")
            .alias("active"),
        ).unionByName(
            spark.range(100, 110).select(
                F.col("id").alias("k"),
                (F.lit(1000) + F.col("id")).cast("long").alias("qty"),
                F.lit(1).cast("int").alias("active"),
            )
        )
    )


def test_three_branch_inventory_merge(spark, tbl):
    v, m = versioned.merge_when(
        spark, tbl, _source(spark), ["k"], THREE_BRANCH
    )
    assert m == {"n_updated": 15, "n_deleted": 0, "n_inserted": 10}
    got = versioned.read(spark, tbl).select("k", "qty", "active")
    assert _rows(got) == _expected_three_branch(spark)


def test_sql_three_branch_equals_api(spark, tbl):
    src = _source(spark)
    src.createOrReplaceTempView("merge_src")
    m = versioned_sql(
        spark,
        """MERGE INTO inv t USING merge_src s ON t.k = s.k
           WHEN MATCHED AND s.qty > t.qty THEN UPDATE SET qty = s.qty
           WHEN NOT MATCHED THEN INSERT (k, qty, active)
             VALUES (s.k, s.qty, 1)
           WHEN NOT MATCHED BY SOURCE AND t.k < 5
             THEN UPDATE SET active = 0""",
    ).collect()[0]
    assert (m["n_updated"], m["n_deleted"], m["n_inserted"]) == (15, 0, 10)
    assert m["n_source_rows"] == 20
    got = versioned.read(spark, tbl).select("k", "qty", "active")
    assert _rows(got) == _expected_three_branch(spark)


def test_first_true_clause_wins_and_delete(spark, tbl):
    src = _source(spark)
    # k % 2 = 0 → DELETE wins (listed first); odd matched → update
    v, m = versioned.merge_when(
        spark, tbl, src, ["k"],
        [
            {"when": "matched", "cond": "s.k % 2 = 0",
             "action": "delete"},
            {"when": "matched", "action": "update",
             "set": {"qty": "s.qty + t.qty"}},
        ],
    )
    assert m == {"n_updated": 5, "n_deleted": 5, "n_inserted": 0}
    got = versioned.read(spark, tbl)
    assert got.count() == 95
    assert got.filter("k in (90, 92, 94, 96, 98)").count() == 0
    # 91 → 1091 + 91 % 10
    assert got.filter("k = 91").collect()[0]["qty"] == 1091 + 1


def test_not_matched_by_source_delete(spark, tbl):
    src = _mk(spark, 0, 50).select("k", "qty")
    v, m = versioned.merge_when(
        spark, tbl, src, ["k"],
        [{"when": "not_matched_by_source", "action": "delete"}],
    )
    assert m == {"n_updated": 0, "n_deleted": 50, "n_inserted": 0}
    got = versioned.read(spark, tbl)
    assert got.count() == 50 and got.filter("k >= 50").count() == 0


def test_insert_explicit_columns_null_fill(spark, tbl):
    src = spark.range(200, 203).select(F.col("id").alias("k"))
    v, m = versioned.merge_when(
        spark, tbl, src, ["k"],
        [{"when": "not_matched", "action": "insert",
          "values": {"k": "s.k", "active": "0"}}],
    )
    assert m["n_inserted"] == 3
    got = versioned.read(spark, tbl).filter("k >= 200")
    assert _rows(got) == [(200, None, 0), (201, None, 0), (202, None, 0)]


def test_conditional_insert_filters(spark, tbl):
    src = spark.range(200, 210).select(
        F.col("id").alias("k"), F.col("id").cast("long").alias("qty")
    )
    v, m = versioned.merge_when(
        spark, tbl, src, ["k"],
        [{"when": "not_matched", "cond": "s.k % 2 = 1",
          "action": "insert",
          "values": {"k": "s.k", "qty": "s.qty", "active": "1"}}],
    )
    assert m["n_inserted"] == 5
    assert versioned.read(spark, tbl).filter("k >= 200").count() == 5


def test_dv_and_copy_strategies_agree(spark, tmp_path):
    rows = {}
    for strat in ("dv", "copy"):
        path = str(tmp_path / strat)
        versioned.commit(spark, _mk(spark, 0, 100), path)
        v, m = versioned.merge_when(
            spark, path, _source(spark), ["k"], THREE_BRANCH,
            strategy=strat,
        )
        assert m == {"n_updated": 15, "n_deleted": 0, "n_inserted": 10}
        rows[strat] = _rows(
            versioned.read(spark, path).select("k", "qty", "active")
        )
        # dv leaves sidecars, copy leaves none
        assert bool(versioned.dv_info(path)) == (strat == "dv")
    assert rows["dv"] == rows["copy"]


def test_island_cap_falls_back_on_general_merge(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(dvmod, "DV_MAX_ISLANDS", 10)
    path = str(tmp_path / "tbl")
    versioned.commit(
        spark,
        spark.range(0, 2000).select(
            F.col("id").alias("k"),
            F.col("id").cast("long").alias("qty"),
            F.lit(1).cast("int").alias("active"),
        ).coalesce(1),
        path,
    )
    # every 20th key: 100 scattered islands, 5% of rows (under the
    # fraction gate) — auto must fall back to copy-on-write
    src = spark.range(0, 2000).filter("id % 20 = 0").select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("qty")
    )
    v, m = versioned.merge_when(
        spark, path, src, ["k"],
        [{"when": "matched", "action": "update", "set": {"qty": "0"}}],
    )
    assert m["n_updated"] == 100
    assert versioned.dv_info(path) == {}
    got = versioned.read(spark, path)
    assert got.filter("qty = 0 and k % 20 = 0").count() == 100


def test_ambiguous_source_raises(spark, tbl):
    src = _source(spark).unionByName(_source(spark).limit(1))
    with pytest.raises(ValueError, match="not unique on keys"):
        versioned.merge_when(
            spark, tbl, src, ["k"],
            [{"when": "matched", "action": "delete"}],
        )


def test_lossy_set_type_raises(spark, tbl):
    with pytest.raises(ValueError, match="cast explicitly"):
        versioned.merge_when(
            spark, tbl, _source(spark), ["k"],
            [{"when": "matched", "action": "update",
              "set": {"qty": "'oops'"}}],
        )


def test_clause_shape_validation(spark, tbl):
    with pytest.raises(ValueError, match="cannot INSERT"):
        versioned.merge_when(
            spark, tbl, _source(spark), ["k"],
            [{"when": "matched", "action": "insert", "values": "*"}],
        )
    with pytest.raises(ValueError, match="BY SOURCE cannot UPDATE SET"):
        versioned.merge_when(
            spark, tbl, _source(spark), ["k"],
            [{"when": "not_matched_by_source", "action": "update",
              "set": "*"}],
        )
    with pytest.raises(ValueError, match="at least one"):
        versioned.merge_when(spark, tbl, _source(spark), ["k"], [])


def test_sql_matched_delete_roundtrip(spark, tbl):
    _source(spark).createOrReplaceTempView("merge_src")
    m = versioned_sql(
        spark,
        "MERGE INTO inv t USING merge_src s ON t.k = s.k "
        "WHEN MATCHED THEN DELETE",
    ).collect()[0]
    assert m["n_deleted"] == 10 and m["n_updated"] == 0
    assert versioned.read(spark, tbl).count() == 90


def test_sql_upsert_all_still_fast_path(spark, tbl):
    # the legacy form keeps merge_into's metrics shape (no per-branch
    # counts — proof it dispatched to the fast path)
    src = _source(spark).withColumn("active", F.lit(1).cast("int"))
    src.createOrReplaceTempView("merge_src")
    m = versioned_sql(
        spark,
        "MERGE INTO inv t USING merge_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    assert sorted(m.columns) == ["n_source_rows", "version"]
    assert versioned.read(spark, tbl).count() == 110


# ---------------------------------------------------------------------------
# INSERT INTO
# ---------------------------------------------------------------------------


def test_sql_insert_values(spark, tbl):
    m = versioned_sql(
        spark,
        "INSERT INTO inv VALUES (500, 7, 1), (501, 8, 0)",
    ).collect()[0]
    assert m["n_inserted"] == 2
    got = versioned.read(spark, tbl).filter("k >= 500")
    assert _rows(got) == [(500, 7, 1), (501, 8, 0)]


def test_sql_insert_named_columns_null_fill(spark, tbl):
    m = versioned_sql(
        spark, "INSERT INTO inv (k, active) VALUES (600, 0)"
    ).collect()[0]
    assert m["n_inserted"] == 1
    got = versioned.read(spark, tbl).filter("k = 600")
    assert _rows(got) == [(600, None, 0)]


def test_sql_insert_select(spark, tbl):
    # the source SELECT reads the registered versioned table itself
    m = versioned_sql(
        spark,
        "INSERT INTO inv SELECT k + 1000, qty, active FROM inv "
        "WHERE k < 3",
    ).collect()[0]
    assert m["n_inserted"] == 3
    assert versioned.read(spark, tbl).filter("k >= 1000").count() == 3


def test_sql_insert_arity_mismatch(spark, tbl):
    with pytest.raises(ValueError, match="needs 3 columns"):
        versioned_sql(spark, "INSERT INTO inv VALUES (1, 2)")


def test_sql_insert_lossy_type_refused(spark, tbl):
    with pytest.raises(ValueError, match="cast explicitly"):
        versioned_sql(spark, "INSERT INTO inv VALUES (1, 'x', 1)")


def test_sql_insert_constraint_refused(spark, tmp_path):
    path = str(tmp_path / "ctbl")
    versioned.commit(spark, _mk(spark, 0, 10), path)
    versioned.set_constraints(spark, path, {"qty_pos": "qty >= 0"})
    register_table("cinv", path)
    try:
        with pytest.raises(versioned.ConstraintViolation):
            versioned_sql(spark, "INSERT INTO cinv VALUES (99, -5, 1)")
        assert versioned.read(spark, path).count() == 10
    finally:
        register_table("cinv", None)


def test_dv_merge_enforces_constraint_under_column_mapping(
    spark, tmp_path
):
    """Regression (r10 advice, high): the merge-on-read branch wrote
    mapped files but ran _enforce without the mapping, so a CHECK on a
    renamed column scanned logical names against physical-named files,
    read nulls, and coalesce(null, True) silently passed violating
    rows.  Pinned: rename + CHECK on the new name + strategy='dv'
    violating update -> ConstraintViolation, table unchanged."""
    path = str(tmp_path / "mapped")
    versioned.commit(spark, _mk(spark, 0, 100), path)
    versioned.rename_column(path, "qty", "quantity")
    versioned.set_constraints(spark, path, {"q_small": "quantity < 500"})
    before = _rows(versioned.read(spark, path))
    src = spark.range(90, 95).select(
        F.col("id").alias("k"),
        (F.lit(1000) + F.col("id")).cast("long").alias("quantity"),
    )
    with pytest.raises(versioned.ConstraintViolation):
        versioned.merge_when(
            spark, path, src, ["k"],
            [{"when": "matched", "action": "update",
              "set": {"quantity": "s.quantity"}}],
            strategy="dv",
        )
    assert _rows(versioned.read(spark, path)) == before


def test_dv_merge_valid_update_under_column_mapping(spark, tmp_path):
    """Companion: a NON-violating dv merge on a mapped table commits
    and the renamed column carries the updated values (the _enforce
    fix must not refuse valid rows by mis-reading physical names)."""
    path = str(tmp_path / "mapped_ok")
    versioned.commit(spark, _mk(spark, 0, 100), path)
    versioned.rename_column(path, "qty", "quantity")
    versioned.set_constraints(spark, path, {"q_small": "quantity < 500"})
    src = spark.range(90, 95).select(
        F.col("id").alias("k"),
        (F.lit(400) + F.col("id") % 7).cast("long").alias("quantity"),
    )
    v, m = versioned.merge_when(
        spark, path, src, ["k"],
        [{"when": "matched", "action": "update",
          "set": {"quantity": "s.quantity"}}],
        strategy="dv",
    )
    assert m["n_updated"] == 5
    got = {
        r["k"]: r["quantity"]
        for r in versioned.read(spark, path).filter("k >= 90").collect()
    }
    for k in range(90, 95):
        assert got[k] == 400 + k % 7
