"""SQL front door for versioned tables (versioned_sql.py, r9).

Pins the r8 verdict's "What's missing #5": MERGE/DELETE/UPDATE and
time-travel SELECT as SQL statements, each routed to the versioned
primitives and matching the Python-API result exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned
from integritychecksforvldbs_spark.sources.versioned_sql import (
    register_table,
    versioned_sql,
)


def _mk(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("g"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
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
    register_table("t9", path)
    yield path
    register_table("t9", None)


def test_sql_delete_matches_api(spark, tbl):
    m = versioned_sql(spark, "DELETE FROM t9 WHERE k IN (3, 4, 50)")
    row = m.collect()[0]
    assert row["version"] == 2 and row["n_deleted"] == 3
    assert versioned.read(spark, tbl).count() == 97
    assert versioned.read(spark, tbl).filter("k = 4").count() == 0


def test_sql_delete_without_where_empties_table(spark, tbl):
    m = versioned_sql(spark, "delete from t9")
    assert m.collect()[0]["n_deleted"] == 100
    assert versioned._latest_committed(tbl)[1]["files"] == []


def test_sql_update_multi_set_sees_pre_update_row(spark, tbl):
    m = versioned_sql(
        spark,
        "UPDATE t9 SET g = g + k, v = concat(v, '-', g) WHERE k in (7, 8)",
    )
    row = m.collect()[0]
    assert row["version"] == 2 and row["n_updated"] == 2
    got = {
        r["k"]: (r["g"], r["v"])
        for r in versioned.read(spark, tbl).filter("k in (7, 8)").collect()
    }
    # both assignments evaluated against the OLD row (g before the SET)
    assert got[7] == (7 + 7 % 5, "v7-2") and got[8] == (8 + 8 % 5, "v8-3")


def test_sql_update_set_list_with_function_commas(spark, tbl):
    versioned_sql(
        spark,
        "UPDATE t9 SET v = concat_ws(',', v, 'x'), g = greatest(g, 4) "
        "WHERE k = 1",
    )
    r = versioned.read(spark, tbl).filter("k = 1").collect()[0]
    assert r["v"] == "v1,x" and r["g"] == 4


def test_sql_merge_subquery_source(spark, tbl):
    m = versioned_sql(
        spark,
        """MERGE INTO t9 AS t
           USING (SELECT 42 AS k, 0 AS g, 'UPD' AS v
                  UNION ALL
                  SELECT 999 AS k, 1 AS g, 'NEW' AS v) AS s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
    )
    row = m.collect()[0]
    assert row["version"] == 2 and row["n_source_rows"] == 2
    got = dict(
        (r["k"], r["v"])
        for r in versioned.read(spark, tbl)
        .filter("k in (41, 42, 999)")
        .collect()
    )
    assert got == {41: "v41", 42: "UPD", 999: "NEW"}
    assert versioned.read(spark, tbl).count() == 101


def test_sql_merge_view_source_and_when_optional(spark, tbl):
    spark.createDataFrame(
        [(1, 9, "one")], "k long, g long, v string"
    ).createOrReplaceTempView("src_view")
    versioned_sql(spark, "MERGE INTO t9 t USING src_view s ON t.k = s.k")
    assert versioned.read(spark, tbl).filter("k = 1").collect()[0][
        "v"
    ] == "one"


def test_sql_merge_rejects_malformed_when(spark, tbl):
    # general WHEN clauses are supported since r10 (merge_when, see
    # test_versioned_merge_when.py); an unknown action must still be
    # diagnosed, not silently upserted
    spark.createDataFrame([(1, 1, "x")], "k long, g long, v string")\
        .createOrReplaceTempView("src0")
    with pytest.raises(ValueError, match="UPDATE SET/DELETE/INSERT"):
        versioned_sql(
            spark,
            "MERGE INTO t9 t USING src0 s ON t.k = s.k "
            "WHEN MATCHED THEN FROBNICATE",
        )
    with pytest.raises(ValueError, match="THEN"):
        versioned_sql(
            spark,
            "MERGE INTO t9 t USING src0 s ON t.k = s.k "
            "WHEN MATCHED UPDATE SET g = 1",
        )


def test_sql_merge_rejects_non_equality_on(spark, tbl):
    spark.createDataFrame([(1, 1, "x")], "k long, g long, v string")\
        .createOrReplaceTempView("src2")
    with pytest.raises(ValueError, match="equalit"):
        versioned_sql(
            spark, "MERGE INTO t9 t USING src2 s ON t.k < s.k"
        )


def test_sql_select_latest_join_and_time_travel(spark, tbl):
    versioned_sql(spark, "DELETE FROM t9 WHERE k >= 50")  # v2
    # latest
    n = versioned_sql(
        spark, "SELECT COUNT(*) AS n FROM t9"
    ).collect()[0]["n"]
    assert n == 50
    # VERSION AS OF pins the pre-delete snapshot
    n1 = versioned_sql(
        spark, "SELECT COUNT(*) AS n FROM t9 VERSION AS OF 1"
    ).collect()[0]["n"]
    assert n1 == 100
    # TIMESTAMP AS OF via v1's recorded commit time
    ts = versioned._committed_at(tbl, 1, versioned._read_manifest(tbl, 1))
    nts = versioned_sql(
        spark, f"SELECT COUNT(*) AS n FROM t9 TIMESTAMP AS OF {ts}"
    ).collect()[0]["n"]
    assert nts == 100
    # snapshots join: v1 rows missing from latest == the deleted band
    gone = versioned_sql(
        spark,
        "SELECT a.k FROM t9 VERSION AS OF 1 a "
        "LEFT ANTI JOIN t9 b ON a.k = b.k",
    )
    assert gone.count() == 50


def test_sql_strategy_passthrough_dv(spark, tbl):
    m = versioned_sql(
        spark, "DELETE FROM t9 WHERE k = 5", strategy="dv"
    )
    v = m.collect()[0]["version"]
    raw = versioned._read_manifest(tbl, v)
    assert raw.get("add_dvs") and raw.get("remove_files") == []


def test_sql_explicit_path_and_unknown_name(spark, tbl):
    n = versioned_sql(
        spark, f"DELETE FROM {tbl} WHERE k = 6"
    ).collect()[0]["n_deleted"]
    assert n == 1
    with pytest.raises(ValueError, match="unknown versioned table"):
        versioned_sql(spark, "DELETE FROM nope WHERE k = 1")


def test_sql_rejects_unsupported_verbs(spark, tbl):
    # DROP TABLE became a supported verb in r10 (registration unbind);
    # TRUNCATE stands in as the representative unknown statement
    with pytest.raises(ValueError, match="unsupported statement"):
        versioned_sql(spark, "TRUNCATE TABLE t9")


# --- r9 self-review regressions (parser safety) ---


def test_sql_string_literals_never_rewritten(spark, tbl):
    """A literal equal to the table name is DATA: the latest-ref
    binding must not garble it (r9 review finding #1)."""
    versioned_sql(spark, "UPDATE t9 SET v = 't9' WHERE k = 3")
    got = versioned_sql(
        spark, "SELECT COUNT(*) AS n FROM t9 WHERE v = 't9'"
    ).collect()[0]["n"]
    assert got == 1


def test_sql_qualified_columns_resolve(spark, tbl):
    """FROM t9 ... t9.k must keep resolving: bare latest refs bind a
    temp view OF THE SAME NAME instead of rewriting the text."""
    got = versioned_sql(
        spark,
        "SELECT t9.k FROM t9 WHERE t9.k < 3 ORDER BY t9.k",
    )
    assert [r["k"] for r in got.collect()] == [0, 1, 2]


def test_sql_where_inside_set_literal(spark, tbl):
    """A 'where' inside a SET string literal must not split the
    statement (r9 review finding #4)."""
    versioned_sql(spark, "UPDATE t9 SET v = 'a where b = 1' WHERE k = 2")
    r = versioned.read(spark, tbl).filter("k = 2").collect()[0]
    assert r["v"] == "a where b = 1"
    # and a DELETE whose literal contains ' where ' stays whole
    m = versioned_sql(
        spark, "DELETE FROM t9 WHERE v = 'no where match'"
    )
    assert m.collect()[0]["n_deleted"] == 0


def test_sql_merge_null_safe_equality_accepted(spark, tbl):
    spark.createDataFrame(
        [(4, 1, "four")], "k long, g long, v string"
    ).createOrReplaceTempView("src_nse")
    versioned_sql(spark, "MERGE INTO t9 t USING src_nse s ON t.k <=> s.k")
    assert versioned.read(spark, tbl).filter("k = 4").collect()[0][
        "v"
    ] == "four"


def test_sql_merge_comparison_ops_diagnosed_not_missplit(spark, tbl):
    spark.createDataFrame(
        [(1, 1, "x")], "k long, g long, v string"
    ).createOrReplaceTempView("src_cmp")
    for op in (">=", "<=", "!=", "<>"):
        with pytest.raises(ValueError, match="equalit"):
            versioned_sql(
                spark, f"MERGE INTO t9 t USING src_cmp s ON t.k {op} s.k"
            )


# --- maintenance statements (Delta SQL verbs -> primitives) ---


def test_sql_restore_and_describe_history(spark, tbl):
    versioned_sql(spark, "DELETE FROM t9 WHERE k >= 10")  # v2
    m = versioned_sql(spark, "RESTORE TABLE t9 TO VERSION AS OF 1")
    assert m.collect()[0]["version"] == 3
    assert versioned.read(spark, tbl).count() == 100
    hist = versioned_sql(spark, "DESCRIBE HISTORY t9").collect()
    assert [r["version"] for r in hist] == [1, 2, 3]
    assert hist[2]["mode"] == "rollback(1)"
    # TIMESTAMP AS OF restore, via v2's recorded commit time
    ts = versioned._committed_at(tbl, 2, versioned._read_manifest(tbl, 2))
    versioned_sql(spark, f"RESTORE TABLE t9 TO TIMESTAMP AS OF {ts}")
    assert versioned.read(spark, tbl).count() == 10


def test_sql_optimize_zorder_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for i in range(3):
        versioned.commit(spark, _mk(spark, i * 10, (i + 1) * 10), path)
    register_table("tz", path)
    try:
        m = versioned_sql(spark, "OPTIMIZE tz ZORDER BY (k, g)")
        row = m.collect()[0]
        assert row["files_before"] == 3 and row["version"] == 4
        assert versioned.read(spark, path).count() == 30
        # fresh artifacts are in-flight-protected (min_age_s): backdate
        # them so the vacuum statement has something reclaimable
        import glob as _glob
        import os as _os

        old = _os.path.getmtime(path) - 7200
        for f in _glob.glob(_os.path.join(path, "data", "*")) + _glob.glob(
            _os.path.join(path, "data", "*", "*")
        ):
            _os.utime(f, (old, old))
        dry = versioned_sql(
            spark, "VACUUM tz RETAIN 1 VERSIONS DRY RUN"
        ).collect()[0]["n_removed"]
        assert dry >= 1
        # nothing removed by the dry run
        assert len(versioned.history(path)) == 4
        got = versioned_sql(
            spark, "VACUUM tz RETAIN 1 VERSIONS"
        ).collect()[0]["n_removed"]
        assert got == dry
        assert len(versioned.history(path)) == 1
        assert versioned.read(spark, path).count() == 30
    finally:
        register_table("tz", None)


def test_sql_table_changes_tvf(spark, tbl):
    versioned_sql(spark, "DELETE FROM t9 WHERE k in (1, 2)", strategy="dv")
    got = versioned_sql(
        spark,
        "SELECT _change_type, k FROM table_changes('t9', 1, 2) "
        "ORDER BY k",
    ).collect()
    assert [(r["_change_type"], r["k"]) for r in got] == [
        ("delete", 1), ("delete", 2),
    ]
    # composes with aggregation and a WHERE of its own
    n = versioned_sql(
        spark,
        "SELECT COUNT(*) AS n FROM table_changes('t9', 0, 1) "
        "WHERE _change_type = 'insert'",
    ).collect()[0]["n"]
    assert n == 100


def test_sql_time_travel_inside_subquery(spark, tbl):
    versioned_sql(spark, "DELETE FROM t9 WHERE k >= 50")  # v2
    ts = versioned._committed_at(tbl, 1, versioned._read_manifest(tbl, 1))
    n = versioned_sql(
        spark,
        f"SELECT n FROM (SELECT COUNT(*) AS n FROM t9 TIMESTAMP AS OF {ts})",
    ).collect()[0]["n"]
    assert n == 100


def test_sql_trailing_semicolons_everywhere(spark, tbl):
    """r9 second-review: `\\S+` table captures swallowed a trailing
    `;`, breaking the exact forms the regexes advertised."""
    assert versioned_sql(
        spark, "DELETE FROM t9 WHERE k = 0;"
    ).collect()[0]["n_deleted"] == 1
    assert versioned_sql(
        spark, "UPDATE t9 SET g = g WHERE k = 1;"
    ).collect()[0]["n_updated"] == 1
    hist = versioned_sql(spark, "DESCRIBE HISTORY t9;").collect()
    assert [r["version"] for r in hist] == [1, 2, 3]
    versioned_sql(spark, "RESTORE TABLE t9 TO VERSION AS OF 1;")
    assert versioned.read(spark, tbl).count() == 100
    assert versioned_sql(spark, "OPTIMIZE t9;").collect()[0]["version"] == 5
    assert versioned_sql(
        spark, "VACUUM t9 RETAIN 5 VERSIONS DRY RUN;"
    ).collect()[0]["n_removed"] >= 0


def test_sql_table_changes_quoted_path_argument(spark, tmp_path):
    path = str(tmp_path / "tbl with space")
    versioned.commit(spark, _mk(spark, 0, 10), path)
    versioned.commit(spark, _mk(spark, 10, 12), path)
    n = versioned_sql(
        spark,
        f"SELECT COUNT(*) AS n FROM table_changes('{path}', 1, 2)",
    ).collect()[0]["n"]
    assert n == 2
