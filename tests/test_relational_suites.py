"""Semantic pins for the window / set-op / grouping-sets / Q17 suite
queries (`__spark_entry__.py`): toy-frame invariants that the
cross-engine oracle comparison cannot distinguish (e.g. *why* a RANGE
frame is tie-safe), plus a full sf0.001 cross-engine run of each.
"""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402


def _cross_check(spark, duck, name):
    """Run a contract query and its oracle at sf0.001 and compare the
    same way scripts/verify_oracle.py does (sorted columns, sorted
    rows, dtype-kind-sensitive)."""
    import pandas as pd

    sdf = entry.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entry.oracle_sql()[name]).df()

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    a, b = norm(sdf), norm(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-12, atol=0)
    for c in a.columns:
        if {a[c].dtype.kind, b[c].dtype.kind} <= {"i", "u", "f"}:
            assert a[c].dtype.kind == b[c].dtype.kind, f"dtype drift on {c}"


@pytest.mark.parametrize(
    "name",
    [
        "window_suite",
        "set_ops_suite",
        "grouping_sets_pricing",
        "small_qty_revenue",
        "local_supplier_revenue",
        "promo_revenue_share",
        "brand_quantity_revenue",
        "returnflag_priority_counts",
    ],
)
def test_suite_matches_oracle_sf0001(spark, duck, name):
    _cross_check(spark, duck, name)


def test_range_frame_includes_peers(spark):
    """RANGE (unlike ROWS) must include ALL rows with the same order-by
    value — that is what makes the moving sum deterministic under ties."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(1, 10, 100), (1, 10, 200), (1, 11, 400)], "k int, day int, cents long"
    )
    w = Window.partitionBy("k").orderBy("day").rangeBetween(-30, 0)
    got = {
        (r.day, r.cents): r.mv
        for r in df.select("day", "cents", F.sum("cents").over(w).alias("mv")).collect()
    }
    # both day-10 rows see BOTH day-10 peers regardless of row order
    assert got[(10, 100)] == 300 and got[(10, 200)] == 300
    assert got[(11, 400)] == 700


def test_set_ops_multiplicities(spark):
    """EXCEPT ALL keeps surviving multiplicities (bag difference);
    EXCEPT collapses to distinct."""
    a = spark.createDataFrame([(1,), (1,), (1,), (2,)], "o_custkey long")
    b = spark.createDataFrame([(1,), (3,)], "o_custkey long")
    exc_all = {
        (r.o_custkey, r.n)
        for r in a.exceptAll(b)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert exc_all == {(1, 2), (2, 1)}
    exc = {r.o_custkey for r in a.subtract(b).collect()}
    assert exc == {2}
    inter_all = {
        (r.o_custkey, r.n)
        for r in a.intersectAll(b)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert inter_all == {(1, 1)}


def test_set_ops_fused_equals_operator_form(spark, tables):
    """The fused one-scan bag-algebra gate must equal Spark's native
    intersect/subtract/intersectAll/exceptAll operators."""
    got = {
        (r.op, r.o_custkey, r.n)
        for r in entry.queries()["set_ops_suite"](spark, SF_DIR).collect()
    }

    o = tables["orders"].select("o_custkey", F.year("o_orderdate").alias("y"))
    a = o.filter(F.col("y") == 1995).select("o_custkey")
    b = o.filter(F.col("y") == 1996).select("o_custkey")

    def tag(df, op):
        return {
            (op, r.o_custkey, r.n)
            for r in df.groupBy("o_custkey")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }

    want = (
        tag(a.intersect(b), "intersect")
        | tag(a.subtract(b), "except")
        | tag(a.intersectAll(b), "intersect_all")
        | tag(a.exceptAll(b), "except_all")
    )
    assert got == want


def test_grouping_id_disambiguates_null_keys(spark):
    """A genuine NULL key at gid=0 must not collide with the rollup
    row's synthetic NULL at gid=1."""
    df = spark.createDataFrame(
        [(None, "x", 1), ("a", "x", 2)], "g string, h string, v int"
    )
    rows = (
        df.groupingSets([["g"], []], "g")
        .agg(F.grouping_id().alias("gid"), F.sum("v").alias("s"))
        .collect()
    )
    got = {(r.g, r.gid): r.s for r in rows}
    assert got[(None, 0)] == 1  # the real NULL group
    assert got[("a", 0)] == 2
    assert got[(None, 1)] == 3  # the grand-total rollup row


def test_small_qty_condition_is_exact(spark):
    """5·qty·cnt < sum ⇔ qty < 0.2·avg with no FP division: a part
    whose quantities are (1, 9) has avg 5, so only qty=1 qualifies
    (1 < 1.0 is false for qty exactly at the 20% boundary)."""
    df = spark.createDataFrame(
        [(1, 1.0, 10.0), (1, 9.0, 90.0), (2, 1.0, 10.0), (2, 4.0, 40.0)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_partkey")
    li = df.select(
        "l_partkey",
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    kept = (
        li.select(
            "l_partkey",
            "qty",
            (F.col("qty") * 5 * F.count(F.lit(1)).over(w) < F.sum("qty").over(w)).alias(
                "small"
            ),
        )
        .filter("small")
        .collect()
    )
    # part 1: avg=5 → 20% = 1.0 → qty 1 NOT < 1.0 → excluded (strict).
    # part 2: avg=2.5 → 20% = 0.5 → nothing qualifies.
    assert kept == []
    df2 = spark.createDataFrame(
        [(3, 1.0, 10.0), (3, 19.0, 190.0)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    li2 = df2.select(
        "l_partkey",
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    kept2 = (
        li2.select(
            "qty",
            (F.col("qty") * 5 * F.count(F.lit(1)).over(w) < F.sum("qty").over(w)).alias(
                "small"
            ),
        )
        .filter("small")
        .collect()
    )
    # part 3: avg=10 → 20% = 2.0 → qty 1 < 2 qualifies
    assert [r.qty for r in kept2] == [1]
