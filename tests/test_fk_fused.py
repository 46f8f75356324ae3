"""The fused FK-orphan broadcast branch (kernels._fk_orphan_counts_fused):
multi-FK child read in ONE pass vs the per-FK anti-join fallback —
equality pinned on dup-key parents, NULL child keys, and composite keys
(the ADVICE.md round-3 gap: the branch was only exercised via the gate).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.expectations import ForeignKey, TableExpectations
from integritychecksforvldbs_spark.operators.kernels import fk_orphan_counts_df


@pytest.fixture(scope="module")
def frames(spark):
    # child with two FKs; NULL keys in both columns; orphans in both
    child = spark.createDataFrame(
        [
            (1, 10, "a"),
            (2, 10, "b"),
            (3, 99, "a"),      # orphan on fk1 (99 has no parent)
            (4, None, "b"),    # NULL fk1 -> not an orphan by definition
            (5, 20, "zz"),     # orphan on fk2
            (6, 20, None),     # NULL fk2
            (7, 99, "zz"),     # orphan on both
        ],
        "id bigint, p1_id bigint, p2_code string",
    )
    # dup-key parent: 10 appears twice — an anti/left join must not
    # double-count matches, and the fused chain must not fan out
    parent1 = spark.createDataFrame(
        [(10, "x"), (10, "y"), (20, "z")], "p1_id bigint, payload string"
    )
    parent2 = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 3)], "p2_code string, n int"
    )
    exp = TableExpectations(
        table="child",
        foreign_keys=[
            ForeignKey(["p1_id"], "parent1", ["p1_id"]),
            ForeignKey(["p2_code"], "parent2", ["p2_code"]),
        ],
    )
    return {"child": child, "parent1": parent1, "parent2": parent2}, exp


EXPECTED = {
    ("child", "p1_id", "parent1"): 2,   # ids 3, 7
    ("child", "p2_code", "parent2"): 2, # ids 5, 7
}


def _rows(df):
    return {
        (r["child_table"], r["fk_columns"], r["parent_table"]): r["orphan_rows"]
        for r in df.collect()
    }


def test_fused_branch_equals_antijoin_path(frames):
    tables, exp = frames
    fused = fk_orphan_counts_df(
        tables, exp, broadcast_parents={"parent1", "parent2"}
    )
    fallback = fk_orphan_counts_df(tables, exp, broadcast_parents=None)
    assert _rows(fused) == EXPECTED
    assert _rows(fallback) == EXPECTED


def test_fused_branch_is_selected(frames):
    """Plan probe: all-broadcastable parents really take the fused
    single-scan branch (broadcast joins, no SortMergeJoin), and the
    partial fallback (one parent too big) still broadcasts the small
    one."""
    tables, exp = frames
    fused = fk_orphan_counts_df(
        tables, exp, broadcast_parents={"parent1", "parent2"}
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    partial = fk_orphan_counts_df(tables, exp, broadcast_parents={"parent1"})
    assert _rows(partial) == EXPECTED


def test_composite_key_and_null_semantics(spark):
    """Composite FK: a row is an orphan only if ALL key columns are
    non-null and the tuple has no parent; partially-null tuples are
    skipped (matching the oracle's `c1 IS NOT NULL AND c2 IS NOT NULL`
    guard)."""
    child = spark.createDataFrame(
        [
            (1, 1, "a"),      # matched
            (2, 1, "b"),      # orphan (tuple (1,b) absent)
            (3, None, "a"),   # partial NULL -> skipped
            (4, 2, None),     # partial NULL -> skipped
        ],
        "id bigint, k1 bigint, k2 string",
    )
    parent = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b")], "k1 bigint, k2 string"
    )
    exp = TableExpectations(
        table="child",
        foreign_keys=[ForeignKey(["k1", "k2"], "parent", ["k1", "k2"])],
    )
    tables = {"child": child, "parent": parent}
    got_fused = _rows(fk_orphan_counts_df(tables, exp, {"parent"}))
    got_plain = _rows(fk_orphan_counts_df(tables, exp))
    want = {("child", "k1_k2", "parent"): 1}
    assert got_fused == want
    assert got_plain == want


def test_no_foreign_keys_empty_result(spark, frames):
    tables, _ = frames
    exp = TableExpectations(table="child")
    out = fk_orphan_counts_df(tables, exp)
    assert out.count() == 0
    assert out.columns == ["child_table", "fk_columns", "parent_table", "orphan_rows"]
