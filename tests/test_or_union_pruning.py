"""r13 OR-union pruning: a top-level OR whose disjuncts EACH profile
prunes to the UNION of per-disjunct kept sets (a file is dead only
when EVERY disjunct proves it dead) instead of disabling pruning.
Closes the last common predicate shapes: the anti-range
``k < a OR k > b`` (skips a range-clustered table's middle files) and
the cross-column ``k = 5 OR j = 7``.  Wired through
``read_sql_where``, ``explain_pruning``, the SQL front door's
single-table binder, and the DML probe (``_dml_candidates``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned
from integritychecksforvldbs_spark.sources.versioned_sql import (
    register_table,
    versioned_sql,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def rtbl(spark, tmp_path_factory):
    """Range-clustered on k (10 files), plus a second column for
    cross-column ORs."""
    path = str(tmp_path_factory.mktemp("orunion") / "t")
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("j"),
    )
    versioned.commit(spark, df.repartitionByRange(10, "k"), path)
    return path


def test_anti_range_skips_middle_files(spark, rtbl):
    """``k < 50 OR k > 950`` on a range-clustered table keeps only
    the two edge regions — the middle files are provably dead under
    BOTH disjuncts and get skipped."""
    man = versioned._resolve_manifest(rtbl, None)
    total = len(man["files"])
    assert total >= 8
    cond = "k < 50 OR k > 950"
    ex = versioned.explain_pruning(spark, rtbl, cond)
    assert ex["or_branches"] == 2
    assert 0 < ex["files_after_stats"] < total
    # the kept set is exactly the union of the two branches' sets
    k1, _ = versioned._prune_manifest_files(man, {"k": (None, 50)})
    k2, _ = versioned._prune_manifest_files(man, {"k": (950, None)})
    union = [f for f in man["files"] if f in set(k1) | set(k2)]
    branches = versioned._condition_profiles(cond)
    assert versioned._branch_kept_files(spark, man, branches) == union
    got = versioned.read_sql_where(spark, rtbl, cond)
    exp = versioned.read(spark, rtbl).filter(F.expr(cond))
    assert _rows(got) == _rows(exp)
    assert got.count() == 50 + 49


def test_cross_column_or_prunes(spark, rtbl):
    cond = "k = 5 OR j = 7"  # j is unclustered: its branch keeps all
    ex = versioned.explain_pruning(spark, rtbl, cond)
    assert ex["or_branches"] == 2
    got = versioned.read_sql_where(spark, rtbl, cond)
    exp = versioned.read(spark, rtbl).filter(F.expr(cond))
    assert _rows(got) == _rows(exp)


def test_disjunct_admitting_everything_reads_unpruned(spark, rtbl):
    cond = "k < 5 OR k % 7 = 0"  # second disjunct profiles empty
    assert versioned._condition_profiles(cond) is None
    ex = versioned.explain_pruning(spark, rtbl, cond)
    assert ex["or_branches"] == 0
    assert ex["files_after_stats"] == ex["files_total"]
    got = versioned.read_sql_where(spark, rtbl, cond)
    exp = versioned.read(spark, rtbl).filter(F.expr(cond))
    assert _rows(got) == _rows(exp)


def test_or_union_with_null_and_bloom_branches(spark, tmp_path):
    """A branch can ride any channel: IS NULL (null counts) unioned
    with an equality (Bloom probe) — answers pinned both ways."""
    path = str(tmp_path / "nb")
    df = spark.range(300).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 30, None)
        .otherwise(F.col("id"))
        .alias("v"),
    )
    versioned.commit(spark, df.repartitionByRange(6, "k"), path)
    versioned.build_bloom(spark, path, "k")
    cond = "v IS NULL OR k = 250"
    branches = versioned._condition_profiles(cond)
    assert branches is not None and len(branches) == 2
    got = versioned.read_sql_where(spark, path, cond)
    exp = versioned.read(spark, path).filter(F.expr(cond))
    assert _rows(got) == _rows(exp)
    ex = versioned.explain_pruning(spark, path, cond)
    assert ex["files_after_bloom"] < ex["files_total"]
    assert "k" in ex["bloom_columns"]


def test_sql_front_door_or_union_binds_pruned(spark, rtbl, monkeypatch):
    """The single-table SELECT binder takes the branch-union path for
    a top-level OR — asserted via the planned file set."""
    calls = []
    real = versioned._scan_live

    def spy(spark_, man, files=None):
        calls.append(sorted(files or []))
        return real(spark_, man, files)

    monkeypatch.setattr(versioned, "_scan_live", spy)
    register_table("sp13or", rtbl)
    try:
        got = versioned_sql(
            spark,
            "SELECT COUNT(*) AS n FROM sp13or "
            "WHERE k < 50 OR k > 950",
        )
        man = versioned._resolve_manifest(rtbl, None)
        k1, _ = versioned._prune_manifest_files(man, {"k": (None, 50)})
        k2, _ = versioned._prune_manifest_files(man, {"k": (950, None)})
        union = sorted(set(k1) | set(k2))
        assert calls and calls[-1] == union
        assert len(union) < len(man["files"])
        assert got.collect()[0].n == 99
    finally:
        register_table("sp13or", None)


def test_dml_probe_or_union(spark, tmp_path):
    """DELETE with an anti-range OR probes only the union files —
    and deletes exactly the right rows."""
    path = str(tmp_path / "dml")
    df = spark.range(1000).select(F.col("id").alias("k"))
    versioned.commit(spark, df.repartitionByRange(10, "k"), path)
    man = versioned._resolve_manifest(path, None)
    cand = versioned._dml_candidates(man, "k < 30 OR k >= 970")
    assert cand is not None
    k1, _ = versioned._prune_manifest_files(man, {"k": (None, 30)})
    k2, _ = versioned._prune_manifest_files(man, {"k": (970, None)})
    assert cand == [f for f in man["files"] if f in set(k1) | set(k2)]
    assert 0 < len(cand) < len(man["files"])
    versioned.delete_where(spark, path, "k < 30 OR k >= 970")
    left = versioned.read(spark, path)
    assert left.count() == 1000 - 30 - 30
    assert left.agg(F.min("k"), F.max("k")).collect()[0] == (30, 969)
