"""Point-set (membership) file pruning (r12 follow-through on the
IN-list algebra): partition-dir values are folded into the stats as
exact min==max bounds, so ``col IN (a, b)`` can prune to EXACTLY the
named dirs even when its (min, max) envelope spans the whole table —
and through the bucket transform, to the UNION of the listed keys'
buckets.  Same-type-family guarded: a literal of another kind never
kills a file (Spark would cast; Python equality would not).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.functions.sparkhash import bucket_id
from integritychecksforvldbs_spark.sources import versioned

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPEC", "5-LOW"]


@pytest.fixture()
def ptbl(spark, tmp_path):
    path = str(tmp_path / "p")
    df = spark.range(500).select(
        F.col("id").alias("k"),
        F.element_at(
            F.array(*[F.lit(p) for p in PRIORITIES]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("prio"),
        (F.col("id") * 2).alias("v"),
    )
    versioned.commit(spark, df, path, partition_by=["prio"])
    return path


def test_in_list_prunes_identity_dirs_beyond_envelope(spark, ptbl):
    """IN ('1-URGENT', '5-LOW'): the range envelope spans every
    partition, the membership set keeps exactly two."""
    man = versioned._resolve_manifest(ptbl, None)
    bounds = {"prio": ("1-URGENT", "5-LOW")}
    points = {"prio": ["1-URGENT", "5-LOW"]}
    env_only, _ = versioned._prune_manifest_files(man, bounds)
    assert len(env_only) == len(man["files"])  # envelope can't help
    kept, _ = versioned._prune_manifest_files(man, bounds, points)
    assert kept and all(
        versioned._partition_segments(f)["prio"]
        in ("1-URGENT", "5-LOW")
        for f in kept
    )
    # and the SQL front door rides it end to end
    got = versioned.read_sql_where(
        spark, ptbl, "prio IN ('1-URGENT', '5-LOW')"
    )
    want = (
        versioned.read(spark, ptbl)
        .filter(F.col("prio").isin("1-URGENT", "5-LOW"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_in_list_dml_probe_prunes_to_named_dirs(
    spark, ptbl, monkeypatch
):
    calls = []
    real = versioned._scan_live_pos

    def spy(spark, man, files=None):
        calls.append(files)
        return real(spark, man, files)

    monkeypatch.setattr(versioned, "_scan_live_pos", spy)
    want = (
        versioned.read(spark, ptbl)
        .filter("prio IN ('2-HIGH', '4-NOT SPEC') AND k % 3 = 0")
        .count()
    )
    v, n = versioned.delete_where(
        spark, ptbl, "prio IN ('2-HIGH', '4-NOT SPEC') AND k % 3 = 0"
    )
    assert n == want
    probed = [c for c in calls if c is not None]
    assert probed and all(
        versioned._partition_segments(f)["prio"]
        in ("2-HIGH", "4-NOT SPEC")
        for c in probed
        for f in c
    )


def test_in_list_prunes_bucket_union(spark, tmp_path):
    path = str(tmp_path / "b")
    df = spark.range(800).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    versioned.commit(spark, df, path, partition_by=["bucket(8, k)"])
    man = versioned._resolve_manifest(path, None)
    a, b = 123, 601
    want_dirs = {str(bucket_id(a, "long", 8)), str(bucket_id(b, "long", 8))}
    kept, _ = versioned._prune_manifest_files(
        man, {"k": (a, b)}, {"k": [a, b]}
    )
    assert kept and {
        versioned._partition_segments(f)["k_bucket_8"] for f in kept
    } <= want_dirs
    got = versioned.read_sql_where(spark, path, f"k IN ({a}, {b})")
    assert sorted(r.v for r in got.collect()) == sorted([a * 3, b * 3])


def test_day_transform_point_set_translates(spark, tmp_path):
    path = str(tmp_path / "d")
    df = spark.range(200).select(
        F.col("id").alias("k"),
        F.expr(
            "timestamp'2024-01-01 06:00:00' + make_interval("
            "0, 0, 0, CAST(id % 10 AS INT), 0, 0, 0)"
        ).alias("ts"),
    )
    versioned.commit(spark, df, path, partition_by=["day(ts)"])
    man = versioned._resolve_manifest(path, None)
    t1 = datetime.datetime(2024, 1, 2, 6, 0, 0)
    t2 = datetime.datetime(2024, 1, 9, 6, 0, 0)
    kept, _ = versioned._prune_manifest_files(
        man, {"ts": (t1, t2)}, {"ts": [t1, t2]}
    )
    assert kept and all(
        versioned._partition_segments(f)["ts_day"]
        in ("2024-01-02", "2024-01-09")
        for f in kept
    )


def test_type_family_guard_never_prunes_across_kinds(spark, tmp_path):
    """An int literal against a string-pinned dir must NOT prune:
    Spark would CAST '5' = 5 into a match."""
    path = str(tmp_path / "g")
    df = spark.range(40).select(
        (F.col("id") % 2).cast("string").alias("s"),
        F.col("id").alias("k"),
    )
    versioned.commit(spark, df, path, partition_by=["s"])
    man = versioned._resolve_manifest(path, None)
    kept, _ = versioned._prune_manifest_files(man, {}, {"s": [1]})
    assert len(kept) == len(man["files"])  # int vs str: no prune
    kept, _ = versioned._prune_manifest_files(man, {}, {"s": ["1"]})
    assert kept and all(
        versioned._partition_segments(f)["s"] == "1" for f in kept
    )


# ---------------------------------------------------------------------------
# null-count pruning (r12): IS NULL / IS NOT NULL as a third channel
# ---------------------------------------------------------------------------


@pytest.fixture()
def ntbl(spark, tmp_path):
    """Three commits: one all-null j, one null-free j, one mixed."""
    path = str(tmp_path / "n")
    mk = lambda lo, hi, expr: (
        spark.range(lo, hi).select(
            F.col("id").alias("k"), F.expr(expr).alias("j")
        ).coalesce(1)
    )
    versioned.commit(spark, mk(0, 100, "CAST(NULL AS LONG)"), path)
    versioned.commit(spark, mk(100, 200, "id * 2"), path)
    versioned.commit(
        spark, mk(200, 300, "IF(id % 10 = 0, NULL, id)"), path
    )
    return path


def test_null_pred_parser():
    f = versioned._null_preds_from_condition
    assert f("j IS NULL") == {"j": True}
    assert f("j IS NOT NULL AND k >= 5") == {"j": False}
    assert f("(j IS NULL) AND o.k IS NOT NULL", ("o",)) == {
        "j": True, "k": False,
    }
    assert f("x.j IS NULL") == {}  # unverified qualifier
    assert f("j IS NULL OR k = 1") == {}  # OR spans the split
    # NOT-the-connective pieces are skipped, not poisonous
    assert f("NOT (k = 1) AND j IS NULL") == {"j": True}
    # and the range profile keeps its bound next to IS NOT NULL now
    assert versioned._bounds_from_condition(
        "k >= 5 AND j IS NOT NULL"
    ) == {"k": (5, None)}


def test_is_null_probe_scans_only_null_holding_files(
    spark, ntbl, monkeypatch
):
    calls = []
    real = versioned._scan_live_pos

    def spy(spark, man, files=None):
        calls.append(files)
        return real(spark, man, files)

    monkeypatch.setattr(versioned, "_scan_live_pos", spy)
    man = versioned._resolve_manifest(ntbl, None)
    kept, skipped = versioned._prune_manifest_files(
        man, {}, nulls={"j": True}
    )
    assert len(kept) == 2 and len(skipped) == 1  # null-free file dies
    v, n = versioned.delete_where(spark, ntbl, "j IS NULL")
    assert n == 100 + 10
    probed = [c for c in calls if c is not None]
    assert probed and all(sorted(c) == sorted(kept) for c in probed)
    assert versioned.read(spark, ntbl).filter("j IS NULL").count() == 0


def test_is_not_null_read_skips_all_null_files(spark, ntbl):
    man = versioned._resolve_manifest(ntbl, None)
    kept, skipped = versioned._prune_manifest_files(
        man, {}, nulls={"j": False}
    )
    assert len(kept) == 2 and len(skipped) == 1  # all-null file dies
    got = versioned.read_sql_where(spark, ntbl, "j IS NOT NULL")
    want = versioned.read(spark, ntbl).filter("j IS NOT NULL")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() == 100 + 90


def test_show_partitions_metadata_only(spark, ptbl, monkeypatch):
    """SHOW PARTITIONS answers from the manifest: dir values with
    file/LIVE-row counts (DV dead rows excluded), no data-file open."""
    from integritychecksforvldbs_spark.sources.versioned_sql import (
        register_table,
        versioned_sql,
    )

    versioned.delete_where(
        spark, ptbl, "prio = '5-LOW' AND k < 100", strategy="dv"
    )
    register_table("showp", ptbl)
    try:
        # prove metadata-only: any scan attempt would blow up
        monkeypatch.setattr(
            versioned, "_scan_files",
            lambda *a, **k: (_ for _ in ()).throw(
                AssertionError("SHOW PARTITIONS opened a data file")
            ),
        )
        got = {
            r.prio: (r.n_files, r.n_rows)
            for r in versioned_sql(
                spark, "SHOW PARTITIONS showp"
            ).collect()
        }
        monkeypatch.undo()
        assert set(got) == set(PRIORITIES)
        want = (
            versioned.read(spark, ptbl)
            .groupBy("prio").count().collect()
        )
        assert {r.prio: r["count"] for r in want} == {
            p: n for p, (_f, n) in got.items()
        }
    finally:
        register_table("showp", None)


def test_show_partitions_refuses_unpartitioned(spark, tmp_path):
    from integritychecksforvldbs_spark.sources.versioned_sql import (
        register_table,
        versioned_sql,
    )

    path = str(tmp_path / "u")
    versioned.commit(
        spark, spark.range(5).select(F.col("id").alias("k")), path
    )
    register_table("showu", path)
    try:
        with pytest.raises(ValueError, match="not partitioned"):
            versioned_sql(spark, "SHOW PARTITIONS showu")
    finally:
        register_table("showu", None)


def test_explain_pruning_reports_every_channel(spark, ptbl):
    ex = versioned.explain_pruning(
        spark, ptbl, "prio IN ('1-URGENT', '5-LOW') AND k >= 0"
    )
    assert ex["bounds"]["prio"] == ("1-URGENT", "5-LOW")
    assert ex["points"] == {"prio": ["1-URGENT", "5-LOW"]}
    assert ex["files_after_stats"] < ex["files_total"]
    assert ex["files_after_bloom"] == ex["files_after_stats"]  # no index
    assert ex["pruned_pct"] > 0
    ex2 = versioned.explain_pruning(spark, ptbl, "k % 3 = 0")
    assert ex2["bounds"] == {} and ex2["pruned_pct"] == 0.0


def test_explain_prune_sql_verb(spark, ptbl):
    import json

    from integritychecksforvldbs_spark.sources.versioned_sql import (
        register_table,
        versioned_sql,
    )

    register_table("exp_t", ptbl)
    try:
        row = versioned_sql(
            spark,
            "EXPLAIN PRUNE exp_t WHERE "
            "prio IN ('1-URGENT', '5-LOW') AND k IS NOT NULL",
        ).collect()[0]
        assert json.loads(row.points) == {
            "prio": ["1-URGENT", "5-LOW"]
        }
        assert json.loads(row.null_predicates) == {"k": False}
        assert row.files_after_stats < row.files_total
        assert row.pruned_pct > 0
        with pytest.raises(ValueError, match="EXPLAIN PRUNE"):
            versioned_sql(spark, "EXPLAIN SELECT 1")
    finally:
        register_table("exp_t", None)


# ---------------------------------------------------------------------------
# date-function atoms (r12): CAST(ts AS DATE) / to_date / year
# ---------------------------------------------------------------------------


def test_date_fn_atoms_prune_hidden_day_dirs(spark, tmp_path):
    """`CAST(ts AS DATE) = '2024-01-05'` — the spelling SQL users
    reach for first — translates to ts bounds, which the hidden-
    partition fold then turns into exactly ONE day dir; answers
    pinned against the plain filter."""
    path = str(tmp_path / "dfn")
    df = spark.range(400).select(
        F.col("id").alias("k"),
        F.expr(
            "timestamp'2024-01-01 06:00:00' + make_interval("
            "0, 0, 0, CAST(id % 10 AS INT), 0, 0, 0)"
        ).alias("ts"),
    )
    versioned.commit(spark, df, path, partition_by=["day(ts)"])
    man = versioned._resolve_manifest(path, None)
    for cond, days in [
        ("CAST(ts AS DATE) = '2024-01-05'", {"2024-01-05"}),
        (
            "to_date(ts) BETWEEN DATE '2024-01-03' "
            "AND DATE '2024-01-04'",
            {"2024-01-03", "2024-01-04"},
        ),
        ("date(ts) >= '2024-01-09'", {"2024-01-09", "2024-01-10"}),
    ]:
        bounds, _p = versioned._condition_profile(cond)
        kept, _ = versioned._prune_manifest_files(man, bounds)
        assert kept and {
            versioned._partition_segments(f)["ts_day"] for f in kept
        } <= days, cond
        got = versioned.read_sql_where(spark, path, cond)
        want = versioned.read(spark, path).filter(F.expr(cond))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), cond
    # year() bounds the whole year; month()/day() (not monotonic in
    # the column) contribute nothing
    assert versioned._condition_profile("year(ts) = 2024")[0] == {
        "ts": (
            datetime.datetime(2024, 1, 1),
            datetime.datetime(2024, 12, 31, 23, 59, 59, 999999),
        )
    }
    assert versioned._condition_profile("month(ts) = 1") == ({}, {})
