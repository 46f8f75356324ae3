"""Partition-spec evolution (r12; VERDICT r11 #4).

``set_partition_spec`` is Iceberg's per-commit spec change for
TRANSFORM layouts: metadata-only — old files keep their dirs, whose
transforms move to ``partition_spec_history``, and the pruner
translates predicate bounds onto BOTH specs, so each file is pruned
by whichever dir values its own stats carry (exact across the
boundary).  ``rewrite_partitioned`` is the bytes-moving migration
for what that refuses (identity layouts, re-keyed dirs).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _days_frame(spark, start_day: int, n_days: int, rows_per_day=20):
    return (
        spark.range(n_days * rows_per_day)
        .select(
            F.col("id").alias("k"),
            F.expr(
                f"timestamp'2024-01-01 06:00:00' + make_interval("
                f"0, 0, 0, {start_day} + CAST(id % {n_days} AS INT), "
                "0, 0, 0)"
            ).alias("ts"),
            (F.col("id") * 2).alias("v"),
        )
    )


@pytest.fixture()
def evolved(spark, tmp_path):
    """v1: ten January days under day(ts); v2: spec → month(ts);
    v3: an APPEND of Feb+Mar rows laid out by month."""
    path = str(tmp_path / "t")
    jan = _days_frame(spark, 0, 10)
    versioned.commit(spark, jan, path, partition_by=["day(ts)"])
    v2 = versioned.set_partition_spec(spark, path, ["month(ts)"])
    assert v2 == 2
    feb_mar = _days_frame(spark, 31, 60).withColumn(
        "k", F.col("k") + 1_000_000
    )
    versioned.commit(spark, feb_mar, path)  # inherits month(ts)
    return path


def test_spec_change_is_metadata_only_and_tracked(spark, evolved):
    man2 = versioned._resolve_manifest(evolved, 2)
    man1 = versioned._resolve_manifest(evolved, 1)
    assert sorted(man2["files"]) == sorted(man1["files"])
    assert man2["partition_transforms"] == {
        "ts_month": {"fn": "month", "src": "ts"}
    }
    assert man2["partition_spec_history"] == {
        "ts_day": {"fn": "day", "src": "ts"}
    }
    # the spec change is invisible to CDF / streaming consumers
    assert versioned.changes(spark, evolved, 1, 2).count() == 0


def test_appends_lay_out_by_the_new_spec(spark, evolved):
    man = versioned._resolve_manifest(evolved, None)
    old = set(versioned._resolve_manifest(evolved, 1)["files"])
    for f in man["files"]:
        seg = versioned._partition_segments(f)
        if f in old:
            assert "ts_day" in seg and "ts_month" not in seg
        else:
            assert "ts_month" in seg and "ts_day" not in seg
    # and an append naming the RETIRED spec is refused
    with pytest.raises(ValueError, match="laid out by"):
        versioned.commit(
            spark,
            _days_frame(spark, 0, 1),
            evolved,
            partition_by=["day(ts)"],
        )


def test_pruning_exact_across_the_boundary(spark, evolved):
    """An old-period range prunes via the HISTORY day dirs, a
    new-period range via the ACTIVE month dirs — file sets pinned,
    answers equal to the unpruned filter."""
    man = versioned._resolve_manifest(evolved, None)
    old = set(versioned._resolve_manifest(evolved, 1)["files"])

    def _check(lo, hi):
        kept, _ = versioned._prune_manifest_files(
            man, {"ts": (lo, hi)}
        )
        got = versioned.read_where(spark, evolved, {"ts": (lo, hi)})
        want = (
            versioned.read(spark, evolved)
            .filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        return kept

    # January days 3-4: only old (day-dir) files of those days plan
    lo = datetime.datetime(2024, 1, 3, 0, 0)
    hi = datetime.datetime(2024, 1, 4, 23, 59)
    kept = _check(lo, hi)
    assert kept and all(f in old for f in kept)
    assert all(
        versioned._partition_segments(f)["ts_day"]
        in ("2024-01-03", "2024-01-04")
        for f in kept
    )
    # March: only new (month-dir) files of that month plan
    lo = datetime.datetime(2024, 3, 1, 0, 0)
    hi = datetime.datetime(2024, 3, 31, 23, 59)
    kept = _check(lo, hi)
    assert kept and all(f not in old for f in kept)
    assert all(
        versioned._partition_segments(f)["ts_month"] == "2024-03-01"
        for f in kept
    )
    # a range SPANNING the boundary keeps both layouts' matching dirs
    lo = datetime.datetime(2024, 1, 9, 0, 0)
    hi = datetime.datetime(2024, 2, 10, 23, 59)
    kept = _check(lo, hi)
    assert any(f in old for f in kept) and any(
        f not in old for f in kept
    )


def test_time_travel_prunes_under_the_old_spec(spark, evolved):
    man1 = versioned._resolve_manifest(evolved, 1)
    lo = datetime.datetime(2024, 1, 5, 0, 0)
    hi = datetime.datetime(2024, 1, 5, 23, 59)
    kept, _ = versioned._prune_manifest_files(man1, {"ts": (lo, hi)})
    assert kept and all(
        versioned._partition_segments(f)["ts_day"] == "2024-01-05"
        for f in kept
    )
    assert len(kept) < len(man1["files"])


def test_history_only_source_may_be_dropped(spark, tmp_path):
    """The r11 gap: dropping a partition column was refused outright.
    After evolving the spec away from it, the source is history-only
    and the drop goes through."""
    path = str(tmp_path / "d")
    versioned.commit(
        spark, _days_frame(spark, 0, 3), path, partition_by=["day(ts)"]
    )
    with pytest.raises(ValueError, match="partitioned by"):
        versioned.drop_column(path, "ts")
    versioned.set_partition_spec(spark, path, [])
    versioned.drop_column(path, "ts")
    assert "ts" not in versioned.read(spark, path).columns


def test_identity_layouts_evolve_metadata_only(spark, tmp_path):
    """r13 (previously refused with a rewrite_partitioned pointer):
    identity specs evolve in place in both directions — retired
    identity dirs ride the history, old files reconstruct their
    stripped column per file, new files carry it."""
    path = str(tmp_path / "i")
    df = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    want = sorted(map(tuple, df.collect()))
    versioned.commit(spark, df, path, partition_by=["g"])
    files1 = sorted(versioned._resolve_manifest(path, None)["files"])
    v = versioned.set_partition_spec(spark, path, ["truncate(10, k)"])
    man = versioned._resolve_manifest(path, None)
    assert v == 2 and sorted(man["files"]) == files1
    assert man["partition_spec_history"] == {
        "g": {"fn": "identity", "src": "g"}
    }
    got = sorted(map(tuple, versioned.read(spark, path).collect()))
    assert got == want
    # flat → identity is metadata-only too: old flat files carry the
    # column in their footers, new files strip it under dirs
    path2 = str(tmp_path / "j")
    versioned.commit(spark, df, path2)
    v2 = versioned.set_partition_spec(spark, path2, ["g"])
    man2 = versioned._resolve_manifest(path2, None)
    assert v2 == 2 and man2["partition_by"] == ["g"]
    versioned.commit(
        spark,
        spark.range(50, 60).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        ),
        path2,
    )
    man3 = versioned._resolve_manifest(path2, None)
    newf = set(man3["files"]) - set(man2["files"])
    assert newf and all("g=" in f for f in newf)
    got2 = sorted(map(tuple, versioned.read(spark, path2).collect()))
    assert got2 == sorted(
        (k, k % 3) for k in range(60)
    )


def test_rewrite_partitioned_migrates_identity_to_bucket(
    spark, tmp_path
):
    path = str(tmp_path / "r")
    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("g"),
        (F.col("id") * 7).alias("v"),
    )
    versioned.commit(spark, df, path, partition_by=["g"])
    v, before, after = versioned.rewrite_partitioned(
        spark, path, ["bucket(4, k)"]
    )
    man = versioned._resolve_manifest(path, None)
    assert man["partition_by"] == ["k_bucket_4"]
    assert "partition_spec_history" not in man or not man[
        "partition_spec_history"
    ]
    # rows identical (the identity column is materialized back into
    # the files by the rewrite), layout-only commit: empty CDF
    got = sorted(map(tuple, versioned.read(spark, path).collect()))
    assert got == sorted(map(tuple, df.collect()))
    assert versioned.changes(spark, path, v - 1, v).count() == 0
    # and the new layout point-prunes
    from integritychecksforvldbs_spark.functions.sparkhash import (
        bucket_id,
    )

    kept, _ = versioned._prune_manifest_files(man, {"k": (123, 123)})
    b = str(bucket_id(123, "long", 4))
    assert kept and all(
        versioned._partition_segments(f)["k_bucket_4"] == b
        for f in kept
    )


def test_sql_set_partition_spec_and_ctas_bucket(spark, tmp_path):
    """The SQL front door speaks the new surface: CTAS PARTITIONED BY
    a bucket transform, then ALTER TABLE ... SET PARTITION SPEC
    evolves it metadata-only and pruning spans both specs."""
    from integritychecksforvldbs_spark.sources.versioned_sql import (
        register_table,
        versioned_sql,
    )

    path = str(tmp_path / "t")
    spark.range(300).select(
        F.col("id").alias("k"),
        F.expr(
            "timestamp'2024-03-01 08:00:00' + make_interval("
            "0, 0, 0, CAST(id % 6 AS INT), 0, 0, 0)"
        ).alias("ts"),
    ).createOrReplaceTempView("spec_src")
    register_table("spec_t", path)
    try:
        versioned_sql(
            spark,
            "CREATE TABLE spec_t PARTITIONED BY (bucket(4, k)) AS "
            "SELECT * FROM spec_src",
        )
        man = versioned._resolve_manifest(path, None)
        assert man["partition_by"] == ["k_bucket_4"]
        out = versioned_sql(
            spark,
            "ALTER TABLE spec_t SET PARTITION SPEC (day(ts))",
        ).collect()[0]
        assert out.version == 2 and out.n_partition_entries == 1
        man = versioned._resolve_manifest(path, None)
        assert man["partition_transforms"] == {
            "ts_day": {"fn": "day", "src": "ts"}
        }
        assert man["partition_spec_history"] == {
            "k_bucket_4": {
                "fn": "bucket", "src": "k", "n": 4, "hash": "long",
            }
        }
        # a point probe on k still prunes via the HISTORY bucket dirs
        from integritychecksforvldbs_spark.functions.sparkhash import (
            bucket_id,
        )

        kept, _ = versioned._prune_manifest_files(
            man, {"k": (77, 77)}
        )
        b = str(bucket_id(77, "long", 4))
        assert kept and all(
            versioned._partition_segments(f)["k_bucket_4"] == b
            for f in kept
        )
        # unpartitioning via SQL: empty spec
        out = versioned_sql(
            spark, "ALTER TABLE spec_t SET PARTITION SPEC ()"
        ).collect()[0]
        assert out.version == 3
        assert not versioned._partition_by(
            versioned._resolve_manifest(path, None)
        )
    finally:
        register_table("spec_t", None)
