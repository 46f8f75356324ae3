"""MERGE probe pruning by source key ranges (r11).

The merge probe used to plan a semi-join over EVERY visible file; at
100 TB a time-keyed CDC upsert would probe the whole table to touch
yesterday's files.  `_merge_probe_candidates` aggregates the source's
per-key min/max (one small agg) and prunes the probe to files whose
stats overlap — the same machinery partition layouts fold into, so a
merge keyed by a partition column prunes to exactly the source's
partitions.  NULL source keys bail (eqNullSafe matches null target
rows in any file), as does WHEN NOT MATCHED BY SOURCE (it marks rows
with NO source match — any file may hold one).

Pinned here: the probe scans only overlapping files (spy), results
equal the unpruned merge bit-for-bit, null-key and by-source bails,
empty-source short-circuit, and the partitioned-table shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _clustered(spark, path, n=1000, files=10, partition_by=None):
    """k-range-clustered table: file i holds keys [i*100, (i+1)*100)."""
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("c"),
        (F.col("id") * 2).alias("v"),
    )
    versioned.commit(
        spark, df.repartitionByRange(files, "k"), path,
        partition_by=partition_by,
    )
    return df


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


@pytest.fixture
def probe_spy(monkeypatch):
    calls = []
    real = versioned._scan_live_pos

    def spy(spark, man, files=None):
        calls.append(files)
        return real(spark, man, files)

    monkeypatch.setattr(versioned, "_scan_live_pos", spy)
    return calls


def _src(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("c"),
        F.lit(9999).cast("long").alias("v"),
    )


def test_merge_into_probe_prunes_to_source_range(
    spark, tmp_path, probe_spy
):
    t = str(tmp_path / "t")
    _clustered(spark, t, files=10)
    n_files = len(versioned._resolve_manifest(t, None)["files"])
    v = versioned.merge_into(spark, t, _src(spark, 350, 420), ["k"])
    # EVERY probe call (the candidate probe included) must carry a
    # restricted file list — a files=None first call means pruning
    # silently bailed (the NameError regression this test caught)
    assert probe_spy and all(c is not None for c in probe_spy)
    assert all(len(c) <= 3 for c in probe_spy), (
        f"probe must plan <=3 of {n_files} files, got "
        f"{[len(c) for c in probe_spy]}"
    )
    got = versioned.read(spark, t)
    assert got.count() == 1000
    assert got.filter("v = 9999").count() == 70


def test_pruned_merge_equals_unpruned(spark, tmp_path, monkeypatch):
    t1, t2 = str(tmp_path / "a"), str(tmp_path / "b")
    _clustered(spark, t1, files=8)
    _clustered(spark, t2, files=8)
    src = _src(spark, 100, 180).unionByName(_src(spark, 990, 1020))
    versioned.merge_into(spark, t1, src, ["k"])
    monkeypatch.setattr(
        versioned, "_merge_probe_candidates",
        lambda *a, **k: None,  # force the unpruned probe
    )
    versioned.merge_into(spark, t2, src, ["k"])
    monkeypatch.undo()
    assert _rows(versioned.read(spark, t1)) == _rows(
        versioned.read(spark, t2)
    )
    assert versioned.read(spark, t1).count() == 1020


def test_null_source_key_bails_and_matches_null_rows(spark, tmp_path):
    t = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a"), (None, "n"), (5, "e")], "k long, val string"
    )
    versioned.commit(spark, base, t)
    man = versioned._resolve_manifest(t, None)
    src = spark.createDataFrame(
        [(None, "N!"), (5, "E!")], "k long, val string"
    )
    assert versioned._merge_probe_candidates(spark, man, src, ["k"]) is None
    versioned.merge_into(spark, t, src, ["k"])
    got = {r.val for r in versioned.read(spark, t).collect()}
    assert got == {"a", "N!", "E!"}  # null key upserted the null row


def test_empty_source_short_circuits(spark, tmp_path):
    t = str(tmp_path / "t")
    _clustered(spark, t, files=4)
    man = versioned._resolve_manifest(t, None)
    src = _src(spark, 0, 0)
    assert versioned._merge_probe_candidates(spark, man, src, ["k"]) == []


def test_merge_when_by_source_clause_disables_pruning(
    spark, tmp_path, probe_spy
):
    t = str(tmp_path / "t")
    _clustered(spark, t, files=10)
    n_files = len(versioned._resolve_manifest(t, None)["files"])
    # deactivation shape: rows ABSENT from the source live everywhere
    v, m = versioned.merge_when(
        spark, t, _src(spark, 350, 360), ["k"],
        [
            {"when": "matched", "action": "update", "set": {"v": "s.v"}},
            {"when": "not_matched_by_source", "cond": "t.k >= 990",
             "action": "update", "set": {"v": "-1"}},
        ],
    )
    assert m["n_updated"] == 10 + 10  # 10 matched + 10 deactivated
    probed = [c for c in probe_spy if c is not None]
    # the by-source clause forces the unpruned probe (None -> all)
    assert all(c is None or len(c) == n_files for c in probe_spy[:1])
    got = versioned.read(spark, t)
    assert got.filter("v = -1").count() == 10
    assert got.filter("v = 9999").count() == 10


def test_merge_when_without_by_source_prunes(spark, tmp_path, probe_spy):
    t = str(tmp_path / "t")
    _clustered(spark, t, files=10)
    v, m = versioned.merge_when(
        spark, t, _src(spark, 350, 360), ["k"],
        [{"when": "matched", "action": "update", "set": {"v": "s.v"}}],
    )
    assert m["n_updated"] == 10
    assert probe_spy and all(c is not None for c in probe_spy)
    assert all(len(c) <= 2 for c in probe_spy)


def test_partitioned_merge_prunes_to_source_partitions(
    spark, tmp_path, probe_spy
):
    t = str(tmp_path / "t")
    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("c"),
        (F.col("id") * 2).alias("v"),
    )
    versioned.commit(spark, df, t, partition_by=["c"])
    # source keyed by (c, k) with c fixed to one partition
    src = spark.range(0, 40, 4).select(
        (F.col("id") + 2).alias("k"),
        F.lit(2).cast("int").alias("c"),
        F.lit(-7).cast("long").alias("v"),
    )
    versioned.merge_into(spark, t, src, ["c", "k"])
    assert probe_spy and all(x is not None for x in probe_spy)
    assert all(
        all("c=2" in f for f in files) for files in probe_spy
    )
    assert versioned.read(spark, t).filter("v = -7").count() == 10
