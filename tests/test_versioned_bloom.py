"""Bloom point-probe pruning for versioned tables (round-10 wave 6).

Manifest min/max stats prune RANGE predicates on clustered layouts;
``col = v`` on a high-cardinality column the table is NOT sorted by —
the GDPR-erasure shape — probes every file without help.
``versioned.build_bloom`` adds the standard companion (Delta bloom
indexes, ORC bloom streams) at the table-format level: one bitset per
(immutable data file, column), built distributed over only the
not-yet-indexed files, persisted as a parquet sidecar referenced by
the manifest so it versions/clones/travels with snapshots, keyed by
PHYSICAL column name so ALTER RENAME cannot orphan it.

Pinned here: probe pruning beats the stats pruner on scattered
equality, DELETE/UPDATE probes scan only bloom-admitted files (spy),
unindexed (post-build) files are always kept, incremental rebuild
scans only new files (spy), correctness is identical with and without
the index, rename-safety, the commit-inheritance of the ``bloom`` key,
and vacuum's reclamation of superseded index dirs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _scattered(spark, path, n=20_000, files=16):
    """Range-clustered by ts; uid is high-cardinality and SCATTERED —
    min/max stats can never prune a uid equality."""
    df = spark.range(0, n).select(
        F.col("id").alias("ts"),
        (F.xxhash64("id") % 100_000).alias("uid"),
        (F.col("id") * 2).alias("v"),
    )
    versioned.commit(spark, df.repartitionByRange(files, "ts"), path)
    return df


def _uid_at(df, ts):
    return df.filter(F.col("ts") == ts).collect()[0].uid


@pytest.fixture
def probe_spy(monkeypatch):
    calls = []
    real = versioned._scan_live_pos

    def spy(spark, man, files=None):
        calls.append(files)
        return real(spark, man, files)

    monkeypatch.setattr(versioned, "_scan_live_pos", spy)
    return calls


def test_bloom_prunes_scattered_equality(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _scattered(spark, t)
    probe = _uid_at(df, 12_345)
    man = versioned._resolve_manifest(t, None)
    kept_stats, _ = versioned._prune_manifest_files(
        man, {"uid": (probe, probe)}
    )
    assert len(kept_stats) == len(man["files"]), "stats cannot prune this"
    versioned.build_bloom(spark, t, "uid")
    man = versioned._resolve_manifest(t, None)
    kept = versioned._bloom_prune_files(
        spark, man, {"uid": probe}, man["files"]
    )
    assert len(kept) < len(man["files"]) // 2


def test_delete_probe_scans_only_bloom_admitted(spark, tmp_path, probe_spy):
    t = str(tmp_path / "t")
    df = _scattered(spark, t)
    versioned.build_bloom(spark, t, "uid")
    probe = _uid_at(df, 777)
    expected = df.filter(F.col("uid") == probe).count()
    v, n = versioned.delete_where(spark, t, f"uid = {probe}")
    assert n == expected
    probe_files = [c for c in probe_spy if c is not None]
    n_files = len(versioned._resolve_manifest(t, None)["files"])
    assert probe_files and all(
        len(c) < n_files // 2 for c in probe_files
    )
    assert versioned.read(spark, t).filter(
        F.col("uid") == probe
    ).count() == 0


def test_update_probe_scans_only_bloom_admitted(spark, tmp_path, probe_spy):
    t = str(tmp_path / "t")
    df = _scattered(spark, t)
    versioned.build_bloom(spark, t, "uid")
    probe = _uid_at(df, 4_242)
    v, n = versioned.update_where(spark, t, f"uid = {probe}", {"v": "-1"})
    assert n >= 1
    probe_files = [c for c in probe_spy if c is not None]
    assert probe_files and all(len(c) <= 4 for c in probe_files)
    assert (
        versioned.read(spark, t).filter("v = -1").count() == n
    )


def test_unindexed_files_always_kept(spark, tmp_path):
    t = str(tmp_path / "t")
    _scattered(spark, t)
    versioned.build_bloom(spark, t, "uid")
    versioned.commit(
        spark,
        spark.createDataFrame(
            [(99_999_999, 424_242, 1)], "ts long, uid long, v long"
        ),
        t,
    )
    # the new file predates no index entry — the probe must keep it
    v, n = versioned.delete_where(spark, t, "uid = 424242")
    assert n == 1
    assert (
        versioned.read(spark, t).filter("uid = 424242").count() == 0
    )


def test_incremental_rebuild_scans_only_new_files(
    spark, tmp_path, monkeypatch
):
    t = str(tmp_path / "t")
    _scattered(spark, t, files=8)
    versioned.build_bloom(spark, t, "uid")
    versioned.commit(
        spark,
        spark.range(50_000, 50_100).select(
            F.col("id").alias("ts"),
            (F.xxhash64("id") % 100_000).alias("uid"),
            F.lit(0).cast("long").alias("v"),
        ).coalesce(1),
        t,
    )
    scanned = []
    real = versioned._scan_files

    def spy(spark_, man, files=None, mapped=True):
        scanned.append(files)
        return real(spark_, man, files, mapped)

    monkeypatch.setattr(versioned, "_scan_files", spy)
    versioned.build_bloom(spark, t, "uid")
    build_scans = [c for c in scanned if c is not None]
    assert build_scans and all(len(c) == 1 for c in build_scans), (
        "rebuild must index only the ONE new file"
    )
    # the refreshed index prunes across old and new files alike
    man = versioned._resolve_manifest(t, None)
    kept = versioned._bloom_prune_files(
        spark, man, {"uid": -12_345_678}, man["files"]
    )
    assert kept == []  # a uid nowhere in the table prunes everything


def test_bloom_survives_rename_and_inherits_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _scattered(spark, t)
    versioned.build_bloom(spark, t, "uid")
    versioned.rename_column(t, "uid", "user_id")
    versioned.delete_where(spark, t, "ts = 0")  # a commit in between
    probe = _uid_at(df, 9_000)
    man = versioned._resolve_manifest(t, None)
    assert man.get("bloom"), "bloom entry must ride DML commits"
    kept = versioned._bloom_prune_files(
        spark, man, {"user_id": probe}, man["files"]
    )
    assert len(kept) < len(man["files"]) // 2
    v, n = versioned.delete_where(spark, t, f"user_id = {probe}")
    assert n == df.filter(F.col("uid") == probe).count()


def test_probe_failure_degrades_to_unpruned(spark, tmp_path):
    import shutil

    t = str(tmp_path / "t")
    df = _scattered(spark, t, files=4)
    versioned.build_bloom(spark, t, "uid")
    man = versioned._resolve_manifest(t, None)
    shutil.rmtree(
        next(iter(man["bloom"].values()))["index"], ignore_errors=True
    )
    probe = _uid_at(df, 55)
    kept = versioned._bloom_prune_files(
        spark, man, {"uid": probe}, man["files"]
    )
    assert kept == man["files"]  # unpruned, never wrong
    v, n = versioned.delete_where(spark, t, f"uid = {probe}")
    assert n == df.filter(F.col("uid") == probe).count()


def test_vacuum_reclaims_superseded_index_dirs(spark, tmp_path):
    t = str(tmp_path / "t")
    _scattered(spark, t, files=4)
    versioned.build_bloom(spark, t, "uid")
    man1 = versioned._resolve_manifest(t, None)
    dir1 = next(iter(man1["bloom"].values()))["index"]
    versioned.commit(
        spark,
        spark.createDataFrame([(1, 2, 3)], "ts long, uid long, v long"),
        t,
    )
    versioned.build_bloom(spark, t, "uid")  # supersedes dir1
    man2 = versioned._resolve_manifest(t, None)
    dir2 = next(iter(man2["bloom"].values()))["index"]
    assert dir1 != dir2
    removed = versioned.vacuum(t, keep_versions=1, min_age_s=0.0)
    assert dir1 in removed
    assert os.path.isdir(dir2) and not os.path.isdir(dir1)
    # the surviving index still prunes: a uid outside the generator's
    # range (xxhash64 % 100000) can survive only as the appended
    # unindexed file + bitset false positives
    man = versioned._resolve_manifest(t, None)
    kept = versioned._bloom_prune_files(
        spark, man, {"uid": -123_456_789}, man["files"]
    )
    assert len(kept) <= 1


def test_probe_collects_paths_never_bitsets(spark, tmp_path, monkeypatch):
    """r10 verdict #1: below a file-count limit the prune collected
    FULL BITSETS (a 131k-int array per file — tens of GB of Python
    sets at 10k files, a driver OOM exactly where pruning matters).
    The membership test is now distributed-only.  Pinned: (a) no
    collect() inside the probe ever carries a ``bits`` column — the
    driver sees only canonical paths; (b) the distributed verdict
    equals a brute-force bitset recompute done here as the oracle."""
    t = str(tmp_path / "t")
    df = _scattered(spark, t, files=8)
    versioned.build_bloom(spark, t, "uid")
    probe = _uid_at(df, 31)
    man = versioned._resolve_manifest(t, None)

    # pyspark 4: the concrete class overrides the abstract base's
    # collect, so the spy must land on classic.dataframe.DataFrame
    from pyspark.sql.classic.dataframe import DataFrame

    seen: list[list[str]] = []
    orig = DataFrame.collect

    def spy(self):
        seen.append(list(self.columns))
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    kept = versioned._bloom_prune_files(
        spark, man, {"uid": probe}, man["files"]
    )
    monkeypatch.undo()
    assert seen, "probe never ran a distributed collect"
    for cols in seen:
        assert "bits" not in cols, f"bitsets reached the driver: {cols}"

    # oracle: recompute the verdict from raw bitsets, test-side
    from integritychecksforvldbs_spark.operators.kernels import (
        _canon_file_path,
    )
    from integritychecksforvldbs_spark.sources.bloomskip import (
        _probe_positions,
    )

    cfg = next(iter(man["bloom"].values()))
    want = set(
        _probe_positions(
            spark, probe, man and versioned._manifest_schema(man)["uid"].dataType,
            int(cfg["n_bits"]), int(cfg["k"]),
        )
    )
    bitsets = {
        _canon_file_path(r["file"]): set(r["bits"])
        for r in spark.read.parquet(cfg["index"]).collect()
    }
    expect = [
        f
        for f in man["files"]
        if (b := bitsets.get(_canon_file_path(f))) is None or want <= b
    ]
    assert kept == expect
    assert 0 < len(kept) < len(man["files"])  # it actually pruned


def test_auto_refresh_on_append(spark, tmp_path, monkeypatch):
    """r10 verdict gap #3: files appended after build_bloom stayed
    unindexed until a manual re-run, silently decaying point-probe
    pruning on hot append tables.  build_bloom(auto=True) records the
    config; every later APPEND refreshes incrementally over just its
    own files (footer IO pinned by a scan spy), and the probe prunes
    with no manual rebuild.  A manual refresh with auto unset keeps
    the flag; DML rewrites stay refresh-on-demand."""
    t = str(tmp_path / "t")
    _scattered(spark, t, files=4)
    versioned.build_bloom(spark, t, "uid", auto=True)
    man = versioned._resolve_manifest(t, None)
    (cfg,) = man["bloom"].values()
    assert cfg["auto"] is True

    scanned = []
    real = versioned._scan_files

    def spy(spark_, man_, files=None, **kw):
        scanned.append(list(files) if files is not None else None)
        return real(spark_, man_, files, **kw)

    monkeypatch.setattr(versioned, "_scan_files", spy)
    df = spark.range(100_000, 100_010).select(
        F.col("id").alias("ts"),
        F.lit(-42).cast("long").alias("uid"),
        (F.col("id") * 2).alias("v"),
    )
    versioned.commit(spark, df.coalesce(1), t)
    monkeypatch.undo()
    man = versioned._resolve_manifest(t, None)
    assert man["bloom"]  # survived the append
    # the refresh's census scanned ONLY the appended file — never the
    # already-indexed originals
    bloom_scans = [fs for fs in scanned if fs is not None]
    assert bloom_scans and all(len(fs) == 1 for fs in bloom_scans)
    # the probe prunes without any manual rebuild: uid=-42 lives only
    # in the appended file, so every original file is skippable
    kept = versioned._bloom_prune_files(
        spark, man, {"uid": -42}, man["files"]
    )
    assert len(kept) <= 2  # appended file + bitset false positives
    # and a value from the ORIGINAL files prunes the appended one
    probe = versioned.read(spark, t).filter("ts = 31").collect()[0].uid
    kept2 = versioned._bloom_prune_files(
        spark, man, {"uid": int(probe)}, man["files"]
    )
    assert 0 < len(kept2) < len(man["files"])
    # manual refresh with auto unset (None) keeps the recorded flag
    versioned.build_bloom(spark, t, "uid")
    man = versioned._resolve_manifest(t, None)
    (cfg,) = man["bloom"].values()
    assert cfg["auto"] is True


def test_bloom_in_list_union_prunes(spark, tmp_path, probe_spy):
    """r12 (VERDICT r11 #1): ``uid IN (a, b)`` probes the Bloom index
    PER LITERAL and a file survives if either key might be present —
    the union semantics IN demands (a single combined probe would
    prune files holding only one of the keys)."""
    t = str(tmp_path / "t")
    df = _scattered(spark, t)
    versioned.build_bloom(spark, t, "uid")
    man = versioned._resolve_manifest(t, None)
    # keys living at opposite ends of the ts-range layout: their
    # admitted file sets differ, so the union is a real union
    a, b = _uid_at(df, 5), _uid_at(df, 19_990)
    kept_a = versioned._bloom_prune_files(
        spark, man, {"uid": [a]}, man["files"]
    )
    kept_b = versioned._bloom_prune_files(
        spark, man, {"uid": [b]}, man["files"]
    )
    kept_ab = versioned._bloom_prune_files(
        spark, man, {"uid": [a, b]}, man["files"]
    )
    assert set(kept_ab) == set(kept_a) | set(kept_b)
    assert len(kept_ab) < len(man["files"])
    # and the IN-list DELETE probe plans only the union-admitted set
    expected = df.filter(F.col("uid").isin(a, b)).count()
    v, n = versioned.delete_where(spark, t, f"uid IN ({a}, {b})")
    assert n == expected
    probe_files = [c for c in probe_spy if c is not None]
    assert probe_files and all(
        set(c) <= set(kept_ab) for c in probe_files
    )
    assert (
        versioned.read(spark, t).filter(F.col("uid").isin(a, b)).count()
        == 0
    )


def test_carry_over_index_is_join_not_isin(spark):
    """r12 (VERDICT r11 finding #1): the refresh's carry-over filter
    is a broadcast semi-join against a small kept-paths frame, never
    an O(files) In-literal-list — at ~1M files an ``isin(keep)`` is a
    ~100 MB expression inside ONE plan (same family as the r10
    driver-bitset collect).  1.5k synthetic index rows: the plan must
    carry a LeftSemi join and no literal path list."""
    n = 1_500
    prev = spark.range(n).select(
        F.concat(F.lit("file:///idx/f"), F.col("id")).alias("file"),
        F.array(F.lit(1), F.lit(2)).alias("bits"),
        F.lit(64).alias("n_bits"),
        F.lit(3).alias("k"),
    )
    live = {f"/idx/f{i}" for i in range(0, n, 2)}  # odd half retired
    carried, indexed = versioned._carry_over_index(spark, prev, live)
    assert indexed == live
    assert carried.count() == (n + 1) // 2
    plan = carried._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan
    # the kept paths ride as DATA (a scanned/broadcast relation), not
    # as plan text: at most a handful of path literals may appear
    assert " IN (" not in plan and plan.count("/idx/f") < 10
