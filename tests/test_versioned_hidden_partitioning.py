"""Hidden (transform) partitioning — Iceberg's partition-transform
idea on this format (r11, public design: Iceberg spec's partition
transforms).

``commit(..., partition_by=["day(ts)"])`` lays files out under a
SYNTHETIC dir column derived from a source column (``ts_day=.../``).
The derived column never enters the schema: data files carry every
schema column, so scans stay plain file-list scans (no basePath
discovery — pinned), and queries keep filtering the SOURCE column;
every supported transform is monotonic, so the stats pruner
translates source bounds onto the folded dir values and a
``WHERE ts BETWEEN …`` prunes day dirs the query never mentions.
Predicate atoms now parse TIMESTAMP'…'/DATE'…' literals so DML
probes translate too.

Pinned here: layout + round-trip, hidden range pruning exactness
(read_where, DML probe, merge probe), day/month/truncate(int+str)
transforms, typed-literal predicate bounds, append inheritance +
mismatch/mixing/bucket refusals, rename-of-source safety + drop
refusal, DML layout preservation, optimize, clone, the Python Data
Source, and the feature gate.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _ev(spark, lo=0, hi=720):
    # one row per hour over 30 days from 2024-01-01
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.expr(
            "TIMESTAMP'2024-01-01 00:00:00' + "
            "make_interval(0,0,0,0,CAST(id AS INT),0,0)"
        ).alias("ts"),
        (F.col("id") * 2).alias("v"),
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def _dirs_of(files, key):
    return sorted(
        {versioned._partition_segments(f)[key] for f in files}
    )


@pytest.fixture()
def htbl(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned.commit(spark, _ev(spark), path, partition_by=["day(ts)"])
    return path


def test_layout_schema_and_round_trip(spark, htbl):
    man = versioned._resolve_manifest(htbl, None)
    assert man["partition_by"] == ["ts_day"]
    assert man["partition_transforms"] == {
        "ts_day": {"fn": "day", "src": "ts"}
    }
    assert "transform-partitioning" in man["required_features"]
    dirs = sorted(
        d for d in os.listdir(os.path.join(htbl, "data"))
        if not d.startswith(".")
    )
    assert len(dirs) == 30 and dirs[0] == "ts_day=2024-01-01"
    got = versioned.read(spark, htbl)
    # the derived column is HIDDEN: not in the schema, not in reads
    assert got.columns == ["k", "ts", "v"]
    assert _rows(got) == _rows(_ev(spark))


def test_hidden_range_pruning_is_exact(spark, htbl):
    man = versioned._resolve_manifest(htbl, None)
    lo = datetime.datetime(2024, 1, 5, 0, 0, 0)
    hi = datetime.datetime(2024, 1, 6, 23, 59, 59)
    kept, skipped = versioned._prune_manifest_files(
        man, {"ts": (lo, hi)}
    )
    assert _dirs_of(kept, "ts_day") == ["2024-01-05", "2024-01-06"]
    assert skipped
    got = versioned.read_where(spark, htbl, {"ts": (lo, hi)})
    assert got.count() == 48
    assert _rows(got) == _rows(
        _ev(spark).filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
    )


def test_dml_probe_prunes_hidden_dirs(spark, htbl, monkeypatch):
    calls = []
    real = versioned._scan_live_pos

    def spy(s_, m_, files=None):
        calls.append(files)
        return real(s_, m_, files)

    monkeypatch.setattr(versioned, "_scan_live_pos", spy)
    v, n = versioned.delete_where(
        spark, htbl,
        "ts >= TIMESTAMP'2024-01-10 00:00:00' AND "
        "ts <= TIMESTAMP'2024-01-10 23:59:59'",
    )
    monkeypatch.undo()
    assert n == 24
    assert calls[0] is not None
    assert _dirs_of(calls[0], "ts_day") == ["2024-01-10"]
    assert versioned.read(spark, htbl).count() == 720 - 24
    # the rewrite landed back under hidden dirs
    man = versioned._resolve_manifest(htbl, None)
    assert all("ts_day=" in f for f in man["files"])


def test_merge_probe_prunes_hidden_dirs(spark, htbl, probe_files=None):
    src = spark.range(100, 110).select(
        F.col("id").alias("k"),
        F.expr(
            "TIMESTAMP'2024-01-01 00:00:00' + "
            "make_interval(0,0,0,0,CAST(id AS INT),0,0)"
        ).alias("ts"),
        F.lit(-1).cast("long").alias("v"),
    )
    # keys include ts: the merge probe's source range covers hours
    # 100..109 = Jan 5 — files elsewhere are never planned
    calls = []
    real = versioned._scan_live_pos

    def spy(s_, m_, files=None):
        calls.append(files)
        return real(s_, m_, files)

    versioned._scan_live_pos = spy
    try:
        versioned.merge_into(spark, htbl, src, ["k", "ts"])
    finally:
        versioned._scan_live_pos = real
    assert calls and all(c is not None for c in calls)
    assert _dirs_of(calls[0], "ts_day") == ["2024-01-05"]
    assert versioned.read(spark, htbl).filter("v = -1").count() == 10


def test_month_and_truncate_transforms(spark, tmp_path):
    t = str(tmp_path / "m")
    df = spark.range(0, 1440, 24).select(  # one row per day, 60 days
        F.col("id").alias("k"),
        F.expr(
            "TIMESTAMP'2024-01-01 00:00:00' + "
            "make_interval(0,0,0,0,CAST(id AS INT),0,0)"
        ).alias("ts"),
    )
    versioned.commit(spark, df, t, partition_by=["month(ts)"])
    man = versioned._resolve_manifest(t, None)
    # 60 daily rows from 2024-01-01 span exactly two months
    assert _dirs_of(man["files"], "ts_month") == [
        "2024-01-01", "2024-02-01",
    ]
    kept, _ = versioned._prune_manifest_files(
        man,
        {"ts": (
            datetime.datetime(2024, 2, 3),
            datetime.datetime(2024, 2, 20),
        )},
    )
    assert _dirs_of(kept, "ts_month") == ["2024-02-01"]

    # integer truncate
    t2 = str(tmp_path / "tr")
    versioned.commit(
        spark,
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("m")
        ),
        t2,
        partition_by=["truncate(25, k)"],
    )
    man2 = versioned._resolve_manifest(t2, None)
    assert _dirs_of(man2["files"], "k_trunc_25") == [
        "0", "25", "50", "75"
    ]
    kept2, _ = versioned._prune_manifest_files(man2, {"k": (30, 60)})
    assert _dirs_of(kept2, "k_trunc_25") == ["25", "50"]
    assert versioned.read_where(spark, t2, {"k": (30, 60)}).count() == 31

    # string truncate (prefix buckets)
    t3 = str(tmp_path / "ts")
    versioned.commit(
        spark,
        spark.createDataFrame(
            [("alpha", 1), ("alto", 2), ("beta", 3), ("bend", 4)],
            "w string, n int",
        ),
        t3,
        partition_by=["truncate(2, w)"],
    )
    man3 = versioned._resolve_manifest(t3, None)
    assert _dirs_of(man3["files"], "w_trunc_2") == ["al", "be"]
    kept3, _ = versioned._prune_manifest_files(
        man3, {"w": ("ba", "bz")}
    )
    assert _dirs_of(kept3, "w_trunc_2") == ["be"]


def test_append_inherits_and_refusals(spark, htbl, tmp_path):
    versioned.commit(spark, _ev(spark, 720, 744), htbl)  # inherits
    man = versioned._resolve_manifest(htbl, None)
    assert versioned.read(spark, htbl).count() == 744
    assert "ts_day=2024-01-31" in " ".join(man["files"])
    # same spec re-stated: accepted
    versioned.commit(
        spark, _ev(spark, 744, 750), htbl, partition_by=["day(ts)"]
    )
    # different transform refused
    with pytest.raises(ValueError, match="laid out by"):
        versioned.commit(
            spark, _ev(spark, 750, 760), htbl,
            partition_by=["month(ts)"],
        )
    # identity+transform mixing refused
    with pytest.raises(ValueError, match="cannot mix"):
        versioned.commit(
            spark, _ev(spark), str(tmp_path / "mix"),
            partition_by=["day(ts)", "v"],
        )
    # bucket is SUPPORTED since r12 (tests/test_versioned_bucket.py);
    # what stays refused is a bucket over a non-hashable-kind column
    with pytest.raises(ValueError, match="bucket"):
        versioned.commit(
            spark,
            spark.range(4).select((F.col("id") * 1.5).alias("x")),
            str(tmp_path / "b"),
            partition_by=["bucket(16, x)"],
        )


def test_rename_source_safe_drop_refused(spark, htbl):
    versioned.rename_column(htbl, "ts", "event_ts")
    # bounds keyed by the NEW logical name still translate (the
    # transform records the PHYSICAL source)
    man = versioned._resolve_manifest(htbl, None)
    kept, _ = versioned._prune_manifest_files(
        man,
        {"event_ts": (
            datetime.datetime(2024, 1, 7),
            datetime.datetime(2024, 1, 7, 23),
        )},
    )
    assert _dirs_of(kept, "ts_day") == ["2024-01-07"]
    with pytest.raises(ValueError, match="partitioned by"):
        versioned.drop_column(htbl, "event_ts")


def test_optimize_and_clone_keep_hidden_layout(spark, htbl, tmp_path):
    v, b, a = versioned.optimize(spark, htbl)
    man = versioned._resolve_manifest(htbl, None)
    assert all("ts_day=" in f for f in man["files"])
    assert versioned.read(spark, htbl).count() == 720
    dst = str(tmp_path / "clone")
    versioned.clone(spark, htbl, dst)
    man2 = versioned._resolve_manifest(dst, None)
    assert man2["partition_transforms"] == {
        "ts_day": {"fn": "day", "src": "ts"}
    }
    versioned.commit(spark, _ev(spark, 720, 730), dst)
    assert versioned.read(spark, dst).count() == 730


def test_python_datasource_and_changes(spark, htbl, tmp_path):
    from integritychecksforvldbs_spark.sources import (
        versioned_datasource as vds,
    )

    vds.register(spark)
    native = versioned.read(spark, htbl)
    pyds = spark.read.format("versioned").load(htbl)
    assert pyds.columns == ["k", "ts", "v"]
    assert _rows(pyds) == _rows(native)
    versioned.commit(spark, _ev(spark, 720, 740), htbl)
    ch = versioned.changes(spark, htbl, 1, 2)
    assert ch.filter("_change_type = 'insert'").count() == 20


def test_scans_stay_plain_file_scans(spark, htbl, monkeypatch):
    """The synthetic dirs must NOT go through basePath discovery —
    it would resurface the derived column.  Pinned by spying the
    reader options."""
    from pyspark.sql.readwriter import DataFrameReader

    opts = []
    orig = DataFrameReader.option

    def spy(self, key, value):
        opts.append(key)
        return orig(self, key, value)

    monkeypatch.setattr(DataFrameReader, "option", spy)
    versioned.read(spark, htbl).count()
    monkeypatch.undo()
    assert "basePath" not in opts


def test_sql_create_hidden_partitioned(spark, tmp_path):
    from integritychecksforvldbs_spark.sources.versioned_sql import (
        register_table,
        versioned_sql,
    )

    path = str(tmp_path / "t")
    register_table("h11", path)
    try:
        versioned_sql(
            spark,
            "CREATE TABLE h11 PARTITIONED BY (day(ts), truncate(2, w)) "
            "AS VALUES (1, TIMESTAMP'2024-03-01 10:00:00', 'alpha'), "
            "(2, TIMESTAMP'2024-03-02 11:00:00', 'beta') AS v(k, ts, w)",
        )
        man = versioned._resolve_manifest(path, None)
        assert man["partition_by"] == ["ts_day", "w_trunc_2"]
        assert man["partition_transforms"]["ts_day"]["fn"] == "day"
        assert man["partition_transforms"]["w_trunc_2"]["n"] == 2
        got = versioned_sql(spark, "SELECT k, w FROM h11 WHERE k = 2")
        assert [tuple(r) for r in got.collect()] == [(2, "beta")]
        row = versioned_sql(spark, "DESCRIBE DETAIL h11").collect()[0]
        assert row["partition_by"] == "ts_day,w_trunc_2"
    finally:
        register_table("h11", None)


def test_read_sql_where_and_random_range_equivalence(spark, htbl):
    """read_sql_where (string-condition twin of read_where) prunes
    hidden dirs and re-applies the condition; a seeded sweep of random
    ts ranges pins pruned == full-filter equality across partition
    boundaries, empty ranges, and single-hour points."""
    import random

    got = versioned.read_sql_where(
        spark, htbl,
        "ts >= TIMESTAMP'2024-01-03 05:00:00' AND "
        "ts <= TIMESTAMP'2024-01-04 01:00:00' AND v % 4 = 0",
    )
    full = versioned.read(spark, htbl).filter(
        "ts >= TIMESTAMP'2024-01-03 05:00:00' AND "
        "ts <= TIMESTAMP'2024-01-04 01:00:00' AND v % 4 = 0"
    )
    assert _rows(got) == _rows(full)

    rng = random.Random(11)
    base = datetime.datetime(2024, 1, 1)
    man = versioned._resolve_manifest(htbl, None)
    for _ in range(8):
        a, b = sorted(rng.randrange(0, 720) for _ in range(2))
        lo = base + datetime.timedelta(hours=a)
        hi = base + datetime.timedelta(hours=b, minutes=30)
        kept, _sk = versioned._prune_manifest_files(
            man, {"ts": (lo, hi)}
        )
        want_days = {
            (base + datetime.timedelta(hours=h)).date().isoformat()
            for h in range(a, min(b + 1, 720))
        }
        assert set(_dirs_of(kept, "ts_day")) == want_days
        got_n = versioned.read_where(
            spark, htbl, {"ts": (lo, hi)}
        ).count()
        assert got_n == b - a + 1  # inclusive hour range


def test_hidden_dv_vacuum_constraints_cdf(spark, htbl):
    """Cross-feature sweep on the hidden layout: merge-on-read DV
    delete (plain scans carry the anti-filter), constraints on the
    transform's SOURCE column, vacuum across expiry, and the change
    feed across a hidden-partitioned append."""
    versioned.set_constraints(
        spark, htbl, {"ts_in_2024": "ts >= TIMESTAMP'2024-01-01'"}
    )
    v, n = versioned.delete_where(
        spark, htbl, "k % 97 = 0", strategy="dv"
    )
    assert n > 0 and versioned.dv_info(htbl)
    assert versioned.read(spark, htbl).count() == 720 - n
    # constraint still enforced on appends
    bad = spark.createDataFrame(
        [(9999, datetime.datetime(2023, 12, 31), 0)],
        "k long, ts timestamp, v long",
    )
    with pytest.raises(versioned.ConstraintViolation):
        versioned.commit(spark, bad, htbl)
    # CDF across a hidden append
    base_v = versioned._latest_committed(htbl)[0]
    versioned.commit(spark, _ev(spark, 720, 730), htbl)
    ch = versioned.changes(spark, htbl, base_v, base_v + 1)
    assert ch.filter("_change_type = 'insert'").count() == 10
    # vacuum: expire everything below the tip; reads stay exact
    want = versioned.read(spark, htbl).count()
    removed = versioned.vacuum(htbl, keep_versions=1, min_age_s=0.0)
    assert versioned.read(spark, htbl).count() == want
    live = {versioned._local(f) for f in
            versioned._resolve_manifest(htbl, None)["files"]}
    assert not (set(removed) & live)


def test_year_transform_and_sql_dml_pruning(spark, tmp_path):
    """year() e2e + the SQL front door's DML probe pruning hidden
    dirs through typed TIMESTAMP literals."""
    from integritychecksforvldbs_spark.sources.versioned_sql import (
        register_table,
        versioned_sql,
    )

    t = str(tmp_path / "y")
    df = spark.range(0, 1100, 100).select(  # ~every 4 days, 3 years
        F.col("id").alias("k"),
        F.expr(
            "TIMESTAMP'2022-06-01 00:00:00' + "
            "make_interval(0,0,0,CAST(id AS INT),0,0,0)"
        ).alias("ts"),
    )
    versioned.commit(spark, df, t, partition_by=["year(ts)"])
    man = versioned._resolve_manifest(t, None)
    assert _dirs_of(man["files"], "ts_year") == [
        "2022-01-01", "2023-01-01", "2024-01-01", "2025-01-01",
    ]
    register_table("hy11", t)
    try:
        calls = []
        real = versioned._scan_live_pos

        def spy(s_, m_, files=None):
            calls.append(files)
            return real(s_, m_, files)

        versioned._scan_live_pos = spy
        try:
            m = versioned_sql(
                spark,
                "DELETE FROM hy11 WHERE "
                "ts >= TIMESTAMP'2024-01-01 00:00:00' AND "
                "ts < TIMESTAMP'2025-01-01 00:00:00'",
            ).collect()[0]
        finally:
            versioned._scan_live_pos = real
        assert m["n_deleted"] > 0
        # the SQL DELETE's probe planned only 2024's dir (strict <
        # bounds inclusively, so 2025 may also be admitted — never
        # 2022/2023)
        assert calls[0] is not None
        probed = set(_dirs_of(calls[0], "ts_year"))
        assert "2024-01-01" in probed
        assert not probed & {"2022-01-01", "2023-01-01"}
        assert (
            versioned.read(spark, t)
            .filter("year(ts) = 2024").count() == 0
        )
    finally:
        register_table("hy11", None)
