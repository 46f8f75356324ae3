"""bucket(n, col) partition transform (r12; VERDICT r11 #3 —
previously refused as "hash not driver-computable").  The bucket id
is Spark's own murmur3 (``pmod(hash(col), n)``, one codegen'd JVM
expression on the write path) and functions/sparkhash.py is its
bit-for-bit pure-Python twin, so the driver CAN compute a predicate
literal's bucket and point-prune to one dir.  Range predicates keep
every bucket (the hash is not monotonic — documented contract).
Reference parity: lakehouse surface (Iceberg's most-used transform
for high-cardinality keys), not a reference operator.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from integritychecksforvldbs_spark.functions import sparkhash
from integritychecksforvldbs_spark.sources import versioned


def test_python_twin_matches_spark_hash_every_kind(spark):
    """The pruning twin must equal F.hash bit-for-bit per type —
    ints at both widths, strings (multi-byte UTF-8 and tails of
    every alignment), dates, timestamps, negatives, extremes."""
    rows = [
        (0, 0, "", datetime.date(1970, 1, 1),
         datetime.datetime(1970, 1, 1)),
        (5, 5, "a", datetime.date(2024, 1, 15),
         datetime.datetime(2024, 1, 15, 12, 30, 45, 123456)),
        (-7, -7, "ab", datetime.date(1969, 12, 31),
         datetime.datetime(1960, 5, 5, 1, 2, 3)),
        (2**31 - 1, 2**62, "abc", datetime.date(2000, 2, 29),
         datetime.datetime(2038, 1, 19, 3, 14, 7)),
        (-(2**31), -(2**62), "abcd", datetime.date(1900, 1, 1),
         datetime.datetime(1970, 1, 1, 0, 0, 0, 1)),
        (123456789, -1, "日本語テスト", datetime.date(2099, 12, 31),
         datetime.datetime(2024, 6, 30, 23, 59, 59, 999999)),
        (-42, 42, "ñ€𝄞 mixed", datetime.date(1970, 1, 2),
         datetime.datetime(1999, 12, 31, 23, 59, 59)),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("i", T.IntegerType()),
            T.StructField("l", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DateType()),
            T.StructField("t", T.TimestampType()),
        ]),
    )
    got = df.select(
        F.hash("i").alias("hi"), F.hash("l").alias("hl"),
        F.hash("s").alias("hs"), F.hash("d").alias("hd"),
        F.hash("t").alias("ht"),
    ).collect()
    for (i, l, s, d, t), r in zip(rows, got):
        assert sparkhash.spark_hash(i, "int") == r.hi
        assert sparkhash.spark_hash(l, "long") == r.hl
        assert sparkhash.spark_hash(s, "string") == r.hs
        assert sparkhash.spark_hash(d, "date") == r.hd
        assert sparkhash.spark_hash(t, "timestamp") == r.ht


def test_python_twin_matches_spark_hash_fuzz(spark):
    import random

    rng = random.Random(12012)
    longs = [rng.randrange(-(2**63), 2**63) for _ in range(200)]
    strs = [
        "".join(
            rng.choice("abcXYZ 0189é日ÿ")
            for _ in range(rng.randrange(0, 24))
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        list(zip(longs, strs)),
        T.StructType([
            T.StructField("l", T.LongType()),
            T.StructField("s", T.StringType()),
        ]),
    )
    for r, l, s in zip(
        df.select(F.hash("l").alias("hl"), F.hash("s").alias("hs"))
        .collect(),
        longs,
        strs,
    ):
        assert sparkhash.hash_long(l) == r.hl
        assert sparkhash.hash_bytes(s.encode("utf-8")) == r.hs


@pytest.fixture()
def btbl(spark, tmp_path):
    """1000 rows bucketed 8 ways on the high-cardinality long key."""
    path = str(tmp_path / "t")
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    )
    versioned.commit(spark, df, path, partition_by=["bucket(8, k)"])
    return path


def test_bucket_layout_and_spec(spark, btbl):
    man = versioned._resolve_manifest(btbl, None)
    assert man["partition_transforms"] == {
        "k_bucket_8": {"fn": "bucket", "src": "k", "n": 8,
                       "hash": "long"}
    }
    # every file sits in the dir its rows' keys hash to, the dir
    # value folded into stats as an exact bound
    segs = {
        versioned._partition_segments(f)["k_bucket_8"]
        for f in man["files"]
    }
    assert segs <= {str(b) for b in range(8)} and len(segs) == 8
    # the synthetic dir never surfaces in the schema
    assert "k_bucket_8" not in versioned.read(spark, btbl).columns


def test_bucket_point_prunes_to_one_bucket(spark, btbl):
    man = versioned._resolve_manifest(btbl, None)
    for probe in (0, 417, 999):
        b = sparkhash.bucket_id(probe, "long", 8)
        kept, _ = versioned._prune_manifest_files(
            man, {"k": (probe, probe)}
        )
        assert kept and all(
            versioned._partition_segments(f)["k_bucket_8"] == str(b)
            for f in kept
        )
        assert len(kept) < len(man["files"])
        got = versioned.read_where(spark, btbl, {"k": (probe, probe)})
        assert [tuple(r) for r in got.collect()] == [
            (probe, probe * 3, f"u{probe}")
        ]


def test_bucket_range_keeps_every_bucket(spark, btbl):
    """The hash is not monotonic: a RANGE predicate must get NO
    extra prune from the bucket translation (the files' own k
    footer stats may still prune — that path is orthogonal)."""
    man = versioned._resolve_manifest(btbl, None)
    kept, _ = versioned._prune_manifest_files(man, {"k": (10, 20)})
    man_plain = {**man, "partition_transforms": {}}
    kept_plain, _ = versioned._prune_manifest_files(
        man_plain, {"k": (10, 20)}
    )
    assert sorted(kept) == sorted(kept_plain)
    got = versioned.read_where(spark, btbl, {"k": (10, 20)})
    assert got.count() == 11


def test_bucket_sql_and_dml_point_probes_prune(spark, btbl, monkeypatch):
    probe_calls = []
    real = versioned._scan_live_pos

    def spy(spark, man, files=None):
        probe_calls.append(files)
        return real(spark, man, files)

    monkeypatch.setattr(versioned, "_scan_live_pos", spy)
    b = sparkhash.bucket_id(123, "long", 8)
    got = versioned.read_sql_where(spark, btbl, "k = 123")
    assert [r.v for r in got.collect()] == [369]
    v, n = versioned.delete_where(spark, btbl, "k = 123")
    assert n == 1
    probe_files = [c for c in probe_calls if c is not None]
    assert probe_files and all(
        versioned._partition_segments(f)["k_bucket_8"] == str(b)
        for c in probe_files
        for f in c
    )
    assert versioned.read(spark, btbl).filter("k = 123").count() == 0


def test_bucket_string_source_roundtrip(spark, tmp_path):
    path = str(tmp_path / "s")
    df = spark.range(300).select(
        F.concat(F.lit("user-"), F.col("id")).alias("uid"),
        F.col("id").alias("v"),
    )
    versioned.commit(spark, df, path, partition_by=["bucket(4, uid)"])
    man = versioned._resolve_manifest(path, None)
    tr = man["partition_transforms"]["uid_bucket_4"]
    assert tr["hash"] == "string"
    b = sparkhash.bucket_id("user-250", "string", 4)
    kept, _ = versioned._prune_manifest_files(
        man, {"uid": ("user-250", "user-250")}
    )
    assert kept and all(
        versioned._partition_segments(f)["uid_bucket_4"] == str(b)
        for f in kept
    )
    got = versioned.read_where(
        spark, path, {"uid": ("user-250", "user-250")}
    )
    assert [r.v for r in got.collect()] == [250]


def test_bucket_refusals(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("x"),
    )
    with pytest.raises(ValueError, match="positive count"):
        versioned.commit(
            spark, df, str(tmp_path / "a"), partition_by=["bucket(0, k)"]
        )
    with pytest.raises(ValueError, match="integer/string/date"):
        versioned.commit(
            spark, df, str(tmp_path / "b"), partition_by=["bucket(4, x)"]
        )


def test_merge_probe_prunes_to_source_key_buckets(
    spark, btbl, monkeypatch
):
    """r12: a small CDC upsert keyed by the bucket column probes only
    the SOURCE KEYS' buckets — min/max bounds are useless under a
    hash layout, the membership point set is what prunes."""
    calls = []
    real = versioned._scan_live_pos

    def spy(spark, man, files=None):
        calls.append(files)
        return real(spark, man, files)

    monkeypatch.setattr(versioned, "_scan_live_pos", spy)
    src = spark.createDataFrame(
        [(5, 5_000, "x5"), (999, 9_000, "x999"), (1500, 15_000, "new")],
        "k long, v long, name string",
    )
    want_buckets = {
        str(sparkhash.bucket_id(k, "long", 8)) for k in (5, 999, 1500)
    }
    versioned.merge_into(spark, btbl, src, ["k"])
    probed = [c for c in calls if c is not None]
    assert probed and all(
        versioned._partition_segments(f)["k_bucket_8"] in want_buckets
        for c in probed
        for f in c
    )
    got = versioned.read(spark, btbl)
    assert got.filter("k = 5").collect()[0].v == 5_000
    assert got.filter("k = 1500").collect()[0].name == "new"
    assert got.count() == 1001


def test_bucket_and_bloom_compose_on_the_same_key(spark, tmp_path):
    """A bucketed table ALSO Bloom-indexed on the key: a point probe
    prunes to (its bucket's files) ∩ (bloom-admitted files) — the
    two channels compose, never fight."""
    path = str(tmp_path / "bb")
    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    versioned.commit(
        spark,
        df.repartition(4),  # several files PER bucket dir
        path,
        partition_by=["bucket(4, k)"],
    )
    versioned.build_bloom(spark, path, "k")
    man = versioned._resolve_manifest(path, None)
    probe = 1234
    b = str(sparkhash.bucket_id(probe, "long", 4))
    in_bucket = [
        f for f in man["files"]
        if versioned._partition_segments(f)["k_bucket_4"] == b
    ]
    assert len(in_bucket) > 1  # several files share the bucket
    kept, _ = versioned._prune_manifest_files(
        man, {"k": (probe, probe)}
    )
    assert set(kept) <= set(in_bucket)
    admitted = versioned._bloom_prune_files(
        spark, man, {"k": [probe]}, kept
    )
    assert set(admitted) <= set(kept)
    got = versioned.read_where(spark, path, {"k": (probe, probe)})
    assert [tuple(r) for r in got.collect()] == [(probe, probe * 3)]


def test_combined_day_and_bucket_spec_prunes_intersection(
    spark, tmp_path
):
    """The realistic event-table layout: PARTITIONED BY (day(ts),
    bucket(4, uid)) — a ts range picks day dirs, a uid point picks
    one bucket, and together they prune to the intersection."""
    import datetime

    path = str(tmp_path / "c")
    df = spark.range(1200).select(
        (F.col("id") % 97).alias("uid"),
        F.expr(
            "timestamp'2024-01-01 06:00:00' + make_interval("
            "0, 0, 0, CAST(id % 6 AS INT), 0, 0, 0)"
        ).alias("ts"),
        F.col("id").alias("v"),
    )
    versioned.commit(
        spark, df, path, partition_by=["day(ts)", "bucket(4, uid)"]
    )
    man = versioned._resolve_manifest(path, None)
    assert set(man["partition_transforms"]) == {
        "ts_day", "uid_bucket_4"
    }
    lo = datetime.datetime(2024, 1, 2, 0, 0)
    hi = datetime.datetime(2024, 1, 3, 23, 59)
    b = str(sparkhash.bucket_id(42, "long", 4))
    kept, _ = versioned._prune_manifest_files(
        man, {"ts": (lo, hi), "uid": (42, 42)}
    )
    assert kept
    for f in kept:
        seg = versioned._partition_segments(f)
        assert seg["ts_day"] in ("2024-01-02", "2024-01-03")
        assert seg["uid_bucket_4"] == b
    got = versioned.read_where(
        spark, path, {"ts": (lo, hi), "uid": (42, 42)}
    )
    want = df.filter(
        (F.col("ts") >= lo) & (F.col("ts") <= hi) & (F.col("uid") == 42)
    )
    assert sorted(r.v for r in got.collect()) == sorted(
        r.v for r in want.collect()
    )
