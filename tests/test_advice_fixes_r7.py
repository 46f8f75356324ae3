"""Round-7 advisor findings, pinned.

1. (high) versioned.commit's claim-then-write two-step could lose an
   acknowledged append: a racing committer re-based past an in-flight
   bodyless version.  Fixed by atomic single-file manifest installs
   (tmp + os.link CAS) — a version exists complete or not at all.
2. (medium) versioned_datasource.latestOffset could jump past an
   in-flight legacy version slot, permanently dropping its files from
   the stream.  Fixed: the offset is the CONTIGUOUS committed
   frontier, with an age grace for legacy corpse dirs.
3. (medium) ingest._schema_with_corrupt mutated the caller's
   StructType in place.  Fixed: a fresh StructType is built.
4. (low) the CSV header filter dropped EVERY canonical-valued line in
   every file.  Fixed: only files that genuinely start with the
   header (first-line sniff), and only their first block, drop it.
5. (low) versioned.merge_into silently inserted every copy of a
   duplicate source key.  Fixed: raises, matching Delta MERGE's
   multiple-source-match error.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned
from integritychecksforvldbs_spark.sources.ingest import (
    ingest_quarantined,
    split_quarantine,
)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


# ---------------------------------------------------------------------------
# 1. atomic manifest installs
# ---------------------------------------------------------------------------


def test_manifest_is_atomic_file_never_bodyless(spark, tmp_path):
    """A committed version is ONE complete json file — there is no
    claim-then-write window in which a version number exists without a
    readable body."""
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 3), path)
    vdir = os.path.join(path, "_versions")
    # ignore the r9 `_latest` pointer (a hint, not part of the log's
    # version records): the invariant here is about version ARTIFACTS
    names = sorted(n for n in os.listdir(vdir) if n.startswith("v"))
    assert names == ["v0000000001.json"]
    with open(os.path.join(vdir, names[0])) as f:
        man = json.load(f)
    assert man["version"] == 1 and man["files"]


def test_install_cas_loser_leaves_no_residue(spark, tmp_path):
    """The loser of the version CAS changes nothing: the winner's
    manifest is untouched and no tmp file remains."""
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 3), path)
    won = versioned._install_manifest(
        path, 1, {"version": 1, "mode": "append", "files": ["bogus"]}
    )
    assert won is False
    man = versioned._read_manifest(path, 1)
    assert man["files"] != ["bogus"]
    assert not [
        n for n in os.listdir(os.path.join(path, "_versions"))
        if n.startswith(".tmp-")
    ]


def test_crashed_install_tmp_is_invisible_and_vacuumed(spark, tmp_path):
    """A committer that died BEFORE the link leaves only a tmp file:
    it consumes no version number, no reader sees it, and vacuum
    reclaims it (age-guarded)."""
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 3), path)
    vdir = os.path.join(path, "_versions")
    tmp = os.path.join(vdir, ".tmp-v0000000002-deadbeef")
    with open(tmp, "w") as f:
        json.dump({"version": 2, "mode": "append", "files": []}, f)
    assert versioned._versions(path) == [1]  # number NOT consumed
    v = versioned.commit(spark, _mk(spark, 3, 6), path)
    assert v == 2  # the crash did not burn a slot
    versioned.vacuum(path)  # young tmp: possibly in-flight, retained
    assert os.path.exists(tmp)
    versioned.vacuum(path, min_age_s=0)
    assert not os.path.exists(tmp)
    assert _rows(versioned.read(spark, path)) == [(i,) for i in range(6)]


def test_concurrent_appends_never_lose_an_acknowledged_commit(
    spark, tmp_path
):
    """The advisor's lost-update scenario, stress-raced: every commit
    that RETURNED a version must have its rows in the final snapshot —
    no committer may re-base past another's in-flight commit."""
    path = str(tmp_path / "tbl")
    n_threads, per = 6, 5
    errs: list[Exception] = []

    def worker(i: int) -> None:
        try:
            versioned.commit(
                spark, _mk(spark, i * per, (i + 1) * per), path
            )
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert _rows(versioned.read(spark, path)) == [
        (i,) for i in range(n_threads * per)
    ]
    # and the log is gap-free: versions 1..n, each complete
    assert versioned._versions(path) == list(range(1, n_threads + 1))
    assert all(
        versioned._read_manifest(path, v) is not None
        for v in versioned._versions(path)
    )


# ---------------------------------------------------------------------------
# 2. streaming frontier never passes an in-flight slot
# ---------------------------------------------------------------------------


def _stream_reader(path):
    from integritychecksforvldbs_spark.sources.versioned_datasource import (
        _VersionedStreamReader,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    return _VersionedStreamReader(
        path, 0, StructType([StructField("k", LongType(), True)])
    )


def test_latest_offset_waits_for_fresh_legacy_claim(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 3), path)
    corpse = os.path.join(path, "_versions", "v0000000002")
    os.mkdir(corpse)  # legacy in-flight/crashed claim
    v3 = versioned.commit(spark, _mk(spark, 3, 6), path)
    assert v3 == 3
    r = _stream_reader(path)
    # fresh claim: the body may still land — the offset must NOT pass it
    assert r.latestOffset() == {"version": 1}
    # aged out: a corpse that will never commit — step over it
    old = time.time() - 7200
    os.utime(corpse, (old, old))
    assert r.latestOffset() == {"version": 3}
    # and the batch range skips the corpse without losing v3's files
    assert len(r._files_between(1, 3)) > 0


def test_latest_offset_raises_on_vacuumed_hole(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(spark, _mk(spark, 0, 3), path)
    versioned.commit(spark, _mk(spark, 3, 6), path)
    versioned.commit(spark, _mk(spark, 6, 9), path)
    os.unlink(os.path.join(path, "_versions", "v0000000002.json"))
    r = _stream_reader(path)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        r.latestOffset()


# ---------------------------------------------------------------------------
# 3. ingest does not mutate the caller's schema
# ---------------------------------------------------------------------------


def test_ingest_leaves_caller_schema_untouched(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("label", T.StringType(), True),
        ]
    )
    (tmp_path / "a.csv").write_text("k,label\n1,x\n2,y\n")
    before = schema.jsonValue()
    for _ in range(2):  # a second call with the SAME object must work
        raw = ingest_quarantined(spark, str(tmp_path), schema, fmt="csv")
        good, bad = split_quarantine(raw)
        assert sorted(r["k"] for r in good.collect()) == [1, 2]
        assert bad.count() == 0
    assert schema.jsonValue() == before
    assert schema.fieldNames() == ["k", "label"]


# ---------------------------------------------------------------------------
# 4. header drop is per-file, not a global value filter
# ---------------------------------------------------------------------------


def test_headerless_file_keeps_header_valued_data_row(spark, tmp_path):
    """An all-string schema ingesting a row that SPELLS like the
    header: in a file with no header it is data and must survive."""
    sch = "a string, b string"
    (tmp_path / "with_header.csv").write_text("a,b\n1,x\n2,y\n")
    (tmp_path / "headerless.csv").write_text("3,z\na,b\n4,w\n")
    good, bad = split_quarantine(
        ingest_quarantined(spark, str(tmp_path), sch, fmt="csv")
    )
    assert bad.count() == 0
    rows = sorted((r["a"], r["b"]) for r in good.collect())
    # the two real headers dropped; the header-LOOKING data row kept
    assert rows == [("1", "x"), ("2", "y"), ("3", "z"), ("4", "w"), ("a", "b")]


def test_disagreeing_header_still_quarantines(spark, tmp_path):
    """A file whose header disagrees with the declared contract keeps
    surfacing the mismatch in quarantine (it never matches the
    canonical first line, so the sniff leaves it alone)."""
    (tmp_path / "drifted.csv").write_text("k,label,price\n1,x,1.5\n")
    good, bad = split_quarantine(
        ingest_quarantined(
            spark, str(tmp_path), "k bigint, price double, label string",
            fmt="csv",
        )
    )
    assert bad.filter(
        F.col("_corrupt_record") == "k,label,price"
    ).count() == 1


# ---------------------------------------------------------------------------
# 5. merge_into refuses ambiguous (duplicate-key) sources
# ---------------------------------------------------------------------------


def test_merge_into_raises_on_duplicate_source_keys(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.commit(
        spark,
        spark.createDataFrame([(1, "a")], "k long, v string"),
        path,
    )
    dup_src = spark.createDataFrame(
        [(2, "b"), (2, "B")], "k long, v string"
    )
    with pytest.raises(ValueError, match="not unique"):
        versioned.merge_into(spark, path, dup_src, ["k"])
    # NULL keys group together too (null-safe semantics)
    null_dup = spark.createDataFrame(
        [(None, "n"), (None, "N")], "k long, v string"
    )
    with pytest.raises(ValueError, match="not unique"):
        versioned.merge_into(spark, path, null_dup, ["k"])
    # the table is untouched by the refused merges
    assert _rows(versioned.read(spark, path)) == [(1, "a")]
