"""Zero-copy conversion of plain parquet into a versioned table
(round-10: the CONVERT TO DELTA analogue, the 100 TB migration door —
version 1's manifest REFERENCES the part-files in place with a
footer-census for stats; no byte is copied or moved).

Pinned here: reference-in-place (no copy), stats-backed pruning on the
converted snapshot, DML/ALTER/bloom on converted tables, vacuum never
touching source bytes, the ns-timestamp hazard path (no recorded
schema → every scan takes the legacy load_table normalization), the
SQL verb, and refusal to convert over an existing log.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned
from integritychecksforvldbs_spark.sources.loader import load_table
from integritychecksforvldbs_spark.sources.versioned_sql import (
    versioned_sql,
)


def _plain(spark, path, n=1000, files=4):
    (
        spark.range(0, n)
        .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
        .repartitionByRange(files, "k")
        .write.parquet(path)
    )
    return path


def test_convert_references_in_place_and_prunes(spark, tmp_path):
    src = _plain(spark, str(tmp_path / "plain"))
    t = str(tmp_path / "tbl")
    assert versioned.convert_to_versioned(spark, src, t) == 1
    got = versioned.read(spark, t)
    assert got.count() == 1000 and set(got.columns) == {"k", "v"}
    man = versioned._resolve_manifest(t, None)
    assert all("/plain/" in f for f in man["files"])  # zero-copy
    # the census feeds pruning immediately
    kept, skipped = versioned._prune_manifest_files(
        man, {"k": (990, None)}
    )
    assert skipped and len(kept) == 1
    assert versioned.read_where(spark, t, {"k": (990, None)}).count() == 10


def test_convert_refuses_existing_log(spark, tmp_path):
    src = _plain(spark, str(tmp_path / "plain"))
    t = str(tmp_path / "tbl")
    versioned.convert_to_versioned(spark, src, t)
    with pytest.raises(FileExistsError):
        versioned.convert_to_versioned(spark, src, t)


def test_dml_alter_bloom_on_converted_table(spark, tmp_path):
    src = _plain(spark, str(tmp_path / "plain"))
    t = str(tmp_path / "tbl")
    versioned.convert_to_versioned(spark, src, t)
    v, n = versioned.delete_where(spark, t, "k < 100")
    assert n == 100 and versioned.read(spark, t).count() == 900
    # source bytes untouched by DML (replace commits only un-reference)
    assert load_table(spark, src).count() == 1000
    versioned.rename_column(t, "v", "val")
    assert versioned.read(spark, t).columns == ["k", "val"]
    versioned.build_bloom(spark, t, "k")
    man = versioned._resolve_manifest(t, None)
    kept = versioned._bloom_prune_files(
        spark, man, {"k": 500}, man["files"]
    )
    assert len(kept) < len(man["files"])


def test_vacuum_never_reclaims_source_bytes(spark, tmp_path):
    src = _plain(spark, str(tmp_path / "plain"))
    t = str(tmp_path / "tbl")
    versioned.convert_to_versioned(spark, src, t)
    versioned.update_where(spark, t, "k = 5", {"v": "0"}, strategy="copy")
    removed = versioned.vacuum(t, keep_versions=1, min_age_s=0.0)
    # the un-referenced ORIGINAL files live under the source dir,
    # outside {table}/data — vacuum must not have deleted them
    assert load_table(spark, src).count() == 1000
    assert all("/plain/" not in r for r in removed)
    assert versioned.read(spark, t).count() == 1000
    assert versioned.read(spark, t).filter("k = 5").collect()[0].v == 0


def test_ns_timestamp_source_takes_legacy_path(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    t = str(tmp_path / "ev")
    versioned.convert_to_versioned(spark, src, t)
    man = versioned._resolve_manifest(t, None)
    assert man.get("schema") is None  # hazard: scans via load_table
    got = versioned.read(spark, t)
    plain = load_table(spark, src)
    assert got.count() == plain.count()
    assert dict(got.dtypes)["ts"] == dict(plain.dtypes)["ts"]


def test_sql_convert_verb(spark, tmp_path):
    src = _plain(spark, str(tmp_path / "plain"))
    t = str(tmp_path / "tbl")
    r = versioned_sql(
        spark, f"CONVERT TO VERSIONED '{src}' AT '{t}' AS conv_t"
    ).collect()[0]
    assert r.version == 1
    out = versioned_sql(
        spark, "SELECT COUNT(*) AS n FROM conv_t"
    ).collect()[0]
    assert out.n == 1000
    versioned_sql(spark, "DROP TABLE conv_t")


def test_heterogeneous_source_hazard_found_past_first_file(
    spark, tmp_path
):
    """r10 advice (medium): the hazard probe sampled files[:1], so a
    directory whose LATER part-files carry INT64 TIMESTAMP(NANOS)
    recorded a schema and every schema'd scan mis-read them.  The
    probe is now a distributed sweep over every footer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "mixed")
    os.makedirs(src)
    # part-00000: clean (sorts FIRST in the listing)
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64())}),
        os.path.join(src, "part-00000.parquet"),
    )
    # part-00001: nanosecond timestamp — the hazard
    pq.write_table(
        pa.table(
            {
                "k": pa.array([3, 4], pa.int64()),
                "ts": pa.array([0, 1], pa.timestamp("ns")),
            }
        ),
        os.path.join(src, "part-00001.parquet"),
    )
    t = str(tmp_path / "tbl_mixed")
    versioned.convert_to_versioned(spark, src, t)
    man = versioned._resolve_manifest(t, None)
    assert man.get("schema") is None  # hazard detected past file 0


def test_convert_partitioned_source(spark, tmp_path):
    """r11: CONVERT of an already hive-partitioned plain directory
    (Delta's CONVERT TO DELTA ... PARTITIONED BY).  Before this, the
    conversion silently DROPPED the partition columns (they live in
    directory names, not footers).  Pinned: undeclared partitioning
    is refused loudly; declared partitioning keeps the columns
    (values, types, pruning) zero-copy; appends inherit."""
    src = str(tmp_path / "plain_part")
    (
        spark.range(100)
        .selectExpr(
            "id AS k", "CAST(id % 4 AS INT) AS c", "id * 2 AS v"
        )
        .write.partitionBy("c")
        .parquet(src)
    )
    t = str(tmp_path / "tbl")
    with pytest.raises(ValueError, match="hive-partitioned"):
        versioned.convert_to_versioned(spark, src, t)
    with pytest.raises(ValueError, match="does not match"):
        versioned.convert_to_versioned(spark, src, t, partition_by=["v"])
    assert versioned.convert_to_versioned(
        spark, src, t, partition_by=["c"]
    ) == 1
    man = versioned._resolve_manifest(t, None)
    assert man["partition_by"] == ["c"]
    got = versioned.read(spark, t)
    assert set(got.columns) == {"k", "c", "v"}
    assert got.count() == 100
    assert got.agg(F.sum("c")).collect()[0][0] == sum(i % 4 for i in range(100))
    # folded stats prune exactly, zero-copy (files referenced in place)
    cand = versioned._dml_candidates(man, "c = 2")
    assert cand and all("c=2" in f for f in cand)
    assert all(f.split("file:")[-1].startswith(src) or src in f for f in man["files"])
    # appends inherit the layout and land under the TABLE's data root
    # (discovery ordered the declared schema data-cols-first, so the
    # append must speak that order — the usual drift contract)
    versioned.commit(
        spark,
        spark.range(100, 110).selectExpr(
            "id AS k", "id * 2 AS v", "CAST(id % 4 AS INT) AS c"
        ),
        t,
    )
    assert versioned.read(spark, t).count() == 110
    assert versioned.read(spark, t).filter("c = 1").count() == 28


def test_sql_convert_partitioned_verb(spark, tmp_path):
    src = str(tmp_path / "plain_part")
    (
        spark.range(40)
        .selectExpr("id AS k", "CAST(id % 2 AS INT) AS c")
        .write.partitionBy("c")
        .parquet(src)
    )
    t = str(tmp_path / "tbl")
    r = versioned_sql(
        spark,
        f"CONVERT TO VERSIONED '{src}' AT '{t}' "
        "PARTITIONED BY (c) AS convp_t",
    ).collect()[0]
    assert r.version == 1
    out = versioned_sql(
        spark, "SELECT SUM(c) AS s FROM convp_t"
    ).collect()[0]
    assert out.s == 20
    versioned_sql(spark, "DROP TABLE convp_t")
