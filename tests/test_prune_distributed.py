"""r13 distributed stats-prune fallback: manifests past
``_PRUNE_DISTRIBUTED_MIN_FILES`` evaluate the predicate profile on
executors (Arrow-batched ``mapInPandas`` over the stat entries,
running the SAME ``_file_is_dead`` kernel as the driver loop) instead
of a serial driver Python loop — the Iceberg manifest-planning shape.
Parity is exact by construction and pinned here on a synthetic
55k-file manifest; only PRUNABLE paths ever come back to the
driver."""

from __future__ import annotations

import pytest
from pyspark.sql.classic.dataframe import DataFrame

from integritychecksforvldbs_spark.sources import versioned


def _synth_man(n: int) -> dict:
    """n files range-clustered on k (10 rows per file), every 7th
    missing trustworthy stats, every 13th holding nulls in v."""
    files = [f"part-{i:06d}.parquet" for i in range(n)]
    stats = {}
    for i, f in enumerate(files):
        stats[f] = {
            "n_rows": 10,
            "cols": {
                "k": {
                    "ok": i % 7 != 0,
                    "min": i * 10,
                    "max": i * 10 + 9,
                    "nulls": 0,
                    "nulls_ok": True,
                },
                "v": {
                    "ok": True,
                    "min": 0,
                    "max": 99,
                    "nulls": 10 if i % 13 == 0 else 0,
                    "nulls_ok": True,
                },
            },
        }
    return {"files": files, "stats": stats}


@pytest.mark.parametrize(
    "bounds,points,nulls",
    [
        ({"k": (100_000, 120_000)}, None, None),
        ({"k": (None, 5_000)}, {"k": [50, 777_777]}, None),
        ({}, None, {"v": True}),
        ({"k": (3_000, 3_009)}, None, {"v": False}),
    ],
)
def test_distributed_prune_parity_55k_files(
    spark, monkeypatch, bounds, points, nulls
):
    man = _synth_man(55_000)
    driver = versioned._prune_manifest_files(man, bounds, points, nulls)
    dist = versioned._prune_manifest_files(
        man, bounds, points, nulls, spark=spark
    )
    assert driver == dist
    kept, skipped = dist
    assert len(kept) + len(skipped) == 55_000
    if bounds.get("k") == (100_000, 120_000):
        # middle slice + the 1-in-7 stats-less survivors
        assert 0 < len(kept) < 55_000


def test_distributed_path_taken_and_only_prunable_paths_collected(
    spark, monkeypatch
):
    man = _synth_man(2_000)
    monkeypatch.setattr(versioned, "_PRUNE_DISTRIBUTED_MIN_FILES", 1_000)
    collected = []
    real_collect = DataFrame.collect

    def spy(self):
        rows = real_collect(self)
        collected.append(rows)
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    bounds = {"k": (19_000, 19_500)}  # ~50 admitted + stats-less
    kept, skipped = versioned._prune_manifest_files(
        man, bounds, spark=spark
    )
    # the metadata job ran, and the driver received ONLY the dead
    # paths (never one row per file)
    assert len(collected) == 1
    assert sorted(r.path for r in collected[0]) == sorted(skipped)
    assert len(skipped) > 0
    driver = versioned._prune_manifest_files(man, bounds)
    assert (kept, skipped) == driver


def test_small_manifest_stays_on_the_driver(spark, monkeypatch):
    man = _synth_man(50)

    def boom(*a, **k):
        raise AssertionError("distributed path must not run")

    monkeypatch.setattr(
        versioned, "_prune_manifest_files_distributed", boom
    )
    kept, skipped = versioned._prune_manifest_files(
        man, {"k": (100, 200)}, spark=spark
    )
    assert len(kept) + len(skipped) == 50
