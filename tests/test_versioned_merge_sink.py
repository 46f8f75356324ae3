"""Streaming MERGE (upsert) sink — round-10: the CDC sink shape.

`versioned_batch_sink(mode="merge", keys=[...])` upserts each
micro-batch through `merge_into` instead of appending — Delta's
documented foreachBatch+MERGE pattern — exactly-once by the same
in-body batch_id ledger (the merge's single replace commit carries
it, so "rows upserted" and "batch recorded" are one atomic event).

Pinned: versioned source → merge sink end-to-end with per-version
micro-batches (updates supersede, inserts land), idle/replay
idempotence, manual same-batch-id replay as a no-op, the
ambiguous-source refusal surfacing through the sink, and the
keys-required validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


@pytest.fixture
def registered(spark):
    from integritychecksforvldbs_spark.sources.versioned_datasource import (
        register,
    )

    register(spark)
    return spark


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, val string")


def test_stream_upsert_end_to_end(registered, tmp_path):
    spark = registered
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    versioned.commit(
        spark, _kv(spark, [(1, "a"), (2, "b"), (3, "c")]), src
    )

    def run():
        (
            spark.readStream.format("versioned")
            .option("maxVersionsPerTrigger", 1)  # key-unique batches
            .load(src)
            .writeStream.foreachBatch(
                versioned.versioned_batch_sink(
                    dst, mode="merge", keys=["k"]
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run()
    got = {r.k: r.val for r in versioned.read(spark, dst).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    # CDC batch: update key 2, insert key 4 — upserted, not appended
    versioned.commit(spark, _kv(spark, [(2, "B!"), (4, "d")]), src)
    run()
    got = {r.k: r.val for r in versioned.read(spark, dst).collect()}
    assert got == {1: "a", 2: "B!", 3: "c", 4: "d"}
    assert versioned.read(spark, dst).count() == 4  # no dup keys
    run()  # idle replay: nothing re-delivered, nothing re-merged
    got = {r.k: r.val for r in versioned.read(spark, dst).collect()}
    assert got == {1: "a", 2: "B!", 3: "c", 4: "d"}


def test_manual_batch_replay_is_noop(spark, tmp_path):
    dst = str(tmp_path / "dst")
    w = versioned.versioned_batch_sink(dst, mode="merge", keys=["k"])
    w(_kv(spark, [(1, "a"), (2, "b")]), 7)
    v1 = versioned._latest_committed(dst)[0]
    w(_kv(spark, [(1, "SHOULD-NOT-LAND")]), 7)  # same batch_id
    assert versioned._latest_committed(dst)[0] == v1
    got = {r.k: r.val for r in versioned.read(spark, dst).collect()}
    assert got == {1: "a", 2: "b"}
    # a NEW batch id merges
    w(_kv(spark, [(1, "A2")]), 8)
    got = {r.k: r.val for r in versioned.read(spark, dst).collect()}
    assert got == {1: "A2", 2: "b"}
    # the merge commit carries the ledger entry atomically
    man = versioned._latest_committed(dst)[1]
    assert man.get("batch_id") == 8 and man.get("mode") == "merge"


def test_ambiguous_batch_refused(spark, tmp_path):
    dst = str(tmp_path / "dst")
    versioned.commit(spark, _kv(spark, [(1, "a")]), dst)
    w = versioned.versioned_batch_sink(dst, mode="merge", keys=["k"])
    with pytest.raises(ValueError, match="not unique"):
        w(_kv(spark, [(1, "x"), (1, "y")]), 3)


def test_sink_validation(tmp_path):
    with pytest.raises(ValueError, match="needs keys"):
        versioned.versioned_batch_sink(str(tmp_path), mode="merge")
    with pytest.raises(ValueError, match="unknown sink mode"):
        versioned.versioned_batch_sink(str(tmp_path), mode="replace")
