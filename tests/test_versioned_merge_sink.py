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


CDC_CLAUSES = [
    {"when": "matched", "cond": "s.op = 'D'", "action": "delete"},
    {"when": "matched", "action": "update", "set": {"val": "s.val"}},
    {"when": "not_matched", "cond": "s.op <> 'D'", "action": "insert",
     "values": {"k": "s.k", "val": "s.val"}},
]


def _cdc(spark, rows):
    return spark.createDataFrame(rows, "k long, val string, op string")


def test_conditional_merge_sink_cdc_deletes(spark, tmp_path):
    """r10 verdict gap #4: the merge sink was upsert-only, so a
    delete-bearing change stream could not land as deletes.
    versioned_batch_sink(mode='merge', clauses=...) routes through
    merge_when — the CDC shape WHEN MATCHED AND s.op='D' THEN DELETE —
    with the in-body batch_id keeping replays no-ops."""
    dst = str(tmp_path / "dst")
    versioned.commit(
        spark, _kv(spark, [(1, "a"), (2, "b"), (3, "c")]), dst
    )
    w = versioned.versioned_batch_sink(
        dst, mode="merge", keys=["k"], clauses=CDC_CLAUSES
    )
    # batch 0: update 1, delete 2, insert 4, and a delete for a key
    # that never existed (no-op by the matched guard)
    w(_cdc(spark, [(1, "A!", "U"), (2, None, "D"),
                   (4, "d", "I"), (9, None, "D")]), 0)
    got = {r.k: r.val for r in versioned.read(spark, dst).collect()}
    assert got == {1: "A!", 3: "c", 4: "d"}
    v_after = versioned._latest_committed(dst)[0]
    man = versioned._latest_committed(dst)[1]
    assert man.get("batch_id") == 0 and man.get("mode") == "merge"
    # replay of the SAME delete-bearing batch is a no-op
    w(_cdc(spark, [(1, "SHOULD-NOT-LAND", "U"), (3, None, "D")]), 0)
    assert versioned._latest_committed(dst)[0] == v_after
    assert {r.k: r.val for r in versioned.read(spark, dst).collect()} == {
        1: "A!", 3: "c", 4: "d"
    }
    # the next batch id lands
    w(_cdc(spark, [(3, None, "D")]), 1)
    assert {r.k for r in versioned.read(spark, dst).collect()} == {1, 4}


def test_conditional_merge_sink_stream_end_to_end(registered, tmp_path):
    spark = registered
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    versioned.commit(
        spark, _cdc(spark, [(1, "a", "I"), (2, "b", "I")]), src
    )
    # a conditional merge needs an EXISTING target (the batch carries
    # CDC columns the table must not): zero-row create, Delta-style
    versioned.commit(
        spark, spark.createDataFrame([], "k long, val string"), dst
    )

    def run():
        (
            spark.readStream.format("versioned")
            .option("maxVersionsPerTrigger", 1)
            .load(src)
            .writeStream.foreachBatch(
                versioned.versioned_batch_sink(
                    dst, mode="merge", keys=["k"], clauses=CDC_CLAUSES
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run()
    # a second run delivers the delete-bearing commit as its own batch
    # (the first trigger of a fresh checkpoint is uncapped by design,
    # so one run would fold both commits into a key-ambiguous batch —
    # the documented compact-first contract would refuse it)
    versioned.commit(
        spark, _cdc(spark, [(2, None, "D"), (5, "e", "I")]), src
    )
    run()
    got = {r.k: r.val for r in versioned.read(spark, dst).collect()}
    assert got == {1: "a", 5: "e"}  # 2 inserted then deleted
    run()  # idle replay: no re-delivery, no re-merge
    assert {
        r.k: r.val for r in versioned.read(spark, dst).collect()
    } == {1: "a", 5: "e"}


def test_sink_clauses_need_merge_mode(tmp_path):
    with pytest.raises(ValueError, match='need mode="merge"'):
        versioned.versioned_batch_sink(
            str(tmp_path), mode="append", clauses=CDC_CLAUSES
        )


def test_sink_clauses_need_existing_target(spark, tmp_path):
    w = versioned.versioned_batch_sink(
        str(tmp_path / "nope"), mode="merge", keys=["k"],
        clauses=CDC_CLAUSES,
    )
    with pytest.raises(FileNotFoundError, match="existing target"):
        w(_cdc(spark, [(1, "a", "I")]), 0)
