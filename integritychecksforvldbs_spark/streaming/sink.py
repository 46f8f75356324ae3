"""Exactly-once Structured Streaming sinks via ``foreachBatch``.

Structured Streaming's recovery contract is at-least-once per
micro-batch: after a failure the SAME batch id replays with the SAME
data.  A ``foreachBatch`` writer therefore achieves exactly-once by
making each batch's effect idempotent in the batch id — the standard
shapes, all on plain parquet under this repo's one-writer state
contract (see README "State & log storage contract"):

- :func:`partitioned_batch_sink` — each micro-batch overwrites its own
  ``batch_id=N`` directory.  A replay rewrites the identical directory;
  readers see each batch exactly once.  The append-sink shape (facts,
  logs).
- :func:`upsert_counts_sink` — update-mode aggregate rows upsert into
  one state table (replace-by-key), with a batch-id ledger making
  replays no-ops.  The MERGE-sink shape (dashboards, materialized
  aggregates); on an ACID format the swap becomes ``MERGE INTO``.
- :func:`scd2_snapshot_sink` — each micro-batch is a full entity
  snapshot applied to a type-2 dimension (``operators/scd.py``);
  replays re-apply the same snapshot at the same ``as_of`` and
  classify everything ``kept`` — idempotent by SCD2's own contract.

All three share one crash-safe state swap: new state to a temp dir,
old state renamed ASIDE to ``.bak``, temp renamed in, ``.bak``
dropped, batch id appended to the ledger — every crash window leaves
either the old state, a restorable ``.bak``, or an
idempotently-replayable batch.  Sidecar IO goes through the Hadoop
``FileSystem`` of the state path's scheme, so the sinks work wherever
the state parquet does (``file:``, ``hdfs:``, ``s3a:``).
"""

from __future__ import annotations

import functools
import json
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partitioned_batch_sink(out_dir: str):
    """``foreachBatch`` writer: batch N → ``{out_dir}/batch_id=N``
    (overwritten on replay — idempotent by construction)."""

    def write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return write


def _ledgered_state_sink(
    state_path: str,
    merge: Callable[[DataFrame | None, DataFrame, int], DataFrame],
):
    """Shared exactly-once machinery: batch-id ledger, ``.bak`` crash
    recovery, rename-aside state swap.  ``merge(state, batch,
    batch_id)`` produces the new state; ``state`` is None on the first
    batch.  Empty batches are no-ops (a trigger with no data is not an
    assertion about the world)."""
    ledger_path = state_path + "._batches.json"
    bak_path = state_path + ".bak"
    tmp_path = state_path + ".tmp"

    def write(df: DataFrame, batch_id: int) -> None:
        from ..sources.catalog import (
            _fs_and_path,
            read_text_file,
            rename_or_raise,
            write_text_file,
        )

        spark = df.sparkSession
        try:
            raw = read_text_file(spark, ledger_path)
            applied: set[int] = set(json.loads(raw)) if raw else set()
        except Exception:
            # a crash mid-ledger-write leaves partial JSON or a torn
            # file whose checksum no longer verifies (Hadoop LocalFS
            # ChecksumException); treating either as an empty ledger
            # only re-applies batches, which every merge here is
            # idempotent under — failing instead would wedge the
            # stream permanently on the same batch
            applied = set()
        if batch_id in applied:
            return  # replayed batch: already fully applied
        fs, h_state = _fs_and_path(spark, state_path)
        _, h_tmp = _fs_and_path(spark, tmp_path)
        _, h_bak = _fs_and_path(spark, bak_path)
        # crash recovery: a failure between rename-aside and rename-in
        # leaves the state missing and its .bak present — restore it
        if not fs.exists(h_state) and fs.exists(h_bak):
            rename_or_raise(fs, h_bak, h_state)
        batch = df.cache()
        try:
            if batch.isEmpty():
                return
            state = (
                spark.read.parquet(state_path) if fs.exists(h_state) else None
            )
            merged = merge(state, batch, batch_id)
            merged.write.mode("overwrite").parquet(tmp_path)
            if fs.exists(h_bak):
                fs.delete(h_bak, True)
            if fs.exists(h_state):
                rename_or_raise(fs, h_state, h_bak)
            # a failure HERE must abort before the .bak delete and the
            # ledger append — the .bak is the only installed copy and
            # the batch has not been applied
            rename_or_raise(fs, h_tmp, h_state)
            if fs.exists(h_bak):
                fs.delete(h_bak, True)
            write_text_file(
                spark, ledger_path, json.dumps(sorted(applied | {batch_id}))
            )
        finally:
            batch.unpersist()

    return write


def upsert_counts_sink(state_path: str, key_cols: list[str]):
    """``foreachBatch`` upsert of update-mode aggregate rows into one
    parquet state table, exactly-once via the shared ledgered swap.

    Current state rows whose key matches a batch row are replaced
    (null-SAFE anti-join + union — a NULL key, e.g. the
    NULL-event-type contamination rows this repo treats as expected,
    replaces like any other key).  A crash between swap and ledger
    append replays the batch — harmless, because replace-by-key with
    identical rows is idempotent.  State size is |distinct keys|; the
    swap is metadata-sized relative to the stream.
    """

    def merge(state: DataFrame | None, batch: DataFrame, _bid: int) -> DataFrame:
        if state is None:
            return batch
        keys = batch.select(*key_cols)
        cond = functools.reduce(
            lambda a, b: a & b,
            [state[k].eqNullSafe(keys[k]) for k in key_cols],
        )
        return state.join(keys, cond, "left_anti").unionByName(batch)

    return _ledgered_state_sink(state_path, merge)


def scd2_snapshot_sink(
    dim_path: str,
    key_cols: list[str],
    tracked_cols: list[str],
    as_of_for_batch: Callable[[int], object],
):
    """``foreachBatch`` type-2 dimension maintenance: every micro-batch
    carries a FULL entity snapshot (the usual shape after upstream CDC
    compaction), applied to the dimension state with
    :func:`..operators.scd.scd2_apply` at ``as_of_for_batch(batch_id)``.

    ``as_of_for_batch`` must be deterministic in the batch id (e.g. a
    batch-sequence date, or an event-time high-watermark carried in the
    snapshot) — that is what makes a crash between swap and ledger
    append safe: the replay re-applies the same snapshot at the same
    ``as_of`` to the already-updated dimension and classifies every
    row ``kept``/``history``, rewriting identical state.

    The empty batch is a NO-OP, not an empty snapshot: a trigger
    without data must not close every open version.  An intentional
    "all entities deleted" snapshot needs at least a tombstone row
    upstream or a direct batch :func:`scd2_apply` call.
    """
    from ..operators.scd import scd2_apply

    def merge(state: DataFrame | None, batch: DataFrame, batch_id: int) -> DataFrame:
        as_of = as_of_for_batch(batch_id)
        snap = batch.select(*key_cols, *tracked_cols)
        if state is None:
            bootstrap = snap.limit(0).withColumn("valid_from", F.lit(as_of))
            vf_t = bootstrap.schema["valid_from"].dataType
            state = bootstrap.withColumn("valid_to", F.lit(None).cast(vf_t))
        return scd2_apply(state, snap, key_cols, tracked_cols, as_of).drop(
            "version_action"
        )

    return _ledgered_state_sink(dim_path, merge)
