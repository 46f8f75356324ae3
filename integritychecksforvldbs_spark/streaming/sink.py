"""Exactly-once Structured Streaming sinks via ``foreachBatch``.

Structured Streaming's recovery contract is at-least-once per
micro-batch: after a failure the SAME batch id replays with the SAME
data.  A ``foreachBatch`` writer therefore achieves exactly-once by
making each batch's effect idempotent in the batch id — the two
standard shapes, both on plain parquet under this repo's one-writer
state contract (see README "State & log storage contract"):

- :func:`partitioned_batch_sink` — each micro-batch overwrites its own
  ``batch_id=N`` directory.  A replay rewrites the identical directory;
  readers see each batch exactly once.  The append-sink shape (facts,
  logs).
- :func:`upsert_counts_sink` — update-mode aggregate rows upsert into
  one state table (replace-by-key), with a batch-id ledger making
  replays no-ops.  The MERGE-sink shape (dashboards, materialized
  aggregates); on an ACID format the swap becomes ``MERGE INTO``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def partitioned_batch_sink(out_dir: str):
    """``foreachBatch`` writer: batch N → ``{out_dir}/batch_id=N``
    (overwritten on replay — idempotent by construction)."""

    def write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return write


def upsert_counts_sink(state_path: str, key_cols: list[str]):
    """``foreachBatch`` upsert of update-mode aggregate rows into one
    parquet state table, exactly-once via a batch ledger.

    Per batch: already-applied batch ids are skipped (the ledger is
    consulted FIRST); otherwise current state rows whose key matches a
    batch row are replaced (anti-join + union), the new state is
    written to a temp dir and swapped, and the batch id is appended to
    the ledger.  A crash between swap and ledger append replays the
    batch — harmless, because replace-by-key with identical rows is
    idempotent.  State size is |distinct keys|; the swap is
    metadata-sized relative to the stream.
    """
    ledger_path = state_path + "._batches.json"

    def _applied() -> set[int]:
        try:
            with open(ledger_path) as f:
                return set(json.load(f))
        except Exception:
            return set()

    def write(df: DataFrame, batch_id: int) -> None:
        applied = _applied()
        if batch_id in applied:
            return  # replayed batch: already fully applied
        spark = df.sparkSession
        batch = df.cache()
        try:
            if batch.isEmpty():
                return
            try:
                state = spark.read.parquet(state_path)
                merged = state.join(
                    batch.select(*key_cols), key_cols, "left_anti"
                ).unionByName(batch)
            except Exception:  # first batch: no state yet
                merged = batch
            tmp = state_path + ".tmp"
            merged.write.mode("overwrite").parquet(tmp)
            from ..sources.catalog import _fs_and_path

            fs, h_state = _fs_and_path(spark, state_path)
            _, h_tmp = _fs_and_path(spark, tmp)
            if fs.exists(h_state):
                fs.delete(h_state, True)
            fs.rename(h_tmp, h_state)
            with open(ledger_path, "w") as f:
                json.dump(sorted(applied | {batch_id}), f)
        finally:
            batch.unpersist()

    return write
