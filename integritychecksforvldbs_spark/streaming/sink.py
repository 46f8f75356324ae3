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

import functools
import json

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
    batch row are replaced (null-SAFE anti-join + union — a NULL key,
    e.g. the NULL-event-type contamination rows this repo treats as
    expected, replaces like any other key), the new state is written
    to a temp dir and swapped rename-ASIDE-then-delete (old state →
    ``.bak`` → tmp in → drop ``.bak``), and the batch id is appended
    to the ledger.  Every crash window is covered: a crash mid-swap
    leaves either the old state or a ``.bak`` the next read restores;
    a crash between swap and ledger append replays the batch —
    harmless, because replace-by-key with identical rows is
    idempotent.  All sidecar IO (ledger included) goes through the
    Hadoop ``FileSystem`` of ``state_path``'s scheme, so the sink
    works wherever the state parquet does (``file:``, ``hdfs:``,
    ``s3a:``), not just on driver-local disk.  State size is
    |distinct keys|; the swap is metadata-sized relative to the
    stream.
    """
    ledger_path = state_path + "._batches.json"
    bak_path = state_path + ".bak"
    tmp_path = state_path + ".tmp"

    def write(df: DataFrame, batch_id: int) -> None:
        from ..sources.catalog import (
            _fs_and_path,
            read_text_file,
            write_text_file,
        )

        spark = df.sparkSession
        raw = read_text_file(spark, ledger_path)
        applied: set[int] = set(json.loads(raw)) if raw else set()
        if batch_id in applied:
            return  # replayed batch: already fully applied
        fs, h_state = _fs_and_path(spark, state_path)
        _, h_tmp = _fs_and_path(spark, tmp_path)
        _, h_bak = _fs_and_path(spark, bak_path)
        # crash recovery: a failure between rename-aside and rename-in
        # leaves the state missing and its .bak present — restore it
        if not fs.exists(h_state) and fs.exists(h_bak):
            fs.rename(h_bak, h_state)
        batch = df.cache()
        try:
            if batch.isEmpty():
                return
            if fs.exists(h_state):
                state = spark.read.parquet(state_path)
                keys = batch.select(*key_cols)
                cond = functools.reduce(
                    lambda a, b: a & b,
                    [state[k].eqNullSafe(keys[k]) for k in key_cols],
                )
                merged = state.join(keys, cond, "left_anti").unionByName(batch)
            else:  # first batch: no state yet
                merged = batch
            merged.write.mode("overwrite").parquet(tmp_path)
            if fs.exists(h_bak):
                fs.delete(h_bak, True)
            if fs.exists(h_state):
                fs.rename(h_state, h_bak)
            fs.rename(h_tmp, h_state)
            if fs.exists(h_bak):
                fs.delete(h_bak, True)
            write_text_file(
                spark, ledger_path, json.dumps(sorted(applied | {batch_id}))
            )
        finally:
            batch.unpersist()

    return write
