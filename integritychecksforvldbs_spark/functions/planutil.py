"""Logical-plan hygiene helpers.

Iterative and composed pipelines (label-propagation clustering, the
curation funnel) build DataFrames whose LOGICAL plan re-derives every
upstream stage even when execution is bounded by per-stage persists:
the returned frame replays the whole chain on any cache eviction or
re-execution, and Catalyst pays optimization time proportional to the
accumulated plan (round-4 audit: the funnel's returned frame compiled
to a 12,848-scan plan).  The fix is to truncate lineage at stage
boundaries so the frame's plan is stage-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and return a frame whose plan is a scan of
    the materialized blocks (``localCheckpoint(eager=True)``) —
    downstream plans stop compounding.

    Trade-off vs ``persist()``: persist keeps lineage (recomputable
    after executor loss, plan still grows); localCheckpoint drops
    lineage (plan is flat, but blocks lost with their executor — a
    lost block fails the job instead of recomputing).  That is the
    right trade INSIDE an iterative stage whose recompute would replay
    the entire chain anyway; long-lived results that must survive
    executor churn on a real cluster should be written to storage
    instead (``reliable`` checkpoint or parquet).  Blocks are
    reclaimed by the ContextCleaner once the frame is unreachable —
    do NOT ``unpersist()`` a checkpointed frame (that would destroy
    its only copy).
    """
    return df.localCheckpoint(eager=True)
