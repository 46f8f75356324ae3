"""Temporal joins — as-of enrichment over event streams.

Extends the event-pipeline family (no reference analogue; the
reference is a batch integrity orchestrator): "enrich each fact row
with the most recent dimension row at or before its timestamp" is the
canonical temporal-join shape for training-data pipelines (feature
stores, slowly-changing dims, price-as-of-trade).

Spark has no ASOF JOIN operator, so the engine expresses it as a
union-merge: tag both sides, union on an aligned time axis, and carry
the latest right-side row forward with ``last(..., ignorenulls=True)``
over a per-key window.  The right-side payload travels as ONE struct
column, so a checkpoint whose payload contains legitimate NULLs can
never be blended with an older checkpoint (``last`` skips NULL structs
atomically, never NULL fields inside the latest struct).

Scale: exactly one hash-shuffle on the join key for both sides
together (the union shuffles once; the window sorts per key within
partitions).  That beats the naive range-join (|left| × |right| per
key) and matches the plan a dedicated ASOF operator would pick.  Skewed
keys are the same hazard as any keyed window — salt upstream or split
hot keys if one entity dominates.

Tie semantics are pinned inclusive (right row at exactly the fact's
timestamp matches), matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``,
which the oracle uses verbatim.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row keeps the latest ``right``
    row for the same ``on`` key with ``right_ts <= left_ts`` (inclusive
    tie).  Unmatched rows get NULL payload (LEFT semantics).

    Output = all ``left`` columns, then ``{prefix}{right_ts}`` plus
    ``{prefix}{c}`` for each payload column.
    """
    payload = list(
        payload
        if payload is not None
        else [c for c in right.columns if c not in (on, right_ts)]
    )
    overlap = [c for c in payload if c in left.columns]
    if overlap:
        raise ValueError(f"payload columns collide with left side: {overlap}")

    l_tag = left.withColumn("_asof_side", F.lit(1))
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        *[F.col(c) for c in payload],
    ).withColumn("_asof_side", F.lit(0))
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right row sorts BEFORE the left row at an equal timestamp, so the
    # window (unbounded preceding .. current) sees it: inclusive tie
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("_asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cp_struct = F.when(
        F.col("_asof_side") == 0,
        F.struct(
            F.col(left_ts).alias("_cp_ts"), *[F.col(c) for c in payload]
        ),
    )
    filled = merged.withColumn("_cp", F.last(cp_struct, ignorenulls=True).over(w))
    return filled.filter(F.col("_asof_side") == 1).select(
        *[F.col(c) for c in left.columns],
        F.col("_cp._cp_ts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"_cp.{c}").alias(f"{prefix}{c}") for c in payload],
    )


# ---------------------------------------------------------------------------
# gate kernel: enrich every event with its user's latest purchase
# ---------------------------------------------------------------------------

def purchase_checkpoints(events: DataFrame) -> DataFrame:
    """Sparse per-user checkpoint dim: one row per (user, instant) a
    purchase happened.  Aggregated so duplicate instants (possible at
    larger SFs) stay deterministic."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("purchase_id"),
            F.max("value").alias("purchase_value"),
        )
    )


def asof_enrich_purchases(events: DataFrame) -> DataFrame:
    """Every event annotated with the user's most recent purchase at or
    before the event (a purchase matches itself)."""
    facts = events.select("event_id", "user_id", "ts", "event_type")
    return asof_join(
        facts,
        purchase_checkpoints(events),
        on="user_id",
        payload=["purchase_id", "purchase_value"],
        prefix="last_",
    ).withColumnRenamed("last_ts", "last_purchase_ts")


def asof_enrich_oracle(table: str = "events") -> str:
    """DuckDB native ASOF LEFT JOIN (inclusive >=, same tie rule).
    ``ts`` is truncated to microseconds so both engines join the same
    instants (the fixture parquet is nanosecond; Spark reads it at µs).
    """
    return f"""
WITH e AS (
  SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, event_type
  FROM {table}
),
cp AS (
  SELECT user_id, date_trunc('microseconds', ts) AS ts,
         MAX(event_id) AS purchase_id, MAX(value) AS purchase_value
  FROM {table} WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       cp.ts AS last_purchase_ts,
       cp.purchase_id AS last_purchase_id,
       cp.purchase_value AS last_purchase_value
FROM e ASOF LEFT JOIN cp ON e.user_id = cp.user_id AND e.ts >= cp.ts
"""
