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


# ---------------------------------------------------------------------------
# banded range join
# ---------------------------------------------------------------------------

def banded_range_join_counts(
    events: DataFrame,
    intervals: DataFrame,
    band_seconds: int = 3600,
    ts_col: str = "ts",
    start_col: str = "window_start",
    end_col: str = "window_end",
) -> DataFrame:
    """Count events inside arbitrary [start, end) intervals — a pure
    range join, which Spark would otherwise plan as a broadcast
    nested-loop (O(|events|·|intervals|) comparisons).

    The banding trick turns it into an equi-join: every event carries
    its ``band_seconds`` time bucket; every interval explodes into the
    buckets it overlaps (len/band + 1 rows, constant for bounded
    intervals); the join is equi on the bucket with the residual
    range predicate applied after.  An event has exactly ONE bucket,
    so it matches each interval at most once — no dedup pass.  Work is
    |events| + Σ interval-bands, hash-shuffled on the bucket: linear,
    skew-bounded by events-per-band.
    """
    from integritychecksforvldbs_spark.functions.timeutil import us_epoch_sql

    us = band_seconds * 1_000_000
    # integer DIV, not FP division + cast: band ids must be exact
    ev = events.select(
        F.col(ts_col).alias("_ts"),
        F.expr(f"{us_epoch_sql(ts_col)} div {us}").alias("_band"),
    )
    iv = intervals.select(
        F.col(start_col).alias("_start"),
        F.col(end_col).alias("_end"),
        F.explode(
            F.sequence(
                F.expr(f"{us_epoch_sql(start_col)} div {us}"),
                F.expr(f"({us_epoch_sql(end_col)} - 1) div {us}"),
            )
        ).alias("_band"),
    )
    return (
        ev.join(iv, "_band")
        .filter((F.col("_ts") >= F.col("_start")) & (F.col("_ts") < F.col("_end")))
        .groupBy(F.col("_start").alias(start_col), F.col("_end").alias(end_col))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


def error_incident_windows(events: DataFrame, threshold: int = 6) -> DataFrame:
    """Deterministic interval source for the gate: hours whose error
    count reaches ``threshold`` become incident windows [hour − 30 min,
    hour + 90 min) — deliberately misaligned with the hour band so the
    banding logic is actually exercised."""
    return (
        events.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
        .select(
            (F.col("h") - F.expr("INTERVAL 30 MINUTES")).alias("window_start"),
            (F.col("h") + F.expr("INTERVAL 90 MINUTES")).alias("window_end"),
        )
    )


def incident_event_counts_oracle(table: str = "events", threshold: int = 6) -> str:
    """The same computation as a plain inequality join in DuckDB (its
    optimizer handles the range join natively — IEJoin)."""
    return f"""
WITH e AS (
  SELECT date_trunc('microseconds', ts) AS ts, event_type FROM {table}
),
iv AS (
  SELECT date_trunc('hour', ts) - INTERVAL 30 MINUTE AS window_start,
         date_trunc('hour', ts) + INTERVAL 90 MINUTE AS window_end
  FROM e WHERE event_type = 'error'
  GROUP BY date_trunc('hour', ts) HAVING COUNT(*) >= {threshold}
)
SELECT iv.window_start, iv.window_end, CAST(COUNT(*) AS BIGINT) AS n_events
FROM iv JOIN e ON e.ts >= iv.window_start AND e.ts < iv.window_end
GROUP BY iv.window_start, iv.window_end
"""
