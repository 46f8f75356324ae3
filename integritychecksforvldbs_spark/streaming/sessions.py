"""Sessionization — dynamic-gap session windows over event streams.

Extends the §2.10 streaming family (no reference analogue; the
reference is batch-only): user activity sessions with a 30-minute
inactivity gap are the canonical event-pipeline rollup, and Spark's
``session_window`` is the native operator — dynamic windows that
extend while events keep arriving within the gap and close when the
stream goes quiet.

Semantics pinned for the oracle (DuckDB gaps-and-islands with LAG),
verified against Spark's behavior (tests pin the boundary):

- an event exactly ``gap`` after its predecessor MERGES into the
  session (Spark extends a session whose expiry is ``last + gap``
  inclusively; only ``diff > gap`` starts a new one);
- ``session_end`` = last event time + gap (when the session would
  expire), so ``n_events`` and the window bounds fully describe it.

Scale: one hash-shuffle on the session key; Spark merges per-key
sorted runs into windows inside the aggregation (no per-event window
explosion as with tumbling windows); on a stream the watermark closes
sessions and evicts their state once event time passes
``last_event + gap + watermark``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP = "30 minutes"
_GAP_SQL = "INTERVAL 30 MINUTE"


def session_counts(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-key activity sessions: (key, session_start, session_end,
    n_events).  Batch frames give the exact result the oracle checks;
    streaming frames get a watermark so closed sessions emit and their
    state evicts."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.col(key_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def session_counts_oracle(table: str = "events", gap_sql: str = _GAP_SQL) -> str:
    """Identical sessionization in DuckDB: LAG flags a session break at
    ``diff > gap`` (exactly-gap merges, matching Spark), a running SUM
    numbers the islands, MIN/MAX aggregate the bounds.  ``ts`` is
    truncated to microseconds first so both engines segment the same
    values (the fixture parquet is nanosecond; Spark reads it at µs)."""
    return f"""
WITH e AS (
  SELECT user_id, date_trunc('microseconds', ts) AS ts FROM {table}
),
m AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > {gap_sql} THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + {gap_sql} AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s
GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# sliding (hopping) windows
# ---------------------------------------------------------------------------

def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Hopping-window event counts: every event contributes to
    ``window/slide`` overlapping windows (4 at the defaults) — the
    smoothing rollup dashboards read.  Spark's ``window(ts, w, s)``
    expands each row to its windows BEFORE the aggregation, so the
    map-side partial combine absorbs the 4× fan-out exactly like the
    profiling kernel's Expand; the shuffle carries only per-window
    partial counts.  Batch frames give the exact oracle-checked
    result; streams get a watermark to bound state."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def sliding_counts_oracle(
    table: str = "events",
    window_s: int = 3600,
    slide_s: int = 900,
) -> str:
    """Identical hopping windows in DuckDB via epoch arithmetic: floor
    the event time to the slide grid (Spark windows are epoch-aligned),
    then each k in [0, window/slide) shifts one slide back — integer
    microsecond math, no FP."""
    n = window_s // slide_s
    slide_us = slide_s * 1_000_000
    return f"""
SELECT make_timestamp((epoch_us(ts) // {slide_us} - k) * {slide_us}) AS window_start,
       make_timestamp((epoch_us(ts) // {slide_us} - k) * {slide_us}) + INTERVAL {window_s} SECOND AS window_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM {table} CROSS JOIN (SELECT unnest(range(0, {n})) AS k)
GROUP BY 1, 2
"""
