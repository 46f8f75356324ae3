"""Structured Streaming freshness / late-data checks on event tables.

The reference is batch-only (SURVEY §2.10) — this is the north-star
streaming extension (BASELINE.json): the checks a pipeline runs on a
continuously-arriving event table.  Every streaming kernel has a
batch-equivalent (same transformation applied to a batch DataFrame),
which is what the correctness gate verifies against DuckDB; the
streaming path itself (file source → watermark → windowed agg →
sink) is exercised in tests with ``availableNow`` triggers.

Kernels:

- **hourly_counts** — tumbling event-time windows per event_type with
  a watermark for state eviction; the freshness dashboard query.
- **freshness_summary** — per event_type: latest event time and lag
  against a reference instant; ``stale`` flag when the lag exceeds a
  threshold.
- **late_event_counts** — events arriving with event time older than
  (max event time − allowed lateness): the batch analogue of rows a
  watermark would drop.
- **running_max_state** — ``applyInPandasWithState`` per-key running
  maximum event time: the custom-stateful-operator template
  (GroupState timeout/eviction wired, deterministic output).
- **dedup_stream** — exactly-once event dedup across micro-batches
  (watermarked ``dropDuplicates`` state), the at-least-once-source
  re-delivery suppressor.

Scale: windowed aggs shuffle on (window, event_type) — low
cardinality; the watermark bounds state size; file-source streaming
reads parquet incrementally with the same pushdown as batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from integritychecksforvldbs_spark.functions.timeutil import us_epoch_sql

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # fixture physical type: timestamp[us] without UTC adjustment
        # (TIMESTAMP_NTZ to Spark ≥3.4); cast to TIMESTAMP post-read
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of events parquet files,
    normalized to one TIMESTAMP type exactly like the batch loader
    (sources/loader.py): the fixture's naive-µs ``ts`` reads as
    TIMESTAMP_NTZ and is cast to TIMESTAMP under the pinned-UTC
    session."""
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def hourly_counts(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window event counts (streaming or batch input).

    On a stream the watermark bounds agg state and drops rows later
    than it; on a batch frame it is a no-op, giving the exact
    batch-equivalent the oracle checks.
    """
    streaming = events.isStreaming
    if not streaming:
        # batch: group directly on window(ts, W).start — Catalyst
        # simplifies the struct extraction, so the grouping key is the
        # 8-byte start timestamp instead of the 16-byte (start, end)
        # struct and the end-of-window half is never computed; both
        # exchanges of the distinct-agg expansion shuffle the narrower
        # key.  Same rows as grouping on the struct: a tumbling window
        # is uniquely identified by its start.
        return (
            events.groupBy(
                F.window("ts", window).getField("start").alias("window_start"),
                "event_type",
            )
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
            )
        )
    events = events.withWatermark("ts", watermark)
    # exact distinct is unsupported in streaming aggs → HLL there,
    # exact in the batch-equivalent the oracle checks; the streaming
    # agg keeps the full window struct (the state/watermark key)
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.approx_count_distinct("user_id").cast("long").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


def hourly_counts_oracle(table: str = "events") -> str:
    return f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM {table}
GROUP BY date_trunc('hour', ts), event_type
"""


def freshness_summary(events: DataFrame, as_of: str) -> DataFrame:
    """Per event_type: latest event time, lag vs ``as_of`` (seconds),
    stale flag at >1h.  ``as_of`` is an explicit reference instant
    ('YYYY-MM-DD HH:MM:SS') — deterministic and oracle-checkable; a
    live deployment passes now()."""
    return (
        events.groupBy("event_type")
        .agg(F.max("ts").alias("latest_ts"))
        .select(
            "event_type",
            "latest_ts",
            # explicit epoch-µs arithmetic: timestampdiff/date_diff
            # disagree across engines on sub-second boundaries
            F.expr(
                f"(unix_micros(TIMESTAMP '{as_of}') - {us_epoch_sql('latest_ts')}) div 1000000"
            ).alias("lag_seconds"),
            F.expr(
                f"(unix_micros(TIMESTAMP '{as_of}') - {us_epoch_sql('latest_ts')}) div 1000000 > 3600"
            ).alias("stale"),
        )
    )


def freshness_summary_oracle(as_of: str, table: str = "events") -> str:
    return f"""
SELECT event_type, MAX(ts) AS latest_ts,
       (epoch_us(TIMESTAMP '{as_of}') - epoch_us(MAX(ts))) // 1000000 AS lag_seconds,
       (epoch_us(TIMESTAMP '{as_of}') - epoch_us(MAX(ts))) // 1000000 > 3600 AS stale
FROM {table} GROUP BY event_type
"""


def late_event_counts(events: DataFrame, lateness: str = "1 hour") -> DataFrame:
    """Events older than (global max event time − lateness): exactly
    the rows a watermark of ``lateness`` would have dropped had they
    arrived last.  Batch probe for late-data volume per event_type."""
    mx = events.agg(F.max("ts").alias("mx"))
    return (
        events.crossJoin(F.broadcast(mx))
        .filter(F.expr(f"ts < mx - INTERVAL {lateness}"))
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_late"))
    )


def late_event_counts_oracle(table: str = "events", lateness_sql: str = "1 HOUR") -> str:
    return f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_late
FROM {table}, (SELECT MAX(ts) AS mx FROM {table})
WHERE ts < mx - INTERVAL {lateness_sql}
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

RUNNING_MAX_SCHEMA = "event_type string, latest_us long, n_seen long"
_STATE_SCHEMA = "latest_us long, n_seen long"


def running_max_state(events: DataFrame) -> DataFrame:
    """Per-event_type running max(ts) + count, maintained in GroupState
    across micro-batches — the template for custom stateful streaming
    operators the built-in aggs can't express (e.g. session carry-over,
    decaying counters).  Streaming input only (applyInPandasWithState
    is a streaming API); each micro-batch emits the updated state row
    per key seen in that batch.  State holds primitives (epoch µs) —
    timestamps don't survive the state serializer portably."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        mx = None  # epoch microseconds
        n = 0
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["ts"].max().value // 1000)
                mx = m if mx is None else max(mx, m)
                n += len(pdf)
        if state.exists:
            (prev_us, prev_n) = state.get
            if mx is None or (prev_us is not None and prev_us > mx):
                mx = prev_us
            n += prev_n
        state.update((mx, n))
        yield pd.DataFrame(
            {"event_type": [key[0]], "latest_us": [mx], "n_seen": [n]}
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=RUNNING_MAX_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    events: DataFrame,
    id_col: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once event dedup: the first arrival of each id passes,
    re-deliveries (at-least-once sources replaying files/offsets) are
    dropped — including across micro-batches, because the id set is
    streaming state.  The watermark bounds that state via
    ``dropDuplicatesWithinWatermark``: an id's entry is evicted once
    the watermark passes its event time + delay, so state is O(ids
    per watermark window), not O(all ids ever).  (Plain
    ``dropDuplicates`` on a key subset that EXCLUDES the event-time
    column never evicts, watermark or not — the unbounded-state trap
    this helper exists to avoid; dedup is only guaranteed for
    re-deliveries arriving within the watermark delay, which is the
    at-least-once-source replay window by construction.)

    Batch frames get plain ``dropDuplicates`` — the batch-equivalent
    the tests compare against.
    """
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark([id_col])
    return events.dropDuplicates([id_col])
