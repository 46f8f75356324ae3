"""Stream-stream interval join: purchase→click attribution.

The one Structured Streaming operator family the freshness/session
tiers don't exercise — joining two UNBOUNDED sides.  Spark can only do
this with watermarks on both sides plus a time-range join condition:
the range bound tells the state store how long a buffered row can
still find partners, so each side's state is bounded by
watermark + window instead of growing forever (the batch analogue is
the banded range join in operators/temporal.py, which buckets instead
of buffering).

The same function body serves batch frames (exact, oracle-checked)
and streams (watermarked) — the construction every kernel in
streaming/ follows, so the correctness gate pins the semantics and
the streaming test only has to show stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.functions.timeutil import us_epoch


def purchase_attribution(
    events: DataFrame,
    window: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Each purchase joined to the same user's click events in the
    preceding ``window``: (purchase_id, user_id, purchase_ts,
    click_id, click_ts, lag_seconds) — last-touch attribution's input
    relation.

    ``how='left_outer'`` keeps purchases with NO qualifying click
    (NULL click columns) — on a stream the null row is emitted once
    the watermark proves no matching click can still arrive, which is
    exactly the state-cleanup bound the range condition establishes.

    Streaming input → a watermarked stream-stream inner join (state
    bounded: a click can be dropped once the purchase-side watermark
    passes click_ts + window); batch input → the identical interval
    join, which is what the DuckDB oracle checks.

    Scale shape: one hash shuffle of each side on ``user_id``; the
    time-range predicate is evaluated within the joined partitions.
    A hot user (millions of events) skews the partition — AQE's skew
    split covers batch; for streams, key salting before the join is
    the standard remedy and composes with this plan.
    """
    streaming = events.isStreaming
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    if streaming:
        p = p.withWatermark("purchase_ts", watermark)
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (p["user_id"] == c["click_user"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {window}"))
    )
    return p.join(c, cond, how).select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        # integer µs→s division on BOTH engines: `/` would round via
        # double cast in DuckDB but truncate in Spark
        ((us_epoch("purchase_ts") - us_epoch("click_ts")).cast("long"))
        .alias("_lag_us"),
    ).select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        F.expr("_lag_us div 1000000").alias("lag_seconds"),
    )


def purchase_attribution_oracle(
    table: str = "events", window_sql: str = "30 MINUTE", how: str = "inner"
) -> str:
    join_kw = "LEFT JOIN" if how == "left_outer" else "JOIN"
    return f"""
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       c.event_id AS click_id, c.ts AS click_ts,
       CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT) AS lag_seconds
FROM (SELECT * FROM {table} WHERE event_type = 'purchase') p
{join_kw} (SELECT * FROM {table} WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL {window_sql}
"""
