"""Event-analytics kernels over the activity stream (north star
extension): the aggregate health/engagement views an operations team
derives from the same events table the freshness and session kernels
consume.

All exact, all DuckDB-oracle-matched:

- **retention_cohorts** — per event_type, users cohorted by their
  first active week; distinct-user counts per (cohort_week,
  week_offset).  The classic triangle retention matrix.
- **rolling_active_users** — trailing-N-day distinct users per day
  (DAU/WAU family).  Exact rolling COUNT DISTINCT has no windowed
  form in either engine; the scalable shape is dedup to (user, day)
  → banded join against the (calendar-bounded, broadcastable) day
  list → one count-distinct aggregation.  Expansion is |user-days| ×
  window, not events × window.
- **volume_anomalies** — per-hour event counts z-scored against that
  event_type's own mean/stddev; |z| > threshold flags volume spikes
  and droughts.  z is ROUNDed so the two engines' stddev
  accumulation order cannot flip the value hash.

NULL user_id / event_type rows (expected contamination in this
fixture) are excluded explicitly and identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(event_type, cohort_week, week_offset, n_users) — distinct
    users from each first-week cohort active again ``week_offset``
    weeks later.

    Plan: dedup to (type, user, week) with one map-side-combined
    aggregate, derive each user's cohort week (second aggregate),
    join back (AQE broadcasts the cohort side when small), count.
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    uw = (
        events.filter(F.col(user_col).isNotNull() & F.col(type_col).isNotNull())
        .select(F.col(type_col).alias("event_type"),
                F.col(user_col).alias("user_id"), wk.alias("week"))
        .distinct()
    )
    cohort = uw.groupBy("event_type", "user_id").agg(
        F.min("week").alias("cohort_week")
    )
    return (
        uw.join(cohort, ["event_type", "user_id"])
        .groupBy(
            "event_type",
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("long").alias(
                "week_offset"
            ),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


def retention_cohorts_oracle(table: str = "events") -> str:
    return f"""
WITH uw AS (
  SELECT DISTINCT event_type, user_id,
         CAST(date_trunc('week', ts) AS DATE) AS week
  FROM {table}
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
cohort AS (
  SELECT event_type, user_id, MIN(week) AS cohort_week
  FROM uw GROUP BY event_type, user_id
)
SELECT uw.event_type, cohort_week,
       CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_users
FROM uw JOIN cohort USING (event_type, user_id)
GROUP BY 1, 2, 3
"""


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """(day, active_users): distinct users active in the trailing
    ``window_days`` ending at each observed day."""
    ud = (
        events.filter(F.col(user_col).isNotNull())
        .select(F.to_date(ts_col).alias("day"),
                F.col(user_col).alias("user_id"))
        .distinct()
    )
    days = ud.select("day").distinct()
    j = F.broadcast(days.withColumnRenamed("day", "as_of")).join(
        ud,
        (F.col("day") <= F.col("as_of"))
        & (F.col("day") > F.date_sub(F.col("as_of"), window_days)),
    )
    return (
        j.groupBy(F.col("as_of").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("active_users"))
    )


def rolling_active_users_oracle(
    table: str = "events", window_days: int = 7
) -> str:
    return f"""
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
  FROM {table} WHERE user_id IS NOT NULL
),
days AS (SELECT DISTINCT day AS as_of FROM ud)
SELECT as_of AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
FROM days JOIN ud
  ON ud.day <= days.as_of AND ud.day > days.as_of - INTERVAL {window_days} DAY
GROUP BY 1
"""


def volume_anomalies(
    events: DataFrame,
    threshold: float = 3.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_to: int = 4,
) -> DataFrame:
    """(event_type, hour, n_events, z, is_anomaly): each hour's count
    z-scored against its event_type's mean/stddev over all observed
    hours.  One narrow aggregate per grain; the per-type stats are a
    |types|-row window (no second scan)."""
    from pyspark.sql import Window

    hourly = (
        events.filter(F.col(type_col).isNotNull())
        .groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = Window.partitionBy("event_type")
    sd = F.stddev_samp("n_events").over(w)
    # zero/undefined variance (uniform or single-hour types) → z NULL,
    # not anomalous; an unguarded division is an ANSI-mode
    # DIVIDE_BY_ZERO error
    z = F.when(
        sd > 0, (F.col("n_events") - F.avg("n_events").over(w)) / sd
    )
    return hourly.select(
        "event_type",
        "hour",
        "n_events",
        F.round(z, round_to).alias("z"),
        F.coalesce(
            F.abs(F.round(z, round_to)) > F.lit(threshold), F.lit(False)
        ).alias("is_anomaly"),
    )


def volume_anomalies_oracle(
    table: str = "events", threshold: float = 3.0, round_to: int = 4
) -> str:
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM {table} WHERE event_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, hour, n_events, z,
       COALESCE(abs(z) > {threshold}, FALSE) AS is_anomaly
FROM (
  SELECT event_type, hour, n_events,
         CASE WHEN STDDEV_SAMP(n_events) OVER (PARTITION BY event_type) > 0
              THEN ROUND(
                (n_events - AVG(n_events) OVER (PARTITION BY event_type))
                / STDDEV_SAMP(n_events) OVER (PARTITION BY event_type),
                {round_to})
         END AS z
  FROM hourly
)
"""


def conversion_funnel(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    buckets: int = 8,
) -> DataFrame:
    """Strict-progression conversion funnel: per user, step i counts
    as reached only by an event of type ``steps[i]`` STRICTLY LATER
    than the time step i-1 was reached (earliest qualifying event
    wins).  Returns (step_idx, step, bucket, n_users) — distinct
    users reaching each step, split over ``user_id % buckets`` so the
    result carries per-cohort signal, not three scalars.

    Strict ordering makes the fold deterministic under timestamp
    ties: a candidate must be strictly later than its predecessor, so
    it is always scanned after the predecessor's slot is set, and the
    result equals the sequential min-chain (the oracle's k CTEs)
    regardless of tie-breaking within a timestamp.

    Scale shape: events are filtered to the step types BEFORE the one
    groupBy, so the per-user array holds only funnel-relevant events;
    the fold over the sorted array is row-local (no per-step
    self-join chain, whose k shuffles this replaces).  The funnel
    report is a |steps|×|buckets|-row aggregate."""
    if len(steps) != len(set(steps)):
        # duplicate step types would let one event's scan fill two
        # slots in ways the min-chain oracle cannot express
        raise ValueError(f"steps must be distinct, got {steps}")
    steps_sql = ", ".join("'" + s.replace("'", "''") + "'" for s in steps)
    k = len(steps)
    per_user = (
        events.filter(
            F.col(user_col).isNotNull()
            & F.col(type_col).isin(list(steps))
        )
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.expr(
                f"""
            aggregate(
              array_sort(collect_list(struct({ts_col} AS ts,
                                             {type_col} AS et))),
              CAST(array_repeat(NULL, {k}) AS array<timestamp>),
              (acc, e) -> transform(acc, (x, i) ->
                CASE
                  WHEN x IS NOT NULL THEN x
                  WHEN e.et = element_at(array({steps_sql}), i + 1)
                       AND (i = 0 OR (element_at(acc, i) IS NOT NULL
                                      AND e.ts > element_at(acc, i)))
                  THEN e.ts
                END))
            """
            ).alias("times")
        )
    )
    step_map = F.array(*[F.lit(s) for s in steps])
    reached = per_user.select(
        "user_id",
        F.posexplode("times").alias("step_idx", "t"),
    ).filter(F.col("t").isNotNull())
    return (
        reached.groupBy(
            F.col("step_idx").cast("long").alias("step_idx"),
            (F.col("user_id") % buckets).cast("long").alias("bucket"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .withColumn(
            "step", F.element_at(step_map, F.col("step_idx").cast("int") + 1)
        )
        .select("step_idx", "step", "bucket", "n_users")
    )


def conversion_funnel_oracle(
    steps: list[str], table: str = "events", buckets: int = 8
) -> str:
    """Sequential min-chain: step i's time = MIN event of its type
    strictly after step i-1's time — k CTEs, one per step."""
    ctes = []
    for i, s in enumerate(steps):
        sq = s.replace("'", "''")
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT user_id, MIN(ts) AS t0 FROM {table} "
                f"WHERE event_type = '{sq}' AND user_id IS NOT NULL "
                f"GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, MIN(e.ts) AS t{i} "
                f"FROM {table} e JOIN s{i - 1} p ON e.user_id = p.user_id "
                f"WHERE e.event_type = '{sq}' AND e.ts > p.t{i - 1} "
                f"GROUP BY e.user_id)"
            )
    selects = []
    for i, s in enumerate(steps):
        sq = s.replace("'", "''")
        selects.append(
            f"SELECT CAST({i} AS BIGINT) AS step_idx, '{sq}' AS step, "
            f"CAST(user_id % {buckets} AS BIGINT) AS bucket, "
            f"CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            f"FROM s{i} GROUP BY user_id % {buckets}"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based batch sessionization: one row per (user, session)
    with start/end, event count, duration, and value total.

    A new session starts at a user's first event and whenever the gap
    since their previous event exceeds ``gap_minutes``; the session
    sequence number is the running sum of those start flags — the
    classic lag + cumulative-sum formulation, mirroring the streaming
    session kernel (streaming/sessions.py) so batch backfill and live
    sessionization agree on boundaries (gap strictly greater than the
    threshold starts a new session in both).

    Scale shape: ONE shuffle on ``user_col`` serves both windows (lag
    and running sum share the partition+order), then the groupBy on
    (user, session_seq) is partition-local — Catalyst sees the child
    ordering and plans no second exchange.  Value totals are summed
    in integer cents so the two engines' accumulation order cannot
    flip the hash.  NULL users and NULL timestamps are excluded
    identically in both engines (a NULL ts would otherwise sort
    NULLS FIRST in Spark but NULLS LAST in DuckDB and drift the
    running sum).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = (
        events.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn(
            "_new_session",
            F.when(
                F.unix_micros(F.col(ts_col))
                - F.unix_micros(F.lag(ts_col).over(w))
                > gap_us,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "session_seq",
            F.sum("_new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            + F.lit(1),
        )
    )
    return (
        flagged.groupBy(
            F.col(user_col).alias("user_id"), F.col("session_seq").alias("session_seq")
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (
                F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
            ).cast("long").alias("duration_us"),
            F.sum(
                F.expr(f"CAST(round({value_col} * 100) AS BIGINT)")
            ).cast("long").alias("value_cents"),
        )
    )


def sessionize_oracle(table: str = "events", gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {gap_us}
              THEN 1 ELSE 0 END AS new_session
  FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
seq AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) + 1
              AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM seq GROUP BY user_id, session_seq
"""


def rolling_active_users_hll(
    events: DataFrame,
    window_days: int = 7,
    lgk: int = 12,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Sketch tier of :func:`rolling_active_users`: (day,
    active_users_est) via mergeable HLL sketches (Spark's built-in
    Apache DataSketches aggregates).

    The exact tier expands to |user-days| × window rows before its
    count-distinct — fine while user-days fit a shuffle, but DAU over
    a 100 TB event log carries the full id universe through every
    trailing window.  The sketch tier collapses each day to ONE
    ~2^lgk-byte HLL first (map-side combinable), so the banded
    trailing-window join moves |days| × window sketch rows —
    kilobytes per day regardless of user count — and the union+
    estimate is a |days|-group aggregate.  This is also the only tier
    that supports pre-aggregation: per-day sketches can be persisted
    once and re-windowed (7/28/90-day) without touching raw events.

    Rows-only contract (DuckDB has no compatible HLL): the error
    envelope vs the exact tier is pinned by pytest instead — at HLL's
    small-cardinality range the sparse representation is exact, so
    fixture-scale estimates equal the exact counts outright.
    """
    daily = (
        events.filter(F.col(user_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("day"))
        .agg(F.expr(f"hll_sketch_agg({user_col}, {lgk})").alias("sk"))
    )
    days = daily.select(F.col("day").alias("as_of"))
    return (
        F.broadcast(days)
        .join(
            daily,
            (F.col("day") <= F.col("as_of"))
            & (F.col("day") > F.date_sub(F.col("as_of"), window_days)),
        )
        .groupBy(F.col("as_of").alias("day"))
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk, true))")
            .cast("long")
            .alias("active_users_est")
        )
    )
