"""Event analytics kernels (operators/analytics.py): brute-force
parity on a hand-built stream, NULL handling, plan shape."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import analytics

ROWS = [
    # week 1 (2024-01-01 Mon): users 1,2 view; user 1 buys
    (datetime(2024, 1, 1, 10), 1, "view"),
    (datetime(2024, 1, 2, 10), 2, "view"),
    (datetime(2024, 1, 3, 10), 1, "buy"),
    # week 2: user 1 returns for view; user 3 starts
    (datetime(2024, 1, 8, 10), 1, "view"),
    (datetime(2024, 1, 9, 10), 3, "view"),
    # week 4: user 2 returns
    (datetime(2024, 1, 22, 10), 2, "view"),
    # contamination
    (datetime(2024, 1, 2, 11), None, "view"),
    (datetime(2024, 1, 2, 12), 9, None),
]
SCHEMA = "ts timestamp, user_id long, event_type string"


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_retention_cohorts_matrix(ev):
    got = {
        (r["event_type"], str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in analytics.retention_cohorts(ev).collect()
    }
    assert got == {
        ("view", "2024-01-01", 0): 2,   # users 1,2 week 1
        ("view", "2024-01-01", 1): 1,   # user 1 returns
        ("view", "2024-01-01", 3): 1,   # user 2 returns week 4
        ("view", "2024-01-08", 0): 1,   # user 3 cohort
        ("buy", "2024-01-01", 0): 1,
    }


def test_rolling_active_users_exact(ev):
    got = {
        str(r["day"]): r["active_users"]
        for r in analytics.rolling_active_users(ev, window_days=7).collect()
    }
    # brute-force reference
    days_users = {}
    for ts, u, _t in ROWS:
        if u is None:
            continue
        days_users.setdefault(ts.date(), set()).add(u)
    want = {}
    for d in days_users:
        active = set()
        for d2, us in days_users.items():
            if 0 <= (d - d2).days < 7:
                active |= us
        want[str(d)] = len(active)
    assert got == want


def test_volume_anomalies_flags_spike(spark):
    rows = [(datetime(2024, 1, 1, h), 1, "view") for h in range(20)]
    rows += [(datetime(2024, 1, 1, 21, m), 1, "view") for m in range(40)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = analytics.volume_anomalies(df, threshold=3.0).collect()
    flagged = [str(r["hour"]) for r in out if r["is_anomaly"]]
    assert flagged == ["2024-01-01 21:00:00"]
    # z column rounded, stable
    z_by_hour = {str(r["hour"]): r["z"] for r in out}
    assert z_by_hour["2024-01-01 21:00:00"] > 3


def test_null_types_excluded_everywhere(ev):
    ret = analytics.retention_cohorts(ev).collect()
    assert all(r["event_type"] is not None for r in ret)
    anom = analytics.volume_anomalies(ev).collect()
    assert all(r["event_type"] is not None for r in anom)


def _funnel(spark, rows, steps=("view", "click", "purchase")):
    from integritychecksforvldbs_spark.operators.analytics import (
        conversion_funnel,
    )

    df = spark.createDataFrame(
        [(u, f"2024-01-01 00:00:{s:02d}", t) for u, s, t in rows],
        "user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = conversion_funnel(df, list(steps), buckets=1)
    return {r["step"]: r["n_users"] for r in out.collect()}


def test_conversion_funnel_strict_order(spark):
    # u1 converts fully; u2 clicks BEFORE viewing (click not counted,
    # so no purchase chain either); u3 stops at click
    rows = [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        (2, 0, "click"), (2, 1, "view"), (2, 2, "purchase"),
        (3, 0, "view"), (3, 1, "click"),
    ]
    got = _funnel(spark, rows)
    # u2: view@1 then purchase@2 but no click after the view
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_conversion_funnel_tie_is_not_progression(spark):
    # click at the SAME second as the view: strictly-later fails
    rows = [(1, 0, "view"), (1, 0, "click")]
    got = _funnel(spark, rows)
    assert got == {"view": 1}


def test_conversion_funnel_earliest_qualifying_wins(spark):
    # two clicks after the view; the purchase lands between them —
    # the EARLIER click anchors, so the purchase converts
    rows = [
        (1, 0, "view"), (1, 1, "click"), (1, 3, "click"),
        (1, 2, "purchase"),
    ]
    got = _funnel(spark, rows)
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_conversion_funnel_rejects_duplicate_steps(spark):
    from integritychecksforvldbs_spark.operators.analytics import (
        conversion_funnel,
    )

    df = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    with pytest.raises(ValueError):
        conversion_funnel(df, ["view", "click", "view"])


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------

SESS_ROWS = [
    # user 1: three events 10 min apart (one session), then a 2-hour
    # gap (second session of one event)
    (1, datetime(2024, 1, 1, 10, 0), 10, 1.0),
    (2, datetime(2024, 1, 1, 10, 10), 10, 2.0),
    (3, datetime(2024, 1, 1, 10, 20), 10, 3.0),
    (4, datetime(2024, 1, 1, 12, 30), 10, 4.0),
    # user 2: exactly at the gap boundary (30 min) — NOT a new session
    # (strictly-greater starts one, matching streaming/sessions.py)
    (5, datetime(2024, 1, 1, 9, 0), 20, 1.0),
    (6, datetime(2024, 1, 1, 9, 30), 20, 1.0),
    # user 2: one microsecond past the gap — new session
    (7, datetime(2024, 1, 1, 10, 0, 0, 1), 20, 1.0),
    # contamination: NULL user excluded
    (8, datetime(2024, 1, 1, 10, 0), None, 9.0),
]
SESS_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


@pytest.fixture(scope="module")
def sess_ev(spark):
    return spark.createDataFrame(SESS_ROWS, SESS_SCHEMA)


def test_sessionize_gap_boundaries(sess_ev):
    got = {
        (r["user_id"], r["session_seq"]): r
        for r in analytics.sessionize(sess_ev, gap_minutes=30).collect()
    }
    assert set(got) == {(10, 1), (10, 2), (20, 1), (20, 2)}
    s11 = got[(10, 1)]
    assert s11["n_events"] == 3
    assert s11["duration_us"] == 20 * 60 * 1_000_000
    assert s11["value_cents"] == 600
    assert got[(10, 2)]["n_events"] == 1
    assert got[(10, 2)]["duration_us"] == 0
    # the exactly-30-min event stays in session 1; the +1us event opens
    # session 2
    assert got[(20, 1)]["n_events"] == 2
    assert got[(20, 2)]["n_events"] == 1


def test_sessionize_ts_tie_breaks_on_event_id(spark):
    # two same-ts events after a big gap: the lower event_id carries
    # the session-start flag in both engines (both windows order by
    # (ts, event_id)), so the rollup is identical either way — pin
    # that the pair lands in ONE session together
    rows = [
        (1, datetime(2024, 1, 1, 8, 0), 7, 1.0),
        (2, datetime(2024, 1, 1, 12, 0), 7, 1.0),
        (3, datetime(2024, 1, 1, 12, 0), 7, 1.0),
    ]
    df = spark.createDataFrame(rows, SESS_SCHEMA)
    out = analytics.sessionize(df, gap_minutes=30).collect()
    assert sorted((r["session_seq"], r["n_events"]) for r in out) == [(1, 1), (2, 2)]


def test_sessionize_single_shuffle_plan(sess_ev):
    # one exchange serves lag + running-sum + the session rollup: the
    # groupBy keys are a prefix-extension of the window partition key,
    # so Catalyst plans exactly one hashpartitioning exchange
    plan = analytics.sessionize(sess_ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_rolling_active_hll_matches_exact_at_fixture_scale(ev):
    """At fixture cardinalities HLL's sparse mode is exact, so the
    sketch tier must reproduce the exact tier outright; at scale the
    contract relaxes to the sketch's standard-error envelope."""
    exact = {
        r["day"]: r["active_users"]
        for r in analytics.rolling_active_users(ev, window_days=7).collect()
    }
    est = {
        r["day"]: r["active_users_est"]
        for r in analytics.rolling_active_users_hll(ev, window_days=7).collect()
    }
    assert set(est) == set(exact)
    assert all(est[d] == exact[d] for d in exact)


def test_rolling_active_hll_daily_preagg_is_mergeable(spark):
    # 600 users over two days with 200 overlapping: the union across
    # per-day sketches must count the distinct union, not the sum
    rows = [
        (datetime(2024, 3, 1, 10), u, "view") for u in range(400)
    ] + [
        (datetime(2024, 3, 2, 10), u, "view") for u in range(200, 600)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["day"]: r["active_users_est"]
        for r in analytics.rolling_active_users_hll(df, window_days=7).collect()
    }
    import datetime as _dt

    # lgk=12 leaves sparse mode by a few hundred distincts — allow the
    # sketch's ~2% envelope, but the union must sit near 600 (the
    # distinct union), nowhere near 800 (the naive sum)
    assert abs(got[_dt.date(2024, 3, 1)] - 400) <= 8
    assert abs(got[_dt.date(2024, 3, 2)] - 600) <= 12


def test_sessionize_agrees_with_native_session_window(sess_ev):
    """Batch backfill parity: the lag+running-sum formulation must
    reproduce Spark's native session_window boundaries exactly —
    same starts, same event counts, streaming end = last event + gap."""
    from integritychecksforvldbs_spark.streaming import sessions

    batch = {
        (r["user_id"], r["session_start"]): r
        for r in analytics.sessionize(sess_ev, gap_minutes=30).collect()
    }
    native = {
        (r["user_id"], r["session_start"]): r
        for r in sessions.session_counts(
            sess_ev.filter(F.col("user_id").isNotNull()),
            gap="30 minutes",
            key_col="user_id",
        ).collect()
    }
    assert set(batch) == set(native)
    for k, b in batch.items():
        n = native[k]
        assert b["n_events"] == n["n_events"]
        assert (n["session_end"] - b["session_end"]).total_seconds() == 30 * 60
