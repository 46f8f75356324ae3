"""As-of join: pinned tie/NULL/unmatched semantics on hand-built
frames, full cross-engine equality vs DuckDB's native ASOF JOIN, and
the shuffle budget of the union-merge plan."""

from __future__ import annotations

import datetime as dt

import pytest

from integritychecksforvldbs_spark.operators import temporal
from integritychecksforvldbs_spark.sources.bucketing import plan_data_shuffles


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tiny(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 00:00:00")),  # before any checkpoint
            (2, "a", _ts("2024-01-01 01:00:00")),  # exact tie with cp1
            (3, "a", _ts("2024-01-01 02:30:00")),  # between cp1 and cp2
            (4, "a", _ts("2024-01-01 09:00:00")),  # after cp2 (NULL payload)
            (5, "b", _ts("2024-01-01 05:00:00")),  # key with no checkpoints
        ],
        "fact_id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 01:00:00"), 10),
            ("a", _ts("2024-01-01 03:00:00"), None),  # NULL payload field
        ],
        "k string, ts timestamp, v int",
    )
    return left, right


def test_asof_pinned_semantics(tiny):
    left, right = tiny
    out = {
        r["fact_id"]: (r["asof_ts"], r["asof_v"])
        for r in temporal.asof_join(left, right, on="k").collect()
    }
    assert out[1] == (None, None)  # nothing at-or-before
    assert out[2] == (_ts("2024-01-01 01:00:00"), 10)  # inclusive tie
    assert out[3] == (_ts("2024-01-01 01:00:00"), 10)
    # latest checkpoint wins even though its payload field is NULL —
    # the struct carry must NOT fall back to the older checkpoint's v
    assert out[4] == (_ts("2024-01-01 03:00:00"), None)
    assert out[5] == (None, None)  # LEFT semantics for unmatched key


def test_asof_payload_collision_raises(tiny):
    left, right = tiny
    with pytest.raises(ValueError, match="collide"):
        temporal.asof_join(left, right.withColumnRenamed("v", "fact_id"), on="k")


def test_asof_enrich_matches_duckdb_asof(tables, duck):
    spark_rows = sorted(
        (
            r["event_id"],
            r["last_purchase_ts"],
            r["last_purchase_id"],
            r["last_purchase_value"],
        )
        for r in temporal.asof_enrich_purchases(tables["events"]).collect()
    )
    oracle_rows = sorted(
        (eid, cts, cid, cval)
        for eid, _u, _ts, _et, cts, cid, cval in duck.execute(
            temporal.asof_enrich_oracle()
        ).fetchall()
    )
    assert spark_rows == oracle_rows


def test_asof_shuffle_budget(tables):
    """Union-merge as-of = one shuffle for the merged window plus one
    for the checkpoint aggregation; anything more means the union is
    being re-partitioned."""
    assert plan_data_shuffles(temporal.asof_enrich_purchases(tables["events"])) <= 2


def test_banded_range_join_matches_inequality_join(tables, duck, spark):
    """The banded equi-join plan computes exactly what DuckDB's native
    inequality (IE) join computes — threshold 2 so sf0.001 yields a
    real interval set."""
    from integritychecksforvldbs_spark.operators.temporal import (
        banded_range_join_counts,
        error_incident_windows,
        incident_event_counts_oracle,
    )

    ev = tables["events"]
    got = sorted(
        (r["window_start"], r["window_end"], r["n_events"])
        for r in banded_range_join_counts(
            ev, error_incident_windows(ev, threshold=2)
        ).collect()
    )
    want = sorted(duck.execute(incident_event_counts_oracle(threshold=2)).fetchall())
    assert got and got == want


def test_banded_range_join_no_nested_loop(tables):
    """The whole point: the plan must be a hash/broadcast EQUI join on
    the band, never BroadcastNestedLoopJoin over the raw range
    predicate."""
    from integritychecksforvldbs_spark.operators.temporal import (
        banded_range_join_counts,
        error_incident_windows,
    )

    ev = tables["events"]
    plan = (
        banded_range_join_counts(ev, error_incident_windows(ev, threshold=2))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan
