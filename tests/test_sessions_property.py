"""Property-based sessionization cross-check: on random event sets,
Spark's session_window segmentation must equal the DuckDB
gaps-and-islands oracle — including exact-gap boundaries, duplicate
timestamps, and single-event users, which fixed fixtures under-sample."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from integritychecksforvldbs_spark.streaming import sessions

BASE = datetime(2024, 3, 1, 0, 0, 0)

# minutes offsets drawn so exact-gap (30) differences are LIKELY:
# multiples of 10 collide with the gap boundary often
_event = st.tuples(
    st.integers(min_value=1, max_value=3),  # user_id
    st.integers(min_value=0, max_value=24).map(lambda m: m * 10),  # minute
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(_event, min_size=1, max_size=20))
def test_sessionization_matches_duckdb_oracle(spark, duck, events):
    rows = [(u, BASE + timedelta(minutes=m)) for u, m in events]
    sdf = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessions.session_counts(sdf).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE ev(user_id BIGINT, ts TIMESTAMP)")
    duck.executemany("INSERT INTO ev VALUES (?, ?)", rows)
    want = {
        (u, s, e, int(n))
        for u, s, e, n in duck.execute(
            sessions.session_counts_oracle("ev")
        ).fetchall()
    }
    assert got == want
