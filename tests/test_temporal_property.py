"""Property-based as-of join cross-check: on random fact/checkpoint
sets, the union-merge asof_join must equal DuckDB's native ASOF JOIN —
including exact-tie timestamps, multiple checkpoints per instant
neighborhood, keys with no checkpoints, and NULL payload values, which
the fixture under-samples."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from integritychecksforvldbs_spark.operators import temporal

BASE = datetime(2024, 3, 1, 0, 0, 0)

# minute offsets drawn from multiples of 5 so fact/checkpoint TIES are
# likely; small key space so unmatched keys and dense keys both occur
_fact = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=24).map(lambda m: m * 5),
)
_checkpoint = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=24).map(lambda m: m * 5),
    st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    facts=st.lists(_fact, min_size=1, max_size=15),
    cps=st.lists(_checkpoint, max_size=10),
)
def test_asof_join_matches_duckdb_asof(spark, duck, facts, cps):
    fact_rows = [
        (i, k, BASE + timedelta(minutes=m)) for i, (k, m) in enumerate(facts)
    ]
    # dedupe checkpoints on (key, ts) — asof needs a keyed dim, and the
    # dedup rule (max value, None smallest) is applied on both sides
    cp_map: dict[tuple[int, datetime], int | None] = {}
    for k, m, v in cps:
        key = (k, BASE + timedelta(minutes=m))
        prev = cp_map.get(key, -1)
        cp_map[key] = max(prev if prev is not None else -1, v if v is not None else -1)
    cp_rows = [
        (k, ts, None if v == -1 else v) for (k, ts), v in sorted(cp_map.items())
    ]

    left = spark.createDataFrame(fact_rows, "fact_id long, k long, ts timestamp")
    right = spark.createDataFrame(cp_rows, "k long, ts timestamp, v int")
    got = {
        (r["fact_id"], r["asof_ts"], r["asof_v"])
        for r in temporal.asof_join(left, right, on="k").collect()
    }

    duck.execute("CREATE OR REPLACE TABLE facts(fact_id BIGINT, k BIGINT, ts TIMESTAMP)")
    duck.execute("CREATE OR REPLACE TABLE cp(k BIGINT, ts TIMESTAMP, v INT)")
    duck.executemany("INSERT INTO facts VALUES (?, ?, ?)", fact_rows)
    if cp_rows:
        duck.executemany("INSERT INTO cp VALUES (?, ?, ?)", cp_rows)
    want = {
        (f, cts, cv)
        for f, cts, cv in duck.execute(
            "SELECT f.fact_id, cp.ts, cp.v FROM facts f "
            "ASOF LEFT JOIN cp ON f.k = cp.k AND f.ts >= cp.ts"
        ).fetchall()
    }
    assert got == want
