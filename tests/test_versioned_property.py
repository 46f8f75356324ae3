"""Model-based property test: a random sequence of versioned-table
operations must always agree with a trivial in-memory model — the
whole-format invariant (manifest resolution, snapshot isolation,
rollback-as-new-commit) under arbitrary interleavings."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned

# op := ("append", lo) | ("overwrite", lo) | ("rollback", k) — k picks
# one of the versions committed so far (modulo), lo a small row range
OPS = st.lists(
    st.tuples(
        st.sampled_from(["append", "overwrite", "rollback"]),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=1,
    max_size=6,
)


@pytest.fixture(scope="module")
def vspark(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_random_op_sequences_match_model(vspark, tmp_path_factory, ops):
    spark = vspark
    path = str(tmp_path_factory.mktemp("vprop") / "tbl")
    model: list[frozenset[int]] = []  # model[v-1] = visible row set at v

    def rows(lo):
        return frozenset(range(lo * 10, lo * 10 + 3))

    def df(lo):
        return spark.range(lo * 10, lo * 10 + 3).select(
            F.col("id").alias("k")
        )

    for op, arg in ops:
        if op == "append" or not model:
            versioned.commit(spark, df(arg), path, mode="append")
            prev = model[-1] if model else frozenset()
            model.append(prev | rows(arg))
        elif op == "overwrite":
            versioned.commit(spark, df(arg), path, mode="overwrite")
            model.append(rows(arg))
        else:  # rollback to an existing version
            target = (arg % len(model)) + 1
            versioned.rollback(spark, path, target)
            model.append(model[target - 1])

    # every version in history answers its model state — time travel
    # never drifts, no matter the op interleaving
    hist = versioned.history(path)
    assert [h.version for h in hist] == list(range(1, len(model) + 1))
    for v, want in enumerate(model, start=1):
        got = {
            r["k"] for r in versioned.read(spark, path, version=v).collect()
        }
        assert got == set(want), f"v{v} diverged"
    latest = {r["k"] for r in versioned.read(spark, path).collect()}
    assert latest == set(model[-1])
