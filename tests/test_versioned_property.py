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


# --- r9: merge-on-read DML random walk -------------------------------

# op := (verb, arg, strategy) — strategy exercises copy-on-write and
# deletion-vector paths interchangeably; the model never knows which
# physical form a commit took, which IS the merge-on-read contract
DML_OPS = st.lists(
    st.tuples(
        st.sampled_from(["append", "delete", "update", "merge", "rollback", "compact"]),
        st.integers(min_value=0, max_value=4),
        st.sampled_from(["auto", "dv", "copy"]),
    ),
    min_size=2,
    max_size=7,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=DML_OPS)
def test_random_dml_walk_matches_model_regardless_of_strategy(
    vspark, tmp_path_factory, ops
):
    """Any interleaving of appends, DV/copy deletes, DV/copy updates,
    DV/copy merges, rollbacks, and compactions agrees row-for-row with
    a trivial multiset model — physical form (rewrite vs deletion
    vector) must be observationally invisible."""
    spark = vspark
    path = str(tmp_path_factory.mktemp("vdml") / "tbl")

    def df(rows):
        return spark.createDataFrame(list(rows), "k long, v long")

    model: list[list[tuple[int, int]]] = []  # model[i] = rows at v i+1

    def cur():
        return list(model[-1]) if model else []

    versioned.commit(spark, df([(i, i) for i in range(10)]), path)
    model.append([(i, i) for i in range(10)])

    for verb, arg, strat in ops:
        if verb == "append":
            new = [(100 + arg * 10 + j, arg) for j in range(3)]
            versioned.commit(spark, df(new), path)
            model.append(cur() + new)
        elif verb == "delete":
            m = 2 + arg % 3
            versioned.delete_where(spark, path, f"k % {m} = 0", strategy=strat)
            model.append([(k, v) for k, v in cur() if k % m != 0])
        elif verb == "update":
            m = 2 + arg % 3
            versioned.update_where(
                spark, path, f"k % {m} = 1", {"v": "v + 1000"},
                strategy=strat,
            )
            model.append(
                [(k, v + 1000) if k % m == 1 else (k, v) for k, v in cur()]
            )
        elif verb == "merge":
            src = [(arg * 3 + j, -(arg * 3 + j)) for j in range(2)]
            keys = {k for k, _ in src}
            versioned.merge_into(spark, path, df(src), ["k"], strategy=strat)
            model.append([r for r in cur() if r[0] not in keys] + src)
        elif verb == "rollback":
            target = (arg % len(model)) + 1
            versioned.rollback(spark, path, version=target)
            model.append(list(model[target - 1]))
        else:  # compact: layout-only, rows unchanged
            if cur():
                versioned.compact(spark, path, n_files=1)
                model.append(cur())
        got = (
            sorted(
                tuple(r) for r in versioned.read(spark, path).collect()
            )
            if model[-1]
            else []
        )
        if not model[-1]:
            # an empty snapshot refuses read(); row_count still answers
            assert versioned.row_count(spark, path) == 0
        else:
            assert got == sorted(model[-1]), (verb, arg, strat)
    # every historical version still time-travels to its model state
    for i, snap in enumerate(model):
        v = i + 1
        if snap:
            assert sorted(
                tuple(r)
                for r in versioned.read(spark, path, version=v).collect()
            ) == sorted(snap), f"time travel to v{v}"
