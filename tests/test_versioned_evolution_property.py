"""Model-based property test for ALTER TABLE schema evolution: a
random walk over {rename, add, drop, append, delete, compact} on a
versioned table must always agree with a trivial in-memory model that
tracks rows as {logical_name: value} dicts — pinning that the column
mapping (logical→physical indirection, retired-name anti-resurrection)
is observationally invisible: a reader sees exactly the logical
schema's data no matter how the names were shuffled underneath."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from integritychecksforvldbs_spark.sources import versioned

# op := (kind, a, b); interpretation depends on kind (modulo current
# state, so every generated sequence is valid by construction)
OPS = st.lists(
    st.tuples(
        st.sampled_from(
            [
                "rename", "add", "drop", "append", "delete",
                "compact", "rollback",
            ]
        ),
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=3,
    max_size=10,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_schema_evolution_walk_matches_model(
    spark, tmp_path_factory, ops
):
    path = str(tmp_path_factory.mktemp("evoprop") / "tbl")
    # model: cols = ordered logical names; rows = list of dicts keyed
    # by the LOGICAL name each value currently lives under
    cols = ["k", "c0"]
    rows = [{"k": i, "c0": i * 10} for i in range(4)]
    next_key = 4
    next_col = 1
    versioned.commit(
        spark,
        spark.createDataFrame(
            [(r["k"], r["c0"]) for r in rows], "k int, c0 int"
        ),
        path,
    )
    # snapshots[i] = model state right after table version i+1 —
    # every executed walk op commits exactly one version, so the
    # model's history indexes map 1:1 onto the log and ROLLBACK can
    # be modeled as a restore of a recorded state
    import copy

    snapshots = [(list(cols), copy.deepcopy(rows))]

    def spark_df():
        return versioned.read(spark, path)

    for kind, a, b in ops:
        if kind == "rename":
            src = cols[1:][a % (len(cols) - 1)] if len(cols) > 1 else None
            if src is None:
                continue
            dst = f"c{next_col}"
            next_col += 1
            versioned.rename_column(path, src, dst)
            cols[cols.index(src)] = dst
            for r in rows:
                r[dst] = r.pop(src)
        elif kind == "add":
            dst = f"c{next_col}"
            next_col += 1
            versioned.add_column(path, dst, IntegerType())
            cols.append(dst)
            for r in rows:
                r[dst] = None
        elif kind == "drop":
            if len(cols) <= 2:
                continue  # keep k + one data column
            victim = cols[1:][a % (len(cols) - 1)]
            versioned.drop_column(path, victim)
            cols.remove(victim)
            for r in rows:
                r.pop(victim)
        elif kind == "append":
            new = []
            for i in range(1 + (a % 2)):
                rec = {c: None for c in cols}
                rec["k"] = next_key
                rec[cols[1]] = next_key * 10
                next_key += 1
                new.append(rec)
            ddl = ", ".join(f"{c} int" for c in cols)
            versioned.commit(
                spark,
                spark.createDataFrame(
                    [tuple(r[c] for c in cols) for r in new], ddl
                ),
                path,
            )
            rows.extend(new)
        elif kind == "delete":
            if not rows:
                continue
            victim = rows[a % len(rows)]["k"]
            versioned.delete_where(spark, path, f"k = {victim}")
            rows = [r for r in rows if r["k"] != victim]
        elif kind == "compact":  # layout-only, model unchanged
            if not rows:
                continue
            versioned.compact(spark, path, n_files=1)
        else:  # rollback to a recorded version
            target = a % len(snapshots)
            versioned.rollback(spark, path, version=target + 1)
            cols = list(snapshots[target][0])
            rows = copy.deepcopy(snapshots[target][1])
            next_key = max((r["k"] for r in rows), default=-1) + 1
            if next_key < 4:
                next_key = 100 + len(snapshots)  # never reuse a key
        snapshots.append((list(cols), copy.deepcopy(rows)))
        got_cols = spark_df().columns
        assert got_cols == cols, (kind, got_cols, cols)
        got = sorted(
            tuple(r[c] for c in cols) for r in spark_df().collect()
        )
        want = sorted(tuple(r[c] for c in cols) for r in rows)
        assert got == want, (kind, got, want)
