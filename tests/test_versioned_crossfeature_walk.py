"""Cross-feature property walk (r12; VERDICT r11 #8): random
interleavings of partitioned commits, DML (copy-on-write AND
deletion-vector), compaction, rollback, clone, vacuum, and partition
-spec evolution over identity-, day(ts)-, and bucket-partitioned
tables, asserting snapshot == model AFTER EVERY STEP — plus a pruned
read_where equivalence each step, because the r11
rollback-drops-layout bug is exactly the class where a feature pair
(rollback × layout) breaks what each feature alone kept (COVERAGE.md
"post-close wave 2").
"""

from __future__ import annotations

import datetime
import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from integritychecksforvldbs_spark.sources import versioned

_VERBS = [
    "append", "delete", "update", "optimize", "rollback", "clone",
    "vacuum", "set_spec", "sql",
]


def _sql_cases(lo: int, g: int):
    """(condition, python-predicate) pairs the ``sql`` verb rotates
    through — each shape exercises a distinct binder path: plain
    range (single-table prune), IN-list (membership points), OR
    anti-range (r13 branch union), partition equality, null channel.
    The predicate is the model-side twin the answer must equal."""
    hi = lo + 9
    return [
        (
            f"k >= {lo} AND k <= {hi}",
            lambda k, v: lo <= k <= hi,
        ),
        (
            f"k IN ({lo}, {lo + 3}, {lo + 7})",
            lambda k, v: k in (lo, lo + 3, lo + 7),
        ),
        (
            f"k < {lo} OR k > {lo + 40}",
            lambda k, v: k < lo or k > lo + 40,
        ),
        (
            f"g = {g} AND k >= {lo}",
            lambda k, v: k % 3 == g and k >= lo,
        ),
        (
            f"v IS NOT NULL AND k <= {hi}",
            lambda k, v: k <= hi,
        ),
    ]

OPS = st.lists(
    st.tuples(st.sampled_from(_VERBS), st.integers(0, 999)),
    min_size=11,
    max_size=15,
)

_SPECS = {
    # r13: identity layouts evolve metadata-only too — the walk now
    # toggles identity <-> day(ts) like the transform kinds
    "identity": (["g"], ["day(ts)"]),
    "day": (["day(ts)"], ["month(ts)"]),
    "bucket": (["bucket(4, k)"], ["bucket(8, k)"]),
}


def _mk_df(spark, items):
    rows = [
        (k, datetime.datetime(2024, 1, 1 + (k % 5), 6, 0, 0), v, k % 3)
        for k, v in items
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, v long, g long")


@pytest.fixture(scope="module")
def wspark(spark):
    return spark


@settings(
    max_examples=16,  # ≥200 op-steps total across examples
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    kind=st.sampled_from(sorted(_SPECS)),
    ops=OPS,
)
def test_crossfeature_walk_matches_model(
    wspark, tmp_path_factory, kind, ops
):
    spark = wspark
    base = tmp_path_factory.mktemp("xwalk")
    path = str(base / "t")
    spec, alt_spec = _SPECS[kind]

    model: dict[int, int] = {}  # k -> v (ts, g derive from k)
    model_at: dict[int, dict[int, int]] = {}
    min_alive = 1
    counter = itertools.count(0)
    clone_n = itertools.count(0)

    def _fresh_items(n=8):
        return [(k, k * 2) for k in itertools.islice(counter, n)]

    # step 0: the table is born partitioned
    items = _fresh_items()
    v = versioned.commit(spark, _mk_df(spark, items), path,
                         partition_by=spec)
    model.update(items)
    model_at[v] = dict(model)

    for verb, arg in ops:
        if verb == "append":
            items = _fresh_items()
            v = versioned.commit(spark, _mk_df(spark, items), path)
            model.update(items)
            model_at[v] = dict(model)
        elif verb == "delete":
            strategy = ("auto", "copy", "dv")[arg % 3]
            if arg % 2 == 0:
                cond, pred = f"k % 7 = {arg % 7}", (
                    lambda k: k % 7 == arg % 7
                )
            else:  # partition-aligned predicate
                cond, pred = f"g = {arg % 3}", (
                    lambda k: k % 3 == arg % 3
                )
            v, n = versioned.delete_where(
                spark, path, cond, strategy=strategy
            )
            want_gone = [k for k in model if pred(k)]
            assert n == len(want_gone)
            for k in want_gone:
                model.pop(k)
            model_at[v] = dict(model)
        elif verb == "update":
            strategy = ("auto", "copy", "dv")[arg % 3]
            v, n = versioned.update_where(
                spark, path, f"k % 5 = {arg % 5}",
                {"v": "v + 1000"}, strategy=strategy,
            )
            hit = [k for k in model if k % 5 == arg % 5]
            assert n == len(hit)
            for k in hit:
                model[k] += 1000
            model_at[v] = dict(model)
        elif verb == "optimize":
            v, _b, _a = versioned.optimize(spark, path)
            model_at[v] = dict(model)
        elif verb == "rollback":
            alive = sorted(ver for ver in model_at if ver >= min_alive)
            target = alive[arg % len(alive)]
            v = versioned.rollback(spark, path, target)
            model = dict(model_at[target])
            model_at[v] = dict(model)
        elif verb == "clone":
            dst = str(base / f"c{next(clone_n)}")
            versioned.clone(spark, path, dst)
            got = {
                (r.k, r.v)
                for r in versioned.read(spark, dst).collect()
            }
            assert got == set(model.items()), "clone diverged"
        elif verb == "vacuum":
            versioned.vacuum(path, keep_versions=1, min_age_s=0.0)
            min_alive = max(model_at)
        elif verb == "set_spec":  # evolve transforms, skip identity
            if alt_spec is None:
                continue
            target = alt_spec if arg % 2 == 0 else spec
            v = versioned.set_partition_spec(spark, path, target)
            model_at[v] = dict(model)
        else:  # sql — the front door answers the model too (r13;
            # VERDICT r12 #8: binder-vs-Python-API divergence caught
            # by the walk, not just the curated suites)
            from integritychecksforvldbs_spark.sources.versioned_sql import (
                register_table,
                versioned_sql,
            )

            lo = (arg * 7) % 60
            cond, pred = _sql_cases(lo, arg % 3)[
                arg % len(_sql_cases(lo, arg % 3))
            ]
            tname = f"xw{abs(hash(path)) % 10**6}"
            register_table(tname, path)
            try:
                if arg % 4 == 0:
                    stmt = (
                        f"WITH a AS (SELECT k, v FROM {tname} "
                        f"WHERE {cond}) SELECT k, v FROM a"
                    )
                else:
                    stmt = f"SELECT k, v FROM {tname} WHERE {cond}"
                got_sql = {
                    (r.k, r.v)
                    for r in versioned_sql(spark, stmt).collect()
                }
                want_sql = {
                    (k, v2)
                    for k, v2 in model.items()
                    if pred(k, v2)
                }
                assert got_sql == want_sql, f"sql({cond!r})"
                # EXPLAIN PRUNE must describe, never crash
                ex = versioned_sql(
                    spark,
                    f"EXPLAIN PRUNE {tname} WHERE {cond}",
                ).collect()
                assert len(ex) == 1
            finally:
                register_table(tname, None)

        # THE invariant: after every step, the snapshot answers the
        # model, and a stats-pruned ranged read answers it too
        got = {
            (r.k, r.v) for r in versioned.read(spark, path).collect()
        }
        assert got == set(model.items()), f"after {verb}({arg})"
        lo = (arg * 7) % 60
        pruned = {
            (r.k, r.v)
            for r in versioned.read_where(
                spark, path, {"k": (lo, lo + 9)}
            ).collect()
        }
        want = {
            (k, v2) for k, v2 in model.items() if lo <= k <= lo + 9
        }
        assert pruned == want, f"pruned read after {verb}({arg})"
