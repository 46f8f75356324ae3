"""Column profiling: pinned null/NDV/min-max semantics, cross-engine
equality on the fixture, and the one-scan plan shape."""

from __future__ import annotations

import pytest

from integritychecksforvldbs_spark.operators import profile
from integritychecksforvldbs_spark.sources.bucketing import plan_data_shuffles

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def test_profile_pinned_values(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, None), (2, "a"), (None, "a")],
        "k int, s string",
    )
    out = {r["column_name"]: r for r in profile.profile_df(df).collect()}
    assert out["k"]["n_rows"] == 4
    assert out["k"]["n_nulls"] == 1
    assert out["k"]["n_distinct"] == 2  # NULL excluded from NDV
    assert (out["k"]["min_value"], out["k"]["max_value"]) == ("1", "2")
    assert out["s"]["n_nulls"] == 1
    assert out["s"]["n_distinct"] == 2
    assert (out["s"]["min_value"], out["s"]["max_value"]) == ("a", "b")


def test_profile_unknown_column_raises(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="unknown"):
        profile.profile_df(df, ["nope"])


def test_profile_matches_duckdb(tables, duck):
    spark_rows = sorted(
        tuple(r) for r in profile.profile_df(tables["documents"], DOC_COLS).collect()
    )
    oracle_rows = sorted(
        duck.execute(profile.profile_oracle("documents", DOC_COLS)).fetchall()
    )
    assert spark_rows == oracle_rows


def test_profile_is_one_scan(tables):
    """All per-column aggregates ride ONE scan: the multi-distinct
    Expand collapses map-side, so the plan needs at most one hash
    shuffle of partial states, and must not re-scan per column."""
    df = profile.profile_df(tables["documents"], DOC_COLS)
    assert plan_data_shuffles(df) <= 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_skew_profile_pinned(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k int"
    )
    r = profile.key_skew_profile(df, ["k"]).first()
    assert (r["n_keys"], r["n_rows"], r["max_key_rows"]) == (3, 5, 3)
    assert r["skew_factor"] == 1.8  # 3 / (5/3)


def test_heavy_hitters_rides_take_ordered(tables):
    df = profile.heavy_hitters(tables["orders"], ["o_custkey"], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort
    rows = df.collect()
    assert len(rows) == 5
    counts = [r["n_rows"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_histogram_buckets_partition_the_table(tables):
    docs = tables["documents"]
    hist = profile.histogram_fixed(docs, "n_chars", 100)
    rows = hist.collect()
    assert sum(r["n_rows"] for r in rows) == docs.count()
    for r in rows:
        assert r["bucket"] * 100 <= r["min_value"] <= r["max_value"] < (r["bucket"] + 1) * 100


def test_profile_approx_ndv_within_bound(tables):
    """HLL++ NDV lands within 5 relative standard deviations of exact
    for every documents column (rsd=0.05 -> ±25% worst case; actual
    HLL error at these cardinalities is far tighter)."""
    exact = {
        r["column_name"]: r
        for r in profile.profile_df(tables["documents"], DOC_COLS).collect()
    }
    approx = {
        r["column_name"]: r
        for r in profile.profile_approx_df(tables["documents"], DOC_COLS).collect()
    }
    assert set(exact) == set(approx)
    for c in DOC_COLS:
        e, a = exact[c], approx[c]
        # everything except the sketch must be identical
        assert (a["n_rows"], a["n_nulls"], a["min_value"], a["max_value"]) == (
            e["n_rows"], e["n_nulls"], e["min_value"], e["max_value"],
        )
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            1, int(0.25 * e["n_distinct"])
        )


def test_profile_approx_drops_expand(tables):
    """The sketch tier's reason to exist: the exact plan fans rows out
    through Expand for the multi-distinct; the HLL plan must not."""
    exact_plan = (
        profile.profile_df(tables["documents"], DOC_COLS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    approx_plan = (
        profile.profile_approx_df(tables["documents"], DOC_COLS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
    assert approx_plan.count("Scan parquet") == 1


def test_approx_quantiles_rank_error(tables):
    """Every returned value's exact rank is within the GK
    relative_error of the requested quantile."""
    ev = tables["events"]
    n = ev.count()
    eps = 0.01
    rows = profile.approx_quantiles_df(ev, "value", relative_error=eps).collect()
    assert len(rows) == 5
    for r in rows:
        v, p = r["value"], r["quantile"]
        le = ev.filter(f"value <= {v}").count() / n
        lt = ev.filter(f"value < {v}").count() / n
        assert lt - eps <= p <= le + eps, (p, v, lt, le)


# ---------------------------------------------------------------------------
# incremental NDV sketches
# ---------------------------------------------------------------------------


def test_ndv_sketch_accuracy(tables):
    from integritychecksforvldbs_spark.operators import profile as P

    docs = tables["documents"]
    sk = P.ndv_sketch_by(docs, "lang", ["doc_id", "source"])
    est = P.ndv_estimate(sk, ["doc_id", "source"]).first()
    exact_docs = docs.select("doc_id").distinct().count()
    exact_src = docs.select("source").distinct().count()
    assert est["n_rows"] == docs.count()
    assert abs(est["ndv_doc_id"] - exact_docs) <= max(2, exact_docs * 0.05)
    assert abs(est["ndv_source"] - exact_src) <= max(2, exact_src * 0.05)


def test_ndv_merge_stays_in_error_envelope_and_is_deterministic(spark, tables):
    """Union of per-key sketches is NOT bit-identical to a single
    sparse-mode sketch (dense promotion), but stays inside the HLL
    error envelope and is deterministic run-to-run — the properties
    that make STORED sketches trustworthy."""
    from integritychecksforvldbs_spark.operators import profile as P

    docs = tables["documents"]
    exact = docs.select("doc_id").distinct().count()
    a = P.ndv_estimate(
        P.ndv_sketch_by(docs, "lang", ["doc_id"]), ["doc_id"]
    ).first()["ndv_doc_id"]
    b = P.ndv_estimate(
        P.ndv_sketch_by(docs, "lang", ["doc_id"]), ["doc_id"]
    ).first()["ndv_doc_id"]
    assert a == b  # deterministic
    assert abs(a - exact) <= max(2, exact * 0.05)
    # a different bucketing merges to an estimate in the same envelope
    c = P.ndv_estimate(
        P.ndv_sketch_by(docs, "source", ["doc_id"]), ["doc_id"]
    ).first()["ndv_doc_id"]
    assert abs(c - exact) <= max(2, exact * 0.05)


def test_ndv_estimate_key_subset(tables):
    from integritychecksforvldbs_spark.operators import profile as P

    docs = tables["documents"]
    sk = P.ndv_sketch_by(docs, "lang", ["doc_id"])
    some = [r["lang"] for r in docs.select("lang").distinct().collect()][:2]
    est = P.ndv_estimate(sk, ["doc_id"], keys=some).first()
    sub = docs.filter(docs["lang"].isin(some))
    exact = sub.select("doc_id").distinct().count()
    assert est["n_rows"] == sub.count()
    assert abs(est["ndv_doc_id"] - exact) <= max(2, exact * 0.05)


def test_theta_overlap_estimates(spark, tables):
    """Theta set algebra on stored per-key sketches vs exact counts on
    the raw data (events users per event_type)."""
    from integritychecksforvldbs_spark.operators import profile as P

    ev = tables["events"]
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    ka, kb = sorted(types)[:2]
    sk = P.theta_sketch_by(ev, "event_type", "user_id")
    est = P.theta_overlap_estimate(sk, ka, kb).first()

    ua = {r["user_id"] for r in ev.filter(ev["event_type"] == ka).select("user_id").distinct().collect()}
    ub = {r["user_id"] for r in ev.filter(ev["event_type"] == kb).select("user_id").distinct().collect()}
    tol = lambda x: max(3, x * 0.06)  # noqa: E731
    assert abs(est["ndv_a"] - len(ua)) <= tol(len(ua))
    assert abs(est["ndv_b"] - len(ub)) <= tol(len(ub))
    assert abs(est["ndv_union"] - len(ua | ub)) <= tol(len(ua | ub))
    assert abs(est["ndv_intersection"] - len(ua & ub)) <= tol(len(ua & ub))
    assert abs(est["ndv_only_a"] - len(ua - ub)) <= tol(len(ua - ub))


def test_kll_merged_quantiles_rank_error(spark, tables):
    """Merged per-key KLL sketches give quantiles within rank error of
    the exact distribution."""
    from integritychecksforvldbs_spark.operators import profile as P

    ev = tables["events"]
    sk = P.kll_sketch_by(ev, "event_type", "value")
    got = P.kll_quantiles(sk, probs=(0.5,)).first()["q_50"]
    vals = sorted(r["value"] for r in ev.select("value").collect())
    # rank of the returned value must be within 3% of the true median rank
    import bisect

    rank = bisect.bisect_left(vals, got) / len(vals)
    assert abs(rank - 0.5) <= 0.03, rank


def test_kll_key_subset(spark, tables):
    from integritychecksforvldbs_spark.operators import profile as P

    ev = tables["events"]
    types = sorted(
        r["event_type"] for r in ev.select("event_type").distinct().collect()
    )
    sk = P.kll_sketch_by(ev, "event_type", "value")
    got = P.kll_quantiles(sk, probs=(0.5,), keys=[types[0]]).first()["q_50"]
    sub = sorted(
        r["value"]
        for r in ev.filter(ev["event_type"] == types[0]).select("value").collect()
    )
    import bisect

    rank = bisect.bisect_left(sub, got) / len(sub)
    assert abs(rank - 0.5) <= 0.03, rank
