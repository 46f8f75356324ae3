"""transformWithState running-Welford operator: merge arithmetic
tested directly; the end-to-end streaming drive is capability-gated
(the TWS Python runner needs google.protobuf, absent here)."""

from __future__ import annotations

import numpy as np
import pytest

from integritychecksforvldbs_spark.streaming import stateful


def _exact(vs):
    v = np.asarray(vs, dtype=np.float64)
    return len(v), float(v.mean()), float(((v - v.mean()) ** 2).sum())


def test_welford_combine_matches_exact():
    rng = np.random.default_rng(3)
    xs = rng.standard_normal(1000) * 40 + 7
    # fold in uneven chunks, as micro-batches would arrive
    acc = (0, 0.0, 0.0)
    i = 0
    for size in (1, 499, 3, 250, 247):
        acc = stateful.welford_combine(acc, _exact(xs[i : i + size]))
        i += size
    n, mean, m2 = acc
    en, emean, em2 = _exact(xs)
    assert n == en
    assert abs(mean - emean) < 1e-9
    assert abs(m2 - em2) < 1e-6


def test_welford_combine_identity_edges():
    a = (5, 2.0, 10.0)
    assert stateful.welford_combine(a, (0, 0.0, 0.0)) == a
    assert stateful.welford_combine((0, 0.0, 0.0), a) == a


def test_welford_combine_order_independent():
    parts = [_exact([1.0, 2.0]), _exact([10.0]), _exact([5.0, 5.0, 5.0])]
    f = stateful.welford_combine
    ab = f(f(parts[0], parts[1]), parts[2])
    ba = f(f(parts[2], parts[0]), parts[1])
    assert ab[0] == ba[0]
    assert abs(ab[1] - ba[1]) < 1e-12
    assert abs(ab[2] - ba[2]) < 1e-9


@pytest.mark.needs_protobuf
@pytest.mark.skipif(
    not stateful.tws_available(),
    reason="transformWithState runner needs google.protobuf (not in this env)",
)
def test_running_value_stats_matches_batch(spark, tmp_path):
    import shutil

    from pyspark.sql import functions as F

    from integritychecksforvldbs_spark.sources.loader import load_table
    from integritychecksforvldbs_spark.streaming import freshness

    d = str(tmp_path / "stream")
    import os

    os.makedirs(d)
    shutil.copy("/root/testdata/sf0.001/events.parquet", f"{d}/p.parquet")
    stream = freshness.events_stream(spark, d)
    out = stateful.running_value_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_welford_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_type"]: (r["n"], r["mean"], r["var_pop"])
        for r in spark.table("tws_welford_t").collect()
    }
    batch = load_table(spark, "/root/testdata/sf0.001/events.parquet")
    want = {
        r["event_type"]: (r["n"], r["mean"], r["v"])
        for r in batch.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.avg("value").alias("mean"),
            F.var_pop("value").alias("v"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9
        assert abs(got[k][2] - want[k][2]) < 1e-6
