"""Structured Streaming freshness kernels: file source → watermarked
windowed agg → memory sink, and applyInPandasWithState across
micro-batches, checked against the batch-equivalents."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources.loader import load_table
from integritychecksforvldbs_spark.streaming import freshness

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir():
    d = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{SF_DIR}/events.parquet", os.path.join(d, "part-000.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_table(spark, f"{SF_DIR}/events.parquet").cache()


def _run_stream(spark, out_df, name: str, extra=None):
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if extra != "update" else "update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_hourly_counts_match_batch(spark, stream_dir, batch_events):
    stream = freshness.events_stream(spark, stream_dir)
    assert stream.isStreaming
    result = _run_stream(
        spark, freshness.hourly_counts(stream), "hourly_counts_t"
    ).cache()
    expect = freshness.hourly_counts(batch_events).cache()
    # exact counts per (window, event_type); n_users is HLL on the
    # stream side so only n_events is compared exactly
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in result.collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in expect.collect()
    }
    assert got == want
    assert len(want) > 100


def test_streaming_incremental_second_batch(spark, stream_dir, batch_events):
    """A second file arriving is picked up from the checkpoint and
    re-aggregated — resume semantics of the file source."""
    d = tempfile.mkdtemp(prefix="events_incr_")
    chk = tempfile.mkdtemp(prefix="chk_")
    try:
        # mirror the fixture's physical format: naive-µs timestamps
        # (written as timestamp[us] without UTC adjustment → NTZ read)
        def as_fixture(df):
            return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))

        half = batch_events.filter("event_id % 2 = 0")
        rest = batch_events.filter("event_id % 2 = 1")
        as_fixture(half).write.mode("overwrite").parquet(os.path.join(d, "b1"))

        def run_once(qname):
            stream = freshness.events_stream(spark, d + "/*/")
            q = (
                freshness.hourly_counts(stream)
                .writeStream.format("memory")
                .queryName(qname)
                .outputMode("complete")
                .option("checkpointLocation", chk)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.table(qname)

        n1 = run_once("incr_1").agg(F.sum("n_events")).collect()[0][0]
        as_fixture(rest).write.mode("overwrite").parquet(os.path.join(d, "b2"))
        n2 = run_once("incr_2").agg(F.sum("n_events")).collect()[0][0]
        assert n1 == half.count()
        assert n2 == batch_events.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)


def test_running_max_state_matches_batch(spark, stream_dir, batch_events):
    stream = freshness.events_stream(spark, stream_dir)
    out = freshness.running_max_state(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("runmax_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per key is the final state
    got = {
        r["event_type"]: (r["latest_us"], r["n_seen"])
        for r in spark.table("runmax_t").collect()
    }
    expect = {
        r["event_type"]: (r["latest_us"], r["n_seen"])
        for r in batch_events.groupBy("event_type")
        .agg(
            F.unix_micros(F.max("ts")).alias("latest_us"),
            F.count("*").alias("n_seen"),
        )
        .collect()
    }
    assert got == expect


def test_freshness_summary_stale_flag(batch_events):
    fresh = freshness.freshness_summary(batch_events, as_of="2024-01-30 23:59:00")
    stale = freshness.freshness_summary(batch_events, as_of="2024-06-01 00:00:00")
    assert fresh.filter("stale").count() < 5  # most types have recent events
    assert stale.filter("stale").count() == 5


def test_late_event_counts_vs_manual(batch_events):
    got = {
        r["event_type"]: r["n_late"]
        for r in freshness.late_event_counts(batch_events, "1 hour").collect()
    }
    mx = batch_events.agg(F.max("ts")).collect()[0][0]
    manual = {
        r["event_type"]: r["n"]
        for r in batch_events.filter(
            F.col("ts") < F.lit(mx) - F.expr("INTERVAL 1 HOUR")
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == manual
    assert sum(got.values()) > 0


# ---------------------------------------------------------------------------
# sessionization (streaming/sessions.py)
# ---------------------------------------------------------------------------


def test_session_counts_toy_semantics(spark):
    """Gap boundary semantics pinned: an event exactly `gap` after its
    predecessor MERGES (Spark extends sessions inclusively at the
    expiry instant); only diff > gap splits.  session_end = last
    event + gap."""
    from datetime import datetime

    from integritychecksforvldbs_spark.streaming import sessions

    ts = lambda m: datetime(2024, 1, 1, 0, m)
    ev = spark.createDataFrame(
        [
            (1, ts(0)), (1, ts(10)),
            (1, ts(40)),              # exactly 30m after 00:10 -> merges
            (1, ts(11)), (2, ts(5)),  # out-of-order event; lone user
        ],
        "user_id bigint, ts timestamp",
    )
    rows = sorted(
        (r["user_id"], r["session_start"].minute, r["session_end"].minute
         + 60 * r["session_end"].hour, r["n_events"])
        for r in sessions.session_counts(ev).collect()
    )
    assert rows == [
        (1, 0, 70, 4),  # one session [00:00, 01:10): 00:40 merged
        (2, 5, 35, 1),
    ]
    # and a diff just past the gap splits
    ev2 = spark.createDataFrame(
        [(1, ts(0)), (1, ts(31))], "user_id bigint, ts timestamp"
    )
    assert sessions.session_counts(ev2).count() == 2


def test_streaming_sessions_match_batch(spark, stream_dir, batch_events):
    from integritychecksforvldbs_spark.streaming import freshness, sessions

    stream = freshness.events_stream(spark, stream_dir)
    result = _run_stream(
        spark, sessions.session_counts(stream), "sessions_t"
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in result.collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in sessions.session_counts(batch_events).collect()
    }
    assert got == want
    assert len(want) > 100


def test_streaming_dedup_drops_redelivery(spark, batch_events, tmp_path):
    """A re-delivered file (at-least-once source) contributes zero new
    rows: the id set is streaming state across micro-batches."""
    import shutil

    d = tmp_path / "dup_stream"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-001.parquet")  # replay

    stream = freshness.events_stream(spark, str(d))
    deduped = freshness.dedup_stream(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_t").count()
    want = batch_events.select("event_id").distinct().count()
    assert got == want
    # and the batch-equivalent is plain dropDuplicates
    assert freshness.dedup_stream(batch_events).count() == want


def test_streaming_sliding_counts_match_batch(spark, stream_dir, batch_events):
    """Hopping windows on a stream (availableNow) equal the batch
    frame exactly — every event fans out to window/slide windows in
    both modes."""
    from integritychecksforvldbs_spark.streaming import sessions as S

    stream = freshness.events_stream(spark, stream_dir)
    result = _run_stream(spark, S.sliding_counts(stream), "sliding_counts_t")
    got = {
        (r["window_start"], r["window_end"]): r["n_events"] for r in result.collect()
    }
    want = {
        (r["window_start"], r["window_end"]): r["n_events"]
        for r in S.sliding_counts(batch_events).collect()
    }
    assert got == want
    # 1h/15min hop: total window-rows = 4x events
    assert sum(want.values()) == batch_events.count() * 4


def test_streaming_purchase_attribution_matches_batch(spark, stream_dir, batch_events):
    """Stream-stream interval join (both sides unbounded, watermarked)
    produces exactly the batch interval join's pairs.  Append mode is
    the only legal output for stream-stream joins; availableNow drains
    the file source, and rows within watermark+window of the end of
    input are still emitted because the final micro-batch advances the
    watermark past them."""
    from integritychecksforvldbs_spark.streaming import joins

    stream = freshness.events_stream(spark, stream_dir)
    out = joins.purchase_attribution(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("attribution_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.table("attribution_t").collect()
    }
    want = {
        (r["purchase_id"], r["click_id"])
        for r in joins.purchase_attribution(batch_events).collect()
    }
    assert got == want and want


def test_attribution_left_outer_keeps_unmatched_purchases(spark, batch_events):
    """Outer attribution = inner pairs + one NULL-click row per
    purchase with no qualifying click; purchase coverage is total."""
    from pyspark.sql import functions as F

    from integritychecksforvldbs_spark.streaming import joins

    inner = joins.purchase_attribution(batch_events).cache()
    outer = joins.purchase_attribution(batch_events, how="left_outer").cache()
    n_purchases = batch_events.filter("event_type = 'purchase'").count()
    assert outer.select("purchase_id").distinct().count() == n_purchases
    matched = outer.filter(F.col("click_id").isNotNull())
    assert sorted(map(tuple, matched.collect())) == sorted(
        map(tuple, inner.collect())
    )
    unmatched = outer.filter(F.col("click_id").isNull())
    assert unmatched.filter(
        F.col("click_ts").isNotNull() | F.col("lag_seconds").isNotNull()
    ).count() == 0


def test_streaming_dedup_state_evicted_by_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark bounds dedup state: ids whose
    event time has fallen behind the watermark are evicted, so state
    tracks the replay window, not every id ever seen.  (Plain
    dropDuplicates on a key subset without the event-time column
    would hold all 300 rows forever.)"""
    from datetime import datetime, timedelta

    d = tmp_path / "evict_stream"
    d.mkdir()
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    for i, hours in enumerate((0, 10, 20)):
        rows = [
            (1000 * i + j, t0 + timedelta(hours=hours), 1, "view")
            for j in range(100)
        ]
        (
            spark.createDataFrame(
                rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(d / f"batch_{i}"))
        )
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "batch_*"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = freshness.dedup_stream(stream, watermark="2 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_evict_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("dedup_evict_t").count() == 300  # nothing lost
    totals = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    # without eviction the final state would hold all 300 ids
    assert totals and min(totals[-1:]) <= 200
    assert any(
        p["stateOperators"][0].get("numRowsRemoved", 0) > 0
        for p in q.recentProgress
        if p.get("stateOperators")
    )
