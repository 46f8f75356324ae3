"""Regression pins for the round-5 self-review findings: each test
fails on the pre-fix code."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import scd, search
from integritychecksforvldbs_spark.operators.kernels import (
    repair_plan,
    run_checkfilegroup_partitioned,
)
from integritychecksforvldbs_spark.sources import zonemap
from integritychecksforvldbs_spark.sources.bucketing import partitioned_mirror
from integritychecksforvldbs_spark.streaming import sink

SF_DIR = "/root/testdata/sf0.001"


def test_bm25_quote_bearing_query(spark, tmp_path):
    """\"don't\" tokenizes to a bare apostrophe term; the term list
    must not be interpolated into SQL (finding: ParseException)."""
    docs = spark.createDataFrame(
        [(1, "don't panic"), (2, "do panic"), (3, "don t")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in search.bm25_scores(docs, "don't").collect()}
    assert got == {1, 3}  # docs containing don / ' / t
    idx = str(tmp_path / "qidx")
    search.build_bm25_index(spark, docs, idx)
    direct = [tuple(r) for r in search.bm25_topk(docs, "don't", k=3).collect()]
    indexed = [
        tuple(r) for r in search.bm25_topk_indexed(spark, idx, "don't", k=3).collect()
    ]
    assert direct == indexed
    # and the oracle SQL stays parseable with the quoted term inlined
    import duckdb

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = con.execute(search.bm25_oracle("don't", k=3)).fetchall()
    assert [tuple(r) for r in direct] == [tuple(r) for r in want]


def test_indexed_bm25_with_empty_docs_matches_direct(spark, tmp_path):
    """Zero-token documents count toward N and avgdl; index stats must
    come from the corpus, not the postings (finding: score drift)."""
    docs = spark.createDataFrame(
        [(1, "spark window"), (2, ""), (3, "   "), (4, "spark")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "eidx")
    search.build_bm25_index(spark, docs, idx)
    stats = spark.read.parquet(f"{idx}/stats").collect()[0]
    assert stats["n_docs"] == 4  # not 2
    direct = [tuple(r) for r in search.bm25_topk(docs, "spark", k=4).collect()]
    indexed = [
        tuple(r)
        for r in search.bm25_topk_indexed(spark, idx, "spark", k=4).collect()
    ]
    assert direct == indexed


def test_corrupt_ledger_recovers_idempotently(spark, tmp_path):
    """Partial JSON in the batch ledger (crash mid-write) must not
    wedge the stream; re-applying is idempotent (finding: permanent
    JSONDecodeError loop)."""
    state = str(tmp_path / "state")
    writer = sink.upsert_counts_sink(state, ["k"])
    writer(spark.createDataFrame([("a", 1)], "k string, n long"), 0)
    with open(state + "._batches.json", "w") as f:
        f.write("[0, 1")  # truncated write
    writer(spark.createDataFrame([("a", 1)], "k string, n long"), 0)  # replay
    writer(spark.createDataFrame([("b", 2)], "k string, n long"), 1)
    got = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert got == [("a", 1), ("b", 2)]


def test_scd2_null_key_rows_classify_by_presence(spark):
    """A NULL-keyed current row must not emit a garbage all-NULL
    opened version (finding: presence tested via key IS NOT NULL)."""
    dim = spark.createDataFrame(
        [(None, "a", date(2024, 1, 1), None), (1, "b", date(2024, 1, 1), None)],
        "k long, v string, valid_from date, valid_to date",
    )
    snap = spark.createDataFrame([(None, "a"), (1, "b")], "k long, v string")
    out = scd.scd2_apply(dim, snap, ["k"], ["v"], date(2024, 6, 1))
    acts = sorted(
        (r["k"], r["version_action"]) for r in out.collect()
        if r["k"] is not None
    ) + sorted(
        (r["k"], r["version_action"]) for r in out.collect() if r["k"] is None
    )
    assert acts == [(1, "kept"), (None, "kept")]
    # idempotent: re-apply keeps keeping
    again = scd.scd2_apply(
        out.drop("version_action"), snap, ["k"], ["v"], date(2024, 12, 1)
    )
    assert {r["version_action"] for r in again.collect()} == {"kept"}


def test_repair_plan_keys_only_table(spark):
    """No compare columns: membership repair alone (finding: reduce()
    of empty iterable)."""
    a = spark.createDataFrame([(1,), (2,)], "k long")
    b = spark.createDataFrame([(2,), (3,)], "k long")
    plan = {(r["op"], r["k"]) for r in repair_plan(a, b, ["k"]).collect()}
    assert plan == {("insert", 1), ("delete", 3)}


def test_zonemap_date_bounds_on_timestamp_column(spark, tmp_path):
    """date bounds vs timestamp footer stats must compare (promoted to
    midnight — exactly Spark's DATE-vs-TIMESTAMP cast), not raise."""
    from integritychecksforvldbs_spark.sources.maintenance import compact_table

    dest = str(tmp_path / "sorted")
    compact_table(
        spark, f"{SF_DIR}/orders.parquet", dest,
        target_bytes=20_000, sort_by=["o_orderdate"],
    )
    zm = zonemap.build_zone_map(spark, dest, "o_orderdate")
    kept_d, skipped_d = zonemap.prune_files(
        zm, date(1996, 1, 1), date(1996, 12, 31)
    )
    kept_t, skipped_t = zonemap.prune_files(
        zm, datetime(1996, 1, 1), datetime(1996, 12, 31)
    )
    assert skipped_d and (kept_d, skipped_d) == (kept_t, skipped_t)


def test_checkfilegroup_partitioned_keeps_referenced_column(spark, tmp_path):
    """Partitioning on a column the expectations reference (lang: the
    lang_is_iso2 rule) must not drop it from the checked frame."""
    from integritychecksforvldbs_spark.sources.loader import load_table

    docs = load_table(spark, f"{SF_DIR}/documents.parquet")
    root = str(tmp_path / "docs_by_lang")
    partitioned_mirror(spark, docs, root, ["lang"])
    res = run_checkfilegroup_partitioned(
        spark, root, "lang", "en", "db", "documents"
    )
    assert res.passed
    assert any("lang" in k for k in res.metrics), res.metrics


def test_partitioned_mirror_rebuilds_on_layout_change(spark, tmp_path):
    """A mirror built with different partition columns must rebuild,
    not silently reuse the stale layout."""
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "k long, p string, q string"
    )
    path = str(tmp_path / "mirror")
    partitioned_mirror(spark, df, path, ["p"])
    m2 = partitioned_mirror(spark, df, path, ["q"])
    plan = (
        m2.filter(F.col("q") == "x")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(q" in plan


def test_pair_metrics_round_half_up_matches_duckdb(spark):
    """precision = 1/128 = 0.0078125 exactly: Python round() gives
    0.007812 (banker's), DuckDB and Spark HALF_UP give 0.007813 — the
    metrics must round engine-side."""
    import duckdb

    from integritychecksforvldbs_spark.operators import dedup

    pred = spark.createDataFrame(
        [(i, i + 1000) for i in range(128)], "doc_id_a long, doc_id_b long"
    )
    truth = spark.createDataFrame([(0, 1000)], "doc_id_a long, doc_id_b long")
    row = dedup.pair_set_metrics(pred, truth).collect()[0]
    assert row["precision"] == 0.007813
    want = duckdb.connect().execute("SELECT ROUND(1.0/128, 6)").fetchone()[0]
    assert row["precision"] == want


def test_bloom_prunes_on_percent_encoded_paths(spark, tmp_path):
    """A table under a path with a space: input_file_name percent-
    encodes, the listing does not — the index must still match (the
    canonical-path pairing), so pruning fires instead of silently
    keeping everything."""
    from pyspark.sql import functions as F2

    from integritychecksforvldbs_spark.sources import bloomskip

    dest = str(tmp_path / "my data" / "tbl")
    spark.range(0, 2000).select(F2.col("id").alias("k")).repartitionByRange(
        4, "k"
    ).write.parquet(dest)
    bloomskip.build_bloom_index(spark, dest, "k")
    kept, skipped = bloomskip.bloom_prune(spark, dest, "k", 1500)
    assert skipped, "encoded-path index must still match the listing"
    rows = bloomskip.bloom_read(spark, dest, "k", 1500).collect()
    assert [r["k"] for r in rows] == [1500]


def test_cdc_compaction_rejects_reserved_column(spark):
    from integritychecksforvldbs_spark.operators import scd as _scd

    df = spark.createDataFrame(
        [(1, 1, "u", 9)], "k long, seq long, op string, __cdc_latest_rn long"
    )
    with pytest.raises(ValueError, match="__cdc_latest_rn"):
        _scd.cdc_latest_snapshot(df, ["k"], "seq", "op")
