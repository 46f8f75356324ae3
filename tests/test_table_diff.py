"""Replica divergence tools: row-level table_diff semantics, the
bucketed checksum localizer, and cross-engine equality of both."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import kernels

DOC_COLS = ["text", "lang", "source", "n_chars"]


def test_table_diff_pinned_semantics(spark):
    a = spark.createDataFrame(
        [(1, "x", None), (2, "y", 5), (3, "z", 6), (4, None, None)],
        "k long, s string, v int",
    )
    b = spark.createDataFrame(
        [(2, "y", 5), (3, "Z", None), (4, None, None), (9, "new", 1)],
        "k long, s string, v int",
    )
    out = {r["k"]: (r["diff_kind"], r["differing_cols"])
           for r in kernels.table_diff(a, b, ["k"]).collect()}
    assert out[1] == ("only_a", "")
    assert out[9] == ("only_b", "")
    assert out[3] == ("differs", "s,v")  # value change + value->NULL
    assert 2 not in out  # identical row not emitted
    assert 4 not in out  # NULL <=> NULL is equal, not a diff


def _mutated_replica(docs):
    kept = docs.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 101 == 0, F.lit("xx")).otherwise(F.col("lang")).alias("lang"),
        "source",
        "n_chars",
    )
    added = docs.filter(F.col("doc_id") % 89 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return kept.unionByName(added)


_MUTATED_SQL = (
    "(SELECT doc_id, text, "
    "CASE WHEN doc_id % 101 = 0 THEN 'xx' ELSE lang END AS lang, "
    "source, n_chars FROM documents WHERE doc_id % 97 <> 0 "
    "UNION ALL SELECT doc_id + 1000000, text, lang, source, n_chars "
    "FROM documents WHERE doc_id % 89 = 0)"
)


def test_table_diff_matches_duckdb(tables, duck):
    docs = tables["documents"]
    spark_rows = sorted(
        tuple(r)
        for r in kernels.table_diff(docs, _mutated_replica(docs), ["doc_id"]).collect()
    )
    oracle_rows = sorted(
        duck.execute(
            kernels.table_diff_oracle(
                "documents", _MUTATED_SQL, ["doc_id"], DOC_COLS
            )
        ).fetchall()
    )
    assert spark_rows == oracle_rows
    kinds = {k for _, k, _ in spark_rows}
    assert kinds == {"only_a", "only_b", "differs"}  # all three classes present


def test_bucket_checksums_sum_to_total(tables):
    docs = tables["documents"]
    cols = ["doc_id", "text", "lang"]
    buckets = kernels.table_checksum_by_bucket(docs, cols, "doc_id", n_buckets=16)
    total = kernels.table_checksum_df(docs, cols).first()
    agg = buckets.agg(
        F.sum("n_rows").alias("n"),
        (F.sum(F.col("checksum").cast("decimal(38,0)")) % kernels._CHECKSUM_MOD)
        .cast("long")
        .alias("c"),
    ).first()
    assert agg["n"] == total["n_rows"]
    assert agg["c"] == total["checksum"]


def test_bucket_checksum_localizes_one_mutation(tables, duck):
    docs = tables["documents"]
    cols = ["doc_id", "lang"]
    base = {r["bucket"]: r["checksum"]
            for r in kernels.table_checksum_by_bucket(docs, cols, "doc_id", 16).collect()}
    mutated = docs.withColumn(
        "lang", F.when(F.col("doc_id") == 42, F.lit("xx")).otherwise(F.col("lang"))
    )
    after = {r["bucket"]: r["checksum"]
             for r in kernels.table_checksum_by_bucket(mutated, cols, "doc_id", 16).collect()}
    changed = [b for b in base if base[b] != after.get(b)]
    assert len(changed) == 1  # exactly the bucket holding doc 42

    oracle = {
        b: c
        for b, _n, c in duck.execute(
            kernels.table_checksum_by_bucket_oracle("documents", cols, "doc_id", 16)
        ).fetchall()
    }
    assert oracle == base
