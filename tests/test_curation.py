"""Corpus-curation kernels (operators/curation.py): decontamination,
per-source caps, mixture allocation, token chunking — semantics pinned
on toy frames, edge cases (short/empty docs) exercised, and scale
invariants asserted on the fixture corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import curation

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    from integritychecksforvldbs_spark.sources.loader import load_table

    return load_table(spark, f"{SF_DIR}/documents.parquet").cache()


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------


def test_decontaminate_toy_semantics(spark):
    """doc 0 is the benchmark (mod 20); doc 1 shares a 3-gram with it,
    doc 2 shares none, doc 3 is too short for any 3-gram."""
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),
            (1, "a quick brown fox appears today"),  # shares "quick brown fox"
            (2, "entirely different words here now"),
            (3, "two words"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in curation.decontaminate(df, n=3).collect()}
    # benchmark doc itself is excluded from the scored set
    assert 0 not in rows
    # short doc has no 3-grams -> excluded (mirrors the shingle domain)
    assert 3 not in rows
    assert rows[1]["contaminated"] == 1 and rows[1]["n_contaminated"] == 1
    assert rows[2]["contaminated"] == 0 and rows[2]["n_contaminated"] == 0
    assert rows[1]["n_grams"] == 4  # 6 tokens -> 4 distinct 3-grams
    assert rows[1]["contamination"] == 0.25


def test_decontaminate_fixture_sane(docs):
    out = curation.decontaminate(docs).cache()
    n_scored = out.count()
    n_nonbench = docs.filter("doc_id % 20 <> 0").count()
    assert 0 < n_scored <= n_nonbench
    bad = out.filter(
        (F.col("n_contaminated") > F.col("n_grams"))
        | (F.col("contamination") < 0)
        | (F.col("contamination") > 1)
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# cap_per_source
# ---------------------------------------------------------------------------


def test_cap_per_source_bounds_and_determinism(docs):
    capped = curation.cap_per_source(docs, k=50).cache()
    per = capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 50 for r in per)
    # sources with >= 50 docs are capped exactly at 50
    big = {
        r["source"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        if r["n"] >= 50
    }
    got = {r["source"]: r["n"] for r in per}
    assert all(got[s] == 50 for s in big)
    # deterministic: same kept set on a re-run over a reshuffled frame
    again = curation.cap_per_source(docs.repartition(7), k=50)
    a = {r["doc_id"] for r in capped.collect()}
    b = {r["doc_id"] for r in again.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# mixture_allocation
# ---------------------------------------------------------------------------


def test_mixture_allocation_integer_budget(docs):
    out = curation.mixture_allocation(docs, target_tokens=1_000_000).collect()
    total_alloc = sum(r["alloc_tokens"] for r in out)
    # floor division: never exceeds the target, within |sources| of it
    assert total_alloc <= 1_000_000
    assert total_alloc > 1_000_000 - len(out)
    src_tokens = {r["source"]: r["src_tokens"] for r in out}
    assert all(v > 0 for v in src_tokens.values())
    # allocation proportional to share: exact integer formula
    total = sum(src_tokens.values())
    for r in out:
        assert r["alloc_tokens"] == 1_000_000 * r["src_tokens"] // total


# ---------------------------------------------------------------------------
# token_chunks
# ---------------------------------------------------------------------------


def test_token_chunks_toy_and_edges(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens, c=4 -> 3 chunks
            (2, "solo"),
            (3, ""),  # empty -> no chunks, must not crash
            (4, "   "),  # whitespace-only -> no chunks
        ],
        "doc_id bigint, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
        for r in curation.token_chunks(df, chunk_size=4).collect()
    )
    assert rows == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t4 t5 t6 t7"),
        (1, 2, 2, "t8 t9"),
        (2, 0, 1, "solo"),
    ]


def test_token_chunks_reassemble_fixture(docs):
    """Chunks losslessly partition every document's token stream."""
    sample = docs.filter("doc_id % 10 = 0").select("doc_id", "text")
    chunks = curation.token_chunks(sample, chunk_size=64)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ).getField("chunk_text"),
                " ",
            ).alias("rebuilt")
        )
    )
    orig = sample.select(
        "doc_id",
        F.array_join(
            F.expr("filter(split(text, ' '), x -> x <> '')"), " "
        ).alias("orig"),
    )
    diff = (
        rebuilt.join(orig, "doc_id")
        .filter(F.col("rebuilt") != F.col("orig"))
        .count()
    )
    assert diff == 0
    # chunk sizes: all == 64 except at most one tail per doc
    bad = (
        chunks.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("n_chunk_tokens") < 64, 1).otherwise(0)).alias(
                "n_small"
            )
        )
        .filter(F.col("n_small") > 1)
        .count()
    )
    assert bad == 0


def test_line_dedup_removes_cross_doc_lines_preserving_order(spark):
    df = spark.createDataFrame(
        [
            (1, "unique one\nshared boilerplate\nunique two"),
            (2, "shared boilerplate\nonly in two"),
            (3, "only in three\n\nshared boilerplate"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in curation.line_dedup(df, min_dup_docs=2).collect()
    }
    # the shared line vanishes everywhere; survivors keep their order,
    # and doc 3's empty line (below min_chars) is untouched
    assert out == {
        1: "unique one\nunique two",
        2: "only in two",
        3: "only in three\n",
    }


def test_line_dedup_fully_duplicated_doc_becomes_empty(spark):
    df = spark.createDataFrame(
        [(1, "same line"), (2, "same line"), (3, "other")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in curation.line_dedup(df, min_dup_docs=2).collect()
    }
    assert out == {1: "", 2: "", 3: "other"}


def test_line_dedup_threshold_counts_docs_not_occurrences(spark):
    # the repeated line lives in ONE doc only: with min_dup_docs=2 it
    # survives (cross-doc repetition is the signal, not within-doc)
    df = spark.createDataFrame(
        [(1, "again\nagain"), (2, "solo")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["text"]
        for r in curation.line_dedup(df, min_dup_docs=2).collect()
    }
    assert out == {1: "again\nagain", 2: "solo"}


def test_dedup_spans_matches_duckdb_on_fixture(docs):
    """Cross-engine: chunk-level span dedup counts equal DuckDB's
    EXCEPT-style recomputation on the sf fixture."""
    import duckdb

    chunks = curation.token_chunks(docs, chunk_size=4)
    kept = curation.dedup_spans(chunks, min_dup_docs=2)
    got = kept.count()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.execute(
        "SELECT SUM(n_kept_chunks) FROM ("
        + curation.span_dedup_oracle(chunk_size=4, min_dup_docs=2)
        + ")"
    ).fetchone()[0]
    assert got == want
