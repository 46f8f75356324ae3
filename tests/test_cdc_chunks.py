"""Content-defined chunking (curation.content_defined_chunks):
python-reference parity, insertion robustness, degenerate docs."""

from __future__ import annotations

import hashlib

import pytest

from integritychecksforvldbs_spark.operators import curation

W = curation.CDC_WINDOW
B = curation.CDC_BASE
M = curation.CDC_MOD
D = curation.CDC_DIVISOR

T1 = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the deep dark forest tonight"
)
T2 = "PREFIX " + T1


def _py_chunks(text: str) -> list[str]:
    n = len(text)
    bounds = [0]
    for i in range(W, n + 1):
        h = 0
        for c in text[i - W:i]:
            h = (h * B + ord(c)) % M
        if h % D == 0 and i < n:
            bounds.append(i)
    bounds.append(n)
    return [text[a:b] for a, b in zip(bounds, bounds[1:])]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, T1), (2, T2), (3, "tiny"), (4, None), (5, "")],
        "doc_id long, text string",
    )


def test_chunks_match_python_reference(docs):
    got = {}
    for r in curation.content_defined_chunks(docs).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_len"], r["chunk_hash"])
        )
    for doc_id, text in ((1, T1), (2, T2), (3, "tiny")):
        want = [
            (i, len(c), hashlib.md5(c.encode()).hexdigest())
            for i, c in enumerate(_py_chunks(text))
        ]
        assert sorted(got[doc_id]) == want, doc_id
    assert 4 not in got and 5 not in got  # NULL/empty excluded


def test_insertion_robustness(docs):
    """A head insertion re-synchronizes: the shifted doc still shares
    trailing chunks with the original — fixed-offset chunking would
    share none."""
    rows = curation.content_defined_chunks(docs).collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    assert h1 & h2, "content-defined boundaries must re-sync"
    # fixed-size chunks of the same two texts share nothing
    fixed1 = {T1[i:i + D] for i in range(0, len(T1), D)}
    fixed2 = {T2[i:i + D] for i in range(0, len(T2), D)}
    assert not (fixed1 & fixed2)


def test_short_doc_single_chunk(docs):
    rows = [
        r for r in curation.content_defined_chunks(docs).collect()
        if r["doc_id"] == 3
    ]
    assert len(rows) == 1 and rows[0]["chunk_len"] == 4


def test_content_chunk_dedup_counts(docs):
    out = {
        r["chunk_hash"]: (r["n_occurrences"], r["first_doc_id"])
        for r in curation.content_chunk_dedup(docs).collect()
    }
    shared = [
        h for h, (n, _first) in out.items() if n > 1
    ]
    assert shared  # the re-synced tail chunk appears in docs 1 and 2
    for h in shared:
        assert out[h][1] == 1  # deterministic first owner


def test_cdc_kernel_matches_expression_path(spark):
    """The NumPy kernel (bigint ids) and the expression path (forced
    via an int id) produce identical chunk rows — including unicode
    code points, sub-window docs, empty and NULL texts."""
    from pyspark.sql import functions as F

    from integritychecksforvldbs_spark.sources.loader import load_table

    df = load_table(spark, "/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [
            (900001, "héllo wörld é" * 40),  # non-ASCII code points
            (900002, "x"),                   # shorter than the window
            (900003, None),                  # filtered
            (900004, ""),                    # filtered
        ],
        "doc_id long, text string",
    )
    df = df.unionByName(extra)
    fast = curation.content_defined_chunks(df)
    assert "MapInPandas" in fast._jdf.queryExecution().executedPlan().toString()
    slow = curation.content_defined_chunks(
        df.withColumn("doc_id", F.col("doc_id").cast("int"))
    )
    assert "MapInPandas" not in slow._jdf.queryExecution().executedPlan().toString()
    got = {tuple(r) for r in fast.collect()}
    ref = {(int(a), b, c, d) for a, b, c, d in (tuple(r) for r in slow.collect())}
    assert got == ref and len(got) > 0
