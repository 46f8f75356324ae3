"""Property-based invariants for the round-4 curation kernels on
random corpora — boundary alignments (doc exactly filling a bin,
chunk-size divisors, all-duplicate corpora) that fixed fixtures
under-sample.

Each property is a structural truth of the operator, not a
re-implementation: packing conserves tokens and fills every non-final
bin exactly; chunk dedup keeps exactly one copy of every distinct
chunk; incremental dedup partitions the increment into the three
statuses consistently with plain set algebra on content hashes.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import curation

# small vocabulary → duplicate chunks and shared hashes are LIKELY
_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_doc = st.tuples(st.integers(min_value=0, max_value=50), _text)


def _docs_df(spark, docs):
    # de-dup ids, keep first text for each (hypothesis may repeat ids)
    seen = {}
    for i, t in docs:
        seen.setdefault(i, t)
    rows = [(i, t, f"s{i % 3}") for i, t in seen.items()]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=1, max_size=12), seq_len=st.sampled_from([3, 4, 7]))
def test_pack_sequences_invariants(spark, docs, seq_len):
    df = _docs_df(spark, docs)
    out = curation.pack_sequences(df, seq_len=seq_len).collect()
    total_tokens = (
        df.select(
            F.expr("size(filter(split(text, ' '), x -> x <> ''))").alias("n")
        ).agg(F.sum("n")).collect()[0][0]
    ) or 0
    assert sum(r["n_tokens"] for r in out) == total_tokens
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        rows.sort(key=lambda r: r["bin_idx"])
        # bins are contiguous from 0 and every non-final bin is full
        assert [r["bin_idx"] for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r["n_tokens"] == seq_len
        assert 1 <= rows[-1]["n_tokens"] <= seq_len
        for r in rows:
            assert r["n_docs"] >= 1


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=1, max_size=12), chunk=st.sampled_from([2, 3, 5]))
def test_chunk_dedup_keeps_one_copy_per_distinct_chunk(spark, docs, chunk):
    df = _docs_df(spark, docs)
    out = curation.chunk_dedup(df, chunk_size=chunk).collect()
    chunks = curation.token_chunks(df, chunk_size=chunk)
    n_total = chunks.count()
    n_distinct = chunks.select("chunk_text").distinct().count()
    assert sum(r["n_chunks"] for r in out) == n_total
    assert sum(r["n_kept"] for r in out) == n_distinct
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_chunks"]
        assert r["kept_tokens"] >= r["n_kept"]  # every chunk has ≥1 token


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(_text, min_size=0, max_size=8),
    inc=st.lists(_text, min_size=1, max_size=8),
)
def test_dedup_increment_matches_set_algebra(spark, base, inc):
    base_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base)], "doc_id bigint, text string"
    )
    inc_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(inc)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["status"]
        for r in curation.dedup_increment(base_df, inc_df).collect()
    }
    base_set = set(base)
    first_id: dict[str, int] = {}
    for i, t in enumerate(inc):
        first_id.setdefault(t, 100 + i)
    want = {}
    for i, t in enumerate(inc):
        did = 100 + i
        if t in base_set:
            want[did] = "dup_of_base"
        elif did > first_id[t]:
            want[did] = "dup_in_increment"
        else:
            want[did] = "new"
    assert got == want
