"""Span-level decontamination (curation.decontaminate_spans)."""

from __future__ import annotations

import pytest

from integritychecksforvldbs_spark.operators import curation

BENCH = "the secret benchmark answer is forty two exactly"
DOCS = [
    # benchmark doc (id % 20 == 0)
    (0, BENCH),
    # quotes the benchmark mid-document
    (1, f"intro words then {BENCH} and a clean tail here"),
    # two separate quotes -> two spans
    (2, f"{BENCH} filler one filler two filler {BENCH}"),
    # no overlap
    (3, "completely unrelated clean document text with many words"),
    # shorter than n tokens
    (4, "tiny doc"),
]


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in curation.decontaminate_spans(df, n=8).collect()
    }


def test_bench_doc_excluded(out):
    assert 0 not in out


def test_quoted_span_redacted_surroundings_kept(out):
    r = out[1]
    assert r["clean_text"] == "intro words then [REDACTED] and a clean tail here"
    assert r["n_spans"] == 1
    assert r["n_redacted"] == len(BENCH.split())
    assert r["n_tokens"] == len(DOCS[1][1].split())


def test_two_quotes_two_spans(out):
    r = out[2]
    assert r["n_spans"] == 2
    assert r["clean_text"] == (
        "[REDACTED] filler one filler two filler [REDACTED]"
    )


def test_clean_doc_unchanged(out):
    r = out[3]
    assert r["clean_text"] == DOCS[3][1]
    assert r["n_redacted"] == 0 and r["n_spans"] == 0


def test_short_doc_passes_through(out):
    r = out[4]
    assert r["clean_text"] == "tiny doc" and r["n_redacted"] == 0


def test_explicit_benchmark_df(spark):
    df = spark.createDataFrame(
        [(7, f"leading {BENCH} trailing")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(99, BENCH)], "doc_id long, text string")
    r = curation.decontaminate_spans(df, n=8, benchmark_df=bench).collect()[0]
    assert r["clean_text"] == "leading [REDACTED] trailing"


def test_quote_bearing_replacement(spark):
    df = spark.createDataFrame(
        [(7, f"leading {BENCH} trailing")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(99, BENCH)], "doc_id long, text string")
    r = curation.decontaminate_spans(
        df, n=8, benchmark_df=bench, replacement="<it's-cut>"
    ).collect()[0]
    assert r["clean_text"] == "leading <it's-cut> trailing"


def test_redact_stage_preserves_clean_and_null_text(spark):
    """Pipeline redact stage: clean docs keep their original BYTES
    (no whitespace renormalization) and NULL-text docs survive."""
    from integritychecksforvldbs_spark.pipeline_cli import apply_stage

    df = spark.createDataFrame(
        [
            (1, f"intro {BENCH} outro", "s"),
            (2, "odd  spacing   inside here kept byte identical", "s"),
            (3, None, "s"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame([(99, BENCH)], "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in apply_stage(
        df, "redact", cap_k=10, benchmark_df=bench
    ).collect()}
    assert out[1] == "intro [REDACTED] outro"
    assert out[2] == "odd  spacing   inside here kept byte identical"
    assert 3 in out and out[3] is None
