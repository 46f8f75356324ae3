"""End-to-end curation pipeline CLI: stages compose, counts are
monotone, the written corpus reflects every stage's contract."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark import pipeline_cli
from integritychecksforvldbs_spark.sources.loader import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_curate_end_to_end(spark, tmp_path):
    out = str(tmp_path / "curated")
    stages = ["quality", "dedup", "decontaminate", "pii", "cap"]
    report = pipeline_cli.curate(
        spark,
        f"{SF_DIR}/documents.parquet",
        out,
        stages,
        cap_k=30,
    )
    assert [r["stage"] for r in report] == ["raw"] + stages
    # monotone through the filter stages; pii rewrites, never drops
    for prev, cur in zip(report, report[1:]):
        assert cur["n_docs"] <= prev["n_docs"]
    i_pii = stages.index("pii") + 1
    assert report[i_pii]["n_docs"] == report[i_pii - 1]["n_docs"]

    curated = load_table(spark, out)
    assert curated.count() == report[-1]["n_docs"]
    # cap respected
    mx = curated.groupBy("source").count().agg(F.max("count")).first()[0]
    assert mx <= 30
    # benchmark rows (mod-20 split) are gone
    assert curated.filter("doc_id % 20 = 0").count() == 0
    # report sidecar written
    rep = json.load(open(f"{out}/_curation_report.json"))
    assert rep == report


def test_curate_markup_stage_rewrites_text(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "<b>bold</b> text here", "s1"), (2, "plain", "s1")],
        "doc_id bigint, text string, source string",
    )
    p = str(tmp_path / "in")
    src.write.mode("overwrite").parquet(p)
    out = str(tmp_path / "out")
    pipeline_cli.curate(spark, p, out, ["markup"])
    got = {r["doc_id"]: r["text"] for r in load_table(spark, out).collect()}
    assert got[1] == "bold text here"
    assert got[2] == "plain"


def test_curate_explicit_benchmark(spark, tmp_path):
    docs = load_table(spark, f"{SF_DIR}/documents.parquet")
    bpath = str(tmp_path / "bench")
    docs.filter("doc_id % 10 = 0").write.mode("overwrite").parquet(bpath)
    out = str(tmp_path / "curated_b")
    pipeline_cli.curate(
        spark,
        f"{SF_DIR}/documents.parquet",
        out,
        ["decontaminate"],
        benchmark_path=bpath,
    )
    curated = load_table(spark, out)
    # with an explicit benchmark the mod-20 rule must NOT apply;
    # benchmark twins (the docs themselves) are dropped as contaminated
    assert curated.filter("doc_id % 10 = 0").count() == 0
    assert curated.filter("doc_id % 20 = 0").count() == 0  # subset of above
    assert curated.count() > 0


def test_unknown_stage_raises(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="unknown stage"):
        pipeline_cli.apply_stage(df, "nope", 10, None)


def test_curate_budget_and_split_stages(spark, tmp_path):
    out = str(tmp_path / "curated_bs")
    report = pipeline_cli.curate(
        spark,
        f"{SF_DIR}/documents.parquet",
        out,
        ["quality", "budget", "split"],
        target_tokens=5_000,
        val_per_mille=100,
        test_per_mille=100,
    )
    # budget is a filter; split only appends a column
    assert report[2]["n_docs"] <= report[1]["n_docs"]
    assert report[3]["n_docs"] == report[2]["n_docs"]
    # the budget stage genuinely bounded the corpus: kept tokens land
    # near the target (each source overshoots by at most one doc)
    assert report[2]["n_tokens"] < report[1]["n_tokens"]

    curated = load_table(spark, out)
    assert "split" in curated.columns and "rep" not in curated.columns
    splits = {r["split"] for r in curated.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_redact_stage_keeps_docs_and_cuts_spans(spark):
    from integritychecksforvldbs_spark.pipeline_cli import apply_stage

    bench_text = "the secret benchmark answer is forty two exactly"
    df = spark.createDataFrame(
        [
            (1, f"intro {bench_text} outro", "s0"),
            (2, "a clean document with plenty of words here", "s0"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(99, bench_text)], "doc_id long, text string"
    )
    out = apply_stage(df, "redact", cap_k=10, benchmark_df=bench)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[1] == "intro [REDACTED] outro"   # doc KEPT, span cut
    assert got[2] == df.collect()[1]["text"]
    assert set(out.columns) == {"doc_id", "text", "source"}


def test_semdedup_stage_drops_non_keepers(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(6)], "doc_id long, text string"
    )
    dpath = str(tmp_path / "docs")
    docs.write.parquet(dpath)
    # vec_id ≡ doc_id: 0/1/2 form one semantic group, 4/5 another;
    # doc 3 sits between topics (kept)
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.99, 0.01, 0.0]),
            (2, [0.98, 0.02, 0.0]),
            (3, [0.6, 0.0, 0.8]),
            (4, [0.0, 0.0, 1.0]),
            (5, [0.0, 0.01, 0.99]),
        ],
        "vec_id long, embedding array<float>",
    )
    epath = str(tmp_path / "emb")
    emb.write.parquet(epath)
    out = str(tmp_path / "out")
    report = pipeline_cli.curate(
        spark,
        dpath,
        out,
        ["semdedup"],
        embeddings_path=epath,
        sem_threshold=0.95,
        sem_stride=4,
    )
    kept = {r["doc_id"] for r in load_table(spark, out).collect()}
    # each group keeps its min id; the between-topics doc survives
    assert kept == {0, 3, 4}
    assert report[-1]["n_docs"] == 3


def test_semdedup_stage_requires_embeddings(spark):
    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(ValueError, match="embeddings"):
        pipeline_cli.apply_stage(docs, "semdedup", 10, None)
