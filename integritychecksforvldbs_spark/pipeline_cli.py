"""Corpus-curation pipeline CLI — the runnable counterpart of the
``curate_funnel`` report: reads a documents table, applies the chosen
stages IN ORDER, writes the curated corpus as parquet plus a
per-stage JSON report.

    python -m integritychecksforvldbs_spark.pipeline_cli \
        --input /data/documents.parquet --output /data/curated \
        --stages markup,quality,dedup,decontaminate,pii,cap \
        --cap-k 1000 [--benchmark /data/eval_suite.parquet]

Stages (any subset, any order):

- ``markup``       strip tags/entities, text := clean_text
- ``quality``      keep docs passing the Gopher composite filter
- ``dedup``        near-dup removal (MinHash-LSH cluster survivors)
- ``semdedup``     SemDeDup semantic near-dup removal over a sibling
  embeddings table (``--embeddings``, rows keyed vec_id ≡ doc_id):
  cluster-bounded cosine pairs → connected-component keepers; every
  non-keeper member is dropped
- ``decontaminate``  drop docs overlapping the benchmark n-grams
  (explicit ``--benchmark`` table, else the self-contained mod split
  — which also drops the benchmark docs themselves, mirroring
  ``curate_funnel``)
- ``redact``       the surgical grade of ``decontaminate``: keep the
  document, cut the benchmark-overlapping spans out of its text
  (only actually-redacted docs get rewritten text)
- ``pii``          redact emails/phones/IPv4 in place
- ``cap``          keep at most ``--cap-k`` docs per source
- ``budget``       keep docs until each source's ``--target-tokens``
  mixture allocation fills (deterministic md5-order prefix)
- ``split``        append a leakage-safe train/val/test ``split``
  column (near-dup clusters never straddle splits) — run it LAST:
  later filter stages would re-derive nothing from it, and the
  assignment should reflect the corpus actually shipped

Every stage is one of the oracle-verified kernels; this module only
composes them (id semi/anti joins + in-place projections) and
records (stage, n_docs, n_tokens) — the monotone funnel every corpus
writeup publishes.  Filters compose as semi-joins on ``doc_id`` so a
stage never re-derives another stage's columns.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import curation, dedup, text
from integritychecksforvldbs_spark.sources.loader import load_any

DEFAULT_STAGES = "markup,quality,dedup,decontaminate,pii,cap"

_NTOK = "CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)"


def _counts(df: DataFrame) -> tuple[int, int]:
    row = df.select(F.expr(_NTOK).alias("_n")).agg(
        F.count("*").alias("d"), F.coalesce(F.sum("_n"), F.lit(0)).alias("t")
    ).first()
    return int(row["d"]), int(row["t"])


def _keep_ids(df: DataFrame, ids: DataFrame) -> DataFrame:
    return df.join(ids.select("doc_id"), "doc_id", "left_semi")


def _drop_ids(df: DataFrame, ids: DataFrame) -> DataFrame:
    return df.join(ids.select("doc_id"), "doc_id", "left_anti")


def apply_stage(
    df: DataFrame,
    stage: str,
    cap_k: int,
    benchmark_df: DataFrame | None,
    decontaminate_n: int = 8,
    contamination_threshold: float = 0.0,
    target_tokens: int = 1_000_000,
    val_per_mille: int = 10,
    test_per_mille: int = 10,
    embeddings_df: DataFrame | None = None,
    sem_threshold: float = 0.8,
    sem_stride: int = 64,
) -> DataFrame:
    if stage == "markup":
        cleaned = text.strip_markup(df).select(
            "doc_id", F.col("clean_text").alias("text")
        )
        return df.drop("text").join(cleaned, "doc_id")
    if stage == "quality":
        keep = text.gopher_filter(df).filter(F.col("keep") == 1)
        return _keep_ids(df, keep)
    if stage == "dedup":
        return dedup.dedup_survivors(df)
    if stage == "semdedup":
        if embeddings_df is None:
            raise ValueError("semdedup stage requires --embeddings")
        pairs = dedup.semantic_dedup_pairs(
            embeddings_df, threshold=sem_threshold, centroid_stride=sem_stride
        ).select(
            F.col("vec_id_a").alias("doc_id_a"),
            F.col("vec_id_b").alias("doc_id_b"),
        )
        keepers = dedup.duplicate_cluster_keepers(pairs)
        return _drop_ids(df, keepers.filter(F.col("doc_id") != F.col("keeper")))
    if stage == "decontaminate":
        # longer grams than the gate default (n=8 vs 3): a corpus-wide
        # shared trigram is noise, a shared 8-gram is leakage; the
        # threshold drops docs whose contaminated-gram fraction
        # exceeds it (0.0 = any 8-gram overlap drops the doc)
        dec = curation.decontaminate(
            df, n=decontaminate_n, benchmark_df=benchmark_df
        )
        out = _drop_ids(
            df, dec.filter(F.col("contamination") > contamination_threshold)
        )
        if benchmark_df is None:
            # self-contained mod split: the benchmark rows themselves
            # leave the training corpus, as in curate_funnel
            out = out.filter(
                F.col("doc_id") % curation.BENCHMARK_MOD_DEFAULT != 0
            )
        return out
    if stage == "redact":
        # surgical alternative to `decontaminate`: keep the document,
        # cut the benchmark-overlapping spans out of its text.  Only
        # ACTUALLY-REDACTED docs get their text swapped — clean docs
        # keep their original bytes (the rebuild whitespace-normalizes,
        # which would break exact-match dedup downstream), and
        # NULL-text docs (absent from the spans output) pass through
        # via the left join instead of being dropped.
        clean = (
            curation.decontaminate_spans(
                df, n=decontaminate_n, benchmark_df=benchmark_df
            )
            .filter(F.col("n_redacted") > 0)
            .select("doc_id", "clean_text")
        )
        out = df.join(clean, "doc_id", "left").withColumn(
            "text", F.coalesce("clean_text", "text")
        ).drop("clean_text")
        if benchmark_df is None:
            # mod-split benchmark rows survive the left join with
            # their original text — exclude them from the corpus,
            # as the decontaminate stage does
            out = out.filter(
                F.col("doc_id") % curation.BENCHMARK_MOD_DEFAULT != 0
            )
        return out
    if stage == "pii":
        return curation.pii_redact(df)
    if stage == "cap":
        return _keep_ids(df, curation.cap_per_source(df, k=cap_k))
    if stage == "budget":
        kept = curation.budget_fill(df, target_tokens=target_tokens).filter("kept")
        return _keep_ids(df, kept)
    if stage == "split":
        return curation.leakage_safe_split(
            df, val_per_mille=val_per_mille, test_per_mille=test_per_mille
        ).drop("rep")
    raise ValueError(f"unknown stage {stage!r}")


def curate(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    stages: list[str],
    cap_k: int = 1000,
    benchmark_path: str | None = None,
    embeddings_path: str | None = None,
    input_fmt: str | None = None,
    decontaminate_n: int = 8,
    contamination_threshold: float = 0.0,
    target_tokens: int = 1_000_000,
    val_per_mille: int = 10,
    test_per_mille: int = 10,
    sem_threshold: float = 0.8,
    sem_stride: int = 64,
) -> list[dict]:
    def _load(path: str, fmt: str | None) -> DataFrame:
        # extensionless paths are the lake default: parquet directories
        try:
            return load_any(spark, path, fmt=fmt)
        except ValueError:
            return load_any(spark, path, fmt="parquet")

    df = _load(input_path, input_fmt)
    benchmark_df = _load(benchmark_path, None) if benchmark_path else None
    embeddings_df = _load(embeddings_path, None) if embeddings_path else None
    report = []
    d, t = _counts(df)
    report.append({"stage": "raw", "n_docs": d, "n_tokens": t})
    prev = None
    for stage in stages:
        df = apply_stage(
            df,
            stage,
            cap_k,
            benchmark_df,
            decontaminate_n=decontaminate_n,
            contamination_threshold=contamination_threshold,
            target_tokens=target_tokens,
            val_per_mille=val_per_mille,
            test_per_mille=test_per_mille,
            embeddings_df=embeddings_df,
            sem_threshold=sem_threshold,
            sem_stride=sem_stride,
        ).persist()
        d, t = _counts(df)  # materializes the persist
        if prev is not None:
            prev.unpersist()
        prev = df
        report.append({"stage": stage, "n_docs": d, "n_tokens": t})
    df.write.mode("overwrite").parquet(output_path)
    if prev is not None:
        prev.unpersist()
    with open(f"{output_path}/_curation_report.json", "w") as f:
        json.dump(report, f, indent=1)
    return report


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="pipeline_cli", description=__doc__.splitlines()[0]
    )
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--stages", default=DEFAULT_STAGES)
    ap.add_argument("--cap-k", type=int, default=1000)
    ap.add_argument("--benchmark", default=None, help="eval-suite table")
    ap.add_argument(
        "--embeddings",
        default=None,
        help="embeddings table for the semdedup stage (vec_id ≡ doc_id)",
    )
    ap.add_argument("--sem-threshold", type=float, default=0.8)
    ap.add_argument("--sem-stride", type=int, default=64)
    ap.add_argument("--decontaminate-n", type=int, default=8)
    ap.add_argument(
        "--contamination-threshold",
        type=float,
        default=0.0,
        help="drop docs with contaminated-gram fraction above this",
    )
    ap.add_argument("--input-format", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument(
        "--target-tokens",
        type=int,
        default=1_000_000,
        help="mixture token budget for the budget stage",
    )
    ap.add_argument("--val-per-mille", type=int, default=10)
    ap.add_argument("--test-per-mille", type=int, default=10)
    args = ap.parse_args(argv)

    from integritychecksforvldbs_spark.session import get_spark

    spark = get_spark(
        app_name="curation-pipeline",
        **(
            {"shuffle_partitions": args.shuffle_partitions}
            if args.shuffle_partitions
            else {}
        ),
    )
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    report = curate(
        spark,
        args.input,
        args.output,
        stages,
        cap_k=args.cap_k,
        benchmark_path=args.benchmark,
        embeddings_path=args.embeddings,
        input_fmt=args.input_format,
        decontaminate_n=args.decontaminate_n,
        contamination_threshold=args.contamination_threshold,
        target_tokens=args.target_tokens,
        val_per_mille=args.val_per_mille,
        test_per_mille=args.test_per_mille,
        sem_threshold=args.sem_threshold,
        sem_stride=args.sem_stride,
    )
    for row in report:
        print(f"{row['stage']:>14}: {row['n_docs']:>9} docs  {row['n_tokens']:>12} tokens")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
