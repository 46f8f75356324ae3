"""Corpus-curation kernels for training-data pipelines (north star).

The operators a 100 TB pretraining-data pipeline runs between raw
ingest and tokenization, each expressed as built-in JVM DataFrame
ops with a DuckDB oracle computing the identical value:

- **decontaminate** — benchmark n-gram overlap: flag every training
  document that shares at least one word n-gram with a held-out
  benchmark set.  The benchmark gram set is orders of magnitude
  smaller than the corpus, so it broadcasts; the corpus side stays
  a single scan + one shuffle for the per-doc counts.
- **cap_per_source** — keep at most K documents per source under a
  deterministic md5 priority (the standard "domain cap" in web-corpus
  curation).  One hash shuffle on ``source``; the window never sees
  more than one source per partition.
- **mixture_allocation** — per-source token counts → integer token
  budgets proportional to corpus share (the sampling-weight table a
  mixture loader consumes).  Output is |sources| rows, so the final
  single-partition window is driver-scale by construction.
- **token_chunks** — explode each document into fixed-size token
  chunks (the pre-tokenization packing step).  Entirely row-local:
  chunk boundaries derive from the token array inside the row, so
  the operator is a projection — no shuffle at any corpus size.

All ratios are integer/integer divisions (bitwise-equal doubles
across engines); all counts are BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from integritychecksforvldbs_spark.operators.dedup import shingles

# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    df: DataFrame,
    n: int = 3,
    benchmark_mod: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-overlap decontamination: (doc_id, n_grams,
    n_contaminated, contamination, contaminated).

    Documents whose ``doc_id % benchmark_mod == 0`` form the held-out
    benchmark; every *other* document is scored by how many of its
    distinct word n-grams appear anywhere in the benchmark.  Real
    pipelines pass an explicit benchmark table — the mod split keeps
    the oracle self-contained on one fixture table.

    Scale shape: the benchmark gram set is tiny relative to the
    corpus (eval sets are MBs, corpora are TBs), so it is broadcast
    and the training side is one scan producing (doc_id, shingle)
    plus one hash shuffle for the per-doc counts.  Short documents
    (< n tokens) have no n-grams and are excluded, mirroring the
    shingle kernel's domain.
    """
    is_bench = F.col(id_col) % benchmark_mod == 0
    bench_grams = (
        shingles(df.filter(is_bench), text_col, id_col, n)
        .select("shingle")
        .distinct()
    )
    train = shingles(df.filter(~is_bench), text_col, id_col, n)
    card = train.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_grams"))
    hits = (
        train.join(F.broadcast(bench_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
    out = card.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
    )
    return out.select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        (F.col("n_contaminated") / F.col("n_grams")).alias("contamination"),
        F.when(F.col("n_contaminated") > 0, 1).otherwise(0).cast("int").alias(
            "contaminated"
        ),
    )


def decontaminate_oracle(
    table: str = "documents", n: int = 3, benchmark_mod: int = 20
) -> str:
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, g AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - {n - 2}),
                  i -> array_to_string(string_split(text, ' ')[i:i+{n - 1}], ' '))) AS g
    FROM {table}
    WHERE len(string_split(text, ' ')) >= {n})
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {benchmark_mod} = 0),
train AS (SELECT * FROM sh WHERE doc_id % {benchmark_mod} <> 0),
card AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM train GROUP BY 1),
hits AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
  FROM train t JOIN bench b ON t.shingle = b.shingle GROUP BY 1)
SELECT c.doc_id, c.n_grams,
       CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       COALESCE(h.n_contaminated, 0) / c.n_grams AS contamination,
       CAST(CASE WHEN COALESCE(h.n_contaminated, 0) > 0 THEN 1 ELSE 0 END AS INT)
         AS contaminated
FROM card c LEFT JOIN hits h ON c.doc_id = h.doc_id
"""


# ---------------------------------------------------------------------------
# per-source caps
# ---------------------------------------------------------------------------


def cap_per_source(
    df: DataFrame,
    k: int = 100,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``k`` documents per source: (doc_id, source,
    source_rank).

    Priority is ``md5(doc_id)`` — a deterministic uniform shuffle, so
    the kept set is an unbiased per-source sample that is stable
    across runs and engines (doc_id tie-break makes the order total).

    Scale shape: one hash shuffle on ``source``; rank is computed
    per-partition.  A pathologically dominant source (> one executor's
    worth of rows) would need the two-phase local-top-k variant the
    similarity module uses; at the typical web-corpus source
    cardinality (domains), AQE's skew handling covers it.
    """
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
        )
        .withColumn("source_rank", F.row_number().over(w))
        .filter(F.col("source_rank") <= k)
    )


def cap_per_source_oracle(table: str = "documents", k: int = 100) -> str:
    return f"""
SELECT doc_id, source, source_rank FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS source_rank
  FROM {table}) t
WHERE source_rank <= {k}
"""


# ---------------------------------------------------------------------------
# mixture allocation
# ---------------------------------------------------------------------------


def mixture_allocation(
    df: DataFrame,
    target_tokens: int = 1_000_000,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token budgets for a target mixture size: (source,
    src_tokens, alloc_tokens) where ``alloc_tokens = target *
    src_tokens DIV total_tokens`` — exact integer arithmetic, so both
    engines agree bit-for-bit and the allocations never exceed the
    target in sum.

    Scale shape: the token count is a map-side-combined SUM per
    source; the "grand total" window runs on the aggregated relation
    (|sources| rows), so collapsing it to one partition is free.
    """
    n_tokens = F.expr(
        f"CAST(size(filter(split({text_col}, ' '), x -> x <> '')) AS BIGINT)"
    )
    per = (
        df.select(F.col(source_col).alias("source"), n_tokens.alias("n"))
        .groupBy("source")
        .agg(F.sum("n").cast("long").alias("src_tokens"))
    )
    return per.withColumn(
        "alloc_tokens",
        F.expr(
            f"CAST({target_tokens} AS BIGINT) * src_tokens DIV "
            f"SUM(src_tokens) OVER ()"
        ),
    )


def mixture_allocation_oracle(
    table: str = "documents", target_tokens: int = 1_000_000
) -> str:
    return f"""
WITH per AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
           AS src_tokens
  FROM {table} GROUP BY source)
SELECT source, src_tokens,
       CAST({target_tokens} AS BIGINT) * src_tokens // SUM(src_tokens) OVER ()
         AS alloc_tokens
FROM per
"""


# ---------------------------------------------------------------------------
# token chunking
# ---------------------------------------------------------------------------


def token_chunks(
    df: DataFrame,
    chunk_size: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token chunks per document: (doc_id, chunk_idx,
    n_chunk_tokens, chunk_text).

    Entirely row-local (tokenize → integer chunk count → explode →
    slice), so the operator is a flatMap-shaped projection: no
    shuffle, pipelines behind the scan at any corpus size.  The chunk
    count is ``(n + chunk_size - 1) DIV chunk_size`` in exact integer
    arithmetic.  The sequence expression is guarded with ``when`` —
    Catalyst's constraint inference can evaluate expressions on rows
    a preceding filter excludes (see shingle_arrays), so it must be
    total on empty documents.
    """
    c = chunk_size
    toks = F.expr(f"filter(split({text_col}, ' '), x -> x <> '')")
    n = F.size(toks)
    n_chunks = F.expr(
        f"(size(filter(split({text_col}, ' '), x -> x <> '')) + {c - 1}) DIV {c}"
    )
    idxs = F.when(n > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.filter(n > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            toks.alias("_toks"),
            F.explode(idxs).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.least(
                F.lit(c), F.size("_toks") - F.col("chunk_idx") * c
            ).cast("long").alias("n_chunk_tokens"),
            F.array_join(
                F.slice("_toks", F.col("chunk_idx") * c + 1, c), " "
            ).alias("chunk_text"),
        )
    )


def token_chunks_oracle(table: str = "documents", chunk_size: int = 64) -> str:
    c = chunk_size
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM {table}),
e AS (
  SELECT doc_id, toks,
         unnest(range(0, (len(toks) + {c - 1}) // {c})) AS chunk_idx
  FROM t WHERE len(toks) > 0)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(LEAST({c}, len(toks) - chunk_idx * {c}) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[chunk_idx * {c} + 1 : chunk_idx * {c} + {c}], ' ')
         AS chunk_text
FROM e
"""
