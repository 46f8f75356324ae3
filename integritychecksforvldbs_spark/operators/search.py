"""Keyword retrieval over the document corpus (north star extension).

BM25 (Robertson/Spärck Jones; the Lucene ``k1``/``b`` variant with the
non-negative ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf) as a pure
DataFrame pipeline — the retrieval side of a training-data stack
(query-based corpus audits, contamination probes, eval-set mining).

Plan shape, built for 100 TB:

- the corpus scalars (``N``, ``avgdl``) are an explicit one-row
  pre-pass (:func:`corpus_stats`) inlined as literals — exactly the
  statistics a search index precomputes once; pass them in and every
  query costs ONE corpus scan;
- the query's term set is tiny and inlined as a literal ``IN`` list —
  the per-document token filter is row-local, so the only exploded
  rows that ever reach a shuffle are *query-term* occurrences, a
  vanishing fraction of the corpus token stream;
- document length (``dl``) is computed row-locally from the same
  ``regexp_extract_all`` array (no explode, no second scan);
- ``(doc, term)`` term frequencies are one map-side-combined groupBy;
  document frequency is a ``count() OVER (PARTITION BY token)`` window
  on that already-candidate-sized stream — NOT a recomputed branch, so
  the corpus is never rescanned (the naive two-branch formulation
  triples the scan count; plan-pinned by tests);
- top-k is ``orderBy(...).limit(k)`` — Spark plans
  TakeOrderedAndProject (per-partition heaps, no global sort); the
  rank column is a window over the already-collected k rows.

Cross-engine determinism: scores are ROUNDed to ``round_to`` decimals
and the ordering key is the *rounded* score (ties broken by doc_id),
so Spark and DuckDB agree even when their ``ln`` differs in the last
ulp.  The reference has no retrieval surface; this module extends the
engine's text family (SURVEY §2 north-star scope).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators.text import TOKEN_REGEX, _spark_re

K1_DEFAULT = 1.2
B_DEFAULT = 0.75

_PY_TOKEN_RE = re.compile("[a-z]+|[0-9]|[^a-z0-9\\s]")


def query_terms(query: str) -> list[str]:
    """Tokenize a query string exactly like the corpus tokenizer
    (TOKEN_REGEX over lowercased text); unique terms, sorted."""
    return sorted(set(_PY_TOKEN_RE.findall(query.lower())))


def _bm25_weight(n_docs: int, avgdl: float, k1: float, b: float):
    """Per-(doc, term) BM25 contribution over columns ``tf``, ``dl``,
    ``df_t`` — shared by the direct-scan and indexed paths so the two
    can never drift."""
    return (
        F.log(
            F.lit(1.0)
            + (F.lit(n_docs) - F.col("df_t") + F.lit(0.5))
            / (F.col("df_t") + F.lit(0.5))
        )
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Top-k of a (doc_id, n_terms_hit, score) frame with a rank
    column: orderBy+limit plans TakeOrderedAndProject; the rank window
    runs over the k surviving rows only."""
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(k)
    rank_w = Window.orderBy(F.col("score").desc(), "doc_id")
    return top.select(
        F.row_number().over(rank_w).cast("long").alias("rank"),
        "doc_id",
        "n_terms_hit",
        "score",
    )


def corpus_stats(
    df: DataFrame, text_col: str = "text"
) -> tuple[int, float]:
    """One-row pre-pass over the corpus: ``(n_docs, avgdl)`` where
    ``dl`` is the regex-token document length.  Compute once per
    corpus (the index-statistics step) and pass to every
    :func:`bm25_scores` / :func:`bm25_topk` call — each query then
    costs a single corpus scan."""
    dl = F.expr(
        f"CAST(size(regexp_extract_all(lower({text_col}),"
        f" '{_spark_re(TOKEN_REGEX)}', 0)) AS BIGINT)"
    )
    row = df.select(dl.alias("dl")).agg(
        F.count("*").cast("long").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n_docs"]), float(row["avgdl"])


def bm25_scores(
    df: DataFrame,
    query: str,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """BM25 score for every document matching ≥1 query term:
    ``(doc_id, n_terms_hit, score)``.

    Documents hitting no term are absent (score 0 by definition);
    unknown query terms contribute nothing in either engine.
    ``stats`` is the :func:`corpus_stats` pair; omitted, it is
    computed here (one extra pre-pass).
    """
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no tokens")
    n_docs, avgdl = stats if stats is not None else corpus_stats(df, text_col)
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{_spark_re(TOKEN_REGEX)}', 0)"
    )
    # Column-API filter, not SQL interpolation: punctuation tokens
    # ("don't" tokenizes to a bare quote) must not break the plan
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).select(
        "doc_id",
        F.expr("CAST(size(toks) AS BIGINT)").alias("dl"),
        F.filter("toks", lambda x: x.isin(terms)).alias("qtoks"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("qtoks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"), F.min("dl").alias("dl"))
    )
    tfd = tf.withColumn(
        "df_t", F.count("*").over(Window.partitionBy("token")).cast("long")
    )
    return tfd.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_terms_hit"),
        F.round(F.sum(_bm25_weight(n_docs, avgdl, k1, b)), round_to).alias(
            "score"
        ),
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Top-``k`` documents by BM25: ``(rank, doc_id, n_terms_hit,
    score)``, rank 1 = best; rounded-score ties break by doc_id.

    orderBy+limit plans TakeOrderedAndProject; the rank window runs
    over k rows only.
    """
    return _rank_topk(
        bm25_scores(df, query, k1, b, text_col, id_col, round_to, stats), k
    )


def bm25_oracle(
    query: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    table: str = "documents",
    round_to: int = 4,
) -> str:
    """DuckDB SQL computing the identical top-k (rounded scores, same
    tie-break)."""
    terms = query_terms(query)
    # SQL-standard quote doubling: punctuation terms include '
    tlist = ", ".join("'{}'".format(t.replace("'", "''")) for t in terms)
    return f"""
WITH base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '{TOKEN_REGEX}') AS toks
  FROM {table}
),
d AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS dl,
         list_filter(toks, x -> x IN ({tlist})) AS qtoks
  FROM base
),
scal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM d),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf, MIN(dl) AS dl
  FROM (SELECT doc_id, dl, unnest(qtoks) AS token FROM d)
  GROUP BY doc_id, token
),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY token),
scored AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
         ROUND(SUM(
           ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
           * (tf * ({k1} + 1)) / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))
         ), {round_to}) AS score
  FROM tf JOIN dfreq USING (token) CROSS JOIN scal
  GROUP BY doc_id
)
SELECT * FROM (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
         doc_id, n_terms_hit, score
  FROM scored
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# materialized inverted index — query without touching the corpus
# ---------------------------------------------------------------------------

def build_bm25_index(
    spark,
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the inverted index under ``path``: ``postings/``
    ``(token, doc_id, tf, dl)`` written **token-sorted** (range
    exchange + within-file sort, so every file covers a disjoint token
    range and a query's ``token IN (...)`` predicate skips whole files
    via footer min/max + row-group pushdown), ``dfreq/`` ``(token,
    df_t)`` (vocabulary-sized), and ``stats/`` (one row: ``n_docs``,
    ``avgdl``).

    Build cost: one corpus scan, one explode, one (doc,token) groupBy,
    one vocabulary groupBy — then every query runs WITHOUT the corpus:
    its cost is the pruned postings read, which for natural-language
    vocabularies is a vanishing slice of the index.
    """
    from integritychecksforvldbs_spark.sources.maintenance import (
        write_stats_friendly,
    )

    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{_spark_re(TOKEN_REGEX)}', 0)"
    )
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).select(
        "doc_id",
        F.expr("CAST(size(toks) AS BIGINT)").alias("dl"),
        F.explode("toks").alias("token"),
    )
    postings = (
        base.groupBy("token", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"), F.min("dl").alias("dl"))
    )
    n_out = max(1, spark.sparkContext.defaultParallelism // 2)
    write_stats_friendly(
        spark,
        postings.repartitionByRange(n_out, "token").sortWithinPartitions(
            "token", "doc_id"
        ),
        f"{path}/postings",
    )
    postings_r = spark.read.parquet(f"{path}/postings")
    write_stats_friendly(
        spark,
        postings_r.groupBy("token")
        .agg(F.count("*").cast("long").alias("df_t"))
        .coalesce(1),
        f"{path}/dfreq",
    )
    # stats MUST come from the corpus, not the postings: zero-token
    # documents produce no postings but still count toward N and avgdl
    # — deriving from postings would silently diverge indexed scores
    # from bm25_topk on corpora containing empty documents.
    n_docs, avgdl = corpus_stats(df, text_col)
    write_stats_friendly(
        spark,
        spark.createDataFrame(
            [(n_docs, avgdl)], "n_docs long, avgdl double"
        ),
        f"{path}/stats",
    )


def bm25_topk_indexed(
    spark,
    index_path: str,
    query: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_to: int = 4,
) -> DataFrame:
    """Top-k BM25 from a :func:`build_bm25_index` layout — identical
    output contract to :func:`bm25_topk` (equality is pinned by
    tests), but the corpus is never read: the query plans a pruned
    scan of ``postings/`` (``token IN`` reaches the parquet reader as
    a pushed filter over token-sorted files) joined broadcast with the
    matching ``dfreq/`` rows.

    Caveat (documented contract): like every index, results reflect
    the corpus AS OF the build.
    """
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no tokens")
    row = spark.read.parquet(f"{index_path}/stats").collect()[0]
    n_docs, avgdl = int(row["n_docs"]), float(row["avgdl"])
    postings = spark.read.parquet(f"{index_path}/postings").filter(
        F.col("token").isin(terms)
    )
    dfreq = spark.read.parquet(f"{index_path}/dfreq").filter(
        F.col("token").isin(terms)
    )
    scored = (
        postings.join(F.broadcast(dfreq), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms_hit"),
            F.round(
                F.sum(_bm25_weight(n_docs, avgdl, k1, b)), round_to
            ).alias("score"),
        )
    )
    return _rank_topk(scored, k)
