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
- **pii_scrub** — regex PII detection + redaction (emails, NANP
  phone shapes, IPv4) with per-doc counts and a redacted-text
  digest.  Patterns avoid backslash classes so Java regex (Spark)
  and RE2 (DuckDB) agree literally; pure projection, no shuffle.
- **chunk_dedup** — corpus-level duplicate-chunk removal (the C4
  "repeated span" step at chunk granularity): the first occurrence
  of each chunk text keeps, every later copy drops.  First-owner is a
  map-side-combinable MIN per chunk (NOT a row_number window — a
  boilerplate chunk with 10^9 copies would serialize one reducer).
- **dedup_increment** — dedup a new batch against an existing
  corpus WITHOUT shuffling the corpus: the increment's hash set
  broadcasts to a semi-join scan of the base (100 TB side moves
  zero bytes), matched hashes come back driver-scale, and only the
  increment is ever shuffled.
- **pack_sequences** — GPT-style sequence packing: concatenate a
  source's documents in a deterministic order and split every
  ``seq_len`` tokens; emit per-bin document/token occupancy.  One
  window sort per source; all boundary arithmetic is exact integer.

All ratios are integer/integer divisions (bitwise-equal doubles
across engines); all counts are BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from integritychecksforvldbs_spark.operators import dedup

# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


BENCHMARK_MOD_DEFAULT = 20  # the self-contained benchmark mod split


def decontaminate(
    df: DataFrame,
    n: int = 3,
    benchmark_mod: int = BENCHMARK_MOD_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_df: DataFrame | None = None,
) -> DataFrame:
    """Benchmark-overlap decontamination: (doc_id, n_grams,
    n_contaminated, contamination, contaminated).

    Documents whose ``doc_id % benchmark_mod == 0`` form the held-out
    benchmark; every *other* document is scored by how many of its
    distinct word n-grams appear anywhere in the benchmark.  Real
    pipelines pass an explicit benchmark table — ``benchmark_df``
    does exactly that (every row of ``df`` is then scored and the mod
    split is ignored); the default mod split keeps the oracle
    self-contained on one fixture table.  The benchmark set should be
    the IMMUTABLE eval suite, never a derived subset: a pipeline that
    decontaminates against a pool its own dedup already shrank can
    silently lose the benchmark doc and stop flagging its twins.

    Scale shape: the benchmark gram set is tiny relative to the
    corpus (eval sets are MBs, corpora are TBs), so it is broadcast
    and the training side is one scan producing (doc_id, shingle)
    plus one hash shuffle for the per-doc counts.  Short documents
    (< n tokens) have no n-grams and are excluded, mirroring the
    shingle kernel's domain.
    """
    if benchmark_df is None:
        is_bench = F.col(id_col) % benchmark_mod == 0
        bench_src = df.filter(is_bench)
        train_src = df.filter(~is_bench)
    else:
        bench_src = benchmark_df
        train_src = df

    # Work on HASHED grams (dedup.hashed_shingle_arrays): the broadcast
    # bench set carries 8-byte longs instead of n-token strings and the
    # probe compares longs — same counts as string matching (equal
    # n-grams hash equal; a cross-gram collision is ~1e-15/doc).
    #
    # Persist the per-doc ARRAY form before exploding, same as the
    # brute dedup tiers: the train grams feed TWO aggregations (card +
    # hits), and — decisive even single-consumer — cache substitution
    # happens before the optimizer, so InferFiltersFromGenerate's
    # synthesized size(shl) > 0 filter lands on the cached arrays
    # instead of re-inlining the whole gram builder (tokenizer inside
    # the lambda, quadratic) into the scan's single-core DataFilter
    # (measured 9.7 s -> 0.13 s for the train grams at sf0.1).
    def _grams(src: DataFrame) -> DataFrame:
        return (
            dedup.hashed_shingle_arrays(src, text_col, id_col, n)
            .persist()
            .select("doc_id", F.explode("shl").alias("shingle"))
        )

    bench_grams = _grams(bench_src).select("shingle").distinct()
    train = _grams(train_src)
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
    tokens_expr: str | None = None,
) -> DataFrame:
    """Per-source token budgets for a target mixture size: (source,
    src_tokens, alloc_tokens) where ``alloc_tokens = target *
    src_tokens DIV total_tokens`` — exact integer arithmetic, so both
    engines agree bit-for-bit and the allocations never exceed the
    target in sum.

    Scale shape: the token count is a map-side-combined SUM per
    source; the "grand total" window runs on the aggregated relation
    (|sources| rows), so collapsing it to one partition is free.

    ``tokens_expr`` swaps the tokenization: any SQL expression
    yielding a per-row BIGINT token count (e.g. a BPE-proxy
    ``CAST(ceil(length(text) / 4.0) AS BIGINT)``, or a precomputed
    ``n_bpe_tokens`` column).  Default is the whitespace count every
    oracle-matched kernel uses.
    """
    n_tokens = F.expr(
        tokens_expr
        or f"CAST(regexp_count({text_col}, '[^ ]+') AS BIGINT)"
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
       CAST(CAST({target_tokens} AS BIGINT) * src_tokens
            // SUM(src_tokens) OVER () AS BIGINT) AS alloc_tokens
FROM per
"""


def temperature_mixture(
    df: DataFrame,
    target_tokens: int = 1_000_000,
    temperature: float = 2.0,
    source_col: str = "source",
    text_col: str = "text",
    tokens_expr: str | None = None,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled mixture budgets: ``alloc ∝ src_tokens^(1/T)``
    — the multilingual/multi-source sampling rule (mBERT, XLM-R) that
    lifts low-resource sources above their natural share without the
    head sources drowning them.  ``T=1`` is proportional (exactly
    :func:`mixture_allocation`); ``T→∞`` approaches uniform.

    Determinism contract: weights are computed in ONE float step and
    immediately fixed to integers (``ROUND(w · weight_scale)``), and
    every downstream step (sum, ratio) is integer arithmetic — so both
    engines agree bit-for-bit provided the float step itself does.
    ``T=2`` uses ``SQRT``, which IEEE 754 requires correctly rounded —
    bit-exact everywhere — and is the gate-verified tier; other
    temperatures route through ``POWER``, which carries no such
    guarantee (documented approximate tier).  Int64 headroom:
    ``target_tokens × max(weight) × weight_scale`` must stay under
    2^63 — lower ``weight_scale`` for extreme targets (granularity
    for headroom).

    Scale shape: identical to :func:`mixture_allocation` — one
    map-side-combined SUM per source, then |sources|-row arithmetic.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    n_tokens = F.expr(
        tokens_expr
        or f"CAST(regexp_count({text_col}, '[^ ]+') AS BIGINT)"
    )
    per = (
        df.select(F.col(source_col).alias("source"), n_tokens.alias("n"))
        .groupBy("source")
        .agg(F.sum("n").cast("long").alias("src_tokens"))
    )
    if temperature == 1.0:
        w = "src_tokens"
    elif temperature == 2.0:
        w = (
            f"CAST(ROUND(SQRT(CAST(src_tokens AS DOUBLE)) * {weight_scale}) "
            "AS BIGINT)"
        )
    else:
        w = (
            f"CAST(ROUND(POWER(CAST(src_tokens AS DOUBLE), "
            f"{1.0 / temperature!r}) * {weight_scale}) AS BIGINT)"
        )
    return per.withColumn("weight_scaled", F.expr(w)).withColumn(
        "alloc_tokens",
        F.expr(
            f"CAST({target_tokens} AS BIGINT) * weight_scaled DIV "
            "SUM(weight_scaled) OVER ()"
        ),
    )


def temperature_mixture_oracle(
    table: str = "documents",
    target_tokens: int = 1_000_000,
    weight_scale: int = 1_000_000,
) -> str:
    """DuckDB oracle for the ``T=2`` (SQRT — IEEE-correctly-rounded,
    hence bit-exact cross-engine) tier."""
    return f"""
WITH per AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
           AS src_tokens
  FROM {table} GROUP BY source),
w AS (
  SELECT source, src_tokens,
         CAST(ROUND(SQRT(CAST(src_tokens AS DOUBLE)) * {weight_scale}) AS BIGINT)
           AS weight_scaled
  FROM per)
SELECT source, src_tokens, weight_scaled,
       CAST(CAST({target_tokens} AS BIGINT) * weight_scaled
            // SUM(weight_scaled) OVER () AS BIGINT) AS alloc_tokens
FROM w
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
        f"(regexp_count({text_col}, '[^ ]+') + {c - 1}) DIV {c}"
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


# ---------------------------------------------------------------------------
# end-to-end curation funnel
# ---------------------------------------------------------------------------


def curate_funnel(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    benchmark_mod: int = 20,
    cap_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """The whole curation pipeline as one funnel, reported as
    (stage, n_docs, n_tokens) — the shape every corpus-construction
    writeup publishes:

      raw → quality (Gopher composite keep) → dedup (near-dup cluster
      survivors, minhash-LSH pairs) → decontaminated (benchmark docs
      and benchmark-overlapping docs removed) → capped (per-source K)

    Each stage feeds the next, so counts are monotone non-increasing;
    the per-stage token totals use the whitespace tokenization every
    other kernel uses.  Composition correctness rides on the
    individually-oracle-verified component kernels; the funnel's own
    oracle recomputes the entire chain in SQL (quadratic-pair dedup
    tier + recursive-CTE clustering) and must agree on every stage
    row.

    Scale: the stages run the component plans unchanged (LSH dedup,
    broadcast decontamination, one window per source for the cap);
    the funnel adds only 5 metadata-sized aggregation rows.
    """
    from integritychecksforvldbs_spark.operators import text as text_ops

    # §8 discipline (decide with small rows, move heavy bytes never):
    # every stage row is a (count, token-sum) aggregate over an ID
    # SET, so the text payload is consumed only where a kernel needs
    # it (gopher scoring, LSH shingles, decontamination grams) and is
    # never checkpointed or re-tokenized per stage.  The previous
    # shape localCheckpoint'ed three corpus-sized frames WITH their
    # text and ran regexp_count over the text five times — measured
    # 6.9 s at sf0.1, of which the three eager text materializations
    # were ~2.5 s; the slim form materializes only id frames (8
    # bytes/row) and one (doc_id, n_tokens) frame tokenized ONCE.
    # regexp_count == size(filter(split)) (tokens are exactly the
    # maximal [^ ]+ runs; proven 0 mismatches across all SFs).
    ntok = F.expr(f"CAST(regexp_count({text_col}, '[^ ]+') AS BIGINT)")
    meta = df.select(F.col(id_col).alias("doc_id"), ntok.alias("_n")).persist()

    def stage(name: str, ids: DataFrame | None) -> DataFrame:
        d = meta if ids is None else meta.join(ids, "doc_id", "left_semi")
        return d.agg(
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_tokens"),
        )

    # Stage id sets are monotone shrinking and metadata-sized; each is
    # persisted because two consumers branch off it (the next stage's
    # kernel and this stage's aggregate).  No lineage truncation is
    # needed any more: the cluster-keeper step bounds its own plan
    # (VALUES fast path / internally checkpointed propagation), so the
    # deepest remaining lineage is one kernel chain, not the round-4
    # 12,848-scan compounding that forced the checkpoints.
    keep_ids = (
        text_ops.gopher_filter(df, text_col, id_col)
        .filter(F.col("keep") == 1)
        .select("doc_id")
        .persist()
    )
    quality = df.join(keep_ids, id_col)  # text flows ONLY into the LSH tier
    pairs = dedup.minhash_lsh_pairs(
        quality, n=n, threshold=threshold, text_col=text_col, id_col=id_col
    )
    drops = (
        dedup.duplicate_cluster_keepers(pairs)
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id")
    )
    # survivors = quality ∖ drops, and drops ⊆ quality ids = keep_ids,
    # so the survivor ID set needs no second pass over the corpus
    surv_ids = keep_ids.join(drops, "doc_id", "left_anti").persist()
    # The benchmark set is the IMMUTABLE raw-corpus split — quality
    # filtering or dedup dropping a benchmark doc must not stop its
    # grams from flagging training twins.
    bench = df.filter(F.col(id_col) % benchmark_mod == 0)
    pool = df.join(surv_ids, id_col, "left_semi").filter(
        F.col(id_col) % benchmark_mod != 0
    )
    # decontaminate scores exactly the pool docs with ≥ n tokens, so
    # its kept ids ARE the decontaminated stage's id set (benchmark
    # and short survivors drop out, as the survivors ⋈ clean_ids join
    # did before)
    clean_ids = (
        decontaminate(pool, n, benchmark_mod, text_col, id_col, benchmark_df=bench)
        .filter(F.col("contaminated") == 0)
        .select("doc_id")
        .persist()
    )
    capped_ids = cap_per_source(
        df.select(F.col(id_col), F.col(source_col)).join(
            clean_ids, id_col, "left_semi"
        ),
        cap_k,
        source_col,
        id_col,
    ).select("doc_id")
    return (
        stage("1_raw", None)
        .unionByName(stage("2_quality", keep_ids))
        .unionByName(stage("3_dedup", surv_ids))
        .unionByName(stage("4_decontaminated", clean_ids))
        .unionByName(stage("5_capped", capped_ids))
    )


def curate_funnel_oracle(
    table: str = "documents",
    n: int = 3,
    threshold: float = 0.5,
    benchmark_mod: int = 20,
    cap_k: int = 100,
) -> str:
    from integritychecksforvldbs_spark.operators.dedup import (
        ngram_jaccard_oracle,
    )
    from integritychecksforvldbs_spark.operators.text import gopher_filter_oracle

    ntok = "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)"
    pairs_sql = ngram_jaccard_oracle("quality", n, threshold).strip()
    return f"""
WITH RECURSIVE
g AS ({gopher_filter_oracle(table)}),
quality AS (
  SELECT d.* FROM {table} d JOIN g ON d.doc_id = g.doc_id AND g.keep = 1),
pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
  UNION SELECT doc_id_b, doc_id_a FROM pairs),
reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node),
drops AS (SELECT node FROM reach GROUP BY node HAVING node <> MIN(lbl)),
survivors AS (
  SELECT q.* FROM quality q
  WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.node = q.doc_id)),
bsh AS (
  SELECT DISTINCT g AS shingle FROM (
    SELECT unnest(list_transform(range(1, len(string_split(text, ' ')) - {n - 2}),
                  i -> array_to_string(string_split(text, ' ')[i:i+{n - 1}], ' '))) AS g
    FROM {table}
    WHERE doc_id % {benchmark_mod} = 0
      AND len(string_split(text, ' ')) >= {n})),
tsh AS (
  SELECT DISTINCT doc_id, g AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - {n - 2}),
                  i -> array_to_string(string_split(text, ' ')[i:i+{n - 1}], ' '))) AS g
    FROM survivors
    WHERE doc_id % {benchmark_mod} <> 0
      AND len(string_split(text, ' ')) >= {n})),
scored AS (SELECT DISTINCT doc_id FROM tsh),
hit AS (
  SELECT DISTINCT t.doc_id FROM tsh t JOIN bsh b ON t.shingle = b.shingle),
clean AS (
  SELECT s.* FROM survivors s
  JOIN scored sc ON s.doc_id = sc.doc_id
  WHERE NOT EXISTS (SELECT 1 FROM hit h WHERE h.doc_id = s.doc_id)),
cap AS ({cap_per_source_oracle("clean", cap_k)}),
capped AS (SELECT c.* FROM clean c JOIN cap ON c.doc_id = cap.doc_id)
SELECT '1_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM({ntok}), 0) AS BIGINT) AS n_tokens FROM {table}
UNION ALL SELECT '2_quality', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM({ntok}), 0) AS BIGINT) FROM quality
UNION ALL SELECT '3_dedup', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM({ntok}), 0) AS BIGINT) FROM survivors
UNION ALL SELECT '4_decontaminated', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM({ntok}), 0) AS BIGINT) FROM clean
UNION ALL SELECT '5_capped', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM({ntok}), 0) AS BIGINT) FROM capped
"""


# ---------------------------------------------------------------------------
# PII detection + redaction
# ---------------------------------------------------------------------------

# Backslash-free patterns: identical source text works as a Java regex
# (Spark) and an RE2 regex (DuckDB) with no escaping translation, and
# for these expressions greedy leftmost matching agrees across engines.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Detect and redact PII spans: (doc_id, n_emails, n_phones,
    n_ips, redacted_md5).

    Counts come from the raw text; redaction applies email → phone →
    IPv4 in that order (the classes cannot overlap: emails contain no
    dash-digit groups, phone matches contain no dots).  The compared
    output carries ``md5`` of the redacted text rather than the text
    itself so the gate hash stays small while still pinning every
    replaced byte.

    Scale shape: pure projection over one scan — regex evaluation is
    whole-stage-codegen JVM; nothing shuffles at any corpus size.
    """
    t = text_col
    redacted = (
        f"regexp_replace(regexp_replace(regexp_replace({t}, "
        f"'{EMAIL_RE}', '<EMAIL>'), "
        f"'{PHONE_RE}', '<PHONE>'), "
        f"'{IPV4_RE}', '<IP>')"
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"CAST(size(regexp_extract_all({t}, '{EMAIL_RE}', 0)) AS BIGINT)").alias(
            "n_emails"
        ),
        F.expr(f"CAST(size(regexp_extract_all({t}, '{PHONE_RE}', 0)) AS BIGINT)").alias(
            "n_phones"
        ),
        F.expr(f"CAST(size(regexp_extract_all({t}, '{IPV4_RE}', 0)) AS BIGINT)").alias(
            "n_ips"
        ),
        F.expr(f"md5({redacted})").alias("redacted_md5"),
    )


def pii_scrub_oracle(table: str = "documents") -> str:
    redacted = (
        f"regexp_replace(regexp_replace(regexp_replace(text, "
        f"'{EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{PHONE_RE}', '<PHONE>', 'g'), "
        f"'{IPV4_RE}', '<IP>', 'g')"
    )
    return f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ips,
  md5({redacted}) AS redacted_md5
FROM {table}
"""


# ---------------------------------------------------------------------------
# corpus-level chunk dedup (C4-style repeated-span removal)
# ---------------------------------------------------------------------------

_CHUNK_KEY_BASE = 1_000_000  # doc_id * base + chunk_idx total order


def chunk_dedup(
    df: DataFrame,
    chunk_size: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level duplicate-chunk removal summary: (doc_id,
    n_chunks, n_kept, kept_tokens).

    Every fixed-size token chunk keeps its FIRST occurrence in the
    corpus (first = smallest ``doc_id * 1e6 + chunk_idx``, a total
    order) and drops the rest — chunk-granular C4 span dedup.

    Scale shape: first-owner per chunk is ``MIN(key) GROUP BY
    chunk``, which map-side combines — a chunk duplicated 10^9 times
    costs one long per map partition, where a row_number window would
    sort the entire group on one reducer.  The join back is
    chunk-hash → first-key (two shuffles of the chunk relation
    total); AQE's skew split covers pathological chunk frequencies.
    Assumes < 1e6 chunks per document (64 M tokens at the default
    chunk size) so the encoded key stays collision-free.
    """
    ch = token_chunks(df, chunk_size, text_col, id_col).select(
        "doc_id",
        "chunk_idx",
        "n_chunk_tokens",
        F.md5("chunk_text").alias("ch"),
        (F.col("doc_id") * _CHUNK_KEY_BASE + F.col("chunk_idx")).alias("key"),
    )
    first = ch.groupBy("ch").agg(F.min("key").alias("first_key"))
    kept = F.col("key") == F.col("first_key")
    return (
        ch.join(first, "ch")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chunk_tokens")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


def chunk_dedup_oracle(table: str = "documents", chunk_size: int = 16) -> str:
    base = _CHUNK_KEY_BASE
    return f"""
WITH ch AS (
  SELECT doc_id, chunk_idx, n_chunk_tokens, md5(chunk_text) AS ch,
         doc_id * {base} + chunk_idx AS key
  FROM ({token_chunks_oracle(table, chunk_size)}) c),
f AS (SELECT ch, MIN(key) AS first_key FROM ch GROUP BY ch)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN c.key = f.first_key THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN c.key = f.first_key THEN c.n_chunk_tokens ELSE 0 END) AS BIGINT)
         AS kept_tokens
FROM ch c JOIN f ON c.ch = f.ch
GROUP BY c.doc_id
"""


# ---------------------------------------------------------------------------
# incremental dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------------


def dedup_increment(
    base: DataFrame,
    inc: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_increment: bool = True,
) -> DataFrame:
    """Classify each increment document against an existing corpus:
    (doc_id, status) with status ∈ {'dup_of_base',
    'dup_in_increment', 'new'}.

    The daily-crawl shape: ``base`` is the already-ingested corpus
    (TBs), ``inc`` is the new batch (GBs).  The base side is NEVER
    shuffled — the increment's distinct hash set broadcasts into a
    semi-join against the base scan, and only the matched hashes
    (≤ |increment|) come back.  Set ``broadcast_increment=False``
    when the increment exceeds broadcast size; the same plan runs as
    a shuffled semi-join and everything downstream is unchanged.

    Within the increment, the first copy (smallest id) of a
    hash-group that is NOT in the base stays 'new' and later copies
    are 'dup_in_increment' — so appending ``status='new'`` rows to
    the base keeps the corpus exactly-once.
    """
    inc_h = inc.select(
        F.col(id_col).alias("doc_id"), F.md5(text_col).alias("h")
    )
    probe = inc_h.select("h").distinct()
    if broadcast_increment:
        probe = F.broadcast(probe)
    matched = (
        base.select(F.md5(text_col).alias("h"))
        .join(probe, "h", "left_semi")
        .distinct()
        .withColumn("in_base", F.lit(1))
    )
    first_inc = inc_h.groupBy("h").agg(F.min("doc_id").alias("first_id"))
    out = (
        inc_h.join(F.broadcast(matched), "h", "left")
        .join(first_inc, "h")
        .select(
            "doc_id",
            F.when(F.col("in_base") == 1, F.lit("dup_of_base"))
            .when(F.col("doc_id") > F.col("first_id"), F.lit("dup_in_increment"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )
    return out


def dedup_increment_oracle(base_sql: str, inc_sql: str) -> str:
    return f"""
WITH b AS (SELECT DISTINCT md5(text) AS h FROM {base_sql}),
i AS (SELECT doc_id, md5(text) AS h FROM {inc_sql}),
f AS (SELECT h, MIN(doc_id) AS first_id FROM i GROUP BY h)
SELECT i.doc_id,
       CASE WHEN b.h IS NOT NULL THEN 'dup_of_base'
            WHEN i.doc_id > f.first_id THEN 'dup_in_increment'
            ELSE 'new' END AS status
FROM i LEFT JOIN b ON i.h = b.h JOIN f ON i.h = f.h
"""


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    seq_len: int = 256,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_expr: str | None = None,
) -> DataFrame:
    """GPT-style packing occupancy: concatenate each source's
    documents in a deterministic order (md5 priority, id tie-break),
    split the token stream every ``seq_len`` tokens, and report per
    bin: (source, bin_idx, n_docs, n_tokens).

    A document whose token run crosses a bin boundary contributes to
    every bin it overlaps (``n_docs`` counts contributors, so bins
    spanned by one long document still show 1).  The last bin of a
    source is partial; all earlier bins have exactly ``seq_len``
    tokens — an invariant the tests pin.

    Scale shape: one hash shuffle on source + one window sort per
    source for the running token total; the span explode is
    row-local and the final per-bin aggregation map-side combines.
    A single source serializes its window — at web-corpus source
    cardinality that bounds partitions, not the cluster.

    ``tokens_expr``: optional SQL expression for the per-document
    BIGINT token count (BPE-style counts, precomputed columns);
    default is the whitespace count the DuckDB oracle recomputes.
    """
    L = seq_len
    n = F.expr(
        tokens_expr
        or f"CAST(regexp_count({text_col}, '[^ ]+') AS BIGINT)"
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = (
        df.select(
            F.col(source_col).alias("source"),
            F.col(id_col).alias("doc_id"),
            n.alias("n"),
        )
        .filter(F.col("n") > 0)
        .withColumn("cum", F.sum("n").over(w))
    )
    spans = t.select(
        "source",
        F.explode(
            F.sequence(
                F.expr(f"(cum - n) DIV {L}"), F.expr(f"(cum - 1) DIV {L}")
            )
        ).alias("bin_idx"),
        F.col("cum"),
        F.col("n"),
    )
    in_bin = F.least(F.col("cum"), (F.col("bin_idx") + 1) * L) - F.greatest(
        F.col("cum") - F.col("n"), F.col("bin_idx") * L
    )
    return (
        spans.select("source", "bin_idx", in_bin.alias("tok"))
        .groupBy("source", "bin_idx")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tok").cast("long").alias("n_tokens"),
        )
    )


def pack_sequences_oracle(table: str = "documents", seq_len: int = 256) -> str:
    L = seq_len
    return f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
  FROM {table}),
c AS (
  SELECT source, doc_id, n,
         CAST(SUM(n) OVER (PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM t WHERE n > 0),
s AS (
  SELECT source, cum, n,
         unnest(range((cum - n) // {L}, (cum - 1) // {L} + 1)) AS bin_idx
  FROM c)
SELECT source, bin_idx,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEAST(cum, (bin_idx + 1) * {L}) - GREATEST(cum - n, bin_idx * {L})) AS BIGINT)
         AS n_tokens
FROM s GROUP BY source, bin_idx
"""


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


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Write-side counterpart of :func:`pii_scrub`: the same email →
    phone → IPv4 replacement chain applied IN PLACE on ``text_col``,
    all other columns untouched — the projection a pipeline
    materializes (pii_scrub reports; pii_redact rewrites).  Pure
    shuffle-free projection."""
    t = text_col
    redacted = (
        f"regexp_replace(regexp_replace(regexp_replace({t}, "
        f"'{EMAIL_RE}', '<EMAIL>'), "
        f"'{PHONE_RE}', '<PHONE>'), "
        f"'{IPV4_RE}', '<IP>')"
    )
    return df.withColumn(text_col, F.expr(redacted))


# ---------------------------------------------------------------------------
# leakage-safe train/val/test split
# ---------------------------------------------------------------------------


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    val_per_mille: int = 100,
    test_per_mille: int = 100,
) -> DataFrame:
    """Train/val/test assignment that can never leak near-duplicates
    across splits: the split bucket is keyed on the document's
    duplicate-CLUSTER representative (min id of its connected
    component), not on the document itself, so twins land in the same
    split by construction.  Documents with no near-dup partner fall
    back to their own id — identical to :func:`sampling.split_assign`
    for the non-duplicated bulk of the corpus.

    Scale shape: pair generation is the LSH tier (linear + candidate
    verify); clustering is min-label propagation (O(log diameter)
    rounds of hash joins); the final assignment is one left join of
    the corpus against the |duplicated-docs|-sized label frame (tiny →
    broadcast) plus a pure projection.  The 100 TB corpus itself is
    never shuffled.
    """
    from integritychecksforvldbs_spark.operators.sampling import _bucket_expr_spark

    if val_per_mille + test_per_mille >= 1000:
        raise ValueError("val + test rates must leave room for train")
    if pairs is None:
        pairs = dedup.minhash_lsh_pairs(df, id_col=id_col)
    labels = dedup.duplicate_cluster_keepers(pairs)
    joined = (
        df.join(F.broadcast(labels), id_col, "left")
        .withColumn("rep", F.coalesce(F.col("keeper"), F.col(id_col)))
        .drop("keeper")
    )
    b = F.expr(_bucket_expr_spark("rep", 1000))
    return joined.withColumn(
        "split",
        F.when(b < val_per_mille, F.lit("val"))
        .when(b < val_per_mille + test_per_mille, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def leakage_safe_split_oracle(
    table: str = "documents",
    n: int = 3,
    threshold: float = 0.5,
    val_per_mille: int = 100,
    test_per_mille: int = 100,
    cols: str = "doc_id, lang, source",
) -> str:
    """The identical assignment in DuckDB: tier-2 n-gram-Jaccard pairs
    (== the LSH output at the shipped band settings) → recursive
    reachability CTE → min-label representative → md5 bucket of the
    representative."""
    from integritychecksforvldbs_spark.operators.dedup import ngram_jaccard_oracle
    from integritychecksforvldbs_spark.operators.sampling import _bucket_expr_duckdb

    pairs_sql = ngram_jaccard_oracle(table, n, threshold).strip()
    b = _bucket_expr_duckdb("rep", 1000)
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
  UNION SELECT doc_id_b, doc_id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node
),
labels AS (SELECT node, MIN(lbl) AS keeper FROM reach GROUP BY node),
rep AS (
  SELECT {cols}, COALESCE(l.keeper, d.doc_id) AS rep
  FROM {table} d LEFT JOIN labels l ON d.doc_id = l.node)
SELECT {cols}, rep,
       CASE WHEN {b} < {val_per_mille} THEN 'val'
            WHEN {b} < {val_per_mille + test_per_mille} THEN 'test'
            ELSE 'train' END AS split
FROM rep
"""


# ---------------------------------------------------------------------------
# budget-filling mixture sampler
# ---------------------------------------------------------------------------


def budget_fill(
    df: DataFrame,
    target_tokens: int = 1_000_000,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_expr: str | None = None,
) -> DataFrame:
    """Materialize a mixture: deterministically select documents per
    source until each source's :func:`mixture_allocation` token budget
    is met.  Documents are consumed in md5-of-id order (a reproducible
    shuffle — stable under repartitioning and appends, like every
    sampler here); a document is kept when it STARTS within budget
    (``cum - n < alloc``), so each source overshoots by at most one
    document and selection never depends on row order in storage.

    Output: (doc_id, source, n_tokens, cum_tokens, kept).

    Scale shape: one window shuffle on ``source`` for the running
    total; the |sources|-row allocation table broadcasts.  With very
    few giant sources the window serializes per source — at that shape
    switch the caller to per-source sub-bucketing (append bucket id to
    the partition key, budgets divided per bucket).

    Dirty data: a NULL ``text`` counts as 0 tokens — the doc is kept
    for free rather than silently dropped (ANSI NULL comparisons would
    otherwise eliminate it from a ``filter(kept)``).  A NULL ``source``
    has no allocation to fill and IS excluded (the inner join on the
    mixture table, identically in both engines) — unattributable docs
    need an explicit bucket upstream if they should participate.

    ``tokens_expr``: optional SQL expression for the per-document
    BIGINT token count, applied to BOTH the allocation and the
    running fill so budgets and consumption use the same units; it
    is wrapped NULL-total (COALESCE to 0) like the default.
    """
    ws = f"regexp_count({text_col}, '[^ ]+')"
    n_tokens = F.expr(
        f"CAST(COALESCE({tokens_expr or ws}, 0) AS BIGINT)"
    )
    alloc = mixture_allocation(
        df, target_tokens, source_col, text_col, tokens_expr=tokens_expr
    ).select("source", "alloc_tokens")
    w = (
        Window.partitionBy("source")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        n_tokens.alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("h"),
    )
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .join(F.broadcast(alloc), "source")
        .select(
            id_col,
            "source",
            "n_tokens",
            "cum_tokens",
            (F.col("cum_tokens") - F.col("n_tokens") < F.col("alloc_tokens")).alias(
                "kept"
            ),
        )
    )


def budget_fill_oracle(
    table: str = "documents", target_tokens: int = 1_000_000
) -> str:
    alloc = mixture_allocation_oracle(table, target_tokens).strip()
    return f"""
WITH alloc AS ({alloc}),
base AS (
  SELECT doc_id, source,
         CAST(COALESCE(len(list_filter(string_split(text, ' '), x -> x <> '')), 0)
              AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM {table}),
cum AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM base)
SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens,
       (c.cum_tokens - c.n_tokens < a.alloc_tokens) AS kept
FROM cum c JOIN alloc a USING (source)
"""


# ---------------------------------------------------------------------------
# content-defined chunking (insertion-robust dedup boundaries)
# ---------------------------------------------------------------------------

CDC_WINDOW = 8
CDC_BASE = 31
CDC_MOD = 1_000_000_007
CDC_DIVISOR = 64


def _cdc_chunks_vectorized(
    df: DataFrame, window: int, divisor: int, text_col: str, id_col: str
) -> DataFrame | None:
    """Content-defined chunking as a NumPy mapInPandas kernel — exact
    integer math, so the output is identical to the expression path
    (and the DuckDB oracle) by construction: code points via a utf-32
    decode (= ``ascii(substring(t, i, 1))``), the rolling window hash
    as ``window`` vectorized fused passes of ``(h*base + c) % mod``
    over int64 (the same left fold the SQL ``aggregate`` computes, no
    float anywhere), chunk hashes via ``hashlib.md5`` over the UTF-8
    bytes of the code-point slice (= ``md5(substring(...))``).

    The expression path costs O(n·window) INTERPRETED lambda steps per
    document (~5 s at sf0.1); the kernel does the same arithmetic in
    O(window) vectorized passes.  Returns None (caller keeps the
    expression path as semantic reference) for non-bigint ids."""
    if dict(df.dtypes).get(id_col) != "bigint":
        return None
    from integritychecksforvldbs_spark.functions.planutil import fan_out

    b_, m = CDC_BASE, CDC_MOD
    base = fan_out(
        df.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0)).select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
        )
    )

    def kernel(it):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "chunk_idx": [], "chunk_len": [], "chunk_hash": []}
            for doc_id, txt in zip(pdf["doc_id"], pdf["_text"]):
                n = len(txt)
                if n >= window:
                    codes = np.frombuffer(
                        txt.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
                    L = n - window + 1
                    h = np.zeros(L, dtype=np.int64)
                    for k in range(window):  # the window fold, vectorized
                        h = (h * b_ + codes[k : k + L]) % m
                    ends = np.nonzero(h % divisor == 0)[0] + window  # 1-based i
                    ends = ends[ends < n].tolist()
                else:
                    ends = []
                bounds = [0, *ends, n]
                for ci in range(len(bounds) - 1):
                    a, b2 = bounds[ci], bounds[ci + 1]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(ci)
                    out["chunk_len"].append(b2 - a)
                    out["chunk_hash"].append(
                        hashlib.md5(txt[a:b2].encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return base.mapInPandas(
        kernel, "doc_id long, chunk_idx long, chunk_len long, chunk_hash string"
    )


def content_defined_chunks(
    df: DataFrame,
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking: a chunk boundary falls after position
    ``i`` whenever the rolling hash of the trailing ``window`` chars is
    ``0 (mod divisor)`` — so boundaries are set by CONTENT, not offsets,
    and an insertion near the head re-synchronizes within ~window
    chars instead of shifting every downstream chunk (the weakness of
    fixed-size chunking that :func:`chunk_dedup` inherits; the
    rsync/LBFS idea).  Average chunk length ≈ ``divisor`` chars.

    Output: (doc_id, chunk_idx, chunk_len, chunk_hash) — one exploded
    row per chunk; dedup is a hash groupBy downstream
    (:func:`content_chunk_dedup`).

    Engine notes: the hash is exact integer math (``(acc·31 + code)
    mod 1e9+7`` over code points), bit-identical in DuckDB; the
    ``n >= window`` guard matters because Spark's ``sequence(a, b)``
    DESCENDS when ``a > b`` (a short doc would otherwise produce a
    reversed position list); all row-local, whole-stage codegen, cost
    O(n·window) per doc.
    """
    fast = _cdc_chunks_vectorized(df, window, divisor, text_col, id_col)
    if fast is not None:
        return fast
    w, b_, m, d = window, CDC_BASE, CDC_MOD, divisor
    t, i_ = text_col, id_col
    base = df.filter(
        F.col(t).isNotNull() & (F.length(t) > 0)
    ).select(
        F.col(i_).alias("doc_id"),
        F.col(t).alias("_text"),
        F.length(t).cast("int").alias("n"),
        F.expr(
            f"transform(sequence(1, length({t})), i ->"
            f" CAST(ascii(substring({t}, i, 1)) AS BIGINT))"
        ).alias("codes"),
    )
    bounds = (
        "concat(array(CAST(0 AS BIGINT)), "
        f"IF(n >= {w}, "
        f"  filter(transform(sequence({w}, n), i -> "
        f"    CASE WHEN aggregate(slice(codes, i-{w}+1, {w}), CAST(0 AS BIGINT),"
        f"         (acc, x) -> (acc*{b_} + x) % {m}) % {d} = 0"
        f"         AND i < n THEN CAST(i AS BIGINT) END),"
        f"    x -> x IS NOT NULL), "
        "  array()), "
        "array(CAST(n AS BIGINT)))"
    )
    with_bounds = base.select("doc_id", "_text", F.expr(bounds).alias("bounds"))
    return with_bounds.select(
        "doc_id",
        F.explode(
            F.expr("sequence(0, size(bounds) - 2)")
        ).alias("chunk_idx"),
        "_text",
        "bounds",
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.expr("bounds[chunk_idx + 1] - bounds[chunk_idx]").alias("chunk_len"),
        F.expr(
            "md5(substring(_text, CAST(bounds[chunk_idx] + 1 AS INT),"
            " CAST(bounds[chunk_idx + 1] - bounds[chunk_idx] AS INT)))"
        ).alias("chunk_hash"),
    )


def content_defined_chunks_oracle(
    table: str = "documents",
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
) -> str:
    w, b_, m, d = window, CDC_BASE, CDC_MOD, divisor
    return f"""
WITH base AS (
  SELECT doc_id, text, CAST(length(text) AS INT) AS n,
         list_transform(range(1, length(text)+1),
                        i -> CAST(ascii(text[i:i]) AS BIGINT)) AS codes
  FROM {table} WHERE text IS NOT NULL AND length(text) > 0
),
b AS (
  SELECT doc_id, text, n,
         list_concat(list_concat([CAST(0 AS BIGINT)],
           list_filter(list_transform(range({w}, n+1), i ->
             CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
                       codes[i-{w}+1:i]),
                       (acc, x) -> (acc*{b_} + x) % {m}) % {d} = 0
                  AND i < n THEN CAST(i AS BIGINT) END),
             x -> x IS NOT NULL)),
           [CAST(n AS BIGINT)]) AS bounds
  FROM base
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       bounds[CAST(i+2 AS INT)] - bounds[CAST(i+1 AS INT)] AS chunk_len,
       md5(substring(text, CAST(bounds[CAST(i+1 AS INT)]+1 AS INT),
                     CAST(bounds[CAST(i+2 AS INT)]-bounds[CAST(i+1 AS INT)] AS INT)))
         AS chunk_hash
FROM b, unnest(range(0, len(bounds)-1)) AS t(i)
"""


def content_chunk_dedup(
    df: DataFrame,
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct content-defined chunks with occurrence counts and the
    deterministic first owner (MIN doc, then MIN idx within it) — the
    insertion-robust counterpart of :func:`chunk_dedup`: one hash
    groupBy on the exploded chunk stream."""
    chunks = content_defined_chunks(df, window, divisor, text_col, id_col)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min(F.struct("doc_id", "chunk_idx")).alias("_first"),
        )
        .select(
            "chunk_hash",
            "n_occurrences",
            F.col("_first.doc_id").alias("first_doc_id"),
            F.col("_first.chunk_idx").alias("first_chunk_idx"),
        )
    )


# ---------------------------------------------------------------------------
# cross-corpus duplicated-span removal (C4 / CCNet line dedup)
# ---------------------------------------------------------------------------

def dedup_spans(
    spans: DataFrame,
    span_col: str = "chunk_text",
    doc_col: str = "doc_id",
    min_dup_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Drop every occurrence of a span appearing in ``min_dup_docs``
    or more DISTINCT documents — the C4 duplicated-three-sentence-span
    rule / CCNet paragraph dedup, generalized over any row-per-span
    frame (lines, sentences, fixed chunks, CDC chunks).  Cross-doc
    repetition is the memorization-relevant signal, so the threshold
    counts documents, not occurrences; spans shorter than
    ``min_chars`` (separator residue, empty lines) never participate
    and always survive.

    Scale shape: at the default threshold (2) ONE window pass keyed on
    the span decides survival — "≥ 2 distinct documents" is exactly
    ``min(doc) ≠ max(doc)`` within the span partition, so the span
    stream shuffles ONCE (the aggregate + left_anti form shuffled it
    twice: the distinct-pair aggregation and the join re-shuffle;
    1.9 → 1.0 s on the C4-chunk query at sf0.1).  Higher thresholds
    need a true distinct count and keep the aggregate + anti-join
    (spans shuffle, never documents).  NULL parity with the join form:
    a NULL span never joins → always survives (``elig`` coalesces to
    false); NULL doc_ids are skipped by countDistinct and by min/max
    alike."""
    if min_dup_docs == 2:
        from pyspark.sql.window import Window

        w = Window.partitionBy(span_col)
        elig = F.coalesce(F.length(span_col) >= min_chars, F.lit(False))
        mn = F.min(F.when(elig, F.col(doc_col))).over(w)
        mx = F.max(F.when(elig, F.col(doc_col))).over(w)
        drop = elig & ~mn.eqNullSafe(mx)
        return (
            spans.withColumn("__icv_span_drop", drop)
            .filter(~F.col("__icv_span_drop"))
            .drop("__icv_span_drop")
        )
    dup = (
        spans.filter(F.length(span_col) >= min_chars)
        .groupBy(span_col)
        .agg(F.countDistinct(doc_col).alias("_nd"))
        .filter(F.col("_nd") >= min_dup_docs)
        .select(span_col)
    )
    return spans.join(dup, on=span_col, how="left_anti")


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_dup_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Rewrite each document with its corpus-duplicated lines removed
    (:func:`dedup_spans` over ``sep``-split lines, then an in-order
    rebuild).  Documents whose every line was removed come back with
    empty text — dropping them is the caller's policy decision.
    Position order is restored by sorting (pos, line) structs, so the
    collect_list's nondeterministic arrival order never shows."""
    import re as _re

    other = [c for c in df.columns if c != text_col]
    lines = df.select(
        *other,
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep))
        ).alias("_pos", "_line"),
    )
    kept = dedup_spans(
        lines, span_col="_line", doc_col=id_col,
        min_dup_docs=min_dup_docs, min_chars=min_chars,
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            sep,
        ).alias(text_col)
    )
    return (
        df.drop(text_col)
        .join(rebuilt.withColumnRenamed(text_col, "_rebuilt"), id_col, "left")
        .withColumn(text_col, F.coalesce(F.col("_rebuilt"), F.lit("")))
        .drop("_rebuilt")
    )


def span_dedup_oracle(
    table: str = "documents",
    chunk_size: int = 4,
    min_dup_docs: int = 2,
    buckets: int = 16,
) -> str:
    """DuckDB oracle for the gate query: fixed-size chunks (the
    :func:`token_chunks` construction) → :func:`dedup_spans` →
    per-bucket survival aggregate."""
    c = chunk_size
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM {table}),
e AS (
  SELECT doc_id, toks,
         unnest(range(0, (len(toks) + {c - 1}) // {c})) AS chunk_idx
  FROM t WHERE len(toks) > 0),
ch AS (
  SELECT doc_id,
         CAST(LEAST({c}, len(toks) - chunk_idx * {c}) AS BIGINT)
           AS n_chunk_tokens,
         array_to_string(toks[chunk_idx * {c} + 1 : chunk_idx * {c} + {c}],
                         ' ') AS chunk_text
  FROM e),
dup AS (
  SELECT chunk_text FROM ch
  WHERE length(chunk_text) >= 1
  GROUP BY chunk_text
  HAVING COUNT(DISTINCT doc_id) >= {min_dup_docs})
SELECT CAST(doc_id % {buckets} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_kept_chunks,
       CAST(SUM(n_chunk_tokens) AS BIGINT) AS kept_tokens,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM ch
WHERE chunk_text NOT IN (SELECT chunk_text FROM dup)
GROUP BY doc_id % {buckets}
"""


# ---------------------------------------------------------------------------
# span-level decontamination (surgical redaction)
# ---------------------------------------------------------------------------

def decontaminate_spans(
    df: DataFrame,
    n: int = 8,
    benchmark_mod: int = BENCHMARK_MOD_DEFAULT,
    replacement: str = "[REDACTED]",
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_df: DataFrame | None = None,
) -> DataFrame:
    """Surgical decontamination: instead of DROPPING a document whose
    n-grams overlap the benchmark (:func:`decontaminate`), REDACT the
    matching spans — every token covered by a matched benchmark
    ``n``-gram window is removed and each maximal contaminated run is
    replaced by one ``replacement`` token, keeping the rest of the
    document in the corpus.  Output: (doc_id, n_tokens, n_redacted,
    n_spans, clean_text).

    Same benchmark convention as :func:`decontaminate` (explicit
    ``benchmark_df``, or the self-contained ``doc_id % benchmark_mod``
    split).  NULL-text documents are excluded, like every n-gram
    kernel.

    Scale shape: bench grams broadcast as 8-byte xxhash64 values (the
    same hashed-gram trick :func:`decontaminate` documents — equal
    grams hash equal; a cross-gram collision is ~1e-15/doc); the train
    side explodes only window starts, aggregates the matched-start
    list per doc (one groupBy shuffle), joins it back on doc_id (the
    second and last data shuffle), and every flag/rebuild step is a
    row-local array expression.  Tokenization note: spans match over
    whitespace-FILTERED tokens (empty tokens dropped), while the
    drop-grade kernel's shingles keep raw split positions — irregular
    whitespace inside a quote can therefore flag in one grade and not
    the other; the span grade's normalization is deliberate (the
    rebuilt text must not carry empty tokens).  The flag/rebuild CASEs are 3-branch so the
    ``j - 1`` index is never evaluated at ``j = 1`` (Spark's
    ``element_at(_, 0)`` is an ANSI error), and every ``sequence`` is
    guarded non-empty (Spark's ``sequence(1, 0)`` DESCENDS).
    """
    t, i_ = text_col, id_col
    repl = replacement.replace("\\", "\\\\").replace("'", "\\'")
    if benchmark_df is None:
        is_bench = F.col(i_) % benchmark_mod == 0
        bench_src = df.filter(is_bench)
        train_src = df.filter(~is_bench)
    else:
        bench_src = benchmark_df
        train_src = df

    toks_expr = f"filter(split({t}, ' '), x -> x <> '')"

    def _windows(src: DataFrame) -> DataFrame:
        return (
            src.filter(F.col(t).isNotNull())
            .select(F.col(i_).alias("doc_id"), F.expr(toks_expr).alias("toks"))
            .filter(F.expr(f"size(toks) >= {n}"))
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(toks) - {n} + 1),"
                        f" i -> struct(i AS i,"
                        f" xxhash64(array_join(slice(toks, i, {n}), ' ')) AS gram))"
                    )
                ).alias("w"),
            )
            .select("doc_id", "w.i", "w.gram")
        )

    bench_grams = _windows(bench_src).select("gram").distinct()
    starts = (
        _windows(train_src)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("starts"))
    )
    base = (
        train_src.filter(F.col(t).isNotNull())
        .select(F.col(i_).alias("doc_id"), F.expr(toks_expr).alias("toks"))
        .join(starts, "doc_id", "left")
        .withColumn("starts", F.coalesce("starts", F.expr("array()")))
    )
    flags = (
        f"transform(IF(size(toks) >= 1, sequence(1, size(toks)), array()),"
        f" j -> exists(starts, s -> j >= s AND j <= s + {n} - 1))"
    )
    with_flags = base.withColumn("flags", F.expr(flags))
    rebuilt = with_flags.select(
        "doc_id",
        F.expr("CAST(size(toks) AS BIGINT)").alias("n_tokens"),
        F.expr("CAST(size(filter(flags, x -> x)) AS BIGINT)").alias(
            "n_redacted"
        ),
        F.expr(
            "CAST(size(filter(IF(size(toks) >= 1, sequence(1, size(toks)), array()),"
            " j -> element_at(flags, j) AND (CASE WHEN j = 1 THEN true"
            " ELSE NOT element_at(flags, j - 1) END))) AS BIGINT)"
        ).alias("n_spans"),
        F.expr(
            "array_join(filter(transform("
            "IF(size(toks) >= 1, sequence(1, size(toks)), array()),"
            " j -> CASE WHEN NOT element_at(flags, j) THEN element_at(toks, j)"
            f" WHEN j = 1 THEN '{repl}'"
            f" WHEN NOT element_at(flags, j - 1) THEN '{repl}'"
            " END), x -> x IS NOT NULL), ' ')"
        ).alias("clean_text"),
    )
    return rebuilt


def decontaminate_spans_oracle(
    table: str = "documents",
    n: int = 8,
    benchmark_mod: int = BENCHMARK_MOD_DEFAULT,
    replacement: str = "[REDACTED]",
) -> str:
    """Identical redaction in DuckDB (1-based lists, lazy CASE)."""
    replacement = replacement.replace("'", "''")
    return f"""
WITH toks_t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM {table} WHERE text IS NOT NULL
),
windows AS (
  SELECT doc_id, i,
         array_to_string(toks[i:i+{n - 1}], ' ') AS gram
  FROM toks_t, unnest(range(1, len(toks) - {n} + 2)) AS u(i)
  WHERE len(toks) >= {n}
),
bench AS (
  SELECT DISTINCT gram FROM windows WHERE doc_id % {benchmark_mod} = 0
),
starts AS (
  SELECT doc_id, list(i) AS starts
  FROM windows
  WHERE doc_id % {benchmark_mod} <> 0 AND gram IN (SELECT gram FROM bench)
  GROUP BY doc_id
),
flagged AS (
  SELECT t.doc_id, toks,
         list_transform(range(1, len(toks) + 1),
           j -> len(list_filter(COALESCE(starts, []),
                s -> j >= s AND j <= s + {n} - 1)) > 0) AS flags
  FROM toks_t t LEFT JOIN starts USING (doc_id)
  WHERE t.doc_id % {benchmark_mod} <> 0
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(flags, x -> x)) AS BIGINT) AS n_redacted,
       CAST(len(list_filter(range(1, len(toks) + 1),
            j -> flags[j] AND (CASE WHEN j = 1 THEN true
                 ELSE NOT flags[j - 1] END))) AS BIGINT) AS n_spans,
       array_to_string(list_filter(list_transform(range(1, len(toks) + 1),
         j -> CASE WHEN NOT flags[j] THEN toks[j]
                   WHEN j = 1 THEN '{replacement}'
                   WHEN NOT flags[j - 1] THEN '{replacement}'
              END), x -> x IS NOT NULL), ' ') AS clean_text
FROM flagged
"""
