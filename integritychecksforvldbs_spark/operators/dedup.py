"""Deduplication kernels for large-scale training-data pipelines.

The reference's integrity checks validate one table at a time
(IntegrityChecks_VLDB.sql:684-687); these kernels extend the same
check framework to *cross-row* redundancy over a document corpus —
the checks an LLM-data pipeline runs before training (BASELINE.json
north star).  Five tiers, cheapest first:

1. **Exact** — md5(text) hash-groupBy.  One shuffle on the hash, map-
   side partial aggregation; at 100 TB this is the canonical
   hash-partitioned duplicate count.
2. **N-gram Jaccard (brute force)** — word n-gram shingles, self-join
   on shingle, exact Jaccard per pair.  Quadratic in corpus size per
   shared shingle; the *oracle* for the approximate tiers.  An
   optional ``max_df`` cap drops stop-shingles (bounded join fan-out
   at scale — the standard frequency-cut).
3. **MinHash + LSH** — k minhashes per doc (one groupBy), banded into
   buckets (``bands × rows_per_band = k``); only same-bucket pairs
   are candidates, each verified with the exact Jaccard of tier 2.
   Linear in corpus size + candidate count: the 100 TB path.
4. **SimHash** — 60-bit signature from md5-derived token hashes (md5
   so the DuckDB oracle computes the *identical* signature); pairs
   within ``max_hamming`` found losslessly via pigeonhole chunk
   blocking (``max_hamming+1`` chunks → any pair within distance k
   shares ≥1 exact chunk), then exact ``bit_count(a^b)`` filter.
5. **Embedding cosine** — near-dup by cosine ≥ τ over
   ``array<float>`` embeddings.  Dot products as strict left-to-right
   folds in double precision so Spark and DuckDB produce bitwise-equal
   similarities (both engines fold sequentially).

Everything is built-in Spark SQL expressions — no row-at-a-time Python
UDFs — so WholeStageCodegen covers the scan→explode→join→agg pipelines.
One sanctioned Arrow path: the exact cosine tier's all-pairs kernel
(:func:`_cosine_pairs_vectorized`) batches the O(n²) dot products
through NumPy with the identical fold order (the interpreted
higher-order-function lambda was ~18 µs/pair; the expression form
remains as the semantic reference and fallback).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# 1. exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical documents: (text_md5, dup_count, keeper).

    ``keeper`` is the minimal id — the row a dedup pass would retain.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").cast("long").alias("dup_count"),
            F.min(id_col).alias("keeper"),
        )
        .filter(F.col("dup_count") > 1)
    )


def exact_dup_groups_oracle(table: str = "documents") -> str:
    return (
        "SELECT md5(text) AS text_md5, CAST(COUNT(*) AS BIGINT) AS dup_count, "
        f"MIN(doc_id) AS keeper FROM {table} "
        "GROUP BY md5(text) HAVING COUNT(*) > 1"
    )


# ---------------------------------------------------------------------------
# 2. word n-gram shingles + exact Jaccard
# ---------------------------------------------------------------------------


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int | None = None,
    reuse: bool = False,
) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).

    Documents with fewer than ``n`` tokens produce no shingles.
    ``max_df`` drops shingles occurring in more than that many
    documents (join fan-out bound for web-scale corpora).

    The per-doc distinct happens inside the row (``array_distinct``
    before the explode) — doc_id is unique, so this equals the global
    ``.distinct()`` it replaces, without that operator's full shuffle.

    ``reuse=True`` persists the per-doc ARRAY form before exploding:
    the brute-force tiers consume the shingle set three times (both
    self-join sides + the cardinality aggregate), and without a cache
    the whole gram build runs per consumer.  The array form is the
    right cache granularity (rows = |corpus|, not |shingles| — the r1
    lesson on the exploded-set cache); the ContextCleaner reclaims the
    blocks when the result's references drop.
    """
    sharr = shingle_arrays(df, text_col, id_col, n)
    if reuse:
        sharr = sharr.persist()
    sh = sharr.select("doc_id", F.explode("sh").alias("shingle"))
    if max_df is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("df_count"))
        sh = (
            sh.join(freq.filter(F.col("df_count") <= max_df), "shingle", "left_semi")
        )
    return sh


def shingle_arrays(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document distinct shingle *array*: (doc_id, sh array<string>).

    The row-local form of :func:`shingles` — documents are bounded
    size, so the array is too, and downstream per-doc work (minhash
    signatures, pairwise intersection) can stay shuffle-free.

    The shingle expression must be *total*: Catalyst's constraint
    inference can fold it into the Filter stage and evaluate it on
    rows the ``size >= n`` guard would exclude, where a
    ``size - n + 1`` slice length turns negative and ``slice``
    throws. The ``when`` branch keeps short docs on a lazily-skipped
    path instead of relying on filter ordering.

    Gram building is inline-safe (the 4b1b084 discipline): grams come
    from ``zip_with`` over n shifted ``slice``s of the token array —
    the slices are zip_with *arguments*, evaluated once per row, and
    the lambdas touch only their own variables.  The previous
    ``transform(sequence(...), i -> array_join(slice(toks, i, n)))``
    form carried the full tokenizer INSIDE the lambda body, which
    Catalyst never hoists: one re-split of the document per shingle
    position — quadratic per document (5.1 s for 263k shingles at
    sf0.1; now 0.6 s).
    """
    from integritychecksforvldbs_spark.functions.planutil import fan_out

    df = fan_out(df)
    toks = F.split(F.col(text_col), " ")
    cnt = F.size(toks) - F.lit(n - 1)
    grams = F.slice(toks, F.lit(1), cnt)
    for j in range(2, n + 1):
        grams = F.zip_with(
            grams,
            F.slice(toks, F.lit(j), cnt),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    sh = F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
    return df.filter(F.size(toks) >= n).select(
        F.col(id_col).alias("doc_id"),
        sh.alias("sh"),
    )


def hashed_shingle_arrays(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document distinct HASHED shingle array: (doc_id, shl
    array<bigint>) — the LSH tier's working form, built without ever
    materializing shingle strings.

    Each token hashes once (``xxhash64(token)``); a shingle hash is
    ``xxhash64(h_i, …, h_{i+n-1})`` over the token hashes.  Versus
    hashing concatenated shingle strings this skips the per-position
    string allocation + full-string hash walk (measured 3.7× faster at
    sf0.1) and yields the same SET semantics: equal n-grams produce
    equal hashes by construction, and a cross-n-gram collision inside
    one document (~|sh|²/2⁶⁴ ≈ 1e-15) is the only way the distinct
    cardinality — and hence any downstream Jaccard — could differ
    from the string form (verified equal on the fixtures).  Minhash
    signature values DO differ from hashing strings, but band recall
    is a property of the hash family's uniformity, not its values —
    the gate's near-dup pairs all sit at jaccard ≥ 0.9 where the
    shipped bands give recall 1 − 3e-12.

    Same short-doc totality guard as :func:`shingle_arrays`.

    The short-doc filter is phrased over ``split`` alone, NOT over the
    hashed token array: ``transform`` preserves length so the guards
    are equivalent, but a ``size(th) >= n`` filter is pushed into the
    scan as a DataFilter carrying the whole tokenize+hash lambda —
    which then runs single-core below the fan-out exchange (measured
    12 s at sf0.1 on the one-row-group documents file).
    """
    from integritychecksforvldbs_spark.functions.planutil import fan_out

    df = fan_out(df)
    elems = ", ".join(f"element_at(th, i + {j})" for j in range(n))
    return (
        df.filter(F.size(F.split(F.col(text_col), " ")) >= n)
        .select(
            F.col(id_col).alias("doc_id"),
            F.expr(f"transform(split({text_col}, ' '), t -> xxhash64(t))").alias(
                "th"
            ),
        )
        .select(
            "doc_id",
            F.expr(
                f"CASE WHEN size(th) >= {n} THEN "
                f"array_distinct(transform(sequence(1, size(th) - {n - 1}), "
                f"i -> xxhash64({elems}))) "
                f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
            ).alias("shl"),
        )
    )


def hashed_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int | None = None,
    reuse: bool = False,
) -> DataFrame:
    """:func:`shingles` over HASHED grams: (doc_id, shingle bigint).

    Set-identical to the string form (equal n-grams hash equal; a
    cross-gram 64-bit collision is ~1e-15/doc — the same sanctioned
    substitution the LSH tier and decontamination already run on), so
    every COUNT derived downstream (pair intersections, cardinalities,
    frequency cuts) is unchanged, while the self-join + aggregation
    shuffles move 8-byte longs instead of n-token strings and compare
    without string walks (guide §2.3 narrower types)."""
    sharr = hashed_shingle_arrays(df, text_col, id_col, n)
    if reuse:
        sharr = sharr.persist()
    sh = sharr.select("doc_id", F.explode("shl").alias("shingle"))
    if max_df is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("df_count"))
        sh = sh.join(
            freq.filter(F.col("df_count") <= max_df), "shingle", "left_semi"
        )
    return sh


def pair_scores(sh: DataFrame) -> DataFrame:
    """Undirected pair scores from ONE shingle self-join:
    (doc_id_a, doc_id_b, common, card_a, card_b) for every pair
    sharing ≥1 shingle, ``doc_id_a < doc_id_b``.

    This is the shared enumeration behind BOTH exact tiers — jaccard
    and containment are row-local arithmetic over the same
    intersection/cardinality counts, so a caller that needs both (the
    pair-metrics gate) computes the quadratic join once and derives
    the two tiers from a persisted scores frame."""
    a = sh.select(F.col("doc_id").alias("doc_id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").cast("long").alias("common"))
    )
    card = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("card"))
    ca = card.select(F.col("doc_id").alias("doc_id_a"), F.col("card").alias("card_a"))
    cb = card.select(F.col("doc_id").alias("doc_id_b"), F.col("card").alias("card_b"))
    return common.join(ca, "doc_id_a").join(cb, "doc_id_b")


def jaccard_from_scores(scores: DataFrame, threshold: float) -> DataFrame:
    """(doc_id_a, doc_id_b, jaccard) from a :func:`pair_scores` frame —
    the exact arithmetic of :func:`ngram_jaccard_pairs` (bigint/bigint
    division → bitwise-equal doubles vs the oracle)."""
    return scores.select(
        "doc_id_a",
        "doc_id_b",
        (
            F.col("common")
            / (F.col("card_a") + F.col("card_b") - F.col("common"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def containment_from_scores(scores: DataFrame, threshold: float) -> DataFrame:
    """(src_doc_id, dst_doc_id, containment) from a :func:`pair_scores`
    frame — both directions emitted row-locally, exactly as
    :func:`ngram_containment_pairs` does."""
    both = scores.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_id_a").alias("src_doc_id"),
                    F.col("doc_id_b").alias("dst_doc_id"),
                    (F.col("common") / F.col("card_a")).alias("containment"),
                ),
                F.struct(
                    F.col("doc_id_b").alias("src_doc_id"),
                    F.col("doc_id_a").alias("dst_doc_id"),
                    (F.col("common") / F.col("card_b")).alias("containment"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    return both.filter(F.col("containment") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Brute-force exact near-dup pairs: (doc_id_a, doc_id_b, jaccard).

    The enumeration runs over hashed grams (:func:`hashed_shingles`) —
    jaccard depends only on intersection/cardinality COUNTS, which the
    hashing preserves, while the self-join shuffles 8-byte longs
    instead of n-token strings."""
    sh = hashed_shingles(df, text_col, id_col, n, max_df, reuse=True)
    return jaccard_from_scores(pair_scores(sh), threshold)


def ngram_jaccard_oracle(
    table: str = "documents", n: int = 3, threshold: float = 0.5
) -> str:
    """The identical computation in DuckDB SQL (the oracle for tiers
    2 and 3).  Integer/integer division → bitwise-equal doubles."""
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, g AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - {n - 2}),
                  i -> array_to_string(string_split(text, ' ')[i:i+{n - 1}], ' '))) AS g
    FROM {table}
    WHERE len(string_split(text, ' ')) >= {n})
),
card AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS card FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, CAST(COUNT(*) AS BIGINT) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_id_a, doc_id_b,
       common / (ca.card + cb.card - common) AS jaccard
FROM common
JOIN card ca ON ca.doc_id = doc_id_a
JOIN card cb ON cb.doc_id = doc_id_b
WHERE common / (ca.card + cb.card - common) >= {threshold}
"""


# ---------------------------------------------------------------------------
# 3. MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(sharr: DataFrame, num_hashes: int = 32) -> DataFrame:
    """k-minhash signature per doc from the shingle *array*:
    (doc_id, mh array<bigint>).

    Each shingle string is hashed ONCE (``xxhash64(shingle)``); hash i
    is then ``xxhash64(i, base)`` over that 64-bit base — the standard
    one-strong-hash + k-rehash minhash construction, turning k string
    hashes per shingle into k integer hashes (measured ~3× faster).
    Shingles explode from the (already per-doc-distinct) array so
    hashing + MIN aggregates run in whole-stage codegen; the
    groupBy(doc_id) shuffle only moves map-side-combined partials (one
    row per doc per partition, k longs each).  A row-local
    ``aggregate`` fold was tried and is slower — Spark interprets
    lambda functions, codegen wins."""
    sh = sharr.select("doc_id", F.explode("sh").alias("shingle")).select(
        "doc_id", F.xxhash64("shingle").alias("base")
    )
    # parsed-SQL expression construction — see _minhash_signatures_hashed
    mins = [
        F.expr(f"min(xxhash64({i}, base)) AS h{i}") for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    arr = ", ".join(f"h{i}" for i in range(num_hashes))
    return sig.select("doc_id", F.expr(f"array({arr}) AS mh"))


def lsh_candidate_pairs(
    sig: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """Same-bucket candidate pairs from banded minhash signatures.

    The only shuffle of the LSH tier — and it moves (doc_id, band,
    bucket) triples, not shingles: bytes ∝ corpus row count, not
    token count."""
    # one parsed expression for the whole banding array (vs bands+1
    # py4j constructor round trips — see _minhash_signatures_hashed)
    band_hashes = F.expr(
        "array("
        + ", ".join(
            f"xxhash64({b}, "
            + ", ".join(
                f"mh[{b * rows_per_band + j}]" for j in range(rows_per_band)
            )
            + ")"
            for b in range(bands)
        )
        + ")"
    )
    buckets = sig.select(
        "doc_id", F.posexplode(band_hashes).alias("band", "bucket")
    )
    a = buckets.select(
        F.col("doc_id").alias("doc_id_a"), "band", "bucket"
    )
    b = buckets.select(
        F.col("doc_id").alias("doc_id_b"), "band", "bucket"
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    bands: int = 16,
    rows_per_band: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """LSH-bucketed near-dup pairs, exact-verified: same schema (and,
    at sane band settings, the same rows) as :func:`ngram_jaccard_pairs`
    — but linear in corpus size instead of quadratic.

    P(candidate | jaccard=s) = 1 - (1 - s^rows)^bands; defaults give
    ≥0.9998 recall at s=0.8 and ~1 at s≥0.9.

    Everything per-doc stays row-local (shingle arrays → signature
    arrays); the only data that shuffles is the (doc_id, band, bucket)
    banding join plus the candidate pairs themselves, and the exact
    verification is a per-pair ``array_intersect`` after joining the
    two shingle arrays onto each candidate — work ∝ candidates, never
    the shingle self-join the brute-force tier does.
    """
    # Carry HASHED shingle arrays (array<bigint>) instead of strings:
    # |intersection| and set sizes are what the jaccard needs, longs
    # shuffle ~3× fewer bytes and compare without string walks, and a
    # 64-bit collision inside one candidate pair's union (~1e-15 per
    # pair) is the only way a value could differ (measured: output
    # bitwise-equal to the string carry on the fixtures).  The default
    # path never materializes shingle strings at all
    # (hashed_shingle_arrays); the max_df variant needs the global
    # string-frequency cut first, then hashes what survives.
    if max_df is not None:
        # the frequency cut is inherently global: explode, cut, regroup
        shl_df = (
            shingles(df, text_col, id_col, n, max_df)
            .groupBy("doc_id")
            .agg(F.collect_list(F.xxhash64("shingle")).alias("shl"))
        )
    else:
        shl_df = hashed_shingle_arrays(df, text_col, id_col, n)
    # The DAG is a diamond — shl feeds the signature branch AND both
    # verification joins — so without a cache the shingling recomputes
    # 3×; persist() is the difference between 4.9 s and 2.2 s at sf0.1
    # (per-doc arrays: rows = |corpus|, bytes ≈ distinct shingles × 8 —
    # MEMORY_AND_DISK spills at 100 TB; the ContextCleaner reclaims the
    # cache when the consumed result's references drop).  Contrast the
    # round-1 note below: caching the EXPLODED shingle set was a
    # pessimization; the per-doc array form is 100-1000× fewer rows.
    shl_df = shl_df.persist()
    sig = _minhash_signatures_hashed(shl_df, bands * rows_per_band)
    cands = lsh_candidate_pairs(sig, bands, rows_per_band)
    a = shl_df.select(F.col("doc_id").alias("doc_id_a"), F.col("shl").alias("sh_a"))
    b = shl_df.select(F.col("doc_id").alias("doc_id_b"), F.col("shl").alias("sh_b"))
    common = F.expr("size(array_intersect(sh_a, sh_b))")
    return (
        cands.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                common
                / (F.expr("size(sh_a)") + F.expr("size(sh_b)") - common)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_signatures_hashed(shl_df: DataFrame, num_hashes: int) -> DataFrame:
    """:func:`minhash_signatures` over pre-hashed shingle arrays
    (doc_id, shl array<bigint>) — identical output, skips re-hashing
    the strings."""
    sh = shl_df.select("doc_id", F.explode("shl").alias("base"))
    # expressions built as parsed SQL strings: the F.min(F.xxhash64(
    # F.lit(i), col)) chain costs ~5 py4j round trips per hash — ~160
    # driver round trips per call — where one F.expr parse costs 1.
    # SQL `{i}` is the same IntegerType literal as F.lit(i), so the
    # hashes are bit-identical.
    mins = [
        F.expr(f"min(xxhash64({i}, base)) AS h{i}") for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    arr = ", ".join(f"h{i}" for i in range(num_hashes))
    return sig.select("doc_id", F.expr(f"array({arr}) AS mh"))


def minhash_lsh_increment_pairs(
    base: DataFrame,
    inc: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    bands: int = 16,
    rows_per_band: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs BETWEEN a new batch and an existing corpus:
    (inc_id, base_id, jaccard) — the LSH analogue of
    :func:`curation.dedup_increment`'s exact tier.

    The incremental-crawl question is "which new docs are near-copies
    of something already ingested", NOT "re-cluster the whole corpus":
    banding both sides and joining inc-buckets × base-buckets yields
    exactly the cross pairs — the base is scanned once (signatures are
    row-local) and never pairs with itself, so the work is linear in
    |base| + candidates, per batch.  Exact-jaccard verification joins
    each side's own hashed shingle array onto the candidates, same as
    the full-corpus tier.
    """
    shl_b = hashed_shingle_arrays(base, text_col, id_col, n).persist()
    shl_i = hashed_shingle_arrays(inc, text_col, id_col, n).persist()
    num_hashes = bands * rows_per_band
    sig_b = _minhash_signatures_hashed(shl_b, num_hashes)
    sig_i = _minhash_signatures_hashed(shl_i, num_hashes)

    def buckets(sig: DataFrame, out_id: str) -> DataFrame:
        band_hashes = F.expr(
            "array("
            + ", ".join(
                f"xxhash64({b}, "
                + ", ".join(
                    f"mh[{b * rows_per_band + j}]" for j in range(rows_per_band)
                )
                + ")"
                for b in range(bands)
            )
            + ")"
        )
        return sig.select(
            F.col("doc_id").alias(out_id),
            F.posexplode(band_hashes).alias("band", "bucket"),
        )

    cands = (
        buckets(sig_i, "inc_id")
        .join(buckets(sig_b, "base_id"), ["band", "bucket"])
        .select("inc_id", "base_id")
        .distinct()
    )
    a = shl_i.select(F.col("doc_id").alias("inc_id"), F.col("shl").alias("sh_a"))
    b = shl_b.select(F.col("doc_id").alias("base_id"), F.col("shl").alias("sh_b"))
    common = F.expr("size(array_intersect(sh_a, sh_b))")
    return (
        cands.join(a, "inc_id")
        .join(b, "base_id")
        .select(
            "inc_id",
            "base_id",
            (
                common / (F.expr("size(sh_a)") + F.expr("size(sh_b)") - common)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_increment_oracle(
    base_sql: str, inc_sql: str, n: int = 3, threshold: float = 0.5
) -> str:
    """Quadratic cross-corpus oracle for the incremental LSH tier:
    every (inc, base) pair with word-n-gram jaccard ≥ τ."""
    def grams(src: str, idc: str) -> str:
        return f"""
  SELECT DISTINCT doc_id AS {idc}, g AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - {n - 2}),
                  i -> array_to_string(string_split(text, ' ')[i:i+{n - 1}], ' '))) AS g
    FROM {src}
    WHERE len(string_split(text, ' ')) >= {n})"""

    return f"""
WITH bs AS ({grams(base_sql, "base_id")}),
ins AS ({grams(inc_sql, "inc_id")}),
bc AS (SELECT base_id, CAST(COUNT(*) AS BIGINT) AS nb FROM bs GROUP BY 1),
ic AS (SELECT inc_id, CAST(COUNT(*) AS BIGINT) AS ni FROM ins GROUP BY 1),
inter AS (
  SELECT i.inc_id, b.base_id, CAST(COUNT(*) AS BIGINT) AS nc
  FROM ins i JOIN bs b ON i.shingle = b.shingle
  GROUP BY 1, 2)
SELECT x.inc_id, x.base_id,
       x.nc / (ic.ni + bc.nb - x.nc) AS jaccard
FROM inter x JOIN ic ON x.inc_id = ic.inc_id JOIN bc ON x.base_id = bc.base_id
WHERE x.nc / (ic.ni + bc.nb - x.nc) >= {threshold}
"""


# ---------------------------------------------------------------------------
# 4. SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex chars of md5 → portable to the DuckDB oracle


def simhash_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weighted: bool = False,
) -> DataFrame:
    """60-bit SimHash per document: (doc_id, simhash).

    Token hash = first 15 hex chars of md5 (portable); bit j of the
    signature is the sign of Σ_tokens (±1 by token-hash bit j).

    ``weighted=True`` is classic frequency-weighted SimHash (each
    occurrence votes, not each distinct token) — materially better on
    small-vocabulary corpora, where distinct token *sets* collide
    (measured: ~10× fewer hamming≤3 pairs on the fixture corpus).

    Plan shape (measured): the per-doc token distinct happens INSIDE
    the row (``array_distinct`` — doc_id is unique, so it equals the
    global distinct it replaces without that operator's full-corpus
    shuffle), then tokens explode so md5 and the 60 bit-vote SUMs run
    in whole-stage codegen; the groupBy(doc_id) shuffle only moves
    map-side-combined partials (one row per doc per partition).  A
    fully row-local ``aggregate``/``zip_with`` fold was tried and is
    ~2× slower — Spark interprets lambda functions, codegen wins.
    """
    t = text_col
    toks = f"filter(split({t}, ' '), x -> x <> '')"
    if not weighted:
        toks = f"array_distinct({toks})"
    # ONE parsed SQL text (r14): the 60 per-bit SUM expressions were 60
    # F.expr py4j round trips + a fresh analysis per groupBy/select —
    # ~0.4 s of pure driver construction per variant at steady state
    # (dedup_simhash_both builds TWO).  Expressions are byte-identical
    # to the Column chain they replace; plan and results unchanged.
    sums = ", ".join(
        f"CAST(SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN s{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(SIMHASH_BITS)
    )
    sql = (
        f"SELECT doc_id, {combine} AS simhash FROM ("
        f"  SELECT doc_id, {sums} FROM ("
        f"    SELECT doc_id,"
        f"           CAST(conv(substring(md5(tk), 1, 15), 16, 10) AS BIGINT) AS h"
        f"    FROM ("
        f"      SELECT {id_col} AS doc_id, explode({toks}) AS tk FROM {{d}}"
        f"    )"
        f"  ) GROUP BY doc_id"
        f")"
    )
    return df.sparkSession.sql(sql, d=df)


def simhash_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    weighted: bool = False,
) -> DataFrame:
    """Pairs within ``max_hamming`` bits: (doc_id_a, doc_id_b, hamming).

    Lossless chunk blocking: the signature splits into
    ``max_hamming+1`` chunks; any pair within distance k agrees on ≥1
    whole chunk (pigeonhole), so the equi-join on (chunk_idx, chunk)
    misses nothing while avoiding the n² cross join.
    """
    n_chunks = max_hamming + 1
    width = SIMHASH_BITS // n_chunks + (1 if SIMHASH_BITS % n_chunks else 0)
    mask = (1 << width) - 1
    # The chunk self-join consumes sig on BOTH sides, so without a cache
    # the tokenize + 60-bit-vote aggregation (the expensive part) runs
    # twice; persist() is the difference between 1.67 s and 1.21 s at
    # sf0.1.  Tiny footprint — (doc_id, one long) per doc — and the
    # ContextCleaner reclaims it when the consumed result's references
    # drop (same contract as minhash_lsh_pairs' shl cache above).  A
    # groupBy(chunk)+collect_list row-local pair expansion was tried and
    # is ~2.3× slower: the struct lists defeat codegen and re-shuffle
    # doc payloads the join never moves.
    sig = simhash_df(df, text_col, id_col, weighted).persist()
    # NOTE (r14): the pair expansion stays a DataFrame chain on purpose.
    # A parsed-SQL form over a `{s}` placeholder was tried and REVERTED:
    # the SQL formatter resolves the placeholder through a temp view,
    # which does NOT canonicalize to the persisted plan — the after-plan
    # lost every InMemoryTableScan (16 → 0), recomputing the signature
    # aggregation on BOTH join sides.  The ~15 py4j calls here are noise
    # next to that.
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"(simhash >> {c * width}) & {mask}")
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("simhash").alias("sim_a"),
        "chunk_idx",
        "chunk",
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("simhash").alias("sim_b"),
        "chunk_idx",
        "chunk",
    )
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select(
            "doc_id_a",
            "doc_id_b",
            F.expr("CAST(bit_count(sim_a ^ sim_b) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_oracle(
    table: str = "documents", max_hamming: int = 3, weighted: bool = False
) -> str:
    """Brute-force SimHash pairs in DuckDB — identical signatures (same
    md5-derived hashes), identical hamming distances."""
    sum_cols = ",\n    ".join(
        f"CAST(SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN s{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(SIMHASH_BITS)
    )
    distinct = "" if weighted else "DISTINCT "
    return f"""
WITH tok AS (
  SELECT {distinct}doc_id, t FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM {table})
  WHERE t <> ''
),
hashed AS (
  SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM tok
),
sums AS (
  SELECT doc_id,
    {sum_cols}
  FROM hashed GROUP BY doc_id
),
sig AS (SELECT doc_id, {combine} AS simhash FROM sums)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# 5. embedding cosine near-dup
# ---------------------------------------------------------------------------


def _dot_expr(a: str, b: str) -> Column:
    """The SEMANTIC REFERENCE dot: strict left-to-right double fold —
    the same summation order DuckDB's list_reduce uses, so
    cross-engine values are bitwise equal.  veccompute.pair_dot is the
    bit-identical vectorized twin (parity pinned by
    tests/test_veccompute.py); see :func:`_dot` for why the expression
    form stays the production path for pair scoring."""
    return F.expr(
        f"aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), CAST({b} AS ARRAY<DOUBLE>), "
        "(x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )


def _norm_expr(vec_col: str) -> Column:
    """Reference norm² fold (see :func:`_dot_expr`)."""
    return F.expr(
        f"aggregate(CAST({vec_col} AS ARRAY<DOUBLE>), 0D, (acc, x) -> acc + x * x)"
    )


def _dot(a: str, b: str) -> Column:
    """The production dot IS the expression fold: an Arrow pandas-UDF
    twin (veccompute.pair_dot, bit-identical) was A/B-measured SLOWER
    on every pair-scoring path — per-pair dims are small (~64), so the
    Python-boundary round trip + per-row Arrow conversion exceeds the
    interpreted-lambda cost (ann_topk_prefiltered 0.50s expr vs 2.18s
    UDF; dedup_embedding_both 1.26 vs 2.76 same-session min-of-4).
    The kernels win only where per-row fold work is ~n_tables×n_bits
    larger — the SRP bucket/IVF cell assignments use them."""
    return _dot_expr(a, b)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("norm", F.sqrt(_norm_expr(vec_col)))


# Above this corpus size the vectorized all-pairs kernel would collect
# too much to the driver — but the exact tier's O(n²) compute is
# unrunnable there anyway; the expression path stays as the honest
# fallback (and as the reference semantics for NULL/ragged inputs).
_BRUTE_KERNEL_MAX_ROWS = 100_000


def _cosine_pairs_vectorized(
    df: DataFrame, threshold: float, vec_col: str, id_col: str
) -> DataFrame | None:
    """All-pairs cosine via a broadcast matrix + NumPy mapInPandas
    kernel — bit-identical to the expression path (guide §4.2: hand
    whole batches to vectorized native code).

    The dot/norm folds are reproduced EXACTLY: the kernel loops over
    the dimension axis (``acc = acc + A[:, j] * B[:, j]``), vectorizing
    over the *pair* axis, so every per-pair sum is the same strict
    left-to-right IEEE-double fold the SQL ``aggregate`` lambda and
    DuckDB's ``list_reduce`` compute — 12× faster at sf0.1 (27→2.3 s)
    with zero value drift.  The O(n) collect+broadcast is bounded by
    ``_BRUTE_KERNEL_MAX_ROWS`` and is strictly cheaper than the O(n²)
    pair compute this tier promises; NULL ids/vectors can never form a
    pair (the join condition/cosine goes NULL) so pre-filtering them
    matches the expression path.  Returns None (caller falls back to
    the expression path) when the corpus is over-cap, ragged-dim, or
    empty."""
    import numpy as np

    dtypes = dict(df.dtypes)
    # schema parity with the expression path: bigint ids (the kernel
    # emits long) and a numeric vector element type
    if dtypes.get(id_col) != "bigint" or dtypes.get(vec_col) not in (
        "array<float>",
        "array<double>",
    ):
        return None
    rows = (
        df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .limit(_BRUTE_KERNEL_MAX_ROWS + 1)
        .collect()
    )
    if not rows or len(rows) > _BRUTE_KERNEL_MAX_ROWS:
        return None
    if len({len(r[1]) for r in rows}) != 1:
        return None  # ragged dims: zip_with NULL-padding semantics differ
    spark = df.sparkSession
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    n, dim = M.shape
    nacc = np.zeros(n)
    for j in range(dim):  # same fold order as with_norm's aggregate
        nacc = nacc + M[:, j] * M[:, j]
    norms = np.sqrt(nacc)
    # ANSI division-by-zero must keep throwing: a zero (or to-zero
    # underflowing) norm product goes to the expression path, which
    # raises DIVIDE_BY_ZERO exactly as before.  min(norm)² bounds every
    # pair's divisor from below, so this one scalar check covers all n².
    mn = norms.min() if n else 0.0
    if mn * mn == 0.0:
        return None
    b_all = spark.sparkContext.broadcast((ids, M, norms))
    # bound the per-batch (block × n) accumulator to ~32 MB
    max_block = max(1, 4_000_000 // n)

    def kernel(it):
        import pandas as pd

        a_ids, a_M, a_norms = b_all.value
        for pdf in it:
            pos_all = pdf["pos"].to_numpy()
            for s in range(0, len(pos_all), max_block):
                blk = pos_all[s : s + max_block]
                A = a_M[blk]
                acc = np.zeros((len(blk), n))
                for j in range(dim):  # fold over dims: exact order
                    acc = acc + A[:, j][:, None] * a_M[:, j][None, :]
                cos = acc / (a_norms[blk][:, None] * a_norms[None, :])
                # defensive: Spark compares NaN greater than any double
                # (zero-norm divisors already fell back driver-side)
                mask = (cos >= threshold) | np.isnan(cos)
                mask &= a_ids[blk][:, None] < a_ids[None, :]
                ai, bi = np.nonzero(mask)
                yield pd.DataFrame(
                    {
                        "vec_id_a": a_ids[blk][ai],
                        "vec_id_b": a_ids[bi],
                        "cos_raw": cos[ai, bi],
                    }
                )

    pos = spark.range(n).select(F.col("id").cast("int").alias("pos"))
    pairs = pos.mapInPandas(kernel, "vec_id_a long, vec_id_b long, cos_raw double")
    return pairs.select(
        "vec_id_a", "vec_id_b", F.round("cos_raw", 6).alias("cosine")
    )


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact near-dup pairs by cosine ≥ τ: (vec_id_a, vec_id_b, cosine).

    O(n²) pair enumeration — the verification oracle.  The scale path
    is LSH bucketing (operators.similarity.srp_ann_topk) feeding the
    same exact re-rank.  Dispatches to the vectorized NumPy kernel
    (bit-identical, see :func:`_cosine_pairs_vectorized`); the
    original expression form below is the semantic reference and the
    fallback for over-cap/ragged/empty corpora."""
    fast = _cosine_pairs_vectorized(df, threshold, vec_col, id_col)
    if fast is not None:
        return fast
    nd = with_norm(df, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "norm"
    )
    a = nd.select(
        F.col("id").alias("vec_id_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = nd.select(
        F.col("id").alias("vec_id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .select(
            "vec_id_a",
            "vec_id_b",
            (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= threshold)
        .select("vec_id_a", "vec_id_b", F.round("cos_raw", 6).alias("cosine"))
    )


def cosine_dup_oracle(table: str = "embeddings", threshold: float = 0.8) -> str:
    return f"""
WITH nd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                          (acc, x) -> acc + x)) AS norm
  FROM {table}
),
pairs AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         list_reduce(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
                     (acc, x) -> acc + x) / (a.norm * b.norm) AS cos_raw
  FROM nd a JOIN nd b ON a.vec_id < b.vec_id
)
SELECT vec_id_a, vec_id_b, round(cos_raw, 6) AS cosine
FROM pairs WHERE cos_raw >= {threshold}
"""


# ---------------------------------------------------------------------------
# 6. duplicate clusters → keeper selection
# ---------------------------------------------------------------------------

# Above this edge count the keeper computation stays distributed; below
# it one bounded collect + driver union-find replaces the iterative
# label-propagation rounds.  A few MB of (long, long) pairs.
_KEEPERS_MAX_EDGES = 200_000


def _cluster_keepers_unionfind(pairs: DataFrame) -> DataFrame | None:
    """Exact connected-components keepers via a bounded collect +
    union-find: identical output to the converged min-label
    propagation (keeper = MIN id of the component; node set = every id
    appearing in an edge).  Returns None — caller runs the distributed
    propagation — when the edge list is over-cap, non-bigint, or
    contains NULL ids."""
    if (
        dict(pairs.dtypes).get("doc_id_a") != "bigint"
        or dict(pairs.dtypes).get("doc_id_b") != "bigint"
    ):
        return None
    rows = (
        pairs.select("doc_id_a", "doc_id_b")
        .limit(_KEEPERS_MAX_EDGES + 1)
        .collect()
    )
    if len(rows) > _KEEPERS_MAX_EDGES:
        return None
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        if a is None or b is None:
            return None
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:  # union by min: the keeper IS the min root
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    out = [(node, find(node)) for node in parent]
    spark = pairs.sparkSession
    if len(out) <= 10_000:
        # VALUES LocalRelation (no Python-RDD re-evaluation per
        # action); the big-component case keeps createDataFrame —
        # megabyte SQL texts are their own pathology
        from integritychecksforvldbs_spark.functions.planutil import (
            local_relation,
        )

        return local_relation(
            spark, out, [("doc_id", "BIGINT"), ("keeper", "BIGINT")]
        )
    return spark.createDataFrame(out, "doc_id bigint, keeper bigint")


def duplicate_cluster_keepers(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over a near-dup pair graph: (doc_id,
    keeper), keeper = MIN doc_id of the component — the "which copy
    survives" step every dedup pipeline runs after pair generation.

    Hash-to-min label propagation: labels start as each node's own id;
    each round every node takes the min of its label and its
    neighbors' labels; converged when nothing changes.  Rounds needed
    = O(log diameter) for min propagation along paths — near-dup
    components are overwhelmingly tiny (pairs/triples), so 2-3 rounds
    dominate in practice and ``max_iter`` is a pathology bound.

    Scale shape: each round is one join (labels ⋈ edges on node) + one
    min-groupBy — both hash-shuffles on doc_id, AQE-sized; the driver
    sees only a per-round changed-row COUNT (one long), never data.
    Each round's labels are lineage-truncated (localCheckpoint), so
    the plan Catalyst optimizes is one round deep regardless of round
    count and the RETURNED frame is a flat scan — without this, the
    result plan re-derived the whole pair-generation chain (round-4
    audit: 160 scans) on every re-execution.

    Fast path: a near-dup edge list is metadata-sized at any sane dup
    rate (|pairs| ≪ |corpus|), so up to ``_KEEPERS_MAX_EDGES`` edges
    the components are solved with one bounded collect + driver
    union-find — the exact fixpoint of the same min-label recursion,
    replacing 3-4 rounds of shuffle jobs + checkpoints with one job.
    The distributed propagation remains the over-cap path (and the
    semantic reference).
    """
    from integritychecksforvldbs_spark.functions.planutil import truncate_lineage

    fast = _cluster_keepers_unionfind(pairs)
    if fast is not None:
        return fast
    edges = pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    # round 0 folded into the init: label = min(self, neighbors) —
    # saves a full propagation round (for the dominant pair/triple
    # components this IS convergence)
    labels = truncate_lineage(
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.least(F.first("src"), F.min("dst")).alias("lbl"))
    )
    try:
        # labels are per-node non-increasing, so the label SUM strictly
        # decreases until the fixpoint: an unchanged sum IS convergence
        # (one scalar agg per round instead of an old-vs-new join);
        # decimal sum so 8-byte ids can't wrap the accumulator
        prev_sum = labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))
        ).first()[0]
        for _ in range(max_iter):
            prop = (
                edges.join(labels, edges["dst"] == labels["node"])
                .select(F.col("src").alias("node"), "lbl")
            )
            # localCheckpoint, not persist: label frames are |V| rows
            # of two longs; superseded rounds are reclaimed by the
            # ContextCleaner (never unpersist a checkpointed frame)
            new_labels = truncate_lineage(
                labels.unionByName(prop)
                .groupBy("node")
                .agg(F.min("lbl").alias("lbl"))
            )
            cur_sum = new_labels.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)"))
            ).first()[0]
            labels = new_labels
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        return labels.selectExpr("node AS doc_id", "lbl AS keeper")
    finally:
        edges.unpersist()


def cluster_keepers_oracle(
    table: str = "documents", n: int = 3, threshold: float = 0.5
) -> str:
    """The identical clustering in DuckDB: near-dup pairs (tier-2
    oracle, which equals the LSH output at the shipped band settings)
    fed into a recursive reachability CTE; keeper = MIN reachable id."""
    pairs_sql = ngram_jaccard_oracle(table, n, threshold).strip()
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
)
SELECT node AS doc_id, MIN(lbl) AS keeper FROM reach GROUP BY node
"""


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus after near-dup removal — the end-to-end composition
    a pipeline actually runs: LSH pairs → cluster keepers → drop every
    doc whose keeper is another doc (left-anti join, so unpaired docs
    pass through untouched).  One row survives per duplicate cluster,
    deterministically (the min id)."""
    if pairs is None:
        pairs = minhash_lsh_pairs(df, id_col=id_col)
    drops = (
        duplicate_cluster_keepers(pairs)
        .filter(F.col("doc_id") != F.col("keeper"))
        .select(F.col("doc_id").alias(id_col))
    )
    return df.join(drops, id_col, "left_anti")


def survivor_stats_oracle(table: str = "documents", n: int = 3, threshold: float = 0.5) -> str:
    """Survivor counts per lang in DuckDB: the clustering CTE, a drop
    list (nodes that are not their component min), NOT EXISTS."""
    pairs_sql = ngram_jaccard_oracle(table, n, threshold).strip()
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
drops AS (
  SELECT node FROM reach GROUP BY node HAVING node <> MIN(lbl)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM {table} d
WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.node = d.doc_id)
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# 7. embedding near-dup — SRP-LSH scale path
# ---------------------------------------------------------------------------


def _lsh_candidate_pairs(
    nd: DataFrame,
    dim: int,
    n_bits: int,
    n_tables: int,
    seed: int,
) -> DataFrame:
    """Distinct candidate (id_a, id_b) pairs that share an SRP bucket
    in ANY of the ``n_tables`` hash tables.  One scan computes every
    table's bucket as an array element, an explode fans each vector
    out to ``n_tables`` rows, and the self-join is equi on
    (table, bucket) — only same-bucket rows ever meet, so the shuffle
    carries (id, table, bucket) triples, never vectors."""
    from integritychecksforvldbs_spark.functions.veccompute import (
        srp_bucket_array,
    )
    from integritychecksforvldbs_spark.operators.similarity import srp_planes

    # all n_tables bucket ids in ONE vectorized kernel pass (the
    # per-plane aggregate/zip_with lambdas are interpreted — n_tables ×
    # n_bits × dim interpreted steps per vector; bit-identical parity
    # pinned by tests/test_veccompute.py)
    buckets = srp_bucket_array(
        "v", [srp_planes(dim, n_bits, seed=seed + t) for t in range(n_tables)]
    )
    # both sides of the self-join consume the bucket frame: without a
    # persist the SRP signature computation (n_tables × n_bits dot
    # products per vector) runs twice — the same discipline the
    # minhash/simhash signature frames have (ContextCleaner reclaims
    # the blocks; the returned frame still depends on them, so no
    # eager unpersist)
    keyed = nd.select(
        "id", F.posexplode(buckets).alias("t", "b")
    ).persist()
    a = keyed.select(F.col("id").alias("vec_id_a"), "t", "b")
    b = keyed.select(F.col("id").alias("vec_id_b"), "t", "b")
    return (
        a.join(b, ["t", "b"])
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .distinct()
    )


def cosine_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-dup pairs by cosine ≥ τ via sign-random-projection LSH —
    the linear-scale path for the O(n²) :func:`cosine_dup_pairs`
    oracle.  Same output schema and the same exact verification
    arithmetic, so every emitted pair is a true pair (precision 1 by
    construction); recall is the standard SRP bound
    ``1 - (1 - (1 - θ/π)^n_bits)^n_tables`` per pair, ~1 for genuine
    near-dups (θ small) and vanishing for unrelated vectors.

    Scale shape: candidate generation shuffles only (id, table,
    bucket) triples — vectors join back in ONLY for the |candidates|
    verification, so total work is one corpus scan + a shuffle linear
    in n·n_tables + exact scoring of the collided pairs.  SRP is the
    right tool at near-dup thresholds (τ ≥ ~0.8); below that the angle
    is too wide for sign bits to prune and the exact quadratic tier is
    the honest choice.
    """
    probe = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
    if probe is None:  # no (non-NULL) vectors → typed empty pair frame
        return df.select(
            F.col(id_col).alias("vec_id_a"),
            F.col(id_col).alias("vec_id_b"),
            F.lit(0.0).alias("cosine"),
        ).limit(0)
    dim = len(probe[0])
    nd = with_norm(df, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "norm"
    )
    cand = _lsh_candidate_pairs(nd, dim, n_bits, n_tables, seed)
    a = nd.select(
        F.col("id").alias("vec_id_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = nd.select(
        F.col("id").alias("vec_id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    return (
        cand.join(a, "vec_id_a")
        .join(b, "vec_id_b")
        .select(
            "vec_id_a",
            "vec_id_b",
            (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= threshold)
        .select("vec_id_a", "vec_id_b", F.round("cos_raw", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# 6. fuzzy (edit-distance) duplicate pairs
# ---------------------------------------------------------------------------


def _fuzzy_pairs_deletion1(base: DataFrame) -> DataFrame:
    """ed ≤ 1 pairs from ``(id, s, l)`` via the single-deletion
    neighborhood: explode {s} ∪ del(s, i), equi-join on the variant,
    length-band filter, exact levenshtein verification.  See the
    dispatch comment in :func:`fuzzy_dup_pairs`."""
    variants = base.select(
        "id",
        "l",
        F.explode(
            F.expr(
                "array_distinct(concat(array(s), CASE WHEN l >= 1 THEN "
                "transform(sequence(1, l), i -> "
                "concat(substring(s, 1, i - 1), substring(s, i + 1, l))) "
                "ELSE array() END))"
            )
        ).alias("v"),
    )
    a = variants.select(
        F.col("id").alias("id_a"), F.col("l").alias("l_a"), "v"
    )
    b = variants.select(
        F.col("id").alias("id_b"), F.col("l").alias("l_b"), "v"
    )
    cand = (
        a.join(b, "v")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("l_a") - F.col("l_b")) <= 1)
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sv = base.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    tv = base.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    return (
        cand.join(sv, "id_a")
        .join(tv, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr("levenshtein(s_a, s_b)").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= 1)
    )


def fuzzy_dup_pairs(
    df: DataFrame,
    string_col: str = "title",
    id_col: str = "doc_id",
    max_dist: int = 1,
    q: int = 3,
) -> DataFrame:
    """Pairs of short strings (titles, names, product labels) within
    Levenshtein distance ``max_dist`` — the record-linkage primitive,
    EXACT (no false negatives) via q-gram count filtering [Gravano et
    al., VLDB'01]: if ed(a,b) ≤ d then the positional-multiset q-gram
    overlap is ≥ max(|a|,|b|) − q + 1 − q·d, so candidate pairs come
    from an equi-join on (gram, occurrence#) with a HAVING count
    bound, never a cross join; each candidate is then verified with
    the built-in ``levenshtein`` (identical semantics in Spark and
    DuckDB, so the oracle reproduces the exact pair set).

    Strings too short to be covered by the bound (overlap threshold
    ≤ 0, i.e. length ≤ q·(d+1) − 1 on the longer side) fall into a
    short band enumerated via a length-banded self-join — bounded in
    practice (titles under ~8 chars at the defaults) and exact.

    Scale shape: one shuffle building the gram stream, the (gram,
    occ#) equi-join (fan-out bounded by gram frequency — apply a
    stop-gram frequency cut upstream for adversarial corpora, as in
    :func:`shingles` ``max_df``), a pair-count aggregation, and a
    levenshtein projection on candidates only.  Long free text does
    not belong here: its levenshtein is O(len²) per pair — use the
    MinHash/SimHash tiers; this tier is for the short-string columns
    those tiers can't discriminate.
    """
    d = max_dist
    s_norm = F.lower(F.trim(F.col(string_col)))
    base = df.select(
        F.col(id_col).alias("id"), s_norm.alias("s"), F.length(s_norm).alias("l")
    )
    if d == 1:
        # deletion-neighborhood candidates (FastSS / SymSpell): ed(a,b) ≤ 1
        # guarantees a common member between {a} ∪ single-deletions(a)
        # and the same for b (substitution: delete the differing
        # position from both; insert/delete: the shorter string IS a
        # deletion of the longer) — so the equi-join on the variant
        # misses no true pair, and the levenshtein verification below
        # keeps the result exactly equal to the q-gram path.  The win:
        # variant keys are near-unique strings, so the join fans out
        # ∝ true matches — the q-gram path's (gram, occ) join explodes
        # quadratically on hot grams ('er ', 'ow ' in 30% of titles:
        # 33.7M joined rows for 5.2k titles at sf0.1).  Neighborhood
        # size is l+1 per string — linear scan, linear shuffle.
        return _fuzzy_pairs_deletion1(base)
    short_cut = q * (d + 1) - 1  # longer side ≤ this → bound is vacuous

    # -- q-gram candidate path (both sides long enough for the bound)
    longs = base.filter(F.col("l") > short_cut)
    grams = longs.select(
        "id",
        "l",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(l - {q} + 1, 0)), "
                f"i -> substring(s, i, {q}))"
            )
        ).alias("pos", "gram"),
    )
    # occurrence rank makes the join count a positional-multiset
    # intersection (gram repeated c times matches min(c_a, c_b) times)
    occ = grams.withColumn(
        "occ",
        F.row_number().over(Window.partitionBy("id", "gram").orderBy("pos")),
    ).select("id", "l", "gram", "occ")
    a = occ.select(
        F.col("id").alias("id_a"), F.col("l").alias("l_a"), "gram", "occ"
    )
    b = occ.select(
        F.col("id").alias("id_b"), F.col("l").alias("l_b"), "gram", "occ"
    )
    cand = (
        a.join(b, ["gram", "occ"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("l_a") - F.col("l_b")) <= d)
        )
        .groupBy("id_a", "id_b", "l_a", "l_b")
        .agg(F.count("*").alias("common"))
        .filter(
            F.col("common")
            >= F.greatest("l_a", "l_b") - F.lit(q - 1) - F.lit(q * d)
        )
        .select("id_a", "id_b")
    )

    # -- short band: enumerate within the length window (exact, small)
    sa = base.filter(F.col("l") <= short_cut).select(
        F.col("id").alias("id_a"), F.col("l").alias("l_a")
    )
    sb = base.filter(F.col("l") <= short_cut + d).select(
        F.col("id").alias("id_b"), F.col("l").alias("l_b")
    )
    short_pairs = (
        sa.join(
            sb,
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("l_a") - F.col("l_b")) <= d),
        ).select("id_a", "id_b")
    )
    # pairs where the SHORTER side is in the short band but the longer
    # is not are impossible: |l_a - l_b| ≤ d forces both within d of
    # the cut, which sb's widened filter covers.

    sv = base.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    tv = base.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    return (
        cand.unionByName(short_pairs)
        .dropDuplicates(["id_a", "id_b"])
        .join(sv, "id_a")
        .join(tv, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr("levenshtein(s_a, s_b)").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= d)
    )


def fuzzy_dup_oracle(
    table_sql: str,
    string_col: str = "title",
    id_col: str = "doc_id",
    max_dist: int = 1,
    q: int = 3,
) -> str:
    """Identical q-gram-filtered fuzzy join in DuckDB: same grams,
    same occurrence ranks, same count bound, same levenshtein."""
    d = max_dist
    short_cut = q * (d + 1) - 1
    return f"""
WITH base AS (
  SELECT {id_col} AS id, lower(trim({string_col})) AS s,
         length(lower(trim({string_col}))) AS l
  FROM {table_sql}
),
grams AS (
  SELECT id, l, u.gram, u.pos
  FROM (
    SELECT id, l,
           unnest(list_transform(range(1, greatest(l - {q} + 1, 0) + 1),
                                 i -> struct_pack(gram := substr(s, i, {q}),
                                                  pos := i))) AS u
    FROM base WHERE l > {short_cut}
  )
),
occ AS (
  SELECT id, l, gram,
         ROW_NUMBER() OVER (PARTITION BY id, gram ORDER BY pos) AS occ
  FROM grams
),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM occ a JOIN occ b ON a.gram = b.gram AND a.occ = b.occ
  WHERE a.id < b.id AND abs(a.l - b.l) <= {d}
  GROUP BY a.id, b.id, a.l, b.l
  HAVING COUNT(*) >= greatest(a.l, b.l) - {q - 1} - {q * d}
),
shorts AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM (SELECT id, l FROM base WHERE l <= {short_cut}) a
  JOIN (SELECT id, l FROM base WHERE l <= {short_cut + d}) b
    ON a.id < b.id AND abs(a.l - b.l) <= {d}
),
pairs AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT * FROM cand UNION ALL SELECT * FROM shorts
  )
)
SELECT p.id_a, p.id_b,
       CAST(levenshtein(sa.s, sb.s) AS INT) AS dist
FROM pairs p
JOIN base sa ON sa.id = p.id_a
JOIN base sb ON sb.id = p.id_b
WHERE levenshtein(sa.s, sb.s) <= {d}
"""


# ---------------------------------------------------------------------------
# asymmetric containment (quote / partial-copy detection)
# ---------------------------------------------------------------------------

def ngram_containment_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Directed near-dup pairs by CONTAINMENT ``|A∩B| / |A|``:
    (src_doc_id, dst_doc_id, containment) where the source's shingles
    are ≥``threshold`` contained in the destination — what Jaccard
    misses when a short document is wholly quoted inside a long one
    (the union denominator dilutes the score).  Broder's containment
    measure; the quote/partial-copy detector of a curation stack.

    One shingle self-join computes each undirected pair's intersection
    ONCE; both directions then emit row-locally (explode of the two
    (src, dst, |src|) orientations) — no second join.  Same
    ``max_df`` frequency cut as the Jaccard tier bounds fan-out, and
    the same hashed-gram carry (containment is pure count arithmetic).
    """
    sh = hashed_shingles(df, text_col, id_col, n, max_df, reuse=True)
    return containment_from_scores(pair_scores(sh), threshold)


def ngram_containment_oracle(
    table: str = "documents", n: int = 3, threshold: float = 0.8
) -> str:
    """Identical containment pairs in DuckDB (integer/integer division
    → bitwise-equal doubles)."""
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, g AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - {n - 2}),
                  i -> array_to_string(string_split(text, ' ')[i:i+{n - 1}], ' '))) AS g
    FROM {table}
    WHERE len(string_split(text, ' ')) >= {n})
),
card AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS card FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, CAST(COUNT(*) AS BIGINT) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
directed AS (
  SELECT doc_id_a AS src_doc_id, doc_id_b AS dst_doc_id,
         common / ca.card AS containment
  FROM common JOIN card ca ON ca.doc_id = doc_id_a
  UNION ALL
  SELECT doc_id_b, doc_id_a, common / cb.card
  FROM common JOIN card cb ON cb.doc_id = doc_id_b
)
SELECT * FROM directed WHERE containment >= {threshold}
"""


# ---------------------------------------------------------------------------
# pair-set evaluation (comparing dedup tiers)
# ---------------------------------------------------------------------------

def pair_set_metrics(
    predicted: DataFrame,
    truth: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    round_to: int = 6,
) -> DataFrame:
    """One row: (n_predicted, n_truth, tp, fp, fn, precision, recall,
    f1) comparing two UNDIRECTED pair sets — how a candidate dedup
    tier is scored against an exact tier.  Pairs are canonicalized
    (least, greatest) and deduplicated, so directed or unordered
    inputs compare correctly; ratios divide exact integers and are
    ROUNDed (0-denominator → NULL, e.g. empty truth)."""

    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        ).distinct()

    # three actions consume each canonical set — persist so the
    # upstream pair computation runs once, not three times
    p, t = canon(predicted).persist(), canon(truth).persist()
    try:
        tp = p.join(t, ["a", "b"]).count()
        n_p, n_t = p.count(), t.count()
    finally:
        p.unpersist()
        t.unpersist()
    fp, fn = n_p - tp, n_t - tp
    spark = predicted.sparkSession
    prec = tp / n_p if n_p else None
    rec = tp / n_t if n_t else None
    f1 = (
        2 * prec * rec / (prec + rec)
        if prec is not None and rec is not None and (prec + rec) > 0
        else None
    )
    # round via Spark F.round (HALF_UP, matching DuckDB ROUND) — a
    # Python round() here is banker's rounding and diverges from the
    # oracle on exactly-representable ties (round(1/128, 6))
    from integritychecksforvldbs_spark.functions.planutil import (
        local_relation,
    )

    return local_relation(
        spark,
        [(n_p, n_t, tp, fp, fn, prec, rec, f1)],
        [
            ("n_predicted", "BIGINT"), ("n_truth", "BIGINT"),
            ("tp", "BIGINT"), ("fp", "BIGINT"), ("fn", "BIGINT"),
            ("precision", "DOUBLE"), ("recall", "DOUBLE"),
            ("f1", "DOUBLE"),
        ],
    ).select(
        "n_predicted", "n_truth", "tp", "fp", "fn",
        F.round("precision", round_to).alias("precision"),
        F.round("recall", round_to).alias("recall"),
        F.round("f1", round_to).alias("f1"),
    )


def pair_set_metrics_oracle(
    predicted_sql: str, truth_sql: str, round_to: int = 6
) -> str:
    """DuckDB SQL over two pair relations (columns doc_id_a,
    doc_id_b — any orientation) computing the identical one-row
    metrics."""
    return f"""
WITH p AS (
  SELECT DISTINCT least(doc_id_a, doc_id_b) AS a,
                  greatest(doc_id_a, doc_id_b) AS b
  FROM ({predicted_sql}) t
),
t AS (
  SELECT DISTINCT least(doc_id_a, doc_id_b) AS a,
                  greatest(doc_id_a, doc_id_b) AS b
  FROM ({truth_sql}) t
),
c AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_predicted,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM t) AS n_truth,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM p JOIN t USING (a, b)) AS tp
)
SELECT n_predicted, n_truth, tp,
       n_predicted - tp AS fp, n_truth - tp AS fn,
       CASE WHEN n_predicted > 0 THEN ROUND(CAST(tp AS DOUBLE) / n_predicted, {round_to}) END AS precision,
       CASE WHEN n_truth > 0 THEN ROUND(CAST(tp AS DOUBLE) / n_truth, {round_to}) END AS recall,
       CASE WHEN n_predicted > 0 AND n_truth > 0 AND tp > 0
            THEN ROUND(2.0 * (CAST(tp AS DOUBLE) / n_predicted) * (CAST(tp AS DOUBLE) / n_truth)
                 / ((CAST(tp AS DOUBLE) / n_predicted) + (CAST(tp AS DOUBLE) / n_truth)), {round_to}) END AS f1
FROM c
"""


# ---------------------------------------------------------------------------
# 10. SemDeDup: cluster-bounded semantic near-dup discovery
# ---------------------------------------------------------------------------


def semantic_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    centroid_stride: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style cluster-bounded cosine near-dup pairs:
    (cluster_id, vec_id_a, vec_id_b, cosine).

    The scale path for embedding dedup (Abbas et al. 2023,
    "SemDeDup"): partition the corpus into k clusters, then enumerate
    pairs only WITHIN each cluster — global O(n²) becomes Σ|cluster|²
    ≈ n²/k for balanced clusters, and each cluster's quadratic work is
    an independent shuffle partition.  Pairs that straddle a cluster
    boundary are missed by design; that is the approximation the
    paper accepts (and measures) in exchange for tractability.

    Two codebook tiers, same downstream plan:

    - default — deterministic stride codebook (every vector whose id
      ≡ 0 mod ``centroid_stride`` is a centroid).  No training pass,
      fully oracle-able: the DuckDB twin replays assignment exactly
      because the centroid SET is a pure projection of the input.
    - ``centroids=`` — a trained codebook from
      :func:`..similarity.kmeans_centroids` (rows-only tier; k-means
      is not SQL-expressible).  Better-balanced clusters, so tighter
      Σ|cluster|² at the same k.

    Assignment is argmin squared-L2 over the broadcast codebook,
    computed as a strict left-to-right double fold (the same
    summation discipline as :func:`cosine_dup_pairs`) so both engines
    produce bitwise-equal distances; ties break on centroid id via
    lexicographic MIN over (d2, centroid_id) structs — one map-side-
    combinable aggregation, no window over the n×k expansion.  At
    100 TB: the n×k assignment expansion never materializes (partial
    aggregation folds it map-side), the pair join shuffles on
    cluster_id, and a skewed giant cluster is the known failure mode
    — the mitigation is raising k, not a different plan.

    Reference parity: the reference has no embedding operators; this
    extends the dedup family (SURVEY §2 north-star extensions) beyond
    CHECKTABLE-style exact comparison the same way MinHash-LSH does
    for text.
    """
    nd = with_norm(df, vec_col).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        "norm",
    )
    if centroids is None:
        cents = nd.filter(F.col("id") % centroid_stride == 0).select(
            F.col("id").alias("centroid_id"), F.col("v").alias("cv")
        )
    else:
        cents = nd.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "centroid_id INT, cv ARRAY<DOUBLE>",
        )
    d2 = F.expr(
        "aggregate(zip_with(CAST(v AS ARRAY<DOUBLE>), CAST(cv AS ARRAY<DOUBLE>), "
        "(x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
    )
    assign = (
        nd.crossJoin(F.broadcast(cents))
        .select("id", F.struct(d2.alias("d2"), F.col("centroid_id")).alias("dc"))
        .groupBy("id")
        .agg(F.min("dc").alias("m"))
        .select("id", F.col("m.centroid_id").alias("cluster_id"))
    )
    from integritychecksforvldbs_spark.functions.planutil import truncate_lineage

    # materialize the assignment ONCE: a plain self-join re-derives the
    # whole scan + n×k assignment chain on each side (Spark does no
    # cross-branch CSE), doubling the dominant stage at scale
    av = truncate_lineage(nd.join(assign, "id"))
    a = av.select(
        F.col("cluster_id"),
        F.col("id").alias("vec_id_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
    )
    b = av.select(
        F.col("cluster_id").alias("cb"),
        F.col("id").alias("vec_id_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    return (
        a.join(
            b,
            (F.col("cluster_id") == F.col("cb"))
            & (F.col("vec_id_a") < F.col("vec_id_b")),
        )
        .select(
            "cluster_id",
            "vec_id_a",
            "vec_id_b",
            (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= threshold)
        .select(
            "cluster_id", "vec_id_a", "vec_id_b", F.round("cos_raw", 6).alias("cosine")
        )
    )


def semantic_dedup_oracle(
    table: str = "embeddings", threshold: float = 0.8, centroid_stride: int = 64
) -> str:
    return f"""
WITH nd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                          (acc, x) -> acc + x)) AS norm
  FROM {table}
),
cent AS (SELECT vec_id AS cid, v AS cv FROM nd WHERE vec_id % {centroid_stride} = 0),
dist AS (
  SELECT nd.vec_id, cent.cid,
         list_reduce(list_transform(range(1, len(nd.v) + 1),
                                    i -> (nd.v[i] - cent.cv[i]) * (nd.v[i] - cent.cv[i])),
                     (acc, x) -> acc + x) AS d2
  FROM nd CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cid AS cluster_id FROM dist
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
),
av AS (
  SELECT a.vec_id, a.cluster_id, nd.v, nd.norm
  FROM assign a JOIN nd ON a.vec_id = nd.vec_id
)
SELECT a.cluster_id, a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       round(list_reduce(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
                         (acc, x) -> acc + x) / (a.norm * b.norm), 6) AS cosine
FROM av a JOIN av b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
WHERE list_reduce(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
                  (acc, x) -> acc + x) / (a.norm * b.norm) >= {threshold}
"""
