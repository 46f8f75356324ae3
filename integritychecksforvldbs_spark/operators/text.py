"""Text-analysis kernels for training-data pipelines (north star).

Per-document, single-pass, all built-in JVM expressions (no Python
UDFs): the whole family is a projection over one scan of ``documents``
— at 100 TB these pipeline behind the parquet reader with column
pruning (only ``doc_id, text`` read) and whole-stage codegen.

Every kernel has a DuckDB oracle generator computing the *identical*
value: ratios are integer/integer divisions (bitwise-equal doubles),
hashes are md5-derived or small-modulus polynomial folds, and the
winnowing tier uses the same window-frame min in both engines.

- **token_stats** — whitespace tokens + a BPE-ish regex token count
  (letters runs | single digits | single punctuation).
- **quality_score** — punctuation/digit/stopword ratios, mean word
  length, and a 4-point rubric score (discrete, boundary-safe).
- **lang_id** — stopword-hit argmax over {en, de, fr, es} with a
  deterministic preference order; 'und' when nothing hits.
- **fingerprint** — full-document polynomial rolling hash
  (acc·31 + code) mod 1e9+7.
- **winnow_fingerprints** — Schleimer et al. winnowing: char k-gram
  md5 hashes, sliding-window min, distinct per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Whitespace is spelled as an EXPLICIT class, not \s: Java's default
# \s is [ \t\n\x0B\f\r] but RE2's (DuckDB's) \s excludes \x0B — with
# \s the two engines disagree on vertical-tab text (Spark treats VT
# as whitespace, the oracle emits it as a token).  The explicit class
# means Java, RE2, and the Python query-side mirror (search.py) all
# tokenize byte-for-byte alike.
ASCII_WS = " \\t\\n\\x0b\\f\\r"
TOKEN_REGEX = f"[A-Za-z]+|[0-9]|[^A-Za-z0-9{ASCII_WS}]"
PUNCT_REGEX = f"[^A-Za-z0-9{ASCII_WS}]"
DIGIT_REGEX = "[0-9]"


def _spark_re(pattern: str) -> str:
    """Escape a regex for embedding in a Spark SQL string literal.

    Spark SQL literals use Java-style escapes (``'\\s'`` → ``s``), so
    backslashes must be doubled; DuckDB literals keep them as-is.
    """
    return pattern.replace("\\", "\\\\")

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "les", "et", "est", "une", "dans", "pour", "que", "vous"],
    "es": ["el", "los", "y", "es", "una", "en", "para", "por", "con"],
}

FP_MOD = 1_000_000_007
FP_BASE = 31


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ---------------------------------------------------------------------------
# token stats
# ---------------------------------------------------------------------------

def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = text_col
    return df.select(
        F.col(id_col).alias("doc_id"),
        # counts runs of non-space without materializing the token
        # array (== size(filter(split(t, ' '), x -> x <> '')): split
        # breaks on single spaces only, so tokens are exactly the
        # maximal [^ ]+ runs); the array form pays an allocation per
        # row that the count never needs
        F.expr(f"CAST(regexp_count({t}, '[^ ]+') AS BIGINT)").alias(
            "n_tokens_ws"
        ),
        F.expr(
            f"CAST(size(regexp_extract_all({t}, '{_spark_re(TOKEN_REGEX)}', 0)) AS BIGINT)"
        ).alias("n_tokens_regex"),
        F.expr(f"CAST(length({t}) AS BIGINT)").alias("n_chars"),
    )


def token_stats_oracle(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens_ws,
  CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS n_tokens_regex,
  CAST(length(text) AS BIGINT) AS n_chars
FROM {table}
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Ratios + a discrete 4-point rubric (each criterion 0.25):
    reasonable length, enough stopwords, limited punctuation, sane
    mean word length.  Discrete buckets avoid FP-boundary flakiness
    between engines; the input ratios are exact int/int divisions."""
    t = text_col
    en = _sql_list(STOPWORDS["en"])
    # n_tokens via regexp_count: same value as the split-filter form
    # (see token_stats) without allocating the token array per row
    expr = f"""
    named_struct(
      'n_tokens', regexp_count({t}, '[^ ]+'),
      'n_punct', size(regexp_extract_all({t}, '{_spark_re(PUNCT_REGEX)}', 0)),
      'n_digit', size(regexp_extract_all({t}, '{_spark_re(DIGIT_REGEX)}', 0)),
      'n_stop', size(filter(split(lower({t}), ' '), x -> x IN ({en}))),
      'n_chars', length({t}),
      'n_nospace', length(replace({t}, ' ', ''))
    )
    """
    s = df.select(F.col(id_col).alias("doc_id"), F.expr(expr).alias("m"))
    return s.select(
        "doc_id",
        (F.col("m.n_punct") / F.col("m.n_chars")).alias("punct_ratio"),
        (F.col("m.n_digit") / F.col("m.n_chars")).alias("digit_ratio"),
        (F.col("m.n_stop") / F.col("m.n_tokens")).alias("stopword_ratio"),
        (F.col("m.n_nospace") / F.col("m.n_tokens")).alias("mean_word_len"),
        (
            F.when((F.col("m.n_tokens") >= 5) & (F.col("m.n_tokens") <= 10000), 0.25).otherwise(0.0)
            + F.when(F.col("m.n_stop") / F.col("m.n_tokens") >= 0.05, 0.25).otherwise(0.0)
            + F.when(F.col("m.n_punct") / F.col("m.n_chars") <= 0.2, 0.25).otherwise(0.0)
            + F.when(
                (F.col("m.n_nospace") / F.col("m.n_tokens") >= 2)
                & (F.col("m.n_nospace") / F.col("m.n_tokens") <= 12),
                0.25,
            ).otherwise(0.0)
        ).alias("quality_score"),
    )


def quality_score_oracle(table: str = "documents") -> str:
    en = _sql_list(STOPWORDS["en"])
    return f"""
WITH m AS (
  SELECT doc_id,
    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
    len(regexp_extract_all(text, '{PUNCT_REGEX}')) AS n_punct,
    len(regexp_extract_all(text, '{DIGIT_REGEX}')) AS n_digit,
    len(list_filter(string_split(lower(text), ' '), x -> x IN ({en}))) AS n_stop,
    length(text) AS n_chars,
    length(replace(text, ' ', '')) AS n_nospace
  FROM {table}
)
SELECT doc_id,
  n_punct / n_chars AS punct_ratio,
  n_digit / n_chars AS digit_ratio,
  n_stop / n_tokens AS stopword_ratio,
  n_nospace / n_tokens AS mean_word_len,
  CAST(
    (CASE WHEN n_tokens BETWEEN 5 AND 10000 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN n_stop / n_tokens >= 0.05 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN n_punct / n_chars <= 0.2 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN n_nospace / n_tokens BETWEEN 2 AND 12 THEN 0.25 ELSE 0.0 END)
  AS DOUBLE) AS quality_score
FROM m
"""


# ---------------------------------------------------------------------------
# language identification
# ---------------------------------------------------------------------------

def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit argmax with fixed preference order en>de>fr>es;
    'und' (undetermined) when no list hits."""
    t = text_col
    hits = {
        lang: f"size(filter(split(lower({t}), ' '), x -> x IN ({_sql_list(ws)})))"
        for lang, ws in STOPWORDS.items()
    }
    pred = f"""
    CASE
      WHEN {hits['en']} = 0 AND {hits['de']} = 0 AND {hits['fr']} = 0 AND {hits['es']} = 0 THEN 'und'
      WHEN {hits['en']} >= {hits['de']} AND {hits['en']} >= {hits['fr']} AND {hits['en']} >= {hits['es']} THEN 'en'
      WHEN {hits['de']} >= {hits['fr']} AND {hits['de']} >= {hits['es']} THEN 'de'
      WHEN {hits['fr']} >= {hits['es']} THEN 'fr'
      ELSE 'es'
    END
    """
    return df.select(F.col(id_col).alias("doc_id"), F.expr(pred).alias("lang_pred"))


def lang_id_oracle(table: str = "documents") -> str:
    hits = {
        lang: f"len(list_filter(string_split(lower(text), ' '), x -> x IN ({_sql_list(ws)})))"
        for lang, ws in STOPWORDS.items()
    }
    return f"""
SELECT doc_id,
  CASE
    WHEN {hits['en']} = 0 AND {hits['de']} = 0 AND {hits['fr']} = 0 AND {hits['es']} = 0 THEN 'und'
    WHEN {hits['en']} >= {hits['de']} AND {hits['en']} >= {hits['fr']} AND {hits['en']} >= {hits['es']} THEN 'en'
    WHEN {hits['de']} >= {hits['fr']} AND {hits['de']} >= {hits['es']} THEN 'de'
    WHEN {hits['fr']} >= {hits['es']} THEN 'fr'
    ELSE 'es'
  END AS lang_pred
FROM {table}
"""


# ---------------------------------------------------------------------------
# document fingerprints
# ---------------------------------------------------------------------------

def _fingerprint_vectorized(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame | None:
    """The document hash as a NumPy mapInPandas kernel — exact integer
    math, identical to the expression fold by algebra: the left fold
    h_i = (h_{i-1}·b + c_i) mod m equals Σ c_i·b^{n-i} mod m, computed
    with precomputed powers of b mod m and chunked modular sums (every
    intermediate < 2^63: codes < 2^21, powers < 2^30, ≤4096-term
    partial sums).  Code points via utf-32 decode =
    ``ascii(substring(t, i, 1))`` (the CDC-chunk kernel's proven
    equivalence).  The expression path stays as the semantic
    reference; non-bigint ids fall back (None)."""
    if dict(df.dtypes).get(id_col) != "bigint":
        return None
    from integritychecksforvldbs_spark.functions.planutil import fan_out

    b_, m = FP_BASE, FP_MOD
    base = fan_out(
        df.filter(F.expr(f"length({text_col}) > 0")).select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
        )
    )

    def kernel(it):
        import numpy as np
        import pandas as pd

        pows = np.array([1], dtype=np.int64)  # b^0 .. grown per batch

        def grow(n: int):
            nonlocal pows
            if len(pows) >= n:
                return
            cur = pows.tolist()
            last = cur[-1]
            while len(cur) < n:
                last = (last * b_) % m
                cur.append(last)
            pows = np.array(cur, dtype=np.int64)

        for pdf in it:
            ids, fps = [], []
            for doc_id, txt in zip(pdf["doc_id"], pdf["_text"]):
                codes = np.frombuffer(
                    txt.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                n = len(codes)
                grow(n)
                terms = codes * pows[:n][::-1]
                total = 0
                for s in range(0, n, 4096):
                    total = (total + int(terms[s : s + 4096].sum())) % m
                ids.append(doc_id)
                fps.append(total)
            yield pd.DataFrame({"doc_id": ids, "fingerprint": fps})

    return base.mapInPandas(kernel, "doc_id bigint, fingerprint bigint")


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Polynomial rolling hash of the whole document:
    fold (acc·{base} + code(char)) mod {mod} left-to-right.
    Dispatches to the vectorized kernel (bit-identical — see
    :func:`_fingerprint_vectorized`); the expression fold below is the
    semantic reference and the non-bigint-id fallback (the per-char
    lambda is interpreted: ~n steps per document)."""
    fast = _fingerprint_vectorized(df, text_col, id_col)
    if fast is not None:
        return fast
    t = text_col
    expr = (
        f"aggregate(transform(sequence(1, length({t})), i -> ascii(substring({t}, i, 1))), "
        f"CAST(0 AS BIGINT), (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD})"
    )
    return df.filter(F.expr(f"length({t}) > 0")).select(
        F.col(id_col).alias("doc_id"), F.expr(expr).alias("fingerprint")
    )


def fingerprint_oracle(table: str = "documents") -> str:
    # list_reduce has no init arg → prepend the 0 seed
    return f"""
SELECT doc_id,
  list_reduce(
    list_concat([CAST(0 AS BIGINT)],
      list_transform(generate_series(1, length(text)), i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
    (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}) AS fingerprint
FROM {table} WHERE length(text) > 0
"""


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD'03): hash every char k-gram
    (md5-derived 60-bit, portable), keep the min of each sliding
    window of ``window`` consecutive k-grams, distinct per doc.
    Robust local fingerprints for plagiarism/near-dup detection.

    Computed entirely per-row with array expressions — gram hashes,
    sliding-window mins, and the per-doc distinct never leave the row,
    so the whole kernel is a shuffle-free projection (the old
    posexplode → Window(partitionBy doc_id) → distinct form shuffled
    every gram twice; at 100 TB that shuffle IS the job).  A document
    is bounded-size, so the per-row arrays are too.  Equivalent
    because doc_id is unique: a global distinct over (doc_id,
    fingerprint) == per-doc ``array_distinct``, and ``slice`` past the
    array end clips exactly like a ROWS BETWEEN frame at partition end.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    t = text_col
    hashes = (
        f"transform(sequence(1, length({t}) - {k - 1}), "
        f"i -> CAST(conv(substring(md5(substring({t}, i, {k})), 1, 15), 16, 10) AS BIGINT))"
    )
    # sliding min via k-way least (out-of-range get() is NULL — ANSI-
    # safe, unlike hs[i] — and least skips NULLs → exact end-of-array
    # clipping, no per-window slice allocation); window=1 degenerates to
    # the gram hashes themselves (least() needs >= 2 args)
    lasts = ", ".join(f"get(hs, j + {i})" for i in range(window))
    win_expr = f"least({lasts})" if window > 1 else lasts
    wins = (
        f"array_distinct(transform(sequence(0, size(hs) - 1), "
        f"j -> {win_expr}))"
    )
    return (
        df.filter(F.expr(f"length({t}) >= {k}"))
        .select(F.col(id_col).alias("doc_id"), F.expr(hashes).alias("hs"))
        .select("doc_id", F.explode(F.expr(wins)).alias("fingerprint"))
    )


def winnow_oracle(table: str = "documents", k: int = 8, window: int = 4) -> str:
    return f"""
WITH grams AS (
  SELECT doc_id, i AS pos,
         CAST('0x' || substr(md5(substring(text, i, {k})), 1, 15) AS BIGINT) AS h
  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - {k - 1})) AS i
        FROM {table} WHERE length(text) >= {k})
)
SELECT DISTINCT doc_id,
       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS fingerprint
FROM grams
"""


# ---------------------------------------------------------------------------
# vocabulary building (top-k tokens)
# ---------------------------------------------------------------------------

def vocabulary(
    df: DataFrame,
    k: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary: top-``k`` lowercased regex tokens by total
    count with their document frequency — the tokenizer-training /
    corpus-inspection primitive.

    One explode → one groupBy(token) with map-side partial counts
    (`count` and `count distinct doc` both partial-aggregate) → the
    global top-k plans as TakeOrderedAndProject (per-partition partial
    top-k, no full sort).  Ties broken by token so the cut is
    deterministic and oracle-stable.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(
                f"regexp_extract_all(lower({text_col}), '{_spark_re(TOKEN_REGEX)}', 0)"
            )
        ).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(k)
    )


def vocabulary_oracle(table: str = "documents", k: int = 1000) -> str:
    return f"""
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_REGEX}')) AS token
  FROM {table}
)
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# rarity scoring (TF-IDF family)
# ---------------------------------------------------------------------------

RARITY_SCALE = 1_000_000


def rarity_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token-rarity score — the TF-IDF plan shape:
    explode tokens → document-frequency aggregation → join the df
    table back onto the token stream → per-doc aggregate.  Flags
    boilerplate (all-common-token docs score low) and gibberish
    (unique-token docs score high) for corpus curation.

    The idf surrogate is integer-scaled ``SCALE div (df+1)`` rather
    than ``ln(N/df)``: every aggregate is then an exact integer SUM
    (order-independent across partitions) and the only floating-point
    op is one final division — bitwise-identical in Spark and DuckDB,
    where an ``ln``-based score could differ in the last ulp between
    libm implementations.

    Scale: the raw token stream collapses to (doc_id, token, cnt)
    FIRST — map-side partial counts mean every later exchange carries
    one row per distinct (doc, token), never per occurrence.  df_count
    is then a plain COUNT over the collapsed stream (the two-phase
    countDistinct expansion disappears), the join-back shuffles the
    collapsed rows, and the per-doc aggregate weights by cnt:
    Σ cnt·(SCALE div (df+1)) ≡ the per-occurrence sum, exactly, in
    integers.  One more static exchange than the join-the-raw-stream
    form, but strictly fewer shuffled bytes — the trade that wins at
    100 TB (and measures faster at sandbox scale too).
    """
    t, i = text_col, id_col
    toks = df.select(
        F.col(i).alias("doc_id"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({t}), '{_spark_re(TOKEN_REGEX)}', 0)")
        ).alias("token"),
    )
    tok_counts = toks.groupBy("doc_id", "token").agg(
        F.count("*").alias("cnt")
    )
    dfreq = tok_counts.groupBy("token").agg(
        F.count("*").cast("long").alias("df_count")
    )
    return (
        tok_counts.join(dfreq, "token")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.expr(f"{RARITY_SCALE} div (df_count + 1)"))
            .cast("long")
            .alias("rarity_sum"),
            F.sum("cnt").cast("long").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "rarity_sum",
            "n_tokens",
            (F.col("rarity_sum") / F.col("n_tokens")).alias("rarity"),
        )
    )


def rarity_score_oracle(table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_REGEX}')) AS token
  FROM {table}
),
dfreq AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df_count
  FROM toks GROUP BY token
)
SELECT doc_id,
       CAST(SUM({RARITY_SCALE} // (df_count + 1)) AS BIGINT) AS rarity_sum,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM({RARITY_SCALE} // (df_count + 1)) AS BIGINT)
         / CAST(COUNT(*) AS BIGINT) AS rarity
FROM toks JOIN dfreq USING (token)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# repetition quality rules (Gopher-style)
# ---------------------------------------------------------------------------

def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    duplicate word 2-grams / 3-grams, and the share of tokens taken by
    the single most frequent token.  Highly repetitive machine-generated
    or boilerplate text scores near 1; natural prose near 0.

    Row-local projection over one scan (shuffle-free, codegen JVM).
    The n-gram builders guard ``sequence`` with an explicit CASE so the
    expression is total under Catalyst constraint folding — on a
    <n-token doc ``sequence(1, size-n+1)`` would count DOWN and slice
    would throw (the round-2 shingle crash; dedup.py shingle_arrays).
    Fractions are int/int IEEE divisions, bitwise-equal cross-engine.

    The token and gram arrays are MATERIALIZED in staged projections:
    a subexpression inlined inside a ``transform``/``filter`` lambda
    is re-evaluated per ELEMENT (Catalyst does not hoist
    loop-invariant lambda subtrees), so the old single-expression form
    re-split the text O(n_tokens) times per row — quadratic per doc.
    """
    t = text_col
    g2 = (
        "CASE WHEN size(ts) >= 2 THEN "
        "transform(sequence(1, size(ts) - 1), "
        "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    g3 = (
        "CASE WHEN size(ts) >= 3 THEN "
        "transform(sequence(1, size(ts) - 2), "
        "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1), "
        "' ', element_at(ts, i + 2))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    top = (
        "array_max(transform(array_distinct(ts), "
        "g -> size(filter(ts, x -> x = g))))"
    )
    expr = f"""
    named_struct(
      'n_tokens', size(ts),
      'n_g2', size(g2s),
      'd_g2', size(array_distinct(g2s)),
      'n_g3', size(g3s),
      'd_g3', size(array_distinct(g3s)),
      'top', CASE WHEN size(ts) = 0 THEN 0 ELSE {top} END
    )
    """
    s = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.expr(f"filter(split({t}, ' '), x -> x <> '')").alias("ts"),
        )
        .select(
            "doc_id", "ts", F.expr(g2).alias("g2s"), F.expr(g3).alias("g3s")
        )
        .select("doc_id", F.expr(expr).alias("m"))
    )
    frac = lambda n, d: F.when(  # noqa: E731
        F.col(f"m.{n}") == 0, F.lit(0.0)
    ).otherwise((F.col(f"m.{n}") - F.col(f"m.{d}")) / F.col(f"m.{n}"))
    return s.select(
        "doc_id",
        F.col("m.n_tokens").cast("long").alias("n_tokens"),
        frac("n_g2", "d_g2").alias("dup_2gram_frac"),
        frac("n_g3", "d_g3").alias("dup_3gram_frac"),
        F.when(F.col("m.n_tokens") == 0, F.lit(0.0))
        .otherwise(F.col("m.top") / F.col("m.n_tokens"))
        .alias("top_token_frac"),
    )


def gopher_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-rule composite keep/drop decision per document (Rae et
    al. 2021 §A1.1 heuristics, integer-exact form): (doc_id, n_words,
    mean_word_len_e2, n_stopword_hits, n_alpha_words, keep).

    Rules (all must hold for ``keep=1``):
      - 10 ≤ word count ≤ 50,000
      - mean word length in [1.5, 10] chars (scaled ×100 to an exact
        integer: ``sum(len) * 100 DIV n`` — no FP boundary flake)
      - ≥ 2 hits from the English stopword list
      - ≥ 80% of words contain an alphabetic character
        (``n_alpha * 10 >= n_words * 8`` — integer cross-multiply)

    Row-local projection over one scan; composes with
    ``repetition_stats`` (the repetition rules live there) for the
    full Gopher gate.
    """
    t = text_col
    en = _sql_list(STOPWORDS["en"])
    # split once into a column: the three token-array consumers each
    # re-ran filter(split(...)) when inlined
    expr = f"""
    named_struct(
      'n_words', CAST(size(ts) AS BIGINT),
      'sum_len', CAST(aggregate(ts, 0, (acc, x) -> acc + length(x)) AS BIGINT),
      'n_stop', CAST(size(filter(split(lower(__gf_text), ' '), x -> x IN ({en}))) AS BIGINT),
      'n_alpha', CAST(size(filter(ts, x -> x rlike '[A-Za-z]')) AS BIGINT)
    )
    """
    s = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(t).alias("__gf_text"),
        F.expr(f"filter(split({t}, ' '), x -> x <> '')").alias("ts"),
    ).select(F.col("doc_id"), F.expr(expr).alias("m"))
    mwl = F.when(
        F.col("m.n_words") > 0, F.expr("m.sum_len * 100 DIV m.n_words")
    ).otherwise(F.lit(0)).cast("long")
    keep = (
        F.col("m.n_words").between(10, 50000)
        & mwl.between(150, 1000)
        & (F.col("m.n_stop") >= 2)
        & (F.col("m.n_alpha") * 10 >= F.col("m.n_words") * 8)
    )
    return s.select(
        "doc_id",
        F.col("m.n_words").alias("n_words"),
        mwl.alias("mean_word_len_e2"),
        F.col("m.n_stop").alias("n_stopword_hits"),
        F.col("m.n_alpha").alias("n_alpha_words"),
        keep.cast("int").alias("keep"),
    )


def gopher_filter_oracle(table: str = "documents") -> str:
    en = _sql_list(STOPWORDS["en"])
    toks = "list_filter(string_split(text, ' '), x -> x <> '')"
    return f"""
WITH m AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_words,
    CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS sum_len,
    CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN ({en}))) AS BIGINT) AS n_stop,
    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha
  FROM (SELECT doc_id, text, {toks} AS toks FROM {table})
)
SELECT doc_id, n_words,
  CAST(CASE WHEN n_words > 0 THEN sum_len * 100 // n_words ELSE 0 END AS BIGINT)
    AS mean_word_len_e2,
  n_stop AS n_stopword_hits,
  n_alpha AS n_alpha_words,
  CAST(CASE WHEN n_words BETWEEN 10 AND 50000
        AND (CASE WHEN n_words > 0 THEN sum_len * 100 // n_words ELSE 0 END) BETWEEN 150 AND 1000
        AND n_stop >= 2
        AND n_alpha * 10 >= n_words * 8
       THEN 1 ELSE 0 END AS INT) AS keep
FROM m
"""


def repetition_stats_oracle(table: str = "documents") -> str:
    """Identical repetition signals in DuckDB — same tokenization, same
    n-gram construction (1-based list indexing, end-exclusive range),
    same division operands."""
    toks = "list_filter(string_split(text, ' '), x -> x <> '')"
    return f"""
WITH m AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    list_transform(range(1, greatest(len(toks), 1)),
                   i -> toks[i] || ' ' || toks[i+1]) AS g2,
    list_transform(range(1, greatest(len(toks) - 1, 1)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3,
    CASE WHEN len(toks) = 0 THEN 0 ELSE
      list_max(list_transform(list_distinct(toks),
                              g -> len(list_filter(toks, x -> x = g))))
    END AS top
  FROM (SELECT doc_id, {toks} AS toks FROM {table})
)
SELECT doc_id,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CASE WHEN len(g2) = 0 THEN 0.0
       ELSE (len(g2) - len(list_distinct(g2))) / len(g2) END AS dup_2gram_frac,
  CASE WHEN len(g3) = 0 THEN 0.0
       ELSE (len(g3) - len(list_distinct(g3))) / len(g3) END AS dup_3gram_frac,
  CASE WHEN n_tokens = 0 THEN 0.0 ELSE top / n_tokens END AS top_token_frac
FROM m
"""


# ---------------------------------------------------------------------------
# n-gram LM fluency scoring (CCNet-style perplexity proxy)
# ---------------------------------------------------------------------------

LM_SCALE = 1_000_000
LM_MODEL_SIZE = 50_000


# consecutive-token bigrams from a materialized token array ``ts``:
# zip_with(ts[1..n-1], ts[2..n]) pairs each token with its successor.
# slice clips at the array end, and the CASE guard keeps the
# expression total on <2-token docs (sequence/slice would error)
_GRAM2_FROM_TS = (
    "CASE WHEN size(ts) >= 2 THEN "
    "zip_with(slice(ts, 1, size(ts) - 1), slice(ts, 2, size(ts) - 1), "
    "(x, y) -> concat(x, ' ', y)) "
    "ELSE cast(array() AS array<string>) END"
)


def lm_bigram_model(
    df: DataFrame,
    k: int = LM_MODEL_SIZE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-bigram counts, vocabulary-truncated to the top ``k`` by
    count (ties broken by gram so the cut is deterministic): the
    "language model" a CCNet-style quality filter scores against.
    In production the model is trained once on a trusted reference
    corpus (e.g. Wikipedia) and reused; ``lm_transition_surprise``
    accepts any frame with this (gram, gram_count) schema.

    One explode → one groupBy(gram) with map-side partials; the top-k
    cut plans as TakeOrderedAndProject (per-partition partial top-k),
    never a global sort exchange.  The result is ≤ k rows — broadcast
    material regardless of corpus size.
    """
    t, i = text_col, id_col
    # gram build via zip_with over two slices: no per-element array
    # indexing, so even when Catalyst inlines the tokenizer into a
    # pushed-down filter (CollapseProject/InferFiltersFromGenerate do
    # exactly that) the cost stays LINEAR in tokens — the old
    # element_at(toks, j)-per-lambda-element form re-tokenized per
    # element, quadratic per doc
    grams = df.select(
        F.col(i).alias("doc_id"),
        F.expr(
            f"regexp_extract_all(lower({t}), '{_spark_re(TOKEN_REGEX)}', 0)"
        ).alias("ts"),
    ).select(
        F.explode(F.expr(_GRAM2_FROM_TS)).alias("gram"),
        "doc_id",
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").cast("long").alias("gram_count"))
        .orderBy(F.col("gram_count").desc(), "gram")
        .limit(k)
    )


def lm_transition_surprise(
    df: DataFrame,
    model: DataFrame | None = None,
    k: int = LM_MODEL_SIZE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram-LM surprise — the fluency signal CCNet-style
    pipelines use to separate natural prose (common token transitions)
    from gibberish and boilerplate (rare or never-seen transitions).
    With ``model=None`` the model is self-trained on ``df``
    (self-perplexity); pass a model trained on a reference corpus for
    the production shape.

    Per doc: ``n_bigrams``, ``n_oov`` (transitions outside the model
    vocabulary), ``surprise_sum`` = Σ over transitions of
    ``LM_SCALE div count`` (OOV pays the maximum ``LM_SCALE``), and
    ``mean_surprise`` = surprise_sum / n_bigrams (NULL for docs with
    < 2 tokens).  The surprise surrogate is ``SCALE div count`` rather
    than ``-ln(count/total)`` for the same reason as
    :func:`rarity_score`: every aggregate stays an exact integer SUM,
    order-independent across partitions and bitwise-identical in the
    DuckDB oracle, where libm ``ln`` could differ in the last ulp.
    Monotonicity — rarer transition ⇒ larger surprise — is all the
    downstream keep/drop threshold consumes.

    Scale shape: the model is ≤ k rows and broadcast into the probe
    join (no shuffle of the gram stream); the per-doc aggregation's
    map-side combine reduces the exchange to one row per (doc,
    partition) — bigrams of a doc are row-local, so that is one row
    per doc.  Docs with < 2 tokens bypass the gram path entirely via
    a shuffle-free union branch.  Two data shuffles total (model
    groupBy + doc regroup), pinned by the plan-shape tests.
    """
    t, i = text_col, id_col
    if model is None:
        model = lm_bigram_model(df, k=k, text_col=t, id_col=i)
    # zip_with/slice gram build (see _GRAM2_FROM_TS: inline-safe,
    # linear under filter pushdown).  No pre-explode size filter:
    # explode of an empty array already emits nothing, and the old
    # size(grams) > 0 predicate was pushed below the projections with
    # the whole gram builder re-inlined into the scan filter.  The
    # empty branch tests size(ts) < 2 — exactly the docs whose gram
    # array is empty — without ever building grams.
    base = df.select(
        F.col(i).alias("doc_id"),
        F.expr(
            f"regexp_extract_all(lower({t}), '{_spark_re(TOKEN_REGEX)}', 0)"
        ).alias("ts"),
    )
    scored = (
        base.select("doc_id", F.explode(F.expr(_GRAM2_FROM_TS)).alias("gram"))
        .join(F.broadcast(model), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("gram_count").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.sum(
                F.coalesce(
                    F.expr(f"{LM_SCALE} div gram_count"), F.lit(LM_SCALE)
                )
            )
            .cast("long")
            .alias("surprise_sum"),
        )
    )
    empty = base.filter(F.size("ts") < 2).select(
        "doc_id",
        F.lit(0).cast("long").alias("n_bigrams"),
        F.lit(0).cast("long").alias("n_oov"),
        F.lit(0).cast("long").alias("surprise_sum"),
    )
    return scored.unionByName(empty).select(
        "doc_id",
        "n_bigrams",
        "n_oov",
        "surprise_sum",
        F.when(
            F.col("n_bigrams") > 0,
            F.col("surprise_sum") / F.col("n_bigrams"),
        ).alias("mean_surprise"),
    )


def lm_transition_surprise_oracle(
    table: str = "documents", k: int = LM_MODEL_SIZE
) -> str:
    """Identical self-trained bigram surprise in DuckDB: same
    tokenization, same 1-based end-exclusive bigram build as
    :func:`repetition_stats_oracle`, same deterministic model cut,
    same integer division operands."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_REGEX}') AS t
  FROM {table}
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(t), 1)),
                               i -> t[i] || ' ' || t[i+1])) AS gram
  FROM toks
),
model AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS gram_count
  FROM grams GROUP BY gram
  ORDER BY gram_count DESC, gram LIMIT {k}
),
scored AS (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(CASE WHEN m.gram_count IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
         CAST(SUM(COALESCE({LM_SCALE} // m.gram_count, {LM_SCALE})) AS BIGINT)
           AS surprise_sum
  FROM grams g LEFT JOIN model m USING (gram)
  GROUP BY g.doc_id
)
SELECT doc_id, n_bigrams, n_oov, surprise_sum,
       CAST(surprise_sum AS DOUBLE) / n_bigrams AS mean_surprise
FROM scored
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM toks WHERE len(t) < 2
"""


# ---------------------------------------------------------------------------
# markup stripping / boilerplate signals
# ---------------------------------------------------------------------------

TAG_REGEX = "<[^>]*>"
LINK_REGEX = "(?i)<a[^>]*>"
WS_REGEX = "\\s+"
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
]


def strip_markup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """HTML/markup stripping with boilerplate signals — the first
    stage every web-scrape corpus passes through: tags removed,
    entities decoded, whitespace collapsed, plus ``n_tags`` /
    ``n_links`` counts and ``markup_frac`` (fraction of raw characters
    that were markup — the link/markup-density boilerplate heuristic).

    Pure projection (zero shuffles): regex counts via
    ``regexp_extract_all`` size, replacement chains with patterns
    that parse identically as Java regex and RE2 so the DuckDB oracle
    computes the same bytes.  ``markup_frac`` is an int/int division —
    bitwise-equal doubles cross-engine.
    """
    t, i = text_col, id_col
    clean = f"regexp_replace({t}, '{TAG_REGEX}', ' ')"
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "\\'")
        clean = f"replace({clean}, '{ent}', '{rep_sql}')"
    clean = f"trim(regexp_replace({clean}, '{_spark_re(WS_REGEX)}', ' '))"
    return df.select(
        F.col(i).alias("doc_id"),
        F.expr(clean).alias("clean_text"),
        F.expr(f"CAST(size(regexp_extract_all({t}, '{TAG_REGEX}', 0)) AS BIGINT)").alias(
            "n_tags"
        ),
        F.expr(
            f"CAST(size(regexp_extract_all({t}, '{LINK_REGEX}', 0)) AS BIGINT)"
        ).alias("n_links"),
        F.expr(f"CAST(length({t}) AS BIGINT)").alias("n_chars_raw"),
    ).select(
        "doc_id",
        "clean_text",
        "n_tags",
        "n_links",
        "n_chars_raw",
        F.expr("CAST(length(clean_text) AS BIGINT)").alias("n_chars_clean"),
        F.expr(
            "CASE WHEN length(clean_text) = 0 AND n_chars_raw = 0 THEN 0.0 "
            "WHEN n_chars_raw = 0 THEN 0.0 "
            "ELSE (n_chars_raw - CAST(length(clean_text) AS BIGINT)) / n_chars_raw END"
        ).alias("markup_frac"),
    )


def strip_markup_oracle(table: str = "documents") -> str:
    clean = "regexp_replace(text, '<[^>]*>', ' ', 'g')"
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        clean = f"replace({clean}, '{ent}', '{rep_sql}')"
    clean = f"trim(regexp_replace({clean}, '\\s+', ' ', 'g'))"
    return f"""
WITH m AS (
  SELECT doc_id,
         {clean} AS clean_text,
         CAST(len(regexp_extract_all(text, '<[^>]*>')) AS BIGINT) AS n_tags,
         CAST(len(regexp_extract_all(text, '(?i)<a[^>]*>')) AS BIGINT) AS n_links,
         CAST(length(text) AS BIGINT) AS n_chars_raw
  FROM {table}
)
SELECT doc_id, clean_text, n_tags, n_links, n_chars_raw,
       CAST(length(clean_text) AS BIGINT) AS n_chars_clean,
       CASE WHEN n_chars_raw = 0 THEN 0.0
            ELSE (n_chars_raw - CAST(length(clean_text) AS BIGINT)) / n_chars_raw
       END AS markup_frac
FROM m
"""
