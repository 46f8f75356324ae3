"""Deterministic sampling kernels for training-data curation.

A training-data pipeline samples constantly — smoke-test subsets,
ablation mixes, per-source balancing — and at 100 TB the sample must
be (a) computable in one shuffle-free pass over the scan and (b)
REPRODUCIBLE: the same row set on every run, resumable mid-job, and
stable when the corpus is re-partitioned or appended to.  Spark's
``df.sample`` is none of those (seeded per-partition → repartitioning
changes the sample), so these kernels key the decision on a
content-independent per-row hash of the id:

    bucket(doc) = md5-derived 60-bit integer of the id, mod N

md5 is the portable hash (identical hex in Spark and DuckDB; xxhash64
is Spark-only), so the DuckDB oracle selects the exact same rows.

- **deterministic_sample** — keep one row in ``keep_one_in`` (bucket
  == salt); different salts give disjoint samples for train/val/test
  splits from one pass.
- **stratified_sample** — per-stratum keep rates in per-mille
  (bucket-of-1000 < rate), the per-source/per-language balancing op;
  unlisted strata get ``default_per_mille``.

Both are pure filters on a projection: predicate pushdown puts the
hash-filter right above the parquet reader, no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_expr_spark(id_col: str, buckets: int) -> str:
    """60-bit md5-derived bucket of the id — Spark SQL dialect."""
    return (
        f"CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 15), 16, 10)"
        f" AS BIGINT) % {buckets}"
    )


def _bucket_expr_duckdb(id_col: str, buckets: int) -> str:
    """The identical bucket in DuckDB (same md5 hex, same 60-bit int)."""
    return (
        f"CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15)"
        f" AS BIGINT) % {buckets}"
    )


def deterministic_sample(
    df: DataFrame,
    keep_one_in: int,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Keep rows whose id-bucket (mod ``keep_one_in``) equals ``salt``
    — a reproducible ~1/keep_one_in sample, independent of
    partitioning, ordering, or appends to OTHER rows.  Salts
    0..keep_one_in-1 partition the corpus into disjoint samples."""
    if not 0 <= salt < keep_one_in:
        raise ValueError(f"salt must be in [0, {keep_one_in}), got {salt}")
    return df.filter(
        F.expr(_bucket_expr_spark(id_col, keep_one_in)) == F.lit(salt)
    )


def deterministic_sample_oracle(
    table: str = "documents",
    keep_one_in: int = 16,
    id_col: str = "doc_id",
    salt: int = 0,
) -> str:
    return (
        f"SELECT * FROM {table} "
        f"WHERE {_bucket_expr_duckdb(id_col, keep_one_in)} = {salt}"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    per_mille: dict[str, int],
    id_col: str = "doc_id",
    default_per_mille: int = 0,
) -> DataFrame:
    """Per-stratum deterministic rates: a row survives when its
    bucket-of-1000 is below its stratum's per-mille rate.  The
    per-source / per-language mix-balancing op; rates are exact in
    expectation and reproducible row-for-row."""
    for k, v in per_mille.items():
        if not 0 <= v <= 1000:
            raise ValueError(f"per-mille rate out of range for {k!r}: {v}")
    rate = F.lit(default_per_mille)
    for k, v in sorted(per_mille.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    bucket = F.expr(_bucket_expr_spark(id_col, 1000))
    return df.filter(bucket < rate)


def stratified_sample_oracle(
    table: str,
    strata_col: str,
    per_mille: dict[str, int],
    id_col: str = "doc_id",
    default_per_mille: int = 0,
) -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {v}" for k, v in sorted(per_mille.items())
    )
    return (
        f"SELECT * FROM {table} "
        f"WHERE {_bucket_expr_duckdb(id_col, 1000)} < "
        f"(CASE {cases} ELSE {default_per_mille} END)"
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    val_per_mille: int = 10,
    test_per_mille: int = 10,
) -> DataFrame:
    """Materialized train/val/test assignment: every row gets a
    ``split`` label from its id-bucket-of-1000 — val takes the first
    ``val_per_mille`` buckets, test the next ``test_per_mille``, train
    the rest.  The label is a pure projection (shuffle-free, no state),
    so it is identical on every run, after any repartition, and for a
    row regardless of what else is appended — the property that keeps
    eval contamination out when the corpus grows."""
    if val_per_mille + test_per_mille >= 1000:
        raise ValueError("val + test rates must leave room for train")
    b = F.expr(_bucket_expr_spark(id_col, 1000))
    return df.withColumn(
        "split",
        F.when(b < val_per_mille, F.lit("val"))
        .when(b < val_per_mille + test_per_mille, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def split_assign_oracle(
    table: str = "documents",
    id_col: str = "doc_id",
    val_per_mille: int = 10,
    test_per_mille: int = 10,
) -> str:
    b = _bucket_expr_duckdb(id_col, 1000)
    return (
        f"SELECT *, CASE WHEN {b} < {val_per_mille} THEN 'val' "
        f"WHEN {b} < {val_per_mille + test_per_mille} THEN 'test' "
        f"ELSE 'train' END AS split FROM {table}"
    )


def training_order(
    df: DataFrame, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Seeded deterministic global shuffle for training-data export:
    every row gets ``shuffle_key = md5(seed || ':' || id)`` and the
    frame is sorted by it — a reproducible pseudorandom order that is
    identical across runs, partitionings, and engines (md5 is the
    portable hash, as everywhere in this module), and decorrelated
    between seeds, so epoch N re-exports with seed N.

    Scale shape: a global sort is a range-partitioned exchange (Spark
    samples key quantiles, no single-partition gather); the key is a
    pure projection.  Writers preserve the order per output file and
    name files by partition index, so a sequential reader of the
    sorted export replays the exact order."""
    key = F.md5(
        F.concat(
            F.lit(str(seed)), F.lit(":"),
            F.col(id_col).cast("string"),
        )
    )
    return df.withColumn("shuffle_key", key).orderBy("shuffle_key")


def training_order_oracle(
    table: str = "documents", id_col: str = "doc_id", seed: int = 0
) -> str:
    return (
        f"SELECT *, md5('{seed}' || ':' || CAST({id_col} AS VARCHAR)) "
        f"AS shuffle_key FROM {table} ORDER BY shuffle_key"
    )


def upsample_epochs(
    df: DataFrame,
    epochs_per_mille: dict[str, int],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_per_mille: int = 1000,
) -> DataFrame:
    """Fractional-epoch upsampling — realize mixture weights like
    "2.4 epochs of wiki" exactly: a row in a stratum rated e‰ emits
    ``e DIV 1000`` full copies, plus one more iff its bucket-of-1000
    falls under ``e MOD 1000`` (the same deterministic md5 bucket the
    samplers use, so the fractional epoch is reproducible
    row-for-row and disjoint sub-corpora stay disjoint).  Copies are
    tagged ``epoch_idx`` (0-based) so a downstream
    :func:`training_order` with per-epoch seeds interleaves them.

    Row-local explode (no shuffle); rates of 0 drop the stratum
    (``sequence`` must be guarded — Spark's sequence(0,-1) DESCENDS
    rather than returning empty)."""
    for k, v in epochs_per_mille.items():
        if v < 0:
            raise ValueError(f"negative epoch rate for {k!r}: {v}")
    rate = F.lit(default_per_mille)
    for k, v in sorted(epochs_per_mille.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    bucket = F.expr(_bucket_expr_spark(id_col, 1000))
    n = (rate / 1000).cast("int") + F.when(
        bucket < rate % 1000, F.lit(1)
    ).otherwise(F.lit(0))
    idxs = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("epoch_idx", F.explode(idxs)).withColumn(
        "epoch_idx", F.col("epoch_idx").cast("long")
    )


def upsample_epochs_oracle(
    epochs_per_mille: dict[str, int],
    table: str = "documents",
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_per_mille: int = 1000,
) -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {v}"
        for k, v in sorted(epochs_per_mille.items())
    )
    b = _bucket_expr_duckdb(id_col, 1000)
    return f"""
WITH rated AS (
  SELECT *,
         (CASE {cases} ELSE {default_per_mille} END) // 1000
         + CASE WHEN {b} < (CASE {cases} ELSE {default_per_mille} END) % 1000
                THEN 1 ELSE 0 END AS _n
  FROM {table})
SELECT * EXCLUDE (_n, _e), CAST(_e AS BIGINT) AS epoch_idx
FROM (SELECT *, unnest(range(0, _n)) AS _e FROM rated)
"""


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------


def _uniform_expr_spark(id_col: str, seed: int) -> str:
    """md5-derived uniform in (0, 1] — 52 bits so the double is exact,
    +1 so ln() never sees 0."""
    return (
        f"(CAST(conv(substring(md5('{seed}:' || CAST({id_col} AS STRING)),"
        f" 1, 13), 16, 10) AS DOUBLE) + 1) / {float(1 << 52)!r}"
    )


def _uniform_expr_duckdb(id_col: str, seed: int) -> str:
    return (
        f"(CAST(CAST('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)),"
        f" 1, 13) AS BIGINT) AS DOUBLE) + 1) / {float(1 << 52)!r}"
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_expr: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """``k``-row weighted sample WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-ES): every row draws a deterministic md5 uniform
    ``u`` and competes with key ``ln(u) / w`` — the exponential race
    whose top-``k`` is distributed exactly as sequential
    weighted-without-replacement draws.  The quality-weighted
    subsampling op ("keep 1M docs, preferring high quality_score")
    with the same reproducibility contract as every sampler here:
    same rows for a given seed regardless of partitioning, ordering,
    or engine.

    Rows with non-positive or NULL weight never qualify (zero chance,
    exactly as the math says).  Ties (measure-zero) break on the id.

    Scale shape: one shuffle-free projection + filter, then Spark's
    ``TakeOrderedAndProject`` — a per-partition top-``k`` heap merged
    on the driver, never a global sort.  ``k`` must be driver-sized
    (the same contract as any top-k).
    """
    w = f"CAST(({weight_expr}) AS DOUBLE)"
    key = f"LN({_uniform_expr_spark(id_col, seed)}) / {w}"
    return (
        df.filter(F.expr(f"COALESCE({w}, 0.0) > 0.0"))
        .orderBy(F.expr(key).desc(), F.col(id_col))
        .limit(k)
    )


def weighted_sample_oracle(
    table: str,
    k: int,
    weight_expr: str,
    out_cols: list[str],
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """The identical race in DuckDB.  Exactness note: md5, the 52-bit
    conv, and the division are bit-identical by construction; ``ln``
    is the one step without an IEEE correct-rounding guarantee, and it
    only matters at the rank-k boundary of a fixed dataset — the gate
    pins that it holds on the fixtures (a 1-ulp boundary flip would
    fail the gate loudly, not silently)."""
    w = f"CAST(({weight_expr}) AS DOUBLE)"
    sel = ", ".join(out_cols)
    return f"""
SELECT {sel} FROM {table}
WHERE COALESCE({w}, 0.0) > 0.0
ORDER BY ln({_uniform_expr_duckdb(id_col, seed)}) / {w} DESC, {id_col}
LIMIT {k}
"""
