"""Column profiling — per-column nulls, exact NDV, and min/max.

The reference's catalog scans collect per-object size metadata
(IC:429-438); real VLDB integrity work also wants per-COLUMN facts
(null density, cardinality, value range) to spot drift between loads.
This kernel computes them in one declarative aggregation.

Shape: ONE scan of the table produces a single wide row (all
aggregates for all profiled columns), which a ``stack`` unpivots into
one output row per column — the unpivot runs on a 1-row frame, so it
is free.

Scale: Spark plans the multi-column COUNT(DISTINCT) via Expand (each
input row fans out once per distinct-aggregated column) with partial
aggregation directly on top, so the fan-out collapses map-side before
any shuffle; the shuffle carries only per-partition partial states.
That is the same plan a hand-written per-column sweep would produce,
minus N-1 extra scans of the table.  Profiling K columns of a 100 TB
table therefore costs one scan + an Expand factor K absorbed by the
map-side hash aggregate — not K scans.

NDV is exact (COUNT DISTINCT, NULLs excluded — both engines agree);
for monitoring at extreme cardinalities :func:`profile_approx_df`
swaps in HyperLogLog++ sketches (and :func:`approx_quantiles_df` the
Greenwald-Khanna quantile summary) — same output schema, no Expand,
state bounded regardless of cardinality.

min/max are computed natively (numeric/string ordering, not string
ordering of casts) and cast to string afterwards for the uniform
output schema.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_df(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """One row per profiled column: (column_name, n_rows, n_nulls,
    n_distinct, min_value, max_value)."""
    cols = list(columns if columns is not None else df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(F.col(c))).cast("long").alias(f"_nulls_{c}"),
            F.count_distinct(F.col(c)).cast("long").alias(f"_ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)

    stack_args: list[F.Column] = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"_nulls_{c}"),
            F.col(f"_ndv_{c}"),
            F.col(f"_min_{c}"),
            F.col(f"_max_{c}"),
        ]
    return wide.select(
        F.col("_n_rows").alias("n_rows"),
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column_name", "n_nulls", "n_distinct", "min_value", "max_value"),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def profile_oracle(table: str, columns: Sequence[str]) -> str:
    """Equivalent ANSI SQL: one UNION ALL branch per column.  DuckDB
    plans N aggregates over one materialized scan; the VALUES the gate
    compares are engine-independent because min/max are computed
    natively and cast afterwards."""
    parts = [
        f"SELECT '{c}' AS column_name, "
        f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls, "
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        f"CAST(MIN({c}) AS VARCHAR) AS min_value, "
        f"CAST(MAX({c}) AS VARCHAR) AS max_value "
        f"FROM {table}"
        for c in columns
    ]
    return "\nUNION ALL\n".join(parts)


def profile_approx_df(
    df: DataFrame, columns: Sequence[str] | None = None, rsd: float = 0.05
) -> DataFrame:
    """Sketch-tier profile: same schema as :func:`profile_df` with
    ``n_distinct`` computed by HyperLogLog++ (``approx_count_distinct``,
    relative standard deviation ``rsd``).

    This is the shape to run at extreme cardinalities: exact NDV plans
    an Expand (row fan-out per distinct-aggregated column) whose
    partial-aggregate hash tables hold every distinct value; the HLL
    sketch is a few KB per column regardless of cardinality, merges
    associatively map-side, and drops the Expand from the plan
    entirely.  Values are engine-specific (sketches don't
    cross-reproduce), so the harness records this query rows-only —
    the error bound vs the exact tier is pinned by tests instead.
    """
    cols = list(columns if columns is not None else df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(F.col(c))).cast("long").alias(f"_nulls_{c}"),
            F.approx_count_distinct(F.col(c), rsd).cast("long").alias(f"_ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)

    stack_args: list[F.Column] = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"_nulls_{c}"),
            F.col(f"_ndv_{c}"),
            F.col(f"_min_{c}"),
            F.col(f"_max_{c}"),
        ]
    return wide.select(
        F.col("_n_rows").alias("n_rows"),
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column_name", "n_nulls", "n_distinct", "min_value", "max_value"),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def approx_quantiles_df(
    df: DataFrame,
    col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    relative_error: float = 0.01,
) -> DataFrame:
    """Approximate quantiles via Greenwald-Khanna
    (``percentile_approx``): (quantile, value) — the scale path beside
    the exact discrete-quantile kernel (``length_quantiles``), whose
    full-sort-per-group shape is the bottleneck at 100 TB.  The GK
    summary is bounded by 1/relative_error regardless of row count and
    merges map-side.  Engine-specific values → rows-only gate; the
    rank-error contract (within ``relative_error`` of the exact rank)
    is pinned by tests.
    """
    q = F.percentile_approx(
        F.col(col), list(probs), F.lit(int(1.0 / relative_error))
    ).alias("qs")
    wide = df.agg(q)
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in probs]).alias("quantile"),
        F.col("qs").alias("value"),
    )
    return (
        wide.select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.quantile").alias("quantile"),
            F.col("p.value").cast("double").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# skew diagnostics & histograms
# ---------------------------------------------------------------------------

def key_skew_profile(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """One-row skew summary of a prospective join/partition key:
    (n_keys, n_rows, max_key_rows, skew_factor) where skew_factor =
    max/avg rows per key — the number that predicts whether this key
    needs salting before a shuffle (healthy ≈ 1, hot-key ≫ 1).

    Two-level aggregation: per-key counts (map-side combined), then a
    global roll-up of the per-key frame — no single point ever sees
    raw rows.  skew_factor is computed as a double ratio, not
    max*n_keys (which overflows bigint at petabyte scale).
    """
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
    return per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.max("_n").cast("long").alias("max_key_rows"),
        F.round(
            F.max("_n") / (F.sum("_n") / F.count(F.lit(1))), 6
        ).alias("skew_factor"),
    )


def key_skew_oracle(table: str, key_cols: Sequence[str]) -> str:
    keys = ", ".join(key_cols)
    return f"""
WITH per_key AS (
  SELECT {keys}, COUNT(*) AS _n FROM {table} GROUP BY {keys}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(_n) AS BIGINT) AS n_rows,
       CAST(MAX(_n) AS BIGINT) AS max_key_rows,
       ROUND(MAX(_n) / (SUM(_n) / COUNT(*)), 6) AS skew_factor
FROM per_key
"""


def heavy_hitters(df: DataFrame, key_cols: Sequence[str], k: int = 20) -> DataFrame:
    """The k hottest keys with their row counts, deterministically
    tie-broken (count desc, then key asc).  Partial-aggregates map
    side, then rides TakeOrderedAndProject — no global sort, no
    single-partition window."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    order = [F.col("n_rows").desc()] + [F.col(c) for c in key_cols]
    return per_key.orderBy(*order).limit(k)


def heavy_hitters_oracle(table: str, key_cols: Sequence[str], k: int = 20) -> str:
    keys = ", ".join(key_cols)
    return (
        f"SELECT {keys}, CAST(COUNT(*) AS BIGINT) AS n_rows FROM {table} "
        f"GROUP BY {keys} ORDER BY n_rows DESC, {keys} LIMIT {k}"
    )


def histogram_fixed(df: DataFrame, col: str, width: int) -> DataFrame:
    """Equi-width histogram with integer bucket boundaries computed by
    integer division — single pass, one hash aggregate, no prior
    min/max scan (fixed width beats two-pass equi-depth when the scale
    of the column is known, as it is for metadata like lengths)."""
    bucket = F.expr(f"CAST({col} DIV {width} AS BIGINT)")
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(col).cast("long").alias("min_value"),
            F.max(col).cast("long").alias("max_value"),
        )
    )


def histogram_oracle(table: str, col: str, width: int) -> str:
    return f"""
SELECT CAST({col} // {width} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN({col}) AS BIGINT) AS min_value,
       CAST(MAX({col}) AS BIGINT) AS max_value
FROM {table} GROUP BY 1
"""


def histogram_equidepth(
    df: DataFrame, col: str, n_buckets: int, tiebreak: Sequence[str]
) -> DataFrame:
    """Exact equi-depth histogram: NTILE over a TOTAL order (``col``
    then ``tiebreak`` — the total order is what makes tied values land
    in the same bucket in every engine), then one aggregate per
    bucket: (bucket, n_rows, min_value, max_value).

    Scale note: EXACT equi-depth is inherently a global sort (one
    range exchange); it is the oracle tier.  The linear-scan path at
    100 TB is the sketch quantiles (:func:`approx_quantiles_df` /
    :func:`kll_quantiles`) feeding :func:`histogram_fixed`-style
    bucketing."""
    w = Window.orderBy(*([col] + list(tiebreak)))
    return (
        df.select(F.col(col), F.ntile(n_buckets).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(col).cast("long").alias("min_value"),
            F.max(col).cast("long").alias("max_value"),
        )
        .select(F.col("bucket").cast("long"), "n_rows", "min_value", "max_value")
    )


def histogram_equidepth_oracle(
    table: str, col: str, n_buckets: int, tiebreak: Sequence[str]
) -> str:
    order = ", ".join([col] + list(tiebreak))
    return f"""
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN({col}) AS BIGINT) AS min_value,
       CAST(MAX({col}) AS BIGINT) AS max_value
FROM (
  SELECT {col}, NTILE({n_buckets}) OVER (ORDER BY {order}) AS bucket
  FROM {table}
) GROUP BY 1
"""


# ---------------------------------------------------------------------------
# profile drift monitoring (corpus/table health over time)
# ---------------------------------------------------------------------------

def profile_drift(
    prof_a: DataFrame,
    prof_b: DataFrame,
    max_row_ratio: float = 2.0,
    max_null_frac_delta: float = 0.01,
    max_ndv_ratio: float = 2.0,
) -> DataFrame:
    """Compare two :func:`profile_df` outputs (baseline ``a`` vs
    candidate ``b``): one row per column with the baseline/candidate
    stats side by side and boolean drift verdicts — the
    ingest-gate/day-over-day monitor of a training-data pipeline.

    Verdicts (all NULL-total-safe, ratios of exact integers so both
    engines compute bit-identical doubles):

    - ``rows_drift``: total row count changed by more than
      ``max_row_ratio``× either way;
    - ``nulls_drift``: a column's null fraction moved more than
      ``max_null_frac_delta`` absolute;
    - ``ndv_drift``: distinct count changed more than
      ``max_ndv_ratio``× either way (0 → >0 counts as drift);
    - ``range_drift``: min or max changed at all;
    - ``any_drift``: OR of the above.

    Metadata-sized join (|columns| rows) — broadcast both sides.
    """
    a = prof_a.select(
        "column_name",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_nulls").alias("n_nulls_a"),
        F.col("n_distinct").alias("n_distinct_a"),
        F.col("min_value").alias("min_a"),
        F.col("max_value").alias("max_a"),
    )
    b = prof_b.select(
        "column_name",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_nulls").alias("n_nulls_b"),
        F.col("n_distinct").alias("n_distinct_b"),
        F.col("min_value").alias("min_b"),
        F.col("max_value").alias("max_b"),
    )
    j = a.join(b, "column_name", "full_outer")
    nf_a = F.col("n_nulls_a") / F.col("n_rows_a")
    nf_b = F.col("n_nulls_b") / F.col("n_rows_b")
    rows_drift = (
        (F.col("n_rows_b") > F.col("n_rows_a") * F.lit(max_row_ratio))
        | (F.col("n_rows_a") > F.col("n_rows_b") * F.lit(max_row_ratio))
    )
    nulls_drift = (
        F.abs(nf_b - nf_a) > F.lit(max_null_frac_delta)
    )
    ndv_drift = (
        (F.col("n_distinct_b") > F.col("n_distinct_a") * F.lit(max_ndv_ratio))
        | (F.col("n_distinct_a") > F.col("n_distinct_b") * F.lit(max_ndv_ratio))
    )
    range_drift = ~(
        F.col("min_a").eqNullSafe(F.col("min_b"))
        & F.col("max_a").eqNullSafe(F.col("max_b"))
    )
    missing = F.col("n_rows_a").isNull() | F.col("n_rows_b").isNull()
    flags = {
        "rows_drift": rows_drift,
        "nulls_drift": nulls_drift,
        "ndv_drift": ndv_drift,
        "range_drift": range_drift,
    }
    out = j
    for name, expr in flags.items():
        out = out.withColumn(
            name, F.when(missing, F.lit(True)).otherwise(
                F.coalesce(expr, F.lit(False))
            )
        )
    return out.withColumn(
        "any_drift",
        F.col("rows_drift")
        | F.col("nulls_drift")
        | F.col("ndv_drift")
        | F.col("range_drift"),
    )


def profile_drift_oracle(
    profile_a_sql: str,
    profile_b_sql: str,
    max_row_ratio: float = 2.0,
    max_null_frac_delta: float = 0.01,
    max_ndv_ratio: float = 2.0,
) -> str:
    """DuckDB SQL over two :func:`profile_oracle` relations computing
    the identical drift report."""
    return f"""
WITH a AS (
  SELECT column_name, n_rows AS n_rows_a, n_nulls AS n_nulls_a,
         n_distinct AS n_distinct_a, min_value AS min_a, max_value AS max_a
  FROM ({profile_a_sql})
),
b AS (
  SELECT column_name, n_rows AS n_rows_b, n_nulls AS n_nulls_b,
         n_distinct AS n_distinct_b, min_value AS min_b, max_value AS max_b
  FROM ({profile_b_sql})
),
j AS (SELECT * FROM a FULL OUTER JOIN b USING (column_name))
SELECT column_name, n_rows_a, n_nulls_a, n_distinct_a, min_a, max_a,
       n_rows_b, n_nulls_b, n_distinct_b, min_b, max_b,
       rows_drift, nulls_drift, ndv_drift, range_drift,
       (rows_drift OR nulls_drift OR ndv_drift OR range_drift) AS any_drift
FROM (
  SELECT *,
    CASE WHEN n_rows_a IS NULL OR n_rows_b IS NULL THEN TRUE
         ELSE COALESCE(n_rows_b > n_rows_a * {max_row_ratio}
                       OR n_rows_a > n_rows_b * {max_row_ratio}, FALSE)
    END AS rows_drift,
    CASE WHEN n_rows_a IS NULL OR n_rows_b IS NULL THEN TRUE
         ELSE COALESCE(abs(CAST(n_nulls_b AS DOUBLE) / n_rows_b
                           - CAST(n_nulls_a AS DOUBLE) / n_rows_a)
                       > {max_null_frac_delta}, FALSE)
    END AS nulls_drift,
    CASE WHEN n_rows_a IS NULL OR n_rows_b IS NULL THEN TRUE
         ELSE COALESCE(n_distinct_b > n_distinct_a * {max_ndv_ratio}
                       OR n_distinct_a > n_distinct_b * {max_ndv_ratio}, FALSE)
    END AS ndv_drift,
    CASE WHEN n_rows_a IS NULL OR n_rows_b IS NULL THEN TRUE
         ELSE NOT ((min_a IS NOT DISTINCT FROM min_b)
                   AND (max_a IS NOT DISTINCT FROM max_b))
    END AS range_drift
  FROM j
)
"""


# ---------------------------------------------------------------------------
# incremental NDV via mergeable HLL sketches
# ---------------------------------------------------------------------------


def ndv_sketch_by(
    df: DataFrame, key_col: str, columns: Sequence[str]
) -> DataFrame:
    """Per-``key_col`` mergeable HLL sketches (DataSketches
    ``hll_sketch_agg``, lgK 12) for each column — the PERSISTABLE
    profiling artifact: compute once per ingest partition (day,
    source, batch), store the few-KB binary rows, and answer NDV
    questions over ANY key subset later by merging sketches instead
    of rescanning data.  At 100 TB this turns "distinct users last
    quarter" from a full-corpus shuffle into an O(partitions)
    metadata aggregation.

    One hash shuffle on ``key_col`` with map-side partial sketches.
    """
    return df.groupBy(F.col(key_col).alias("sketch_key")).agg(
        F.count("*").cast("long").alias("n_rows"),
        *[F.hll_sketch_agg(c).alias(f"sketch_{c}") for c in columns],
    )


def ndv_estimate(
    sketches: DataFrame, columns: Sequence[str], keys: list | None = None
) -> DataFrame:
    """NDV estimates from a (filtered) sketch table: one output row
    with ``n_rows`` (exact) and ``ndv_<col>`` per column, computed by
    HLL union.  The union stays inside the standard HLL error
    envelope (~1.6% at lgK 12) but is NOT bit-identical to a
    single-pass sketch at small cardinalities — a lone sketch below
    the sparse threshold counts exactly, while unioning promotes to
    dense registers (tests pin the envelope, deterministic repeats,
    and key-subset behavior).  Metadata-sized: |keys| rows in,
    1 row out."""
    if keys is not None:
        sketches = sketches.filter(F.col("sketch_key").isin(keys))
    return sketches.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
        *[
            F.hll_sketch_estimate(F.hll_union_agg(f"sketch_{c}"))
            .cast("long")
            .alias(f"ndv_{c}")
            for c in columns
        ],
    )


def theta_sketch_by(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key Theta sketches over ``value_col`` — unlike HLL, Theta
    sketches support INTERSECTION and DIFFERENCE, so stored per-
    partition sketches answer audience-overlap questions ("users who
    did A and B", "docs in source X but not Y") without joining the
    raw data.  One hash shuffle, few-KB rows."""
    return df.groupBy(F.col(key_col).alias("sketch_key")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.theta_sketch_agg(value_col).alias("sketch"),
    )


def theta_overlap_estimate(
    sketches: DataFrame, key_a, key_b
) -> DataFrame:
    """Distinct-count estimates for two stored sketches and their set
    algebra: (ndv_a, ndv_b, ndv_union, ndv_intersection, ndv_only_a).
    Metadata-sized — two rows in, one row out."""
    a = sketches.filter(F.col("sketch_key") == key_a).select(
        F.col("sketch").alias("sa")
    )
    b = sketches.filter(F.col("sketch_key") == key_b).select(
        F.col("sketch").alias("sb")
    )
    return (
        a.crossJoin(b)
        .select(
            F.theta_sketch_estimate("sa").cast("long").alias("ndv_a"),
            F.theta_sketch_estimate("sb").cast("long").alias("ndv_b"),
            F.theta_sketch_estimate(F.theta_union("sa", "sb"))
            .cast("long")
            .alias("ndv_union"),
            F.theta_sketch_estimate(F.theta_intersection("sa", "sb"))
            .cast("long")
            .alias("ndv_intersection"),
            F.theta_sketch_estimate(F.theta_difference("sa", "sb"))
            .cast("long")
            .alias("ndv_only_a"),
        )
    )


def kll_sketch_by(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key KLL quantile sketches (double) — the mergeable
    counterpart of ``percentile_approx``: per-partition sketches
    persist, and any key subset's quantiles come from a merge instead
    of a rescan."""
    return df.groupBy(F.col(key_col).alias("sketch_key")).agg(
        F.kll_sketch_agg_double(value_col).alias("sketch"),
    )


def kll_quantiles(
    sketches: DataFrame,
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    keys: list | None = None,
) -> DataFrame:
    """Merged quantile estimates over a (filtered) KLL sketch table:
    one row, ``q_<pct>`` per requested probability.  KLL guarantees
    rank error (~1.7% at the default k), not value error."""
    if keys is not None:
        sketches = sketches.filter(F.col("sketch_key").isin(keys))
    # kll_sketch_merge_double is a binary scalar (no aggregate form in
    # Spark 4.1): fold the collected sketch list — the list is
    # |keys|-sized metadata, so driver-side size is not a concern
    merged = sketches.agg(F.collect_list("sketch").alias("sks")).select(
        F.expr(
            "aggregate(slice(sks, 2, greatest(size(sks) - 1, 0)), sks[0], "
            "(acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("m")
    )
    return merged.select(
        *[
            F.kll_sketch_get_quantile_double("m", F.lit(float(p))).alias(
                f"q_{int(p * 100)}"
            )
            for p in probs
        ]
    )
