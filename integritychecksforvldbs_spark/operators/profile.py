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
for monitoring at extreme cardinalities, swap ``F.count_distinct`` for
``F.approx_count_distinct`` at the call site — the plan shape is
identical minus the Expand.

min/max are computed natively (numeric/string ordering, not string
ordering of casts) and cast to string afterwards for the uniform
output schema.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
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
