"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of the FK-orphan and dup-key kernels is
shuffling the fact table on the join/group key.  Writing the table
bucketed by that key moves the shuffle to WRITE time, once; every
subsequent join/aggregation on the key is shuffle-free (Spark reads
bucket i of both sides into the same task).  This module wraps the
bucketed write + a plan probe used by tests to assert the shuffle is
actually gone.

Bucketing requires a saveAsTable (metastore) target — plain
``.parquet(path)`` writes cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Save ``df`` as a bucketed (and optionally sorted) table.

    ``n_buckets`` should be sized so one bucket of the largest
    co-bucketed table fits an executor's task comfortably — for a
    100 TB fact table and ~128 MB tasks that is O(10⁵–10⁶) buckets.
    Joining tables must share bucket count and columns.  ``path``
    makes the table external at that location (the warehouse dir is
    static config and can't be changed on a live session).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange.

    BroadcastExchange is NOT a shuffle (it ships one small relation to
    every executor, no repartitioning of the big side) — only
    hash/range repartitioning exchanges count."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.replace("BroadcastExchange", "").count("Exchange") > 0


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two co-bucketed tables on their bucket columns — planned
    as a shuffle-free sort-merge join (verified by tests via
    :func:`plan_has_shuffle`)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
