"""Skew mitigation: salted aggregation (and when NOT to hand-salt).

A hot key (one user id producing 20% of a 100 TB event stream) makes
one reducer the straggler of every groupBy.  Salting splits each key
into ``n_salts`` partial keys, aggregates partials (map-side combine
applies per salt), then merges partials in a second, tiny aggregation
— total work unchanged, max reducer load divided by ``n_salts``.

Only algebraic aggregates decompose this way (sum/count/min/max —
anything with an associative merge).  COUNT(DISTINCT) needs the
two-level *exact* form (group by (key, value) first) and averages
need sum+count carried separately.

For JOINS, prefer AQE's runtime skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session defaults) —
hand-salting a join multiplies the build side by ``n_salts``; salt
aggregations, let AQE salt joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALGEBRAIC = {"sum", "count", "min", "max"}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """GroupBy ``keys`` with skew-safe two-level aggregation.

    ``aggs``: output column → (fn, input column) with fn in
    sum|count|min|max.  Result is EXACTLY equal to the plain
    ``df.groupBy(keys).agg(...)`` (tested), but the first-level
    shuffle spreads each key over ``n_salts`` reducers.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in ALGEBRAIC:
            raise ValueError(f"{name}: '{fn}' does not decompose; use sum/count/min/max")
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))

    def level1(fn: str, col: str) -> Column:
        if fn == "count":
            return F.count(col if col != "*" else "*")
        return getattr(F, fn)(col)

    partial = salted.groupBy(*keys, "_salt").agg(
        *[level1(fn, col).alias(f"_p_{name}") for name, (fn, col) in aggs.items()]
    )
    # merge: count partials merge by SUM; sum/min/max by themselves
    out_aggs = []
    for name, (fn, _col) in aggs.items():
        if fn == "count":
            out_aggs.append(F.sum(f"_p_{name}").cast("long").alias(name))
        else:
            out_aggs.append(getattr(F, fn)(f"_p_{name}").alias(name))
    return partial.groupBy(*keys).agg(*out_aggs)
