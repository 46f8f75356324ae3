"""Table loader that tolerates TIMESTAMP(NANOS) parquet columns.

Spark's vectorized parquet reader rejects INT64 TIMESTAMP(NANOS)
columns (``PARQUET_TYPE_ILLEGAL``) that other engines (DuckDB, Arrow)
read fine — the ``events`` fixture has one.  The fix: read nanos as
raw longs (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild the
timestamp with microsecond truncation (``ts div 1000`` —  integer
division; a ``/`` would route through double and lose precision above
2^53 ns).  Truncation matches DuckDB's ns→µs behavior, so oracle
comparisons agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nanos_columns(path: str) -> list[str]:
    import pyarrow.parquet as pq

    local = path[len("file:") :] if path.startswith("file:") else path
    sch = pq.ParquetFile(local).schema_arrow
    return [f.name for f in sch if str(f.type) == "timestamp[ns]"]


def load_table(spark: SparkSession, *paths: str) -> DataFrame:
    """``spark.read.parquet`` with transparent ns-timestamp handling."""
    try:
        ns_cols = _nanos_columns(paths[0])
    except Exception:
        ns_cols = []
    if not ns_cols:
        return spark.read.parquet(*paths)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(*paths)
        for c in ns_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        # preserve original column order
        return df
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
