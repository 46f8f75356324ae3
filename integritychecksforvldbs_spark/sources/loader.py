"""Table loader that normalizes awkward parquet timestamp physical types.

Two fixture-relevant hazards, both handled here so every downstream
operator sees ONE timestamp type (``TIMESTAMP``) regardless of how the
file was written:

1. **TIMESTAMP(NANOS)**: Spark's vectorized reader rejects INT64
   TIMESTAMP(NANOS) (``PARQUET_TYPE_ILLEGAL``) that other engines
   (DuckDB, Arrow) read fine.  Fix: read nanos as raw longs
   (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild the
   timestamp with microsecond truncation (``ts div 1000`` — integer
   division; ``/`` would route through double and lose precision above
   2^53 ns).  Truncation matches DuckDB's ns→µs behavior.

2. **TIMESTAMP(MICROS, isAdjustedToUTC=false)**: Spark ≥3.4 reads
   these as ``TIMESTAMP_NTZ``, which ``unix_micros`` / interval
   arithmetic reject (the round-3 ``events_funnel`` failure class).
   Fix: cast NTZ → TIMESTAMP after the read.  The cast interprets the
   naive wall-clock in the session time zone and ``toPandas``/display
   converts back with the same zone, so values round-trip identically
   in ANY session tz (the engine pins UTC; see session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _file_key(path: str) -> tuple[str, int, int] | None:
    """Identity key for a SINGLE regular file: (path, mtime_ns, size).

    Used to memoize pure METADATA (the parquet schema, the ns-column
    list) across reads of an immutable fixture file — schema-on-read
    with a declared schema instead of per-query footer inference, the
    same move manifest-backed table formats make.  The key changes
    whenever the file is rewritten, so a mutated path re-infers;
    directories (part-file mirrors that DML rewrites in place) return
    None and never hit the memo."""
    import os
    import stat as _stat

    local = path[len("file:") :] if path.startswith("file:") else path
    try:
        st = os.stat(local)
    except OSError:
        return None
    if not _stat.S_ISREG(st.st_mode):
        return None
    return (local, st.st_mtime_ns, st.st_size)


_NANOS_MEMO: dict[tuple[str, int, int], list[str]] = {}
_SCHEMA_MEMO: dict[tuple, T.StructType] = {}


def _nanos_columns(path: str) -> list[str]:
    import pyarrow.parquet as pq

    key = _file_key(path)
    if key is not None and key in _NANOS_MEMO:
        return _NANOS_MEMO[key]
    local = path[len("file:") :] if path.startswith("file:") else path
    sch = pq.ParquetFile(local).schema_arrow
    out = [f.name for f in sch if str(f.type) == "timestamp[ns]"]
    if key is not None:
        _NANOS_MEMO[key] = out
    return out


def _read_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """``spark.read.parquet`` that skips footer schema re-inference for
    an unchanged single-file input (the memoized schema is passed
    explicitly; parquet resolves columns by name, so the read is
    byte-identical).  Multi-path and directory reads — anything a DML
    rewrite can mutate without a clean stat() signature — always
    infer."""
    key = _file_key(paths[0]) if len(paths) == 1 else None
    if key is None:
        return spark.read.parquet(*paths)
    # every conf that changes what schema the footer yields is part of
    # the key (a second session in this process with different parquet
    # settings must not be served the other session's inference)
    ns_conf = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    ntz_conf = spark.conf.get(
        "spark.sql.parquet.inferTimestampNTZ.enabled", "true"
    )
    case_conf = spark.conf.get("spark.sql.caseSensitive", "false")
    memo_key = (key, ns_conf, ntz_conf, case_conf)
    cached = _SCHEMA_MEMO.get(memo_key)
    if cached is not None:
        return spark.read.schema(cached).parquet(*paths)
    df = spark.read.parquet(*paths)
    _SCHEMA_MEMO[memo_key] = df.schema
    return df


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TIMESTAMP (lossless under a
    pinned session tz; wall-clock-preserving under any)."""
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_table(
    spark: SparkSession, *paths: str, schema: T.StructType | None = None
) -> DataFrame:
    """``spark.read.parquet`` with transparent ns/NTZ timestamp handling.

    ``schema``: optional caller-known read schema (e.g. reusing the
    source table's when re-reading a pruned file subset) — skips
    footer inference; only honored on the plain (non-nanos) branch,
    where the parquet read with an explicit schema is byte-identical
    to the inferred one."""
    # probe EVERY path (footer metadata only, memoized per file): a
    # multi-path read where only a later file carries nanos timestamps
    # must still take the nanosAsLong branch.  A directory path (the
    # part-file mirrors) makes pyarrow raise → treated as no-ns, which
    # matches the previous first-path behavior for those call sites.
    ns_cols: list[str] = []
    for p in paths:
        try:
            for c in _nanos_columns(p):
                if c not in ns_cols:
                    ns_cols.append(c)
        except Exception:
            pass
    if not ns_cols:
        if schema is not None:
            return normalize_ntz(spark.read.schema(schema).parquet(*paths))
        return normalize_ntz(_read_parquet(spark, *paths))
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = _read_parquet(spark, *paths)
        for c in ns_cols:
            # a heterogeneous multi-path read can resolve to a schema
            # that lacks a later file's ns column (no mergeSchema) —
            # rebuild only what the frame actually carries
            if c in df.columns:
                df = df.withColumn(
                    c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
                )
        # preserve original column order
        return normalize_ntz(df)
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


# ---------------------------------------------------------------------------
# multi-format ingestion
# ---------------------------------------------------------------------------

_FORMAT_BY_EXT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
    ".txt": "text",
    ".xml": "xml",
}


def load_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Format-dispatching ingest: parquet / CSV / JSON-lines / ORC /
    raw text, all normalized through the same timestamp handling as
    :func:`load_table`.

    ``fmt`` overrides the extension sniff (needed for extensionless
    directories of part files).  CSV defaults to header + schema
    inference unless an explicit ``schema`` is given — at 100 TB pass
    the schema: inference costs one extra full scan of the input and
    pins the job until it finishes.  TSV gets ``sep='\\t'``.  JSON is
    JSON-lines (one doc per line, the only JSON layout that splits
    across workers; multiline JSON cannot be parallelized).  Text
    yields (value) rows — one per line — for raw-corpus ingest.
    XML (Spark 4 built-in source) defaults to ``rowTag=row``; XML
    record boundaries, like multiline JSON, limit split parallelism —
    convert to parquet on ingest rather than re-scanning.
    """
    if fmt is None:
        import os

        ext = os.path.splitext(path.rstrip("/"))[1].lower()
        fmt = _FORMAT_BY_EXT.get(ext)
        if fmt is None:
            raise ValueError(
                f"cannot infer format from {path!r}; pass fmt= explicitly"
            )
        if ext == ".tsv":
            options.setdefault("sep", "\t")
    if fmt == "parquet":
        return load_table(spark, path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    if fmt == "xml":
        options.setdefault("rowTag", "row")
    return normalize_ntz(reader.options(**options).format(fmt).load(path))
