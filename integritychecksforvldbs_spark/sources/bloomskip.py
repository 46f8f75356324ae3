"""Per-file Bloom-filter skipping for equality predicates.

Zone maps (:mod:`.zonemap`) prune RANGE predicates from footer
min/max, which needs value-clustered layouts and says nothing useful
for point lookups on high-cardinality columns.  This module adds the
standard companion (Delta's bloom indexes, ORC bloom streams): one
Bloom bitset per part-file over a column's distinct values; a
``col = v`` probe then skips every file whose bitset provably lacks
``v`` — no false negatives by construction, false positives only cost
an extra file scan.

Shapes, built for 100 TB:

- **build** is one distributed pass: dedup to (file, value), expand
  each value to its ``k`` bit positions row-locally
  (``xxhash64(value, seed) mod n_bits``), aggregate ``collect_set``
  per file — the index is ``n_files × ≤n_bits`` positions, written as
  a parquet sidecar next to the table;
- **probe** hashes the literal through the SAME JVM xxhash64 (a
  one-row job — the driver must not re-implement the hash and risk
  divergence) and prunes the file list driver-side, exactly like the
  zone map's metadata-sized pruning;
- **read** scans only surviving files and re-applies the predicate,
  so correctness never depends on the index (a file missing from the
  index — appended after the build — is always kept).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources.catalog import list_parquet_files
from integritychecksforvldbs_spark.sources.loader import load_table

N_BITS_DEFAULT = 8192
K_DEFAULT = 5


def _positions_expr(col: str, n_bits: int, k: int):
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(col), F.lit(seed)), F.lit(n_bits)).cast(
                "int"
            )
            for seed in range(k)
        ]
    )


def build_bloom_index(
    spark: SparkSession,
    path: str,
    column: str,
    n_bits: int = N_BITS_DEFAULT,
    k: int = K_DEFAULT,
    index_path: str | None = None,
) -> DataFrame:
    """One pass over ``path``: (file, set-bit positions) per part-file
    for ``column``.  Persisted to ``index_path`` (default
    ``{path}_bloom_{column}``) and returned as a DataFrame.  NULLs set
    no bits (``col = v`` never matches NULL in SQL)."""
    from integritychecksforvldbs_spark.operators.kernels import (
        _canon_file_path_expr,
    )

    index_path = index_path or f"{path.rstrip('/')}_bloom_{column}"
    src = load_table(spark, path)
    # build-side file key via the SQL canonicalizer (percent-decoded
    # for file: URIs) so probe-time listing paths (_canon_file_path)
    # match on paths with encodable characters — the same pairing the
    # incremental-state machinery uses.  collect_set dedups bits, so
    # no second distinct; the (file, value) distinct stays to bound
    # the k-fold explode.
    pos = (
        src.select(
            _canon_file_path_expr().alias("file"), F.col(column).alias("v")
        )
        .filter(F.col("v").isNotNull())
        .distinct()
        .select("file", F.explode(_positions_expr("v", n_bits, k)).alias("bit"))
        .groupBy("file")
        .agg(F.collect_set("bit").alias("bits"))
        .withColumn("n_bits", F.lit(n_bits))
        .withColumn("k", F.lit(k))
    )
    pos.write.mode("overwrite").parquet(index_path)
    return spark.read.parquet(index_path)


def _probe_positions(
    spark: SparkSession, value, dtype, n_bits: int, k: int
) -> list[int]:
    """The literal's bit positions via the SAME JVM hash as the build
    (one-row job; a driver-side reimplementation could silently
    diverge and cause false negatives).  ``dtype`` is the COLUMN's
    Spark type: xxhash64 is type-sensitive (an INT literal probing a
    LONG column hashes differently → false negatives), so the literal
    must be cast before hashing."""
    row = (
        spark.range(1)
        .select(F.lit(value).cast(dtype).alias("v"))
        .select(_positions_expr("v", n_bits, k).alias("p"))
        .collect()[0]
    )
    return list(row["p"])


def bloom_prune(
    spark: SparkSession,
    path: str,
    column: str,
    value,
    index_path: str | None = None,
) -> tuple[list[str], list[str]]:
    """(kept, skipped) part-files for ``column = value``.  Files
    absent from the index (appended since the build) are kept.

    The probe-vs-bitset test runs DISTRIBUTED over the index sidecar
    (one row per file) with the subset test evaluated JVM-side
    (``array_except(probe, bits)`` non-empty ⇒ some probe bit unset ⇒
    the file provably lacks the value); the driver collects only the
    canonical paths of the prunable files — never a bitset (a
    131k-int array per file; at 10k files the old driver loop held
    tens of GB of Python sets, the r10 verdict's #1 scale finding)."""
    index_path = index_path or f"{path.rstrip('/')}_bloom_{column}"
    files = [f.path for f in list_parquet_files(spark, path)]
    idx_df = spark.read.parquet(index_path)

    # input_file_name says file:///x, the listing says file:/x — the
    # index's `file` column is already canonical (built through
    # _canon_file_path_expr), so normalize only the listing side
    from integritychecksforvldbs_spark.operators.kernels import (
        _canon_file_path as _norm,
    )

    head = idx_df.limit(1).collect()
    if not head:
        return files, []
    n_bits, k = int(head[0]["n_bits"]), int(head[0]["k"])
    dtype = load_table(spark, path).schema[column].dataType
    probe = _probe_positions(spark, value, dtype, n_bits, k)
    probe_arr = F.array(*[F.lit(int(p)) for p in probe])
    prunable = {
        r["file"]
        for r in idx_df.select("file", "bits")
        .where(F.size(F.array_except(probe_arr, F.col("bits"))) > 0)
        .select("file")
        .collect()
    }
    kept = [f for f in files if _norm(f) not in prunable]
    skipped = [f for f in files if _norm(f) in prunable]
    return kept, skipped


def bloom_read(
    spark: SparkSession,
    path: str,
    column: str,
    value,
    index_path: str | None = None,
) -> DataFrame:
    """Read ``path`` restricted to ``column = value``, scanning only
    files the Bloom index cannot rule out; the equality is re-applied
    as the residual filter."""
    kept, _skipped = bloom_prune(spark, path, column, value, index_path)
    if not kept:
        return load_table(spark, path).filter(F.lit(False))
    return load_table(spark, *kept).filter(F.col(column) == F.lit(value))


def bloom_read_many(
    spark: SparkSession,
    path: str,
    column: str,
    values: list,
    index_path: str | None = None,
) -> DataFrame:
    """The union of :func:`bloom_read` over ``values`` — same rows,
    same per-value pruned scans — with the metadata work batched: one
    file listing, one index read, ONE one-row job hashing every
    probe's bit positions, and ONE distributed prune pass over
    (index rows × values), instead of ~5 driver round-trips per value
    (guide §5: the driver should do almost no work; a 4-key point-
    lookup union paid ~20 tiny jobs before)."""
    from integritychecksforvldbs_spark.operators.kernels import (
        _canon_file_path as _norm,
    )

    if not values:
        return load_table(spark, path).filter(F.lit(False))
    index_path = index_path or f"{path.rstrip('/')}_bloom_{column}"
    files = [f.path for f in list_parquet_files(spark, path)]
    idx_df = spark.read.parquet(index_path)
    head = idx_df.limit(1).collect()
    src = load_table(spark, path)
    if not head:
        out = None
        for v in values:
            part = src.filter(F.col(column) == F.lit(v))
            out = part if out is None else out.unionByName(part)
        return out
    n_bits, k = int(head[0]["n_bits"]), int(head[0]["k"])
    dtype = src.schema[column].dataType
    # one footer inference for the whole batch: every per-value kept-
    # subset read reuses the RAW source schema (pre-NTZ-normalization,
    # so load_table's cast still applies on top, unchanged).  Tables a
    # raw reader cannot footer-infer (nanos timestamps throw 'Illegal
    # Parquet type') fall back to load_table's own per-subset
    # inference — the batched API stays as general as the per-value
    # bloom_read it replaces.
    try:
        raw_schema = spark.read.parquet(path).schema
    except Exception:
        raw_schema = None
    # every probe's positions in one one-row job (same JVM hash as the
    # build — a driver reimplementation could silently diverge)
    probes_row = (
        spark.range(1)
        .select(
            *[
                F.lit(v).cast(dtype).alias(f"v{i}")
                for i, v in enumerate(values)
            ]
        )
        .select(
            F.array(
                *[
                    _positions_expr(f"v{i}", n_bits, k)
                    for i in range(len(values))
                ]
            ).alias("ps")
        )
        .collect()[0]["ps"]
    )
    # one distributed prune pass: per (file, value), prunable iff some
    # probe bit is unset in the file's bitset
    probe_arrs = F.array(
        *[
            F.array(*[F.lit(int(p)) for p in ps])
            for ps in probes_row
        ]
    )
    pruned_pairs = (
        idx_df.select("file", "bits")
        .select(
            "file",
            F.posexplode(probe_arrs).alias("vi", "probe"),
        )
        .where(F.size(F.array_except(F.col("probe"), F.col("bits"))) > 0)
        .select("vi", "file")
        .collect()
    )
    prunable: dict[int, set] = {}
    for r in pruned_pairs:
        prunable.setdefault(r["vi"], set()).add(r["file"])
    out = None
    for vi, v in enumerate(values):
        dead = prunable.get(vi, set())
        kept = [f for f in files if _norm(f) not in dead]
        part = (
            load_table(spark, *kept, schema=raw_schema).filter(
                F.col(column) == F.lit(v)
            )
            if kept
            else src.filter(F.lit(False))
        )
        out = part if out is None else out.unionByName(part)
    return out
