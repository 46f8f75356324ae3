"""File-level zone maps (min/max data skipping) over plain parquet.

What Delta/Iceberg keep in their manifest column stats, a plain-parquet
deployment already has in every footer: per-row-group min/max.  This
module lifts those into a per-file zone map and uses it to *skip
files* before Spark ever plans the scan — the CHECKFILEGROUP idea
(reference DatabaseIntegrityCheck.sql:1374-1377: scope a check to a
physical subset) applied to value ranges instead of filegroup names,
and the natural companion to :mod:`..sources.maintenance`'s sorted /
z-order compaction, which is what makes file ranges disjoint enough to
prune.

Scale shape: the zone map is **metadata-sized** (one entry per file)
— built from footer reads only (no data pages), driver-side for small
listings and fanned out over executors for large ones (same policy as
``catalog.footer_stats_df``); pruning is a driver-side filter of the
file list, exactly like Catalyst's PartitionFilters but driven by
footer stats.  The pruned read then scans ONLY surviving files and
re-applies the predicate as a residual filter, so correctness never
depends on stats (files with missing/unreadable stats are always
kept).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources.catalog import (
    DRIVER_SIDE_FOOTER_LIMIT,
    list_parquet_files,
)
from integritychecksforvldbs_spark.sources.loader import load_table


@dataclass(frozen=True)
class ZoneEntry:
    """Per-file stats for one column.  ``has_stats=False`` (missing
    footer statistics, unreadable file) means the file can never be
    skipped.  ``n_rows == -1`` means the FOOTER READ ITSELF FAILED
    (IO error, corrupt file): the row count is unknown — distinct
    from a genuinely empty file's trustworthy ``n_rows == 0`` —
    so consumers that would record the count as truth (the versioned
    manifest census) must treat it as an error, not as zero."""

    path: str
    n_rows: int
    vmin: Any
    vmax: Any
    n_nulls: int
    has_stats: bool
    # null COUNT validity, independent of min/max: an ALL-NULL column
    # has no min/max (has_stats=False) but a perfectly trustworthy
    # null_count, and a column ABSENT from the file is all-null by
    # definition (schema-evolution null-fill) — both matter to
    # IS [NOT] NULL pruning, which must never trust a silent 0
    nulls_ok: bool = False


def _naive_utc(v: Any) -> Any:
    """Timestamp stats come back tz-aware (TIMESTAMP_MICROS is
    adjusted-to-UTC); normalize to naive UTC so callers compare with
    plain ``datetime`` bounds (the engine pins the session tz to
    UTC)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return v


def _read_zones(path: str, columns: list[str]) -> dict[str, ZoneEntry]:
    """Executor/driver footer probe: aggregate row-group min/max for
    every column in ``columns`` from ONE footer read.  Metadata IO
    only."""
    local = path[len("file:"):] if path.startswith("file:") else path
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(local).metadata
        idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
        out: dict[str, ZoneEntry] = {}
        for column in columns:
            if column not in idx:
                # absent column: every row null-fills it on read
                out[column] = ZoneEntry(
                    path, int(md.num_rows), None, None,
                    int(md.num_rows), False, nulls_ok=True,
                )
                continue
            ci = idx[column]
            vmin = vmax = None
            n_nulls = 0
            ok = True
            nulls_ok = True
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                if st is None:
                    ok = nulls_ok = False
                    continue
                if st.null_count is None:
                    nulls_ok = False
                else:
                    n_nulls += int(st.null_count)
                if not st.has_min_max:
                    ok = False
                    continue
                vmin = st.min if vmin is None else min(vmin, st.min)
                vmax = st.max if vmax is None else max(vmax, st.max)
            if vmin is None:
                ok = False
            out[column] = ZoneEntry(
                path, int(md.num_rows), _naive_utc(vmin), _naive_utc(vmax),
                n_nulls, ok, nulls_ok=nulls_ok,
            )
        return out
    except Exception:
        # footer read FAILED — n_rows=-1 distinguishes "count unknown"
        # from a genuinely empty file's trustworthy n_rows=0 (pruning
        # ignores the difference via has_stats=False; count consumers
        # like the versioned manifest census must NOT)
        return {c: ZoneEntry(path, -1, None, None, 0, False) for c in columns}


def _read_zone(path: str, column: str) -> ZoneEntry:
    return _read_zones(path, [column])[column]


def build_zone_maps(
    spark: SparkSession, path: str, columns: list[str]
) -> dict[str, list[ZoneEntry]]:
    """Zone maps for every part-file of ``path``, one per requested
    column, from a single footer read per file; executor-distributed
    past the same listing size where ``footer_stats_df`` fans out."""
    files = [f.path for f in list_parquet_files(spark, path)]
    if len(files) <= DRIVER_SIDE_FOOTER_LIMIT:
        per_file = [_read_zones(p, columns) for p in files]
    else:
        slices = min(len(files), spark.sparkContext.defaultParallelism * 2)
        per_file = (
            spark.sparkContext.parallelize(files, slices)
            .map(lambda p: _read_zones(p, columns))
            .collect()
        )
    return {c: [d[c] for d in per_file] for c in columns}


def build_zone_map(
    spark: SparkSession, path: str, column: str
) -> list[ZoneEntry]:
    """Single-column :func:`build_zone_maps`."""
    return build_zone_maps(spark, path, [column])[column]


def zone_map_df(spark: SparkSession, path: str, column: str) -> DataFrame:
    """The zone map as a DataFrame (min/max rendered as strings) for
    auditing/reporting."""
    rows = [
        (e.path, e.n_rows, str(e.vmin), str(e.vmax), e.n_nulls, e.has_stats)
        for e in build_zone_map(spark, path, column)
    ]
    return spark.createDataFrame(
        rows, "path string, n_rows long, vmin string, vmax string, "
        "n_nulls long, has_stats boolean"
    )


def _lt(a: Any, b: Any) -> bool:
    """``a < b`` with date/datetime alignment: a plain date promotes
    to midnight — exactly how Spark and DuckDB cast a DATE literal
    compared against a TIMESTAMP column, so pruning agrees with the
    residual filter."""
    import datetime as _dt

    if isinstance(a, _dt.datetime) and type(b) is _dt.date:
        b = _dt.datetime.combine(b, _dt.time())
    elif type(a) is _dt.date and isinstance(b, _dt.datetime):
        a = _dt.datetime.combine(a, _dt.time())
    return a < b


def prune_files(
    zmap: list[ZoneEntry], lo: Any, hi: Any
) -> tuple[list[str], list[str]]:
    """Split the file list by ``column BETWEEN lo AND hi``: (kept,
    skipped).  A file is skipped only when its stats PROVE no row can
    match (``vmax < lo`` or ``vmin > hi``); stats-less files are
    kept."""
    kept, skipped = [], []
    for e in zmap:
        if e.has_stats and (_lt(e.vmax, lo) or _lt(hi, e.vmin)):
            skipped.append(e.path)
        else:
            kept.append(e.path)
    return kept, skipped


# Above this file count the driver no longer materializes per-file
# stats: footer reads AND the skip decision run on executors, and only
# the verdicts come back (see prune_files_scalable).  ~10^4 entries is
# where a Python driver loop over stats objects starts to matter.
DRIVER_PRUNE_LIMIT = 10_000


def _file_survives(path: str, bounds: dict[str, tuple[Any, Any]]) -> bool:
    """Executor-side prune verdict for one file: False only when some
    predicate's footer stats PROVE exclusion.  Same decision rule as
    :func:`prune_files_multi` (equality of the two paths is
    test-pinned)."""
    zones = _read_zones(path, sorted(bounds))
    return not any(
        zones[c].has_stats
        and (_lt(zones[c].vmax, lo) or _lt(hi, zones[c].vmin))
        for c, (lo, hi) in bounds.items()
    )


def prune_files_scalable(
    spark: SparkSession,
    path: str,
    bounds: dict[str, tuple[Any, Any]],
    driver_limit: int | None = None,
) -> tuple[list[str], list[str]]:
    """(kept, skipped) for a conjunction of range predicates, scaling
    past driver-loop file counts.

    At or under ``driver_limit`` files this is the in-memory
    build-then-prune path.  Above it, the per-file footer read and the
    skip decision BOTH run on executors — the driver never holds a
    stats entry, only the boolean verdict per path (the path strings
    themselves are already driver-side from the listing, which every
    Spark scan needs regardless).  Both paths implement the identical
    decision rule; the boundary test pins identical kept-sets."""
    if driver_limit is None:  # resolved at call time (testable knob)
        driver_limit = DRIVER_PRUNE_LIMIT
    files = [f.path for f in list_parquet_files(spark, path)]
    cols = sorted(bounds)
    if len(files) <= driver_limit:
        return prune_files_multi(build_zone_maps(spark, path, cols), bounds)
    slices = min(len(files), spark.sparkContext.defaultParallelism * 2)
    verdicts = dict(
        spark.sparkContext.parallelize(files, slices)
        .map(lambda p: (p, _file_survives(p, bounds)))
        .collect()
    )
    kept = [p for p in files if verdicts[p]]
    skipped = [p for p in files if not verdicts[p]]
    return kept, skipped


# ---------------------------------------------------------------------------
# persisted sidecar — query-time pruning without footer reads
# ---------------------------------------------------------------------------

def _sidecar_path(table_path: str, column: str) -> str:
    return f"{table_path.rstrip('/')}_zones_{column}"


def build_zone_sidecar(
    spark: SparkSession,
    table_path: str,
    column: str,
    sidecar_path: str | None = None,
) -> str:
    """Persist the zone map as a parquet SIDECAR (what Iceberg/Delta
    keep in manifests): one row per file — (file_path, size, n_rows,
    vmin, vmax, n_nulls, has_stats) with min/max in the COLUMN's own
    type, so pruning compares natively.

    Query-time pruning then reads one metadata-sized parquet instead
    of opening N footers — at 10^6 files the per-query footer pass is
    the cost that matters, and the sidecar turns it into one tiny
    scan.  ``refresh_zone_sidecar`` reconciles appends on (path, size)
    exactly like the incremental-CHECKTABLE state, footer-reading only
    NEW files.  Returns the sidecar path."""
    sidecar_path = sidecar_path or _sidecar_path(table_path, column)
    files = list_parquet_files(spark, table_path)
    _write_sidecar(
        spark, table_path, column, sidecar_path,
        [(f.path, f.size) for f in files],
        keep=None,
    )
    return sidecar_path


def _entry_row(path: str, size: int, column: str) -> tuple:
    e = _read_zones(path, [column])[column]
    return (path, size, e.n_rows, e.vmin, e.vmax, e.n_nulls, e.has_stats)


def _write_sidecar(
    spark: SparkSession,
    table_path: str,
    column: str,
    sidecar_path: str,
    fresh_files: list[tuple[str, int]],
    keep: DataFrame | None,
) -> None:
    """Footer-read ``fresh_files`` (executor-distributed past the
    driver limit), union with the ``keep`` rows of a prior sidecar,
    and install via the rename-aside swap (the kept rows' lineage
    reads the OLD sidecar, so the write must not clobber it
    mid-plan)."""
    from pyspark.sql import types as T

    from integritychecksforvldbs_spark.sources.catalog import (
        _fs_and_path,
        rename_or_raise,
    )
    from integritychecksforvldbs_spark.sources.loader import load_table
    from integritychecksforvldbs_spark.sources.maintenance import (
        write_stats_friendly,
    )

    col_type = load_table(spark, table_path).schema[column].dataType
    schema = T.StructType(
        [
            T.StructField("file_path", T.StringType()),
            T.StructField("size", T.LongType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("vmin", col_type),
            T.StructField("vmax", col_type),
            T.StructField("n_nulls", T.LongType()),
            T.StructField("has_stats", T.BooleanType()),
        ]
    )
    if len(fresh_files) <= DRIVER_SIDE_FOOTER_LIMIT:
        rows = [_entry_row(p, sz, column) for p, sz in fresh_files]
    else:
        slices = min(
            len(fresh_files), spark.sparkContext.defaultParallelism * 2
        )
        rows = (
            spark.sparkContext.parallelize(fresh_files, slices)
            .map(lambda fs: _entry_row(fs[0], fs[1], column))
            .collect()
        )
    fresh = spark.createDataFrame(rows, schema)
    merged = fresh if keep is None else keep.unionByName(fresh)
    tmp = sidecar_path + ".tmp"
    write_stats_friendly(spark, merged.coalesce(1), tmp)
    fs, h_side = _fs_and_path(spark, sidecar_path)
    _, h_tmp = _fs_and_path(spark, tmp)
    _, h_bak = _fs_and_path(spark, sidecar_path + ".bak")
    if fs.exists(h_bak):
        fs.delete(h_bak, True)
    if fs.exists(h_side):
        rename_or_raise(fs, h_side, h_bak)
    rename_or_raise(fs, h_tmp, h_side)
    if fs.exists(h_bak):
        fs.delete(h_bak, True)


def refresh_zone_sidecar(
    spark: SparkSession,
    table_path: str,
    column: str,
    sidecar_path: str | None = None,
) -> str:
    """Reconcile the sidecar with the table: rows whose (path, size)
    both still match are kept AS IS (no footer read); vanished or
    size-changed files drop; new files footer-read and append.
    Returns ``"noop"``, ``"refreshed"``, or ``"rebuilt"`` (no sidecar
    yet)."""
    from integritychecksforvldbs_spark.sources.catalog import _fs_and_path

    sidecar_path = sidecar_path or _sidecar_path(table_path, column)
    fs, h_side = _fs_and_path(spark, sidecar_path)
    _, h_bak = _fs_and_path(spark, sidecar_path + ".bak")
    if not fs.exists(h_side) and fs.exists(h_bak):
        from integritychecksforvldbs_spark.sources.catalog import (
            rename_or_raise,
        )

        rename_or_raise(fs, h_bak, h_side)  # recover a crashed swap
    if not fs.exists(h_side):
        build_zone_sidecar(spark, table_path, column, sidecar_path)
        return "rebuilt"
    live = {(f.path, f.size) for f in list_parquet_files(spark, table_path)}
    prior = spark.read.parquet(sidecar_path)
    known = {
        (r["file_path"], r["size"])
        for r in prior.select("file_path", "size").collect()
    }
    if known == live:
        return "noop"
    keep_keys = known & live
    kept = (
        prior.join(
            spark.createDataFrame(
                list(keep_keys) or [("", -1)], "file_path string, size long"
            ),
            ["file_path", "size"],
            "left_semi",
        )
        # the swap will unlink the files this lineage reads — pin the
        # rows first (metadata-sized)
        .localCheckpoint(eager=True)
    )
    fresh = sorted(live - known)
    _write_sidecar(
        spark, table_path, column, sidecar_path, fresh, keep=kept
    )
    return "refreshed"


def sidecar_prune(
    spark: SparkSession,
    table_path: str,
    column: str,
    lo: Any,
    hi: Any,
    sidecar_path: str | None = None,
) -> tuple[list[str], list[str]]:
    """(kept, skipped) for ``column BETWEEN lo AND hi`` decided from
    the persisted sidecar — NO footer reads at query time.  The skip
    test runs JVM-side on the metadata-sized sidecar scan; files the
    listing has that the sidecar lacks (appended since the refresh)
    are always kept.  Same decision rule as :func:`prune_files`
    (equality test-pinned)."""
    sidecar_path = sidecar_path or _sidecar_path(table_path, column)
    side = spark.read.parquet(sidecar_path)
    skip = F.col("has_stats") & (
        (F.col("vmax") < F.lit(lo)) | (F.col("vmin") > F.lit(hi))
    )
    skipped_set = {
        r["file_path"]
        for r in side.filter(skip).select("file_path").collect()
    }
    files = [f.path for f in list_parquet_files(spark, table_path)]
    kept = [p for p in files if p not in skipped_set]
    skipped = [p for p in files if p in skipped_set]
    return kept, skipped


def zonemap_read(
    spark: SparkSession,
    path: str,
    column: str,
    lo: Any,
    hi: Any,
    zmap: list[ZoneEntry] | None = None,
) -> DataFrame:
    """Read ``path`` restricted to ``column BETWEEN lo AND hi``,
    scanning only files the zone map cannot rule out; the predicate is
    re-applied as a residual filter (row-group pushdown inside kept
    files plus correctness independent of stats).  Without a prebuilt
    ``zmap`` the prune auto-scales past driver-loop file counts."""
    if zmap is not None:
        kept, _skipped = prune_files(zmap, lo, hi)
    else:
        kept, _skipped = prune_files_scalable(spark, path, {column: (lo, hi)})
    pred = F.col(column).between(F.lit(lo), F.lit(hi))
    if not kept:
        return load_table(spark, path).filter(F.lit(False))
    return load_table(spark, *kept).filter(pred)


def prune_files_multi(
    zmaps: dict[str, list[ZoneEntry]],
    bounds: dict[str, tuple[Any, Any]],
) -> tuple[list[str], list[str]]:
    """Prune for a conjunction of range predicates (``AND`` of ``col
    BETWEEN lo AND hi``): a file is skipped when ANY predicate's stats
    prove exclusion — the z-order-layout companion, where several
    clustered columns each carry tight per-file ranges."""
    by_path: dict[str, dict[str, ZoneEntry]] = {}
    order: list[str] = []
    for col, entries in zmaps.items():
        for e in entries:
            if e.path not in by_path:
                by_path[e.path] = {}
                order.append(e.path)
            by_path[e.path][col] = e
    kept, skipped = [], []
    for path in order:
        cols = by_path[path]
        skip = any(
            col in cols
            and cols[col].has_stats
            and (_lt(cols[col].vmax, lo) or _lt(hi, cols[col].vmin))
            for col, (lo, hi) in bounds.items()
        )
        (skipped if skip else kept).append(path)
    return kept, skipped


def zonemap_read_multi(
    spark: SparkSession,
    path: str,
    bounds: dict[str, tuple[Any, Any]],
    zmaps: dict[str, list[ZoneEntry]] | None = None,
) -> DataFrame:
    """Read ``path`` under a conjunction of range predicates, scanning
    only files no predicate can rule out; the full conjunction is
    re-applied as the residual filter.  Without prebuilt ``zmaps`` the
    prune auto-scales past driver-loop file counts."""
    cols = sorted(bounds)
    if zmaps is not None:
        kept, _skipped = prune_files_multi(zmaps, bounds)
    else:
        kept, _skipped = prune_files_scalable(spark, path, bounds)
    pred = None
    for c in cols:
        lo, hi = bounds[c]
        p = F.col(c).between(F.lit(lo), F.lit(hi))
        pred = p if pred is None else pred & p
    if not kept:
        return load_table(spark, path).filter(F.lit(False))
    return load_table(spark, *kept).filter(pred)
