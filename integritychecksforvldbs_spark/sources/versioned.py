"""Versioned parquet tables — snapshot isolation on a plain filesystem.

The reference pins a consistent view by running checks against a
database snapshot (DatabaseIntegrityCheck.sql @CreateSnapshot path);
this module gives the engine's own tables the same property as a
minimal log-structured table format (the Delta/Iceberg idea reduced
to its core):

- data files are IMMUTABLE once written, under ``{path}/data/``;
- a table VERSION is a manifest (``{path}/_versions/vNNNNNNNNNN/``)
  listing the exact data files visible at that version — readers
  resolve a manifest, then read only its files, so a reader holds a
  consistent snapshot no matter what commits land mid-query;
- committing is an optimistic-concurrency CAS: write data files,
  serialize the manifest body to a temporary file, then install
  it at ``_versions/v{N+1}.json`` with one atomic link — the same
  ``put_if_absent`` primitive the work queue's :class:`~..plans.queue.ClaimBackend`
  defines (exclusive create on POSIX, If-None-Match on an object
  store), exactly how the Delta log installs ``N.json``; tables
  registered via :func:`use_log_backend` route the whole log through
  an actual ClaimBackend instance, one shared seam for queue and log.
  Append bodies are DELTAS (their own ``add_files``/``add_stats`` on
  a ``delta_base`` chain) with a full snapshot checkpoint every
  :data:`CHECKPOINT_EVERY` versions, so append metadata is O(commit)
  and a reader's fold is O(1) manifest reads.  A version
  therefore either exists COMPLETE or not at all: there is no window
  in which a committer holds a number without a readable body, so a
  racing committer can never re-base past an in-flight commit and
  drop its acknowledged files (the lost-update hazard of any
  claim-then-write two-step).  A loser re-reads the log and retries
  with the next number, re-basing append manifests on the winner's
  file list (appends commute); overwrite losers fail with a conflict
  error (they raced a commit they would silently erase);
- a crash before the manifest CAS leaves orphan data files (and at
  worst a temporary manifest file) that NO reader can see;
  :func:`vacuum` reclaims anything unreferenced by the retained
  manifests.

Tables written by the pre-atomic layout (a ``vN/`` directory holding
``manifest.json``, where a committer COULD die between claiming the
directory and writing the body) remain readable: a legacy bodyless
directory holds its number but commits nothing, and readers skip it.
New commits always install the atomic single-file form.

Operations: :func:`commit` (append/overwrite), :func:`read` (latest
or ``version=``, i.e. time travel), :func:`history`,
:func:`rollback` (a NEW commit restoring an old version's file list
— history is never rewritten), :func:`vacuum`.

PARTITION LAYOUT — an explicit no.  Data files live flat under
``data/``; the format deliberately has no hive ``col=value/``
directory scheme.  Pruning comes from the manifest's per-file min/max
stats instead: :func:`read_where` and the DELETE/UPDATE probes
(:func:`_dml_candidates` → :func:`_prune_manifest_files`) plan scans
over only the files whose stats admit a match, which on a clustered
layout (:func:`optimize` / ZORDER) skips exactly the files a
partition key would have — without freezing ONE directory key at
write time (re-cluster by a different column and pruning follows; a
hive layout would need a full rewrite), without small-file explosion
on high-cardinality keys, and without a second pruning mechanism next
to the stats the manifest already carries.  This is the position
Delta ships as "liquid clustering supersedes partitioning"; the
plain-parquet side of the engine keeps real hive partitions
(catalog.py/bucketing.py) because THERE the directory scheme is the
only metadata that exists.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_VDIR = "_versions"
_BODY = "manifest.json"
_MAX_COMMIT_RETRIES = 20

# every Nth version serializes the FULL folded snapshot; versions in
# between are deltas (add_files only), so append metadata is O(commit)
# while a reader folds at most N-1 deltas — Delta's add-action log +
# periodic checkpoint, Iceberg's manifest segments, reduced to core
CHECKPOINT_EVERY = 10

# protocol feature gating — Delta's reader-version/table-features idea
# reduced to its core.  Every installed body is stamped with the
# format features required to interpret it; a reader refuses a body
# whose features it does not implement, so a renamed column can never
# be silently null-filled by a reader that predates column mapping.
# Body-level stamping is COMPLETE coverage: mapping/bloom/retired ride
# every body via commit inheritance, DV entries appear in every full
# body and every DML delta, and a fold parses each body on the chain —
# an unknown feature anywhere a reader must look raises before any
# data is interpreted.
SUPPORTED_FEATURES = frozenset(
    {
        "column-mapping",
        "deletion-vectors",
        "bloom-index",
        "parquet-checkpoint",
        "partitioned-layout",
        "transform-partitioning",
    }
)


class VersionedFeatureError(ValueError):
    """The manifest requires format features this reader lacks."""


def _stamp_features(man: dict) -> dict:
    """The body with its ``required_features`` recomputed from what it
    actually uses (empty → key absent, so plain tables pay nothing)."""
    feats = set(man.get("required_features") or ())
    if man.get("column_mapping") or man.get("retired_cols"):
        feats.add("column-mapping")
    if man.get("dvs") or man.get("add_dvs"):
        feats.add("deletion-vectors")
    if man.get("bloom"):
        feats.add("bloom-index")
    if "ckpt_files" in man:
        feats.add("parquet-checkpoint")
    if man.get("partition_by"):
        feats.add("partitioned-layout")
    if man.get("partition_transforms"):
        feats.add("transform-partitioning")
    man = dict(man)
    if feats:
        man["required_features"] = sorted(feats)
    else:
        man.pop("required_features", None)
    return man


@dataclass(frozen=True)
class VersionInfo:
    version: int
    mode: str
    n_files: int
    parent: int | None
    committed_at: float | None = None  # epoch seconds; None pre-r8 logs


def _local(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path


def _vdir(path: str) -> str:
    return os.path.join(_local(path), _VDIR)


def _vname(v: int) -> str:
    return f"v{v:010d}"


# ---------------------------------------------------------------------------
# log-store seam — the version log's CAS behind ClaimBackend
# ---------------------------------------------------------------------------
#
# The commit CAS is the queue's put_if_absent primitive (exclusive
# create on POSIX, If-None-Match on an object store, conditional
# insert on an ACID table — see plans.queue.ClaimBackend).  By default
# the log binds it to the filesystem (tmp + os.link, below); a table
# registered here instead routes every manifest read/install/list/
# delete through ONE shared ClaimBackend implementation, making the
# module docstring's object-store claim real: the queue and the log
# speak the same five-primitive seam.  The backend must make
# put_if_absent atomic WITH its payload (object stores and ACID tables
# do; DirCasBackend's mkdir+body two-step leaves a transient bodyless
# record that readers treat as in-flight, and a committer that dies
# inside it stalls writers loudly rather than corrupting the log).
# Registration is process-local, so the Python Data Source planner
# worker (a separate process) cannot see it — stream backend-logged
# tables via their filesystem default or a driver-side reader.

_LOG_BACKENDS: dict[str, object] = {}


def _log_key(path: str) -> str:
    return os.path.abspath(_local(path))


def use_log_backend(path: str, backend) -> None:
    """Route table ``path``'s version log through ``backend`` (a
    :class:`~..plans.queue.ClaimBackend`); ``None`` unregisters."""
    if backend is None:
        _LOG_BACKENDS.pop(_log_key(path), None)
    else:
        _LOG_BACKENDS[_log_key(path)] = backend


def _backend_for(path: str):
    return _LOG_BACKENDS.get(_log_key(path))


def _ckpt_key(v: int) -> str:
    return _vname(v) + "~ckpt"


# full snapshot bodies at or above this many file entries externalize
# the file list (+stats/DVs) to a PARQUET sidecar instead of inlining
# it in the JSON manifest: one JSON document holding 100k file entries
# is ~20 MB the driver re-serializes per checkpoint and re-parses
# whole on every cold fold — the reason Delta moved checkpoints from
# JSON to parquet.  The sidecar is columnar-compressed (~10× smaller)
# and pyarrow reads it vectorized in pure Python (no SparkSession —
# the Python Data Source planner worker stays supported).  Small
# snapshots keep the inline-JSON form (human-readable, zero extra IO);
# backend-logged tables always inline (ClaimBackend payloads are JSON
# documents by contract).
CKPT_PARQUET_MIN_FILES = 512


def _ckpt_pq_name(v: int) -> str:
    # unique per write attempt: two committers racing one checkpoint
    # slot must never link the same sidecar name (the CAS loser's
    # content would shadow the winner's); the manifest body names its
    # own sidecar, orphans are vacuum food
    return f"{_vname(v)}~files-{uuid.uuid4().hex[:12]}.parquet"


def _write_ckpt_parquet(
    path: str, name: str, files: list, stats: dict, dvs: dict
) -> None:
    """Write a checkpoint's file list as a parquet sidecar (one row
    per file entry; stats/DV payloads are JSON strings per row — their
    schemas vary by table).  Complete-or-absent via tmp + rename."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "file": pa.array(files, type=pa.string()),
            "stat": pa.array(
                [
                    json.dumps(stats[f]) if f in stats else None
                    for f in files
                ],
                type=pa.string(),
            ),
            "dv": pa.array(
                [
                    json.dumps(dvs[f]) if f in dvs else None
                    for f in files
                ],
                type=pa.string(),
            ),
        }
    )
    vd = _vdir(path)
    os.makedirs(vd, exist_ok=True)
    tmp = os.path.join(vd, f".tmp-{name}")
    pq.write_table(table, tmp, compression="zstd")
    os.rename(tmp, os.path.join(vd, name))


def _full_body(
    path: str, v: int, meta: dict, files: list, stats: dict, dvs: dict
) -> dict:
    """A full-snapshot manifest body: inline JSON below
    :data:`CKPT_PARQUET_MIN_FILES` (or on a backend log), else the
    file list externalized to a parquet sidecar the body points at
    (``ckpt_files``)."""
    stats = {f: stats[f] for f in files if f in stats}
    dvs = {f: dvs[f] for f in files if f in dvs}
    if (
        _backend_for(path) is None
        and len(files) >= CKPT_PARQUET_MIN_FILES
    ):
        name = _ckpt_pq_name(v)
        _write_ckpt_parquet(path, name, files, stats, dvs)
        return {**meta, "ckpt_files": name, "n_files": len(files)}
    return {**meta, "files": files, "stats": stats, "dvs": dvs}


def _materialize_body(path: str, man: dict) -> dict:
    """Resolve a body's externalized file list (``ckpt_files`` →
    parquet sidecar) back to the inline shape every consumer sees;
    inline bodies pass through untouched.  Pure Python (pyarrow), so
    the Python Data Source planner worker can call it."""
    if "ckpt_files" not in man:
        return man
    import pyarrow.parquet as pq

    pq_path = os.path.join(_vdir(path), man["ckpt_files"])
    try:
        t = pq.read_table(pq_path)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"manifest v{man.get('version')} of {path!r} points at a "
            f"missing checkpoint sidecar {man['ckpt_files']!r} — the "
            "log was externally damaged"
        )
    files = t.column("file").to_pylist()
    stats, dvs = {}, {}
    for f, s, d in zip(
        files, t.column("stat").to_pylist(), t.column("dv").to_pylist()
    ):
        if s is not None:
            stats[f] = json.loads(s)
        if d is not None:
            dvs[f] = json.loads(d)
    out = {k: v for k, v in man.items() if k != "ckpt_files"}
    out["files"] = files
    out["stats"] = stats
    out["dvs"] = dvs
    return out


def _read_ckpt(path: str, v: int) -> dict | None:
    """Version ``v``'s vacuum-written checkpoint sidecar, if any — a
    FULL body that supersedes a delta original whose base chain may
    have been expired.  Probed only for delta bodies (full bodies
    never need one), so every hot read of a full manifest costs one
    IO, not two."""
    b = _backend_for(path)
    if b is not None:
        rec = b.get(_ckpt_key(v))
        return rec.payload if rec is not None else None
    try:
        with open(os.path.join(_vdir(path), _ckpt_key(v) + ".json")) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _read_manifest(path: str, v: int) -> dict | None:
    b = _backend_for(path)
    if b is not None:
        rec = b.get(_vname(v))
        # a record without a payload is an in-flight (or crashed)
        # two-step backend write: not committed
        man = rec.payload if rec is not None else None
    else:
        man = None
        try:
            with open(os.path.join(_vdir(path), _vname(v) + ".json")) as f:
                man = json.load(f)
        except FileNotFoundError:
            # legacy dir layout: vN/manifest.json, possibly bodyless
            # (the old protocol's committer could die between its
            # mkdir and body write)
            try:
                with open(
                    os.path.join(_vdir(path), _vname(v), _BODY)
                ) as f:
                    man = json.load(f)
            except (
                FileNotFoundError, NotADirectoryError, json.JSONDecodeError
            ):
                man = None
        except json.JSONDecodeError:
            man = None  # unreachable for atomic installs; defensive
    def _gate(body: dict) -> dict:
        unknown = (
            set(body.get("required_features") or ()) - SUPPORTED_FEATURES
        )
        if unknown:
            raise VersionedFeatureError(
                f"version {v} of {path!r} requires format feature(s) "
                f"{sorted(unknown)} this reader does not implement; "
                "upgrade the engine before reading this table"
            )
        return body

    if man is not None:
        _gate(man)
    if man is not None and "ckpt_files" in man:
        return _materialize_body(path, man)
    if man is not None and "files" not in man:
        ckpt = _read_ckpt(path, v)
        if ckpt is not None:
            return _materialize_body(path, _gate(ckpt))
    return man


def _manifest_schema(man: dict):
    """StructType recorded in a manifest, or None for manifests
    predating schema recording.  Prefers the JSON form, which
    StructType.fromJson parses in pure Python — no SparkSession, so
    it works inside the Python Data Source planner worker; the DDL
    form needs the JVM parser and is kept for human readability."""
    from pyspark.sql.types import StructType

    sj = man.get("schema_json")
    if sj is not None:
        parsed = StructType.fromJson(sj)
    else:
        ddl = man.get("schema")
        if ddl is None:
            return None
        parsed = StructType.fromDDL(ddl)
    # Spark's parquet scans report every column nullable regardless of
    # the writer's schema; relax the recorded one the same way so the
    # native read, the Python Data Source, and plain file reads all
    # agree (and unions across them resolve)
    from pyspark.sql.types import StructField

    return StructType(
        [StructField(f.name, f.dataType, True, f.metadata)
         for f in parsed.fields]
    )


# ---------------------------------------------------------------------------
# Column mapping — rename/drop columns without rewriting data files
# ---------------------------------------------------------------------------
#
# Data files always store a column under its PHYSICAL name, which is
# fixed for the column's whole lifetime; the manifest's schema records
# the LOGICAL (user-facing) names.  ``column_mapping`` holds the
# non-identity logical→physical entries, so a table that never renamed
# anything carries no mapping at all and pays nothing.  ``retired_cols``
# lists physical names that ever LEFT the live schema (DROP COLUMN, or
# a schema-evolving append that removed a column): a later ADD of the
# same logical name binds a FRESH physical name instead, so the old
# bytes still sitting in immutable files can never resurrect into the
# new column — the hazard Delta's column-mapping field IDs exist for.


def _mapping(man: dict) -> dict[str, str]:
    """Logical→physical column mapping of a manifest ({} = identity)."""
    return dict(man.get("column_mapping") or {})


# ---------------------------------------------------------------------------
# Partition-column layout — hive-style data/col=value/ directories
# ---------------------------------------------------------------------------
#
# ``commit(..., partition_by=["c"])`` lays data files out under
# ``data/c=value/`` (the engine's own plain-parquet side is
# hive-partitioned, catalog.py; reference scope analogue: the
# reference scopes CHECKFILEGROUP to ONE filegroup,
# DatabaseIntegrityCheck.sql:1476-1487 — a partition is this format's
# filegroup).  The manifest records ``partition_by`` (PHYSICAL column
# names — immutable for a column's lifetime, so ALTER RENAME cannot
# orphan the layout, same discipline as stats/bloom keys) and each
# file's partition values are FOLDED INTO ITS STATS ENTRY as exact
# min==max bounds, which makes every existing stats consumer —
# ``read_where`` pruning, DML probe candidates, metadata-only counts,
# partition-scoped OPTIMIZE — partition-aware with zero new code
# paths.  Scans reconstruct the partition columns JVM-side via
# Spark's ``basePath`` partition discovery (the values live in the
# directory names, not the footers).

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _partition_by(man: dict) -> list[str]:
    """PHYSICAL partition column names of a manifest ([] = flat)."""
    return list(man.get("partition_by") or [])


def _partition_transforms(man: dict) -> dict[str, dict]:
    """HIDDEN-partitioning transforms of a manifest: ``{dir_col:
    {"fn", "src", "n"}}`` where ``src`` is the PHYSICAL source column
    ({} = identity layout).  Iceberg's idea: the table partitions by a
    DERIVED value (``day(ts)``, ``truncate(8, k)``) that never appears
    in the schema — queries keep filtering the source column and the
    stats-fold pruning translates their bounds onto the partition
    dirs.  Transform dirs are synthetic, so the data files carry
    every schema column and scans stay plain file-list scans (no
    basePath discovery)."""
    return dict(man.get("partition_transforms") or {})


def _partition_spec_history(man: dict) -> dict[str, dict]:
    """Transforms of RETIRED partition specs (:func:`set_partition_spec`
    evolution), keyed by dir column like the active ones.  Files
    written under an old spec carry that spec's dir values in their
    stats, so the pruner translates predicate bounds onto history
    dirs too — each file is pruned by whichever dir values its own
    stats hold, and a file lacking a dir's stats is simply kept
    (exact across every spec boundary)."""
    return dict(man.get("partition_spec_history") or {})


def _identity_dir_keys(man: dict) -> set[str]:
    """Dir-column names whose files do NOT carry the column in their
    footers (hive-style identity dirs — active spec or a retired one
    in the history): exactly the files basePath discovery must
    reconstruct.  Transform dirs are synthetic (files carry every
    schema column) and never appear here."""
    tr = _partition_transforms(man)
    keys = {d for d in _partition_by(man) if d not in tr}
    for d, t in _partition_spec_history(man).items():
        if t.get("fn") == "identity":
            keys.add(d)
    return keys


_TRANSFORM_SPEC = re.compile(
    r"^\s*(?P<fn>day|month|year|truncate|bucket)\s*\(\s*"
    r"(?:(?P<n>\d+)\s*,\s*)?(?P<col>[A-Za-z_]\w*)\s*\)\s*$",
    re.I,
)

_MONOTONIC_TRANSFORMS = {"day", "month", "year", "truncate", "identity"}


def _parse_partition_spec(
    partition_by: list[str], schema, mapping: dict[str, str]
) -> tuple[list[str], dict[str, dict]]:
    """User ``partition_by`` entries — plain column names (identity)
    or ``fn(col)`` / ``truncate(n, col)`` transforms — parsed into
    (dir column names, transforms keyed by dir name, sources
    PHYSICAL).  Identity and transform entries cannot mix: identity
    dirs strip real columns (scans need basePath discovery), synthetic
    dirs must not be discovered (they are not schema columns) — one
    table cannot plan both ways."""
    from pyspark.sql import types as T

    names = set(schema.fieldNames())
    dirs: list[str] = []
    transforms: dict[str, dict] = {}
    for ent in partition_by:
        m = _TRANSFORM_SPEC.match(ent)
        if m is None:
            if ent not in names:
                raise ValueError(
                    f"partition column {ent!r} not in the schema"
                )
            dirs.append(mapping.get(ent, ent))
            continue
        fn = m.group("fn").lower()
        col = m.group("col")
        n = int(m.group("n")) if m.group("n") else None
        if col not in names:
            raise ValueError(
                f"partition transform source {col!r} not in the schema"
            )
        dtype = schema[col].dataType
        hash_kind = None
        if fn == "bucket":
            # Iceberg's bucket(n, col) re-expressed on Spark's own
            # murmur3 (F.hash, seed 42) so the write path is one
            # codegen'd JVM expression; the hash KIND is recorded in
            # the spec because the driver-side pruning twin
            # (functions/sparkhash.py) must hash a predicate literal
            # with the column's width, not the literal's
            if n is None or n <= 0:
                raise ValueError(
                    f"bucket needs a positive count: {ent!r}"
                )
            if isinstance(
                dtype, (T.ByteType, T.ShortType, T.IntegerType)
            ):
                hash_kind = "int"
            elif isinstance(dtype, T.LongType):
                hash_kind = "long"
            elif isinstance(dtype, T.StringType):
                hash_kind = "string"
            elif isinstance(dtype, T.DateType):
                hash_kind = "date"
            elif isinstance(
                dtype, (T.TimestampType, T.TimestampNTZType)
            ):
                hash_kind = "timestamp"
            else:
                raise ValueError(
                    "bucket() needs an integer/string/date/timestamp "
                    f"column: {ent!r}"
                )
            dname = f"{col}_bucket_{n}"
        elif fn in ("day", "month", "year"):
            if n is not None:
                raise ValueError(f"{fn}() takes no width: {ent!r}")
            if not isinstance(
                dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)
            ):
                raise ValueError(
                    f"{fn}() needs a date/timestamp column: {ent!r}"
                )
            dname = f"{col}_{fn}"
        else:  # truncate
            if n is None or n <= 0:
                raise ValueError(
                    f"truncate needs a positive width: {ent!r}"
                )
            if not isinstance(
                dtype,
                (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                 T.StringType),
            ):
                raise ValueError(
                    f"truncate() needs an integer/string column: {ent!r}"
                )
            dname = f"{col}_trunc_{n}"
        if dname in names:
            raise ValueError(
                f"derived partition dir {dname!r} collides with a "
                "schema column; rename one"
            )
        dirs.append(dname)
        transforms[dname] = {
            "fn": fn, "src": mapping.get(col, col),
            **({"n": n} if n is not None else {}),
            **({"hash": hash_kind} if hash_kind is not None else {}),
        }
    if transforms and len(transforms) != len(dirs):
        raise ValueError(
            "identity and transform partition entries cannot mix in "
            f"one table: {partition_by!r} (identity dirs need basePath "
            "discovery, synthetic dirs must not be discovered)"
        )
    return dirs, transforms


def _transform_write_expr(tr: dict, src_type):
    """The Spark column computing a transform's dir value from its
    (physical-named) source — MUST stay in lockstep with
    :func:`_transform_value` (the driver-side twin the pruning
    translation applies to predicate bounds)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    fn, src = tr["fn"], tr["src"]
    if fn == "day":
        return F.to_date(F.col(src))
    if fn == "month":
        return F.trunc(F.to_date(F.col(src)), "month")
    if fn == "year":
        return F.trunc(F.to_date(F.col(src)), "year")
    n = int(tr["n"])
    if fn == "bucket":
        # one built-in murmur3 inside codegen; the Python twin
        # (functions/sparkhash.py) reproduces it for pruning
        return F.pmod(F.hash(F.col(src)), F.lit(n))
    if isinstance(src_type, T.StringType):
        return F.substring(F.col(src), 1, n)
    # integer floor-truncate (pmod keeps negatives Iceberg-correct)
    return (F.col(src) - F.pmod(F.col(src), F.lit(n))).cast(src_type)


def _transform_value(tr: dict, v):
    """Driver-side twin of :func:`_transform_write_expr` over a
    Python predicate-bound value (session tz pinned UTC, so the
    timestamp→date folds agree).  day/month/year/truncate are
    MONOTONIC, which is what makes translating a (lo, hi) source
    bound onto the dir value sound; bucket is NOT — only POINT
    predicates translate (the pruner enforces that)."""
    import datetime

    if v is None:
        return None
    fn = tr["fn"]
    if fn == "identity":
        return v  # history identity dirs: dir value IS the column
    if fn == "bucket":
        from integritychecksforvldbs_spark.functions.sparkhash import (
            bucket_id,
        )

        return bucket_id(v, tr["hash"], int(tr["n"]))
    if fn in ("day", "month", "year"):
        d = v.date() if isinstance(v, datetime.datetime) else v
        if fn == "month":
            d = d.replace(day=1)
        elif fn == "year":
            d = d.replace(month=1, day=1)
        return d
    n = int(tr["n"])
    if isinstance(v, str):
        return v[:n]
    return v - (v % n)  # python % floors: Iceberg's negative contract




def _partition_base(fpath: str) -> str:
    """The directory above a file's hive partition segments — the
    ``basePath`` Spark's partition discovery needs.  Data-dir names
    are uuid hex / ``col=value``; only the latter contain ``=``."""
    d = os.path.dirname(fpath)
    while "=" in os.path.basename(d):
        d = os.path.dirname(d)
    return d


def _partition_segments(fpath: str) -> dict[str, str]:
    """Raw (unescaped) ``{col: value-string}`` parsed from a file's
    hive partition directories, innermost last."""
    from urllib.parse import unquote

    out: dict[str, str] = {}
    d = os.path.dirname(fpath)
    while "=" in os.path.basename(d):
        seg = os.path.basename(d)
        k, _, v = seg.partition("=")
        out[unquote(k)] = unquote(v)
        d = os.path.dirname(d)
    return out


def _check_part_dtype(name: str, dtype) -> None:
    """Refuse a partition column whose directory value could not be
    parsed back — BEFORE any bytes move."""
    from pyspark.sql import types as T

    ok = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType, T.DateType,
        T.TimestampType, T.TimestampNTZType, T.BooleanType,
        T.StringType,
    )
    if not isinstance(dtype, ok):
        raise TypeError(
            f"unsupported partition column type for {name!r}: "
            f"{dtype.simpleString()}"
        )


def _typed_part_value(s: str, dtype):
    """A partition directory's value string as the comparable Python
    value of the column's type (None for hive's null sentinel) —
    mirrors Spark's own partition-value cast so the folded stats agree
    with what the scan reconstructs."""
    import datetime
    import decimal

    from pyspark.sql import types as T

    if s == _HIVE_NULL:
        return None
    if isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return int(s)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(s)
    if isinstance(dtype, T.DecimalType):
        return decimal.Decimal(s)
    if isinstance(dtype, T.DateType):
        return datetime.date.fromisoformat(s)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return datetime.datetime.fromisoformat(s)
    if isinstance(dtype, T.BooleanType):
        return s.lower() == "true"
    if isinstance(dtype, T.StringType):
        return s
    raise TypeError(
        f"unsupported partition column type {dtype.simpleString()}"
    )


def _physical_schema(man: dict):
    """The manifest's logical schema with each field renamed to the
    physical name data files store it under."""
    sch = _manifest_schema(man)
    if sch is None:
        return None
    m = _mapping(man)
    if not m:
        return sch
    from pyspark.sql.types import StructField, StructType

    return StructType(
        [StructField(m.get(f.name, f.name), f.dataType, True, f.metadata)
         for f in sch.fields]
    )


def _rename_atomic(df: DataFrame, ren: dict[str, str]) -> DataFrame:
    """Rename via ONE select projection.  ``withColumnsRenamed``
    applies its map SEQUENTIALLY, so a cyclic mapping — reachable
    through a rename chain like a→tmp, b→a, tmp→b, which leaves
    ``{a: b, b: a}`` — would corrupt the frame (both columns end up
    with one name); a single projection renames atomically."""
    if not ren or all(ren.get(c, c) == c for c in df.columns):
        return df
    from pyspark.sql import functions as F

    return df.select(
        *[F.col(f"`{c}`").alias(ren.get(c, c)) for c in df.columns]
    )


def _to_logical(df: DataFrame, man: dict) -> DataFrame:
    """Rename a physical-named frame's columns to their logical names
    (extra columns — position markers — pass through untouched)."""
    m = _mapping(man)
    if not m:
        return df
    return _rename_atomic(df, {p: lg for lg, p in m.items()})


def _to_physical(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename a logical-named frame's columns to physical names for
    writing."""
    if not mapping:
        return df
    return _rename_atomic(df, dict(mapping))


def _retired(man: dict) -> list[str]:
    return list(man.get("retired_cols") or [])


def _fresh_physical(name: str, taken_lower: set[str]) -> str:
    """A physical name for a (re)added logical column that can never
    collide with bytes already sitting in the table's files."""
    if name.lower() not in taken_lower:
        return name
    cand = f"{name}_{uuid.uuid4().hex[:8]}"
    while cand.lower() in taken_lower:
        cand = f"{name}_{uuid.uuid4().hex[:8]}"
    return cand


def _evolve_mapping(
    cur_man: dict, new_schema
) -> tuple[dict[str, str], list[str]]:
    """The (mapping, retired) a schema-evolving APPEND carries: kept
    columns keep their physical names, columns the new schema dropped
    retire theirs, and columns it added bind collision-free fresh
    ones — so re-adding a once-dropped name can never resurrect the
    old bytes still in the files."""
    cur_sch = _manifest_schema(cur_man)
    m = _mapping(cur_man)
    retired = _retired(cur_man)
    if cur_sch is None:
        return m, retired
    cur_names = set(cur_sch.fieldNames())
    new_names = [f.name for f in new_schema.fields]
    new_set = set(new_names)
    out: dict[str, str] = {}
    for name in cur_names & new_set:
        p = m.get(name, name)
        if p != name:
            out[name] = p
    rset = {r.lower() for r in retired}
    for name in cur_names - new_set:
        p = m.get(name, name)
        if p.lower() not in rset:
            retired.append(p)
            rset.add(p.lower())
    taken = rset | {
        m.get(n, n).lower() for n in cur_names & new_set
    }
    for name in new_names:
        if name in cur_names:
            continue
        p = _fresh_physical(name, taken)
        taken.add(p.lower())
        if p != name:
            out[name] = p
    return out, retired


def _versions(path: str) -> list[int]:
    """Every version NUMBER present in the log: atomic ``vN.json``
    manifests (always complete) plus legacy ``vN/`` dirs (which may be
    bodyless corpses that still hold their number)."""
    b = _backend_for(path)
    if b is not None:
        out = set()
        for k in b.list("v"):
            if k.startswith("v") and k[1:].isdigit():
                out.add(int(k[1:]))
        return sorted(out)
    try:
        names = os.listdir(_vdir(path))
    except FileNotFoundError:
        return []
    out = set()
    for n in names:
        if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit():
            out.add(int(n[1:-5]))
        elif n.startswith("v") and n[1:].isdigit():
            out.add(int(n[1:]))
    return sorted(out)


def _chain_versions(path: str, man: dict) -> list[int]:
    """Versions of the manifests a DELTA body folds over, nearest
    first, excluding the body's own version; empty for a full
    manifest.  Used by :func:`vacuum` to retain every manifest a
    retained snapshot still resolves through."""
    out: list[int] = []
    while "files" not in man:
        bv = int(man["delta_base"])
        out.append(bv)
        man = _read_manifest(path, bv)
        if man is None:
            raise FileNotFoundError(
                f"delta base v{bv} of {path!r} is missing — the log was "
                "vacuumed below a retained delta chain or damaged"
            )
    return out


def _fold(path: str, man: dict) -> dict:
    """The folded SNAPSHOT view of a manifest body.

    A FULL body (has ``files``) is its own snapshot.  A DELTA body —
    what appends write between checkpoints, the Delta-log add-action
    discipline (versioned.py's answer to "every commit rewrites the
    whole file list") — carries ``add_files``/``add_stats`` (and, for
    replace commits like incremental compaction, ``remove_files``) on
    a ``delta_base`` chain; folding walks the chain to the nearest
    full manifest and applies removals-then-additions oldest-first.
    The returned
    dict has the top body's metadata (version, mode, parent, schema,
    extras) with materialized ``files`` and ``stats``, so every
    reader sees one shape regardless of the physical form.  Chain
    length is bounded by the checkpoint interval, so a fold is O(1)
    manifest reads, not O(history)."""
    if "files" in man:
        return man
    chain = [man]
    base = man
    while "files" not in base:
        bv = int(base["delta_base"])
        nxt = _read_manifest(path, bv)
        if nxt is None:
            raise FileNotFoundError(
                f"delta base v{bv} of {path!r} is missing — the log was "
                "vacuumed below a retained delta chain or damaged"
            )
        base = nxt
        chain.append(base)
    files = list(base["files"])
    stats = dict(base.get("stats") or {})
    dvs = dict(base.get("dvs") or {})
    for d in reversed(chain[:-1]):
        rm = set(d.get("remove_files") or ())
        if rm:
            files = [f for f in files if f not in rm]
            for f in rm:
                dvs.pop(f, None)  # a removed file takes its DV with it
        files = files + list(d["add_files"])
        stats.update(d.get("add_stats") or {})
        # a DML's new DV entry SUPERSEDES the file's old one (it holds
        # the full union of dead positions, not an increment)
        dvs.update(d.get("add_dvs") or {})
    top = dict(man)
    top.pop("add_files", None)
    top.pop("add_stats", None)
    top.pop("add_dvs", None)
    top.pop("delta_base", None)
    top["files"] = files
    top["stats"] = {f: stats[f] for f in files if f in stats}
    top["dvs"] = {f: dvs[f] for f in files if f in dvs}
    return top


def _snapshot(path: str, v: int) -> dict | None:
    """Folded snapshot of version ``v``; None when not committed."""
    man = _read_manifest(path, v)
    return None if man is None else _fold(path, man)


def _committed_at(path: str, v: int, man: dict) -> float | None:
    """Epoch seconds version ``v`` committed: the body's recorded
    ``committed_at`` (r8+), else the manifest artifact's mtime — the
    same commit-time fallback Delta uses (the N.json modification
    time) for logs predating in-body timestamps."""
    ts = man.get("committed_at")
    if ts is not None:
        return float(ts)
    b = _backend_for(path)
    if b is not None:
        rec = b.get(_vname(v))
        return rec.modified if rec is not None else None
    for p in (
        os.path.join(_vdir(path), _vname(v) + ".json"),
        os.path.join(_vdir(path), _vname(v), _BODY),
    ):
        try:
            return os.path.getmtime(p)
        except OSError:
            continue
    return None


def version_at(path: str, timestamp: float) -> int:
    """``TIMESTAMP AS OF``: the highest version committed at or before
    ``timestamp`` (epoch seconds).  Raises when the table's FIRST
    retained commit is already later — there is no snapshot to hold
    (mirrors Delta's earliest-version error after vacuum).

    Walks the log NEWEST-FIRST and stops at the first version whose
    ``committed_at`` is at or before the timestamp: commit times are
    appended by ``time.time()`` at install, so they ascend with the
    version number (modulo clock skew between concurrent committers,
    the same tolerance Delta's timestamp resolution accepts) — the
    lookup reads O(versions-after-timestamp) manifests instead of
    JSON-parsing the whole log on every ``TIMESTAMP AS OF``."""
    for v in reversed(_versions(path)):
        man = _read_manifest(path, v)
        if man is None:
            continue
        ts = _committed_at(path, v, man)
        if ts is not None and ts <= timestamp:
            return v
    raise FileNotFoundError(
        f"no version of {path!r} committed at or before "
        f"{timestamp} (vacuumed, or the table is younger)"
    )


_LATEST_HINT = "_latest"


def _write_latest_hint(path: str, v: int) -> None:
    """Best-effort ``_last_checkpoint``-style pointer written after
    every successful commit: one GET resolves the latest version
    instead of LISTing the whole log directory (an unbounded LIST per
    read on an object store, bounded only by vacuum).  Correctness
    NEVER depends on it — a racing writer may leave it stale-low (the
    reader probes forward from it), and a missing/corrupt pointer
    falls back to the full listing.  It can never be stale-high:
    it is written only after the version it names is installed, and
    vacuum never removes the retained tip."""
    b = _backend_for(path)
    try:
        if b is not None:
            b.put(_LATEST_HINT, {"version": int(v)})
            return
        vd = _vdir(path)
        tmp = os.path.join(vd, f".tmp-latest-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump({"version": int(v)}, f)
        os.replace(tmp, os.path.join(vd, _LATEST_HINT + ".json"))
    except OSError:
        pass  # a hint that failed to write is just a missing hint


def _read_latest_hint(path: str) -> int | None:
    b = _backend_for(path)
    if b is not None:
        rec = b.get(_LATEST_HINT)
        if rec is None or not rec.payload:
            return None
        try:
            return int(rec.payload["version"])
        except (KeyError, TypeError, ValueError):
            return None
    try:
        with open(os.path.join(_vdir(path), _LATEST_HINT + ".json")) as f:
            return int(json.load(f)["version"])
    except (OSError, json.JSONDecodeError, KeyError, TypeError, ValueError):
        return None


def _latest_committed(path: str) -> tuple[int, dict] | None:
    """Highest version whose manifest exists, FOLDED to its snapshot
    view (``files``/``stats`` always materialized).  Atomic installs
    make every listed ``vN.json`` complete; a legacy bodyless ``vN/``
    dir holds its number but commits nothing and is skipped.

    Resolution order: the ``_latest`` pointer (one GET) plus a bounded
    forward probe over slots committed after the pointer was written —
    stepping over legacy corpse dirs exactly like :func:`_next_claim`
    — with the full directory listing only as the fallback for tables
    that predate the pointer (or whose pointer write was lost)."""
    hint = _read_latest_hint(path)
    if hint is not None:
        man = _read_manifest(path, hint)
        if man is not None:
            v, best = hint, man
            probe = v + 1
            fs = _backend_for(path) is None
            while True:
                m2 = _read_manifest(path, probe)
                if m2 is not None:
                    v, best = probe, m2
                elif not (
                    fs
                    and os.path.isdir(
                        os.path.join(_vdir(path), _vname(probe))
                    )
                ):
                    break  # no artifact at all: nothing committed past v
                probe += 1  # committed, or a corpse slot: keep probing
            return v, _fold(path, best)
        # hint names a version with no manifest (externally damaged
        # log, or a unit test hand-pruned it): distrust it entirely
    for v in reversed(_versions(path)):
        man = _read_manifest(path, v)
        if man is not None:
            return v, _fold(path, man)
    return None


def _contiguous_committed(path: str, from_v: int) -> int:
    """Highest version V such that EVERY version in (from_v, V] has a
    committed manifest — the safe streaming frontier.  With atomic
    manifest installs the log has no gaps and this equals the latest
    committed version; on a legacy-layout table a bodyless claim dir
    caps the frontier so a streaming offset never commits past a
    version slot whose body might still be in flight (advancing past
    it would permanently drop that version's files from the stream
    once the checkpoint moves on)."""
    v = from_v
    while _read_manifest(path, v + 1) is not None:
        v += 1
    return v


def _write_checkpoint(path: str, v: int) -> None:
    """Materialize version ``v``'s FOLDED snapshot as a checkpoint
    sidecar (``vN~ckpt.json``), after which ``v`` resolves without its
    delta-base chain — what lets :func:`vacuum` expire the chain's
    manifests (and the files only they referenced) below the retention
    horizon even when the retained tip is a delta.  Idempotent;
    installed with the same complete-or-absent discipline as every
    manifest."""
    if _read_manifest(path, v) is None:
        raise FileNotFoundError(f"version {v} of {path!r} not found")
    body = _stamp_features(_snapshot(path, v))
    b = _backend_for(path)
    if b is not None:
        if not b.put_if_absent(_ckpt_key(v), body):
            # the record exists — but a vacuum that crashed inside a
            # two-step backend write may have left it BODYLESS, and
            # expiring the chain against an unreadable checkpoint
            # bricks the table; the fold is deterministic, so an
            # unconditional repair write is identical-or-restoring
            rec = b.get(_ckpt_key(v))
            if rec is None or rec.payload is None:
                b.put(_ckpt_key(v), body)
        return
    target = os.path.join(_vdir(path), _ckpt_key(v) + ".json")
    if os.path.exists(target):
        return
    # big snapshots externalize the file list exactly like commit-time
    # checkpoints (the ~ckpt sidecar is the same O(files) body)
    body = _stamp_features(
        _full_body(
            path, v, {k: x for k, x in body.items()
                      if k not in ("files", "stats", "dvs")},
            body["files"], body.get("stats") or {}, body.get("dvs") or {},
        )
    )
    tmp = os.path.join(
        _vdir(path), f".tmp-{_ckpt_key(v)}-{uuid.uuid4().hex[:8]}"
    )
    with open(tmp, "w") as f:
        json.dump(body, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, target)
    except FileExistsError:
        pass  # a concurrent vacuum wrote the identical fold
    finally:
        os.unlink(tmp)


def _next_claim(path: str, cur_v: int) -> int | None:
    """The version slot a committer who read ``cur_v`` as the latest
    committed version may claim: the first slot past ``cur_v`` not
    held by a VERIFIED legacy bodyless dir (old-protocol crashed
    committer — holds its number, commits nothing, will never gain a
    body because no old-protocol writer exists anymore).

    Returns ``None`` when the slot already holds a committed manifest:
    the caller's view is STALE — someone committed after its read —
    and the only correct response is to re-read and re-base.  Claiming
    any higher number instead would succeed at the CAS (the higher
    slot is free) while carrying a file list built from the stale
    base, silently dropping the interleaved commit's acknowledged
    files from the new snapshot — the lost-update TOCTOU this helper
    exists to close.  The base manifest and the claim number therefore
    always derive from ONE consistent view (``cur_v``), and a racer
    landing between the read and the install surfaces as a lost CAS,
    never as a silent skip."""
    nxt = cur_v + 1
    b = _backend_for(path)
    if b is not None:
        # backend logs have no legacy corpses: any record at the slot
        # — committed, or an in-flight two-step write — means our view
        # is (or is about to be) stale; re-base/retry
        return None if b.get(_vname(nxt)) is not None else nxt
    while True:
        if _read_manifest(path, nxt) is not None:
            return None  # committed after our read — stale view, re-base
        legacy = os.path.join(_vdir(path), _vname(nxt))
        if os.path.isdir(legacy):
            nxt += 1  # proven legacy bodyless corpse: skip its number
            continue
        return nxt


def _install_manifest(path: str, v: int, man: dict) -> bool:
    """Atomically install manifest ``v``; True iff this caller won the
    CAS.  The full body is serialized to a tmp file first and linked
    into place in one step (O_EXCL-equivalent create), so the manifest
    is visible only complete — the Delta-log installation discipline.
    A registered log backend replaces the filesystem link with the
    seam's ``put_if_absent`` (the SAME primitive, store-native)."""
    man = _stamp_features(man)
    b = _backend_for(path)
    if b is not None:
        return b.put_if_absent(_vname(v), man)
    vd = _vdir(path)
    os.makedirs(vd, exist_ok=True)
    target = os.path.join(vd, _vname(v) + ".json")
    tmp = os.path.join(vd, f".tmp-{_vname(v)}-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(man, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, target)  # the CAS: exactly one committer wins vN
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


# ---------------------------------------------------------------------------
# manifest-embedded file statistics — data skipping from the log
# ---------------------------------------------------------------------------
#
# What Delta keeps in its add-file actions and Iceberg in its manifest
# entries: per-file row counts and column min/max, recorded AT COMMIT
# TIME (one footer read per newly written file, metadata IO only), so
# query-time pruning and counts never re-open data files.  The zone-map
# sidecar (zonemap.py) serves plain unversioned tables; here the stats
# ride the same atomic manifest install as the file list, so they can
# never drift from the snapshot they describe.

STATS_MAX_COLUMNS = 32  # Delta's dataSkippingNumIndexedCols default


def _stats_eligible_columns(schema) -> list[str]:
    """Top-level columns worth indexing: orderable primitives (the
    types parquet footers carry min/max for), first
    :data:`STATS_MAX_COLUMNS` in schema order — wide schemas should
    not turn every commit into a stats census."""
    from pyspark.sql import types as T

    ok = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType, T.StringType,
        T.DateType, T.TimestampType, T.TimestampNTZType, T.BooleanType,
    )
    cols = [f.name for f in schema.fields if isinstance(f.dataType, ok)]
    return cols[:STATS_MAX_COLUMNS]


def _enc_stat(v):
    """JSON-safe encoding of a footer min/max value, type-tagged so
    :func:`_dec_stat` restores a comparable Python value."""
    import base64
    import datetime
    import decimal

    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, datetime.datetime):  # before date: subclass
        return {"$ts": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"$date": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"$dec": str(v)}
    if isinstance(v, bytes):
        return {"$b64": base64.b64encode(v).decode("ascii")}
    raise TypeError(f"unencodable stat value {type(v).__name__}")


def _dec_stat(v):
    import base64
    import datetime
    import decimal

    if isinstance(v, dict):
        if "$ts" in v:
            return datetime.datetime.fromisoformat(v["$ts"])
        if "$date" in v:
            return datetime.date.fromisoformat(v["$date"])
        if "$dec" in v:
            return decimal.Decimal(v["$dec"])
        if "$b64" in v:
            return base64.b64decode(v["$b64"])
    return v


def _file_stats_for_dir(
    spark: SparkSession, data_dir: str, columns: list[str]
) -> dict[str, dict]:
    """Per-file stats entry for every part-file under ``data_dir``:
    ``{"n_rows": N, "cols": {c: {"min", "max", "nulls", "ok"}}}``.
    One footer read per file, executor-distributed past the same
    listing size as every other footer census in the repo."""
    from integritychecksforvldbs_spark.sources.zonemap import (
        build_zone_maps,
    )

    # with no eligible columns the census still records n_rows per
    # file (the metadata-only COUNT needs it): probe a nonexistent
    # column, which yields row counts with ok=False stats
    zm = build_zone_maps(spark, data_dir, columns or ["__none__"])
    out: dict[str, dict] = {}
    for c, entries in zm.items():
        for e in entries:
            if e.n_rows < 0:
                # the footer read FAILED — these files were written by
                # THIS job moments ago, so an unreadable footer is a
                # real IO/corruption error, not a stats gap.  Recording
                # it as n_rows=0 would poison the manifest forever:
                # row_count would silently answer 0 for the file and
                # read_where would always prune it (and appends carry
                # the entry forward) — wrong results, violating the
                # "correctness never depends on stats" invariant.
                raise IOError(
                    f"parquet footer of freshly written {e.path!r} is "
                    "unreadable; refusing to commit a manifest whose "
                    "stats would record the file as empty"
                )
            ent = out.setdefault(e.path, {"n_rows": e.n_rows, "cols": {}})
            if c == "__none__":
                continue
            if e.n_rows == 0:
                # an EMPTY part-file (Spark writes one for partition 0
                # even with no rows) has no row groups, hence no
                # min/max — but it provably contributes nothing, which
                # is trustworthy knowledge, not missing stats: ok with
                # null bounds, and pruning may always skip it
                ent["cols"][c] = {
                    "min": None, "max": None, "nulls": 0, "ok": True,
                    "nulls_ok": True,
                }
                continue
            ok, vmin, vmax = e.has_stats, e.vmin, e.vmax
            if ok:
                try:
                    vmin, vmax = _enc_stat(vmin), _enc_stat(vmax)
                except TypeError:
                    ok, vmin, vmax = False, None, None
            else:
                vmin = vmax = None
            ent["cols"][c] = {
                "min": vmin, "max": vmax, "nulls": e.n_nulls, "ok": ok,
                "nulls_ok": bool(e.nulls_ok),
            }
    return out


def _write_data(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    stats_columns: list[str] | None = None,
    mapping: dict[str, str] | None = None,
    partition_by: list[str] | None = None,
    transforms: dict[str, dict] | None = None,
) -> tuple[list[str], dict[str, dict]]:
    """Write ``df`` as fresh immutable data files under the table and
    census its footers: ``(new_files, new_stats)``.  Shared by every
    committing operation; files orphaned by a lost CAS race are
    invisible to readers and reclaimed by :func:`vacuum`.
    ``mapping``: the table's column mapping — ``df`` arrives in
    LOGICAL names and is written (and its stats keyed) under the
    PHYSICAL ones, like every data file before it.

    ``partition_by`` (PHYSICAL names): hive layout.  The write stages
    under a private dir, is censused there, then each file MOVES to
    ``data/col=value/<writeid>-<name>`` — partition dirs must sit
    directly under one common root or Spark's basePath discovery
    refuses the mixed-depth listing; the move is a same-filesystem
    rename here, and on an object store a real committer would write
    direct.  Each file's partition values fold into its stats entry
    as exact min==max bounds, so every stats consumer (read_where,
    DML probes, metadata counts, partition-scoped OPTIMIZE) prunes
    partitions with zero new code paths."""
    from integritychecksforvldbs_spark.sources.catalog import (
        list_parquet_files,
    )
    from integritychecksforvldbs_spark.sources.maintenance import (
        write_stats_friendly,
    )

    if mapping:
        df = _to_physical(df, mapping)
        if stats_columns is not None:
            stats_columns = [mapping.get(c, c) for c in stats_columns]
    if not partition_by:
        data_dir = f"{path.rstrip('/')}/data/{uuid.uuid4().hex[:12]}"
        write_stats_friendly(spark, df, data_dir)
        new_files = sorted(
            f.path for f in list_parquet_files(spark, data_dir)
        )
        if stats_columns is None:
            stats_columns = _stats_eligible_columns(df.schema)
        return new_files, _file_stats_for_dir(
            spark, data_dir, stats_columns
        )

    transforms = transforms or {}
    if transforms:
        # hidden partitioning: synthesize each dir column from its
        # (physical-named) source; partitionBy strips it from the
        # files, so the data stays self-contained and scans stay
        # plain file-list scans
        src_types = {f.name: f.dataType for f in df.schema.fields}
        for dcol, tr in transforms.items():
            df = df.withColumn(
                dcol, _transform_write_expr(tr, src_types[tr["src"]])
            )
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(
            f"partition columns {missing} not in the frame's schema"
        )
    # synthesized dir columns already carry their result type
    # (_transform_write_expr: day/month/year → date, truncate → src)
    pdtypes = {f.name: f.dataType for f in df.schema.fields}
    for c in partition_by:
        _check_part_dtype(c, pdtypes[c])
    wid = uuid.uuid4().hex[:12]
    staged = f"{path.rstrip('/')}/data/.stage-{wid}"
    write_stats_friendly(spark, df, staged, partition_by=partition_by)
    staged_files = sorted(
        f.path for f in list_parquet_files(spark, staged)
    )
    if stats_columns is None:
        stats_columns = _stats_eligible_columns(df.schema)
    stats = _file_stats_for_dir(spark, staged, stats_columns)

    import shutil

    data_root = os.path.join(_local(path), "data")
    stage_root = _local(staged)
    new_files, new_stats = [], {}
    for f in staged_files:
        lf = _local(f)
        rel = os.path.relpath(os.path.dirname(lf), stage_root)
        dst_dir = os.path.join(data_root, rel)
        os.makedirs(dst_dir, exist_ok=True)
        dst = os.path.join(dst_dir, f"{wid}-{os.path.basename(lf)}")
        os.replace(lf, dst)
        final = f"file:{dst}" if f.startswith("file:") else dst
        ent = stats.get(f) or stats.get(lf)
        if ent is not None:
            # fold the partition values in as exact bounds — footers
            # cannot carry them (partitionBy strips the columns)
            seg = _partition_segments(dst)
            for c in partition_by:
                if c not in seg:
                    raise IOError(
                        f"staged file {dst!r} lacks partition dir "
                        f"for {c!r}"
                    )
                v = _typed_part_value(seg[c], pdtypes[c])
                ent["cols"][c] = {
                    "min": _enc_stat(v),
                    "max": _enc_stat(v),
                    "nulls": 0 if v is not None else ent["n_rows"],
                    "ok": True,
                    "nulls_ok": True,
                }
            new_stats[final] = ent
        new_files.append(final)
    shutil.rmtree(stage_root, ignore_errors=True)
    new_files.sort()
    return new_files, new_stats


def _commit_replace(
    path: str,
    base_v: int,
    base_man: dict,
    removed: set[str],
    new_files: list[str],
    new_stats: dict[str, dict],
    mode: str,
    data_change: bool,
    extra: dict | None = None,
    commute_with_appends: bool = False,
    new_dvs: dict | None = None,
) -> int | None:
    """Install a REPLACE commit (``removed`` swapped for
    ``new_files``) on top of EXACTLY ``base_v``; ``None`` when any
    commit landed past the base — the caller computed its rewrite
    against that snapshot, so the only correct response is to re-base
    and recompute (a racing append may hold rows the predicate/merge
    must see).  Body is a delta off ``base_v`` (O(swap) metadata), or
    the folded full snapshot at checkpoint versions.

    ``new_dvs`` (merge-on-read DML): deletion-vector entries
    ``{file: {"path", "n"}}`` this commit installs — each SUPERSEDES
    the file's previous entry (it holds the full dead-position union).

    ``commute_with_appends``: layout-only swaps (incremental
    compaction) change no rows, so a racing commit that still holds
    every file being rewritten commutes — the install re-bases in
    place instead of returning None; a race that REMOVED one of them
    raises (swapping files a concurrent commit already dropped would
    resurrect their rows), and so does one that changed a rewritten
    file's DELETION VECTOR (the rewrite materialized the old live set;
    swapping it in would resurrect the newly dead rows)."""
    orig_dvs = {
        f: (base_man.get("dvs") or {}).get(f) for f in removed
    }
    os.makedirs(_vdir(path), exist_ok=True)
    for _ in range(_MAX_COMMIT_RETRIES):
        cur = _latest_committed(path)
        if cur is None:
            return None
        if cur[0] != base_v:
            if not commute_with_appends:
                return None  # the table moved: recompute against it
            gone = removed - set(cur[1]["files"])
            if gone:
                raise ConflictError(
                    f"replace of {path!r} raced a commit that removed "
                    f"{len(gone)} of the files being rewritten; re-run"
                )
            cur_dvs = cur[1].get("dvs") or {}
            drift = [f for f in removed if cur_dvs.get(f) != orig_dvs[f]]
            if drift:
                raise ConflictError(
                    f"replace of {path!r} raced a DML that changed the "
                    f"deletion vector of {len(drift)} of the files being "
                    "rewritten; re-run"
                )
            base_v, base_man = cur  # the swap commutes: re-base here
        nxt = _next_claim(path, base_v)
        if nxt is None:
            if commute_with_appends:
                continue  # the slot filled mid-claim: re-read and go on
            return None
        import time

        meta = {
            **(extra or {}),
            "version": nxt,
            "mode": mode,
            "data_change": data_change,
            "parent": base_v,
            "committed_at": time.time(),
        }
        # schema inherits from the base unless the caller is changing
        # it (ALTER TABLE overrides via extra)
        meta.setdefault("schema", base_man.get("schema"))
        meta.setdefault("schema_json", base_man.get("schema_json"))
        # the CHECK-constraint map rides every body (set_constraints
        # overrides via extra; everything else inherits the base's)
        meta.setdefault(
            "constraints", dict(base_man.get("constraints") or {})
        )
        # so do the column mapping (ALTER overrides via extra) and
        # the Bloom index registry (build_bloom overrides via extra)
        meta.setdefault("column_mapping", _mapping(base_man))
        meta.setdefault("retired_cols", _retired(base_man))
        meta.setdefault("bloom", dict(base_man.get("bloom") or {}))
        meta.setdefault("partition_by", _partition_by(base_man))
        meta.setdefault(
            "partition_transforms", _partition_transforms(base_man)
        )
        meta.setdefault(
            "partition_spec_history", _partition_spec_history(base_man)
        )
        for _k in (
            "column_mapping", "retired_cols", "bloom", "partition_by",
            "partition_transforms", "partition_spec_history",
        ):
            if not meta.get(_k):
                meta.pop(_k, None)
        if nxt % CHECKPOINT_EVERY == 0:
            files = [
                f for f in base_man["files"] if f not in removed
            ] + new_files
            stats = {**(base_man.get("stats") or {}), **new_stats}
            dvs = {
                f: e
                for f, e in (base_man.get("dvs") or {}).items()
                if f not in removed
            }
            dvs.update(new_dvs or {})
            body = _full_body(path, nxt, meta, files, stats, dvs)
        else:
            body = {
                **meta,
                "delta_base": base_v,
                "add_files": new_files,
                "add_stats": new_stats,
                "remove_files": sorted(removed),
            }
            if new_dvs:
                body["add_dvs"] = new_dvs
        if _install_manifest(path, nxt, body):
            _write_latest_hint(path, nxt)
            return nxt
    return None


def _scan_files(
    spark: SparkSession,
    man: dict,
    files: list[str] | None = None,
    mapped: bool = True,
    per_scan=None,
) -> DataFrame:
    """Plan a parquet scan of ``files`` (default: the manifest's whole
    visible set) against the manifest's recorded schema — the one
    read shape every file-scoped operation shares.  Under a column
    mapping the scan plans against PHYSICAL names (what the files
    store) and renames to logical; ``mapped=False`` returns the raw
    physical frame, for callers that must attach ``_metadata``
    columns to the scan relation before any projection.  ``per_scan``
    is applied to EACH underlying scan relation before any union —
    the only place ``_metadata`` resolves when a partitioned snapshot
    spans several basePath roots."""
    from integritychecksforvldbs_spark.sources.loader import load_table

    files = man["files"] if files is None else files
    sch = _physical_schema(man)
    if sch is not None:
        # transform (hidden) partitioning: the dirs are SYNTHETIC —
        # the files carry every schema column, so the plain file-list
        # scan is exact and discovery must NOT run (it would resurface
        # the derived dir as a column).  Identity dirs (active OR a
        # retired spec's — r13 identity spec evolution) strip the
        # column from the footers, so THOSE files need basePath
        # discovery — decided PER FILE by its own dir segments, which
        # is what lets one snapshot mix layouts across a spec change.
        ident = _identity_dir_keys(man)
        groups: dict[str, list[str]] = {}
        plain: list[str] = []
        for f in files:
            if ident and any(
                k in _partition_segments(f) for k in ident
            ):
                groups.setdefault(_partition_base(f), []).append(f)
            else:
                plain.append(f)
        if groups:
            # partition columns live in the directory names, not the
            # footers: basePath discovery reconstructs them JVM-side
            # (values cast per the declared schema, zero Python).  A
            # snapshot can reference files under SEVERAL roots (a
            # clone's source files next to its own appends), and Spark
            # takes one basePath per scan — group by base and union.
            parts = []
            for b in sorted(groups):
                p = (
                    spark.read.schema(sch)
                    .option("basePath", b)
                    .parquet(*groups[b])
                )
                parts.append(per_scan(p) if per_scan is not None else p)
            if plain:
                p = spark.read.schema(sch).parquet(*plain)
                parts.append(per_scan(p) if per_scan is not None else p)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        else:
            df = spark.read.schema(sch).parquet(*files)
            if per_scan is not None:
                df = per_scan(df)
        if not mapped:
            # raw-frame callers needing _metadata attach it INSIDE
            # per_scan (the hidden column resolves only on the scan
            # relation itself, never across the union above); they
            # address columns by name, so discovery's ordering is fine
            return df
        df = _to_logical(df, man)
        if groups:
            # discovery appends partition columns after the data ones:
            # restore the declared order (per_scan extras, if any,
            # ride along after them)
            extra = [
                c for c in df.columns
                if c not in set(_manifest_schema(man).fieldNames())
            ]
            df = df.select(*_manifest_schema(man).fieldNames(), *extra)
        return df
    # legacy manifests without a recorded schema: load_table applies
    # the nanos/NTZ timestamp normalizations a raw spark.read.parquet
    # lacks, so a table keeps ONE dtype story across every code path
    return load_table(spark, *files)


def _dvs_for(man: dict, files: list[str]) -> dict[str, dict]:
    """The manifest's DV entries restricted to ``files``."""
    dvs = man.get("dvs") or {}
    if not dvs:
        return {}
    fset = set(files)
    return {f: e for f, e in dvs.items() if f in fset}


def _scan_live(
    spark: SparkSession, man: dict, files: list[str] | None = None
) -> DataFrame:
    """:func:`_scan_files` minus the rows the snapshot's deletion
    vectors mark dead — the LIVE view every semantic operation
    (reads, DML probes and rewrites, constraint validation,
    compaction) must see; a snapshot without DVs pays nothing.

    Plan shape when the DV set is small (the point-delete case): the
    clean files scan as ONE untouched relation (zero overhead — no
    metadata columns, no join) unioned with a per-DV'd-file scan whose
    dead positions are a pure codegen ``row_index`` range filter (the
    file's identity is implied by its own scan, so no per-row path
    canonicalization either).  Big DV sets fall back to the
    distributed anti-join."""
    from pyspark.sql import functions as F

    from integritychecksforvldbs_spark.sources import deletion_vectors as dv

    files = man["files"] if files is None else files
    dvs = _dvs_for(man, files)
    if not dvs:
        return _scan_files(spark, man, files)
    per_file = dv.inline_ranges(dvs)
    if per_file is not None:
        # clean = everything inline_ranges holds no ranges for — that
        # includes a dv'd file with a degenerate EMPTY vector (fully
        # live; inline_ranges drops such entries by contract).  The
        # per-file branches stay PHYSICAL until the final rename: the
        # ``_metadata`` column must attach to the scan relation itself
        clean = [f for f in files if f not in per_file]
        parts = []
        if clean:
            parts.append(_scan_files(spark, man, clean, mapped=False))
        for f in files:
            if f not in per_file:
                continue
            sc = _scan_files(spark, man, [f], mapped=False)
            rcol = "__icv_dv_pos"
            while rcol in sc.columns:
                rcol += "_"
            parts.append(
                sc.withColumn(rcol, F.col("_metadata.row_index"))
                .filter(~dv.dead_ranges_pred(per_file[f], rcol))
                .drop(rcol)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return _declared_order(_to_logical(out, man), man)
    # the inline probe just declined: don't repeat it inside apply_dvs
    # (applied per scan relation: _metadata cannot attach across the
    # multi-base union a cloned partitioned snapshot plans)
    return _declared_order(
        _to_logical(
            _scan_files(
                spark, man, files, mapped=False,
                per_scan=lambda p: dv.apply_dvs(
                    spark, p, dvs, try_inline=False
                ),
            ),
            man,
        ),
        man,
    )


def _declared_order(df: DataFrame, man: dict) -> DataFrame:
    """Restore the manifest's declared column order after a RAW
    (mapped=False) scan of a partitioned layout: partition discovery
    appends the directory columns last, and the DV branches of
    :func:`_scan_live` bypass the reorder :func:`_scan_files` applies
    on its mapped path (inherited r13 gap — a partitioned read through
    a DV'd snapshot surfaced (k, v, c) where (k, c, v) was declared).
    Extra columns (position markers) ride along after the declared
    ones; non-partitioned manifests are untouched."""
    sch = _manifest_schema(man)
    if sch is None or not _partition_by(man):
        return df
    names = sch.fieldNames()
    declared = set(names)
    extra = [c for c in df.columns if c not in declared]
    return df.select(*names, *extra)


def _scan_live_pos(
    spark: SparkSession,
    man: dict,
    files: list[str] | None = None,
) -> tuple[DataFrame, str, str]:
    """The live scan PLUS each row's physical address: returns
    ``(df, fcol, rcol)`` where ``fcol`` is the canonicalized file path
    and ``rcol`` the row index within it — what the merge-on-read DML
    write path marks rows by.  Column names are collision-proofed
    against the table schema."""
    from integritychecksforvldbs_spark.sources import deletion_vectors as dv

    files = man["files"] if files is None else files
    sch = _physical_schema(man)
    taken = set(sch.fieldNames()) if sch is not None else set(
        _scan_files(spark, man, files, mapped=False).columns
    )
    # collision-proof the markers against the LOGICAL names too — the
    # frame is renamed to them below
    msch = _manifest_schema(man)
    if msch is not None:
        taken |= set(msch.fieldNames())
    fcol, rcol = "__icv_dv_file", "__icv_dv_pos"
    while fcol in taken:
        fcol += "_"
    while rcol in taken or rcol == fcol:
        rcol += "_"
    # positions attach PER SCAN RELATION (_metadata does not resolve
    # across the multi-base union a cloned partitioned snapshot plans)
    df = _scan_files(
        spark, man, files, mapped=False,
        per_scan=lambda p: dv.scan_with_position(p, fcol, rcol),
    )
    df = dv.anti_join_positions(
        spark, df, _dvs_for(man, files), fcol, rcol
    )
    return _to_logical(df, man), fcol, rcol


def _wrapped_in_one_paren_pair(s: str) -> bool:
    """Whether ``s`` is exactly ``( … )`` with the opening paren
    matching the FINAL character.  Quote-blind on purpose: a paren
    hidden in a string literal only makes this return False, and a
    missed strip merely skips a prune (the atom regex then fails and
    the caller stays conservative) — it can never mis-parse."""
    if not (s.startswith("(") and s.endswith(")")):
        return False
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i == len(s) - 1
    return False


# largest source key set a MERGE probe materializes driver-side for
# membership pruning — CDC batches where it matters are far smaller;
# beyond it the probe falls back to min/max bounds alone
_MERGE_POINTS_CAP = 64


def _merge_probe_candidates(
    spark: SparkSession, man: dict, source: DataFrame, keys: list[str]
) -> list[str] | None:
    """Manifest files a MERGE probe must scan: those whose per-key
    stats OVERLAP the source's key ranges (one small agg over the
    source).  At 100 TB this is what keeps a time-keyed CDC upsert
    touching O(recent files) instead of probing the whole table — the
    same stats machinery partition layouts fold into, so a merge keyed
    by a partition column prunes to exactly the source's partitions.
    ``None`` = no pruning: a NULL source key matches null rows under
    eqNullSafe anywhere (so any null key bails), and any failure
    degrades to the unpruned probe.  Conservative by contract — the
    key semi-join re-applies exact matching on whatever survives.

    When a key's cardinality is SMALL (≤ :data:`_MERGE_POINTS_CAP`,
    pre-screened by an approx-distinct in the same agg so a big
    source never pays a second pass), its exact value set also rides
    as a MEMBERSHIP prune: a CDC upsert keyed by a bucketed or
    Bloom-indexed high-cardinality column — where min/max bounds are
    useless — probes only the listed keys' buckets / admitted
    files."""
    from pyspark.sql import functions as F

    try:
        if not (man.get("stats") or {}):
            return None
        aggs = []
        for i, k in enumerate(keys):
            aggs += [
                F.min(k).alias(f"__mn{i}"),
                F.max(k).alias(f"__mx{i}"),
                F.sum(F.col(k).isNull().cast("long")).alias(f"__nl{i}"),
                F.approx_count_distinct(k).alias(f"__ad{i}"),
            ]
        row = source.agg(*aggs).collect()[0]
        bounds: dict[str, tuple] = {}
        points: dict[str, list] = {}
        for i, k in enumerate(keys):
            if int(row[f"__nl{i}"] or 0) > 0:
                return None  # null keys match null rows in any file
            if row[f"__mn{i}"] is None:
                return []  # empty source: nothing can match
            bounds[k] = (row[f"__mn{i}"], row[f"__mx{i}"])
            # approx ±5%: screen at 2× the cap, verify exactly below
            if int(row[f"__ad{i}"] or 0) <= 2 * _MERGE_POINTS_CAP:
                vals = [
                    r[0]
                    for r in source.select(k)
                    .distinct()
                    .limit(_MERGE_POINTS_CAP + 1)
                    .collect()
                ]
                if 0 < len(vals) <= _MERGE_POINTS_CAP:
                    points[k] = vals
        kept, _ = _prune_manifest_files(
            man, bounds, points or None, spark=spark
        )
        if points and (man.get("bloom") or {}):
            kept = _bloom_prune_files(spark, man, points, kept)
        return kept
    except Exception:
        return None


def _touched_files(
    spark: SparkSession, man: dict, mark, files: list[str] | None = None
) -> list[str]:
    """Manifest paths of the files holding any LIVE row ``mark``
    selects.  ``mark`` is a
    callable DataFrame→DataFrame returning the matching rows — a
    filter for DELETE/UPDATE, a key semi-join for MERGE.  The probe
    projects only the file column after the mark, so Catalyst prunes
    columns and pushes filters into every footer — at 100 TB on a
    clustered layout this touches the predicate's row groups, not the
    table.  ``files`` restricts the probe to a candidate subset (the
    DML paths pass the manifest-stats-admitted files, so the probe
    never even PLANS a scan of provably-unmatchable files).  Rows a
    deletion vector already marks dead never count as matches (they
    are not in the table)."""
    from integritychecksforvldbs_spark.operators.kernels import (
        _canon_file_path,
    )

    canon_to_manifest = {_canon_file_path(f): f for f in man["files"]}
    if files is not None and not files:
        return []  # stats proved no file can hold a match
    probe, fcol, _rcol = _scan_live_pos(spark, man, files)
    hit = mark(probe).select(fcol).distinct().collect()
    return sorted(
        canon_to_manifest[r[fcol]]
        for r in hit
        if r[fcol] in canon_to_manifest
    )


# one atom of a conjunctive DML predicate the stats pruner understands:
# `col <op> literal` or `literal <op> col`, literal a number, a
# single-quoted string, or a typed TIMESTAMP'...'/DATE'...' literal.
# The optional qualifier is honored ONLY when the caller vouches for
# it as a table alias (`aliases=`): a bare `s.inner` could just as
# well be a struct-field access, and stripping an unverified
# qualifier would bound the wrong column's stats.
_QUAL_PAT = r"(?:(?:`(?P<qq>[^`]+)`|(?P<q>\w+))\s*\.\s*)?"
_LIT_PAT = (
    r"-?\d+(?:\.\d+)?|(?:TIMESTAMP|DATE)?\s*'[^']*'"
)
_BOUND_ATOM = re.compile(
    rf"^\s*{_QUAL_PAT}(?:`(?P<qcol>[^`]+)`|(?P<col>\w+))\s*"
    r"(?P<op>>=|<=|==|=|<|>)\s*"
    rf"(?P<lit>{_LIT_PAT})\s*$",
    re.I,
)
_BOUND_ATOM_REV = re.compile(
    rf"^\s*(?P<lit>{_LIT_PAT})\s*"
    r"(?P<op>>=|<=|==|=|<|>)\s*"
    rf"{_QUAL_PAT}(?:`(?P<qcol>[^`]+)`|(?P<col>\w+))\s*$",
    re.I,
)
# `col IN (lit, lit, …)` — literal lists only; a subquery body fails
# the literal-list regex and the atom contributes nothing
_IN_ATOM = re.compile(
    rf"^\s*{_QUAL_PAT}(?:`(?P<qcol>[^`]+)`|(?P<col>\w+))\s+IN\s*"
    rf"\(\s*(?P<lits>(?:{_LIT_PAT})(?:\s*,\s*(?:{_LIT_PAT}))*)\s*\)\s*$",
    re.I,
)
_IN_LIT_SPLIT = re.compile(rf"{_LIT_PAT}", re.I)
# date-truncating FUNCTION atoms — the spelling SQL users reach for
# first on a timestamp column: `CAST(ts AS DATE) = '2024-01-05'`,
# `to_date(ts) >= DATE'...'`, `year(ts) = 2024`.  DATE/TO_DATE/CAST
# and YEAR are MONOTONIC in the column, so a comparison against a
# literal translates to sound inclusive bounds on the column itself
# (which the hidden-partition machinery then folds onto day/month
# dirs).  month()/day() return month-/day-OF-period — not monotonic —
# and are deliberately absent.
_DATE_FN_HEAD = (
    r"(?:(?P<fn>DATE|TO_DATE|YEAR)\s*\(\s*"
    rf"{_QUAL_PAT}(?:`(?P<qcol>[^`]+)`|(?P<col>\w+))\s*\)"
    r"|CAST\s*\(\s*"
    r"(?:(?:`(?P<cqq>[^`]+)`|(?P<cq>\w+))\s*\.\s*)?"
    r"(?:`(?P<cqcol>[^`]+)`|(?P<ccol>\w+))\s+AS\s+DATE\s*\))"
)
_DATE_FN_ATOM = re.compile(
    rf"^\s*{_DATE_FN_HEAD}\s*"
    r"(?P<op>>=|<=|==|=|<|>)\s*"
    rf"(?P<lit>{_LIT_PAT})\s*$",
    re.I,
)
_DATE_FN_BETWEEN_HEAD = re.compile(
    rf"^\s*{_DATE_FN_HEAD}\s+BETWEEN\s+(?P<lit>{_LIT_PAT})\s*$",
    re.I,
)
# `col LIKE '<pattern>'` — a PREFIX pattern (one trailing %, no other
# wildcards/escapes) implies lexicographic range bounds; a pattern
# with no wildcards at all is an equality
_LIKE_ATOM = re.compile(
    rf"^\s*{_QUAL_PAT}(?:`(?P<qcol>[^`]+)`|(?P<col>\w+))\s+LIKE\s+"
    r"'(?P<pat>[^']*)'\s*$",
    re.I,
)
# first half of a top-level BETWEEN after the AND-split cuts it at
# its own AND: `col BETWEEN lit` then a bare-literal next piece
_BETWEEN_HEAD = re.compile(
    rf"^\s*{_QUAL_PAT}(?:`(?P<qcol>[^`]+)`|(?P<col>\w+))\s+BETWEEN\s+"
    rf"(?P<lit>{_LIT_PAT})\s*$",
    re.I,
)
_BARE_LIT = re.compile(rf"^\s*(?P<lit>{_LIT_PAT})\s*$", re.I)


def _date_fn_range(fn: str | None, lit_s: str):
    """``(bucket_start, bucket_end)`` datetimes of the truncation
    bucket a DATE/TO_DATE/CAST-AS-DATE (fn None/DATE/TO_DATE) or
    YEAR comparison literal names — the inclusive column bounds a
    monotonic-truncation comparison implies; None when the literal
    does not parse as the function's domain."""
    import datetime

    try:
        lit = _parse_atom_literal(lit_s)
    except Exception:
        return None
    if fn is not None and fn.upper() == "YEAR":
        if isinstance(lit, bool) or not isinstance(lit, int):
            return None
        try:
            return (
                datetime.datetime(lit, 1, 1),
                datetime.datetime(lit, 12, 31, 23, 59, 59, 999999),
            )
        except ValueError:
            return None
    if isinstance(lit, str):
        try:
            lit = datetime.date.fromisoformat(lit)
        except ValueError:
            return None
    if isinstance(lit, datetime.datetime):
        lit = lit.date()
    if not isinstance(lit, datetime.date):
        return None
    start = datetime.datetime(lit.year, lit.month, lit.day)
    return (
        start,
        start
        + datetime.timedelta(days=1)
        - datetime.timedelta(microseconds=1),
    )


def _parse_atom_literal(lit_s: str):
    """The comparable Python value of a predicate atom's literal —
    int/float, str, or (typed) datetime/date for TIMESTAMP'…'/DATE'…'
    (ISO bodies; anything unparseable raises and the atom contributes
    no bound)."""
    import datetime

    s = lit_s.strip()
    up = s.upper()
    if up.startswith("TIMESTAMP"):
        return datetime.datetime.fromisoformat(
            s[len("TIMESTAMP"):].strip()[1:-1]
        )
    if up.startswith("DATE"):
        return datetime.date.fromisoformat(
            s[len("DATE"):].strip()[1:-1]
        )
    if s.startswith("'"):
        return s[1:-1]
    return float(s) if "." in s else int(s)


def _condition_profile(
    condition: str, aliases: tuple[str, ...] = ()
) -> tuple[dict[str, tuple], dict[str, list]]:
    """Conservative ``(bounds, points)`` implied by a DML/SQL
    predicate: ``bounds`` is ``{col: (lo, hi)}`` range bounds,
    ``points`` is ``{col: [literals]}`` exact-membership sets (from
    ``=`` and ``IN`` conjuncts — what the Bloom index can probe).
    ONLY top-level AND conjunctions of ``col <op> literal``,
    ``col BETWEEN lit AND lit``, and ``col IN (lit, …)`` atoms
    contribute; any top-level OR/NOT disables everything (a disjunct
    could match rows the other atoms exclude), and any unrecognized
    atom — functions, subqueries, incomparable literal mixes —
    contributes nothing.  A qualifier (``o.col``) is stripped only
    when ``aliases`` vouches for it (SQL front door passes the
    verified table alias); an unverified qualifier could be a struct
    field access, so the atom is skipped.  Strict comparisons bound
    inclusively (sound: pruning may only KEEP extra files, the
    probe's residual predicate decides truth).  This is why the
    format needs no hive partition-column layout: manifest min/max
    stats on a clustered table prune DML probes and reads the way
    partition values would, without freezing one directory key at
    write time."""
    from integritychecksforvldbs_spark.sources.versioned_sql import (
        _find_top,
        _split_top,
    )
    from integritychecksforvldbs_spark.sources.zonemap import _lt

    alias_set = {a.lower() for a in aliases if a}
    bounds: dict[str, tuple] = {}
    points: dict[str, list] = {}

    def _qual_ok(m: re.Match) -> bool:
        qual = m.group("qq") or m.group("q")
        return qual is None or qual.lower() in alias_set

    def _disjunction_points(piece: str):
        """``(col, [literals])`` when ``piece`` is a pure SAME-COLUMN
        disjunction of ``=`` / ``IN`` atoms — ``k = 5 OR k = 7`` is
        the other spelling of an IN-list; None otherwise (any
        non-equality disjunct, a second column, an unverified
        qualifier: the disjunction could admit rows the membership
        set excludes)."""
        col, lits = None, []
        for d in _split_top(piece, r"\bOR\b"):
            d = d.strip()
            while _wrapped_in_one_paren_pair(d):
                d = d[1:-1].strip()
            me = _BOUND_ATOM.match(d)
            if me is not None and me.group("op") in ("=", "=="):
                if not _qual_ok(me):
                    return None
                c = me.group("qcol") or me.group("col")
                try:
                    vals = [_parse_atom_literal(me.group("lit"))]
                except Exception:
                    return None
            else:
                mi = _IN_ATOM.match(d)
                if mi is None or not _qual_ok(mi):
                    return None
                c = mi.group("qcol") or mi.group("col")
                try:
                    vals = [
                        _parse_atom_literal(s)
                        for s in _IN_LIT_SPLIT.findall(mi.group("lits"))
                    ]
                except Exception:
                    return None
            if col is None:
                col = c
            elif col != c:
                return None
            lits += vals
        return (col, lits) if col is not None and lits else None

    def _tighten(col: str, op: str, lit) -> None:
        lo, hi = bounds.get(col, (None, None))
        if op in ("=", "=="):
            lo = lit if lo is None or _stat_lt(lo, lit) else lo
            hi = lit if hi is None or _stat_lt(lit, hi) else hi
        elif op in (">", ">="):
            lo = lit if lo is None or _stat_lt(lo, lit) else lo
        else:  # <, <=
            hi = lit if hi is None or _stat_lt(lit, hi) else hi
        bounds[col] = (lo, hi)

    def _narrow_points(col: str, lits: list) -> None:
        # conjunction: the row must be in EVERY conjunct's set
        if col in points:
            lits = [v for v in lits if any(v == p for p in points[col])]
        points[col] = lits

    def _tighten_from_lits(col: str, lits: list) -> None:
        try:  # min/max only when the literals are comparable
            lo = hi = lits[0]
            for v in lits[1:]:
                if _lt(v, lo):
                    lo = v
                if _lt(hi, v):
                    hi = v
        except TypeError:
            return  # mixed-type list: membership only, no range
        _tighten(col, ">=", lo)
        _tighten(col, "<=", hi)

    # a top-level OR is the one connective that BREAKS the AND-split:
    # by precedence `x OR a AND b` is `x OR (a AND b)`, so the split
    # pieces are not conjuncts and none may contribute.  NOT needs no
    # global disable — it binds tighter than AND, so a NOT-piece is a
    # whole conjunct and skipping it keeps a sound superset (which is
    # also what lets `k >= 5 AND j IS NOT NULL` keep its k bound).
    if _find_top(condition, r"\bOR\b") >= 0:
        # … UNLESS the whole condition is one single-column equality
        # disjunction, which is just an IN-list spelled out
        dp = _disjunction_points(condition)
        if dp is None:
            return {}, {}
        col, lits = dp
        points[col] = lits
        _tighten_from_lits(col, lits)
        return bounds, points

    pieces = _split_top(condition, r"\bAND\b")
    i = 0
    while i < len(pieces):
        piece = pieces[i]
        i += 1
        if piece.strip().startswith("("):
            # a parenthesized conjunct: a same-column equality
            # disjunction — `(k = 5 OR k = 7) AND …` — contributes
            # its membership set; a wrapped CONJUNCTION — `(a AND
            # b) AND …`, the shape an `(ON…) AND (WHERE…)` join
            # profile produces — flattens back into the AND-split
            # (splice-at-i: the sub-conjuncts process next, in order,
            # so a BETWEEN head still sees its tail literal); a
            # merely-wrapped plain atom falls through to the
            # ordinary matching below
            p = piece.strip()
            while _wrapped_in_one_paren_pair(p):
                p = p[1:-1].strip()
            if _find_top(p, r"\bOR\b") >= 0:
                dp = _disjunction_points(p)
                if dp is not None:
                    col, lits = dp
                    _narrow_points(col, lits)
                    _tighten_from_lits(col, lits)
                continue  # an unusable disjunction: nothing
            if _find_top(p, r"\bAND\b") >= 0:
                pieces[i:i] = _split_top(p, r"\bAND\b")
                continue
            if _find_top(p, r"\bNOT\b") >= 0:
                continue  # a negated conjunct contributes nothing
            piece = p
        bt = _BETWEEN_HEAD.match(piece)
        if bt is not None and i < len(pieces):
            nx = _BARE_LIT.match(pieces[i])
            if nx is not None and _qual_ok(bt):
                col = bt.group("qcol") or bt.group("col")
                try:
                    lo = _parse_atom_literal(bt.group("lit"))
                    hi = _parse_atom_literal(nx.group("lit"))
                except Exception:
                    i += 1  # the tail literal is spoken for either way
                    continue
                i += 1
                _tighten(col, ">=", lo)
                _tighten(col, "<=", hi)
                continue
        def _fn_qual_col(fm: re.Match):
            qual = (
                fm.group("qq") or fm.group("q")
                or fm.group("cqq") or fm.group("cq")
            )
            if qual is not None and qual.lower() not in alias_set:
                return None
            return (
                fm.group("qcol") or fm.group("col")
                or fm.group("cqcol") or fm.group("ccol")
            )

        dbt = _DATE_FN_BETWEEN_HEAD.match(piece)
        if dbt is not None and i < len(pieces):
            nx = _BARE_LIT.match(pieces[i])
            if nx is not None:
                col = _fn_qual_col(dbt)
                r1 = _date_fn_range(dbt.group("fn"), dbt.group("lit"))
                r2 = _date_fn_range(dbt.group("fn"), nx.group("lit"))
                i += 1  # the tail literal is spoken for either way
                if col is not None and r1 and r2:
                    _tighten(col, ">=", r1[0])
                    _tighten(col, "<=", r2[1])
                continue
        dfa = _DATE_FN_ATOM.match(piece)
        if dfa is not None:
            col = _fn_qual_col(dfa)
            rng = _date_fn_range(dfa.group("fn"), dfa.group("lit"))
            if col is None or rng is None:
                continue
            start, end = rng
            op = dfa.group("op")
            if op in ("=", "=="):
                _tighten(col, ">=", start)
                _tighten(col, "<=", end)
            elif op in (">", ">="):
                # strict > truly starts at the NEXT bucket; the
                # current bucket's start is a sound superset
                _tighten(col, ">=", start)
            else:  # <, <=
                _tighten(col, "<=", end)
            continue
        lk = _LIKE_ATOM.match(piece)
        if lk is not None:
            if not _qual_ok(lk):
                continue
            col = lk.group("qcol") or lk.group("col")
            pat = lk.group("pat")
            if not any(ch in pat for ch in "%_\\"):
                # no wildcards: LIKE 'abc' ≡ col = 'abc'
                _narrow_points(col, [pat])
                _tighten(col, "=", pat)
            elif (
                pat.endswith("%")
                and len(pat) > 1
                and not any(ch in pat[:-1] for ch in "%_\\")
                and ord(pat[-2]) < 0x10FFFF
            ):
                # prefix match: every hit sorts in [prefix,
                # prefix[:-1] + next-char] (UTF-8 byte order is
                # code-point order, so parquet string stats agree)
                prefix = pat[:-1]
                _tighten(col, ">=", prefix)
                nxt = ord(prefix[-1]) + 1
                if 0xD800 <= nxt <= 0xDFFF:
                    # chr(0xD800) is an unpaired surrogate F.lit
                    # cannot UTF-8-encode; any LARGER char is an
                    # equally sound (just looser) upper bound
                    nxt = 0xE000
                _tighten(col, "<=", prefix[:-1] + chr(nxt))
            continue  # other patterns: no bound from this atom
        mi = _IN_ATOM.match(piece)
        if mi is not None:
            if not _qual_ok(mi):
                continue
            col = mi.group("qcol") or mi.group("col")
            try:
                lits = [
                    _parse_atom_literal(s)
                    for s in _IN_LIT_SPLIT.findall(mi.group("lits"))
                ]
            except Exception:
                continue  # unparseable literal: no bound from it
            if not lits:
                continue
            _narrow_points(col, lits)
            try:  # min/max only when the literals are comparable —
                lo = hi = lits[0]  # a mixed-type list gives no range
                for v in lits[1:]:
                    if _lt(v, lo):
                        lo = v
                    if _lt(hi, v):
                        hi = v
            except TypeError:
                continue
            _tighten(col, ">=", lo)
            _tighten(col, "<=", hi)
            continue
        m = _BOUND_ATOM.match(piece)
        rev = False
        if m is None:
            m = _BOUND_ATOM_REV.match(piece)
            rev = True
        if m is None or not _qual_ok(m):
            continue  # unrecognized atom: no bound from it
        col = m.group("qcol") or m.group("col")
        try:
            lit = _parse_atom_literal(m.group("lit"))
        except Exception:
            continue  # unparseable literal: no bound from this atom
        op = m.group("op")
        if rev:  # literal <op> col  ≡  col <flipped-op> literal
            op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}.get(op, op)
        if op in ("=", "=="):
            _narrow_points(col, [lit])
        _tighten(col, op, lit)
    return (
        {c: b for c, b in bounds.items() if b != (None, None)},
        points,
    )


def _bounds_from_condition(
    condition: str, aliases: tuple[str, ...] = ()
) -> dict[str, tuple]:
    """The range half of :func:`_condition_profile` (kept as the
    stable name every range-pruning consumer imports)."""
    return _condition_profile(condition, aliases)[0]


_NULL_ATOM = re.compile(
    rf"^\s*{_QUAL_PAT}(?:`(?P<qcol>[^`]+)`|(?P<col>\w+))\s+IS\s+"
    r"(?P<neg>NOT\s+)?NULL\s*$",
    re.I,
)


def _null_preds_from_condition(
    condition: str, aliases: tuple[str, ...] = ()
) -> dict[str, bool]:
    """``{col: wants_null}`` for top-level ``col IS [NOT] NULL``
    conjuncts — the third pruning channel next to range bounds and
    membership points: per-file NULL COUNTS ride the stats, so a
    null-scrubbing ``DELETE WHERE col IS NULL`` probes only the
    files that hold a null.  Same conservative algebra (top-level
    OR/NOT disable; unverified qualifiers skip).  ``IS NOT NULL`` is
    distinct from ``NOT``-the-connective: the atom regex claims it
    before the disable check would see it."""
    from integritychecksforvldbs_spark.sources.versioned_sql import (
        _find_top,
        _split_top,
    )

    alias_set = {a.lower() for a in aliases if a}
    # an OR at depth 0 of the WHOLE condition spans the AND-split
    # (precedence): none of the pieces are conjuncts — disable.  An
    # OR inside a parenthesized piece is contained by that conjunct
    # and merely makes the piece contribute nothing.
    if _find_top(condition, r"\bOR\b") >= 0:
        return {}
    out: dict[str, bool] = {}
    pieces = _split_top(condition, r"\bAND\b")
    i = 0
    while i < len(pieces):
        p = pieces[i].strip()
        i += 1
        while _wrapped_in_one_paren_pair(p):
            p = p[1:-1].strip()
        if (
            _find_top(p, r"\bOR\b") < 0
            and _find_top(p, r"\bAND\b") >= 0
        ):
            # a wrapped conjunction — `(a IS NULL AND b = 2)` or a
            # join profile's `(ON…) AND (WHERE…)` — flattens back
            # into the AND-split; an OR-containing piece stays
            # opaque (its atoms are not conjuncts)
            pieces[i:i] = _split_top(p, r"\bAND\b")
            continue
        m = _NULL_ATOM.match(p)
        if m is None:
            continue  # unrecognized conjunct (incl. NOT-…): skipped
        qual = m.group("qq") or m.group("q")
        if qual is not None and qual.lower() not in alias_set:
            continue
        col = m.group("qcol") or m.group("col")
        wants_null = m.group("neg") is None
        if col in out and out[col] != wants_null:
            # col IS NULL AND col IS NOT NULL: unsatisfiable — keep
            # the stricter reading conservative (no special-casing)
            continue
        out[col] = wants_null
    return out


def _stat_lt(a, b) -> bool:
    from integritychecksforvldbs_spark.sources.zonemap import _lt

    try:
        return _lt(a, b)
    except TypeError:
        return False  # incomparable (mixed types): never tightens


def _condition_profiles(
    condition: str, aliases: tuple[str, ...] = ()
) -> list[tuple[dict, dict, dict]] | None:
    """Disjunctive pruning profiles for ``condition``: a list of
    ``(bounds, points, nulls)`` BRANCHES such that every row the
    condition admits satisfies at least one branch — so a file is
    provably dead only when EVERY branch proves it dead, and the
    union of per-branch kept sets is a sound scan.  One branch for a
    pure conjunction (the classic :func:`_condition_profile`); one
    branch per disjunct when a top-level OR splits into disjuncts
    that EACH profile to something — which is what lets the
    anti-range ``k < 5 OR k > 100`` skip a clustered table's middle
    files and the cross-column ``k = 5 OR j = 7`` prune at all
    (both shapes disabled pruning before r13).  Nested ORs flatten
    recursively; any disjunct that profiles empty admits every row,
    so the whole condition returns ``None`` (read unpruned) — the
    contract stays "pruning may only remove provably-dead IO"."""
    from integritychecksforvldbs_spark.sources.versioned_sql import (
        _find_top,
        _split_top,
    )

    bounds, points = _condition_profile(condition, aliases)
    nulls = _null_preds_from_condition(condition, aliases)
    if bounds or points or nulls:
        return [(bounds, points, nulls)]
    if _find_top(condition, r"\bOR\b") < 0:
        return None
    out: list[tuple[dict, dict, dict]] = []
    for d in _split_top(condition, r"\bOR\b"):
        d = d.strip()
        while _wrapped_in_one_paren_pair(d):
            d = d[1:-1].strip()
        sub = _condition_profiles(d, aliases)
        if not sub:
            return None  # this disjunct admits everything
        out.extend(sub)
    return out


def _dml_candidates(
    man: dict,
    condition: str,
    spark: SparkSession | None = None,
) -> list[str] | None:
    """Manifest files a DELETE/UPDATE probe must scan, per the stats
    bounds AND membership sets the condition implies — None when the
    condition yields neither (probe everything).  Best-effort by
    contract: any failure (a literal whose type disagrees with the
    column's stats, exotic stat encodings) degrades to the unpruned
    probe, never to a wrong answer — the probe's own predicate is
    always re-applied."""
    try:
        branches = _condition_profiles(condition)
        if not branches:
            return None
        keep: dict[str, None] = {}
        for bounds, points, nulls in branches:
            kept, _ = _prune_manifest_files(
                man, bounds, points, nulls, spark=spark
            )
            for f in kept:
                keep[f] = None
        return [f for f in man["files"] if f in keep]
    except Exception:
        return None


# fraction of the touched files' live rows above which the auto DML
# strategy prefers rewriting the files over growing deletion vectors:
# a DV read costs an anti-join forever after, so marking most of a
# file dead is worse than materializing the survivors once — the same
# small-change / large-change split Delta draws
DV_MAX_FRACTION = 0.2


def _live_rows_estimate(man: dict, files: list[str]) -> int | None:
    """LIVE row count of ``files`` from manifest metadata alone
    (physical stats minus DV dead counts); None when any file was
    never censused — the caller falls back to counting the scan."""
    stats = man.get("stats") or {}
    dvs = man.get("dvs") or {}
    total = 0
    for f in files:
        ent = stats.get(f)
        if ent is None:
            return None
        total += int(ent["n_rows"])
        if f in dvs:
            total -= int(dvs[f]["n"])
    return total


def _fold_dv_entries(
    path: str, man: dict, ranges_new: dict[str, list[list[int]]]
) -> tuple[set[str], dict[str, dict]]:
    """Turn a DML's per-file dead-position ranges (keyed by CANONICAL
    path, as :func:`~.deletion_vectors.matched_ranges` returns them)
    into commit inputs against snapshot ``man``: each file's new
    ranges union with its existing DV, a file whose union covers every
    physical row is FULLY DEAD (dropped from the file list — no DV
    needed, and vacuum reclaims its bytes), the rest get superseding
    DV artifacts written.  Returns ``(removed_files, add_dvs)``."""
    from integritychecksforvldbs_spark.operators.kernels import (
        _canon_file_path,
    )
    from integritychecksforvldbs_spark.sources.deletion_vectors import (
        merge_ranges,
        ranges_count,
        read_dv_ranges,
        write_dv,
    )

    canon_to_manifest = {_canon_file_path(f): f for f in man["files"]}
    stats = man.get("stats") or {}
    dvs = man.get("dvs") or {}
    removed: set[str] = set()
    add_dvs: dict[str, dict] = {}
    for canon, rs in ranges_new.items():
        mf = canon_to_manifest.get(canon)
        if mf is None:
            continue  # defensive: a path the snapshot does not hold
        old = read_dv_ranges(dvs[mf]) if mf in dvs else []
        union = merge_ranges(old, rs)
        n = ranges_count(union)
        phys = (stats.get(mf) or {}).get("n_rows")
        if phys is not None and n >= int(phys):
            removed.add(mf)
        else:
            add_dvs[mf] = write_dv(path, canon, union)
    return removed, add_dvs


def _use_dv(
    strategy: str,
    n_matched: int,
    live_df: DataFrame,
    man: dict,
    touched: list[str],
) -> bool:
    """Copy-vs-DV decision: explicit strategies win; ``auto`` takes
    the merge-on-read path when the matched rows are a small fraction
    of the touched files' LIVE rows (metadata-only when stats allow,
    one count otherwise)."""
    if strategy == "dv":
        return True
    if strategy == "copy":
        return False
    if strategy != "auto":
        raise ValueError(
            f"strategy must be auto/dv/copy, got {strategy!r}"
        )
    if n_matched == 0:
        return False
    live = _live_rows_estimate(man, touched)
    if live is None:
        live = live_df.count()
    return n_matched <= DV_MAX_FRACTION * live


def _try_dv_ranges(
    strategy: str, matched: DataFrame, fcol: str, rcol: str
) -> dict | None:
    """:func:`~.deletion_vectors.matched_ranges` under its island cap
    (:data:`~.deletion_vectors.DV_MAX_ISLANDS`): the fraction gate in
    :func:`_use_dv` bounds matched COUNT, not fragmentation — a
    scattered every-Nth-row delete can stay under the fraction yet
    fragment into O(matched) islands, which must never all land on the
    driver.  On cap breach ``auto`` returns None (the caller rewrites
    the files copy-on-write — bytes written scale with the touched
    files, driver memory stays O(1)); a user-forced ``"dv"`` surfaces
    :class:`~.deletion_vectors.IslandCapExceeded` instead of silently
    doing something else."""
    from integritychecksforvldbs_spark.sources.deletion_vectors import (
        IslandCapExceeded,
        matched_ranges,
    )

    try:
        return matched_ranges(matched, fcol, rcol)
    except IslandCapExceeded:
        if strategy == "dv":
            raise
        return None


def commit(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "append",
    extra: dict | None = None,
    expected_parent: int | None = None,
    allow_schema_change: bool = False,
    stats_columns: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Write ``df``'s rows as new immutable data files and commit them
    as the table's next version.  Returns the committed version.

    ``append`` makes the new files visible ALONGSIDE the current
    version's; ``overwrite`` replaces the visible set.  Concurrency:
    the version-directory mkdir is the CAS — append losers re-base on
    the winner and retry (appends commute); overwrite losers raise
    ``ConflictError`` once a racing commit lands after the base they
    loaded (overwriting a state you never saw is a lost update, not a
    merge).

    Schema: every manifest records its version's schema (DDL).  An
    APPEND whose schema disagrees with the table's committed schema
    raises :class:`SchemaDriftError` unless ``allow_schema_change``
    — a silent mismatch would surface only at read time, where the
    parquet union null-fills whichever columns the planner's schema
    lacks.  Overwrites replace the schema freely (the visible set is
    replaced wholesale); either way :func:`schema_history` shows the
    evolution.

    ``partition_by`` (LOGICAL column names): hive ``data/col=value/``
    layout with the values folded into the manifest stats (see
    :func:`_write_data`).  Appends inherit the table's partitioning
    when omitted and REFUSE a different one (a mixed-layout snapshot
    cannot be planned as one scan); overwrites may re-partition
    freely — the visible set is replaced wholesale."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append/overwrite, got {mode!r}")
    new_ddl = df.schema.simpleString()
    # column mapping: overwrites start fresh (the visible set — and
    # with it every physical name in play — is replaced wholesale, so
    # they never even read the base); appends inherit the table's
    # mapping, extended/retired for any columns a schema-evolving
    # append introduces or removes
    extra = dict(extra or {})
    mapping, retired = {}, []
    prepared_against = None
    pby_phys: list[str] = []
    if mode == "append":
        cur0 = _latest_committed(path)
        if not allow_schema_change:
            cur_ddl = cur0[1].get("schema") if cur0 else None
            if cur_ddl is not None and cur_ddl != new_ddl:
                raise SchemaDriftError(
                    f"append to {path!r} changes the schema:\n"
                    f"  table: {cur_ddl}\n  append: {new_ddl}\n"
                    "pass allow_schema_change=True to evolve it"
                )
        if cur0 is not None:
            mapping, retired = _evolve_mapping(cur0[1], df.schema)
            extra.setdefault("column_mapping", mapping)
            extra.setdefault("retired_cols", retired)
            # appends inherit the table's partition layout; a caller
            # naming a DIFFERENT one is refused — a snapshot mixing
            # layouts cannot be planned as one basePath scan
            table_pby = _partition_by(cur0[1])
            table_tr = _partition_transforms(cur0[1])
            if partition_by is not None:
                asked, asked_tr = _parse_partition_spec(
                    partition_by, df.schema, mapping
                )
                if asked != table_pby or asked_tr != table_tr:
                    raise ValueError(
                        f"append to {path!r} asked for partitioning "
                        f"{partition_by} but the table is laid out by "
                        f"{table_pby or 'nothing'}; overwrite to "
                        "re-partition"
                    )
            pby_phys, pby_tr = table_pby, table_tr
            # the drift check, the mapping evolution, and the PHYSICAL
            # names just written are all decisions against THIS view —
            # a metadata change racing the commit must conflict, not be
            # silently overwritten by the stale view (see
            # _commit_prepared's prepared_against contract)
            prepared_against = {
                "schema": cur0[1].get("schema"),
                "column_mapping": _mapping(cur0[1]),
                "retired_cols": _retired(cur0[1]),
                "partition_by": table_pby,
            }
        else:
            pby_phys, pby_tr = _parse_partition_spec(
                partition_by or [], df.schema, {}
            )
            # append prepared against an EMPTY table: the files about
            # to be written carry identity physical names and this
            # schema.  If a racing writer installs v1 first, those
            # bytes are only valid beneath an IDENTICAL metadata view
            # — the retry loop must conflict on anything else (before
            # this, the loser re-based and installed its files under
            # the winner's schema/mapping with no drift check at all).
            prepared_against = {
                "schema": new_ddl,
                "column_mapping": {},
                "retired_cols": [],
                "partition_by": pby_phys,
            }
    else:
        # overwrite: fresh layout, fresh (identity) physical names
        pby_phys, pby_tr = _parse_partition_spec(
            partition_by or [], df.schema, {}
        )
    if pby_phys:
        extra.setdefault("partition_by", pby_phys)
    if pby_tr:
        extra.setdefault("partition_transforms", pby_tr)
    new_files, new_stats = _write_data(
        spark, df, path, stats_columns, mapping=mapping,
        partition_by=pby_phys, transforms=pby_tr,
    )

    def _validate(active: dict) -> None:
        _enforce(
            spark, path, active, new_files, df.schema, "commit",
            mapping=mapping,
        )

    v = _commit_prepared(
        path, new_files, new_stats, mode, new_ddl,
        df.schema.jsonValue(), extra=extra,
        expected_parent=expected_parent, validate=_validate,
        prepared_against=prepared_against,
    )
    if mode == "append":
        _auto_refresh_bloom(spark, path)
    return v


def _auto_refresh_bloom(spark: SparkSession, path: str) -> None:
    """Post-append hook: incrementally index the files the commit
    just added, for every Bloom config recorded with ``auto=True``
    (:func:`build_bloom`) — IO pinned to the new files (the carry-over
    never re-reads indexed ones).  Best-effort: the data commit has
    already succeeded and an unindexed file only costs pruning (it is
    always kept), so a refresh failure must never surface as a commit
    failure."""
    try:
        cur = _latest_committed(path)
        if cur is None:
            return
        man = cur[1]
        bloom = man.get("bloom") or {}
        if not any(e.get("auto") for e in bloom.values()):
            return
        inv = {p: lg for lg, p in _mapping(man).items()}
        sch = _manifest_schema(man)
        names = set(sch.fieldNames()) if sch is not None else set()
        for phys, cfg in bloom.items():
            if not cfg.get("auto"):
                continue
            logical = inv.get(phys, phys)
            if logical not in names:
                continue
            build_bloom(
                spark, path, logical,
                int(cfg["n_bits"]), int(cfg["k"]),
            )
    except Exception:
        pass


def _commit_prepared(
    path: str,
    new_files: list[str],
    new_stats: dict,
    mode: str,
    new_ddl: str | None,
    schema_json: dict | None,
    extra: dict | None = None,
    expected_parent: int | None = None,
    validate=None,
    prepared_against: dict | None = None,
) -> int:
    """The COMMIT PROTOCOL half of :func:`commit`, factored off the
    data-writing half: given already-written immutable files, run the
    read-claim-install retry loop against the version log.  Pure
    metadata — no SparkSession — which is what lets the cross-process
    stress tests race the REAL protocol from independent OS processes
    (the isolation the reference's queue actually serves,
    DatabaseIntegrityCheck.sql:1095-1228) without each booting a JVM.
    ``validate`` is called with the ACTIVE constraint map whenever it
    (re)resolves; :func:`commit` binds it to the Spark-side scan of
    the new files.

    ``prepared_against``: the ``(schema, column_mapping,
    retired_cols)`` view the caller computed its drift check, mapping
    evolution, and PHYSICAL file bytes against.  An append commutes
    with racing APPENDS, but a metadata change (ALTER, a
    schema-evolving append) landing mid-commit invalidates those
    decisions — before this check, the loser's re-based retry would
    install its STALE schema/mapping in the new top body and silently
    ERASE the rename (the fold reads only the top body's metadata).
    Now it raises ConflictError, Delta's metadata-changed conflict
    rule; the caller reloads and retries against the new schema."""
    validated_constraints: dict | None = None

    if expected_parent is not None:
        base_v = expected_parent
    else:
        base = _latest_committed(path)
        base_v = base[0] if base else 0
    os.makedirs(_vdir(path), exist_ok=True)
    for _ in range(_MAX_COMMIT_RETRIES):
        cur = _latest_committed(path)
        cur_v = cur[0] if cur else 0
        if mode == "overwrite" and cur_v != base_v:
            raise ConflictError(
                f"overwrite of {path!r} based on v{base_v} conflicts with "
                f"committed v{cur_v}; reload and retry"
            )
        # base manifest and claim number from ONE consistent view: the
        # claim is exactly cur_v+1 (stepping only over verified legacy
        # corpse dirs); a commit landing after the cur read surfaces as
        # a None claim or a lost CAS — both re-base — never as a silent
        # skip-past that would drop the interloper's files (the r7
        # lost-update TOCTOU)
        nxt = _next_claim(path, cur_v)
        if nxt is None:
            continue  # stale view: re-read the log and re-base
        import time

        if prepared_against is not None and cur is not None:
            now_view = {
                "schema": cur[1].get("schema"),
                "column_mapping": _mapping(cur[1]),
                "retired_cols": _retired(cur[1]),
                "partition_by": _partition_by(cur[1]),
            }
            # callers predating the partition key compare without it
            if "partition_by" not in prepared_against:
                now_view.pop("partition_by")
            if now_view != prepared_against:
                raise ConflictError(
                    f"commit to {path!r} raced a schema/mapping change "
                    f"(prepared against {prepared_against['schema']!r}, "
                    f"table is now {now_view['schema']!r} at v{cur_v}); "
                    "reload and retry"
                )
        active = dict(cur[1].get("constraints") or {}) if cur else {}
        if active != validated_constraints:
            # the constraint map changed since (or was never) checked:
            # every data-adding commit must satisfy the ACTIVE map
            if validate is not None:
                validate(active)
            validated_constraints = active
        meta = {
            **(extra or {}),
            "version": nxt,
            "mode": mode,
            "parent": cur_v or None,
            "committed_at": time.time(),
            "constraints": active,
            "schema": new_ddl,
            # the JSON schema form parses WITHOUT a SparkSession
            # (StructType.fromJson is pure Python) — the form
            # the Python Data Source's planner worker, which
            # has no session, must use
            "schema_json": schema_json,
        }
        # the column mapping rides every body the way constraints do:
        # appends inherit the table's (unless the caller evolved it),
        # overwrites reset it (fresh physical names); empty values are
        # pruned so unmapped tables pay zero body bytes
        if mode == "append" and cur is not None:
            meta.setdefault("column_mapping", _mapping(cur[1]))
            meta.setdefault("retired_cols", _retired(cur[1]))
            meta.setdefault("bloom", dict(cur[1].get("bloom") or {}))
            meta.setdefault("partition_by", _partition_by(cur[1]))
            meta.setdefault(
                "partition_transforms", _partition_transforms(cur[1])
            )
            meta.setdefault(
                "partition_spec_history", _partition_spec_history(cur[1])
            )
        for _k in (
            "column_mapping", "retired_cols", "bloom", "partition_by",
            "partition_transforms", "partition_spec_history",
        ):
            if not meta.get(_k):
                meta.pop(_k, None)
        if (
            mode == "append"
            and cur is not None
            and nxt % CHECKPOINT_EVERY != 0
        ):
            # DELTA body: only this commit's additions ride the
            # manifest, on a delta_base chain readers fold — append
            # metadata is O(commit), not O(table-files).  Every
            # CHECKPOINT_EVERY-th version serializes the full folded
            # snapshot so chains stay bounded (the Delta-log
            # add-action + periodic-checkpoint discipline).
            body = {
                **meta,
                "delta_base": cur_v,
                "add_files": new_files,
                "add_stats": new_stats,
            }
        else:
            files = new_files if mode == "overwrite" else (
                (cur[1]["files"] if cur else []) + new_files
            )
            # stats: new files were footer-censused ONCE above; a
            # checkpoint carries the parent's entries forward unread
            # (immutable files, immutable stats)
            if mode == "overwrite" or cur is None:
                stats = new_stats
                dvs = {}
            else:
                stats = {**(cur[1].get("stats") or {}), **new_stats}
                dvs = dict(cur[1].get("dvs") or {})
            body = _full_body(path, nxt, meta, files, stats, dvs)
        installed = _install_manifest(path, nxt, body)
        if installed:
            _write_latest_hint(path, nxt)
            return nxt
        # lost the race — re-base (append) or re-check (overwrite)
    raise ConflictError(
        f"commit to {path!r} lost {_MAX_COMMIT_RETRIES} CAS races; "
        "contention this hot needs a coordinating service"
    )


class ConflictError(RuntimeError):
    """An optimistic commit raced a conflicting committed version."""


class SchemaDriftError(ValueError):
    """An append's schema disagrees with the table's committed schema."""


class ConstraintViolation(ValueError):
    """A commit's rows violate the table's CHECK constraints."""


# ---------------------------------------------------------------------------
# CHECK constraints — commit-time integrity gates
# ---------------------------------------------------------------------------
#
# The reference's whole purpose is INTEGRITY CHECKING of stored data
# (DBCC CHECKDB over committed pages); constraints are the
# prevention-side complement the engine's own tables get: a SQL
# predicate registered on the table that every data-adding commit must
# satisfy, or it refuses to install — Delta's ``ALTER TABLE ADD
# CONSTRAINT`` CHECK semantics (violation = predicate definitively
# FALSE; NULL passes, as in SQL CHECK).  The active map rides every
# manifest body next to the schema, so it versions, time-travels, and
# rolls back with the data it governed.


def _violations(df: DataFrame, constraints: dict[str, str]) -> dict:
    """{name: violating-row count} over ``df``, ONE aggregation pass
    for all constraints (map-side combined, no shuffle of data)."""
    from pyspark.sql import functions as F

    if not constraints:
        return {}
    aggs = [
        F.sum(
            F.when(
                F.coalesce(F.expr(sql), F.lit(True)) == F.lit(False), 1
            ).otherwise(0)
        ).alias(name)
        for name, sql in constraints.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {n: int(row[n] or 0) for n in constraints if (row[n] or 0) > 0}


def _enforce(
    spark: SparkSession,
    path: str,
    constraints: dict[str, str],
    new_files: list[str],
    schema,
    what: str,
    mapping: dict[str, str] | None = None,
) -> None:
    """Refuse ``new_files`` (freshly written, never yet visible) if
    any row violates ``constraints`` — the check scans only the
    commit's own files, O(commit); the refused files stay invisible
    orphans for vacuum.  ``schema`` is LOGICAL; under a column
    mapping the files store physical names, so the scan plans against
    the renamed schema and the frame returns to logical names before
    the (logical-named) constraint predicates evaluate."""
    if not constraints or not new_files:
        return
    # partitioned layout: the files sit under col=value dirs (only
    # partition dirs ever contain '=' under data/) — basePath
    # discovery reinjects the partition columns a constraint may read
    partitioned = "=" in os.path.basename(os.path.dirname(new_files[0]))

    def _rd(sch):
        r = spark.read.schema(sch) if sch is not None else spark.read
        if partitioned:
            r = r.option("basePath", _partition_base(new_files[0]))
        return r.parquet(*new_files)

    if schema is not None and mapping:
        from pyspark.sql.types import StructField, StructType

        phys = StructType(
            [
                StructField(
                    mapping.get(f.name, f.name), f.dataType, True, f.metadata
                )
                for f in schema.fields
            ]
        )
        df = _rd(phys)
        df = _rename_atomic(df, {p: lg for lg, p in mapping.items()})
    elif schema is not None:
        df = _rd(schema)
    else:
        df = _rd(None)
    bad = _violations(df, constraints)
    if bad:
        detail = ", ".join(
            f"{n!r} ({c} rows, CHECK {constraints[n]})"
            for n, c in sorted(bad.items())
        )
        raise ConstraintViolation(
            f"{what} to {path!r} violates table constraints: {detail}"
        )


def constraints(path: str, version: int | None = None) -> dict[str, str]:
    """The CHECK-constraint map active at ``version`` (default:
    latest) — ``{name: sql_predicate}``."""
    return dict(_resolve_manifest(path, version).get("constraints") or {})


def dv_info(path: str, version: int | None = None) -> dict[str, dict]:
    """Deletion-vector entries of a snapshot — ``{data_file: {"path":
    sidecar, "n": dead_rows}}`` (empty for a fully-materialized
    snapshot).  The observability hook DV tests, the table CLI, and
    maintenance policy ("compact when Σn/Σrows crosses X") read."""
    return dict(_resolve_manifest(path, version).get("dvs") or {})


def set_constraints(
    spark: SparkSession, path: str, new: dict[str, str]
) -> int:
    """Replace the table's CHECK-constraint map as a metadata-only
    version (``data_change: false`` — streams skip it; the visible
    file set is untouched).  The EXISTING data is validated against
    the new map first, exactly like Delta's ``ADD CONSTRAINT``: a
    constraint the current rows already violate is refused, otherwise
    every later data-adding commit (append, merge, update) must
    satisfy it or fail with :class:`ConstraintViolation`.  Pass ``{}``
    to drop all constraints."""
    for _ in range(_MAX_COMMIT_RETRIES):
        cur = _latest_committed(path)
        if cur is None:
            raise FileNotFoundError(f"no committed version under {path!r}")
        base_v, man = cur
        if new and man["files"]:
            # validate the LIVE rows: positions a deletion vector
            # already killed are not part of the table's data
            bad = _violations(_scan_live(spark, man), new)
            if bad:
                detail = ", ".join(
                    f"{n!r} ({c} rows)" for n, c in sorted(bad.items())
                )
                raise ConstraintViolation(
                    f"existing rows of {path!r} violate: {detail}; "
                    "clean the data before adding the constraint"
                )
        v = _commit_replace(
            path, base_v, man, set(), [], {},
            mode="set_constraints", data_change=False,
            extra={"constraints": dict(new)},
        )
        if v is not None:
            return v
        # a commit raced the validation: re-validate against it
    raise ConflictError(
        f"set_constraints on {path!r} lost {_MAX_COMMIT_RETRIES} races"
    )


# ---------------------------------------------------------------------------
# ALTER TABLE — metadata-only schema evolution (ADD/RENAME/DROP COLUMN)
# ---------------------------------------------------------------------------


def _refs_column(sql: str, name: str) -> bool:
    """True when ``sql`` references ``name`` as a bare or backquoted
    identifier outside string literals (case-insensitive, the
    resolution rule Spark applies)."""
    out, i, n = [], 0, len(sql)
    while i < n:  # blank out single-quoted string literals
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n and sql[j] != "'":
                j += 1
            out.append(" " * (j + 1 - i))
            i = j + 1
        else:
            out.append(ch)
            i += 1
    bare = "".join(out)
    pat = re.compile(
        rf"(?<![\w.`])(?:`{re.escape(name)}`|{re.escape(name)})(?![\w`])",
        re.IGNORECASE,
    )
    return pat.search(bare) is not None


def _refusing_constraints(man: dict, name: str) -> list[str]:
    return sorted(
        n for n, sql in (man.get("constraints") or {}).items()
        if _refs_column(sql, name)
    )


def _alter(path: str, mode: str, transform) -> int:
    """CAS retry loop shared by the ALTER COLUMN family: a
    metadata-only commit (``data_change: false``, empty file swap)
    whose body carries the transformed schema + column mapping.
    ``transform(man, schema) -> (new_schema, mapping, retired)``."""
    for _ in range(_MAX_COMMIT_RETRIES):
        cur = _latest_committed(path)
        if cur is None:
            raise FileNotFoundError(f"no committed version under {path!r}")
        base_v, man = cur
        sch = _manifest_schema(man)
        if sch is None:
            raise ValueError(
                f"{path!r} predates schema recording; rewrite it "
                "(optimize/compact) before ALTER"
            )
        out = transform(man, sch)
        new_sch, mapping, retired = out[:3]
        extra = {
            "schema": new_sch.simpleString(),
            "schema_json": new_sch.jsonValue(),
            "column_mapping": mapping,
            "retired_cols": retired,
        }
        if len(out) > 3 and out[3]:
            extra.update(out[3])
        v = _commit_replace(
            path, base_v, man, set(), [], {},
            mode=mode, data_change=False, extra=extra,
        )
        if v is not None:
            return v
    raise ConflictError(f"{mode} on {path!r} lost every CAS race")


def add_column(path: str, name: str, dtype) -> int:
    """``ALTER TABLE ADD COLUMN``: a metadata-only commit appending a
    nullable column to the schema — existing files null-fill it on
    read (the additive-evolution contract), O(0) data IO.  If the
    name was ever dropped from this table, the new column binds a
    FRESH physical name, so the old bytes never resurrect.  ``dtype``
    is a :class:`~pyspark.sql.types.DataType` or a DDL string (the
    string form needs an active SparkSession to parse)."""
    from pyspark.sql.types import DataType, StructField, StructType

    if isinstance(dtype, str):
        from pyspark.sql.types import _parse_datatype_string

        dtype = _parse_datatype_string(dtype)
    if not isinstance(dtype, DataType):
        raise TypeError(f"dtype must be a DataType or DDL string: {dtype!r}")

    def _tr(man, sch):
        if any(f.name.lower() == name.lower() for f in sch.fields):
            raise ValueError(f"column {name!r} already exists in {path!r}")
        m = _mapping(man)
        retired = _retired(man)
        taken = {r.lower() for r in retired} | {
            m.get(f.name, f.name).lower() for f in sch.fields
        }
        p = _fresh_physical(name, taken)
        if p != name:
            m[name] = p
        new_sch = StructType(
            list(sch.fields) + [StructField(name, dtype, True)]
        )
        return new_sch, m, retired

    return _alter(path, f"alter(add {name})", _tr)


def rename_column(path: str, old: str, new: str) -> int:
    """``ALTER TABLE RENAME COLUMN``: metadata-only — the data files
    keep the column under its physical name forever; the manifest's
    column mapping binds the new logical name to it.  Refused while a
    CHECK constraint references the old name (drop or rewrite the
    constraint first — silently re-pointing a predicate is how a
    governance rule stops meaning what its author wrote)."""
    from pyspark.sql.types import StructField, StructType

    def _tr(man, sch):
        names = {f.name.lower() for f in sch.fields}
        if old.lower() not in names:
            raise ValueError(f"no column {old!r} in {path!r}")
        if new.lower() in names:
            raise ValueError(f"column {new!r} already exists in {path!r}")
        refs = _refusing_constraints(man, old)
        if refs:
            raise ValueError(
                f"cannot rename {old!r}: CHECK constraint(s) "
                f"{refs} reference it; drop them first"
            )
        m = _mapping(man)
        phys = m.pop(old, old)
        if phys != new:
            m[new] = phys
        new_sch = StructType(
            [
                StructField(new, f.dataType, True, f.metadata)
                if f.name.lower() == old.lower()
                else f
                for f in sch.fields
            ]
        )
        return new_sch, m, _retired(man)

    return _alter(path, f"alter(rename {old} to {new})", _tr)


def drop_column(path: str, name: str) -> int:
    """``ALTER TABLE DROP COLUMN``: metadata-only — the physical
    column stays in the immutable files but leaves the schema, and
    its physical name is RETIRED so a later ADD of the same name can
    never read the orphaned bytes.  Time travel to pre-drop versions
    still sees the column (their manifests kept it)."""
    from pyspark.sql.types import StructType

    def _tr(man, sch):
        if not any(f.name.lower() == name.lower() for f in sch.fields):
            raise ValueError(f"no column {name!r} in {path!r}")
        if len(sch.fields) == 1:
            raise ValueError(f"cannot drop the only column of {path!r}")
        refs = _refusing_constraints(man, name)
        if refs:
            raise ValueError(
                f"cannot drop {name!r}: CHECK constraint(s) "
                f"{refs} reference it; drop them first"
            )
        phys0 = _mapping(man).get(name, name)
        tr_srcs = {
            t["src"] for t in _partition_transforms(man).values()
        }
        if phys0 in _partition_by(man) or phys0 in tr_srcs:
            raise ValueError(
                f"cannot drop {name!r}: the table is partitioned by "
                "it — overwrite with a new layout first"
            )
        m = _mapping(man)
        retired = _retired(man)
        phys = m.pop(name, name)
        if phys.lower() not in {r.lower() for r in retired}:
            retired.append(phys)
        new_sch = StructType(
            [f for f in sch.fields if f.name.lower() != name.lower()]
        )
        # a Bloom index on the dropped column dies with it (its dir
        # stays until vacuum ages it out, like any superseded build)
        bloom = dict(man.get("bloom") or {})
        bloom.pop(phys, None)
        return new_sch, m, retired, {"bloom": bloom}

    return _alter(path, f"alter(drop {name})", _tr)


# ---------------------------------------------------------------------------
# Bloom point-probe pruning — equality predicates on unclustered columns
# ---------------------------------------------------------------------------
#
# Manifest min/max stats prune RANGE predicates on value-clustered
# layouts, but say nothing for ``col = v`` on a high-cardinality column
# the table is not sorted by — the GDPR-erasure shape ("delete this
# user id") that at 100 TB otherwise probes every file.  build_bloom
# adds the standard companion (Delta's bloom indexes, ORC bloom
# streams) at the TABLE-FORMAT level: one bitset per (data file,
# column), built in one distributed pass over only the not-yet-indexed
# files (data files are immutable, so bitsets are too — a rebuild
# carries them over), persisted as a parquet sidecar under
# ``{table}/bloom/`` and pointed at by the manifest, so the index
# versions/clones/travels with the snapshot.  DML probes and
# equality ``read_where`` then skip every file whose bitset provably
# lacks the literal; files the index predates are always kept, and any
# probe failure degrades to the unpruned scan — correctness never
# depends on the index.  Configs key by PHYSICAL column name, so the
# index survives ALTER RENAME like the stats do.

BLOOM_N_BITS_DEFAULT = 1 << 17  # 16 KiB/bitset: ~1% fpp at ~15k distinct
BLOOM_K_DEFAULT = 5


def _bloom_root(path: str) -> str:
    return os.path.join(_local(path), "bloom")


def _carry_over_index(
    spark: SparkSession, prev: DataFrame, live: set[str]
) -> tuple[DataFrame, set[str]]:
    """``(carried, indexed)`` for an incremental Bloom refresh: the
    rows of the previous index whose file is still live, and those
    files' canonical paths (so the caller indexes only the rest).
    The still-live filter is a BROADCAST SEMI-JOIN against a
    one-column frame of the kept paths — never an ``isin`` literal
    list, which at ~1M files would plant a ~100 MB In-expression in
    one plan (the r11 verdict's plan-bloat finding; same family as
    the r10 driver-bitset collect).  The path collect itself is the
    audited bounded pattern: one string per file, metadata-plane."""
    from pyspark.sql import functions as F

    from integritychecksforvldbs_spark.operators.kernels import (
        _canon_file_path,
    )

    old_files = [
        r["file"] for r in prev.select("file").distinct().collect()
    ]
    keep = [f for f in old_files if _canon_file_path(f) in live]
    keep_df = spark.createDataFrame(
        [(f,) for f in keep], "file string"
    )
    carried = prev.join(F.broadcast(keep_df), "file", "left_semi")
    return carried, {_canon_file_path(f) for f in keep}


def build_bloom(
    spark: SparkSession,
    path: str,
    column: str,
    n_bits: int = BLOOM_N_BITS_DEFAULT,
    k: int = BLOOM_K_DEFAULT,
    auto: bool | None = None,
) -> int:
    """Build (or incrementally refresh) the table's Bloom index for
    ``column`` over the CURRENT snapshot and record it in a
    metadata-only commit.  Returns the committed version.  Files the
    previous build already indexed carry their bitsets over unread
    (immutable files, immutable bitsets); changing ``n_bits``/``k``
    forces a full rebuild.

    ``auto=True`` records the config as self-refreshing: every later
    :func:`commit` APPEND runs the incremental refresh over just the
    files it added (r10 verdict gap #3 — without it, point-probe
    pruning silently decayed on hot append tables until a manual
    re-run); ``auto=False`` turns it off, ``None`` (default) keeps the
    existing setting across refreshes.  DML rewrites stay
    refresh-on-demand: their new files are simply unindexed (always
    kept — sound, never wrong) until the next append or manual
    build."""
    from pyspark.sql import functions as F

    from integritychecksforvldbs_spark.operators.kernels import (
        _canon_file_path,
    )
    from integritychecksforvldbs_spark.sources.bloomskip import (
        _positions_expr,
    )

    cur = _latest_committed(path)
    if cur is None:
        raise FileNotFoundError(f"no committed version under {path!r}")
    base_v, man = cur
    sch = _manifest_schema(man)
    if sch is None or column not in sch.fieldNames():
        raise ValueError(f"no column {column!r} in {path!r}")
    phys = _mapping(man).get(column, column)
    old = (man.get("bloom") or {}).get(phys)
    carried = None
    indexed: set[str] = set()
    if (
        old is not None
        and int(old["n_bits"]) == int(n_bits)
        and int(old["k"]) == int(k)
    ):
        try:
            prev = spark.read.parquet(old["index"])
            live = {_canon_file_path(f) for f in man["files"]}
            carried, indexed = _carry_over_index(spark, prev, live)
        except Exception:
            carried, indexed = None, set()
    todo = [
        f for f in man["files"] if _canon_file_path(f) not in indexed
    ]
    parts = []
    if todo:
        raw = _scan_files(spark, man, todo, mapped=False)
        fresh = (
            raw.select(
                F.input_file_name().alias("file"),
                F.col(phys).alias("__v"),
            )
            .where(F.col("__v").isNotNull())
            .dropDuplicates(["file", "__v"])
            .select(
                "file",
                F.explode(
                    _positions_expr("__v", int(n_bits), int(k))
                ).alias("p"),
            )
            .groupBy("file")
            .agg(F.collect_set("p").alias("bits"))
            .select(
                "file",
                "bits",
                F.lit(int(n_bits)).alias("n_bits"),
                F.lit(int(k)).alias("k"),
            )
        )
        parts.append(fresh)
    if carried is not None:
        parts.append(
            carried.select("file", "bits", "n_bits", "k")
        )
    if not parts:
        raise ValueError(f"{path!r} has no files to index")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    index_dir = os.path.join(_bloom_root(path), uuid.uuid4().hex[:12])
    # the index is metadata-scale (one row per file): keep it compact
    out.coalesce(8).write.parquet(index_dir)
    entry = {"index": index_dir, "n_bits": int(n_bits), "k": int(k)}
    want_auto = bool(old.get("auto")) if (
        auto is None and old is not None
    ) else bool(auto)
    if want_auto:
        entry["auto"] = True
    for _ in range(_MAX_COMMIT_RETRIES):
        cur = _latest_committed(path)
        if cur is None:
            raise FileNotFoundError(f"no committed version under {path!r}")
        base_v, man = cur
        # racing appends may have added files the index predates —
        # they are simply unindexed (always kept by the probe)
        new_bloom = {**(man.get("bloom") or {}), phys: entry}
        v = _commit_replace(
            path, base_v, man, set(), [], {},
            mode=f"bloom({column})", data_change=False,
            extra={"bloom": new_bloom},
        )
        if v is not None:
            return v
    raise ConflictError(f"build_bloom on {path!r} lost every CAS race")


# the exact-membership atoms of a conjunctive DML predicate:
# `col = literal` and `col IN (literal, …)`
def _eq_literals_from_condition(
    condition: str, aliases: tuple[str, ...] = ()
) -> dict[str, list]:
    """``{col: [literals]}`` for the top-level ``col = lit`` /
    ``col IN (…)`` conjuncts of a DML predicate — the membership half
    of :func:`_condition_profile` (same conservative algebra: OR/NOT
    disable it, unrecognized atoms contribute nothing).  An IN-list
    probes the Bloom index as a per-literal union: a file is prunable
    only when EVERY literal is provably absent."""
    return _condition_profile(condition, aliases)[1]


def _bloom_prune_files(
    spark: SparkSession,
    man: dict,
    eq: dict[str, list],
    files: list[str],
) -> list[str]:
    """``files`` minus those the manifest's Bloom index proves cannot
    contain the probed equalities — ``eq`` maps each column to the
    list of literals the predicate allows (one for ``=``, several for
    ``IN``), and a file survives if ANY literal might be present.
    Best-effort by contract: columns without an index (or with an
    empty literal list — the range bounds already handle
    unsatisfiable conjunctions) contribute nothing, unindexed files
    are kept, and ANY failure returns ``files`` unpruned — the
    probe's own predicate always re-applies."""
    bloom = man.get("bloom") or {}
    if not bloom or not eq or not files:
        return files
    try:
        from pyspark.sql import functions as F

        from integritychecksforvldbs_spark.operators.kernels import (
            _canon_file_path,
            _canon_file_path_expr,
        )
        from integritychecksforvldbs_spark.sources.bloomskip import (
            _probe_positions,
        )

        sch = _manifest_schema(man)
        if sch is None:
            return files
        m = _mapping(man)
        kept = list(files)
        for col, values in eq.items():
            if not isinstance(values, (list, tuple)):
                values = [values]  # scalar callers mean a singleton
            if col not in sch.fieldNames() or not values:
                continue
            cfg = bloom.get(m.get(col, col))
            if cfg is None or not kept:
                continue
            dtype = sch[col].dataType
            probes = [
                _probe_positions(
                    spark, v, dtype, int(cfg["n_bits"]), int(cfg["k"])
                )
                for v in values
            ]
            idx = spark.read.parquet(cfg["index"])
            # the membership test runs DISTRIBUTED over the
            # metadata-sized index (one row per file) and the driver
            # collects only the paths whose bitset PROVABLY lacks the
            # probe — never a bitset (a 131k-int array per file; at
            # 10k files that was tens of GB of Python sets on the
            # driver, the r10 verdict's #1 scale finding).  Files
            # without an index row are never pruned; index rows for
            # retired files land harmlessly in the prunable set.
            # prunable ⟺ EVERY allowed literal is provably absent
            # (some probe position missing from the file's bitset) —
            # the per-literal union the IN-list semantics demand
            absent = None
            for probe in probes:
                probe_arr = F.array(*[F.lit(int(p)) for p in probe])
                miss = (
                    F.size(F.array_except(probe_arr, F.col("bits"))) > 0
                )
                absent = miss if absent is None else (absent & miss)
            prunable = {
                r["cfile"]
                for r in idx.select(
                    _canon_file_path_expr(F.col("file")).alias("cfile"),
                    "bits",
                )
                .where(absent)
                .select("cfile")
                .collect()
            }
            kept = [
                f for f in kept if _canon_file_path(f) not in prunable
            ]
        return kept
    except Exception:
        return files


def _probe_candidates(
    spark: SparkSession, man: dict, condition: str
) -> list[str] | None:
    """The files a DELETE/UPDATE probe must scan: manifest-stats range
    pruning (:func:`_dml_candidates`) narrowed further by the Bloom
    index on equality atoms.  None = no pruning applies (probe the
    whole visible set)."""
    cand = _dml_candidates(man, condition, spark=spark)
    eq = {}
    try:
        eq = _eq_literals_from_condition(condition)
    except Exception:
        pass
    if not eq or not (man.get("bloom") or {}):
        return cand
    base = man["files"] if cand is None else cand
    return _bloom_prune_files(spark, man, eq, base)


def read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp: float | None = None,
) -> DataFrame:
    """The table AS OF ``version`` — or AS OF ``timestamp`` (epoch
    seconds, resolved via :func:`version_at`; mutually exclusive with
    ``version``) — defaulting to the latest committed.  The
    file list is resolved from the manifest BEFORE the scan plans, so
    the returned frame is a consistent snapshot — commits landing
    afterwards are invisible to it (and ``vacuum`` retains every
    manifested file, so the snapshot stays readable).

    The scan is planned against the MANIFEST's recorded schema, not a
    sampled file's: after a schema-evolving append the visible set
    mixes file schemas, and letting the reader pick one file's schema
    would silently drop the evolved columns from some plans — with
    the declared schema, files missing a column null-fill it, the
    standard additive-evolution read."""
    from integritychecksforvldbs_spark.sources.loader import load_table

    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = version_at(path, timestamp)
    if version is None:
        cur = _latest_committed(path)
        if cur is None:
            raise FileNotFoundError(f"no committed version under {path!r}")
        man = cur[1]
    else:
        man = _snapshot(path, version)
        if man is None:
            raise FileNotFoundError(f"version {version} of {path!r} not found")
    if not man["files"]:
        raise ValueError(f"version {man['version']} of {path!r} is empty")
    if man.get("dvs"):
        # merge-on-read: the live view (clean files untouched, DV'd
        # files inline-filtered or anti-joined — see _scan_live)
        return _scan_live(spark, man)
    return _scan_files(spark, man)


def _resolve_manifest(path: str, version: int | None) -> dict:
    """Folded snapshot view of ``version`` (latest when None)."""
    if version is None:
        cur = _latest_committed(path)
        if cur is None:
            raise FileNotFoundError(f"no committed version under {path!r}")
        return cur[1]
    man = _snapshot(path, version)
    if man is None:
        raise FileNotFoundError(f"version {version} of {path!r} not found")
    return man


def row_count(
    spark: SparkSession, path: str, version: int | None = None
) -> int:
    """``COUNT(*)`` of a snapshot answered from MANIFEST STATS — no
    data file is opened (the Iceberg/Delta metadata-only count).
    Files a legacy manifest never censused fall back to one footer
    read each (metadata IO, executor-distributed past the usual
    listing size); the data pages are never touched either way."""
    man = _resolve_manifest(path, version)
    stats = man.get("stats") or {}
    total = 0
    missing = []
    for f in man["files"]:
        ent = stats.get(f)
        if ent is not None:
            total += int(ent["n_rows"])
        else:
            missing.append(f)
    if missing:
        from integritychecksforvldbs_spark.sources.catalog import (
            DRIVER_SIDE_FOOTER_LIMIT,
        )

        def _n(p: str) -> int:
            import pyarrow.parquet as pq

            local = p[len("file:"):] if p.startswith("file:") else p
            return int(pq.ParquetFile(local).metadata.num_rows)

        if len(missing) <= DRIVER_SIDE_FOOTER_LIMIT:
            total += sum(_n(p) for p in missing)
        else:
            sc = spark.sparkContext
            slices = min(len(missing), sc.defaultParallelism * 2)
            total += sc.parallelize(missing, slices).map(_n).sum()
    # merge-on-read: physical rows minus the deletion vectors' dead
    # counts (recorded in the manifest entry — still no data-file IO)
    total -= sum(int(e["n"]) for e in (man.get("dvs") or {}).values())
    return total


def stats_summary(
    path: str, columns: list[str], version: int | None = None
) -> dict[str, dict]:
    """Table-level ``{col: {"min", "max", "n_nulls", "ok"}}`` folded
    from the manifest's per-file stats — the profile a planner (or an
    operator deciding broadcast-ability) wants without a scan.
    ``ok=False`` when ANY visible file lacks trustworthy stats for the
    column: the folded bounds are then only what the censused subset
    proves, never presented as table truth.  Stats are PHYSICAL-file
    facts: on a snapshot with deletion vectors they include the dead
    rows, so min/max/null counts are conservative envelopes of the
    live data (exactly Delta's stance) — pruning stays sound, exact
    aggregates come from the live scan."""
    from integritychecksforvldbs_spark.sources.zonemap import _lt

    man = _resolve_manifest(path, version)
    stats = man.get("stats") or {}
    m = _mapping(man)  # callers ask in LOGICAL names; stats key physical
    out: dict[str, dict] = {}
    for c in columns:
        vmin = vmax = None
        n_nulls = 0
        ok = True
        for f in man["files"]:
            ent = (stats.get(f) or {}).get("cols", {}).get(m.get(c, c))
            if ent is None or not ent["ok"]:
                ok = False
                continue
            if ent["min"] is None:
                continue  # empty file: contributes no values
            lo, hi = _dec_stat(ent["min"]), _dec_stat(ent["max"])
            vmin = lo if vmin is None or _lt(lo, vmin) else vmin
            vmax = hi if vmax is None or _lt(vmax, hi) else vmax
            n_nulls += int(ent["nulls"])
        out[c] = {"min": vmin, "max": vmax, "n_nulls": n_nulls, "ok": ok}
    return out


def _same_stat_kind(a, b) -> bool:
    """Whether a stat value and a predicate literal compare by VALUE
    identity (same family) — a point-membership prune must never fire
    across a type family (Spark would CAST ``'5' = 5`` to a match;
    Python ``'5' == 5`` is False, which would wrongly kill the
    file)."""
    import datetime
    import decimal

    num = (int, float, decimal.Decimal)
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    if isinstance(a, num) and isinstance(b, num):
        return True
    if isinstance(a, datetime.datetime) or isinstance(
        b, datetime.datetime
    ):  # datetime is a date subclass: check it first
        return isinstance(a, datetime.datetime) and isinstance(
            b, datetime.datetime
        )
    for t in (str, datetime.date):
        if isinstance(a, t) and isinstance(b, t):
            return True
    return False


# file count past which the stats prune runs as a distributed
# metadata job instead of the driver loop (Iceberg-scale manifests:
# ~1M files × several conjuncts is seconds of serial driver CPU)
_PRUNE_DISTRIBUTED_MIN_FILES = 50_000


def _prune_manifest_files(
    man: dict,
    bounds: dict[str, tuple],
    points: dict[str, list] | None = None,
    nulls: dict[str, bool] | None = None,
    spark: SparkSession | None = None,
) -> tuple[list[str], list[str]]:
    """(kept, skipped) under a conjunction of range predicates
    ``{col: (lo, hi)}`` (either end ``None`` = open) and optional
    exact-membership sets ``{col: [literals]}``: a file is skipped
    only when its manifest stats PROVE no row can match; files
    without trustworthy stats are always kept — correctness never
    depends on stats, they only remove provably-dead IO.

    Membership sets prune a file whose stats pin the column to ONE
    exact value (min == max — partition-dir values are folded in
    exactly this shape) not in the set: ``priority IN ('1-URGENT',
    '5-LOW')`` keeps two partition dirs even though its (lo, hi)
    envelope spans all five.  Same-type-family guarded (see
    :func:`_same_stat_kind`).

    ``nulls`` (``{col: wants_null}``) prunes by the per-file null
    COUNTS: ``col IS NULL`` skips files censused with zero nulls,
    ``col IS NOT NULL`` skips all-null files — both physical counts,
    so deletion vectors (which only remove rows) cannot unsound
    them."""
    stats = man.get("stats") or {}
    m = _mapping(man)  # stats are keyed by PHYSICAL name
    points = {c: list(v) for c, v in (points or {}).items() if v}
    # history first so a re-activated dir name reads its ACTIVE spec
    transforms = {
        **_partition_spec_history(man),
        **_partition_transforms(man),
    }
    if transforms:
        # hidden partitioning: a bound on a transform's SOURCE column
        # implies a bound on the dir value (every supported transform
        # is monotonic), and the dir values are folded into the stats
        # — so `WHERE ts BETWEEN a AND b` prunes day-partition dirs
        # the query never mentions (Iceberg's contract).  Membership
        # sets translate too — per-literal — which is what prunes an
        # IN over a bucket key to the union of its buckets
        extra_bounds = {}
        extra_points = {}
        for dcol, tr in transforms.items():
            mono = tr.get("fn") in _MONOTONIC_TRANSFORMS
            for c, (lo, hi) in bounds.items():
                if m.get(c, c) != tr["src"]:
                    continue
                if not mono:
                    # bucket: the hash is NOT monotonic — only a
                    # POINT predicate names one dir; a range keeps
                    # every bucket (documented, Iceberg's contract)
                    if lo is None or lo != hi:
                        continue
                try:
                    extra_bounds[dcol] = (
                        _transform_value(tr, lo),
                        _transform_value(tr, hi),
                    )
                except Exception:
                    continue  # untranslatable literal: no extra prune
            for c, lits in points.items():
                if m.get(c, c) != tr["src"]:
                    continue
                try:
                    extra_points[dcol] = [
                        _transform_value(tr, v) for v in lits
                    ]
                except Exception:
                    continue
        if extra_bounds:
            bounds = {**bounds, **extra_bounds}
        if extra_points:
            points = {**points, **extra_points}
    if (
        spark is not None
        and len(man["files"]) >= _PRUNE_DISTRIBUTED_MIN_FILES
    ):
        return _prune_manifest_files_distributed(
            spark, man, stats, m, bounds, points, nulls
        )
    kept, skipped = [], []
    for f in man["files"]:
        fent = stats.get(f) or {}
        dead = _file_is_dead(
            fent.get("cols", {}),
            fent.get("n_rows"),
            m,
            bounds,
            points,
            nulls,
        )
        (skipped if dead else kept).append(f)
    return kept, skipped


def _file_is_dead(
    fcols: dict,
    n_rows,
    m: dict,
    bounds: dict[str, tuple],
    points: dict[str, list],
    nulls: dict[str, bool] | None,
) -> bool:
    """One file's provably-dead verdict from its stat entry — the
    pure per-file kernel of :func:`_prune_manifest_files`, factored
    out so the distributed path evaluates EXACTLY the same code on
    executors (no Spark-expression re-derivation to drift)."""
    for c, (lo, hi) in bounds.items():
        ent = fcols.get(m.get(c, c))
        if ent is None or not ent["ok"]:
            continue
        if ent["min"] is None:
            return True  # empty file: no row can match anything
        vmin, vmax = _dec_stat(ent["min"]), _dec_stat(ent["max"])
        # _stat_lt, NOT the raw zonemap._lt: a bound whose type
        # disagrees with the column's stats (a date-fn atom over a
        # STRING date column) must read unpruned, never raise —
        # the contract is "unboundable predicates merely keep the
        # file"
        if (lo is not None and _stat_lt(vmax, lo)) or (
            hi is not None and _stat_lt(hi, vmin)
        ):
            return True
    for c, lits in (points or {}).items():
        ent = fcols.get(m.get(c, c))
        if ent is None or not ent["ok"]:
            continue
        if ent["min"] is None:
            return True
        vmin, vmax = _dec_stat(ent["min"]), _dec_stat(ent["max"])
        try:
            if (
                vmin == vmax
                and all(_same_stat_kind(vmin, v) for v in lits)
                and all(vmin != v for v in lits)
            ):
                return True
        except Exception:
            continue  # exotic values: never prune on doubt
    for c, wants_null in (nulls or {}).items():
        ent = fcols.get(m.get(c, c))
        # deliberately NOT gated on ent["ok"]: an all-null
        # column has no min/max (ok=False) but a trustworthy
        # null count — nulls_ok is this channel's own flag
        if ent is None or not ent.get("nulls_ok"):
            continue
        n_nulls = int(ent.get("nulls") or 0)
        if wants_null and n_nulls == 0:
            return True  # IS NULL: the file holds no null
        if (
            not wants_null
            and n_rows is not None
            and n_nulls >= int(n_rows)
        ):
            return True  # IS NOT NULL: every row is null
    return False


def _prune_manifest_files_distributed(
    spark: SparkSession,
    man: dict,
    stats: dict,
    m: dict,
    bounds: dict[str, tuple],
    points: dict[str, list],
    nulls: dict[str, bool] | None,
) -> tuple[list[str], list[str]]:
    """The executor-side twin of the driver stats loop for manifests
    past :data:`_PRUNE_DISTRIBUTED_MIN_FILES`: the per-file stat
    entries stream through an Arrow-batched ``mapInPandas`` running
    the SAME :func:`_file_is_dead` kernel (the typed profile rides
    the closure), and only the PRUNABLE paths come back to the
    driver — the manifest-planning pattern Iceberg distributes the
    same way.  At ~1M files this turns seconds of serial driver CPU
    per conjunct into one short metadata job."""
    import json as _json

    rows = [(f, _json.dumps(stats.get(f) or {})) for f in man["files"]]
    df = spark.createDataFrame(rows, "path string, stats string")

    def _part(batches):
        import pandas as pd

        for pdf in batches:
            dead = []
            for s in pdf["stats"]:
                fent = _json.loads(s)
                dead.append(
                    _file_is_dead(
                        fent.get("cols", {}),
                        fent.get("n_rows"),
                        m,
                        bounds,
                        points,
                        nulls,
                    )
                )
            out = pdf[["path"]][pd.Series(dead, index=pdf.index)]
            yield out

    n_part = min(64, len(rows) // 25_000 + 1)
    dead_set = {
        r.path
        for r in df.repartition(n_part).mapInPandas(
            _part, "path string"
        ).collect()
    }
    kept = [f for f in man["files"] if f not in dead_set]
    skipped = [f for f in man["files"] if f in dead_set]
    return kept, skipped


def read_where(
    spark: SparkSession,
    path: str,
    bounds: dict[str, tuple],
    version: int | None = None,
    points: dict[str, list] | None = None,
    nulls: dict[str, bool] | None = None,
) -> DataFrame:
    """:func:`read` with manifest-stats file skipping: plan the scan
    over only the files whose stats admit a match for EVERY range in
    ``bounds`` (``{col: (lo, hi)}``, either end ``None`` = open), then
    re-apply the predicate as an ordinary residual filter — Catalyst
    still pushes it into the surviving scans' row groups, and the
    answer is identical to filtering :func:`read` (test-pinned); the
    stats only delete provably-dead file IO before the plan exists.
    At 100 TB on a clustered layout (see :func:`optimize`) this is the
    difference between opening 2% and 100% of a snapshot's objects.

    ``points`` optionally declares exact-membership sets
    (``{col: [literals]}`` — the caller guarantees the true predicate
    implies ``col IN literals``): they probe the Bloom index as a
    per-literal union and re-apply as an ``isin`` residual, the
    unclustered-high-cardinality prune min/max stats cannot make.
    ``nulls`` (``{col: wants_null}``) prunes by per-file null counts
    and re-applies as ``isNull``/``isNotNull`` residuals."""
    from pyspark.sql import functions as F

    man = _resolve_manifest(path, version)
    kept, _ = _prune_manifest_files(
        man, bounds, points, nulls, spark=spark
    )
    # point bounds (lo == hi) probe the Bloom index too, alongside
    # any caller-declared membership sets
    eq: dict[str, list] = {
        c: [lo]
        for c, (lo, hi) in bounds.items()
        if lo is not None and lo == hi
    }
    for c, lits in (points or {}).items():
        if not lits:
            continue
        if c in eq:  # conjunction: intersect (an empty intersection
            # keeps the tighter singleton — still a sound superset)
            eq[c] = [
                v for v in lits if any(v == p for p in eq[c])
            ] or eq[c]
        else:
            eq[c] = list(lits)
    if eq and (man.get("bloom") or {}):
        kept = _bloom_prune_files(spark, man, eq, kept)
    sch = _manifest_schema(man)

    def _residual(df: DataFrame) -> DataFrame:
        for c, (lo, hi) in bounds.items():
            if lo is not None:
                df = df.filter(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(c) <= F.lit(hi))
        for c, lits in (points or {}).items():
            if lits:
                df = df.filter(F.col(c).isin(*[F.lit(v) for v in lits]))
        for c, wants_null in (nulls or {}).items():
            df = df.filter(
                F.col(c).isNull() if wants_null else F.col(c).isNotNull()
            )
        return df

    if not kept:
        if sch is None:
            return _residual(read(spark, path, version)).limit(0)
        return spark.createDataFrame([], sch)
    # stats prune whole files first, then the live scan removes the
    # surviving files' DV-dead rows (inline filter or anti-join)
    return _residual(_scan_live(spark, man, kept))


def _branch_kept_files(
    spark: SparkSession, man: dict, branches
) -> list[str]:
    """Files at least ONE branch of a disjunctive profile keeps —
    per branch the full stats prune plus the Bloom probe for its
    equality/membership literals, unioned in manifest order.  Stops
    probing branches early once nothing is pruned anymore."""
    keep: dict[str, None] = {}
    for bounds, points, nulls in branches:
        kept, _ = _prune_manifest_files(
            man, bounds, points, nulls, spark=spark
        )
        eq: dict[str, list] = {
            c: [lo]
            for c, (lo, hi) in bounds.items()
            if lo is not None and lo == hi
        }
        for c, lits in (points or {}).items():
            if lits and c not in eq:
                eq[c] = list(lits)
        if eq and (man.get("bloom") or {}):
            kept = _bloom_prune_files(spark, man, eq, kept)
        for f in kept:
            keep[f] = None
        if len(keep) == len(man["files"]):
            break
    return [f for f in man["files"] if f in keep]


def _read_where_branches(
    spark: SparkSession,
    path: str,
    branches,
    version: int | None = None,
) -> DataFrame:
    """The union-of-branches read behind a top-level OR: one scan
    over :func:`_branch_kept_files`.  Emits NO residual filter —
    every caller re-applies the original condition (the
    :func:`read_sql_where` tail filter / the SQL statement's own
    WHERE), which Catalyst pushes into the surviving scans'
    row groups."""
    man = _resolve_manifest(path, version)
    kept = _branch_kept_files(spark, man, branches)
    if not kept:
        sch = _manifest_schema(man)
        if sch is None:
            return read(spark, path, version).limit(0)
        return spark.createDataFrame([], sch)
    return _scan_live(spark, man, kept)


def read_sql_where(
    spark: SparkSession,
    path: str,
    condition: str,
    version: int | None = None,
    aliases: tuple[str, ...] = (),
) -> DataFrame:
    """:func:`read` filtered by a SQL ``condition`` string, with
    manifest-stats file skipping derived from the SAME conservative
    predicate algebra the DML probes use (:func:`_condition_profile`
    — typed TIMESTAMP/DATE literals, IN-lists, BETWEEN, and (given
    ``aliases``) alias-qualified columns included, hidden-partition
    transforms translated, equality/IN points probing the Bloom
    index): the condition always re-applies as the residual filter,
    so an unboundable predicate merely reads unpruned, never wrong.
    The string-condition twin of :func:`read_where` for callers who
    think in WHERE clauses.  The FIRST alias also attaches to the
    returned frame so the residual's ``o.col`` qualifiers resolve."""
    from pyspark.sql import functions as F

    try:
        branches = _condition_profiles(condition, aliases)
    except Exception:
        branches = None
    if branches and len(branches) == 1:
        bounds, points, nulls = branches[0]
        df = read_where(
            spark, path, bounds, version, points=points, nulls=nulls
        )
    elif branches:
        # top-level OR whose disjuncts each profile: union of the
        # per-branch kept sets; the tail filter below is the residual
        df = _read_where_branches(spark, path, branches, version)
    else:
        df = read(spark, path, version=version)
    if aliases:
        df = df.alias(aliases[0])
    return df.filter(F.expr(condition))


def explain_pruning(
    spark: SparkSession,
    path: str,
    condition: str,
    version: int | None = None,
    aliases: tuple[str, ...] = (),
) -> dict:
    """What the pruning stack would do for ``condition`` — the
    diagnostic twin of :func:`read_sql_where` (EXPLAIN for file
    skipping): the extracted range bounds / membership points /
    null predicates, the file counts each stage admits, and which
    Bloom columns fired.  A top-level OR that profiles per-disjunct
    reports the UNION across its branches (``or_branches`` > 1; the
    ``bounds``/``points``/``null_predicates`` fields then describe
    only the single-conjunction case and stay empty).  Metadata-only;
    nothing is scanned."""
    man = _resolve_manifest(path, version)
    try:
        branches = _condition_profiles(condition, aliases) or []
    except Exception:
        branches = []
    total = len(man["files"])
    bounds, points, nulls = (
        branches[0] if len(branches) == 1 else ({}, {}, {})
    )
    if not branches:
        after_stats = total
        kept = list(man["files"])
        bloom_cols: list[str] = []
    else:
        bloom = man.get("bloom") or {}
        m = _mapping(man)
        stats_keep: dict[str, None] = {}
        final_keep: dict[str, None] = {}
        bloom_cols = []
        for b_bounds, b_points, b_nulls in branches:
            b_kept, _ = _prune_manifest_files(
                man, b_bounds, b_points, b_nulls, spark=spark
            )
            for f in b_kept:
                stats_keep[f] = None
            if b_points and bloom:
                bloom_cols += [
                    c
                    for c in b_points
                    if m.get(c, c) in bloom and c not in bloom_cols
                ]
                b_kept = _bloom_prune_files(
                    spark, man, b_points, b_kept
                )
            for f in b_kept:
                final_keep[f] = None
        after_stats = len(stats_keep)
        kept = [f for f in man["files"] if f in final_keep]
    return {
        "condition": condition,
        "bounds": bounds,
        "points": points,
        "null_predicates": nulls,
        "or_branches": len(branches),
        "files_total": total,
        "files_after_stats": after_stats,
        "files_after_bloom": len(kept),
        "bloom_columns": bloom_cols,
        "pruned_pct": round(
            100.0 * (total - len(kept)) / total, 2
        ) if total else 0.0,
    }


DEFAULT_OPTIMIZE_TARGET_BYTES = 128 * 1024 * 1024


def optimize(
    spark: SparkSession,
    path: str,
    zorder_by: list[str] | None = None,
    n_files: int | None = None,
    target_bytes: int = DEFAULT_OPTIMIZE_TARGET_BYTES,
) -> tuple[int, int, int]:
    """Rewrite the latest snapshot clustered — ``OPTIMIZE ... ZORDER
    BY`` on this format: one exchange range-partitioning the data
    along the z-curve over ``zorder_by`` (equi-depth bucketed, bits
    interleaved; plain compaction when omitted), committed as a
    REPLACE of the whole visible set with ``data_change: false`` —
    layout-only, so the streaming source skips the version (no
    re-emission of already-delivered rows; Delta's dataChange
    discipline) and :func:`changes` yields an empty feed.  The new
    manifest stats are TIGHT — every listed column's per-file min/max
    becomes selective, which is what makes :func:`read_where` skip.
    Returns (version, files_before, files_after).  Old versions keep
    answering from the old files until vacuum expires them; a racing
    commit re-bases the rewrite."""
    import math

    from pyspark.sql import functions as F

    from integritychecksforvldbs_spark.sources.maintenance import zorder_key

    for _ in range(5):
        cur = _latest_committed(path)
        if cur is None:
            raise FileNotFoundError(f"no committed version under {path!r}")
        cur_v, man = cur
        before = len(man["files"])
        if n_files is None:
            total = 0
            for f in man["files"]:
                try:
                    total += os.path.getsize(_local(f))
                except OSError:
                    pass
            n_out = max(1, math.ceil(total / target_bytes))
        else:
            n_out = n_files
        df = read(spark, path, version=cur_v)
        if zorder_by:
            z = zorder_key(df, zorder_by)
            df = (
                df.withColumn("__zorder", z)
                .repartitionByRange(n_out, F.col("__zorder"))
                .sortWithinPartitions("__zorder")
                .drop("__zorder")
            )
        else:
            df = df.coalesce(n_out)
        new_files, new_stats = _write_data(
            spark, df, path, mapping=_mapping(man),
            partition_by=_partition_by(man),
            transforms=_partition_transforms(man),
        )
        v = _commit_replace(
            path, cur_v, man, set(man["files"]), new_files, new_stats,
            mode="optimize", data_change=False,
            extra={"optimized_by": zorder_by or []},
        )
        if v is not None:
            return v, before, len(new_files)
        # a commit raced the rewrite: re-base on it (the written files
        # stay orphaned for vacuum)
    raise ConflictError(f"optimize of {path!r} lost every replace race")


def set_partition_spec(
    spark: SparkSession, path: str, partition_by: list[str] | None
) -> int:
    """Evolve the table's ACTIVE partition spec IN PLACE — Iceberg's
    per-commit spec evolution (``ALTER TABLE … SET PARTITION SPEC``,
    r12; VERDICT r11 #4) for TRANSFORM layouts: a metadata-only
    commit records the new spec, files already written keep their old
    dirs, and the retired spec's transforms move to
    ``partition_spec_history`` — which the pruner consults alongside
    the active spec, so each file is pruned by whichever dir values
    its OWN stats carry and both prunes stay exact across the
    boundary (a file lacking a dir's stats is simply kept).  A table
    moving ``day(ts)`` → ``month(ts)`` does so without rewriting a
    byte; appends after the change must inherit the new spec, and a
    source column only HISTORY references may now be dropped.

    IDENTITY layouts evolve metadata-only too (r13 — Iceberg tracks
    per-file specs for identity as well): the retired identity dirs
    enter the history as ``{"fn": "identity"}`` records, old files
    keep their hive dirs (the scan reconstructs their stripped
    column per file, new files carry it in their footers), and
    pruning is untouched — identity dir values were folded into each
    file's stats at commit time.  Refused — use
    :func:`rewrite_partitioned` instead — only when a new dir name
    collides with a history entry of a DIFFERENT definition (a
    re-keyed source would translate bounds onto stats derived from
    the old column).  Returns the committed version (the current one
    when the spec already matches)."""
    for _ in range(_MAX_COMMIT_RETRIES):
        cur = _latest_committed(path)
        if cur is None:
            raise FileNotFoundError(f"no committed version under {path!r}")
        base_v, man = cur
        sch = _manifest_schema(man)
        if sch is None:
            raise ValueError(
                f"{path!r} records no schema; cannot evolve its spec"
            )
        old_dirs = _partition_by(man)
        old_tr = _partition_transforms(man)
        new_dirs, new_tr = _parse_partition_spec(
            partition_by or [], sch, _mapping(man)
        )
        if new_dirs == old_dirs and new_tr == old_tr:
            return base_v  # already this spec: no-op
        # identity entries ride the history as {"fn": "identity"}
        # records (r13; Iceberg tracks per-file specs for identity
        # too): old identity files keep their hive dirs, and the scan
        # reconstructs their stripped column per file via
        # _identity_dir_keys — so evolution stays metadata-only in
        # BOTH directions
        old_ident = {
            d: {"fn": "identity", "src": d}
            for d in old_dirs
            if d not in old_tr
        }
        history = {
            **_partition_spec_history(man), **old_tr, **old_ident,
        }
        for d, tr in list(history.items()):
            new_def = new_tr.get(d)
            if new_def is None and d in new_dirs:
                new_def = {"fn": "identity", "src": d}
            if new_def is not None:
                if new_def != tr:
                    raise ValueError(
                        f"partition dir {d!r} was previously laid out "
                        f"as {tr!r} and would now mean {new_def!r} — "
                        "old files' dir stats no longer translate; "
                        "use rewrite_partitioned"
                    )
                history.pop(d)  # re-activated identically
        v = _commit_replace(
            path, base_v, man, set(), [], {},
            mode=f"set_partition_spec({', '.join(partition_by or [])})",
            data_change=False,
            extra={
                "partition_by": new_dirs,
                "partition_transforms": new_tr,
                "partition_spec_history": history,
            },
        )
        if v is not None:
            return v
    raise ConflictError(
        f"set_partition_spec on {path!r} lost every CAS race"
    )


def rewrite_partitioned(
    spark: SparkSession, path: str, partition_by: list[str] | None
) -> tuple[int, int, int]:
    """Migrate the table to a new partition layout by REWRITING the
    visible snapshot under it — the bytes-moving migration for the
    cases :func:`set_partition_spec` refuses (identity layouts on
    either side, a transform dir re-keyed onto a different source).
    One full-table write committed as a REPLACE with ``data_change:
    false`` (rows identical, layout-only: the streaming source skips
    the version and :func:`changes` yields an empty feed), with the
    spec history RESET — every visible file now carries the new
    layout.  Old versions keep answering, and pruning, under their
    own manifests' spec until vacuum expires their files.  Returns
    ``(version, files_before, files_after)``."""
    for _ in range(5):
        cur = _latest_committed(path)
        if cur is None:
            raise FileNotFoundError(f"no committed version under {path!r}")
        cur_v, man = cur
        before = len(man["files"])
        df = read(spark, path, version=cur_v)
        new_dirs, new_tr = _parse_partition_spec(
            partition_by or [], df.schema, _mapping(man)
        )
        new_files, new_stats = _write_data(
            spark, df, path, mapping=_mapping(man),
            partition_by=new_dirs, transforms=new_tr,
        )
        v = _commit_replace(
            path, cur_v, man, set(man["files"]), new_files, new_stats,
            mode=f"rewrite_partitioned({', '.join(partition_by or [])})",
            data_change=False,
            extra={
                "partition_by": new_dirs,
                "partition_transforms": new_tr,
                "partition_spec_history": {},
            },
        )
        if v is not None:
            return v, before, len(new_files)
        # a commit raced the rewrite: re-base (files orphan to vacuum)
    raise ConflictError(
        f"rewrite_partitioned of {path!r} lost every replace race"
    )


def changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level change feed between two committed snapshots — the
    Delta CDF idea (SURVEY §7.4) expressed on this format: the rows a
    reader holding ``from_version`` must apply to reach ``to_version``
    (default: latest), as the table's schema plus ``_change_type``
    (``'insert'`` / ``'delete'``; an update surfaces as its
    delete+insert pair, which is what a MERGE physically is here).

    ``from_version`` is the BASE snapshot (exclusive); ``0`` means
    "from empty", i.e. a full initial load.  Cost scales with the
    CHANGE, not the table: data files are immutable, so the manifest
    diff pins exactly which files entered/left the visible set and
    only those are scanned.  The row-level diff has multiset
    ``exceptAll`` semantics between the entered and left files
    (computed as ONE ±1-count grouped aggregation over their union —
    see the inline note), so a rewrite that re-emits identical rows
    (compaction, z-order) yields an EMPTY feed — layout maintenance
    is invisible to downstream consumers, exactly as it should be.

    Deletion vectors: each side's dead rows are anti-filtered before
    the diff, and files present in BOTH snapshots whose DV changed
    contribute their newly-dead positions as ``'delete'`` rows (a
    merge-on-read DELETE's feed) — or newly-LIVE positions as
    ``'insert'`` rows (a rollback across a DV delete restores them).
    Cost still scales with the change: only the DV-changed files are
    scanned, semi-joined against the position diff."""
    from pyspark.sql import functions as F

    from integritychecksforvldbs_spark.sources import (
        deletion_vectors as dvmod,
    )
    from integritychecksforvldbs_spark.sources.loader import load_table

    def _man(v: int) -> dict | None:
        if v == 0:
            return None
        man = _snapshot(path, v)
        if man is None:
            raise FileNotFoundError(f"version {v} of {path!r} not found")
        return man

    if to_version is None:
        cur = _latest_committed(path)
        if cur is None:
            raise FileNotFoundError(f"no committed version under {path!r}")
        to_version = cur[0]
    if from_version > to_version:
        raise ValueError(
            f"from_version {from_version} is past to_version {to_version}"
        )
    man_from, man_to = _man(from_version), _man(to_version)
    files_from = man_from["files"] if man_from else []
    files_to = man_to["files"] if man_to else []
    dv_from = (man_from.get("dvs") or {}) if man_from else {}
    dv_to = (man_to.get("dvs") or {}) if man_to else {}
    f_from, f_to = set(files_from), set(files_to)
    entered = sorted(f_to - f_from)
    left = sorted(f_from - f_to)
    # files visible in both snapshots whose deletion vector differs
    dv_changed = sorted(
        f for f in (f_from & f_to) if dv_from.get(f) != dv_to.get(f)
    )
    if not entered and not left and not dv_changed:
        base = read(spark, path, version=to_version).limit(0)
        return base.withColumn("_change_type", F.lit("insert")).limit(0)

    def _side_scan(man_side, files_side):
        """One side's live rows in that side's LOGICAL names — the
        scan stays physical until the DV anti-join has attached its
        ``_metadata`` positions."""
        dvs_side = _dvs_for(man_side, files_side)
        if _physical_schema(man_side) is not None:
            raw = _scan_files(
                spark, man_side, files_side, mapped=False,
                per_scan=lambda p: dvmod.apply_dvs(spark, p, dvs_side),
            )
        else:
            raw = dvmod.apply_dvs(
                spark, load_table(spark, *files_side), dvs_side
            )
        out = _to_logical(raw, man_side)
        sch_side = _manifest_schema(man_side)
        if sch_side is not None and _partition_by(man_side):
            # partition discovery appends the partition columns last;
            # the multiset diff below is POSITIONAL — restore the
            # declared order
            out = out.select(*sch_side.fieldNames())
        return out

    def _conform_to_tip(df_from: DataFrame) -> DataFrame:
        """Project a FROM-logical frame into the TO snapshot's column
        space by PHYSICAL identity: a renamed column carries over
        under its new name, a column the tip added null-fills, one it
        dropped projects out — so the feed always speaks the schema a
        reader at ``to_version`` holds (Delta CDF's contract)."""
        to_sch = _manifest_schema(man_to)
        from_sch = _manifest_schema(man_from)
        if to_sch is None or from_sch is None:
            return df_from  # legacy manifests: no recorded schemas
        m_to, m_from = _mapping(man_to), _mapping(man_from)
        phys_to_from = {
            m_from.get(n, n): n for n in from_sch.fieldNames()
        }
        cols = []
        for f in to_sch.fields:
            src = phys_to_from.get(m_to.get(f.name, f.name))
            cols.append(
                F.col(src).cast(f.dataType).alias(f.name)
                if src is not None
                else F.lit(None).cast(f.dataType).alias(f.name)
            )
        return df_from.select(*cols)

    none = None  # schema donor when one side has no files
    df_in = _side_scan(man_to, entered) if entered else none
    df_out = (
        _conform_to_tip(_side_scan(man_from, left)) if left else none
    )
    donor = df_in if df_in is not None else df_out
    if donor is None:  # pure DV change: donate schema from the tip
        donor = read(spark, path, version=to_version).limit(0)
    if df_in is None:
        df_in = donor.limit(0)
    if df_out is None:
        df_out = donor.limit(0)
    # Multiset diff in ONE grouped aggregation over one union instead
    # of two exceptAlls: Spark rewrites EACH exceptAll into union →
    # aggregate → replicate over BOTH scans (RewriteExceptAll), so the
    # entered/left files were scanned and shuffled twice.  Counting
    # +1/-1 per side and replicating |Σ| rows computes the identical
    # multiset: exceptAll emits a row value max(c_in − c_out, 0) times
    # on the insert side and max(c_out − c_in, 0) on the delete side,
    # at most one of which is non-zero — exactly the sign and
    # magnitude of the count sum.  Grouping semantics match (the
    # exceptAll rewrite IS a group-by-all-columns: NULL-safe equality,
    # NaN = NaN, -0.0 = 0.0).
    cols = df_in.columns
    cnt = "__icv_chg_cnt"
    while cnt in cols:
        cnt += "_"
    tagged = df_in.withColumn(cnt, F.lit(1).cast("long")).unionByName(
        df_out.select(*cols).withColumn(cnt, F.lit(-1).cast("long"))
    )
    diff = (
        tagged.groupBy(*cols)
        .agg(F.sum(cnt).alias(cnt))
        .filter(F.col(cnt) != 0)
    )
    rep = "__icv_chg_rep"
    while rep in cols or rep == cnt:
        rep += "_"
    out = (
        diff.select(
            *cols,
            F.when(F.col(cnt) > 0, F.lit("insert"))
            .otherwise(F.lit("delete"))
            .alias("_change_type"),
            F.abs(F.col(cnt)).alias(cnt),
        )
        .withColumn(rep, F.explode(F.expr(f"sequence(1L, {cnt})")))
        .drop(cnt, rep)
    )
    if dv_changed:
        sch_to = _physical_schema(man_to)
        if sch_to is not None:
            taken = set(sch_to.fieldNames())
            fcol, rcol = "__icv_dv_file", "__icv_dv_pos"
            while fcol in taken:
                fcol += "_"
            while rcol in taken or rcol == fcol:
                rcol += "_"
            # positions attach per scan relation (multi-base unions)
            raw = _scan_files(
                spark, man_to, dv_changed, mapped=False,
                per_scan=lambda p: dvmod.scan_with_position(
                    p, fcol, rcol
                ),
            )
        else:
            raw = load_table(spark, *dv_changed)
            fcol, rcol = dvmod._unique_names(raw)
            raw = dvmod.scan_with_position(raw, fcol, rcol)
        ent_from = _dvs_for(man_from, dv_changed) if man_from else {}
        ent_to = _dvs_for(man_to, dv_changed) if man_to else {}
        pos_from = dvmod.positions_df(spark, ent_from)
        pos_to = dvmod.positions_df(spark, ent_to)
        # the diff is bounded by both sides' recorded dead counts —
        # broadcast only when that bound fits (the same guard
        # anti_join_positions applies; an auto-DV bulk delete can
        # legitimately hold tens of millions of positions)
        fits = sum(
            int(e["n"]) for e in list(ent_from.values()) + list(ent_to.values())
        ) <= dvmod.DV_BROADCAST_MAX_POSITIONS

        # One ±1 position diff + ONE scan of the DV-changed files for
        # BOTH directions: each side's positions are a set (unique
        # (file, pos)), so the grouped count sign says exactly which
        # side a position left — +1 = only in the to-DV (newly dead →
        # 'delete'), −1 = only in the from-DV (restored by rollback →
        # 'insert').  The previous shape ran two position exceptAlls
        # and two semi-join scans of the same files, one per direction.
        pcnt = "__icv_pos_cnt"
        pos_diff = (
            pos_to.withColumn(pcnt, F.lit(1))
            .unionByName(pos_from.withColumn(pcnt, F.lit(-1)))
            .groupBy("__dv_file", "__dv_pos")
            .agg(F.sum(pcnt).alias(pcnt))
            .filter(F.col(pcnt) != 0)
            .select(
                "__dv_file",
                "__dv_pos",
                F.when(F.col(pcnt) > 0, F.lit("delete"))
                .otherwise(F.lit("insert"))
                .alias("_change_type"),
            )
        )
        cond = (raw[fcol] == pos_diff["__dv_file"]) & (
            raw[rcol] == pos_diff["__dv_pos"]
        )
        build = F.broadcast(pos_diff) if fits else pos_diff
        dv_rows = _to_logical(
            raw.join(build, cond, "inner").drop(
                fcol, rcol, "__dv_file", "__dv_pos"
            ),
            man_to,
        )
        out = out.unionByName(dv_rows)
    return out


def history(path: str) -> list[VersionInfo]:
    """Committed versions, oldest first (bodyless crashed claims are
    not part of history).  ``n_files`` is the SNAPSHOT size; for a
    delta body it folds incrementally over the ascending walk (one
    raw read per version, no per-version chain re-fold)."""
    out = []
    counts: dict[int, int] = {}
    for v in _versions(path):
        man = _read_manifest(path, v)
        if man is None:
            continue
        if "files" in man:
            n = len(man["files"])
        elif int(man["delta_base"]) in counts:
            n = (
                counts[int(man["delta_base"])]
                + len(man["add_files"])
                - len(man.get("remove_files") or ())
            )
        else:  # base expired below the retained horizon: full fold
            try:
                n = len(_fold(path, man)["files"])
            except FileNotFoundError:
                # an expired delta whose chain no longer resolves —
                # residue of a vacuum interrupted mid-expiry (pre-r9
                # ascending deletes could drop a base before its
                # delta).  It is below the retention horizon by
                # construction, so skip it rather than bricking every
                # history()/vacuum() call forever; the next vacuum
                # removes the orphan manifest itself.
                continue
        counts[v] = n
        out.append(
            VersionInfo(
                v, man["mode"], n, man["parent"],
                _committed_at(path, v, man),
            )
        )
    return out


def schema_history(path: str) -> list[tuple[int, str | None]]:
    """(version, schema DDL) per committed version, oldest first —
    ``None`` for manifests predating schema recording."""
    out = []
    for v in _versions(path):
        man = _read_manifest(path, v)
        if man is not None:
            out.append((v, man.get("schema")))
    return out


def schema_changes(
    path: str, from_version: int, to_version: int | None = None
) -> dict[str, list[str]]:
    """Column-level diff between two committed schemas:
    ``{"added": [...], "removed": [...], "retyped": [...]}`` — the
    schema-evolution counterpart of :func:`changes`.  Raises when
    either manifest predates schema recording (there is nothing
    trustworthy to diff)."""
    def _fields(v: int) -> dict[str, str]:
        man = _read_manifest(path, v)
        if man is None:
            raise FileNotFoundError(f"version {v} of {path!r} not found")
        sch = _manifest_schema(man)
        if sch is None:
            raise ValueError(
                f"version {v} of {path!r} predates schema recording"
            )
        return {f.name: f.dataType.simpleString() for f in sch.fields}

    if to_version is None:
        cur = _latest_committed(path)
        if cur is None:
            raise FileNotFoundError(f"no committed version under {path!r}")
        to_version = cur[0]
    a, b = _fields(from_version), _fields(to_version)
    return {
        "added": sorted(set(b) - set(a)),
        "removed": sorted(set(a) - set(b)),
        "retyped": sorted(
            c for c in set(a) & set(b) if a[c] != b[c]
        ),
    }


def rollback(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    expected_parent: int | None = None,
    timestamp: float | None = None,
) -> int:
    """Commit a NEW version whose visible file set is ``version``'s —
    time travel made durable without rewriting history (the bad
    versions stay queryable for forensics).

    Concurrency: by default LAST-WRITE-WINS — a commit racing the
    rollback lands in history (the parent chain records it) but its
    rows are not in the restored snapshot, which is what "restore to
    version N" means.  Callers that instead want to fail when the
    table moved under them pass ``expected_parent`` (the latest
    version they observed): the rollback then raises
    :class:`ConflictError` if any commit landed past it — the same
    optimistic check ``commit(mode="overwrite")`` applies.

    ``timestamp`` (epoch seconds, mutually exclusive with ``version``)
    restores the snapshot that was current at that moment, resolved
    through :func:`version_at` — ``RESTORE TABLE ... TO TIMESTAMP
    AS OF``."""
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = version_at(path, timestamp)
    if version is None:
        raise ValueError("rollback needs a version or a timestamp")
    man = _snapshot(path, version)  # rollback restores the FULL set
    if man is None:
        raise FileNotFoundError(f"version {version} of {path!r} not found")
    os.makedirs(_vdir(path), exist_ok=True)
    for _ in range(_MAX_COMMIT_RETRIES):
        cur = _latest_committed(path)
        cur_v = cur[0] if cur else 0
        if expected_parent is not None and cur_v != expected_parent:
            raise ConflictError(
                f"rollback of {path!r} to v{version} based on "
                f"v{expected_parent} conflicts with committed v{cur_v}; "
                "reload and retry"
            )
        nxt = _next_claim(path, cur_v)
        if nxt is None:
            continue  # a commit landed after the cur read — re-base
        import time

        installed = _install_manifest(
            path,
            nxt,
            {
                "version": nxt,
                "mode": f"rollback({version})",
                "files": man["files"],
                "stats": man.get("stats") or {},
                # the restored snapshot's deletion vectors return with
                # its file list — live-row semantics travel together
                "dvs": dict(man.get("dvs") or {}),
                "parent": cur_v or None,
                "committed_at": time.time(),
                # the restore is wholesale: the target's constraint
                # map governed its data and returns with it
                "constraints": dict(man.get("constraints") or {}),
                "schema": man.get("schema"),
                "schema_json": man.get("schema_json"),
                # the restored snapshot's column mapping governs its
                # files' physical names and returns with them
                **(
                    {"column_mapping": _mapping(man)}
                    if _mapping(man) else {}
                ),
                **(
                    {"retired_cols": _retired(man)}
                    if _retired(man) else {}
                ),
                **(
                    {"bloom": dict(man["bloom"])}
                    if man.get("bloom") else {}
                ),
                # the restored snapshot's partition layout governs its
                # files' directory values and returns with them —
                # without this a post-rollback scan of an identity
                # layout silently NULL-FILLED the partition column
                # (the basePath discovery never ran)
                **(
                    {"partition_by": _partition_by(man)}
                    if _partition_by(man) else {}
                ),
                **(
                    {"partition_transforms": _partition_transforms(man)}
                    if _partition_transforms(man) else {}
                ),
                **(
                    {"partition_spec_history":
                        _partition_spec_history(man)}
                    if _partition_spec_history(man) else {}
                ),
            },
        )
        if installed:
            _write_latest_hint(path, nxt)
            return nxt
    raise ConflictError(f"rollback of {path!r} lost every CAS race")


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    max_retries: int = 5,
    strategy: str = "auto",
    extra: dict | None = None,
) -> int:
    """Upsert ``source`` into the table by ``keys`` (matched rows
    replaced, new rows inserted) as ONE atomic version — the
    Delta-style ``MERGE`` (SURVEY §7.4) expressed on this format.

    FILE-SCOPED: the merge probes which files hold any row whose key
    matches the source (column-pruned, filter-pushed semi-join probe),
    rewrites ONLY those files minus their matched rows, and commits
    [rewritten ∪ source] against the removed set as a replace delta —
    IO scales with the files the keys touch plus the source, never the
    table (the Delta MERGE rewrite discipline).  Files holding no
    matched key are untouched bytes AND untouched metadata.

    Concurrency: the rewrite is computed against one snapshot and the
    replace commit lands only on exactly that base; when a concurrent
    commit lands first, the WHOLE merge re-bases on the new state and
    retries — optimistic concurrency at merge granularity, so racing
    merges serialize without locks.  NULL keys upsert like any other
    key (null-safe equality).

    ``source`` must be UNIQUE on ``keys``: two source rows for one key
    is an ambiguous upsert (which row should the table hold?), and
    silently landing both would leave the table duplicated on the very
    key the merge promised to deduplicate — so it raises, the same
    multiple-source-match error Delta's ``MERGE`` enforces.  Callers
    that genuinely hold multi-row sources pick the winner explicitly
    (e.g. :func:`~..operators.scd.cdc_latest_snapshot` over a change
    stream) before merging.

    ``strategy`` — how matched rows leave the old files: ``"copy"``
    rewrites every touched file minus its matched rows (copy-on-write,
    the pre-r9 behaviour); ``"dv"`` marks the matched positions in
    DELETION VECTORS and writes only the source (merge-on-read: bytes
    written scale with the CHANGE, not the touched files); ``"auto"``
    (default) picks DV when the matched rows are a small fraction
    (:data:`DV_MAX_FRACTION`) of the touched files' live rows."""
    import functools

    from pyspark.sql import functions as F

    # aggregate under a reserved alias: .count() would name the column
    # "count", ambiguous whenever a key column is itself named count
    dup = (
        source.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__merge_dup_n"))
        .filter(F.col("__merge_dup_n") > 1)
    )
    if not dup.isEmpty():
        sample = [tuple(r[k] for k in keys) for r in dup.limit(3).collect()]
        raise ValueError(
            f"merge_into source is not unique on keys {keys}: e.g. "
            f"{sample}; deduplicate (pick a winner) before merging"
        )
    for _ in range(max_retries):
        base = _latest_committed(path)
        if base is None:
            return commit(spark, source, path, mode="append", extra=extra)
        base_v, man = base

        # probe which files hold a matched row (left_semi over the
        # source's keys-only projection — change-sized, so AQE turns
        # it into a broadcast join when it fits; forcing the hint
        # would OOM on a genuinely large source)
        def _matched(df: DataFrame) -> DataFrame:
            cond = functools.reduce(
                lambda a, b: a & b,
                [df[k].eqNullSafe(source[k]) for k in keys],
            )
            return df.join(source.select(*keys), cond, "left_semi")

        touched = (
            _touched_files(
                spark, man, _matched,
                files=_merge_probe_candidates(spark, man, source, keys),
            )
            if man["files"]
            else []
        )
        if touched:
            live, fcol, rcol = _scan_live_pos(spark, man, touched)
            matched_pos = _matched(live)
            n_matched = matched_pos.count()
            ranges = (
                _try_dv_ranges(strategy, matched_pos, fcol, rcol)
                if _use_dv(strategy, n_matched, live, man, touched)
                else None
            )
            if ranges is not None:
                # merge-on-read: the matched rows' positions go into
                # superseding deletion vectors; only the source is
                # written — the touched files' bytes are untouched
                removed, add_dvs = _fold_dv_entries(path, man, ranges)
                new_files, new_stats = _write_data(
                    spark, source, path, mapping=_mapping(man),
                    partition_by=_partition_by(man),
                    transforms=_partition_transforms(man),
                )
                _enforce(
                    spark, path, man.get("constraints") or {},
                    new_files, _manifest_schema(man), "merge_into",
                    mapping=_mapping(man),
                )
                v = _commit_replace(
                    path, base_v, man, removed, new_files, new_stats,
                    mode="merge", data_change=True,
                    extra={**(extra or {}), "row_local": True},
                    new_dvs=add_dvs,
                )
                if v is not None:
                    return v
                continue  # re-based: re-probe and re-merge
            hit_df = live.drop(fcol, rcol)
            anti_cond = functools.reduce(
                lambda a, b: a & b,
                [hit_df[k].eqNullSafe(source[k]) for k in keys],
            )
            out = hit_df.join(
                source.select(*keys), anti_cond, "left_anti"
            ).unionByName(source)
        else:
            _use_dv(strategy, 0, source, man, [])  # validate strategy
            out = source
        new_files, new_stats = _write_data(
            spark, out, path, mapping=_mapping(man),
            partition_by=_partition_by(man),
            transforms=_partition_transforms(man),
        )
        _enforce(
            spark, path, man.get("constraints") or {},
            new_files, _manifest_schema(man), "merge_into",
            mapping=_mapping(man),
        )
        v = _commit_replace(
            path, base_v, man, set(touched), new_files, new_stats,
            mode="merge", data_change=True, extra=extra,
        )
        if v is not None:
            return v
        # the table moved mid-merge: orphaned rewrite (vacuum reclaims
        # it), re-base on the racing commit and re-merge
    raise ConflictError(
        f"merge_into {path!r} lost {max_retries} replace races"
    )


def _norm_when_clauses(clauses: list[dict]) -> list[dict]:
    """Validate + normalize a ``merge_when`` clause list.  Each clause
    is ``{"when": matched|not_matched|not_matched_by_source,
    "cond": <sql or None>, "action": update|delete|insert,
    "set"/"values": {col: sql} or "*"}`` — the branch shapes ANSI/Delta
    MERGE allows (matched → update/delete, not-matched → insert,
    not-matched-by-source → update/delete)."""
    if not clauses:
        raise ValueError("merge_when needs at least one WHEN clause")
    allowed = {
        "matched": ("update", "delete"),
        "not_matched": ("insert",),
        "not_matched_by_source": ("update", "delete"),
    }
    out = []
    for c in clauses:
        when = str(c.get("when", "")).lower()
        action = str(c.get("action", "")).lower()
        if when not in allowed:
            raise ValueError(f"unknown WHEN kind {c.get('when')!r}")
        if action not in allowed[when]:
            raise ValueError(
                f"WHEN {when} cannot {action.upper()}: allowed "
                f"{'/'.join(a.upper() for a in allowed[when])}"
            )
        norm = {"when": when, "action": action, "cond": c.get("cond")}
        if action == "update":
            sets = c.get("set")
            if sets != "*" and not (
                isinstance(sets, dict) and sets
            ):
                raise ValueError(
                    "UPDATE clause needs set={col: expr} or '*'"
                )
            if when == "not_matched_by_source" and sets == "*":
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE cannot UPDATE SET * "
                    "(there is no source row to copy)"
                )
            norm["set"] = sets
        elif action == "insert":
            vals = c.get("values")
            if vals != "*" and not (isinstance(vals, dict) and vals):
                raise ValueError(
                    "INSERT clause needs values={col: expr} or '*'"
                )
            norm["values"] = vals
        out.append(norm)
    return out


def _refs_alias(sql: str, alias: str) -> bool:
    """True when ``sql`` references ``alias.<col>`` outside string
    literals — the fast diagnosis for clause/alias mismatches the
    analyzer would otherwise report as NULL-valued surprises."""
    from integritychecksforvldbs_spark.sources.versioned_sql import (
        _in_spans,
        _string_spans,
    )

    spans = _string_spans(sql)
    for m in re.finditer(
        rf"(?<![\w.`]){re.escape(alias)}\s*\.", sql, re.I
    ):
        if not _in_spans(m.start(), spans):
            return True
    return False


def _check_clause_aliases(
    clauses: list[dict], ta: str, sa: str
) -> None:
    """ANSI MERGE scoping, diagnosed eagerly: a NOT-MATCHED-BY-SOURCE
    clause has no source row (every ``sa.col`` would be NULL, which
    SQL rejects outright), and a NOT-MATCHED insert has no target row
    (every ``ta.col`` likewise)."""
    for c in clauses:
        exprs = [c.get("cond") or ""]
        sets = c.get("set") if c["action"] == "update" else c.get("values")
        if isinstance(sets, dict):
            exprs += list(sets.values())
        if c["when"] == "not_matched_by_source":
            bad, side = sa, "the source"
        elif c["when"] == "not_matched":
            bad, side = ta, "the target"
        else:
            continue
        for e in exprs:
            if e and _refs_alias(e, bad):
                raise ValueError(
                    f"WHEN {c['when'].upper().replace('_', ' ')} "
                    f"clauses cannot reference {side} ({bad}.…): "
                    f"there is no {side} row on that branch "
                    f"(got {e!r})"
                )


def merge_when(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    clauses: list[dict],
    target_alias: str = "t",
    source_alias: str = "s",
    max_retries: int = 5,
    strategy: str = "auto",
    extra: dict | None = None,
) -> tuple[int, dict]:
    """General conditional MERGE — the full WHEN-clause form next to
    :func:`merge_into`'s upsert-all fast path.  Returns ``(version,
    {"n_updated", "n_deleted", "n_inserted"})``.

    ``clauses`` (see :func:`_norm_when_clauses`) express, in order:

    - ``WHEN MATCHED [AND cond] THEN UPDATE SET col=expr… | DELETE``
    - ``WHEN NOT MATCHED [AND cond] THEN INSERT * | (cols) VALUES …``
    - ``WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE … | DELETE``

    First-true-clause-wins per row within each branch family, the
    ANSI/Delta MERGE rule.  Conditions and SET/VALUES expressions are
    verbatim SQL referencing ``target_alias``/``source_alias``
    (``t.col``/``s.col`` by default); a NULL condition is
    not-satisfied.  The reference's own inventory MERGE is exactly the
    three-branch form (matched update, not-matched insert,
    not-matched-BY-SOURCE deactivate — IC:454-484, deactivate at
    IC:482-483), which the state store reproduces procedurally
    (plans/state.py); this gives the SQL front door the same shape.

    Execution is file-scoped like the triad: one probe finds the files
    holding any row a clause would MODIFY (matched rows passing a
    matched-clause condition, or — when NOT-MATCHED-BY-SOURCE clauses
    exist — unmatched rows passing theirs), those files are rewritten
    (copy-on-write) or their dead positions go to deletion vectors
    (``strategy``, same auto gate and island cap as the triad), and
    insert rows come from an anti-join of the source against the
    table's keys (column-pruned scan).  ``source`` must be unique on
    ``keys`` (same ambiguity rule as :func:`merge_into`).  Optimistic
    concurrency: a racing commit re-bases the whole merge."""
    import functools

    from pyspark.sql import functions as F

    clauses = _norm_when_clauses(clauses)
    ta, sa = target_alias, source_alias
    if ta == sa:
        raise ValueError("target_alias and source_alias must differ")
    _check_clause_aliases(clauses, ta, sa)
    m_clauses = [c for c in clauses if c["when"] == "matched"]
    n_clauses = [c for c in clauses if c["when"] == "not_matched_by_source"]
    i_clauses = [c for c in clauses if c["when"] == "not_matched"]

    # ambiguity rule: one target row matching 2+ source rows has no
    # well-defined UPDATE/DELETE outcome — same check as merge_into
    dup = (
        source.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__merge_dup_n"))
        .filter(F.col("__merge_dup_n") > 1)
    )
    if not dup.isEmpty():
        sample = [tuple(r[k] for k in keys) for r in dup.limit(3).collect()]
        raise ValueError(
            f"merge_when source is not unique on keys {keys}: e.g. "
            f"{sample}; deduplicate (pick a winner) before merging"
        )

    flag = "__icv_merge_src"
    while flag in source.columns:
        flag += "_"
    src_f = source.withColumn(flag, F.lit(True)).alias(sa)
    key_cond = functools.reduce(
        lambda a, b: a & b,
        [
            F.col(f"{ta}.{k}").eqNullSafe(F.col(f"{sa}.{k}"))
            for k in keys
        ],
    )

    def _cond(c) -> F.Column:
        if c.get("cond") is None:
            return F.lit(True)
        return F.coalesce(F.expr(c["cond"]), F.lit(False))

    matched = F.col(f"{sa}.{flag}").isNotNull()
    act_col = None
    tag_clause: dict[str, dict] = {}
    for i, c in enumerate(m_clauses):
        tag = f"m{i}"
        tag_clause[tag] = c
        branch = matched & _cond(c)
        act_col = (
            F.when(branch, tag)
            if act_col is None
            else act_col.when(branch, tag)
        )
    for i, c in enumerate(n_clauses):
        tag = f"n{i}"
        tag_clause[tag] = c
        branch = (~matched) & _cond(c)
        act_col = (
            F.when(branch, tag)
            if act_col is None
            else act_col.when(branch, tag)
        )
    act = (
        act_col.otherwise("keep") if act_col is not None else F.lit("keep")
    )

    def _validated_cast(frame, exprs: dict[str, str], tgt_schema, what):
        """Resolve each SET/VALUES expression's type against ``frame``
        and allow only lossless widenings implicitly — the same
        discipline as update_where."""
        resolved = frame.select(
            *[F.expr(e).alias(c) for c, e in exprs.items()]
        ).schema
        for f in resolved.fields:
            want = tgt_schema[f.name].dataType
            if f.dataType != want and not _can_upcast(f.dataType, want):
                raise ValueError(
                    f"{what} expression for {f.name!r} has type "
                    f"{f.dataType.simpleString()} but the column is "
                    f"{want.simpleString()}; cast explicitly in the "
                    "expression if the conversion is intended"
                )

    for _ in range(max_retries):
        base = _latest_committed(path)
        if base is None:
            raise FileNotFoundError(f"no committed version at {path!r}")
        base_v, man = base
        sch = _manifest_schema(man)
        tgt_schema = (
            sch
            if sch is not None
            else (
                _scan_files(spark, man).schema if man["files"] else None
            )
        )
        if tgt_schema is None:
            raise ValueError(
                f"merge_when needs a table schema at {path!r}"
            )
        tcols = tgt_schema.fieldNames()
        for c in m_clauses + n_clauses:
            if c["action"] == "update" and c["set"] != "*":
                bad = sorted(set(c["set"]) - set(tcols))
                if bad:
                    raise ValueError(f"SET of unknown column(s): {bad}")
        for c in i_clauses:
            if c["values"] == "*":
                missing = sorted(set(tcols) - set(source.columns))
                if missing:
                    raise ValueError(
                        f"INSERT * needs source columns {missing}"
                    )
            else:
                bad = sorted(set(c["values"]) - set(tcols))
                if bad:
                    raise ValueError(
                        f"INSERT of unknown column(s): {bad}"
                    )

        def _mark(df: DataFrame) -> DataFrame:
            j = df.alias(ta).join(src_f, key_cond, "left_outer")
            return j.filter(act != F.lit("keep"))

        touched = (
            _touched_files(
                spark, man, _mark,
                # WHEN NOT MATCHED BY SOURCE marks target rows with NO
                # source match — they can live in ANY file, so source
                # key ranges only prune when no such clause exists
                files=(
                    _merge_probe_candidates(spark, man, source, keys)
                    if not n_clauses
                    else None
                ),
            )
            if man["files"]
            else []
        )

        # insert rows: source keys absent from the WHOLE table's live
        # rows (column-pruned keys-only scan), first-true insert clause
        def _insert_df() -> DataFrame | None:
            if not i_clauses:
                return None
            if man["files"]:
                live_keys = (
                    _scan_live(spark, man).select(*keys).alias(ta)
                )
                anti = src_f.join(live_keys, key_cond, "left_anti")
            else:
                anti = src_f
            iact_col = None
            for j, c in enumerate(i_clauses):
                branch = _cond(c)
                iact_col = (
                    F.when(branch, f"i{j}")
                    if iact_col is None
                    else iact_col.when(branch, f"i{j}")
                )
            anti = anti.withColumn("__icv_iact", iact_col.otherwise("x"))
            parts = []
            for j, c in enumerate(i_clauses):
                rows = anti.filter(F.col("__icv_iact") == f"i{j}")
                if c["values"] == "*":
                    exprs = {c2: f"{sa}.{c2}" for c2 in tcols}
                else:
                    exprs = dict(c["values"])
                _validated_cast(rows, exprs, tgt_schema, "INSERT VALUES")
                proj = [
                    (
                        F.expr(exprs[c2])
                        if c2 in exprs
                        else F.lit(None)
                    )
                    .cast(tgt_schema[c2].dataType)
                    .alias(c2)
                    for c2 in tcols
                ]
                parts.append(rows.select(*proj))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        def _updated_df(mod: DataFrame) -> DataFrame | None:
            parts = []
            for tag, c in tag_clause.items():
                if c["action"] != "update":
                    continue
                rows = mod.filter(F.col("__icv_act") == tag)
                sets = (
                    {c2: f"{sa}.{c2}" for c2 in tcols}
                    if c["set"] == "*"
                    else dict(c["set"])
                )
                _validated_cast(rows, sets, tgt_schema, "UPDATE SET")
                proj = [
                    (
                        F.expr(sets[c2])
                        if c2 in sets
                        else F.col(f"{ta}.{c2}")
                    )
                    .cast(tgt_schema[c2].dataType)
                    .alias(c2)
                    for c2 in tcols
                ]
                parts.append(rows.select(*proj))
            if not parts:
                return None
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        ins = _insert_df()
        n_inserted = ins.count() if ins is not None else 0

        if not touched:
            _use_dv(strategy, 0, None, man, [])  # validate strategy
            if ins is None or n_inserted == 0:
                v = _commit_replace(
                    path, base_v, man, set(), [], {},
                    mode="merge", data_change=False, extra=extra,
                )
                if v is not None:
                    return v, {
                        "n_updated": 0, "n_deleted": 0, "n_inserted": 0,
                    }
                continue
            new_files, new_stats = _write_data(
                spark, ins, path, mapping=_mapping(man),
                partition_by=_partition_by(man),
                transforms=_partition_transforms(man),
            )
            _enforce(
                spark, path, man.get("constraints") or {},
                new_files, tgt_schema, "merge_when",
                mapping=_mapping(man),
            )
            v = _commit_replace(
                path, base_v, man, set(), new_files, new_stats,
                mode="merge", data_change=True, extra=extra,
            )
            if v is not None:
                return v, {
                    "n_updated": 0,
                    "n_deleted": 0,
                    "n_inserted": n_inserted,
                }
            continue

        live, fcol, rcol = _scan_live_pos(spark, man, touched)
        joined = live.alias(ta).join(src_f, key_cond, "left_outer")
        joined = joined.withColumn("__icv_act", act)
        mod = joined.filter(F.col("__icv_act") != "keep")
        by_tag = {
            r["__icv_act"]: int(r["n"])
            for r in mod.groupBy("__icv_act")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_updated = sum(
            n
            for t, n in by_tag.items()
            if tag_clause[t]["action"] == "update"
        )
        n_deleted = sum(
            n
            for t, n in by_tag.items()
            if tag_clause[t]["action"] == "delete"
        )
        n_modified = n_updated + n_deleted
        metrics = {
            "n_updated": n_updated,
            "n_deleted": n_deleted,
            "n_inserted": n_inserted,
        }

        ranges = (
            _try_dv_ranges(strategy, mod, fcol, rcol)
            if _use_dv(strategy, n_modified, live, man, touched)
            else None
        )
        upd = _updated_df(mod)
        new_rows = upd
        if ins is not None and n_inserted > 0:
            new_rows = (
                ins if new_rows is None else new_rows.unionByName(ins)
            )
        if ranges is not None:
            # merge-on-read: every modified row's OLD position dies in
            # a deletion vector; only the transformed updates + inserts
            # are written
            removed, add_dvs = _fold_dv_entries(path, man, ranges)
            if new_rows is not None:
                new_files, new_stats = _write_data(
                    spark, new_rows, path, mapping=_mapping(man),
                    partition_by=_partition_by(man),
                    transforms=_partition_transforms(man),
                )
            else:
                new_files, new_stats = [], {}
            _enforce(
                spark, path, man.get("constraints") or {},
                new_files, tgt_schema, "merge_when",
                mapping=_mapping(man),
            )
            v = _commit_replace(
                path, base_v, man, removed, new_files, new_stats,
                mode="merge", data_change=True,
                extra={**(extra or {}), "row_local": True},
                new_dvs=add_dvs,
            )
            if v is not None:
                return v, metrics
            continue  # re-based: re-probe and re-merge
        # copy-on-write: rewrite the touched files — kept rows verbatim,
        # updated rows transformed, deletes dropped — plus the inserts
        kept = joined.filter(F.col("__icv_act") == "keep").select(
            *[F.col(f"{ta}.{c}").alias(c) for c in tcols]
        )
        out = kept
        if new_rows is not None:
            out = out.unionByName(new_rows)
        new_files, new_stats = _write_data(
            spark, out, path, mapping=_mapping(man),
            partition_by=_partition_by(man),
            transforms=_partition_transforms(man),
        )
        _enforce(
            spark, path, man.get("constraints") or {},
            new_files, tgt_schema, "merge_when",
            mapping=_mapping(man),
        )
        v = _commit_replace(
            path, base_v, man, set(touched), new_files, new_stats,
            mode="merge", data_change=True, extra=extra,
        )
        if v is not None:
            return v, metrics
        # the table moved mid-merge: re-base and re-merge
    raise ConflictError(
        f"merge_when {path!r} lost {max_retries} replace races"
    )


def delete_where(
    spark: SparkSession,
    path: str,
    condition: str,
    max_retries: int = 5,
    strategy: str = "auto",
) -> tuple[int, int]:
    """Delete rows matching the SQL ``condition`` as ONE atomic
    overwrite version; returns ``(version, n_deleted)``.  The
    right-to-be-forgotten operation a governed lakehouse must offer:
    the new snapshot excludes the rows, history versions still
    contain them until :func:`vacuum` expires those versions — PHYSICAL
    erasure is ``delete_where`` + ``vacuum(keep_versions=1)``, and the
    docstring split is deliberate (auditability vs erasure are
    different retention policies).

    FILE-SCOPED: the delete first probes which files hold ANY matching
    row (a column-pruned, filter-pushed scan), rewrites ONLY those
    without their matching rows, and commits the swap as a replace
    delta — IO scales with the files the predicate touches, not the
    table (the Delta DELETE rewrite discipline).  On a clustered
    layout (:func:`optimize`) a selective delete therefore rewrites a
    handful of files out of millions.  A no-match delete commits a
    ``data_change: false`` audit version without touching any file.

    Same optimistic concurrency as :func:`merge_into`: a racing
    commit re-bases the delete on the new state and retries, so the
    predicate is re-evaluated against rows the race added.

    ``strategy`` — ``"copy"`` rewrites each touched file minus its
    matching rows (copy-on-write); ``"dv"`` writes DELETION VECTORS
    instead (merge-on-read): the touched files' bytes are untouched
    and the commit writes O(deleted-row islands) sidecar bytes — the
    shape a single-row GDPR delete on a multi-GB file needs; a file
    whose dead set reaches every physical row is dropped outright.
    ``"auto"`` (default) picks DV when the matched rows are a small
    fraction (:data:`DV_MAX_FRACTION`) of the touched files' live
    rows.  Either way PHYSICAL erasure remains ``delete_where`` +
    ``vacuum(keep_versions=1)`` — with one more step on the DV path:
    the dead bytes live until :func:`compact_files` /
    :func:`optimize` materializes the deletion away (vacuum then
    reclaims the file), exactly Delta's REORG-then-VACUUM contract."""
    from pyspark.sql import functions as F

    pred = F.coalesce(F.expr(condition), F.lit(False))
    for _ in range(max_retries):
        base = _latest_committed(path)
        if base is None:
            raise FileNotFoundError(f"no committed version at {path!r}")
        base_v, man = base
        if man["files"]:
            touched = _touched_files(
                spark, man, lambda df: df.filter(pred),
                files=_probe_candidates(spark, man, condition),
            )
        else:
            touched = []  # an all-deleted snapshot: nothing to match
        if not touched:
            _use_dv(strategy, 0, None, man, [])  # validate strategy
            v = _commit_replace(
                path, base_v, man, set(), [], {},
                mode="delete", data_change=False,
                extra={"condition": condition},
            )
            if v is not None:
                return v, 0
            continue  # the table moved: re-probe against it
        live, fcol, rcol = _scan_live_pos(spark, man, touched)
        matched = live.filter(pred)
        n_deleted = matched.count()
        ranges = (
            _try_dv_ranges(strategy, matched, fcol, rcol)
            if _use_dv(strategy, n_deleted, live, man, touched)
            else None
        )
        if ranges is not None:
            removed, add_dvs = _fold_dv_entries(path, man, ranges)
            v = _commit_replace(
                path, base_v, man, removed, [], {},
                mode="delete", data_change=True,
                # row_local: any removed file is FULLY dead — no live
                # row was carried into another file, so the change
                # feed may treat the file-set diff as row-exact
                extra={"condition": condition, "row_local": True},
                new_dvs=add_dvs,
            )
            if v is not None:
                return v, n_deleted
            continue  # re-based: re-evaluate against the new state
        kept = live.drop(fcol, rcol).filter(~pred)
        n_kept = kept.count()
        if n_kept == 0:
            new_files, new_stats = [], {}
        else:
            new_files, new_stats = _write_data(
                spark, kept, path, mapping=_mapping(man),
                partition_by=_partition_by(man),
                transforms=_partition_transforms(man),
            )
        v = _commit_replace(
            path, base_v, man, set(touched), new_files, new_stats,
            mode="delete", data_change=True,
            extra={"condition": condition},
        )
        if v is not None:
            return v, n_deleted
        # the table moved mid-rewrite: the written files stay orphaned
        # (vacuum reclaims them) and the delete re-evaluates
    raise ConflictError(
        f"delete_where {path!r} lost {max_retries} replace races"
    )


def _can_upcast(src, dst) -> bool:
    """Lossless implicit conversions an UPDATE applies silently —
    Spark's ``Cast.canUpCast`` numeric-precedence rule reduced to the
    types this module's stats cover: widening along
    byte<short<int<long<float<double, NULL into anything, date into
    timestamp.  Everything else (string↔numeric, narrowing, decimal
    reshaping) must be written explicitly in the SET expression."""
    from pyspark.sql import types as T

    if isinstance(src, T.NullType):
        return True
    order = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType,
    )
    si = next((i for i, t in enumerate(order) if isinstance(src, t)), None)
    di = next((i for i, t in enumerate(order) if isinstance(dst, t)), None)
    if si is not None and di is not None:
        return si <= di
    if isinstance(src, T.DateType) and isinstance(
        dst, (T.TimestampType, T.TimestampNTZType)
    ):
        return True
    # SQL fractional literals type as decimal (0.0 is decimal(1,1));
    # promoting into double mirrors Spark's own arithmetic coercion
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DoubleType):
        return True
    return False


def update_where(
    spark: SparkSession,
    path: str,
    condition: str,
    set_exprs: dict[str, str],
    max_retries: int = 5,
    strategy: str = "auto",
) -> tuple[int, int]:
    """``UPDATE ... SET col = expr, ... WHERE condition`` as ONE
    atomic version; returns ``(version, n_updated)``.  Completes the
    DML triad next to :func:`delete_where` and :func:`merge_into`.

    FILE-SCOPED like its siblings: only the files holding a matching
    row are rewritten (matching rows transformed through
    ``set_exprs``, the rest carried verbatim), committed as a replace
    delta — IO scales with the touched files.  ``set_exprs`` values
    are SQL expressions evaluated against the PRE-update row (standard
    UPDATE semantics: all assignments see the old values).  A NULL
    condition is not-a-match, SQL UPDATE semantics.  No-match updates
    commit a ``data_change: false`` audit version.  Concurrency: a
    racing commit forces full re-evaluation against the new state.

    ``strategy`` — ``"copy"`` rewrites the touched files wholesale;
    ``"dv"`` is merge-on-read: the matched rows' OLD positions go into
    deletion vectors and only the TRANSFORMED matched rows are written
    as new files (bytes scale with the updated rows, not the touched
    files — Delta's DV UPDATE shape); ``"auto"`` (default) picks DV
    when the matched rows are a small fraction
    (:data:`DV_MAX_FRACTION`) of the touched files' live rows."""
    from pyspark.sql import functions as F

    unknown = [c for c in set_exprs if "." in c]
    if unknown:
        raise ValueError(f"nested-field updates not supported: {unknown}")
    pred = F.coalesce(F.expr(condition), F.lit(False))
    for _ in range(max_retries):
        base = _latest_committed(path)
        if base is None:
            raise FileNotFoundError(f"no committed version at {path!r}")
        base_v, man = base
        sch = _manifest_schema(man)
        known = (
            set(sch.fieldNames())
            if sch is not None
            else (
                set(_scan_files(spark, man).columns)
                if man["files"]
                else set(set_exprs)  # empty snapshot: nothing to check
            )
        )
        bad = sorted(set(set_exprs) - known)
        if bad:
            raise ValueError(f"SET of unknown column(s): {bad}")
        if man["files"]:
            touched = _touched_files(
                spark, man, lambda df: df.filter(pred),
                files=_probe_candidates(spark, man, condition),
            )
        else:
            touched = []
        if not touched:
            _use_dv(strategy, 0, None, man, [])  # validate strategy
            v = _commit_replace(
                path, base_v, man, set(), [], {},
                mode="update", data_change=False,
                extra={"condition": condition},
            )
            if v is not None:
                return v, 0
            continue
        live, fcol, rcol = _scan_live_pos(spark, man, touched)
        hit = live.drop(fcol, rcol)
        matched_pos = live.filter(pred)
        n_updated = matched_pos.count()
        # UPDATE never retypes — but a blind cast would silently NULL
        # an uncastable/overflowing SET result (ANSI off): resolve
        # each expression's type and allow only lossless widenings
        # implicitly; anything else must be cast in the expression
        resolved = hit.select(
            *[F.expr(e).alias(c) for c, e in set_exprs.items()]
        ).schema
        for f in resolved.fields:
            want = hit.schema[f.name].dataType
            if f.dataType != want and not _can_upcast(f.dataType, want):
                raise ValueError(
                    f"SET expression for {f.name!r} has type "
                    f"{f.dataType.simpleString()} but the column is "
                    f"{want.simpleString()}; cast explicitly in the "
                    "expression if the conversion is intended"
                )
        ranges = (
            _try_dv_ranges(strategy, matched_pos, fcol, rcol)
            if _use_dv(strategy, n_updated, live, man, touched)
            else None
        )
        if ranges is not None:
            # merge-on-read UPDATE: old positions die in deletion
            # vectors, the transformed matched rows append — every
            # assignment still sees the PRE-update row (the projection
            # runs on the matched originals)
            removed, add_dvs = _fold_dv_entries(path, man, ranges)
            tcols = [
                F.expr(set_exprs[c])
                .cast(hit.schema[c].dataType)  # validated lossless above
                .alias(c)
                if c in set_exprs
                else F.col(c)
                for c in hit.columns
            ]
            rewritten = matched_pos.drop(fcol, rcol).select(*tcols)
            new_files, new_stats = _write_data(
                spark, rewritten, path, mapping=_mapping(man),
                partition_by=_partition_by(man),
                transforms=_partition_transforms(man),
            )
            _enforce(
                spark, path, man.get("constraints") or {},
                new_files, _manifest_schema(man), "update_where",
                mapping=_mapping(man),
            )
            v = _commit_replace(
                path, base_v, man, removed, new_files, new_stats,
                mode="update", data_change=True,
                extra={"condition": condition, "row_local": True},
                new_dvs=add_dvs,
            )
            if v is not None:
                return v, n_updated
            continue  # re-based: re-evaluate against the new state
        # every assignment sees the PRE-update row: compute all new
        # values in one projection (no sequential dependence)
        cols = [
            F.when(pred, F.expr(set_exprs[c]))
            .otherwise(F.col(c))
            .cast(hit.schema[c].dataType)  # validated lossless above
            .alias(c)
            if c in set_exprs
            else F.col(c)
            for c in hit.columns
        ]
        rewritten = hit.select(*cols)
        new_files, new_stats = _write_data(
            spark, rewritten, path, mapping=_mapping(man),
            partition_by=_partition_by(man),
            transforms=_partition_transforms(man),
        )
        _enforce(
            spark, path, man.get("constraints") or {},
            new_files, _manifest_schema(man), "update_where",
            mapping=_mapping(man),
        )
        v = _commit_replace(
            path, base_v, man, set(touched), new_files, new_stats,
            mode="update", data_change=True,
            extra={"condition": condition},
        )
        if v is not None:
            return v, n_updated
        # the table moved mid-rewrite: re-evaluate (orphans vacuumed)
    raise ConflictError(
        f"update_where {path!r} lost {max_retries} replace races"
    )


def compact(
    spark: SparkSession, path: str, n_files: int = 1
) -> tuple[int, int, int]:
    """Rewrite the latest snapshot into ``n_files`` files as a
    layout-only REPLACE commit (``data_change: false`` — streams skip
    it, the change feed is empty): (version, files_before,
    files_after).  Old versions keep answering from the old files
    until ``vacuum`` expires them — compaction never breaks time
    travel."""
    for _ in range(5):
        cur = _latest_committed(path)
        if cur is None:
            raise FileNotFoundError(f"no committed version under {path!r}")
        cur_v, man = cur
        before = len(man["files"])
        new_files, new_stats = _write_data(
            spark, read(spark, path, version=cur_v).coalesce(n_files), path,
            mapping=_mapping(man), partition_by=_partition_by(man),
            transforms=_partition_transforms(man),
        )
        v = _commit_replace(
            path, cur_v, man, set(man["files"]), new_files, new_stats,
            mode="compact", data_change=False,
        )
        if v is not None:
            return v, before, len(new_files)
        # a commit raced the rewrite: re-base on it
    raise ConflictError(f"compact of {path!r} lost every replace race")


def compact_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_OPTIMIZE_TARGET_BYTES,
    min_bytes: int | None = None,
    zorder_by: list[str] | None = None,
    where: str | None = None,
) -> tuple[int | None, int, int]:
    """INCREMENTAL compaction: rewrite only the snapshot's small files
    (< ``min_bytes``, default ``target_bytes // 2``) into
    ~``target_bytes`` files and commit the swap as a REPLACE delta —
    ``remove_files`` + ``add_files`` with ``data_change: false``, the
    Delta ``OPTIMIZE`` primitive.  Returns
    ``(version, files_rewritten, files_added)``; ``(None, 0, 0)`` when
    fewer than two files qualify (nothing to bin-pack).

    Why not :func:`compact`/:func:`optimize`: those rewrite the WHOLE
    snapshot, O(table) IO per run — right for a one-off re-cluster,
    wrong for the steady-state "thousands of streaming micro-batch
    commits dribbled small files" case this handles, whose cost must
    scale with the small files only.  Because no row changes
    (``data_change: false``), the streaming source skips the version
    entirely (rows were already emitted from the replaced files) and
    :func:`changes` yields an empty feed — layout maintenance stays
    invisible to consumers.

    Concurrency: appends racing the rewrite commute (re-base and
    retry); a racing commit that REMOVED any file being rewritten
    (overwrite, delete, another compaction) raises
    :class:`ConflictError` — swapping files a concurrent commit
    already dropped would resurrect their rows.

    Physical reclaim note: :func:`vacuum` frees whole data DIRS, so a
    replaced file's bytes return once nothing retained references its
    directory — compacting whole small commits (the normal case)
    frees their dirs as soon as retention expires the pre-compaction
    versions."""
    import math

    cur0 = _latest_committed(path)
    if cur0 is None:
        raise FileNotFoundError(f"no committed version under {path!r}")
    if min_bytes is None:
        min_bytes = target_bytes // 2
    candidates = cur0[1]["files"]
    if where:
        # partition/stats-scoped OPTIMIZE (the reference scopes
        # CHECKFILEGROUP to one filegroup, DIC:1476-1487): bin-pack
        # only files the manifest stats place inside ``where`` — on a
        # partitioned table a `part_col = v` predicate is EXACT (the
        # partition values fold into the stats as min==max bounds).
        # Conservative by contract: an undecidable file stays a
        # candidate, and the rewrite re-splits rows by partitionBy, so
        # scope only ever bounds IO, never correctness.
        scoped = _dml_candidates(cur0[1], where, spark=spark)
        if scoped is not None:
            candidates = scoped
    small = []
    total = 0
    for f in candidates:
        try:
            sz = os.path.getsize(_local(f))
        except OSError:
            continue  # unreadable size: leave the file alone
        if sz < min_bytes:
            small.append(f)
            total += sz
    if len(small) < 2:
        return None, 0, 0
    # the rewrite materializes the LIVE view: rows the small files'
    # deletion vectors killed are filtered before the bin-pack, so
    # compaction doubles as DV REORG (Delta's PURGE) — the swapped-in
    # files carry no DV entries and the dead bytes become vacuum food.
    # A racing DML that grows a small file's DV mid-rewrite conflicts
    # (see _commit_replace's DV-drift check) instead of resurrecting
    # its rows.
    df = _scan_live(spark, cur0[1], small)
    n_out = max(1, math.ceil(total / target_bytes))
    if zorder_by:
        # cluster the rewrite like optimize() does — the bin-packed
        # files come out with TIGHT per-file stats, so read_where
        # skipping improves as a side effect of routine maintenance
        from pyspark.sql import functions as F

        from integritychecksforvldbs_spark.sources.maintenance import (
            zorder_key,
        )

        df = (
            df.withColumn("__zorder", zorder_key(df, zorder_by))
            .repartitionByRange(n_out, F.col("__zorder"))
            .sortWithinPartitions("__zorder")
            .drop("__zorder")
        )
    else:
        df = df.coalesce(n_out)
    new_files, new_stats = _write_data(
        spark, df, path, mapping=_mapping(cur0[1]),
        partition_by=_partition_by(cur0[1]),
        transforms=_partition_transforms(cur0[1]),
    )
    v = _commit_replace(
        path, cur0[0], cur0[1], set(small), new_files, new_stats,
        mode="replace", data_change=False, commute_with_appends=True,
    )
    if v is None:
        raise ConflictError(
            f"compact_files of {path!r} lost {_MAX_COMMIT_RETRIES} CAS races"
        )
    return v, len(small), len(new_files)


def clone(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    version: int | None = None,
    timestamp: float | None = None,
) -> int:
    """SHALLOW CLONE: create ``dst_path`` as a new versioned table
    whose first commit REFERENCES the source snapshot's data files —
    zero data copied, metadata-only, O(manifest) regardless of table
    size (the Delta ``CREATE TABLE ... SHALLOW CLONE`` primitive; the
    zero-copy branch a 100 TB experimentation workflow needs).

    The clone is independent from its first commit on: appends, DML,
    compaction and constraints on either table never touch the other
    (writes land under each table's own ``data/`` root, and a clone's
    replace commits merely UN-reference source files — ``vacuum`` on
    the clone walks only the clone's data root, so it can never delete
    source bytes).  CAVEAT, same as Delta's: ``vacuum`` on the SOURCE
    does not know about clones, so expiring source versions can
    reclaim files a clone still references — clone from snapshots the
    source retains, or re-materialize (``optimize``) the clone to own
    its data."""
    if _versions(dst_path):
        raise FileExistsError(f"{dst_path!r} already has a version log")
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = version_at(src_path, timestamp)
    man = _resolve_manifest(src_path, version)
    import time

    os.makedirs(_vdir(dst_path), exist_ok=True)
    body = {
        "version": 1,
        "mode": "clone",
        "files": list(man["files"]),
        "stats": dict(man.get("stats") or {}),
        # DV sidecars are referenced like data files: zero-copy, and
        # the same source-vacuum caveat applies to them
        "dvs": dict(man.get("dvs") or {}),
        "parent": None,
        "committed_at": time.time(),
        "constraints": dict(man.get("constraints") or {}),
        "schema": man.get("schema"),
        "schema_json": man.get("schema_json"),
        **({"column_mapping": _mapping(man)} if _mapping(man) else {}),
        **({"retired_cols": _retired(man)} if _retired(man) else {}),
        # the Bloom index sidecars are referenced zero-copy, same
        # caveat as data files: vacuum on the SOURCE may reclaim them
        # (the probe then degrades to unpruned, never to wrong)
        **({"bloom": dict(man["bloom"])} if man.get("bloom") else {}),
        **(
            {"partition_by": _partition_by(man)}
            if _partition_by(man) else {}
        ),
        **(
            {"partition_transforms": _partition_transforms(man)}
            if _partition_transforms(man) else {}
        ),
        **(
            {"partition_spec_history": _partition_spec_history(man)}
            if _partition_spec_history(man) else {}
        ),
        "cloned_from": src_path,
        "cloned_version": int(man["version"]),
    }
    if not _install_manifest(dst_path, 1, body):
        raise ConflictError(
            f"clone lost the v1 race at {dst_path!r} — another writer "
            "is creating the same table"
        )
    _write_latest_hint(dst_path, 1)
    return 1


def convert_to_versioned(
    spark: SparkSession,
    source_dir: str,
    path: str,
    stats_columns: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """CONVERT an existing plain-parquet directory into a versioned
    table — ZERO bytes copied or moved (Delta's ``CONVERT TO DELTA``):
    version 1's manifest simply REFERENCES the part-files where they
    already live, with a one-pass footer census for the stats every
    pruning path reads.  At 100 TB this is the only viable migration
    door — a rewrite would be days of IO for a metadata-sized fact.

    The source files stay in place and are treated as immutable from
    here on: ``vacuum`` walks only ``{path}/data``, so it can never
    reclaim them (the clone caveat, in reverse — deleting the source
    dir breaks the versions that reference it); ``optimize``/
    ``compact`` progressively materialize rewrites under the table
    root when the table should come to own its bytes.

    Schema: recorded from the normalized :func:`~.loader.load_table`
    read UNLESS the source carries parquet timestamp physical types a
    plain schema'd scan cannot reproduce (INT64 TIMESTAMP(NANOS) /
    NTZ — see loader.py); then the manifest records no schema and
    every scan takes the legacy load_table path, which applies the
    same normalizations query-by-query.

    ``partition_by``: REQUIRED when the source is hive-partitioned
    (``col=value/`` directories — Delta's ``CONVERT TO DELTA ...
    PARTITIONED BY`` takes the same declaration): the partition
    columns live in directory names, not footers, so converting
    without declaring them would silently drop those columns from
    every read.  The conversion stays zero-copy — the manifest
    records ``partition_by`` and folds each file's directory values
    into its stats, exactly like a natively partitioned commit."""
    if _versions(path):
        raise FileExistsError(f"{path!r} already has a version log")
    from integritychecksforvldbs_spark.sources.catalog import (
        list_parquet_files,
    )

    files = sorted(f.path for f in list_parquet_files(spark, source_dir))
    if not files:
        raise ValueError(f"no parquet files under {source_dir!r}")
    discovered: set[str] = set()
    for f in files:
        discovered.update(_partition_segments(f))
    if discovered and partition_by is None:
        raise ValueError(
            f"{source_dir!r} is hive-partitioned (directory columns "
            f"{sorted(discovered)}); pass partition_by=[...] so the "
            "conversion keeps those columns — converting without the "
            "declaration would silently drop them from every read"
        )
    if partition_by is not None and set(partition_by) != discovered:
        raise ValueError(
            f"partition_by {partition_by} does not match the source's "
            f"directory columns {sorted(discovered)}"
        )
    # EVERY file's footer is probed (r10 advice: sampling files[:1]
    # missed heterogeneous directories whose later part-files carry
    # the hazard — the very mis-read the check exists for), as a
    # distributed footer sweep with a short-circuiting take(1) — the
    # same O(files) executor IO the stats census below already pays.
    # timestamp[ns] is tz-less, so the single tz-is-None test covers
    # both the NANOS and the NTZ physical shapes.
    def _file_hazard(p: str) -> bool:
        import pyarrow.parquet as pq

        local = p[len("file:"):] if p.startswith("file:") else p
        sch_arrow = pq.ParquetFile(local).schema_arrow
        return any(
            str(t).startswith("timestamp")
            and getattr(t, "tz", None) is None
            for t in sch_arrow.types
        )

    try:
        sc = spark.sparkContext
        n_slices = max(
            1, min(len(files), (sc.defaultParallelism or 8) * 4)
        )
        hazard = bool(
            sc.parallelize(files, n_slices)
            .map(_file_hazard)
            .filter(lambda h: h)
            .take(1)
        )
    except Exception:
        hazard = True  # unknown physical types: take the safe path
    from integritychecksforvldbs_spark.sources.loader import load_table

    if partition_by:
        if hazard:
            raise ValueError(
                f"{source_dir!r} mixes hive partitioning with "
                "nanos/NTZ timestamp physical types; the schema-less "
                "legacy scan cannot reconstruct partition columns — "
                "normalize the timestamps (rewrite) before converting"
            )
        # discovery infers the partition columns' types from the
        # directory values, exactly what the scan path will replan
        df = (
            spark.read.option("basePath", source_dir)
            .parquet(source_dir)
        )
        missing = [c for c in partition_by if c not in df.columns]
        if missing:
            raise ValueError(
                f"partition columns {missing} not discovered under "
                f"{source_dir!r}"
            )
        pdtypes = {f.name: f.dataType for f in df.schema.fields}
        for c in partition_by:
            _check_part_dtype(c, pdtypes[c])
    else:
        df = load_table(spark, *files)
    if stats_columns is None:
        stats_columns = _stats_eligible_columns(df.schema)
    stats = _file_stats_for_dir(spark, source_dir, stats_columns)
    if partition_by:
        # fold the directory values into each file's stats, exactly
        # like a natively partitioned commit (footers cannot carry
        # partition columns)
        for f in files:
            ent = stats.get(f)
            if ent is None:
                continue
            seg = _partition_segments(f)
            for c in partition_by:
                v = _typed_part_value(seg[c], pdtypes[c])
                ent["cols"][c] = {
                    "min": _enc_stat(v),
                    "max": _enc_stat(v),
                    "nulls": 0 if v is not None else ent["n_rows"],
                    "ok": True,
                    "nulls_ok": True,
                }
    import time

    body = {
        "version": 1,
        "mode": "convert",
        "files": files,
        "stats": {f: stats[f] for f in files if f in stats},
        "dvs": {},
        "parent": None,
        "committed_at": time.time(),
        "constraints": {},
        "schema": None if hazard else df.schema.simpleString(),
        "schema_json": None if hazard else df.schema.jsonValue(),
        **({"partition_by": list(partition_by)} if partition_by else {}),
        "converted_from": source_dir,
    }
    os.makedirs(_vdir(path), exist_ok=True)
    if not _install_manifest(path, 1, body):
        raise ConflictError(
            f"convert lost the v1 race at {path!r} — another writer is "
            "creating the same table"
        )
    _write_latest_hint(path, 1)
    return 1


def versioned_batch_sink(
    table_path: str,
    mode: str = "append",
    keys: list[str] | None = None,
    clauses: list[dict] | None = None,
):
    """``foreachBatch`` writer committing each micro-batch into a
    versioned table, exactly-once via the version log itself: the
    ``batch_id`` rides INSIDE the manifest body that the commit CAS
    installs, so "data visible" and "batch recorded" are one atomic
    event — a replayed batch whose id already appears in history is a
    no-op, and there is no separate ledger file whose update could
    crash apart from the data swap (the window the plain-parquet
    sinks need ``.bak`` dances for).

    ``mode="merge"`` (requires ``keys``) UPSERTS each micro-batch by
    key through :func:`merge_into` instead of appending — the
    streaming-CDC sink shape Delta documents as foreachBatch+MERGE,
    exactly-once by the same in-body batch_id (the merge's single
    replace commit carries it).  Batches must be unique on ``keys``
    (merge_into's own ambiguous-upsert refusal applies); compact a
    change stream to its latest row per key first (e.g.
    ``scd.cdc_latest_snapshot``).

    ``clauses`` (with ``mode="merge"``) routes each batch through the
    CONDITIONAL :func:`merge_when` form instead of the upsert-all fast
    path — the full CDC shape (r10 verdict gap #4): ``WHEN MATCHED AND
    s.op='D' THEN DELETE`` makes delete-bearing change streams land as
    deletes, with the same atomic in-body batch_id so replays stay
    no-ops."""
    if mode == "merge" and not keys:
        raise ValueError('versioned_batch_sink(mode="merge") needs keys')
    if clauses and mode != "merge":
        raise ValueError(
            'versioned_batch_sink clauses need mode="merge"'
        )
    if mode not in ("append", "overwrite", "merge"):
        raise ValueError(f"unknown sink mode {mode!r}")

    def write(df: DataFrame, batch_id: int) -> None:
        for v in _versions(table_path):
            man = _read_manifest(table_path, v)
            if man is not None and man.get("batch_id") == int(batch_id):
                return  # replayed batch: already committed
        if df.isEmpty():
            return
        if mode == "merge":
            if clauses:
                if _latest_committed(table_path) is None:
                    raise FileNotFoundError(
                        "versioned_batch_sink(clauses=...) needs an "
                        f"existing target table at {table_path!r}: a "
                        "conditional merge cannot derive the target "
                        "schema from a change batch (the batch carries "
                        "CDC columns the table must not) — create it "
                        "first, e.g. commit(spark, df.limit(0), path)"
                    )
                merge_when(
                    df.sparkSession, table_path, df, list(keys),
                    clauses, extra={"batch_id": int(batch_id)},
                )
                return
            merge_into(
                df.sparkSession, table_path, df, list(keys),
                extra={"batch_id": int(batch_id)},
            )
            return
        commit(
            df.sparkSession, df, table_path, mode=mode,
            extra={"batch_id": int(batch_id)},
        )

    return write


DEFAULT_VACUUM_MIN_AGE_S = 3600.0


def vacuum(
    path: str,
    keep_versions: int | None = None,
    min_age_s: float = DEFAULT_VACUUM_MIN_AGE_S,
    dry_run: bool = False,
) -> list[str]:
    """Reclaim data files no retained manifest references: crash
    orphans (written but never committed); files visible only in
    versions OLDER than the last ``keep_versions`` when given
    (bounding time-travel depth — the expired manifests are removed
    too, so no reader can resolve a version whose files are gone).
    Returns the deleted paths (whole data dirs, or individual files
    for directories a retained version still partially references).

    When the OLDEST retained version is a delta, its folded snapshot
    is first materialized as a checkpoint sidecar
    (:func:`_write_checkpoint`), so its base chain — and the files
    only the chain referenced — can expire with everything below the
    horizon (Delta's checkpoint-then-clean-the-log discipline).
    Reclamation is FILE-granular: a file a replace commit swapped out
    (file-scoped DELETE/UPDATE/MERGE, compaction) is physically
    removed even when siblings in its directory stay live — which is
    what makes ``delete_where`` + ``vacuum(keep_versions=1)`` a real
    right-to-be-forgotten erasure, not just an unreferencing.

    ``min_age_s`` protects IN-FLIGHT commits: a committer that has
    written its data directory but not yet won the manifest CAS looks
    exactly like a crash orphan, so unreferenced files/directories
    younger than the threshold are left alone (the same retention
    reasoning behind Delta's VACUUM default).  Lower it only when no
    commit can be running."""
    import time

    hist = [vi.version for vi in history(path)]
    retained = hist if keep_versions is None else hist[-keep_versions:]
    if hist and not retained:
        raise ValueError("keep_versions must retain at least one version")
    expiring = bool(retained) and retained[0] != (hist[0] if hist else None)
    if retained and expiring and not dry_run:
        # un-pin the oldest retained tip from its delta-base chain
        # BEFORE expiring anything the chain resolves through
        if "files" not in _read_manifest(path, retained[0]):
            _write_checkpoint(path, retained[0])
            if "files" not in _read_manifest(path, retained[0]):
                raise IOError(
                    f"checkpoint of v{retained[0]} of {path!r} is not "
                    "readable; refusing to expire its base chain"
                )
    referenced: set[str] = set()
    referenced_dvs: set[str] = set()
    referenced_bloom: set[str] = set()
    for v in retained:
        man = _read_manifest(path, v)
        if dry_run and "files" not in man:
            # report-only: fold through the (still intact) chain
            man = _fold(path, man)
        snap = _fold(path, man)
        for fpath in snap["files"]:
            referenced.add(_local(fpath))
        for e in (snap.get("dvs") or {}).values():
            referenced_dvs.add(_local(e["path"]))
        for e in (snap.get("bloom") or {}).values():
            referenced_bloom.add(_local(e["index"]))
    removed = []
    import shutil

    data_root = os.path.join(_local(path), "data")
    try:
        dirs = sorted(os.listdir(data_root))
    except FileNotFoundError:
        dirs = []

    now = time.time()
    # top-level dirs a retained file lives under (one uuid write dir,
    # or a col=value partition dir whose files span many commits)
    referenced_top = set()
    for f in referenced:
        rel = os.path.relpath(f, data_root)
        if not rel.startswith(".."):
            referenced_top.add(rel.split(os.sep, 1)[0])
    for d in dirs:
        full = os.path.join(data_root, d)
        try:
            age = now - os.path.getmtime(full)
        except OSError:
            continue  # racing removal
        if d not in referenced_top:
            if age < min_age_s:
                continue  # possibly an in-flight commit's data — retain
            if not dry_run:
                shutil.rmtree(full)
            removed.append(full)
            continue
        # partially referenced dir: remove the individual files a
        # replace commit swapped out (age-guarded per file); the walk
        # is RECURSIVE — partition layouts nest col=value dirs, and
        # the one-level walk would have missed (or worse, whole-dir
        # reclaimed) files under them
        for dirpath, _subdirs, names in os.walk(full, topdown=False):
            for n in names:
                if not n.endswith(".parquet"):
                    continue
                fp = os.path.join(dirpath, n)
                if fp in referenced:
                    continue
                try:
                    if now - os.path.getmtime(fp) < min_age_s:
                        continue
                except OSError:
                    continue
                if not dry_run:
                    try:
                        os.unlink(fp)
                    except FileNotFoundError:
                        continue
                    crc = os.path.join(dirpath, f".{n}.crc")
                    try:
                        os.unlink(crc)
                    except FileNotFoundError:
                        pass
                removed.append(fp)
            # bottom-up: prune a partition dir emptied by the removals
            if not dry_run and dirpath != full:
                try:
                    if not os.listdir(dirpath):
                        os.rmdir(dirpath)
                except OSError:
                    pass
    from integritychecksforvldbs_spark.sources.deletion_vectors import (
        dv_root,
    )

    dvr = dv_root(path)
    try:
        dv_names = sorted(os.listdir(dvr))
    except FileNotFoundError:
        dv_names = []
    for n in dv_names:
        fp = os.path.join(dvr, n)
        if fp in referenced_dvs:
            continue
        try:
            if now - os.path.getmtime(fp) < min_age_s:
                continue  # possibly an in-flight DML's sidecar
        except OSError:
            continue
        if not dry_run:
            try:
                os.unlink(fp)
            except FileNotFoundError:
                continue
        removed.append(fp)
    # Bloom index dirs no retained manifest points at (superseded
    # builds, crash orphans) — age-guarded like everything else
    broot = _bloom_root(path)
    try:
        bloom_dirs = sorted(os.listdir(broot))
    except FileNotFoundError:
        bloom_dirs = []
    for n in bloom_dirs:
        full = os.path.join(broot, n)
        if full in referenced_bloom:
            continue
        try:
            if now - os.path.getmtime(full) < min_age_s:
                continue  # possibly an in-flight build's sidecar
        except OSError:
            continue
        if not dry_run:
            shutil.rmtree(full, ignore_errors=True)
        removed.append(full)
    if dry_run:
        return removed  # report-only: no manifest or litter removal
    # expire manifests NEWEST-FIRST: a delta body is always removed
    # before the base it folds through, so a crash (or a concurrent
    # history()/vacuum() reader) at ANY intermediate state leaves only
    # chains that still resolve — ascending order could delete a
    # delta's base first, and the surviving orphan delta would brick
    # every later history()/vacuum() with FileNotFoundError until
    # someone hand-repaired the log
    for v in reversed(hist):
        if v not in retained:
            _remove_manifest(path, v)
    if retained:
        # manifests below the retained floor that history() no longer
        # reports — orphan deltas whose chain an interrupted pre-r9
        # vacuum broke — are expired residue; remove them so cleanup
        # converges instead of littering forever
        for v in _versions(path):
            if v < retained[0]:
                _remove_manifest(path, v)
    # crashed-committer residue, age-guarded (a slow committer may
    # still be mid-install): stale .tmp manifest bodies that never
    # linked into place, and legacy bodyless claim DIRS below the
    # latest committed version (old two-step protocol's corpses; a
    # higher legacy slot may belong to an in-flight legacy commit)
    try:
        names = os.listdir(_vdir(path))
    except FileNotFoundError:
        names = []
    for n in names:
        if not n.startswith(".tmp-"):
            continue
        full = os.path.join(_vdir(path), n)
        try:
            if now - os.path.getmtime(full) >= min_age_s:
                os.unlink(full)
        except OSError:
            pass  # racing removal / concurrent install
    # parquet checkpoint sidecars no live body references — a CAS
    # loser's write, or residue of a hand-pruned manifest; each
    # sidecar's name is unique per write attempt, so the version's
    # surviving bodies name exactly the ones to keep (age-guarded:
    # an in-flight commit writes its sidecar BEFORE installing the
    # manifest that will reference it)
    import re as _re

    pq_pat = _re.compile(r"^v(\d{10})~files-[0-9a-f]+\.parquet$")
    for n in names:
        m = pq_pat.match(n)
        if m is None:
            continue
        v = int(m.group(1))
        refs = set()
        for name2 in (_vname(v) + ".json", _ckpt_key(v) + ".json"):
            try:
                with open(os.path.join(_vdir(path), name2)) as f:
                    body = json.load(f)
                if body.get("ckpt_files"):
                    refs.add(body["ckpt_files"])
            except (FileNotFoundError, json.JSONDecodeError):
                pass
        if n in refs:
            continue
        full = os.path.join(_vdir(path), n)
        try:
            if now - os.path.getmtime(full) >= min_age_s:
                os.unlink(full)
        except OSError:
            pass
    top = retained[-1] if retained else 0
    for v in _versions(path):
        if v >= top or _read_manifest(path, v) is not None:
            continue
        vd = os.path.join(_vdir(path), _vname(v))
        if not os.path.isdir(vd):
            continue
        try:
            if now - os.path.getmtime(vd) < min_age_s:
                continue
        except OSError:
            continue
        shutil.rmtree(vd)
    return removed


def _remove_manifest(path: str, v: int) -> None:
    """Remove version ``v``'s manifest artifact in whichever layout it
    was written (atomic file, legacy directory, or backend record)."""
    import shutil

    b = _backend_for(path)
    if b is not None:
        for key in (_vname(v), _ckpt_key(v)):
            rec = b.get(key)
            if rec is not None:
                b.delete_if(key, rec.version)
        return
    import glob as _glob

    for name in (_vname(v) + ".json", _ckpt_key(v) + ".json"):
        try:
            os.unlink(os.path.join(_vdir(path), name))
        except FileNotFoundError:
            pass
    # parquet checkpoint sidecars (commit-time and ~ckpt) of this
    # version — named vN~files-<uuid>.parquet, owned by the manifests
    # just removed
    for p in _glob.glob(
        os.path.join(_vdir(path), _vname(v) + "~files-*.parquet")
    ):
        try:
            os.unlink(p)
        except FileNotFoundError:
            pass
    d = os.path.join(_vdir(path), _vname(v))
    if os.path.isdir(d):
        shutil.rmtree(d)
