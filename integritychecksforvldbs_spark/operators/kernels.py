"""Integrity-check compute kernels (SURVEY §2.9).

The reference delegates these to SQL Server's ``DBCC`` engine; here
each kernel is a distributed Spark validation query:

- **CHECKTABLE** — ONE wide single-pass aggregation per table fusing
  row count, PK null/duplicate detection, NOT-NULL counters, and every
  DATA_PURITY domain rule (IC:684-687 runs one pass per table; so do
  we).  The aggregation is compiled from :mod:`..expectations` into
  ANSI-SQL expressions that are valid in both Spark SQL and DuckDB, so
  the exact same check list is the correctness oracle.
- **CHECKALLOC** — file-level allocation integrity from parquet
  footers: every pinned file exists, parses, is non-empty; footer row
  counts sum consistently (IC:547-548 analogue). Footer reads are
  distributed (sources.catalog.footer_stats_df).
- **CHECKCATALOG** — catalog↔storage consistency: table location has
  files, schema is readable, footer schemas agree across files, and
  (when a declared schema is registered) declared == stored
  (IC:554-555 analogue).
- **EXTENDED_LOGICAL_CHECKS** — FK-orphan probes via left-anti joins
  with small parents broadcast (DIC:1361 analogue).
- **CHECKDB** — composition of the above over a whole namespace
  (DIC:1352-1365).

Everything stays JVM-side (built-in functions only — no Python UDFs),
so WholeStageCodegen covers the scan→agg pipeline and predicate
pushdown/column pruning reach the parquet reader.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..expectations import TableExpectations, expectations_for
from ..sources.catalog import FileMeta, ObjectMeta, footer_stats_df
from ..sources.loader import load_table

BROADCAST_THRESHOLD_BYTES = 256 * 1024 * 1024  # dims under this broadcast


# ---------------------------------------------------------------------------
# CHECKTABLE expression compiler (portable Spark SQL + DuckDB)
# ---------------------------------------------------------------------------

def _pk_distinct(cols: list[str], dialect: str) -> str:
    """COUNT of distinct fully-non-null key tuples, per engine.

    Spark's multi-arg COUNT(DISTINCT a, b) skips rows with any NULL
    and groups natively on the columns (no string concatenation in
    the hot aggregation path — at 100 TB the concat dominates).
    DuckDB has no multi-arg form; its row-value variant counts
    partially-null rows, so a FILTER reproduces Spark's semantics.
    Both equal the old concat_ws formulation, without its (tiny)
    separator-collision risk.
    """
    nn = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    if len(cols) == 1:
        return f"COUNT(DISTINCT {cols[0]})"
    if dialect == "spark":
        return "COUNT(DISTINCT " + ", ".join(cols) + ")"
    return f"COUNT(DISTINCT ({', '.join(cols)})) FILTER (WHERE {nn})"


def checktable_agg_exprs(
    exp: TableExpectations, physical_only: bool = False, dialect: str = "spark"
) -> list[tuple[str, str]]:
    """(alias, SQL aggregate expression) pairs for one table.

    One list IS the pinned DATA_PURITY definition (SURVEY §7.4 risk 4);
    every expression is identical across engines except the PK-distinct
    form (see :func:`_pk_distinct`).  All counters cast to BIGINT so
    result schemas agree.
    """
    exprs: list[tuple[str, str]] = [("n_rows", "CAST(COUNT(*) AS BIGINT)")]
    if physical_only:
        return exprs
    for c in exp.not_null:
        exprs.append(
            (f"null_{c}", f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)")
        )
    if exp.primary_key:
        nn = " AND ".join(f"{c} IS NOT NULL" for c in exp.primary_key)
        null_any = f"SUM(CASE WHEN NOT ({nn}) THEN 1 ELSE 0 END)"
        distinct = _pk_distinct(exp.primary_key, dialect)
        exprs.append(("pk_null_rows", f"CAST({null_any} AS BIGINT)"))
        exprs.append(("pk_dup_rows", f"CAST(COUNT(*) - {null_any} - {distinct} AS BIGINT)"))
    for rule in exp.domain_rules:
        exprs.append(
            (
                f"viol_{rule.name}",
                f"CAST(SUM(CASE WHEN NOT {rule.predicate} THEN 1 ELSE 0 END) AS BIGINT)",
            )
        )
    return exprs


def checktable_df(
    df: DataFrame, exp: TableExpectations, physical_only: bool = False
) -> DataFrame:
    """The one-pass CHECKTABLE aggregation as a one-row DataFrame."""
    exprs = checktable_agg_exprs(exp, physical_only, dialect="spark")
    return df.agg(*[F.expr(sql).alias(alias) for alias, sql in exprs])


def checktable_oracle_sql(
    table: str, exp: TableExpectations | None = None, physical_only: bool = False
) -> str:
    """The identical aggregation in DuckDB SQL for the oracle."""
    exp = exp or expectations_for(table)
    exprs = checktable_agg_exprs(exp, physical_only, dialect="duckdb")
    cols = ",\n  ".join(f"{sql} AS {alias}" for alias, sql in exprs)
    return f"SELECT\n  {cols}\nFROM {table}"


# ---------------------------------------------------------------------------
# Kernel results
# ---------------------------------------------------------------------------

@dataclass
class KernelResult:
    kind: str
    database: str
    object: str | None
    passed: bool
    metrics: dict[str, Any] = field(default_factory=dict)
    errors: list[str] = field(default_factory=list)

    @property
    def error_number(self) -> int:
        return 0 if self.passed else 8900  # generic DBCC-style failure code


_NON_VIOLATION_METRICS = {"n_rows", "vector_len_min", "vector_len_max"}


def run_checktable(
    spark: SparkSession,
    df: DataFrame,
    database: str,
    table: str,
    exp: TableExpectations | None = None,
    physical_only: bool = False,
) -> KernelResult:
    """Execute CHECKTABLE; pass iff every violation counter is zero."""
    exp = exp or expectations_for(table)
    row = checktable_df(df, exp, physical_only).collect()[0].asDict()
    errors = [
        f"{k} = {v}"
        for k, v in row.items()
        if k not in _NON_VIOLATION_METRICS and v not in (0, None)
    ]
    # embeddings-style table-level invariant: one consistent vector length
    if not physical_only and "embedding" in df.columns:
        lens = df.agg(
            F.min(F.size("embedding")).alias("vector_len_min"),
            F.max(F.size("embedding")).alias("vector_len_max"),
        ).collect()[0]
        row["vector_len_min"] = lens["vector_len_min"]
        row["vector_len_max"] = lens["vector_len_max"]
        if lens["vector_len_min"] != lens["vector_len_max"] or (
            lens["vector_len_min"] is not None and lens["vector_len_min"] <= 0
        ):
            errors.append(
                f"inconsistent vector length [{lens['vector_len_min']}, {lens['vector_len_max']}]"
            )
    return KernelResult("CHECKTABLE", database, table, not errors, row, errors)


# ---------------------------------------------------------------------------
# CHECKALLOC / CHECKCATALOG / EXTENDED / CHECKDB
# ---------------------------------------------------------------------------

def run_checkalloc(
    spark: SparkSession,
    obj: ObjectMeta,
    full: bool = False,
) -> KernelResult:
    """File-allocation integrity for one table's pinned file list.

    Footer-only by default (the PHYSICAL_ONLY fast path, SURVEY §2.9
    #52); ``full=True`` additionally scans data pages by comparing an
    actual read count against the footer sum.
    """
    errors: list[str] = []
    if not obj.files:
        return KernelResult(
            "CHECKALLOC", obj.database_name, obj.object_name, False, {}, ["no data files"]
        )
    stats = footer_stats_df(spark, obj.files)
    agg = stats.agg(
        F.count("*").alias("n_files"),
        F.sum(F.when(~F.col("footer_ok"), 1).otherwise(0)).alias("bad_files"),
        F.sum(F.when(F.col("size") == 0, 1).otherwise(0)).alias("zero_byte_files"),
        F.sum("footer_row_count").alias("footer_rows"),
    ).collect()[0]
    metrics = {
        "n_files": agg["n_files"],
        "bad_files": agg["bad_files"],
        "zero_byte_files": agg["zero_byte_files"],
        "footer_rows": agg["footer_rows"],
        "total_bytes": obj.total_bytes,
    }
    if agg["bad_files"]:
        for r in stats.filter(~F.col("footer_ok")).select("path", "error").collect():
            errors.append(f"unreadable footer: {r['path']}: {r['error']}")
    if agg["zero_byte_files"]:
        errors.append(f"{agg['zero_byte_files']} zero-byte file(s)")
    if full and not errors:
        actual = load_table(spark, *[f.path for f in obj.files]).count()
        metrics["scanned_rows"] = actual
        if actual != agg["footer_rows"]:
            errors.append(f"scan count {actual} != footer sum {agg['footer_rows']}")
    return KernelResult(
        "CHECKALLOC", obj.database_name, obj.object_name, not errors, metrics, errors
    )


def _arrow_schema(path: str) -> list[tuple[str, str]]:
    import pyarrow.parquet as pq

    local = path[len("file:") :] if path.startswith("file:") else path
    sch = pq.ParquetFile(local).schema_arrow
    return [(f.name, str(f.type)) for f in sch]


def run_checkcatalog(
    spark: SparkSession,
    objs: list[ObjectMeta],
    declared_schemas: dict[str, list[tuple[str, str]]] | None = None,
) -> KernelResult:
    """Metastore↔storage consistency for a whole namespace.

    Checks per table: location has ≥1 file; a schema is readable; all
    files agree on schema; declared schema (when registered) matches
    the stored footer schema name-for-name, type-for-type.
    """
    errors: list[str] = []
    declared_schemas = declared_schemas or {}
    db = objs[0].database_name if objs else "?"
    for o in objs:
        if not o.files:
            errors.append(f"{o.object_name}: location has no data files")
            continue
        try:
            schemas = {tuple(_arrow_schema(f.path)) for f in o.files}
        except Exception as exc:
            errors.append(f"{o.object_name}: unreadable schema: {exc}")
            continue
        if len(schemas) > 1:
            errors.append(f"{o.object_name}: files disagree on schema ({len(schemas)} variants)")
            continue
        stored = list(next(iter(schemas)))
        declared = declared_schemas.get(o.object_name)
        if declared is not None and [tuple(x) for x in declared] != [tuple(x) for x in stored]:
            errors.append(
                f"{o.object_name}: declared schema {declared} != stored {stored}"
            )
    return KernelResult(
        "CHECKCATALOG", db, None, not errors, {"n_objects": len(objs)}, errors
    )


def fk_orphan_counts_df(
    tables: dict[str, DataFrame],
    exp: TableExpectations,
    broadcast_parents: set[str] | None = None,
) -> DataFrame:
    """EXTENDED_LOGICAL_CHECKS tier: one row per FK with its orphan
    count (child rows whose key has no parent), via left-anti joins.

    Join strategy is left to Catalyst/AQE by default: parquet-backed
    parents under ``spark.sql.autoBroadcastJoinThreshold`` become
    broadcast-hash anti-joins (fact side streams, no shuffle); larger
    parents fall back to shuffle joins — forcing a broadcast of, say,
    the orders table at 100 TB would OOM every executor.  Callers
    that KNOW a parent is dimension-sized can name it in
    ``broadcast_parents`` to pin the hint.

    When EVERY parent of the child is broadcast-able, the probes fuse
    into ONE scan of the child — N broadcast left-joins feeding a
    single wide aggregation (a fact table with 3 FKs is read once,
    not 3×); otherwise each FK falls back to its own anti-join.
    """
    spark = tables[exp.table].sparkSession
    broadcast_parents = broadcast_parents or set()
    child = tables[exp.table]
    if exp.foreign_keys and all(
        fk.parent_table in broadcast_parents for fk in exp.foreign_keys
    ):
        return _fk_orphan_counts_fused(tables, exp)
    out: DataFrame | None = None
    for fk in exp.foreign_keys:
        parent = tables[fk.parent_table]
        if fk.parent_table in broadcast_parents:
            parent = F.broadcast(parent)
        cond = [
            child[c] == parent[p] for c, p in zip(fk.columns, fk.parent_columns)
        ]
        nn = child
        for c in fk.columns:
            nn = nn.filter(F.col(c).isNotNull())
        orphans = nn.join(parent, cond, "left_anti")
        one = orphans.agg(F.count("*").cast("long").alias("orphan_rows")).select(
            F.lit(exp.table).alias("child_table"),
            F.lit("_".join(fk.columns)).alias("fk_columns"),
            F.lit(fk.parent_table).alias("parent_table"),
            "orphan_rows",
        )
        out = one if out is None else out.unionByName(one)
    if out is None:
        from pyspark.sql import types as T

        out = spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("child_table", T.StringType()),
                    T.StructField("fk_columns", T.StringType()),
                    T.StructField("parent_table", T.StringType()),
                    T.StructField("orphan_rows", T.LongType()),
                ]
            ),
        )
    return out


def fk_orphan_counts_union_sql(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    exps: list[TableExpectations],
    broadcast_parents: set[str] | None = None,
) -> DataFrame:
    """Every child's FK orphan counts in ONE ``spark.sql`` call.

    Semantically identical to unioning :func:`fk_orphan_counts_df`
    over ``exps`` — same fused broadcast chain per all-small-parent
    child (COALESCE'd single-partition parent dedup for multi-FK
    children, BROADCAST-hinted left joins, one conditional-count
    aggregation, ``inline``-unpivoted to the per-FK schema) and the
    same per-FK LEFT ANTI fallback when any parent is too big to
    broadcast.  The difference is pure construction cost: building
    the N-child chain through the DataFrame API is ~150 py4j round
    trips and one analyzer pass per ``join``/``unionByName`` (measured
    0.63 s of the 1.2 s query at sf0.1, ~54%); one parsed SQL text is
    a single parse + ONE analysis pass (guide §7.3 — plan
    construction is serial driver time no executor can hide).
    """
    broadcast_parents = broadcast_parents or set()
    arms: list[str] = []
    refs: dict[str, DataFrame] = {}

    def ref(t: str) -> str:
        key = f"t_{t}"
        refs[key] = tables[t]
        return "{" + key + "}"

    for exp in exps:
        if not exp.foreign_keys:
            continue
        fused = all(
            fk.parent_table in broadcast_parents for fk in exp.foreign_keys
        )
        if fused:
            dedup = len(exp.foreign_keys) > 1
            child_cols = sorted(
                {c for fk in exp.foreign_keys for c in fk.columns}
            )
            joins, counters, structs, hints = [], [], [], []
            for idx, fk in enumerate(exp.foreign_keys):
                alias = f"p{idx}"
                hints.append(f"BROADCAST({alias})")
                proj = ", ".join(
                    f"{p} AS _p{idx}_{i}"
                    for i, p in enumerate(fk.parent_columns)
                )
                inner = f"SELECT /*+ COALESCE(1) */ {proj} FROM {ref(fk.parent_table)}"
                side = (
                    f"(SELECT DISTINCT * FROM ({inner}))"
                    if dedup
                    else f"(SELECT {proj} FROM {ref(fk.parent_table)})"
                )
                on = " AND ".join(
                    f"c.{c} = {alias}._p{idx}_{i}"
                    for i, c in enumerate(fk.columns)
                )
                joins.append(f"LEFT JOIN {side} {alias} ON {on}")
                nn = " AND ".join(
                    f"c.{c} IS NOT NULL" for c in fk.columns
                )
                counters.append(
                    f"CAST(SUM(CASE WHEN {nn} AND {alias}._p{idx}_0 IS NULL "
                    f"THEN 1 ELSE 0 END) AS BIGINT) AS _o{idx}"
                )
                structs.append(
                    f"named_struct("
                    f"'child_table', '{exp.table}', "
                    f"'fk_columns', '{'_'.join(fk.columns)}', "
                    f"'parent_table', '{fk.parent_table}', "
                    f"'orphan_rows', _o{idx})"
                )
            child = (
                f"(SELECT {', '.join(child_cols)} FROM {ref(exp.table)}) c"
            )
            agg = (
                f"SELECT /*+ {', '.join(hints)} */ {', '.join(counters)} "
                f"FROM {child} {' '.join(joins)}"
            )
            arms.append(
                f"SELECT inline(array({', '.join(structs)})) FROM ({agg})"
            )
        else:
            for fk in exp.foreign_keys:
                nn = " AND ".join(
                    f"{c} IS NOT NULL" for c in fk.columns
                )
                on = " AND ".join(
                    f"c.{cc} = p.{pc}"
                    for cc, pc in zip(fk.columns, fk.parent_columns)
                )
                hint = (
                    "/*+ BROADCAST(p) */ "
                    if fk.parent_table in broadcast_parents
                    else ""
                )
                arms.append(
                    f"SELECT {hint}"
                    f"'{exp.table}' AS child_table, "
                    f"'{'_'.join(fk.columns)}' AS fk_columns, "
                    f"'{fk.parent_table}' AS parent_table, "
                    f"CAST(COUNT(*) AS BIGINT) AS orphan_rows "
                    f"FROM (SELECT {', '.join(fk.columns)} FROM {ref(exp.table)} "
                    f"WHERE {nn}) c "
                    f"LEFT ANTI JOIN {ref(fk.parent_table)} p ON {on}"
                )
    if not arms:
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("child_table", T.StringType()),
                    T.StructField("fk_columns", T.StringType()),
                    T.StructField("parent_table", T.StringType()),
                    T.StructField("orphan_rows", T.LongType()),
                ]
            ),
        )
    return spark.sql("\nUNION ALL\n".join(arms), **refs)


def _fk_orphan_counts_fused(
    tables: dict[str, DataFrame], exp: TableExpectations
) -> DataFrame:
    """All FK probes of one child in ONE pass: the child's key columns
    stream through N broadcast left-joins against parent keys, orphan
    flags are counted in a single aggregation, and the one-row result
    unpivots to the per-FK output schema.  No shuffle touches child
    data (partial aggregation map-side).

    Parent keys are deduplicated ONLY for multi-FK children: a left
    join counts an orphan (zero-match) row exactly once no matter how
    duplicated the parent side is, so single-FK orphan counts are
    exact as-is — but when joins chain, an earlier join's dup-key
    fan-out would multiply a later FK's orphan rows."""
    dedup_parents = len(exp.foreign_keys) > 1
    child_cols = sorted({c for fk in exp.foreign_keys for c in fk.columns})
    j = tables[exp.table].select(*child_cols)
    for idx, fk in enumerate(exp.foreign_keys):
        parent = tables[fk.parent_table].select(
            *[
                F.col(p).alias(f"_p{idx}_{i}")
                for i, p in enumerate(fk.parent_columns)
            ]
        )
        if dedup_parents:
            # single-partition dedup: the fused path only fires for
            # catalog-proven broadcast-small parents, so one task holds
            # the keys comfortably and the distinct loses its
            # partial→Exchange→final shuffle (one AQE stage round-trip
            # per parent instead of three).
            parent = parent.coalesce(1).dropDuplicates()
        # name-based refs: the _p{idx}_{i} aliases are unique across the
        # whole chain, so F.col never ambiguates — and unlike df[c]
        # attribute refs it does not force a re-analysis of the growing
        # join plan on every iteration (O(N^2) driver work for an
        # N-join chain).
        cond = [
            F.col(c) == F.col(f"_p{idx}_{i}") for i, c in enumerate(fk.columns)
        ]
        j = j.join(F.broadcast(parent), cond, "left")
    counters = []
    for idx, fk in enumerate(exp.foreign_keys):
        nn = F.expr(" AND ".join(f"{c} IS NOT NULL" for c in fk.columns))
        miss = F.col(f"_p{idx}_0").isNull()
        counters.append(
            F.sum(F.when(nn & miss, 1).otherwise(0))
            .cast("long")
            .alias(f"_orphans_{idx}")
        )
    agg = j.agg(*counters)
    structs = [
        F.struct(
            F.lit(exp.table).alias("child_table"),
            F.lit("_".join(fk.columns)).alias("fk_columns"),
            F.lit(fk.parent_table).alias("parent_table"),
            F.col(f"_orphans_{idx}").alias("orphan_rows"),
        )
        for idx, fk in enumerate(exp.foreign_keys)
    ]
    return agg.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def run_extended_logical(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    database: str,
    table: str,
    exp: TableExpectations | None = None,
    broadcast_parents: set[str] | None = None,
) -> KernelResult:
    exp = exp or expectations_for(table)
    if not exp.foreign_keys:
        return KernelResult("EXTENDED_LOGICAL", database, table, True, {"n_fks": 0})
    rows = fk_orphan_counts_df(tables, exp, broadcast_parents).collect()
    errors = [
        f"FK {r['child_table']}({r['fk_columns']}) → {r['parent_table']}: "
        f"{r['orphan_rows']} orphan row(s)"
        for r in rows
        if r["orphan_rows"]
    ]
    metrics = {f"orphans_{r['fk_columns']}": r["orphan_rows"] for r in rows}
    metrics["n_fks"] = len(rows)
    return KernelResult("EXTENDED_LOGICAL", database, table, not errors, metrics, errors)


def run_checkfilegroup(
    spark: SparkSession,
    obj: ObjectMeta,
    filegroup: str,
    files: list[FileMeta],
    database: str,
    physical_only: bool = False,
) -> KernelResult:
    """CHECKFILEGROUP (SURVEY §2.9 #54; DIC:1476-1487): CHECKALLOC +
    CHECKTABLE restricted to one filegroup's file subset.  Parquet
    immutability makes the subset an exact snapshot; the restricted
    scan reads ONLY those files (partition pruning by construction).
    """
    sub = ObjectMeta(
        obj.database_name, obj.schema_name, obj.object_name, obj.object_type,
        obj.path, files,
    )
    alloc = run_checkalloc(spark, sub, full=False)
    metrics = {f"alloc_{k}": v for k, v in alloc.metrics.items()}
    errors = list(alloc.errors)
    if not physical_only and files and not errors:
        df = load_table(spark, *[f.path for f in files])
        tbl = run_checktable(
            spark, df, database, obj.object_name, expectations_for(obj.object_name)
        )
        metrics.update(tbl.metrics)
        # cross-row uniqueness is a whole-table property — a filegroup
        # sees only its subset, so PK duplicates spanning filegroups
        # surface in CHECKTABLE/CHECKDB, not here (mirrors DBCC
        # CHECKFILEGROUP skipping cross-filegroup index checks)
        errors.extend(tbl.errors)
    return KernelResult(
        "CHECKFILEGROUP", database, f"{obj.object_name}:{filegroup}",
        not errors, metrics, errors,
    )


def run_checkfilegroup_partitioned(
    spark: SparkSession,
    table_root: str,
    partition_col: str,
    value,
    database: str,
    object_name: str,
    exp: TableExpectations | None = None,
) -> KernelResult:
    """CHECKFILEGROUP on a hive-partitioned table, scoped by CATALYST
    partition pruning instead of an explicit file list.

    :func:`run_checkfilegroup` pins the filegroup's files by path —
    exact, but the planner sees an opaque file list.  When the table
    is laid out ``partition_col=value`` (``bucketing.partitioned_mirror``),
    the same scope is expressed declaratively as a FILTER on the
    partition column: the scan plans with ``PartitionFilters`` and
    never opens the other directories, so a one-partition check on a
    100 TB table reads one partition's bytes.  Cross-partition
    properties (global PK uniqueness) are out of scope exactly as
    cross-filegroup index checks are for DBCC CHECKFILEGROUP
    (DIC:1476-1487).
    """
    exp = exp or expectations_for(object_name)
    df = spark.read.parquet(table_root).filter(F.col(partition_col) == value)
    # A DERIVED partition column (event_date from ts) is not part of
    # the expected schema and is dropped; but when the table is
    # partitioned on a REAL schema column that expectations reference,
    # dropping it would break (or silently skip) that column's checks.
    referenced = set(exp.primary_key) | set(exp.not_null) | set(
        exp.double_columns
    ) | set(exp.timestamp_columns) | set(exp.clean_text_columns) | set(
        exp.int32_columns
    ) | {c for fk in exp.foreign_keys for c in fk.columns}
    referenced |= {
        c for rule in exp.domain_rules for c in df.columns
        if c in rule.predicate
    }
    if partition_col not in referenced:
        df = df.drop(partition_col)
    res = run_checktable(spark, df, database, object_name, exp)
    return KernelResult(
        "CHECKFILEGROUP",
        database,
        f"{object_name}:{partition_col}={value}",
        res.passed,
        res.metrics,
        res.errors,
    )


def run_checkdb(
    spark: SparkSession,
    objs: list[ObjectMeta],
    database: str,
    physical_only: bool = False,
    no_index: bool = False,
    extended_logical_checks: bool = False,
    declared_schemas: dict[str, list[tuple[str, str]]] | None = None,
) -> list[KernelResult]:
    """CHECKDB = CHECKALLOC + CHECKCATALOG + CHECKTABLE over every
    table of the namespace (DIC:1352-1365 composition)."""
    results: list[KernelResult] = []
    for o in objs:
        results.append(run_checkalloc(spark, o, full=not physical_only))
    results.append(run_checkcatalog(spark, objs, declared_schemas))
    tables: dict[str, DataFrame] = {}
    if not physical_only:
        # the catalog knows every table's on-disk size — pin the
        # broadcast hint for provably small FK parents, let AQE decide
        # for the rest (a forced broadcast of a large parent would OOM)
        small = {
            o.object_name for o in objs if o.total_bytes < BROADCAST_THRESHOLD_BYTES
        }
        for o in objs:
            tables[o.object_name] = load_table(spark, *[f.path for f in o.files])
        for o in objs:
            exp = expectations_for(o.object_name)
            results.append(
                run_checktable(spark, tables[o.object_name], database, o.object_name, exp)
            )
            if extended_logical_checks and exp.foreign_keys and all(
                fk.parent_table in tables for fk in exp.foreign_keys
            ):
                results.append(
                    run_extended_logical(
                        spark, tables, database, o.object_name, exp,
                        broadcast_parents=small,
                    )
                )
    return results


# ---------------------------------------------------------------------------
# Order-independent table checksum (replica comparison primitive)
# ---------------------------------------------------------------------------

_CHECKSUM_MOD = 4611686018427387904  # 2^62 — keeps the folded sum in BIGINT


def _checksum_exprs(cols: list[str], dialect: str) -> tuple[str, str]:
    """(n_rows, checksum) SQL aggregate expressions.

    Row hash = 60-bit md5 of the column representations, where each
    column contributes a NULL flag or 'V' + md5(value-as-string) —
    unambiguous (no separator-collision vector) and portable: md5 hex
    and integer/string casts are identical in Spark and DuckDB for the
    string/integer columns this supports.  The checksum is the SUM of
    row hashes mod 2^62 — commutative, so partition order, file order,
    and shuffle nondeterminism cannot change it: two replicas of one
    logical table agree iff (n_rows, checksum) agree (mod collisions).
    """
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    reprs = ", ".join(
        f"CASE WHEN {c} IS NULL THEN 'N' ELSE 'V' || md5(CAST({c} AS {cast})) END"
        for c in cols
    )
    if dialect == "spark":
        row_hash = (
            f"CAST(conv(substring(md5(concat_ws('', {reprs})), 1, 15), 16, 10)"
            " AS BIGINT)"
        )
    else:
        row_hash = (
            f"CAST('0x' || substr(md5(concat({reprs})), 1, 15) AS BIGINT)"
        )
    n_rows = "CAST(COUNT(*) AS BIGINT)"
    checksum = (
        f"CAST(SUM(CAST({row_hash} AS DECIMAL(38,0))) % {_CHECKSUM_MOD} AS BIGINT)"
    )
    return n_rows, checksum


def table_checksum_df(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-row (n_rows, checksum) content fingerprint of the named
    columns — the replica-divergence probe for AG-style deployments:
    cheap to compute on each copy (one scan, map-side partial sums),
    safe to compare across clusters.  Restrict ``cols`` to
    string/integer columns (float/timestamp string forms are not
    cross-engine canonical)."""
    n_rows, checksum = _checksum_exprs(cols, "spark")
    return df.agg(
        F.expr(n_rows).alias("n_rows"), F.expr(checksum).alias("checksum")
    )


def table_checksum_oracle(table: str, cols: list[str]) -> str:
    n_rows, checksum = _checksum_exprs(cols, "duckdb")
    return (
        f"SELECT {n_rows} AS n_rows, {checksum} AS checksum FROM {table}"
    )


def _key_bucket_expr(key_col: str, n_buckets: int, dialect: str) -> str:
    """Deterministic bucket of a key value, identical in both engines:
    60-bit md5 of the key's string form mod ``n_buckets``.  Depends
    only on the KEY, so two replicas place each logical row in the
    same bucket no matter how their copies diverge."""
    if dialect == "spark":
        h = (
            f"CAST(conv(substring(md5(CAST({key_col} AS STRING)), 1, 15), 16, 10)"
            " AS BIGINT)"
        )
    else:
        h = f"CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15) AS BIGINT)"
    return f"{h} % {n_buckets}"


def table_checksum_by_bucket(
    df: DataFrame, cols: list[str], key_col: str, n_buckets: int = 64
) -> DataFrame:
    """Per-bucket (bucket, n_rows, checksum) — the divergence LOCALIZER
    that follows :func:`table_checksum_df`'s yes/no answer: replicas
    compare bucket vectors and re-probe only the buckets that differ,
    so finding the divergent rows of a 100 TB table costs one scan per
    side plus work proportional to the damage, not the table.

    Same scan/shuffle shape as any hash aggregate: map-side partials
    per bucket, ``n_buckets`` output rows.  The bucket SUMs mod 2^62
    add up to the whole-table checksum, so the two tiers cross-check.
    """
    n_rows, checksum = _checksum_exprs(cols, "spark")
    bucket = _key_bucket_expr(key_col, n_buckets, "spark")
    return (
        df.groupBy(F.expr(bucket).cast("long").alias("bucket"))
        .agg(F.expr(n_rows).alias("n_rows"), F.expr(checksum).alias("checksum"))
    )


def table_checksum_by_bucket_oracle(
    table: str, cols: list[str], key_col: str, n_buckets: int = 64
) -> str:
    n_rows, checksum = _checksum_exprs(cols, "duckdb")
    bucket = _key_bucket_expr(key_col, n_buckets, "duckdb")
    return (
        f"SELECT CAST({bucket} AS BIGINT) AS bucket, {n_rows} AS n_rows, "
        f"{checksum} AS checksum FROM {table} GROUP BY 1"
    )


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level replica diff: which keys exist only in ``a``
    (``only_a``), only in ``b`` (``only_b``), or exist in both with
    different content (``differs``, with the differing column names
    comma-joined in ``compare_cols`` order).  Identical rows are NOT
    emitted — on healthy replicas the result is empty, and the output
    is proportional to the damage.

    One full-outer hash join on the keys (AQE-sized, skew-split); all
    comparisons are null-safe (``<=>``), so NULL vs NULL is equal and
    NULL vs value differs.  Keys must be non-NULL — that is what makes
    them keys.  For very wide tables, pass the checksum tiers first
    and diff only suspect buckets.
    """
    compare_cols = list(
        compare_cols if compare_cols is not None else
        [c for c in a.columns if c not in keys]
    )
    aj = a.withColumn("_pa", F.lit(1)).alias("a")
    bj = b.withColumn("_pb", F.lit(1)).alias("b")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}"))
    j = aj.join(bj, cond, "full_outer")
    differing = F.concat_ws(
        ",",
        *[
            F.when(
                ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")), F.lit(c)
            )
            for c in compare_cols
        ],
    )
    kind = (
        F.when(F.col("b._pb").isNull(), F.lit("only_a"))
        .when(F.col("a._pa").isNull(), F.lit("only_b"))
        .when(differing != "", F.lit("differs"))
        .otherwise(F.lit("same"))
    )
    return (
        j.select(
            *[F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k) for k in keys],
            kind.alias("diff_kind"),
            F.when(kind == "differs", differing).otherwise(F.lit("")).alias(
                "differing_cols"
            ),
        )
        .filter(F.col("diff_kind") != "same")
    )


def table_diff_oracle(
    a_sql: str,
    b_sql: str,
    keys: list[str],
    compare_cols: list[str],
) -> str:
    """Same diff in DuckDB: FULL JOIN on IS NOT DISTINCT FROM keys,
    presence markers, concat_ws over per-column IS DISTINCT FROM flags
    (both engines' concat_ws skip NULL arguments)."""
    on = " AND ".join(f"a.{k} IS NOT DISTINCT FROM b.{k}" for k in keys)
    flags = ", ".join(
        f"CASE WHEN a.{c} IS DISTINCT FROM b.{c} THEN '{c}' END"
        for c in compare_cols
    )
    key_sel = ", ".join(f"COALESCE(a.{k}, b.{k}) AS {k}" for k in keys)
    return f"""
WITH a AS (SELECT *, 1 AS _pa FROM {a_sql} t),
     b AS (SELECT *, 1 AS _pb FROM {b_sql} t),
     j AS (
       SELECT {key_sel},
              CASE WHEN b._pb IS NULL THEN 'only_a'
                   WHEN a._pa IS NULL THEN 'only_b'
                   WHEN concat_ws(',', {flags}) <> '' THEN 'differs'
                   ELSE 'same' END AS diff_kind,
              concat_ws(',', {flags}) AS flags
       FROM a FULL JOIN b ON {on}
     )
SELECT {", ".join(keys)}, diff_kind,
       CASE WHEN diff_kind = 'differs' THEN flags ELSE '' END AS differing_cols
FROM j WHERE diff_kind <> 'same'
"""


def repair_plan(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """The anti-entropy step after :func:`table_diff`: the operations
    that make replica ``b`` identical to authoritative ``a`` —
    ``(op, keys…, payload columns from a)`` with ``op`` ∈ ``insert``
    (key only in a), ``delete`` (key only in b; payload NULL), and
    ``update`` (content differs; payload = a's row).  Healthy replicas
    produce an empty plan; plan size is proportional to the damage,
    which is what makes repair cheap relative to a full re-copy.

    Same single full-outer join shape as :func:`table_diff` (one
    shuffle, null-safe compares); :func:`apply_repair` executes the
    plan and the round-trip equality is property-tested.
    """
    compare_cols = list(
        compare_cols if compare_cols is not None else
        [c for c in a.columns if c not in keys]
    )
    aj = a.withColumn("_pa", F.lit(1)).alias("a")
    bj = b.withColumn("_pb", F.lit(1)).alias("b")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}"))
    j = aj.join(bj, cond, "full_outer")
    differs = functools.reduce(
        lambda x, y: x | y,
        [~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in compare_cols],
        F.lit(False),  # keys-only table: insert/delete plan only
    )
    op = (
        F.when(F.col("b._pb").isNull(), F.lit("insert"))
        .when(F.col("a._pa").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("same"))
    )
    return (
        j.select(
            op.alias("op"),
            *[F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k) for k in keys],
            *[F.col(f"a.{c}").alias(c) for c in compare_cols],
        )
        .filter(F.col("op") != "same")
    )


def repair_plan_oracle(
    a_sql: str,
    b_sql: str,
    keys: list[str],
    compare_cols: list[str],
) -> str:
    """DuckDB SQL producing the identical repair plan."""
    on = " AND ".join(f"a.{k} IS NOT DISTINCT FROM b.{k}" for k in keys)
    differs = " OR ".join(
        f"(a.{c} IS DISTINCT FROM b.{c})" for c in compare_cols
    )
    key_sel = ", ".join(f"COALESCE(a.{k}, b.{k}) AS {k}" for k in keys)
    pay_sel = ", ".join(f"a.{c} AS {c}" for c in compare_cols)
    return f"""
WITH a AS (SELECT *, 1 AS _pa FROM {a_sql} t),
     b AS (SELECT *, 1 AS _pb FROM {b_sql} t)
SELECT * FROM (
  SELECT CASE WHEN b._pb IS NULL THEN 'insert'
              WHEN a._pa IS NULL THEN 'delete'
              WHEN {differs} THEN 'update'
              ELSE 'same' END AS op,
         {key_sel}, {pay_sel}
  FROM a FULL JOIN b ON {on}
) WHERE op <> 'same'
"""


def apply_repair(
    b: DataFrame, plan: DataFrame, keys: list[str]
) -> DataFrame:
    """Execute a :func:`repair_plan` against replica ``b``: every
    planned key's current row is dropped (null-safe anti-join), then
    insert/update payload rows are appended.  ``apply_repair(b,
    repair_plan(a, b), keys)`` equals ``a`` on the compared columns —
    the property the tests pin.  On an ACID table format the same plan
    maps 1:1 onto ``MERGE WHEN [NOT] MATCHED``."""
    pk = plan.select(*keys)
    cond = functools.reduce(
        lambda x, y: x & y, [b[k].eqNullSafe(pk[k]) for k in keys]
    )
    kept = b.join(pk, cond, "left_anti")
    additions = plan.filter(F.col("op") != "delete").drop("op")
    return kept.unionByName(additions.select(*b.columns))


# ---------------------------------------------------------------------------
# CHECKTABLE violation-row extraction (the repair path)
# ---------------------------------------------------------------------------

def _row_rule_predicates(exp: TableExpectations) -> list[tuple[str, str]]:
    """(rule_name, violated-SQL) per row-local rule, named to line up
    with :func:`checktable_agg_exprs`'s counter columns so the two
    tiers cross-check: ``SUM(violated)`` per rule == the counter."""
    out: list[tuple[str, str]] = []
    for c in exp.not_null:
        out.append((f"null_{c}", f"{c} IS NULL"))
    for rule in exp.domain_rules:
        out.append((f"viol_{rule.name}", f"NOT {rule.predicate}"))
    return out


def checktable_violations_df(df: DataFrame, exp: TableExpectations) -> DataFrame:
    """The rows behind the counters: (key columns…, rule) for every
    rule a row violates — what a repair job consumes after
    :func:`checktable_df` says *how many* are broken.

    Row-local rules flag in the same single scan (an array of
    (rule, violated) structs, exploded and filtered, so output is
    proportional to the damage); PK rules need key context — NULL-key
    rows flag locally, duplicate keys via one count-over-key window
    (the same shuffle class as the counter's COUNT DISTINCT).  Healthy
    tables produce an empty result from one scan + one hash shuffle.
    """
    keys = exp.primary_key
    if not keys:
        raise ValueError(f"violations extraction needs a primary key: {exp.table}")
    preds = _row_rule_predicates(exp)
    nn = " AND ".join(f"{k} IS NOT NULL" for k in keys)
    preds.append(("pk_null_rows", f"NOT ({nn})"))
    flags = F.array(
        *[
            F.struct(F.lit(name).alias("rule"), F.expr(sql).alias("bad"))
            for name, sql in preds
        ]
    )
    local = (
        df.select(*keys, F.explode(flags).alias("f"))
        .filter(F.col("f.bad"))
        .select(*keys, F.col("f.rule").alias("rule"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys)
    dups = (
        df.filter(F.expr(nn))
        .select(*keys, F.count(F.lit(1)).over(w).alias("_cnt"))
        .filter(F.col("_cnt") > 1)
        .select(*keys, F.lit("pk_dup_rows").alias("rule"))
    )
    return local.unionByName(dups)


def row_quarantine(
    df: DataFrame, exp: TableExpectations, include_pk_dups: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Route rows by the expectations instead of counting them:
    ``(valid, rejected)`` where rejected rows carry ``_violations``,
    the array of rule names they break — the SEMANTIC gate that
    follows :mod:`..sources.ingest`'s parse gate in a landing
    pipeline (parse-quarantine → row-quarantine → bronze), and the
    row-routing consumption shape of the same rules
    :func:`checktable_violations_df` reports on.

    Row-local rules (not-null, domain, purity) evaluate in one scan
    as a filtered flag array — no explode, the row never duplicates.
    ``include_pk_dups`` adds the duplicate-primary-key rule via one
    count-over-key window (BOTH copies reject — which to keep is a
    dedup policy, not a validity fact); pass False for the
    shuffle-free purely-local gate.
    """
    preds = _row_rule_predicates(exp)
    if exp.primary_key:
        nn = " AND ".join(f"{k} IS NOT NULL" for k in exp.primary_key)
        preds.append(("pk_null_rows", f"NOT ({nn})"))
    if not preds:
        raise ValueError(f"no row-local rules for {exp.table!r}")
    flags = F.array(
        *[
            F.struct(F.lit(name).alias("rule"), F.expr(sql).alias("bad"))
            for name, sql in preds
        ]
    )
    viol = F.transform(
        F.filter(flags, lambda f: f["bad"]), lambda f: f["rule"]
    )
    out = df.withColumn("_violations", viol)
    if include_pk_dups and exp.primary_key:
        from pyspark.sql.window import Window

        keys = exp.primary_key
        nn_col = F.expr(" AND ".join(f"{k} IS NOT NULL" for k in keys))
        w = Window.partitionBy(*keys)
        cnt = F.count(F.when(nn_col, 1)).over(w)
        out = out.withColumn(
            "_violations",
            F.when(
                nn_col & (cnt > 1),
                F.concat(F.col("_violations"), F.array(F.lit("pk_dup_rows"))),
            ).otherwise(F.col("_violations")),
        )
    valid = out.filter(F.size("_violations") == 0).drop("_violations")
    rejected = out.filter(F.size("_violations") > 0)
    return valid, rejected


def checktable_violations_oracle(table: str, exp: TableExpectations) -> str:
    """Identical extraction in DuckDB: one UNION ALL branch per rule
    plus the count-over-key window for duplicates."""
    keys = ", ".join(exp.primary_key)
    nn = " AND ".join(f"{k} IS NOT NULL" for k in exp.primary_key)
    preds = _row_rule_predicates(exp)
    parts = [
        f"SELECT {keys}, '{name}' AS rule FROM {table} t WHERE {sql}"
        for name, sql in preds
    ]
    parts.append(f"SELECT {keys}, 'pk_null_rows' AS rule FROM {table} t WHERE NOT ({nn})")
    parts.append(
        f"SELECT {keys}, 'pk_dup_rows' AS rule FROM ("
        f"SELECT {keys}, COUNT(*) OVER (PARTITION BY {keys}) AS _cnt "
        f"FROM {table} t WHERE {nn}) d WHERE _cnt > 1"
    )
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# Incremental CHECKTABLE (per-file mergeable partials)
# ---------------------------------------------------------------------------


def _canon_file_path(path: str) -> str:
    """One canonical spelling for a data-file path — the join key of
    the partials state.  The Hadoop listing says ``file:/x`` with raw
    characters; ``input_file_name()`` says ``file:///x`` with
    percent-encoding.  This (Python, listing side) and
    ``_canon_file_path_expr`` (SQL, scan side) MUST stay in sync.
    Non-``file:`` schemes pass through untouched (see the expr's
    docstring for why decoding is file:-only)."""
    if path.startswith("file:"):
        path = path[len("file:"):]
    while path.startswith("//"):
        path = path[1:]
    return path


def _canon_file_path_expr(col: F.Column | None = None) -> F.Column:
    """SQL twin of :func:`_canon_file_path` over ``input_file_name()``
    (default) or any path-bearing column: for ``file:`` URIs,
    percent-decode ('+' pre-escaped — URLDecoder would turn a literal
    plus into a space) then strip the scheme and slash-run.
    Non-``file:`` schemes (hdfs:, s3a:, …) pass through UNTOUCHED on
    both sides — the Hadoop listing and ``input_file_name()`` spell
    remote URIs the same way, and decoding only one side would make
    the spellings never reconcile (every file re-scans forever)."""
    src = F.input_file_name() if col is None else col
    return F.when(
        src.startswith("file:"),
        F.regexp_replace(
            F.url_decode(F.replace(src, F.lit("+"), F.lit("%2B"))),
            F.lit("^file:/+"),
            F.lit("/"),
        ),
    ).otherwise(src)


def _partial_agg_exprs(
    exp: TableExpectations, has_embedding: bool
) -> list[tuple[str, str]]:
    """Per-file aggregate list: every mergeable counter of
    :func:`checktable_agg_exprs` (all but ``pk_dup_rows``, whose COUNT
    DISTINCT does not decompose per file) plus the vector-length
    envelope when the table carries an embedding column (MIN/MAX are
    mergeable too, so the table-level invariant survives the split)."""
    exprs = [
        (alias, sql)
        for alias, sql in checktable_agg_exprs(exp, dialect="spark")
        if alias != "pk_dup_rows"
    ]
    if has_embedding:
        exprs.append(("vector_len_min", "MIN(size(embedding))"))
        exprs.append(("vector_len_max", "MAX(size(embedding))"))
    return exprs


def checktable_file_partials(
    spark: SparkSession, paths: list[str], exp: TableExpectations
) -> DataFrame:
    """Per-FILE partial CHECKTABLE aggregates: one row per data file.

    Parquet files are immutable in this engine's model (the pinned
    snapshot), so a file's partial row never goes stale: persist the
    output and a daily CHECKTABLE over a 100 TB table re-scans only
    the files added since the last run.  Reads go through
    ``load_table`` so NANOS/NTZ timestamp normalization matches the
    full-kernel path.
    """
    from ..sources.loader import load_table as _load_table

    df = _load_table(spark, *paths)
    exprs = _partial_agg_exprs(exp, "embedding" in df.columns)
    return df.groupBy(_canon_file_path_expr().alias("file_path")).agg(
        *[F.expr(sql).alias(alias) for alias, sql in exprs]
    )


def checktable_merge_partials(partials: DataFrame) -> DataFrame:
    """Fold per-file partials into the table-level kernel row: SUM for
    counters (exact — disjoint row sets), MIN/MAX for the
    ``vector_len_*`` envelope columns."""
    aggs = []
    for c in partials.columns:
        if c in ("file_path", "size"):
            continue
        if c.endswith("_min"):
            aggs.append(F.min(c).cast("long").alias(c))
        elif c.endswith("_max"):
            aggs.append(F.max(c).cast("long").alias(c))
        else:
            aggs.append(F.sum(c).cast("long").alias(c))
    return partials.agg(*aggs)


def _incremental_file_partials(
    spark: SparkSession,
    state_path: str,
    orig: dict[str, str],
    live: dict[str, int],
    expected_cols: list[str],
    compute_fresh,
):
    """Shared state machinery for per-file partial kernels: read prior
    state (schema-gated — a column-set change discards it), reconcile
    on (path, size), compute partials for new files via
    ``compute_fresh(new_orig_paths)``, synthesize all-zero counter rows
    for files the scan produced no group for (0-row parquet files —
    otherwise they re-list as "new" forever), and persist the merged
    frame.  State is refreshed ONLY when the visit changed anything
    (new files scanned or prior rows dropped); an idempotent visit is
    read-only.

    Returns ``(partials, files_scanned, commit)``.  The PERSISTED
    ``partials`` frame is the caller's to unpersist; ``commit()``
    performs the state swap (write-to-temp, rename the old state
    ASIDE to ``.bak``, rename tmp in, drop ``.bak``) and must be
    called only AFTER the caller has consumed ``partials`` — the
    persist is best-effort, so until then the frame's lineage may
    still read the old state files.  A crash inside the swap leaves
    either the old state or a ``.bak``; the next visit restores the
    ``.bak`` before reading, so "incremental" never silently degrades
    to a full rescan.
    """
    from ..sources.catalog import _fs_and_path, rename_or_raise

    fs, h_state = _fs_and_path(spark, state_path)
    _, h_bak = _fs_and_path(spark, state_path + ".bak")
    if not fs.exists(h_state) and fs.exists(h_bak):
        rename_or_raise(fs, h_bak, h_state)  # recover a crashed swap
    kept, known, prior_rows = None, set(), 0
    try:
        prior = spark.read.parquet(state_path)
        if sorted(prior.columns) == sorted(expected_cols):
            prior_rows = prior.count()
            sizes = spark.createDataFrame(
                [(p, sz) for p, sz in live.items()], "file_path string, size long"
            )
            kept = prior.join(sizes, ["file_path", "size"], "left_semi")
            known = {r["file_path"] for r in kept.select("file_path").collect()}
        # else: the partial column set changed since the state was
        # written — fall through with empty `known` (full rescan)
    except Exception:  # first run: no state yet
        pass

    new_paths = [orig[p] for p in live if p not in known]
    parts = []
    if kept is not None and known:
        parts.append(kept)
    if new_paths:
        fresh = compute_fresh(new_paths)
        new_canon = {p for p in live if p not in known}
        sizes_new = spark.createDataFrame(
            [(p, live[p]) for p in new_canon], "file_path string, size long"
        )
        # left join so a data file that produced NO group (0 rows)
        # still gets a state row; counters fill 0, min/max stay NULL
        joined = sizes_new.join(F.broadcast(fresh), "file_path", "left")
        fill = {
            c: 0
            for c in expected_cols
            if c not in ("file_path", "size")
            and not (c.endswith("_min") or c.endswith("_max"))
        }
        parts.append(joined.fillna(fill))
    partials = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    partials = partials.select(*expected_cols).persist()
    partials.count()  # materialize BEFORE any state swap

    state_dirty = bool(new_paths) or prior_rows != len(known)

    def commit() -> None:
        if not state_dirty:
            return  # idempotent visit: read-only, nothing to swap
        tmp_path = state_path + ".tmp"
        partials.write.mode("overwrite").parquet(tmp_path)
        _, h_tmp = _fs_and_path(spark, tmp_path)
        if fs.exists(h_bak):
            fs.delete(h_bak, True)
        if fs.exists(h_state):
            rename_or_raise(fs, h_state, h_bak)
        # aborting here (rename returned false) leaves the .bak as the
        # restorable installed copy; next visit recovers it and at
        # worst degrades to a full rescan — never loses the state
        rename_or_raise(fs, h_tmp, h_state)
        if fs.exists(h_bak):
            fs.delete(h_bak, True)

    return partials, len(new_paths), commit


def run_checktable_incremental(
    spark: SparkSession,
    obj: ObjectMeta,
    state_dir: str,
    exp: TableExpectations | None = None,
) -> KernelResult:
    """CHECKTABLE that scans only files NEW since the previous run.

    State: a parquet table of per-file partial rows (plus the file
    size they were computed at) at
    ``{state_dir}/checktable_partials/{object}``.  Each visit:

    1. pin the file listing (path + size, the snapshot contract);
    2. keep prior partials whose (path, size) BOTH still match — a
       changed size means an in-place rewrite, so the file re-scans;
       vanished files drop;
    3. discard the whole state when its column set no longer matches
       the current expectations (a rule was added/removed → the stored
       partials are incomplete → full rescan rebuilds them);
    4. compute partials for new files only (the incremental scan);
    5. merge into the table row (SUM counters, MIN/MAX vector-length
       envelope); the ``pk_dup_rows`` probe — inherently global —
       re-runs as a NARROW scan of the key columns (column pruning
       reads only the PK bytes of the full table);
    6. persist the updated partials for the next visit via
       write-to-temp + swap, so the old state is never deleted before
       its replacement exists (the prior partials frame is lazily
       derived FROM the old state files).

    Scale: a daily run on a 100 TB append-mostly table pays (wide scan
    of the day's new files) + (narrow PK scan), instead of a wide scan
    of everything — the same contract as the reference's time-budgeted
    re-check loop, made cheap enough to run every day.
    """
    from ..sources.loader import load_table as _load_table

    exp = exp or expectations_for(obj.object_name)
    state_path = f"{state_dir}/checktable_partials/{obj.object_name}"
    orig = {_canon_file_path(f.path): f.path for f in obj.files}
    live = {_canon_file_path(f.path): f.size for f in obj.files}
    if not live:
        return KernelResult(
            "CHECKTABLE", obj.database_name, obj.object_name, False, {}, ["no data files"]
        )
    probe_df = _load_table(spark, *orig.values())
    expected_cols = ["file_path", "size"] + [
        a for a, _ in _partial_agg_exprs(exp, "embedding" in probe_df.columns)
    ]

    partials, n_scanned, commit = _incremental_file_partials(
        spark,
        state_path,
        orig,
        live,
        expected_cols,
        lambda paths: checktable_file_partials(spark, paths, exp),
    )
    try:
        row = checktable_merge_partials(partials).collect()[0].asDict()
        if exp.primary_key:
            # global dup probe on the pruned key columns only
            keys = list(exp.primary_key)
            pk = _load_table(spark, *orig.values()).select(*keys).dropna(subset=keys)
            n_nonnull = row["n_rows"] - row["pk_null_rows"]
            row["pk_dup_rows"] = int(n_nonnull - pk.distinct().count())
        commit()  # swap state only after partials is fully consumed
    finally:
        partials.unpersist()

    errors = [
        f"{k} = {v}"
        for k, v in row.items()
        if k not in _NON_VIOLATION_METRICS and v not in (0, None)
    ]
    if (
        "vector_len_min" in row
        and (
            row["vector_len_min"] != row["vector_len_max"]
            or (row["vector_len_min"] is not None and row["vector_len_min"] <= 0)
        )
    ):
        errors.append(
            f"inconsistent vector length [{row['vector_len_min']}, {row['vector_len_max']}]"
        )
    res = KernelResult(
        "CHECKTABLE", obj.database_name, obj.object_name, not errors, row, errors
    )
    res.metrics["files_scanned"] = n_scanned
    res.metrics["files_reused"] = len(live) - n_scanned
    return res


# ---------------------------------------------------------------------------
# Incremental replica checksum (same per-file partials pattern)
# ---------------------------------------------------------------------------


def table_checksum_incremental(
    spark: SparkSession,
    obj: ObjectMeta,
    cols: list[str],
    state_dir: str,
) -> dict:
    """Replica-divergence checksum that re-scans only NEW files.

    The content checksum is a SUM of row hashes mod 2^62 — modular
    addition is associative, so per-file (n_rows, checksum) partials
    merge exactly: ``SUM(partial) % M`` equals the full-scan value.
    Shares :func:`_incremental_file_partials`'s state contract with
    the incremental CHECKTABLE: (path, size) reconciliation,
    loader-normalized reads, zero-row-file synthesis, read-only
    idempotent visits, temp-swap state writes.  The state path embeds
    a fingerprint of ``cols`` — partials hashed over a different
    column list are a different state, never silently reused.  A
    daily replica-divergence probe on an append-mostly 100 TB table
    costs one scan of the day's files.

    Returns ``{"n_rows", "checksum", "files_scanned", "files_reused"}``.
    """
    import hashlib

    from ..sources.loader import load_table as _load_table

    cols_sig = hashlib.md5(",".join(cols).encode()).hexdigest()[:12]
    state_path = (
        f"{state_dir}/checksum_partials/{obj.object_name}/{cols_sig}"
    )
    orig = {_canon_file_path(f.path): f.path for f in obj.files}
    live = {_canon_file_path(f.path): f.size for f in obj.files}
    if not live:
        return {"n_rows": 0, "checksum": 0, "files_scanned": 0, "files_reused": 0}
    expected_cols = ["file_path", "size", "n_rows", "checksum"]
    n_rows_sql, checksum_sql = _checksum_exprs(cols, "spark")

    def compute_fresh(paths):
        return (
            _load_table(spark, *paths)
            .groupBy(_canon_file_path_expr().alias("file_path"))
            .agg(
                F.expr(n_rows_sql).alias("n_rows"),
                F.expr(checksum_sql).alias("checksum"),
            )
        )

    partials, n_scanned, commit = _incremental_file_partials(
        spark, state_path, orig, live, expected_cols, compute_fresh
    )
    try:
        row = partials.agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.expr(
                f"CAST(SUM(CAST(checksum AS DECIMAL(38,0))) % {_CHECKSUM_MOD} AS BIGINT)"
            ).alias("checksum"),
        ).collect()[0]
        commit()  # swap state only after partials is fully consumed
    finally:
        partials.unpersist()
    return {
        "n_rows": int(row["n_rows"]),
        "checksum": int(row["checksum"]),
        "files_scanned": n_scanned,
        "files_reused": len(live) - n_scanned,
    }
