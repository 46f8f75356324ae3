"""Table-operations CLI — the maintenance/divergence/warehouse surface.

The integrity scheduler (``cli.py``) and the curation composer
(``pipeline_cli.py``) cover the reference's job harness and the
LLM-corpus funnel; this third surface exposes the table-level
operators a warehouse operator runs ad hoc or from cron::

    python -m integritychecksforvldbs_spark.table_cli compact \
        --src /data/orders --dest /data/orders_c --sort-by o_orderdate
    python -m integritychecksforvldbs_spark.table_cli zonemap \
        --path /data/orders_c --column o_orderdate \
        --lo 1996-01-01 --hi 1996-12-31
    python -m integritychecksforvldbs_spark.table_cli repair-plan \
        --authoritative /a/orders --replica /b/orders \
        --keys o_orderkey --out /tmp/plan
    python -m integritychecksforvldbs_spark.table_cli scd2-apply \
        --dim /dw/dim_customer --snapshot /stage/customer \
        --keys c_custkey --tracked c_acctbal,c_mktsegment \
        --as-of 2024-06-01 --out /dw/dim_customer_v2
    python -m integritychecksforvldbs_spark.table_cli bm25-index \
        --corpus /data/documents --out /idx/docs
    python -m integritychecksforvldbs_spark.table_cli bm25-search \
        --index /idx/docs --query "spark window merge" --k 10

Every subcommand prints ONE JSON summary line to stdout (parseable by
the calling scheduler) and writes any bulk output as parquet.
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import date, datetime


def _parse_bound(s: str):
    """CLI bound → typed value: int, float, date, timestamp, else str.

    Shape-guessing fallback ONLY — prefer :func:`_parse_bound_for`,
    which resolves the column's actual dtype first.  Guessing from the
    literal is wrong for string columns: ``--value 0123`` would become
    int 123 and hash differently from the stored ``'0123'``."""
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    # date-only input → datetime.date (pyarrow DATE stats are
    # datetime.date; a datetime here would fail the < comparison)
    for fmt, conv in (
        ("%Y-%m-%d %H:%M:%S", lambda d: d),
        ("%Y-%m-%d", lambda d: d.date()),
    ):
        try:
            d = datetime.strptime(s, fmt)
            return conv(d)
        except ValueError:
            pass
    return s


def _parse_bound_for(dtype, s: str):
    """Parse a CLI bound according to the COLUMN's Spark dtype, so a
    numeric-looking literal against a STRING column stays a string
    (``'0123'`` ≠ 123 under xxhash64, and int-vs-string footer-stat
    comparison raises TypeError)."""
    from pyspark.sql import types as T

    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(s)
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return float(s)
    if isinstance(dtype, T.DateType):
        return date.fromisoformat(s)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return datetime.fromisoformat(s)
    if isinstance(dtype, T.StringType):
        return s
    return _parse_bound(s)


def _guard_out(ap: argparse.ArgumentParser, out: str, *inputs: str) -> None:
    """Refuse ``--out`` equal to (or nested with) any input path.

    ``mode('overwrite')`` truncates the destination while the
    DataFrame's lineage still reads the inputs — an in-place update
    would destroy the source mid-write.  In-place refresh belongs to
    the rename-aside swap the streaming sink uses, not to this CLI."""
    import os

    def canon(p: str) -> str:
        return os.path.abspath(p.removeprefix("file://").removeprefix("file:"))

    o = canon(out)
    for i in inputs:
        p = canon(i)
        if o == p or o.startswith(p + os.sep) or p.startswith(o + os.sep):
            ap.error(
                f"--out {out!r} overlaps input {i!r}: overwrite would "
                "truncate a path the plan is still reading; write to a "
                "separate directory and swap afterwards"
            )


def _csv(s: str) -> list[str]:
    return [c.strip() for c in s.split(",") if c.strip()]


def _split_assignments(s: str) -> list[str]:
    """Split ``col=expr, col=expr`` on TOP-LEVEL commas only: commas
    inside parentheses/brackets or single-quoted SQL strings belong to
    the expression (``price=round(price, 2)`` is one assignment)."""
    out: list[str] = []
    buf: list[str] = []
    depth = 0
    in_str: str | None = None  # the active quote char, ' or "
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str is not None:
            buf.append(ch)
            if ch == in_str:
                if i + 1 < len(s) and s[i + 1] == in_str:  # '' escape
                    buf.append(in_str)
                    i += 1
                else:
                    in_str = None
        elif ch in "'\"":
            in_str = ch
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    if buf:
        out.append("".join(buf))
    return [p for p in (x.strip() for x in out) if p]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="table operations")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("compact", help="rewrite into target-sized files")
    p.add_argument("--src", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--sort-by", default=None, help="comma cols for range sort")
    p.add_argument("--target-bytes", type=int, default=None)

    p = sub.add_parser("zorder", help="z-order clustering rewrite")
    p.add_argument("--src", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--by", required=True, help="comma cols to cluster")
    p.add_argument("--target-bytes", type=int, default=None)

    p = sub.add_parser("zonemap", help="footer zone map / pruning report")
    p.add_argument("--path", required=True)
    p.add_argument("--column", required=True)
    p.add_argument("--lo", default=None)
    p.add_argument("--hi", default=None)

    p = sub.add_parser("bloom-build", help="per-file Bloom index for a column")
    p.add_argument("--path", required=True)
    p.add_argument("--column", required=True)

    p = sub.add_parser("bloom-lookup", help="Bloom-pruned point lookup")
    p.add_argument("--path", required=True)
    p.add_argument("--column", required=True)
    p.add_argument("--value", required=True)

    p = sub.add_parser("profile-drift", help="baseline-vs-candidate drift report")
    p.add_argument("--baseline", required=True)
    p.add_argument("--candidate", required=True)
    p.add_argument("--columns", default=None, help="comma cols (default: common)")
    p.add_argument("--out", default=None, help="write full report parquet here")

    p = sub.add_parser("repair-plan", help="ops making replica match authoritative")
    p.add_argument("--authoritative", required=True)
    p.add_argument("--replica", required=True)
    p.add_argument("--keys", required=True)
    p.add_argument("--out", required=True, help="plan parquet")

    p = sub.add_parser("repair-apply", help="execute a repair plan")
    p.add_argument("--replica", required=True)
    p.add_argument("--plan", required=True)
    p.add_argument("--keys", required=True)
    p.add_argument("--out", required=True, help="repaired table parquet")

    p = sub.add_parser("scd2-apply", help="type-2 dimension snapshot apply")
    p.add_argument("--dim", required=True)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--keys", required=True)
    p.add_argument("--tracked", required=True)
    p.add_argument("--as-of", required=True, help="YYYY-MM-DD")
    p.add_argument("--out", required=True)

    p = sub.add_parser("bm25-index", help="materialize the inverted index")
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")

    p = sub.add_parser(
        "bm25-refresh",
        help="fold corpus appends into the index as a new segment "
        "(full rebuild only when existing files changed)",
    )
    p.add_argument("--corpus", required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")

    p = sub.add_parser(
        "bm25-vacuum",
        help="remove crash-orphaned (unmanifested) index segments",
    )
    p.add_argument("--index", required=True)

    p = sub.add_parser(
        "versioned-commit", help="commit a parquet dir into a versioned table"
    )
    p.add_argument("--src", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--mode", choices=["append", "overwrite"], default="append")

    p = sub.add_parser("versioned-history", help="list committed versions")
    p.add_argument("--table", required=True)

    p = sub.add_parser(
        "versioned-rollback", help="restore an old version as a NEW commit"
    )
    p.add_argument("--table", required=True)
    p.add_argument("--version", type=int, required=True)

    p = sub.add_parser(
        "versioned-delete",
        help="delete rows matching a SQL predicate as a new version",
    )
    p.add_argument("--table", required=True)
    p.add_argument(
        "--where", required=True,
        help="SQL condition; NULL evaluations keep the row (DELETE semantics)",
    )
    p.add_argument(
        "--strategy", choices=["auto", "dv", "copy"], default="auto",
        help="dv = merge-on-read deletion vectors (O(deleted rows) "
        "bytes); copy = rewrite touched files; auto picks by fraction",
    )

    p = sub.add_parser(
        "versioned-update",
        help="UPDATE ... SET col=expr WHERE predicate as a new version",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--where", required=True)
    p.add_argument(
        "--set", required=True,
        help="comma-separated col=SQL-expr assignments, all evaluated "
        "against the pre-update row",
    )
    p.add_argument(
        "--strategy", choices=["auto", "dv", "copy"], default="auto",
        help="dv = merge-on-read (old positions die in deletion "
        "vectors, only transformed rows are written)",
    )

    p = sub.add_parser(
        "versioned-merge",
        help="upsert a parquet source into a versioned table by keys",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--source", required=True, help="parquet path of the source")
    p.add_argument("--keys", required=True, help="comma-separated key columns")
    p.add_argument(
        "--strategy", choices=["auto", "dv", "copy"], default="auto",
    )

    p = sub.add_parser(
        "versioned-sql",
        help="one SQL statement against versioned tables: MERGE INTO / "
        "DELETE FROM / UPDATE ... SET / SELECT (VERSION|TIMESTAMP AS OF)",
    )
    p.add_argument("--statement", required=True)
    p.add_argument(
        "--register", action="append", default=[],
        help="name=table_path binding usable in the statement, repeatable",
    )
    p.add_argument(
        "--strategy", choices=["auto", "dv", "copy"], default="auto",
    )
    p.add_argument(
        "--max-rows", type=int, default=100,
        help="rows of a SELECT result to print (metrics rows always fit)",
    )

    p = sub.add_parser(
        "versioned-dv-info",
        help="deletion-vector entries of a snapshot (file -> sidecar, n)",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--version", type=int, default=None)

    p = sub.add_parser(
        "versioned-changes",
        help="row-level change feed between two versions (CDF)",
    )
    p.add_argument("--table", required=True)
    p.add_argument(
        "--from-version", type=int, required=True,
        help="base snapshot (exclusive); 0 = from empty",
    )
    p.add_argument("--to-version", type=int, default=None)

    p = sub.add_parser(
        "rollup-build",
        help="materialize a SUM/COUNT rollup over a versioned table",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--rollup", required=True)
    p.add_argument("--keys", required=True, help="comma-separated group keys")
    p.add_argument(
        "--measure", action="append", default=[],
        help="name=sql_expr (integer-valued), repeatable",
    )

    p = sub.add_parser(
        "rollup-refresh",
        help="fold the source's change feed into an existing rollup",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--rollup", required=True)

    p = sub.add_parser(
        "versioned-schema",
        help="schema history, or the column diff between two versions",
    )
    p.add_argument("--table", required=True)
    p.add_argument(
        "--from-version", type=int, default=None,
        help="with --from-version: diff against --to-version (default latest)",
    )
    p.add_argument("--to-version", type=int, default=None)

    p = sub.add_parser(
        "versioned-optimize",
        help="rewrite the latest snapshot clustered (OPTIMIZE [ZORDER BY])",
    )
    p.add_argument("--table", required=True)
    p.add_argument(
        "--zorder-by", default=None,
        help="comma-separated numeric columns to z-order cluster on "
        "(omit for plain compaction)",
    )
    p.add_argument("--n-files", type=int, default=None)

    p = sub.add_parser(
        "versioned-compact-small",
        help="incremental compaction: rewrite only small files as a "
        "replace commit (data_change=false; streams skip it)",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--target-bytes", type=int, default=None)
    p.add_argument(
        "--min-bytes", type=int, default=None,
        help="files smaller than this are rewritten "
        "(default: target-bytes / 2)",
    )

    p = sub.add_parser(
        "versioned-stats",
        help="metadata-only row count and column min/max from manifest stats",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--version", type=int, default=None)
    p.add_argument(
        "--columns", default=None,
        help="comma-separated columns to fold min/max for",
    )

    p = sub.add_parser(
        "versioned-vacuum",
        help="reclaim unreferenced data files (and optionally old versions)",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--keep-versions", type=int, default=None)
    p.add_argument(
        "--min-age-s", type=float, default=None,
        help="retain unreferenced data dirs younger than this (an "
        "in-flight commit's files look like orphans; default 3600)",
    )
    p.add_argument(
        "--dry-run", action="store_true",
        help="report what would be reclaimed without deleting anything",
    )

    p = sub.add_parser(
        "versioned-clone",
        help="zero-copy SHALLOW CLONE of a snapshot into a new table",
    )
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--timestamp", type=float, default=None)

    p = sub.add_parser(
        "versioned-constraints",
        help="show or replace the table's CHECK constraints",
    )
    p.add_argument("--table", required=True)
    p.add_argument(
        "--set", default=None,
        help="comma-separated name=SQL-predicate assignments replacing "
        "the map (existing rows validated first); '' drops all; omit "
        "to just show the active map",
    )

    p = sub.add_parser("bm25-search", help="top-k BM25 query")
    p.add_argument("--corpus", default=None, help="direct scan of a corpus")
    p.add_argument("--index", default=None, help="bm25-index layout")
    p.add_argument("--query", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")

    args = ap.parse_args(argv)

    from .session import get_spark
    from .sources.loader import load_table

    spark = get_spark(app_name=f"table-{args.cmd}")
    summary: dict

    if args.cmd == "compact":
        from .sources.maintenance import DEFAULT_TARGET_BYTES, compact_table

        before, after = compact_table(
            spark, args.src, args.dest,
            target_bytes=args.target_bytes or DEFAULT_TARGET_BYTES,
            sort_by=_csv(args.sort_by) if args.sort_by else None,
        )
        summary = {
            "cmd": "compact",
            "files_before": before.n_files, "files_after": after.n_files,
            "bytes_before": before.total_bytes, "bytes_after": after.total_bytes,
        }
    elif args.cmd == "zorder":
        from .sources.maintenance import DEFAULT_TARGET_BYTES, zorder_compact

        before, after = zorder_compact(
            spark, args.src, args.dest, _csv(args.by),
            target_bytes=args.target_bytes or DEFAULT_TARGET_BYTES,
        )
        summary = {
            "cmd": "zorder",
            "files_before": before.n_files, "files_after": after.n_files,
        }
    elif args.cmd == "zonemap":
        from .sources import zonemap

        zm = zonemap.build_zone_map(spark, args.path, args.column)
        summary = {
            "cmd": "zonemap", "n_files": len(zm),
            "files_with_stats": sum(1 for e in zm if e.has_stats),
            # n_rows=-1 marks a failed footer read, not an empty file
            "rows": sum(e.n_rows for e in zm if e.n_rows > 0),
            "files_unreadable": sum(1 for e in zm if e.n_rows < 0),
        }
        if args.lo is not None and args.hi is not None:
            dt = load_table(spark, args.path).schema[args.column].dataType
            kept, skipped = zonemap.prune_files(
                zm, _parse_bound_for(dt, args.lo), _parse_bound_for(dt, args.hi)
            )
            summary.update(files_kept=len(kept), files_skipped=len(skipped))
    elif args.cmd == "bloom-build":
        from .sources.bloomskip import build_bloom_index

        idx = build_bloom_index(spark, args.path, args.column)
        summary = {
            "cmd": "bloom-build", "column": args.column,
            "files_indexed": idx.count(),
        }
    elif args.cmd == "bloom-lookup":
        from pyspark.sql import functions as F
        from .sources.bloomskip import bloom_prune

        v = _parse_bound_for(
            load_table(spark, args.path).schema[args.column].dataType,
            args.value,
        )
        # prune ONCE and read the kept files directly (bloom_read
        # would re-run the whole pruning pipeline)
        kept, skipped = bloom_prune(spark, args.path, args.column, v)
        n = (
            load_table(spark, *kept).filter(F.col(args.column) == F.lit(v)).count()
            if kept else 0
        )
        summary = {
            "cmd": "bloom-lookup", "value": args.value, "rows": n,
            "files_kept": len(kept), "files_skipped": len(skipped),
        }
    elif args.cmd == "profile-drift":
        from .operators.profile import profile_df, profile_drift

        a = load_table(spark, args.baseline)
        b = load_table(spark, args.candidate)
        cols = _csv(args.columns) if args.columns else sorted(
            set(a.columns) & set(b.columns)
        )
        rep = profile_drift(profile_df(a, cols), profile_df(b, cols))
        rows = rep.collect()
        if args.out:
            rep.write.mode("overwrite").parquet(args.out)
        summary = {
            "cmd": "profile-drift",
            "columns": len(rows),
            "drifted": sorted(
                r["column_name"] for r in rows if r["any_drift"]
            ),
        }
    elif args.cmd == "repair-plan":
        from .operators.kernels import repair_plan

        plan = repair_plan(
            load_table(spark, args.authoritative),
            load_table(spark, args.replica),
            _csv(args.keys),
        )
        plan.write.mode("overwrite").parquet(args.out)
        from pyspark.sql import functions as F

        counts = {
            r["op"]: r["n"]
            for r in spark.read.parquet(args.out)
            .groupBy("op").agg(F.count("*").alias("n")).collect()
        }
        summary = {"cmd": "repair-plan", "out": args.out, "ops": counts}
    elif args.cmd == "repair-apply":
        from .operators.kernels import apply_repair

        _guard_out(ap, args.out, args.replica, args.plan)
        out = apply_repair(
            load_table(spark, args.replica),
            spark.read.parquet(args.plan),
            _csv(args.keys),
        )
        out.write.mode("overwrite").parquet(args.out)
        summary = {
            "cmd": "repair-apply", "out": args.out,
            "rows": spark.read.parquet(args.out).count(),
        }
    elif args.cmd == "scd2-apply":
        from .operators.scd import scd2_apply

        _guard_out(ap, args.out, args.dim, args.snapshot)
        as_of = date.fromisoformat(args.as_of)
        new_dim = scd2_apply(
            load_table(spark, args.dim),
            load_table(spark, args.snapshot),
            _csv(args.keys), _csv(args.tracked), as_of,
        )
        new_dim.write.mode("overwrite").parquet(args.out)
        from pyspark.sql import functions as F

        counts = {
            r["version_action"]: r["n"]
            for r in spark.read.parquet(args.out)
            .groupBy("version_action").agg(F.count("*").alias("n")).collect()
        }
        summary = {"cmd": "scd2-apply", "out": args.out, "actions": counts}
    elif args.cmd == "bm25-index":
        from .operators.search import build_bm25_index

        build_bm25_index(
            spark, load_table(spark, args.corpus), args.out,
            text_col=args.text_col, id_col=args.id_col,
            corpus_path=args.corpus,
        )
        stats = spark.read.parquet(f"{args.out}/stats").collect()[0]
        summary = {
            "cmd": "bm25-index", "out": args.out,
            "n_docs": stats["n_docs"], "avgdl": stats["avgdl"],
        }
    elif args.cmd == "bm25-refresh":
        from .operators.search import _read_manifest, refresh_bm25_index

        action = refresh_bm25_index(
            spark, args.corpus, args.index,
            text_col=args.text_col, id_col=args.id_col,
        )
        man = _read_manifest(spark, args.index)
        summary = {
            "cmd": "bm25-refresh", "action": action,
            "n_docs": man["n_docs"], "segments": len(man["segments"]),
        }
    elif args.cmd == "bm25-vacuum":
        from .operators.search import vacuum_bm25_index

        removed = vacuum_bm25_index(spark, args.index)
        summary = {"cmd": "bm25-vacuum", "removed_segments": removed}
    elif args.cmd == "versioned-commit":
        from .sources import versioned

        v = versioned.commit(
            spark, load_table(spark, args.src), args.table, mode=args.mode
        )
        summary = {"cmd": "versioned-commit", "version": v, "mode": args.mode}
    elif args.cmd == "versioned-history":
        from .sources import versioned

        summary = {
            "cmd": "versioned-history",
            "versions": [
                {"version": h.version, "mode": h.mode,
                 "n_files": h.n_files, "parent": h.parent,
                 "committed_at": h.committed_at}
                for h in versioned.history(args.table)
            ],
        }
    elif args.cmd == "versioned-rollback":
        from .sources import versioned

        v = versioned.rollback(spark, args.table, args.version)
        summary = {
            "cmd": "versioned-rollback", "restored": args.version,
            "as_version": v,
        }
    elif args.cmd == "versioned-delete":
        from .sources import versioned

        v, n = versioned.delete_where(
            spark, args.table, args.where, strategy=args.strategy
        )
        summary = {
            "cmd": "versioned-delete", "version": v, "n_deleted": n,
            "strategy": args.strategy,
        }
    elif args.cmd == "versioned-update":
        from .sources import versioned

        sets = {}
        for part in _split_assignments(args.set):
            c, eq, e = part.partition("=")
            if not eq or not c.strip() or not e.strip():
                raise SystemExit(f"bad --set assignment: {part!r}")
            sets[c.strip()] = e.strip()
        if not sets:
            raise SystemExit("--set needs at least one col=expr")
        v, n = versioned.update_where(
            spark, args.table, args.where, sets, strategy=args.strategy
        )
        summary = {
            "cmd": "versioned-update", "version": v, "n_updated": n,
            "strategy": args.strategy,
        }
    elif args.cmd == "versioned-merge":
        from .sources import versioned

        keys = [k.strip() for k in args.keys.split(",") if k.strip()]
        if not keys:
            raise SystemExit("--keys needs at least one column")
        v = versioned.merge_into(
            spark, args.table, load_table(spark, args.source), keys,
            strategy=args.strategy,
        )
        summary = {"cmd": "versioned-merge", "version": v}
    elif args.cmd == "versioned-sql":
        from .sources import versioned_sql as vsql

        bound = []
        try:
            for item in args.register:
                name, eq, tpath = item.partition("=")
                if not eq or not name.strip() or not tpath.strip():
                    raise SystemExit(f"bad --register binding: {item!r}")
                vsql.register_table(name.strip(), tpath.strip())
                bound.append(name.strip())
            df = vsql.versioned_sql(
                spark, args.statement, strategy=args.strategy
            )
            rows = [r.asDict() for r in df.limit(args.max_rows).collect()]
        finally:
            for name in bound:  # process-local registry: leave it clean
                vsql.register_table(name, None)
        summary = {"cmd": "versioned-sql", "rows": rows}
    elif args.cmd == "versioned-dv-info":
        from .sources import versioned

        dvs = versioned.dv_info(args.table, args.version)
        summary = {
            "cmd": "versioned-dv-info",
            "n_files_with_dvs": len(dvs),
            "n_dead_rows": sum(int(e["n"]) for e in dvs.values()),
            "entries": dvs,
        }
    elif args.cmd == "rollup-build":
        from .sources import matview

        measures = {}
        for m in args.measure:
            name, _, expr = m.partition("=")
            if not expr:
                ap.error(f"--measure needs name=expr, got {m!r}")
            measures[name] = expr
        v, src_v = matview.build_rollup(
            spark, args.table, args.rollup, _csv(args.keys), measures
        )
        summary = {
            "cmd": "rollup-build", "rollup_version": v,
            "source_version": src_v,
        }
    elif args.cmd == "rollup-refresh":
        from .sources import matview

        v, src_v = matview.refresh_rollup(spark, args.table, args.rollup)
        summary = {
            "cmd": "rollup-refresh", "rollup_version": v,
            "source_version": src_v,
        }
    elif args.cmd == "versioned-schema":
        from .sources import versioned

        if args.from_version is not None:
            summary = {
                "cmd": "versioned-schema",
                "from_version": args.from_version,
                **versioned.schema_changes(
                    args.table, args.from_version, args.to_version
                ),
            }
        else:
            summary = {
                "cmd": "versioned-schema",
                "history": [
                    {"version": v, "schema": s}
                    for v, s in versioned.schema_history(args.table)
                ],
            }
    elif args.cmd == "versioned-changes":
        from .sources import versioned

        feed = versioned.changes(
            spark, args.table, args.from_version, args.to_version
        )
        by_type = {
            r["_change_type"]: r["n"]
            for r in feed.groupBy("_change_type").count()
            .withColumnRenamed("count", "n").collect()
        }
        summary = {
            "cmd": "versioned-changes",
            "from_version": args.from_version,
            "to_version": args.to_version,
            "inserts": by_type.get("insert", 0),
            "deletes": by_type.get("delete", 0),
        }
    elif args.cmd == "versioned-optimize":
        from .sources import versioned

        v, before, after = versioned.optimize(
            spark, args.table,
            zorder_by=_csv(args.zorder_by) if args.zorder_by else None,
            n_files=args.n_files,
        )
        summary = {
            "cmd": "versioned-optimize", "version": v,
            "files_before": before, "files_after": after,
            "zorder_by": _csv(args.zorder_by) if args.zorder_by else [],
        }
    elif args.cmd == "versioned-compact-small":
        from .sources import versioned
        from .sources.versioned import DEFAULT_OPTIMIZE_TARGET_BYTES

        v, rewritten, added = versioned.compact_files(
            spark, args.table,
            target_bytes=args.target_bytes or DEFAULT_OPTIMIZE_TARGET_BYTES,
            min_bytes=args.min_bytes,
        )
        summary = {
            "cmd": "versioned-compact-small", "version": v,
            "files_rewritten": rewritten, "files_added": added,
        }
    elif args.cmd == "versioned-stats":
        from .sources import versioned

        summary = {
            "cmd": "versioned-stats",
            "n_rows": versioned.row_count(spark, args.table, args.version),
        }
        if args.columns:
            summary["columns"] = {
                c: {
                    "min": None if ent["min"] is None else str(ent["min"]),
                    "max": None if ent["max"] is None else str(ent["max"]),
                    "n_nulls": ent["n_nulls"],
                    "ok": ent["ok"],
                }
                for c, ent in versioned.stats_summary(
                    args.table, _csv(args.columns), args.version
                ).items()
            }
    elif args.cmd == "versioned-vacuum":
        from .sources import versioned

        kw = {}
        if args.min_age_s is not None:
            kw["min_age_s"] = args.min_age_s
        removed = versioned.vacuum(
            args.table, args.keep_versions, dry_run=args.dry_run, **kw
        )
        # whole dirs AND individual files (partial-dir reclaim)
        summary = {
            "cmd": "versioned-vacuum",
            "dry_run": args.dry_run,
            "removed_paths": removed,
        }
    elif args.cmd == "versioned-clone":
        from .sources import versioned

        versioned.clone(
            spark, args.src, args.dst,
            version=args.version, timestamp=args.timestamp,
        )
        summary = {
            "cmd": "versioned-clone", "dst": args.dst,
            "n_rows": versioned.row_count(spark, args.dst),
        }
    elif args.cmd == "versioned-constraints":
        from .sources import versioned

        if args.set is None:
            summary = {
                "cmd": "versioned-constraints",
                "constraints": versioned.constraints(args.table),
            }
        else:
            new = {}
            for part in _split_assignments(args.set):
                c, eq, e = part.partition("=")
                if not eq or not c.strip() or not e.strip():
                    raise SystemExit(f"bad --set assignment: {part!r}")
                new[c.strip()] = e.strip()
            v = versioned.set_constraints(spark, args.table, new)
            summary = {
                "cmd": "versioned-constraints", "version": v,
                "constraints": new,
            }
    elif args.cmd == "bm25-search":
        from .operators.search import bm25_topk, bm25_topk_indexed

        if bool(args.corpus) == bool(args.index):
            ap.error("bm25-search needs exactly one of --corpus / --index")
        if args.index:
            top = bm25_topk_indexed(spark, args.index, args.query, k=args.k)
        else:
            top = bm25_topk(
                load_table(spark, args.corpus), args.query, k=args.k,
                text_col=args.text_col, id_col=args.id_col,
            )
        summary = {
            "cmd": "bm25-search",
            "results": [r.asDict() for r in top.collect()],
        }
    else:  # pragma: no cover — argparse enforces choices
        raise SystemExit(2)

    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
