"""SQL front door for versioned tables — MERGE / DELETE / UPDATE /
time-travel SELECT as statements.

The versioned layer's reads already compose with SQL (register a
``versioned.read`` frame as a temp view), but the DML triad and time
travel were Python-API-only — and real lakehouse users live in SQL
(the r8 verdict's "What's missing #5").  Spark's parser has no
extension point for MERGE-into-arbitrary-Python-formats, so this is a
THIN DISPATCHER, the same shape Delta shipped before native SQL
support: recognize the four statement forms, extract the pieces
(predicates, SET lists, merge keys stay VERBATIM SQL — Spark itself
evaluates them; this module never interprets an expression), and
route to :mod:`.versioned`'s primitives, which own atomicity,
conflict handling, and the copy-vs-DV decision.

Statement forms (case-insensitive keywords; ``<table>`` is a name
registered via :func:`register_table` or an explicit path):

- ``DELETE FROM <table> [WHERE <cond>]``
- ``UPDATE <table> SET col = expr[, ...] [WHERE <cond>]``
- ``MERGE INTO <table> [AS] t USING (<subquery>)|<view> [AS] s
  ON t.k = s.k [AND ...]
  [WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *]``
  — the upsert-all form, exactly :func:`~.versioned.merge_into`'s
  semantics (matched rows replaced wholesale, new rows inserted);
  per-column WHEN clauses are out of scope by design.
- ``SELECT ... FROM <table> [VERSION AS OF n | TIMESTAMP AS OF ts]
  ...`` — every registered table reference is materialized as the
  requested snapshot view and the rewritten statement runs through
  ``spark.sql`` unchanged otherwise (joins, CTEs, aggregates all
  work; ts is epoch seconds or an ISO-8601 literal).

DML statements return a one-row metrics DataFrame (``version`` plus
``n_deleted``/``n_updated``/``n_source_rows``), mirroring the metrics
row Spark SQL surfaces for DML on native formats.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from integritychecksforvldbs_spark.sources import versioned

# process-local name -> table-root registry (the same scope the
# versioned log backends use); paths also work inline
_TABLES: dict[str, str] = {}


def register_table(name: str, path: str) -> None:
    """Bind ``name`` for use in statements; ``None`` path unbinds."""
    if path is None:
        _TABLES.pop(name.lower(), None)
    else:
        _TABLES[name.lower()] = path


def _resolve(token: str) -> str:
    t = token.strip().strip("`'\"")
    if t.lower() in _TABLES:
        return _TABLES[t.lower()]
    if "/" in t:
        return t  # an explicit table-root path
    raise ValueError(
        f"unknown versioned table {token!r}: register_table() it or "
        "pass an explicit path"
    )


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` (a regex, case-insensitive) at paren/quote
    depth 0 — SET lists and ON conjunctions contain commas and ANDs
    inside function calls and string literals."""
    out, depth, last, i = [], 0, 0, 0
    in_str: str | None = None
    pat = re.compile(sep, re.I)
    while i < len(s):
        c = s[i]
        if in_str:
            if c == in_str:
                in_str = None
            i += 1
            continue
        if c in ("'", '"'):
            in_str = c
            i += 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(s, i)
            if m:
                out.append(s[last:i])
                i = m.end()
                last = i
                continue
        i += 1
    out.append(s[last:])
    return out


def _epoch(ts: str) -> float:
    ts = ts.strip().strip("'\"")
    try:
        return float(ts)
    except ValueError:
        import datetime

        return datetime.datetime.fromisoformat(ts).timestamp()


_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<tbl>\S+)(?:\s+WHERE\s+(?P<cond>.+?))?\s*;?\s*$",
    re.I | re.S,
)
_UPDATE = re.compile(
    r"^\s*UPDATE\s+(?P<tbl>\S+)\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<cond>.+?))?\s*;?\s*$",
    re.I | re.S,
)
_MERGE_HEAD = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<tbl>\S+)(?:\s+(?:AS\s+)?(?P<talias>\w+))?"
    r"\s+USING\s+",
    re.I | re.S,
)


def _find_top(s: str, pattern: str) -> int:
    """Index of the first match of ``pattern`` at paren/quote depth 0,
    or -1 — how the MERGE parser finds keywords without being fooled
    by subqueries and string literals."""
    pat = re.compile(pattern, re.I)
    depth, i = 0, 0
    in_str: str | None = None
    while i < len(s):
        c = s[i]
        if in_str:
            if c == in_str:
                in_str = None
        elif c in ("'", '"'):
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(s, i)
            if m:
                return i
        i += 1
    return -1


def _parse_merge(stmt: str) -> dict:
    """MERGE pieces, parens/quotes respected: the USING source may be
    a balanced ``(subquery)`` containing anything (a single regex
    cannot bracket-match it)."""
    m = _MERGE_HEAD.match(stmt)
    if not m:
        raise ValueError(f"cannot parse MERGE statement: {stmt!r}")
    rest = stmt[m.end():]
    if rest.startswith("("):
        depth, i = 0, 0
        in_str: str | None = None
        for i, c in enumerate(rest):
            if in_str:
                if c == in_str:
                    in_str = None
            elif c in ("'", '"'):
                in_str = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
        if depth != 0:
            raise ValueError(f"unbalanced USING subquery in {stmt!r}")
        src, rest = rest[: i + 1], rest[i + 1:]
    else:
        sp = re.match(r"\S+", rest)
        src, rest = sp.group(0), rest[sp.end():]
    am = re.match(r"\s+(?:AS\s+)?(?!ON\b)(\w+)", rest, re.I)
    salias = am.group(1) if am else None
    if am:
        rest = rest[am.end():]
    om = re.match(r"\s*ON\s+", rest, re.I | re.S)
    if not om:
        raise ValueError(f"MERGE statement needs an ON clause: {stmt!r}")
    rest = rest[om.end():]
    w = _find_top(rest, r"\bWHEN\b")
    on, when = (rest, None) if w < 0 else (rest[:w], rest[w:])
    return {
        "tbl": m.group("tbl"),
        "talias": m.group("talias"),
        "src": src,
        "salias": salias,
        "on": on.rstrip().rstrip(";"),
        "when": when,
    }
_WHEN_UPSERT_ALL = re.compile(
    r"^\s*WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*"
    r"\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$",
    re.I | re.S,
)
_TIME_TRAVEL = re.compile(
    r"\b(?P<tbl>\w+)\s+(?:VERSION\s+AS\s+OF\s+(?P<ver>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+(?P<ts>'[^']*'|\S+))",
    re.I,
)


def _metrics(spark: SparkSession, **kv) -> DataFrame:
    cols = ", ".join(f"{k} long" for k in kv)
    return spark.createDataFrame([tuple(int(v) for v in kv.values())], cols)


def versioned_sql(
    spark: SparkSession, statement: str, strategy: str = "auto"
) -> DataFrame:
    """Execute one statement against versioned tables (see module
    docstring for the accepted forms).  ``strategy`` passes through to
    the DML primitives (copy-on-write vs deletion vectors)."""
    stmt = statement.strip()
    head = stmt.split(None, 1)[0].upper() if stmt else ""
    if head == "DELETE":
        m = _DELETE.match(stmt)
        if not m:
            raise ValueError(f"cannot parse DELETE statement: {stmt!r}")
        path = _resolve(m.group("tbl"))
        cond = (m.group("cond") or "true").strip()
        v, n = versioned.delete_where(spark, path, cond, strategy=strategy)
        return _metrics(spark, version=v, n_deleted=n)
    if head == "UPDATE":
        m = _UPDATE.match(stmt)
        if not m:
            raise ValueError(f"cannot parse UPDATE statement: {stmt!r}")
        path = _resolve(m.group("tbl"))
        cond = (m.group("cond") or "true").strip()
        sets: dict[str, str] = {}
        for piece in _split_top(m.group("sets"), r","):
            col, eq, expr = piece.partition("=")
            if not eq or not col.strip() or not expr.strip():
                raise ValueError(f"cannot parse SET assignment: {piece!r}")
            sets[col.strip().strip("`")] = expr.strip()
        v, n = versioned.update_where(
            spark, path, cond, sets, strategy=strategy
        )
        return _metrics(spark, version=v, n_updated=n)
    if head == "MERGE":
        m = _parse_merge(stmt)
        when = m["when"]
        if when and not _WHEN_UPSERT_ALL.match(when):
            raise ValueError(
                "only the upsert-all MERGE form is supported: WHEN "
                "MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN "
                f"INSERT * (got {when.strip()!r})"
            )
        path = _resolve(m["tbl"])
        talias = (m["talias"] or m["tbl"]).lower().strip("`'\"")
        src_tok = m["src"].strip()
        salias = (m["salias"] or src_tok).lower().strip("`'\"")
        if src_tok.startswith("("):
            source = spark.sql(src_tok[1:-1])
        else:
            source = spark.table(src_tok)
        keys = []
        for piece in _split_top(m["on"], r"\bAND\b"):
            eq = _split_top(piece, r"=")
            if len(eq) != 2:
                raise ValueError(
                    f"MERGE ON must be a conjunction of equalities, got "
                    f"{piece.strip()!r}"
                )

            def _side(x: str) -> tuple[str, str]:
                x = x.strip()
                alias, dot, col = x.rpartition(".")
                return alias.lower().strip("`'\""), col.strip("`'\"")

            (la, lc), (ra, rc) = _side(eq[0]), _side(eq[1])
            pair = {la: lc, ra: rc}
            if set(pair) != {talias, salias} or len(pair) != 2:
                raise ValueError(
                    f"MERGE ON equality must join {talias}.<col> to "
                    f"{salias}.<col>, got {piece.strip()!r}"
                )
            if pair[talias] != pair[salias]:
                raise ValueError(
                    "merge keys must share the column name on both "
                    f"sides (got {piece.strip()!r}); alias the source "
                    "column in the USING subquery"
                )
            keys.append(pair[talias])
        v = versioned.merge_into(
            spark, path, source, keys, strategy=strategy
        )
        return _metrics(
            spark, version=v, n_source_rows=source.count()
        )
    if head in ("SELECT", "WITH"):
        return _select(spark, stmt)
    raise ValueError(
        f"unsupported statement {head!r}: expected SELECT/WITH, DELETE, "
        "UPDATE, or MERGE"
    )


def _select(spark: SparkSession, stmt: str) -> DataFrame:
    """Materialize every registered table reference (honoring VERSION
    AS OF / TIMESTAMP AS OF suffixes) as a snapshot temp view, rewrite
    the statement to name the views, and let ``spark.sql`` do the
    rest — the whole SQL surface (joins, CTEs, windows) works over
    pinned snapshots."""
    out = stmt

    def _sub_tt(m: re.Match) -> str:
        name = m.group("tbl")
        if name.lower() not in _TABLES:
            return m.group(0)
        path = _TABLES[name.lower()]
        if m.group("ver") is not None:
            ver: int | None = int(m.group("ver"))
            view = f"__icv_v_{name.lower()}_v{ver}"
            df = versioned.read(spark, path, version=ver)
        else:
            ts = _epoch(m.group("ts"))
            ver = versioned.version_at(path, ts)
            view = f"__icv_v_{name.lower()}_v{ver}"
            df = versioned.read(spark, path, version=ver)
        df.createOrReplaceTempView(view)
        return view

    out = _TIME_TRAVEL.sub(_sub_tt, out)
    # bare (latest-snapshot) references
    for name, path in _TABLES.items():
        pat = re.compile(rf"(?<![\w.]){re.escape(name)}(?![\w.])", re.I)
        if pat.search(out):
            view = f"__icv_v_{name}_latest"
            versioned.read(spark, path).createOrReplaceTempView(view)
            out = pat.sub(view, out)
    return spark.sql(out)


__all__ = ["register_table", "versioned_sql"]
