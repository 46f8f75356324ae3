"""Selection DSL: ``USER_DATABASES, -%tmp%, Db1.schema1.tbl%`` …

Re-expression of the reference's recursive-CTE tokenizer + two-pass
include/exclude LIKE set algebra (IntegrityChecks_VLDB.sql:213-349;
DatabaseIntegrityCheck.sql:350-714).  The DSL string and the candidate
*databases* are metadata-sized, so parsing and evaluation are pure
Python on the driver; a DataFrame evaluator (`match_candidates_df`)
exists for metadata at scale (millions of objects), implemented as a
broadcast theta-join so Catalyst turns it into BroadcastNestedLoopJoin
with a tiny build side (SURVEY §2.3 #24).

Semantics preserved from the reference:

- tokenization strips CR/LF/tab, collapses ``", "``/``" ,"`` → ``","``
  (IC:233-239), splits on ``,``; the 1-based token index is the
  ``StartPosition`` used for final ordering (IC:322-349).
- a leading ``-`` marks an exclusion; exclusions override inclusions
  (two UPDATE passes, IC:300-319).
- keywords expand to pattern+type: ``ALL_DATABASES`` → ``%``,
  ``SYSTEM_DATABASES`` → ``%`` + type S, ``USER_DATABASES`` → ``%`` +
  type U, ``AVAILABILITY_GROUP_DATABASES`` → ``%`` + AG flag
  (IC:263-265); ``ALL_FILEGROUPS`` → ``%.%`` (DIC:623),
  ``ALL_OBJECTS`` → ``%.%.%`` (DIC:675).
- ``[bracketed]`` parts are unquoted (PARSENAME, IC:272; DIC:682-684).
- ``tempdb`` and snapshot databases are only selected when named
  exactly (IC:307,318).
- literal underscores in patterns are escaped before LIKE matching
  (``REPLACE(name,'_','[_]')``, IC:304) — handled by
  ``tsql_like_to_regex(..., escape_underscore=True)``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..functions.like import tsql_like_match

_DB_KEYWORDS = {"ALL_DATABASES", "SYSTEM_DATABASES", "USER_DATABASES", "AVAILABILITY_GROUP_DATABASES"}


@dataclass
class SelectionItem:
    """One parsed DSL token."""

    raw: str
    selected: bool  # False = exclusion ('-' prefix)
    start_position: int  # 1-based token index
    database_pattern: str = "%"
    schema_pattern: str | None = None
    object_pattern: str | None = None
    database_type: str | None = None  # 'S' | 'U' | None (any)
    availability_group: bool = False


@dataclass
class DatabaseCandidate:
    """A row of our synthetic ``sys.databases`` (SURVEY §2.1 #1)."""

    name: str
    database_type: str = "U"  # 'S' | 'U' per IC:290 name-based rule
    is_snapshot: bool = False
    availability_group: str | None = None
    # sys.databases.is_read_only analogue (DIC:1300, gate DIC:1341-1346)
    read_only: bool = False
    order: int | None = None  # assigned by evaluation
    start_position: int | None = None


def classify_database_type(name: str, is_distributor: bool = False) -> str:
    """'S' for master/msdb/model or a distributor, else 'U' (IC:290)."""
    return "S" if name.lower() in ("master", "msdb", "model") or is_distributor else "U"


def tokenize(dsl: str) -> list[str]:
    """IC:233-253 — normalize separators and split; empty tokens dropped."""
    s = dsl.replace("\r", "").replace("\n", "").replace("\t", "")
    # collapse any spacing around commas (the reference loops REPLACE
    # of ', ' and ' ,' until fixpoint — regex achieves the fixpoint)
    s = re.sub(r"\s*,\s*", ",", s.strip())
    return [t for t in s.split(",") if t != ""]


def _split_parts(token: str) -> list[str]:
    """Split a multi-part name on '.' honoring [brackets] (PARSENAME)."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in token:
        if ch == "[" and depth == 0:
            depth = 1
            buf.append(ch)
        elif ch == "]" and depth == 1:
            depth = 0
            buf.append(ch)
        elif ch == "." and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def _unbracket(part: str) -> str:
    if len(part) >= 2 and part.startswith("[") and part.endswith("]"):
        return part[1:-1]
    return part


def parse_dsl(dsl: str, scope: str = "database") -> list[SelectionItem]:
    """Parse a selection DSL string.

    scope='database' → 1-part patterns with keywords;
    scope='object' → ``Db.Schema.Object`` 3-part (DIC:645-692);
    scope='filegroup' → ``Db.Filegroup`` 2-part (DIC:593-639).
    """
    items: list[SelectionItem] = []
    for pos, raw in enumerate(tokenize(dsl), start=1):
        selected = not raw.startswith("-")
        body = raw[1:] if not selected else raw
        item = SelectionItem(raw=raw, selected=selected, start_position=pos)
        upper = body.upper()
        if scope == "database":
            if upper in _DB_KEYWORDS:
                item.database_pattern = "%"
                if upper == "SYSTEM_DATABASES":
                    item.database_type = "S"
                elif upper == "USER_DATABASES":
                    item.database_type = "U"
                elif upper == "AVAILABILITY_GROUP_DATABASES":
                    item.availability_group = True
            else:
                item.database_pattern = _unbracket(body)
        elif scope == "filegroup":
            if upper == "ALL_FILEGROUPS":
                item.database_pattern, item.schema_pattern = "%", "%"
            else:
                parts = [_unbracket(p) for p in _split_parts(body)]
                if len(parts) != 2:
                    raise ValueError(
                        f"filegroup selection must be Db.Filegroup: {raw!r}"
                        " (bracket names containing dots: [my.db].PRIMARY)"
                    )
                item.database_pattern, item.schema_pattern = parts
        elif scope == "object":
            if upper == "ALL_OBJECTS":
                item.database_pattern, item.schema_pattern, item.object_pattern = "%", "%", "%"
            else:
                parts = [_unbracket(p) for p in _split_parts(body)]
                if len(parts) != 3:
                    raise ValueError(
                        f"object selection must be Db.Schema.Object: {raw!r}"
                        " (bracket names containing dots: [my.db].schema.obj)"
                    )
                item.database_pattern, item.schema_pattern, item.object_pattern = parts
        else:
            raise ValueError(f"unknown scope {scope!r}")
        items.append(item)
    return items


def _db_item_matches(item: SelectionItem, cand: DatabaseCandidate) -> bool:
    if not tsql_like_match(cand.name, item.database_pattern, escape_underscore=True):
        return False
    if item.database_type is not None and item.database_type != cand.database_type:
        return False
    if item.availability_group and cand.availability_group is None:
        return False
    # tempdb / snapshot guard (IC:307,318): only when named exactly
    if (cand.name == "tempdb" or cand.is_snapshot) and cand.name != item.database_pattern:
        return False
    return True


def select_databases(dsl: str, candidates: list[DatabaseCandidate]) -> list[DatabaseCandidate]:
    """Two-pass include/exclude + StartPosition + final ordering.

    Returns the selected candidates ordered by (min matched include
    StartPosition, name) with ``order`` assigned 1..n (IC:343-349).
    """
    items = parse_dsl(dsl, scope="database")
    includes = [i for i in items if i.selected]
    excludes = [i for i in items if not i.selected]
    out: list[DatabaseCandidate] = []
    for cand in candidates:
        matched = [i for i in includes if _db_item_matches(i, cand)]
        if not matched:
            continue
        if any(_db_item_matches(i, cand) for i in excludes):
            continue  # exclusions win (IC:311-319)
        cand.start_position = min(i.start_position for i in matched)
        out.append(cand)
    out.sort(key=lambda c: (c.start_position, c.name))
    for n, cand in enumerate(out, start=1):
        cand.order = n
    return out


def select_availability_groups(dsl: str, group_names: list[str]) -> dict[str, int]:
    """@AvailabilityGroups DSL over AG names (DIC:480-535).

    Same include/exclude LIKE algebra as the other scopes:
    ``ALL_AVAILABILITY_GROUPS`` → ``%`` (DIC:514), ``-`` prefix
    excludes (DIC:507-509), ``[bracketed]`` names unquote (DIC:521),
    literal underscores escaped before matching (DIC:534
    ``REPLACE(...,'_','[_]')``).  Returns {group_name: start_position}
    with StartPosition = MIN over matching include items (DIC:545-556).
    """
    items: list[SelectionItem] = []
    for pos, raw in enumerate(tokenize(dsl), start=1):
        selected = not raw.startswith("-")
        body = raw[1:] if not selected else raw
        if body == "":
            raise ValueError(
                "The value for the parameter @AvailabilityGroups is not supported."
            )
        pattern = "%" if body.upper() == "ALL_AVAILABILITY_GROUPS" else _unbracket(body)
        items.append(
            SelectionItem(
                raw=raw, selected=selected, start_position=pos,
                database_pattern=pattern,
            )
        )
    if not items:  # DIC:570-575 — empty selection is an error
        raise ValueError(
            "The value for the parameter @AvailabilityGroups is not supported."
        )
    includes = [i for i in items if i.selected]
    excludes = [i for i in items if not i.selected]
    out: dict[str, int] = {}
    for name in group_names:
        matched = [
            i for i in includes
            if tsql_like_match(name, i.database_pattern, escape_underscore=True)
        ]
        if not matched:
            continue
        if any(
            tsql_like_match(name, i.database_pattern, escape_underscore=True)
            for i in excludes
        ):
            continue
        out[name] = min(i.start_position for i in matched)
    return out


def select_databases_by_availability_groups(
    dsl: str, candidates: list[DatabaseCandidate]
) -> list[DatabaseCandidate]:
    """Member databases of the selected AGs (DIC:558-567): every
    candidate whose ``availability_group`` tag is in the selected set,
    carrying the AG's StartPosition, ordered like
    :func:`select_databases`."""
    groups = sorted({c.availability_group for c in candidates if c.availability_group})
    sel = select_availability_groups(dsl, groups)
    out: list[DatabaseCandidate] = []
    for cand in candidates:
        if cand.availability_group in sel:
            cand.start_position = sel[cand.availability_group]
            out.append(cand)
    out.sort(key=lambda c: (c.start_position, c.name))
    for n, cand in enumerate(out, start=1):
        cand.order = n
    return out


def match_filegroups(
    dsl_items: list[SelectionItem],
    pairs: list[tuple[str, str]],
) -> list[tuple[str, str]]:
    """Evaluate a filegroup-scope DSL over (db, filegroup) pairs
    (DIC:1393-1400 include/exclude semantics)."""
    def m(item: SelectionItem, t: tuple[str, str]) -> bool:
        return (
            tsql_like_match(t[0], item.database_pattern, escape_underscore=True)
            and tsql_like_match(t[1], item.schema_pattern or "%", escape_underscore=True)
        )

    includes = [i for i in dsl_items if i.selected]
    excludes = [i for i in dsl_items if not i.selected]
    return [
        t
        for t in pairs
        if any(m(i, t) for i in includes) and not any(m(i, t) for i in excludes)
    ]


def match_objects(
    dsl_items: list[SelectionItem],
    triples: list[tuple[str, str, str]],
) -> list[tuple[str, str, str]]:
    """Evaluate an object-scope DSL over (db, schema, object) triples
    (DIC:1552-1566 include/exclude semantics). Order of input preserved."""
    def m(item: SelectionItem, t: tuple[str, str, str]) -> bool:
        return (
            tsql_like_match(t[0], item.database_pattern, escape_underscore=True)
            and tsql_like_match(t[1], item.schema_pattern or "%", escape_underscore=True)
            and tsql_like_match(t[2], item.object_pattern or "%", escape_underscore=True)
        )

    includes = [i for i in dsl_items if i.selected]
    excludes = [i for i in dsl_items if not i.selected]
    return [
        t
        for t in triples
        if any(m(i, t) for i in includes) and not any(m(i, t) for i in excludes)
    ]
