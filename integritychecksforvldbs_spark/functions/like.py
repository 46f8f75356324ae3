"""T-SQL ``LIKE`` pattern → anchored Java/RE2-style regex translation.

The reference's selection DSL matches names with T-SQL ``LIKE``
(reference: IntegrityChecks_VLDB.sql:304,315,328 and
DatabaseIntegrityCheck.sql:439,1393,1552), whose pattern language has
``%`` (any run), ``_`` (any one char) and ``[...]`` / ``[^...]``
character classes.  Spark's ``LIKE`` has no character classes, so we
translate to a regex and match with ``rlike`` (SURVEY §2.2 #16).

The reference additionally escapes literal underscores in *candidate
patterns* via ``REPLACE(pattern, '_', '[_]')`` before matching
(IntegrityChecks_VLDB.sql:304) — i.e. a ``_`` typed by the user in a
database name is literal, while ``%`` stays a wildcard.  That behavior
is ``escape_underscore=True``.
"""

from __future__ import annotations

import re

# regex metacharacters that must be escaped when taken literally
_META = set(".^$*+?()[]{}|\\")


def _lit(ch: str) -> str:
    return "\\" + ch if ch in _META else ch


def tsql_like_to_regex(pattern: str, escape_underscore: bool = False) -> str:
    """Translate a T-SQL LIKE pattern into an anchored regex string.

    - ``%``  → ``.*``
    - ``_``  → ``.`` (or a literal ``_`` when ``escape_underscore``)
    - ``[abc]`` / ``[a-z]`` / ``[^abc]`` / ``[_]`` → regex classes
    - everything else matched literally (regex metas escaped)
    """
    out: list[str] = ["^"]
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append("_" if escape_underscore else ".")
        elif ch == "[":
            j = pattern.find("]", i + 1)
            if j == -1:  # unterminated class → literal '['
                out.append("\\[")
            else:
                inner = pattern[i + 1 : j]
                if inner == "":
                    # T-SQL '[]' never matches; emit an impossible class
                    out.append("(?!)")
                else:
                    neg = inner.startswith("^")
                    if neg:
                        inner = inner[1:]
                    # escape regex class metas except '-' used for ranges
                    body = re.sub(r"([\\\]\[^])", r"\\\1", inner)
                    out.append("[" + ("^" if neg else "") + body + "]")
                i = j
        else:
            out.append(_lit(ch))
        i += 1
    out.append("$")
    return "".join(out)


def tsql_like_match(name: str, pattern: str, escape_underscore: bool = False) -> bool:
    """Driver-side match helper (DSL strings are metadata-sized)."""
    return re.match(tsql_like_to_regex(pattern, escape_underscore), name) is not None
