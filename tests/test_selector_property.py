"""Property-based selection-DSL tests (SURVEY §5.2 test 6):
random DSL strings never crash the parser, and the include/exclude
algebra matches a brute-force set evaluation."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from integritychecksforvldbs_spark.functions.like import tsql_like_match
from integritychecksforvldbs_spark.operators.selector import (
    DatabaseCandidate,
    parse_dsl,
    select_databases,
    tokenize,
)

# token alphabet: names, wildcards, brackets, keywords, minus, noise
_token = st.one_of(
    st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True),
    st.sampled_from(
        [
            "ALL_DATABASES",
            "USER_DATABASES",
            "SYSTEM_DATABASES",
            "%Db%",
            "Db_1",
            "[Db 1]",
            "%",
            "-%tmp%",
            "-Db1",
            "",
            " ",
        ]
    ),
)
_dsl = st.lists(_token, min_size=0, max_size=8).map(", ".join)

_names = ["master", "msdb", "model", "tempdb", "Db1", "Db2", "DbTmp", "prod_a", "Snap1"]


def _candidates() -> list[DatabaseCandidate]:
    out = []
    for n in _names:
        out.append(
            DatabaseCandidate(
                name=n,
                database_type="S" if n in ("master", "msdb", "model") else "U",
                is_snapshot=(n == "Snap1"),
            )
        )
    return out


@given(_dsl)
@settings(max_examples=200, deadline=None)
def test_parser_never_crashes(dsl):
    items = parse_dsl(dsl, scope="database")
    # token positions are 1-based and strictly increasing
    assert [i.start_position for i in items] == list(
        range(1, len(items) + 1)
    )
    select_databases(dsl, _candidates())  # evaluation never crashes either


@given(_dsl)
@settings(max_examples=200, deadline=None)
def test_include_exclude_matches_bruteforce(dsl):
    """Reference semantics re-derived independently: a candidate is
    selected iff ≥1 include matches and no exclude matches, with the
    keyword/type/tempdb/snapshot guards applied (IC:300-319)."""
    got = {c.name for c in select_databases(dsl, _candidates())}

    def matches(item, cand) -> bool:
        if not tsql_like_match(cand.name, item.database_pattern, escape_underscore=True):
            return False
        if item.database_type is not None and item.database_type != cand.database_type:
            return False
        if item.availability_group and cand.availability_group is None:
            return False
        if (cand.name == "tempdb" or cand.is_snapshot) and cand.name != item.database_pattern:
            return False
        return True

    items = parse_dsl(dsl, scope="database")
    expect = set()
    for cand in _candidates():
        inc = any(matches(i, cand) for i in items if i.selected)
        exc = any(matches(i, cand) for i in items if not i.selected)
        if inc and not exc:
            expect.add(cand.name)
    assert got == expect


@given(st.from_regex(r"[A-Za-z0-9_%\[\]\-^ ]{0,12}", fullmatch=True), st.sampled_from(_names))
@settings(max_examples=300, deadline=None)
def test_like_match_agrees_with_regex_translation(pattern, name):
    """tsql_like_match must agree with a direct re-implementation:
    % → .*, _ escaped to literal (IC:304), [...] classes preserved."""
    got = tsql_like_match(name, pattern, escape_underscore=True)
    # independent translation
    rx = ""
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "%":
            rx += ".*"
        elif ch == "[":
            j = pattern.find("]", i + 1)
            if j == -1:
                rx += re.escape(pattern[i:])
                i = len(pattern)
                continue
            body = pattern[i + 1 : j]
            if body.startswith("^"):
                rx += "[^" + re.escape(body[1:]) + "]" if body[1:] else re.escape("[^]")
            elif body:
                rx += "[" + re.escape(body) + "]"
            else:
                rx += re.escape("[]")
            i = j
        else:
            rx += re.escape(ch)
        i += 1
    try:
        expect = re.fullmatch(rx, name) is not None
    except re.error:
        return  # degenerate pattern — only crash-freedom is asserted
    assert got == expect, f"pattern={pattern!r} name={name!r} rx={rx!r}"
