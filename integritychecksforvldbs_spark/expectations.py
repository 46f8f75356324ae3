"""Declarative integrity expectations per table.

The reference delegates logical checks to ``DBCC CHECKTABLE`` /
``DATA_PURITY`` inside SQL Server (IntegrityChecks_VLDB.sql:684-687).
Our engine needs a concrete, documented check list (SURVEY §7.4 risk 4);
this module pins it.  Expectations are *data*, so the kernel compiler
(`operators.kernels`) can fuse them into one single-pass aggregation per
table, and tests/oracles can enumerate them.

The shipped registry covers the TESTDATA star schema per FIXTURES.md §A.
Tables not listed still get the generic tier (row count, footer
consistency, NaN/Inf-free doubles, timestamp bounds).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ForeignKey:
    columns: list[str]
    parent_table: str
    parent_columns: list[str]


@dataclass
class DomainRule:
    """A boolean SQL predicate that every row must satisfy.

    ``predicate`` is an ANSI-SQL boolean expression over the table's
    columns — valid both as a Spark SQL expression and in the DuckDB
    oracle. ``name`` keys the violation counter column.
    """

    name: str
    predicate: str


@dataclass
class TableExpectations:
    table: str
    primary_key: list[str] = field(default_factory=list)
    not_null: list[str] = field(default_factory=list)
    foreign_keys: list[ForeignKey] = field(default_factory=list)
    domain_rules: list[DomainRule] = field(default_factory=list)
    # columns checked for NaN/Inf by the generic DATA_PURITY tier
    double_columns: list[str] = field(default_factory=list)
    timestamp_columns: list[str] = field(default_factory=list)
    # DATA_PURITY §2.9 #51 extensions: control-char-free text columns
    # and BIGINT columns that must survive an INT32 cast round-trip
    clean_text_columns: list[str] = field(default_factory=list)
    int32_columns: list[str] = field(default_factory=list)


# timestamp sanity window (FIXTURES.md §A domain tier)
TS_MIN, TS_MAX = "1990-01-01", "2100-01-01"


def _ts_rules(cols: list[str]) -> list[DomainRule]:
    return [
        DomainRule(
            f"{c}_in_bounds",
            f"({c} IS NULL OR ({c} >= TIMESTAMP '{TS_MIN} 00:00:00' "
            f"AND {c} < TIMESTAMP '{TS_MAX} 00:00:00'))",
        )
        for c in cols
    ]


# C0 control characters except tab(9)/LF(10)/CR(13), plus DEL(127),
# built with chr() so the literal is identical in Spark SQL and DuckDB
# (embedded backslash escapes are NOT portable — Spark eats them).
_CTRL_CHARS = "||".join(
    f"chr({i})" for i in [*range(1, 9), 11, 12, *range(14, 32), 127]
)


def _clean_text_rules(cols: list[str]) -> list[DomainRule]:
    """DATA_PURITY string tier (SURVEY §2.9 #51): no control characters
    in text columns.  ``translate`` deletes every listed char; a clean
    value keeps its length.  UTF-8 *validity* is structural in both
    engines (string values are validated at ingest), so a row-level
    re-check is degenerate by design — byte-level decode validation
    for opaque payloads lives in the multimodal kernels instead."""
    return [
        DomainRule(
            f"{c}_no_ctrl_chars",
            f"({c} IS NULL OR length(translate({c}, {_CTRL_CHARS}, '')) = length({c}))",
        )
        for c in cols
    ]


def _int32_roundtrip_rules(cols: list[str]) -> list[DomainRule]:
    """DATA_PURITY cast round-trip tier (SURVEY §2.9 #51): BIGINT
    values that must survive an INT32 round-trip.  ``try_cast`` is
    NULL exactly when the value overflows — total (never throws) in
    both engines, unlike ANSI CAST."""
    return [
        DomainRule(
            f"{c}_int32_roundtrip",
            f"({c} IS NULL OR try_cast({c} AS INTEGER) IS NOT NULL)",
        )
        for c in cols
    ]


def _finite_rules(cols: list[str]) -> list[DomainRule]:
    # isnan() exists in both Spark and DuckDB (DuckDB evaluates NaN=NaN
    # as true, so an equality self-check is NOT portable); +/-Infinity
    # compare out via <,> since both engines order NaN/Inf greatest.
    return [
        DomainRule(
            f"{c}_finite",
            f"({c} IS NULL OR (NOT isnan({c}) "
            f"AND {c} < CAST('Infinity' AS DOUBLE) "
            f"AND {c} > CAST('-Infinity' AS DOUBLE)))",
        )
        for c in cols
    ]


def build_registry() -> dict[str, TableExpectations]:
    reg: dict[str, TableExpectations] = {}

    def add(t: TableExpectations) -> None:
        # generic tiers expand into domain rules once, here
        t.domain_rules = (
            list(t.domain_rules)
            + _finite_rules(t.double_columns)
            + _ts_rules(t.timestamp_columns)
            + _clean_text_rules(t.clean_text_columns)
            + _int32_roundtrip_rules(t.int32_columns)
        )
        t.not_null = list(dict.fromkeys(t.primary_key + t.not_null))
        reg[t.table] = t

    add(TableExpectations("region", primary_key=["r_regionkey"], not_null=["r_name"]))
    add(
        TableExpectations(
            "nation",
            primary_key=["n_nationkey"],
            not_null=["n_name", "n_regionkey"],
            foreign_keys=[ForeignKey(["n_regionkey"], "region", ["r_regionkey"])],
        )
    )
    add(
        TableExpectations(
            "customer",
            primary_key=["c_custkey"],
            not_null=["c_name"],
            foreign_keys=[ForeignKey(["c_nationkey"], "nation", ["n_nationkey"])],
            double_columns=["c_acctbal"],
            clean_text_columns=["c_name"],
        )
    )
    add(
        TableExpectations(
            "supplier",
            primary_key=["s_suppkey"],
            not_null=["s_name"],
            foreign_keys=[ForeignKey(["s_nationkey"], "nation", ["n_nationkey"])],
            double_columns=["s_acctbal"],
        )
    )
    add(
        TableExpectations(
            "part",
            primary_key=["p_partkey"],
            not_null=["p_name"],
            domain_rules=[DomainRule("p_size_positive", "(p_size IS NULL OR p_size > 0)")],
            double_columns=["p_retailprice"],
        )
    )
    add(
        TableExpectations(
            "orders",
            primary_key=["o_orderkey"],
            not_null=["o_custkey"],
            foreign_keys=[ForeignKey(["o_custkey"], "customer", ["c_custkey"])],
            domain_rules=[
                DomainRule("o_totalprice_nonneg", "(o_totalprice IS NULL OR o_totalprice >= 0)"),
                DomainRule(
                    "o_orderstatus_enum", "(o_orderstatus IS NULL OR o_orderstatus IN ('O','F','P'))"
                ),
            ],
            double_columns=["o_totalprice"],
            timestamp_columns=["o_orderdate"],
        )
    )
    add(
        TableExpectations(
            "lineitem",
            primary_key=["l_orderkey", "l_linenumber"],
            foreign_keys=[
                ForeignKey(["l_orderkey"], "orders", ["o_orderkey"]),
                ForeignKey(["l_partkey"], "part", ["p_partkey"]),
                ForeignKey(["l_suppkey"], "supplier", ["s_suppkey"]),
            ],
            domain_rules=[
                DomainRule("l_quantity_positive", "(l_quantity IS NULL OR l_quantity > 0)"),
                DomainRule(
                    "l_discount_range",
                    "(l_discount IS NULL OR (l_discount >= 0 AND l_discount <= 1))",
                ),
                DomainRule("l_tax_nonneg", "(l_tax IS NULL OR l_tax >= 0)"),
                DomainRule(
                    "l_extendedprice_nonneg",
                    "(l_extendedprice IS NULL OR l_extendedprice >= 0)",
                ),
            ],
            double_columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            timestamp_columns=["l_shipdate"],
        )
    )
    add(
        TableExpectations(
            "events",
            primary_key=["event_id"],
            not_null=["ts", "user_id", "event_type"],
            double_columns=["value"],
            timestamp_columns=["ts"],
            clean_text_columns=["event_type"],
        )
    )
    add(
        TableExpectations(
            "documents",
            primary_key=["doc_id"],
            not_null=["text"],
            domain_rules=[
                DomainRule(
                    "n_chars_matches_text", "(text IS NULL OR n_chars = length(text))"
                ),
                DomainRule(
                    "lang_is_iso2", "(lang IS NULL OR length(lang) = 2)"
                ),
            ],
            clean_text_columns=["text", "lang", "source"],
            int32_columns=["n_chars"],
        )
    )
    add(
        TableExpectations(
            "embeddings",
            primary_key=["vec_id"],
            not_null=["embedding"],
            # single consistent vector length is a table-level (not
            # row-level) invariant — handled in the kernel itself
        )
    )
    return reg


REGISTRY: dict[str, TableExpectations] = build_registry()


def expectations_for(table: str) -> TableExpectations:
    return REGISTRY.get(table, TableExpectations(table))
