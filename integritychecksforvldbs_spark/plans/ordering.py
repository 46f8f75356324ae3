"""Database-order strategies — DIC's ``@DatabaseOrder`` (SURVEY §2.5 #41).

The vendored proc supports eight explicit orders plus the default
selection order (DatabaseIntegrityCheck.sql:992-1089, validated at
DIC:824):

    NULL (default)              → StartPosition asc, name asc (DIC:992-1001)
    DATABASE_NAME_ASC/DESC      → name
    DATABASE_SIZE_ASC/DESC      → size (sys.master_files sum, DIC:961-970)
    DATABASE_LAST_GOOD_CHECK_ASC/DESC
                                → last successful CHECKDB from the command
                                  log (DIC:979-990); never-checked sorts
                                  as oldest
    REPLICA_LAST_GOOD_CHECK_ASC/DESC
                                → same, but grouped by replica/AG tag
                                  (DIC:1265-1279); degenerates to
                                  LAST_GOOD_CHECK when no tags exist

Two implementations with identical results: a pure-Python sort for
the driver's metadata-sized worklist (the hot path — ordering a fleet
of databases is never a distributed problem), and a DataFrame window
(``ROW_NUMBER() OVER (ORDER BY …)``) mirroring the reference's SQL
shape for metadata-at-scale use and for tests to cross-check.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DATABASE_ORDERS = (
    "DATABASE_NAME_ASC",
    "DATABASE_NAME_DESC",
    "DATABASE_SIZE_ASC",
    "DATABASE_SIZE_DESC",
    "DATABASE_LAST_GOOD_CHECK_ASC",
    "DATABASE_LAST_GOOD_CHECK_DESC",
    "REPLICA_LAST_GOOD_CHECK_ASC",
    "REPLICA_LAST_GOOD_CHECK_DESC",
)

_EPOCH = datetime(1900, 1, 1)  # never-checked sorts as oldest (IC:62 epoch)


def validate_database_order(order: str | None) -> None:
    """DIC:824 — reject unknown strategies with the reference's message."""
    if order is not None and order not in DATABASE_ORDERS:
        raise ValueError("The value for the parameter @DatabaseOrder is not supported.")


@dataclass
class DatabaseOrderRow:
    """One database's ordering attributes."""

    name: str
    start_position: int = 1
    size_bytes: int = 0
    last_good_check: datetime | None = None
    replica_group: str | None = None
    order: int | None = None  # assigned


def order_databases(
    rows: list[DatabaseOrderRow], order: str | None
) -> list[DatabaseOrderRow]:
    """Pure-Python strategy sort; assigns 1-based ``order``."""
    validate_database_order(order)

    def lgc(r: DatabaseOrderRow) -> datetime:
        return r.last_good_check or _EPOCH

    def rlgc(r: DatabaseOrderRow) -> tuple:
        # replica variant: group by replica tag first so one replica's
        # databases are checked together (DIC:1265-1279 intent)
        return (r.replica_group or "", lgc(r))

    keys = {
        None: lambda r: (r.start_position, r.name),
        "DATABASE_NAME_ASC": lambda r: r.name,
        "DATABASE_NAME_DESC": lambda r: r.name,
        "DATABASE_SIZE_ASC": lambda r: (r.size_bytes, r.name),
        "DATABASE_SIZE_DESC": lambda r: (r.size_bytes, r.name),
        "DATABASE_LAST_GOOD_CHECK_ASC": lambda r: (lgc(r), r.name),
        "DATABASE_LAST_GOOD_CHECK_DESC": lambda r: (lgc(r), r.name),
        "REPLICA_LAST_GOOD_CHECK_ASC": lambda r: rlgc(r) + (r.name,),
        "REPLICA_LAST_GOOD_CHECK_DESC": lambda r: rlgc(r) + (r.name,),
    }
    out = sorted(rows, key=keys[order], reverse=bool(order and order.endswith("_DESC")))
    for i, r in enumerate(out, start=1):
        r.order = i
    return out


def order_databases_df(df: DataFrame, order: str | None) -> DataFrame:
    """DataFrame variant: input columns (name, start_position,
    size_bytes, last_good_check, replica_group) → + ``order`` via
    ROW_NUMBER over the strategy's sort (the reference's SQL shape,
    DIC:1003-1089)."""
    validate_database_order(order)
    lgc = F.coalesce(F.col("last_good_check"), F.lit(_EPOCH))
    rg = F.coalesce(F.col("replica_group"), F.lit(""))

    def desc_all(cols: list[Column]) -> list[Column]:
        return [c.desc() for c in cols]

    sorts: dict[str | None, list[Column]] = {
        None: [F.col("start_position"), F.col("name")],
        "DATABASE_NAME_ASC": [F.col("name")],
        "DATABASE_NAME_DESC": desc_all([F.col("name")]),
        "DATABASE_SIZE_ASC": [F.col("size_bytes"), F.col("name")],
        "DATABASE_SIZE_DESC": desc_all([F.col("size_bytes"), F.col("name")]),
        "DATABASE_LAST_GOOD_CHECK_ASC": [lgc, F.col("name")],
        "DATABASE_LAST_GOOD_CHECK_DESC": desc_all([lgc, F.col("name")]),
        "REPLICA_LAST_GOOD_CHECK_ASC": [rg, lgc, F.col("name")],
        "REPLICA_LAST_GOOD_CHECK_DESC": desc_all([rg, lgc, F.col("name")]),
    }
    w = Window.orderBy(*sorts[order])
    return df.withColumn("order", F.row_number().over(w))
