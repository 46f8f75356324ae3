"""NTZ-safe timestamp arithmetic helpers.

``F.unix_micros`` is TIMESTAMP-only: handed a TIMESTAMP_NTZ column
(what Spark ≥3.4 reads from parquet ``timestamp[us]`` written without
UTC adjustment) it raises a datatype-mismatch error.  The loader
normalizes every table it reads (sources/loader.py), but operators
also receive caller-built DataFrames, so every epoch conversion in the
engine goes through these helpers instead of bare ``unix_micros``.

The ``cast("timestamp")`` is a no-op on TIMESTAMP and interprets NTZ
wall-clock in the session time zone — under the engine's pinned-UTC
session (session.py) that is exactly the naive value DuckDB sees, and
all downstream uses (differences, band ids, lags) are additionally
shift-invariant, so results agree in any session tz.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def us_epoch(col: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP or TIMESTAMP_NTZ column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def us_epoch_sql(expr: str) -> str:
    """The same conversion as a SQL fragment for ``F.expr`` strings."""
    return f"unix_micros(CAST(({expr}) AS TIMESTAMP))"
