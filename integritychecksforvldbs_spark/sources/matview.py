"""Incremental materialized rollups over versioned tables.

The reference keeps pre-aggregated bookkeeping it refreshes every run
(dbo.CommandLog rollups, per-database size sums re-derived each
round); a lakehouse keeps the same thing as a MATERIALIZED AGGREGATE
whose refresh cost scales with the CHANGE, not the table.  This
module maintains ``SELECT keys…, SUM(measure)… GROUP BY keys`` over a
:mod:`.versioned` table using its change-data feed:

- **build** computes the rollup at the source's current version and
  commits it — into a versioned table of its own, so the rollup
  inherits atomic swaps, history, and time travel for free; the
  source version it reflects rides INSIDE the manifest (one atomic
  event, no sidecar metadata file to crash apart from the data).
- **refresh** diffs manifests (``versioned.changes``) between the
  recorded base version and the source's latest: inserts add their
  measures, deletes subtract them, and the vocabulary-sized delta
  merges into the existing rollup in one |keys|-bounded aggregation.
  The source is never rescanned beyond the files that actually
  entered/left the visible set — compaction/z-order rewrites diff to
  an empty feed and the refresh is a no-op commit-skip.

Only self-maintainable aggregates are offered: SUM and COUNT (the
row count rides along as ``n_rows`` and doubles as the existence
witness — a key whose count reaches zero leaves the rollup).  MIN/MAX
are NOT incrementally maintainable under deletes (a deleted extremum
forces a rescan of its group) and are deliberately absent; compute
those with :func:`~..operators.profile.profile_table` style passes.

Exactness contract: refresh == full rebuild, bit-for-bit, provided
the measures are integer-valued (cents, counts, token counts — the
engine-wide convention; float SUM is order-dependent and would drift
between the incremental and rebuild paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned

N_ROWS = "n_rows"


def _rollup_frame(
    src: DataFrame, keys: list[str], measures: dict[str, str]
) -> DataFrame:
    aggs = [F.count(F.lit(1)).cast("long").alias(N_ROWS)] + [
        F.sum(F.expr(expr)).cast("long").alias(name)
        for name, expr in measures.items()
    ]
    return src.groupBy(*keys).agg(*aggs)


def build_rollup(
    spark: SparkSession,
    table_path: str,
    rollup_path: str,
    keys: list[str],
    measures: dict[str, str],
) -> tuple[int, int]:
    """Full-compute the rollup at the source's LATEST version and
    commit it; returns (rollup_version, source_version_reflected).
    ``measures`` maps output column → integer-valued SQL expression
    summed per group; ``n_rows`` is always included."""
    if N_ROWS in measures or N_ROWS in keys:
        raise ValueError(f"{N_ROWS!r} is reserved for the row count")
    cur = versioned._latest_committed(table_path)
    if cur is None:
        raise FileNotFoundError(f"no committed version under {table_path!r}")
    src_v = cur[0]
    out = _rollup_frame(
        versioned.read(spark, table_path, version=src_v), keys, measures
    )
    v = versioned.commit(
        spark, out, rollup_path, mode="overwrite",
        extra={
            "rollup_of": table_path,
            "base_version": src_v,
            "keys": keys,
            "measures": measures,
        },
        expected_parent=(
            versioned._latest_committed(rollup_path) or (0, None)
        )[0],
        allow_schema_change=True,
    )
    return v, src_v


def refresh_rollup(
    spark: SparkSession, table_path: str, rollup_path: str
) -> tuple[int, int]:
    """Fold the source's change feed since the recorded base version
    into the rollup; returns (rollup_version, source_version) — the
    existing version numbers when the source hasn't moved (no empty
    commit).  Cost: the manifest diff's files + one aggregation over
    (|rollup keys| + |delta keys|) rows."""
    cur = versioned._latest_committed(rollup_path)
    if cur is None:
        raise FileNotFoundError(
            f"no rollup at {rollup_path!r}; run build_rollup first"
        )
    rollup_v, man = cur
    base_v = man.get("base_version")
    keys, measures = man.get("keys"), man.get("measures")
    if base_v is None or keys is None or measures is None:
        raise ValueError(
            f"{rollup_path!r} was not committed by build_rollup "
            "(manifest lacks rollup metadata)"
        )
    src = versioned._latest_committed(table_path)
    if src is None:
        raise FileNotFoundError(f"no committed version under {table_path!r}")
    src_v = src[0]
    if src_v == base_v:
        return rollup_v, src_v  # nothing changed — refresh is free
    feed = versioned.changes(spark, table_path, base_v, src_v)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = feed.groupBy(*keys).agg(
        F.sum(sign).cast("long").alias(N_ROWS),
        *[
            F.sum(sign * F.expr(expr)).cast("long").alias(name)
            for name, expr in measures.items()
        ],
    )
    merged = (
        versioned.read(spark, rollup_path, version=rollup_v)
        .unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum(N_ROWS).cast("long").alias(N_ROWS),
            *[
                F.sum(name).cast("long").alias(name)
                for name in measures
            ],
        )
        .filter(F.col(N_ROWS) > 0)  # fully-deleted keys leave the rollup
    )
    v = versioned.commit(
        spark, merged, rollup_path, mode="overwrite",
        extra={
            "rollup_of": table_path,
            "base_version": src_v,
            "keys": keys,
            "measures": measures,
        },
        expected_parent=rollup_v,
    )
    return v, src_v


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The rollup's latest snapshot (column order: keys, n_rows,
    measures)."""
    return versioned.read(spark, rollup_path)
