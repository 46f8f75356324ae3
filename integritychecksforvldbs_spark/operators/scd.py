"""Slowly-changing-dimension maintenance (warehouse extension).

The reference's state table is effectively a type-1 dimension kept
current by MERGE (CommandExecute.sql's insert/update/deactivate flow,
re-expressed in plans/state.py).  This module adds the **type-2**
counterpart a warehouse needs around such state: apply a full
snapshot of an entity table to a versioned dimension, closing changed
or vanished versions and opening new ones, with full history
preserved — the standard SCD2 contract (Kimball).

Dimension schema contract: ``key_cols + tracked_cols + valid_from +
valid_to`` where ``valid_to IS NULL`` marks the current version; a
``version_action`` column in the output records what this application
did to each row (``kept/closed/opened``, history rows ``history``) so
the apply is auditable — and the whole result remains one
deterministic SQL-expressible relation (DuckDB oracle in the gate).

Scale shape: ONE full-outer shuffle join of the current slice against
the snapshot on the key columns (AQE broadcasts a small snapshot);
history rows pass through as a filter with no shuffle; outputs are
unions of projections of those two relations.  No window, no
iteration.  Tracked-column comparison is null-safe (``<=>``) so NULL
attribute values neither churn versions every run nor match a real
change.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _null_safe_eq(left: str, right: str, cols: list[str]) -> Column:
    return functools.reduce(
        operator.and_,
        [F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}")) for c in cols],
        F.lit(True),  # no tracked cols: presence alone decides
    )


def scd2_apply(
    dim: DataFrame,
    snapshot: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    as_of,
) -> DataFrame:
    """Apply a full ``snapshot`` (one row per key, attributes as of
    ``as_of``) to an SCD2 ``dim``; returns the new dimension:

    - history rows (``valid_to`` not null): unchanged, ``history``;
    - current row, key in snapshot, tracked values null-safe equal:
      unchanged, ``kept``;
    - current row, key in snapshot, values differ: ``closed`` with
      ``valid_to = as_of`` PLUS an ``opened`` row carrying the
      snapshot values with ``valid_from = as_of``;
    - current row, key absent from snapshot (entity deleted):
      ``closed``;
    - snapshot key with no current row (new or re-born entity):
      ``opened``.

    ``as_of`` is a date/timestamp literal value; re-applying the same
    snapshot at the same ``as_of`` is idempotent (every row classifies
    ``kept``/``history``) — tested.
    """
    as_of_lit = F.lit(as_of)
    out_cols = key_cols + tracked_cols + ["valid_from", "valid_to"]

    history = dim.filter(F.col("valid_to").isNotNull()).select(
        *out_cols, F.lit("history").alias("version_action")
    )
    # presence markers + null-safe key join (the repair_plan pattern):
    # testing `key IS NOT NULL` would misclassify NULL-keyed rows —
    # a NULL-keyed current row would match nothing, read as absent
    # from BOTH sides, and emit a garbage all-NULL "opened" version on
    # every apply, breaking idempotency.
    current = (
        dim.filter(F.col("valid_to").isNull())
        .withColumn("_pd", F.lit(1))
        .alias("d")
    )
    snap = snapshot.withColumn("_ps", F.lit(1)).alias("s")

    on = functools.reduce(
        operator.and_,
        [F.col(f"d.{c}").eqNullSafe(F.col(f"s.{c}")) for c in key_cols],
    )
    j = current.join(snap, on, "full_outer")
    in_dim = F.col("d._pd").isNotNull()
    in_snap = F.col("s._ps").isNotNull()
    same = _null_safe_eq("d", "s", tracked_cols)

    # one row-local classification per joined row, exploded into the
    # 1-2 output versions it produces.  Three filtered branches over
    # `j` would re-derive the JOIN per branch (3x the shuffles — the
    # executed plan showed 6 exchanges); the explode keeps it at one.
    vf_t = dim.schema["valid_from"].dataType
    vt_t = dim.schema["valid_to"].dataType

    def _ver(side: str, valid_from: Column, valid_to: Column, action: str) -> Column:
        return F.struct(
            *[F.col(f"{side}.{c}").alias(c) for c in key_cols + tracked_cols],
            valid_from.alias("valid_from"),
            valid_to.alias("valid_to"),
            F.lit(action).alias("version_action"),
        )

    kept_v = _ver("d", F.col("d.valid_from"), F.col("d.valid_to"), "kept")
    closed_v = _ver(
        "d", F.col("d.valid_from"), as_of_lit.cast(vt_t), "closed"
    )
    opened_v = _ver(
        "s", as_of_lit.cast(vf_t), F.lit(None).cast(vt_t), "opened"
    )
    versions = (
        F.when(in_dim & in_snap & same, F.array(kept_v))
        .when(in_dim & in_snap & ~same, F.array(closed_v, opened_v))
        .when(in_dim & ~in_snap, F.array(closed_v))
        .otherwise(F.array(opened_v))
    )
    applied = j.select(F.explode(versions).alias("v")).select("v.*")
    return history.unionByName(applied)


def scd2_apply_oracle(
    dim_sql: str,
    snapshot_sql: str,
    key_cols: list[str],
    tracked_cols: list[str],
    as_of_sql: str,
) -> str:
    """DuckDB SQL computing the identical new dimension from a
    dimension relation (``dim_sql``) and snapshot relation
    (``snapshot_sql``), both usable as CTE bodies; ``as_of_sql`` is a
    SQL literal (e.g. ``DATE '2024-06-01'``)."""
    keys = ", ".join(key_cols)
    d_cols = ", ".join(f"d.{c}" for c in key_cols + tracked_cols)
    # presence markers + IS NOT DISTINCT FROM keys, mirroring the
    # Spark side (NULL-keyed rows classify by presence, not key tests)
    on = " AND ".join(
        f"d.{c} IS NOT DISTINCT FROM s.{c}" for c in key_cols
    )
    same = " AND ".join(
        [f"(d.{c} IS NOT DISTINCT FROM s.{c})" for c in tracked_cols]
        or ["TRUE"]
    )
    return f"""
WITH dim AS ({dim_sql}),
snap AS (SELECT *, 1 AS _ps FROM ({snapshot_sql}) t),
cur AS (SELECT *, 1 AS _pd FROM dim WHERE valid_to IS NULL),
j AS (
  SELECT {d_cols}, d.valid_from, d.valid_to,
         {", ".join(f"s.{c} AS s_{c}" for c in key_cols + tracked_cols)},
         (d._pd IS NOT NULL) AS in_dim, (s._ps IS NOT NULL) AS in_snap,
         ({same}) AS same
  FROM cur d FULL OUTER JOIN snap s ON {on}
)
SELECT {keys}, {", ".join(tracked_cols)}, valid_from, valid_to,
       'history' AS version_action
FROM dim WHERE valid_to IS NOT NULL
UNION ALL
SELECT {keys}, {", ".join(tracked_cols)}, valid_from, valid_to,
       'kept' AS version_action
FROM j WHERE in_dim AND in_snap AND same
UNION ALL
SELECT {keys}, {", ".join(tracked_cols)}, valid_from, {as_of_sql} AS valid_to,
       'closed' AS version_action
FROM j WHERE in_dim AND (NOT in_snap OR NOT same)
UNION ALL
SELECT {", ".join(f"s_{c} AS {c}" for c in key_cols + tracked_cols)},
       {as_of_sql} AS valid_from, CAST(NULL AS DATE) AS valid_to,
       'opened' AS version_action
FROM j WHERE in_snap AND (NOT in_dim OR NOT same)
"""


def cdc_latest_snapshot(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_value: str = "d",
) -> DataFrame:
    """Compact a CDC change stream to the latest snapshot: one row per
    key (highest ``seq_col``), with keys whose newest change is a
    delete dropped entirely.  The upstream step that produces the full
    snapshots :func:`scd2_apply` / ``scd2_snapshot_sink`` consume —
    change stream → ``cdc_latest_snapshot`` → ``scd2_apply`` is the
    standard warehouse CDC pipeline.

    ``seq_col`` must totally order each key's changes (log sequence
    number, commit timestamp + change id); ties would make "latest"
    ambiguous, so the window orders by ``seq_col`` alone and the
    caller guarantees per-key uniqueness — the reference's command log
    makes the same assumption of its log ids.

    One window over one shuffle on the keys; no join.
    """
    rn = "__cdc_latest_rn"
    if rn in changes.columns:  # collision-safe, never clobber payload
        raise ValueError(f"changes must not carry a column named {rn!r}")
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )
    if op_col is not None:
        latest = latest.filter(
            ~F.col(op_col).eqNullSafe(F.lit(delete_value))
        ).drop(op_col)
    return latest.drop(seq_col)


def cdc_latest_snapshot_oracle(
    changes_sql: str,
    key_cols: list[str],
    seq_col: str,
    out_cols: list[str],
    op_col: str | None = None,
    delete_value: str = "d",
) -> str:
    """DuckDB SQL computing the identical compaction; ``out_cols`` is
    the output column list (keys + payload, minus seq/op)."""
    keys = ", ".join(key_cols)
    sel = ", ".join(out_cols)
    drop_deleted = (
        f"AND ({op_col} IS DISTINCT FROM '{delete_value}')" if op_col else ""
    )
    return f"""
SELECT {sel} FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {keys} ORDER BY {seq_col} DESC
  ) AS _rn
  FROM ({changes_sql}) t
) WHERE _rn = 1 {drop_deleted}
"""


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    ts_col: str,
    how: str = "left",
) -> DataFrame:
    """Enrich facts with the dimension version valid AT the fact's
    own time: ``valid_from <= ts < valid_to`` (``valid_to IS NULL`` =
    still open) — the point-in-time (AS OF fact time) lookup every
    consumer of an SCD2 dimension runs, and the reason the history is
    kept at all.  ``how='left'`` keeps facts that predate their
    entity's first version (NULL attributes); ``'inner'`` drops them.

    Plan shape: the validity predicate is a RESIDUAL on an EQUI join
    over ``key_cols``, so Catalyst plans a hash join (broadcast when
    the dimension is small — the common case; dimensions are orders
    of magnitude smaller than fact tables), never a nested-loop theta
    join.  Each fact matches at most one version because SCD2 apply
    maintains non-overlapping validity windows per key, so the join
    cannot fan out.  At 100 TB: a hot entity key skews the shuffle
    variant exactly like any equi join — operators.skewjoin's salting
    applies unchanged since the validity check rides along as a
    residual.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    d = dim
    for c in key_cols:
        d = d.withColumnRenamed(c, f"_dim_{c}")
    eq = functools.reduce(
        operator.and_,
        [facts[c] == d[f"_dim_{c}"] for c in key_cols],
    )
    ts = facts[ts_col]
    cond = (
        eq
        & (ts >= d["valid_from"])
        & (d["valid_to"].isNull() | (ts < d["valid_to"]))
    )
    return facts.join(d, cond, how).drop(*[f"_dim_{c}" for c in key_cols])


def point_in_time_join_oracle(
    facts_sql: str,
    dim_sql: str,
    key_cols: list[str],
    ts_col: str,
    fact_cols: list[str],
    dim_cols: list[str],
    how: str = "left",
) -> str:
    on = " AND ".join(f"f.{c} = d.{c}" for c in key_cols)
    f_sel = ", ".join(f"f.{c}" for c in fact_cols)
    d_sel = ", ".join(f"d.{c}" for c in dim_cols)
    join_kw = "LEFT JOIN" if how == "left" else "JOIN"
    return f"""
SELECT {f_sel}, {d_sel}, d.valid_from, d.valid_to
FROM ({facts_sql}) f {join_kw} ({dim_sql}) d
  ON {on} AND f.{ts_col} >= d.valid_from
  AND (d.valid_to IS NULL OR f.{ts_col} < d.valid_to)
"""
