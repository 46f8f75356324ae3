"""Skew-aware equi-joins — the hot-key mitigations a 100 TB shuffle
needs.

A shuffled equi-join hashes both sides on the key; one hot key (the
NULL-ish default account, the bot user, the empty-string source) lands
its entire row population on ONE reducer and serializes the stage.
AQE's skew-join split helps when statistics catch it at runtime; these
operators are the explicit, plannable forms:

- :func:`salted_join` — replicate the SMALL side ``n_salt`` times (one
  copy per salt bucket, a row-local explode) and scatter the big side
  by a deterministic hash salt; the join key becomes (keys…, salt), so
  a hot key's rows spread over ``n_salt`` reducers.  Exactly the plain
  join's result for every join a replicated right side is sound for
  (inner/left on a small dimension).
- :func:`split_skew_join` — route rows of detected hot keys through a
  broadcast join (no shuffle can be hot if there is no shuffle) and
  the cold remainder through the ordinary shuffled join; union.  The
  standard two-plan form when the small side is too big to replicate
  wholesale but the HOT slice of it is tiny (hot keys are few by
  definition).
- :func:`detect_hot_keys` — the decision input: per-key counts above a
  row threshold, computed exactly (one map-side-combined groupBy) or
  from a sample at extreme scale (``sample_fraction``), where the
  scaled estimate only needs to be right about the handful of keys
  that matter.

Result equality with the plain join is the correctness contract
(oracle-matched gate + tests); the plan shapes (small-side explode,
broadcast hot path) are plan-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALT_DEFAULT = 8


def detect_hot_keys(
    df: DataFrame,
    keys: list[str],
    min_rows: int = 100_000,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Keys whose row count meets ``min_rows``: (keys…, n_rows).

    Exact by default (one map-side-combined groupBy — the per-key
    relation is |keys|-sized, not row-sized).  ``sample_fraction``
    switches to a scaled estimate from a Bernoulli sample: at 100 TB
    the detection pass shouldn't cost a full scan, and only keys far
    above the threshold matter — their sampled counts concentrate
    tightly (a key at 10× the threshold is misclassified with
    vanishing probability; borderline keys cost only a second shuffle
    partition either way)."""
    src, scale = df, 1.0
    if sample_fraction is not None:
        src = df.sample(fraction=sample_fraction, seed=7)
        scale = 1.0 / sample_fraction
    return (
        src.groupBy(*keys)
        .agg((F.count(F.lit(1)) * F.lit(scale)).cast("long").alias("n_rows"))
        .filter(F.col("n_rows") >= min_rows)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salt: int = N_SALT_DEFAULT,
    how: str = "inner",
) -> DataFrame:
    """``big ⋈ small`` on ``keys`` with an ``n_salt``-way salt so hot
    keys spread across reducers.

    The big side's salt is ``xxhash64(whole row) mod n_salt`` — a
    deterministic scatter that needs no random state and spreads even
    rows that are bit-identical on the key columns.  The small side
    explodes once per salt value (row-local; costs ``n_salt ×``
    |small|, which is the knob's price — size ``n_salt`` to the skew
    factor, not higher).  ``how`` may be ``inner`` or ``left`` (the
    joins a replicated right side is sound for: each big-side row
    still matches each small-side key exactly once, in exactly one
    salt bucket)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r} — a "
            "replicated right side double-counts right/full join rows"
        )
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError("inputs already carry a _salt column")
    salt_big = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt)
    ).cast("int")
    b = big.withColumn("_salt", salt_big)
    # sequence of int literals explodes to int rows directly (a cast
    # around a generator is an UNSUPPORTED_GENERATOR analysis error)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = b.join(s, keys + ["_salt"], how)
    return out.drop("_salt")


def split_skew_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    hot: DataFrame | None = None,
    min_rows: int = 100_000,
    how: str = "inner",
) -> DataFrame:
    """``big ⋈ small`` with hot keys routed through a broadcast join
    and the cold remainder through the ordinary shuffled join.

    ``hot`` is a frame of the hot key tuples (e.g. from
    :func:`detect_hot_keys`, whose extra columns are ignored); when
    omitted it is detected exactly from ``big``.  Hot keys are FEW by
    construction, so: the hot key list broadcasts to split both
    sides, the hot slice of ``small`` broadcasts into a shuffle-free
    join, and the cold join sees a key distribution with its head cut
    off.  Supports ``inner`` and ``left`` (each big-side row goes to
    exactly one branch, so the union is exact)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"split_skew_join supports inner/left, got {how!r}"
        )
    hot_keys_df = (
        hot if hot is not None else detect_hot_keys(big, keys, min_rows)
    ).select(*keys).distinct()
    big_hot = big.join(F.broadcast(hot_keys_df), keys, "left_semi")
    big_cold = big.join(F.broadcast(hot_keys_df), keys, "left_anti")
    small_hot = small.join(F.broadcast(hot_keys_df), keys, "left_semi")
    hot_joined = big_hot.join(F.broadcast(small_hot), keys, how)
    cold_joined = big_cold.join(small, keys, how)
    return hot_joined.unionByName(cold_joined)
