"""transformWithState custom stateful operators (Spark 4.x API).

The reference maintains an incrementally-updated per-object running
average to predict check durations (``AvgRunDuration_MS``,
IntegrityChecks_VLDB.sql:729-744); ``plans/state.py`` reproduces that
exact arithmetic batch-side.  This module carries the same motif onto
unbounded streams with the current-generation arbitrary-state API —
``transformWithStateInPandas`` (typed per-key ValueState, optional
TTL, checkpoint-durable) — which supersedes the
``applyInPandasWithState`` template in ``freshness.py``.

Scale shape: one hash shuffle on the grouping key per micro-batch;
state is O(distinct keys) rows of 3 doubles, RocksDB-backed on a real
cluster; batch arithmetic is vectorized numpy inside Arrow batches and
merges via Chan's parallel-Welford formula, so a key's state update
cost is O(1) per batch regardless of batch size ordering.

ENVIRONMENT GATE: the transformWithState Python runner speaks a
protobuf-based state-server protocol; this container ships no
``google.protobuf`` (and installs are unavailable), so the operator is
capability-gated — :func:`tws_available` reports whether the runtime
can execute it, the test suite skips when it can't, and the
``applyInPandasWithState`` operator in ``freshness.py`` (no protobuf
dependency) remains the environment-verified stateful path.  The
Welford merge arithmetic itself is exercised directly in tests.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame


def tws_available() -> bool:
    """True when the transformWithState state-server protocol can run
    (pyspark exposes the API and protobuf is importable)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False
    from pyspark.sql.group import GroupedData

    return hasattr(GroupedData, "transformWithStateInPandas")


def welford_combine(
    a: tuple[int, float, float], b: tuple[int, float, float]
) -> tuple[int, float, float]:
    """Chan's parallel combine of two (n, mean, M2) partials — the
    merge :func:`running_value_stats` applies per micro-batch, exposed
    for direct testing and batch-side reuse."""
    (n, mean, m2), (bn, bmean, bm2) = a, b
    if bn == 0:
        return a
    if n == 0:
        return b
    tot = n + bn
    delta = bmean - mean
    return (
        tot,
        mean + delta * bn / tot,
        m2 + bm2 + delta * delta * n * bn / tot,
    )

VALUE_STATS_SCHEMA = (
    "event_type string, n long, mean double, m2 double, var_pop double"
)
_WELFORD_STATE = "n long, mean double, m2 double"


def running_value_stats(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running mean/variance of ``value_col`` maintained in
    ValueState across micro-batches; each batch emits the updated
    (key, n, mean, m2, var_pop) row for keys seen in that batch.

    ``ttl_ms`` bounds state lifetime for keyspaces that churn
    (e.g. per-session keys): a key idle past the TTL is evicted and
    restarts cold — the knob that keeps state O(active keys) on
    unbounded keyspaces.  Streaming input only; the batch equivalent
    is a plain groupBy avg/var_pop, which the tests compare against.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Welford(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "welford", _WELFORD_STATE, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator:
            import numpy as np
            import pandas as pd

            prev = self._state.get()
            n, mean, m2 = prev if prev is not None else (0, 0.0, 0.0)
            for pdf in rows:
                v = pdf[value_col].to_numpy(dtype=np.float64)
                v = v[~np.isnan(v)]
                bn = len(v)
                if bn == 0:
                    continue
                bmean = float(v.mean())
                bm2 = float(((v - bmean) ** 2).sum())
                n, mean, m2 = welford_combine((n, mean, m2), (bn, bmean, bm2))
            self._state.update((n, mean, m2))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n": [n],
                    "mean": [mean],
                    "m2": [m2],
                    "var_pop": [m2 / n if n else 0.0],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_Welford(),
        outputStructType=VALUE_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
