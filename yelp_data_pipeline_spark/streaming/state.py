"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2.10); these cover
the brief's "custom stateful operators" capability: arbitrary per-key
state maintained across micro-batches in the state store, with Arrow
batch transfer in and out of Python.

State-store discipline at scale: state lives per key per partition —
always pair a real deployment with watermark-driven timeouts
(``GroupStateTimeout.EventTimeTimeout``) so abandoned keys are evicted;
unbounded key cardinality with NoTimeout is how streaming jobs die.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def running_counts_stateful(df: DataFrame, key_col: str) -> DataFrame:
    """Per-key running event count across micro-batches.

    Batch N's output row for a key is the TOTAL events seen for that
    key so far (state carried in the state store), not the batch-local
    count — the minimal custom-state example that a plain windowed
    aggregation can't express.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "events_so_far": [total]})

    return df.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=f"{key_col} long, events_so_far long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_zscore_flags(df: DataFrame, key_col: str, value_col: str, z: float = 3.0) -> DataFrame:
    """Per-key streaming anomaly flagger on the NEW typed-state API
    (``transformWithStateInPandas``, Spark 4): each key keeps exact
    running moments (n, Σx, Σx²) in a ValueState and every incoming
    event is scored against the key's HISTORY-SO-FAR — an event is
    flagged when it sits more than ``z`` sigmas from the running mean
    of at least 5 prior observations. The batch z-score queries
    (timeseries.daily_count_zscores) need the whole corpus; this is
    the online form with O(1) state per key.

    transformWithState vs the older applyInPandasWithState: state is
    a named, schema'd variable on a handle (ValueState/ListState/
    MapState, optional TTL) instead of one opaque tuple, timers
    replace the single timeout conf, and the processor is a class the
    runtime can re-init per partition. ENVIRONMENT BOUNDARY: the
    API's Python worker speaks protobuf to the state server, and this
    container lacks google.protobuf — the pytest is importorskip-
    gated (same declared boundary as the Delta-native sinks); the
    applyInPandasWithState operators above are the exercised custom-
    state path. Moments are kept EXACT
    (integers/doubles summed per arrival order within a key's
    partition stream) — per-key streams are single-partition by
    definition, so there is no shuffle-order nondeterminism.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Flagger(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "n long, s double, s2 double"
            )

        def handleInputRows(self, key, rows, timerValues):
            import math

            import pandas as pd

            n, s, s2 = (
                self._stats.get() if self._stats.exists() else (0, 0.0, 0.0)
            )
            out_keys, out_vals, out_z = [], [], []
            for pdf in rows:
                for v in pdf[value_col]:
                    x = float(v)
                    if n >= 5:
                        mu = s / n
                        var = s2 / n - mu * mu
                        if var > 0:
                            zi = (x - mu) / math.sqrt(var)
                            if abs(zi) > z:
                                out_keys.append(key[0])
                                out_vals.append(x)
                                out_z.append(round(zi, 6))
                    n, s, s2 = n + 1, s + x, s2 + x * x
            self._stats.update((n, s, s2))
            if out_keys:
                yield pd.DataFrame(
                    {key_col: out_keys, value_col: out_vals, "z": out_z}
                )

        def close(self) -> None:
            pass

    ktype = dict(df.dtypes)[key_col]
    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_Flagger(),
        outputStructType=f"{key_col} {ktype}, {value_col} double, z double",
        outputMode="append",
        timeMode="none",
    )
