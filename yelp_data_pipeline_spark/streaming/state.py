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
