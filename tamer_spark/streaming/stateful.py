"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's whole engine is one stateful operator (consume state → emit
records + next state, Tamer.scala:150-186). In-stream, per-key versions of
that pattern — running totals, dedup-by-key, custom folds — map onto
``applyInPandasWithState``: Spark keeps the per-key state in its checkpointed
state store (exactly-once across restarts), we supply the fold.

State-size discipline at scale: per-key state must be O(1) (a few counters),
never a growing collection; use timeouts to expire idle keys.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_running_totals(df, key_col: str, value_col: str):
    """Per-key running (count, sum) maintained in the streaming state store.

    Emits one row per key per micro-batch with the cumulative totals — the
    reference's state-fold shape (#4) expressed as a first-class streaming
    operator. ``value_col`` is summed in integer cents for determinism.
    """

    def fold(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        count, total_c = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            count += len(pdf)
            total_c += int((pdf[value_col] * 100).round().astype("int64").sum())
        state.update((count, total_c))
        yield pd.DataFrame({key_col: [key[0]], "n": [count], "total_c": [total_c]})

    return df.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=f"{key_col} long, n long, total_c long",
        stateStructType="count long, total_c long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_seen_filter(df, key_col: str):
    """Streaming exactly-once dedup: drop rows whose key was already seen.

    The streaming analog of the REST source's page dedup (#20) generalized:
    state = 1 bit per key in the state store. Watermark + timeout should be
    configured by the caller when the key space is unbounded.
    """

    def fold(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        already = state.exists
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if not already and n > 0:
            state.update((True,))
            yield pd.DataFrame({key_col: [key[0]]})

    return df.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=f"{key_col} long",
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
