"""Custom stateful streaming operators via applyInPandasWithState.

Native operators (F.window / F.session_window, windows.py) cover the
reference's incremental-batch semantics (SURVEY §2.9); this module is the
sanctioned extension point for state shapes Spark lacks -- per-key
accumulators that survive across micro-batches with explicit timeout
handling. State lives in the executor state store (RocksDB/HDFS-backed on
a cluster, checkpointed), so per-key memory stays bounded and the operator
scales horizontally with the number of distinct keys: each key's state is
pinned to one partition by the groupBy hash shuffle.

Scale notes:
- Arrow-batched: each micro-batch group arrives as pandas DataFrames, so
  the Python-worker crossing is vectorized, not row-at-a-time.
- Timeouts evict idle keys (ProcessingTimeTimeout) -- without this an
  unbounded key space (e.g. user ids at 100 TB) grows state forever.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

CUMULATIVE_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_events", LongType()),
        StructField("batches_seen", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("total", DoubleType()),
        StructField("n", LongType()),
        StructField("batches", LongType()),
    ]
)


def user_cumulative_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-user running totals carried across micro-batches.

    Emits one row per (user, micro-batch) with the cumulative total so far
    -- the building block for running spend counters, quota enforcement,
    fraud thresholds. `batches_seen` makes cross-batch state survival
    observable (and testable).

    With `idle_timeout_ms`, keys idle longer than the timeout are evicted
    after emitting a final row (bounded state for unbounded key spaces).
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            total, n, batches = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "total_value": [round(total, 2)],
                    "n_events": [n],
                    "batches_seen": [batches],
                }
            )
            return
        total, n, batches = state.get if state.exists else (0.0, 0, 0)
        for pdf in pdfs:
            total += float(pdf[value_col].sum())
            n += len(pdf)
        batches += 1
        state.update((total, n, batches))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "total_value": [round(total, 2)],
                "n_events": [n],
                "batches_seen": [batches],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(user_col).applyInPandasWithState(
        fn, CUMULATIVE_OUT_SCHEMA, _STATE_SCHEMA, "append", timeout
    )
