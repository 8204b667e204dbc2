"""Custom stateful streaming operator via applyInPandasWithState.

The reference's per-entity watermark rows (last_season/last_round/
total_records, /root/reference/metadata.py:118-148) are exactly per-key
streaming state; this module implements that pattern natively: a per-user
running profile (event count, value total, last-seen timestamp) maintained
across micro-batches with a processing-time timeout to evict idle keys.

Scale notes: state lives in the executor state store partitioned by key —
no driver involvement; eviction via timeout bounds state to active keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_epoch_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_epoch_us", T.LongType()),
        T.StructField("evicted", T.BooleanType()),
    ]
)


def _make_update_fn(timeout_ms: int | None):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def row(n, total, last_us, evicted):
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "last_seen_epoch_us": [last_us],
                    "evicted": [evicted],
                }
            )

        if timeout_ms is not None and state.hasTimedOut:
            # idle key: emit the tombstone row and release the state —
            # this is what bounds state-store size to *active* keys
            n, total, last_us = state.get if state.exists else (0, 0.0, 0)
            state.remove()
            yield row(n, total, last_us, True)
            return

        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, round(total, 2), last_us))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield row(n, total, last_us, False)

    return update


def user_profile_stream(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Per-user running profile over a streaming events DataFrame.

    Emits the updated profile row for every user touched by each
    micro-batch (update semantics, like the reference's sync_status row
    rewrite per run). With `timeout_ms`, keys idle longer than that emit a
    final `evicted=true` row and their state is removed — the eviction
    policy that keeps per-key state bounded to active keys at scale.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
