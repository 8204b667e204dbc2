"""Streaming heavy hitters: a bounded Misra-Gries summary maintained
across micro-batches.

The batch operator (operators/frequency.py) answers "which items exceed
share s" with two scans; a stream can't rescan its history, so this sink
maintains the one thing MG makes maintainable: a k=ceil(1/s)-counter
summary that is, at every point, a valid MG summary of the WHOLE stream
so far (mergeability of MG summaries — Agarwal et al., PODS 2012: each
micro-batch's partition summaries merge into the stored summary with the
subtract-(k+1)th-largest step, preserving the global undercount bound).
State is k+2 numbers, independent of stream length or vocabulary.

What the summary can and cannot promise (stated, not fudged):
- every item with true stream share >= s is IN the summary (no false
  negatives, the MG superset guarantee);
- each stored count lb UNDERCOUNTS by at most removed/(k+1), where
  `removed` is the running total of count units the summaries ever
  dropped (every decrement step subtracting `dec` removes >= (k+1)*dec
  units), so the true count sits in [lb, lb + removed/(k+1)].
  `streaming_frequent_items` reports both bounds and the derived
  {guaranteed, possible} verdicts;
- EXACT counts need one verify scan over retained data — pass the
  corpus (e.g. the curated target table the stream also feeds) and it
  runs the same candidate-only verify as the batch operator.

Single-writer state: one streaming query owns a summary path (the
Structured Streaming norm — one checkpoint, one sink). Two sinks feeding
one path would interleave batch ids; the atomic numbered commits prevent
silent corruption (a version collision raises), but the merged counts
would be the union of both streams — point two streams at two paths.

Replay contract: foreachBatch may re-deliver a batch after a crash;
merging the same batch twice would double-count it. The summary is
therefore a sequence of numbered JSON states committed with the same
atomic create-if-absent primitive as the manifest tables, each recording
`last_batch_id` — a replayed batch id <= last_batch_id is a no-op, so any
crash/replay interleaving converges to the same state. Restarts must keep
`min_share` (k is pinned in the state and validated).
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from f1_data_pipeline_spark.operators import frequency as FQ
from f1_data_pipeline_spark.operators.sinks import (
    commit_numbered_json,
    numbered_json_versions,
)


def read_summary_state(path: str) -> dict | None:
    """Latest committed summary state, or None before the first batch."""
    versions = numbered_json_versions(path)
    if not versions:
        return None
    with open(os.path.join(path, f"v{versions[-1]:08d}.json")) as fh:
        return json.load(fh)


def _commit_state(path: str, state: dict) -> None:
    # the manifest tables' atomic create-if-absent primitive; a version
    # collision (two sinks on one path) raises ConcurrentWriteError
    commit_numbered_json(
        path, state["version"], state, what=f"summary state (at {path})"
    )


def apply_frequency_batch(
    summary_path: str, batch: DataFrame, batch_id: int, col: str,
    min_share: float,
) -> bool:
    """Merge one micro-batch into the stored summary; False if the batch
    id was already applied (replay no-op). Exposed for tests and for
    callers composing their own foreachBatch."""
    k = math.ceil(1.0 / min_share)
    state = read_summary_state(summary_path)
    if state is None:
        state = {"version": 0, "last_batch_id": -1, "k": k,
                 "min_share": min_share, "n_total": 0, "removed": 0,
                 "items": {}}
    if state["min_share"] != min_share:
        raise ValueError(
            f"summary at {summary_path} was built with "
            f"min_share={state['min_share']}; restart with the same "
            f"min_share, not {min_share}"
        )
    if batch_id <= state["last_batch_id"]:
        return False  # replayed batch — already folded in
    # per-partition MG summaries of THIS batch (bounded executor memory),
    # merged driver-side into the stored counters. The collect is bounded
    # by partitions·k rows by construction.
    part_rows = FQ.mg_candidates(batch, col, min_share).collect()
    n_batch = batch.select(col).filter(F.col(col).isNotNull()).count()
    counter = {it: int(c) for it, c in state["items"].items()}
    before = sum(counter.values()) + sum(int(r["lb"]) for r in part_rows)
    FQ._mg_merge(
        counter, [r["item"] for r in part_rows],
        [int(r["lb"]) for r in part_rows], k,
    )
    state = {
        "version": state["version"] + 1,
        "last_batch_id": batch_id,
        "k": k,
        "min_share": min_share,
        "n_total": state["n_total"] + n_batch,
        # running total of count UNITS the summaries ever dropped — the
        # batch-local undercount (n_batch − Σ batch lb) plus this merge's
        # removals. Every MG/merge decrement step that subtracts `dec`
        # removes ≥ (k+1)·dec units (the k+1 largest counters each lose
        # exactly dec), so any ITEM's cumulative undercount is at most
        # removed/(k+1) — the ub in streaming_frequent_items.
        "removed": state["removed"]
        + (before - sum(counter.values()))
        + (n_batch - sum(int(r["lb"]) for r in part_rows)),
        "items": counter,
    }
    _commit_state(summary_path, state)
    return True


def start_frequency_sink(
    stream: DataFrame,
    col: str,
    summary_path: str,
    checkpoint_dir: str,
    *,
    min_share: float = 0.001,
) -> StreamingQuery:
    """readStream → per-batch MG merge into the persisted summary."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        apply_frequency_batch(summary_path, batch, batch_id, col, min_share)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_frequent_items(
    spark: SparkSession,
    summary_path: str,
    corpus: DataFrame | None = None,
    col: str | None = None,
) -> DataFrame:
    """The stream-so-far heavy hitters from the stored summary.

    Without `corpus`: (item, lb, ub, guaranteed, possible) where the true
    count is provably in [lb, ub]; `guaranteed` items meet the share
    threshold on lb alone, `possible` ones only on ub (a verify scan or
    more stream may settle them). With `corpus` (+`col`): the exact
    candidate-only verify runs over it SEEDED FROM THE STORED SUMMARY —
    one corpus scan, no rediscovery (the summary's whole point is that
    the candidate set is already known; its MG superset guarantee makes
    the result exact and identical to batch frequent_items whenever the
    corpus is the full stream content)."""
    state = read_summary_state(summary_path)
    if state is None:
        raise FileNotFoundError(f"no summary state at {summary_path}")
    n, k = state["n_total"], state["k"]
    err = math.ceil(state["removed"] / (k + 1))  # max per-item undercount
    thr = math.ceil(state["min_share"] * n) if n else 0
    if corpus is not None:
        if col is None:
            raise ValueError("pass col= with corpus for the exact verify")
        return FQ.verify_candidates(
            corpus, col, list(state["items"]), state["min_share"]
        )
    rows = [
        (it, int(lb), int(lb) + err, int(lb) >= thr, int(lb) + err >= thr)
        for it, lb in sorted(state["items"].items())
    ]
    return spark.createDataFrame(
        rows, "item string, lb long, ub long, guaranteed boolean, possible boolean"
    )
