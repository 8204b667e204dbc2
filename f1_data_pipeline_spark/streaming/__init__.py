"""Streaming extension surface (SURVEY.md §2.L X6/X7/X8 + §2.H analogs).

`windows.py` holds the window/as-of/approx operators as plain DataFrame
transformations — they run identically on batch DataFrames (the driver's
correctness path) and on streaming DataFrames (`readStream` inputs), which
is exactly Structured Streaming's declarative model.

`structured.py` wires those transformations into real streaming queries:
file sources, event-time watermarks, availableNow triggers, memory sinks
for tests, and a foreachBatch merge-upsert sink reusing the batch MERGE.

`stateful.py` implements a custom stateful per-key operator with
`applyInPandasWithState` (running session/user state with timeouts).
"""

from f1_data_pipeline_spark.streaming import windows  # noqa: F401
