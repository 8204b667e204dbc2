"""Incremental data-quality monitoring — the streaming twin of the batch
profiler (operators/profile.py).

Each micro-batch is profiled and its ADDITIVE stats (row count, null
counts, histogram buckets) land keyed by (batch_id, col_name, stat)
through insert_ignore, so a replayed batch re-inserts nothing — the same
exactly-once-effect pattern as the MERGE sinks. `current_profile` derives
the running profile (summed stats + recomputed null fractions) from the
per-batch rows, and the per-batch granularity is itself the monitoring
product: drift shows up as a per-batch time series (null spikes, histogram
shape changes) rather than being averaged away.

Deliberately additive-only: exact distinct counts do not merge across
batches (union ≠ sum of distincts), so cardinality tracking at scale is
either a periodic batch profile over the table at rest
(profile_long(approx_distinct=True)) or a sketch column — not faked here
by summing per-batch distincts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from f1_data_pipeline_spark.operators import sinks
from f1_data_pipeline_spark.operators.profile import histogram, profile_long

def _additive():
    # built lazily: a module-level Column would require an active session
    # at import time
    return F.col("stat").isin("n_rows", "n_nulls") | F.col("stat").startswith(
        "hist_"
    )


def profile_batch(
    batch: DataFrame,
    batch_id: int,
    columns: list[str] | None = None,
    hist_col: str | None = None,
    bucket_width: float = 2.0,
    n_buckets: int = 10,
) -> DataFrame:
    """(batch_id, col_name, stat, value) rows for one micro-batch —
    additive stats only (see module docstring)."""
    prof = profile_long(batch, columns)
    if hist_col is not None:
        prof = prof.unionAll(histogram(batch, hist_col, bucket_width, n_buckets))
    return prof.filter(_additive()).select(
        F.lit(batch_id).cast("long").alias("batch_id"), "col_name", "stat", "value"
    )


def start_profile_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    *,
    columns: list[str] | None = None,
    hist_col: str | None = None,
    bucket_width: float = 2.0,
    n_buckets: int = 10,
) -> StreamingQuery:
    """readStream → per-batch additive profile → insert_ignore keyed on
    (batch_id, col_name, stat). Replays insert nothing; the profile table
    is append-only and tiny (O(batches × columns × stats))."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        out = profile_batch(
            batch,
            batch_id,
            columns=columns,
            hist_col=hist_col,
            bucket_width=bucket_width,
            n_buckets=n_buckets,
        )
        sinks.insert_ignore(
            out.sparkSession, out, out_path, keys=["batch_id", "col_name", "stat"]
        )

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_profile(spark: SparkSession, out_path: str) -> DataFrame:
    """Running profile from the per-batch rows: additive stats sum; null
    fractions are re-derived from the summed counts (never averaged)."""
    rows = spark.read.parquet(out_path)
    summed = rows.groupBy("col_name", "stat").agg(F.sum("value").alias("value"))
    n_rows = summed.filter(
        (F.col("col_name") == "*") & (F.col("stat") == "n_rows")
    ).select(F.col("value").alias("__total"))
    fracs = (
        summed.filter(F.col("stat") == "n_nulls")
        .crossJoin(F.broadcast(n_rows))
        .select(
            "col_name",
            F.lit("null_frac").alias("stat"),
            F.round(F.col("value") / F.col("__total"), 6).alias("value"),
        )
    )
    return summed.unionAll(fracs)
