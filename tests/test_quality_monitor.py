"""Streaming incremental profile monitor (streaming/quality_monitor.py):
running profile equals the batch profile of the union, replays insert
nothing, and per-batch rows expose drift."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import types as T

from f1_data_pipeline_spark.operators.profile import profile_long
from f1_data_pipeline_spark.streaming.quality_monitor import (
    current_profile,
    profile_batch,
    start_profile_monitor,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batches(spark, stream_dir):
    b1 = [(1, 10, 1.0), (2, None, 3.5), (3, 12, None)]
    b2 = [(4, 13, 25.0), (5, None, 4.0), (6, None, 7.7), (7, 15, 0.5)]
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{stream_dir}/{name}")
    return b1 + b2


def test_streaming_profile_matches_batch_union(spark, tmp_path):
    stream_dir, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "prof"),
        str(tmp_path / "ckpt"),
    )
    all_rows = _write_batches(spark, stream_dir)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/*")
    )
    q = start_profile_monitor(stream, out, ckpt, hist_col="value")
    q.awaitTermination(120)
    q.stop()

    per_batch = spark.read.parquet(out)
    assert per_batch.select("batch_id").distinct().count() == 2

    got = {
        (r["col_name"], r["stat"]): r["value"]
        for r in current_profile(spark, out).collect()
    }
    union_df = spark.createDataFrame(all_rows, SCHEMA)
    expected = {
        (r["col_name"], r["stat"]): r["value"]
        for r in profile_long(union_df).collect()
        if r["stat"] in ("n_rows", "n_nulls", "null_frac")
    }
    for key, v in expected.items():
        assert got[key] == v, (key, got.get(key), v)
    # histogram buckets (width 2.0) sum across batches: 1.0,0.5 → b0;
    # 3.5 → b1; 4.0 → b2; 7.7 → b3; 25.0 → overflow clamp b10
    assert got[("value", "hist_00")] == 2.0
    assert got[("value", "hist_01")] == 1.0
    assert got[("value", "hist_02")] == 1.0
    assert got[("value", "hist_03")] == 1.0
    assert got[("value", "hist_10")] == 1.0


def test_profile_monitor_replay_idempotent(spark, tmp_path):
    out = str(tmp_path / "prof")
    batch = spark.createDataFrame([(1, 10, 1.0), (2, None, None)], SCHEMA)

    from f1_data_pipeline_spark.operators import sinks

    def handle(b, bid):
        rows = profile_batch(b, bid, hist_col="value")
        sinks.insert_ignore(
            rows.sparkSession, rows, out, keys=["batch_id", "col_name", "stat"]
        )

    handle(batch, 0)
    n1 = spark.read.parquet(out).count()
    handle(batch, 0)  # replayed micro-batch: same batch_id, same stats
    n2 = spark.read.parquet(out).count()
    assert n1 == n2
    # a genuinely new batch appends its own rows
    handle(batch, 1)
    assert spark.read.parquet(out).count() == 2 * n1
    tot = (
        current_profile(spark, out)
        .filter((F.col("col_name") == "*") & (F.col("stat") == "n_rows"))
        .collect()[0]["value"]
    )
    assert tot == 4.0
