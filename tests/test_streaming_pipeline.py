"""End-to-end NATIVE streaming pipeline (round-10 verdict #3): the loop
readStream manifest_changes (X52) → transform → manifest_append sink
(X53), with no foreachBatch and no bespoke driver loop — the
continuous-pipeline shape that replaces the reference's scheduled-batch
control plane (metadata.py:150-191). Pins: parity with the batch path
over the same commits, exactly-once output THROUGH a crash/replay in
the middle, and exactly-once through restart + new upstream commits."""
from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks
from f1_data_pipeline_spark.streaming.manifest_sink import (
    start_manifest_append_stream,
)
from f1_data_pipeline_spark.streaming.manifest_source import (
    read_change_stream,
)


def _screen(feed):
    """The curation screen under test: keep upserted rows that pass a
    quality gate, derive a feature — all JVM-side expressions."""
    return (
        feed.filter(F.col("_change").isin("insert", "update_postimage"))
        .filter(F.col("v") >= 0)
        .select(
            "k", "g", "v", (F.col("v") * 2).alias("v2"),
            F.col("_commit_version").alias("src_commit"),
        )
    )


def _drain(spark, src, dst, ckpt):
    feed = read_change_stream(spark, src, ["k"], starting_version=1)
    q = start_manifest_append_stream(
        _screen(feed), dst, ckpt, sink_id="cur"
    )
    q.awaitTermination(300)


def _batch_equivalent(spark, src, hi):
    """The same screen computed per-commit from the batch CDC verb."""
    outs = []
    for v in range(1, hi + 1):
        if v == 1:
            # version 0 is the empty pre-table: commit 1's window is
            # the v1 snapshot, all inserts
            ch = sinks.read_manifest_table(spark, src, version=1) \
                .withColumn("_change", F.lit("insert"))
        else:
            ch = sinks.manifest_row_changes(spark, src, ["k"], v - 1, v)
        if "_commit_version" not in ch.columns:
            ch = ch.withColumn(
                "_commit_version", F.lit(v).cast("long")
            )
        outs.append(_screen(ch))
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    return df


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_native_loop_parity_and_crash_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", -2.0), (3, "b", 3.0), (4, "b", 4.0)],
        "k long, g string, v double",
    )
    sinks.merge_upsert_manifest(spark, df, src, ["k"], partition_col="g")
    up = spark.createDataFrame(
        [(2, "a", 20.0), (5, "b", 5.0)], "k long, g string, v double"
    )
    sinks.merge_upsert_manifest(spark, up, src, ["k"], partition_col="g")

    _drain(spark, src, dst, ckpt)
    got = sinks.read_manifest_table(spark, dst)
    hi = sinks.read_manifest(src)["version"]
    want = _batch_equivalent(spark, src, hi)
    assert _rows(got) == _rows(want)
    # the negative-v row was screened out, the update landed once
    ks = [r.k for r in got.collect()]
    assert ks.count(2) == 1 and 5 in ks

    # ---- crash/replay in the middle: wipe the checkpoint's LAST
    # commit marker so Spark re-runs that epoch on restart; the sink's
    # batch-keyed partition must swallow the duplicate staging
    commits = sorted(glob.glob(os.path.join(ckpt, "commits", "*")))
    real = [c for c in commits if not c.endswith(".crc")]
    last = real[-1]
    os.unlink(last)
    crc = os.path.join(
        os.path.dirname(last), f".{os.path.basename(last)}.crc"
    )
    if os.path.exists(crc):
        os.unlink(crc)
    v_before = sinks.read_manifest(dst)["version"]
    _drain(spark, src, dst, ckpt)  # replays the uncommitted epoch
    got2 = sinks.read_manifest_table(spark, dst)
    assert _rows(got2) == _rows(want)  # exactly-once output
    # the replayed epoch landed nothing new (its partition key existed)
    assert sinks.read_manifest(dst)["version"] == v_before

    # ---- restart with NEW upstream commits: only the delta lands
    sinks.delete_manifest_rows(spark, src, [("k", "=", 1)])
    more = spark.createDataFrame(
        [(6, "a", 6.0)], "k long, g string, v double"
    )
    sinks.merge_upsert_manifest(spark, more, src, ["k"], partition_col="g")
    _drain(spark, src, dst, ckpt)
    got3 = sinks.read_manifest_table(spark, dst)
    hi3 = sinks.read_manifest(src)["version"]
    want3 = _batch_equivalent(spark, src, hi3)
    assert _rows(got3) == _rows(want3)
    # deletes don't land (screened to upserts); k=6 landed exactly once
    ks3 = [r.k for r in got3.collect()]
    assert ks3.count(6) == 1

    # ---- and the landing table itself feeds a further change stream:
    # the full native composition src→screen→landing→consumer
    out2 = str(tmp_path / "out2")
    ckpt2 = str(tmp_path / "ckpt2")
    feed2 = read_change_stream(spark, dst, ["k", "src_commit"])
    q = (
        feed2.writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    downstream = spark.read.parquet(out2).filter("_change = 'insert'")
    assert sorted(
        (r.k, r.v2) for r in downstream.collect()
    ) == sorted((r.k, r.v2) for r in got3.collect())
