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


def test_native_loop_stateful_window_aggregate(spark, tmp_path):
    """Round-11 verdict #5: the native loop composed with a STATEFUL
    operator — readStream manifest_changes → withWatermark + tumbling
    window aggregate → manifest_append — must keep checkpointed
    operator state and the sink's structural exactly-once in agreement
    across a crash. The sharpest pin: a window receives one row BEFORE
    the crash/restart and one row AFTER; the emitted aggregate must
    combine both, exactly once.

    Emission semantics pinned here: the Python streaming source runs
    single-batch drains, so the watermark a batch persists closes
    windows on the NEXT drain that carries data (no-data re-drains run
    no batch and flush nothing) — eventual and exactly-once, one drain
    behind the watermark."""
    import datetime as dt

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")

    def ts(minute):
        return dt.datetime(2024, 3, 1, 0, 0) + dt.timedelta(minutes=minute)

    def commit(rows):
        sinks.merge_upsert_manifest(
            spark,
            spark.createDataFrame(
                rows, "k long, g string, ts timestamp, v double"
            ),
            src, ["k"], partition_col="g",
        )

    # commit 1: two windows' worth of data + a 00:30 row that (a) will
    # push the watermark past both and (b) OPENS a window held in state
    commit([
        (1, "a", ts(1), 1.0), (2, "a", ts(2), 2.0),
        (3, "b", ts(6), 3.0), (10, "a", ts(30), 10.0),
    ])

    def agg(feed):
        return (
            feed.filter(F.col("_change").isin("insert", "update_postimage"))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"), "g")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("tot"))
            .select(F.col("window.start").alias("ws"), "g", "n", "tot")
        )

    def drain():
        feed = read_change_stream(spark, src, ["k"], starting_version=1)
        q = start_manifest_append_stream(agg(feed), dst, ckpt, sink_id="w")
        assert q.awaitTermination(300)
        q.stop()

    def landed():
        try:
            return sorted(
                (r.ws.replace(tzinfo=None), r.g, r.n, r.tot)
                for r in sinks.read_manifest_table(spark, dst).collect()
            )
        except FileNotFoundError:
            return []  # the sink bootstraps on its first non-empty emit

    # drain 1: watermark starts at 0, so NOTHING is emitted yet — the
    # batch only loads state and persists watermark 00:20
    drain()
    assert landed() == []

    # commit 2 lands a second row in the 00:30 window and a 01:00 row;
    # drain 2's batch runs with watermark 00:20 → the two early windows
    # emit; the 00:30 window (now TWO rows) stays in state
    commit([(11, "a", ts(32), 5.0), (12, "b", ts(60), 1.0)])
    drain()
    closed_1 = [(ts(0), "a", 2, 3.0), (ts(5), "b", 1, 3.0)]
    assert landed() == closed_1

    # ---- crash/replay: wipe the checkpoint's last commit marker; the
    # replayed epoch must re-emit NOTHING new (the sink's batch-keyed
    # partition swallows the duplicate; the state store rewinds to the
    # epoch's version instead of double-counting)
    commits = sorted(glob.glob(os.path.join(ckpt, "commits", "*")))
    real = [c for c in commits if not c.endswith(".crc")]
    os.unlink(real[-1])
    crc = os.path.join(
        os.path.dirname(real[-1]), f".{os.path.basename(real[-1])}.crc"
    )
    if os.path.exists(crc):
        os.unlink(crc)
    drain()
    assert landed() == closed_1  # exactly-once THROUGH the crash

    # ---- the state pin: the next data-bearing drain closes the 00:30
    # window — its aggregate must COMBINE the pre-crash row (10.0, held
    # in checkpointed state across crash + restarts) with the
    # post-restart row (5.0), each counted exactly once
    commit([(13, "a", ts(90), 2.0)])
    drain()
    closed_2 = sorted(closed_1 + [(ts(30), "a", 2, 15.0)])
    assert landed() == closed_2

    # ---- one more late commit closes the 01:00 window, exactly once
    commit([(14, "b", ts(120), 9.0)])
    drain()
    closed_3 = sorted(closed_2 + [(ts(60), "b", 1, 1.0)])
    assert landed() == closed_3


def test_heartbeat_closes_windows_without_new_data(spark, tmp_path):
    """Round-12 verdict #5: with `heartbeat=True` the source runs a
    batch on EVERY trigger, empty when no commits landed — so the
    watermark persisted by the previous data-bearing drain closes its
    complete windows on the very next drain, even an idle one. This
    flips the round-11 pin (`test_native_loop_stateful_window_aggregate`
    documents the default's one-data-bearing-drain lag): a dashboard
    consumer no longer waits for the next upstream commit. Idle
    heartbeat drains are also exactly-once (a second one emits nothing
    new) and don't disturb later data drains."""
    import datetime as dt

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")

    def ts(minute):
        return dt.datetime(2024, 3, 1, 0, 0) + dt.timedelta(minutes=minute)

    def commit(rows):
        sinks.merge_upsert_manifest(
            spark,
            spark.createDataFrame(
                rows, "k long, g string, ts timestamp, v double"
            ),
            src, ["k"], partition_col="g",
        )

    commit([
        (1, "a", ts(1), 1.0), (2, "a", ts(2), 2.0),
        (3, "b", ts(6), 3.0), (10, "a", ts(30), 10.0),
    ])

    def agg(feed):
        return (
            feed.filter(F.col("_change").isin("insert", "update_postimage"))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"), "g")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("tot"))
            .select(F.col("window.start").alias("ws"), "g", "n", "tot")
        )

    def drain():
        feed = read_change_stream(
            spark, src, ["k"], starting_version=1, heartbeat=True
        )
        q = start_manifest_append_stream(agg(feed), dst, ckpt, sink_id="w")
        assert q.awaitTermination(300)
        q.stop()

    def landed():
        try:
            return sorted(
                (r.ws.replace(tzinfo=None), r.g, r.n, r.tot)
                for r in sinks.read_manifest_table(spark, dst).collect()
            )
        except FileNotFoundError:
            return []

    # drain 1 (data): watermark starts at 0 — nothing emitted, state
    # loaded, watermark 00:20 persisted (same as the default source)
    drain()
    assert landed() == []

    # drain 2 (IDLE — no new commits): the heartbeat's empty batch
    # applies watermark 00:20 and the two complete windows emit NOW —
    # under the default source this drain would run no batch at all
    drain()
    closed_1 = [(ts(0), "a", 2, 3.0), (ts(5), "b", 1, 3.0)]
    assert landed() == closed_1

    # drain 3 (idle again): exactly-once — nothing new emits
    drain()
    assert landed() == closed_1

    # a later DATA drain behaves exactly as without the heartbeat: the
    # 00:30 window stays open (watermark 00:20 < its end + delay) and
    # the new rows land in state
    commit([(11, "a", ts(32), 5.0), (12, "b", ts(60), 1.0)])
    drain()
    assert landed() == closed_1
    # ... and one idle heartbeat drain later, the combined 00:30 window
    # (pre-commit row 10.0 + post-commit row 5.0) closes without any
    # further upstream commit
    drain()
    closed_2 = sorted(closed_1 + [(ts(30), "a", 2, 15.0)])
    assert landed() == closed_2
