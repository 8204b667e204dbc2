"""The manifest change feed as a Structured Streaming source
(streaming/manifest_source.py): per-commit CDC batches with checkpoint
semantics — the Delta-as-a-source contract over the manifest commit log
(the reference's scheduled-batch control plane, metadata.py:150-191,
made native)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks
from f1_data_pipeline_spark.streaming.manifest_source import (
    read_change_stream,
    start_change_stream_replica,
)


def _mk_table(spark, path):
    """v1: 6 rows / 2 partitions; v2: update k=2 + insert k=7;
    v3: CoW delete k=3; v4: MoR delete k=5."""
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0),
         (4, "b", 4.0), (5, "b", 5.0), (6, "a", 6.0)],
        "k long, g string, v double",
    )
    sinks.merge_upsert_manifest(spark, df, path, ["k"], partition_col="g")
    up = spark.createDataFrame(
        [(2, "a", 20.0), (7, "a", 7.0)], "k long, g string, v double"
    )
    sinks.merge_upsert_manifest(spark, up, path, ["k"], partition_col="g")
    sinks.delete_manifest_rows(spark, path, [("k", "=", 3)])
    sinks.delete_manifest_rows(spark, path, [("k", "=", 5)], mode="mor")


def _drain(feed, out_dir, ckpt):
    q = (
        feed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_feed_parity_vs_manifest_row_changes(spark, tmp_path):
    """Every single-commit window of the stream equals
    manifest_row_changes(v-1, v) row-for-row — the feed-parity pin the
    per-commit contract reduces to (a multi-commit batch is just their
    concatenation, which the _commit_version column proves)."""
    path = str(tmp_path / "src")
    _mk_table(spark, path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(read_change_stream(spark, path, ["k"], starting_version=2), out, ckpt)
    got = spark.read.parquet(out)
    for v in (2, 3, 4):
        want = sinks.manifest_row_changes(spark, path, ["k"], v - 1, v)
        win = got.filter(F.col("_commit_version") == v).drop("_commit_version")
        assert _rows(win) == _rows(want), f"version {v} diverged"
    # v4 is the MoR delete — it must surface as a CDC delete
    mor = got.filter("_commit_version = 4").collect()
    assert [(r["k"], r["_change"]) for r in mor] == [(5, "delete")]


def test_bootstrap_snapshot_then_increments(spark, tmp_path):
    """Default start = full snapshot tagged insert (the
    consume_table_changes bootstrap shape); the next trigger sees only
    subsequent commits."""
    path = str(tmp_path / "src")
    _mk_table(spark, path)  # latest = v4: keys {1,2,4,6,7}
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    feed = read_change_stream(spark, path, ["k"])
    _drain(feed, out, ckpt)
    got = spark.read.parquet(out)
    assert {r["_change"] for r in got.collect()} == {"insert"}
    assert sorted(r["k"] for r in got.collect()) == [1, 2, 4, 6, 7]
    assert got.select("_commit_version").distinct().collect()[0][0] == 4

    # a new commit: only ITS changes arrive on the next drain
    up = spark.createDataFrame([(8, "b", 8.0)], "k long, g string, v double")
    sinks.merge_upsert_manifest(spark, up, path, ["k"], partition_col="g")
    _drain(read_change_stream(spark, path, ["k"]), out, ckpt)
    got2 = spark.read.parquet(out)
    assert got2.count() == 6
    [n] = got2.filter("_commit_version = 5").collect()
    assert (n["k"], n["_change"]) == (8, "insert")


def test_checkpoint_replay_resumes_without_duplicates(spark, tmp_path):
    """Stop after draining v1..v2, commit v3..v4, restart on the SAME
    checkpoint: only the new window arrives; no row is duplicated."""
    path = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0)], "k long, g string, v double"
    )
    sinks.merge_upsert_manifest(spark, df, path, ["k"], partition_col="g")
    up = spark.createDataFrame([(3, "b", 3.0)], "k long, g string, v double")
    sinks.merge_upsert_manifest(spark, up, path, ["k"], partition_col="g")

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(read_change_stream(spark, path, ["k"], starting_version=1), out, ckpt)
    first = spark.read.parquet(out).count()
    assert first == 3

    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame([(1, "a", 10.0)], "k long, g string, v double"),
        path, ["k"], partition_col="g",
    )
    sinks.delete_manifest_rows(spark, path, [("k", "=", 2)])
    _drain(read_change_stream(spark, path, ["k"], starting_version=1), out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 5  # 3 + update + delete, nothing replayed
    assert got.groupBy("k", "_commit_version", "_change").count() \
              .filter("count > 1").count() == 0
    assert _rows(got.filter("_commit_version = 3").drop("_commit_version")) \
        == _rows(sinks.manifest_row_changes(spark, path, ["k"], 2, 3))


def test_preimage_option(spark, tmp_path):
    path = str(tmp_path / "src")
    _mk_table(spark, path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(
        read_change_stream(spark, path, ["k"], starting_version=2,
                           preimage=True),
        out, ckpt,
    )
    got = spark.read.parquet(out).filter("_commit_version = 2")
    pre = [r for r in got.collect() if r["_change"] == "update_preimage"]
    post = [r for r in got.collect() if r["_change"] == "update_postimage"]
    assert [(r["k"], r["v"]) for r in pre] == [(2, 2.0)]
    assert [(r["k"], r["v"]) for r in post] == [(2, 20.0)]


def test_streaming_replica_converges_and_restarts(spark, tmp_path):
    """start_change_stream_replica: the CDC consumer rewired through
    readStream. After each drain the replica equals the source snapshot
    exactly; a restart on the same checkpoint applies only the new
    window (exactly-once effect through idempotent MERGE/DELETE)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _mk_table(spark, src)

    q = start_change_stream_replica(spark, src, dst, ["k"], ckpt)
    q.awaitTermination(300)
    want = _rows(sinks.read_manifest_table(spark, src))
    assert _rows(sinks.read_manifest_table(spark, dst)) == want

    # more commits: an update, a delete, an insert — then one more drain
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame(
            [(4, "b", 40.0), (9, "a", 9.0)], "k long, g string, v double"
        ),
        src, ["k"], partition_col="g",
    )
    sinks.delete_manifest_rows(spark, src, [("k", "=", 6)])
    q2 = start_change_stream_replica(spark, src, dst, ["k"], ckpt)
    q2.awaitTermination(300)
    assert _rows(sinks.read_manifest_table(spark, dst)) \
        == _rows(sinks.read_manifest_table(spark, src))


def test_vacuum_past_window_raises_loudly(spark, tmp_path):
    """Retention contract: replaying a vacuumed version fails with a
    clear error instead of silently skipping data."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    path = str(tmp_path / "src")
    _mk_table(spark, path)
    sinks.vacuum_manifest(path, keep_last=1, min_age_sec=0)
    feed = read_change_stream(spark, path, ["k"], starting_version=2)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        feed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises((StreamingQueryException, Py4JJavaError)):
        q.awaitTermination(300)


def test_schema_and_key_validation(spark, tmp_path):
    path = str(tmp_path / "src")
    _mk_table(spark, path)
    with pytest.raises(Exception, match="key column"):
        _drain(
            read_change_stream(spark, path, ["nope"]),
            str(tmp_path / "o"), str(tmp_path / "c"),
        )


def test_timestamp_and_hidden_partition_feed(spark, tmp_path):
    """Arrow fidelity: a days(ts)-partitioned table (timestamps in
    files, derived keys in the manifest, a NULL partition) streams with
    values identical to the batch CDC read."""
    import datetime as dt

    path = str(tmp_path / "tsrc")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 5, 12), "x"),
         (2, dt.datetime(2024, 3, 6, 1), "y"),
         (3, None, "z")],
        "k long, ts timestamp, s string",
    )
    sinks.merge_upsert_manifest(spark, df, path, ["k"],
                                partition_col="days(ts)")
    up = spark.createDataFrame(
        [(2, dt.datetime(2024, 3, 6, 1), "y2")], "k long, ts timestamp, s string"
    )
    sinks.merge_upsert_manifest(spark, up, path, ["k"],
                                partition_col="days(ts)")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(read_change_stream(spark, path, ["k"], starting_version=1), out, ckpt)
    got = spark.read.parquet(out)
    assert _rows(got.filter("_commit_version = 1").drop("_commit_version",
                                                        "_change")) \
        == _rows(sinks.read_manifest_table(spark, path, version=1))
    [u] = got.filter("_commit_version = 2").collect()
    assert (u["k"], u["s"], u["_change"]) == (2, "y2", "update_postimage")
    assert u["ts"] == dt.datetime(2024, 3, 6, 1)


def test_backlog_rate_limit_bounds_batches(spark, tmp_path):
    """max_versions_per_batch: after a run's first batch, a mid-run
    commit burst drains in bounded chunks (at most N commits per
    micro-batch) — never one giant batch — with the full feed arriving
    exactly once."""
    import time as _time

    def _commit(i):
        sinks.merge_upsert_manifest(
            spark,
            spark.createDataFrame([(i, "a", float(i))],
                                  "k long, g string, v double"),
            path, ["k"], partition_col="g",
        )

    path = str(tmp_path / "src")
    _commit(0)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        read_change_stream(spark, path, ["k"], starting_version=1,
                           max_versions_per_batch=2)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second").start()
    )

    def _wait_rows(n, timeout=240):
        deadline = _time.time() + timeout
        while _time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= n:
                    return
            except Exception:
                pass
            _time.sleep(2)
        raise AssertionError(f"timed out waiting for {n} rows")

    try:
        _wait_rows(1)  # the run's first batch (uncapped by design)
        for i in range(1, 5):
            _commit(i)  # a mid-run burst of 4 commits
        _wait_rows(5)
    finally:
        progress = list(q.recentProgress)
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 5  # one insert per commit, nothing duplicated
    assert got.groupBy("k", "_commit_version", "_change").count() \
              .filter("count > 1").count() == 0
    assert got.select("_commit_version").distinct().count() == 5
    # the burst drained across >= 2 capped batches (4 commits / cap 2),
    # and no batch after the first carried more than 2 commits' rows
    nonempty = [p for p in progress if p["numInputRows"] > 0]
    assert len(nonempty) >= 3, [p["numInputRows"] for p in progress]
    assert all(p["numInputRows"] <= 2 for p in nonempty[1:])


def test_catalog_read_stream_by_name(spark, tmp_path):
    """catalog_read_stream: the change feed resolved by catalog name;
    pinned entries refuse (a pin promises a frozen snapshot)."""
    from f1_data_pipeline_spark.operators import catalog as CAT

    path = str(tmp_path / "src")
    _mk_table(spark, path)
    cat = str(tmp_path / "cat")
    CAT.catalog_create_table(cat, "live", path)
    sinks.manifest_tag(path, "v1pin", 1)
    CAT.catalog_create_table(cat, "frozen", path, ref="v1pin")

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    feed = CAT.catalog_read_stream(spark, cat, "live", ["k"],
                                   starting_version=2)
    _drain(feed, out, ckpt)
    got = spark.read.parquet(out)
    assert _rows(got.filter("_commit_version = 2").drop("_commit_version")) \
        == _rows(sinks.manifest_row_changes(spark, path, ["k"], 1, 2))

    with pytest.raises(ValueError, match="pinned"):
        CAT.catalog_read_stream(spark, cat, "frozen", ["k"])
    with pytest.raises(FileNotFoundError):
        CAT.catalog_read_stream(spark, cat, "ghost", ["k"])


def test_starting_version_beyond_latest_skips_not_regresses(spark, tmp_path):
    """starting_version past the current latest means 'skip everything
    until commit N lands': the offset never regresses, the pre-N
    commits are never emitted, and commits from N on stream normally."""
    path = str(tmp_path / "src")
    for i in range(3):  # v1..v3
        sinks.merge_upsert_manifest(
            spark,
            spark.createDataFrame([(i, "a", float(i))],
                                  "k long, g string, v double"),
            path, ["k"], partition_col="g",
        )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(read_change_stream(spark, path, ["k"], starting_version=5),
           out, ckpt)
    assert spark.read.parquet(out).count() == 0  # nothing before v5

    for i in range(3, 6):  # v4..v6
        sinks.merge_upsert_manifest(
            spark,
            spark.createDataFrame([(i, "a", float(i))],
                                  "k long, g string, v double"),
            path, ["k"], partition_col="g",
        )
    _drain(read_change_stream(spark, path, ["k"], starting_version=5),
           out, ckpt)
    got = spark.read.parquet(out)
    # v4 (below starting_version) never surfaces; v5 and v6 do
    assert sorted(r["_commit_version"] for r in got.collect()) == [5, 6]
    assert sorted(r["k"] for r in got.collect()) == [4, 5]


def test_continuous_replica_converges_without_restart(spark, tmp_path):
    """Round-12: `trigger_available_now=False` keeps ONE replica query
    alive on a processingTime trigger — the steady-state consumer shape
    (the per-query source-runner spawn paid once; each commit wave
    lands at marginal batch cost). Waves committed while the query runs
    converge onto the replica with no restart; idempotent MERGE/DELETE
    keeps it exactly-once."""
    import time as _time

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _mk_table(spark, src)

    q = start_change_stream_replica(
        spark, src, dst, ["k"], ckpt,
        trigger_available_now=False, processing_time="100 milliseconds",
    )
    try:
        def _wait_converged(timeout=120.0):
            want = _rows(sinks.read_manifest_table(spark, src))
            t0 = _time.time()
            last = None
            while _time.time() - t0 < timeout:
                if q.exception():
                    raise AssertionError(q.exception())
                try:
                    last = _rows(sinks.read_manifest_table(spark, dst))
                except FileNotFoundError:
                    last = None
                if last == want:
                    return
                _time.sleep(0.2)
            raise AssertionError(f"replica never converged: {last}")

        _wait_converged()  # the backlog
        # two live waves, no restart between them
        sinks.merge_upsert_manifest(
            spark,
            spark.createDataFrame(
                [(4, "b", 44.0), (11, "a", 11.0)],
                "k long, g string, v double",
            ),
            src, ["k"], partition_col="g",
        )
        _wait_converged()
        sinks.delete_manifest_rows(spark, src, [("k", "=", 7)])
        sinks.merge_upsert_manifest(
            spark,
            spark.createDataFrame(
                [(12, "b", 12.0)], "k long, g string, v double"
            ),
            src, ["k"], partition_col="g",
        )
        _wait_converged()
    finally:
        q.stop()
