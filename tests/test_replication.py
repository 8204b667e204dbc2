"""CDC-driven table replication: replicas under the same or a DIFFERENT
partition spec (materialized secondary layout), exactly-once watermarks,
update-as-delete+insert across replica partitions."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks


def _events(spark, lo, hi):
    base = dt.datetime(2024, 5, 1)
    rows = [
        (i, base + dt.timedelta(hours=(i % 72)), float(i))
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, v double")


def _content(spark, path):
    return sorted(
        (r.k, r.ts, r.v)
        for r in sinks.read_manifest_table(spark, path).collect()
    )


def test_secondary_layout_replica(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    sinks.merge_upsert_manifest(
        spark, _events(spark, 0, 144), src, keys=["k"],
        partition_col="days(ts)",
    )
    out = sinks.replicate_table_increment(
        spark, src, dst, keys=["k"], dst_partition_col="bucket(8, k)"
    )
    assert out["upserted"] == 144
    assert _content(spark, dst) == _content(spark, src)
    # the replica IS the secondary index: a point lookup prunes to one
    # of 8 buckets there, while the source stays time-partitioned
    m = sinks.read_manifest(dst)
    assert m["partition_col"] == "bucket(8, k)"
    kept = sinks._transform_prune(
        spark, m, dict(m["partitions"]), [("k", "=", 77)]
    )
    assert len(kept) == 1
    # incremental: upserts and deletes flow through
    sinks.merge_upsert_manifest(
        spark, _events(spark, 200, 210), src, keys=["k"],
        partition_col="days(ts)",
    )
    sinks.delete_manifest_rows(spark, src, [("k", "<", 10)])
    out = sinks.replicate_table_increment(
        spark, src, dst, keys=["k"], dst_partition_col="bucket(8, k)"
    )
    assert out["upserted"] == 10 and out["deleted"] == 10
    assert _content(spark, dst) == _content(spark, src)
    # consumed: next call no-ops without committing
    v = sinks.read_manifest(dst)["version"]
    assert sinks.replicate_table_increment(
        spark, src, dst, keys=["k"], dst_partition_col="bucket(8, k)"
    )["noop"]
    assert sinks.read_manifest(dst)["version"] == v


def test_update_moving_partition_replicates(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = _events(spark, 0, 48)
    # source partitioned by bucket (updates never move THERE) …
    sinks.merge_upsert_manifest(
        spark, df, src, keys=["k"], partition_col="bucket(4, k)"
    )
    # … replica partitioned by day (the same update MOVES here)
    sinks.replicate_table_increment(
        spark, src, dst, keys=["k"], dst_partition_col="days(ts)"
    )
    moved = spark.createDataFrame(
        [(0, dt.datetime(2024, 5, 3, 9, 0), -1.0)],
        "k long, ts timestamp, v double",
    )
    sinks.merge_upsert_manifest(
        spark, moved, src, keys=["k"], partition_col="bucket(4, k)"
    )
    out = sinks.replicate_table_increment(
        spark, src, dst, keys=["k"], dst_partition_col="days(ts)"
    )
    assert out["deleted"] == 1 and out["upserted"] == 1
    assert _content(spark, dst) == _content(spark, src)
    got = sinks.read_manifest_table(spark, dst).filter("k = 0").collect()
    assert got[0].ts == dt.datetime(2024, 5, 3, 9, 0)


def test_schema_evolution_follows(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    sinks.merge_upsert_manifest(
        spark, _events(spark, 0, 24), src, keys=["k"],
        partition_col="days(ts)",
    )
    sinks.replicate_table_increment(spark, src, dst, keys=["k"])
    # the source evolves AND updates a row in one window
    sinks.manifest_add_column(spark, src, "score", "double")
    up = spark.createDataFrame(
        [(1, dt.datetime(2024, 5, 1, 1, 0), 0.0, 0.9)],
        "k long, ts timestamp, v double, score double",
    )
    sinks.merge_upsert_manifest(
        spark, up, src, keys=["k"], partition_col="days(ts)"
    )
    out = sinks.replicate_table_increment(spark, src, dst, keys=["k"])
    assert out["upserted"] == 1
    got = sinks.read_manifest_table(spark, dst)
    assert "score" in got.columns
    assert got.filter("score = 0.9").count() == 1


def test_replay_converges_and_cross_wiring_refused(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    other = str(tmp_path / "other")
    sinks.merge_upsert_manifest(
        spark, _events(spark, 0, 24), src, keys=["k"],
        partition_col="days(ts)",
    )
    sinks.merge_upsert_manifest(
        spark, _events(spark, 0, 5), other, keys=["k"],
        partition_col="days(ts)",
    )
    sinks.replicate_table_increment(spark, src, dst, keys=["k"])
    sinks.delete_manifest_rows(spark, src, [("k", "=", 3)])
    sinks.replicate_table_increment(spark, src, dst, keys=["k"])
    want = _content(spark, dst)
    # crash-before-watermark replay
    sinks.manifest_set_app_metadata(spark, dst, {"repl_version": 1})
    out = sinks.replicate_table_increment(spark, src, dst, keys=["k"])
    assert _content(spark, dst) == want
    assert sinks.manifest_app_metadata(dst)["repl_version"] == \
        sinks.manifest_versions(src)[-1]
    with pytest.raises(ValueError, match="follows"):
        sinks.replicate_table_increment(spark, other, dst, keys=["k"])


def test_streaming_merge_sink_composes_with_transforms(spark, tmp_path):
    # start_merge_sink(commit="manifest") passes the spec through — the
    # streaming ingest writes a hidden-partitioned table directly
    from f1_data_pipeline_spark.streaming.structured import start_merge_sink

    src_dir = str(tmp_path / "in")
    target = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    df = _events(spark, 0, 48)
    df.coalesce(1).write.parquet(src_dir + "/b1")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    q = start_merge_sink(
        stream, target, ["k"], ckpt,
        partition_col="days(ts)", commit="manifest",
        check_moved_keys=False,
    )
    q.awaitTermination(120)
    m = sinks.read_manifest(target)
    assert m["partition_col"] == "days(ts)"
    assert sorted(m["partitions"]) == ["2024-05-01", "2024-05-02"]
    assert sinks.read_manifest_table(spark, target).count() == 48


def test_inplace_updates_replicate_in_one_commit(spark, tmp_path):
    """An update window with no deletes and no replica-partition movers
    must land as ONE replica commit (no preimage-delete commit, so no
    transient missing-key window — round-5 advice)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    sinks.merge_upsert_manifest(
        spark, _events(spark, 0, 100), src, keys=["k"],
        partition_col="days(ts)",
    )
    sinks.replicate_table_increment(spark, src, dst, keys=["k"])
    v0 = sinks.read_manifest(dst)["version"]
    # update values only — ts (and hence the day partition) unchanged
    up = _events(spark, 10, 30).withColumn("v", F.col("v") * -1.0)
    sinks.merge_upsert_manifest(
        spark, up, src, keys=["k"], partition_col="days(ts)"
    )
    out = sinks.replicate_table_increment(spark, src, dst, keys=["k"])
    assert out["upserted"] == 20 and out["deleted"] == 0
    assert _content(spark, dst) == _content(spark, src)
    # exactly one commit: updates applied through the upsert merge alone
    assert sinks.read_manifest(dst)["version"] == v0 + 1


def test_moving_update_still_two_commits_and_converges(spark, tmp_path):
    """Cross-partition movers keep the delete+insert path; replica
    content converges and the mover count is minimal (non-moving updates
    in the same window don't inflate the delete commit)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    # source bucket-partitioned (updates never move THERE); replica by day
    sinks.merge_upsert_manifest(
        spark, _events(spark, 0, 100), src, keys=["k"],
        partition_col="bucket(4, k)",
    )
    sinks.replicate_table_increment(
        spark, src, dst, keys=["k"], dst_partition_col="days(ts)"
    )
    # one mover (k=5 shifts 10 days in the replica) + many in-place updates
    mover = _events(spark, 5, 6).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 10 DAYS")
    )
    inplace = _events(spark, 50, 70).withColumn("v", F.lit(0.0))
    sinks.merge_upsert_manifest(
        spark, mover.unionByName(inplace), src, keys=["k"],
        partition_col="bucket(4, k)",
    )
    out = sinks.replicate_table_increment(
        spark, src, dst, keys=["k"], dst_partition_col="days(ts)"
    )
    assert out["deleted"] == 1  # only the mover's preimage
    assert out["upserted"] == 21
    assert _content(spark, dst) == _content(spark, src)
