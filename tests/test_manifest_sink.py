"""Native streaming manifest sink (streaming/manifest_sink.py): one
atomic manifest commit per micro-batch, exactly-once by construction
(per-batch partition keys), no foreachBatch."""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from f1_data_pipeline_spark.operators import sinks
from f1_data_pipeline_spark.streaming.manifest_sink import (
    ManifestAppendStreamWriter,
    start_manifest_append_stream,
)
from f1_data_pipeline_spark.streaming.manifest_source import (
    read_change_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, src, lo, hi, part):
    import datetime as dt

    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 3, 1, i % 24), float(i)) for i in range(lo, hi)],
        SCHEMA,
    )
    df.coalesce(1).write.parquet(os.path.join(src, part))


def _drain(spark, src, dst, ckpt, sink_id="stream", mfpt=None):
    reader = spark.readStream.schema(SCHEMA).format("parquet")
    if mfpt:
        reader = reader.option("maxFilesPerTrigger", mfpt)
    q = start_manifest_append_stream(
        reader.load(src + "/b*"), dst, ckpt, sink_id=sink_id
    )
    q.awaitTermination(300)


def test_append_sink_lands_batches_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, 0, 50, "b1")
    _write_batch(spark, src, 50, 80, "b2")
    _drain(spark, src, dst, ckpt, mfpt=1)  # one micro-batch per file

    m = sinks.read_manifest(dst)
    assert m["partition_col"] == "_stream_batch"
    assert len(m["partitions"]) == 2  # one landing partition per batch
    assert all(k.startswith("stream-") for k in m["partitions"])
    got = sinks.read_manifest_table(spark, dst)
    assert got.count() == 80
    assert sorted(r["event_id"] for r in got.collect()) == list(range(80))
    assert dict(got.dtypes) == {
        "event_id": "bigint", "ts": "timestamp", "value": "double"
    }

    # restart on the same checkpoint with new input: only the new file
    # lands; nothing replays (counts prove exactly-once effect)
    _write_batch(spark, src, 80, 90, "b3")
    _drain(spark, src, dst, ckpt, mfpt=1)
    got2 = sinks.read_manifest_table(spark, dst)
    assert got2.count() == 90
    assert got2.groupBy("event_id").count().filter("count > 1").count() == 0
    # no staged leftovers
    assert glob.glob(os.path.join(dst, "_staged_stream", "*")) == []


def test_append_sink_replayed_epoch_is_dropped(spark, tmp_path):
    """Simulate Spark replaying an epoch that already committed: the
    second commit with the same batchId finds its partition key and
    drops the staged duplicates."""
    dst = str(tmp_path / "dst")
    w = ManifestAppendStreamWriter({"path": dst, "sink_id": "s"}, SCHEMA)

    import pyarrow as pa

    batch = pa.record_batch(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([None, None], pa.timestamp("us", tz="UTC")),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    msg1 = w.write(iter([batch]))
    w.commit([msg1], batchId=0)
    assert sinks.read_manifest(dst)["version"] == 1

    msg2 = w.write(iter([batch]))  # the replay's duplicate staging
    w.commit([msg2], batchId=0)
    assert sinks.read_manifest(dst)["version"] == 1  # no second commit
    assert not os.path.exists(msg2.file)
    assert sinks.read_manifest_table(spark, dst).count() == 2

    # a NEW epoch commits normally
    msg3 = w.write(iter([batch]))
    w.commit([msg3], batchId=1)
    assert sinks.read_manifest(dst)["version"] == 2
    assert sinks.read_manifest_table(spark, dst).count() == 4


def test_append_sink_guards(spark, tmp_path):
    # schema drift refused on restart
    dst = str(tmp_path / "dst")
    w = ManifestAppendStreamWriter({"path": dst, "sink_id": "g"}, SCHEMA)

    import pyarrow as pa

    batch = pa.record_batch({
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array([None], pa.timestamp("us", tz="UTC")),
        "value": pa.array([1.0], pa.float64()),
    })
    w.commit([w.write(iter([batch]))], batchId=0)
    drifted = T.StructType(list(SCHEMA)[:2])
    with pytest.raises(ValueError, match="does not match"):
        ManifestAppendStreamWriter({"path": dst, "sink_id": "g"}, drifted)

    # no sink_id and no checkpoint option: refuse rather than fall back
    # to a constant namespace another query could collide with
    with pytest.raises(ValueError, match="batch namespace"):
        ManifestAppendStreamWriter({"path": dst}, SCHEMA)

    # a non-landing manifest table refuses the sink
    other = str(tmp_path / "other")
    df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("day")
    )
    sinks.merge_upsert_manifest(spark, df, other, keys=["k"],
                                partition_col="day")
    with pytest.raises(ValueError, match="not a streaming landing table"):
        ManifestAppendStreamWriter({"path": other, "sink_id": "g"}, SCHEMA)

    # declared CHECK constraints: the sink cannot enforce them — refuse
    sinks.manifest_add_constraint(spark, dst, "pos", "value >= 0")
    with pytest.raises(ValueError, match="CHECK constraints"):
        ManifestAppendStreamWriter({"path": dst, "sink_id": "g"}, SCHEMA)
    sinks.manifest_drop_constraint(spark, dst, "pos")

    # sink_id with a separator refused (it prefixes partition keys)
    with pytest.raises(ValueError, match="sink_id"):
        ManifestAppendStreamWriter(
            {"path": dst, "sink_id": "a-b"}, SCHEMA
        )


def test_landing_table_feeds_the_change_stream(spark, tmp_path):
    """Source→sink symmetry: batches landed by the streaming sink are
    consumable per-commit through the manifest_changes streaming source
    (landing zone → curation, both native)."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _write_batch(spark, src, 0, 30, "b1")
    _write_batch(spark, src, 30, 40, "b2")
    _drain(spark, src, dst, str(tmp_path / "c1"), mfpt=1)

    out, ckpt2 = str(tmp_path / "feed"), str(tmp_path / "c2")
    q = (
        read_change_stream(spark, dst, ["event_id"], starting_version=1)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    feed = spark.read.parquet(out)
    assert feed.count() == 40
    assert {r["_change"] for r in feed.collect()} == {"insert"}
    assert feed.select("_commit_version").distinct().count() == 2


def test_fresh_checkpoint_gets_fresh_namespace(spark, tmp_path):
    """Without an explicit sink_id, the batch namespace derives from the
    checkpoint location — a NEW query (fresh checkpoint) against the
    same landing table can never be mistaken for an epoch replay, and a
    restart on the SAME checkpoint still dedups."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _write_batch(spark, src, 0, 20, "b1")

    def _go(ck):
        q = start_manifest_append_stream(
            spark.readStream.schema(SCHEMA).format("parquet").load(src + "/b*"),
            dst, ck,
        )
        q.awaitTermination(300)

    _go(str(tmp_path / "ckA"))
    m = sinks.read_manifest(dst)
    assert all(k.startswith("ck") for k in m["partitions"])
    assert sinks.read_manifest_table(spark, dst).count() == 20

    # same checkpoint: replayed input is NOT re-landed
    _go(str(tmp_path / "ckA"))
    assert sinks.read_manifest_table(spark, dst).count() == 20

    # fresh checkpoint: a genuinely new query, its batches land
    _go(str(tmp_path / "ckB"))
    assert sinks.read_manifest_table(spark, dst).count() == 40
    assert len({k.split("-")[0] for k in
                sinks.read_manifest(dst)["partitions"]}) == 2


def test_landing_table_lifecycle_compact_and_relayout(spark, tmp_path):
    """The landing zone composes with the table-maintenance verbs: many
    small batch partitions compact per-partition, and
    repartition_manifest_table re-keys the landing table into an
    analytical layout (spec evolution = the downstream half of the
    landing pattern)."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    for i in range(6):
        _write_batch(spark, src, i * 10, (i + 1) * 10, f"b{i}")
    _drain(spark, src, dst, str(tmp_path / "ck"), mfpt=1)
    before = {tuple(r) for r in sinks.read_manifest_table(spark, dst).collect()}
    assert len(sinks.read_manifest(dst)["partitions"]) == 6

    # per-partition compaction leaves results identical
    sinks.compact_manifest(spark, dst)
    assert {tuple(r)
            for r in sinks.read_manifest_table(spark, dst).collect()} == before

    # re-layout into an analytical bucketed table (values from data)
    sinks.repartition_manifest_table(spark, dst, "bucket(4, event_id)")
    m = sinks.read_manifest(dst)
    assert m["partition_col"] == "bucket(4, event_id)"
    assert {tuple(r)
            for r in sinks.read_manifest_table(spark, dst).collect()} == before
    # and the re-keyed table now refuses further landing appends
    with pytest.raises(ValueError, match="not a streaming landing table"):
        ManifestAppendStreamWriter({"path": dst, "sink_id": "g"}, SCHEMA)


def test_append_after_rename_keeps_physical_names(spark, tmp_path):
    """RENAME COLUMN between stream runs: a restarted sink writes files
    under the PINNED physical names (like every batch writer), so the
    renamed column reads back with real values, not NULLs."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _write_batch(spark, src, 0, 10, "b1")
    _drain(spark, src, dst, str(tmp_path / "c1"), sink_id="a")

    sinks.manifest_rename_column(spark, dst, "value", "amount")
    renamed = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("amount", T.DoubleType()),
    ])
    import datetime as dt

    spark.createDataFrame(
        [(i, dt.datetime(2024, 3, 1), float(i)) for i in range(10, 20)],
        renamed,
    ).coalesce(1).write.parquet(os.path.join(src, "b2"))
    q = start_manifest_append_stream(
        spark.readStream.schema(renamed).format("parquet").load(src + "/b2"),
        dst, str(tmp_path / "c2"), sink_id="b",
    )
    q.awaitTermination(300)
    got = sinks.read_manifest_table(spark, dst)
    assert got.count() == 20
    assert got.filter("amount IS NULL").count() == 0
    assert {r["amount"] for r in got.filter("event_id = 15").collect()} == {15.0}
    # and the new files physically carry the PINNED name 'value'
    import glob as _glob

    import pyarrow.parquet as pq

    new_files = _glob.glob(os.path.join(dst, "data", "b-0", "snap-*", "*.parquet"))
    assert new_files and all(
        "value" in pq.ParquetFile(f).schema_arrow.names for f in new_files
    )


def test_checkpoint_wiped_in_place_refuses_batchid_regression(
    spark, tmp_path
):
    """Wiping a checkpoint's CONTENTS and reusing the path restarts
    batchIds at 0 inside the OLD sink_id namespace — the early batches
    would look like replays and be silently dropped. The commit must
    detect the regression (this batchId committed while HIGHER batchIds
    exist for the same sink_id) and refuse loudly instead."""
    import pyarrow as pa

    dst = str(tmp_path / "dst")
    w = ManifestAppendStreamWriter({"path": dst, "sink_id": "s"}, SCHEMA)
    batch = pa.record_batch(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([None, None], pa.timestamp("us", tz="UTC")),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    for b in (0, 1, 2):
        w.commit([w.write(iter([batch]))], batchId=b)
    assert sinks.read_manifest(dst)["version"] == 3

    # "reset" stream: same sink_id, batchIds restart at 0 — NEW data
    # that must not be silently treated as batch 0's replay
    msg = w.write(iter([batch]))
    with pytest.raises(ValueError, match="reset in place"):
        w.commit([msg], batchId=0)
    # legitimate replay of the LATEST epoch still drops quietly
    msg2 = w.write(iter([batch]))
    w.commit([msg2], batchId=2)
    assert sinks.read_manifest(dst)["version"] == 3
    assert not os.path.exists(msg2.file)
