"""Schema evolution across a streamed CDC window: the manifest change
stream's declared schema is the table's CURRENT schema; older commits'
files lack added columns (read as NULL), renamed columns resolve
through their pinned physical names, and widened columns cast up —
the same contracts the batch readers honor (sinks.py), pinned here
for the streaming source's pyarrow read path."""
from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks
from f1_data_pipeline_spark.streaming.manifest_source import (
    read_change_stream,
)


def test_stream_reads_across_add_rename_widen(spark, tmp_path):
    path = str(tmp_path / "evo")
    # v1: (k, v float) under the original names
    df1 = spark.createDataFrame([(1, 1.5), (2, 2.5)], "k long, v float")
    sinks.merge_upsert_manifest(spark, df1, path, ["k"], partition_col="k")
    # v2: rename v -> val (files keep physical name 'v')
    sinks.manifest_rename_column(spark, path, "v", "val")
    # v3: add a column + widen val -> double; new data carries both
    sinks.manifest_add_column(spark, path, "tag", "string")
    sinks.manifest_alter_column_type(spark, path, "val", "double")
    df3 = spark.createDataFrame(
        [(3, 3.5, "new"), (1, 10.0, "upd")], "k long, val double, tag string"
    )
    sinks.merge_upsert_manifest(spark, df3, path, ["k"], partition_col="k")

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        read_change_stream(spark, path, ["k"], starting_version=1)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # declared schema = current: val is double, tag present
    assert dict(got.dtypes)["val"] == "double"
    rows = {(r["k"], r["_commit_version"]): r for r in got.collect()}
    # v1 rows stream under the CURRENT names/types: physical 'v' -> val,
    # float 1.5/2.5 widened to double, missing tag = NULL
    assert rows[(1, 1)]["val"] == 1.5 and rows[(1, 1)]["tag"] is None
    assert rows[(2, 1)]["val"] == 2.5
    # rename/add/widen commits changed no partitions: no rows at v2..4
    assert not [k for k in rows if k[1] in (2, 3, 4)]
    # v5 carries the update (old 1.5 -> 10.0) and the insert
    assert rows[(1, 5)]["_change"] == "update_postimage"
    assert rows[(1, 5)]["val"] == 10.0 and rows[(1, 5)]["tag"] == "upd"
    assert rows[(3, 5)]["_change"] == "insert"

    # batch parity on the final window
    want = sorted(
        tuple(r)
        for r in sinks.manifest_row_changes(spark, path, ["k"], 4, 5).collect()
    )
    have = sorted(
        tuple(r)
        for r in got.filter("_commit_version = 5")
        .drop("_commit_version").collect()
    )
    assert have == want
