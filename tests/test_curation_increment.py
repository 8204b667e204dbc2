"""CDC-driven incremental curation: raw manifest table → curated
manifest table via the change feed, consumer watermark committed
atomically with the curated output.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks
from f1_data_pipeline_spark.plans.curation import curate_table_increment

SCHEMA = "doc_id long, day long, text string"


def _good(tag, k=24):
    return " ".join(f"{tag}{j}" for j in range(k))


def _raw(spark, path, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["doc_id"], partition_col="day"
    )


def _curated_ids(spark, path):
    return sorted(
        r.doc_id
        for r in sinks.read_manifest_table(spark, path).select("doc_id").collect()
    )


def _paths(tmp_path):
    return (
        str(tmp_path / "raw"),
        str(tmp_path / "cur"),
        str(tmp_path / "idx"),
    )


def test_bootstrap_and_noop(spark, tmp_path):
    raw, cur, idx = _paths(tmp_path)
    _raw(spark, raw, [
        (1, 0, _good("alpha")),
        (2, 0, _good("beta")),
        (3, 1, _good("beta")),       # exact dup of 2
        (4, 1, "spam spam spam"),    # fails quality
        (5, 1, _good("alpha") + " extra"),  # near-dup of 1
    ])
    st = curate_table_increment(spark, raw, cur, idx)
    assert st["window"] == [None, 1]
    assert st["merged"] == 2 and st["quality_dropped"] == 1
    assert st["dup_dropped"] == 2
    assert _curated_ids(spark, cur) == [1, 2]
    assert sinks.manifest_app_metadata(cur)["raw_version"] == 1
    # layout is the hidden bucket transform
    assert sinks.read_manifest(cur)["partition_col"] == "bucket(16, doc_id)"
    # second call: empty window, no new commit
    v = sinks.read_manifest(cur)["version"]
    st2 = curate_table_increment(spark, raw, cur, idx)
    assert st2["merged"] == 0 and sinks.read_manifest(cur)["version"] == v


def test_incremental_window_uses_index(spark, tmp_path):
    raw, cur, idx = _paths(tmp_path)
    _raw(spark, raw, [(1, 0, _good("alpha")), (2, 0, _good("beta"))])
    curate_table_increment(spark, raw, cur, idx)
    # a later crawl batch: one new doc, one near-dup of an ACCEPTED doc
    # (caught only via the persisted index), one junk doc
    _raw(spark, raw, [
        (10, 1, _good("gamma")),
        (11, 1, _good("alpha") + " tail"),
        (12, 1, "x y z"),
    ])
    st = curate_table_increment(spark, raw, cur, idx)
    assert st["window"] == [1, 2]
    assert st["merged"] == 1          # gamma only
    assert st["quality_dropped"] == 1
    assert st["dup_dropped"] == 1     # the index catch
    assert _curated_ids(spark, cur) == [1, 2, 10]
    assert sinks.manifest_app_metadata(cur)["raw_version"] == 2


def test_delete_and_degrading_update_propagate(spark, tmp_path):
    raw, cur, idx = _paths(tmp_path)
    _raw(spark, raw, [
        (1, 0, _good("alpha")), (2, 0, _good("beta")), (3, 1, _good("gamma")),
    ])
    curate_table_increment(spark, raw, cur, idx)
    assert _curated_ids(spark, cur) == [1, 2, 3]
    # raw delete of 1; update of 2 into junk
    sinks.delete_manifest_rows(spark, raw, [("doc_id", "=", 1)])
    up = spark.createDataFrame([(2, 0, "junk junk junk")], SCHEMA)
    sinks.merge_upsert_manifest(
        spark, up, raw, keys=["doc_id"], partition_col="day"
    )
    st = curate_table_increment(spark, raw, cur, idx)
    assert st["removed"] == 2
    assert _curated_ids(spark, cur) == [3]
    assert sinks.manifest_app_metadata(cur)["raw_version"] == \
        sinks.manifest_versions(raw)[-1]


def test_watermark_advances_even_when_window_produces_nothing(
    spark, tmp_path
):
    raw, cur, idx = _paths(tmp_path)
    _raw(spark, raw, [(1, 0, _good("alpha"))])
    curate_table_increment(spark, raw, cur, idx)
    # a window containing only junk: no merge, no removal — the
    # watermark must still advance or the window replays forever
    _raw(spark, raw, [(9, 1, "a b c")])
    st = curate_table_increment(spark, raw, cur, idx)
    assert st["merged"] == 0 and st["removed"] == 0
    assert sinks.manifest_app_metadata(cur)["raw_version"] == \
        sinks.manifest_versions(raw)[-1]
    assert sinks.manifest_history(cur)[-1]["op"] == "set_app"


def test_replay_converges(spark, tmp_path):
    raw, cur, idx = _paths(tmp_path)
    _raw(spark, raw, [(1, 0, _good("alpha")), (2, 0, _good("beta"))])
    curate_table_increment(spark, raw, cur, idx)
    _raw(spark, raw, [(10, 1, _good("gamma")), (11, 1, _good("delta"))])
    curate_table_increment(spark, raw, cur, idx)
    want = _curated_ids(spark, cur)
    # simulate a crash-before-watermark: roll the consumer state back
    # and replay the window — content converges, nothing duplicates
    sinks.manifest_set_app_metadata(spark, cur, {"raw_version": 1})
    st = curate_table_increment(spark, raw, cur, idx)
    assert _curated_ids(spark, cur) == want
    assert sinks.manifest_app_metadata(cur)["raw_version"] == 2
    # replayed docs are already indexed — no duplicate index rows
    from f1_data_pipeline_spark.operators import dedup as D

    ids = D.minhash_index_ids(spark, idx)
    assert ids.count() == ids.distinct().count() == 4
