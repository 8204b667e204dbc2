"""Metadata inspection tables (files / partitions / snapshots DataFrames).

Everything here must be answerable from manifest metadata alone — the
tests delete nothing and open no data files through these APIs; they
cross-check the metadata answers against real scans.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import metadata_tables as mt
from f1_data_pipeline_spark.operators import sinks


def _mk(spark, path, n=400, parts=4):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % parts).alias("day"),
        (F.col("id") * 2).alias("v"),
    )
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="day", bloom_cols=["k"]
    )
    return df


def test_files_df_matches_scan_and_filesystem(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    files = mt.manifest_files_df(spark, path)
    data = files.filter(F.col("content") == "data")
    # row totals from metadata == real scan
    assert (
        data.agg(F.sum("rows")).first()[0]
        == sinks.read_manifest_table(spark, path).count()
    )
    # every file exists on disk with a real size, and carries stats for k
    rows = data.collect()
    assert all(r.size_bytes and r.size_bytes > 0 for r in rows)
    assert all(r.stats and "k" in r.stats for r in rows)
    # 4 partitions present, encoded keys 0..3
    assert sorted(
        {r.partition for r in rows}
    ) == ["0", "1", "2", "3"]


def test_files_df_predicates_show_pruned_scan_set(spark, tmp_path):
    path = str(tmp_path / "t")
    # cluster so per-file bounds are tight on v, then ask which files a
    # point predicate would open — strictly fewer than all of them
    _mk(spark, path, n=2000)
    sinks.compact_manifest(
        spark, path, cluster_by=["v"], target_file_bytes=2048
    )
    all_files = mt.manifest_files_df(spark, path).filter(
        F.col("content") == "data"
    )
    pruned = mt.manifest_files_df(
        spark, path, predicates=[("v", "=", 42)]
    )
    assert 0 < pruned.count() < all_files.count()
    # pruning is purely an I/O plan change: the pruned read still finds
    # the matching row (v=42 → k=21)
    hit = sinks.read_manifest_table(
        spark, path, predicates=[("v", "=", 42)]
    )
    assert [r.k for r in hit.collect()] == [21]


def test_files_df_composes_transform_pruning(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(400).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="bucket(8, k)"
    )
    allf = mt.manifest_files_df(spark, path)
    pruned = mt.manifest_files_df(spark, path, predicates=[("k", "=", 99)])
    # the point probe's file listing covers exactly one bucket partition
    assert pruned.select("partition").distinct().count() == 1
    assert pruned.count() < allf.count()


def test_files_df_lists_position_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    sinks.delete_manifest_rows(spark, path, [("k", "<", 10)], mode="mor")
    files = mt.manifest_files_df(spark, path)
    dels = files.filter(F.col("content") == "position-deletes").collect()
    assert sum(r.rows for r in dels) == 10
    # delete prefixes land under deletes/, data under data/
    assert all(r.prefix.startswith("deletes/") for r in dels)


def test_partitions_df_live_rows_and_bloom_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=400, parts=4)
    sinks.delete_manifest_rows(
        spark, path, [("k", "<", 8)], mode="mor"
    )  # 8 rows, day 0..3 → 2 per partition
    parts = {r.partition: r for r in
             mt.manifest_partitions_df(spark, path).collect()}
    assert set(parts) == {"0", "1", "2", "3"}
    for p in parts.values():
        assert p.rows == 100
        assert p.live_rows == 98
        assert p.delete_files == 1
        assert p.bloom_columns == ["k"]
    # metadata live totals == real scan
    assert sum(p.live_rows for p in parts.values()) == sinks.read_manifest_table(
        spark, path
    ).count()


def test_snapshots_df_is_the_history(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _mk(spark, path)
    up = df.filter(F.col("k") < 5).withColumn("v", F.lit(0).cast("long"))
    sinks.merge_upsert_manifest(
        spark, up, path, keys=["k"], partition_col="day"
    )
    sinks.delete_manifest_rows(spark, path, [("k", "=", 399)])
    snaps = mt.manifest_snapshots_df(spark, path).orderBy("version").collect()
    assert [s.op for s in snaps] == ["merge", "merge", "delete"]
    assert [s.version for s in snaps] == sinks.manifest_versions(path)
    # second merge touched every partition (k<5 spans day 0..3 and 4 keys)
    assert snaps[1].changed_partitions == ["0", "1", "2", "3"]
    # row totals track the table state at each version
    assert snaps[0].rows == 400 and snaps[2].rows == 399
    # committed_at is monotone non-decreasing
    ts = [s.committed_at for s in snaps]
    assert ts == sorted(ts)


def test_time_travel_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=100, parts=2)
    sinks.delete_manifest_rows(spark, path, [("day", "=", 0)])
    v0 = sinks.manifest_versions(path)[0]
    old = mt.manifest_partitions_df(spark, path, version=v0)
    new = mt.manifest_partitions_df(spark, path)
    assert old.count() == 2 and new.count() == 1
    # files table at the old version still lists the dropped partition's
    # files (not vacuumed yet → real sizes)
    oldf = mt.manifest_files_df(spark, path, version=v0).filter(
        F.col("partition") == "0"
    )
    assert oldf.count() > 0 and all(
        r.size_bytes for r in oldf.collect()
    )


def test_missing_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        mt.manifest_files_df(spark, str(tmp_path / "nope"))
