"""Table-health maintenance policy (operators/maintenance.py): plans from
manifest metadata only, compacts exactly the selected partitions, stays a
no-op on healthy tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import maintenance as MX
from f1_data_pipeline_spark.operators import sinks


def _frag_table(spark, path, n_batches=5):
    """Partition 'a' accumulates one file per merge batch; 'b' stays at
    one file. AQE's tiny-merge coalescing is disabled around the seed so
    fragmentation is real (the standing fixture pattern)."""
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        for i in range(n_batches):
            df = spark.range(i * 10, i * 10 + 10).select(
                F.col("id"),
                F.lit("a").alias("p"),
                F.col("id").cast("double").alias("v"),
            )
            sinks.merge_upsert_manifest(spark, df, path, ["id"], "p")
        one = spark.createDataFrame(
            [(999, "b", 1.0)], "id long, p string, v double"
        )
        sinks.merge_upsert_manifest(spark, one, path, ["id"], "p")
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )


def test_plan_selects_fragmented_and_mor_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    _frag_table(spark, path)
    m = sinks.read_manifest(path)
    n_a_files = len(m["partitions"]["a"]["files"])
    assert n_a_files >= 2  # merges really fragmented partition a
    plan = MX.plan_maintenance(path, max_files_per_partition=n_a_files - 1)
    assert plan["candidates"] == ["a"]
    assert "data files" in plan["reasons"]["a"]
    # healthy thresholds → empty plan
    assert MX.plan_maintenance(
        path, max_files_per_partition=n_a_files
    )["candidates"] == []
    # MoR delete accumulation selects too
    sinks.delete_manifest_rows(
        spark, path, [("id", "=", 3)], mode="mor"
    )
    plan2 = MX.plan_maintenance(
        path, max_files_per_partition=n_a_files + 5,
        max_delete_files_per_partition=0,
    )
    assert plan2["candidates"] == ["a"]
    assert "MoR delete" in plan2["reasons"]["a"]


def test_maintain_compacts_only_candidates(spark, tmp_path):
    path = str(tmp_path / "t")
    _frag_table(spark, path)
    rows_before = sinks.read_manifest_table(spark, path).collect()
    m = sinks.read_manifest(path)
    n_a = len(m["partitions"]["a"]["files"])
    prefix_b = m["partitions"]["b"]["prefix"]
    # dry run: plan only, nothing moves
    dry = MX.maintain_manifest_table(
        spark, path, max_files_per_partition=n_a - 1, dry_run=True
    )
    assert dry["dry_run"] and dry["compacted"] is None
    assert sinks.read_manifest(path)["version"] == m["version"]
    # real pass: only partition a rewrites; b keeps its prefix
    out = MX.maintain_manifest_table(
        spark, path, max_files_per_partition=n_a - 1
    )
    assert out["compacted"]["partitions"] == 1
    assert out["compacted"]["files_after"] < out["compacted"]["files_before"]
    m2 = sinks.read_manifest(path)
    assert m2["partitions"]["b"]["prefix"] == prefix_b
    assert len(m2["partitions"]["a"]["files"]) == 1
    got = sinks.read_manifest_table(spark, path).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, rows_before))
    # second pass on the now-healthy table: zero candidates, no commit
    again = MX.maintain_manifest_table(
        spark, path, max_files_per_partition=n_a - 1
    )
    assert again["candidates"] == [] and again["compacted"] is None
    assert sinks.read_manifest(path)["version"] == m2["version"]


def test_maintain_vacuum_arm(spark, tmp_path):
    path = str(tmp_path / "t")
    _frag_table(spark, path, n_batches=3)
    out = MX.maintain_manifest_table(
        spark, path, max_files_per_partition=1,
        vacuum_keep_last=1, vacuum_min_age_sec=0.0,
    )
    assert out["compacted"] is not None
    assert out["vacuumed"]  # superseded prefixes reclaimed
    # table still reads clean after compact+vacuum
    assert sinks.read_manifest_table(spark, path).count() == 31
    with pytest.raises(FileNotFoundError):
        MX.plan_maintenance(str(tmp_path / "missing"))


def test_maintain_table_sql(spark, tmp_path):
    """MAINTAIN TABLE through the SQL console: DRY RUN plans without a
    commit, the real statement compacts only candidates."""
    from f1_data_pipeline_spark.operators import catalog as CAT

    path = str(tmp_path / "t")
    # the SQL verb runs the DEFAULT thresholds (>8 files/partition), so
    # fragment past them: 16-way shuffle writes >8 files into 'a'
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        _frag_table(spark, path)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert len(sinks.read_manifest(path)["partitions"]["a"]["files"]) > 8
    cat = str(tmp_path / "cat")
    CAT.catalog_create_table(cat, "frag", path)
    v0 = sinks.read_manifest(path)["version"]
    [dry] = CAT.catalog_sql(spark, cat, "MAINTAIN TABLE frag DRY RUN").collect()
    assert dry["dry_run"] == 1 and dry["candidates"] >= 1
    assert dry["partitions_compacted"] == 0
    assert sinks.read_manifest(path)["version"] == v0
    [run] = CAT.catalog_sql(spark, cat, "MAINTAIN TABLE frag").collect()
    assert run["dry_run"] == 0
    assert run["partitions_compacted"] == dry["candidates"]
    assert run["files_after"] < run["files_before"]
    # healthy now: second pass plans nothing
    [again] = CAT.catalog_sql(spark, cat, "MAINTAIN TABLE frag").collect()
    assert again["candidates"] == 0 and again["partitions_compacted"] == 0
    with pytest.raises(ValueError, match="MAINTAIN"):
        CAT.catalog_sql(spark, cat, "MAINTAIN TABLE frag EVERYTHING")
