"""Write-audit-publish staged commits for manifest tables.

The Iceberg WAP pattern: stage a merge invisibly, audit the candidate
table, then publish atomically (with the normal optimistic rebase) or
abort without ever having exposed a byte. Beyond-reference surface: the
reference loads directly into live tables and repairs afterwards
(loaders/__init__.py ON CONFLICT upserts); here bad batches are caught
before any committed version exists.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks


def _mk(spark, path, rows, schema="k long, day string, v double"):
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame(rows, schema),
        path,
        keys=["k"],
        partition_col="day",
    )


def _live_keys(spark, path):
    return sorted(
        r.k for r in sinks.read_manifest_table(spark, path).select("k").collect()
    )


def test_stage_is_invisible_until_published(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a", 1.0)])
    n = sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame([(2, "b", 2.0)], "k long, day string, v double"),
        path,
        keys=["k"],
        partition_col="day",
        stage="batch-7",
    )
    assert n == 1
    # committed readers see nothing; no new version exists
    assert _live_keys(spark, path) == [1]
    assert sinks.manifest_versions(path) == [1]
    assert sinks.staged_refs(path) == ["batch-7"]
    # the audit read sees the candidate
    audit = sinks.read_staged_table(spark, path, "batch-7")
    assert sorted(r.k for r in audit.select("k").collect()) == [1, 2]
    r = sinks.publish_staged(spark, path, "batch-7")
    assert r["version"] == 2 and r["partitions"] == ["b"]
    assert _live_keys(spark, path) == [1, 2]
    assert sinks.staged_refs(path) == []
    assert sinks.manifest_history(path)[-1]["op"] == "publish:batch-7"


def test_failed_audit_aborts_without_exposure(spark, tmp_path):
    """The quarantine gate: the audit finds bad rows in the CANDIDATE,
    aborts, and the table never had a version containing them; vacuum
    then reclaims the orphaned staged prefixes."""
    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a", 1.0)])
    bad = spark.createDataFrame(
        [(2, "b", -99.0)], "k long, day string, v double"
    )
    sinks.merge_upsert_manifest(
        spark, bad, path, keys=["k"], partition_col="day", stage="sus"
    )
    # audit rule: v must be non-negative
    n_bad = (
        sinks.read_staged_table(spark, path, "sus")
        .filter(F.col("v") < 0)
        .count()
    )
    assert n_bad == 1
    # staged prefixes are vacuum-protected while the stage is pending
    assert sinks.vacuum_manifest(path, keep_last=1, min_age_sec=0) == []
    sinks.abort_staged(path, "sus")
    assert sinks.staged_refs(path) == []
    removed = sinks.vacuum_manifest(path, keep_last=1, min_age_sec=0)
    assert removed  # the orphaned staged prefix
    assert _live_keys(spark, path) == [1]
    assert sinks.manifest_versions(path) == [1]


def test_publish_rebases_over_disjoint_commit(spark, tmp_path):
    """Commits landing during the audit window rebase under the publish —
    the WAP fast-forward: both the audited batch and the competitor land,
    in commit order."""
    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a", 1.0)])
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame([(2, "b", 2.0)], "k long, day string, v double"),
        path,
        keys=["k"],
        partition_col="day",
        stage="slow-audit",
    )
    # a competitor commits to a different partition mid-audit
    _mk(spark, path, [(3, "c", 3.0)])
    r = sinks.publish_staged(spark, path, "slow-audit")
    assert r["version"] == 3
    assert _live_keys(spark, path) == [1, 2, 3]


def test_publish_conflicts_on_same_partition_commit(spark, tmp_path):
    """A competitor rewriting a STAGED partition during the audit makes
    the publish raise — the staged merge was computed against a stale
    snapshot of that partition; abort and re-stage."""
    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a", 1.0)])
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame([(2, "a", 2.0)], "k long, day string, v double"),
        path,
        keys=["k"],
        partition_col="day",
        stage="stale",
    )
    _mk(spark, path, [(4, "a", 4.0)])
    with pytest.raises(sinks.ConcurrentWriteError, match="also rewrote"):
        sinks.publish_staged(spark, path, "stale")
    sinks.abort_staged(path, "stale")
    # re-stage against the current table and publish cleanly
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame([(2, "a", 2.0)], "k long, day string, v double"),
        path,
        keys=["k"],
        partition_col="day",
        stage="fresh",
    )
    sinks.publish_staged(spark, path, "fresh")
    assert _live_keys(spark, path) == [1, 2, 4]


def test_publish_rechecks_moved_keys(spark, tmp_path):
    """A competitor introducing one of the staged keys under ANOTHER
    partition during the audit fails the publish (key-spanning guard),
    exactly as a live merge's rebase would."""
    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a", 1.0)])
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame([(5, "b", 5.0)], "k long, day string, v double"),
        path,
        keys=["k"],
        partition_col="day",
        stage="mover",
    )
    _mk(spark, path, [(5, "c", 50.0)])  # same key, different partition
    with pytest.raises(ValueError, match="competing commit introduced"):
        sinks.publish_staged(spark, path, "mover")
    sinks.abort_staged(path, "mover")


def test_stage_name_collision_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a", 1.0)])
    up = spark.createDataFrame([(2, "b", 2.0)], "k long, day string, v double")
    sinks.merge_upsert_manifest(
        spark, up, path, keys=["k"], partition_col="day", stage="dup"
    )
    with pytest.raises(sinks.ConcurrentWriteError, match="already exists"):
        sinks.merge_upsert_manifest(
            spark, up, path, keys=["k"], partition_col="day", stage="dup"
        )
    sinks.abort_staged(path, "dup")


def test_stage_on_empty_table_and_first_publish(spark, tmp_path):
    """Staging the very first batch of a new table: base is the synthetic
    empty state; publish creates version 1."""
    path = str(tmp_path / "t")
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame([(1, "a", 1.0)], "k long, day string, v double"),
        path,
        keys=["k"],
        partition_col="day",
        stage="genesis",
    )
    assert sinks.manifest_versions(path) == []
    assert (
        sinks.read_staged_table(spark, path, "genesis").count() == 1
    )
    r = sinks.publish_staged(spark, path, "genesis")
    assert r["version"] == 1
    assert _live_keys(spark, path) == [1]


def test_staged_audit_sees_mor_deletes(spark, tmp_path):
    """The candidate overlay composes with merge-on-read deletes: an
    untouched delete-bearing partition reads LIVE rows in the audit."""
    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)])
    sinks.delete_manifest_rows(spark, path, [("k", "=", 2)], mode="mor")
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame([(9, "c", 9.0)], "k long, day string, v double"),
        path,
        keys=["k"],
        partition_col="day",
        stage="s",
    )
    audit = sinks.read_staged_table(spark, path, "s")
    assert sorted(r.k for r in audit.select("k").collect()) == [1, 3, 9]
    sinks.publish_staged(spark, path, "s")
    assert _live_keys(spark, path) == [1, 3, 9]
