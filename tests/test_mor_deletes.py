"""Merge-on-read DELETE (position delete files) for manifest tables.

The Iceberg v2 / Delta deletion-vector shape: a DELETE writes a tiny
parquet of (file identity, row position) pairs instead of rewriting the
partition; every reader applies the delete set as an anti-join on the
hidden _metadata columns; rewrites (MERGE / UPDATE / CoW delete /
compaction) fold pending deletes and clear the list. Reference DELETE
semantics parity: the reference has no row deletes at all (append/upsert
only, loaders/__init__.py) — this is beyond-reference table-format
surface for the 100 TB erasure story (GDPR takedowns over a corpus).
"""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

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


def _data_files(path):
    return sorted(glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                            recursive=True))


def _keys(spark, path, **kw):
    return sorted(
        r.k for r in sinks.read_manifest_table(spark, path, **kw)
        .select("k").collect()
    )


def _inject_race(monkeypatch, fire):
    real = sinks._commit_manifest
    state = {"armed": True}

    def racing(path, manifest):
        if state["armed"]:
            state["armed"] = False
            fire()
        return real(path, manifest)

    monkeypatch.setattr(sinks, "_commit_manifest", racing)


def test_mor_delete_no_data_rewrite_and_identical_results(spark, tmp_path):
    """The headline contract: a MoR delete writes ONLY delete files — every
    data file byte-identical in place — and the table reads exactly as if
    the partition had been rewritten (parity vs CoW on a twin table)."""
    mor, cow = str(tmp_path / "mor"), str(tmp_path / "cow")
    _mk(spark, mor)
    _mk(spark, cow)
    before = _data_files(mor)
    preds = [("k", ">=", 10), ("k", "<", 30)]
    r_mor = sinks.delete_manifest_rows(spark, mor, preds, mode="mor")
    r_cow = sinks.delete_manifest_rows(spark, cow, preds, mode="cow")
    assert _data_files(mor) == before
    assert r_mor["deleted"] == r_cow["deleted"] == 20
    assert r_mor["partitions_rewritten"] == 0
    assert r_mor["delete_files_written"] == 4
    assert _keys(spark, mor) == _keys(spark, cow)
    # predicate-pushed read over a delete-bearing table is still exact
    got = _keys(spark, mor, predicates=[("k", "<", 50)])
    assert got == list(range(10)) + list(range(30, 50))


def test_mor_delete_exact_counts_never_recount(spark, tmp_path):
    """Overlapping deletes: already-deleted positions are invisible to the
    second delete (anti-joined out before matching), so `deleted` counts
    and the metadata-only COUNT(*) stay exact as delete files stack up."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    assert sinks.delete_manifest_rows(
        spark, path, [("k", "<", 10)], mode="mor"
    )["deleted"] == 10
    assert sinks.delete_manifest_rows(
        spark, path, [("k", "<", 15)], mode="mor"
    )["deleted"] == 5
    c = sinks.manifest_count(spark, path)
    assert c["count"] == 385 and c["files_scanned"] == 0
    assert c["prefixes_scanned"] == 0
    # predicate count: per-file fast path unusable on delete-bearing
    # entries → scanned, but still exact
    assert sinks.manifest_count(
        spark, path, predicates=[("k", "<", 20)]
    )["count"] == 5
    assert _keys(spark, path) == list(range(15, 400))


def test_mor_delete_emptied_partition_drops_entry(spark, tmp_path):
    """A MoR delete that erases a partition's every LIVE row removes the
    entry outright (metadata-only) instead of writing a delete file that
    shadows the whole prefix."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=40, parts=4)
    # first nibble at day-0 rows, then erase the rest of day 0
    sinks.delete_manifest_rows(spark, path, [("k", "=", 0)], mode="mor")
    r = sinks.delete_manifest_rows(
        spark, path, [("day", "=", 0)], mode="mor"
    )
    assert r["partitions_dropped"] == 1 and r["delete_files_written"] == 0
    m = sinks.read_manifest(path)
    assert "0" not in m["partitions"]
    assert _keys(spark, path) == [k for k in range(40) if k % 4 != 0]


def test_mor_auto_mode_picks_per_partition(spark, tmp_path):
    """mode='auto': a partition whose matched fraction is small takes the
    MoR arm (delete file, no rewrite); one above the threshold pays the
    CoW rewrite once — per partition, in the same commit."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=400, parts=4)  # 100 live rows per partition
    # day 0: delete 60 rows (>20%); day 1: delete 1 row (<20%)
    r = sinks.delete_manifest_rows(
        spark, path,
        [("k", "<", 240)], partition_values=[0], mode="auto",
    )
    assert r["partitions_rewritten"] == 1 and r["delete_files_written"] == 0
    r2 = sinks.delete_manifest_rows(
        spark, path, [("k", "=", 1)], partition_values=[1], mode="auto"
    )
    assert r2["partitions_rewritten"] == 0 and r2["delete_files_written"] == 1
    m = sinks.read_manifest(path)
    assert not m["partitions"]["0"].get("deletes")
    assert m["partitions"]["1"].get("deletes")
    assert len(_keys(spark, path)) == 400 - 60 - 1


def test_mor_merge_folds_deletes_and_frees_erased_keys(spark, tmp_path):
    """A MERGE touching a delete-bearing partition reads LIVE rows (no
    resurrection), folds the deletes into its fresh prefix, and clears the
    list; and a key erased by MoR delete may be re-inserted under a
    DIFFERENT partition — the moved-keys guard must not see ghosts."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=40, parts=4)
    sinks.delete_manifest_rows(spark, path, [("k", "=", 8)], mode="mor")
    # merge into day 0 (k=8 lives there, now deleted)
    up = spark.createDataFrame([(100, 0, -1)], "k long, day long, v long")
    sinks.merge_upsert_manifest(spark, up, path, keys=["k"], partition_col="day")
    m = sinks.read_manifest(path)
    assert not m["partitions"]["0"].get("deletes")
    ks = _keys(spark, path)
    assert 8 not in ks and 100 in ks
    # erased key re-enters under another partition: allowed
    sinks.delete_manifest_rows(spark, path, [("k", "=", 12)], mode="mor")
    re_add = spark.createDataFrame([(12, 1, 5)], "k long, day long, v long")
    sinks.merge_upsert_manifest(
        spark, re_add, path, keys=["k"], partition_col="day"
    )
    out = sinks.read_manifest_table(spark, path).filter("k = 12").collect()
    assert len(out) == 1 and out[0].day == 1


def test_mor_update_does_not_resurrect(spark, tmp_path):
    """UPDATE on a delete-bearing partition evaluates over LIVE rows only
    and its rewrite folds the pending deletes (list cleared)."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=40, parts=4)
    sinks.delete_manifest_rows(spark, path, [("k", "=", 4)], mode="mor")
    r = sinks.update_manifest_rows(
        spark, path, {"v": F.lit(-5)}, [("day", "=", 0)]
    )
    assert r["updated"] == 9  # 10 day-0 rows minus the deleted one
    m = sinks.read_manifest(path)
    assert not m["partitions"]["0"].get("deletes")
    ks = _keys(spark, path)
    assert 4 not in ks and len(ks) == 39


def test_mor_compaction_folds_and_restores_metadata_exactness(
    spark, tmp_path
):
    """compact_manifest is the purge: delete-bearing partitions are always
    rewritten, the entry drops its delete list, per-file stats become
    exact again (manifest_column_bounds answers), and vacuum reclaims the
    old delete prefixes once unreferenced."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=400, parts=4)
    sinks.delete_manifest_rows(spark, path, [("k", "<", 10)], mode="mor")
    assert sinks.manifest_column_bounds(path, "k")["min"] is None
    res = sinks.compact_manifest(spark, path)
    assert res["partitions"] == 4
    m = sinks.read_manifest(path)
    assert all(not e.get("deletes") for e in m["partitions"].values())
    b = sinks.manifest_column_bounds(path, "k")
    assert b["min"] == 10 and b["max"] == 399 and b["rows"] == 390
    assert _keys(spark, path) == list(range(10, 400))
    removed = sinks.vacuum_manifest(path, keep_last=1, min_age_sec=0)
    assert any(p.startswith("deletes") for p in removed)
    assert _keys(spark, path) == list(range(10, 400))


def test_mor_cdc_and_time_travel(spark, tmp_path):
    """A MoR delete is a real commit: changed-partitions flags the
    partitions (prefix unchanged, delete list grew), the row-level feed
    reports the rows as deletes, the old version still reads them (time
    travel), and RESTORE resurrects them."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=40, parts=4)
    sinks.delete_manifest_rows(spark, path, [("k", "<", 3)], mode="mor")
    ch = sinks.manifest_changed_partitions(path, 1, 2)
    assert ch == {"0": "rewritten", "1": "rewritten", "2": "rewritten"}
    feed = sinks.manifest_row_changes(spark, path, ["k"], 1, 2)
    got = {(r.k, r._change) for r in feed.collect()}
    assert got == {(0, "delete"), (1, "delete"), (2, "delete")}
    assert len(_keys(spark, path, version=1)) == 40
    r = sinks.restore_manifest(spark, path, 1)
    assert r["partitions_changed"] == 3
    assert len(_keys(spark, path)) == 40


def test_mor_point_lookup_and_bloom_skip_deleted(spark, tmp_path):
    """Bloom sidecars keep their (now false-positive) deleted keys, but the
    lookup reads through the delete-applying reader — a deleted key
    resolves to zero rows, a live key still resolves."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=400, parts=4)
    sinks.delete_manifest_rows(spark, path, [("k", "=", 7)], mode="mor")
    got = sinks.read_manifest_point_lookup(spark, path, "k", [7, 8]).collect()
    assert sorted(r.k for r in got) == [8]


def test_mor_cow_delete_folds_pending_deletes(spark, tmp_path):
    """A later CoW delete on a delete-bearing partition starts from LIVE
    rows: the rewrite folds the pending MoR deletes (no resurrection) and
    the fresh entry carries no delete list."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=40, parts=4)
    sinks.delete_manifest_rows(spark, path, [("k", "=", 0)], mode="mor")
    r = sinks.delete_manifest_rows(spark, path, [("k", "=", 8)], mode="cow")
    assert r["deleted"] == 1 and r["partitions_rewritten"] == 1
    m = sinks.read_manifest(path)
    assert not m["partitions"]["0"].get("deletes")
    ks = _keys(spark, path)
    assert 0 not in ks and 8 not in ks and len(ks) == 38


def test_mor_delete_null_partition(spark, tmp_path):
    """NULL partitions are first-class for MoR deletes too: the delete
    file lands under the encoded-'null' prefix and the NULL partition's
    rows disappear from reads."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "a", 30)],
        "k long, day string, v long",
    )
    sinks.merge_upsert_manifest(spark, df, path, keys=["k"], partition_col="day")
    r = sinks.delete_manifest_rows(spark, path, [("k", "=", 1)], mode="mor")
    assert r["delete_files_written"] == 1
    assert _keys(spark, path) == [2, 3]
    assert sinks.read_manifest(path)["partitions"]["null"]["deletes"]


def test_mor_delete_rebase_conflicts_with_same_partition_merge(
    spark, tmp_path, monkeypatch
):
    """A MoR delete racing a merge that rewrote the same partition must
    conflict: the delete's positions reference the partition's OLD files,
    which the winner just replaced — committing them would corrupt the
    new prefix's row set."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=40, parts=4)

    def competitor():
        sinks.merge_upsert_manifest(
            spark,
            spark.createDataFrame([(200, 0, 0)], "k long, day long, v long"),
            path,
            keys=["k"],
            partition_col="day",
        )

    _inject_race(monkeypatch, competitor)
    with pytest.raises(sinks.ConcurrentWriteError):
        sinks.delete_manifest_rows(spark, path, [("k", "=", 4)], mode="mor")
    # recovery: re-run against the current table
    r = sinks.delete_manifest_rows(spark, path, [("k", "=", 4)], mode="mor")
    assert r["deleted"] == 1
    ks = _keys(spark, path)
    assert 4 not in ks and 200 in ks


def test_mor_delete_rebases_over_disjoint_writer(spark, tmp_path, monkeypatch):
    """A MoR delete racing a merge on a DIFFERENT partition rebases and
    commits — both effects land."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=40, parts=4)

    def competitor():
        sinks.merge_upsert_manifest(
            spark,
            spark.createDataFrame([(201, 1, 0)], "k long, day long, v long"),
            path,
            keys=["k"],
            partition_col="day",
        )

    _inject_race(monkeypatch, competitor)
    r = sinks.delete_manifest_rows(
        spark, path, [("k", "=", 4)], partition_values=[0], mode="mor"
    )
    assert r["deleted"] == 1
    ks = _keys(spark, path)
    assert 4 not in ks and 201 in ks


def test_mor_replay_idempotent_delete(spark, tmp_path):
    """Re-running the same MoR delete after it committed is a no-op commit
    (zero matches on live rows) — the idempotence the incremental replay
    contract needs."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=40, parts=4)
    sinks.delete_manifest_rows(spark, path, [("k", "<", 5)], mode="mor")
    v = sinks.manifest_versions(path)[-1]
    r = sinks.delete_manifest_rows(spark, path, [("k", "<", 5)], mode="mor")
    assert r["deleted"] == 0 and r["delete_files_written"] == 0
    assert sinks.manifest_versions(path)[-1] == v  # nothing to commit


def test_legacy_two_segment_delete_files_still_apply(spark, tmp_path):
    """On-disk compat (round-7 review): delete files written by the
    pre-fused-write code store 2-segment '<snap>/<basename>' ids and no
    'ids' marker. The reader must upgrade them (prepend the partition
    dir) instead of silently resurrecting the deleted rows."""
    import json

    path = str(tmp_path / "t")
    _mk(spark, path, n=40, parts=4)

    # write the delete the ROUND-6 way: 2-segment file ids
    real = sinks._file_id

    def legacy_id():
        parts = F.split(F.col("_metadata.file_path"), "/")
        return F.concat_ws(
            "/", F.element_at(parts, -2), F.element_at(parts, -1)
        )

    sinks._file_id = legacy_id
    try:
        r = sinks.delete_manifest_rows(
            spark, path, [("k", "<", 8)], mode="mor"
        )
    finally:
        sinks._file_id = real
    assert r["deleted"] == 8
    # strip the ids marker the modern writer stamped — legacy records
    # had none
    versions = sinks.manifest_versions(path)
    cpath = os.path.join(path, "_commits", f"v{versions[-1]:08d}.json")
    m = json.load(open(cpath))
    for e in m["partitions"].values():
        for d in e.get("deletes") or ():
            d.pop("ids", None)
    json.dump(m, open(cpath, "w"))

    # the legacy deletes still apply exactly
    assert _keys(spark, path) == list(range(8, 40))
    assert sinks.manifest_count(spark, path)["count"] == 32
    # overlapping NEW delete (3-segment) coexists with the legacy one
    assert sinks.delete_manifest_rows(
        spark, path, [("k", "<", 10)], mode="mor"
    )["deleted"] == 2
    assert _keys(spark, path) == list(range(10, 40))
    # a rewrite folds BOTH delete generations without resurrection
    sinks.compact_manifest(spark, path)
    assert _keys(spark, path) == list(range(10, 40))
    assert not any(
        e.get("deletes") for e in sinks.read_manifest(path)["partitions"].values()
    )
