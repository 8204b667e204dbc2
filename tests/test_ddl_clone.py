"""Column DDL (metadata-only ADD/DROP COLUMN with a dropped-name type
ledger) and zero-copy table clone.
"""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks


def _mk(spark, path, n=100, parts=4, **kw):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % parts).alias("day"),
        (F.col("id") * 2).alias("v"),
    )
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="day", **kw
    )
    return df


def _data_files(path):
    return sorted(glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                            recursive=True))


def test_add_column_metadata_only(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    before = _data_files(path)
    sinks.manifest_add_column(spark, path, "score", "double")
    assert _data_files(path) == before  # no data rewritten
    got = sinks.read_manifest_table(spark, path)
    assert got.columns == ["k", "day", "v", "score"]
    assert got.filter(F.col("score").isNotNull()).count() == 0
    assert sinks.manifest_history(path)[-1]["op"] == "add_column"
    # a merge can now fill it
    up = spark.createDataFrame([(1, 1, 2, 0.5)],
                               "k long, day long, v long, score double")
    sinks.merge_upsert_manifest(spark, up, path, keys=["k"],
                                partition_col="day")
    assert sinks.read_manifest_table(spark, path).filter(
        "score is not null").count() == 1
    with pytest.raises(ValueError, match="already exists"):
        sinks.manifest_add_column(spark, path, "score", "double")


def test_drop_column_metadata_only_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    v1 = sinks.read_manifest(path)["version"]
    before = _data_files(path)
    sinks.manifest_drop_column(spark, path, "v")
    assert _data_files(path) == before
    got = sinks.read_manifest_table(spark, path)
    assert got.columns == ["k", "day"]
    assert got.count() == 100
    # the old version still carries it (schema is versioned with data)
    old = sinks.read_manifest_table(spark, path, version=v1)
    assert "v" in old.columns and old.filter("v = 198").count() == 1
    assert sinks.manifest_history(path)[-1]["op"] == "drop_column"


def test_drop_guards(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    with pytest.raises(ValueError, match="partition source"):
        sinks.manifest_drop_column(spark, path, "day")
    sinks.manifest_set_layout(spark, path, bloom_cols=["k"])
    with pytest.raises(ValueError, match="layout"):
        sinks.manifest_drop_column(spark, path, "k")
    sinks.manifest_set_layout(spark, path, bloom_cols=[])
    sinks.manifest_add_constraint(spark, path, "v_ok", "v >= 0")
    with pytest.raises(ValueError, match="CHECK constraints"):
        sinks.manifest_drop_column(spark, path, "v")
    with pytest.raises(ValueError, match="no column"):
        sinks.manifest_drop_column(spark, path, "nope")


def test_dropped_name_type_ledger(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    sinks.manifest_drop_column(spark, path, "v")  # physical bigint remains
    # incompatible re-add would make old prefixes unreadable → refused
    with pytest.raises(ValueError, match="previously dropped"):
        sinks.manifest_add_column(spark, path, "v", "string")
    # identical type is fine — and old rows RESURFACE their stored values
    # (name-based reads; this is the documented shallow-drop semantics)
    sinks.manifest_add_column(spark, path, "v", "bigint")
    got = sinks.read_manifest_table(spark, path)
    assert got.filter("v = 198").count() == 1
    # the ledger entry was consumed: dropping + re-adding again still works
    sinks.manifest_drop_column(spark, path, "v")
    sinks.manifest_add_column(spark, path, "v", "bigint")


def test_clone_zero_copy_and_independent(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = _mk(spark, src, bloom_cols=["k"])
    sinks.delete_manifest_rows(spark, src, [("k", "=", 7)], mode="mor")
    want = sinks.read_manifest_table(spark, src).orderBy("k").collect()
    res = sinks.clone_manifest_table(src, dst)
    assert res["version"] == 1 and res["partitions"] == 4
    got = sinks.read_manifest_table(spark, dst).orderBy("k").collect()
    assert got == want  # MoR deletes honored in the clone
    # zero-copy: linked files share inodes
    s = _data_files(src)[0]
    d = os.path.join(dst, os.path.relpath(s, src))
    assert os.stat(s).st_ino == os.stat(d).st_ino
    # blooms carried: point lookup prunes on the clone
    r = sinks.manifest_bloom_lookup(spark, dst, "k", [3])
    assert r["pruned"]
    # independence: divergent writes
    up = spark.createDataFrame([(1000, 0, 1)], "k long, day long, v long")
    sinks.merge_upsert_manifest(spark, up, dst, keys=["k"],
                                partition_col="day")
    assert sinks.read_manifest_table(spark, src).count() == 99
    assert sinks.read_manifest_table(spark, dst).count() == 100
    sinks.delete_manifest_rows(spark, src, [("day", "=", 1)])
    assert sinks.read_manifest_table(spark, dst).count() == 100
    assert sinks.manifest_history(dst)[0]["op"].startswith("clone:")


def test_clone_survives_source_vacuum(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = _mk(spark, src, n=40, parts=2)
    sinks.clone_manifest_table(src, dst)
    # src moves on and vacuums aggressively — every old prefix unlinked
    up = df.withColumn("v", F.col("v") + 1)
    sinks.merge_upsert_manifest(spark, up, src, keys=["k"],
                                partition_col="day")
    sinks.vacuum_manifest(src, keep_last=1, min_age_sec=0)
    # the clone's hard links keep the bytes alive
    assert sinks.read_manifest_table(spark, dst).count() == 40
    assert sinks.read_manifest_table(spark, dst).agg(
        F.max("v")).first()[0] == 78


def test_clone_of_pinned_version_and_dst_guard(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk(spark, src, n=20, parts=2)
    v1 = sinks.read_manifest(src)["version"]
    sinks.delete_manifest_rows(spark, src, [("k", "<", 10)])
    sinks.manifest_tag(src, "before-purge", v1)
    sinks.clone_manifest_table(src, dst, version="before-purge")
    assert sinks.read_manifest_table(spark, dst).count() == 20
    with pytest.raises(ValueError, match="already has a manifest"):
        sinks.clone_manifest_table(src, dst)


# --------------------------- RENAME COLUMN ---------------------------


def _mk_r(spark, path, n=40):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("day"),
        (F.col("id") * 2).alias("v"),
    )
    sinks.merge_upsert_manifest(spark, df, path, keys=["k"],
                                partition_col="day")
    return df


def test_rename_column_metadata_only(spark, tmp_path):
    """RENAME COLUMN touches no data file: reads surface the new
    logical name over old prefixes, new writes land under the pinned
    PHYSICAL name, predicates/stats/count work through the rename, and
    time travel shows the pre-rename name."""
    import glob
    import os

    t = str(tmp_path / "t")
    _mk_r(spark, t)
    v1 = sinks.read_manifest(t)["version"]
    files_before = sorted(glob.glob(os.path.join(t, "data", "*", "*", "*.parquet")))
    sinks.manifest_rename_column(spark, t, "v", "score")
    assert sorted(
        glob.glob(os.path.join(t, "data", "*", "*", "*.parquet"))
    ) == files_before  # metadata-only
    out = sinks.read_manifest_table(spark, t)
    assert out.columns == ["k", "day", "score"]
    assert out.agg(F.sum("score")).first()[0] == sum(2 * i for i in range(40))
    # writes under the new name; files carry the physical name
    up = spark.createDataFrame([(100, 0, 7)], "k long, day long, score long")
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"],
                                partition_col="day")
    newest = max(
        glob.glob(os.path.join(t, "data", "0", "snap-*", "*.parquet")),
        key=os.path.getmtime,
    )
    assert spark.read.parquet(newest).columns == ["k", "day", "v"]
    out2 = sinks.read_manifest_table(spark, t)
    assert out2.count() == 41 and out2.filter("k=100").first().score == 7
    # stats/bounds/count answer under the logical name
    assert sinks.manifest_column_bounds(t, "score")["max"] == 78
    assert sinks.manifest_count(
        spark, t, predicates=[("score", ">=", 60)]
    )["count"] == 10
    # predicate reads prune AND filter correctly
    assert sinks.read_manifest_table(
        spark, t, predicates=[("score", "=", 14)]
    ).count() == 1
    # time travel: the old snapshot keeps its own schema
    assert sinks.read_manifest_table(spark, t, version=v1).columns == \
        ["k", "day", "v"]
    # DML through the new name
    assert sinks.delete_manifest_rows(
        spark, t, [("score", "<", 10)]
    )["deleted"] == 6
    assert sinks.update_manifest_rows(
        spark, t, {"score": F.col("score") + 1000}, [("k", "=", 20)]
    )["updated"] == 1
    assert sinks.read_manifest_table(spark, t).filter("k=20").first().score \
        == 1040


def test_rename_column_chained_and_guards(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_r(spark, t, 8)
    sinks.manifest_rename_column(spark, t, "v", "a1")
    sinks.manifest_rename_column(spark, t, "a1", "a2")  # chained
    m = sinks.read_manifest(t)
    import pyspark.sql.types as T
    f = T.StructType.fromJson(m["schema"])["a2"]
    assert (f.metadata or {}).get("physical") == "v"  # chases to origin
    assert sinks.read_manifest_table(spark, t).columns == ["k", "day", "a2"]
    # the freed logical names are re-addable; the physical name is not
    sinks.manifest_add_column(spark, t, "a1", "string")
    with pytest.raises(ValueError, match="physical"):
        sinks.manifest_add_column(spark, t, "v", "string")
    with pytest.raises(ValueError, match="partition source"):
        sinks.manifest_rename_column(spark, t, "day", "d2")
    with pytest.raises(ValueError, match="already exists"):
        sinks.manifest_rename_column(spark, t, "k", "a2")
    with pytest.raises(ValueError, match="no column"):
        sinks.manifest_rename_column(spark, t, "ghost", "g2")
    # layout over a renamed column is refused (physical resolution)
    with pytest.raises(ValueError, match="renamed"):
        sinks.manifest_set_layout(spark, t, bloom_cols=["a2"])


def test_rename_column_cdc_window_no_spurious_updates(spark, tmp_path):
    """A rename inside a CDC window must NOT flag unchanged rows: the
    old side conforms through the pinned physical name."""
    t = str(tmp_path / "t")
    _mk_r(spark, t, 12)
    v1 = sinks.read_manifest(t)["version"]
    sinks.manifest_rename_column(spark, t, "v", "score")
    up = spark.createDataFrame([(3, 3, 999)], "k long, day long, score long")
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"],
                                partition_col="day")
    ch = sinks.manifest_row_changes(spark, t, ["k"], v1)
    rows = {(r.k, r._change) for r in ch.collect()}
    assert rows == {(3, "update_postimage")}  # only the real change


def test_rename_column_constraint_guard_and_bloom_continuity(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_r(spark, t, 20)
    sinks.manifest_add_constraint(spark, t, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        sinks.manifest_rename_column(spark, t, "v", "score")
    sinks.manifest_drop_constraint(spark, t, "v_pos")
    # pre-rename bloom sidecars keep pruning under the new logical name
    sinks.manifest_set_layout(spark, t, bloom_cols=["v"])
    sinks.compact_manifest(spark, t)  # backfills blooms on all partitions
    sinks.manifest_set_layout(spark, t, bloom_cols=[])  # free the name
    sinks.manifest_rename_column(spark, t, "v", "score")
    r = sinks.read_manifest_table(spark, t, predicates=[("score", "=", 38)])
    assert [x.k for x in r.collect()] == [19]
