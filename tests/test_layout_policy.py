"""Table-level layout policy (manifest_set_layout: declared bloom
columns + sort order applied by every writer) and partition-spec
evolution (repartition_manifest_table).
"""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks


def _mk(spark, path, n=400, parts=4, **kw):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % parts).alias("day"),
        (F.col("id") * 2).alias("v"),
    )
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="day", **kw
    )
    return df


def test_set_layout_round_trip_and_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    sinks.manifest_set_layout(
        spark, path, cluster_by=["v"], bloom_cols=["k"]
    )
    assert sinks.manifest_layout(path) == {
        "cluster_by": ["v"], "bloom_cols": ["k"]
    }
    hist = sinks.manifest_history(path)
    assert hist[-1]["op"] == "set_layout"
    with pytest.raises(ValueError, match="not in the table schema"):
        sinks.manifest_set_layout(spark, path, bloom_cols=["nope"])
    # wholesale replacement: clearing is explicit
    sinks.manifest_set_layout(spark, path, cluster_by=[], bloom_cols=[])
    assert sinks.manifest_layout(path) == {"cluster_by": [], "bloom_cols": []}


def test_merge_applies_layout_blooms(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _mk(spark, path)  # no bloom_cols passed
    m = sinks.read_manifest(path)
    assert not any(e.get("blooms") for e in m["partitions"].values())
    sinks.manifest_set_layout(spark, path, bloom_cols=["k"])
    up = df.filter(F.col("k") < 2).withColumn("v", F.lit(0).cast("long"))
    sinks.merge_upsert_manifest(
        spark, up, path, keys=["k"], partition_col="day"
    )
    m = sinks.read_manifest(path)
    # touched partitions (day 0, 1) now carry the policy's blooms
    assert sorted(
        k for k, e in m["partitions"].items() if e.get("blooms")
    ) == ["0", "1"]
    assert list(m["partitions"]["0"]["blooms"]) == ["k"]
    # and the bloom answers lookups
    r = sinks.manifest_bloom_lookup(spark, path, "k", [0])
    assert "0" in r["maybe"] and set(r["no_bloom"]) == {"2", "3"}


def test_compact_defaults_to_layout_and_backfills_blooms(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=2000)
    sinks.manifest_set_layout(
        spark, path, cluster_by=["v"], bloom_cols=["k"]
    )
    res = sinks.compact_manifest(spark, path, target_file_bytes=2048)
    assert res["partitions"] == 4
    m = sinks.read_manifest(path)
    # every partition gained the declared blooms without any writer flag
    assert all(
        list(e.get("blooms") or []) == ["k"] for e in m["partitions"].values()
    )
    # and the declared clustering makes per-file v-bounds prune
    from f1_data_pipeline_spark.operators import metadata_tables as mt

    all_files = mt.manifest_files_df(spark, path).filter(
        F.col("content") == "data"
    )
    pruned = mt.manifest_files_df(spark, path, predicates=[("v", "=", 42)])
    assert 0 < pruned.count() < all_files.count()


def test_repartition_to_bucket_spec(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _mk(spark, path, n=300, parts=3, bloom_cols=["k"])
    before = sinks.read_manifest_table(spark, path).orderBy("k").collect()
    v_old = sinks.read_manifest(path)["version"]
    res = sinks.repartition_manifest_table(spark, path, "bucket(8, k)")
    assert res == {"partitions_before": 3, "partitions_after": 8, "rows": 300}
    m = sinks.read_manifest(path)
    assert m["partition_col"] == "bucket(8, k)" and len(m["partitions"]) == 8
    # identical content, new layout
    after = sinks.read_manifest_table(spark, path).orderBy("k").collect()
    assert after == before
    # bloom coverage carried over from the old entries
    assert all(
        list(e.get("blooms") or []) == ["k"] for e in m["partitions"].values()
    )
    # point lookup now prunes through the bucket transform
    kept = sinks._transform_prune(
        spark, m, dict(m["partitions"]), [("k", "=", 123)]
    )
    assert len(kept) == 1
    got = sinks.read_manifest_table(spark, path, predicates=[("k", "=", 123)])
    assert [r.v for r in got.collect()] == [246]
    # time travel still reads the OLD layout
    old = sinks.read_manifest_table(spark, path, version=v_old)
    assert old.count() == 300
    assert sinks.read_manifest(path, v_old)["partition_col"] == "day"
    # history shows the verb
    assert sinks.manifest_history(path)[-1]["op"] == "repartition"
    # the change feed across a pure relayout is EMPTY
    ch = sinks.manifest_row_changes(
        spark, path, keys=["k"], from_version=v_old
    )
    assert ch.count() == 0
    # further DML works against the new spec
    up = spark.createDataFrame([(123, 1, -1)], "k long, day long, v long")
    sinks.merge_upsert_manifest(
        spark, up, path, keys=["k"], partition_col="bucket(8, k)"
    )
    got = sinks.read_manifest_table(spark, path, predicates=[("k", "=", 123)])
    assert [r.v for r in got.collect()] == [-1]


def test_sort_on_write_prunes_without_compaction(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=50)  # create, then declare the layout
    sinks.manifest_set_layout(
        spark, path, cluster_by=["v"], bloom_cols=[],
        sort_on_write=True, sort_files=4,
    )
    big = spark.range(4000).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("day"),
        # shuffle v so arrival order is NOT sorted
        ((F.col("id") * 2654435761) % 8000).alias("v"),
    )
    sinks.merge_upsert_manifest(
        spark, big, path, keys=["k"], partition_col="day"
    )
    m = sinks.read_manifest(path)
    # sort_files files per partition, each covering a tight v range
    for e in m["partitions"].values():
        assert len(e["files"]) == 4
    from f1_data_pipeline_spark.operators import metadata_tables as mt

    allf = mt.manifest_files_df(spark, path).filter(F.col("content") == "data")
    pruned = mt.manifest_files_df(spark, path, predicates=[("v", "=", 42)])
    # fresh merge output already prunes — no compaction needed
    assert pruned.count() <= allf.count() / 2
    got = sinks.read_manifest_table(spark, path, predicates=[("v", "=", 42)])
    assert got.count() == big.filter("v = 42").count()
    with pytest.raises(ValueError, match="needs cluster_by"):
        sinks.manifest_set_layout(spark, path, sort_on_write=True)


def test_parse_predicates(spark, tmp_path):
    import datetime as dt

    p = sinks.parse_predicates(
        "ts >= timestamp'2024-03-05 10:00:00' AND k = 5 AND "
        "name = 'o''brien AND sons' AND d <= date'2024-01-02' AND ok = TRUE"
    )
    assert p == [
        ("ts", ">=", dt.datetime(2024, 3, 5, 10, 0)),
        ("k", "=", 5),
        ("name", "=", "o'brien AND sons"),
        ("d", "<=", dt.date(2024, 1, 2)),
        ("ok", "=", True),
    ]
    assert sinks.parse_predicates(["a > 1.5", "b = 'x'"]) == [
        ("a", ">", 1.5), ("b", "=", "x"),
    ]
    # round 7: IN and BETWEEN are supported pruning shapes
    assert sinks.parse_predicates("a IN (1, 2, 'x')") == [
        ("a", "in", (1, 2, "x")),
    ]
    assert sinks.parse_predicates("a BETWEEN 1 AND 2 AND b = 3") == [
        ("a", ">=", 1), ("a", "<=", 2), ("b", "=", 3),
    ]
    for bad in ("a = b", "NOT a = 1", "a IN ()", "a OR b"):
        with pytest.raises(ValueError):
            sinks.parse_predicates(bad)
    # round 13: a quoted literal whose interior holds an unescaped quote
    # is NOT one string — `day = 'a' OR day = 'b'` used to silently
    # parse as day = "a' OR day = 'b" and PRUNE against that junk value
    with pytest.raises(ValueError, match="interior quote"):
        sinks.parse_predicates("day = 'a' OR day = 'b'")
    # round 13: allow_or parses one level of disjunction
    assert sinks.parse_predicates(
        "day = 'a' OR day = 'b'", allow_or=True
    ) == [(None, "or", ((("day", "=", "a"),), (("day", "=", "b"),)))]
    assert sinks.parse_predicates(
        "k = 5 AND (day = 'a' OR v > 2)", allow_or=True
    ) == [
        ("k", "=", 5),
        (None, "or", ((("day", "=", "a"),), (("v", ">", 2),))),
    ]
    with pytest.raises(ValueError):  # nested OR stays out of the grammar
        sinks.parse_predicates("a = 1 OR (b = 2 OR c = 3)", allow_or=True)
    # end to end: the parsed form drives the pruning readers
    path = str(tmp_path / "t")
    _mk(spark, path)
    got = sinks.read_manifest_table(
        spark, path, predicates=sinks.parse_predicates("k = 7 AND v >= 0")
    )
    assert [r.k for r in got.collect()] == [7]


def test_repartition_same_spec_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    with pytest.raises(ValueError, match="already partitioned"):
        sinks.repartition_manifest_table(spark, path, "day")


def test_merge_racing_repartition_refuses(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    df = _mk(spark, path)
    real = sinks._commit_manifest
    state = {"armed": True}

    def racing(p, manifest):
        if state["armed"]:
            state["armed"] = False
            sinks.repartition_manifest_table(spark, path, "bucket(4, k)")
        return real(p, manifest)

    monkeypatch.setattr(sinks, "_commit_manifest", racing)
    up = df.filter(F.col("k") == 1).withColumn("v", F.lit(0).cast("long"))
    with pytest.raises(sinks.ConcurrentWriteError, match="repartitioned"):
        sinks.merge_upsert_manifest(
            spark, up, path, keys=["k"], partition_col="day"
        )
    # the table is intact under the NEW spec; the merge never landed
    m = sinks.read_manifest(path)
    assert m["partition_col"] == "bucket(4, k)"
    assert sinks.read_manifest_table(spark, path).count() == 400
