"""Unit tests for operators.relational on tiny inline frames."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import relational as R


def test_project_intersection_keeps_table_order(spark):
    df = spark.createDataFrame([Row(b=1, a=2, c=3)])
    out = R.project_intersection(df, ["a", "missing", "b"])
    assert out.columns == ["a", "b"]


def test_anti_join_existing(spark):
    new = spark.createDataFrame([Row(id=1), Row(id=2), Row(id=3)])
    existing = spark.createDataFrame([Row(id=2)])
    out = R.anti_join_existing(new, existing, ["id"])
    assert sorted(r.id for r in out.collect()) == [1, 3]


def test_dedup_first_explicit_order(spark):
    df = spark.createDataFrame(
        [Row(k=1, v="b", o=2), Row(k=1, v="a", o=1), Row(k=2, v="c", o=1)]
    )
    out = R.dedup_first(df, ["k"], [F.asc("o")])
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "a", 2: "c"}


def test_merge_upsert_frames_update_insert_keep(spark):
    existing = spark.createDataFrame(
        [Row(id=1, v="old1", w=10), Row(id=2, v="old2", w=20)]
    )
    updates = spark.createDataFrame([Row(id=2, v="new2"), Row(id=3, v="new3")])
    out = {r.id: (r.v, r.w) for r in R.merge_upsert_frames(existing, updates, ["id"]).collect()}
    assert out == {1: ("old1", 10), 2: ("new2", 20), 3: ("new3", None)}


def test_merge_upsert_null_update_wins(spark):
    existing = spark.createDataFrame([Row(id=1, v="old")])
    updates = spark.createDataFrame([(1, None)], "id: bigint, v: string")
    out = R.merge_upsert_frames(existing, updates, ["id"]).collect()
    assert out[0].v is None  # ON CONFLICT DO UPDATE sets nulls too


def test_merge_upsert_idempotent(spark):
    existing = spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")])
    updates = spark.createDataFrame([Row(id=2, v="B")])
    once = R.merge_upsert_frames(existing, updates, ["id"])
    twice = R.merge_upsert_frames(once, updates, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_top1_by(spark):
    df = spark.createDataFrame([Row(d="2024-01-01", id=1), Row(d="2024-02-01", id=2)])
    out = R.top1_by(df, [F.desc("d")]).collect()
    assert len(out) == 1 and out[0].id == 2
