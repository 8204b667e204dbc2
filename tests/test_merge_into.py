"""Conditional MERGE INTO (full Delta/Iceberg clause surface) on
manifest tables: WHEN MATCHED [AND cond] UPDATE/DELETE, WHEN NOT MATCHED
[AND cond] INSERT, WHEN NOT MATCHED BY SOURCE DELETE/UPDATE.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks


def _mk(spark, path, n=100, parts=4):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % parts).alias("day"),
        (F.col("id") * 2).alias("v"),
    )
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="day"
    )
    return df


def _rows(spark, path):
    return {
        r.k: (r.day, r.v)
        for r in sinks.read_manifest_table(spark, path).collect()
    }


def test_default_clauses_equal_plain_upsert(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    df = _mk(spark, p1)
    _mk(spark, p2)
    up = spark.createDataFrame(
        [(1, 1, 111), (200, 0, 400)], "k long, day long, v long"
    )
    sinks.merge_upsert_manifest(spark, up, p1, keys=["k"], partition_col="day")
    stats = sinks.merge_into_manifest(spark, up, p2, keys=["k"])
    assert stats["updated"] == 1 and stats["inserted"] == 1
    # examined = day-0/1 partitions (50 rows); 49 kept untouched
    assert stats["unchanged"] == 49
    assert _rows(spark, p1) == _rows(spark, p2)


def test_matched_condition_only_if_newer(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    up = spark.createDataFrame(
        [(1, 1, 999), (2, 2, 1)], "k long, day long, v long"
    )
    stats = sinks.merge_into_manifest(
        spark, up, path, keys=["k"],
        when_matched=[("update", "s.v > t.v", "all")],
    )
    assert stats["updated"] == 1 and stats["unchanged"] >= 1
    rows = _rows(spark, path)
    assert rows[1] == (1, 999)  # 999 > 2 → updated
    assert rows[2] == (2, 4)  # 1 < 4 → clause condition false → kept


def test_matched_delete_clause(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    up = spark.createDataFrame([(5, 1), (6, 2)], "k long, day long")
    stats = sinks.merge_into_manifest(
        spark, up, path, keys=["k"],
        when_matched="delete", when_not_matched=None,
    )
    assert stats["deleted"] == 2 and stats["inserted"] == 0
    rows = _rows(spark, path)
    assert 5 not in rows and 6 not in rows and len(rows) == 98


def test_clause_order_first_match_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    # delete when the source flags it, else additive update
    up = spark.createDataFrame(
        [(1, 1, 10, True), (2, 2, 10, False)],
        "k long, day long, v long, del boolean",
    )
    with pytest.raises(ValueError, match="columns the table lacks"):
        sinks.merge_into_manifest(spark, up, path, keys=["k"])
    stats = sinks.merge_into_manifest(
        spark, up.drop("del"), path, keys=["k"],
        when_matched=[
            ("delete", "s.v >= t.v * 5"),
            ("update", None, {"v": "t.v + s.v"}),
        ],
    )
    # k=1: t.v=2, s.v=10 ≥ 10 → delete; k=2: t.v=4, 10 < 20 → update
    assert stats["deleted"] == 1 and stats["updated"] == 1
    rows = _rows(spark, path)
    assert 1 not in rows and rows[2] == (2, 14)


def test_partial_update_assignments_keep_other_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    up = spark.createDataFrame([(3, 3, 0)], "k long, day long, v long")
    sinks.merge_into_manifest(
        spark, up, path, keys=["k"],
        when_matched=[("update", None, {"v": "s.v + 100"})],
        when_not_matched=None,
    )
    assert _rows(spark, path)[3] == (3, 100)


def test_insert_condition_filters_source(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    up = spark.createDataFrame(
        [(500, 0, 1), (501, 1, -1)], "k long, day long, v long"
    )
    stats = sinks.merge_into_manifest(
        spark, up, path, keys=["k"], when_matched=None,
        when_not_matched=[("insert", "s.v > 0")],
    )
    assert stats["inserted"] == 1 and stats["unchanged"] >= 1
    rows = _rows(spark, path)
    assert 500 in rows and 501 not in rows


def test_by_source_delete_scoped_sync(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=40, parts=4)
    # today's feed for day=1 only holds keys 1 and 5 → other day-1 rows
    # are stale and must go; day 0/2/3 untouched
    feed = spark.createDataFrame(
        [(1, 1, 2), (5, 1, 10), (101, 1, 7)], "k long, day long, v long"
    )
    stats = sinks.merge_into_manifest(
        spark, feed, path, keys=["k"],
        when_not_matched_by_source="delete", by_source_scope=[1],
    )
    day1_keys = {1, 5, 101}
    rows = _rows(spark, path)
    have_day1 = {k for k, (d, _) in rows.items() if d == 1}
    assert have_day1 == day1_keys
    assert stats["deleted_by_source"] == 8  # 10 day-1 rows - kept 2
    # out-of-scope partitions intact
    assert {k for k, (d, _) in rows.items() if d == 0} == {0, 4, 8, 12, 16,
                                                          20, 24, 28, 32, 36}


def test_by_source_update_marks_stale(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=8, parts=2)
    feed = spark.createDataFrame([(0, 0, 0)], "k long, day long, v long")
    stats = sinks.merge_into_manifest(
        spark, feed, path, keys=["k"], when_matched=None,
        when_not_matched=None,
        when_not_matched_by_source=[("update", None, {"v": "-1"})],
        by_source_scope=[0],
    )
    assert stats["updated_by_source"] == 3
    rows = _rows(spark, path)
    assert rows[0] == (0, 0) and rows[2] == (0, -1) and rows[1] == (1, 2)


def test_by_source_update_requires_explicit_assignments(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=8, parts=2)
    feed = spark.createDataFrame([(0, 0, 0)], "k long, day long, v long")
    # "all" would read columns from a NULL source struct — a silent no-op
    with pytest.raises(ValueError, match="needs a dict of"):
        sinks.merge_into_manifest(
            spark, feed, path, keys=["k"], when_matched=None,
            when_not_matched=None,
            when_not_matched_by_source="update", by_source_scope=[0],
        )


def test_emptied_partition_drops(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=8, parts=2)
    feed = spark.createDataFrame([], "k long, day long, v long")
    sinks.merge_into_manifest(
        spark, feed, path, keys=["k"], when_matched=None,
        when_not_matched=None,
        when_not_matched_by_source="delete", by_source_scope=[1],
    )
    m = sinks.read_manifest(path)
    assert sorted(m["partitions"]) == ["0"]


def test_unchanged_partitions_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=100, parts=4)
    before = {
        k: e["prefix"] for k, e in sinks.read_manifest(path)["partitions"].items()
    }
    up = spark.createDataFrame([(1, 1, 999)], "k long, day long, v long")
    stats = sinks.merge_into_manifest(spark, up, path, keys=["k"])
    after = {
        k: e["prefix"] for k, e in sinks.read_manifest(path)["partitions"].items()
    }
    assert stats["partitions_rewritten"] == 1
    assert after["1"] != before["1"]
    assert {k: v for k, v in after.items() if k != "1"} == {
        k: v for k, v in before.items() if k != "1"
    }
    # a merge where no clause fires rewrites nothing and commits nothing
    v = sinks.read_manifest(path)["version"]
    noop = sinks.merge_into_manifest(
        spark, up, path, keys=["k"],
        when_matched=[("update", "s.v > t.v", "all")], when_not_matched=None,
    )
    assert noop["partitions_rewritten"] == 0
    assert sinks.read_manifest(path)["version"] == v


def test_ambiguous_source_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    up = spark.createDataFrame(
        [(1, 1, 10), (1, 1, 20)], "k long, day long, v long"
    )
    with pytest.raises(ValueError, match="multiple rows per"):
        sinks.merge_into_manifest(spark, up, path, keys=["k"])


def test_update_may_not_move_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    with pytest.raises(ValueError, match="may not assign the partition"):
        sinks.merge_into_manifest(
            spark,
            spark.createDataFrame([(1, 2, 0)], "k long, day long, v long"),
            path, keys=["k"],
            when_matched=[("update", None, {"day": "s.day"})],
        )
    # "all" assignment carrying a different partition value for a matched
    # key is caught at runtime (k=1 lives in day 1, source says day 2 —
    # the spanning-keys guard refuses before anything is written)
    up = spark.createDataFrame([(1, 2, 0)], "k long, day long, v long")
    with pytest.raises(ValueError):
        sinks.merge_into_manifest(spark, up, path, keys=["k"])
    assert _rows(spark, path)[1] == (1, 2)


def test_matched_without_source_partition_column(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=20, parts=4)
    # source carries only (key, v): matched clauses must find the key
    # wherever it lives (whole-table examination)
    up = spark.createDataFrame([(7, 700)], "k long, v long")
    stats = sinks.merge_into_manifest(
        spark, up, path, keys=["k"],
        when_matched=[("update", None, {"v": "s.v"})],
        when_not_matched=None,
    )
    assert stats["updated"] == 1
    assert _rows(spark, path)[7] == (3, 700)
    # INSERT clauses need a partition → loud error
    with pytest.raises(ValueError, match="lacks the partition source"):
        sinks.merge_into_manifest(spark, up, path, keys=["k"])


def test_update_all_narrow_source_keeps_target_columns(spark, tmp_path):
    """UPDATE 'all' with a source narrower than the table: columns the
    source doesn't carry keep the TARGET's value — including the
    partition source column, so the row neither loses data columns to
    NULL nor vanishes by recomputing a NULL partition (round-5 advice:
    silent row loss when src lacked the partition column)."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=20, parts=4)
    before = _rows(spark, path)
    # no `day` (partition source) and no... table is (k, day, v); drop day
    up = spark.createDataFrame([(7, 700), (9, 900)], "k long, v long")
    stats = sinks.merge_into_manifest(
        spark, up, path, keys=["k"],
        when_matched="update", when_not_matched=None,
    )
    assert stats["updated"] == 2
    rows = _rows(spark, path)
    assert len(rows) == 20  # no silent row loss
    assert rows[7] == (before[7][0], 700)  # day kept, v updated
    assert rows[9] == (before[9][0], 900)
    for k in rows:
        if k not in (7, 9):
            assert rows[k] == before[k]


def test_update_all_narrow_source_keeps_data_columns(spark, tmp_path):
    """Source carries the key + partition but NOT every data column:
    'all' must not null the absent columns (Delta errors on UPDATE SET *
    here; we keep t.<col>, which is strictly safer than the old silent
    NULL overwrite)."""
    path = str(tmp_path / "t")
    df = spark.range(12).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("day"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("n"), F.col("id")).alias("note"),
    )
    sinks.merge_upsert_manifest(spark, df, path, keys=["k"], partition_col="day")
    up = spark.createDataFrame([(4, 1, 444)], "k long, day long, v long")
    stats = sinks.merge_into_manifest(
        spark, up, path, keys=["k"],
        when_matched="update", when_not_matched=None,
    )
    assert stats["updated"] == 1
    got = {
        r.k: (r.day, r.v, r.note)
        for r in sinks.read_manifest_table(spark, path).collect()
    }
    assert got[4] == (1, 444, "n4")  # note kept, not nulled


def test_cdc_sees_conditional_merge(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=12, parts=2)
    up = spark.createDataFrame(
        [(0, 0, 999), (100, 0, 1)], "k long, day long, v long"
    )
    sinks.merge_into_manifest(
        spark, up, path, keys=["k"],
        when_matched=[("update", None, "all"), ],
    )
    ch = sinks.manifest_row_changes(spark, path, keys=["k"], from_version=1)
    kinds = {(r.k, r["_change"]) for r in ch.collect()}
    assert (100, "insert") in kinds
    assert (0, "update_postimage") in kinds


def test_constraints_enforced_on_merge_into(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    sinks.manifest_add_constraint(spark, path, "v_nonneg", "v >= 0")
    bad = spark.createDataFrame([(1, 1, -5)], "k long, day long, v long")
    with pytest.raises(sinks.ConstraintViolationError):
        sinks.merge_into_manifest(spark, bad, path, keys=["k"])
    assert _rows(spark, path)[1] == (1, 2)
