"""Partition-aligned rollup refresh over a HIDDEN-partitioned source:
group on the derived transform value ((name, spec) group entry)."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import matview as MV
from f1_data_pipeline_spark.operators import sinks

AGGS = {"n": ("count", "*"), "sum_v": ("sum", "v")}


def _events(spark, lo, hi):
    base = dt.datetime(2024, 5, 1)
    rows = [
        (i, base + dt.timedelta(hours=(i % 72)), f"c{i % 3}", float(i))
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "id long, ts timestamp, cat string, v double"
    )


def _expected(spark, src_path):
    return {
        (r.day, r.cat): (r.n, r.sum_v)
        for r in sinks.read_manifest_table(spark, src_path)
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), F.col("cat")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    }


def _got(spark, tgt):
    return {
        (r.day, r.cat): (r.n, r.sum_v)
        for r in sinks.read_manifest_table(spark, tgt).collect()
    }


def test_rollup_over_days_transform(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    sinks.merge_upsert_manifest(
        spark, _events(spark, 0, 144), src, keys=["id"],
        partition_col="days(ts)",
    )
    r = MV.refresh_rollup(
        spark, src, tgt, [("day", "days(ts)"), "cat"], AGGS
    )
    assert r["partitions_refreshed"] == 3
    assert _got(spark, tgt) == _expected(spark, src)
    # target is identity-partitioned by the materialized day
    assert sinks.read_manifest(tgt)["partition_col"] == "day"

    # an increment touching ONE day refreshes one partition
    inc = _events(spark, 1000, 1010).withColumn(
        "ts", F.lit(dt.datetime(2024, 5, 2, 12, 0))
    )
    sinks.merge_upsert_manifest(
        spark, inc, src, keys=["id"], partition_col="days(ts)"
    )
    r = MV.refresh_rollup(
        spark, src, tgt, [("day", "days(ts)"), "cat"], AGGS
    )
    assert r["partitions_refreshed"] == 1
    assert _got(spark, tgt) == _expected(spark, src)
    # and a no-op refresh stays a no-op
    assert MV.refresh_rollup(
        spark, src, tgt, [("day", "days(ts)"), "cat"], AGGS
    )["noop"]


def test_spec_group_entry_validation(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    sinks.merge_upsert_manifest(
        spark, _events(spark, 0, 24), src, keys=["id"],
        partition_col="days(ts)",
    )
    with pytest.raises(ValueError, match="hidden-partitioned"):
        MV.refresh_rollup(spark, src, tgt, ["cat"], AGGS)
    with pytest.raises(ValueError, match="hidden-partitioned"):
        MV.refresh_rollup(
            spark, src, tgt, [("day", "months(ts)"), "cat"], AGGS
        )
    with pytest.raises(ValueError, match="collides"):
        MV.refresh_rollup(
            spark, src, tgt, [("cat", "days(ts)"), "cat"], AGGS
        )
    # tuples are refused on identity-partitioned sources
    ident = str(tmp_path / "ident")
    df = _events(spark, 0, 24).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    sinks.merge_upsert_manifest(
        spark, df, ident, keys=["id"], partition_col="day"
    )
    with pytest.raises(ValueError, match="identity-partitioned"):
        MV.refresh_rollup(
            spark, ident, tgt, [("day", "days(ts)"), "cat"], AGGS
        )
