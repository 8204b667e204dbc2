"""Catalog: name → manifest table, atomic evolution, pinned refs,
spark.sql over registered views."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import catalog as CAT
from f1_data_pipeline_spark.operators import sinks


def _mk(spark, path, n=40):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("day"),
        (F.col("id") * 2).alias("v"),
    )
    sinks.merge_upsert_manifest(spark, df, path, keys=["k"],
                                partition_col="day")


def test_create_list_drop_and_sql(spark, tmp_path):
    cat = str(tmp_path / "cat")
    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    _mk(spark, t1, 40)
    _mk(spark, t2, 10)
    CAT.catalog_create_table(cat, "facts", t1)
    CAT.catalog_create_table(cat, "dims", t2)
    assert sorted(CAT.catalog_tables(cat)) == ["dims", "facts"]
    with pytest.raises(ValueError, match="already exists"):
        CAT.catalog_create_table(cat, "facts", t2)
    with pytest.raises(FileNotFoundError):
        CAT.catalog_create_table(cat, "ghost", str(tmp_path / "nope"))

    pinned = CAT.register_catalog_views(spark, cat)
    assert set(pinned) == {"facts", "dims"}
    got = spark.sql(
        "SELECT f.day, count(*) AS n FROM facts f JOIN dims d USING (k) "
        "GROUP BY f.day ORDER BY f.day"
    ).collect()
    assert [(r.day, r.n) for r in got] == [(0, 5), (1, 5)]

    CAT.catalog_drop_table(cat, "dims")
    assert sorted(CAT.catalog_tables(cat)) == ["facts"]
    # dropping the name leaves the data
    assert sinks.read_manifest_table(spark, t2).count() == 10


def test_views_are_snapshot_pinned(spark, tmp_path):
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    _mk(spark, t, 20)
    CAT.catalog_create_table(cat, "tbl", t)
    CAT.register_catalog_views(spark, cat)
    assert spark.sql("SELECT count(*) n FROM tbl").first().n == 20
    # the table moves; the registered view does not (until re-register)
    up = spark.createDataFrame([(100, 0, 1)], "k long, day long, v long")
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"],
                                partition_col="day")
    assert spark.sql("SELECT count(*) n FROM tbl").first().n == 20
    CAT.register_catalog_views(spark, cat)
    assert spark.sql("SELECT count(*) n FROM tbl").first().n == 21


def test_pinned_ref_entry(spark, tmp_path):
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    _mk(spark, t, 20)
    v1 = sinks.read_manifest(t)["version"]
    sinks.manifest_tag(t, "release", v1)
    sinks.delete_manifest_rows(spark, t, [("k", "<", 10)])
    CAT.catalog_create_table(cat, "frozen", t, ref="release")
    assert CAT.catalog_read(spark, cat, "frozen").count() == 20
    # explicit version overrides the pin
    latest = sinks.read_manifest(t)["version"]
    assert CAT.catalog_read(spark, cat, "frozen", version=latest).count() == 10
    CAT.register_catalog_views(spark, cat)
    assert spark.sql("SELECT count(*) n FROM frozen").first().n == 20
