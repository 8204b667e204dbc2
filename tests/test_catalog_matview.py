"""Materialized views through the SQL console (round 10): CREATE
MATERIALIZED VIEW routes to matview.refresh_rollup with the spec
persisted in the target's app metadata; REFRESH MATERIALIZED VIEW
recomputes only changed source partitions."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import catalog as CAT
from f1_data_pipeline_spark.operators import sinks


def _seed(spark, tmp_path, n=40):
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("day"),
        (F.col("id") % 3).alias("cat"), (F.col("id") * 2.0).alias("v"),
    )
    sinks.merge_upsert_manifest(spark, df, t, keys=["k"],
                                partition_col="day")
    CAT.catalog_create_table(cat, "src", t)
    return cat, t


def _mv_rows(spark, cat):
    return sorted(
        tuple(r) for r in CAT.catalog_sql(
            spark, cat, "SELECT day, cat, n, total FROM mv"
        ).collect()
    )


def _want_rows(spark, cat):
    return sorted(
        tuple(r) for r in CAT.catalog_sql(
            spark, cat,
            "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total FROM src "
            "GROUP BY day, cat",
            bucket_joins=False,
        ).collect()
    )


def test_create_and_refresh_materialized_view(spark, tmp_path):
    cat, t = _seed(spark, tmp_path)
    r = CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total "
        "FROM src GROUP BY day, cat",
    ).first()
    assert r.strategy == "initial"
    assert _mv_rows(spark, cat) == _want_rows(spark, cat)
    # the view is a cataloged manifest table (readable, DESCRIBE-able)
    assert "mv" in CAT.catalog_tables(cat)

    # no source change: refresh is a noop
    assert CAT.catalog_sql(
        spark, cat, "REFRESH MATERIALIZED VIEW mv"
    ).first().strategy == "noop"

    # change ONE source partition; refresh recomputes only it
    up = spark.createDataFrame(
        [(100, 1, 0, 999.0), (101, 1, 1, 111.0)],
        "k long, day long, cat long, v double",
    )
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"],
                                partition_col="day")
    r2 = CAT.catalog_sql(
        spark, cat, "REFRESH MATERIALIZED VIEW mv"
    ).first()
    assert r2.strategy == "incremental"
    assert r2.partitions_refreshed == 1
    assert _mv_rows(spark, cat) == _want_rows(spark, cat)

    # REFRESH of a non-MV cataloged table raises the spec error
    with pytest.raises(ValueError, match="not a SQL materialized view"):
        CAT.catalog_sql(spark, cat, "REFRESH MATERIALIZED VIEW src")
    # REFRESH of an UNKNOWN name: the catalog's FileNotFoundError, like
    # every other verb — not Spark's opaque ParseException (r10 advice)
    with pytest.raises(FileNotFoundError, match="no materialized view"):
        CAT.catalog_sql(spark, cat, "REFRESH MATERIALIZED VIEW nosuch")
    # plain REFRESH TABLE shapes still delegate to Spark's own statement
    spark.range(3).createOrReplaceTempView("rf_tmp")
    try:
        CAT.catalog_sql(spark, cat, "REFRESH TABLE rf_tmp")
    finally:
        spark.catalog.dropTempView("rf_tmp")
    # unsupported SELECT items raise loudly at CREATE
    with pytest.raises(ValueError, match="unsupported materialized-view"):
        CAT.catalog_sql(
            spark, cat,
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT day, SUM(v * 2) AS t FROM src GROUP BY day",
        )
    # name collision refused before any data lands
    with pytest.raises(ValueError, match="already exists"):
        CAT.catalog_sql(
            spark, cat,
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT day, COUNT(*) AS n FROM src GROUP BY day",
        )


def test_matview_over_hidden_partitioned_source(spark, tmp_path):
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "ev")
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 3, 1 + i % 3, i % 24), float(i))
         for i in range(60)],
        "event_id long, ts timestamp, value double",
    )
    sinks.merge_upsert_manifest(
        spark, df, t, keys=["event_id"], partition_col="days(ts)"
    )
    CAT.catalog_create_table(cat, "ev", t)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW daily AS "
        "SELECT days(ts) AS day, COUNT(*) AS n, MAX(value) AS hi "
        "FROM ev GROUP BY days(ts)",
    )
    got = sorted(
        (str(r.day), r.n, r.hi) for r in CAT.catalog_sql(
            spark, cat, "SELECT day, n, hi FROM daily"
        ).collect()
    )
    want = sorted(
        (str(r.day), r.n, r.hi)
        for r in sinks.read_manifest_table(spark, t)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("hi"))
        .collect()
    )
    assert got == want


def test_describe_shows_matview_spec(spark, tmp_path):
    cat, _ = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, COUNT(*) AS n FROM src GROUP BY day",
    )
    desc = {
        r.col_name: r.data_type
        for r in CAT.catalog_sql(spark, cat, "DESCRIBE mv").collect()
    }
    assert desc["# materialized view"] == "FROM src GROUP BY day | n=count(*)"


def test_mv_spec_lands_in_the_initial_commit(spark, tmp_path):
    """Round-10 self-review #6: the rollup spec rides the initial
    build's OWN commit (extra_app_metadata) — version 1 of the target
    already carries matview_sql, so no crash window can separate data
    from spec; a pinned catalog entry refuses REFRESH like every other
    write verb (#5)."""
    cat, _ = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, COUNT(*) AS n FROM src GROUP BY day",
    )
    tgt = CAT.catalog_tables(cat)["mv"]["path"]
    v1 = sinks.read_manifest(tgt, 1)
    assert v1["version"] == 1
    assert "matview_sql" in (v1.get("app") or {})

    # pinned (frozen) entry: REFRESH refused like DML
    CAT.catalog_sql(spark, cat, "DROP TABLE mv")
    CAT.catalog_create_table(cat, "mv", tgt, ref=1)
    with pytest.raises(ValueError, match="pinned"):
        CAT.catalog_sql(spark, cat, "REFRESH MATERIALIZED VIEW mv")


def test_create_matview_resumes_after_registration_crash(spark, tmp_path):
    """A crash between the initial build and catalog registration must
    resume cleanly: the target already carries data + spec in its own
    commit, so re-running CREATE refreshes incrementally (no double
    materialization) and completes the registration."""
    cat, t = _seed(spark, tmp_path)
    ddl = (
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, COUNT(*) AS n FROM src GROUP BY day"
    )
    CAT.catalog_sql(spark, cat, ddl)
    tgt = CAT.catalog_tables(cat)["mv"]["path"]
    # simulate the crash window: registration lost, data+spec on disk
    CAT.catalog_drop_table(cat, "mv")
    # meanwhile the source moved
    up = spark.createDataFrame(
        [(100, 1, 0, 1.0)], "k long, day long, cat long, v double"
    )
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"],
                                partition_col="day")
    r = CAT.catalog_sql(spark, cat, ddl).first()
    assert r.strategy == "incremental"  # resumed, not re-materialized
    assert "mv" in CAT.catalog_tables(cat)
    got = {r.day: r.n for r in CAT.catalog_sql(
        spark, cat, "SELECT day, n FROM mv"
    ).collect()}
    assert got == {0: 10, 1: 11, 2: 10, 3: 10}
