"""SCD2 through the SQL console (round-10 verdict #4): MERGE ... APPLY
AS SCD2 [SPLICE] routes to scd2_merge/scd2_splice (operators/scd.py),
and FOR BUSINESS TIME AS OF binds the scd2_at as-of filter into the
table's view — a SQL-only user can maintain AND query a Type-2
dimension."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import catalog as CAT
from f1_data_pipeline_spark.operators import scd, sinks

T1, T2, T3 = (
    "2020-01-01 00:00:00", "2021-01-01 00:00:00", "2020-06-01 00:00:00"
)


def _mk_dim(spark, tmp_path):
    cat = str(tmp_path / "cat")
    CAT.catalog_sql(
        spark, cat,
        "CREATE TABLE dim (k BIGINT, team STRING, valid_from TIMESTAMP, "
        "valid_to TIMESTAMP, is_current BOOLEAN) "
        "PARTITIONED BY (bucket(4, k)) "
        f"LOCATION '{tmp_path / 'dim'}'",
    )
    return cat


def _batch(spark, rows, ts):
    return spark.createDataFrame(
        [(k, team) for k, team in rows], "k long, team string"
    ).withColumn("effective_ts", F.lit(ts).cast("timestamp"))


def test_scd2_merge_and_business_time_reads(spark, tmp_path):
    cat = _mk_dim(spark, tmp_path)
    _batch(spark, [(1, "red"), (2, "blue")], T1).createOrReplaceTempView(
        "b1"
    )
    r1 = CAT.catalog_sql(
        spark, cat,
        "MERGE INTO dim USING b1 APPLY AS SCD2 (KEYS (k), TS effective_ts)",
    ).first()
    assert r1.new == 2 and r1.changed == 0
    _batch(spark, [(1, "green"), (2, "blue")], T2).createOrReplaceTempView(
        "b2"
    )
    r2 = CAT.catalog_sql(
        spark, cat,
        "MERGE INTO dim USING b2 APPLY AS SCD2 (KEYS (k), TS effective_ts)",
    ).first()
    assert r2.changed == 1 and r2.unchanged == 1

    # business-time reads match scd2_at exactly
    dim_p = CAT.catalog_tables(cat)["dim"]["path"]
    for ts in (T1, T2):
        got = CAT.catalog_sql(
            spark, cat,
            "SELECT k, team FROM dim FOR BUSINESS TIME AS OF "
            f"'{ts}' ORDER BY k",
        ).collect()
        want = (
            scd.scd2_at(spark, dim_p, ts).select("k", "team").orderBy("k")
        ).collect()
        assert got == want
    at1 = {r.k: r.team for r in CAT.catalog_sql(
        spark, cat,
        f"SELECT k, team FROM dim FOR BUSINESS TIME AS OF '{T1}'",
    ).collect()}
    assert at1 == {1: "red", 2: "blue"}
    at2 = {r.k: r.team for r in CAT.catalog_sql(
        spark, cat,
        f"SELECT k, team FROM dim BUSINESS_TIME AS OF '{T2}'",
    ).collect()}
    assert at2 == {1: "green", 2: "blue"}

    # the pin composes with aggregates and joins
    n = CAT.catalog_sql(
        spark, cat,
        "SELECT COUNT(*) AS n FROM dim FOR BUSINESS TIME AS OF "
        f"'{T1}' WHERE team = 'red'",
    ).first().n
    assert n == 1
    # plain read sees ALL version rows (3: two current + one closed)
    assert CAT.catalog_sql(
        spark, cat, "SELECT COUNT(*) AS n FROM dim"
    ).first().n == 3

    # two different instants on one table raise
    with pytest.raises(ValueError, match="two different instants"):
        CAT.catalog_sql(
            spark, cat,
            f"SELECT * FROM dim FOR BUSINESS TIME AS OF '{T1}' "
            "UNION ALL SELECT * FROM dim FOR BUSINESS TIME AS OF "
            f"'{T2}'",
        )

    # EXPLAIN shows the as-of row filter, no metadata fast path
    ex = CAT.catalog_sql(
        spark, cat,
        "EXPLAIN SELECT COUNT(*) FROM dim FOR BUSINESS TIME AS OF "
        f"'{T1}'",
    ).first()
    assert ex.fast_path is None
    assert any("BUSINESS TIME" in x for x in ex.pushdown)


def test_scd2_on_late_and_splice_sql(spark, tmp_path):
    cat = _mk_dim(spark, tmp_path)
    _batch(spark, [(1, "red")], T1).createOrReplaceTempView("s1")
    CAT.catalog_sql(
        spark, cat,
        "MERGE INTO dim USING s1 APPLY AS SCD2 (KEYS (k), TS effective_ts)",
    )
    _batch(spark, [(1, "green")], T2).createOrReplaceTempView("s2")
    CAT.catalog_sql(
        spark, cat,
        "MERGE INTO dim USING s2 APPLY AS SCD2 (KEYS (k), TS effective_ts)",
    )
    # a late row refuses by default, skips with ON LATE SKIP
    _batch(spark, [(1, "white")], T3).createOrReplaceTempView("late")
    with pytest.raises(ValueError, match="OLDER than the current"):
        CAT.catalog_sql(
            spark, cat,
            "MERGE INTO dim USING late APPLY AS SCD2 "
            "(KEYS (k), TS effective_ts)",
        )
    r = CAT.catalog_sql(
        spark, cat,
        "MERGE INTO dim USING late APPLY AS SCD2 "
        "(KEYS (k), TS effective_ts, ON LATE SKIP)",
    ).first()
    assert r.late_skipped == 1

    # SPLICE lands the interior version; business-time reads see it
    r2 = CAT.catalog_sql(
        spark, cat,
        "MERGE INTO dim USING late APPLY AS SCD2 SPLICE "
        "(KEYS (k), TS effective_ts)",
    ).first()
    assert r2.touched_keys == 1 and r2.inserted == 1
    team_at = lambda ts: CAT.catalog_sql(  # noqa: E731
        spark, cat,
        f"SELECT team FROM dim FOR BUSINESS TIME AS OF '{ts}'",
    ).first().team
    assert team_at(T1) == "red"
    assert team_at(T3) == "white"
    assert team_at(T2) == "green"

    # subquery source + bad spec items raise loudly
    with pytest.raises(ValueError, match="unsupported SCD2 spec"):
        CAT.catalog_sql(
            spark, cat,
            "MERGE INTO dim USING s1 APPLY AS SCD2 (KEYS (k), BOGUS x)",
        )
    with pytest.raises(ValueError, match="requires KEYS"):
        CAT.catalog_sql(
            spark, cat,
            "MERGE INTO dim USING s1 APPLY AS SCD2 (TS effective_ts)",
        )
    r3 = CAT.catalog_sql(
        spark, cat,
        "MERGE INTO dim USING (SELECT k, team, effective_ts FROM s2) "
        "APPLY AS SCD2 (KEYS (k), TS effective_ts)",
    ).first()
    assert r3.unchanged == 1  # replaying the current version converges


def test_business_time_composes_with_storage_travel(spark, tmp_path):
    cat = _mk_dim(spark, tmp_path)
    _batch(spark, [(1, "red")], T1).createOrReplaceTempView("v1")
    CAT.catalog_sql(
        spark, cat,
        "MERGE INTO dim USING v1 APPLY AS SCD2 (KEYS (k), TS effective_ts)",
    )
    v_after_first = sinks.read_manifest(
        CAT.catalog_tables(cat)["dim"]["path"]
    )["version"]
    _batch(spark, [(1, "green")], T2).createOrReplaceTempView("v2")
    CAT.catalog_sql(
        spark, cat,
        "MERGE INTO dim USING v2 APPLY AS SCD2 (KEYS (k), TS effective_ts)",
    )
    # storage snapshot BEFORE the second merge: business time T2 still
    # answers "red" (that snapshot has no T2 version row)
    r = CAT.catalog_sql(
        spark, cat,
        f"SELECT team FROM dim VERSION AS OF {v_after_first} "
        f"FOR BUSINESS TIME AS OF '{T2}'",
    ).first()
    assert r.team == "red"
