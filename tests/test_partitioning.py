"""Hidden partitioning (partition transforms) for manifest tables:
days/months/years/bucket/truncate specs, derived values living only in
the manifest (never in data files), transform-aware partition pruning,
and the DML verbs operating on transformed tables.
"""
from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import partitioning as P
from f1_data_pipeline_spark.operators import sinks


def test_spec_parsing_and_canonical_forms():
    assert P.parse_partition_spec("day").kind == "identity"
    t = P.parse_partition_spec("days(ts)")
    assert (t.kind, t.source, t.param) == ("days", "ts", None)
    b = P.parse_partition_spec("bucket(16,k)")
    assert (b.kind, b.source, b.param) == ("bucket", "k", 16)
    assert b.spec == "bucket(16, k)"  # canonical
    assert P.parse_partition_spec("truncate(4, s)").spec == "truncate(4, s)"
    for bad in ("days()", "bucket(k)", "bucket(0, k)", "days(1, ts)", "nope("):
        with pytest.raises(ValueError):
            P.parse_partition_spec(bad)


def _ts_df(spark, n=200):
    base = dt.datetime(2024, 3, 1, 6, 0, 0)
    rows = [
        (i, base + dt.timedelta(hours=i % 96), float(i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, v double")


def test_days_transform_layout_and_hidden_column(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _ts_df(spark)
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    m = sinks.read_manifest(path)
    # offsets 0..95h from 03-01 06:00 span 5 calendar days
    assert sorted(m["partitions"]) == [
        "2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04", "2024-03-05"
    ]
    assert m["partition_col"] == "days(ts)"
    # the derived value is NOT stored: schema and files are clean
    got = sinks.read_manifest_table(spark, path)
    assert got.columns == ["k", "ts", "v"]
    one = glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                    recursive=True)[0]
    assert spark.read.parquet(one).columns == ["k", "ts", "v"]
    assert got.count() == 200


def test_days_pruning_by_timestamp_predicate(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _ts_df(spark)
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    m = sinks.read_manifest(path)
    preds = [("ts", ">=", dt.datetime(2024, 3, 3, 0, 0, 0))]
    kept = sinks._transform_prune(spark, m, dict(m["partitions"]), preds)
    # timestamp sources keep ONE period of slack either side of the naive
    # bound (keys are UTC periods; a reader session zone can shift the
    # literal's instant by up to ±14 h) — 03-02 survives, 03-01 is pruned
    assert sorted(kept) == [
        "2024-03-02", "2024-03-03", "2024-03-04", "2024-03-05"
    ]
    # equality predicate: the day ± slack survives
    kept = sinks._transform_prune(
        spark, m, dict(m["partitions"]),
        [("ts", "=", dt.datetime(2024, 3, 2, 12, 0, 0))],
    )
    assert sorted(kept) == ["2024-03-01", "2024-03-02", "2024-03-03"]
    # a timezone-AWARE probe is exact after UTC conversion (still padded)
    ok, d = P.derive_value(
        spark, P.parse_partition_spec("days(ts)"),
        dt.datetime(2024, 3, 3, 1, 0, 0, tzinfo=dt.timezone(dt.timedelta(hours=14))),
    )
    assert (ok, d) == (True, "2024-03-02")  # UTC+14 01:00 → 03-02 11:00 UTC
    # and the pruned read returns exactly the filtered rows
    got = sinks.read_manifest_table(spark, path, predicates=preds)
    want = df.filter(F.col("ts") >= F.lit(dt.datetime(2024, 3, 3))).count()
    assert got.count() == want


def test_time_transform_utc_fixed_across_session_zones(spark, tmp_path):
    """days(ts) keys are UTC calendar days regardless of
    spark.sql.session.timeZone (Iceberg's rule): a reader session in a
    different zone recomputes identical derived values and a pruned read
    with a naive predicate never loses rows (round-5 advice: the old
    date_format path rendered in session zone, so a skewed reader could
    prune partitions that contained matching rows)."""
    path = str(tmp_path / "t")
    df = _ts_df(spark)
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    keys_utc = sorted(sinks.read_manifest(path)["partitions"])
    t = P.parse_partition_spec("days(ts)")
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        for zone in ("Pacific/Kiritimati", "America/Los_Angeles"):  # ±UTC
            spark.conf.set("spark.sql.session.timeZone", zone)
            got = sorted(
                r[0]
                for r in sinks.read_manifest_table(spark, path)
                .select(P.derived_column(t, df).alias("d"))
                .distinct()
                .collect()
            )
            assert got == keys_utc, (zone, got)
            # pruned read in the skewed session: parity with the full filter
            cut = dt.datetime(2024, 3, 3, 0, 0, 0)
            pruned = sinks.read_manifest_table(
                spark, path, predicates=[("ts", ">=", cut)]
            ).count()
            full = (
                sinks.read_manifest_table(spark, path)
                .filter(F.col("ts") >= F.lit(cut))
                .count()
            )
            assert pruned == full, zone
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_bucket_transform_point_lookup_prunes_to_one_partition(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="bucket(8, k)"
    )
    m = sinks.read_manifest(path)
    assert len(m["partitions"]) == 8
    kept = sinks._transform_prune(
        spark, m, dict(m["partitions"]), [("k", "=", 42)]
    )
    assert len(kept) == 1
    got = sinks.read_manifest_table(spark, path, predicates=[("k", "=", 42)])
    assert [(r.k, r.v) for r in got.collect()] == [(42, 126)]
    # range predicates cannot prune a hash layout — all partitions stay
    kept = sinks._transform_prune(
        spark, m, dict(m["partitions"]), [("k", ">", 400)]
    )
    assert len(kept) == 8


def test_truncate_transforms(spark, tmp_path):
    p1, p2 = str(tmp_path / "num"), str(tmp_path / "str")
    dfn = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    sinks.merge_upsert_manifest(
        spark, dfn, p1, keys=["k"], partition_col="truncate(250, v)"
    )
    m1 = sinks.read_manifest(p1)
    assert sorted(m1["partitions"]) == ["0", "250", "500", "750"]
    kept = sinks._transform_prune(
        spark, m1, dict(m1["partitions"]), [("v", "<=", 260)]
    )
    assert sorted(kept) == ["0", "250"]

    dfs = spark.createDataFrame(
        [(1, "apple"), (2, "apricot"), (3, "banana"), (4, "berry")],
        "k long, w string",
    )
    sinks.merge_upsert_manifest(
        spark, dfs, p2, keys=["k"], partition_col="truncate(2, w)"
    )
    m2 = sinks.read_manifest(p2)
    assert sorted(m2["partitions"]) == ["ap", "ba", "be"]
    kept = sinks._transform_prune(
        spark, m2, dict(m2["partitions"]), [("w", "=", "banana")]
    )
    assert sorted(kept) == ["ba"]


def test_months_years_and_null_partition(spark, tmp_path):
    path = str(tmp_path / "t")
    rows = [
        (1, dt.datetime(2023, 12, 31, 23, 0), 1.0),
        (2, dt.datetime(2024, 1, 1, 1, 0), 2.0),
        (3, None, 3.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="months(ts)"
    )
    m = sinks.read_manifest(path)
    assert sorted(m["partitions"]) == ["2023-12", "2024-01", "null"]
    # NULL-source rows can't satisfy a ts predicate → the null partition
    # prunes out; an unpredicated read still returns them
    kept = sinks._transform_prune(
        spark, m, dict(m["partitions"]),
        [("ts", ">=", dt.datetime(2024, 1, 1))],
    )
    # null pruned; 2023-12 survives only as the one-period session-zone
    # slack for naive timestamp literals (the boundary month)
    assert sorted(kept) == ["2023-12", "2024-01"]
    assert sinks.read_manifest_table(spark, path).count() == 3


def test_merge_is_idempotent_and_updates_stay_in_partition(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _ts_df(spark, 50)
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    v1 = sinks.read_manifest(path)["version"]
    # same batch again → same content
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    assert sinks.read_manifest_table(spark, path).count() == 50
    # update a row's value (ts unchanged) — only its day partition rewrites
    up = df.filter(F.col("k") == 7).withColumn("v", F.lit(-1.0))
    before = sinks.read_manifest(path)["partitions"]
    sinks.merge_upsert_manifest(
        spark, up, path, keys=["k"], partition_col="days(ts)"
    )
    after = sinks.read_manifest(path)["partitions"]
    changed = [k for k in after if after[k]["prefix"] != before[k]["prefix"]]
    assert changed == ["2024-03-01"]
    got = sinks.read_manifest_table(spark, path).filter(F.col("k") == 7)
    assert got.first().v == -1.0


def test_moving_key_across_days_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _ts_df(spark, 50)
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    moved = spark.createDataFrame(
        [(7, dt.datetime(2024, 3, 4, 1, 0), 0.0)],
        "k long, ts timestamp, v double",
    )
    with pytest.raises(ValueError, match="already exist under other"):
        sinks.merge_upsert_manifest(
            spark, moved, path, keys=["k"], partition_col="days(ts)"
        )


def test_delete_and_update_on_transformed_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _ts_df(spark)
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    res = sinks.delete_manifest_rows(
        spark, path, [("ts", "<", dt.datetime(2024, 3, 2))]
    )
    want_deleted = df.filter(
        F.col("ts") < F.lit(dt.datetime(2024, 3, 2))
    ).count()
    assert res["deleted"] == want_deleted
    m = sinks.read_manifest(path)
    assert "2024-03-01" not in m["partitions"]  # emptied → dropped
    # UPDATE may not assign the transform source
    with pytest.raises(ValueError, match="transform source"):
        sinks.update_manifest_rows(
            spark, path,
            {"ts": "timestamp'2024-01-01 00:00:00'"}, [("k", "=", 30)],
        )
    sinks.update_manifest_rows(spark, path, {"v": "-5.0"}, [("k", "=", 30)])
    got = sinks.read_manifest_table(spark, path).filter(F.col("k") == 30)
    assert got.first().v == -5.0


def test_replace_partitions_with_transform(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _ts_df(spark)
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    # recompute day 2 wholesale: only keys 48..71 remain there
    slice_df = df.filter(
        (F.col("ts") >= F.lit(dt.datetime(2024, 3, 2)))
        & (F.col("ts") < F.lit(dt.datetime(2024, 3, 3)))
        & (F.col("k") % 2 == 0)
    ).withColumn("v", F.lit(0.0))
    res = sinks.replace_manifest_partitions(
        spark, slice_df, path, partition_col="days(ts)"
    )
    assert res["partitions_replaced"] == 1
    got = sinks.read_manifest_table(spark, path)
    day2 = got.filter(F.date_format("ts", "yyyy-MM-dd") == "2024-03-02")
    assert day2.count() == slice_df.count()
    assert day2.agg(F.max("v")).first()[0] == 0.0
    # other days untouched
    assert got.count() == df.count() - 48 + slice_df.count()


def test_merge_into_on_transformed_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _ts_df(spark, 96)  # 4 days × 24 rows
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    src = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 3, 1, 6, 0), 999.0),  # matched, update
            (500, dt.datetime(2024, 3, 2, 2, 0), 1.0),  # new, insert
        ],
        "k long, ts timestamp, v double",
    )
    stats = sinks.merge_into_manifest(spark, src, path, keys=["k"])
    assert stats["updated"] == 1 and stats["inserted"] == 1
    got = {r.k: r.v for r in sinks.read_manifest_table(spark, path).collect()}
    assert got[0] == 999.0 and got[500] == 1.0
    # by-source delete scoped to a DERIVED day value
    feed = spark.createDataFrame(
        [(500, dt.datetime(2024, 3, 2, 2, 0), 1.0)],
        "k long, ts timestamp, v double",
    )
    stats = sinks.merge_into_manifest(
        spark, feed, path, keys=["k"],
        when_not_matched_by_source="delete",
        by_source_scope=["2024-03-02"],
    )
    assert stats["deleted_by_source"] == 24
    day2 = sinks.read_manifest_table(spark, path).filter(
        F.date_format("ts", "yyyy-MM-dd") == "2024-03-02"
    )
    assert [r.k for r in day2.collect()] == [500]
    # updating ts WITHIN the same day is allowed (derived value unchanged)
    same_day = spark.createDataFrame(
        [(0, dt.datetime(2024, 3, 1, 23, 59), 1.0)],
        "k long, ts timestamp, v double",
    )
    st = sinks.merge_into_manifest(
        spark, same_day, path, keys=["k"], when_not_matched=None
    )
    assert st["updated"] == 1
    # moving it to another day is not
    other_day = spark.createDataFrame(
        [(0, dt.datetime(2024, 3, 4, 1, 0), 1.0)],
        "k long, ts timestamp, v double",
    )
    with pytest.raises(ValueError):
        sinks.merge_into_manifest(
            spark, other_day, path, keys=["k"], when_not_matched=None
        )


def test_cdc_and_time_travel_on_transformed_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _ts_df(spark, 48)
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    up = df.filter(F.col("k") == 3).withColumn("v", F.lit(0.0))
    sinks.merge_upsert_manifest(
        spark, up, path, keys=["k"], partition_col="days(ts)"
    )
    ch = sinks.manifest_row_changes(spark, path, keys=["k"], from_version=1)
    assert {(r.k, r["_change"]) for r in ch.collect()} == {
        (3, "update_postimage")
    }
    old = sinks.read_manifest_table(spark, path, version=1)
    assert old.filter(F.col("k") == 3).first().v == 3.0


def test_reserved_derived_column_name_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").alias("__pt"),
        F.col("id").cast("timestamp").alias("ts"),
    )
    # hidden partitioning would overwrite then DROP the user's __pt column
    with pytest.raises(ValueError, match="reserved"):
        sinks.merge_upsert_manifest(
            spark, df, path, keys=["k"], partition_col="days(ts)"
        )
    # identity partitioning doesn't derive anything — the name is fine
    sinks.merge_upsert_manifest(
        spark, df.withColumn("day", F.lit(1)), path,
        keys=["k"], partition_col="day",
    )
    assert "__pt" in sinks.read_manifest_table(spark, path).columns


def test_wap_staging_on_hidden_partitioned_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _ts_df(spark, 48)
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    up = spark.createDataFrame(
        [(0, dt.datetime(2024, 3, 1, 7, 0), -1.0),
         (500, dt.datetime(2024, 3, 9, 1, 0), 9.0)],
        "k long, ts timestamp, v double",
    )
    sinks.merge_upsert_manifest(
        spark, up, path, keys=["k"], partition_col="days(ts)",
        stage="audit-me",
    )
    # committed readers unaffected; the staged overlay sees the candidate
    assert sinks.read_manifest_table(spark, path).count() == 48
    staged = sinks.read_staged_table(spark, path, "audit-me")
    assert staged.count() == 49
    assert staged.filter("k = 0").first().v == -1.0
    sinks.publish_staged(spark, path, "audit-me")
    got = sinks.read_manifest_table(spark, path)
    assert got.count() == 49
    assert "2024-03-09" in sinks.read_manifest(path)["partitions"]


def test_metadata_count_prunes_through_transform(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _ts_df(spark, 96)
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="days(ts)"
    )
    r = sinks.manifest_count(
        spark, path,
        predicates=[("ts", "=", dt.datetime(2024, 3, 2, 2, 0))],
    )
    # count comes back right; the transform pruned before file stats
    want = df.filter(
        F.col("ts") == F.lit(dt.datetime(2024, 3, 2, 2, 0))
    ).count()
    assert r["count"] == want


def test_cdc_consumers_glide_over_repartition(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = _ts_df(spark, 48)
    sinks.merge_upsert_manifest(
        spark, df, src, keys=["k"], partition_col="days(ts)"
    )
    sinks.replicate_table_increment(
        spark, src, dst, keys=["k"], dst_partition_col="bucket(4, k)"
    )
    sinks.repartition_manifest_table(spark, src, "months(ts)")
    out = sinks.replicate_table_increment(
        spark, src, dst, keys=["k"], dst_partition_col="bucket(4, k)"
    )
    # a pure relayout produces an empty feed: watermark-only advance
    assert out["upserted"] == 0 and out["deleted"] == 0
    assert sinks.manifest_app_metadata(dst)["repl_version"] == \
        sinks.manifest_versions(src)[-1]
    # and real changes after the relayout still flow
    up = spark.createDataFrame(
        [(0, dt.datetime(2024, 3, 1, 6, 0), -5.0)],
        "k long, ts timestamp, v double",
    )
    sinks.merge_upsert_manifest(
        spark, up, src, keys=["k"], partition_col="months(ts)"
    )
    out = sinks.replicate_table_increment(
        spark, src, dst, keys=["k"], dst_partition_col="bucket(4, k)"
    )
    assert out["upserted"] == 1
    assert sinks.read_manifest_table(spark, dst).filter(
        "k = 0").first().v == -5.0


def test_bucket_respects_source_column_type(spark, tmp_path):
    # xxhash64(int32) != xxhash64(int64) — the mirror must cast probe
    # literals to the stored type or pruning would silently drop rows
    path = str(tmp_path / "t")
    df = spark.range(200).select(
        F.col("id").cast("int").alias("k"), F.col("id").alias("v")
    )
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="bucket(8, k)"
    )
    for probe in (0, 7, 42, 199):
        got = sinks.read_manifest_table(
            spark, path, predicates=[("k", "=", probe)]
        )
        assert got.count() == 1, f"probe {probe} lost by bucket pruning"


# ---------------------------------------------------------------------------
# round 7: time_key_rule stamp + pre-UTC key migration (round-6 advice)
# ---------------------------------------------------------------------------


def _utc(y, mo, d, h=0, mi=0):
    return dt.datetime(y, mo, d, h, mi, tzinfo=dt.timezone.utc)


def test_time_key_rule_stamped_on_creation(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, _utc(2024, 3, 5, 12), 1.0)], "k long, ts timestamp, v double"
    )
    sinks.merge_upsert_manifest(spark, df, path, keys=["k"],
                                partition_col="days(ts)")
    assert sinks.read_manifest(path)["time_key_rule"] == "utc"
    # identity tables carry no rule
    p2 = str(tmp_path / "t2")
    sinks.merge_upsert_manifest(
        spark, df.withColumn("day", F.lit("d1")), p2, keys=["k"],
        partition_col="day",
    )
    assert "time_key_rule" not in sinks.read_manifest(p2)
    # already-utc migration is a no-op committing nothing
    out = sinks.migrate_time_partition_keys(spark, path)
    assert out["already_utc"] is True
    assert sinks.read_manifest(path)["version"] == 1


def _mk_pre_utc_table(spark, path):
    """A table whose keys were derived the ROUND-5 way: session-zone
    date_format rendering under Asia/Kolkata (+5:30), then the stamp
    stripped from the commit — byte-for-byte what a pre-UTC writer left
    behind. Rows 1/2 sit near UTC midnight (Kolkata key = next UTC day);
    rows 3/4 are mid-day (same key under both rules)."""
    import json

    rows = [
        (1, _utc(2024, 3, 5, 22, 0), 10.0),   # Kolkata 2024-03-06 03:30
        (2, _utc(2024, 3, 6, 21, 0), 20.0),   # Kolkata 2024-03-07 02:30
        (3, _utc(2024, 3, 5, 12, 0), 30.0),   # mid-day: stable key
        (4, _utc(2024, 3, 7, 10, 0), 40.0),   # mid-day: stable key
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    real = P.derived_column

    def legacy(t, frame):
        if t.kind in ("days", "months", "years"):
            fmt = {"days": "yyyy-MM-dd", "months": "yyyy-MM",
                   "years": "yyyy"}[t.kind]
            return F.date_format(F.col(t.source), fmt)
        return real(t, frame)

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    P.derived_column = legacy
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        sinks.merge_upsert_manifest(spark, df, path, keys=["k"],
                                    partition_col="days(ts)")
    finally:
        P.derived_column = real
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    # strip the stamp the modern writer added — pre-UTC commits had none
    cpath = os.path.join(path, "_commits", "v00000001.json")
    m = json.load(open(cpath))
    del m["time_key_rule"]
    json.dump(m, open(cpath, "w"))
    return rows


def test_migrate_pre_utc_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    rows = _mk_pre_utc_table(spark, path)
    m = sinks.read_manifest(path)
    assert "time_key_rule" not in m
    # the legacy table really does hold zone-skewed keys
    assert "2024-03-06" in m["partitions"] and "2024-03-07" in m["partitions"]
    assert sinks.read_manifest_table(spark, path).filter(
        "k = 1").count() == 1

    # reads are exact even pre-migration (the documented slack)
    got = sinks.read_manifest_table(
        spark, path,
        predicates=[("ts", "<", _utc(2024, 3, 6).replace(tzinfo=None))],
    )
    assert sorted(r.k for r in got.collect()) == [1, 3]

    out = sinks.migrate_time_partition_keys(spark, path)
    assert out["already_utc"] is False and out["migrated_partitions"] >= 2
    m2 = sinks.read_manifest(path)
    assert m2["time_key_rule"] == "utc"
    # keys now match UTC derivation exactly: k1→03-05, k2→03-06
    live = {
        p: sorted(
            r.k
            for r in sinks.read_manifest_table(
                spark, path, partition_values=[p]
            ).collect()
        )
        for p in ("2024-03-05", "2024-03-06", "2024-03-07")
    }
    assert live == {
        "2024-03-05": [1, 3], "2024-03-06": [2], "2024-03-07": [4],
    }
    # no rows lost or duplicated
    assert sorted(
        (r.k, r.v) for r in sinks.read_manifest_table(spark, path).collect()
    ) == [(k, v) for k, _ts, v in rows]
    # history names the verb
    assert [r["op"] for r in sinks.manifest_history(path)][-1] \
        == "migrate_time_keys"

    # the once-blocked boundary upsert now lands in place
    up = spark.createDataFrame(
        [(1, _utc(2024, 3, 5, 22, 0), 11.0)], "k long, ts timestamp, v double"
    )
    sinks.merge_upsert_manifest(spark, up, path, keys=["k"],
                                partition_col="days(ts)")
    assert sinks.read_manifest_table(spark, path).filter(
        "k = 1").first().v == 11.0
    # idempotent
    assert sinks.migrate_time_partition_keys(spark, path)["already_utc"]


def test_migrate_stamps_clean_table_without_rewrite(spark, tmp_path):
    """An unstamped table whose bounds PROVE every key already UTC gets
    a metadata-only stamp commit — no partition rewritten."""
    import json

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, _utc(2024, 3, 5, 12), 1.0), (2, _utc(2024, 3, 6, 12), 2.0)],
        "k long, ts timestamp, v double",
    )
    sinks.merge_upsert_manifest(spark, df, path, keys=["k"],
                                partition_col="days(ts)")
    cpath = os.path.join(path, "_commits", "v00000001.json")
    m = json.load(open(cpath))
    del m["time_key_rule"]
    json.dump(m, open(cpath, "w"))
    before = {
        k: e["prefix"] for k, e in sinks.read_manifest(path)["partitions"].items()
    }
    out = sinks.migrate_time_partition_keys(spark, path)
    assert out == {
        "migrated_partitions": 0, "received_partitions": 0,
        "dropped_partitions": 0, "already_utc": False,
    }
    m2 = sinks.read_manifest(path)
    assert m2["time_key_rule"] == "utc" and m2["version"] == 2
    assert {k: e["prefix"] for k, e in m2["partitions"].items()} == before


def test_bucket_in_probe_batches_derivation(spark, monkeypatch):
    """A wide IN probe over a bucket transform must NOT run one 1-row
    Spark job per member (at the X42 runtime-filter cap of 10k keys that
    would be minutes of driver jobs): prune_partition_keys pre-derives
    every =/IN probe value in one fused projection per 1000 values, and
    the surviving-key set is identical to per-value derivation."""
    t = P.parse_partition_spec("bucket(8, k)")
    entries = {str(b): {"prefix": f"p{b}"} for b in range(8)}

    # reference: per-value key_maybe_matches with fresh caches
    vals = list(range(0, 600, 7)) + [None]
    preds = [("k", "in", tuple(vals))]
    expect = {
        k
        for k in entries
        if any(
            P.key_maybe_matches(spark, t, k, [("k", "=", v)], {}, "bigint")
            for v in vals
            if v is not None
        )
    }

    calls = {"n": 0}
    real = P.derive_value

    def counting(spark_, t_, v, source_type=None):
        calls["n"] += 1
        return real(spark_, t_, v, source_type)

    monkeypatch.setattr(P, "derive_value", counting)
    got = P.prune_partition_keys(spark, t, entries, preds, "bigint")
    assert set(got) == expect
    # every member came from the batch — zero per-value derivations
    assert calls["n"] == 0

    # string source type takes the same batch path and agrees with Spark
    ts = P.parse_partition_spec("bucket(4, s)")
    s_entries = {str(b): {} for b in range(4)}
    s_vals = ["alpha", "beta", "gamma", ""]
    s_got = P.prune_partition_keys(
        spark, ts, s_entries, [("s", "in", tuple(s_vals))], "string"
    )
    s_expect = {
        str(r["b"])
        for r in spark.createDataFrame([(v,) for v in s_vals], "s string")
        .select(F.pmod(F.xxhash64(F.col("s")), F.lit(4)).alias("b"))
        .collect()
    }
    assert set(s_got) == s_expect


def test_null_predicates_prune_transform_partitions(spark, tmp_path):
    """IS NULL keeps exactly the NULL partition of a transform-partitioned
    table, IS NOT NULL prunes it, and != prunes only the NULL partition
    (a derived key still holds many source values)."""
    t = P.parse_partition_spec("bucket(8, k)")
    isnull = [("k", "isnull", None)]
    notnull = [("k", "notnull", None)]
    ne = [("k", "!=", 3)]
    assert P.key_maybe_matches(spark, t, "null", isnull, {}, "bigint")
    assert not P.key_maybe_matches(spark, t, "2", isnull, {}, "bigint")
    assert not P.key_maybe_matches(spark, t, "null", notnull, {}, "bigint")
    assert P.key_maybe_matches(spark, t, "2", notnull, {}, "bigint")
    assert not P.key_maybe_matches(spark, t, "null", ne, {}, "bigint")
    assert P.key_maybe_matches(spark, t, "2", ne, {}, "bigint")
    # a null predicate on some OTHER column never prunes here
    assert P.key_maybe_matches(
        spark, t, "null", [("x", "notnull", None)], {}, "bigint"
    )

    # end-to-end: days(ts) table with a NULL-timestamp partition
    path = str(tmp_path / "days_tbl")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 5, 12), 1.0),
         (2, dt.datetime(2024, 3, 6, 12), 2.0),
         (3, None, 3.0)],
        "k long, ts timestamp, v double",
    )
    sinks.merge_upsert_manifest(spark, df, path, keys=["k"],
                                partition_col="days(ts)")
    got = sinks.read_manifest_table(
        spark, path, predicates=sinks.parse_predicates("ts IS NULL")
    )
    assert [r["k"] for r in got.collect()] == [3]
    # the pruned read opened only the NULL partition's files
    assert all("/null/" in f for f in got.inputFiles())
    got_nn = sinks.read_manifest_table(
        spark, path, predicates=sinks.parse_predicates("ts IS NOT NULL")
    )
    assert sorted(r["k"] for r in got_nn.collect()) == [1, 2]
    assert all("/null/" not in f for f in got_nn.inputFiles())
