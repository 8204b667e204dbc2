"""Incrementally-maintained aggregates (operators/matview.py) and the
replace-partitions write primitive: parity with from-scratch recompute
after arbitrary DML on the source, incremental cost ∝ changed partitions,
exactly-once watermarks (crash replay, repeated refresh no-ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import matview as MV
from f1_data_pipeline_spark.operators import sinks


def _mk_source(spark, path, n=60):
    """Fact table: day-partitioned, (id) keyed, with a NULL-able measure
    and a category uncorrelated with the partitioning."""
    df = spark.createDataFrame(
        [
            (
                i,
                f"d{i % 4}",
                ["red", "green", "blue"][i % 3],
                None if i % 7 == 0 else float(i),
            )
            for i in range(n)
        ],
        "id long, day string, cat string, v double",
    )
    sinks.merge_upsert_manifest(spark, df, path, ["id"], partition_col="day")
    return df


# ---------------------------------------------------------------------------
# replace_manifest_partitions (INSERT OVERWRITE by partition)
# ---------------------------------------------------------------------------


def test_replace_partitions_semantics(spark, tmp_path):
    """Fed partitions replaced wholesale, listed-but-unfed partitions
    dropped, everything else byte-untouched; one atomic version bump."""
    path = str(tmp_path / "repl")
    _mk_source(spark, path)
    before = sinks.read_manifest(path)
    repl = spark.createDataFrame(
        [(1000, "d1", "red", 1.0)], "id long, day string, cat string, v double"
    )
    out = sinks.replace_manifest_partitions(
        spark, repl, path, "day", drop_partitions_encoded=["d3"]
    )
    assert out == {"partitions_replaced": 1, "partitions_dropped": 1, "rows": 1}
    after = sinks.read_manifest(path)
    assert after["version"] == before["version"] + 1
    # d1 replaced (one row), d3 gone, d0/d2 prefixes identical
    rows = sinks.read_manifest_table(spark, path).collect()
    assert {r["day"] for r in rows} == {"d0", "d1", "d2"}
    assert [r["id"] for r in rows if r["day"] == "d1"] == [1000]
    for k in ("d0", "d2"):
        assert after["partitions"][k]["prefix"] == before["partitions"][k]["prefix"]
    # a partition cannot be both fed and dropped
    with pytest.raises(ValueError, match="replaced or dropped"):
        sinks.replace_manifest_partitions(
            spark, repl, path, "day", drop_partitions_encoded=["d1"]
        )
    # time travel still sees the pre-replace table
    old = sinks.read_manifest_table(spark, path, version=before["version"])
    assert old.filter(F.col("day") == "d3").count() > 0


def test_app_metadata_commits_atomically_and_carries_forward(spark, tmp_path):
    path = str(tmp_path / "appmeta")
    df = spark.createDataFrame([(1, "a", 1.0)], "id long, day string, v double")
    sinks.merge_upsert_manifest(
        spark, df, path, ["id"], partition_col="day",
        app_metadata={"mv_source_version": 7, "owner": "mv"},
    )
    assert sinks.manifest_app_metadata(path) == {
        "mv_source_version": 7, "owner": "mv",
    }
    # later commit overwrites named keys, carries the rest forward
    sinks.merge_upsert_manifest(
        spark, df, path, ["id"], partition_col="day",
        app_metadata={"mv_source_version": 9},
    )
    assert sinks.manifest_app_metadata(path) == {
        "mv_source_version": 9, "owner": "mv",
    }
    # a commit with no app_metadata leaves the stored object intact
    sinks.merge_upsert_manifest(spark, df, path, ["id"], partition_col="day")
    assert sinks.manifest_app_metadata(path)["mv_source_version"] == 9


def test_cdc_preimage_rows(spark, tmp_path):
    path = str(tmp_path / "pre")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0)], "id long, day string, v double"
    )
    sinks.merge_upsert_manifest(spark, df, path, ["id"], partition_col="day")
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame([(2, "a", 20.0)], "id long, day string, v double"),
        path, ["id"], partition_col="day",
    )
    feed = sinks.manifest_row_changes(
        spark, path, ["id"], 1, 2, include_preimage=True
    ).collect()
    got = {(r["_change"], r["id"], r["v"]) for r in feed}
    assert got == {
        ("update_postimage", 2, 20.0),
        ("update_preimage", 2, 2.0),
    }
    # default shape unchanged (no preimage rows)
    feed0 = sinks.manifest_row_changes(spark, path, ["id"], 1, 2).collect()
    assert {r["_change"] for r in feed0} == {"update_postimage"}


# ---------------------------------------------------------------------------
# Strategy 1: partition-aligned rollup
# ---------------------------------------------------------------------------

AGGS_FULL = {
    "n": ("count", "*"),
    "n_v": ("count", "v"),
    "sum_v": ("sum", "v"),
    "min_v": ("min", "v"),
    "max_v": ("max", "v"),
    "avg_v": ("avg", "v"),
    "nd_id": ("count_distinct", "id"),  # recompute-strategy exclusive
}


def _full_rollup(src_df):
    return src_df.groupBy("day", "cat").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("v").alias("n_v"),
        F.sum("v").alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.avg("v").alias("avg_v"),
        F.count_distinct("id").cast("long").alias("nd_id"),
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_rollup_initial_build_and_incremental_parity(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    _mk_source(spark, src)

    out = MV.refresh_rollup(spark, src, tgt, ["day", "cat"], AGGS_FULL)
    assert out["noop"] is False and out["partitions_refreshed"] == 4
    assert _rows(sinks.read_manifest_table(spark, tgt)) == _rows(
        _full_rollup(sinks.read_manifest_table(spark, src))
    )
    # second refresh: watermark satisfied, nothing recomputed
    out2 = MV.refresh_rollup(spark, src, tgt, ["day", "cat"], AGGS_FULL)
    assert out2["noop"] is True

    # DML mix: new rows into d1, UPDATE in d2, DELETE emptying d3
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame(
            [(1001, "d1", "red", 500.0), (1002, "d1", "gold", None)],
            "id long, day string, cat string, v double",
        ),
        src, ["id"], partition_col="day",
    )
    sinks.update_manifest_rows(spark, src, {"v": 0.5}, [("day", "=", "d2")])
    sinks.delete_manifest_rows(spark, src, [("day", "=", "d3")])

    before_tgt = sinks.read_manifest(tgt)
    # 3 of 4 partitions changed: pin the chooser to incremental so this
    # test keeps verifying the per-partition path whatever the default
    # full_recompute_fraction dial is
    out3 = MV.refresh_rollup(spark, src, tgt, ["day", "cat"], AGGS_FULL,
                             full_recompute_fraction=2.0)
    assert out3["noop"] is False
    assert out3["strategy"] == "incremental"
    assert out3["partitions_refreshed"] == 2 and out3["partitions_dropped"] == 1
    after_tgt = sinks.read_manifest(tgt)
    # untouched target partition d0 kept its prefix — incremental, not full
    assert (
        after_tgt["partitions"]["d0"]["prefix"]
        == before_tgt["partitions"]["d0"]["prefix"]
    )
    assert _rows(sinks.read_manifest_table(spark, tgt)) == _rows(
        _full_rollup(sinks.read_manifest_table(spark, src))
    )


def test_rollup_crash_before_commit_replays_exactly_once(
    spark, tmp_path, monkeypatch
):
    """A refresh whose commit never lands leaves data AND watermark at the
    previous state; the rerun converges to the same parity result."""
    src = str(tmp_path / "src_crash")
    tgt = str(tmp_path / "tgt_crash")
    _mk_source(spark, src)
    MV.refresh_rollup(spark, src, tgt, ["day", "cat"], AGGS_FULL)
    sinks.delete_manifest_rows(spark, src, [("cat", "=", "red")])

    real = sinks._commit_manifest

    def boom(path, manifest):
        raise RuntimeError("simulated crash before flip")

    monkeypatch.setattr(sinks, "_commit_manifest", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        MV.refresh_rollup(spark, src, tgt, ["day", "cat"], AGGS_FULL)
    monkeypatch.setattr(sinks, "_commit_manifest", real)
    # watermark unchanged → rerun redoes the same window
    out = MV.refresh_rollup(spark, src, tgt, ["day", "cat"], AGGS_FULL)
    assert out["noop"] is False
    assert _rows(sinks.read_manifest_table(spark, tgt)) == _rows(
        _full_rollup(sinks.read_manifest_table(spark, src))
    )
    assert MV.refresh_rollup(spark, src, tgt, ["day", "cat"], AGGS_FULL)[
        "noop"
    ] is True


def test_rollup_requires_partition_aligned_groups(spark, tmp_path):
    src = str(tmp_path / "src_guard")
    _mk_source(spark, src)
    with pytest.raises(ValueError, match="partition column"):
        MV.refresh_rollup(
            spark, src, str(tmp_path / "t"), ["cat"], {"n": ("count", "*")}
        )


# ---------------------------------------------------------------------------
# Strategy 2: CDC delta-application
# ---------------------------------------------------------------------------

AGGS_DELTA = {
    "n": ("count", "*"),
    "n_v": ("count", "v"),
    "sum_v": ("sum", "v"),
    "avg_v": ("avg", "v"),
}


def _full_delta_ref(src_df):
    return src_df.groupBy("cat").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("v").alias("n_v"),
        F.sum("v").alias("sum_v"),
        F.avg("v").alias("avg_v"),
    )


def test_deltas_parity_through_dml_mix(spark, tmp_path):
    """Groups (cat) cut ACROSS the source partitioning (day); parity with
    full recompute after inserts, group-moving updates, and deletes —
    including a group whose rows all vanish (hidden by read_aggregate)
    and NULL-measure SQL semantics (SUM/AVG over all-NULL reads NULL)."""
    src = str(tmp_path / "dsrc")
    tgt = str(tmp_path / "dtgt")
    _mk_source(spark, src)

    out = MV.refresh_aggregate_deltas(
        spark, src, ["id"], tgt, ["cat"], AGGS_DELTA
    )
    assert out["noop"] is False
    assert _rows(MV.read_aggregate(spark, tgt, AGGS_DELTA)) == _rows(
        _full_delta_ref(sinks.read_manifest_table(spark, src))
    )
    assert MV.refresh_aggregate_deltas(
        spark, src, ["id"], tgt, ["cat"], AGGS_DELTA
    )["noop"] is True

    # inserts incl. a brand-new all-NULL-measure group; an update MOVING a
    # row between groups; a delete
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame(
            [(2001, "d0", "gold", None), (2002, "d1", "red", 7.0)],
            "id long, day string, cat string, v double",
        ),
        src, ["id"], partition_col="day",
    )
    sinks.update_manifest_rows(
        spark, src, {"cat": "blue"}, [("id", "=", 1)]  # red → blue move
    )
    sinks.delete_manifest_rows(spark, src, [("id", "<", 10)])

    MV.refresh_aggregate_deltas(spark, src, ["id"], tgt, ["cat"], AGGS_DELTA)
    assert _rows(MV.read_aggregate(spark, tgt, AGGS_DELTA)) == _rows(
        _full_delta_ref(sinks.read_manifest_table(spark, src))
    )

    # wipe one whole group → hidden from the read, row retained with _n=0
    sinks.delete_manifest_rows(spark, src, [("cat", "=", "gold")])
    MV.refresh_aggregate_deltas(spark, src, ["id"], tgt, ["cat"], AGGS_DELTA)
    view = MV.read_aggregate(spark, tgt, AGGS_DELTA)
    assert "gold" not in {r["cat"] for r in view.collect()}
    raw = sinks.read_manifest_table(spark, tgt)
    [gold] = raw.filter(F.col("cat") == "gold").collect()
    assert gold["_n"] == 0
    assert _rows(view) == _rows(
        _full_delta_ref(sinks.read_manifest_table(spark, src))
    )
    # ...and the zero row is sweepable with the ordinary DELETE verb
    sinks.delete_manifest_rows(spark, tgt, [("_n", "=", 0)])
    assert sinks.read_manifest_table(spark, tgt).filter(
        F.col("cat") == "gold"
    ).count() == 0


def test_deltas_rejects_unknown_ops(spark, tmp_path):
    """min/max are ACCEPTED in delta mode (mergeable on insert-only
    windows — test_deltas_mergeable_aggs_insert_only); a genuinely
    inexpressible op is still refused with a pointer."""
    src = str(tmp_path / "dsrc2")
    _mk_source(spark, src)
    with pytest.raises(ValueError, match="not supported"):
        MV.refresh_aggregate_deltas(
            spark, src, ["id"], str(tmp_path / "t"), ["cat"],
            {"m": ("median", "v")},
        )
    with pytest.raises(ValueError, match="not supported"):
        MV.refresh_rollup(
            spark, src, str(tmp_path / "t2"), ["day", "cat"],
            {"m": ("median", "v")},
        )


def test_deltas_mergeable_aggs_insert_only(spark, tmp_path):
    """min/max/approx_distinct maintain by MERGE (least/greatest, HLL
    union) across insert-only windows; a window containing a retraction
    refuses loudly instead of silently un-retractable state."""
    src = str(tmp_path / "msrc")
    tgt = str(tmp_path / "mtgt")
    _mk_source(spark, src, n=40)
    aggs = {
        "n": ("count", "*"),
        "min_v": ("min", "v"),
        "max_v": ("max", "v"),
        "nd_day": ("approx_distinct", "day"),
    }

    def ref():
        return sinks.read_manifest_table(spark, src).groupBy("cat").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.count_distinct("day").cast("long").alias("nd_day"),
        )

    MV.refresh_aggregate_deltas(spark, src, ["id"], tgt, ["cat"], aggs)
    assert _rows(MV.read_aggregate(spark, tgt, aggs)) == _rows(ref())

    # append-only increment: brand-new keys, incl. a new group and a new
    # day value per group (the HLL unions must absorb them)
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame(
            [(900, "d9", "red", -50.0), (901, "d9", "gold", 999.0)],
            "id long, day string, cat string, v double",
        ),
        src, ["id"], partition_col="day",
    )
    MV.refresh_aggregate_deltas(spark, src, ["id"], tgt, ["cat"], aggs)
    assert _rows(MV.read_aggregate(spark, tgt, aggs)) == _rows(ref())

    # a retraction in the window → loud refusal, nothing committed
    sinks.delete_manifest_rows(spark, src, [("id", "=", 900)])
    v_before = sinks.read_manifest(tgt)["version"]
    with pytest.raises(ValueError, match="RETRACT"):
        MV.refresh_aggregate_deltas(spark, src, ["id"], tgt, ["cat"], aggs)
    assert sinks.read_manifest(tgt)["version"] == v_before


def test_refresh_guards_foreign_target(spark, tmp_path):
    """A pre-existing table without a matview watermark is refused by both
    strategies: an 'initial build' over it would double-count (deltas) or
    strand stale partitions (rollup)."""
    src = str(tmp_path / "gsrc")
    _mk_source(spark, src)
    foreign = str(tmp_path / "foreign")
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame([(1, "x", 1.0)], "cat string, day string, v double"),
        foreign, ["cat"], partition_col="day",
    )
    with pytest.raises(ValueError, match="not built by this refresher"):
        MV.refresh_aggregate_deltas(
            spark, src, ["id"], foreign, ["cat"], AGGS_DELTA
        )
    with pytest.raises(ValueError, match="not built by this refresher"):
        MV.refresh_rollup(spark, src, foreign, ["day", "cat"], AGGS_FULL)


def test_matview_over_streaming_manifest_sink(spark, tmp_path):
    """The full incremental pipeline: micro-batches → manifest-committed
    streaming MERGE sink → CDC-driven rollup refresh. Each refresh
    recomputes only the partitions the stream's commits touched; results
    match a from-scratch aggregate of everything ingested."""
    from f1_data_pipeline_spark.streaming.structured import start_merge_sink

    src_files = str(tmp_path / "in")
    table = str(tmp_path / "table")
    tgt = str(tmp_path / "roll")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, day string, cat string, v double"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_files)

    def drain():
        stream = (
            spark.readStream.schema(schema).format("parquet").load(src_files)
        )
        q = start_merge_sink(
            stream, table, ["id"], ckpt,
            partition_col="day", commit="manifest", check_moved_keys=False,
        )
        assert q.awaitTermination(120)

    feed([(i, f"d{i % 3}", ["a", "b"][i % 2], float(i)) for i in range(30)])
    drain()
    aggs = {"n": ("count", "*"), "sum_v": ("sum", "v"), "max_v": ("max", "v")}
    MV.refresh_rollup(spark, table, tgt, ["day", "cat"], aggs)

    def ref():
        return sinks.read_manifest_table(spark, table).groupBy(
            "day", "cat"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.max("v").alias("max_v"),
        )

    assert _rows(sinks.read_manifest_table(spark, tgt)) == _rows(ref())

    # second wave touches ONLY d0 — the refresh must too
    feed([(100 + i, "d0", "a", 1000.0 + i) for i in range(5)])
    drain()
    before = sinks.read_manifest(tgt)
    out = MV.refresh_rollup(spark, table, tgt, ["day", "cat"], aggs)
    assert out["partitions_refreshed"] == 1 and out["partitions_dropped"] == 0
    after = sinks.read_manifest(tgt)
    for k in ("d1", "d2"):
        assert after["partitions"][k]["prefix"] == before["partitions"][k]["prefix"]
    assert _rows(sinks.read_manifest_table(spark, tgt)) == _rows(ref())


def test_deltas_integer_sums_exact_and_long_typed(spark, tmp_path):
    """Integer measures accumulate in LONG: exact past 2^53 (doubles
    would round), and read back with SQL SUM(long)'s type."""
    src = str(tmp_path / "isrc")
    tgt = str(tmp_path / "itgt")
    big = 2 ** 53
    df = spark.createDataFrame(
        [(1, "a", "x", big + 1), (2, "a", "x", big + 3), (3, "b", "y", 5)],
        "id long, day string, cat string, v long",
    )
    sinks.merge_upsert_manifest(spark, df, src, ["id"], partition_col="day")
    aggs = {"n": ("count", "*"), "sum_v": ("sum", "v")}
    MV.refresh_aggregate_deltas(spark, src, ["id"], tgt, ["cat"], aggs)
    view = MV.read_aggregate(spark, tgt, aggs)
    assert dict(view.dtypes)["sum_v"] == "bigint"
    got = {r["cat"]: r["sum_v"] for r in view.collect()}
    assert got == {"x": 2 * big + 4, "y": 5}  # 2^53+1 + 2^53+3, bit-exact
    # a delete retracts exactly
    sinks.delete_manifest_rows(spark, src, [("id", "=", 1)])
    MV.refresh_aggregate_deltas(spark, src, ["id"], tgt, ["cat"], aggs)
    got = {r["cat"]: r["sum_v"] for r in MV.read_aggregate(spark, tgt, aggs).collect()}
    assert got == {"x": big + 3, "y": 5}


def test_deltas_watermark_advances_on_empty_windows(spark, tmp_path):
    """Source versions that carry no row changes (constraint DDL;
    compaction rewriting identical rows) still advance the watermark —
    otherwise every refresh re-walks the stale window and a vacuum past
    it bricks the view."""
    src = str(tmp_path / "esrc")
    tgt = str(tmp_path / "etgt")
    # fragment the seed write (AQE normally coalesces the fused write to
    # one file per partition, which would make the compaction below a
    # no-op committing no version)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        _mk_source(spark, src)
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
    MV.refresh_aggregate_deltas(spark, src, ["id"], tgt, ["cat"], AGGS_DELTA)

    # metadata-only source commit: no partitions changed
    sinks.manifest_add_constraint(spark, src, "id_ok", "id >= 0")
    out = MV.refresh_aggregate_deltas(spark, src, ["id"], tgt, ["cat"], AGGS_DELTA)
    assert out["noop"] is False and out["groups_touched"] == 0
    assert sinks.manifest_app_metadata(tgt)[MV.WATERMARK_KEY] == out["source_version"]
    assert MV.refresh_aggregate_deltas(
        spark, src, ["id"], tgt, ["cat"], AGGS_DELTA
    )["noop"] is True

    # compaction: partitions rewritten, zero row-level diffs
    sinks.compact_manifest(spark, src)
    out2 = MV.refresh_aggregate_deltas(spark, src, ["id"], tgt, ["cat"], AGGS_DELTA)
    assert out2["noop"] is False and out2["groups_touched"] == 0
    assert sinks.manifest_app_metadata(tgt)[MV.WATERMARK_KEY] == out2["source_version"]
    # and through it all the view stays correct
    assert _rows(MV.read_aggregate(spark, tgt, AGGS_DELTA)) == _rows(
        _full_delta_ref(sinks.read_manifest_table(spark, src))
    )


def test_refresh_rejects_foreign_source(spark, tmp_path):
    """A target maintained from source A refuses a refresh pointed at
    source B — version numbers are meaningless across tables."""
    src_a = str(tmp_path / "srcA")
    src_b = str(tmp_path / "srcB")
    tgt = str(tmp_path / "ftgt")
    _mk_source(spark, src_a)
    _mk_source(spark, src_b)
    MV.refresh_aggregate_deltas(spark, src_a, ["id"], tgt, ["cat"], AGGS_DELTA)
    with pytest.raises(ValueError, match="foreign"):
        MV.refresh_aggregate_deltas(spark, src_b, ["id"], tgt, ["cat"], AGGS_DELTA)
    rtgt = str(tmp_path / "rtgt")
    MV.refresh_rollup(spark, src_a, rtgt, ["day", "cat"], AGGS_FULL)
    with pytest.raises(ValueError, match="foreign"):
        MV.refresh_rollup(spark, src_b, rtgt, ["day", "cat"], AGGS_FULL)


def test_replace_partitions_schema_guards(spark, tmp_path):
    """A replace batch missing a stored column is refused (its schema
    would drop the column from every partition); new columns need
    schema_evolution=True."""
    path = str(tmp_path / "repl_schema")
    _mk_source(spark, path)
    narrower = spark.createDataFrame(
        [(1000, "d1", "red")], "id long, day string, cat string"
    )
    with pytest.raises(ValueError, match="missing table columns"):
        sinks.replace_manifest_partitions(spark, narrower, path, "day")
    wider = spark.createDataFrame(
        [(1000, "d1", "red", 1.0, "extra")],
        "id long, day string, cat string, v double, note string",
    )
    with pytest.raises(ValueError, match="schema_evolution"):
        sinks.replace_manifest_partitions(spark, wider, path, "day")
    sinks.replace_manifest_partitions(
        spark, wider, path, "day", schema_evolution=True
    )
    rows = sinks.read_manifest_table(spark, path)
    # old partitions read the new column as NULL; d1 carries it
    assert rows.filter("day = 'd1'").collect()[0]["note"] == "extra"
    assert rows.filter("day = 'd0'").collect()[0]["note"] is None


def test_deltas_bucketed_target_bounds_manifest(spark, tmp_path):
    """Default delta layout hash-buckets groups: a high-cardinality group
    column yields at most n_buckets manifest partitions (not one per
    value), an incremental refresh touches only the buckets its changed
    groups hash into, and parity holds. Explicit partition_col keeps the
    one-partition-per-value layout."""
    src = str(tmp_path / "bsrc")
    tgt = str(tmp_path / "btgt")
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", f"dom{i}.example", float(i)) for i in range(400)],
        "id long, day string, cat string, v double",
    )
    sinks.merge_upsert_manifest(spark, df, src, ["id"], partition_col="day")
    aggs = {"n": ("count", "*"), "sum_v": ("sum", "v")}
    MV.refresh_aggregate_deltas(
        spark, src, ["id"], tgt, ["cat"], aggs, n_buckets=16
    )
    m = sinks.read_manifest(tgt)
    assert m["partition_col"] == "_gbucket"
    assert len(m["partitions"]) <= 16  # 400 groups, bounded manifest
    assert MV.read_aggregate(spark, tgt, aggs).count() == 400

    # touch ONE group → only its bucket's partition moves
    v1 = m["version"]
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame(
            [(9000, "d0", "dom7.example", 1.5)],
            "id long, day string, cat string, v double",
        ),
        src, ["id"], partition_col="day",
    )
    MV.refresh_aggregate_deltas(
        spark, src, ["id"], tgt, ["cat"], aggs, n_buckets=16
    )
    changed = sinks.manifest_changed_partitions(
        tgt, v1, sinks.read_manifest(tgt)["version"]
    )
    assert len(changed) == 1
    [r] = MV.read_aggregate(spark, tgt, aggs).filter(
        "cat = 'dom7.example'"
    ).collect()
    assert (r["n"], r["sum_v"]) == (2, 8.5)

    # explicit partition_col: one partition per leading group value
    tgt2 = str(tmp_path / "btgt2")
    MV.refresh_aggregate_deltas(
        spark, src, ["id"], tgt2, ["day", "cat"], aggs, partition_col="day"
    )
    m2 = sinks.read_manifest(tgt2)
    assert m2["partition_col"] == "day" and len(m2["partitions"]) == 3


def test_start_matview_sink_continuous_aggregate(spark, tmp_path):
    """The one-call streaming composition: micro-batches → manifest MERGE
    → watermark-driven rollup refresh, converging to batch parity across
    multiple drains."""
    from f1_data_pipeline_spark.streaming.structured import start_matview_sink

    src_files = str(tmp_path / "in")
    table = str(tmp_path / "tbl")
    tgt = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ck")
    schema = "id long, day string, cat string, v double"
    aggs = {"n": ("count", "*"), "sum_v": ("sum", "v")}

    def feed_and_drain(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_files)
        stream = (
            spark.readStream.schema(schema).format("parquet").load(src_files)
        )
        q = start_matview_sink(
            stream, table, ["id"], ckpt, "day", tgt, ["day", "cat"], aggs
        )
        assert q.awaitTermination(120)

    feed_and_drain([(i, f"d{i % 3}", "a", float(i)) for i in range(20)])
    feed_and_drain([(100 + i, "d0", "b", 1.0) for i in range(5)])

    ref = sinks.read_manifest_table(spark, table).groupBy("day", "cat").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")
    )
    assert _rows(sinks.read_manifest_table(spark, tgt)) == _rows(ref)
    assert sinks.read_manifest_table(spark, table).count() == 25


def test_deltas_n_buckets_pinned(spark, tmp_path):
    """Changing n_buckets re-hashes groups into different partitions and
    would double-count — the stored bucket count refuses a mismatched
    refresh (found in self-review: the merge's 'keys determine the
    partition by construction' only holds for a FIXED hash)."""
    src = str(tmp_path / "nbsrc")
    tgt = str(tmp_path / "nbtgt")
    _mk_source(spark, src)
    MV.refresh_aggregate_deltas(
        spark, src, ["id"], tgt, ["cat"], AGGS_DELTA, n_buckets=16
    )
    assert sinks.manifest_app_metadata(tgt)["mv_buckets"] == 16
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame(
            [(777, "d0", "red", 7.0)], "id long, day string, cat string, v double"
        ),
        src, ["id"], partition_col="day",
    )
    with pytest.raises(ValueError, match="n_buckets"):
        MV.refresh_aggregate_deltas(
            spark, src, ["id"], tgt, ["cat"], AGGS_DELTA, n_buckets=64
        )
    # the pinned count still works and stays correct
    MV.refresh_aggregate_deltas(
        spark, src, ["id"], tgt, ["cat"], AGGS_DELTA, n_buckets=16
    )
    assert _rows(MV.read_aggregate(spark, tgt, AGGS_DELTA)) == _rows(
        _full_delta_ref(sinks.read_manifest_table(spark, src))
    )


def test_restore_of_matview_target_reconverges(spark, tmp_path):
    """Restoring a maintained rollup rewinds its watermark WITH its data
    (they were committed as an atomic pair), so the next refresh
    recomputes forward instead of no-opping on stale aggregates."""
    src = str(tmp_path / "rsrc")
    tgt = str(tmp_path / "rtgt2")
    _mk_source(spark, src, n=20)
    MV.refresh_rollup(spark, src, tgt, ["day", "cat"], AGGS_FULL)
    good_version = sinks.read_manifest(tgt)["version"]
    sinks.merge_upsert_manifest(
        spark,
        spark.createDataFrame(
            [(500, "d1", "red", 9.0)], "id long, day string, cat string, v double"
        ),
        src, ["id"], partition_col="day",
    )
    MV.refresh_rollup(spark, src, tgt, ["day", "cat"], AGGS_FULL)
    # roll the rollup back to before the second refresh
    sinks.restore_manifest(spark, tgt, good_version)
    out = MV.refresh_rollup(spark, src, tgt, ["day", "cat"], AGGS_FULL)
    assert out["noop"] is False  # watermark rewound with the data
    assert _rows(sinks.read_manifest_table(spark, tgt)) == _rows(
        _full_rollup(sinks.read_manifest_table(spark, src))
    )


def test_start_matview_sink_all_filtered_first_batch(spark, tmp_path):
    """A first micro-batch whose transform filters every row must not
    crash the query on the missing source manifest; a later real batch
    builds both tables."""
    from f1_data_pipeline_spark.streaming.structured import start_matview_sink

    src_files = str(tmp_path / "fin")
    table = str(tmp_path / "ftbl")
    tgt = str(tmp_path / "fagg")
    ckpt = str(tmp_path / "fck")
    schema = "id long, day string, cat string, v double"
    aggs = {"n": ("count", "*")}

    def drain(pred):
        stream = (
            spark.readStream.schema(schema).format("parquet").load(src_files)
        )
        q = start_matview_sink(
            stream, table, ["id"], ckpt, "day", tgt, ["day", "cat"], aggs,
            transform=lambda df: df.filter(pred),
        )
        assert q.awaitTermination(120)
        assert q.exception() is None

    spark.createDataFrame(
        [(1, "a", "x", 1.0)], schema
    ).coalesce(1).write.mode("append").parquet(src_files)
    drain("id < 0")  # everything filtered — no source table yet
    assert sinks.read_manifest(table) is None
    spark.createDataFrame(
        [(2, "a", "x", 2.0)], schema
    ).coalesce(1).write.mode("append").parquet(src_files)
    drain("id > 0")
    [r] = sinks.read_manifest_table(spark, tgt).collect()
    assert (r["day"], r["cat"], r["n"]) == ("a", "x", 1)


def test_refresh_strategy_auto_chooser(spark, tmp_path):
    """Round-7 verdict #3: refresh_rollup recomputes the whole view in
    one job once the changed-partition fraction exceeds the measured
    crossover (full_recompute_fraction), and stays per-partition below
    it — with identical results either way."""
    src = str(tmp_path / "src")
    df = spark.range(400).select(
        F.col("id"),
        (F.col("id") % 8).cast("string").alias("day"),
        (F.col("id") % 5).cast("string").alias("cat"),
        F.col("id").cast("double").alias("v"),
    )
    sinks.merge_upsert_manifest(spark, df, src, ["id"], partition_col="day")
    aggs = {"n": ("count", "*"), "sum_v": ("sum", "v")}
    t_a, t_b = str(tmp_path / "a"), str(tmp_path / "b")
    assert MV.refresh_rollup(spark, src, t_a, ["day", "cat"], aggs)[
        "strategy"] == "initial"
    MV.refresh_rollup(spark, src, t_b, ["day", "cat"], aggs)
    # touch 1 of 8 partitions → incremental (frac 0.125 < 0.8)
    inc = spark.createDataFrame(
        [(1000, "0", "1", 9.0)], "id long, day string, cat string, v double"
    )
    sinks.merge_upsert_manifest(spark, inc, src, ["id"], partition_col="day")
    r = MV.refresh_rollup(spark, src, t_a, ["day", "cat"], aggs)
    assert r["strategy"] == "incremental" and r["partitions_refreshed"] == 1
    # same increment against t_b with the chooser forced full
    r2 = MV.refresh_rollup(spark, src, t_b, ["day", "cat"], aggs,
                           full_recompute_fraction=0.0)
    assert r2["strategy"] == "full" and r2["partitions_refreshed"] == 8
    a = sinks.read_manifest_table(spark, t_a)
    b = sinks.read_manifest_table(spark, t_b)
    assert a.exceptAll(b).count() == 0 and a.count() == b.count()
    # touch 8 of 8 (frac 1.0 > 0.8) → the chooser goes full on its own
    inc2 = spark.range(2000, 2008).select(
        F.col("id"), (F.col("id") % 8).cast("string").alias("day"),
        F.lit("9").alias("cat"), F.lit(1.0).alias("v"),
    )
    sinks.merge_upsert_manifest(spark, inc2, src, ["id"], partition_col="day")
    r3 = MV.refresh_rollup(spark, src, t_a, ["day", "cat"], aggs)
    assert r3["strategy"] == "full" and r3["partitions_refreshed"] == 8
    full = (
        sinks.read_manifest_table(spark, src).groupBy("day", "cat")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
    )
    got = sinks.read_manifest_table(spark, t_a)
    assert got.exceptAll(full).count() == 0 and got.count() == full.count()
