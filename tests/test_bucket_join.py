"""Bucket-aligned shuffle-free joins (operators/bucket_join.py):
co-bucketed manifest tables join without either side entering an
exchange — the storage-partitioned join emulated with per-bucket-pair
Acero joins inside mapInArrow tasks."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks
from f1_data_pipeline_spark.operators.bucket_join import (
    bucket_aligned_join,
    plan_bucket_pairs,
)


def _mk_pair(spark, tmp_path, n_fact=2000, n_dim=64, buckets=8):
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    fact = spark.range(n_fact).select(
        F.col("id").alias("k"),
        (F.col("id") % n_dim).alias("fk"),
        (F.col("id") * 2.0).alias("v"),
    )
    sinks.merge_upsert_manifest(
        spark, fact, fact_p, keys=["k"], partition_col=f"bucket({buckets}, fk)"
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("dk"),
        (F.col("id") % 7).alias("attr"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )
    sinks.merge_upsert_manifest(
        spark, dim, dim_p, keys=["dk"], partition_col=f"bucket({buckets}, dk)"
    )
    return fact_p, dim_p


def _shuffled(spark, fact_p, dim_p, how="inner"):
    f = sinks.read_manifest_table(spark, fact_p)
    d = sinks.read_manifest_table(spark, dim_p)
    return (
        f.join(d, f["fk"] == d["dk"], how)
        .select("k", "fk", "v", "attr", "name")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_parity_and_no_data_exchange(spark, tmp_path):
    fact_p, dim_p = _mk_pair(spark, tmp_path)
    got = bucket_aligned_join(spark, fact_p, dim_p, "fk", "dk")
    assert got.columns == ["k", "fk", "v", "attr", "name"]
    assert _rows(got) == _rows(_shuffled(spark, fact_p, dim_p))

    # the plan joins nothing in Spark and scans no data files: the only
    # exchange moves the N spec rows; the data path lives inside the task
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "FileScan" not in plan and "Scan parquet" not in plan
    assert "ArrowEvalPython" in plan or "MapInArrow" in plan or "PythonMapInArrow" in plan


def test_left_join_parity_including_null_keys(spark, tmp_path):
    """Unmatched fks and NULL fks: left join keeps them with null right
    columns; NULL keys match nothing (SQL) and live in the 'null'
    partition, which plans left-side-only."""
    fact_p, dim_p = _mk_pair(spark, tmp_path, n_dim=64)
    extra = spark.createDataFrame(
        [(90001, 999, 1.0), (90002, None, 2.0)],
        "k long, fk long, v double",
    )
    sinks.merge_upsert_manifest(
        spark, extra, fact_p, keys=["k"], partition_col="bucket(8, fk)"
    )
    got = bucket_aligned_join(spark, fact_p, dim_p, "fk", "dk", how="left")
    assert _rows(got) == _rows(_shuffled(spark, fact_p, dim_p, "left"))
    by_k = {r["k"]: r for r in got.collect()}
    assert by_k[90001]["attr"] is None and by_k[90002]["name"] is None

    # inner join drops both (999 unmatched, NULL matches nothing)
    inner = bucket_aligned_join(spark, fact_p, dim_p, "fk", "dk")
    ks = {r["k"] for r in inner.collect()}
    assert 90001 not in ks and 90002 not in ks


def test_bucket_pair_pruning(spark, tmp_path):
    """A right table whose keys occupy only SOME buckets: inner-join
    planning emits exactly the bucket pairs both manifests carry —
    files opened are the matching pairs only."""
    fact_p, dim_p = _mk_pair(spark, tmp_path)
    small_p = str(tmp_path / "small")
    # one dim key -> its single bucket
    one = spark.createDataFrame([(3, 1, "x")], "dk long, attr long, name string")
    sinks.merge_upsert_manifest(
        spark, one, small_p, keys=["dk"], partition_col="bucket(8, dk)"
    )
    plans = plan_bucket_pairs(fact_p, small_p, "inner")
    assert len(plans) == 1
    m = sinks.read_manifest(small_p)
    assert plans[0]["bucket"] in m["partitions"]
    got = bucket_aligned_join(spark, fact_p, small_p, "fk", "dk")
    want = _shuffled(spark, fact_p, small_p)
    assert _rows(got) == _rows(want) and got.count() > 0


def test_mor_deletes_respected(spark, tmp_path):
    fact_p, dim_p = _mk_pair(spark, tmp_path)
    sinks.delete_manifest_rows(spark, dim_p, [("dk", "=", 5)], mode="mor")
    sinks.delete_manifest_rows(spark, fact_p, [("k", "<", 100)], mode="mor")
    got = bucket_aligned_join(spark, fact_p, dim_p, "fk", "dk")
    assert _rows(got) == _rows(_shuffled(spark, fact_p, dim_p))
    assert got.filter("fk = 5").count() == 0
    assert got.filter("k < 100").count() == 0


def test_layout_validation_raises(spark, tmp_path):
    fact_p, dim_p = _mk_pair(spark, tmp_path, buckets=8)
    # different N
    other_p = str(tmp_path / "other")
    dim = spark.range(10).select(
        F.col("id").alias("dk"), F.col("id").alias("attr"),
        F.lit("z").alias("name"),
    )
    sinks.merge_upsert_manifest(
        spark, dim, other_p, keys=["dk"], partition_col="bucket(4, dk)"
    )
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucket_aligned_join(spark, fact_p, other_p, "fk", "dk")

    # identity layout
    ident_p = str(tmp_path / "ident")
    sinks.merge_upsert_manifest(
        spark, dim.withColumn("g", F.lit("a")), ident_p, keys=["dk"],
        partition_col="g",
    )
    with pytest.raises(ValueError, match="bucket"):
        bucket_aligned_join(spark, fact_p, ident_p, "fk", "dk")

    # key type mismatch (int dim key vs long fact fk)
    int_p = str(tmp_path / "intdim")
    idim = spark.range(10).select(
        F.col("id").cast("int").alias("dk"), F.col("id").alias("attr"),
        F.lit("z").alias("name"),
    )
    sinks.merge_upsert_manifest(
        spark, idim, int_p, keys=["dk"], partition_col="bucket(8, dk)"
    )
    with pytest.raises(ValueError, match="key types differ"):
        bucket_aligned_join(spark, fact_p, int_p, "fk", "dk")

    # join key that isn't the bucketed column
    with pytest.raises(ValueError, match="must be the bucketed columns"):
        bucket_aligned_join(spark, fact_p, dim_p, "k", "dk")


def test_colliding_right_columns_prefixed(spark, tmp_path):
    a_p, b_p = str(tmp_path / "a"), str(tmp_path / "b")
    a = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    b = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10.0).alias("v")
    )
    sinks.merge_upsert_manifest(spark, a, a_p, keys=["k"],
                                partition_col="bucket(4, k)")
    sinks.merge_upsert_manifest(spark, b, b_p, keys=["k"],
                                partition_col="bucket(4, k)")
    got = bucket_aligned_join(spark, a_p, b_p)
    assert got.columns == ["k", "v", "r_v"]
    assert got.count() == 50
    [r] = got.filter("k = 7").collect()
    assert (r["v"], r["r_v"]) == (7.0, 70.0)


def test_explain_reports_bucket_aligned_eligibility(spark, tmp_path):
    """EXPLAIN's decision record advertises the zero-shuffle path when
    both join sides are co-bucketed on the join keys — and stays silent
    when layouts don't align."""
    from f1_data_pipeline_spark.operators import catalog as CAT

    fact_p, dim_p = _mk_pair(spark, tmp_path)
    cat = str(tmp_path / "cat")
    CAT.catalog_create_table(cat, "bfact", fact_p)
    CAT.catalog_create_table(cat, "bdim", dim_p)
    rows = {r["table"]: r for r in CAT.catalog_sql(
        spark, cat,
        "EXPLAIN SELECT f.k FROM bfact f JOIN bdim d ON f.fk = d.dk",
    ).collect()}
    # round 11: the route is cost-gated, so at fixture scale the record
    # reports eligibility + the floor decision; forcing shows `taken:`
    assert rows["bfact"]["bucket_aligned"] is not None
    assert "below route floor" in rows["bfact"]["bucket_aligned"]
    assert rows["bdim"]["bucket_aligned"] == rows["bfact"]["bucket_aligned"]
    forced = {r["table"]: r for r in CAT.catalog_sql(
        spark, cat,
        "EXPLAIN SELECT f.k FROM bfact f JOIN bdim d ON f.fk = d.dk",
        bucket_joins="force",
    ).collect()}
    assert "bucket_aligned_join(bfact, bdim)" in \
        forced["bfact"]["bucket_aligned"]

    # misaligned N: no advisory
    other_p = str(tmp_path / "o4")
    d4 = spark.range(8).select(F.col("id").alias("dk"),
                               F.col("id").alias("attr"),
                               F.lit("x").alias("name"))
    sinks.merge_upsert_manifest(spark, d4, other_p, keys=["dk"],
                                partition_col="bucket(4, dk)")
    CAT.catalog_create_table(cat, "dim4", other_p)
    rows2 = {r["table"]: r for r in CAT.catalog_sql(
        spark, cat,
        "EXPLAIN SELECT f.k FROM bfact f JOIN dim4 d ON f.fk = d.dk",
    ).collect()}
    assert rows2["bfact"]["bucket_aligned"] is None


def test_hot_bucket_pair_raises_at_plan_time(spark, tmp_path):
    """A skewed bucket pair past max_pair_bytes fails LOUDLY at plan
    time (naming the bucket and remedies) instead of OOMing the task;
    None disables the guard; healthy pairs plan under the default and
    record their bytes."""
    fact_p, dim_p = _mk_pair(spark, tmp_path)
    pairs = plan_bucket_pairs(fact_p, dim_p)  # default budget: fine
    assert all(p["bytes"] > 0 for p in pairs)
    smallest = min(p["bytes"] for p in pairs)
    with pytest.raises(ValueError, match="re-bucket with a larger N"):
        plan_bucket_pairs(fact_p, dim_p, max_pair_bytes=smallest - 1)
    with pytest.raises(ValueError, match="max_pair_bytes"):
        bucket_aligned_join(
            spark, fact_p, dim_p, "fk", "dk", max_pair_bytes=1
        )
    assert len(
        plan_bucket_pairs(fact_p, dim_p, max_pair_bytes=None)
    ) == len(pairs)


def test_hot_bucket_sub_split_parity(spark, tmp_path):
    """Round-12 verdict #4: an oversized bucket pair SUB-SPLITS — the
    larger side's files pack into ≤-budget groups, each joined against
    the replicated smaller side in its own task — instead of refusing.
    Result parity with the shuffled join (inner AND left, hot side
    preserved), every sub-task under budget, and the loud raise remains
    for the unsound case (hot RIGHT side under a LEFT join)."""
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    fact = spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).alias("fk"),
        (F.col("id") * 2.0).alias("v"),
    ).repartition(6)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                   "false")
    try:
        sinks.merge_upsert_manifest(
            spark, fact, fact_p, keys=["k"], partition_col="bucket(4, fk)"
        )
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
    dim = spark.range(64).select(
        F.col("id").alias("dk"),
        (F.col("id") % 7).alias("attr"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )
    sinks.merge_upsert_manifest(
        spark, dim, dim_p, keys=["dk"], partition_col="bucket(4, dk)"
    )

    whole = plan_bucket_pairs(fact_p, dim_p)
    assert any(
        len(p["left_files"]) > 1 for p in whole
    ), "fixture must fabricate a multi-file hot side"
    cap = max(p["bytes"] for p in whole) - 1  # forces ≥1 split

    sub = plan_bucket_pairs(fact_p, dim_p, max_pair_bytes=cap)
    split_tasks = [p for p in sub if p.get("split")]
    assert len(sub) > len(whole) and split_tasks
    assert all(p["bytes"] <= cap for p in sub)
    # sub-tasks of one bucket carry unique task keys and the full
    # replicated dim side
    hot = split_tasks[0]["bucket"]
    hot_tasks = [p for p in sub if p["bucket"] == hot]
    assert len({p["task_key"] for p in hot_tasks}) == len(hot_tasks) > 1
    rf0 = hot_tasks[0]["right_files"]
    assert all(p["right_files"] == rf0 for p in hot_tasks)
    # the hot side's files partition exactly (no dup, no loss)
    whole_hot = next(p for p in whole if p["bucket"] == hot)
    got_files = [f for p in hot_tasks for f in p["left_files"]]
    assert sorted(got_files) == sorted(whole_hot["left_files"])
    assert len(set(got_files)) == len(got_files)

    # result parity: inner and left (hot side IS the preserved side)
    for how in ("inner", "left"):
        routed = bucket_aligned_join(
            spark, fact_p, dim_p, "fk", "dk", how=how, max_pair_bytes=cap
        )
        assert _rows(routed.select("k", "fk", "v", "attr", "name")) == \
            _rows(_shuffled(spark, fact_p, dim_p, how)), how

    # hot RIGHT side under a LEFT join: splitting the null-extending
    # side is unsound — the loud raise stays (dim LEFT-joins fact, and
    # fact is the bigger side)
    with pytest.raises(ValueError, match="cannot sub-split"):
        bucket_aligned_join(
            spark, dim_p, fact_p, "dk", "fk", how="left",
            max_pair_bytes=cap,
        )


def test_split_hot_pair_single_file_message():
    """Round-13 advice fix: one oversized hot-side file reports 'single
    file — nothing to split' — previously shadowed by the budget branch
    (a single file's max always exceeds an oversized pair's budget)."""
    from f1_data_pipeline_spark.operators.bucket_join import _split_hot_pair

    with pytest.raises(ValueError, match="single file"):
        _split_hot_pair(
            "bucket=0", "inner", 100,
            ["big.parquet"], [], [500],  # one 500-byte left file
            ["small.parquet"], [], [10],
        )
    # multi-file but no grouping fits: the budget message still fires
    with pytest.raises(ValueError, match="no file grouping fits"):
        _split_hot_pair(
            "bucket=0", "inner", 100,
            ["a.parquet", "b.parquet"], [], [500, 20],
            ["small.parquet"], [], [10],
        )
