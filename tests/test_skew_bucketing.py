"""Skew mitigation + bucketing: correctness AND the plan/distribution
properties that motivate them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks, skew
from f1_data_pipeline_spark.plans import audit
from f1_data_pipeline_spark.sources import load_table


# --- salted join -----------------------------------------------------------------


def _skewed_frames(spark):
    # 90% of rows share one hot key
    big = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [Row(k=i, label=f"dim{i}") for i in range(50)]
    )
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, "k").select("k", "payload", "label")
    salted = skew.salted_join(big, small, "k", salt_n=8).select(
        "k", "payload", "label"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    big, small = _skewed_frames(spark)
    b = big.withColumn("s", skew._det_salt(["payload"], 8))
    # the hot key's rows land on >1 salt → >1 shuffle partition
    n_salts = b.filter(F.col("k") == 7).select("s").distinct().count()
    assert n_salts > 1


def test_salted_join_deterministic_salt(spark):
    big, small = _skewed_frames(spark)
    a = skew.salted_join(big, small, "k").collect()
    b = skew.salted_join(big, small, "k").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# --- salted two-phase distinct ----------------------------------------------------


def test_salted_distinct_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    truth = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    got = {
        r["event_type"]: r["distinct_user_id"]
        for r in skew.salted_two_phase_agg(ev, ["event_type"], "user_id").collect()
    }
    assert got == truth


# --- bucketed co-located join -----------------------------------------------------


def test_bucketed_join_no_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    sinks.write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    sinks.write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=8)
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.join(
            bl.hint("merge"), bo.o_orderkey == bl.l_orderkey
        )
        plan = audit.executed_plan(joined)
        # co-located buckets: the join runs with no shuffle on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
