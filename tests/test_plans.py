"""Plan-shape regression tests: the properties that matter at 100 TB.

A lost predicate pushdown or an accidental cartesian join is invisible in
small-SF correctness runs but catastrophic at scale — pin them here.
"""

from __future__ import annotations

import pytest

from f1_data_pipeline_spark.plans import audit
from f1_data_pipeline_spark.queries import QUERIES


def test_flagship_pushdown_and_pruning(spark, sf_dir):
    df = QUERIES["standings_recompute"](spark, sf_dir)
    filters = " ".join(audit.pushed_filters(df))
    # the o_orderstatus='F' predicate must reach the orders parquet scan
    assert "EqualTo(o_orderstatus" in filters, filters
    # lineitem scan must be pruned to its 3 needed columns
    li = [s for s in audit.read_schemas(df) if "l_orderkey" in s]
    assert li and all(
        "l_comment" not in s and "l_shipdate" not in s for s in li
    ), li


def test_flagship_join_strategies(spark, sf_dir):
    js = audit.join_strategies(QUERIES["standings_recompute"](spark, sf_dir))
    # nation/customer joins broadcast; never a cartesian/nested-loop plan
    assert js["broadcast_hash"] >= 1
    assert js["cartesian"] == 0 and js["broadcast_nested_loop"] == 0


def test_fk_lookup_broadcasts(spark, sf_dir):
    # standalone C2 form (registry slot is the filter_fk_resolved composite)
    from f1_data_pipeline_spark.queries_relational import q_join_fk_lookup

    js = audit.join_strategies(q_join_fk_lookup(spark, sf_dir))
    assert js["broadcast_hash"] >= 1
    assert js["cartesian"] == 0


def test_anti_join_not_cartesian(spark, sf_dir):
    # tagged composite carries both the anti and semi existence joins
    js = audit.join_strategies(QUERIES["membership_ops"](spark, sf_dir))
    assert js["cartesian"] == 0 and js["broadcast_nested_loop"] == 0


def test_window_aggs_single_shuffle(spark, sf_dir):
    """Tumbling agg: one shuffle (partial→final agg), no join machinery."""
    from f1_data_pipeline_spark.queries_streaming import q_tumbling

    js = audit.join_strategies(q_tumbling(spark, sf_dir))
    assert js["exchanges"] <= 2  # agg exchange (+ AQE reader wrapper)
    assert js["cartesian"] == 0


def test_as_of_join_single_shuffle(spark, sf_dir):
    """Union-window as-of join must stay a single key shuffle — a range
    cross-join here would explode quadratically on hot users."""
    js = audit.join_strategies(QUERIES["as_of_join"](spark, sf_dir))
    assert js["cartesian"] == 0 and js["broadcast_nested_loop"] == 0
    assert js["sort_merge"] == 0 and js["shuffled_hash"] == 0


def test_pricing_summary_pushdown(spark, sf_dir):
    df = QUERIES["pricing_summary"](spark, sf_dir)
    assert audit.pushed_filters(df), "date filter should reach the scan"


def test_dedup_minhash_no_cartesian(spark, sf_dir):
    """MinHash LSH candidate generation must join on band buckets, never
    compare all pairs."""
    from f1_data_pipeline_spark.queries_text import q_dedup_minhash

    js = audit.join_strategies(q_dedup_minhash(spark, sf_dir))
    assert js["cartesian"] == 0 and js["broadcast_nested_loop"] == 0


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Facts partitioned by date: a day predicate must prune partitions at
    the scan (the reference's season-leading indexes become directory
    partitioning at 100 TB — SURVEY §4.1)."""
    import pyspark.sql.functions as F

    from f1_data_pipeline_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    ev.write.mode("overwrite").partitionBy("day").parquet(path)

    q = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    fplan = audit.formatted_plan(q)
    # the day filter appears as a partition filter, not a data filter
    assert "PartitionFilters" in fplan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", fplan)
    assert m and "day" in m.group(1), fplan[:800]
    # and the scan reads only the one matching directory
    n_parts = q.rdd.getNumPartitions()
    assert q.count() > 0


def test_range_join_is_hash_join(spark, sf_dir):
    """The time-bucketed range join must plan as a hash/merge equi-join —
    the naive range predicate would be a nested loop over all pairs."""
    js = audit.join_strategies(QUERIES["range_join"](spark, sf_dir))
    assert js["broadcast_nested_loop"] == 0 and js["cartesian"] == 0
    assert (
        js["broadcast_hash"] + js["sort_merge"] + js["shuffled_hash"] >= 1
    )


def test_contamination_broadcasts_eval_pool(spark, sf_dir):
    """Eval n-gram pool must broadcast — a shuffled join of corpus grams
    against the pool would shuffle the whole exploded corpus at scale."""
    js = audit.join_strategies(QUERIES["contamination_check"](spark, sf_dir))
    assert js["broadcast_hash"] >= 1
    assert js["cartesian"] == 0 and js["broadcast_nested_loop"] == 0


def test_train_test_split_no_shuffle(spark, sf_dir):
    """Split assignment is a pure projection: zero exchanges, zero joins."""
    js = audit.join_strategies(QUERIES["train_test_split"](spark, sf_dir))
    assert js["exchanges"] == 0
    plan = audit.executed_plan(QUERIES["train_test_split"](spark, sf_dir))
    assert "Exchange" not in plan


def test_token_packing_single_exchange_per_window(spark, sf_dir):
    """Packing shuffles once by shard for the window; the groupBy reuses
    the shard partitioning (partial agg) — no cartesian anywhere."""
    js = audit.join_strategies(QUERIES["token_packing"](spark, sf_dir))
    assert js["cartesian"] == 0 and js["broadcast_nested_loop"] == 0
    assert js["exchanges"] <= 3  # window shard exchange + agg (+ AQE wrapper)


def test_pivot_single_aggregate_no_joins(spark, sf_dir):
    """Explicit pivot values: one grouped aggregate, no join machinery and
    no second scan to discover the pivot columns."""
    js = audit.join_strategies(QUERIES["pivot_daily_types"](spark, sf_dir))
    assert js["cartesian"] == 0 and js["broadcast_nested_loop"] == 0
    plan = audit.executed_plan(QUERIES["pivot_daily_types"](spark, sf_dir))
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2
