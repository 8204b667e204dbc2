"""Standings recompute — the flagship query (SURVEY.md §2.L X1).

The reference stores API-precomputed championship standings
(/root/reference/loaders/__init__.py:517-528,598-609); the engine *derives*
them: aggregate points per entity per grouping, then rank with a window.
Expressed over the driver testdata's TPC-H-ish tables, the same shape is
"customer standings within nation": revenue ⇒ points, urgent finished
orders ⇒ wins, rank() over nation partition ⇒ championship position.

Exercises one of every operator family in a single plan:
scan → filter (pushed to parquet) → join (shuffle + broadcast) →
partial/final agg → window rank → order.

Scale notes (100 TB): lineitem⋈orders is the only big-big join — both sides
shuffle on orderkey (at warehouse scale, bucket both by orderkey to make it
co-located). The per-customer aggregate reduces cardinality ~15× before the
customer join; nation is broadcast. AQE handles skewed customers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_data_pipeline_spark.sources import load_table


def customer_standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank customers by delivered revenue within their nation.

    Oracle-parity contract: `points` is rounded to 2 decimals *before*
    ranking so Spark and DuckDB rank identical values; ties broken by
    customer name for full determinism.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    # Revenue per order first: shrinks the fact before the customer join.
    # Each product term is one double multiply (bit-identical across engines);
    # accumulating in DECIMAL makes the multi-row sum order-independent and
    # therefore exactly reproducible by the oracle.
    #
    # r13: semi-filter lineitem on the filtered orders' keys BEFORE the
    # decimal aggregate (guide §3.2 — reduce the big side early). Only
    # ~half of orders pass status='F', and the inner join below discards
    # the rest's revenue groups anyway — pre-dropping their lineitems
    # halves the double→decimal casts + exact-decimal sums, the expensive
    # per-row work of this plan. At bench scale the semi probes the SAME
    # broadcast relation the inner join builds; at warehouse scale it
    # becomes an SMJ-semi on l_orderkey whose output partitioning the
    # groupBy and the orders join then REUSE (no added lineitem exchange —
    # one extra orders-side exchange buys half the aggregate work).
    # Measured at sf0.1: 2.82 → 1.84 s, byte-identical output.
    order_rev = (
        lineitem.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_semi",
        )
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("rev")
        )
    )

    per_customer = (
        orders.join(order_rev, orders.o_orderkey == order_rev.l_orderkey, "inner")
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("rev"), 2).cast("double").alias("points"),
            F.count("*").alias("races"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("wins"),
        )
    )

    w = Window.partitionBy("nation").orderBy(F.desc("points"), F.asc("customer"))
    return (
        per_customer.join(
            customer, per_customer.o_custkey == customer.c_custkey, "inner"
        )
        .join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
            "inner",
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_name").alias("customer"),
            "points",
            F.col("races").cast("long").alias("races"),
            F.col("wins").cast("long").alias("wins"),
        )
        .withColumn("position", F.rank().over(w).cast("long"))
    )


CUSTOMER_STANDINGS_SQL = """
WITH order_rev AS (
    SELECT l_orderkey,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev
    FROM lineitem GROUP BY l_orderkey
), per_customer AS (
    SELECT o_custkey,
           CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS points,
           COUNT(*) AS races,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS wins
    FROM orders JOIN order_rev ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_custkey
)
SELECT n_name AS nation,
       c_name AS customer,
       points,
       races,
       wins,
       RANK() OVER (PARTITION BY n_name ORDER BY points DESC, c_name ASC) AS position
FROM per_customer
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
"""
