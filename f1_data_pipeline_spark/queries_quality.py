"""Registry entries for data-quality / sink dataflow operators
(SURVEY.md §2.I I1 quarantine, §2.A A8 surrogate keys, §2.C C5 FK check)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import sinks
from f1_data_pipeline_spark.queries import register
from f1_data_pipeline_spark.sources import load_table

EVENT_TYPES_OK = ["click", "view", "purchase", "signup"]


# --- I1 quarantine: rejected rows with named violations ------------------------

def q_quarantine_bad_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    _, rejected = sinks.quarantine(
        ev,
        [
            sinks.not_null_rule("user_id"),
            sinks.enum_rule("event_type", EVENT_TYPES_OK),
            sinks.range_rule("value", 0.0, 10.0),
        ],
    )
    return rejected.select(
        "event_id",
        "event_type",
        "value",
        F.concat_ws(",", "_violations").alias("violations"),
    )


_QUARANTINE_SQL = """
    WITH tagged AS (
        SELECT event_id, event_type, value,
               array_to_string(list_filter([
                   CASE WHEN user_id IS NULL THEN 'not_null:user_id' END,
                   CASE WHEN NOT (event_type IN ('click','view','purchase','signup')
                                  OR event_type IS NULL)
                        THEN 'enum:event_type' END,
                   CASE WHEN NOT (value BETWEEN 0.0 AND 10.0 OR value IS NULL)
                        THEN 'range:value' END
               ], x -> x IS NOT NULL), ',') AS violations
        FROM events
    )
    SELECT event_id, event_type, value, violations
    FROM tagged WHERE violations <> ''
"""


# --- table profiling (pre/post-load QA pass) ------------------------------------

_EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full profile of `events` — per-column null counts/fractions and exact
    cardinalities plus a fixed-width histogram of `value` (width 2.0,
    overflow bucket 10) — in one long (col_name, stat, value) frame
    (operators/profile.py). Numeric-only values keep the oracle hash free of
    engine-specific string formatting."""
    from f1_data_pipeline_spark.operators.profile import profile_with_histogram

    ev = load_table(spark, sf_dir, "events")
    return profile_with_histogram(ev, "value", 2.0, 10, columns=_EV_COLS)


def _profile_sql() -> str:
    parts = [
        "SELECT '*' AS col_name, 'n_rows' AS stat,"
        " CAST(COUNT(*) AS DOUBLE) AS value FROM events"
    ]
    for c in _EV_COLS:
        parts += [
            f"SELECT '{c}', 'n_nulls', CAST(COUNT(*) - COUNT({c}) AS DOUBLE)"
            " FROM events",
            f"SELECT '{c}', 'null_frac', ROUND(CAST(COUNT(*) - COUNT({c})"
            " AS DOUBLE) / COUNT(*), 6) FROM events",
            f"SELECT '{c}', 'n_distinct', CAST(COUNT(DISTINCT {c}) AS DOUBLE)"
            " FROM events",
        ]
    parts.append(
        "SELECT 'value', 'hist_' || lpad(CAST(b AS VARCHAR), 2, '0'),"
        " CAST(COUNT(*) AS DOUBLE) FROM ("
        "SELECT LEAST(GREATEST(CAST(FLOOR(value / 2.0) AS INT), 0), 10) AS b"
        " FROM events WHERE value IS NOT NULL) GROUP BY 1, 2"
    )
    return "\nUNION ALL\n".join(parts)


register("profile_events", q_profile_events, _profile_sql())


# --- A8/§7.5 surrogate key allocation -------------------------------------------

def q_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "existing" table contributes MAX(id); new rows get max+row_number over
    # the declared natural-key order (deterministic SERIAL fidelity).
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id")
    )
    new_rows = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select(F.lit(None).cast("long").alias("id"), "c_custkey", "c_name")
    )
    out = sinks.allocate_surrogate_keys(
        new_rows, supplier, "id", [F.asc("c_custkey")]
    )
    return out.select(F.col("id").cast("long").alias("id"), "c_custkey", "c_name")


register(
    "surrogate_keys",
    q_surrogate_keys,
    """
    SELECT (SELECT COALESCE(MAX(s_suppkey), 0) FROM supplier)
           + ROW_NUMBER() OVER (ORDER BY c_custkey ASC) AS id,
           c_custkey, c_name
    FROM customer WHERE c_acctbal > 7000
    """,
)


# --- C5 FK integrity check --------------------------------------------------------

def q_fk_integrity_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # inject violations: orders with custkey shifted out of range for a slice
    orders = load_table(spark, sf_dir, "orders")
    fact = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 100 == 0, F.col("o_custkey") + 1000000)
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
    )
    dim = load_table(spark, sf_dir, "customer")
    return sinks.fk_violations(fact, "o_custkey", dim, "c_custkey")


def q_dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both data-quality violation reports in one tagged union: the
    quarantine rejects over events (I1 rule engine — null/enum/range, named
    violations) and the FK integrity scan over orders (C5). Arms align on
    (arm, row_key, detail, metric): quarantine carries the violation list
    and the offending value; FK carries the dangling key."""
    quarantine = q_quarantine_bad_rows(spark, sf_dir).select(
        F.lit("quarantine").alias("arm"),
        F.col("event_id").alias("row_key"),
        F.concat_ws("|", F.coalesce("event_type", F.lit("")), "violations").alias(
            "detail"
        ),
        F.col("value").alias("metric"),
    )
    fk = q_fk_integrity_violations(spark, sf_dir).select(
        F.lit("fk").alias("arm"),
        F.col("o_orderkey").alias("row_key"),
        F.lit("dangling:o_custkey").alias("detail"),
        F.col("o_custkey").cast("double").alias("metric"),
    )
    return quarantine.unionAll(fk)


register(
    "dq_violations",
    q_dq_violations,
    f"""
    SELECT 'quarantine' AS arm, event_id AS row_key,
           COALESCE(event_type, '') || '|' || violations AS detail,
           value AS metric
    FROM ({_QUARANTINE_SQL})
    UNION ALL
    SELECT 'fk', o_orderkey, 'dangling:o_custkey', CAST(o_custkey AS DOUBLE)
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 100 = 0 THEN o_custkey + 1000000
                    ELSE o_custkey END AS o_custkey
        FROM orders
    ) f
    WHERE o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = f.o_custkey)
    """,
)
