"""Registry entries for scalar functions (SURVEY.md §2.G).

Test strings are *constructed deterministically from integer columns* on both
sides (identical CONCAT logic in Spark and DuckDB) so parsing behavior — not
string-formatting differences between engines — is what gets compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_data_pipeline_spark.functions import scalars as S
from f1_data_pipeline_spark.queries import register
from f1_data_pipeline_spark.sources import load_table


# --- G1+G5 order scalars: year extraction + null-on-malformed int parse --------

def q_fn_order_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    # year() (G1) plus safe_int (G5): priority "3-MEDIUM" → leading digit
    # parses; a corrupted variant must null out instead of raising
    # (reference base_loader.py:224-229). The D1/D2 extrema row
    # (q_agg_extrema, queries_relational.py) broadcasts onto every output
    # row — 1-row crossJoin, no shuffle — so both aggregate values stay
    # hash-verified without their own registry slot.
    from f1_data_pipeline_spark.queries_relational import q_agg_extrema

    o = load_table(spark, sf_dir, "orders")
    raw = F.when(
        F.col("o_orderstatus") == "P", F.lit("corrupt")
    ).otherwise(F.substring("o_orderpriority", 1, 1))
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        raw.alias("raw_priority"),
        S.safe_int(raw).alias("priority_num"),
    ).crossJoin(F.broadcast(q_agg_extrema(spark, sf_dir)))


register(
    "fn_order_scalars",
    q_fn_order_scalars,
    """
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
           CASE WHEN o_orderstatus = 'P' THEN 'corrupt'
                ELSE substr(o_orderpriority, 1, 1) END AS raw_priority,
           TRY_CAST(CASE WHEN o_orderstatus = 'P' THEN 'corrupt'
                         ELSE substr(o_orderpriority, 1, 1) END AS INT) AS priority_num,
           (SELECT MAX(o_totalprice) FROM orders
            WHERE EXTRACT(YEAR FROM o_orderdate) = 1997) AS max_totalprice,
           (SELECT CAST(COALESCE(MAX(o_orderkey), 0) AS BIGINT)
            FROM orders WHERE o_totalprice < 0) AS next_id_base
    FROM orders
    """,
)


# --- G4+G7+G8+G9+G10 lineitem scalars (one per-row composite) -------------------
# laptime parse: build "M:SS.mmm" from integers; rows with l_returnflag='R'
# get a malformed string that must parse to NULL (reference nulls on
# ValueError, base_loader.py:220-222). Plus smallint clip, str→bool, and the
# float/date safe casts (loaders/__init__.py:134-141) over the same rows.

def q_fn_lineitem_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lap = F.when(
        F.col("l_returnflag") == "R", F.lit("not:a:time")
    ).otherwise(
        F.concat(
            (F.col("l_linenumber") % 10).cast("string"),
            F.lit(":"),
            F.lpad((F.col("l_orderkey") % 60).cast("string"), 2, "0"),
            F.lit("."),
            F.lpad((F.col("l_partkey") % 1000).cast("string"), 3, "0"),
        )
    )
    signed = (F.col("l_partkey") % 100000) - 50000
    raw_flag = (
        F.when(F.col("l_returnflag") == "A", F.lit("TRUE"))
        .when(F.col("l_returnflag") == "N", F.lit("f"))
        .otherwise(F.lit("maybe"))
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        lap.alias("lap_time"),
        S.laptime_to_ms(lap).alias("lap_ms"),
        signed.cast("int").alias("signed_val"),
        S.to_smallint_clip(signed).cast("int").alias("clipped_val"),
        raw_flag.alias("raw_flag"),
        S.str_to_bool(raw_flag).alias("bool_flag"),
        S.to_float(F.col("l_tax").cast("string")).alias("tax_f"),
        S.to_float("l_returnflag").alias("junk_f"),
        S.to_date_safe(F.col("l_shipdate").cast("string")).alias("ship_d"),
        S.to_date_safe("l_returnflag").alias("junk_d"),
    )


register(
    "fn_lineitem_scalars",
    q_fn_lineitem_scalars,
    """
    WITH t AS (
        SELECT l_orderkey, l_linenumber, l_partkey, l_tax, l_shipdate, l_returnflag,
               CASE WHEN l_returnflag = 'R' THEN 'not:a:time'
                    ELSE CAST(l_linenumber % 10 AS VARCHAR) || ':' ||
                         LPAD(CAST(l_orderkey % 60 AS VARCHAR), 2, '0') || '.' ||
                         LPAD(CAST(l_partkey % 1000 AS VARCHAR), 3, '0')
               END AS lap_time,
               CASE l_returnflag WHEN 'A' THEN 'TRUE'
                                 WHEN 'N' THEN 'f'
                                 ELSE 'maybe' END AS raw_flag
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, lap_time,
           CASE WHEN regexp_matches(lap_time, '^\\d+:\\d{1,2}(\\.\\d{1,3})?$')
                THEN TRY_CAST(string_split(lap_time, ':')[1] AS BIGINT) * 60000
                     + TRY_CAST(string_split(string_split(lap_time, ':')[2], '.')[1] AS BIGINT) * 1000
                     + COALESCE(TRY_CAST(rpad(string_split(string_split(lap_time, ':')[2], '.')[2], 3, '0') AS BIGINT), 0)
           END AS lap_ms,
           CAST(l_partkey % 100000 - 50000 AS INT) AS signed_val,
           CAST(GREATEST(-32768, LEAST(32767, l_partkey % 100000 - 50000)) AS INT) AS clipped_val,
           raw_flag,
           CASE WHEN lower(raw_flag) IN ('true','t') THEN TRUE
                WHEN lower(raw_flag) IN ('false','f') THEN FALSE
           END AS bool_flag,
           TRY_CAST(CAST(l_tax AS VARCHAR) AS DOUBLE) AS tax_f,
           TRY_CAST(l_returnflag AS DOUBLE) AS junk_f,
           TRY_CAST(CAST(l_shipdate AS VARCHAR) AS DATE) AS ship_d,
           TRY_CAST(l_returnflag AS DATE) AS junk_d
    FROM t
    """,
)


# --- G11 JSON path ------------------------------------------------------------------

def q_fn_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = S.json_get("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.count(k).alias("n_with_k"),
        )
    )


register(
    "fn_json_path",
    q_fn_json_path,
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
    FROM events GROUP BY event_type
    """,
)


# --- G13 sanitize composite -----------------------------------------------------------
# Stringified integer/bool/date inputs coerced back to declared types via the
# same table-driven sanitize the F1 loaders use.

def q_sanitize_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.col("event_id").cast("string").alias("id"),
        F.when(F.col("event_type") == "error", F.lit("nan"))
        .otherwise(F.col("event_type"))
        .alias("name"),
        (F.col("user_id") % 2 == 0).cast("string").alias("flag_str"),
        (F.col("user_id") % 70000 - 35000).cast("string").alias("small"),
    )
    # reuse sanitize vocabulary directly (table registry is F1-specific)
    from f1_data_pipeline_spark.functions.scalars import (
        safe_int,
        str_sanitize,
        str_to_bool,
        to_smallint_clip,
    )

    return raw.select(
        safe_int("id").alias("id"),
        str_sanitize("name").alias("name"),
        str_to_bool("flag_str").alias("flag"),
        to_smallint_clip("small").cast("int").alias("small"),
    )


register(
    "sanitize_composite",
    q_sanitize_composite,
    """
    WITH raw AS (
        SELECT CAST(event_id AS VARCHAR) AS id,
               CASE WHEN event_type = 'error' THEN 'nan' ELSE event_type END AS name,
               CAST(user_id % 2 = 0 AS VARCHAR) AS flag_str,
               CAST(user_id % 70000 - 35000 AS VARCHAR) AS small
        FROM events
    )
    SELECT TRY_CAST(id AS INT) AS id,
           CASE WHEN name IN ('nan','NaT','None','') THEN NULL ELSE name END AS name,
           CASE WHEN lower(flag_str) IN ('true','t') THEN TRUE
                WHEN lower(flag_str) IN ('false','f') THEN FALSE END AS flag,
           CAST(GREATEST(-32768, LEAST(32767, COALESCE(TRY_CAST(small AS INT), 0))) AS INT) AS small
    FROM raw
    """,
)


# --- G8/G10 float and date safe casts: inside `fn_lineitem_scalars` above ----------
