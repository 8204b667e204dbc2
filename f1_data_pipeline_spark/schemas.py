"""Schema registry.

The reference declares its schema twice — physical DDL
(/root/reference/infra/schema_sql/formula_one.sql) and a logical JSON
name→type map (/root/reference/infra/schema/formula_one.json) consumed by its
CSV sanitizer (loaders/__init__.py:117-145). This module is the engine's
single equivalent: explicit StructTypes for every table we read or write,
plus the logical-type registry that drives `functions.scalars.sanitize`.

Spark enforces none of the reference's constraints (PK/UNIQUE/FK/NOT
NULL/CHECK/enum — formula_one.sql:8-24,28-31,111,127,158-165), so constraints
live here as *data-quality rules* evaluated by operators.sinks.quarantine.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/ — TESTDATA.md, FIXTURES.md §A)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # NOTE: on disk `ts` is parquet INT64 TIMESTAMP(NANOS); the engine reads
    # it with nanosAsLong and converts to a microsecond TimestampType
    # (sources/tables.py). This is the post-load logical schema.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)

# ---------------------------------------------------------------------------
# F1 domain schema (reference parity)
# Types per SURVEY.md §1.3 mapping of infra/schema/formula_one.json:1-136 and
# infra/schema_sql/formula_one.sql:27-243.
# ---------------------------------------------------------------------------


def _st(fields: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


# Session-type enum (formula_one.sql:8-24). Spark has no enum type — this is
# enforced as a quality rule (`isin`) by the quarantine operator.
SESSION_TYPES = (
    "R", "Q1", "Q2", "Q3", "QA", "QO", "QB",
    "FP1", "FP2", "FP3", "PQ", "SR", "SQ1", "SQ2", "SQ3",
)

F1_SCHEMAS: dict[str, T.StructType] = {
    # dims (formula_one.sql:27-96)
    "driver": _st(
        [
            ("id", T.IntegerType()),
            ("forename", T.StringType()),
            ("surname", T.StringType()),
            ("reference", T.StringType()),
            ("abbreviation", T.StringType()),
            ("nationality", T.StringType()),
            ("country_code", T.StringType()),
            ("permanent_car_number", T.ShortType()),
            ("date_of_birth", T.DateType()),
        ]
    ),
    "team": _st(
        [
            ("id", T.IntegerType()),
            ("name", T.StringType()),
            ("nationality", T.StringType()),
            ("reference", T.StringType()),
            ("country_code", T.StringType()),
        ]
    ),
    "season": _st([("id", T.IntegerType()), ("year", T.IntegerType())]),
    "circuit": _st(
        [
            ("id", T.IntegerType()),
            ("name", T.StringType()),
            ("reference", T.StringType()),
            ("country", T.StringType()),
            ("country_code", T.StringType()),
            ("locality", T.StringType()),
            ("latitude", T.DoubleType()),
            ("longitude", T.DoubleType()),
            ("altitude", T.DoubleType()),
        ]
    ),
    "round": _st(
        [
            ("id", T.IntegerType()),
            ("season_id", T.IntegerType()),
            ("circuit_id", T.IntegerType()),
            ("name", T.StringType()),
            ("date", T.DateType()),
            ("number", T.IntegerType()),
            ("race_number", T.IntegerType()),
        ]
    ),
    "session": _st(
        [
            ("id", T.IntegerType()),
            ("round_id", T.IntegerType()),
            ("number", T.IntegerType()),
            ("type", T.StringType()),
            ("scheduled_laps", T.IntegerType()),
            ("timestamp", T.TimestampType()),
            ("timezone", T.StringType()),
            ("is_cancelled", T.BooleanType()),
        ]
    ),
    "team_driver": _st(
        [
            ("id", T.IntegerType()),
            ("team_id", T.IntegerType()),
            ("driver_id", T.IntegerType()),
            ("season_id", T.IntegerType()),
        ]
    ),
    # facts (formula_one.sql:99-243)
    "race_result": _st(
        [
            ("id", T.IntegerType()),
            ("season_id", T.IntegerType()),
            ("round_id", T.IntegerType()),
            ("session_id", T.IntegerType()),
            ("driver_id", T.IntegerType()),
            ("team_id", T.IntegerType()),
            ("position", T.IntegerType()),
            ("position_text", T.StringType()),
            ("points", T.DecimalType(5, 2)),
            ("grid_position", T.IntegerType()),
            ("laps_completed", T.IntegerType()),
            ("status", T.StringType()),
            ("race_time_milliseconds", T.LongType()),
            ("fastest_lap_time", T.StringType()),
            ("fastest_lap_milliseconds", T.LongType()),
            ("fastest_lap_number", T.IntegerType()),
            ("fastest_lap_rank", T.IntegerType()),
        ]
    ),
    "qualifying_result": _st(
        [
            ("id", T.IntegerType()),
            ("season_id", T.IntegerType()),
            ("round_id", T.IntegerType()),
            ("last_session_id", T.IntegerType()),
            ("driver_id", T.IntegerType()),
            ("team_id", T.IntegerType()),
            ("position", T.IntegerType()),
            ("q1_time", T.StringType()),
            ("q1_time_milliseconds", T.LongType()),
            ("q2_time", T.StringType()),
            ("q2_time_milliseconds", T.LongType()),
            ("q3_time", T.StringType()),
            ("q3_time_milliseconds", T.LongType()),
        ]
    ),
    "sprint_result": _st(
        [
            ("id", T.IntegerType()),
            ("season_id", T.IntegerType()),
            ("round_id", T.IntegerType()),
            ("session_id", T.IntegerType()),
            ("driver_id", T.IntegerType()),
            ("team_id", T.IntegerType()),
            ("position", T.IntegerType()),
            ("position_text", T.StringType()),
            # NOT NULL in reference DDL but never supplied by its loader
            # (SURVEY.md §7.6) — engine derives it, nullable.
            ("position_order", T.IntegerType()),
            ("points", T.DecimalType(5, 2)),
            ("grid_position", T.IntegerType()),
            ("laps_completed", T.IntegerType()),
            ("status", T.StringType()),
            ("sprint_time_milliseconds", T.LongType()),
        ]
    ),
    "driver_championship": _st(
        [
            ("id", T.IntegerType()),
            ("season_id", T.IntegerType()),
            ("round_id", T.IntegerType()),
            ("session_id", T.IntegerType()),
            ("driver_id", T.IntegerType()),
            ("round_number", T.IntegerType()),
            ("session_number", T.IntegerType()),
            ("year", T.IntegerType()),
            ("position", T.ShortType()),
            ("points", T.DoubleType()),
            ("win_count", T.IntegerType()),
        ]
    ),
    "team_championship": _st(
        [
            ("id", T.IntegerType()),
            ("season_id", T.IntegerType()),
            ("round_id", T.IntegerType()),
            ("session_id", T.IntegerType()),
            ("team_id", T.IntegerType()),
            ("round_number", T.IntegerType()),
            ("session_number", T.IntegerType()),
            ("year", T.IntegerType()),
            ("position", T.IntegerType()),
            ("points", T.DoubleType()),
            ("win_count", T.IntegerType()),
        ]
    ),
    # control plane (metadata.sql:4-28)
    "sync_status": _st(
        [
            ("entity_name", T.StringType()),
            ("last_updated", T.TimestampType()),
            ("last_successful_sync", T.TimestampType()),
            ("status", T.StringType()),
            ("error_message", T.StringType()),
            ("total_records", T.IntegerType()),
            ("last_season_year", T.IntegerType()),
            ("last_round_number", T.IntegerType()),
        ]
    ),
    "sync_log": _st(
        [
            ("id", T.IntegerType()),
            ("entity_name", T.StringType()),
            ("sync_timestamp", T.TimestampType()),
            ("status", T.StringType()),
            ("records_affected", T.IntegerType()),
            ("duration_seconds", T.IntegerType()),
            ("error_message", T.StringType()),
        ]
    ),
}

# ---------------------------------------------------------------------------
# Logical type registry for the sanitizer (reference:
# infra/schema/formula_one.json consumed at loaders/__init__.py:117-145).
# Maps table → column → logical type tag; functions.scalars.sanitize turns
# tags into cast expressions (G6-G10 in SURVEY.md §2.G).
# ---------------------------------------------------------------------------

def _tag(dt: T.DataType) -> str:
    if isinstance(dt, (T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, T.ShortType):
        return "smallint"
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    return "str"


LOGICAL_TYPES: dict[str, dict[str, str]] = {
    table: {f.name: _tag(f.dataType) for f in st.fields}
    for table, st in F1_SCHEMAS.items()
}

# Unique keys per table (composite uniques formula_one.sql:111,127,165,203,242
# and single-column PKs/uniques) — used by sinks (anti-join dedup, upsert keys).
NATURAL_KEYS: dict[str, list[str]] = {
    "driver": ["reference"],
    "team": ["reference"],
    "season": ["year"],
    "circuit": ["reference"],
    "round": ["season_id", "number"],
    "session": ["round_id", "number"],
    "team_driver": ["team_id", "driver_id", "season_id"],
    "race_result": ["season_id", "round_id", "driver_id"],
    "qualifying_result": ["season_id", "round_id", "driver_id"],
    "sprint_result": ["season_id", "round_id", "driver_id"],
    "driver_championship": ["season_id", "round_id", "driver_id"],
    "team_championship": ["season_id", "round_id", "team_id"],
    "sync_status": ["entity_name"],
}


def get_table_schema(table: str) -> T.StructType:
    """Look up a schema in either registry (testdata first, then F1)."""
    if table in TESTDATA_SCHEMAS:
        return TESTDATA_SCHEMAS[table]
    return F1_SCHEMAS[table]
