"""Parquet table readers.

Reference analog: the five dimension scans + CSV parses that feed every load
(/root/reference/loaders/base_loader.py:185-204, loaders/__init__.py:32-35).
Here all tables are columnar Parquet read by Spark's vectorized reader, so
predicate pushdown and column pruning come from Catalyst — callers should
`.select`/`.filter` on the returned DataFrame and let the optimizer push.

Scale note: at 100 TB these reads become directory-partitioned datasets
(facts partitioned by date/season); the API is path-based so that swap is
transparent to every operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from f1_data_pipeline_spark.schemas import TESTDATA_TABLES

# Timestamp columns whose on-disk parquet encoding has varied across
# testdata generations: INT64 TIMESTAMP(NANOS) (rounds 1-2) or
# TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 3+). Spark (through 4.x)
# has no nanosecond timestamp type and refuses NANOS columns unless
# spark.sql.legacy.parquet.nanosAsLong=true, which surfaces them as epoch-ns
# longs; we then convert ns → µs with integer division (floor), matching how
# DuckDB's reader coerces the same column — required for oracle parity.
# MICROS/NTZ data needs no conversion, only a wall-clock-preserving cast to
# the engine's TimestampType so the post-load logical schema is stable
# across encodings. load_table dispatches on the SURFACED type, so either
# encoding (or a plain session without the nanos conf) works.
NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
}


def _ensure_nanos_conf(spark: SparkSession) -> None:
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table from `sf_dir`, normalizing ns timestamps to µs."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nano_cols = NANO_TS_COLUMNS.get(name, ())
    if nano_cols:
        _ensure_nanos_conf(spark)
    df = spark.read.parquet(path)
    for c in nano_cols:
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):
            # nanos surfaced as epoch-ns longs: integer division keeps full
            # precision (ns values exceed 2^53, so a double-division would
            # corrupt low bits); floor matches DuckDB.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # µs/NTZ encoding: the cast reinterprets the wall clock in the
            # session zone and collect() renders it back in the same zone,
            # so values match DuckDB's naive read under any timezone.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        else:
            # any other surfaced type (e.g. plain TimestampType when NTZ
            # inference is off, or a UTC-adjusted MICROS file) would pass
            # through silently timezone-shifted vs DuckDB's naive read —
            # fail loudly so a new testdata encoding gets an explicit
            # normalization branch instead of wrong values.
            raise TypeError(
                f"{name}.{c}: unexpected surfaced type {dt.simpleString()}; "
                "load_table normalizes LongType (legacy nanos) and "
                "TimestampNTZType (µs) — add a branch for this encoding"
            )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register all testdata tables as temp views for spark.sql() plans."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
