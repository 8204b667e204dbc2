"""Unit tests for functions.scalars (edge cases per SURVEY.md §5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_pipeline_spark.functions import scalars as S


def _one(spark, value, expr):
    df = spark.createDataFrame([(value,)], "x: string")
    return df.select(expr.alias("y")).collect()[0].y


def test_laptime_basic(spark):
    assert _one(spark, "1:23.456", S.laptime_to_ms(F.col("x"))) == 83456


def test_laptime_no_fraction(spark):
    assert _one(spark, "2:05", S.laptime_to_ms(F.col("x"))) == 125000


def test_laptime_short_fraction_pads(spark):
    # ".4" means 400 ms, not 4 ms
    assert _one(spark, "0:01.4", S.laptime_to_ms(F.col("x"))) == 1400


def test_laptime_malformed_and_null(spark):
    assert _one(spark, "garbage", S.laptime_to_ms(F.col("x"))) is None
    assert _one(spark, None, S.laptime_to_ms(F.col("x"))) is None
    assert _one(spark, "1:23.4567", S.laptime_to_ms(F.col("x"))) is None  # >3 digits


def test_safe_int(spark):
    assert _one(spark, "42", S.safe_int(F.col("x"))) == 42
    assert _one(spark, "x42", S.safe_int(F.col("x"))) is None


def test_smallint_clip_bounds(spark):
    assert _one(spark, "40000", S.to_smallint_clip(F.col("x"))) == 32767
    assert _one(spark, "-40000", S.to_smallint_clip(F.col("x"))) == -32768
    assert _one(spark, "123", S.to_smallint_clip(F.col("x"))) == 123
    assert _one(spark, "junk", S.to_smallint_clip(F.col("x"))) == 0  # fillna(0)


def test_str_sanitize_sentinels(spark):
    assert _one(spark, "nan", S.str_sanitize(F.col("x"))) is None
    assert _one(spark, "NaT", S.str_sanitize(F.col("x"))) is None
    assert _one(spark, "ok", S.str_sanitize(F.col("x"))) == "ok"


def test_str_to_bool(spark):
    assert _one(spark, "True", S.str_to_bool(F.col("x"))) is True
    assert _one(spark, "f", S.str_to_bool(F.col("x"))) is False
    assert _one(spark, "yes", S.str_to_bool(F.col("x"))) is None


def test_sanitize_table_driven(spark):
    # season: id int, year int (schemas.LOGICAL_TYPES["season"])
    raw = spark.createDataFrame(
        [("1", "2024"), ("bad", "2025")], "id: string, year: string"
    )
    out = S.sanitize(raw, "season").collect()
    assert [(r.id, r.year) for r in out] == [(1, 2024), (0, 2025)]
