"""Scalar expression library (SURVEY.md §2.G).

Every helper returns a Column built from pyspark.sql.functions so it stays
inside whole-stage codegen — these replace the reference's row-at-a-time
Python helpers (base_loader.py:214-229) and its pandas sanitizer
(loaders/__init__.py:117-145) with vectorized JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from f1_data_pipeline_spark.schemas import LOGICAL_TYPES

# ---------------------------------------------------------------------------
# G4 — lap-time parsing: "M:SS.mmm" → integer milliseconds, null on malformed
# Reference: convert_time_to_ms, base_loader.py:214-222.
# ---------------------------------------------------------------------------

_LAPTIME_RE = r"^\d+:\d{1,2}(\.\d{1,3})?$"


def laptime_to_ms(col: Column | str) -> Column:
    """Parse "M:SS.mmm" into bigint ms; null for null/malformed input.

    Pure integer arithmetic (no float round-trip): minutes*60000 +
    seconds*1000 + zero-padded fraction — exact, and reproducible bit-for-bit
    by any SQL oracle. try_cast keeps malformed inputs null under ANSI mode.
    """
    c = F.col(col) if isinstance(col, str) else col
    # F.get (not getItem): out-of-bounds must yield null, not an ANSI error —
    # "2:05" has no fraction element at index 1.
    minutes = F.get(F.split(c, ":"), 0).try_cast("long")
    sec_part = F.get(F.split(c, ":"), 1)
    whole_sec = F.get(F.split(sec_part, r"\."), 0).try_cast("long")
    frac_ms = F.coalesce(
        F.rpad(F.get(F.split(sec_part, r"\."), 1), 3, "0").try_cast("long"),
        F.lit(0),
    )
    ms = minutes * 60000 + whole_sec * 1000 + frac_ms
    return F.when(c.rlike(_LAPTIME_RE), ms)


# ---------------------------------------------------------------------------
# G5-G10 — safe casts (the sanitizer vocabulary)
# ---------------------------------------------------------------------------

def safe_int(col: Column | str) -> Column:
    """G5 — int(x) else null, matching the reference's try/except
    (base_loader.py:224-229). Spark 4 runs ANSI mode by default, so the
    null-on-malformed behavior requires try_cast, not cast."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("int")


def str_sanitize(col: Column | str) -> Column:
    """G6 — astype(str) with pandas sentinel strings mapped back to null
    (loaders/__init__.py:127-128)."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return F.when(s.isin("nan", "NaT", "None", ""), F.lit(None)).otherwise(s)


def to_int_fill0(col: Column | str) -> Column:
    """G7 — to_numeric(coerce).fillna(0) (loaders/__init__.py:129-131)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("int"), F.lit(0))


def to_smallint_clip(col: Column | str) -> Column:
    """G7 — smallint clip to [-32768, 32767] (loaders/__init__.py:132-133)."""
    c = F.col(col) if isinstance(col, str) else col
    clipped = F.greatest(
        F.lit(-32768), F.least(F.lit(32767), F.coalesce(c.try_cast("int"), F.lit(0)))
    )
    return clipped.cast("smallint")


def to_float(col: Column | str) -> Column:
    """G8 — to_numeric(coerce) → double, null on fail."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def str_to_bool(col: Column | str) -> Column:
    """G9 — {"true","t"}→true, {"false","f"}→false, else null
    (loaders/__init__.py:136-137)."""
    c = F.col(col) if isinstance(col, str) else col
    lc = F.lower(c)
    return (
        F.when(lc.isin("true", "t"), F.lit(True))
        .when(lc.isin("false", "f"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def to_date_safe(col: Column | str) -> Column:
    """G10 — pd.to_datetime(coerce) → date (null on fail)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("date")


def to_timestamp_safe(col: Column | str) -> Column:
    """G10 — pd.to_datetime(coerce) → timestamp (null on fail)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("timestamp")


# ---------------------------------------------------------------------------
# G13 — table-driven sanitize: one select of per-column cast expressions
# (replaces the reference's per-column pandas loop, loaders/__init__.py:117-145)
# ---------------------------------------------------------------------------

_TAG_FN = {
    "int": to_int_fill0,
    "smallint": to_smallint_clip,
    "float": to_float,
    "bool": str_to_bool,
    "date": to_date_safe,
    "timestamp": to_timestamp_safe,
    "str": str_sanitize,
}


def sanitize(df: DataFrame, table: str) -> DataFrame:
    """Coerce every declared column of `table` to its logical type; columns
    not in the registry pass through untouched. Single projection → single
    codegen stage, no shuffle."""
    types = LOGICAL_TYPES[table]
    exprs = []
    for c in df.columns:
        tag = types.get(c)
        exprs.append(_TAG_FN[tag](c).alias(c) if tag else F.col(c))
    return df.select(*exprs)


# ---------------------------------------------------------------------------
# G11 — nested-JSON navigation (api payload shape, api_client.py:94-105)
# ---------------------------------------------------------------------------

def json_get(col: Column | str, path: str) -> Column:
    """Ad-hoc JSON path extraction (string result, null on miss)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


# ---------------------------------------------------------------------------
# G2/G3 — wall-clock expressions (metadata.py:19,27,71-72,101,264,316)
# ---------------------------------------------------------------------------

def date_buffer_cutoff(n_days: int, as_of: Column | None = None) -> Column:
    """`CURRENT_DATE - INTERVAL 'n days'` (G2) — the late-data buffer bound.
    Pass `as_of` to pin the clock (tests / reproducible oracles)."""
    base = as_of if as_of is not None else F.current_date()
    return F.date_sub(base, n_days)


def now_utc() -> Column:
    """`NOW()` (G3) — run timestamps for watermark/audit writes. The session
    timezone is pinned to UTC (session.py) so this is unambiguous."""
    return F.current_timestamp()
