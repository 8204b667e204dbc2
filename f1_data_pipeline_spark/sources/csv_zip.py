"""ZIP-of-CSVs bulk source (SURVEY.md §2.A A2/A3).

Reference parity: the pre-season path downloads one ZIP holding 7 CSV dumps
and parses each member with pandas (/root/reference/api_client.py:167-171,
loaders/__init__.py:20-38), then sanitizes columns against the JSON schema
(loaders/__init__.py:117-145). Here: extract once (driver-side — the ZIP is
MB-scale), then `spark.read.csv` per member with an all-string schema and
the table-driven `sanitize` cast (same two-phase shape as the reference:
permissive parse, declared-type coercion).

Scale note: ZIP is not a splittable format — a 100 TB bulk dump would ship
as many ZIP/CSV parts; `read_zip_csv` accepts a list of ZIPs and unions
per-table, so partitioning = number of parts. The extracted CSVs land on
shared storage and each member is read by Spark's parallel CSV reader.
"""

from __future__ import annotations

import os
import zipfile
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from f1_data_pipeline_spark.functions.scalars import sanitize
from f1_data_pipeline_spark.schemas import F1_SCHEMAS

# ZIP member → table mapping, per loaders/__init__.py:20-28.
DEFAULT_MEMBER_MAP: dict[str, str] = {
    "drivers.csv": "driver",
    "constructors.csv": "team",
    "seasons.csv": "season",
    "circuits.csv": "circuit",
    "races.csv": "round",
    "sessions.csv": "session",
    "constructor_drivers.csv": "team_driver",
}


def extract_zip(zip_path: str, dest_dir: str) -> dict[str, str]:
    """Extract every member; returns member name → extracted path."""
    os.makedirs(dest_dir, exist_ok=True)
    out: dict[str, str] = {}
    with zipfile.ZipFile(zip_path) as zf:
        for member in zf.namelist():
            if member.endswith("/"):
                continue
            zf.extract(member, dest_dir)
            out[os.path.basename(member)] = os.path.join(dest_dir, member)
    return out


def _string_schema(table_schema: T.StructType) -> T.StructType:
    """Permissive parse schema: every declared column as string (the
    reference lets pandas read strings, then coerces — two-phase)."""
    return T.StructType(
        [T.StructField(f.name, T.StringType()) for f in table_schema.fields]
    )


def read_csv_table(
    spark: SparkSession,
    path: str,
    table: str,
    schemas: Mapping[str, T.StructType] = F1_SCHEMAS,
) -> DataFrame:
    """One CSV file → sanitized DataFrame of the table's declared types.

    Extra CSV columns are dropped, missing ones are absent (the writer's
    column-intersection projection handles that, B1); malformed cells
    become null exactly like the pandas `errors="coerce"` path.
    """
    parsed = (
        spark.read.option("header", True)
        .schema(_string_schema(schemas[table]))
        .csv(path)
    )
    return sanitize(parsed, table)


def read_zip_csv(
    spark: SparkSession,
    zip_paths: str | Sequence[str],
    workdir: str,
    member_map: Mapping[str, str] = DEFAULT_MEMBER_MAP,
    schemas: Mapping[str, T.StructType] = F1_SCHEMAS,
) -> dict[str, DataFrame]:
    """ZIP(s) → {table: DataFrame}. Multiple ZIP parts union per table."""
    if isinstance(zip_paths, str):
        zip_paths = [zip_paths]
    per_table: dict[str, list[str]] = {}
    for i, zp in enumerate(zip_paths):
        members = extract_zip(zp, os.path.join(workdir, f"part{i}"))
        for member, table in member_map.items():
            if member in members:
                per_table.setdefault(table, []).append(members[member])
    return {
        table: read_csv_table(spark, paths, table, schemas)
        for table, paths in per_table.items()
    }
