"""Sources: batch readers for the engine.

- tables.py   parquet testdata/warehouse tables (handles ns timestamps)
- json_api.py nested-JSON payload → rows (reference HTTP API shape)
- csv_zip.py  ZIP-of-CSVs bulk dump → per-table DataFrames
"""

from f1_data_pipeline_spark.sources.tables import load_table, load_tables, register_views
from f1_data_pipeline_spark.sources.csv_zip import read_csv_table, read_zip_csv
from f1_data_pipeline_spark.sources.json_api import (
    fetch_json,
    flatten_race_results,
    payloads_to_df,
    read_endpoints,
)

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_csv_table",
    "read_zip_csv",
    "fetch_json",
    "flatten_race_results",
    "payloads_to_df",
    "read_endpoints",
]
