"""Sources: batch readers for the engine.

- tables.py   parquet testdata/warehouse tables (handles ns timestamps)
- json_api.py nested-JSON payload → rows (reference HTTP API shape)
- csv_zip.py  ZIP-of-CSVs bulk dump → per-table DataFrames
"""

from f1_data_pipeline_spark.sources.tables import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
