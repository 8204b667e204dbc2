"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``f1_data_pipeline_spark`` package; operator
keys follow SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (standings recompute, SURVEY.md §2.L X1) on sf0.001."""
    from f1_data_pipeline_spark.operators.standings import customer_standings
    from f1_data_pipeline_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    return customer_standings(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from f1_data_pipeline_spark.queries import QUERIES
    from f1_data_pipeline_spark.session import apply_runtime_confs

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI twin for each SQL-expressible query key."""
    from f1_data_pipeline_spark.queries import ORACLE

    return dict(ORACLE)
