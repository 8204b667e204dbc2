"""Query registry — fills the driver contract in __spark_entry__.py.

One entry per implemented operator key from SURVEY.md §2. Each Spark
callable takes (spark, sf_dir) → DataFrame; ORACLE holds the DuckDB-ANSI
twin. Column names are aliased identically on both sides (the driver sorts
columns by name before hashing values).

Registration pattern: modules contribute (callable, sql) pairs via
`register`; __spark_entry__ just re-exports the dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# Rows-only entries (no SQL twin: seeded-hash / sketch / ANN / stub-codec
# operators) are deferred to the END of the registry: the driver verifies the
# first 50 entries in insertion order, so every oracle-backed key must come
# first. Total registry size is kept ≤ 50 so every entry gets a CORRECTNESS
# row (see COVERAGE.md for the §2-key → registry-key mapping).
_TAIL: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
    if sql is None:
        _TAIL[name] = fn
        return
    QUERIES[name] = fn
    ORACLE[name] = sql


def _load_all() -> None:
    """Import operator modules for their registration side effects."""
    from f1_data_pipeline_spark.operators import standings

    register(
        "standings_recompute",
        standings.customer_standings,
        standings.CUSTOMER_STANDINGS_SQL,
    )

    from f1_data_pipeline_spark import queries_relational  # noqa: F401
    from f1_data_pipeline_spark import queries_quality  # noqa: F401
    from f1_data_pipeline_spark import queries_scalars  # noqa: F401
    from f1_data_pipeline_spark import queries_text  # noqa: F401
    from f1_data_pipeline_spark import queries_corpus  # noqa: F401
    from f1_data_pipeline_spark import queries_similarity  # noqa: F401
    from f1_data_pipeline_spark import queries_streaming  # noqa: F401
    from f1_data_pipeline_spark import queries_multimodal  # noqa: F401

    # rows-only entries last (outside-oracle window defense; see _TAIL note)
    QUERIES.update(_TAIL)
    assert len(QUERIES) <= 50, (
        f"registry has {len(QUERIES)} entries; the driver verifies only the "
        "first 50 — consolidate before adding more (COVERAGE.md)"
    )


_load_all()
