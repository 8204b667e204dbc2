"""Physical-plan audit helpers.

The 100 TB design target is enforceable locally: the *shape* of a plan —
which filters reached the parquet scan, which columns are read, which join
strategy Catalyst picked, whether a cartesian product appeared — is the
same on local[32] as on a 1000-executor cluster. These helpers extract
those properties so tests can pin them (tests/test_plans.py), turning
scale regressions (a lost pushdown, an accidental cross join) into red
tests instead of cluster incidents.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list in the scan nodes, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of the scan nodes (column-pruning proof)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", formatted_plan(df))


def join_strategies(df: DataFrame) -> dict[str, int]:
    plan = executed_plan(df)
    return {
        "broadcast_hash": plan.count("BroadcastHashJoin"),
        "sort_merge": plan.count("SortMergeJoin"),
        "shuffled_hash": plan.count("ShuffledHashJoin"),
        "broadcast_nested_loop": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "exchanges": plan.count("Exchange"),
    }


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions — wider/fewer is better."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", executed_plan(df))))
