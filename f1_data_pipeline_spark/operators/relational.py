"""Relational core operators (SURVEY.md §2.B/C/D/E/F).

Each function is a *composable DataFrame→DataFrame op* mirroring one dataflow
behavior of the reference pipeline (citations inline). They are deliberately
thin: the engine's value is declaring the right plan and letting Catalyst
choose physical strategy (broadcast vs shuffle, pushdown, pruning) — not
hand-scheduling execution like the reference's pandas/psycopg2 loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def project_intersection(df: DataFrame, table_cols: Sequence[str]) -> DataFrame:
    """B1 — project to (table columns ∩ df columns) preserving table order.

    Reference: insert-list intersection, loaders/__init__.py:63-66,72.
    """
    present = set(df.columns)
    return df.select(*[c for c in table_cols if c in present])


def filter_notnull_key(df: DataFrame, key: str) -> DataFrame:
    """B2 — drop rows with a null key (loaders/__init__.py:73)."""
    return df.filter(F.col(key).isNotNull())


def anti_join_existing(df: DataFrame, existing: DataFrame, keys: Sequence[str]) -> DataFrame:
    """B3/C3 — new-rows-only dedup against the target table.

    Reference pulls the full id set to the client (`~isin(existing_ids)`,
    loaders/__init__.py:70-74); at scale that's a left-anti join, which
    Catalyst/AQE will broadcast when the existing-key side is small.
    """
    return df.join(existing.select(*keys).dropDuplicates(list(keys)), list(keys), "left_anti")


def dedup_first(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """B4 — keep-"first" dedup with an explicit ordering contract.

    Reference `drop_duplicates(keep="first")` (loaders/__init__.py:75) relies
    on pandas row order; distributed keep-first needs a declared order —
    row_number()==1 over it (SURVEY.md §4.2 item 3).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def fk_lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    select_cols: Sequence[Column] | None = None,
    how: str = "left",
) -> DataFrame:
    """C2 — resolve natural keys via a broadcast dimension join.

    Reference builds in-memory lookup dicts (base_loader.py:178-212) — the
    single-node shape of a broadcast hash join. Explicit `broadcast` hint:
    dims here are guaranteed small, and at 100 TB we never want a shuffle of
    the fact side for these.
    """
    joined = fact.join(F.broadcast(dim), on, how)
    return joined.select(*select_cols) if select_cols else joined


def filter_fk_resolved(df: DataFrame, fk_cols: Sequence[str]) -> DataFrame:
    """B8 — drop rows whose FK lookup failed (loaders/__init__.py:225-226)."""
    cond = None
    for c in fk_cols:
        p = F.col(c).isNotNull()
        cond = p if cond is None else (cond & p)
    return df.filter(cond)


def top1_by(df: DataFrame, order_by: Sequence[Column]) -> DataFrame:
    """E1 — ORDER BY ... LIMIT 1 (metadata.py:266-267,317-318).

    Catalyst compiles this to TakeOrderedAndProject: a per-partition top-1
    plus a driver-side merge — no full sort, no full shuffle.
    """
    return df.orderBy(*order_by).limit(1)


def merge_upsert_frames(
    existing: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    updates_order: Sequence[Column] | None = None,
) -> DataFrame:
    """C4/A7 — MERGE semantics on DataFrames: full-outer join on the key,
    update columns prefer the new side (`coalesce(new, old)`).

    Reference: per-row `INSERT ... ON CONFLICT DO UPDATE SET`
    (loaders/__init__.py:254-272 and 4 siblings). The physical write path
    (atomic overwrite) lives in operators/sinks.py; this is the pure
    dataflow, usable in both batch and foreachBatch.

    MERGE admits at most one update row per key: duplicates would fan out
    through the full-outer join and land as duplicate key rows (a
    foreachBatch micro-batch can legitimately carry several updates for one
    key). The reference applies them sequentially, last wins; the set-based
    equivalent keeps one row per key by a declared order — pass
    `updates_order` (e.g. a batch-sequence column, descending) to control
    which. The default orders by every non-key column descending-nulls-last:
    arbitrary but deterministic, so the merge stays idempotent.
    """
    keys = list(keys)
    order = (
        list(updates_order)
        if updates_order is not None
        else [F.desc_nulls_last(c) for c in updates.columns if c not in keys]
    )
    updates = dedup_first(updates, keys, order) if order else updates.dropDuplicates(keys)
    value_cols = [c for c in existing.columns if c not in keys]
    update_cols = set(updates.columns)
    # Rename the update side up front: keeps the join self-join-safe even when
    # both frames derive from the same source, and makes every reference
    # unambiguous by name. "__upd" marks key-present-on-update-side so that
    # legitimate null updates still win (ON CONFLICT DO UPDATE sets nulls too).
    u = updates.select(
        F.lit(True).alias("__upd"),
        *[F.col(c).alias(f"__u_{c}") for c in updates.columns],
    )
    cond = None
    for k in keys:
        p = F.col(k).eqNullSafe(F.col(f"__u_{k}"))
        cond = p if cond is None else (cond & p)
    out_cols = [F.coalesce(F.col(f"__u_{k}"), F.col(k)).alias(k) for k in keys]
    for c in value_cols:
        if c in update_cols:
            out_cols.append(
                F.when(F.col("__upd").isNotNull(), F.col(f"__u_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c).alias(c))
    return existing.join(u, cond, "full_outer").select(*out_cols)
