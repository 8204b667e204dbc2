"""A minimal table catalog for manifest tables: name → path, so query
code says `spark.sql("SELECT ... FROM curated")` instead of carrying
filesystem paths around.

The catalog is itself one numbered-JSON state directory using the same
atomic create-if-absent commit primitive as every manifest log
(`commit_numbered_json`): each change (create/drop/rename) writes the
next full catalog snapshot, so concurrent DDL races one conditional PUT
exactly like table commits, and `catalog_history` is free. Entries
store the path and an optional pinned ref (version number or tag name)
— a pinned entry always resolves to that snapshot, the
reproducible-dataset shape on top of `manifest_tag`.

`register_catalog_views` materializes every entry as a Spark temp view
over `read_manifest_table` (snapshot-isolated at registration time:
each view pins the version that was latest when registered, so one
analysis session sees one consistent snapshot per table; re-register to
advance). This is deliberately NOT a custom DataSource: views reuse the
native vectorized parquet scan and all manifest-level pruning happens
at registration/query-build time, so nothing moves into Python on the
data path.

Reference parity: the reference's table registry (config.py:21-141)
maps names to endpoints/loaders; this is the same idea for the engine's
own tables, with atomic evolution.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .sinks import (
    commit_numbered_json,
    numbered_json_versions,
    read_manifest,
    read_manifest_table,
    resolve_manifest_ref,
)

_CAT_DIR = "_catalog"


def _read_state(catalog_path: str) -> tuple[int, dict]:
    """(version, {name: {"path", "ref"}}) — version 0 = empty catalog."""
    import json

    d = os.path.join(catalog_path, _CAT_DIR)
    versions = numbered_json_versions(d)
    if not versions:
        return 0, {}
    with open(os.path.join(d, f"v{versions[-1]:08d}.json")) as fh:
        return versions[-1], json.load(fh)["tables"]


def _commit_state(catalog_path: str, version: int, tables: dict) -> None:
    commit_numbered_json(
        os.path.join(catalog_path, _CAT_DIR),
        version,
        {"tables": tables},
        what=f"catalog version ({catalog_path})",
    )


def catalog_create_table(
    catalog_path: str, name: str, table_path: str,
    ref: int | str | None = None,
) -> None:
    """Register `name` → `table_path` (optionally pinned to a version
    number or tag). The table must already have a committed manifest —
    a catalog that can point at nothing turns every typo into a
    confusing downstream failure."""
    if not name or not name.replace("_", "").isalnum():
        raise ValueError(f"invalid table name {name!r}")
    if read_manifest(table_path, ref) is None:
        raise FileNotFoundError(
            f"no manifest at {table_path} (ref {ref!r})"
        )
    v, tables = _read_state(catalog_path)
    if name in tables:
        raise ValueError(f"table {name!r} already exists in the catalog")
    tables = {**tables, name: {"path": table_path, "ref": ref}}
    _commit_state(catalog_path, v + 1, tables)


def catalog_drop_table(catalog_path: str, name: str) -> None:
    """Remove the NAME — the data is untouched (tables own their own
    lifecycle; vacuum/drop data through the table verbs)."""
    v, tables = _read_state(catalog_path)
    if name not in tables:
        raise FileNotFoundError(f"no table {name!r} in the catalog")
    tables = {k: e for k, e in tables.items() if k != name}
    _commit_state(catalog_path, v + 1, tables)


def catalog_tables(catalog_path: str) -> dict:
    """{name: {"path", "ref"}} at the current catalog version."""
    return _read_state(catalog_path)[1]


def catalog_read(
    spark: SparkSession, catalog_path: str, name: str, **kw
) -> DataFrame:
    """Read a cataloged table by name; keyword args pass through to
    `read_manifest_table` (predicates, partition_values, version —
    an explicit version overrides the catalog pin)."""
    tables = catalog_tables(catalog_path)
    if name not in tables:
        raise FileNotFoundError(f"no table {name!r} in the catalog")
    e = tables[name]
    if "version" not in kw and e.get("ref") is not None:
        kw["version"] = e["ref"]
    return read_manifest_table(spark, e["path"], **kw)


def register_catalog_views(
    spark: SparkSession, catalog_path: str
) -> dict[str, int]:
    """Create one temp view per catalog entry, each pinned to the
    version that is latest (or the entry's pinned ref) RIGHT NOW —
    spark.sql queries then see one consistent snapshot per table until
    views are re-registered. Returns {name: pinned version}."""
    pinned: dict[str, int] = {}
    for name, e in catalog_tables(catalog_path).items():
        v = resolve_manifest_ref(e["path"], e.get("ref"))
        if v is None:
            from .sinks import manifest_versions

            v = manifest_versions(e["path"])[-1]
        read_manifest_table(spark, e["path"], version=v).createOrReplaceTempView(
            name
        )
        pinned[name] = v
    return pinned
