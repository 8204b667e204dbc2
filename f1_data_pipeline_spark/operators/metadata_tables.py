"""Metadata inspection tables for manifest-committed tables.

The table format's introspection surface, exposed as DataFrames the way
Iceberg exposes `db.table.files` / `.partitions` / `.snapshots` and Delta
exposes DESCRIBE HISTORY / DETAIL: every question about a table's layout —
which files exist, how rows distribute over partitions, what each commit
changed, which files a predicate would scan — answered from manifest
metadata alone, without opening a single data file.

Scale posture: all of these are METADATA-scaled, not data-scaled. A
manifest lists one entry per partition and one stats dict per file — the
same order of magnitude as Iceberg's manifest lists — so at 100 TB these
frames hold thousands-to-millions of rows of metadata, never the data
itself. They are built driver-side (the manifest JSON is already a
driver-side object, exactly like Iceberg's snapshot metadata) and handed
to Spark as small DataFrames for joining/filtering with ordinary query
machinery.

Reference parity: the reference introspects its live schema through
`information_schema.columns` (loaders/__init__.py:48-58) and keeps a
sync_log audit trail (metadata.py:43-112); these tables are the same
idea for the engine's own table format — self-describing state,
queryable in the engine itself.
"""
from __future__ import annotations

import os
import urllib.parse
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .sinks import (
    _entry_delete_rows,
    _file_maybe_matches,
    _transform_prune,
    manifest_history,
    read_manifest,
)


def _stat_str(v) -> str | None:
    """Stats bounds are heterogeneous (numbers, strings, ISO dates);
    render as strings for a uniform display column, like Iceberg's
    readable_metrics. None (= bounds unknown / not prunable) stays NULL."""
    return None if v is None else str(v)


_FILES_SCHEMA = T.StructType(
    [
        T.StructField("content", T.StringType(), False),  # data | position-deletes
        T.StructField("partition", T.StringType(), True),  # encoded manifest key
        T.StructField("prefix", T.StringType(), False),
        T.StructField("file", T.StringType(), True),  # basename; NULL for delete prefixes
        T.StructField("rows", T.LongType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField(
            "stats",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField("min", T.StringType(), True),
                        T.StructField("max", T.StringType(), True),
                        T.StructField("nulls", T.LongType(), True),
                    ]
                ),
            ),
            True,
        ),
    ]
)


def manifest_files_df(
    spark: SparkSession,
    path: str,
    version: int | str | None = None,
    predicates: Sequence[tuple] | None = None,
) -> DataFrame:
    """One row per physical file the given table version references:
    data files (with their recorded footer stats — the exact bounds the
    readers prune on) and merge-on-read position-delete files.

    `predicates` (same (col, op, value) conjunctions the readers take)
    restricts the output to the DATA files a pruned scan would open —
    partition-transform pruning composed with per-file stats pruning,
    i.e. the scan-planning EXPLAIN for data skipping: compare
    `manifest_files_df(...).count()` against the predicate-filtered count
    to see pruning effectiveness without running the query. (Position-
    delete files of surviving MoR partitions are opened by a real scan
    too but are listed only in the unpredicated output.)

    `size_bytes` is read from the filesystem (one stat per file,
    metadata-only); NULL if the file has been vacuumed from under a
    time-traveled version."""
    m = read_manifest(path, version)
    if m is None:
        raise FileNotFoundError(f"no manifest at {path}")
    entries = dict(m["partitions"])
    if predicates is not None:
        entries = _transform_prune(spark, m, entries, list(predicates))
    rows: list[tuple] = []
    for enc, entry in sorted(entries.items()):
        files = entry.get("files")
        if files is None:
            # pre-stats entry (legacy commit): surface the prefix itself
            rows.append(
                ("data", enc, entry["prefix"], None, None, None, None)
            )
        else:
            for fm in files:
                if predicates is not None and not _file_maybe_matches(
                    fm, predicates
                ):
                    continue
                full = os.path.join(path, entry["prefix"], fm["name"])
                try:
                    size = os.path.getsize(full)
                except OSError:
                    size = None
                stats = {
                    c: (_stat_str(st.get("min")), _stat_str(st.get("max")),
                        st.get("nulls"))
                    for c, st in (fm.get("stats") or {}).items()
                }
                rows.append(
                    ("data", enc, entry["prefix"], fm["name"], fm["rows"],
                     size, stats)
                )
        if predicates is None:
            for d in entry.get("deletes") or ():
                rows.append(
                    ("position-deletes", enc, d["prefix"], None, d["rows"],
                     None, None)
                )
    return spark.createDataFrame(rows, _FILES_SCHEMA)


_PARTITIONS_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.StringType(), True),
        T.StructField("prefix", T.StringType(), False),
        T.StructField("data_files", T.LongType(), True),
        T.StructField("rows", T.LongType(), True),  # raw rows in data files
        T.StructField("live_rows", T.LongType(), True),  # minus MoR deletes
        T.StructField("delete_files", T.LongType(), False),
        T.StructField("bloom_columns", T.ArrayType(T.StringType()), True),
    ]
)


def manifest_partitions_df(
    spark: SparkSession, path: str, version: int | str | None = None
) -> DataFrame:
    """One row per partition of the given table version: file/row counts
    (raw and live — MoR position deletes subtracted), and which columns
    carry bloom sidecars. The first stop for layout questions: skewed
    partitions, small-file buildup (`rows/data_files` low → run
    `compact_manifest`), delete-file accumulation (high `delete_files` →
    compaction folds them in)."""
    m = read_manifest(path, version)
    if m is None:
        raise FileNotFoundError(f"no manifest at {path}")
    rows: list[tuple] = []
    for enc, entry in sorted(m["partitions"].items()):
        files = entry.get("files")
        if files is None:
            n_files = raw = None
        else:
            n_files = len(files)
            raw = sum(f["rows"] for f in files)
        dels = _entry_delete_rows(entry)
        rows.append(
            (
                enc,
                entry["prefix"],
                n_files,
                raw,
                None if raw is None else raw - dels,
                len(entry.get("deletes") or ()),
                sorted(entry["blooms"]) if entry.get("blooms") else None,
            )
        )
    return spark.createDataFrame(rows, _PARTITIONS_SCHEMA)


_SNAPSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("version", T.LongType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
        T.StructField("op", T.StringType(), True),
        T.StructField("partitions", T.LongType(), False),
        T.StructField("files", T.LongType(), False),
        T.StructField("rows", T.LongType(), True),
        T.StructField(
            "changed_partitions", T.ArrayType(T.StringType()), False
        ),
    ]
)


def manifest_snapshots_df(spark: SparkSession, path: str) -> DataFrame:
    """The commit log as a DataFrame (DESCRIBE HISTORY): one row per
    retained version with its op tag, totals, and the partitions it
    changed — `manifest_history` lifted into the engine so audits join
    against it like any other table."""
    import datetime as _dt

    hist = manifest_history(path)
    rows = [
        (
            h["version"],
            _dt.datetime.fromtimestamp(h["committed_at"]),
            h["op"],
            h["partitions"],
            h["files"],
            h["rows"],
            h["changed_partitions"],
        )
        for h in hist
    ]
    return spark.createDataFrame(rows, _SNAPSHOTS_SCHEMA)
