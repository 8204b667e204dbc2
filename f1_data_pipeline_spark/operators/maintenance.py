"""Table-health maintenance policy for manifest tables.

Every other verb optimizes ONE thing when told to (`compact_manifest`,
`vacuum_manifest`, `manifest_backfill_blooms` via layout). This module
is the scheduler's entry point: read the table's health from manifest
METADATA alone (no filesystem walk, no data I/O), decide what needs
doing against declared thresholds, and either report the plan
(`dry_run=True`) or execute it — the "run OPTIMIZE when it's worth it"
loop a 100 TB deployment crons per table.

Why metadata-only planning matters at scale: a table with 10⁵
partitions must not be stat()'d file-by-file to learn it's healthy.
Per-partition file counts, row counts, and merge-on-read delete
accumulation are already recorded in the manifest by every commit — the
plan costs one manifest read regardless of data size; only partitions
the plan SELECTS pay data I/O, under `compact_manifest`'s usual
one-atomic-flip crash contract.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .sinks import compact_manifest, read_manifest, vacuum_manifest


def plan_maintenance(
    path: str,
    max_files_per_partition: int = 8,
    max_delete_files_per_partition: int = 2,
) -> dict:
    """The health report + compaction plan, from manifest metadata only.

    A partition is a compaction candidate when it holds more than
    `max_files_per_partition` data files (small-file buildup from many
    small merges — file count drives scan planning and listing pressure)
    or more than `max_delete_files_per_partition` merge-on-read delete
    files (read-side join cost and inexact stats accumulate until a
    rewrite folds them in). Thresholds are counts, not bytes, because
    counts are what the manifest records exactly and what planning cost
    scales with; `compact_manifest` itself sizes output files by bytes.

    Returns {"partitions_total", "candidates": [encoded keys],
    "files_total", "delete_files_total", "reasons": {key: reason}}."""
    m = read_manifest(path)
    if m is None:
        raise FileNotFoundError(f"no manifest at {path}")
    candidates: list[str] = []
    reasons: dict[str, str] = {}
    files_total = deletes_total = 0
    for enc, entry in sorted(m["partitions"].items()):
        files = entry.get("files")
        n_files = len(files) if files is not None else 0
        n_del = len(entry.get("deletes") or ())
        files_total += n_files
        deletes_total += n_del
        if n_files > max_files_per_partition:
            candidates.append(enc)
            reasons[enc] = f"{n_files} data files > {max_files_per_partition}"
        elif n_del > max_delete_files_per_partition:
            candidates.append(enc)
            reasons[enc] = (
                f"{n_del} MoR delete files > {max_delete_files_per_partition}"
            )
    return {
        "partitions_total": len(m["partitions"]),
        "candidates": candidates,
        "files_total": files_total,
        "delete_files_total": deletes_total,
        "reasons": reasons,
    }


def maintain_manifest_table(
    spark: SparkSession,
    path: str,
    max_files_per_partition: int = 8,
    max_delete_files_per_partition: int = 2,
    target_file_bytes: int = 128 * 1024 * 1024,
    vacuum_keep_last: int | None = None,
    vacuum_min_age_sec: float = 6 * 3600,
    dry_run: bool = False,
) -> dict:
    """One table-health pass: plan from metadata, compact exactly the
    partitions the plan selected (honoring the table's declared layout —
    `compact_manifest` picks up `cluster_by` and bloom backfill from the
    layout policy), then optionally vacuum superseded snapshots
    (`vacuum_keep_last` non-None enables it; respect the age floor that
    makes vacuum safe next to live writers).

    `dry_run=True` returns the plan with nothing executed — the report a
    scheduler logs before acting. Idempotent when healthy: a table whose
    partitions sit under both thresholds plans zero candidates and the
    pass costs one manifest read.

    Returns the plan plus {"compacted": {...compact_manifest result},
    "vacuumed": [reclaimed prefixes], "dry_run": bool}."""
    plan = plan_maintenance(
        path,
        max_files_per_partition=max_files_per_partition,
        max_delete_files_per_partition=max_delete_files_per_partition,
    )
    out = {**plan, "dry_run": dry_run, "compacted": None, "vacuumed": []}
    if dry_run:
        return out
    if plan["candidates"]:
        out["compacted"] = compact_manifest(
            spark, path,
            target_file_bytes=target_file_bytes,
            partition_values=plan["candidates"],
            partition_values_encoded=True,
        )
    if vacuum_keep_last is not None:
        out["vacuumed"] = vacuum_manifest(
            path, keep_last=vacuum_keep_last, min_age_sec=vacuum_min_age_sec
        )
    return out
