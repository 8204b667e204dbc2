"""Shuffle-free joins between co-bucketed manifest tables — the
storage-partitioned join, emulated.

Two manifest tables hidden-partitioned `bucket(N, key)` on their join
keys (operators/partitioning.py) already have every matching key pair
co-located in same-numbered buckets: bucket ids come from the SAME
deterministic hash (pmod(xxhash64(cast), N)) both writers ran. A plain
`catalog_sql` join still exchanges both sides, because a path-based
parquet scan reports no partitioning Catalyst can trust — at fact-fact
scale that re-shuffle of both tables is the single biggest avoidable
cost at 100 TB (the reference's FK-join read shape,
base_loader.py:185-212, hits exactly this as facts grow).

`bucket_aligned_join` removes it: the driver plans one row per bucket
PAIR from the two manifests (metadata only), and `mapInArrow` fans the
pairs out — each task reads its bucket's files from both sides
(pyarrow, position deletes applied) and hash-joins them worker-side
with Acero. Neither table's data ever enters a Spark exchange; the
only shuffle in the plan moves N spec rows (bucket ids + file lists).
This is what Spark's own storage-partitioned join does for DSv2
connectors that report KeyGroupedPartitioning — unavailable to Python
data sources, so the join moves into the task instead.

Correctness contract (validated up front, loud failures):
- both tables bucket(N, …) with equal N;
- the bucketed source columns ARE the join keys;
- identical key types on both sides (xxhash64 hashes int32 and int64
  differently — a silent type mismatch would misalign buckets, so it
  refuses instead);
- join keys never NULL on the inner side of classification (the NULL
  partition joins nothing and is skipped for inner joins, included
  left-side for left joins — SQL semantics: NULL keys match nothing).

Scale posture: tasks = buckets; per-task memory = one bucket pair,
which the writer's bucket count already sizes (pick N ≈ table size /
healthy partition size — write_bucketed's rule, sinks.py:323). Skewed
keys concentrate in one bucket either way; an oversized pair SUB-SPLITS
into bounded file-group tasks against the replicated smaller side
(round 12, `_split_hot_pair`), and only the genuinely un-splittable
shapes (both sides hot, one giant file, a hot null-extending side)
refuse loudly toward re-bucketing or the shuffled join.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["bucket_aligned_join", "bucket_join_output", "plan_bucket_pairs"]


def _bucket_layout(path: str, version: int | None = None):
    """(N, source column, {bucket id: entry}, stored schema) of a
    bucket-partitioned manifest table; raises for any other layout."""
    from .partitioning import parse_partition_spec
    from .sinks import _stored_of, read_manifest

    m = read_manifest(path, version)
    if m is None:
        raise FileNotFoundError(f"no manifest at {path}")
    spec = m.get("partition_col")
    t = parse_partition_spec(spec) if spec else None
    if t is None or t.kind != "bucket":
        raise ValueError(
            f"bucket_aligned_join requires a bucket(N, col) layout; "
            f"{path} is partitioned {spec!r}"
        )
    stored = _stored_of(m)
    if stored is None:
        raise ValueError(f"manifest at {path} predates stored schemas")
    return t.param, t.source, dict(m["partitions"]), stored


# per-task memory guard default: one bucket pair's UNCOMPRESSED data
# bytes (what the task's Arrow buffers actually occupy). A healthy
# writer sizes buckets well under this (write_bucketed's rule, N ≈
# table size / healthy partition size); only pathological key skew
# concentrates a multi-GiB pair in one task, and that should fail
# loudly at PLAN time, not OOM an executor mid-join.
DEFAULT_MAX_PAIR_BYTES = 4 << 30


def plan_bucket_pairs(
    left_path: str,
    right_path: str,
    how: str = "inner",
    version_left: int | None = None,
    version_right: int | None = None,
    max_pair_bytes: int | None = DEFAULT_MAX_PAIR_BYTES,
    left_predicates=None,
    right_predicates=None,
    layouts: tuple | None = None,
) -> list[dict]:
    """The driver-side plan: one dict per bucket pair that can produce
    output — {'bucket', 'left_files', 'left_deletes', 'right_files',
    'right_deletes', 'bytes'}. Inner joins skip buckets absent on either
    side (their rows cannot match anything — that IS the bucket-level
    file pruning: files opened are exactly the matching pairs); left
    joins keep left-only buckets with an empty right side. The NULL
    partition ('null' key) matches nothing by SQL semantics: skipped
    for inner, left-side-only for left.

    Self-defending pair sizing (round 10, verdict #5): each pair's
    summed uncompressed data bytes (manifest-recorded) is checked
    against `max_pair_bytes` — a task materializes exactly one pair, so
    a skewed hot bucket used to be a mid-join executor OOM. An
    oversized pair now SUB-SPLITS (round 12, `_split_hot_pair`): the
    larger side's files pack into K ≤-budget groups, each its own task
    joined against the replicated smaller side — same result, bounded
    task memory; the loud plan-time error remains for the genuinely
    un-splittable cases (replicated side near the budget, one giant
    file, a hot RIGHT side under a left join). Pass
    `max_pair_bytes=None` to disable (or a larger budget for big-memory
    executors).

    `left_predicates` / `right_predicates` (simple (col, op, value)
    conjunctions in LOGICAL column names, `parse_predicates` shape)
    engage per-file STATS PRUNING inside each bucket: files whose
    recorded bounds prove no row satisfies the conjunction are dropped
    from the pair's scan list, and a side emptied by pruning drops the
    whole pair for inner joins. Scan avoidance only — the caller must
    still apply the predicates as row filters (catalog_sql's router
    keeps the WHERE in the rewritten statement). For `how='left'` only
    `left_predicates` are accepted: pruning RIGHT rows would flip
    matched left rows to null-extended, changing the result.

    `layouts`: the two `_bucket_layout(...)` results for the SAME
    (paths, versions), precomputed — pass to skip re-reading and
    re-parsing both manifests (at 10^5 file records per table the JSON
    parse IS the plan cost; catalog_sql's router reads each manifest
    once at match time and threads the layouts through plan and join).
    The caller owns arg consistency."""
    from .arrow_read import entry_paths
    from .sinks import _file_maybe_matches, _map_predicates, _phys_map

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if how == "left" and right_predicates:
        raise ValueError(
            "right_predicates with how='left' would change which rows "
            "null-extend — apply right-side filters post-join instead"
        )
    if layouts is not None:
        (nl, _lsrc, left_entries, sl), (nr, _rsrc, right_entries, sr) = \
            layouts
    else:
        nl, _, left_entries, sl = _bucket_layout(left_path, version_left)
        nr, _, right_entries, sr = _bucket_layout(right_path, version_right)
    if nl != nr:
        raise ValueError(
            f"bucket counts differ ({nl} vs {nr}) — co-located joins "
            "need identical N; re-bucket one side (set_layout) or use "
            "the shuffled join"
        )
    lpreds = (
        list(_map_predicates(left_predicates, _phys_map(sl)))
        if left_predicates else None
    )
    rpreds = (
        list(_map_predicates(right_predicates, _phys_map(sr)))
        if right_predicates else None
    )

    def _side(path: str, entry: dict, preds) -> tuple[list, list, list]:
        """(kept data paths, delete dirs, per-file bytes) after stats
        pruning; pre-stats entries read whole (never mispruned). Path
        resolution stays on the SHARED entry_paths helper over a
        kept-files entry copy, so the entry→paths mapping can never
        diverge from the readers'. Per-file bytes come from the
        manifest's recorded uncompressed sizes (zero I/O); legacy
        entries fall back to a driver stat() per file (compressed — an
        underestimate, same epistemic status the pair guard always
        had)."""
        files = entry.get("files")
        if preds is not None and files is not None:
            entry = {
                **entry,
                "files": [
                    fm for fm in files if _file_maybe_matches(fm, preds)
                ],
            }
        f, d = entry_paths(path, entry)
        kept = entry.get("files")
        if kept is not None and all("bytes" in fm for fm in kept):
            per = [fm["bytes"] for fm in kept]
        else:
            per = [os.path.getsize(x) for x in f]
        return f, d, per

    plans: list[dict] = []
    for key, le in sorted(left_entries.items()):
        if key == "null" and how == "inner":
            continue  # NULL join keys match nothing
        re_ = right_entries.get(key) if key != "null" else None
        if re_ is None and how == "inner":
            continue
        lf, ld, lper = _side(left_path, le, lpreds)
        rf, rd, rper = (
            _side(right_path, re_, rpreds)
            if re_ is not None else ([], [], [])
        )
        if not lf:
            continue  # every left row provably fails the conjunction
        if how == "inner" and not rf:
            continue
        lbytes, rbytes = sum(lper), sum(rper)
        pair_bytes = lbytes + rbytes
        if max_pair_bytes is not None and pair_bytes > max_pair_bytes:
            sub = _split_hot_pair(
                key, how, max_pair_bytes,
                lf, ld, lper, rf, rd, rper,
            )
            plans.extend(sub)
            continue
        plans.append(
            {
                "bucket": key,
                "left_files": lf,
                "left_deletes": ld,
                "right_files": rf,
                "right_deletes": rd,
                "bytes": pair_bytes,
            }
        )
    return plans


def _split_hot_pair(
    key: str,
    how: str,
    max_pair_bytes: int,
    lf: list, ld: list, lper: list,
    rf: list, rd: list, rper: list,
) -> list[dict]:
    """SUB-SPLIT an oversized bucket pair (round-12 verdict #4) instead
    of refusing: the LARGER side's files pack into K groups (first-fit
    decreasing on recorded bytes), each joined against the REPLICATED
    smaller side in its own task — the union of the K sub-joins equals
    the whole pair's join because every big-side row appears in exactly
    one group and sees the complete other side. Soundness bound: the
    big side must be the LEFT side under `how='left'` (splitting the
    preserved-row side is fine — each left row still null-extends
    against the FULL right side; splitting the RIGHT side would
    null-extend a left row in every group that lacks its match). The
    loud plan-time raise remains for the genuinely un-splittable cases:
    the small side alone (which every sub-task replicates) near the
    budget, a single big-side file over it, or a hot RIGHT side under a
    left join."""
    lbytes, rbytes = sum(lper), sum(rper)
    if lbytes >= rbytes:
        big_side, big_f, big_per = "left", lf, lper
        small_bytes, splittable = rbytes, True
    else:
        big_side, big_f, big_per = "right", rf, rper
        small_bytes = lbytes
        # splitting the null-extending side of a LEFT join is unsound
        splittable = how == "inner"
    budget = max_pair_bytes - small_bytes
    why = None
    if not splittable:
        why = (
            f"the hot side is the RIGHT side of a LEFT join — splitting "
            "it would null-extend preserved rows in every sub-task that "
            "lacks their match"
        )
    elif len(big_f) <= 1:
        # checked BEFORE the budget: with one hot-side file max(big_per)
        # is that side's whole size, which always exceeds the budget of
        # an oversized pair — the budget branch would otherwise shadow
        # this more precise message
        why = "the hot side is a single file — nothing to split"
    elif budget <= 0 or (big_per and max(big_per) > budget):
        why = (
            f"no file grouping fits: the replicated side holds "
            f"{small_bytes:,} bytes and the largest hot-side file "
            f"{max(big_per):,} — their sum exceeds max_pair_bytes"
            if budget > 0 else
            f"the replicated side alone holds {small_bytes:,} bytes ≥ "
            "the budget, so every sub-task would still be oversized"
        )
    if why is not None:
        raise ValueError(
            f"bucket {key!r} pair holds {lbytes + rbytes:,} data bytes "
            f"(> max_pair_bytes {max_pair_bytes:,}) and cannot sub-split "
            f"({why}) — one task materializes one bucket pair, so this "
            "would risk an executor OOM mid-join. Remedies: re-bucket "
            "with a larger N (set_layout + repartition_manifest_table), "
            "fall back to the shuffled join for this query, or raise "
            "max_pair_bytes if the executors have the memory."
        )
    # first-fit decreasing pack of the hot side's files into ≤-budget
    # groups; position deletes ride along whole (they key by file
    # identity, so a group simply ignores deletes for files it lacks —
    # the same mechanism in-bucket stats pruning already relies on)
    groups: list[dict] = []
    for f, b in sorted(zip(big_f, big_per), key=lambda t: -t[1]):
        for g in groups:
            if g["bytes"] + b <= budget:
                g["files"].append(f)
                g["bytes"] += b
                break
        else:
            groups.append({"files": [f], "bytes": b})
    out = []
    k = len(groups)
    for i, g in enumerate(groups):
        sub_lf, sub_rf = (g["files"], rf) if big_side == "left" else \
            (lf, g["files"])
        out.append({
            "bucket": key,
            # unique per-task spec key: the executor fan-out range-
            # partitions on it so each SUB-pair still gets its own task
            "task_key": f"{key}#{i:04d}",
            "split": f"{i + 1}/{k}",
            "left_files": sub_lf,
            "left_deletes": ld,
            "right_files": sub_rf,
            "right_deletes": rd,
            "bytes": g["bytes"] + small_bytes,
        })
    return out


def bucket_join_output(
    lschema: T.StructType,
    rschema: T.StructType,
    right_on: str,
    right_prefix: str = "r_",
) -> tuple[T.StructType, dict[str, str]]:
    """The join's output contract, computed from the two stored schemas:
    (output schema, {right column -> output name}). All left columns
    keep their names; the right key is dropped (it equals the left key
    on matched rows); a right column colliding with a left name is
    prefixed `right_prefix`. Shared with catalog_sql's bucket-join
    router so the SQL rewrite can never drift from what
    `bucket_aligned_join` actually emits."""
    left_names = {f.name for f in lschema.fields}
    out_fields = list(lschema.fields)
    rename: dict[str, str] = {}
    for f in rschema.fields:
        if f.name == right_on:
            continue
        out_name = (right_prefix + f.name) if f.name in left_names else f.name
        if out_name in {x.name for x in out_fields}:
            raise ValueError(
                f"output column collision on {out_name!r} — pass a "
                "different right_prefix"
            )
        rename[f.name] = out_name
        out_fields.append(T.StructField(out_name, f.dataType, True))
    return T.StructType(out_fields), rename


def bucket_aligned_join(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    left_on: str | None = None,
    right_on: str | None = None,
    how: str = "inner",
    right_prefix: str = "r_",
    version_left: int | None = None,
    version_right: int | None = None,
    max_pair_bytes: int | None = DEFAULT_MAX_PAIR_BYTES,
    left_predicates=None,
    right_predicates=None,
    plans: list[dict] | None = None,
    layouts: tuple | None = None,
) -> DataFrame:
    """Join two co-bucketed manifest tables without shuffling either.

    `left_on`/`right_on` default to each table's bucket source column
    (they must BE the bucket columns — that is the co-location the join
    exploits). Output columns: all left columns, then the right table's
    non-key columns; a right column whose name collides with a left one
    is prefixed `right_prefix`. Result parity with the shuffled
    DataFrame join is pytest-pinned (tests/test_bucket_join.py).

    `plans`: a `plan_bucket_pairs` result already computed for the SAME
    (paths, how, versions, predicates) — pass it to skip re-planning
    (catalog_sql's router plans first to cost-gate the route and hands
    the plan down; the two metadata walks would otherwise run twice per
    statement). `layouts`: the two `_bucket_layout` results, same
    contract (skips re-reading both manifests — see plan_bucket_pairs).
    The caller owns arg consistency."""
    from pyspark.sql.pandas.types import to_arrow_schema

    from .sinks import _phys_name

    if layouts is not None:
        (nl, lsrc, _le, lschema), (_nr, rsrc, _re_, rschema) = layouts
    else:
        nl, lsrc, _, lschema = _bucket_layout(left_path, version_left)
        _, rsrc, _, rschema = _bucket_layout(right_path, version_right)
    left_on = left_on or lsrc
    right_on = right_on or rsrc
    if left_on != lsrc or right_on != rsrc:
        raise ValueError(
            f"join keys must be the bucketed columns: left {lsrc!r} vs "
            f"{left_on!r}, right {rsrc!r} vs {right_on!r} — joining on "
            "anything else has no co-location to exploit (use the "
            "ordinary join)"
        )
    ltype = lschema[left_on].dataType
    rtype = rschema[right_on].dataType
    if ltype != rtype:
        raise ValueError(
            f"key types differ ({ltype.simpleString()} vs "
            f"{rtype.simpleString()}): xxhash64 buckets them differently, "
            "so same-valued keys would land in different buckets — widen "
            "one table's key type first"
        )

    left_fields = tuple((f.name, _phys_name(f)) for f in lschema.fields)
    right_data = [f for f in rschema.fields if f.name != right_on]
    right_fields = tuple((f.name, _phys_name(f)) for f in rschema.fields)
    out_schema, rename = bucket_join_output(lschema, rschema, right_on,
                                            right_prefix)

    if plans is None:
        plans = plan_bucket_pairs(
            left_path, right_path, how, version_left, version_right,
            max_pair_bytes=max_pair_bytes,
            left_predicates=left_predicates,
            right_predicates=right_predicates,
            layouts=layouts,
        )
    if not plans:
        return spark.createDataFrame([], out_schema)

    # range-partition the spec rows: exactly one bucket pair per task
    # (hash repartition would collide ~1/e of the slots, leaving some
    # tasks joining 2-3 pairs while others idle — straggler tax at
    # scale). Sub-split pairs carry a unique task_key per sub-group so
    # a hot bucket's K sub-joins fan out to K tasks, not one.
    spec_df = spark.createDataFrame(
        [(p.get("task_key", p["bucket"]), json.dumps(p)) for p in plans],
        "bucket string, spec string",
    ).repartitionByRange(len(plans), "bucket")

    l_arrow = to_arrow_schema(
        T.StructType([T.StructField(n, lschema[n].dataType) for n, _ in left_fields])
    )
    r_arrow = to_arrow_schema(
        T.StructType([T.StructField(n, rschema[n].dataType) for n, _ in right_fields])
    )
    out_arrow = to_arrow_schema(out_schema)
    join_type = "inner" if how == "inner" else "left outer"
    r_keep = [f.name for f in right_data]

    def _join_pairs(batches):
        import pyarrow as pa

        from f1_data_pipeline_spark.operators.arrow_read import load_side

        for batch in batches:
            for spec_raw in batch.column("spec").to_pylist():
                p = json.loads(spec_raw)
                lt = load_side(
                    p["left_files"], p["left_deletes"], left_fields, l_arrow
                )
                rt = load_side(
                    p["right_files"], p["right_deletes"], right_fields,
                    r_arrow,
                )
                rt = rt.select([right_on] + r_keep).rename_columns(
                    [right_on] + [rename[c] for c in r_keep]
                )
                # Acero rejects list/struct payloads in hash joins — the
                # index-join trick (join key+rowid, then take) keeps any
                # payload type out of the join kernel
                import pyarrow.compute as pc

                lk = lt.select([left_on]).append_column(
                    "__li", pa.array(range(lt.num_rows), pa.int64())
                )
                rk = rt.select([right_on]).append_column(
                    "__ri", pa.array(range(rt.num_rows), pa.int64())
                )
                j = lk.join(
                    rk,
                    keys=[left_on],
                    right_keys=[right_on],
                    join_type=join_type,
                )
                li, ri = j.column("__li"), j.column("__ri")
                out_l = lt.take(li)
                # right side of a left join: null rows where unmatched
                right_cols = []
                rt_no_key = rt.drop([right_on])
                for name in rt_no_key.column_names:
                    col = rt_no_key.column(name)
                    taken = col.take(ri)  # null indices -> null values
                    right_cols.append(taken)
                out = out_l
                for name, col in zip(rt_no_key.column_names, right_cols):
                    out = out.append_column(name, col)
                out = out.cast(out_arrow)
                yield from out.to_batches()

    return spec_df.mapInArrow(_join_pairs, out_schema)
