"""Incrementally-maintained materialized aggregates over manifest tables —
the consumer that makes the table format's CDC/metadata machinery pay off.

A 100 TB fact table is never re-aggregated wholesale on a cadence; the
rollups that dashboards and training-mix monitors read are MAINTAINED:
each refresh touches work proportional to what changed since the last
refresh, not to the table. Two maintenance strategies, chosen by the
aggregate's algebra:

1. `refresh_rollup` — PARTITION-ALIGNED RECOMPUTE (the TimescaleDB
   continuous-aggregate / Iceberg incremental-refresh shape). Requires
   the source's partition column among the group columns; each refresh
   asks the manifests "which partitions changed since the version I last
   consumed" (two JSON reads, zero data), recomputes the aggregate over
   ONLY those partitions, and replaces the matching target partitions in
   one atomic commit (`replace_manifest_partitions`). Supports EVERY
   aggregate (min/max/count-distinct included) because changed groups
   are recomputed from source rows, never algebraically adjusted.

2. `refresh_aggregate_deltas` — CDC DELTA-APPLICATION over ARBITRARY
   group columns, including ones uncorrelated with the source's
   partitioning. The preimage-extended change feed
   (`manifest_row_changes(include_preimage=True)`) is algebraic for
   additive aggregates (count/sum/avg): signing insert/update_postimage
   +1 and delete/update_preimage −1 makes per-group maintenance one SUM
   over the feed — an update that moves a row between groups debits the
   old group and credits the new automatically. min/max/approx_distinct
   ride along as MERGEABLE-only aggregates (least/greatest; HLL sketch
   union) valid across insert-only windows — a window containing any
   retraction refuses loudly (a deleted max cannot be un-maxed without
   a rescan; that's `refresh_rollup`'s job). Work ∝ the change feed
   (the changed source partitions), plus a merge into the rollup-sized
   target.

Exactly-once without coordination: each refresh stamps the source
version it consumed into the target manifest's `app` metadata IN THE
SAME atomic commit as the data (`app_metadata=`). A crash before the
flip leaves data AND watermark at the previous state — the rerun
repeats a deterministic recompute of the same window; after the flip
the watermark satisfies the next refresh's no-op check. Data and
"how far have I consumed" can never diverge.

Retention contract: the source's `vacuum_manifest(keep_last=...)` must
retain the watermark version, or the next delta refresh raises
FileNotFoundError (loud, never silently wrong); `refresh_rollup` only
needs the two manifest JSONs, so it survives any retention that keeps
the watermark's commit object.

Numeric caveat: delta-mode sums over INTEGER measures accumulate in
long — exact at any magnitude (overflow semantics = SQL SUM(long)).
Float measures and averages accumulate in double across refreshes, so
they can drift from a from-scratch recompute by FP summation order.
Partition-aligned recompute recomputes true per-group sums, but double
SUM is still ulp-sensitive to Spark's reduction order (measured ~1e-16
relative vs a differently-planned full recompute — the same drift two
full recomputes can show between themselves). Counts and distinct
counts are exact everywhere. For bit-reproducible float sums, make the
measure a decimal column — decimal accumulation is order-exact (the
discipline this repo's DuckDB oracles already follow).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from f1_data_pipeline_spark.operators.partitioning import (
    DERIVED_COL,
    apply_transform,
    parse_partition_spec,
)
from f1_data_pipeline_spark.operators.sinks import (
    _transform_of,
    manifest_changed_partitions,
    manifest_row_changes,
    manifest_versions,
    merge_upsert_manifest,
    read_manifest,
    read_manifest_table,
    replace_manifest_partitions,
    _commit_with_rebase,
)

_ROLLUP_OPS = {
    "count", "sum", "min", "max", "avg", "count_distinct", "approx_distinct",
}
_DELTA_OPS = {"count", "sum", "avg", "min", "max", "approx_distinct"}
# mergeable across insert-only windows, but not retractable — a window
# with deletes/updates rejects these (refresh_rollup handles them)
_MERGEABLE_ONLY = {"min", "max", "approx_distinct"}
WATERMARK_KEY = "mv_source_version"


def _check_aggs(aggs: dict, allowed: set[str]) -> None:
    if not aggs:
        raise ValueError("at least one aggregate is required")
    for out, (op, col) in aggs.items():
        if op not in allowed:
            raise ValueError(
                f"aggregate {out!r}: op {op!r} not supported here "
                f"(allowed: {sorted(allowed)}"
                + (
                    "; non-recomputing strategies can't express it — "
                    "use refresh_rollup)"
                    if op in _ROLLUP_OPS | _DELTA_OPS
                    else ")"
                )
            )
        if col == "*" and op != "count":
            raise ValueError(f"aggregate {out!r}: '*' is only valid for count")


def _mv_state(target_path: str, source_path: str) -> int | None:
    """The target's consumed-source-version watermark; validates that the
    target was maintained FROM THIS SOURCE — version numbers from a
    different table would silently apply a foreign delta window."""
    m = read_manifest(target_path)
    if m is None:
        return None
    app = m.get("app", {})
    stored_src = app.get("mv_source")
    if app.get(WATERMARK_KEY) is not None and stored_src != source_path:
        raise ValueError(
            f"target {target_path} is maintained from {stored_src!r}, "
            f"not {source_path!r} — refusing to apply a foreign source's "
            "change window"
        )
    return app.get(WATERMARK_KEY)


def _latest_version(source_path: str) -> int:
    versions = manifest_versions(source_path)
    if not versions:
        raise FileNotFoundError(f"no manifest at {source_path}")
    return versions[-1]


# ---------------------------------------------------------------------------
# Strategy 1: partition-aligned incremental recompute
# ---------------------------------------------------------------------------


def _rollup_exprs(aggs: dict) -> list[Column]:
    out = []
    for name, (op, col) in aggs.items():
        if op == "count":
            e = F.count(F.lit(1)) if col == "*" else F.count(col)
        elif op == "count_distinct":
            e = F.count_distinct(col).cast("long")
        elif op == "approx_distinct":
            e = F.approx_count_distinct(col)
        else:
            e = getattr(F, op)(col)
        out.append(e.alias(name))
    return out


def refresh_rollup(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    group_cols: Sequence[str],
    aggs: dict,
    full_recompute_fraction: float = 0.8,
    extra_app_metadata: dict | None = None,
) -> dict:
    """Incremental refresh of `SELECT group_cols, aggs FROM source GROUP BY
    group_cols` into the manifest table at `target_path`, recomputing ONLY
    the source partitions that changed since the last refresh (module
    docstring has the strategy and the exactly-once argument).

    `aggs` maps output column → (op, source column) with op ∈ {count,
    sum, min, max, avg, count_distinct, approx_distinct}; ('count', '*')
    counts rows. Exact count_distinct is a recompute-strategy exclusive —
    it is not mergeable at all, but changed groups are recomputed from
    rows here, so it is simply an expression. The source's
    partition column must be among `group_cols` (each group then lives in
    exactly one partition, so a changed partition's groups are exactly
    the rows recomputed). The target is partitioned by the same column;
    read it with a plain `read_manifest_table` — it stores the final
    aggregate values. The `group_cols`/`aggs` spec is part of the
    target's identity: keep it fixed for the life of a target path
    (changing it mid-life would mix schemas across partitions).

    A HIDDEN-partitioned source (partition transform, e.g. `days(ts)`)
    is supported by grouping on the DERIVED value: pass one group entry
    as a `(output_name, transform_spec)` tuple whose spec matches the
    source's — `group_cols=[("day", "days(ts)"), "cat"]` — and the
    rollup materializes the transform as a real `day` column, with the
    target identity-partitioned by it. Each group still lives in exactly
    one source partition (the group key IS the partition value), so the
    changed-partition recompute strategy carries over unchanged — the
    natural "daily rollup over an event table" shape.

    `full_recompute_fraction` is the auto-chooser dial: when more than
    this fraction of the source's partitions changed since the last
    refresh, the refresher recomputes the WHOLE view in one job instead
    of per-partition (the per-touched-partition bookkeeping overhead
    exceeds the saved scan once nearly the whole table moved — measured
    grid in SCALE_NOTES "matview refresh crossover": incremental wins
    every probed cell up to 75% changed (0.05–0.82× of full) and only
    loses at 100% changed on the larger table (1.4×), so 0.8 is the
    measured default). Anything > 1 forces always-incremental; 0.0
    forces always-full.

    `extra_app_metadata` merges into the watermark stamp of every
    commit this refresh makes — callers persisting their own spec
    beside the view (the SQL console's `matview_sql`) get it in the
    SAME atomic commit as the data, never a second commit a crash can
    separate.

    Returns {"source_version", "partitions_refreshed",
    "partitions_dropped", "noop", "strategy"} — strategy ∈ {initial,
    incremental, full, stamp, noop} records which path ran."""
    _check_aggs(aggs, _ROLLUP_OPS)
    sm = read_manifest(source_path)
    if sm is None:
        raise FileNotFoundError(f"no manifest at {source_path}")
    s_pt = _transform_of(sm)
    spec_entries = [g for g in group_cols if isinstance(g, tuple)]
    plain_cols = [g for g in group_cols if not isinstance(g, tuple)]
    derived_name: str | None = None
    if s_pt is not None and s_pt.kind != "identity":
        if len(spec_entries) != 1 or parse_partition_spec(
            spec_entries[0][1]
        ).spec != sm["partition_col"]:
            raise ValueError(
                "the source is hidden-partitioned by "
                f"{sm['partition_col']!r} — group_cols must include "
                "exactly one (output_name, that_spec) tuple so groups "
                "align with partitions, e.g. "
                f"[('day', {sm['partition_col']!r}), ...]"
            )
        derived_name = spec_entries[0][0]
        if derived_name in plain_cols:
            raise ValueError(
                f"derived group name {derived_name!r} collides with a "
                "plain group column"
            )
        pcol = derived_name  # the TARGET's identity partition column
    else:
        if spec_entries:
            raise ValueError(
                "transform group entries are only for hidden-partitioned "
                f"sources; {source_path} is identity-partitioned"
            )
        pcol = sm.get("partition_col")
        if pcol is None or pcol not in list(group_cols):
            raise ValueError(
                f"refresh_rollup needs the source partition column ({pcol!r}) "
                f"among group_cols {list(group_cols)} — for arbitrary groups "
                "use refresh_aggregate_deltas (additive aggs; min/max/"
                "approx_distinct on insert-only windows)"
            )
    s_latest = _latest_version(source_path)
    wm = _mv_state(target_path, source_path)
    if wm == s_latest:
        return {
            "source_version": s_latest,
            "partitions_refreshed": 0,
            "partitions_dropped": 0,
            "noop": True,
            "strategy": "noop",
        }
    src_parts = read_manifest(source_path, s_latest)["partitions"]
    if wm is None:
        if read_manifest(target_path) is not None:
            raise ValueError(
                f"target {target_path} exists but carries no matview "
                "watermark — it was not built by this refresher; stale "
                "partitions it holds would silently survive an initial "
                "build. Start from an empty target path."
            )
        changed = dict.fromkeys(src_parts, "added")
        strategy = "initial"
    else:
        changed = manifest_changed_partitions(source_path, wm, s_latest)
        frac = len(changed) / max(len(src_parts), 1)
        if changed and frac > full_recompute_fraction:
            # auto-chooser (round-7 verdict #3): per-changed-partition
            # refresh pays a constant overhead per touched partition
            # (manifest bookkeeping + the replace commit) ON TOP of the
            # same scan+agg work full recompute does for those
            # partitions — once nearly the whole table changed,
            # recomputing everything in one job is cheaper (measured
            # grid: SCALE_NOTES "matview refresh crossover"). A full
            # recompute here recomputes ALL present partitions in one
            # replace; vanished partitions still drop.
            full = dict.fromkeys(src_parts, "added")
            for k, st in changed.items():
                if st == "removed":
                    full[k] = "removed"
            changed = full
            strategy = "full"
        else:
            strategy = "incremental"
    present = [k for k, st in changed.items() if st != "removed"]
    removed = [k for k, st in changed.items() if st == "removed"]
    stamp = {
        WATERMARK_KEY: s_latest, "mv_source": source_path,
        **(extra_app_metadata or {}),
    }
    if not changed:
        # versions moved without partition changes (retention churn):
        # advance the watermark alone so future refreshes no-op cheaply
        tm = read_manifest(target_path) or {
            "version": 0, "partition_col": pcol, "partitions": {},
        }
        _commit_with_rebase(
            spark, target_path, tm, {}, app_metadata=stamp,
            op="matview_stamp",
        )
        return {
            "source_version": s_latest,
            "partitions_refreshed": 0,
            "partitions_dropped": 0,
            "noop": False,
            "strategy": "stamp",
        }
    src = read_manifest_table(
        spark,
        source_path,
        partition_values=present,
        partition_values_encoded=True,
        version=s_latest,
    )
    if derived_name is not None:
        # materialize the hidden partition value as the named group col
        src = apply_transform(s_pt, src).withColumnRenamed(
            DERIVED_COL, derived_name
        )
    gb = [derived_name if isinstance(g, tuple) else g for g in group_cols]
    slice_df = src.groupBy(*gb).agg(*_rollup_exprs(aggs))
    out = replace_manifest_partitions(
        spark,
        slice_df,
        target_path,
        pcol,
        drop_partitions_encoded=removed,
        app_metadata=stamp,
    )
    return {
        "source_version": s_latest,
        "partitions_refreshed": out["partitions_replaced"],
        "partitions_dropped": out["partitions_dropped"],
        "noop": False,
        "strategy": strategy,
    }


# ---------------------------------------------------------------------------
# Strategy 2: CDC delta-application (additive aggregates, arbitrary groups)
# ---------------------------------------------------------------------------


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint", "boolean"}


def _delta_plan(
    aggs: dict, dtypes: dict | None = None
) -> list[tuple[str, str, str]]:
    """Delta-mode storage plan beyond group cols and `_n`:
    [(storage column, kind, source column)] with kind ∈ cnt (signed
    non-null count), sum_long / sum_double (signed running totals —
    integer measures accumulate in LONG so they stay exact past 2^53
    and read back as SQL SUM(long) would, long), min / max (merge by
    least/greatest), hll (merge by sketch union). `dtypes` (from
    df.dtypes) picks sum_long vs sum_double; without it (name-only
    callers) sums default to sum_double — the NAMES are identical
    either way."""
    dtypes = dtypes or {}

    def _sum_kind(col: str) -> str:
        return (
            "sum_long" if dtypes.get(col) in _INTEGRAL_TYPES else "sum_double"
        )

    cols: list[tuple[str, str, str]] = []
    for out, (op, col) in aggs.items():
        if op == "count" and col == "*":
            continue  # served by _n
        if op == "count":
            cols.append((out, "cnt", col))
        elif op == "sum":
            cols.append((out, _sum_kind(col), col))
            cols.append((f"_nn_{out}", "cnt", col))
        elif op == "avg":
            cols.append((f"_sum_{out}", "sum_double", col))
            cols.append((f"_nn_{out}", "cnt", col))
        elif op in ("min", "max"):
            cols.append((out, op, col))
        elif op == "approx_distinct":
            cols.append((f"_hll_{out}", "hll", col))
    return cols


def refresh_aggregate_deltas(
    spark: SparkSession,
    source_path: str,
    source_keys: Sequence[str],
    target_path: str,
    group_cols: Sequence[str],
    aggs: dict,
    partition_col: str | None = None,
    n_buckets: int = 64,
) -> dict:
    """Maintain `SELECT group_cols, aggs FROM source GROUP BY group_cols`
    by APPLYING the preimage-extended change feed — no source rescan, for
    group columns with no relation to the source's partitioning (module
    docstring: the ±1-signed feed makes additive maintenance one SUM).

    `aggs`: output column → (op, source column), op ∈ {count, sum, avg,
    min, max, approx_distinct}. count/sum/avg are FULLY incremental
    (signed deltas retract cleanly). min/max/approx_distinct are
    MERGEABLE BUT NOT RETRACTABLE — they combine across insert-only
    windows (least/greatest; HLL sketch union), so a refresh window
    containing any delete or update raises and the table needs
    `refresh_rollup` instead (a deleted max cannot be un-maxed without a
    rescan). The `aggs` spec is part of the target's identity — keep it
    fixed for the life of a target path.

    The target stores internal running columns (`_n`, per-sum non-null
    counts, per-avg sums, per-distinct HLL sketches) — read it with
    `read_aggregate`, which also hides groups whose rows have all been
    deleted (`_n` = 0; the rows stay until a
    `delete_manifest_rows(target, [('_n','=',0)])` sweep so each refresh
    stays a single atomic commit).

    Target layout: by default groups are spread across `n_buckets` hash
    partitions of the group key (`_gbucket`) — partitioning by a group
    column directly would mint ONE manifest partition per value, a
    metadata blow-up for high-cardinality groups (domains, repos); a
    bounded bucket count keeps the manifest small while a refresh still
    touches only the buckets its changed groups hash into. Pass
    `partition_col=<a group column>` instead when the leading group
    column is low-cardinality and you want partition pruning on it.

    Returns {"source_version", "groups_touched", "noop"}."""
    _check_aggs(aggs, _DELTA_OPS)
    gcols = list(group_cols)
    if partition_col is None:
        pcol = "_gbucket"  # hash(group key) % n_buckets, computed below
    else:
        pcol = partition_col
        if pcol not in gcols:
            raise ValueError(
                f"partition_col {pcol!r} must be one of group_cols {gcols}"
            )
    s_latest = _latest_version(source_path)
    wm = _mv_state(target_path, source_path)
    stamp = {WATERMARK_KEY: s_latest, "mv_source": source_path}
    if pcol == "_gbucket":
        # n_buckets is part of the target's identity: a different bucket
        # count re-hashes every group to a different partition, and the
        # merge (keys determine partition "by construction") would then
        # duplicate groups across old and new buckets — pin it in the
        # same app metadata that pins the source
        if wm is not None:
            stored_b = (
                read_manifest(target_path).get("app", {}).get("mv_buckets")
            )
            if stored_b is not None and stored_b != n_buckets:
                raise ValueError(
                    f"target {target_path} was bucketed with "
                    f"n_buckets={stored_b}; refreshing with {n_buckets} "
                    "would re-hash groups into different partitions and "
                    "double-count them — keep n_buckets fixed for the "
                    "target's life"
                )
        stamp["mv_buckets"] = n_buckets
    if wm == s_latest:
        return {"source_version": s_latest, "groups_touched": 0, "noop": True}

    def _stamp_only() -> dict:
        # the source moved without row changes (constraint DDL, retention
        # churn, a compaction rewriting identical rows): advance the
        # watermark alone, or every future refresh re-walks this window
        # for nothing and a vacuum past the stale watermark bricks it
        tm = read_manifest(target_path) or {
            "version": 0, "partition_col": pcol, "partitions": {},
        }
        _commit_with_rebase(
            spark, target_path, tm, {}, app_metadata=stamp,
            op="matview_stamp",
        )
        return {"source_version": s_latest, "groups_touched": 0, "noop": False}

    if wm is None:
        if read_manifest(target_path) is not None:
            raise ValueError(
                f"target {target_path} exists but carries no matview "
                "watermark — it was not built by this refresher; applying "
                "the full source as inserts would double-count it. Start "
                "from an empty target path."
            )
        changes = read_manifest_table(
            spark, source_path, version=s_latest
        ).withColumn("_change", F.lit("insert"))
    else:
        # metadata-only short-circuit: no changed partitions → empty feed
        if not manifest_changed_partitions(source_path, wm, s_latest):
            return _stamp_only()
        changes = manifest_row_changes(
            spark, source_path, list(source_keys), wm, s_latest,
            include_preimage=True,
        )
    plan = _delta_plan(aggs, dict(changes.dtypes))
    reserved = {"_n", "_gbucket"} | {n for n, _, _ in plan}
    clash = [c for c in gcols if c in reserved]
    if clash:
        raise ValueError(f"group_cols {clash} collide with storage columns")
    mergeable_only = [
        out for out, (op, _) in aggs.items() if op in _MERGEABLE_ONLY
    ]
    sign = (
        F.when(F.col("_change").isin("insert", "update_postimage"), F.lit(1))
        .when(F.col("_change").isin("delete", "update_preimage"), F.lit(-1))
        .cast("long")
    )
    delta_exprs: list[Column] = [F.sum(sign).alias("_n")]
    for name, kind, col in plan:
        if kind == "cnt":
            e = F.sum(
                F.when(F.col(col).isNotNull(), sign).otherwise(F.lit(0))
            ).cast("long")
        elif kind == "sum_long":
            e = F.sum(
                sign * F.coalesce(F.col(col).cast("long"), F.lit(0))
            ).cast("long")
        elif kind == "sum_double":
            e = F.sum(
                sign.cast("double")
                * F.coalesce(F.col(col).cast("double"), F.lit(0.0))
            )
        elif kind == "min":
            e = F.min(col)
        elif kind == "max":
            e = F.max(col)
        else:  # hll
            e = F.hll_sketch_agg(col)
        delta_exprs.append(e.alias(name))
    # the retraction flag rides the SAME aggregation — the change feed
    # (the expensive joins) is computed once, cached, and reused by the
    # guard, the merge, and the count
    delta_exprs.append(
        F.max(
            F.when(F.col("_change") == "insert", F.lit(0)).otherwise(F.lit(1))
        ).alias("_retract")
    )
    cached = changes.groupBy(*gcols).agg(*delta_exprs).persist()
    try:
        cached.count()  # materialize once; later jobs read the cache
        if mergeable_only and wm is not None:
            if cached.filter(F.col("_retract") == 1).limit(1).count():
                raise ValueError(
                    f"aggregates {mergeable_only} (min/max/approx_distinct) "
                    "merge across insert-only windows but cannot RETRACT, "
                    "and this refresh window contains deletes/updates — "
                    "recompute with refresh_rollup, or keep the source "
                    "append-only"
                )
        deltas = cached.drop("_retract")

        tm = read_manifest(target_path)
        if tm is None:
            # the deltas frame already has every storage column at its
            # final type (signed totals at long/double per the measure's
            # type, min/max at the source type, binary sketch)
            current = spark.createDataFrame(
                [],
                T.StructType(
                    [deltas.schema[c] for c in gcols]
                    + [deltas.schema["_n"]]
                    + [deltas.schema[n] for n, _, _ in plan]
                ),
            )
        elif pcol == "_gbucket":
            # every existing row a delta group can combine with lives in
            # the buckets those groups hash into — read ONLY them, so the
            # combine join scans ∝ touched buckets, not rollup size
            # (bounded collect: ≤ n_buckets values)
            touched_buckets = [
                r["b"]
                for r in cached.select(
                    F.pmod(F.hash(*gcols), F.lit(n_buckets))
                    .cast("int")
                    .alias("b")
                )
                .distinct()
                .collect()
            ]
            current = read_manifest_table(
                spark, target_path, partition_values=touched_buckets
            )
        else:
            # same pruning through the explicit partition column (a group
            # column, low-cardinality by this mode's contract)
            touched_parts = [
                r[0] for r in cached.select(pcol).distinct().collect()
            ]
            current = read_manifest_table(
                spark, target_path, partition_values=touched_parts
            )
        # null-safe group join: NULL group values are real groups
        from functools import reduce

        d, t = deltas.alias("d"), current.alias("t")
        on = reduce(
            lambda a, b: a & b,
            [F.col(f"d.{c}").eqNullSafe(F.col(f"t.{c}")) for c in gcols],
        )

        def _combine(name: str, kind: str) -> Column:
            tc, dc = F.col(f"t.{name}"), F.col(f"d.{name}")
            if kind in ("cnt", "sum_long", "sum_double"):
                tp = "double" if kind == "sum_double" else "long"
                return (
                    F.coalesce(tc, F.lit(0).cast(tp))
                    + F.coalesce(dc, F.lit(0).cast(tp))
                ).cast(tp).alias(name)
            if kind == "min":
                return F.least(tc, dc).alias(name)  # least/greatest skip NULLs
            if kind == "max":
                return F.greatest(tc, dc).alias(name)
            return (  # hll: union, either side absent → the other
                F.when(tc.isNull(), dc)
                .when(dc.isNull(), tc)
                .otherwise(F.hll_union(tc, dc))
                .alias(name)
            )

        merged = d.join(t, on, "left").select(
            *[F.col(f"d.{c}").alias(c) for c in gcols],
            _combine("_n", "cnt"),
            *[_combine(name, kind) for name, kind, _ in plan],
        )
        if pcol == "_gbucket":
            # deterministic function of the FULL group key (NULL-safe:
            # F.hash hashes NULL to a fixed value), so keys trivially
            # determine the partition and a refresh touches only the
            # buckets its changed groups hash into
            merged = merged.withColumn(
                "_gbucket",
                F.pmod(F.hash(*gcols), F.lit(n_buckets)).cast("int"),
            )
        n = merge_upsert_manifest(
            spark,
            merged,
            target_path,
            keys=gcols,
            partition_col=pcol,
            # the partition column is a (deterministic function of the)
            # key, so a key spanning partitions is impossible by
            # construction — skip the untouched-prefix scan
            check_moved_keys=False,
            app_metadata=stamp,
        )
    finally:
        cached.unpersist()
    if n == 0:
        # changed partitions carried no row-level diffs (e.g. a compaction
        # rewrote identical rows): the merge had nothing to commit, so the
        # watermark must advance on its own
        return _stamp_only()
    return {"source_version": s_latest, "groups_touched": n, "noop": False}


def read_aggregate(
    spark: SparkSession, target_path: str, aggs: dict
) -> DataFrame:
    """The maintained aggregate in its final shape: group columns + one
    column per `aggs` output, SQL semantics restored from the internal
    running columns (SUM/AVG over zero non-NULL values read NULL; AVG =
    sum/count of non-NULLs), groups with no live rows (`_n` = 0) hidden."""
    df = read_manifest_table(spark, target_path)
    internal = {"_n", "_gbucket"} | {n for n, _, _ in _delta_plan(aggs)}
    gcols = [c for c in df.columns if c not in internal]
    outs: list[Column] = []
    for out, (op, col) in aggs.items():
        if op == "count" and col == "*":
            outs.append(F.col("_n").alias(out))
        elif op == "count":
            outs.append(F.col(out).alias(out))
        elif op == "sum":
            outs.append(
                F.when(F.col(f"_nn_{out}") > 0, F.col(out)).alias(out)
            )
        elif op == "avg":
            outs.append(
                F.when(
                    F.col(f"_nn_{out}") > 0,
                    F.col(f"_sum_{out}") / F.col(f"_nn_{out}"),
                ).alias(out)
            )
        elif op in ("min", "max"):
            outs.append(F.col(out).alias(out))
        elif op == "approx_distinct":
            # SQL approx_count_distinct over zero non-NULL values is 0
            outs.append(
                F.when(F.col(f"_hll_{out}").isNull(), F.lit(0))
                .otherwise(F.hll_sketch_estimate(F.col(f"_hll_{out}")))
                .cast("long")
                .alias(out)
            )
    return df.filter(F.col("_n") > 0).select(*gcols, *outs)
