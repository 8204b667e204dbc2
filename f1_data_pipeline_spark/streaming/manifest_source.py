"""Manifest change feed as a REAL Structured Streaming source.

`spark.readStream.format("manifest_changes")` over a manifest table's
commit log: offsets are manifest VERSIONS, each micro-batch is the
row-level CDC feed of the commits in its window — the Delta-as-a-source
contract, so checkpoint/trigger/exactly-once semantics come from
Structured Streaming itself instead of the bespoke driver loops
(`consume_table_changes`, `read_manifest_increment`) that preceded it.
The reference's entire control plane is scheduled-batch-as-stream
(/root/reference/metadata.py:150-191); this source is that pattern made
native.

Semantics
---------
- One row per change, tagged `_change` ∈ {insert, update_postimage,
  delete} (+ update_preimage with option("preimage", "true")) and
  `_commit_version` (the manifest version that landed the change) —
  per-COMMIT granularity: a key updated in two commits of one window
  yields both updates, in version order. (`manifest_row_changes`
  collapses a multi-commit window to its net effect; per-commit is the
  change-data-feed contract every streaming consumer wants, and the two
  agree on every single-commit window — pytest pins that parity.)
- Bootstrap: by default the FIRST batch is the full current snapshot
  tagged all-insert (the `consume_table_changes` bootstrap shape);
  option("starting_version", N) instead replays history from commit N
  (requires versions N-1.. retained — vacuum keep_last must cover it).
- Planning (driver): one InputPartition per changed manifest PARTITION
  spanning the batch's whole version window, carrying its per-commit
  diff steps (round 11: adjacent commits FOLD — it used to be one per
  (commit, partition)) — cost ∝ changed partitions, never table size,
  and the partitions the manifests say are untouched are never listed.
- Reading (executors): each task walks its partition's steps in
  version order, reconstructing old/new row sets with pyarrow
  (position deletes applied — merge-on-read DELETEs surface as CDC
  deletes) and reusing step i's loaded new side as step i+1's old side
  (K commits touch K+1 snapshot loads, not 2K), classifies
  insert/update/delete by a key join, and ships Arrow record batches —
  no driver data path. Emitted rows are byte-identical to per-commit
  planning; ordering is guaranteed only BY `_commit_version` (as
  before — tasks across partitions were always unordered, and within a
  partition steps run in version order).

Scale posture: the diff grain is (changed partition × commit); the
layout policy bounds partition size, writers reject keys that move
partitions within a commit (the mover protocol forces a two-commit
window, i.e. two batches here), so a per-partition diff is exact.
Rows never cross tasks; executor memory holds one partition's old+new
sides, the same bound `manifest_row_changes`'s shuffled join has per
shuffle partition.

Retention contract: stream state (the checkpoint) stores versions; a
restart needs every version in its replay window still retained —
`vacuum_manifest(keep_last=...)` must cover the longest consumer lag,
or the next batch raises FileNotFoundError (loud, never silent loss).

Trigger note: Python data sources don't implement AvailableNow's
admission protocol, so Spark falls back to single-batch execution (one
batch pinned at the latest offset when the trigger fires, then stop) —
exactly the drain-the-backlog shape the helpers here want; commits
landing mid-drain arrive on the next start, same checkpoint.

Per-drain fixed cost (round 12, measured at sf0.1 — SCALE_NOTES has the
table): a drain's wall time is dominated by Spark's per-query Python
source-RUNNER process spawn (~1.2 s: a fresh interpreter + full pyspark
import; PythonStreamingSourceRunner constructs its PythonWorkerFactory
with useDaemon=false, so no daemon fork, not configurable), then ~0.3 s
of JVM job scheduling; the data path itself is ~0.15 s for a 34.5k-row
window. What this module controls is kept minimal: the reader
constructor costs zero manifest reads on the helper path (schema/fields
threaded through options), planning parses each manifest once, and an
idle heartbeat batch plans zero partitions. The spawn is per QUERY
START, not per batch — a steady-state consumer (processingTime trigger,
optionally with heartbeat) pays it once and each subsequent drain costs
only the marginal batch (bench.py's cdc block prices both shapes).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from f1_data_pipeline_spark.operators.arrow_read import (
    entry_paths as _entry_abs,
)
from f1_data_pipeline_spark.operators.arrow_read import load_side as _load_side

__all__ = [
    "ManifestChangesDataSource",
    "register_manifest_changes_source",
    "read_change_stream",
    "start_change_stream_replica",
]

_CHANGE_FIELDS = [
    T.StructField("_change", T.StringType()),
    T.StructField("_commit_version", T.LongType()),
]


def _table_fields(path: str) -> list[tuple[str, str]]:
    """[(logical name, physical file column name)] of the table's CURRENT
    stored schema — files always carry physical names (RENAME COLUMN
    never rewrites data), so the map is version-stable: an old file that
    predates a column simply lacks its physical name and reads NULL."""
    from f1_data_pipeline_spark.operators.sinks import (
        _phys_name,
        _stored_of,
        read_manifest,
    )

    m = read_manifest(path)
    if m is None:
        raise FileNotFoundError(f"no manifest at {path}")
    stored = _stored_of(m)
    if stored is None:
        raise ValueError(
            f"manifest at {path} predates stored schemas — cannot stream"
        )
    return [(f.name, _phys_name(f)) for f in stored.fields]


def _feed_schema(path: str) -> T.StructType:
    from f1_data_pipeline_spark.operators.sinks import (
        _stored_of,
        read_manifest,
    )

    m = read_manifest(path)
    if m is None:
        raise FileNotFoundError(f"no manifest at {path}")
    stored = _stored_of(m)
    if stored is None:
        raise ValueError(
            f"manifest at {path} predates stored schemas — cannot stream"
        )
    meta = {f.name for f in _CHANGE_FIELDS}
    clash = sorted(meta & set(stored.names))
    if clash:
        # refuse at START (a worker-side schema KeyError mid-stream is
        # undebuggable): feed meta columns shadow same-named data columns
        raise ValueError(
            f"table at {path} has data column(s) {clash} that collide "
            "with the change feed's meta columns — rename them (ALTER "
            "TABLE ... RENAME COLUMN) before streaming changes"
        )
    return T.StructType(list(stored.fields) + _CHANGE_FIELDS)


@dataclass
class _ChangePartition(InputPartition):
    kind: str  # "snapshot" | "chain"
    commit_version: int
    new_files: list = field(default_factory=list)
    new_delete_dirs: list = field(default_factory=list)
    # chain: this manifest partition's per-commit diff steps for the
    # whole batch window, in version order — each element is
    # (commit_version, new_files, new_delete_dirs, old_files,
    # old_delete_dirs). One task walks the chain and REUSES each loaded
    # snapshot as step i's new side AND step i+1's old side (they are
    # the same entry by construction), so a partition touched by K
    # commits loads K+1 snapshots instead of 2K across K tasks.
    steps: list = field(default_factory=list)
    keys: tuple = ()
    fields: tuple = ()  # ((logical, physical), ...)
    schema_json: str = ""
    preimage: bool = False


class ManifestChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "manifest_changes requires .option('path', <table root>) "
                "or .load(<table root>)"
            )
        keys = options.get("keys")
        if not keys:
            raise ValueError(
                "manifest_changes requires .option('keys', 'k1,k2') — the "
                "table's logical key columns drive the row diff"
            )
        self._keys = tuple(k.strip() for k in keys.split(",") if k.strip())
        sv = options.get("starting_version")
        self._starting_version = int(sv) if sv is not None else None
        if self._starting_version is not None and self._starting_version < 1:
            raise ValueError("starting_version must be >= 1")
        self._preimage = str(options.get("preimage", "false")).lower() == "true"
        self._heartbeat = (
            str(options.get("heartbeat", "false")).lower() == "true"
        )
        self._hb = 0
        # bootstrap-snapshot streams suppress heartbeats until a batch
        # consumes a real version (set HERE, not in initialOffset — Spark
        # polls latestOffset before initialOffset on a fresh query). The
        # cost on a RESTARTED bootstrap stream: idle heartbeats resume
        # only after its first post-restart data batch (the reader can't
        # see the checkpointed offset until partitions() runs, so it
        # can't prove the bootstrap already happened); starting_version
        # streams heartbeat immediately, restarts included.
        self._awaiting_bootstrap = self._starting_version is None
        mvpt = options.get("max_versions_per_batch")
        self._max_versions = int(mvpt) if mvpt is not None else None
        if self._max_versions is not None and self._max_versions < 1:
            raise ValueError("max_versions_per_batch must be >= 1")
        # the feed schema and the logical→physical field map are pure
        # functions of the table's CURRENT manifest; `read_change_stream`
        # computes them ONCE on the driver and threads them through the
        # options, so this constructor — which runs three times per query
        # start (driver schema(), the per-query source-runner process,
        # the read-planning worker) — costs zero manifest reads on the
        # helper path (round-12 per-drain fixed-cost work). Direct
        # .format("manifest_changes") users without the options keep the
        # self-computing fallback; both paths validate identically
        # (_feed_schema raises on meta-column collisions).
        fj, sj = options.get("fields_json"), options.get("feed_schema_json")
        if fj and sj:
            self._fields = tuple(tuple(x) for x in json.loads(fj))
            self._schema_json = sj
        else:
            self._fields = tuple(_table_fields(self._path))
            self._schema_json = _feed_schema(self._path).json()
        names = {n for n, _ in self._fields}
        missing = [k for k in self._keys if k not in names]
        if missing:
            raise ValueError(
                f"key column(s) {missing} not in table schema {sorted(names)}"
            )

    # -- offsets ---------------------------------------------------------
    def initialOffset(self) -> dict:
        if self._starting_version is not None:
            self._consumed = self._starting_version - 1
            return {"version": self._starting_version - 1}
        # bootstrap-snapshot mode: version 0 = nothing consumed; the first
        # planned window (0 → latest) emits the snapshot AT latest.
        # `_awaiting_bootstrap` (set in __init__) suppresses heartbeats
        # until that snapshot batch runs: a heartbeat's end offset
        # carries no `bootstrap` marker, so one firing BEFORE the
        # snapshot would silently convert the stream into a from-v1
        # per-commit replay.
        self._consumed = 0
        return {"version": 0, "bootstrap": "snapshot"}

    def latestOffset(self) -> dict:
        from f1_data_pipeline_spark.operators.sinks import manifest_versions

        versions = manifest_versions(self._path)
        latest = versions[-1] if versions else 0
        if self._starting_version is not None:
            # a starting_version beyond the current latest means "skip
            # everything until commit N lands": the reported offset must
            # never REGRESS below N-1, or Spark would checkpoint the
            # lower offset and later emit the very versions the caller
            # asked to skip
            latest = max(latest, self._starting_version - 1)
        base = getattr(self, "_consumed", None)
        if self._max_versions is not None and base is not None:
            # catch-up rate limit: at most N commits per micro-batch.
            # The base is learned from the run's own planning calls
            # (Spark asks for the latest offset BEFORE initialOffset and
            # never tells a restarted reader its checkpointed offset, so
            # pre-seeding the base here could sit BELOW the checkpoint
            # and stall the stream forever). Net contract: the FIRST
            # batch of a (re)started query takes the whole backlog; every
            # later batch is bounded — a mid-run commit burst drains in
            # N-commit chunks instead of one giant batch.
            latest = min(latest, base + self._max_versions)
        if self._heartbeat and not getattr(self, "_awaiting_bootstrap", False):
            # idle-drain heartbeat (round-12 verdict #5): attach a poll
            # stamp so every reported offset differs from the committed
            # one — Spark then runs a batch on EVERY trigger, empty when
            # no commits landed. An empty batch is what lets a stateful
            # consumer's watermark close windows without waiting for the
            # next data-bearing commit (the one-drain emission lag the
            # round-11 pin documents); it plans zero partitions and reads
            # zero manifests (see partitions()). Data batches carry the
            # stamp too — partitions() reads only the version bounds, so
            # the emitted rows are byte-identical with or without it.
            # The stamp is a wall-clock ns value, NOT a per-reader
            # counter: each drain constructs a fresh reader, and a
            # counter would restart at the same value the previous
            # drain checkpointed — offset equality would then swallow
            # the very idle batch the option exists to run. Replays are
            # untouched (Spark replays WAL-planned batches with their
            # recorded offsets; only the version bounds reach planning).
            import time as _time

            self._hb = max(self._hb + 1, _time.time_ns())
            return {"version": latest, "hb": self._hb}
        return {"version": latest}

    # -- planning (driver) ------------------------------------------------
    def partitions(self, start: dict, end: dict):
        from f1_data_pipeline_spark.operators.sinks import (
            changed_partitions_between,
            read_manifest,
        )

        lo, hi = int(start["version"]), int(end["version"])
        self._consumed = hi  # rate-limit base for the NEXT latestOffset
        if hi >= 1:
            # heartbeats may fire now: either the bootstrap snapshot ran
            # over real data, or a replay/chain batch consumed a version.
            # An EMPTY-table bootstrap (hi == 0) keeps the guard up — its
            # batch consumed nothing, and a heartbeat's bootstrap-less
            # end offset would flip the eventual first data batch from
            # snapshot mode into from-v1 replay.
            self._awaiting_bootstrap = False
        parts: list[_ChangePartition] = []
        common = dict(
            keys=self._keys,
            fields=self._fields,
            schema_json=self._schema_json,
            preimage=self._preimage,
        )
        if start.get("bootstrap") == "snapshot":
            if hi <= 0:
                return [
                    _ChangePartition(kind="snapshot", commit_version=0, **common)
                ]
            m = read_manifest(self._path, hi)
            if m is None:
                raise FileNotFoundError(
                    f"version {hi} not retained at {self._path}"
                )
            for e in m["partitions"].values():
                data, dels = _entry_abs(self._path, e)
                parts.append(
                    _ChangePartition(
                        kind="snapshot",
                        commit_version=hi,
                        new_files=data,
                        new_delete_dirs=dels,
                        **common,
                    )
                )
            # Spark requires >= 1 partition even for an empty batch
            return parts or [
                _ChangePartition(kind="snapshot", commit_version=hi, **common)
            ]
        # Adjacent-commit FOLDING (round-11 verdict #6): plan one
        # InputPartition per changed MANIFEST PARTITION spanning the
        # whole version window, carrying its per-commit diff steps —
        # instead of one per (commit, partition). The emitted rows are
        # IDENTICAL (each step still diffs one commit and tags its own
        # _commit_version — the per-commit feed contract is untouched,
        # and within a partition the steps execute in version order in
        # one task); what folding removes is the per-task fixed cost (a
        # Python worker round-trip + pyarrow opens per (commit,
        # partition)) and half the snapshot loads (see _ChangePartition
        # .steps). Ordering guarantee, unchanged from per-commit
        # planning: rows carry _commit_version and order is only
        # guaranteed BY that column — tasks across partitions were
        # always unordered. Task bound: one partition's steps ≤ the
        # window's commit count, which max_versions_per_batch caps.
        chains: dict[str, list] = {}
        # each version's manifest is parsed ONCE: v's manifest carries
        # over as v+1's old side (second review: the per-version
        # changed-partitions call used to re-read both sides, 4 parses
        # per step where K+1 suffice for a K-commit window)
        m_old = None
        if lo >= 1 and hi > lo:  # empty windows read nothing
            m_old = read_manifest(self._path, lo)
            if m_old is None:
                raise FileNotFoundError(
                    f"version {lo} not retained at {self._path} — vacuum "
                    "outran this stream's replay window (raise keep_last)"
                )
        for v in range(lo + 1, hi + 1):
            m_new = read_manifest(self._path, v)
            if m_new is None:
                raise FileNotFoundError(
                    f"version {v} not retained at {self._path} — vacuum "
                    "outran this stream's replay window (raise keep_last)"
                )
            if v == 1:
                changed = {k: "added" for k in m_new["partitions"]}
            else:
                changed = changed_partitions_between(m_old, m_new)
            for k, how in changed.items():
                nf, nd, of, od = [], [], [], []
                if how in ("added", "rewritten"):
                    nf, nd = _entry_abs(
                        self._path, m_new["partitions"][k]
                    )
                if how in ("removed", "rewritten"):
                    of, od = _entry_abs(
                        self._path, m_old["partitions"][k]
                    )
                chains.setdefault(k, []).append((v, nf, nd, of, od))
            m_old = m_new  # v's snapshot IS v+1's old side
        for k in sorted(chains):
            steps = chains[k]
            parts.append(
                _ChangePartition(
                    kind="chain", commit_version=steps[-1][0],
                    steps=steps, **common,
                )
            )
        return parts or [
            _ChangePartition(kind="chain", commit_version=hi, **common)
        ]

    # -- reading (executors) ----------------------------------------------
    def read(self, partition: _ChangePartition):
        yield from _read_change_partition(partition)

    def commit(self, end: dict) -> None:
        # checkpoint state is Spark's; track it only as the rate-limit base
        self._consumed = int(end["version"])




def _null_safe_changed(new_col, old_col):
    """Boolean numpy-ish mask of rows whose values differ, NULL-safe.
    Vectorized via pyarrow compute where the type supports equality;
    Python comparison for the rest (lists/structs) — those rows are
    already the bounded matched subset, never the whole table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        eq = pc.equal(new_col, old_col)
        both_null = pc.and_(pc.is_null(new_col), pc.is_null(old_col))
        same = pc.or_kleene(both_null, pc.fill_null(eq, False))
        return pc.invert(same)
    except pa.lib.ArrowNotImplementedError:
        return pa.array(
            [a != b for a, b in zip(new_col.to_pylist(), old_col.to_pylist())],
            pa.bool_(),
        )


def _read_change_partition(p: _ChangePartition):
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql.pandas.types import to_arrow_schema

    full = to_arrow_schema(T.StructType.fromJson(json.loads(p.schema_json)))
    data_names = [n for n, _ in p.fields]

    def _emit(table: "pa.Table", change: str, version: int):
        n = table.num_rows
        if not n:
            return None
        out = table.append_column(
            "_change", pa.array([change] * n, pa.string())
        ).append_column(
            "_commit_version", pa.array([version] * n, pa.int64())
        )
        return out.cast(full)

    def _diff(new_t, old_t, version: int):
        pieces = []
        keys = list(p.keys)
        lk = new_t.select(keys).append_column(
            "__ni", pa.array(range(new_t.num_rows), pa.int64())
        )
        rk = old_t.select(keys).append_column(
            "__oi", pa.array(range(old_t.num_rows), pa.int64())
        )
        j = lk.join(rk, keys=keys, join_type="full outer")
        ni, oi = j.column("__ni"), j.column("__oi")
        ins_idx = j.filter(pc.is_null(oi)).column("__ni")
        del_idx = j.filter(pc.is_null(ni)).column("__oi")
        matched = j.filter(pc.and_(pc.is_valid(ni), pc.is_valid(oi)))
        pieces.append(_emit(new_t.take(ins_idx), "insert", version))
        pieces.append(_emit(old_t.take(del_idx), "delete", version))
        if matched.num_rows:
            m_new = new_t.take(matched.column("__ni"))
            m_old = old_t.take(matched.column("__oi"))
            changed = pa.array([False] * matched.num_rows, pa.bool_())
            for c in data_names:
                if c in keys:
                    continue
                changed = pc.or_(
                    changed,
                    _null_safe_changed(m_new.column(c), m_old.column(c)),
                )
            upd_mask = pc.fill_null(changed, False)
            pieces.append(
                _emit(m_new.filter(upd_mask), "update_postimage", version)
            )
            if p.preimage:
                pieces.append(
                    _emit(m_old.filter(upd_mask), "update_preimage", version)
                )
        return pieces

    if p.kind == "snapshot":
        new_t = _load_side(p.new_files, p.new_delete_dirs, p.fields, full)
        piece = _emit(new_t, "insert", p.commit_version)
        if piece is not None:
            yield from piece.to_batches()
        return
    # chain: walk this manifest partition's per-commit steps in version
    # order, reusing the previous step's loaded NEW side as this step's
    # OLD side whenever the file lists match (they do by construction
    # for adjacent touches — the entry at version v IS the old side of
    # the next commit that touches the partition)
    prev_sig = None
    prev_t = None
    for version, nf, nd, of, od in p.steps:
        old_sig = (tuple(of), tuple(od))
        if prev_sig is not None and old_sig == prev_sig:
            old_t = prev_t
        else:
            old_t = _load_side(of, od, p.fields, full)
        new_t = _load_side(nf, nd, p.fields, full)
        for piece in _diff(new_t, old_t, version):
            if piece is not None:
                yield from piece.to_batches()
        prev_sig = (tuple(nf), tuple(nd))
        prev_t = new_t


class ManifestChangesDataSource(DataSource):
    """spark.readStream.format("manifest_changes").option("path", root)
    .option("keys", "k").load() — see the module docstring."""

    @classmethod
    def name(cls) -> str:
        return "manifest_changes"

    def schema(self):
        sj = self.options.get("feed_schema_json")
        if sj:
            return T.StructType.fromJson(json.loads(sj))
        path = self.options.get("path")
        if not path:
            raise ValueError("manifest_changes requires option 'path'")
        return _feed_schema(path)

    def streamReader(self, schema) -> ManifestChangesStreamReader:
        return ManifestChangesStreamReader(self.options)


def register_manifest_changes_source(spark: SparkSession) -> None:
    spark.dataSource.register(ManifestChangesDataSource)


def read_change_stream(
    spark: SparkSession,
    path: str,
    keys,
    starting_version: int | None = None,
    preimage: bool = False,
    max_versions_per_batch: int | None = None,
    heartbeat: bool = False,
) -> DataFrame:
    """The manifest change feed as a streaming DataFrame. Default start
    is a bootstrap snapshot (full table tagged insert, like
    `consume_table_changes`'s first cycle); `starting_version=N`
    replays history per-commit from commit N instead.
    `max_versions_per_batch` rate-limits catch-up (the
    maxFilesPerTrigger analogue): after a run's first batch, at most N
    commits plan per micro-batch, so a mid-run commit burst drains in
    bounded chunks. The FIRST batch of a (re)started query still takes
    its whole backlog — Spark never tells a reader its checkpointed
    offset before asking for the latest one, so an earlier cap could
    stall a restart (see latestOffset); bound initial replays with
    starting_version instead.

    `heartbeat=True` (round-12): every trigger runs a batch even when no
    commits landed — the empty batch advances nothing in the feed (zero
    partitions planned, zero manifests read, no rows) but lets a
    DOWNSTREAM stateful operator's watermark close windows that are
    already complete, removing the one-data-bearing-drain emission lag
    of the default (a watermark persisted by batch i only flushes state
    when batch i+1 runs). Leave it off for stateless consumers — an
    idle processingTime query would otherwise run one empty batch per
    trigger for nothing.

    The feed schema and the logical→physical field map are computed
    HERE, once, and threaded through the source options — the reader
    constructor runs three times per query start (driver, source-runner
    process, read planner) and skips its per-construction manifest
    reads when they're present (round-12 per-drain fixed-cost work)."""
    register_manifest_changes_source(spark)
    fields = _table_fields(path)
    schema_json = _feed_schema(path).json()
    reader = (
        spark.readStream.format("manifest_changes")
        .option("path", path)
        .option("keys", ",".join(keys))
        .option("fields_json", json.dumps([list(f) for f in fields]))
        .option("feed_schema_json", schema_json)
    )
    if starting_version is not None:
        reader = reader.option("starting_version", str(starting_version))
    if preimage:
        reader = reader.option("preimage", "true")
    if max_versions_per_batch is not None:
        reader = reader.option(
            "max_versions_per_batch", str(max_versions_per_batch)
        )
    if heartbeat:
        reader = reader.option("heartbeat", "true")
    return reader.load()


def start_change_stream_replica(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    keys,
    checkpoint: str,
    dst_partition_col: str | None = None,
    trigger_available_now: bool = True,
    max_versions_per_batch: int = 64,
    processing_time: str = "1 second",
):
    """A CDC consumer REWIRED through the streaming source: maintain a
    replica of `src_path` at `dst_path` with readStream + foreachBatch —
    the streaming twin of `replicate_table_increment`, with Structured
    Streaming's checkpoint replacing the app-metadata watermark. Each
    micro-batch applies its commits IN VERSION ORDER (a key inserted
    then deleted across two commits of one batch must net to absent);
    every apply verb is an idempotent MERGE/DELETE, so a batch replayed
    after a crash converges (exactly-once effect on the replica).

    Returns the StreamingQuery; `availableNow` drains the current
    backlog then stops (the scheduled-batch shape the reference's
    control plane runs, metadata.py:150-191). `max_versions_per_batch`
    (always set — it is also the bound on the per-version MERGE loop
    inside each micro-batch) rate-limits catch-up.

    `trigger_available_now=False` runs the replica CONTINUOUSLY on a
    `processing_time` trigger — the steady-state consumer shape
    (round-12): the ~1.2 s per-query Python source-runner spawn is paid
    ONCE at start, and each commit wave then lands at the marginal
    batch cost (bench.py's cdc steady_state arm measures that at
    1.08–1.3× the bare driver loop, with checkpointed exactly-once the
    loop doesn't have). Pick `processing_time` as the acceptable
    replica lag — each poll costs one runner round-trip plus a commit-
    directory listing, so sub-100ms triggers busy-poll for nothing."""
    from pyspark.sql import functions as F

    from f1_data_pipeline_spark.operators.sinks import (
        merge_into_manifest,
        merge_upsert_manifest,
        read_manifest,
    )

    if dst_partition_col is None:
        # default: mirror the source's layout (identity or transform spec)
        dst_partition_col = read_manifest(src_path).get("partition_col")
        if dst_partition_col is None:
            raise ValueError(
                "source manifest records no partition_col — pass "
                "dst_partition_col explicitly"
            )
    feed = read_change_stream(
        spark, src_path, keys,
        max_versions_per_batch=max_versions_per_batch,
    )
    key_list = list(keys)
    # delete rows carry the full pre-image: keeping the partition
    # SOURCE column beside the keys lets the MERGE-delete examine only
    # the touched partitions instead of full-outer-joining the whole
    # replica every version window
    try:
        from f1_data_pipeline_spark.operators.partitioning import (
            parse_partition_spec,
        )

        psrc = parse_partition_spec(dst_partition_col).source
    except Exception:
        psrc = None
    del_cols = key_list + (
        [psrc] if psrc and psrc not in key_list else []
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        # driver loop bound: one MERGE round per DISTINCT commit version
        # in the micro-batch, and the stream's max_versions_per_batch
        # rate limit (always set by this starter, default 64) caps that —
        # this collect() is ≤ that many one-column rows, never
        # proportional to table size or row count
        rows_by_v = (
            batch.select("_commit_version").distinct().orderBy(
                "_commit_version"
            )
        ).collect()
        for (v,) in rows_by_v:
            win = batch.filter(F.col("_commit_version") == v)
            upserts = win.filter(
                F.col("_change").isin("insert", "update_postimage")
            ).drop("_change", "_commit_version")
            if upserts.limit(1).count():
                merge_upsert_manifest(
                    spark,
                    upserts,
                    dst_path,
                    key_list,
                    partition_col=dst_partition_col,
                )
            dels = win.filter(F.col("_change") == "delete").select(*del_cols)
            if dels.limit(1).count():
                # one MERGE-delete commit per version window, any key
                # arity, keys never collected to the driver (a delete-
                # heavy batch used to issue one delete_manifest_rows
                # pass PER ROW on multi-column keys); the carried
                # partition source column scopes the merge to touched
                # partitions only
                merge_into_manifest(
                    spark, dels, dst_path, keys=key_list,
                    when_matched=[("delete", None)],
                    when_not_matched=None,
                )

    writer = feed.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
