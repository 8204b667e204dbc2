"""Native exactly-once streaming sink for manifest tables — the write
half of the streaming story (`manifest_source.py` is the read half):

    df.writeStream.format("manifest_append")
      .option("path", table_root).option("sink_id", "events_landing")
      .option("checkpointLocation", ckpt).start()

No foreachBatch, no driver-side re-plan per micro-batch: executor tasks
write their Arrow batches straight to parquet (DataSourceStreamArrowWriter
— the data never converts to Python rows), and the driver-side
`commit(messages, batchId)` folds the staged files into the manifest
with ONE atomic metadata commit per micro-batch.

Landing-table layout: each micro-batch lands as its OWN manifest
partition, keyed `<sink_id>-<batchId>` — the Kafka-connector landing
shape. That makes the commit metadata-only (a new partition entry,
never a rewrite of existing data) and makes exactly-once structural:
a replayed batch (Spark re-runs an uncommitted epoch after a crash)
finds its partition key already committed and drops its staged files
instead of double-landing. `sink_id` namespaces the keys so two
different queries can feed one table without batchId collisions.

The batch-id partition column is a MANIFEST-ONLY key (like a hidden
transform's derived value): data files carry exactly the stream's data
columns, the stored schema never grows a synthetic column, and readers
prune by `partition_values` / consume per-batch via the change feed.
This is a LANDING table: append-only by construction; downstream
curation (`curate_table_increment`, `consume_table_changes`, the
`manifest_changes` stream source) or `repartition_manifest_table`
re-keys it into an analytical layout, and `MAINTAIN TABLE` compaction
folds small batch partitions' files. Keyed DML verbs that derive
partitions from data columns refuse this layout loudly (the partition
source isn't a data column), which is the correct posture for a
landing zone.

Crash contract (same as every manifest writer): staged/moved files
become visible only through the atomic commit; a crash at any earlier
point leaves orphans that `vacuum_manifest` reclaims. Schema is
validated against the table's stored schema on every start — appends
never evolve a landing table's schema silently.

Scale: per-batch cost = task parquet writes + one driver pyarrow
footer-stats pass over THIS batch's files + one JSON commit; nothing
scales with table size. The reference's scheduled-batch ingest
(/root/reference/metadata.py:150-191) is this sink driven by a cron
trigger.
"""

from __future__ import annotations

import json
import os
import random
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

__all__ = [
    "ManifestAppendDataSource",
    "register_manifest_append_sink",
    "start_manifest_append_stream",
]

_STAGING = "_staged_stream"


@dataclass
class _StagedFile(WriterCommitMessage):
    file: str | None
    rows: int


def _check_landing_layout(path: str, m: dict | None) -> None:
    """The sink's table preconditions, re-checked on every commit retry
    (a concurrent repartition/DDL between re-reads must fail the query,
    not be silently absorbed into a corrupted layout)."""
    if m is None:
        return  # bootstraps on first commit
    if m.get("partition_col") != "_stream_batch":
        raise ValueError(
            f"{path} is partitioned by {m.get('partition_col')!r}, not a "
            "streaming landing table — appending batch-keyed partitions "
            "would corrupt its layout; land to a fresh path and curate "
            "downstream"
        )
    if m.get("constraints"):
        raise ValueError(
            f"{path} declares CHECK constraints "
            f"{sorted(m['constraints'])} — the landing sink writes raw "
            "Arrow batches with no Spark plan to validate them against, "
            "so it cannot honor the constraint contract every batch "
            "writer enforces; drop the constraints on the landing table "
            "and validate in the curation step downstream"
        )


class ManifestAppendStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options: dict, schema: T.StructType):
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "manifest_append requires .option('path', <table root>)"
            )
        sink_id = options.get("sink_id")
        if sink_id is None:
            # Replay detection is keyed (sink_id, batchId) — batchIds are
            # per-CHECKPOINT, so the namespace must be too: a fresh query
            # reusing an old sink_id would see its early batch keys
            # already committed and silently drop them as replays.
            # Deriving the default from the checkpoint location makes
            # fresh checkpoint → fresh namespace automatic; an explicit
            # sink_id opts into manual namespacing (keep it paired with
            # its checkpoint for life).
            ck = options.get("checkpointlocation")
            if ck:
                import hashlib

                sink_id = "ck" + hashlib.md5(
                    os.path.abspath(ck).encode()
                ).hexdigest()[:10]
            else:
                # a constant fallback would be the data-loss foot-gun
                # this derivation exists to remove (two queries sharing
                # it would treat each other's batch ids as replays)
                raise ValueError(
                    "manifest_append cannot derive a batch namespace: "
                    "checkpointLocation was set via session conf, not a "
                    "writeStream option — pass .option('sink_id', <id>) "
                    "(keep it paired with its checkpoint for life) or "
                    "set checkpointLocation as a writer option"
                )
        if "-" in sink_id or "/" in sink_id:
            raise ValueError(
                f"sink_id {sink_id!r} must not contain '-' or '/' "
                "(it prefixes the batch partition key)"
            )
        self._sink_id = sink_id
        self._schema = schema
        # logical -> pinned physical file-column names: data files must
        # carry PHYSICAL names (RENAME COLUMN never rewrites files and
        # readers request physical names — a post-rename append written
        # under logical names would read back all-NULL). Physical names
        # never change once pinned, so the map computed at start stays
        # valid for the stream's life. Identity until any rename exists.
        self._phys = {f.name: f.name for f in schema}
        self._validate_table()

    def _validate_table(self) -> None:
        from f1_data_pipeline_spark.operators.sinks import (
            _phys_name,
            read_manifest,
        )

        m = read_manifest(self._path)
        _check_landing_layout(self._path, m)
        if m is None or m.get("schema") is None:
            return  # table bootstraps on first commit
        stored = T.StructType.fromJson(m["schema"])
        ours = [(f.name, f.dataType.simpleString()) for f in self._schema]
        theirs = [(f.name, f.dataType.simpleString()) for f in stored]
        if ours != theirs:
            raise ValueError(
                f"stream schema {ours} does not match the landing table's "
                f"stored schema {theirs} — a landing sink never evolves "
                "schema silently; widen the table first (ALTER COLUMN "
                "TYPE) or land to a new table"
            )
        self._phys = {f.name: _phys_name(f) for f in stored.fields}

    # -- executors ---------------------------------------------------------
    def write(self, iterator) -> _StagedFile:
        import pyarrow as pa
        import pyarrow.parquet as pq

        writer = None
        rows = 0
        dest = os.path.join(
            self._path, _STAGING, f"{uuid.uuid4().hex}.parquet"
        )
        try:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                # files carry pinned PHYSICAL column names (see __init__)
                batch = batch.rename_columns(
                    [self._phys.get(n, n) for n in batch.schema.names]
                )
                if writer is None:
                    os.makedirs(os.path.dirname(dest), exist_ok=True)
                    writer = pq.ParquetWriter(dest, batch.schema)
                writer.write_table(pa.Table.from_batches([batch]))
                rows += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        return _StagedFile(file=dest if rows else None, rows=rows)

    # -- driver ------------------------------------------------------------
    def commit(self, messages, batchId: int) -> None:
        from f1_data_pipeline_spark.operators.sinks import (
            ConcurrentWriteError,
            _collect_file_stats,
            _commit_manifest,
            _enc_part,
            read_manifest,
        )

        staged = [m.file for m in messages if m is not None and m.file]
        key = _enc_part(f"{self._sink_id}-{batchId}")
        if not staged:
            return  # empty batch: nothing to land, nothing to replay
        entry = None
        last_err = None
        # Bounded like every other committer, but with jittered backoff
        # between CAS attempts (round-10 advice): six IMMEDIATE re-reads
        # are easy to exhaust when several streams append to one table —
        # each rebase is only a manifest read, so contenders re-collide
        # within the same few milliseconds. Exponential backoff with
        # full jitter desynchronizes the contenders; 20 attempts span
        # ~15.5 s of expected cumulative sleep (~31 s worst case — the
        # 2 s cap is reached at attempt 6, then 14 uniform(0, 2) draws),
        # keeping liveness under sustained disjoint-writer load while
        # still surfacing a loud error (never silently starving the
        # stream's driver commit) if the table is genuinely thrashing.
        for _attempt in range(20):
            if _attempt:
                time.sleep(random.uniform(0, min(0.05 * 2 ** _attempt, 2.0)))
            m = read_manifest(self._path)
            _check_landing_layout(self._path, m)
            if m is not None and key in m["partitions"]:
                # A LEGITIMATE Spark replay is only the latest
                # uncommitted epoch: this batchId's key committed while
                # HIGHER batchIds exist under the same sink_id means the
                # checkpoint was reset IN PLACE (contents wiped, path
                # reused) so batchIds restarted inside the old namespace —
                # dropping these batches as "replays" would be silent
                # data loss. Refuse loudly instead.
                prefix = f"{self._sink_id}-"
                higher = []
                for e in m["partitions"].values():
                    val = e.get("value", "")
                    if isinstance(val, str) and val.startswith(prefix):
                        try:
                            b = int(val[len(prefix):])
                        except ValueError:
                            continue
                        if b > batchId:
                            higher.append(b)
                if higher:
                    raise ValueError(
                        f"batchId {batchId} arrived as a replay but batches "
                        f"up to {max(higher)} are already committed under "
                        f"sink_id {self._sink_id!r} — the checkpoint was "
                        "reset in place, so batch ids restarted inside the "
                        "old namespace and these batches would be silently "
                        "dropped as replays. Restart the stream with a NEW "
                        "checkpoint path (the default sink_id derives from "
                        "it) or a new explicit sink_id."
                    )
                # replayed epoch: the batch already landed atomically —
                # structural exactly-once, staged bytes are duplicates
                for f in staged:
                    if os.path.exists(f):
                        os.unlink(f)
                return
            if entry is None:
                # files move into the snap dir ONCE; commit retries reuse
                # it (a new dir per attempt would orphan empties)
                snap = os.path.join(
                    "data", key, f"snap-{uuid.uuid4().hex[:12]}"
                )
                full = os.path.join(self._path, snap)
                os.makedirs(full)
                for f in staged:
                    os.rename(f, os.path.join(full, os.path.basename(f)))
                staged = [
                    os.path.join(full, n) for n in sorted(os.listdir(full))
                ]
                entry = {
                    "prefix": snap,
                    "value": f"{self._sink_id}-{batchId}",
                    "files": _collect_file_stats(full),
                }
            base_partitions = dict(m["partitions"]) if m else {}
            cand = {
                "version": (m["version"] + 1) if m else 1,
                "op": "stream_append",
                "partition_col": m.get("partition_col", "_stream_batch")
                if m
                else "_stream_batch",
                "partitions": {**base_partitions, key: entry},
                "schema": m.get("schema")
                if m and m.get("schema") is not None
                else json.loads(self._schema.json()),
                **{
                    k: v
                    for k, v in (m or {}).items()
                    if k
                    not in ("version", "op", "partition_col", "partitions",
                            "schema")
                },
            }
            try:
                _commit_manifest(self._path, cand)
                return
            except ConcurrentWriteError as e:
                last_err = e
                continue  # a disjoint writer landed; rebase = re-read
        raise last_err

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.file and os.path.exists(m.file):
                os.unlink(m.file)


class ManifestAppendDataSource(DataSource):
    """writeStream.format("manifest_append") — see the module docstring."""

    @classmethod
    def name(cls) -> str:
        return "manifest_append"

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "manifest_append is append-only (complete/update output "
                "modes would rewrite history a landing table must keep)"
            )
        return ManifestAppendStreamWriter(self.options, schema)


def register_manifest_append_sink(spark: SparkSession) -> None:
    spark.dataSource.register(ManifestAppendDataSource)


def start_manifest_append_stream(
    df,
    path: str,
    checkpoint: str,
    sink_id: str | None = None,
    trigger_available_now: bool = True,
):
    """Convenience starter: land a streaming DataFrame into a manifest
    table, one atomic commit per micro-batch, exactly once. The batch
    namespace defaults to a checkpoint-derived id (see the writer's
    sink_id note) — pass `sink_id` only to namespace manually."""
    register_manifest_append_sink(df.sparkSession)
    writer = (
        df.writeStream.format("manifest_append")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if sink_id is not None:
        writer = writer.option("sink_id", sink_id)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
