"""Worker-side manifest reads with pyarrow — shared by the operators
that process manifest data INSIDE a task instead of through a Spark
scan (the streaming change-feed source reconstructs per-partition row
sets; the bucket-aligned join reads co-bucketed pairs). Everything here
runs on executors: no SparkSession, plain filesystem + pyarrow.

Semantics mirror the Spark read path (operators/sinks.py): position
deletes applied (merge-on-read), physical column names mapped to
logical ones (RENAME COLUMN never rewrites files), missing columns
read as NULL, types cast to the target arrow schema (widenings)."""

from __future__ import annotations

import os

__all__ = ["entry_paths", "load_deleted_positions", "load_side"]


def entry_paths(path: str, entry: dict) -> tuple[list, list]:
    """(data file paths, delete prefix dirs) of one manifest entry,
    absolute. Entries predating per-file metadata list their prefix
    directory's files at plan time (driver-side listdir, bounded by the
    entry's own file count). Shared by every worker-side reader so the
    entry→paths resolution can never diverge between them."""
    pref = os.path.join(path, entry["prefix"])
    files = entry.get("files")
    if files is not None:
        data = [os.path.join(pref, fm["name"]) for fm in files]
    else:
        data = [
            os.path.join(pref, n)
            for n in sorted(os.listdir(pref))
            if n.endswith(".parquet")
        ]
    dels = [os.path.join(path, d["prefix"]) for d in entry.get("deletes") or ()]
    return data, dels


def load_deleted_positions(delete_dirs: list) -> dict:
    """{file id: set(row positions)} from position-delete parquet dirs.
    Ids are '<partition>/<snap>/<basename>' (current) or
    '<snap>/<basename>' (legacy, pre-fused-write) — both match here,
    which is safe because a delete set is scoped to exactly one
    partition's data prefix (sinks._read_deletes documents the scoping
    rule this relies on)."""
    import pyarrow.parquet as pq

    out: dict = {}
    for d in delete_dirs:
        t = pq.read_table(d, columns=["_file", "_pos"])
        for fid, pos in zip(
            t.column("_file").to_pylist(), t.column("_pos").to_pylist()
        ):
            out.setdefault(fid, set()).add(pos)
    return out


def load_side(files: list, delete_dirs: list, fields, target):
    """One partition side's live rows as a pa.Table conformed to the
    target arrow schema's DATA columns. `fields` is ((logical name,
    physical file column), ...); `target` the arrow schema carrying a
    field per logical name."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    deleted = load_deleted_positions(delete_dirs) if delete_dirs else {}
    tabs = []
    for f in files:
        t = pq.read_table(f)
        if deleted:
            segs = f.replace(os.sep, "/").split("/")
            dead = deleted.get("/".join(segs[-3:]), set()) | deleted.get(
                "/".join(segs[-2:]), set()
            )
            if dead:
                mask = pa.array(
                    [i not in dead for i in range(t.num_rows)], pa.bool_()
                )
                t = t.filter(mask)
        cols = []
        for name, phys in fields:
            tgt_type = target.field(name).type
            if phys in t.column_names:
                col = t.column(phys)
                if col.type != tgt_type:
                    col = pc.cast(col, tgt_type)
            else:
                col = pa.nulls(t.num_rows, tgt_type)
            cols.append(col)
        tabs.append(pa.table(dict(zip([n for n, _ in fields], cols))))
    if not tabs:
        return pa.table(
            {n: pa.array([], target.field(n).type) for n, _ in fields}
        )
    return pa.concat_tables(tabs, promote_options="default")
