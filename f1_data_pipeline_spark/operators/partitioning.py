"""Hidden partitioning: partition TRANSFORMS for manifest tables.

Iceberg's core layout idea, re-expressed for this engine's manifest
format: a table is partitioned by a FUNCTION of a source column —
`days(ts)`, `months(ts)`, `years(ts)`, `bucket(N, col)`,
`truncate(W, col)` — not by a physical column the writer must
precompute. The derived value exists only in manifest entries (and
transiently during the write fan-out); data files never store it, so
the partitioning can't drift from the data and queries never mention
it. Readers prune partitions by mapping ordinary predicates on the
SOURCE column through the transform:

- time transforms and truncate are monotone, so range predicates map to
  derived-key ranges (`ts >= '2024-03-05 10:00'` → day >= '2024-03-05');
- `bucket(N, col)` maps equality predicates to exactly one of N
  partitions — the hash-bucketed point-lookup layout for high-
  cardinality keys, complementing the bloom sidecars (bucket pruning is
  free and exact at the partition level; blooms then skip within what
  remains).

Scale rationale: identity-partitioning a timestamp creates one
partition per distinct value (millions of tiny prefixes — the classic
Hive mistake); identity-partitioning a doc_id is even worse. Transforms
bound partition cardinality by design: days() gives one partition per
day regardless of event volume, bucket(N) exactly N. That is the
100 TB layout discipline, enforced by the table format instead of by
writer convention.

The spec is stored in the manifest's `partition_col` slot (a plain
column name remains the identity transform — fully backward
compatible). `bucket` uses Spark's xxhash64 (seed 42); its driver-side
mirror for pruning is computed with a one-row Spark job per distinct
probe value, so pruning stays exactly consistent with writing at the
cost of a millisecond control-plane job.

No reference counterpart (the reference's only layout is Postgres heap
tables + indexes, formula_one.sql:168-254); this is beyond-reference
table-format surface.
"""
from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# the transient derived column used during write fan-outs; never stored
DERIVED_COL = "__pt"

_SPEC_RE = re.compile(
    r"^\s*(days|months|years|bucket|truncate)\s*\(\s*(?:(\d+)\s*,\s*)?"
    r"([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
)
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


@dataclass(frozen=True)
class PartitionTransform:
    kind: str  # identity | days | months | years | bucket | truncate
    source: str  # the source column
    param: int | None  # N for bucket, W for truncate, else None

    @property
    def spec(self) -> str:
        """Canonical spec string (what the manifest stores)."""
        if self.kind == "identity":
            return self.source
        if self.param is not None:
            return f"{self.kind}({self.param}, {self.source})"
        return f"{self.kind}({self.source})"


def parse_partition_spec(spec: str) -> PartitionTransform:
    """Parse a partition spec: a bare column name (identity) or
    `days(col)` / `months(col)` / `years(col)` / `bucket(N, col)` /
    `truncate(W, col)`."""
    if _IDENT_RE.match(spec or ""):
        return PartitionTransform("identity", spec, None)
    m = _SPEC_RE.match(spec or "")
    if not m:
        raise ValueError(
            f"bad partition spec {spec!r} — a column name or "
            "days(col) | months(col) | years(col) | bucket(N, col) | "
            "truncate(W, col)"
        )
    kind, param, col = m.group(1), m.group(2), m.group(3)
    if kind in ("bucket", "truncate"):
        if param is None:
            raise ValueError(f"{kind} needs a numeric parameter: {kind}(N, col)")
        n = int(param)
        if n <= 0:
            raise ValueError(f"{kind} parameter must be positive, got {n}")
        return PartitionTransform(kind, col, n)
    if param is not None:
        raise ValueError(f"{kind} takes no numeric parameter")
    return PartitionTransform(kind, col, None)


def partition_column_name(t: PartitionTransform) -> str:
    """The column the write fan-out partitions by: the source column for
    identity, the transient derived column otherwise."""
    return t.source if t.kind == "identity" else DERIVED_COL


def _is_numeric(df: DataFrame, col: str) -> bool:
    dt = dict(df.dtypes).get(col, "")
    return dt in ("tinyint", "smallint", "int", "bigint", "float", "double") \
        or dt.startswith("decimal")


def derived_column(t: PartitionTransform, df: DataFrame) -> Column:
    """The Spark expression computing the derived partition value.
    Time transforms emit ISO strings (lexicographic order ==
    chronological order, human-readable prefixes); bucket emits a long
    in [0, N); truncate emits a width-W string prefix or the value
    floored to a multiple of W for numeric columns.

    Time transforms over TIMESTAMP columns are defined in **UTC**,
    independent of spark.sql.session.timeZone (Iceberg's rule). A naive
    `date_format(ts, ...)` renders in the session zone, so a reader
    session configured differently from the writer would recompute
    different keys and range pruning could silently drop matching rows
    (round-5 advice). The instant is mapped to its UTC calendar day by
    pure epoch arithmetic (`cast(ts as double)` is seconds-since-epoch,
    timezone-free), never through session-zone rendering. DATE columns
    have no zone and keep the direct formatting path (date→string
    round-trips identically in every session zone)."""
    c = F.col(t.source)
    if t.kind == "identity":
        return c
    if t.kind in ("days", "months", "years"):
        dtype = dict(df.dtypes).get(t.source, "")
        if dtype == "timestamp":  # instant type: pin to UTC arithmetic
            c = F.date_from_unix_date(
                F.floor(c.cast("double") / F.lit(86400.0)).cast("int")
            )
        fmt = {"days": "yyyy-MM-dd", "months": "yyyy-MM", "years": "yyyy"}
        return F.date_format(c, fmt[t.kind])
    if t.kind == "bucket":
        # NULL stays NULL (the NULL partition), like every other transform
        return F.when(c.isNull(), F.lit(None).cast("long")).otherwise(
            F.pmod(F.xxhash64(c), F.lit(t.param))
        )
    if t.kind == "truncate":
        if _is_numeric(df, t.source):
            return (c - F.pmod(c, F.lit(t.param))).cast("long")
        return F.substring(c.cast("string"), 1, t.param)
    raise AssertionError(t.kind)


def apply_transform(t: PartitionTransform, df: DataFrame) -> DataFrame:
    """Add the transient derived column (no-op for identity). A frame
    already carrying the reserved name is refused — `withColumn` would
    silently overwrite it and the write fan-out later DROPS it, so user
    data under that name would be lost."""
    if t.kind == "identity":
        return df
    if DERIVED_COL in df.columns:
        raise ValueError(
            f"column name {DERIVED_COL!r} is reserved for the engine's "
            "derived partition value — rename the input column"
        )
    return df.withColumn(DERIVED_COL, derived_column(t, df))


# ---------------------------------------------------------------------------
# driver-side mirrors: map a predicate value into derived-key space so
# partition keys can be pruned without touching data. Every mirror must
# agree exactly with `derived_column`; bucket delegates to Spark itself
# (one-row job) so there is nothing to keep in sync.
# ---------------------------------------------------------------------------


def _time_text(v) -> str | None:
    """Normalize a date/datetime/ISO-string predicate value to ISO text
    ('YYYY-MM-DD[ HH:MM:SS...]'). Timezone-AWARE datetimes are converted
    to UTC first (partition keys for timestamp columns are UTC calendar
    periods); naive values are sliced as-is — `key_maybe_matches` pads
    one period of slack for timestamp sources to absorb any session-zone
    skew in how Spark interprets the same literal. None when
    unrecognizable (→ no pruning)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc)
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, str) and re.match(r"^\d{4}-\d{2}(-\d{2})?", v):
        return v
    return None


def _shift_period(kind: str, s: str, delta: int) -> str:
    """The ISO key `delta` periods away from key `s` (kind = days |
    months | years). Driver-side date math for the pruning slack."""
    import datetime as _dt

    if kind == "years":
        return f"{int(s) + delta:04d}"
    if kind == "months":
        y, mo = int(s[:4]), int(s[5:7])
        m0 = y * 12 + (mo - 1) + delta
        return f"{m0 // 12:04d}-{m0 % 12 + 1:02d}"
    return (_dt.date.fromisoformat(s) + _dt.timedelta(days=delta)).isoformat()


def derive_value(
    spark: SparkSession, t: PartitionTransform, v, source_type: str | None = None
):
    """The derived partition value for a raw source value — the
    driver-side mirror of `derived_column`. Returns (ok, derived):
    ok=False means the value couldn't be mapped (prune nothing).

    `source_type` (DDL string, e.g. "bigint") matters for bucket:
    Spark's xxhash64 hashes int32 and int64 differently, so the probe
    literal must be cast to the COLUMN's type before hashing or the
    mirror would disagree with the writer."""
    if v is None:
        return True, None
    if t.kind in ("days", "months", "years"):
        s = _time_text(v)
        if s is None:
            return False, None
        width = {"days": 10, "months": 7, "years": 4}[t.kind]
        if len(s) < width:
            return False, None
        return True, s[:width]
    if t.kind == "truncate":
        if isinstance(v, bool):
            return False, None
        if isinstance(v, (int, float)):
            return True, int(v - (v % t.param))
        if isinstance(v, str):
            return True, v[: t.param]
        return False, None
    if t.kind == "bucket":
        # exactness over cleverness: ask Spark (one-row control-plane job)
        lit = F.lit(v).cast(source_type) if source_type else F.lit(v)
        row = (
            spark.range(1)
            .select(F.pmod(F.xxhash64(lit), F.lit(t.param)).alias("b"))
            .first()
        )
        return True, row["b"]
    return False, None


def _decode_key(t: PartitionTransform, enc: str):
    """Manifest key → derived value in the mirror's comparison space.
    (ok, value); the NULL partition decodes to (True, None)."""
    if enc == "null":
        return True, None
    if enc.startswith("="):
        enc = enc[1:]
    if t.kind == "bucket" or (t.kind == "truncate" and not _truncate_is_str(enc)):
        try:
            return True, int(enc)
        except ValueError:
            return True, enc  # string-truncate key
    return True, enc


def _truncate_is_str(enc: str) -> bool:
    try:
        int(enc)
        return False
    except ValueError:
        return True


def key_maybe_matches(
    spark: SparkSession,
    t: PartitionTransform,
    enc_key: str,
    predicates: Sequence[tuple],
    _cache: dict | None = None,
    source_type: str | None = None,
) -> bool:
    """Can a partition with this manifest key hold rows satisfying the
    predicate conjunction? Conservative: prunes only when the transform
    PROVES emptiness. Predicates on other columns never prune here (the
    per-file stats handle those); the NULL partition is pruned by any
    predicate on the source column (NULL never satisfies a comparison —
    same rule as the file-stats pruner)."""
    ok, key_val = _decode_key(t, enc_key)
    if not ok:
        return True
    cache = _cache if _cache is not None else {}
    for col, op, raw in predicates:
        if op == "or":
            # disjunction (round-13): the partition survives when ANY
            # branch's conjunction could hold rows in it — e.g. with
            # days(ts) partitioning, `ts < A OR ts > B` keeps exactly
            # the day-keys outside [A, B]
            if not any(
                key_maybe_matches(spark, t, enc_key, br, cache, source_type)
                for br in raw
            ):
                return False
            continue
        if col != t.source:
            continue
        if op == "isnull":
            # the NULL partition holds exactly the NULL-source rows: any
            # non-NULL derived key proves no row can satisfy IS NULL
            if key_val is not None:
                return False
            continue
        if key_val is None:
            return False  # NULL source rows satisfy no comparison/NOT NULL
        if op == "notnull":
            continue  # non-NULL key: every row's source is non-NULL
        if op == "!=":
            continue  # a derived partition still holds other values
        if op == "in":
            # the partition survives if ANY member's derived value could
            # land in it (each member checked with equality semantics,
            # including the time-transform session-zone slack)
            if not any(
                key_maybe_matches(
                    spark, t, enc_key, [(col, "=", x)], cache, source_type
                )
                for x in raw
            ):
                return False
            continue
        ck = (op, repr(raw))
        if ck in cache:
            d_ok, d = cache[ck]
        else:
            d_ok, d = derive_value(spark, t, raw, source_type)
            cache[ck] = (d_ok, d)
        if not d_ok or d is None:
            continue
        if type(key_val) is not type(d) and not (
            isinstance(key_val, (int, float)) and isinstance(d, (int, float))
        ):
            continue
        # Time transforms over a TIMESTAMP source: Spark interprets a
        # naive literal in the READER's session zone while keys are UTC
        # periods, so the true cutoff period can sit one period either
        # side of the naively-derived one (zone offsets span -12h..+14h,
        # under one day/month/year). Pad the comparison by one period —
        # at most two extra partitions survive per predicate, and wrong
        # pruning becomes impossible under any session zone. DATE sources
        # are zone-free and keep exact bounds; unknown source types get
        # the safe padded path.
        slack = t.kind in ("days", "months", "years") and (
            source_type is None or source_type.startswith("timestamp")
        )
        if op in ("=", "=="):
            if slack:
                lo, hi = _shift_period(t.kind, d, -1), _shift_period(t.kind, d, 1)
                if not (lo <= key_val <= hi):
                    return False
            elif key_val != d:
                return False
        elif t.kind == "bucket":
            continue  # hash transform: only equality prunes
        # monotone transforms: T(x) op' T(v) is implied by x op v for the
        # CLOSED form of op (boundary partitions stay in)
        elif op in (">", ">="):
            if key_val < (_shift_period(t.kind, d, -1) if slack else d):
                return False
        elif op in ("<", "<="):
            if key_val > (_shift_period(t.kind, d, 1) if slack else d):
                return False
    return True


def _derive_buckets_batch(
    spark: SparkSession,
    t: PartitionTransform,
    vals: list,
    source_type: str | None,
    chunk: int = 1000,
) -> dict:
    """Bucket-derive MANY probe values in one control-plane job per
    `chunk` instead of one job per value: the exact F.lit(v).cast(type)
    → pmod(xxhash64, N) expression `derive_value` uses, fused into a
    single projection. A 10k-member IN probe (the X42 runtime-join-filter
    shape) costs ~10 driver jobs, not 10k. Returns {repr(v): (True, b)}
    in `key_maybe_matches`'s cache-value shape."""
    out: dict = {}
    for i in range(0, len(vals), chunk):
        part = vals[i : i + chunk]
        cols = []
        for j, v in enumerate(part):
            lit = F.lit(v).cast(source_type) if source_type else F.lit(v)
            cols.append(F.pmod(F.xxhash64(lit), F.lit(t.param)).alias(f"b{j}"))
        row = spark.range(1).select(*cols).first()
        for j, v in enumerate(part):
            out[repr(v)] = (True, row[f"b{j}"])
    return out


def prune_partition_keys(
    spark: SparkSession,
    t: PartitionTransform,
    entries: dict,
    predicates: Sequence[tuple] | None,
    source_type: str | None = None,
) -> dict:
    """Filter a manifest's {encoded key: entry} dict down to partitions
    that could satisfy the predicates. Identity transforms are returned
    unchanged (file stats prune those); derived-value computation is
    cached across keys so bucket probes cost one job per distinct
    predicate value, not per partition — and for bucket transforms ALL
    equality/IN probe values are derived up front in one fused job per
    1000 values (`_derive_buckets_batch`), so a wide runtime-filter IN
    list never degenerates into per-member driver jobs."""
    if not predicates or t.kind == "identity":
        return entries
    cache: dict = {}
    if t.kind == "bucket":
        vals, seen = [], set()

        def _collect(preds):
            for col, op, raw in preds:
                if op == "or":  # harvest every branch for the fused job
                    for br in raw:
                        _collect(br)
                    continue
                if col != t.source:
                    continue
                members = (
                    list(raw) if op == "in"
                    else [raw] if op in ("=", "==") else []
                )
                for v in members:
                    if v is None or repr(v) in seen:
                        continue
                    seen.add(repr(v))
                    vals.append(v)

        _collect(predicates)
        if len(vals) > 1:
            for r, dv in _derive_buckets_batch(
                spark, t, vals, source_type
            ).items():
                cache[("=", r)] = dv
                cache[("==", r)] = dv
    return {
        k: e
        for k, e in entries.items()
        if key_maybe_matches(spark, t, k, predicates, cache, source_type)
    }
