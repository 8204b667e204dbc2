"""File-layout optimization: multi-dimensional (z-order) clustering.

At 100 TB the cheapest query is the one that never reads the file: parquet
footers carry per-column min/max, and engines skip files whose ranges
exclude the predicate. Sorting by a single column clusters that column
only; interleaving the bits of several columns' bucket ids (Morton /
z-order) makes every written file cover a compact hyper-rectangle in the
combined key space, so predicates on ANY clustered column prune files.

Scale posture: one aggregate pass for per-column min/max (scalar result,
folded into the plan as literals), then a single range-repartition shuffle
on the z-value — the same cost as any global sort-write. No windows over a
global ordering (an ntile/percent_rank rank-bucketing variant would funnel
through one partition), no driver-side data movement beyond the 2·k bounds.

The bit-interleave is pure integer arithmetic (shift/and/or), fully inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: str, lo: float, hi: float, bits: int) -> Column:
    """Linear bucket id 0..2^bits-1 for `col` over [lo, hi]."""
    n = (1 << bits) - 1
    span = hi - lo if hi > lo else 1.0
    raw = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(n))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n)).cast("long")


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton-interleaved z-value over `cols` (k·bits total bits, k ≤ 4).

    Bounds come from one tiny min/max aggregate; the returned expression is
    then pure per-row integer math.
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_value supports 1-4 columns")
    if len(cols) * bits > 62:
        raise ValueError("k*bits must fit in a signed 64-bit z-value")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).first()
    k = len(cols)
    buckets = [
        _bucket(c, bounds[f"lo_{c}"], bounds[f"hi_{c}"], bits) for c in cols
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write `df` as parquet clustered on the z-order of `cols`.

    Range-partition by z-value into `n_files` output files, sort within
    each, drop the helper column. Readers prune on any clustered column's
    footer min/max — see tests/test_layout.py for the measured skip rate.
    """
    zed = df.withColumn("__z", zorder_value(df, cols, bits))
    (
        zed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
