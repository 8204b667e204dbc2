"""Skew mitigation operators (100 TB posture; SURVEY.md §4.3).

AQE's skew-join splitting (on by default, session.py) already handles the
sort-merge-join case at runtime. These operators cover what AQE cannot:

- `salted_join`: hot-key hash joins where one side's key distribution is
  pathological and the build side is small enough to replicate per salt —
  deterministic salts (no `rand()`: task retries must reproduce).
- `salted_two_phase_agg`: aggregations whose per-key state is large
  (collect_set / count_distinct) — map-side partial aggregation doesn't
  shrink those, so one hot key means one hot reducer. Salting splits the
  key's state across `salt_n` reducers, then a cheap second agg merges.
  For algebraic aggs (sum/count/min/max) Spark's partial aggregation
  already makes this unnecessary — don't pay two shuffles for those.

Bucketed co-located joins (the other shuffle eliminator) live in
operators/sinks.py: `write_bucketed` / shuffle-free join proof in
tests/test_skew_bucketing.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _det_salt(cols: Sequence[str], n: int) -> Column:
    """Deterministic per-row salt in [0, n): hash of the full row's stable
    columns — reproducible under task retry, unlike rand()."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big`'s key distribution is heavily skewed.

    big rows get a deterministic salt in [0, salt_n); `small` is exploded
    salt_n× so every (key, salt) bucket finds its match. The hot key's rows
    now spread across salt_n shuffle partitions instead of one straggler.
    Cost: small side replicated salt_n× — use only when small ≪ big.
    """
    non_key = [c for c in big.columns if c != key] or [key]
    b = big.withColumn(SALT, _det_salt(non_key, salt_n))
    s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return b.join(s, [key, SALT], how).drop(SALT)


def salted_two_phase_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    salt_n: int = 16,
) -> DataFrame:
    """`count_distinct(distinct_col)` per group, skew-safe.

    Salting by hash(distinct_col) puts all copies of a value in the same
    salt bucket, so per-bucket distinct counts are over *disjoint* value
    sets and phase 2 is a plain sum — exact, and the hot group's distinct
    state is built on salt_n reducers instead of one. For the sketch
    version use `approx_count_distinct`, which needs no salting at all.
    """
    salted = df.withColumn(SALT, _det_salt([distinct_col], salt_n))
    partial = salted.groupBy(*group_cols, SALT).agg(
        F.count_distinct(F.col(distinct_col)).alias("__part")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__part").alias(f"distinct_{distinct_col}")
    )
