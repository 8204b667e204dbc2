"""Heavy hitters: exact frequent-item discovery with bounded memory.

The 100 TB problem: "which tokens/domains/users exceed share s of the
corpus" via a naive `GROUP BY item` shuffles the FULL distinct-item
cardinality (billions of tokens for a web corpus) to find the handful
that matter. This module does it in two scans with a shuffle bounded by
candidates, not vocabulary:

1. DISCOVERY — one scan; each partition maintains a Misra-Gries summary
   of k = ceil(1/min_share) counters inside an Arrow kernel. Each Arrow
   batch is first reduced by a vectorized `value_counts` (itself a valid
   summary) and merged into the running summary with the standard
   subtract-the-(k+1)th-largest step — the merge operation of Agarwal,
   Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries" (PODS 2012),
   which preserves the MG error bound: a summary undercounts any item by
   at most N_p/(k+1). Guarantee: if item x has global count >= s*N, then
   some partition p has c_p(x) >= s*N_p (averaging), and since
   k+1 > 1/s implies N_p/(k+1) < s*N_p <= c_p(x), x SURVIVES in that
   partition's summary — the union of summaries is a superset of every
   true heavy hitter. Memory: k counters per partition, ever.

2. VERIFY — one scan; every non-candidate item collapses into a single
   residual bucket BEFORE the shuffle (broadcast candidate join + keyed
   partial aggregation), so the exchange carries at most
   partitions x (candidates+1) rows. The verified counts are EXACT, so
   the final output is deterministic and SQL-equivalent to
   `GROUP BY item HAVING COUNT(*) >= CEIL(s*N)` — false candidates from
   phase 1 are filtered here, never reported.

Item columns must be string or integral (tokens, domains, ids); fractional
types are rejected because their text forms differ across engines and the
discovery kernel counts string-cast values. NULL items are excluded (they
are no "item"; profile_long counts them).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# exact Spark dtype strings (df.dtypes normalizes varchar→string etc.);
# an exact-match set, NOT prefixes — "interval ..." must not slip in via
# a startswith("int") check
_ALLOWED_ITEM_TYPES = {"string", "tinyint", "smallint", "int", "bigint",
                       "boolean", "date"}


def _mg_merge(counter: dict, items, counts, k: int) -> None:
    """Merge a (items, counts) batch summary into `counter`, keeping at
    most k entries via the mergeable-summaries decrement."""
    for item, c in zip(items, counts):
        counter[item] = counter.get(item, 0) + int(c)
    if len(counter) > k:
        vals = sorted(counter.values(), reverse=True)
        dec = vals[k]  # the (k+1)-th largest count
        for it in list(counter):
            nc = counter[it] - dec
            if nc > 0:
                counter[it] = nc
            else:
                del counter[it]


def _check_item_type(df: DataFrame, col: str) -> None:
    dt = dict(df.dtypes)[col]
    if dt not in _ALLOWED_ITEM_TYPES:
        raise ValueError(
            f"frequent_items over {col!r} of type {dt}: item columns must "
            "be string/integral (fractional text forms are not portable)"
        )


def mg_candidates(df: DataFrame, col: str, min_share: float) -> DataFrame:
    """Phase 1 alone: the per-partition Misra-Gries candidate union —
    (item string, lb bigint) where lb is the summary's residual count (a
    LOWER bound on the partition-local count, by the MG undercount bound).
    Superset of all items with global share >= min_share; exposed
    separately for tests and for callers that only need a candidate
    screen (e.g. a blocklist seed) without the exact verify scan."""
    import pandas as pd

    if not (0 < min_share < 1):
        raise ValueError(f"min_share must be in (0,1), got {min_share}")
    _check_item_type(df, col)
    k = math.ceil(1.0 / min_share)

    def summaries(batches):
        counter: dict = {}
        for pdf in batches:
            vc = pdf["item"].dropna().value_counts()
            if len(vc):
                _mg_merge(counter, vc.index.tolist(), vc.to_numpy(), k)
        if counter:
            yield pd.DataFrame(
                {"item": list(counter.keys()),
                 "lb": [int(v) for v in counter.values()]}
            )

    return (
        df.select(F.col(col).cast("string").alias("item"))
        .mapInPandas(summaries, "item string, lb bigint")
    )


def frequent_items(
    df: DataFrame, col: str, min_share: float = 0.001
) -> DataFrame:
    """Exact heavy hitters: (item string, n bigint, share double) for every
    non-NULL item whose count is >= CEIL(min_share * N), N = count of
    non-NULL items. Deterministic — identical to the naive
    GROUP BY/HAVING — but the shuffle is bounded by the candidate set,
    not the item cardinality (module docstring has the two-phase
    argument). `share` is ROUND(n/N, 6)."""
    cand = mg_candidates(df, col, min_share).select("item").distinct()
    return _verify_against(df, col, cand, min_share)


def verify_candidates(
    df: DataFrame, col: str, candidates: Sequence, min_share: float
) -> DataFrame:
    """Phase 2 alone: the exact candidate-only verify scan, with the
    candidate set supplied by the caller instead of a discovery scan —
    ONE pass over `df`. Output is exact and identical to
    `frequent_items(df, col, min_share)` whenever `candidates` is a
    superset of the true heavy hitters (e.g. a Misra-Gries summary of the
    same data — the streaming sink's stored state); false candidates are
    counted exactly and filtered, never reported."""
    if not (0 < min_share < 1):
        raise ValueError(f"min_share must be in (0,1), got {min_share}")
    _check_item_type(df, col)
    cand = df.sparkSession.createDataFrame(
        [(str(c),) for c in candidates], "item string"
    ).distinct()
    return _verify_against(df, col, cand, min_share)


def _verify_against(
    df: DataFrame, col: str, cand: DataFrame, min_share: float
) -> DataFrame:
    items = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    # broadcast candidate tag, then aggregate: candidates keep their key,
    # everything else pre-collapses into the NULL residual bucket map-side
    tagged = items.join(
        F.broadcast(cand.withColumn("__cand", F.lit(True))), "item", "left"
    )
    grouped = tagged.groupBy(
        F.when(F.col("__cand"), F.col("item")).alias("item")
    ).agg(F.count(F.lit(1)).alias("n"))
    # grouped is at most candidates+1 rows — the unpartitioned window is a
    # bounded-by-contract reduction, not a fact-table sort. (NB: the total
    # must NOT be named "N": Spark's default case-insensitive resolution
    # would collide it with "n".)
    w = Window.partitionBy()
    total = F.col("__total")
    return (
        grouped.withColumn("__total", F.sum("n").over(w))
        .filter(
            F.col("item").isNotNull()
            & (F.col("n") >= F.ceil(F.lit(float(min_share)) * total))
        )
        .select(
            "item",
            "n",
            F.round(F.col("n") / total, 6).alias("share"),
        )
    )
