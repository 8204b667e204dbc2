"""Heavy hitters (operators/frequency.py): exactness, the MG candidate
superset guarantee under adversarial partitioning, and bounded summaries."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import frequency as FQ


def _brute(rows, min_share):
    n = len(rows)
    counts = {}
    for r in rows:
        counts[r] = counts.get(r, 0) + 1
    thr = math.ceil(min_share * n)
    return {
        (it, c, round(c / n, 6)) for it, c in counts.items() if c >= thr
    }


def test_frequent_items_exact_on_zipf(spark):
    """Zipf-ish skew, thousands of distinct items, several partitions:
    output == the naive GROUP BY/HAVING, counts exact."""
    rng = random.Random(42)
    rows = []
    for i in range(2000):  # long tail: mostly singletons
        rows.append(f"tail_{i}")
    for rank in range(1, 20):  # head: item_r appears 3000/r times
        rows += [f"head_{rank}"] * (3000 // rank)
    rng.shuffle(rows)
    df = spark.createDataFrame([(r,) for r in rows], "item string").repartition(8)
    got = {
        (r["item"], r["n"], r["share"])
        for r in FQ.frequent_items(df, "item", min_share=0.01).collect()
    }
    assert got == _brute(rows, 0.01)
    assert got  # non-trivial: the head items qualify


def test_frequent_items_finds_item_spread_thin_across_partitions(spark):
    """The adversarial case for per-partition discovery: one globally-heavy
    item round-robined so every partition sees only a sliver of it, buried
    under partition-local noise. The averaging argument says some
    partition still retains it; the verify pass then counts it exactly."""
    n_parts = 16
    rows = []
    # heavy item: 6% globally, spread evenly
    for i in range(600):
        rows.append(("HEAVY", i % n_parts))
    # noise: distinct-per-partition filler
    for p in range(n_parts):
        for i in range(580):
            rows.append((f"noise_{p}_{i}", p))
    df = (
        spark.createDataFrame(rows, "item string, p int")
        .repartition(n_parts, "p")
        .select("item")
    )
    out = {r["item"]: r["n"] for r in FQ.frequent_items(df, "item", 0.05).collect()}
    assert out == {"HEAVY": 600}


def test_mg_candidates_bounded_and_superset(spark):
    """Phase-1 summaries stay within k counters per partition, and the
    candidate union contains every true heavy hitter."""
    rows = [f"h_{i % 5}" for i in range(5000)] + [
        f"t_{i}" for i in range(4000)
    ]
    df = spark.createDataFrame([(r,) for r in rows], "item string").repartition(4)
    min_share = 0.02
    k = math.ceil(1 / min_share)
    cand = FQ.mg_candidates(df, "item", min_share).collect()
    assert len(cand) <= 4 * k  # ≤ partitions·k rows total
    items = {r["item"] for r in cand}
    truth = {it for it, _, _ in _brute(rows, min_share)}
    assert truth <= items
    assert all(r["lb"] >= 1 for r in cand)


def test_frequent_items_threshold_boundary_and_nulls(spark):
    """Counts exactly at CEIL(s·N) qualify; below do not; NULLs are
    excluded from items and from N."""
    rows = [("a",)] * 10 + [("b",)] * 9 + [("c",)] * 81 + [(None,)] * 50
    df = spark.createDataFrame(rows, "item string")
    # N = 100 non-null; s=0.1 → threshold 10: a (10) in, b (9) out
    got = {(r["item"], r["n"]) for r in FQ.frequent_items(df, "item", 0.1).collect()}
    assert got == {("a", 10), ("c", 81)}


def test_frequent_items_integral_cast_and_type_guard(spark):
    df_int = spark.createDataFrame([(7,)] * 9 + [(8,)] * 1, "item bigint")
    got = {(r["item"], r["n"]) for r in FQ.frequent_items(df_int, "item", 0.5).collect()}
    assert got == {("7", 9)}
    df_f = spark.createDataFrame([(1.5,)], "item double")
    with pytest.raises(ValueError, match="string/integral"):
        FQ.frequent_items(df_f, "item", 0.5)
    with pytest.raises(ValueError, match="min_share"):
        FQ.frequent_items(df_int, "item", 0.0)


def test_frequent_items_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "item string")
    assert FQ.frequent_items(empty, "item", 0.1).count() == 0
    nulls = spark.createDataFrame([(None,)] * 5, "item string")
    assert FQ.frequent_items(nulls, "item", 0.1).count() == 0


def test_frequent_items_property_random(spark):
    """Randomized exactness sweep: several seeds × alphabets × shares,
    every output equals the brute-force answer (both sets, not just
    membership — counts and shares included)."""
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        alpha = [f"w{i}" for i in range(rng.randint(3, 40))]
        rows = [rng.choice(alpha) for _ in range(rng.randint(50, 2000))]
        share = rng.choice([0.01, 0.05, 0.2])
        df = spark.createDataFrame([(r,) for r in rows], "item string").repartition(
            rng.randint(1, 6)
        )
        got = {
            (r["item"], r["n"], r["share"])
            for r in FQ.frequent_items(df, "item", share).collect()
        }
        assert got == _brute(rows, share), (seed, share)


def test_verify_candidates_exact_and_superset_contract(spark):
    """Phase 2 with a caller-supplied candidate set: exact and identical
    to frequent_items when candidates are a superset of the true heavy
    hitters; false candidates are counted exactly and filtered; a missing
    true heavy hitter is (by contract) simply absent — the exactness
    guarantee is conditional on the superset."""
    rows = [("a",)] * 50 + [("b",)] * 30 + [(f"t{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    ref = {
        (r["item"], r["n"], r["share"])
        for r in FQ.frequent_items(df, "item", 0.2).collect()
    }
    # superset (true heavies + junk) → identical output
    out = {
        (r["item"], r["n"], r["share"])
        for r in FQ.verify_candidates(
            df, "item", ["a", "b", "t0", "nonexistent"], 0.2
        ).collect()
    }
    assert out == ref and {i for i, _, _ in out} == {"a", "b"}
    # missing heavy hitter → absent (no false output, no crash)
    out2 = {
        r["item"]
        for r in FQ.verify_candidates(df, "item", ["b"], 0.2).collect()
    }
    assert out2 == {"b"}
    # type guard applies here too
    dfd = spark.createDataFrame([(1.5,)], "item double")
    with pytest.raises(ValueError, match="fractional"):
        FQ.verify_candidates(dfd, "item", ["1.5"], 0.2)
