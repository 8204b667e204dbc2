"""Property-based tests (hypothesis) for the operators whose correctness
rests on a non-obvious argument.

The prefix-filter lemma in token_jaccard_pairs (dedup.py) is the main
target: a subtle off-by-one in prefix length or a float boundary in the
length filter silently loses pairs — exactly the bug class a random corpus
shakes out. Oracle: a brute-force all-pairs Jaccard in plain Python.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from f1_data_pipeline_spark.functions.scalars import laptime_to_ms
from f1_data_pipeline_spark.operators import dedup

import pyspark.sql.functions as F

WORDS = [f"w{i}" for i in range(12)]  # small vocab → dense overlap


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(2, 8))
    docs = []
    for i in range(n_docs):
        toks = draw(st.lists(st.sampled_from(WORDS), min_size=1, max_size=10))
        docs.append((i, " ".join(toks)))
    return docs


def brute_force_jaccard(docs, threshold):
    sets = {i: set(t.split()) for i, t in docs}
    out = set()
    for a in sets:
        for b in sets:
            if a < b:
                s = len(sets[a] & sets[b])
                u = len(sets[a] | sets[b])
                jac = round(s / u, 4)
                if jac >= threshold:
                    out.add((a, b, jac))
    return out


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora(), threshold=st.sampled_from([0.3, 0.5, 0.8, 0.9, 1.0]))
def test_prefix_filtered_jaccard_is_exact(spark, docs, threshold):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.token_jaccard_pairs(df, "doc_id", "text", threshold).collect()
    }
    assert got == brute_force_jaccard(docs, threshold)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    minutes=st.integers(0, 59),
    seconds=st.integers(0, 59),
    millis=st.integers(0, 999),
)
def test_laptime_roundtrip(spark, minutes, seconds, millis):
    s = f"{minutes}:{seconds:02d}.{millis:03d}"
    expected = (minutes * 60 + seconds) * 1000 + millis
    row = spark.createDataFrame([(s,)], "t string").select(
        laptime_to_ms("t").alias("ms")
    ).collect()[0]
    assert row["ms"] == expected


@pytest.mark.parametrize("bad", [None, "", "garbage", "1:2:3:4", ":."])
def test_laptime_malformed_null(spark, bad):
    row = spark.createDataFrame([(bad,)], "t string").select(
        laptime_to_ms("t").alias("ms")
    ).collect()[0]
    assert row["ms"] is None
