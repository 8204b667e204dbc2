"""Streaming heavy hitters (streaming/frequency_stream.py): bounded
cross-batch MG state, sound bounds, replay idempotency, exact-verify
parity with the batch operator."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from f1_data_pipeline_spark.operators import frequency as FQ
from f1_data_pipeline_spark.streaming import frequency_stream as FS

ITEM_SCHEMA = T.StructType([T.StructField("item", T.StringType())])


def _mk_batches(seed=11, n_batches=5, rows=2000):
    """Zipf-ish batches with a drifting tail and a stable heavy head."""
    rng = random.Random(seed)
    batches = []
    for b in range(n_batches):
        rows_b = []
        for _ in range(rows):
            r = rng.random()
            if r < 0.30:
                rows_b.append(f"head_{rng.randint(0, 4)}")  # 5 heavy items
            else:
                rows_b.append(f"tail_b{b}_{rng.randint(0, 3000)}")
        batches.append(rows_b)
    return batches


def test_stream_summary_superset_bounds_and_exact_verify(spark, tmp_path):
    path = str(tmp_path / "mg_state")
    batches = _mk_batches()
    all_rows = []
    for bid, rows in enumerate(batches):
        df = spark.createDataFrame([(r,) for r in rows], ITEM_SCHEMA).repartition(4)
        assert FS.apply_frequency_batch(path, df, bid, "item", 0.02) is True
        all_rows += rows

    # true counts over the whole stream
    true = {}
    for r in all_rows:
        true[r] = true.get(r, 0) + 1
    n = len(all_rows)
    import math

    heavy_truth = {it for it, c in true.items() if c >= math.ceil(0.02 * n)}

    out = {r["item"]: r for r in FS.streaming_frequent_items(spark, path).collect()}
    # superset: every true heavy hitter is in the summary and marked possible
    for it in heavy_truth:
        assert it in out and out[it]["possible"], it
    # bounds sound for every reported item
    for it, r in out.items():
        assert r["lb"] <= true.get(it, 0) <= r["ub"], (it, r, true.get(it))
    # guaranteed implies truly heavy
    for it, r in out.items():
        if r["guaranteed"]:
            assert it in heavy_truth

    # exact verify over retained corpus == batch operator output
    corpus = spark.createDataFrame([(r,) for r in all_rows], ITEM_SCHEMA)
    exact = {
        (r["item"], r["n"])
        for r in FS.streaming_frequent_items(spark, path, corpus, "item").collect()
    }
    batch_ref = {
        (r["item"], r["n"])
        for r in FQ.frequent_items(corpus, "item", 0.02).collect()
    }
    assert exact == batch_ref
    assert {it for it, _ in exact} == heavy_truth

    # state is bounded: ≤ k items regardless of vocabulary
    st = FS.read_summary_state(path)
    assert len(st["items"]) <= 50  # k = ceil(1/0.02)
    assert st["n_total"] == n


def test_stream_summary_replay_is_noop(spark, tmp_path):
    path = str(tmp_path / "mg_replay")
    df = spark.createDataFrame([("a",)] * 30 + [("b",)] * 5, ITEM_SCHEMA)
    assert FS.apply_frequency_batch(path, df, 0, "item", 0.1) is True
    st1 = FS.read_summary_state(path)
    # crash-replay of the same batch id: no state change, no new version
    assert FS.apply_frequency_batch(path, df, 0, "item", 0.1) is False
    assert FS.read_summary_state(path) == st1
    # next batch applies normally
    df2 = spark.createDataFrame([("a",)] * 10, ITEM_SCHEMA)
    assert FS.apply_frequency_batch(path, df2, 1, "item", 0.1) is True
    st2 = FS.read_summary_state(path)
    assert st2["n_total"] == 45 and st2["version"] == st1["version"] + 1


def test_stream_summary_min_share_pinned(spark, tmp_path):
    path = str(tmp_path / "mg_pin")
    df = spark.createDataFrame([("a",)], ITEM_SCHEMA)
    FS.apply_frequency_batch(path, df, 0, "item", 0.1)
    with pytest.raises(ValueError, match="min_share"):
        FS.apply_frequency_batch(path, df, 1, "item", 0.05)


def test_frequency_sink_end_to_end(spark, tmp_path):
    """Real readStream → foreachBatch sink over forced micro-batches; the
    final summary's exact verify equals the batch answer on the same
    files."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows = [("HEAVY",)] * 300 + [(f"t_{i}",) for i in range(900)]
    df = spark.createDataFrame(rows, ITEM_SCHEMA)
    df.repartition(4).write.parquet(src)  # 4 files → 2 triggers at mfpt=2

    stream = (
        spark.readStream.schema(ITEM_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = FS.start_frequency_sink(stream, "item", state, ckpt, min_share=0.1)
    assert q.awaitTermination(120)
    q.stop()
    st = FS.read_summary_state(state)
    assert st["n_total"] == 1200 and st["last_batch_id"] >= 1
    out = {r["item"]: r for r in FS.streaming_frequent_items(spark, state).collect()}
    assert out["HEAVY"]["guaranteed"]
    exact = {
        (r["item"], r["n"])
        for r in FS.streaming_frequent_items(
            spark, state, spark.read.parquet(src), "item"
        ).collect()
    }
    assert exact == {("HEAVY", 300)}


def test_state_commit_collision_raises_concurrent_write_error(spark, tmp_path):
    """Two sinks pointed at one summary path: the numbered-commit
    primitive (shared with the manifest tables) surfaces the collision as
    ConcurrentWriteError, never silent corruption."""
    from f1_data_pipeline_spark.operators.sinks import ConcurrentWriteError

    path = str(tmp_path / "mg_collide")
    df = spark.createDataFrame([("a",), ("b",)], ITEM_SCHEMA)
    assert FS.apply_frequency_batch(path, df, 0, "item", 0.1) is True
    st = FS.read_summary_state(path)
    with pytest.raises(ConcurrentWriteError, match="another writer"):
        FS._commit_state(path, st)  # same version number again
