"""Deterministic shuffle → ordered training shards."""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import corpus as C


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_shuffle_is_deterministic_and_complete(spark):
    df = _docs(spark)
    a = C.shuffle_shards(df, n_shards=8, seed=1)
    b = C.shuffle_shards(df, n_shards=8, seed=1)
    pa = {(r.doc_id): (r.shard, r.pos) for r in a.collect()}
    pb = {(r.doc_id): (r.shard, r.pos) for r in b.collect()}
    assert pa == pb  # same seed → identical placement
    c = {(r.doc_id): (r.shard, r.pos) for r in
         C.shuffle_shards(df, n_shards=8, seed=2).collect()}
    assert c != pa  # a new seed is a new epoch order
    # every row exactly once; per-shard pos is contiguous 0..n-1
    assert len(pa) == 500
    by_shard: dict[int, list[int]] = {}
    for s, p in pa.values():
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) == set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # ≈uniform sizes (md5 prefix): no shard hogs the corpus
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 2 * min(sizes)
    # the order is a real shuffle, not id order
    shard0 = [d for d, (s, p) in sorted(pa.items(), key=lambda kv: kv[1])
              if s == 0]
    assert shard0 != sorted(shard0)


def test_write_training_shards_round_trip(spark, tmp_path):
    out = str(tmp_path / "export")
    df = _docs(spark, 300)
    man = C.write_training_shards(df, out, n_shards=4, seed=7)
    assert man["rows"] == 300 and man["n_shards"] == 4
    disk = json.load(open(os.path.join(out, "shards.json")))
    assert disk == man
    back = spark.read.parquet(f"{out}/data")
    assert back.count() == 300
    # reading one shard in file order reproduces (pos asc) exactly
    s0 = spark.read.parquet(f"{out}/data/shard=0")
    rows = [r.pos for r in s0.collect()]
    # physically sorted: parquet preserves row order within the files
    assert rows == sorted(rows)
    assert len(rows) == man["shard_rows"]["0"]
    # placement matches the pure shuffle function (export adds nothing)
    want = {
        r.doc_id: (r.shard, r.pos)
        for r in C.shuffle_shards(df, n_shards=4, seed=7).collect()
    }
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in back.withColumn("shard", F.col("shard").cast("long")).collect()
    }
    assert got == want


def test_export_republish_is_pointer_flip(spark, tmp_path):
    """Round-6 advice: out_dir must resolve to a COMPLETE export at
    every instant. The export publishes as an immutable versioned dir
    behind a symlink flipped atomically; re-publishing keeps exactly one
    previous generation for in-flight readers and reclaims older ones;
    a legacy real-directory export migrates on first re-publish."""
    import glob

    out = str(tmp_path / "export")
    C.write_training_shards(_docs(spark, 60), out, n_shards=2, seed=1)
    assert os.path.islink(out)
    first_target = os.path.realpath(out)

    man2 = C.write_training_shards(_docs(spark, 80), out, n_shards=2, seed=2)
    assert os.path.islink(out)
    assert os.path.realpath(out) != first_target
    # previous generation retained for in-flight readers
    assert os.path.isdir(first_target)
    assert json.load(open(os.path.join(out, "shards.json"))) == man2
    assert spark.read.parquet(f"{out}/data").count() == 80

    # third publish: the first generation (now two behind) is reclaimed
    C.write_training_shards(_docs(spark, 20), out, n_shards=2, seed=3)
    assert not os.path.exists(first_target)
    assert len(glob.glob(f"{out}.__v_*")) == 2  # current + previous

    # legacy migration: a pre-symlink plain-directory export
    legacy = str(tmp_path / "legacy")
    C.write_training_shards(_docs(spark, 30), legacy, n_shards=2, seed=4)
    target = os.path.realpath(legacy)
    os.unlink(legacy)
    os.rename(target, legacy)  # what a round-6 export looked like
    assert os.path.isdir(legacy) and not os.path.islink(legacy)
    man5 = C.write_training_shards(_docs(spark, 40), legacy, n_shards=2, seed=5)
    assert os.path.islink(legacy)
    assert spark.read.parquet(f"{legacy}/data").count() == 40
    assert json.load(open(os.path.join(legacy, "shards.json"))) == man5


def test_bad_args(spark):
    with pytest.raises(ValueError):
        C.shuffle_shards(_docs(spark, 5), n_shards=0)


def test_keep_previous_generations(spark, tmp_path):
    """Round-7 advice (low): the retained-generation count is a dial —
    keep_previous=2 keeps two superseded exports for readers spanning
    publish cycles; the default keeps one."""
    import glob
    import os

    out = str(tmp_path / "export")
    df = spark.range(20).select(F.col("id").alias("doc_id"))
    for _ in range(4):
        C.write_training_shards(df, out, n_shards=2, keep_previous=2)
    gens = [d for d in glob.glob(out + ".__v_*") if os.path.isdir(d)]
    assert len(gens) == 3  # current + 2 previous
    C.write_training_shards(df, out, n_shards=2)  # default: 1 previous
    gens = [d for d in glob.glob(out + ".__v_*") if os.path.isdir(d)]
    assert len(gens) == 2
    with pytest.raises(ValueError, match="keep_previous"):
        C.write_training_shards(df, out, n_shards=2, keep_previous=-1)
