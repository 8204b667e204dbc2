"""Pin the driver-side xxhash64 mirror (functions/xxhash64.py) to
Spark's executor-side `F.xxhash64` for every stored type the bloom
probe fast path supports — the parity contract that makes the no-job
point lookup safe. If a Spark upgrade ever changed the hash, these
fail before any bloom could mis-prune."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from f1_data_pipeline_spark.functions import xxhash64 as X
from f1_data_pipeline_spark.operators import sinks

CASES = [
    ("bigint", T.LongType(),
     [0, 1, -1, 42, 2**62, -(2**62), 123456789, -(2**63), 2**63 - 1]),
    ("int", T.IntegerType(), [0, 1, -1, 42, 2**31 - 1, -(2**31)]),
    ("smallint", T.ShortType(), [0, 7, -7, 32767, -32768]),
    ("tinyint", T.ByteType(), [0, 5, -5, 127, -128]),
    ("boolean", T.BooleanType(), [True, False]),
    ("date", T.DateType(),
     [dt.date(2024, 3, 5), dt.date(1969, 12, 31), dt.date(1970, 1, 1)]),
    ("string", T.StringType(),
     ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "abcdefghi",
      "x" * 31, "y" * 32, "z" * 33, "w" * 100,
      "héllo wörld ünïcode", "日本語テキスト" * 5, "a'b\"c\\d\x00e"]),
]


@pytest.mark.parametrize("dtype,stype,vals", CASES,
                         ids=[c[0] for c in CASES])
def test_xxhash64_parity_with_spark(spark, dtype, stype, vals):
    df = spark.createDataFrame(
        [(v,) for v in vals], T.StructType([T.StructField("c", stype)])
    )
    # bare and chained-with-int-literal forms (the bloom position shape)
    for extra in ((), (0,), (3,), (6,)):
        cols = [F.col("c")] + [F.lit(i) for i in extra]
        want = [r[0] for r in df.select(F.xxhash64(*cols)).collect()]
        got = [X.spark_xxhash64(dtype, v, extra) for v in vals]
        assert got == want, (dtype, extra)


def test_bloom_positions_match_spark_expression(spark):
    m, k = 1 << 15, 7
    vals = [0, 99, -5, 2**40]
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    want = [
        list(r[0])
        for r in df.select(sinks._bloom_position_array("c", m, k)).collect()
    ]
    got = [X.bloom_positions("bigint", v, m, k) for v in vals]
    assert got == want


def test_unsupported_type_returns_none():
    assert X.bloom_positions("double", 1.5, 1 << 15, 7) is None
    assert X.spark_xxhash64("decimal(10,2)", 1, ()) is None
    # wrong value shape for a supported type: refuse, don't mis-hash
    assert X.spark_xxhash64("string", 5, ()) is None
    assert X.spark_xxhash64("date", dt.datetime(2024, 1, 1), ()) is None


def test_probe_positions_fast_path_no_spark_job(spark, tmp_path):
    """_probe_positions answers supported types from the driver-side
    mirror (memoized), and the full bloom lookup agrees with a real
    scan — end-to-end proof the fast path never mis-prunes."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("day"),
        (F.col("id") * 3).alias("v"),
    )
    sinks.merge_upsert_manifest(
        spark, df, path, keys=["k"], partition_col="day",
        bloom_cols=["k"],
    )
    hits = sinks.read_manifest_point_lookup(spark, path, "k", [1234]).collect()
    assert [(r.k, r.v) for r in hits] == [(1234, 3702)]
    r = sinks.manifest_bloom_lookup(spark, path, "k", [1234])
    assert len(r["maybe"]) >= 1 and not r["no_bloom"]
    # absent key: every partition pruned with high probability (fp ~1%)
    r2 = sinks.manifest_bloom_lookup(spark, path, "k", [10_000_000])
    assert len(r2["pruned"]) >= 3
