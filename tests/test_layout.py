"""Z-order clustered writes: data fidelity + measured file-skipping
effectiveness via parquet footer stats (operators/layout.py)."""

from __future__ import annotations

import glob

import duckdb
import pyspark.sql.functions as F
import pytest

from f1_data_pipeline_spark.operators.layout import write_zordered, zorder_value
from f1_data_pipeline_spark.sources import load_table


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    """Per-file (min, max) of `col` from parquet footer statistics — what a
    scan's file-skipping actually sees."""
    con = duckdb.connect()
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        lo, hi = con.execute(
            f"""
            SELECT MIN(stats_min_value::DOUBLE), MAX(stats_max_value::DOUBLE)
            FROM parquet_metadata('{f}')
            WHERE path_in_schema = '{col}'
            """
        ).fetchone()
        out.append((lo, hi))
    return out


def _files_covering(ranges: list[tuple[float, float]], v: float) -> int:
    return sum(1 for lo, hi in ranges if lo <= v <= hi)


def test_zorder_write_preserves_data(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    path = str(tmp_path / "li_z")
    write_zordered(li, path, ["l_partkey", "l_suppkey"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    a = li.agg(F.sum("l_quantity"), F.sum("l_orderkey")).first()
    b = back.agg(F.sum("l_quantity"), F.sum("l_orderkey")).first()
    assert (a[0], a[1]) == (b[0], b[1])
    assert "__z" not in back.columns


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Both clustered columns must show real file-skipping: a point
    predicate on either column may touch only a minority of files, while
    the unclustered baseline layout covers ~all of them."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "naive")
    n_files = 8
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=n_files)
    li.repartition(n_files).write.mode("overwrite").parquet(rpath)

    stats = {}
    for col in ("l_partkey", "l_suppkey"):
        zr = _file_ranges(zpath, col)
        rr = _file_ranges(rpath, col)
        assert len(zr) == n_files
        # probe the midpoint of the key domain
        mid = (min(lo for lo, _ in zr) + max(hi for _, hi in zr)) / 2
        z_cover, r_cover = _files_covering(zr, mid), _files_covering(rr, mid)
        stats[col] = (z_cover, r_cover)
        # naive round-robin layout: every file spans the whole domain
        assert r_cover == len(rr)
        # z-order: a point predicate touches at most half the files
        assert z_cover <= n_files // 2, stats


def test_zorder_value_is_deterministic_integer(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    z1 = li.withColumn("z", zorder_value(li, ["l_partkey", "l_suppkey"]))
    z2 = li.repartition(7).withColumn(
        "z", zorder_value(li, ["l_partkey", "l_suppkey"])
    )
    # z must be a pure function of the clustered key, invariant to
    # partitioning (the synthetic lineitem has no stable row identity)
    key = lambda r: (r["l_partkey"], r["l_suppkey"])
    rows1 = {key(r): r["z"] for r in z1.collect()}
    rows2 = {key(r): r["z"] for r in z2.collect()}
    assert rows1.keys() == rows2.keys()
    for k in rows1:
        assert rows1[k] == rows2[k]


def test_zorder_rejects_bad_arity(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        zorder_value(li, [])
    with pytest.raises(ValueError):
        zorder_value(li, ["l_partkey", "l_suppkey"], bits=32)
