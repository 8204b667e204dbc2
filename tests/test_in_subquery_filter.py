"""IN-subquery runtime filters (round-13 verdict #4): `WHERE col IN
(SELECT key FROM dim [WHERE <literals>])` executes the dim side at plan
time — the X42 harvest budget and key vocabulary — and prunes the outer
table's manifest read; the subquery stays in the SQL so Spark computes
the exact row semantics. Correlated / aggregating / NOT IN / OR-glued
shapes pass through un-pruned."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import catalog as CAT
from f1_data_pipeline_spark.operators import sinks


@pytest.fixture(scope="module")
def subq_cat(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("insubq")
    cat, t, d = str(tmp / "cat"), str(tmp / "t"), str(tmp / "d")
    fact = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 20).alias("fk"),
        (F.col("id") * 2.0).alias("v"),
    )
    sinks.merge_upsert_manifest(spark, fact, t, keys=["k"],
                                partition_col="fk")
    dim = spark.range(20).select(
        F.col("id").alias("dk"),
        (F.col("id") % 4).alias("seg"),
        F.concat(F.lit("seg_"), (F.col("id") % 4).cast("string"))
        .alias("lbl"),
    )
    sinks.merge_upsert_manifest(spark, dim, d, keys=["dk"],
                                partition_col="seg")
    CAT.catalog_create_table(cat, "fact", t)
    CAT.catalog_create_table(cat, "dim", d)
    sinks.read_manifest_table(spark, t).createOrReplaceTempView("gt_fact")
    sinks.read_manifest_table(spark, d).createOrReplaceTempView("gt_dim")
    return cat


def _gt(q: str) -> str:
    return q.replace("FROM fact", "FROM gt_fact").replace(
        "FROM dim", "FROM gt_dim"
    )


def test_in_subquery_prunes_and_matches(spark, subq_cat):
    cases = [
        # (query, expected files_scanned of 20)
        ("SELECT k FROM fact WHERE fk IN "
         "(SELECT dk FROM dim WHERE seg = 1)", 5),
        ("SELECT k FROM fact WHERE fk IN "
         "(SELECT DISTINCT dk FROM dim WHERE seg = 1 AND dk < 10)", 3),
        ("SELECT f.k FROM fact f WHERE f.fk IN "
         "(SELECT dk FROM dim WHERE seg = 2)", 5),
        # composes with ordinary conjuncts
        ("SELECT k FROM fact WHERE v >= 0 AND fk IN "
         "(SELECT dk FROM dim WHERE seg = 0)", 5),
        # an OR inside the SUBQUERY's own WHERE is fine (allow_or)
        ("SELECT k FROM fact WHERE fk IN "
         "(SELECT dk FROM dim WHERE seg = 0 OR seg = 3)", 10),
    ]
    for q, want_files in cases:
        ex = CAT.catalog_sql(spark, subq_cat, "EXPLAIN " + q).collect()
        r = next(x for x in ex if x.table == "fact")
        assert r.runtime_filter and "subquery(dim)" in r.runtime_filter, q
        assert r.files_scanned == want_files, (q, r.files_scanned)
        got = sorted(x[0] for x in CAT.catalog_sql(spark, subq_cat, q)
                     .collect())
        want = sorted(x[0] for x in spark.sql(_gt(q)).collect())
        assert got == want, q


def test_in_subquery_refusals_pass_through(spark, subq_cat):
    refuse = [
        # NOT IN: NULL semantics differ — never prune
        ("SELECT k FROM fact WHERE fk NOT IN "
         "(SELECT dk FROM dim WHERE seg = 1)"),
        # depth-0 OR: the IN conjunct is not implied by every row
        ("SELECT k FROM fact WHERE fk IN "
         "(SELECT dk FROM dim WHERE seg = 1) OR v < 10"),
        # aggregating subquery: outside the grammar
        "SELECT k FROM fact WHERE fk IN (SELECT MAX(dk) FROM dim)",
        # correlated: `v` belongs to the OUTER table, not dim
        ("SELECT k FROM fact WHERE fk IN "
         "(SELECT dk FROM dim WHERE v > 100)"),
    ]
    for q in refuse:
        ex = CAT.catalog_sql(spark, subq_cat, "EXPLAIN " + q).collect()
        r = next(x for x in ex if x.table == "fact")
        assert r.runtime_filter is None, q
        assert r.files_scanned == r.files_total, q
        got = sorted(x[0] for x in CAT.catalog_sql(spark, subq_cat, q)
                     .collect())
        want = sorted(x[0] for x in spark.sql(_gt(q)).collect())
        assert got == want, q


def test_in_subquery_string_literal_where(spark, subq_cat):
    """Regression (round-13, caught by the join_inner_equi oracle gate):
    the matcher runs over STRING-STRIPPED text so literals never fake
    structure — but the harvest must read the REAL literal back from the
    original text, or a string-valued dim WHERE harvests zero keys."""
    q = ("SELECT k FROM fact WHERE fk IN "
         "(SELECT dk FROM dim WHERE lbl = 'seg_2')")
    ex = CAT.catalog_sql(spark, subq_cat, "EXPLAIN " + q).collect()
    r = next(x for x in ex if x.table == "fact")
    assert r.runtime_filter and "5 keys" in r.runtime_filter
    assert r.files_scanned == 5
    got = sorted(x[0] for x in CAT.catalog_sql(spark, subq_cat, q).collect())
    assert got == sorted(x[0] for x in spark.sql(_gt(q)).collect())


def test_in_subquery_empty_harvest_keeps_files(spark, subq_cat):
    """An empty subquery result adds no pruning predicate (isin() needs
    members); Spark itself returns zero rows either way."""
    q = "SELECT k FROM fact WHERE fk IN (SELECT dk FROM dim WHERE seg = 9)"
    ex = CAT.catalog_sql(spark, subq_cat, "EXPLAIN " + q).collect()
    r = next(x for x in ex if x.table == "fact")
    assert r.runtime_filter is None
    assert CAT.catalog_sql(spark, subq_cat, q).count() == 0


def test_exists_semi_join_harvest(spark, subq_cat):
    """EXISTS with one cross-scope equality + dim literals — the
    idiomatic semi-join spelling — harvests exactly like the IN-shape;
    NOT EXISTS (anti-join) and doubly-correlated shapes pass through."""
    cases = [
        ("SELECT k FROM fact f WHERE EXISTS "
         "(SELECT 1 FROM dim d WHERE d.dk = f.fk AND d.seg = 1)", 5),
        # reversed equality + string literal (the stripped-literal
        # regression applies here too)
        ("SELECT k FROM fact f WHERE EXISTS "
         "(SELECT 1 FROM dim d WHERE f.fk = d.dk AND d.lbl = 'seg_2')", 5),
        # unqualified columns resolve innermost-first (dk, seg → dim)
        ("SELECT k FROM fact WHERE v >= 0 AND EXISTS "
         "(SELECT 1 FROM dim WHERE dk = fk AND seg = 0)", 5),
    ]
    for q, want_files in cases:
        ex = CAT.catalog_sql(spark, subq_cat, "EXPLAIN " + q).collect()
        r = next(x for x in ex if x.table == "fact")
        assert r.runtime_filter and "exists(dim)" in r.runtime_filter, q
        assert r.files_scanned == want_files, (q, r.files_scanned)
        got = sorted(x[0] for x in CAT.catalog_sql(spark, subq_cat, q)
                     .collect())
        assert got == sorted(x[0] for x in spark.sql(_gt(q)).collect()), q
    for q in (
        "SELECT k FROM fact f WHERE NOT EXISTS "
        "(SELECT 1 FROM dim d WHERE d.dk = f.fk AND d.seg = 1)",
        # a second correlation equality: beyond the harvest's scope
        "SELECT k FROM fact f WHERE EXISTS "
        "(SELECT 1 FROM dim d WHERE d.dk = f.fk AND d.seg = f.k)",
    ):
        ex = CAT.catalog_sql(spark, subq_cat, "EXPLAIN " + q).collect()
        r = next(x for x in ex if x.table == "fact")
        assert r.runtime_filter is None, q
        got = sorted(x[0] for x in CAT.catalog_sql(spark, subq_cat, q)
                     .collect())
        assert got == sorted(x[0] for x in spark.sql(_gt(q)).collect()), q
