"""SQL DML routing through catalog_sql: INSERT / DELETE / UPDATE /
MERGE text against cataloged manifest tables (round-6 verdict #3) and
the insert_into_manifest verb itself."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import catalog as CAT
from f1_data_pipeline_spark.operators import sinks


def _mk(spark, path, n=20):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("day"),
        (F.col("id") * 2).alias("v"),
    )
    sinks.merge_upsert_manifest(spark, df, path, keys=["k"],
                                partition_col="day")
    return df


def _cat(spark, tmp_path, n=20):
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    _mk(spark, t, n)
    CAT.catalog_create_table(cat, "tbl", t)
    return cat, t


# --------------------------- insert_into_manifest ---------------------------


def test_insert_into_manifest_appends_and_keeps_duplicates(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, 6)
    v0 = sinks.read_manifest(t)["version"]
    batch = spark.createDataFrame([(2, 0, 99), (100, 0, 1)],
                                  "k long, day long, v long")
    n = sinks.insert_into_manifest(spark, batch, t)
    assert n == 2
    out = sinks.read_manifest_table(spark, t)
    assert out.count() == 8  # k=2 now appears twice: INSERT never merges
    assert out.filter("k = 2").count() == 2
    # only the touched partition (day=0) was rewritten
    m0 = sinks.read_manifest(t, v0)["partitions"]
    m1 = sinks.read_manifest(t)["partitions"]
    assert m1["1"]["prefix"] == m0["1"]["prefix"]
    assert m1["0"]["prefix"] != m0["0"]["prefix"]


def test_insert_into_manifest_aligns_schema_and_rejects_extras(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, 4)
    # omitted column v → NULL; int day casts to the stored long
    batch = spark.createDataFrame([(50, 1)], "k long, day int")
    sinks.insert_into_manifest(spark, batch, t)
    row = sinks.read_manifest_table(spark, t).filter("k = 50").first()
    assert row.v is None and row.day == 1
    with pytest.raises(ValueError, match="columns the table lacks"):
        sinks.insert_into_manifest(
            spark,
            spark.createDataFrame([(1, 0, 0, 9)],
                                  "k long, day long, v long, zz long"),
            t,
        )


def test_insert_into_manifest_enforces_constraints(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, 4)
    sinks.manifest_add_constraint(spark, t, "v_nonneg", "v >= 0")
    before = sinks.read_manifest(t)["version"]
    with pytest.raises(sinks.ConstraintViolationError):
        sinks.insert_into_manifest(
            spark,
            spark.createDataFrame([(60, 0, -5)], "k long, day long, v long"),
            t,
        )
    assert sinks.read_manifest(t)["version"] == before  # nothing landed


# ------------------------------- SQL routing --------------------------------


def test_sql_insert_select_and_values(spark, tmp_path):
    cat, t = _cat(spark, tmp_path, 6)
    r = CAT.catalog_sql(
        spark, cat,
        "INSERT INTO tbl SELECT k + 100, day, v FROM tbl WHERE k < 2",
    )
    assert r.first().inserted == 2
    assert sinks.read_manifest_table(spark, t).count() == 8
    r2 = CAT.catalog_sql(
        spark, cat, "INSERT INTO tbl VALUES (500, 1, 7), (501, 0, 8)"
    )
    assert r2.first().inserted == 2
    got = sinks.read_manifest_table(spark, t).filter("k >= 500")
    assert sorted((r.k, r.day, r.v) for r in got.collect()) == [
        (500, 1, 7), (501, 0, 8)
    ]
    # explicit column list: omitted column inserts NULL
    CAT.catalog_sql(spark, cat, "INSERT INTO tbl (k, day) VALUES (900, 0)")
    row = sinks.read_manifest_table(spark, t).filter("k = 900").first()
    assert row.v is None


def test_sql_delete_and_update_roundtrip_with_cdc(spark, tmp_path):
    cat, t = _cat(spark, tmp_path, 10)
    v0 = sinks.read_manifest(t)["version"]
    r = CAT.catalog_sql(spark, cat, "DELETE FROM tbl WHERE k < 3")
    assert r.first().deleted == 3
    assert sinks.read_manifest_table(spark, t).count() == 7
    r2 = CAT.catalog_sql(
        spark, cat, "UPDATE tbl SET v = v + 1000 WHERE k BETWEEN 5 AND 6"
    )
    assert r2.first().updated == 2
    got = sinks.read_manifest_table(spark, t).filter("k in (5, 6)")
    assert sorted(r.v for r in got.collect()) == [1010, 1012]
    # CDC sees the SQL-driven changes like any Python-verb change
    feed = sinks.manifest_row_changes(spark, t, ["k"], from_version=v0)
    kinds = {(r.k, r._change) for r in feed.collect()}
    assert (0, "delete") in kinds and (5, "update_postimage") in kinds
    # refusals: DELETE without WHERE, UPDATE without WHERE
    with pytest.raises(ValueError, match="unsupported DELETE"):
        CAT.catalog_sql(spark, cat, "DELETE FROM tbl")
    with pytest.raises(ValueError, match="no WHERE"):
        CAT.catalog_sql(spark, cat, "UPDATE tbl SET v = 0")


def test_sql_update_respects_constraints(spark, tmp_path):
    cat, t = _cat(spark, tmp_path, 4)
    sinks.manifest_add_constraint(spark, t, "v_small", "v < 10000")
    with pytest.raises(sinks.ConstraintViolationError):
        CAT.catalog_sql(
            spark, cat, "UPDATE tbl SET v = 99999 WHERE k = 1"
        )


def test_sql_merge_into(spark, tmp_path):
    cat, t = _cat(spark, tmp_path, 6)  # k 0..5, v = 2k
    src = spark.createDataFrame(
        [(4, 0, 400), (5, 1, 500), (60, 0, 600), (61, 1, -1)],
        "k long, day long, v long",
    )
    src.createOrReplaceTempView("updates_src")
    r = CAT.catalog_sql(
        spark, cat,
        "MERGE INTO tbl AS t USING updates_src AS s ON t.k = s.k "
        "WHEN MATCHED AND s.v >= 0 THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.v >= 0 THEN INSERT *",
    )
    row = r.first()
    assert (row.updated, row.inserted, row.deleted) == (2, 1, 0)
    out = sinks.read_manifest_table(spark, t)
    assert out.filter("k = 4").first().v == 400
    assert out.filter("k = 60").first().v == 600
    assert out.filter("k = 61").count() == 0  # condition filtered it out
    # DELETE clause + assignments form
    r2 = CAT.catalog_sql(
        spark, cat,
        "MERGE INTO tbl t USING updates_src s ON t.k = s.k "
        "WHEN MATCHED AND s.v < 0 THEN UPDATE SET v = t.v - 1 "
        "WHEN MATCHED THEN DELETE",
    )
    assert r2.first().deleted == 3  # k 4, 5, 60 deleted; 61 not matched
    assert sinks.read_manifest_table(spark, t).count() == 4
    # non-equi ON refuses loudly
    with pytest.raises(ValueError, match="equi-key"):
        CAT.catalog_sql(
            spark, cat,
            "MERGE INTO tbl t USING updates_src s ON t.k > s.k "
            "WHEN MATCHED THEN DELETE",
        )


def test_sql_merge_with_subquery_source_and_cataloged_source(spark, tmp_path):
    cat = str(tmp_path / "cat")
    t, u = str(tmp_path / "t"), str(tmp_path / "u")
    _mk(spark, t, 4)
    _mk(spark, u, 8)
    CAT.catalog_create_table(cat, "tgt", t)
    CAT.catalog_create_table(cat, "feed", u)
    r = CAT.catalog_sql(
        spark, cat,
        "MERGE INTO tgt USING (SELECT k, day, v + 1 AS v FROM feed "
        "WHERE k >= 2) s ON tgt.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    row = r.first()
    assert (row.updated, row.inserted) == (2, 4)
    out = sinks.read_manifest_table(spark, t)
    assert out.count() == 8
    assert out.filter("k = 3").first().v == 7  # 3*2 + 1 from the feed


def test_dml_refuses_pinned_entries(spark, tmp_path):
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    _mk(spark, t, 4)
    sinks.manifest_tag(t, "frozen")
    CAT.catalog_create_table(cat, "pinned", t, ref="frozen")
    with pytest.raises(ValueError, match="pinned"):
        CAT.catalog_sql(spark, cat, "DELETE FROM pinned WHERE k = 1")


def test_positional_insert_requires_full_width(spark, tmp_path):
    """Round-7 review: INSERT without a column list must match the
    table's column count exactly — a narrower source would silently
    shift values into the wrong columns (standard SQL rejects it)."""
    cat, t = _cat(spark, tmp_path, 4)
    with pytest.raises(ValueError, match="column list"):
        CAT.catalog_sql(
            spark, cat, "INSERT INTO tbl SELECT k, v FROM tbl"
        )
    # the explicit-column-list form is the supported subset shape
    CAT.catalog_sql(spark, cat, "INSERT INTO tbl (k, day) VALUES (77, 1)")
    row = sinks.read_manifest_table(spark, t).filter("k = 77").first()
    assert row.day == 1 and row.v is None


def test_merge_alias_named_t_or_s_and_string_literals(spark, tmp_path):
    """Round-7 review: alias rewriting is one simultaneous pass outside
    string literals — aliases literally named t/s (or swapped) can't be
    double-rewritten, and quoted data text is never altered."""
    cat, t = _cat(spark, tmp_path, 4)
    src = spark.createDataFrame([(2, 0, 222), (9, 1, 999)],
                                "k long, day long, v long")
    src.createOrReplaceTempView("m_src")
    # source aliased 't', target aliased 's' — the adversarial swap
    r = CAT.catalog_sql(
        spark, cat,
        "MERGE INTO tbl AS s USING m_src AS t ON s.k = t.k "
        "WHEN MATCHED THEN UPDATE SET v = t.v "
        "WHEN NOT MATCHED THEN INSERT *",
    ).first()
    assert (r.updated, r.inserted) == (1, 1)
    out = sinks.read_manifest_table(spark, t)
    assert out.filter("k = 2").first().v == 222
    assert out.filter("k = 9").first().v == 999
    # string literals pass through the rewrite untouched
    sinks.manifest_add_column(spark, t, "note", "string")
    CAT.catalog_sql(
        spark, cat,
        "MERGE INTO tbl AS a USING m_src AS b ON a.k = b.k "
        "WHEN MATCHED THEN UPDATE SET note = 'about a.v and b.v'",
    )
    got = sinks.read_manifest_table(spark, t).filter("k = 2").first()
    assert got.note == "about a.v and b.v"
    # identical qualifiers on both sides refuse loudly
    with pytest.raises(ValueError, match="alias"):
        CAT.catalog_sql(
            spark, cat,
            "MERGE INTO tbl AS x USING m_src AS x ON x.k = x.k "
            "WHEN MATCHED THEN DELETE",
        )


def test_merge_case_when_expression(spark, tmp_path):
    """Round-7 advice (low): a CASE WHEN ... END inside a MERGE action
    must not be mistaken for a WHEN clause boundary."""
    cat, t = _cat(spark, tmp_path, 6)  # k 0..5, v = 2k
    src = spark.createDataFrame(
        [(2, 0, 50), (3, 1, 3), (100, 0, 1)], "k long, day long, v long"
    )
    src.createOrReplaceTempView("mcase_src")
    r = CAT.catalog_sql(
        spark, cat,
        "MERGE INTO tbl USING mcase_src AS s ON tbl.k = s.k "
        "WHEN MATCHED THEN UPDATE SET "
        "v = CASE WHEN s.v > 10 THEN 10 ELSE s.v END "
        "WHEN NOT MATCHED THEN INSERT",
    )
    assert r.first().updated == 2 and r.first().inserted == 1
    out = {row.k: row.v for row in
           sinks.read_manifest_table(spark, t).collect()}
    assert out[2] == 10      # clipped by the CASE
    assert out[3] == 3       # passed through
    assert out[100] == 1     # inserted


def test_sql_dml_null_predicates(spark, tmp_path):
    """DELETE/UPDATE with IS [NOT] NULL and != route through the same
    parse_predicates vocabulary the readers prune on (round-9
    NULL-aware predicates, reference B2 loaders/__init__.py:73)."""
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 2, None if i < 4 else float(i)) for i in range(10)],
        "k long, day long, v double",
    )
    sinks.merge_upsert_manifest(spark, df, t, keys=["k"], partition_col="day")
    CAT.catalog_create_table(cat, "nulls_t", t)

    r = CAT.catalog_sql(
        spark, cat, "UPDATE nulls_t SET v = -1.0 WHERE v IS NULL"
    )
    assert r.first().updated == 4
    got = sinks.read_manifest_table(spark, t)
    assert got.filter("v IS NULL").count() == 0
    assert got.filter("v = -1.0").count() == 4

    r2 = CAT.catalog_sql(spark, cat, "DELETE FROM nulls_t WHERE v <> -1.0")
    assert r2.first().deleted == 6
    assert sinks.read_manifest_table(spark, t).count() == 4

    # SELECT with IS NOT NULL still matches plain Spark over the view
    CAT.register_catalog_views(spark, cat)
    n = CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM nulls_t WHERE v IS NOT NULL"
    ).first().n
    assert n == 4


def test_sql_dml_or_predicates(spark, tmp_path):
    """Round-13: DELETE/UPDATE WHERE accept one level of disjunction —
    the whole predicate chain below (row condition, file narrowing,
    transform prune) is OR-aware. Before the round-13 literal fix this
    exact DELETE silently parsed as ONE junk equality (day = \"a' OR
    day = 'b\") and deleted nothing while reporting success."""
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"day{i % 4}", float(i)) for i in range(20)],
        "k long, day string, v double",
    )
    sinks.merge_upsert_manifest(spark, df, t, keys=["k"], partition_col="day")
    CAT.catalog_create_table(cat, "or_t", t)

    r = CAT.catalog_sql(
        spark, cat, "DELETE FROM or_t WHERE day = 'day1' OR day = 'day2'"
    )
    assert r.first().deleted == 10
    left = sinks.read_manifest_table(spark, t)
    assert sorted(x.day for x in left.select("day").distinct().collect()) \
        == ["day0", "day3"]

    r = CAT.catalog_sql(
        spark, cat,
        "UPDATE or_t SET v = -1.0 WHERE k < 2 OR (day = 'day3' AND k > 15)",
    )
    assert r.first().updated == 2  # k=0 and k=19
    after = sinks.read_manifest_table(spark, t)  # post-update manifest
    got = {x.k for x in after.filter("v = -1.0").collect()}
    assert got == {0, 19}


def test_sql_dml_in_subquery(spark, tmp_path):
    """Round-13: DELETE/UPDATE WHERE accept `col IN (SELECT key FROM
    dim [WHERE literals])` — the delete-by-lookup shape (GDPR erasure
    driven by a consent table). Unlike the read-path harvest this is
    SEMANTICS: the key set resolves exactly at statement time, an empty
    subquery mutates zero rows, and NOT IN raises loudly (its NULL
    semantics cannot be reproduced by a key list)."""
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    d = str(tmp_path / "d")
    fact = spark.createDataFrame(
        [(i, i % 10, float(i)) for i in range(100)],
        "k long, fk long, v double",
    )
    sinks.merge_upsert_manifest(spark, fact, t, keys=["k"],
                                partition_col="fk")
    dim = spark.createDataFrame(
        [(i, i % 3) for i in range(10)], "dk long, seg long"
    )
    sinks.merge_upsert_manifest(spark, dim, d, keys=["dk"],
                                partition_col="seg")
    CAT.catalog_create_table(cat, "f_t", t)
    CAT.catalog_create_table(cat, "c_dim", d)

    r = CAT.catalog_sql(
        spark, cat,
        "DELETE FROM f_t WHERE fk IN (SELECT dk FROM c_dim WHERE seg = 1)",
    )
    assert r.first().deleted == 30  # dk ∈ {1, 4, 7} → 10 rows each
    left = sinks.read_manifest_table(spark, t)
    assert sorted(
        x.fk for x in left.select("fk").distinct().collect()
    ) == [0, 2, 3, 5, 6, 8, 9]

    # composes with plain conjuncts
    r2 = CAT.catalog_sql(
        spark, cat,
        "UPDATE f_t SET v = -1.0 WHERE k < 50 AND fk IN "
        "(SELECT dk FROM c_dim WHERE seg = 2)",
    )
    assert r2.first().updated == 15
    after = sinks.read_manifest_table(spark, t)
    assert after.filter("v = -1.0").count() == 15

    # empty subquery: a legitimate zero-row mutation, not an error
    r3 = CAT.catalog_sql(
        spark, cat,
        "DELETE FROM f_t WHERE fk IN (SELECT dk FROM c_dim WHERE seg = 9)",
    )
    assert r3.first().deleted == 0

    with pytest.raises(ValueError, match="NOT IN"):
        CAT.catalog_sql(
            spark, cat,
            "DELETE FROM f_t WHERE fk NOT IN "
            "(SELECT dk FROM c_dim WHERE seg = 1)",
        )
