"""SQL DDL + maintenance routing through catalog_sql: CREATE TABLE
[(cols)] [PARTITIONED BY] [AS SELECT], DROP TABLE, SHOW TABLES,
DESCRIBE [TABLE|HISTORY], VACUUM, OPTIMIZE [ZORDER BY] — the statements
that make the SQL surface a complete console over manifest tables."""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import catalog as CAT
from f1_data_pipeline_spark.operators import sinks


def _seed(spark, tmp_path, n=20):
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("day"),
        (F.col("id") * 2).alias("v"),
    )
    sinks.merge_upsert_manifest(spark, df, t, keys=["k"],
                                partition_col="day")
    CAT.catalog_create_table(cat, "src", t)
    return cat, t


def test_ctas_partitioned_and_roundtrip(spark, tmp_path):
    cat, _ = _seed(spark, tmp_path)
    r = CAT.catalog_sql(
        spark, cat,
        "CREATE TABLE evens PARTITIONED BY (day) AS "
        "SELECT k, day, v FROM src WHERE k % 2 = 0",
    ).first()
    assert r.rows == 10 and r.partitions == 2  # even k → day ∈ {0, 2}
    # default LOCATION lives under the catalog dir
    tables = CAT.catalog_tables(cat)
    assert tables["evens"]["path"].startswith(cat)
    out = CAT.catalog_sql(spark, cat, "SELECT count(*) AS n FROM evens")
    assert out.first().n == 10
    # the created table is a full manifest table: DML works on it
    CAT.catalog_sql(spark, cat, "DELETE FROM evens WHERE k < 4")
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM evens"
    ).first().n == 8
    # name collision refused
    with pytest.raises(ValueError, match="already exists"):
        CAT.catalog_sql(
            spark, cat,
            "CREATE TABLE evens PARTITIONED BY (day) AS SELECT * FROM src",
        )
    # PARTITIONED BY mandatory
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        CAT.catalog_sql(spark, cat,
                        "CREATE TABLE nope AS SELECT * FROM src")


def test_ctas_hidden_transform_and_explicit_location(spark, tmp_path):
    cat, _ = _seed(spark, tmp_path)
    loc = str(tmp_path / "elsewhere")
    r = CAT.catalog_sql(
        spark, cat,
        "CREATE TABLE bucketed PARTITIONED BY (bucket(4, k)) "
        f"LOCATION '{loc}' AS SELECT k, v FROM src",
    ).first()
    assert r.rows == 20
    assert CAT.catalog_tables(cat)["bucketed"]["path"] == loc
    assert sinks.read_manifest(loc)["partition_col"] == "bucket(4, k)"
    got = CAT.catalog_sql(spark, cat,
                          "SELECT v FROM bucketed WHERE k = 7")
    assert got.first().v == 14


def test_create_empty_table_then_insert(spark, tmp_path):
    cat, _ = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE TABLE fresh (k bigint, day bigint, v bigint) "
        "PARTITIONED BY (day)",
    )
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM fresh"
    ).first().n == 0
    # the time_key_rule stamp applies to time-transformed creations
    CAT.catalog_sql(
        spark, cat,
        "CREATE TABLE tfresh (k bigint, ts timestamp) "
        "PARTITIONED BY (days(ts))",
    )
    tpath = CAT.catalog_tables(cat)["tfresh"]["path"]
    assert sinks.read_manifest(tpath)["time_key_rule"] == "utc"
    # writable through SQL from the start
    r = CAT.catalog_sql(
        spark, cat, "INSERT INTO fresh SELECT k, day, v FROM src"
    ).first()
    assert r.inserted == 20
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM fresh"
    ).first().n == 20
    # empty CTAS still creates the table with the SELECT's schema
    CAT.catalog_sql(
        spark, cat,
        "CREATE TABLE none PARTITIONED BY (day) AS "
        "SELECT k, day, v FROM src WHERE k < 0",
    )
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM none"
    ).first().n == 0


def test_show_describe_history(spark, tmp_path):
    cat, t = _seed(spark, tmp_path)
    sinks.manifest_add_constraint(spark, t, "v_ok", "v >= 0")
    rows = CAT.catalog_sql(spark, cat, "SHOW TABLES").collect()
    assert [(r.name, r.path) for r in rows] == [("src", t)]
    desc = {
        r.col_name: r.data_type
        for r in CAT.catalog_sql(spark, cat, "DESCRIBE src").collect()
    }
    assert desc["k"] == "bigint" and desc["v"] == "bigint"
    assert desc["# partitioned by"] == "day"
    assert desc["# check:v_ok"] == "v >= 0"
    hist = CAT.catalog_sql(spark, cat, "DESCRIBE HISTORY src").collect()
    assert [(h.version, h.op) for h in hist] == [
        (1, "merge"), (2, "add_constraint"),
    ]
    assert hist[0].rows == 20 and hist[0].partitions == 4


def test_vacuum_and_optimize(spark, tmp_path):
    cat, t = _seed(spark, tmp_path)
    # two merges → superseded prefixes to reclaim
    up = spark.createDataFrame([(1, 1, 999)], "k long, day long, v long")
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"],
                                partition_col="day")
    r = CAT.catalog_sql(spark, cat, "VACUUM src RETAIN 0 HOURS").first()
    assert r.prefixes_removed >= 1
    pre = sorted(
        r.k for r in CAT.catalog_sql(spark, cat, "SELECT k FROM src").collect()
    )
    o = CAT.catalog_sql(spark, cat, "OPTIMIZE src ZORDER BY (k)").first()
    assert o.files_after <= o.files_before
    post = sorted(
        r.k for r in CAT.catalog_sql(spark, cat, "SELECT k FROM src").collect()
    )
    assert post == pre
    # unsupported shapes AGAINST A CATALOGED TABLE raise loudly
    for bad in ("VACUUM src RETAIN x HOURS",
                "OPTIMIZE src BY (k)", "DROP TABLE src CASCADE"):
        with pytest.raises(ValueError):
            CAT.catalog_sql(spark, cat, bad)
    # statements about the SPARK catalog pass through untouched
    assert CAT.catalog_sql(spark, cat, "SHOW DATABASES").count() >= 1


def test_drop_table_keeps_data(spark, tmp_path):
    cat, t = _seed(spark, tmp_path)
    assert CAT.catalog_sql(spark, cat, "DROP TABLE src").first().dropped == 1
    assert CAT.catalog_tables(cat) == {}
    # data untouched — re-registerable
    assert glob.glob(os.path.join(t, "data", "*", "*"))
    CAT.catalog_create_table(cat, "back", t)
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM back"
    ).first().n == 20


def test_count_star_metadata_fast_path(spark, tmp_path):
    """SELECT COUNT(*) answers from manifest metadata (zero files opened
    without a predicate), stays exact with predicates / MoR deletes /
    time travel, names the column exactly as plain spark.sql would, and
    falls back to the normal plan for shapes it can't prove."""
    cat, t = _seed(spark, tmp_path)  # 20 rows, day = k % 4
    CAT.register_catalog_views(spark, cat)

    df = CAT.catalog_sql(spark, cat, "SELECT count(*) FROM src")
    assert df.first()[0] == 20
    assert df.columns == spark.sql("SELECT count(*) FROM src").columns
    assert df.inputFiles() == []  # metadata-only: no parquet in the plan

    n = CAT.catalog_sql(
        spark, cat, "SELECT COUNT(*) AS n FROM src WHERE day = 1"
    )
    assert n.columns == ["n"] and n.first().n == 5
    assert n.inputFiles() == []  # partition-pruned + stats-proven

    # MoR delete: recorded deletes subtract exactly, still metadata-only
    sinks.delete_manifest_rows(spark, t, [("k", "=", 9)], mode="mor")
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM src"
    ).first().n == 19
    # time travel sees the pre-delete count
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM src VERSION AS OF 1"
    ).first().n == 20

    # unprovable shapes fall back to the real plan (and stay correct)
    fb = CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM src WHERE day = 1 OR k = 2"
    )
    # day=1 holds k ∈ {1,5,13,17} live (k=9 was MoR-deleted) + k=2
    assert fb.first().n == 5 and fb.inputFiles() != []
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(k) AS n FROM src"
    ).first().n == 19  # count(col) ≠ count(*): never fast-pathed


def test_insert_overwrite(spark, tmp_path):
    """INSERT OVERWRITE replaces each partition present in the source
    wholesale (Iceberg/Delta replaceWhere), other partitions untouched."""
    cat, t = _seed(spark, tmp_path)  # 20 rows, day = k % 4
    r = CAT.catalog_sql(
        spark, cat,
        "INSERT OVERWRITE src SELECT k + 100 AS k, day, v FROM src "
        "WHERE day = 1",
    ).first()
    assert (r.rows, r.partitions_replaced) == (5, 1)
    out = sinks.read_manifest_table(spark, t)
    assert out.count() == 20  # day 1 replaced (5 for 5), rest untouched
    assert out.filter("day = 1").agg({"k": "min"}).first()[0] == 101
    assert out.filter("day = 0").count() == 5
    with pytest.raises(ValueError, match="no column list"):
        CAT.catalog_sql(
            spark, cat, "INSERT OVERWRITE src (k) SELECT k FROM src"
        )


def test_alter_table_and_restore(spark, tmp_path):
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(spark, cat, "ALTER TABLE src ADD COLUMN note string")
    assert "note" in sinks.read_manifest_table(spark, t).columns
    CAT.catalog_sql(
        spark, cat, "ALTER TABLE src ADD CONSTRAINT v_ok CHECK (v >= 0)"
    )
    with pytest.raises(sinks.ConstraintViolationError):
        CAT.catalog_sql(spark, cat, "UPDATE src SET v = -1 WHERE k = 1")
    CAT.catalog_sql(spark, cat, "ALTER TABLE src DROP CONSTRAINT v_ok")
    CAT.catalog_sql(spark, cat, "ALTER TABLE src DROP COLUMN note")
    assert "note" not in sinks.read_manifest_table(spark, t).columns

    # tag + restore through SQL
    CAT.catalog_sql(spark, cat, "ALTER TABLE src CREATE TAG clean")
    CAT.catalog_sql(spark, cat, "DELETE FROM src WHERE k < 10")
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM src"
    ).first().n == 10
    r = CAT.catalog_sql(
        spark, cat, "RESTORE TABLE src TO VERSION AS OF 'clean'"
    ).first()
    assert r.partitions_changed >= 1
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM src"
    ).first().n == 20
    CAT.catalog_sql(spark, cat, "ALTER TABLE src DROP TAG clean")
    with pytest.raises(ValueError, match="unsupported ALTER"):
        CAT.catalog_sql(
            spark, cat, "ALTER TABLE src SET TBLPROPERTIES ('a'='b')"
        )


def test_min_max_metadata_fast_path(spark, tmp_path):
    """SELECT min/max (+count) answers from manifest bounds with zero
    data I/O for exact-stat types; strings and MoR-delete-bearing tables
    fall back to the real plan; a WHERE stays metadata-only when the
    predicate is decided per file (partition-aligned / stats-decided —
    round 10, verdict #2) and falls back on any boundary file;
    empty/all-NULL columns answer NULL (the correct SQL aggregate)."""
    import datetime as dt

    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, 0, 5.5, "b", dt.datetime(2024, 3, 5, 4, tzinfo=dt.timezone.utc)),
            (2, 0, -1.0, "a", dt.datetime(2024, 3, 7, 9, tzinfo=dt.timezone.utc)),
            (3, 1, 9.25, "c", dt.datetime(2024, 3, 6, 12, tzinfo=dt.timezone.utc)),
        ],
        "k long, day long, v double, s string, ts timestamp",
    )
    sinks.merge_upsert_manifest(spark, df, t, ["k"], partition_col="day")
    CAT.catalog_create_table(cat, "mm", t)
    CAT.register_catalog_views(spark, cat)

    q = "SELECT min(v) AS lo, max(v) AS hi, max(ts) AS w, count(*) AS n FROM mm"
    got = CAT.catalog_sql(spark, cat, q)
    assert got.inputFiles() == []  # metadata-only
    want = spark.sql(q).first()
    r = got.first()
    assert (r.lo, r.hi, r.w, r.n) == (want.lo, want.hi, want.w, want.n)
    # unaliased naming matches plain spark.sql
    assert CAT.catalog_sql(
        spark, cat, "SELECT max(k) FROM mm"
    ).columns == spark.sql("SELECT max(k) FROM mm").columns

    # strings fall back (parquet string bounds may be truncated)
    fb = CAT.catalog_sql(spark, cat, "SELECT max(s) AS m FROM mm")
    assert fb.first().m == "c" and fb.inputFiles() != []
    # WHERE on the partition column is partition-aligned: every
    # surviving file always-matches → still metadata-only
    fb2 = CAT.catalog_sql(spark, cat,
                          "SELECT max(v) AS m FROM mm WHERE day = 0")
    assert fb2.first().m == 5.5 and fb2.inputFiles() == []
    # mixed aggregates + count under the same pruned WHERE
    mixed = CAT.catalog_sql(
        spark, cat,
        "SELECT min(v) AS lo, count(*) AS n FROM mm WHERE day = 0",
    )
    assert mixed.inputFiles() == []
    rm = mixed.first()
    assert (rm.lo, rm.n) == (-1.0, 2)
    # a predicate every pruned-set file's bounds DECIDE is also exact
    # (day-1's file [9.25, 9.25] proves no row matches; day-0's
    # [-1.0, 5.5] proves all rows match)
    dec = CAT.catalog_sql(spark, cat,
                          "SELECT max(v) AS m FROM mm WHERE v < 6")
    assert dec.first().m == 5.5 and dec.inputFiles() == []
    # a boundary file (bounds straddle the literal) → real plan
    fb3 = CAT.catalog_sql(spark, cat,
                          "SELECT max(v) AS m FROM mm WHERE v < 5")
    assert fb3.first().m == -1.0 and fb3.inputFiles() != []
    # WHERE pruning everything: NULL min over zero matching rows
    none = CAT.catalog_sql(
        spark, cat,
        "SELECT min(v) AS m, count(*) AS n FROM mm WHERE day = 7",
    )
    assert none.inputFiles() == []
    rn = none.first()
    assert rn.m is None and rn.n == 0

    # all-NULL column answers NULL from metadata
    sinks.manifest_add_column(spark, t, "empty_col", "double")
    r2 = CAT.catalog_sql(
        spark, cat, "SELECT min(empty_col) AS m, count(*) AS n FROM mm"
    ).first()
    assert r2.m is None and r2.n == 3

    # a MoR delete file makes bounds unanswerable → real plan, still
    # right (k=2 lives in the two-row day-0 partition, so the delete
    # writes a position file instead of dropping the entry)
    sinks.delete_manifest_rows(spark, t, [("k", "=", 2)], mode="mor")
    out = CAT.catalog_sql(spark, cat, "SELECT min(v) AS m FROM mm")
    assert out.first().m == 5.5 and out.inputFiles() != []


def test_count_col_metadata_fast_path(spark, tmp_path):
    """COUNT(col) joins the metadata fast path (round-11 verdict #4):
    recorded rows − recorded null count, exact for ANY column type (the
    string-truncation caveat is a MIN/MAX concern, not a null-count
    one), same fall-back rules — a stats-decided WHERE stays
    metadata-only, MoR deletes force the real plan, answers always
    match the scan."""
    import datetime as dt

    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, 0, 5.5, "b"),
            (2, 0, None, None),
            (3, 1, 9.25, "c"),
            (4, 1, None, "d"),
            (5, 1, 2.0, None),
        ],
        "k long, day long, v double, s string",
    )
    sinks.merge_upsert_manifest(spark, df, t, ["k"], partition_col="day")
    CAT.catalog_create_table(cat, "cc", t)
    CAT.register_catalog_views(spark, cat)

    q = "SELECT count(v) AS nv, count(s) AS ns, count(*) AS n FROM cc"
    got = CAT.catalog_sql(spark, cat, q)
    assert got.inputFiles() == []  # metadata-only, strings included
    want = spark.sql(q.replace("FROM cc", "FROM cc")).first()
    r = got.first()
    assert (r.nv, r.ns, r.n) == (want.nv, want.ns, want.n) == (3, 3, 5)
    # unaliased naming matches plain spark.sql
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(v) FROM cc"
    ).columns == spark.sql("SELECT count(v) FROM cc").columns
    # stats-decided WHERE stays metadata-only; boundary file falls back
    w = CAT.catalog_sql(
        spark, cat, "SELECT count(v) AS nv, min(v) AS lo FROM cc WHERE day = 1"
    )
    assert w.inputFiles() == []
    rw = w.first()
    assert (rw.nv, rw.lo) == (2, 2.0)
    fb = CAT.catalog_sql(
        spark, cat, "SELECT count(v) AS nv FROM cc WHERE v < 5"
    )
    assert fb.first().nv == 1 and fb.inputFiles() != []
    # unknown column: the normal plan's AnalysisException, never a guess
    with pytest.raises(Exception):
        CAT.catalog_sql(spark, cat, "SELECT count(nope) FROM cc").collect()
    # MoR delete makes null accounting unanswerable → real plan, right
    sinks.delete_manifest_rows(spark, t, [("k", "=", 2)], mode="mor")
    out = CAT.catalog_sql(spark, cat, "SELECT count(s) AS ns FROM cc")
    assert out.first().ns == 3 and out.inputFiles() != []


def test_non_cataloged_targets_pass_through(spark, tmp_path):
    """Round-7 review: DML/DDL whose target is NOT a cataloged table
    passes through to plain spark.sql (temp views, session-catalog
    tables) — the pre-DDL-surface behavior; only cataloged targets take
    the manifest routing."""
    cat, _ = _seed(spark, tmp_path)
    spark.range(5).createOrReplaceTempView("plain_view")
    out = CAT.catalog_sql(spark, cat, "DESCRIBE plain_view")
    assert "id" in {r.col_name for r in out.collect()}
    # ALTER against a non-cataloged name is Spark's error, not a
    # catalog FileNotFoundError
    with pytest.raises(Exception) as ei:
        CAT.catalog_sql(spark, cat, "ALTER TABLE plain_view ADD COLUMN x int")
    assert not isinstance(ei.value, FileNotFoundError)
    # non-manifest CREATE syntax is Spark's too
    with pytest.raises(Exception) as ei2:
        CAT.catalog_sql(
            spark, cat, "CREATE TABLE sparkmanaged USING nosuchformat"
        )
    assert not isinstance(ei2.value, ValueError)
    spark.catalog.dropTempView("plain_view")


def test_plain_create_table_passes_through(spark, tmp_path):
    """Round-7 advice (low): `CREATE TABLE t (a int)` with no
    PARTITIONED BY, no catalog LOCATION, and a non-cataloged name is
    Spark's own statement — it must reach the session catalog, not
    raise. Catalog-owned syntax still routes (and a missing spec still
    raises with the PARTITIONED BY hint)."""
    cat = str(tmp_path / "cat")
    CAT.catalog_sql(spark, cat, "CREATE TABLE plain_tbl_r8 (a int)")
    try:
        names = {t.name for t in spark.catalog.listTables()}
        assert "plain_tbl_r8" in names
        assert "plain_tbl_r8" not in CAT.catalog_tables(cat)
    finally:
        spark.sql("DROP TABLE IF EXISTS plain_tbl_r8")
    # a LOCATION under the catalog is catalog-owned: missing spec raises
    loc = str(tmp_path / "cat" / "tables" / "owned")
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        CAT.catalog_sql(
            spark, cat,
            f"CREATE TABLE owned (a int) LOCATION '{loc}'",
        )


def test_sql_rename_column_and_table(spark, tmp_path):
    """Round-7 verdict #5: ALTER TABLE ... RENAME COLUMN is metadata-only
    (reads/DML/pushdown work under the new name; time travel shows the
    old), and ALTER TABLE ... RENAME TO changes only the catalog name."""
    cat, t = _seed(spark, tmp_path)  # table 'src': 20 rows, day = k % 4
    v1 = sinks.read_manifest(t)["version"]
    r = CAT.catalog_sql(spark, cat, "ALTER TABLE src RENAME COLUMN v TO score")
    assert r.first().columns_renamed == 1
    out = CAT.catalog_sql(spark, cat, "SELECT k, score FROM src WHERE score >= 0")
    assert out.count() == 20
    CAT.catalog_sql(spark, cat, "UPDATE src SET score = score + 5 WHERE k = 1")
    assert CAT.catalog_sql(
        spark, cat, "SELECT score FROM src WHERE k = 1"
    ).first().score == spark.range(0).count() + 1 * 2 + 5  # 2k + 5
    # time travel: pre-rename snapshot keeps the old column name
    old = CAT.catalog_sql(
        spark, cat, f"SELECT v FROM src VERSION AS OF {v1} WHERE k = 1"
    )
    assert old.first().v == 2
    # table rename: catalog-only
    r2 = CAT.catalog_sql(spark, cat, "ALTER TABLE src RENAME TO facts")
    assert r2.first().tables_renamed == 1
    assert "src" not in CAT.catalog_tables(cat)
    assert CAT.catalog_sql(
        spark, cat, "SELECT count(*) AS n FROM facts"
    ).first().n == 20


def test_show_create_table_round_trips(spark, tmp_path):
    """SHOW CREATE TABLE emits DDL that, re-executed through catalog_sql
    (with a fresh name/location), recreates an equivalent table —
    columns, partition spec, and constraints included."""
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat, "ALTER TABLE src ADD CONSTRAINT k_pos CHECK (k >= 0)"
    )
    stmts = [r.createtab_stmt
             for r in CAT.catalog_sql(spark, cat,
                                      "SHOW CREATE TABLE src").collect()]
    assert stmts[0].startswith("CREATE TABLE src (")
    assert "PARTITIONED BY (day)" in stmts[0]
    assert any("ADD CONSTRAINT k_pos" in s for s in stmts[1:])
    # re-execute under a fresh name + location
    loc2 = str(tmp_path / "clone_loc")
    for s in stmts:
        s2 = s.replace("src", "src2").replace(
            f"LOCATION '{t}'", f"LOCATION '{loc2}'"
        )
        CAT.catalog_sql(spark, cat, s2)
    d = {r.col_name: r.data_type
         for r in CAT.catalog_sql(spark, cat, "DESCRIBE src2").collect()}
    assert d["k"] == "bigint" and d["# partitioned by"] == "day"
    assert "# check:k_pos" in d
    # the recreated (empty) table accepts conforming inserts and rejects
    # constraint violations — behaviorally equivalent
    CAT.catalog_sql(spark, cat,
                    "INSERT INTO src2 VALUES (1, 0, 2)")
    with pytest.raises(Exception, match="k_pos|constraint"):
        CAT.catalog_sql(spark, cat, "INSERT INTO src2 VALUES (-5, 0, 2)")


def test_alter_column_type_widening(spark, tmp_path):
    """ALTER COLUMN ... TYPE: reader-safe widening is metadata-only —
    old prefixes stay readable (reader widens on scan), SHOW CREATE
    reflects the new type, old snapshots still read via time travel —
    and narrowing / string conversions are refused."""
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(20)], "k long, day int, v float"
    )
    sinks.merge_upsert_manifest(spark, df, t, keys=["k"], partition_col="day")
    CAT.catalog_create_table(cat, "wt", t)
    v_before = sinks.read_manifest(t)["version"]

    [r] = CAT.catalog_sql(
        spark, cat, "ALTER TABLE wt ALTER COLUMN v TYPE double"
    ).collect()
    assert r["columns_widened"] == 1
    got = sinks.read_manifest_table(spark, t)
    assert dict(got.dtypes)["v"] == "double"
    assert sorted(x["v"] for x in got.collect()) == [float(i) for i in range(20)]
    # no data rewritten: same prefixes as before the ALTER
    m = sinks.read_manifest(t)
    m0 = sinks.read_manifest(t, v_before)
    assert {e["prefix"] for e in m["partitions"].values()} \
        == {e["prefix"] for e in m0["partitions"].values()}

    # SHOW CREATE reflects the widened type (round-trippable DDL)
    ddl = [r["createtab_stmt"] for r in CAT.catalog_sql(
        spark, cat, "SHOW CREATE TABLE wt").collect()]
    assert any("v double" in s.lower() for s in ddl), ddl

    # old snapshot still reads under its own (narrower) schema
    old = sinks.read_manifest_table(spark, t, version=v_before)
    assert dict(old.dtypes)["v"] == "float"

    # SET DATA TYPE spelling + no-op same-type call
    CAT.catalog_sql(spark, cat, "ALTER TABLE wt ALTER COLUMN k SET DATA TYPE bigint")
    assert dict(sinks.read_manifest_table(spark, t).dtypes)["k"] == "bigint"

    # a widened table still merges (schema agreement end-to-end)
    up = spark.createDataFrame([(100, 1, 1.5)], "k long, day int, v double")
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"], partition_col="day")
    assert sinks.read_manifest_table(spark, t).count() == 21

    # refused: narrowing and string conversion
    with pytest.raises(ValueError, match="not .*widening"):
        CAT.catalog_sql(spark, cat, "ALTER TABLE wt ALTER COLUMN v TYPE float")
    with pytest.raises(ValueError, match="not .*widening"):
        CAT.catalog_sql(spark, cat, "ALTER TABLE wt ALTER COLUMN v TYPE string")


def test_alter_column_type_blast_radius(spark, tmp_path):
    """Type-sensitive consumers refuse the widening: the partition
    transform source (bucket derivation) and bloom-indexed columns."""
    cat = str(tmp_path / "cat")
    b = str(tmp_path / "b")
    df = spark.createDataFrame(
        [(i, i % 100, float(i)) for i in range(50)],
        "k int, fk int, v double",
    )
    sinks.merge_upsert_manifest(
        spark, df, b, keys=["k"], partition_col="bucket(4, fk)",
        bloom_cols=["k"],
    )
    CAT.catalog_create_table(cat, "bt", b)
    with pytest.raises(ValueError, match="partition source"):
        CAT.catalog_sql(spark, cat, "ALTER TABLE bt ALTER COLUMN fk TYPE bigint")
    with pytest.raises(ValueError, match="bloom"):
        CAT.catalog_sql(spark, cat, "ALTER TABLE bt ALTER COLUMN k TYPE bigint")
    # a plain column on the same table still widens
    CAT.catalog_sql(spark, cat, "ALTER TABLE bt ALTER COLUMN v TYPE double")


def test_describe_detail_and_show_tags(spark, tmp_path):
    """DESCRIBE DETAIL: one-row table summary from manifest metadata +
    a size walk; SHOW TAGS lists pinned versions. Rows reflect live
    counts through MoR deletes; pre-stats unknowns surface as NULL."""
    cat, t = _seed(spark, tmp_path, 20)
    sinks.manifest_tag(t, "rel1")
    sinks.manifest_add_constraint(spark, t, "v_pos", "v >= 0")
    sinks.delete_manifest_rows(spark, t, [("k", "=", 3)], mode="mor")

    [d] = CAT.catalog_sql(spark, cat, "DESCRIBE DETAIL src").collect()
    assert d["name"] == "src" and d["location"] == t
    assert d["format"] == "manifest" and d["partition_col"] == "day"
    assert d["num_partitions"] == 4 and d["rows"] == 19  # MoR delete seen
    assert d["num_files"] >= 4 and d["size_bytes"] > 0
    assert d["num_constraints"] == 1 and d["num_tags"] == 1
    assert d["version"] == sinks.read_manifest(t)["version"]

    got = CAT.catalog_sql(spark, cat, "SHOW TAGS src").collect()
    assert [(r["tag"], r["version"]) for r in got] == [("rel1", 1)]
    sinks.manifest_tag(t, "rel2")
    assert CAT.catalog_sql(spark, cat, "SHOW TAGS FROM src").count() == 2

    with pytest.raises(FileNotFoundError):
        CAT.catalog_sql(spark, cat, "SHOW TAGS ghost")
    # DESCRIBE of a non-cataloged target keeps the established policy:
    # pass through to Spark's own statement (which then errors its way)


def test_show_partitions_metadata_only(spark, tmp_path):
    """SHOW PARTITIONS: per-partition files/rows/recorded-bytes/delete
    counts from the manifest alone — the pre-OPTIMIZE observability
    question, zero file I/O; missing names raise the catalog's error;
    a non-cataloged name falls through to Spark's own verb."""
    cat, t = _seed(spark, tmp_path)
    out = CAT.catalog_sql(spark, cat, "SHOW PARTITIONS src")
    assert out.columns == [
        "partition", "files", "rows", "data_bytes", "delete_files"
    ]
    rows = {r.partition: r for r in out.collect()}
    assert set(rows) == {"0", "1", "2", "3"}
    assert all(r.files >= 1 and r.data_bytes > 0 for r in rows.values())
    assert sum(r.rows for r in rows.values()) == 20
    assert all(r.delete_files == 0 for r in rows.values())
    # MoR delete shows up in its partition's delete_files and live rows
    sinks.delete_manifest_rows(spark, t, [("k", "=", 4)], mode="mor")
    rows2 = {
        r.partition: r
        for r in CAT.catalog_sql(spark, cat, "SHOW PARTITIONS src").collect()
    }
    assert rows2["0"].delete_files == 1
    assert rows2["0"].rows == rows["0"].rows - 1
    # non-cataloged name falls through to Spark's own SHOW PARTITIONS
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        CAT.catalog_sql(spark, cat, "SHOW PARTITIONS nope")


def test_group_count_metadata_fast_path(spark, tmp_path):
    """SELECT pcol, COUNT(*) ... GROUP BY pcol on an identity-partitioned
    table: the partition histogram from metadata, zero files opened;
    exact under WHERE-on-pcol pruning and MoR deletes; other shapes
    (non-pcol grouping, non-pcol WHERE) take the real plan."""
    cat, t = _seed(spark, tmp_path)  # 20 rows, day = k % 4

    q = "SELECT day, COUNT(*) AS n FROM src GROUP BY day"
    got = CAT.catalog_sql(spark, cat, q)
    assert got.inputFiles() == []
    assert sorted((r.day, r.n) for r in got.collect()) == [
        (0, 5), (1, 5), (2, 5), (3, 5)
    ]
    # unaliased naming matches plain spark.sql
    CAT.register_catalog_views(spark, cat)
    assert CAT.catalog_sql(
        spark, cat, "SELECT day, COUNT(*) FROM src GROUP BY day"
    ).columns == spark.sql(
        "SELECT day, COUNT(*) FROM src GROUP BY day"
    ).columns

    # WHERE on the partition column prunes whole entries, still exact
    w = CAT.catalog_sql(
        spark, cat,
        "SELECT day, COUNT(*) AS n FROM src WHERE day >= 2 GROUP BY day",
    )
    assert w.inputFiles() == []
    assert sorted((r.day, r.n) for r in w.collect()) == [(2, 5), (3, 5)]

    # MoR delete subtracts exactly, still metadata-only
    sinks.delete_manifest_rows(spark, t, [("k", "=", 4)], mode="mor")
    g2 = CAT.catalog_sql(spark, cat, q)
    assert g2.inputFiles() == []
    assert dict((r.day, r.n) for r in g2.collect())[0] == 4

    # EXPLAIN records the fast path
    ex = CAT.catalog_sql(spark, cat, "EXPLAIN " + q).first()
    assert ex.fast_path == "group_count_metadata_only"
    assert ex.files_scanned == 0

    # non-pcol WHERE and non-pcol grouping take the real plan
    fb = CAT.catalog_sql(
        spark, cat,
        "SELECT day, COUNT(*) AS n FROM src WHERE v > 4 GROUP BY day",
    )
    assert fb.inputFiles() != []
    fb2 = CAT.catalog_sql(
        spark, cat, "SELECT v, COUNT(*) AS n FROM src GROUP BY v"
    )
    assert fb2.inputFiles() != []


def test_group_count_undecidable_predicates_take_the_plan(spark, tmp_path):
    """Round-10 self-review #1: an UNDECIDABLE predicate comparison
    (date literal vs date partition value, quoted literal vs int
    partition — plain Spark coerces both) must take the real plan, not
    silently drop groups as 'no match'."""
    import datetime as dt

    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, dt.date(2024, 6, 1 + i % 4), i * 1.0) for i in range(20)],
        "k long, d date, v double",
    )
    sinks.merge_upsert_manifest(spark, df, t, keys=["k"],
                                partition_col="d")
    CAT.catalog_create_table(cat, "dt", t)
    # date-typed groups WITHOUT a WHERE answer from metadata
    base = CAT.catalog_sql(
        spark, cat, "SELECT d, COUNT(*) AS n FROM dt GROUP BY d"
    )
    assert base.inputFiles() == []
    assert sum(r.n for r in base.collect()) == 20
    # date literal WHERE: metadata answers only if DECIDED; either way
    # the result must match the real plan
    q = ("SELECT d, COUNT(*) AS n FROM dt "
         "WHERE d >= DATE '2024-06-03' GROUP BY d")
    got = sorted(
        (str(r.d), r.n) for r in CAT.catalog_sql(spark, cat, q).collect()
    )
    spark.sql("SELECT 1")  # keep session warm
    want = sorted(
        (str(r.d), r.n)
        for r in sinks.read_manifest_table(spark, t)
        .filter(F.col("d") >= F.lit("2024-06-03").cast("date"))
        .groupBy("d").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert got == want and len(got) == 2
    # quoted literal against an int partition (Spark coerces): the
    # original int-partitioned fixture
    cat2, _t2 = _seed(spark, tmp_path / "intfixture")
    got2 = CAT.catalog_sql(
        spark, cat2,
        "SELECT day, COUNT(*) AS n FROM src WHERE day = '2' GROUP BY day",
    ).collect()
    assert [(r.day, r.n) for r in got2] == [(2, 5)]
