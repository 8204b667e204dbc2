"""Materialized views through the SQL console (round 10): CREATE
MATERIALIZED VIEW routes to matview.refresh_rollup with the spec
persisted in the target's app metadata; REFRESH MATERIALIZED VIEW
recomputes only changed source partitions."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import catalog as CAT
from f1_data_pipeline_spark.operators import sinks


def _seed(spark, tmp_path, n=40):
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("day"),
        (F.col("id") % 3).alias("cat"), (F.col("id") * 2.0).alias("v"),
    )
    sinks.merge_upsert_manifest(spark, df, t, keys=["k"],
                                partition_col="day")
    CAT.catalog_create_table(cat, "src", t)
    return cat, t


def _mv_rows(spark, cat):
    return sorted(
        tuple(r) for r in CAT.catalog_sql(
            spark, cat, "SELECT day, cat, n, total FROM mv"
        ).collect()
    )


def _want_rows(spark, cat):
    # matview_rewrite=False: this helper IS the direct-aggregation
    # baseline — letting the round-11 transparent rewrite answer it from
    # the view would make every parity assertion circular
    return sorted(
        tuple(r) for r in CAT.catalog_sql(
            spark, cat,
            "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total FROM src "
            "GROUP BY day, cat",
            bucket_joins=False,
            matview_rewrite=False,
        ).collect()
    )


def test_create_and_refresh_materialized_view(spark, tmp_path):
    cat, t = _seed(spark, tmp_path)
    r = CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total "
        "FROM src GROUP BY day, cat",
    ).first()
    assert r.strategy == "initial"
    assert _mv_rows(spark, cat) == _want_rows(spark, cat)
    # the view is a cataloged manifest table (readable, DESCRIBE-able)
    assert "mv" in CAT.catalog_tables(cat)

    # no source change: refresh is a noop
    assert CAT.catalog_sql(
        spark, cat, "REFRESH MATERIALIZED VIEW mv"
    ).first().strategy == "noop"

    # change ONE source partition; refresh recomputes only it
    up = spark.createDataFrame(
        [(100, 1, 0, 999.0), (101, 1, 1, 111.0)],
        "k long, day long, cat long, v double",
    )
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"],
                                partition_col="day")
    r2 = CAT.catalog_sql(
        spark, cat, "REFRESH MATERIALIZED VIEW mv"
    ).first()
    assert r2.strategy == "incremental"
    assert r2.partitions_refreshed == 1
    assert _mv_rows(spark, cat) == _want_rows(spark, cat)

    # REFRESH of a non-MV cataloged table raises the spec error
    with pytest.raises(ValueError, match="not a SQL materialized view"):
        CAT.catalog_sql(spark, cat, "REFRESH MATERIALIZED VIEW src")
    # REFRESH of an UNKNOWN name: the catalog's FileNotFoundError, like
    # every other verb — not Spark's opaque ParseException (r10 advice)
    with pytest.raises(FileNotFoundError, match="no materialized view"):
        CAT.catalog_sql(spark, cat, "REFRESH MATERIALIZED VIEW nosuch")
    # plain REFRESH TABLE shapes still delegate to Spark's own statement
    spark.range(3).createOrReplaceTempView("rf_tmp")
    try:
        CAT.catalog_sql(spark, cat, "REFRESH TABLE rf_tmp")
    finally:
        spark.catalog.dropTempView("rf_tmp")
    # unsupported SELECT items raise loudly at CREATE
    with pytest.raises(ValueError, match="unsupported materialized-view"):
        CAT.catalog_sql(
            spark, cat,
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT day, SUM(v * 2) AS t FROM src GROUP BY day",
        )
    # name collision refused before any data lands
    with pytest.raises(ValueError, match="already exists"):
        CAT.catalog_sql(
            spark, cat,
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT day, COUNT(*) AS n FROM src GROUP BY day",
        )


def test_matview_over_hidden_partitioned_source(spark, tmp_path):
    cat = str(tmp_path / "cat")
    t = str(tmp_path / "ev")
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 3, 1 + i % 3, i % 24), float(i))
         for i in range(60)],
        "event_id long, ts timestamp, value double",
    )
    sinks.merge_upsert_manifest(
        spark, df, t, keys=["event_id"], partition_col="days(ts)"
    )
    CAT.catalog_create_table(cat, "ev", t)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW daily AS "
        "SELECT days(ts) AS day, COUNT(*) AS n, MAX(value) AS hi "
        "FROM ev GROUP BY days(ts)",
    )
    got = sorted(
        (str(r.day), r.n, r.hi) for r in CAT.catalog_sql(
            spark, cat, "SELECT day, n, hi FROM daily"
        ).collect()
    )
    want = sorted(
        (str(r.day), r.n, r.hi)
        for r in sinks.read_manifest_table(spark, t)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("hi"))
        .collect()
    )
    assert got == want


def test_describe_shows_matview_spec(spark, tmp_path):
    cat, _ = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, COUNT(*) AS n FROM src GROUP BY day",
    )
    desc = {
        r.col_name: r.data_type
        for r in CAT.catalog_sql(spark, cat, "DESCRIBE mv").collect()
    }
    assert desc["# materialized view"] == "FROM src GROUP BY day | n=count(*)"


def test_mv_spec_lands_in_the_initial_commit(spark, tmp_path):
    """Round-10 self-review #6: the rollup spec rides the initial
    build's OWN commit (extra_app_metadata) — version 1 of the target
    already carries matview_sql, so no crash window can separate data
    from spec; a pinned catalog entry refuses REFRESH like every other
    write verb (#5)."""
    cat, _ = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, COUNT(*) AS n FROM src GROUP BY day",
    )
    tgt = CAT.catalog_tables(cat)["mv"]["path"]
    v1 = sinks.read_manifest(tgt, 1)
    assert v1["version"] == 1
    assert "matview_sql" in (v1.get("app") or {})

    # pinned (frozen) entry: REFRESH refused like DML
    CAT.catalog_sql(spark, cat, "DROP TABLE mv")
    CAT.catalog_create_table(cat, "mv", tgt, ref=1)
    with pytest.raises(ValueError, match="pinned"):
        CAT.catalog_sql(spark, cat, "REFRESH MATERIALIZED VIEW mv")


def test_create_matview_resumes_after_registration_crash(spark, tmp_path):
    """A crash between the initial build and catalog registration must
    resume cleanly: the target already carries data + spec in its own
    commit, so re-running CREATE refreshes incrementally (no double
    materialization) and completes the registration."""
    cat, t = _seed(spark, tmp_path)
    ddl = (
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, COUNT(*) AS n FROM src GROUP BY day"
    )
    CAT.catalog_sql(spark, cat, ddl)
    tgt = CAT.catalog_tables(cat)["mv"]["path"]
    # simulate the crash window: registration lost, data+spec on disk
    CAT.catalog_drop_table(cat, "mv")
    # meanwhile the source moved
    up = spark.createDataFrame(
        [(100, 1, 0, 1.0)], "k long, day long, cat long, v double"
    )
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"],
                                partition_col="day")
    r = CAT.catalog_sql(spark, cat, ddl).first()
    assert r.strategy == "incremental"  # resumed, not re-materialized
    assert "mv" in CAT.catalog_tables(cat)
    got = {r.day: r.n for r in CAT.catalog_sql(
        spark, cat, "SELECT day, n FROM mv"
    ).collect()}
    assert got == {0: 10, 1: 11, 2: 10, 3: 10}


# ---------------------------------------------------------------------------
# Round 11: transparent materialized-view rewrite — a rollup SELECT
# matching a FRESH registered MV's spec answers from the view.
# ---------------------------------------------------------------------------

def _direct(spark, cat, q):
    return sorted(tuple(r) for r in CAT.catalog_sql(
        spark, cat, q, matview_rewrite=False
    ).collect())


def _rewritten(spark, cat, q):
    return CAT.catalog_sql(spark, cat, q)


def _approx_eq(rows_a, rows_b):
    assert len(rows_a) == len(rows_b)
    for ra, rb in zip(rows_a, rows_b):
        assert len(ra) == len(rb)
        for a, b in zip(ra, rb):
            if isinstance(a, float):
                assert b == pytest.approx(a, rel=1e-12), (ra, rb)
            else:
                assert a == b, (ra, rb)


def test_transparent_rewrite_answers_from_fresh_view(spark, tmp_path):
    """A rollup SELECT whose grouping matches the MV spec and whose
    aggregates are a subset (aliases free, order free, unaliased
    defaults preserved) reads the VIEW's files, result-identical to
    the direct aggregation; EXPLAIN records the decision."""
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total, MIN(v) AS lo "
        "FROM src GROUP BY day, cat",
    )
    mv_path = CAT.catalog_tables(cat)["mv"]["path"]
    # subset of aggregates, fresh aliases, reordered items
    q = ("SELECT cat, SUM(v) AS s, day AS d, COUNT(*) AS c "
         "FROM src GROUP BY cat, day")
    got = _rewritten(spark, cat, q)
    assert got.columns == ["cat", "s", "d", "c"]
    files = got.inputFiles()
    assert files and all(mv_path in f for f in files)  # reads the VIEW
    _approx_eq(sorted(tuple(r) for r in got.collect()), _direct(spark, cat, q))
    # unaliased aggregates keep Spark's default output names
    q2 = "SELECT day, cat, SUM(v), COUNT(*) FROM src GROUP BY day, cat"
    got2 = _rewritten(spark, cat, q2)
    assert got2.columns == CAT.catalog_sql(
        spark, cat, q2, matview_rewrite=False
    ).columns == ["day", "cat", "sum(v)", "count(1)"]
    _approx_eq(
        sorted(tuple(r) for r in got2.collect()), _direct(spark, cat, q2)
    )
    # EXPLAIN mirrors: fast_path records the answering view + versions
    ex = CAT.catalog_sql(spark, cat, "EXPLAIN " + q).collect()[0]
    assert ex["fast_path"].startswith("matview: answered from mv@v")
    assert ex["files_scanned"] == 0  # the SOURCE is never scanned
    # the opt-out reads the source
    off = CAT.catalog_sql(spark, cat, q, matview_rewrite=False)
    assert any(t in f for f in off.inputFiles())


def test_rewrite_freshness_gate_and_time_travel(spark, tmp_path):
    """A stale view NEVER answers: after a source commit the same query
    falls through to the direct plan (new rows visible), REFRESH makes
    the view answer again, and a time-traveled query pinned AT the
    view's watermark answers from the view even while the live source
    is ahead."""
    cat, t = _seed(spark, tmp_path)
    # two group columns: the single-pcol partition-histogram fast path
    # can't answer this shape, so the MV rewrite is what's under test
    # (refresh_rollup itself requires the partition column among the
    # groups, so a cat-only view can't exist)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n FROM src GROUP BY day, cat",
    )
    q = "SELECT day, cat, COUNT(*) AS n FROM src GROUP BY day, cat"
    mv_path = CAT.catalog_tables(cat)["mv"]["path"]
    wm = sinks.read_manifest(t)["version"]
    files = _rewritten(spark, cat, q).inputFiles()
    assert files and all(mv_path in f for f in files)

    # source advances: the view is stale — the direct plan must run and
    # SEE the new rows (the strongest possible non-rewrite proof)
    up = spark.createDataFrame([(1000, 1, 2, 5.0), (1001, 1, 2, 6.0)],
                               "k long, day long, cat long, v double")
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"],
                                partition_col="day")
    live = {(r.day, r.cat): r.n
            for r in _rewritten(spark, cat, q).collect()}
    assert live[(1, 2)] == 5  # 3 seeded + 2 new — a stale MV would say 3
    ex = CAT.catalog_sql(spark, cat, "EXPLAIN " + q).collect()[0]
    assert ex["fast_path"] is None

    # ... but pinning the query AT the watermark re-enables the view
    qv = (f"SELECT day, cat, COUNT(*) AS n FROM src VERSION AS OF {wm} "
          "GROUP BY day, cat")
    pinned = CAT.catalog_sql(spark, cat, qv)
    pf = pinned.inputFiles()
    assert pf and all(mv_path in f for f in pf)
    assert {(r.day, r.cat): r.n for r in pinned.collect()}[(1, 2)] == 3

    # REFRESH: fresh again, new counts, answered from the view
    CAT.catalog_sql(spark, cat, "REFRESH MATERIALIZED VIEW mv")
    again = _rewritten(spark, cat, q)
    af = again.inputFiles()
    assert af and all(mv_path in f for f in af)
    assert {(r.day, r.cat): r.n for r in again.collect()}[(1, 2)] == 5


def test_rewrite_conservative_refusals(spark, tmp_path):
    """Shapes the view cannot PROVABLY answer take the direct plan:
    a non-group WHERE, a coarser grouping with a non-re-aggregable
    aggregate (AVG / COUNT DISTINCT — round 12: COUNT/SUM/MIN/MAX now
    re-aggregate instead), an aggregate outside the spec, a finer
    grouping — parity with the direct plan is the refusal proof."""
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total, AVG(v) AS a, "
        "COUNT(DISTINCT k) AS d "
        "FROM src GROUP BY day, cat",
    )
    mv_path = CAT.catalog_tables(cat)["mv"]["path"]
    refusals = [
        # coarser + AVG: the view stores the final average, which cannot
        # be re-aggregated without the per-group counts
        "SELECT cat, AVG(v) AS a FROM src GROUP BY cat",
        # coarser + COUNT DISTINCT: distinct sets aren't stored
        "SELECT cat, COUNT(DISTINCT k) AS d FROM src GROUP BY cat",
        "SELECT day, cat, MAX(v) AS m FROM src GROUP BY day, cat",  # agg
        ("SELECT day, cat, COUNT(*) AS n FROM src "
         "WHERE v > 3 GROUP BY day, cat"),                   # non-group WHERE
        # an OR whose branches touch a NON-group column still refuses
        # (round 13 accepts group-column-only ORs — see the WHERE test)
        ("SELECT day, cat, COUNT(*) AS n FROM src "
         "WHERE day = 1 OR v = 2 GROUP BY day, cat"),
        ("SELECT day, cat AS c, COUNT(*) AS n FROM src "
         "GROUP BY day, cat ORDER BY cat"),    # sort key not an output
        ("SELECT day, cat, COUNT(*) AS n FROM src "
         "GROUP BY day, cat ORDER BY n NULLS LAST"),  # beyond grammar
    ]
    for q in refusals:
        got = CAT.catalog_sql(spark, cat, q)
        assert not any(mv_path in f for f in got.inputFiles()), q
        assert sorted(tuple(r) for r in got.collect()) == \
            _direct(spark, cat, q), q
    # DROP TABLE mv: the rewrite is gone with the entry
    CAT.catalog_sql(spark, cat, "DROP TABLE mv")
    q = "SELECT day, cat, COUNT(*) AS n FROM src GROUP BY day, cat"
    assert not any(
        mv_path in f for f in CAT.catalog_sql(spark, cat, q).inputFiles()
    )


def test_rewrite_coarser_grouping_reaggregates(spark, tmp_path):
    """Round-12 verdict #3: GROUP BY a strict SUBSET of the spec's group
    columns answers by RE-AGGREGATING the view — COUNT/SUM roll up by
    summing the stored per-group values, MIN/MAX by min/max (sound:
    every spec group lies entirely inside one query group). The result
    schema equals the direct plan's (re-agg casts back to the view
    column's type); a WHERE over ANY spec group column still applies
    (constant within each spec group); ORDER BY / LIMIT tails compose;
    EXPLAIN records the re-aggregation."""
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total, MIN(v) AS lo, "
        "MAX(v) AS hi, COUNT(v) AS nv "
        "FROM src GROUP BY day, cat",
    )
    mv_path = CAT.catalog_tables(cat)["mv"]["path"]
    queries = [
        "SELECT cat, COUNT(*) AS n, SUM(v) AS s FROM src GROUP BY cat",
        ("SELECT day, MIN(v) AS lo, MAX(v) AS hi, COUNT(v) AS nv "
         "FROM src GROUP BY day"),
        # WHERE over a spec group column NOT in the query's grouping
        "SELECT cat, SUM(v) AS s FROM src WHERE day >= 1 GROUP BY cat",
        ("SELECT cat, SUM(v) AS s FROM src GROUP BY cat "
         "ORDER BY s DESC LIMIT 2"),
    ]
    for q in queries:
        got = CAT.catalog_sql(spark, cat, q)
        files = got.inputFiles()
        assert files and all(mv_path in f for f in files), q
        direct = CAT.catalog_sql(spark, cat, q, matview_rewrite=False)
        assert got.columns == direct.columns, q
        assert [f.dataType for f in got.schema] == \
            [f.dataType for f in direct.schema], q
        _approx_eq(
            sorted(tuple(r) for r in got.collect()),
            sorted(tuple(r) for r in direct.collect()),
        )
    ex = CAT.catalog_sql(
        spark, cat,
        "EXPLAIN SELECT cat, SUM(v) AS s FROM src GROUP BY cat",
    ).collect()[0]
    assert "re-aggregated" in ex["fast_path"]
    assert ex["files_scanned"] == 0


def test_rewrite_avg_derived_from_sum_count(spark, tmp_path):
    """Round-13 verdict #3: AVG answers from a view storing BOTH SUM(c)
    and COUNT(c) — per view row for equal groupings, ΣSUM/ΣCOUNT for
    coarser and global ones — with the direct plan's exact dtype
    (decimal(p+4, s+4)); a group whose values are all NULL reads NULL
    (COUNT(c) = 0 never divides); EXPLAIN records the derivation; a view
    storing only the final AVG still refuses the coarse shape."""
    import decimal

    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    rows = [
        # day = 3 rows carry only NULL v → an all-NULL group per cat
        (i, i % 4, i % 3, None if i % 4 == 3 else decimal.Decimal(i) / 4)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k long, day long, cat long, v decimal(12,2)")
    sinks.merge_upsert_manifest(spark, df, t, keys=["k"], partition_col="day")
    CAT.catalog_create_table(cat, "src", t)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(v) AS nv, SUM(v) AS total "
        "FROM src GROUP BY day, cat",
    )
    mv_path = CAT.catalog_tables(cat)["mv"]["path"]
    queries = [
        "SELECT day, cat, AVG(v) AS a FROM src GROUP BY day, cat",
        "SELECT day, AVG(v) AS a, SUM(v) AS s FROM src GROUP BY day",
        "SELECT AVG(v) AS a FROM src",
        "SELECT cat, AVG(v) AS a FROM src WHERE day = 3 GROUP BY cat",
    ]
    for q in queries:
        got = CAT.catalog_sql(spark, cat, q)
        files = got.inputFiles()
        assert files and all(mv_path in f for f in files), q
        direct = CAT.catalog_sql(spark, cat, q, matview_rewrite=False)
        assert got.columns == direct.columns, q
        assert [f.dataType for f in got.schema] == \
            [f.dataType for f in direct.schema], q  # decimal(16,6), exact
        assert sorted(tuple(r) for r in got.collect()) == \
            sorted(tuple(r) for r in direct.collect()), q
    ex = CAT.catalog_sql(
        spark, cat, "EXPLAIN SELECT day, AVG(v) AS a FROM src GROUP BY day"
    ).collect()[0]
    assert "AVG derived from stored SUM/COUNT" in ex["fast_path"]

    # a view storing ONLY the final AVG cannot serve a coarser AVG —
    # and a COUNT(*) column is NOT an acceptable stand-in for COUNT(v)
    # (AVG ignores NULLs; COUNT(*) does not)
    cat2 = str(tmp_path / "cat2")
    t2 = str(tmp_path / "t2")
    sinks.merge_upsert_manifest(spark, df, t2, keys=["k"], partition_col="day")
    CAT.catalog_create_table(cat2, "src", t2)
    CAT.catalog_sql(
        spark, cat2,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total, AVG(v) AS a "
        "FROM src GROUP BY day, cat",
    )
    mv2 = CAT.catalog_tables(cat2)["mv"]["path"]
    q = "SELECT cat, AVG(v) AS a FROM src GROUP BY cat"
    got = CAT.catalog_sql(spark, cat2, q)
    assert not any(mv2 in f for f in got.inputFiles())
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in
        CAT.catalog_sql(spark, cat2, q, matview_rewrite=False).collect()
    )


def test_rewrite_refuses_approx_count_distinct(spark, tmp_path):
    """Round-11 advice: APPROX_COUNT_DISTINCT never rewrites — the
    view's stored HLL estimate can differ from the direct plan's
    independently computed one by far more than the documented last-ulp
    float drift, so the same statement's value would silently shift as
    the view goes fresh/stale. The direct plan always runs."""
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, APPROX_COUNT_DISTINCT(k) AS ad "
        "FROM src GROUP BY day, cat",
    )
    mv_path = CAT.catalog_tables(cat)["mv"]["path"]
    q = ("SELECT day, cat, APPROX_COUNT_DISTINCT(k) AS ad FROM src "
         "GROUP BY day, cat")
    got = CAT.catalog_sql(spark, cat, q)
    assert not any(mv_path in f for f in got.inputFiles())
    assert sorted(tuple(r) for r in got.collect()) == _direct(spark, cat, q)
    # ... while exact aggregates in the same view still rewrite
    q2 = "SELECT day, cat, COUNT(*) AS n FROM src GROUP BY day, cat"
    f2 = CAT.catalog_sql(spark, cat, q2).inputFiles()
    assert f2 and all(mv_path in f for f in f2)


# ---------------------------------------------------------------------------
# Property: for random rollup queries INSIDE the rewrite grammar over a
# registered MV — equal groupings AND coarser (subset) groupings with
# re-aggregable aggregates — rewrite == direct (the rewrite's contract).
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_AGGS = [
    ("COUNT(*)", "n0"), ("SUM(v)", "n1"), ("MIN(v)", "n2"),
    ("MAX(v)", "n3"), ("COUNT(DISTINCT cat)", "n4"), ("AVG(v)", "n5"),
    ("COUNT(v)", "n6"),
]


_REAGG_AGGS = [
    a for a in _AGGS
    if a[0] in (
        "COUNT(*)", "SUM(v)", "MIN(v)", "MAX(v)", "COUNT(v)",
        # round-13: AVG re-aggregates as ΣSUM/ΣCOUNT because the session
        # view stores BOTH SUM(v) and COUNT(v) — the derived-AVG path
        "AVG(v)",
    )
]


@st.composite
def _rollup_query(draw):
    mode = draw(st.sampled_from(["equal", "coarse", "global"]))
    if mode == "global":
        # no GROUP BY at all (round-12): re-aggregable aggs only, and
        # always include SUM(v) — a COUNT(*)-only or MIN/MAX-only list
        # is answered by a metadata fast path before the rewrite runs
        aggs = [("SUM(v)", "n1")] + draw(st.lists(
            st.sampled_from([a for a in _REAGG_AGGS if a[0] != "SUM(v)"]),
            max_size=3, unique=True,
        ))
        asel = [
            f"{expr} AS {alias}" if draw(st.booleans()) else expr
            for expr, alias in aggs
        ]
        order = draw(st.permutations(asel))
        return f"SELECT {', '.join(order)} FROM src"
    if mode == "coarse":
        # subset grouping: group by `cat` only (not `day`, whose
        # COUNT(*)-only shape the partition-histogram fast path answers
        # first) with only re-aggregable aggregates — the round-12
        # re-aggregation path
        groups = ["cat"]
    else:
        groups = draw(st.permutations(["day", "cat"]))
    galias = draw(st.booleans())
    gsel = [f"{g} AS g_{g}" if galias else g for g in groups]
    gby = [f"g_{g}" if galias and draw(st.booleans()) else g
           for g in groups]
    aggs = draw(st.lists(
        st.sampled_from(_REAGG_AGGS if mode == "coarse" else _AGGS),
        min_size=1, max_size=4, unique=True,
    ))
    asel = [
        f"{expr} AS {alias}" if draw(st.booleans()) else expr
        for expr, alias in aggs
    ]
    items = gsel + asel
    order = draw(st.permutations(items))
    return f"SELECT {', '.join(order)} FROM src GROUP BY {', '.join(gby)}"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_rollup_query())
def test_property_rewrite_equals_direct(spark, mv_session, q):
    cat, mv_path = mv_session
    got = CAT.catalog_sql(spark, cat, q)
    assert got.inputFiles() and all(
        mv_path in f for f in got.inputFiles()
    ), q  # inside the grammar ⇒ always answered from the view
    direct = CAT.catalog_sql(spark, cat, q, matview_rewrite=False)
    assert got.columns == direct.columns, q
    key = lambda rows: sorted(
        tuple(x if not isinstance(x, float) else round(x, 9) for x in r)
        for r in rows
    )
    _approx_eq(
        key(tuple(r) for r in got.collect()),
        key(tuple(r) for r in direct.collect()),
    )


@pytest.fixture(scope="module")
def mv_session(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mv_prop")
    cat, t = _seed(spark, tmp)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS SELECT day, cat, "
        "COUNT(*) AS c0, SUM(v) AS c1, MIN(v) AS c2, MAX(v) AS c3, "
        "COUNT(DISTINCT cat) AS c4, AVG(v) AS c5, COUNT(v) AS c6 "
        "FROM src GROUP BY day, cat",
    )
    return cat, CAT.catalog_tables(cat)["mv"]["path"]


def test_rewrite_where_over_group_columns(spark, tmp_path):
    """A WHERE whose every column is a PLAIN group column commutes with
    the grouping — conjunctions AND (round 13) one level of OR — so the
    view answers it with the clause applied verbatim as a row filter,
    the dashboard shape (`... WHERE day >= X GROUP BY day, cat`).
    Non-group columns and transform sources keep refusing (the
    refusals test)."""
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, MIN(v) AS lo "
        "FROM src GROUP BY day, cat",
    )
    mv_path = CAT.catalog_tables(cat)["mv"]["path"]
    for q in (
        ("SELECT day, cat, COUNT(*) AS n FROM src "
         "WHERE day >= 1 GROUP BY day, cat"),
        ("SELECT cat, MIN(v) AS lo, day FROM src "
         "WHERE day = 2 AND cat <> 0 GROUP BY day, cat"),
        ("SELECT day, cat, COUNT(*) AS n FROM src "
         "WHERE day IN (0, 3) GROUP BY day, cat"),
        # round 13: group-column disjunctions rewrite too — the σ/γ
        # commutation argument is about WHICH columns the predicate
        # reads, not its boolean structure
        ("SELECT day, cat, COUNT(*) AS n FROM src "
         "WHERE day = 0 OR cat = 2 GROUP BY day, cat"),
        ("SELECT day, cat, COUNT(*) AS n FROM src "
         "WHERE day >= 3 OR (day = 1 AND cat = 0) GROUP BY day, cat"),
        ("SELECT cat, COUNT(*) AS n FROM src "
         "WHERE day = 1 OR day = 2 GROUP BY cat"),  # coarse + OR
    ):
        got = CAT.catalog_sql(spark, cat, q)
        files = got.inputFiles()
        assert files and all(mv_path in f for f in files), q
        assert sorted(tuple(r) for r in got.collect()) == \
            _direct(spark, cat, q), q
    ex = CAT.catalog_sql(
        spark, cat,
        "EXPLAIN SELECT day, cat, COUNT(*) AS n FROM src "
        "WHERE day >= 1 GROUP BY day, cat",
    ).collect()[0]
    assert ex["fast_path"].startswith("matview: answered from mv@v")
    assert "WHERE applied over the view" in ex["fast_path"]
    # round-12: the WHERE also PRUNES the view's own manifest read —
    # the day-partitioned rollup opens one partition for `day = 2`,
    # not all four (the clause still applies as a row filter)
    all_files = CAT.catalog_sql(
        spark, cat, "SELECT day, cat, COUNT(*) AS n FROM src "
        "GROUP BY day, cat",
    ).inputFiles()
    one = CAT.catalog_sql(
        spark, cat, "SELECT day, cat, COUNT(*) AS n FROM src "
        "WHERE day = 2 GROUP BY day, cat",
    ).inputFiles()
    assert one and len(one) < len(all_files)
    assert all("day=2" in f or mv_path in f for f in one)


def test_rewrite_refuses_alias_shadowing_and_transform_specs(spark, tmp_path):
    """Second-review findings: (1) a group alias that names a REAL
    source column must refuse the rewrite — Spark resolves GROUP BY to
    the real column first, so the alias-matched answer would accept a
    statement the direct plan rejects; (2) transform-grouped views
    (days(ts)) never rewrite — `days(ts)` is not executable Spark SQL,
    so an answer that vanishes when the view goes stale would turn the
    same statement into an error."""
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n FROM src GROUP BY day, cat",
    )
    # `day AS cat` shadows the real column `cat`: the direct plan
    # rejects this statement (day is neither grouped-by-cat nor
    # aggregated under Spark's resolution), so the rewrite must too
    from pyspark.errors.exceptions.captured import AnalysisException

    q = "SELECT day AS cat, cat AS c2, COUNT(*) AS n FROM src GROUP BY cat, c2"
    with pytest.raises(AnalysisException):
        CAT.catalog_sql(spark, cat, q).collect()

    # a harmless alias (no shadowing) still answers
    mv_path = CAT.catalog_tables(cat)["mv"]["path"]
    ok = CAT.catalog_sql(
        spark, cat,
        "SELECT day AS d, cat AS c, COUNT(*) AS n FROM src GROUP BY d, c",
    )
    assert ok.inputFiles() and all(mv_path in f for f in ok.inputFiles())

    # transform-grouped views never transparently rewrite: the same
    # days(ts) text errors with or without a fresh view
    ev = str(tmp_path / "ev")
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 3, 1 + i % 3, i % 24), float(i))
         for i in range(30)],
        "event_id long, ts timestamp, value double",
    )
    sinks.merge_upsert_manifest(
        spark, df, ev, keys=["event_id"], partition_col="days(ts)"
    )
    CAT.catalog_create_table(cat, "ev", ev)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW daily AS "
        "SELECT days(ts) AS day, COUNT(*) AS n FROM ev GROUP BY days(ts)",
    )
    with pytest.raises(AnalysisException):
        CAT.catalog_sql(
            spark, cat,
            "SELECT days(ts) AS day, COUNT(*) AS n FROM ev "
            "GROUP BY days(ts)",
        ).collect()


def test_rewrite_order_by_limit_tails(spark, tmp_path):
    """ORDER BY / LIMIT tails whose sort keys are output columns apply
    over the rewritten frame — the top-N dashboard shape — with
    ORDERED parity against the direct plan (unique sort keys, so LIMIT
    is deterministic)."""
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total "
        "FROM src GROUP BY day, cat",
    )
    mv_path = CAT.catalog_tables(cat)["mv"]["path"]
    for q in (
        ("SELECT day, cat, COUNT(*) AS n FROM src "
         "GROUP BY day, cat ORDER BY day DESC, cat LIMIT 5"),
        ("SELECT day AS d, cat, COUNT(*) AS n FROM src "
         "GROUP BY d, cat ORDER BY d, cat"),
        ("SELECT day, cat, COUNT(*) AS n FROM src "
         "WHERE day >= 1 GROUP BY day, cat ORDER BY day, cat LIMIT 3"),
        ("SELECT day, cat, COUNT(*) AS n FROM src "
         "GROUP BY day, cat LIMIT 100"),
    ):
        got = CAT.catalog_sql(spark, cat, q)
        files = got.inputFiles()
        assert files and all(mv_path in f for f in files), q
        direct = CAT.catalog_sql(spark, cat, q, matview_rewrite=False)
        if "ORDER BY" in q:
            assert [tuple(r) for r in got.collect()] == \
                [tuple(r) for r in direct.collect()], q  # ordered parity
        else:
            assert sorted(tuple(r) for r in got.collect()) == \
                sorted(tuple(r) for r in direct.collect()), q


def test_rewrite_global_aggregate_no_group_by(spark, tmp_path):
    """Round-12: the GLOBAL shape — `SELECT <aggs> FROM src` with no
    GROUP BY (the dashboard total; SUM has no metadata fast path, so
    the direct plan is a full scan) answers by re-aggregating the whole
    view. WHERE over spec group columns composes; a filtered-to-empty
    query keeps SQL semantics (COUNT 0, SUM NULL); AVG refuses; an
    ORDER BY tail falls outside the grammar and takes the direct plan."""
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total, MIN(v) AS lo, "
        "MAX(v) AS hi, AVG(v) AS a "
        "FROM src GROUP BY day, cat",
    )
    mv_path = CAT.catalog_tables(cat)["mv"]["path"]
    rewrites = [
        ("SELECT SUM(v) AS s, COUNT(*) AS n FROM src", True),
        ("SELECT MAX(v) AS hi, MIN(v) AS lo, SUM(v) AS s FROM src", True),
        ("SELECT SUM(v) AS s FROM src WHERE day >= 2", True),
        # filtered to EMPTY: COUNT reads 0, SUM reads NULL — exactly
        # the direct plan's global-aggregate-over-nothing row. The
        # WHERE prunes EVERY view partition (round-12 view-read
        # pruning), so the rewritten plan legitimately opens no files.
        ("SELECT COUNT(*) AS n, SUM(v) AS s FROM src WHERE day = 99",
         False),
    ]
    for q, expect_files in rewrites:
        got = CAT.catalog_sql(spark, cat, q)
        files = got.inputFiles()
        assert all(mv_path in f for f in files), q
        assert bool(files) == expect_files, q
        direct = CAT.catalog_sql(spark, cat, q, matview_rewrite=False)
        assert got.columns == direct.columns, q
        assert [f.dataType for f in got.schema] == \
            [f.dataType for f in direct.schema], q
        _approx_eq(
            sorted(tuple(r) for r in got.collect()),
            sorted(tuple(r) for r in direct.collect()),
        )
    ex = CAT.catalog_sql(
        spark, cat, "EXPLAIN SELECT SUM(v) AS s FROM src"
    ).collect()[0]
    assert "re-aggregated" in ex["fast_path"]
    # outside the global grammar: AVG (not re-aggregable), an ORDER BY
    # tail, bare columns without GROUP BY — all take the direct plan
    for q in [
        "SELECT AVG(v) AS a FROM src",
        "SELECT SUM(v) AS s FROM src ORDER BY s",
    ]:
        got = CAT.catalog_sql(spark, cat, q)
        assert not any(mv_path in f for f in got.inputFiles()), q
        assert sorted(tuple(r) for r in got.collect()) == \
            _direct(spark, cat, q), q


def test_show_materialized_views(spark, tmp_path):
    """`SHOW MATERIALIZED VIEWS` lists every mv_of-marked entry with its
    spec, watermark, and LIVE freshness — the rewrite-observability
    question ('would my query answer from the view right now?') as one
    metadata-only statement."""
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total "
        "FROM src GROUP BY day, cat",
    )
    rows = CAT.catalog_sql(spark, cat, "SHOW MATERIALIZED VIEWS").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.name == "mv" and r.source == "src"
    assert r.group_cols == "day, cat"
    assert r.aggs == "n=count(*); total=sum(v)"
    assert r.fresh is True
    wm = r.consumed_source_version
    assert wm == sinks.read_manifest(t)["version"]

    # the source moves: the SAME statement now reports stale
    up = spark.createDataFrame(
        [(500, 1, 0, 1.0)], "k long, day long, cat long, v double"
    )
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"],
                                partition_col="day")
    r2 = CAT.catalog_sql(
        spark, cat, "SHOW MATERIALIZED VIEWS"
    ).collect()[0]
    assert r2.fresh is False and r2.consumed_source_version == wm
    # REFRESH restores freshness
    CAT.catalog_sql(spark, cat, "REFRESH MATERIALIZED VIEW mv")
    assert CAT.catalog_sql(
        spark, cat, "SHOW MATERIALIZED VIEWS"
    ).collect()[0].fresh is True
    # no views: empty frame with the same schema, not an error
    cat2 = str(tmp_path / "cat2")
    CAT.catalog_create_table(cat2, "src", t)
    empty = CAT.catalog_sql(spark, cat2, "SHOW MATERIALIZED VIEWS")
    assert empty.count() == 0 and "fresh" in empty.columns


def test_rewrite_having_over_output_columns(spark, tmp_path):
    """Round-13: HAVING applies as a row filter over the rewritten frame
    when every reference resolves to an OUTPUT column — alias, unaliased
    group column, or an aggregate expression matching a SELECT item
    (`HAVING COUNT(*) > 3` maps to the ("count","*") item). Composes
    with coarse re-agg, derived AVG, and ORDER/LIMIT tails; aggregates
    the SELECT doesn't carry and arithmetic beyond the predicate grammar
    fall to the direct plan."""
    cat, t = _seed(spark, tmp_path)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT day, cat, COUNT(*) AS n, SUM(v) AS total, COUNT(v) AS nv "
        "FROM src GROUP BY day, cat",
    )
    mv_path = CAT.catalog_tables(cat)["mv"]["path"]
    answered = [
        "SELECT day, cat, COUNT(*) AS n FROM src GROUP BY day, cat "
        "HAVING n > 3",
        "SELECT day, cat, COUNT(*) AS n FROM src GROUP BY day, cat "
        "HAVING COUNT(*) >= 3",
        "SELECT day, cat, SUM(v) AS s FROM src GROUP BY day, cat "
        "HAVING day >= 2",
        # coarse re-agg + HAVING over the re-aggregated value
        "SELECT cat, SUM(v) AS s FROM src GROUP BY cat HAVING s > 200",
        # one OR level and BETWEEN work (parse_predicates vocabulary)
        "SELECT day, cat, SUM(v) AS s FROM src GROUP BY day, cat "
        "HAVING s > 150 OR day = 0",
        # tails compose (total is tie-free per (day, cat) here)
        "SELECT day, cat, SUM(v) AS s FROM src GROUP BY day, cat "
        "HAVING s >= 50 ORDER BY s DESC LIMIT 3",
    ]
    for q in answered:
        got = CAT.catalog_sql(spark, cat, q)
        files = got.inputFiles()
        assert files and all(mv_path in f for f in files), q
        direct = CAT.catalog_sql(spark, cat, q, matview_rewrite=False)
        assert got.columns == direct.columns, q
        _approx_eq(
            sorted(tuple(r) for r in got.collect()),
            sorted(tuple(r) for r in direct.collect()),
        )
    refused = [
        # an aggregate the SELECT list doesn't carry
        "SELECT day, cat FROM src GROUP BY day, cat HAVING COUNT(*) > 3",
        # arithmetic beyond the predicate grammar
        "SELECT day, cat, COUNT(*) AS n FROM src GROUP BY day, cat "
        "HAVING n + 1 > 4",
    ]
    for q in refused:
        got = CAT.catalog_sql(spark, cat, q)
        assert not any(mv_path in f for f in got.inputFiles()), q
        direct = CAT.catalog_sql(spark, cat, q, matview_rewrite=False)
        assert sorted(tuple(r) for r in got.collect()) == \
            sorted(tuple(r) for r in direct.collect()), q
