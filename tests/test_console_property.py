"""Whole-console soundness property: for random single-SELECT queries
over cataloged tables — mixed join types, WHERE conjunctions including
the null-accepting IS NULL shapes, aggregates — `catalog_sql` (default,
with every optimization it chooses: literal pushdown, runtime join
filters, metadata fast paths, the cost-gated bucket route) and
`catalog_sql(bucket_joins="force", min_route_bytes=0)` must both equal
plain `spark.sql` over UNPRUNED registered views of the same tables.
The ground truth applies no manifest-level optimization at all, so any
divergence is a planner soundness bug by construction (this is the
test shape that would have caught the round-11 IS-NULL-under-outer-join
pushdown bug directly)."""
from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import catalog as CAT
from f1_data_pipeline_spark.operators import sinks


@pytest.fixture(scope="module")
def console(spark, tmp_path_factory):
    """A co-bucketed fact/dim pair (so the route can engage) with NULLs
    sprinkled into non-key columns on both sides, cataloged AND
    registered as plain views for the ground truth."""
    tmp = tmp_path_factory.mktemp("console_prop")
    fact_p, dim_p, cat = str(tmp / "f"), str(tmp / "d"), str(tmp / "cat")
    fact = spark.range(600).select(
        F.col("id").alias("k"),
        (F.col("id") % 37).alias("ck"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id") * 1.5).alias("v"),
        (F.col("id") % 4).alias("flag"),
    )
    sinks.merge_upsert_manifest(
        spark, fact, fact_p, keys=["k"], partition_col="bucket(4, ck)"
    )
    # dim keys 0..29 only: fact keys 30..36 are UNMATCHED (the outer
    # joins' null-extension paths all exercise)
    dim = spark.range(30).select(
        F.col("id").alias("ck"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.concat(F.lit("c"), F.col("id"))).alias("name"),
        (F.col("id") % 3).alias("seg"),
    )
    sinks.merge_upsert_manifest(
        spark, dim, dim_p, keys=["ck"], partition_col="bucket(4, ck)"
    )
    # a third, non-bucketed relation for multi-relation tails; keys
    # 20..49 so both matched and unmatched rows exist on every side
    ext_p = str(tmp / "e")
    ext = spark.range(20, 50).select(
        F.col("id").alias("ek"),
        (F.col("id") % 2).alias("grade"),
    )
    sinks.merge_upsert_manifest(
        spark, ext, ext_p, keys=["ek"], partition_col="grade"
    )
    CAT.catalog_create_table(cat, "pf", fact_p)
    CAT.catalog_create_table(cat, "pd", dim_p)
    CAT.catalog_create_table(cat, "pe", ext_p)
    # ground truth: plain snapshot views, no manifest-level pruning
    sinks.read_manifest_table(spark, fact_p).createOrReplaceTempView(
        "gt_pf"
    )
    sinks.read_manifest_table(spark, dim_p).createOrReplaceTempView(
        "gt_pd"
    )
    sinks.read_manifest_table(spark, ext_p).createOrReplaceTempView(
        "gt_pe"
    )
    return cat


_JOINS = ["JOIN", "LEFT JOIN", "RIGHT JOIN"]
_PREDS = [
    "d.name IS NULL", "d.name IS NOT NULL", "f.v IS NULL",
    "f.v IS NOT NULL", "f.flag < 2", "d.seg = 1", "f.v > 100",
    "f.ck IN (1, 2, 3, 33)", "d.seg <> 0", "f.flag BETWEEN 1 AND 2",
    # round-13: parenthesized disjunctions AS conjuncts — the paren-OR
    # pushdown shape (same-column, mixed-column, and a cross-table one
    # the extractor must refuse); the top-level " OR " glue below
    # additionally exercises whole-clause disjunctions every run
    "(f.flag = 1 OR f.flag = 3)",
    "(f.ck = 2 OR f.v > 500)",
    "(f.flag = 1 OR d.seg = 2)",
]
_COLS = ["f.k", "f.ck", "f.v", "f.flag", "d.name", "d.seg"]


@st.composite
def _console_query(draw):
    cols = draw(st.lists(st.sampled_from(_COLS), min_size=1, max_size=4,
                         unique=True))
    sel = ", ".join(f"{c} AS c{i}" for i, c in enumerate(cols))
    join = draw(st.sampled_from(_JOINS))
    preds = draw(st.lists(st.sampled_from(_PREDS), max_size=3,
                          unique=True))
    glue = draw(st.sampled_from([" AND ", " OR "])) if len(preds) > 1 \
        else " AND "
    wc = f" WHERE {glue.join(preds)}" if preds else ""
    return (
        f"SELECT {sel} FROM pf f {join} pd d ON f.ck = d.ck{wc}",
        f"SELECT {sel} FROM gt_pf f {join} gt_pd d ON f.ck = d.ck{wc}",
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple(
            (x is None, 0 if x is None else x) for x in t
        ),
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_console_query())
def test_property_console_equals_unpruned_ground_truth(spark, console, q):
    cat_q, gt_q = q
    want = _rows(spark.sql(gt_q))
    got = _rows(CAT.catalog_sql(spark, console, cat_q))
    assert got == want, cat_q
    # forcing the bucket route (floor off) must not change results
    # either — inner routes execute, outer/banned shapes fall back
    forced = _rows(CAT.catalog_sql(
        spark, console, cat_q, bucket_joins="force", min_route_bytes=0
    ))
    assert forced == want, cat_q


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=st.lists(st.sampled_from(_PREDS[:7]), min_size=0, max_size=2,
                  unique=True),
    agg=st.sampled_from(
        ["COUNT(*) AS n", "COUNT(f.v) AS n", "MIN(f.flag) AS n",
         "SUM(f.flag) AS n"]
    ),
)
def test_property_console_aggregates_equal_ground_truth(
    spark, console, pred, agg
):
    """Single-table aggregate shapes: the metadata fast paths (COUNT(*),
    COUNT(col), MIN/MAX, histograms) must agree with the unpruned scan
    for every WHERE they claim to answer — and for the ones they
    decline, the ordinary pruned plan must too."""
    f_pred = [p.replace("f.", "") for p in pred if p.startswith("f.")]
    wc = f" WHERE {' AND '.join(f_pred)}" if f_pred else ""
    cat_q = f"SELECT {agg.replace('f.', '')} FROM pf{wc}"
    gt_q = f"SELECT {agg.replace('f.', '')} FROM gt_pf{wc}"
    got = _rows(CAT.catalog_sql(spark, console, cat_q))
    want = _rows(spark.sql(gt_q))
    assert got == want, cat_q


_TAILS = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]
_PREDS3 = _PREDS + ["e.grade = 1", "e.grade IS NULL"]
_COLS3 = _COLS + ["e.ek", "e.grade"]


@st.composite
def _star_query(draw):
    cols = draw(st.lists(st.sampled_from(_COLS3), min_size=1, max_size=4,
                         unique=True))
    sel = ", ".join(f"{c} AS c{i}" for i, c in enumerate(cols))
    tail = draw(st.sampled_from(_TAILS))
    on3 = draw(st.sampled_from(["d.ck = e.ek", "f.ck = e.ek"]))
    preds = draw(st.lists(st.sampled_from(_PREDS3), max_size=2,
                          unique=True))
    wc = f" WHERE {' AND '.join(preds)}" if preds else ""
    body = (f"SELECT {sel} FROM {{pf}} f JOIN {{pd}} d ON f.ck = d.ck "
            f"{tail} {{pe}} e ON {on3}{wc}")
    return (
        body.format(pf="pf", pd="pd", pe="pe"),
        body.format(pf="gt_pf", pd="gt_pd", pe="gt_pe"),
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_star_query())
def test_property_star_console_equals_unpruned_ground_truth(
    spark, console, q
):
    """Three-relation stars: the pair route (forced and gated), the
    outer TAIL joins over the collapsed view, runtime-filter harvest,
    and the IS-NULL-under-outer-join pushdown rule must all agree with
    plain spark.sql over unpruned views."""
    cat_q, gt_q = q
    want = _rows(spark.sql(gt_q))
    got = _rows(CAT.catalog_sql(spark, console, cat_q))
    assert got == want, cat_q
    forced = _rows(CAT.catalog_sql(
        spark, console, cat_q, bucket_joins="force", min_route_bytes=0
    ))
    assert forced == want, cat_q


# ---------------------------------------------------------------------------
# Round 12 (verdict #8): the same unpruned-ground-truth discipline over the
# MATVIEW REWRITE and the METADATA FAST PATHS — random rollup specs and
# COUNT/MIN/MAX shapes against a table with MoR deletes, restated keys
# (overlapping file bounds), and NULLs. Grammar-matching rollups answer
# from the registered view (equal grouping = projection, subset grouping =
# re-aggregation), fast-path shapes answer from metadata, everything else
# takes the pruned direct plan — ALL of them must equal plain spark.sql
# over an unpruned snapshot view. This is the suite that catches the next
# IS-NULL-class planner bug before it ships.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mv_console(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mv_prop2")
    t, cat = str(tmp / "pm"), str(tmp / "cat")
    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("flag"),
        (F.col("id") % 3).alias("seg"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise((F.col("id") * 7 % 100).cast("decimal(12,2)"))
        .alias("dv"),
    )
    sinks.merge_upsert_manifest(spark, df, t, keys=["k"],
                                partition_col="flag")
    # restate a slice (second files per partition, overlapping bounds)…
    up = spark.range(100, 160).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("flag"),
        ((F.col("id") + 1) % 3).alias("seg"),
        (F.col("id") % 90).cast("decimal(12,2)").alias("dv"),
    )
    sinks.merge_upsert_manifest(spark, up, t, keys=["k"],
                                partition_col="flag")
    # …then MoR position deletes: every downstream answer (view refresh,
    # metadata fast paths, pruned scans) must see through the delete set
    sinks.delete_manifest_rows(spark, t, [("k", "<", 40)], mode="mor",
                               mor_threshold=1.0)
    CAT.catalog_create_table(cat, "pm", t)
    # the view is created AFTER every mutation, so it is FRESH: grammar-
    # matching rollups rewrite; the exact decimal measure keeps stored
    # values bit-identical to the direct plan's (no double-sum drift)
    CAT.catalog_sql(
        spark, cat,
        "CREATE MATERIALIZED VIEW pm_mv AS "
        "SELECT flag, seg, COUNT(*) AS n, COUNT(dv) AS nv, "
        "SUM(dv) AS s, MIN(dv) AS lo, MAX(dv) AS hi, AVG(dv) AS a "
        "FROM pm GROUP BY flag, seg",
    )
    sinks.read_manifest_table(spark, t).createOrReplaceTempView("gt_pm")
    return cat


_MV_AGGS = [
    "COUNT(*) AS a0", "COUNT(dv) AS a1", "SUM(dv) AS a2",
    "MIN(dv) AS a3", "MAX(dv) AS a4", "AVG(dv) AS a5",
]
_MV_WHERES = [
    None, "flag >= 2", "seg = 1", "flag IN (1, 3)",
    "flag = 2 AND seg <> 0", "dv > 50",
]


@st.composite
def _rollup_shape(draw):
    groups = draw(st.sampled_from(
        [["flag", "seg"], ["seg", "flag"], ["seg"], ["flag"]]
    ))
    aggs = draw(st.lists(st.sampled_from(_MV_AGGS), min_size=1,
                         max_size=3, unique=True))
    w = draw(st.sampled_from(_MV_WHERES))
    wc = f" WHERE {w}" if w else ""
    sel = ", ".join(groups + aggs)
    gb = ", ".join(groups)
    return (
        f"SELECT {sel} FROM pm{wc} GROUP BY {gb}",
        f"SELECT {sel} FROM gt_pm{wc} GROUP BY {gb}",
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_rollup_shape())
def test_property_rollups_equal_unpruned_ground_truth(
    spark, mv_console, q
):
    cat_q, gt_q = q
    want = _rows(spark.sql(gt_q))
    got = _rows(CAT.catalog_sql(spark, mv_console, cat_q))
    assert got == want, cat_q
    # the rewrite opt-out (always the pruned direct plan) must agree too
    off = _rows(CAT.catalog_sql(
        spark, mv_console, cat_q, matview_rewrite=False
    ))
    assert off == want, cat_q


_META_AGGS = [
    "COUNT(*) AS n", "COUNT(dv) AS n", "MIN(dv) AS n", "MAX(dv) AS n",
    "MIN(k) AS n", "MAX(k) AS n", "COUNT(k) AS n",
    "MIN(k) AS n1, MAX(dv) AS n2, COUNT(*) AS n3",
]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    agg=st.sampled_from(_META_AGGS),
    w=st.sampled_from(_MV_WHERES),
    grouped=st.booleans(),
)
def test_property_metadata_fast_paths_see_mor_deletes(
    spark, mv_console, agg, w, grouped
):
    """COUNT(*)/COUNT(col)/MIN/MAX select lists and the partition-
    histogram GROUP BY shape over a table WITH MoR deletes: every fast
    path either answers exactly (recorded rows − recorded delete rows)
    or declines to the real plan — never a stale pre-delete number."""
    wc = f" WHERE {w}" if w else ""
    if grouped:
        cat_q = f"SELECT flag, COUNT(*) AS n FROM pm{wc} GROUP BY flag"
        gt_q = f"SELECT flag, COUNT(*) AS n FROM gt_pm{wc} GROUP BY flag"
    else:
        cat_q = f"SELECT {agg} FROM pm{wc}"
        gt_q = f"SELECT {agg} FROM gt_pm{wc}"
    got = _rows(CAT.catalog_sql(spark, mv_console, cat_q))
    want = _rows(spark.sql(gt_q))
    assert got == want, cat_q


# ---------------------------------------------------------------------------
# round-13 verdict #2: OR pushdown — deterministic pruning-count proof
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def or_console(spark, tmp_path_factory):
    """An identity-partitioned table where each day's files carry tight
    day bounds, so a pushed disjunction measurably prunes files."""
    tmp = tmp_path_factory.mktemp("or_prop")
    t, d, cat = str(tmp / "t"), str(tmp / "d"), str(tmp / "cat")
    df = spark.range(200).select(
        F.col("id").alias("k"),
        F.concat(F.lit("day"), (F.col("id") % 8).cast("string")).alias("day"),
        (F.col("id") % 5).alias("cat"),
        (F.col("id") * 2.0).alias("v"),
    )
    sinks.merge_upsert_manifest(spark, df, t, keys=["k"], partition_col="day")
    dim = spark.range(5).select(
        F.col("id").alias("cat"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("cname"),
    )
    sinks.merge_upsert_manifest(
        spark, dim, d, keys=["cat"], partition_col="cat"
    )
    CAT.catalog_create_table(cat, "t", t)
    CAT.catalog_create_table(cat, "d", d)
    sinks.read_manifest_table(spark, t).createOrReplaceTempView("gt_or_t")
    return cat


def test_or_pushdown_prunes_files_and_records_explain(spark, or_console):
    """The most common ad-hoc shape after AND — `WHERE day = A OR
    day = B` — now prunes at the file level: a file survives only when
    SOME branch's bounds admit it. EXPLAIN records the pushed
    disjunction; results stay identical to the unpruned ground truth."""
    cases = [
        # (query, expected files_scanned of 8)
        ("SELECT k, day FROM t WHERE day = 'day1' OR day = 'day2'", 2),
        # branch conjunctions: (A AND x) OR (B AND y)
        ("SELECT k FROM t WHERE (day = 'day1' AND v > 10) "
         "OR (day = 'day3' AND k < 90)", 2),
        # a parenthesized OR as one AND conjunct
        ("SELECT k FROM t WHERE v >= 0 AND (day = 'day1' OR day = 'day2')",
         2),
        # mixed-column disjunction: pushes, but k >= 190 overlaps every
        # file here — pruning is bounds-dependent, soundness is not
        ("SELECT k FROM t WHERE day = 'day1' OR k >= 190", 8),
    ]
    for q, want_files in cases:
        ex = CAT.catalog_sql(spark, or_console, "EXPLAIN " + q).collect()
        r = next(x for x in ex if x.table == "t")
        assert r.pushdown and any("OR" in p for p in r.pushdown), q
        assert r.files_scanned == want_files, (q, r.files_scanned)
        got = _rows(CAT.catalog_sql(spark, or_console, q))
        want = _rows(spark.sql(q.replace("FROM t", "FROM gt_or_t")))
        assert got == want, q


def test_or_pushdown_refuses_cross_table_and_unsupported(spark, or_console):
    """Full-disable posture: a disjunction with branches on different
    tables (or any unsupported branch) pushes NOTHING — no conjunct of
    such a clause is individually implied."""
    q = ("SELECT t.k FROM t JOIN d ON t.cat = d.cat "
         "WHERE t.day = 'day1' OR d.cname = 'c3'")
    ex = CAT.catalog_sql(spark, or_console, "EXPLAIN " + q).collect()
    for r in ex:
        assert not r.pushdown, (r.table, list(r.pushdown))
        assert r.files_scanned == r.files_total, r.table
    # unsupported branch (function): nothing pushed either
    q2 = "SELECT k FROM t WHERE day = 'day1' OR length(day) > 99"
    ex2 = CAT.catalog_sql(spark, or_console, "EXPLAIN " + q2).collect()
    r2 = next(x for x in ex2 if x.table == "t")
    assert not r2.pushdown
    # and the string-literal guard: a quoted value containing OR is ONE
    # predicate, not a disjunction (round-13 literal fix)
    q3 = "SELECT k FROM t WHERE day = 'day1 OR day2'"
    got = _rows(CAT.catalog_sql(spark, or_console, q3))
    assert got == _rows(spark.sql(q3.replace("FROM t", "FROM gt_or_t")))


def test_or_pushdown_transform_partition_prune(spark, or_console):
    """On a transform-partitioned dim (identity here is pruned by file
    stats; `cat`-partitioned dim by its key), a same-column OR of
    equalities prunes partitions exactly like the equivalent IN."""
    q = "SELECT cat FROM d WHERE cat = 1 OR cat = 3"
    ex = CAT.catalog_sql(spark, or_console, "EXPLAIN " + q).collect()
    r = next(x for x in ex if x.table == "d")
    assert r.files_scanned == 2, (r.files_scanned, r.files_total)
    assert sorted(
        t[0] for t in CAT.catalog_sql(spark, or_console, q).collect()
    ) == [1, 3]


def test_set_operand_pushdown(spark, or_console):
    """Round-13: UNION/EXCEPT/INTERSECT statements get PER-OPERAND
    pushdown — each depth-0 operand is its own SELECT scope, so a table
    read by exactly one operand takes that operand's WHERE (OR shapes
    included); a table read by several operands stays un-pruned (one
    internal view serves them all), and aliases resolve per-operand."""
    sinks.read_manifest_table(
        spark, CAT.catalog_tables(or_console)["d"]["path"]
    ).createOrReplaceTempView("gt_or_d")
    q = ("SELECT k FROM t WHERE day = 'day1' OR day = 'day3' "
         "UNION ALL SELECT cat FROM d WHERE cat = 2")
    ex = {r.table: r for r in
          CAT.catalog_sql(spark, or_console, "EXPLAIN " + q).collect()}
    assert ex["t"].files_scanned == 2 and ex["t"].files_total == 8
    assert ex["d"].files_scanned == 1 and ex["d"].files_total == 5
    got = _rows(CAT.catalog_sql(spark, or_console, q))
    want = _rows(spark.sql(
        q.replace("FROM t", "FROM gt_or_t").replace("FROM d", "FROM gt_or_d")
    ))
    assert got == want

    # the same table in two operands: NO pushdown (the shared view must
    # satisfy both operands' reads)
    q2 = ("SELECT k FROM t WHERE day = 'day1' "
          "UNION ALL SELECT k FROM t WHERE day = 'day2'")
    ex2 = {r.table: r for r in
           CAT.catalog_sql(spark, or_console, "EXPLAIN " + q2).collect()}
    assert not ex2["t"].pushdown
    assert ex2["t"].files_scanned == ex2["t"].files_total
    assert _rows(CAT.catalog_sql(spark, or_console, q2)) == _rows(
        spark.sql(q2.replace("FROM t", "FROM gt_or_t"))
    )

    # one alias naming DIFFERENT tables across operands resolves
    # per-operand — segment-1's `x` must never push into `d`
    q3 = ("SELECT x.k FROM t x WHERE x.day = 'day1' "
          "UNION ALL SELECT x.cat FROM d x WHERE x.cat = 3")
    ex3 = {r.table: r for r in
           CAT.catalog_sql(spark, or_console, "EXPLAIN " + q3).collect()}
    assert list(ex3["t"].pushdown) == ["day = 'day1'"]
    assert list(ex3["d"].pushdown) == ["cat = 3"]
    assert _rows(CAT.catalog_sql(spark, or_console, q3)) == _rows(
        spark.sql(q3.replace("FROM t", "FROM gt_or_t")
                  .replace("FROM d", "FROM gt_or_d"))
    )
