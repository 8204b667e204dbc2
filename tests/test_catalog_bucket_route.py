"""catalog_sql routes eligible co-bucketed joins through
bucket_aligned_join (round 10): the SQL console no longer only
ADVERTISES the shuffle-free storage-partitioned join in EXPLAIN — it
executes it. Routing must be result-invisible (same rows, same output
schema as the shuffled plan), refusable shapes must fall back, and
EXPLAIN must record `taken:` with the measured bucket-pair scan.

Since round 11 the route is COST-GATED on the plan's total pair bytes
(the routed plan is measured-slower below its crossover —
`test_cost_gate_routes_only_past_byte_floor`), so the fixture-scale
tests that assert ROUTED behavior pass `bucket_joins="force"`: they
pin the routed plan's soundness, which the gate must not be allowed to
hide. Shape refusals still refuse under force — force bypasses only
the byte floor, never the soundness contract."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import catalog as CAT
from f1_data_pipeline_spark.operators import sinks


@pytest.fixture()
def star(spark, tmp_path):
    """orders-like fact + customer-like dim, co-bucketed bucket(8, key),
    plus a NON-bucketed dim for fallback checks; all cataloged."""
    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    flat_p = str(tmp_path / "flat")
    cat = str(tmp_path / "cat")
    fact = spark.range(3000).select(
        F.col("id").alias("ok"),
        (F.col("id") % 97).alias("ck"),
        (F.col("id") * 1.5).alias("total"),
        (F.col("id") % 5).alias("flag"),
    )
    sinks.merge_upsert_manifest(
        spark, fact, fact_p, keys=["ok"], partition_col="bucket(8, ck)"
    )
    dim = spark.range(97).select(
        F.col("id").alias("ck"),
        F.concat(F.lit("c"), F.col("id")).alias("name"),
        (F.col("id") % 3).alias("seg"),
    )
    sinks.merge_upsert_manifest(
        spark, dim, dim_p, keys=["ck"], partition_col="bucket(8, ck)"
    )
    sinks.merge_upsert_manifest(
        spark, dim, flat_p, keys=["ck"], partition_col="seg"
    )
    CAT.catalog_create_table(cat, "fact", fact_p)
    CAT.catalog_create_table(cat, "dim", dim_p)
    CAT.catalog_create_table(cat, "flat", flat_p)
    return cat


Q = """
    SELECT f.ok, d.name, f.total
    FROM fact f JOIN dim d ON f.ck = d.ck
    WHERE d.seg = 1 AND f.flag < 3
"""


def _rows(df):
    # None-safe ordering (outer-tail tests produce null-extended rows)
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple(
            (x is None, 0 if x is None else x) for x in t
        ),
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_routed_join_parity_and_zero_data_exchange(spark, star):
    routed = CAT.catalog_sql(spark, star, Q, bucket_joins="force")
    shuffled = CAT.catalog_sql(spark, star, Q, bucket_joins=False)
    assert routed.columns == shuffled.columns == ["ok", "name", "total"]
    assert _rows(routed) == _rows(shuffled)
    assert len(_rows(routed)) > 0
    p = _plan(routed)
    # no Spark join and no parquet scan over table data — the join runs
    # inside mapInArrow tasks; the opt-out plans the ordinary join
    assert "Join" not in p
    assert "Scan parquet" not in p and "FileScan" not in p
    assert "Join" in _plan(shuffled)


def test_routed_aggregate_group_order(spark, star):
    q = """
        SELECT d.seg AS seg, COUNT(*) AS n, SUM(f.total) AS tot
        FROM fact f JOIN dim d ON f.ck = d.ck
        GROUP BY d.seg ORDER BY seg
    """
    routed = CAT.catalog_sql(spark, star, q, bucket_joins="force")
    shuffled = CAT.catalog_sql(spark, star, q, bucket_joins=False)
    assert routed.columns == ["seg", "n", "tot"]
    assert _rows(routed) == _rows(shuffled)
    assert "Scan parquet" not in _plan(routed)


def test_routed_left_join_parity(spark, star, tmp_path):
    # fact keys 0..96 all match; add unmatched fact rows via a second
    # commit so LEFT keeps them with NULL right columns
    extra = spark.createDataFrame(
        [(90001, 970, 1.0, 0), (90002, 971, 2.0, 1)],
        "ok long, ck long, total double, flag long",
    )
    fact_p = CAT.catalog_tables(star)["fact"]["path"]
    sinks.merge_upsert_manifest(
        spark, extra, fact_p, keys=["ok"], partition_col="bucket(8, ck)"
    )
    q = """
        SELECT f.ok, d.name
        FROM fact f LEFT JOIN dim d ON f.ck = d.ck
    """
    routed = CAT.catalog_sql(spark, star, q, bucket_joins="force")
    shuffled = CAT.catalog_sql(spark, star, q, bucket_joins=False)
    assert _rows(routed) == _rows(shuffled)
    assert "Join" not in _plan(routed)
    got = {r["ok"]: r["name"] for r in routed.collect()}
    assert got[90001] is None and got[90002] is None


def test_inner_right_key_reference_rewrites_to_left(spark, star):
    # d.ck is provably equal to f.ck on inner rows — routed and allowed
    q = """
        SELECT f.ok, d.ck AS dck
        FROM fact f JOIN dim d ON f.ck = d.ck
        WHERE d.ck < 5
    """
    routed = CAT.catalog_sql(spark, star, q, bucket_joins="force")
    shuffled = CAT.catalog_sql(spark, star, q, bucket_joins=False)
    assert _rows(routed) == _rows(shuffled)
    assert "Join" not in _plan(routed)


def test_inner_residual_on_conjuncts_route(spark, star):
    """Extra ON conjuncts beside the key equality move post-join for
    INNER joins (ON ≡ WHERE) — routed, result-identical, including when
    the query also carries its own WHERE with a top-level OR (the
    original clause must be parenthesized before ANDing residuals)."""
    q = """
        SELECT f.ok, d.name FROM fact f JOIN dim d
        ON f.ck = d.ck AND f.flag = d.seg
    """
    routed = CAT.catalog_sql(spark, star, q, bucket_joins="force")
    shuffled = CAT.catalog_sql(spark, star, q, bucket_joins=False)
    assert _rows(routed) == _rows(shuffled)
    assert len(_rows(routed)) > 0
    assert "Join" not in _plan(routed)
    q2 = """
        SELECT f.ok, d.name FROM fact f JOIN dim d
        ON f.ck = d.ck AND d.seg = 1
        WHERE f.flag = 0 OR f.flag = 2
    """
    routed2 = CAT.catalog_sql(spark, star, q2, bucket_joins="force")
    shuffled2 = CAT.catalog_sql(spark, star, q2, bucket_joins=False)
    assert _rows(routed2) == _rows(shuffled2)
    assert len(_rows(routed2)) > 0
    assert "Join" not in _plan(routed2)


def test_fallback_shapes_still_correct(spark, star):
    # each of these refuses the route (shape or layout) and must still
    # return the ordinary join's answer
    fallbacks = [
        # non-bucketed dim side
        """SELECT f.ok, d.name FROM fact f JOIN flat d ON f.ck = d.ck
           WHERE d.seg = 1""",
        # star projection (output schema would change)
        "SELECT * FROM fact f JOIN dim d ON f.ck = d.ck WHERE d.seg = 2",
        # right key referenced under LEFT join (NULL on unmatched rows)
        """SELECT f.ok, d.ck FROM fact f LEFT JOIN dim d ON f.ck = d.ck""",
        # LEFT join with a residual ON conjunct (changes null-extension)
        """SELECT f.ok, d.name FROM fact f LEFT JOIN dim d
           ON f.ck = d.ck AND d.seg = 1""",
    ]
    for q in fallbacks:
        routed = CAT.catalog_sql(spark, star, q, bucket_joins="force")
        off = CAT.catalog_sql(spark, star, q, bucket_joins=False)
        assert _rows(routed) == _rows(off), q
        assert "Join" in _plan(routed), q  # fell back to the shuffled plan


def test_explain_records_taken_with_bucket_pair_scan(spark, star):
    ex = {r["table"]: r for r in CAT.catalog_sql(
        spark, star, "EXPLAIN " + Q, bucket_joins="force"
    ).collect()}
    for t in ("fact", "dim"):
        assert ex[t]["bucket_aligned"].startswith("taken:")
        assert "zero exchange" in ex[t]["bucket_aligned"]
        assert 0 < ex[t]["files_scanned"] <= ex[t]["files_total"]
    # the WHERE's sound conjuncts engage IN-BUCKET file pruning and are
    # reported per side
    assert ex["fact"]["pushdown"] == ["flag < 3"]
    assert ex["dim"]["pushdown"] == ["seg = 1"]
    # opt-out: EXPLAIN mirrors the un-routed plan (eligible note only)
    ex_off = {r["table"]: r for r in CAT.catalog_sql(
        spark, star, "EXPLAIN " + Q, bucket_joins=False
    ).collect()}
    assert ex_off["fact"]["bucket_aligned"].startswith("eligible:")
    # a refused shape reports eligible:, not taken:
    ex_star = {r["table"]: r for r in CAT.catalog_sql(
        spark, star,
        "EXPLAIN SELECT * FROM fact f JOIN dim d ON f.ck = d.ck",
    ).collect()}
    assert ex_star["fact"]["bucket_aligned"].startswith("eligible:")


def test_route_respects_time_travel_pins(spark, star):
    # dim v1 has 97 rows; v2 renames nothing but adds 3 rows — a
    # time-traveled query must join against the pinned snapshot
    dim_p = CAT.catalog_tables(star)["dim"]["path"]
    extra = spark.createDataFrame(
        [(200, "late200", 0), (201, "late201", 1), (202, "late202", 2)],
        "ck long, name string, seg long",
    )
    sinks.merge_upsert_manifest(
        spark, extra, dim_p, keys=["ck"], partition_col="bucket(8, ck)"
    )
    q_now = """
        SELECT d.ck AS k, d.name FROM fact f JOIN dim d ON f.ck = d.ck
        WHERE d.ck >= 200
    """
    assert CAT.catalog_sql(spark, star, q_now).count() == 0  # no matching fact
    q_dim_only = """
        SELECT f.ok, d.name
        FROM fact f JOIN dim VERSION AS OF 1 d ON f.ck = d.ck
    """
    pinned = CAT.catalog_sql(spark, star, q_dim_only, bucket_joins="force")
    live = CAT.catalog_sql(
        spark, star,
        "SELECT f.ok, d.name FROM fact f JOIN dim d ON f.ck = d.ck",
        bucket_joins="force",
    )
    assert "Join" not in _plan(pinned)
    assert pinned.count() == live.count()  # late keys have no fact rows


# ---------------------------------------------------------------------------
# Property: for randomly generated queries inside the routable grammar,
# the routed plan is result-identical to the shuffled plan (the router's
# whole contract — any mismatch is a soundness bug, not a perf bug).
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_COLS_F = ["f.ok", "f.total", "f.flag"]
_COLS_D = ["d.name", "d.seg", "d.ck"]
_PREDS = [
    "f.flag < 3", "d.seg = 1", "f.ok % 7 = 0", "d.seg <> 2",
    "f.total > 50", "d.name LIKE 'c1%'",
]


@st.composite
def _routable_query(draw):
    cols = draw(
        st.lists(
            st.sampled_from(_COLS_F + _COLS_D),
            min_size=1, max_size=4, unique=True,
        )
    )
    sel = ", ".join(
        f"{c} AS c{i}" for i, c in enumerate(cols)
    )
    on_extra = draw(st.lists(st.sampled_from(_PREDS), max_size=2,
                             unique=True))
    on = " AND ".join(["f.ck = d.ck"] + on_extra)
    where = draw(st.lists(st.sampled_from(_PREDS), max_size=2,
                          unique=True))
    joiner = draw(st.sampled_from([" AND ", " OR "]))
    wc = f" WHERE {joiner.join(where)}" if where else ""
    order = ", ".join(f"c{i}" for i in range(len(cols)))
    return (
        f"SELECT {sel} FROM fact f JOIN dim d ON {on}{wc} "
        f"ORDER BY {order}"
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_routable_query())
def test_property_routed_equals_shuffled(spark, star_session, q):
    routed = CAT.catalog_sql(spark, star_session, q, bucket_joins="force")
    shuffled = CAT.catalog_sql(spark, star_session, q, bucket_joins=False)
    assert _rows(routed) == _rows(shuffled), q
    assert "Join" not in _plan(routed), q


@pytest.fixture(scope="module")
def star_session(spark, tmp_path_factory):
    """Module-scoped star fixture for the property test (hypothesis
    re-invokes the test body many times; rebuilding the tables per
    example would dominate the run)."""
    tmp = tmp_path_factory.mktemp("bucket_prop")
    fact_p, dim_p, cat = str(tmp / "f"), str(tmp / "d"), str(tmp / "cat")
    fact = spark.range(2000).select(
        F.col("id").alias("ok"),
        (F.col("id") % 97).alias("ck"),
        (F.col("id") * 1.5).alias("total"),
        (F.col("id") % 5).alias("flag"),
    )
    sinks.merge_upsert_manifest(
        spark, fact, fact_p, keys=["ok"], partition_col="bucket(8, ck)"
    )
    dim = spark.range(97).select(
        F.col("id").alias("ck"),
        F.concat(F.lit("c"), F.col("id")).alias("name"),
        (F.col("id") % 3).alias("seg"),
    )
    sinks.merge_upsert_manifest(
        spark, dim, dim_p, keys=["ck"], partition_col="bucket(8, ck)"
    )
    CAT.catalog_create_table(cat, "fact", fact_p)
    CAT.catalog_create_table(cat, "dim", dim_p)
    return cat


def test_bare_identifier_guards_refuse_route(spark, star, tmp_path):
    """Round-10 self-review #2/#3: unqualified identifiers the view
    would resolve DIFFERENTLY than the original two-relation scope
    refuse the route — the bare right key in an ON residual falls back
    to the (correct) shuffled plan, and a column both sides carry keeps
    raising Spark's ambiguity error instead of silently resolving to
    the left side."""
    # bare right key in a residual ON conjunct: valid SQL (ck is the
    # join column on both sides; Spark resolves the ambiguity error) —
    # here ck IS both sides' name, so build an asymmetric pair instead
    fact_p = str(tmp_path / "f2")
    dim_p = str(tmp_path / "d2")
    cat2 = str(tmp_path / "cat2")
    fact = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 40).alias("fk"),
        (F.col("id") * 1.0).alias("v"),
    )
    sinks.merge_upsert_manifest(
        spark, fact, fact_p, keys=["k"], partition_col="bucket(4, fk)"
    )
    dim = spark.range(40).select(
        F.col("id").alias("dk"), (F.col("id") % 7).alias("attr"),
    )
    sinks.merge_upsert_manifest(
        spark, dim, dim_p, keys=["dk"], partition_col="bucket(4, dk)"
    )
    CAT.catalog_create_table(cat2, "fact2", fact_p)
    CAT.catalog_create_table(cat2, "dim2", dim_p)
    q = """
        SELECT f.k, d.attr FROM fact2 f JOIN dim2 d
        ON f.fk = d.dk AND dk > 5
    """
    routed = CAT.catalog_sql(spark, cat2, q, bucket_joins="force")
    off = CAT.catalog_sql(spark, cat2, q, bucket_joins=False)
    assert _rows(routed) == _rows(off)
    assert len(_rows(routed)) > 0
    assert "Join" in _plan(routed)  # refused the route, stayed correct

    # ambiguous both-sides column: the route refuses, so the statement
    # keeps Spark's deterministic AMBIGUOUS_REFERENCE error
    from pyspark.errors.exceptions.captured import AnalysisException

    q2 = "SELECT ck FROM fact f JOIN dim d ON f.ck = d.ck"
    with pytest.raises(AnalysisException):
        CAT.catalog_sql(spark, star, q2, bucket_joins="force")


def test_hot_bucket_route_falls_back_to_shuffled(spark, star, monkeypatch):
    """Round-10 self-review #4: the pair-size guard refuses the ROUTE,
    not the QUERY — catalog_sql catches the operator's ValueError and
    runs the shuffled plan; EXPLAIN records the refusal."""
    from f1_data_pipeline_spark.operators import bucket_join as BJ

    def _boom(*a, **k):
        raise ValueError(
            "bucket 'x' pair holds 9,999 data bytes (> max_pair_bytes 1)"
        )

    monkeypatch.setattr(BJ, "bucket_aligned_join", _boom)
    routed = CAT.catalog_sql(spark, star, Q, bucket_joins="force")
    off = CAT.catalog_sql(spark, star, Q, bucket_joins=False)
    assert _rows(routed) == _rows(off)
    assert "Join" in _plan(routed)  # fell back

    monkeypatch.setattr(BJ, "plan_bucket_pairs", _boom)
    ex = {r["table"]: r for r in CAT.catalog_sql(
        spark, star, "EXPLAIN " + Q, bucket_joins="force"
    ).collect()}
    assert ex["fact"]["bucket_aligned"].startswith("refused:")
    assert "shuffled plan used" in ex["fact"]["bucket_aligned"]


def test_routed_join_prunes_files_inside_buckets(spark, tmp_path):
    """The WHERE's sound conjuncts prune FILES inside each bucket pair
    (the scan avoidance routing would otherwise lose): two commits with
    disjoint flag values give every bucket stats-separable files; a
    flag predicate halves the fact files opened, result unchanged. For
    LEFT joins only the left side prunes."""
    fact_p, dim_p, cat = (
        str(tmp_path / "f"), str(tmp_path / "d"), str(tmp_path / "cat")
    )
    a = spark.range(1000).select(
        F.col("id").alias("ok"), (F.col("id") % 32).alias("ck"),
        F.lit(0).alias("flag"), (F.col("id") * 1.0).alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    b = spark.range(1000, 2000).select(
        F.col("id").alias("ok"), (F.col("id") % 32).alias("ck"),
        F.lit(9).alias("flag"), (F.col("id") * 1.0).alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    sinks.merge_upsert_manifest(
        spark, a.unionAll(b), fact_p, keys=["ok"],
        partition_col="bucket(4, ck)",
    )
    # flag-cluster each bucket into small files so per-file flag bounds
    # DETERMINISTICALLY separate the two populations (review finding:
    # relying on union task boundaries made the pruning assertions
    # fixture-luck)
    sinks.compact_manifest(
        spark, fact_p, target_file_bytes=16 * 1024, cluster_by=["flag"]
    )
    dim = spark.range(32).select(
        F.col("id").alias("ck"), (F.col("id") % 3).alias("seg"),
    )
    sinks.merge_upsert_manifest(
        spark, dim, dim_p, keys=["ck"], partition_col="bucket(4, ck)"
    )
    CAT.catalog_create_table(cat, "fact", fact_p)
    CAT.catalog_create_table(cat, "dim", dim_p)
    q = """
        SELECT f.ok, d.seg FROM fact f JOIN dim d ON f.ck = d.ck
        WHERE f.flag = 9
    """
    routed = CAT.catalog_sql(spark, cat, q, bucket_joins="force")
    off = CAT.catalog_sql(spark, cat, q, bucket_joins=False)
    assert _rows(routed) == _rows(off)
    assert len(_rows(routed)) == 1000
    ex = {r["table"]: r for r in CAT.catalog_sql(
        spark, cat, "EXPLAIN " + q, bucket_joins="force"
    ).collect()}
    assert ex["fact"]["bucket_aligned"].startswith("taken:")
    # commit-A files (flag=0 only) pruned by stats: at most half opened
    assert ex["fact"]["files_scanned"] < ex["fact"]["files_total"]
    assert ex["fact"]["pushdown"] == ["flag = 9"]
    # a WHERE no row satisfies plans zero pairs, returns zero rows
    none = CAT.catalog_sql(
        spark, cat,
        "SELECT f.ok FROM fact f JOIN dim d ON f.ck = d.ck "
        "WHERE f.flag = 5",
        bucket_joins="force",
    )
    assert none.count() == 0
    # LEFT join: left side still prunes, right side reads whole
    ql = """
        SELECT f.ok, d.seg FROM fact f LEFT JOIN dim d ON f.ck = d.ck
        WHERE f.flag = 9
    """
    routed_l = CAT.catalog_sql(spark, cat, ql, bucket_joins="force")
    off_l = CAT.catalog_sql(spark, cat, ql, bucket_joins=False)
    assert _rows(routed_l) == _rows(off_l)
    assert "Join" not in _plan(routed_l)


def test_cost_gate_routes_only_past_byte_floor(spark, star):
    """Round-11 verdict #1: the router COSTS the route. Below the
    pair-bytes floor (fixture tables sit far under the default ~GiB
    floor) the measured-faster shuffled plan runs and EXPLAIN records
    the floor decision; `min_route_bytes=0` re-enables the route for
    the same statement; `bucket_joins="force"` bypasses the gate.
    Result parity across all three."""
    gated = CAT.catalog_sql(spark, star, Q)
    assert "Join" in _plan(gated)  # shuffled, by the gate's measurement
    floored = CAT.catalog_sql(spark, star, Q, min_route_bytes=0)
    forced = CAT.catalog_sql(spark, star, Q, bucket_joins="force")
    assert "Join" not in _plan(floored)
    assert "Join" not in _plan(forced)
    assert _rows(gated) == _rows(floored) == _rows(forced)
    assert len(_rows(gated)) > 0

    # EXPLAIN mirrors the gated decision exactly
    ex = {r["table"]: r for r in CAT.catalog_sql(
        spark, star, "EXPLAIN " + Q
    ).collect()}
    for t in ("fact", "dim"):
        assert "below route floor" in ex[t]["bucket_aligned"]
        assert "shuffled plan used" in ex[t]["bucket_aligned"]
    # ... and the un-routed mirror still pushes/harvests as the
    # shuffled plan will run: the dim's literal predicate is pushed
    # (runtime-filter IN lists may join it — the shuffled plan's shape)
    assert "seg = 1" in ex["dim"]["pushdown"]

    # with the floor lowered, EXPLAIN mirrors the routed decision
    ex2 = {r["table"]: r for r in CAT.catalog_sql(
        spark, star, "EXPLAIN " + Q, min_route_bytes=0
    ).collect()}
    assert ex2["fact"]["bucket_aligned"].startswith("taken:")

    # the default floor scales per-core from the measured crossover
    assert CAT.default_min_route_bytes(spark) == (
        CAT.DEFAULT_MIN_ROUTE_BYTES_PER_CORE
        * spark.sparkContext.defaultParallelism
    )


def _njoins(df) -> int:
    import re as _re

    return len(_re.findall(r"\b(?:SortMergeJoin|BroadcastHashJoin"
                           r"|ShuffledHashJoin|BroadcastNestedLoopJoin)\b",
                           _plan(df)))


def test_multi_relation_pair_route(spark, star):
    """Round-11 verdict #3: a 3-relation star whose FIRST pair is
    co-bucketed routes the PAIR through bucket_aligned_join (the
    MapInArrow pair tasks appear in the plan) and joins the third
    relation as an ordinary Spark join over the view — fewer joins
    than the opt-out plan, result-identical. The third relation keeps
    pushdown + runtime-filter harvest (EXPLAIN shows both)."""
    q = """
        SELECT f.ok, d.name, x.seg AS xseg
        FROM fact f JOIN dim d ON f.ck = d.ck
        JOIN flat x ON d.ck = x.ck
        WHERE x.seg = 1 AND f.flag < 3
    """
    routed = CAT.catalog_sql(spark, star, q, bucket_joins="force")
    off = CAT.catalog_sql(spark, star, q, bucket_joins=False)
    assert routed.columns == off.columns == ["ok", "name", "xseg"]
    assert _rows(routed) == _rows(off)
    assert len(_rows(routed)) > 0
    assert "MapInArrow" in _plan(routed)  # the pair runs as X51 tasks
    assert "MapInArrow" not in _plan(off)
    assert _njoins(routed) < _njoins(off)  # the pair's join is gone

    ex = {r["table"]: r for r in CAT.catalog_sql(
        spark, star, "EXPLAIN " + q, bucket_joins="force"
    ).collect()}
    for t in ("fact", "dim"):
        assert ex[t]["bucket_aligned"].startswith("taken:")
        assert "joined shuffled over the view" in ex[t]["bucket_aligned"]
    assert ex["flat"]["bucket_aligned"] is None
    assert ex["flat"]["pushdown"] == ["seg = 1"]
    # runtime filters were harvested into the PAIR's in-bucket pruning
    # (multi-route harvests before planning; dim's ck filter may come
    # from whichever selective side the harvester picked first)
    assert ex["dim"]["runtime_filter"] is not None
    assert "keys harvested from" in ex["dim"]["runtime_filter"]

    # right-key references rewrite to the (qualified) left key; the
    # third join may reference the pair by either side's key
    q2 = """
        SELECT f.ok, x.name AS xname
        FROM fact f JOIN dim d ON f.ck = d.ck
        JOIN flat x ON d.ck = x.ck
    """
    routed2 = CAT.catalog_sql(spark, star, q2, bucket_joins="force")
    off2 = CAT.catalog_sql(spark, star, q2, bucket_joins=False)
    assert _rows(routed2) == _rows(off2)
    assert "MapInArrow" in _plan(routed2)


def test_multi_relation_outer_tail_joins_route(spark, star, tmp_path):
    """Outer TAIL joins route (the pair is a unit — `(A ⋈ B) LEFT JOIN
    C` is semantics-preserving): LEFT and RIGHT tails collapse the pair
    and stay result-identical, including unmatched rows on either
    side."""
    # make some pair keys unmatched in flat: a second flat-like dim
    # with only a third of the keys
    small_p = str(tmp_path / "small")
    small = spark.range(0, 150, 3).select(  # keys 99..147 unmatched
        F.col("id").alias("sk"), (F.col("id") % 5).alias("grade"),
    )
    sinks.merge_upsert_manifest(
        spark, small, small_p, keys=["sk"], partition_col="grade"
    )
    CAT.catalog_create_table(star, "small", small_p)
    for tail in ("LEFT JOIN", "RIGHT JOIN", "FULL JOIN"):
        # with a WHERE (exercises in-bucket pruning under the outer
        # tail) and without one (exercises the null-extension rows the
        # WHERE would otherwise filter — f.flag NULL fails `< 3`)
        for wc in (" WHERE f.flag < 3", ""):
            q = f"""
                SELECT f.ok, d.name, s.grade AS g2
                FROM fact f JOIN dim d ON f.ck = d.ck
                {tail} small s ON d.ck = s.sk{wc}
            """
            routed = CAT.catalog_sql(spark, star, q, bucket_joins="force")
            off = CAT.catalog_sql(spark, star, q, bucket_joins=False)
            assert _rows(routed) == _rows(off), (tail, wc)
            assert "MapInArrow" in _plan(routed), (tail, wc)
            if tail != "LEFT JOIN" and not wc:
                # unmatched small keys null-extend the view side
                assert any(
                    r[0] is None for r in routed.collect()
                ), tail


def test_multi_relation_refusals_fall_back(spark, star):
    """Multi-relation restrictions: an outer keyword on the PAIR
    itself or a residual ON conjunct on the pair refuses the collapse —
    the fully shuffled plan runs, results unchanged; a bare shared-key
    identifier keeps Spark's ambiguity error rather than silently
    resolving in the view."""
    fallbacks = [
        # LEFT on the PAIR itself (before the pair's ON ends)
        """SELECT f.ok, d.name FROM fact f LEFT JOIN dim d ON f.ck = d.ck
           JOIN flat x ON f.ck = x.ck""",
        # residual ON conjunct on the pair
        """SELECT f.ok, d.name FROM fact f JOIN dim d
           ON f.ck = d.ck AND d.seg = 1 JOIN flat x ON d.ck = x.ck""",
    ]
    for q in fallbacks:
        routed = CAT.catalog_sql(spark, star, q, bucket_joins="force")
        off = CAT.catalog_sql(spark, star, q, bucket_joins=False)
        assert _rows(routed) == _rows(off), q
        assert "MapInArrow" not in _plan(routed), q  # no pair collapse

    # bare shared-key name: ambiguous SQL — the route refuses, so the
    # statement keeps Spark's deterministic AMBIGUOUS_REFERENCE error
    from pyspark.errors.exceptions.captured import AnalysisException

    qa = """SELECT f.ok FROM fact f JOIN dim d ON f.ck = d.ck
            JOIN flat x ON d.ck = x.ck WHERE ck >= 0"""
    with pytest.raises(AnalysisException):
        CAT.catalog_sql(spark, star, qa, bucket_joins="force").collect()


def test_bucket_joins_param_validated(spark, star):
    """Round-11 advice: any truthy string other than the literal
    'force' ('Force', 'on') used to be silently treated as the
    cost-gated default while the caller believed they forced the
    route — the one mode switch whose misspelling changes the PHYSICAL
    plan without changing results, so it must raise loudly."""
    for bad in ("Force", "on", "FORCE", 1):
        with pytest.raises(ValueError, match="bucket_joins must be"):
            CAT.catalog_sql(spark, star, Q, bucket_joins=bad)
    # EXPLAIN goes through the same validation
    with pytest.raises(ValueError, match="bucket_joins must be"):
        CAT.catalog_sql(spark, star, "EXPLAIN " + Q, bucket_joins="on")


def test_route_sub_splits_hot_bucket(spark, tmp_path):
    """Round-12 verdict #4, the SQL surface: a routed statement whose
    pair budget (catalog_sql's new max_pair_bytes override) is exceeded
    SUB-SPLITS the hot buckets instead of falling back — results match
    the shuffled plan, and EXPLAIN records the split with UNIQUE file
    counts (the replicated small side isn't double-counted)."""
    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    cat = str(tmp_path / "cat")
    fact = spark.range(3000).select(
        F.col("id").alias("ok"),
        (F.col("id") % 97).alias("ck"),
        (F.col("id") * 1.5).alias("total"),
    ).repartition(5)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                   "false")
    try:
        sinks.merge_upsert_manifest(
            spark, fact, fact_p, keys=["ok"], partition_col="bucket(4, ck)"
        )
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
    dim = spark.range(97).select(
        F.col("id").alias("ck"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    sinks.merge_upsert_manifest(
        spark, dim, dim_p, keys=["ck"], partition_col="bucket(4, ck)"
    )
    CAT.catalog_create_table(cat, "fact", fact_p)
    CAT.catalog_create_table(cat, "dim", dim_p)
    from f1_data_pipeline_spark.operators.bucket_join import (
        plan_bucket_pairs,
    )

    whole = plan_bucket_pairs(fact_p, dim_p)
    cap = max(p["bytes"] for p in whole) - 1
    q = ("SELECT f.ok, d.name, f.total FROM fact f "
         "JOIN dim d ON f.ck = d.ck WHERE f.total >= 0")
    routed = CAT.catalog_sql(
        spark, cat, q, bucket_joins="force", max_pair_bytes=cap
    )
    off = CAT.catalog_sql(spark, cat, q, bucket_joins=False)
    assert _rows(routed) == _rows(off)
    assert "MapInArrow" in _plan(routed)  # the route DID run

    ex = {r["table"]: r for r in CAT.catalog_sql(
        spark, cat, "EXPLAIN " + q, bucket_joins="force",
        max_pair_bytes=cap,
    ).collect()}
    assert "hot-bucket sub-split" in ex["fact"]["bucket_aligned"]
    # unique-file accounting: the replicated dim side reports its real
    # file count, not one copy per sub-task
    dim_files = len(
        sinks.read_manifest_table(spark, dim_p).inputFiles()
    )
    assert ex["dim"]["files_scanned"] == dim_files
