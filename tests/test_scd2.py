"""SCD Type-2 dimension maintenance (operators/scd.py).

The reference overwrite-upserts dimensions (loaders/__init__.py:253-273)
and loses history; scd2_merge keeps every attribute version bounded by
[valid_from, valid_to) so point-in-time joins work. These tests pin the
classification matrix (new/changed/corrected/unchanged/late), the
interval-chain invariants, replay idempotency, partition-scoped write
cost, and business-time reads vs commit-time travel.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import scd
from f1_data_pipeline_spark.operators import sinks

SCHEMA = "team_id long, name string, country string, effective_ts timestamp"


def _t(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day, 12, 0, 0)


def _dim(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_scd2_bootstrap_change_correction_unchanged(spark, tmp_path):
    path = str(tmp_path / "teams")
    out = scd.scd2_merge(
        spark,
        _dim(spark, [(1, "Alpha", "UK", _t(1)), (2, "Beta", "DE", _t(1))]),
        path, keys=["team_id"],
    )
    assert out == {"new": 2, "changed": 0, "corrected": 0, "unchanged": 0,
                   "late_skipped": 0}
    cur = sinks.read_manifest_table(spark, path)
    assert cur.count() == 2 and cur.filter("is_current").count() == 2

    # change (rename), correction (country fix at the SAME instant),
    # unchanged, and a brand-new key — one batch
    out2 = scd.scd2_merge(
        spark,
        _dim(spark, [
            (1, "Alpha Racing", "UK", _t(5)),   # changed → close + insert
            (2, "Beta", "AT", _t(1)),            # corrected in place
            (3, "Gamma", "FR", _t(5)),           # new
        ]),
        path, keys=["team_id"],
    )
    assert out2 == {"new": 1, "changed": 1, "corrected": 1, "unchanged": 0,
                    "late_skipped": 0}
    rows = {
        (r["team_id"], r["valid_from"]): r
        for r in sinks.read_manifest_table(spark, path).collect()
    }
    assert len(rows) == 4  # 2 versions of team 1, corrected 2, new 3
    old1 = rows[(1, _t(1))]
    new1 = rows[(1, _t(5))]
    assert not old1["is_current"] and old1["valid_to"] == _t(5)
    assert old1["name"] == "Alpha"  # history preserved
    assert new1["is_current"] and new1["valid_to"] is None
    assert new1["name"] == "Alpha Racing"
    fixed2 = rows[(2, _t(1))]
    assert fixed2["country"] == "AT" and fixed2["is_current"]
    # exactly one current row per key — always
    cur = sinks.read_manifest_table(spark, path).filter("is_current")
    assert cur.groupBy("team_id").count().filter("count != 1").count() == 0

    # unchanged batch is a no-op (replay idempotency)
    before = sinks.read_manifest(path)["version"]
    out3 = scd.scd2_merge(
        spark,
        _dim(spark, [
            (1, "Alpha Racing", "UK", _t(5)),
            (2, "Beta", "AT", _t(1)),
            (3, "Gamma", "FR", _t(5)),
        ]),
        path, keys=["team_id"],
    )
    assert out3["unchanged"] == 3
    assert out3["new"] == out3["changed"] == out3["corrected"] == 0


def test_scd2_late_arrival_refused(spark, tmp_path):
    path = str(tmp_path / "teams")
    scd.scd2_merge(
        spark, _dim(spark, [(1, "Alpha", "UK", _t(10))]), path, ["team_id"]
    )
    with pytest.raises(ValueError, match="late-arriving"):
        scd.scd2_merge(
            spark, _dim(spark, [(1, "Old Alpha", "UK", _t(2))]),
            path, ["team_id"],
        )


def test_scd2_batch_dedup_and_track_cols(spark, tmp_path):
    path = str(tmp_path / "teams")
    # two rows for one key in one batch: the latest ts wins (B4 dedup)
    scd.scd2_merge(
        spark,
        _dim(spark, [(1, "Alpha", "UK", _t(1)), (1, "Alpha2", "UK", _t(3))]),
        path, keys=["team_id"],
    )
    [r] = sinks.read_manifest_table(spark, path).collect()
    assert r["name"] == "Alpha2" and r["valid_from"] == _t(3)
    # untracked attribute drift does NOT open a new version
    out = scd.scd2_merge(
        spark,
        _dim(spark, [(1, "Alpha2", "US", _t(6))]),
        path, keys=["team_id"], track_cols=["name"],
    )
    assert out["unchanged"] == 1
    assert sinks.read_manifest_table(spark, path).count() == 1


def test_scd2_at_business_time(spark, tmp_path):
    path = str(tmp_path / "teams")
    scd.scd2_merge(
        spark, _dim(spark, [(1, "Alpha", "UK", _t(1))]), path, ["team_id"]
    )
    scd.scd2_merge(
        spark, _dim(spark, [(1, "Alpha Racing", "UK", _t(10))]),
        path, ["team_id"],
    )
    scd.scd2_merge(
        spark, _dim(spark, [(1, "Alpha GP", "IT", _t(20))]),
        path, ["team_id"],
    )
    def name_at(day):
        got = scd.scd2_at(spark, path, _t(day)).collect()
        return got[0]["name"] if got else None

    assert name_at(1) == "Alpha"          # inclusive lower bound
    assert name_at(9) == "Alpha"
    assert name_at(10) == "Alpha Racing"  # exclusive upper bound
    assert name_at(25) == "Alpha GP"
    # before the first version: the key does not exist yet
    assert scd.scd2_at(spark, path, dt.datetime(2023, 12, 31)).count() == 0
    # every instant sees exactly one version — intervals never overlap
    for day in (1, 5, 10, 15, 20, 28):
        assert scd.scd2_at(spark, path, _t(day)).count() == 1


def test_scd2_partition_scoped_write(spark, tmp_path):
    """The bucket(N, key) default layout bounds the MERGE to partitions
    holding touched keys — untouched buckets keep their commit prefix."""
    path = str(tmp_path / "teams")
    base = spark.range(200).select(
        F.col("id").alias("team_id"),
        F.concat(F.lit("team"), F.col("id")).alias("name"),
        F.lit("UK").alias("country"),
        F.lit(_t(1)).alias("effective_ts"),
    )
    scd.scd2_merge(spark, base, path, keys=["team_id"])
    before = {
        k: e["prefix"]
        for k, e in sinks.read_manifest(path)["partitions"].items()
    }
    assert len(before) > 4  # really spread over buckets
    out = scd.scd2_merge(
        spark,
        _dim(spark, [(7, "team7 GP", "UK", _t(9))]),
        path, keys=["team_id"],
    )
    assert out["changed"] == 1
    after = {
        k: e["prefix"]
        for k, e in sinks.read_manifest(path)["partitions"].items()
    }
    moved = [k for k in before if after.get(k) != before[k]]
    assert len(moved) == 1  # only key 7's bucket rewrote
    # and the chain is intact
    rows = sinks.read_manifest_table(spark, path).filter("team_id = 7")
    got = {r["valid_from"]: r for r in rows.collect()}
    assert got[_t(1)]["valid_to"] == _t(9) and not got[_t(1)]["is_current"]
    assert got[_t(9)]["is_current"] and got[_t(9)]["name"] == "team7 GP"


def test_scd2_on_late_skip(spark, tmp_path):
    path = str(tmp_path / "teams")
    scd.scd2_merge(
        spark, _dim(spark, [(1, "Alpha", "UK", _t(10))]), path, ["team_id"]
    )
    out = scd.scd2_merge(
        spark,
        _dim(spark, [
            (1, "Old Alpha", "UK", _t(2)),     # late → dropped
            (2, "Beta", "DE", _t(3)),          # new → lands
        ]),
        path, ["team_id"], on_late="skip",
    )
    assert out["late_skipped"] == 1 and out["new"] == 1
    rows = {r["team_id"]: r for r in
            sinks.read_manifest_table(spark, path).collect()}
    assert rows[1]["name"] == "Alpha"  # the stale version never landed
    assert rows[2]["name"] == "Beta"
    with pytest.raises(ValueError, match="on_late"):
        scd.scd2_merge(spark, _dim(spark, []), path, ["team_id"],
                       on_late="banana")


def test_start_scd2_sink_stream(spark, tmp_path):
    """Streaming dimension maintenance end-to-end: a parquet readStream
    of attribute updates flows through start_scd2_sink; versions land
    with closed intervals, and re-running the drained stream (replay)
    changes nothing."""
    from f1_data_pipeline_spark.streaming import structured as ST

    src_dir = str(tmp_path / "in")
    tgt = str(tmp_path / "dim")
    ck = str(tmp_path / "ck")
    batch1 = _dim(spark, [(1, "Alpha", "UK", _t(1)), (2, "Beta", "DE", _t(1))])
    batch1.write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(batch1.schema).parquet(src_dir)
    q = ST.start_scd2_sink(stream, tgt, ["team_id"], ck)
    q.awaitTermination(120)
    assert sinks.read_manifest_table(spark, tgt).count() == 2

    # second file: a rename for team 1 — a new version must open
    _dim(spark, [(1, "Alpha Racing", "UK", _t(8))]).write.mode(
        "append"
    ).parquet(src_dir)
    q2 = ST.start_scd2_sink(
        spark.readStream.schema(batch1.schema).parquet(src_dir),
        tgt, ["team_id"], ck,
    )
    q2.awaitTermination(120)
    rows = {
        (r["team_id"], r["valid_from"]): r
        for r in sinks.read_manifest_table(spark, tgt).collect()
    }
    assert len(rows) == 3
    assert rows[(1, _t(1))]["valid_to"] == _t(8)
    assert rows[(1, _t(8))]["is_current"]

    # replay from a FRESH checkpoint re-feeds every file: converges
    before = sinks.read_manifest(tgt)["version"]
    q3 = ST.start_scd2_sink(
        spark.readStream.schema(batch1.schema).parquet(src_dir),
        tgt, ["team_id"], str(tmp_path / "ck2"),
    )
    q3.awaitTermination(120)
    assert sinks.read_manifest_table(spark, tgt).count() == 3
    cur = sinks.read_manifest_table(spark, tgt).filter("is_current")
    assert cur.groupBy("team_id").count().filter("count != 1").count() == 0


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_scd2_randomized_vs_reference_model(spark, tmp_path, seed):
    """Model check: a random update sequence applied through scd2_merge in
    random batch splits must equal a driver-side reference SCD2 fold of
    the same per-batch-deduped inputs — and the chain invariants (one
    current row per key, non-overlapping back-to-back intervals) hold."""
    import random

    rng = random.Random(seed)
    path = str(tmp_path / "dim")
    n_keys, n_updates = 6, 36
    # strictly increasing ts per key so no 'late' classification arises
    next_day = {k: 1 for k in range(n_keys)}
    updates = []
    for _ in range(n_updates):
        k = rng.randrange(n_keys)
        # repeat the same attrs sometimes (unchanged), change otherwise
        name = f"n{rng.randrange(3)}"
        country = f"c{rng.randrange(2)}"
        updates.append((k, name, country, _t(next_day[k])))
        next_day[k] += rng.randrange(0, 3)  # 0 → same-instant correction

    # reference model: fold batches, latest-ts row per key per batch wins
    model: dict = {}  # key -> list of [name, country, from, to, current]
    def model_apply(batch):
        best = {}
        for k, n, c, ts in batch:
            cur = best.get(k)
            if cur is None or (ts, n, c) > (cur[3], cur[1], cur[2]):
                best[k] = (k, n, c, ts)
        for k, n, c, ts in best.values():
            hist = model.setdefault(k, [])
            if not hist:
                hist.append([n, c, ts, None, True])
                continue
            top = hist[-1]
            if (top[0], top[1]) == (n, c):
                continue
            if ts == top[2]:
                top[0], top[1] = n, c
            else:
                top[3], top[4] = ts, False
                hist.append([n, c, ts, None, True])

    i = 0
    while i < len(updates):
        j = min(len(updates), i + rng.randrange(1, 9))
        batch = updates[i:j]
        model_apply(batch)
        scd.scd2_merge(spark, _dim(spark, batch), path, ["team_id"])
        i = j

    got = sorted(
        (
            (r["team_id"], r["name"], r["country"], r["valid_from"],
             r["valid_to"], r["is_current"])
            for r in sinks.read_manifest_table(spark, path).collect()
        )
    )
    want = sorted(
        (k, n, c, f, t, cur)
        for k, hist in model.items()
        for n, c, f, t, cur in hist
    )
    assert got == want
    # invariants
    per_key: dict = {}
    for k, n, c, f, t, cur in got:
        per_key.setdefault(k, []).append((f, t, cur))
    for k, ivals in per_key.items():
        ivals.sort()
        assert sum(1 for _, _, cur in ivals if cur) == 1
        assert ivals[-1][1] is None and ivals[-1][2]
        for (f1, t1, _), (f2, _, _) in zip(ivals, ivals[1:]):
            assert t1 == f2 and f1 < f2  # contiguous, non-overlapping


def test_scd2_dimension_through_sql_console(spark, tmp_path):
    """Composition: an SCD2 dimension is an ordinary manifest table, so
    the SQL console reads it — business-time predicates on valid_from
    push into the manifest read (file-stats pruning over the version
    rows), commit-time travel sees pre-merge snapshots, and EXPLAIN
    shows both decisions. The business-time filter itself is the
    scd2_at predicate written in SQL."""
    from f1_data_pipeline_spark.operators import catalog as CAT

    path = str(tmp_path / "teams")
    # history partitioned by years(valid_from)... via explicit partition:
    # use years transform so valid_from predicates prune whole years
    for yr, name in ((2020, "Alpha"), (2022, "Alpha Racing"),
                     (2024, "Alpha GP")):
        scd.scd2_merge(
            spark,
            spark.createDataFrame(
                [(1, name, "UK", dt.datetime(yr, 1, 1))], SCHEMA
            ),
            path, ["team_id"],
            partition_col="years(valid_from)",
        )
    cat = str(tmp_path / "cat")
    CAT.catalog_create_table(cat, "teams_dim", path)
    # the scd2_at predicate in SQL: dimension as of 2022-06-01. (The
    # years() pruner keeps ±1 period of session-zone slack around a
    # timestamp literal, so the cutoff sits a full period under 2024
    # for the prune to be provable.)
    q = ("SELECT name FROM teams_dim WHERE valid_from <= "
         "TIMESTAMP '2022-06-01 00:00:00'")
    got = CAT.catalog_sql(spark, cat, q)
    # pushdown pruned the 2024 partition: strictly fewer files than full
    full = CAT.catalog_sql(spark, cat, "SELECT * FROM teams_dim")
    assert len(got.inputFiles()) < len(full.inputFiles())
    assert {r["name"] for r in got.collect()} == {"Alpha", "Alpha Racing"}
    [r] = CAT.catalog_sql(
        spark, cat, "EXPLAIN " + q
    ).collect()
    assert r["pushdown"] and "valid_from" in r["pushdown"][0]
    assert r["files_scanned"] < r["files_total"]
    # commit-time travel: version 1 predates every later merge
    v1 = CAT.catalog_sql(
        spark, cat, "SELECT * FROM teams_dim VERSION AS OF 1"
    )
    assert v1.count() == 1


def test_scd2_splice_interior_history(spark, tmp_path):
    """Late-arriving versions land at their true business instant: the
    predecessor caps, the spliced version bounds at the successor, a
    redundant splice collapses, replay rewrites nothing, and co-bucketed
    untouched keys survive the by-source delete guard."""
    path = str(tmp_path / "teams")
    # key 1 has versions at day 1 and day 20; key 17 shares bucket math
    # space and must never be examined as a deletion
    scd.scd2_merge(
        spark,
        _dim(spark, [(1, "Alpha", "UK", _t(1)), (17, "Other", "FR", _t(1))]),
        path, ["team_id"],
    )
    scd.scd2_merge(
        spark, _dim(spark, [(1, "Alpha GP", "IT", _t(20))]), path,
        ["team_id"],
    )
    # the missed middle version arrives late
    out = scd.scd2_splice(
        spark, _dim(spark, [(1, "Alpha Racing", "UK", _t(10))]),
        path, ["team_id"],
    )
    assert out["touched_keys"] == 1 and out["inserted"] == 1
    rows = {
        (r["team_id"], r["valid_from"]): r
        for r in sinks.read_manifest_table(spark, path).collect()
    }
    assert len(rows) == 4
    assert rows[(1, _t(1))]["valid_to"] == _t(10)
    mid = rows[(1, _t(10))]
    assert mid["name"] == "Alpha Racing" and mid["valid_to"] == _t(20)
    assert not mid["is_current"]
    assert rows[(1, _t(20))]["is_current"]
    assert rows[(17, _t(1))]["is_current"]  # untouched neighbor intact
    # business-time reads now see the spliced era
    assert scd.scd2_at(spark, path, _t(15)).filter(
        "team_id = 1").first()["name"] == "Alpha Racing"
    # replay: identical rebuild, nothing rewritten
    again = scd.scd2_splice(
        spark, _dim(spark, [(1, "Alpha Racing", "UK", _t(10))]),
        path, ["team_id"],
    )
    assert again["partitions_rewritten"] == 0
    assert again["inserted"] == 0 and again["deleted_by_source"] == 0


def test_scd2_splice_collapse_and_correction(spark, tmp_path):
    path = str(tmp_path / "teams")
    scd.scd2_merge(
        spark, _dim(spark, [(1, "Alpha", "UK", _t(1))]), path, ["team_id"]
    )
    scd.scd2_merge(
        spark, _dim(spark, [(1, "Beta", "UK", _t(10))]), path, ["team_id"]
    )
    # a late version identical to its predecessor adds nothing
    out = scd.scd2_splice(
        spark, _dim(spark, [(1, "Alpha", "UK", _t(5))]), path, ["team_id"]
    )
    assert out["inserted"] == 0
    assert sinks.read_manifest_table(spark, path).count() == 2
    # correction at an existing interior valid_from that makes the
    # SUCCESSOR redundant: day-1 version becomes Beta → day-10 Beta
    # collapses away and day-1 runs open-ended
    out2 = scd.scd2_splice(
        spark, _dim(spark, [(1, "Beta", "UK", _t(1))]), path, ["team_id"]
    )
    assert out2["deleted_by_source"] == 1
    [r] = sinks.read_manifest_table(spark, path).collect()
    assert (r["name"], r["valid_from"], r["valid_to"], r["is_current"]) == (
        "Beta", _t(1), None, True)


def test_scd2_splice_newest_becomes_current_and_guards(spark, tmp_path):
    path = str(tmp_path / "teams")
    scd.scd2_merge(
        spark, _dim(spark, [(1, "Alpha", "UK", _t(1))]), path, ["team_id"]
    )
    # a splice NEWER than everything behaves like a normal change
    out = scd.scd2_splice(
        spark, _dim(spark, [(1, "Alpha2", "UK", _t(9))]), path, ["team_id"]
    )
    assert out["inserted"] == 1
    cur = sinks.read_manifest_table(spark, path).filter("is_current")
    assert cur.first()["name"] == "Alpha2"
    with pytest.raises(ValueError, match="single business-key"):
        scd.scd2_splice(spark, _dim(spark, []), path, ["team_id", "name"])
    with pytest.raises(FileNotFoundError):
        scd.scd2_splice(
            spark, _dim(spark, [(1, "x", "UK", _t(1))]),
            str(tmp_path / "nope"), ["team_id"],
        )


def test_scd2_splice_auto_chunks_large_backfills(spark, tmp_path):
    """A backfill touching more keys than max_keys auto-chunks by key
    hash, each chunk its own convergent commit — landing IDENTICALLY to
    an unchunked splice — while auto_chunk=False keeps the loud refusal
    and the watermark lands only with the final chunk."""
    seed = [(k, f"n{k}", "UK", _t(1)) for k in range(40)] + [
        (k, f"m{k}", "IT", _t(20)) for k in range(40)
    ]
    backfill = _dim(
        spark, [(k, f"late{k}", "FR", _t(10)) for k in range(0, 30)]
    )

    chunked = str(tmp_path / "chunked")
    scd.scd2_merge(spark, _dim(spark, [r for r in seed if r[3] == _t(1)]),
                   chunked, ["team_id"])
    scd.scd2_merge(spark, _dim(spark, [r for r in seed if r[3] == _t(20)]),
                   chunked, ["team_id"])
    v_before = sinks.read_manifest(chunked)["version"]

    with pytest.raises(ValueError, match="splice batch touches"):
        scd.scd2_splice(spark, backfill, chunked, ["team_id"], max_keys=8,
                        auto_chunk=False)

    out = scd.scd2_splice(
        spark, backfill, chunked, ["team_id"], max_keys=8,
        app_metadata={"backfill_watermark": 42},
    )
    assert out["chunks"] >= 2 and out["touched_keys"] == 30
    assert out["inserted"] == 30
    # several commits landed; watermark only with the final one
    assert sinks.read_manifest(chunked)["version"] >= v_before + out["chunks"] - 1
    assert sinks.manifest_app_metadata(chunked)["backfill_watermark"] == 42

    plain = str(tmp_path / "plain")
    scd.scd2_merge(spark, _dim(spark, [r for r in seed if r[3] == _t(1)]),
                   plain, ["team_id"])
    scd.scd2_merge(spark, _dim(spark, [r for r in seed if r[3] == _t(20)]),
                   plain, ["team_id"])
    scd.scd2_splice(spark, backfill, plain, ["team_id"])  # one pass

    rows = lambda p: sorted(  # noqa: E731
        tuple(r) for r in sinks.read_manifest_table(spark, p).collect()
    )
    assert rows(chunked) == rows(plain)

    # replay of the chunked backfill converges: nothing rewritten
    again = scd.scd2_splice(spark, backfill, chunked, ["team_id"],
                            max_keys=8)
    assert again["partitions_rewritten"] == 0 and again["inserted"] == 0
