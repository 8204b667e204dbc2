"""End-to-end pipeline orchestration over F1-shaped micro-fixtures
(FIXTURES.md §B): pre_season dims then post_race facts, with watermark
gating, failure isolation and idempotent re-runs."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from f1_data_pipeline_spark.plans import pipeline as P
from f1_data_pipeline_spark.plans.incremental import should_load_preseason


def _season_extract(spark, **kw):
    return spark.createDataFrame([Row(id=1, year=2025)])


def _round_extract(spark, **kw):
    return spark.createDataFrame(
        [
            Row(id=1, season_id=1, number=1, name="R1"),
            Row(id=2, season_id=1, number=2, name="R2"),
        ]
    )


def _race_result_extract(spark, round_num=1, **kw):
    return spark.createDataFrame(
        [
            Row(season_id=1, round_id=round_num, driver_id=d, points=float(p))
            for d, p in [(1, 25), (2, 18)]
        ]
    )


@pytest.fixture
def pipe(spark, tmp_path):
    p = P.Pipeline(spark, str(tmp_path / "wh"))
    p.register(P.PipelineSpec("season", P.FULL_REFRESH, _season_extract))
    p.register(
        P.PipelineSpec(
            "round", P.FULL_REFRESH, _round_extract, dependencies=("season",)
        )
    )
    p.register(
        P.PipelineSpec(
            "race_result",
            P.INCREMENTAL,
            _race_result_extract,
            dependencies=("round",),
        )
    )
    return p


def test_pre_season_loads_dims_in_order(pipe, spark):
    results = [r for r in pipe.run_mode("pre_season") if r.table in ("season", "round")]
    assert [r.status for r in results] == ["success", "success"]
    assert spark.read.parquet(pipe.table_path("round")).count() == 2


def test_preseason_gate_skips_second_run(pipe):
    pipe.run_mode("pre_season", year=2025)
    gate = lambda t: should_load_preseason(pipe.store.get(t), 2025)  # noqa: E731
    second = pipe.run_mode("pre_season", gate=gate, year=2025)
    assert all(r.status == "skipped" for r in second if r.table in ("season", "round"))


def test_post_race_incremental_rounds(pipe, spark):
    pipe.run_mode("pre_season", year=2025)
    pipe.run_table("race_result", year=2025, round_num=1)
    pipe.run_table("race_result", year=2025, round_num=2)
    df = spark.read.parquet(pipe.table_path("race_result"))
    assert df.count() == 4  # 2 drivers × 2 rounds
    wm = pipe.store.get("race_result")
    assert (wm.last_season_year, wm.last_round_number) == (2025, 2)


def test_post_race_rerun_is_idempotent(pipe, spark):
    pipe.run_table("race_result", year=2025, round_num=1)
    pipe.run_table("race_result", year=2025, round_num=1)
    assert spark.read.parquet(pipe.table_path("race_result")).count() == 2


def test_failed_table_isolates_and_skips_dependents(spark, tmp_path):
    p = P.Pipeline(spark, str(tmp_path / "wh"))

    def boom(spark, **kw):
        raise RuntimeError("extract failed")

    p.register(P.PipelineSpec("season", P.FULL_REFRESH, boom))
    p.register(
        P.PipelineSpec("round", P.FULL_REFRESH, _round_extract, dependencies=("season",))
    )
    results = {r.table: r for r in p.run_mode("pre_season")}
    assert results["season"].status == "failed"
    assert results["round"].status == "skipped"
    assert P.Pipeline.summarize(list(results.values()))["failed"] == 1


def test_run_log_records_every_load(pipe, spark):
    pipe.run_table("race_result", year=2025, round_num=1)
    pipe.run_table("race_result", year=2025, round_num=2)
    log = spark.read.parquet(f"{pipe.warehouse_dir}/_meta/sync_log")
    assert log.filter("entity_name = 'race_result'").count() == 2
    assert log.filter("status = 'success'").count() == 2
