"""Watermark control plane: gates, next-increment, rollover (SURVEY.md §2.H)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from f1_data_pipeline_spark.plans import incremental as I


@pytest.fixture
def store(spark, tmp_path):
    return I.WatermarkStore(spark, str(tmp_path / "meta"))


def test_watermark_empty_then_advance(store):
    wm = store.get("driver")
    assert wm.last_season_year is None and wm.total_records == 0
    store.complete("driver", 10, season_year=2025, round_number=3)
    wm = store.get("driver")
    assert (wm.last_season_year, wm.last_round_number, wm.total_records) == (2025, 3, 10)


def test_watermark_accumulates_and_survives_failure(store):
    store.complete("team", 5, season_year=2025)
    store.complete("team", 0, status="failed", error_message="boom")
    wm = store.get("team")
    assert wm.total_records == 5  # failure doesn't advance
    assert wm.last_season_year == 2025
    store.complete("team", 7, season_year=2025)
    assert store.get("team").total_records == 12


def _calendar(spark, rows):
    return spark.createDataFrame([Row(year=y, number=n) for y, n in rows])


def test_next_round_mid_season(spark):
    cal = _calendar(spark, [(2025, 1), (2025, 2), (2025, 3)])
    wm = I.Watermark("race_result", last_season_year=2025, last_round_number=1)
    assert I.next_round_to_load(wm, cal, 2025) == 2


def test_next_round_caught_up(spark):
    cal = _calendar(spark, [(2025, 1), (2025, 2)])
    wm = I.Watermark("race_result", last_season_year=2025, last_round_number=2)
    assert I.next_round_to_load(wm, cal, 2025) is None


def test_next_round_season_rollover_resets_to_1(spark):
    cal = _calendar(spark, [(2026, 1), (2026, 2)])
    wm = I.Watermark("race_result", last_season_year=2025, last_round_number=22)
    assert I.next_round_to_load(wm, cal, 2026) == 1


def test_next_round_no_calendar(spark):
    cal = _calendar(spark, [(2025, 1)])
    wm = I.Watermark("race_result")
    assert I.next_round_to_load(wm, cal, 2030) is None


def test_preseason_gate():
    assert I.should_load_preseason(I.Watermark("driver"), 2025)
    assert I.should_load_preseason(I.Watermark("driver", last_season_year=2024), 2025)
    assert not I.should_load_preseason(I.Watermark("driver", last_season_year=2025), 2025)


def _races(spark, dates):
    return spark.createDataFrame(
        [Row(id=i + 1, date=d) for i, d in enumerate(dates)], "id int, date date"
    )


def test_postrace_gate_buffer_boundary(spark):
    today = dt.date(2025, 6, 10)
    sync = dt.datetime(2025, 6, 1)
    wm = I.Watermark("race_result", last_successful_sync=sync)
    # race exactly buffer_days old → load
    assert I.should_load_postrace(wm, _races(spark, [dt.date(2025, 6, 8)]), today)
    # race too recent (1 day old) → wait
    assert not I.should_load_postrace(wm, _races(spark, [dt.date(2025, 6, 9)]), today)


def test_postrace_gate_rescan_slack(spark):
    # race the day BEFORE last sync still triggers (1-day overlap slack,
    # metadata.py:285) — safe because the sink is an idempotent upsert.
    today = dt.date(2025, 6, 10)
    wm = I.Watermark(
        "race_result", last_successful_sync=dt.datetime(2025, 6, 5, 12, 0)
    )
    assert I.should_load_postrace(wm, _races(spark, [dt.date(2025, 6, 4)]), today)
    # two days before last sync → outside slack → no load
    assert not I.should_load_postrace(wm, _races(spark, [dt.date(2025, 6, 3)]), today)


def test_postrace_gate_never_synced(spark):
    wm = I.Watermark("race_result")
    assert I.should_load_postrace(wm, _races(spark, []), dt.date(2025, 6, 10))


def test_sprint_gate_requires_sr_session(spark):
    today = dt.date(2025, 6, 10)
    races = _races(spark, [dt.date(2025, 6, 1)])
    no_sr = spark.createDataFrame([Row(round_id=1, type="R")])
    with_sr = spark.createDataFrame([Row(round_id=1, type="SR")])
    wm = I.Watermark("sprint_result", last_successful_sync=dt.datetime(2025, 5, 30))
    assert not I.should_load_sprint(wm, races, no_sr, today)
    assert I.should_load_sprint(wm, races, with_sr, today)
