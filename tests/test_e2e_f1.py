"""Full reference-shaped flow, end to end, over the real connectors:

pre_season: ZIP-of-CSVs → sanitize → dims (insert-ignore sinks)
post_race:  JSON API payload → from_json/explode flatten → broadcast FK
            resolution against the loaded dims → merge-upsert fact →
            watermark advance — the whole of the reference's main.py
            (/root/reference/main.py:61-237) in one orchestrated run.
"""

from __future__ import annotations

import json
import zipfile

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators.relational import (
    filter_fk_resolved,
    fk_lookup_join,
)
from f1_data_pipeline_spark.plans import pipeline as P
from f1_data_pipeline_spark.sources import csv_zip, json_api

DRIVERS_CSV = (
    "id,forename,surname,reference,abbreviation,nationality,country_code,"
    "permanent_car_number,date_of_birth\n"
    "1,Max,Verstappen,max_verstappen,VER,Dutch,NLD,1,1997-09-30\n"
    "2,Lando,Norris,norris,NOR,British,GBR,4,1999-11-13\n"
)
SEASONS_CSV = "id,year\n1,2024\n"
RACES_CSV = (
    "id,season_id,circuit_id,name,date,number,race_number\n"
    "3,1,1,Bahrain GP,2024-03-02,3,3\n"
)


def _race_doc(points_vers="25"):
    return {
        "MRData": {
            "RaceTable": {
                "Races": [
                    {
                        "season": "2024",
                        "round": "3",
                        "Results": [
                            {
                                "position": "1",
                                "positionText": "1",
                                "points": points_vers,
                                "grid": "2",
                                "laps": "57",
                                "status": "Finished",
                                "Driver": {"driverId": "max_verstappen"},
                                "Constructor": {"constructorId": "red_bull"},
                                "Time": {"millis": "5412000", "time": "1:30:12.000"},
                                "FastestLap": {
                                    "rank": "1",
                                    "lap": "44",
                                    "Time": {"time": "1:23.456"},
                                },
                            },
                            {
                                "position": "2",
                                "positionText": "2",
                                "points": "18",
                                "grid": "1",
                                "laps": "57",
                                "status": "Finished",
                                "Driver": {"driverId": "norris"},
                                "Constructor": {"constructorId": "mclaren"},
                                "Time": {"millis": "5414500", "time": None},
                                "FastestLap": None,
                            },
                            {
                                # unresolvable driver → dropped by B8 gate
                                "position": "3",
                                "positionText": "3",
                                "points": "15",
                                "grid": "3",
                                "laps": "57",
                                "status": "Finished",
                                "Driver": {"driverId": "ghost"},
                                "Constructor": {"constructorId": "nowhere"},
                                "Time": None,
                                "FastestLap": None,
                            },
                        ],
                    }
                ]
            }
        }
    }


@pytest.fixture
def f1_pipeline(spark, tmp_path):
    zp = tmp_path / "dump.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("drivers.csv", DRIVERS_CSV)
        zf.writestr("seasons.csv", SEASONS_CSV)
        zf.writestr("races.csv", RACES_CSV)

    # shared pre-season extract: ZIP read once per run (main.py:102-106 / J8)
    tables = {}

    def zip_tables(s):
        if not tables:
            tables.update(
                csv_zip.read_zip_csv(s, str(zp), str(tmp_path / "work"))
            )
        return tables

    pipe = P.Pipeline(spark, str(tmp_path / "wh"))
    pipe.register(
        P.PipelineSpec("season", P.FULL_REFRESH, lambda s, **kw: zip_tables(s)["season"])
    )
    pipe.register(
        P.PipelineSpec("driver", P.FULL_REFRESH, lambda s, **kw: zip_tables(s)["driver"])
    )
    pipe.register(
        P.PipelineSpec(
            "round",
            P.FULL_REFRESH,
            lambda s, **kw: zip_tables(s)["round"],
            dependencies=("season",),
        )
    )

    def race_result_extract(s, payload=None, **kw):
        flat = json_api.flatten_race_results(
            json_api.payloads_to_df(s, [payload or _race_doc()])
        )
        driver = s.read.parquet(pipe.table_path("driver")).select(
            F.col("id").alias("driver_id"), F.col("reference").alias("driver_reference")
        )
        season = s.read.parquet(pipe.table_path("season")).select(
            F.col("id").alias("season_id"), F.col("year").alias("season_year")
        )
        rnd = s.read.parquet(pipe.table_path("round")).select(
            F.col("id").alias("round_id"),
            F.col("season_id").alias("r_season_id"),
            F.col("number").alias("round_number"),
        )
        resolved = fk_lookup_join(
            fk_lookup_join(flat, driver, "driver_reference"), season, "season_year"
        )
        resolved = fk_lookup_join(
            resolved,
            rnd,
            (F.col("r_season_id") == F.col("season_id"))
            & (rnd["round_number"] == resolved["round_number"]),
        )
        return filter_fk_resolved(
            resolved, ["driver_id", "season_id", "round_id"]
        ).select(
            "season_id", "round_id", "driver_id", "position", "position_text",
            "points", "grid_position", "laps_completed", "status",
            "race_time_milliseconds", "fastest_lap_milliseconds",
        )

    pipe.register(
        P.PipelineSpec(
            "race_result",
            P.INCREMENTAL,
            race_result_extract,
            dependencies=("round", "driver"),
        )
    )
    return pipe


def test_pre_season_then_post_race(spark, f1_pipeline):
    pre = [f1_pipeline.run_table(t) for t in ("season", "driver", "round")]
    assert all(r.status == "success" for r in pre)

    drivers = spark.read.parquet(f1_pipeline.table_path("driver"))
    assert drivers.count() == 2
    assert dict(drivers.dtypes)["date_of_birth"] == "date"

    post = f1_pipeline.run_table("race_result")
    assert post.status == "success"
    rr = spark.read.parquet(f1_pipeline.table_path("race_result"))
    rows = {r["driver_id"]: r for r in rr.collect()}
    # ghost driver dropped by the FK-resolution gate (B8)
    assert set(rows) == {1, 2}
    assert rows[1]["fastest_lap_milliseconds"] == 83456
    assert rows[1]["round_id"] == 3 and rows[1]["season_id"] == 1
    assert float(rows[1]["points"]) == 25.0


def test_post_race_upsert_revises_points(spark, f1_pipeline):
    for t in ("season", "driver", "round"):
        f1_pipeline.run_table(t)
    f1_pipeline.run_table("race_result")
    # a stewards' decision revises the result → re-run with new payload
    f1_pipeline.run_table("race_result", payload=_race_doc(points_vers="26"))
    rr = spark.read.parquet(f1_pipeline.table_path("race_result"))
    assert rr.count() == 2  # upsert, not append
    vers = rr.filter(F.col("driver_id") == 1).collect()[0]
    assert float(vers["points"]) == 26.0
