"""Source connectors: HTTP JSON retry contract, payload flattening, the
endpoint-partitioned Python Data Source, and the ZIP-of-CSVs bulk path.

All offline — transports are injected or file:// URLs; fixtures mirror the
reference's API payload shape (api_client.py:94-105) and CSV dump members
(loaders/__init__.py:20-28).
"""

from __future__ import annotations

import datetime as dt
import json
import zipfile

import pytest

from f1_data_pipeline_spark.sources import csv_zip, json_api

RACE_DOC = {
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
                            "points": "25",
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
                    ],
                }
            ]
        }
    }
}

EMPTY_DOC = {"MRData": {"RaceTable": {"Races": []}}}


# --- fetch_json retry contract (A1) -----------------------------------------------


def test_fetch_retries_5xx_then_succeeds():
    calls = []

    def transport(url):
        calls.append(url)
        return (503, "oops") if len(calls) < 3 else (200, json.dumps(RACE_DOC))

    doc = json_api.fetch_json("http://x/results", transport=transport, retry_delay=0)
    assert len(calls) == 3 and doc["MRData"]["RaceTable"]["Races"]


def test_fetch_404_is_empty_sentinel_not_error():
    assert json_api.fetch_json("http://x/none", transport=lambda u: (404, "")) is None


def test_fetch_other_4xx_no_retry():
    calls = []

    def transport(url):
        calls.append(url)
        return 403, "forbidden"

    with pytest.raises(RuntimeError, match="client error 403"):
        json_api.fetch_json("http://x/a", transport=transport, retry_delay=0)
    assert len(calls) == 1


def test_fetch_exhausts_retries():
    with pytest.raises(RuntimeError, match="exhausted 3 retries"):
        json_api.fetch_json(
            "http://x/b", transport=lambda u: (500, "down"), retry_delay=0
        )


def test_fetch_params_encoded():
    seen = {}

    def transport(url):
        seen["url"] = url
        return 200, "{}"

    json_api.fetch_json("http://x/r", params={"limit": "100"}, transport=transport)
    assert seen["url"] == "http://x/r?limit=100"


# --- payload flattening (G11 consume path) ----------------------------------------


def test_flatten_race_results_golden(spark):
    parsed = json_api.payloads_to_df(spark, [RACE_DOC])
    rows = {r["driver_reference"]: r for r in json_api.flatten_race_results(parsed).collect()}
    v = rows["max_verstappen"]
    assert v["season_year"] == 2024 and v["round_number"] == 3
    assert v["position"] == 1 and float(v["points"]) == 25.0
    assert v["race_time_milliseconds"] == 5412000
    assert v["fastest_lap_milliseconds"] == 83456  # "1:23.456" parsed
    n = rows["norris"]
    assert n["fastest_lap_milliseconds"] is None and n["race_time_milliseconds"] == 5414500


def test_flatten_empty_payload_zero_rows_same_schema(spark):
    parsed = json_api.payloads_to_df(spark, [EMPTY_DOC])
    out = json_api.flatten_race_results(parsed)
    assert out.count() == 0
    assert "driver_reference" in out.columns


# --- endpoint-partitioned Python Data Source --------------------------------------


def test_json_api_datasource_file_urls(spark, tmp_path):
    urls = []
    for i, doc in enumerate([RACE_DOC, EMPTY_DOC]):
        p = tmp_path / f"round{i}.json"
        p.write_text(json.dumps(doc))
        urls.append(p.as_uri())

    df = json_api.read_endpoints(spark, urls)
    # one input partition per endpoint → parallel fetch on executors
    assert df.rdd.getNumPartitions() == 2
    rows = {r["url"]: r for r in df.collect()}
    assert all(r["status"] == 200 for r in rows.values())

    # end-to-end: fetched payloads → flatten → typed rows
    from pyspark.sql import functions as F

    parsed = df.filter(F.col("status") == 200).select(
        F.from_json("payload", json_api.RACE_PAYLOAD_SCHEMA).alias("doc")
    )
    assert json_api.flatten_race_results(parsed).count() == 2


# --- ZIP-of-CSVs bulk dump (A2/A3) ------------------------------------------------


@pytest.fixture()
def f1_zip(tmp_path):
    zp = tmp_path / "dump.zip"
    drivers = (
        "id,forename,surname,reference,abbreviation,nationality,country_code,permanent_car_number,date_of_birth\n"
        "1,Max,Verstappen,max_verstappen,VER,Dutch,NLD,1,1997-09-30\n"
        "2,Lando,Norris,norris,NOR,British,GBR,4,1999-11-13\n"
        "3,Bad,Row,bad_row,BAD,Martian,XXX,99999,not-a-date\n"
    )
    seasons = "id,year\n1,2023\n2,2024\n"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("drivers.csv", drivers)
        zf.writestr("seasons.csv", seasons)
    return str(zp)


def test_zip_csv_tables_typed_and_sanitized(spark, tmp_path, f1_zip):
    tables = csv_zip.read_zip_csv(spark, f1_zip, str(tmp_path / "work"))
    assert set(tables) == {"driver", "season"}

    drivers = {r["id"]: r for r in tables["driver"].collect()}
    assert drivers[1]["date_of_birth"] == dt.date(1997, 9, 30)
    assert drivers[1]["permanent_car_number"] == 1
    # sanitizer semantics: smallint clipped, bad date → null (G7/G10)
    assert drivers[3]["permanent_car_number"] == 32767
    assert drivers[3]["date_of_birth"] is None

    years = {r["year"] for r in tables["season"].collect()}
    assert years == {2023, 2024}
    assert dict(tables["season"].dtypes)["year"] == "int"


def test_zip_multiple_parts_union(spark, tmp_path, f1_zip):
    zp2 = tmp_path / "dump2.zip"
    with zipfile.ZipFile(zp2, "w") as zf:
        zf.writestr("seasons.csv", "id,year\n3,2025\n")
    tables = csv_zip.read_zip_csv(
        spark, [f1_zip, str(zp2)], str(tmp_path / "work2")
    )
    assert tables["season"].count() == 3


# --- qualifying + sprint payload flattening ---------------------------------------

QUAL_DOC = {
    "MRData": {
        "RaceTable": {
            "Races": [
                {
                    "season": "2024",
                    "round": "3",
                    "QualifyingResults": [
                        {
                            "position": "1",
                            "Driver": {"driverId": "max_verstappen"},
                            "Constructor": {"constructorId": "red_bull"},
                            "Q1": "1:30.123",
                            "Q2": "1:29.500",
                            "Q3": "1:28.997",
                        },
                        {
                            # knocked out in Q1 → Q2/Q3 null through the parse
                            "position": "18",
                            "Driver": {"driverId": "slowpoke"},
                            "Constructor": {"constructorId": "backmarker"},
                            "Q1": "1:35.002",
                            "Q2": None,
                            "Q3": None,
                        },
                    ],
                }
            ]
        }
    }
}

SPRINT_DOC = {
    "MRData": {
        "RaceTable": {
            "Races": [
                {
                    "season": "2024",
                    "round": "3",
                    "SprintResults": [
                        {
                            "position": "1",
                            "positionText": "1",
                            "points": "8",
                            "grid": "1",
                            "laps": "19",
                            "status": "Finished",
                            "Driver": {"driverId": "max_verstappen"},
                            "Constructor": {"constructorId": "red_bull"},
                            "Time": {"millis": "1620000"},
                        }
                    ],
                }
            ]
        }
    }
}


def test_flatten_qualifying_q_times(spark):
    parsed = json_api.payloads_to_df(
        spark, [QUAL_DOC], json_api.QUALIFYING_PAYLOAD_SCHEMA
    )
    rows = {
        r["driver_reference"]: r
        for r in json_api.flatten_qualifying_results(parsed).collect()
    }
    v = rows["max_verstappen"]
    assert v["q3_time_milliseconds"] == 88997
    assert v["q1_time"] == "1:30.123" and v["q1_time_milliseconds"] == 90123
    s = rows["slowpoke"]
    assert s["q2_time"] is None and s["q2_time_milliseconds"] is None
    assert s["q1_time_milliseconds"] == 95002


def test_flatten_sprint(spark):
    parsed = json_api.payloads_to_df(
        spark, [SPRINT_DOC], json_api.SPRINT_PAYLOAD_SCHEMA
    )
    rows = json_api.flatten_sprint_results(parsed).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["sprint_time_milliseconds"] == 1620000
    assert float(r["points"]) == 8.0 and r["laps_completed"] == 19


def test_flatten_driver_standings_and_empty_shortcircuit(spark):
    doc = {
        "MRData": {
            "StandingsTable": {
                "StandingsLists": [
                    {
                        "season": "2024",
                        "round": "3",
                        "DriverStandings": [
                            {"position": "1", "points": "51", "wins": "2",
                             "Driver": {"driverId": "max_verstappen"}},
                            {"position": "2", "points": "45", "wins": "1",
                             "Driver": {"driverId": "norris"}},
                        ],
                    }
                ]
            }
        }
    }
    parsed = json_api.payloads_to_df(
        spark, [doc], json_api.DRIVER_STANDINGS_PAYLOAD_SCHEMA
    )
    rows = {r["driver_reference"]: r for r in json_api.flatten_driver_standings(parsed).collect()}
    assert rows["max_verstappen"]["points"] == 51.0
    assert rows["max_verstappen"]["win_count"] == 2

    # empty StandingsLists: the reference IndexErrors here (§7.6); we yield 0 rows
    empty = {"MRData": {"StandingsTable": {"StandingsLists": []}}}
    parsed = json_api.payloads_to_df(
        spark, [empty], json_api.DRIVER_STANDINGS_PAYLOAD_SCHEMA
    )
    assert json_api.flatten_driver_standings(parsed).count() == 0


def test_load_table_raises_on_unexpected_ts_encoding(spark, tmp_path):
    """A NANO_TS_COLUMNS column surfacing as anything but LongType (legacy
    nanos) or TimestampNTZType must fail loudly — a plain TimestampType
    (UTC-adjusted MICROS) passed through silently would read
    timezone-shifted vs DuckDB's naive read."""
    import datetime

    import pytest

    from f1_data_pipeline_spark.sources.tables import load_table

    sf = tmp_path / "sfX"
    sf.mkdir()
    spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 12, 0), 7, "click", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(sf / "events.parquet"))
    with pytest.raises(TypeError, match="unexpected surfaced type"):
        load_table(spark, str(sf), "events")
