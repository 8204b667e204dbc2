"""HTTP JSON source (SURVEY.md §2.A A1) — reference parity for the
Jolpica/Ergast API client (/root/reference/api_client.py:29-105) plus the
Spark-native scale path.

Three layers:

1. `fetch_json` — one endpoint fetch with the reference's retry contract
   (3 attempts, exponential backoff 2**attempt, 404 → empty sentinel,
   no-retry on other 4xx, retry on 5xx/timeouts; api_client.py:47-88).
   Transport is injectable so tests run offline (`file://` also works).
2. `payloads_to_df` / `flatten_race_results` — nested payload documents →
   typed rows, declaratively: `from_json` + `explode` + struct access
   (the Spark form of the reference's dict-walking at
   loaders/__init__.py:384-436). All JVM-side, codegen-friendly.
3. `JsonApiDataSource` — a PySpark 4 Python Data Source whose input
   partitions are endpoints: `spark.read.format("json_api")` fans the
   fetches out across executors instead of serializing them on the
   driver. This is the 100 TB-posture ingest (thousands of endpoint
   partitions, retry per partition task).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from f1_data_pipeline_spark.functions.scalars import laptime_to_ms

# transport: url -> (status_code, body_text). Injectable for offline tests.
Transport = Callable[[str], tuple[int, str]]


def _urllib_transport(timeout: float) -> Transport:
    def get(url: str) -> tuple[int, str]:
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                return getattr(resp, "status", 200) or 200, resp.read().decode()
        except urllib.error.HTTPError as e:  # non-2xx with a status code
            return e.code, e.read().decode(errors="replace")

    return get


def fetch_json(
    url: str,
    params: dict[str, str] | None = None,
    transport: Transport | None = None,
    max_retries: int = 3,
    retry_delay: float = 2.0,
    timeout: float = 30.0,
) -> dict | None:
    """GET a JSON document with the reference's retry/backoff contract.

    Returns the parsed document, or None for 404 (empty sentinel — the
    caller produces an empty DataFrame of the declared schema, I3).
    Raises after `max_retries` failed attempts on 5xx/transport errors;
    other 4xx raise immediately (no retry).
    """
    if params:
        url = url + "?" + urllib.parse.urlencode(params)
    get = transport or _urllib_transport(timeout)
    last_err: Exception | None = None
    for attempt in range(max_retries):
        try:
            status, body = get(url)
        except Exception as e:  # timeout / connection error → retry
            last_err = e
            time.sleep(min(retry_delay**attempt, 30))
            continue
        if status == 404:
            return None
        if 400 <= status < 500:
            raise RuntimeError(f"client error {status} for {url} (no retry)")
        if status >= 500:
            last_err = RuntimeError(f"server error {status} for {url}")
            time.sleep(min(retry_delay**attempt, 30))
            continue
        return json.loads(body)
    raise RuntimeError(f"exhausted {max_retries} retries for {url}: {last_err}")


# ---------------------------------------------------------------------------
# Payload schema + declarative flattening (A1 consume side / G11)
# Shape per api_client.py:94-105 and loaders/__init__.py:384-436.
# ---------------------------------------------------------------------------

RACE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField(
            "MRData",
            T.StructType(
                [
                    T.StructField(
                        "RaceTable",
                        T.StructType(
                            [
                                T.StructField(
                                    "Races",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField("season", T.StringType()),
                                                T.StructField("round", T.StringType()),
                                                T.StructField(
                                                    "Results",
                                                    T.ArrayType(
                                                        T.StructType(
                                                            [
                                                                T.StructField("position", T.StringType()),
                                                                T.StructField("positionText", T.StringType()),
                                                                T.StructField("points", T.StringType()),
                                                                T.StructField("grid", T.StringType()),
                                                                T.StructField("laps", T.StringType()),
                                                                T.StructField("status", T.StringType()),
                                                                T.StructField(
                                                                    "Driver",
                                                                    T.StructType(
                                                                        [T.StructField("driverId", T.StringType())]
                                                                    ),
                                                                ),
                                                                T.StructField(
                                                                    "Constructor",
                                                                    T.StructType(
                                                                        [T.StructField("constructorId", T.StringType())]
                                                                    ),
                                                                ),
                                                                T.StructField(
                                                                    "Time",
                                                                    T.StructType(
                                                                        [
                                                                            T.StructField("millis", T.StringType()),
                                                                            T.StructField("time", T.StringType()),
                                                                        ]
                                                                    ),
                                                                ),
                                                                T.StructField(
                                                                    "FastestLap",
                                                                    T.StructType(
                                                                        [
                                                                            T.StructField("rank", T.StringType()),
                                                                            T.StructField("lap", T.StringType()),
                                                                            T.StructField(
                                                                                "Time",
                                                                                T.StructType(
                                                                                    [T.StructField("time", T.StringType())]
                                                                                ),
                                                                            ),
                                                                        ]
                                                                    ),
                                                                ),
                                                            ]
                                                        )
                                                    ),
                                                ),
                                            ]
                                        )
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        )
    ]
)


def payloads_to_df(
    spark: SparkSession,
    payloads: Sequence[dict | str],
    payload_schema: T.StructType = RACE_PAYLOAD_SCHEMA,
) -> DataFrame:
    """Raw JSON documents → one parsed struct row each (`from_json`)."""
    texts = [(p if isinstance(p, str) else json.dumps(p),) for p in payloads]
    raw = spark.createDataFrame(texts, "payload string")
    return raw.select(F.from_json("payload", payload_schema).alias("doc"))


def flatten_race_results(parsed: DataFrame) -> DataFrame:
    """MRData.RaceTable.Races[].Results[] → typed result rows.

    The declarative twin of the reference's nested-dict loops
    (loaders/__init__.py:384-436): explode races, explode results, cast
    the stringly-typed leaf fields, parse "M:SS.mmm" fastest-lap times.
    Empty/missing Races (404 sentinel, I3) yields zero rows with the
    same schema — no special-casing.
    """
    races = parsed.select(
        F.explode_outer("doc.MRData.RaceTable.Races").alias("race")
    ).filter(F.col("race").isNotNull())
    results = races.select(
        F.col("race.season").cast("int").alias("season_year"),
        F.col("race.round").cast("int").alias("round_number"),
        F.explode_outer("race.Results").alias("res"),
    ).filter(F.col("res").isNotNull())
    return results.select(
        "season_year",
        "round_number",
        F.col("res.Driver.driverId").alias("driver_reference"),
        F.col("res.Constructor.constructorId").alias("team_reference"),
        F.col("res.position").cast("int").alias("position"),
        F.col("res.positionText").alias("position_text"),
        F.col("res.points").cast("decimal(5,2)").alias("points"),
        F.col("res.grid").cast("int").alias("grid_position"),
        F.col("res.laps").cast("int").alias("laps_completed"),
        F.col("res.status").alias("status"),
        F.col("res.Time.millis").cast("long").alias("race_time_milliseconds"),
        F.col("res.FastestLap.rank").cast("int").alias("fastest_lap_rank"),
        F.col("res.FastestLap.lap").cast("int").alias("fastest_lap_number"),
        laptime_to_ms(F.col("res.FastestLap.Time.time")).alias(
            "fastest_lap_milliseconds"
        ),
    )


# ---------------------------------------------------------------------------
# PySpark 4 Python Data Source: endpoint-per-partition parallel ingest
# ---------------------------------------------------------------------------

API_ROW_SCHEMA = "url string, status int, payload string"


class _EndpointPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class JsonApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.urls = json.loads(options.get("urls", "[]"))
        self.max_retries = int(options.get("max_retries", "3"))
        self.retry_delay = float(options.get("retry_delay", "2"))
        self.timeout = float(options.get("timeout", "30"))

    def partitions(self):
        return [_EndpointPartition(u) for u in self.urls]

    def read(self, partition: _EndpointPartition):
        try:
            doc = fetch_json(
                partition.url,
                max_retries=self.max_retries,
                retry_delay=self.retry_delay,
                timeout=self.timeout,
            )
        except RuntimeError as e:
            yield (partition.url, -1, json.dumps({"error": str(e)}))
            return
        if doc is None:  # 404 sentinel
            yield (partition.url, 404, None)
        else:
            yield (partition.url, 200, json.dumps(doc))


class JsonApiDataSource(DataSource):
    """`spark.read.format("json_api").option("urls", json_list)` — each URL
    becomes an input partition, so a season's worth of per-round endpoints
    (or a 100 TB backfill's millions) fetch in parallel on executors with
    per-task retry, instead of a serial driver-side loop."""

    @classmethod
    def name(cls) -> str:
        return "json_api"

    def schema(self) -> str:
        return API_ROW_SCHEMA

    def reader(self, schema) -> JsonApiReader:
        return JsonApiReader(self.options)


def register_json_api_source(spark: SparkSession) -> None:
    spark.dataSource.register(JsonApiDataSource)


def read_endpoints(spark: SparkSession, urls: Sequence[str], **options) -> DataFrame:
    register_json_api_source(spark)
    reader = spark.read.format("json_api").option("urls", json.dumps(list(urls)))
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


# ---------------------------------------------------------------------------
# qualifying + sprint payloads (loaders/__init__.py:212-247, 310-340)
# ---------------------------------------------------------------------------

def _race_table_schema(results_field: str, result_struct: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField(
                "MRData",
                T.StructType(
                    [
                        T.StructField(
                            "RaceTable",
                            T.StructType(
                                [
                                    T.StructField(
                                        "Races",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("season", T.StringType()),
                                                    T.StructField("round", T.StringType()),
                                                    T.StructField(
                                                        results_field,
                                                        T.ArrayType(result_struct),
                                                    ),
                                                ]
                                            )
                                        ),
                                    )
                                ]
                            ),
                        )
                    ]
                ),
            )
        ]
    )


_QUAL_RESULT = T.StructType(
    [
        T.StructField("position", T.StringType()),
        T.StructField("Driver", T.StructType([T.StructField("driverId", T.StringType())])),
        T.StructField("Constructor", T.StructType([T.StructField("constructorId", T.StringType())])),
        T.StructField("Q1", T.StringType()),
        T.StructField("Q2", T.StringType()),
        T.StructField("Q3", T.StringType()),
    ]
)

QUALIFYING_PAYLOAD_SCHEMA = _race_table_schema("QualifyingResults", _QUAL_RESULT)

_SPRINT_RESULT = T.StructType(
    [
        T.StructField("position", T.StringType()),
        T.StructField("positionText", T.StringType()),
        T.StructField("points", T.StringType()),
        T.StructField("grid", T.StringType()),
        T.StructField("laps", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("Driver", T.StructType([T.StructField("driverId", T.StringType())])),
        T.StructField("Constructor", T.StructType([T.StructField("constructorId", T.StringType())])),
        T.StructField("Time", T.StructType([T.StructField("millis", T.StringType())])),
    ]
)

SPRINT_PAYLOAD_SCHEMA = _race_table_schema("SprintResults", _SPRINT_RESULT)


def _explode_races(parsed: DataFrame, results_field: str) -> DataFrame:
    races = parsed.select(
        F.explode_outer("doc.MRData.RaceTable.Races").alias("race")
    ).filter(F.col("race").isNotNull())
    return races.select(
        F.col("race.season").cast("int").alias("season_year"),
        F.col("race.round").cast("int").alias("round_number"),
        F.explode_outer(f"race.{results_field}").alias("res"),
    ).filter(F.col("res").isNotNull())


def flatten_qualifying_results(parsed: DataFrame) -> DataFrame:
    """QualifyingResults[] → typed rows with Q1/Q2/Q3 raw strings AND
    parsed milliseconds (loaders/__init__.py:212-247): null session times
    (driver eliminated earlier) stay null through the laptime parse."""
    results = _explode_races(parsed, "QualifyingResults")
    out = results.select(
        "season_year",
        "round_number",
        F.col("res.Driver.driverId").alias("driver_reference"),
        F.col("res.Constructor.constructorId").alias("team_reference"),
        F.col("res.position").cast("int").alias("position"),
        F.col("res.Q1").alias("q1_time"),
        F.col("res.Q2").alias("q2_time"),
        F.col("res.Q3").alias("q3_time"),
    )
    for q in ("q1", "q2", "q3"):
        out = out.withColumn(
            f"{q}_time_milliseconds", laptime_to_ms(F.col(f"{q}_time"))
        )
    return out


def flatten_sprint_results(parsed: DataFrame) -> DataFrame:
    """SprintResults[] → typed rows (loaders/__init__.py:310-340)."""
    results = _explode_races(parsed, "SprintResults")
    return results.select(
        "season_year",
        "round_number",
        F.col("res.Driver.driverId").alias("driver_reference"),
        F.col("res.Constructor.constructorId").alias("team_reference"),
        F.col("res.position").cast("int").alias("position"),
        F.col("res.positionText").alias("position_text"),
        F.col("res.points").cast("decimal(5,2)").alias("points"),
        F.col("res.grid").cast("int").alias("grid_position"),
        F.col("res.laps").cast("int").alias("laps_completed"),
        F.col("res.status").alias("status"),
        F.col("res.Time.millis").cast("long").alias("sprint_time_milliseconds"),
    )


# ---------------------------------------------------------------------------
# championship standings payloads (loaders/__init__.py:488-528, 570-609)
# ---------------------------------------------------------------------------

def _standings_schema(list_field: str, entity_struct: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField(
                "MRData",
                T.StructType(
                    [
                        T.StructField(
                            "StandingsTable",
                            T.StructType(
                                [
                                    T.StructField(
                                        "StandingsLists",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("season", T.StringType()),
                                                    T.StructField("round", T.StringType()),
                                                    T.StructField(
                                                        list_field,
                                                        T.ArrayType(entity_struct),
                                                    ),
                                                ]
                                            )
                                        ),
                                    )
                                ]
                            ),
                        )
                    ]
                ),
            )
        ]
    )


_DRIVER_STANDING = T.StructType(
    [
        T.StructField("position", T.StringType()),
        T.StructField("points", T.StringType()),
        T.StructField("wins", T.StringType()),
        T.StructField("Driver", T.StructType([T.StructField("driverId", T.StringType())])),
    ]
)

_TEAM_STANDING = T.StructType(
    [
        T.StructField("position", T.StringType()),
        T.StructField("points", T.StringType()),
        T.StructField("wins", T.StringType()),
        T.StructField("Constructor", T.StructType([T.StructField("constructorId", T.StringType())])),
    ]
)

DRIVER_STANDINGS_PAYLOAD_SCHEMA = _standings_schema("DriverStandings", _DRIVER_STANDING)
TEAM_STANDINGS_PAYLOAD_SCHEMA = _standings_schema("ConstructorStandings", _TEAM_STANDING)


def _flatten_standings(parsed: DataFrame, list_field: str, ref_expr: str, ref_alias: str) -> DataFrame:
    """StandingsLists[] → rows. NB the reference indexes StandingsLists[0]
    BEFORE its emptiness check (loaders/__init__.py:490 — IndexError on
    empty, SURVEY §7.6); explode_outer + null filters short-circuit
    properly instead."""
    lists = parsed.select(
        F.explode_outer("doc.MRData.StandingsTable.StandingsLists").alias("sl")
    ).filter(F.col("sl").isNotNull())
    rows = lists.select(
        F.col("sl.season").cast("int").alias("season_year"),
        F.col("sl.round").cast("int").alias("round_number"),
        F.explode_outer(f"sl.{list_field}").alias("st"),
    ).filter(F.col("st").isNotNull())
    return rows.select(
        "season_year",
        "round_number",
        F.col(ref_expr).alias(ref_alias),
        F.col("st.position").cast("int").alias("position"),
        F.col("st.points").cast("double").alias("points"),
        F.col("st.wins").cast("int").alias("win_count"),
    )


def flatten_driver_standings(parsed: DataFrame) -> DataFrame:
    return _flatten_standings(parsed, "DriverStandings", "st.Driver.driverId", "driver_reference")


def flatten_team_standings(parsed: DataFrame) -> DataFrame:
    return _flatten_standings(parsed, "ConstructorStandings", "st.Constructor.constructorId", "team_reference")
