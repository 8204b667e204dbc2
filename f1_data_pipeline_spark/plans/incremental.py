"""Incremental control plane: watermarks, load gating, next-increment
(SURVEY.md §2.H; reference /root/reference/metadata.py + metadata.sql).

The reference simulates streaming with scheduled batch + two Postgres
metadata tables. The engine keeps the same semantics on a tiny Parquet
watermark table (driver-sized — single-digit rows, one per entity — so
collect() here is correct, not a scale smell). The genuinely-streaming path
uses Structured Streaming checkpoints instead (streaming/).

Semantics preserved from the reference:
- watermark = (last_season_year, last_round_number, last_successful_sync,
  total_records)                              (metadata.py:118-148)
- next round = watermark+1 bounded by calendar MAX(number), reset to 1 on
  season change or missing watermark          (metadata.py:150-191)
- pre-season gate: load dims once per season  (metadata.py:229-231)
- post-race gate: a race ended ≥ buffer_days(=2) ago after
  (last_sync − 1 day) — the deliberate 1-day re-scan overlap is safe
  because sinks are idempotent upserts        (metadata.py:244-290)
- sprint gate additionally requires a session of type 'SR' in the round
  (semi-join)                                 (metadata.py:292-341)
- docstring-vs-code buffer discrepancy resolved in favor of code: 2 days
  (SURVEY.md §7.6).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators.sinks import read_table, write_atomic
from f1_data_pipeline_spark.schemas import F1_SCHEMAS

BUFFER_DAYS = 2
RESCAN_SLACK_DAYS = 1


@dataclass
class Watermark:
    entity_name: str
    last_season_year: int | None = None
    last_round_number: int | None = None
    last_successful_sync: dt.datetime | None = None
    total_records: int = 0


class WatermarkStore:
    """Parquet-backed sync_status + sync_log (metadata.sql:4-28)."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.status_path = f"{base_dir}/sync_status"
        self.log_path = f"{base_dir}/sync_log"

    # -- H1 watermark_read ---------------------------------------------------
    def get(self, entity: str) -> Watermark:
        df = read_table(self.spark, self.status_path, F1_SCHEMAS["sync_status"])
        rows = df.filter(F.col("entity_name") == entity).collect()
        if not rows:
            return Watermark(entity_name=entity)
        r = rows[0]
        return Watermark(
            entity_name=entity,
            last_season_year=r.last_season_year,
            last_round_number=r.last_round_number,
            last_successful_sync=r.last_successful_sync,
            total_records=r.total_records or 0,
        )

    # -- H2 watermark_advance (+ A9/I5 audit log) ------------------------------
    def complete(
        self,
        entity: str,
        records: int,
        season_year: int | None = None,
        round_number: int | None = None,
        status: str = "success",
        error_message: str | None = None,
        duration_seconds: int = 0,
    ) -> None:
        prev = self.get(entity)
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        ok = status == "success"
        row = {
            "entity_name": entity,
            "last_updated": now,
            "last_successful_sync": now if ok else prev.last_successful_sync,
            "status": status,
            "error_message": error_message,
            "total_records": (prev.total_records + records) if ok else prev.total_records,
            "last_season_year": season_year if ok and season_year is not None else prev.last_season_year,
            "last_round_number": round_number if ok and round_number is not None else prev.last_round_number,
        }
        df = read_table(self.spark, self.status_path, F1_SCHEMAS["sync_status"])
        others = df.filter(F.col("entity_name") != entity)
        updated = others.unionByName(
            self.spark.createDataFrame([row], F1_SCHEMAS["sync_status"])
        )
        write_atomic(updated, self.status_path)

        log = read_table(self.spark, self.log_path, F1_SCHEMAS["sync_log"])
        next_id = (log.agg(F.coalesce(F.max("id"), F.lit(0))).collect()[0][0] or 0) + 1
        entry = {
            "id": next_id,
            "entity_name": entity,
            "sync_timestamp": now,
            "status": status,
            "records_affected": records,
            "duration_seconds": duration_seconds,
            "error_message": error_message,
        }
        write_atomic(
            log.unionByName(self.spark.createDataFrame([entry], F1_SCHEMAS["sync_log"])),
            self.log_path,
        )


# ---------------------------------------------------------------------------
# H3 — next increment
# ---------------------------------------------------------------------------

def next_round_to_load(
    wm: Watermark, calendar: DataFrame, season_year: int
) -> int | None:
    """Next round number for `season_year`, or None if caught up.

    calendar: the `round` dim joined to season year (columns: year, number).
    Reference: metadata.py:150-191 (reset-to-1 at :170-171).
    """
    max_round = (
        calendar.filter(F.col("year") == season_year)
        .agg(F.max("number").alias("m"))
        .collect()[0]["m"]
    )
    if max_round is None:
        return None
    if wm.last_season_year != season_year or wm.last_round_number is None:
        return 1  # new season or never loaded
    if wm.last_round_number < max_round:
        return wm.last_round_number + 1
    return None


# ---------------------------------------------------------------------------
# H4/H5/H6 — load gates
# ---------------------------------------------------------------------------

def should_load_preseason(wm: Watermark, current_season: int) -> bool:
    """Dims reload once per season (metadata.py:229-231)."""
    return wm.last_season_year is None or wm.last_season_year < current_season


def _race_since(
    races: DataFrame,
    since: dt.datetime | None,
    today: dt.date,
    buffer_days: int = BUFFER_DAYS,
) -> bool:
    """A race ≥ buffer_days old happened after (since − 1 day)
    (metadata.py:244-290; slack at :285)."""
    cutoff = F.lit(today - dt.timedelta(days=buffer_days)).cast("date")
    cond = F.col("date").isNotNull() & (F.col("date") <= cutoff)
    if since is not None:
        lower = since.date() - dt.timedelta(days=RESCAN_SLACK_DAYS)
        cond = cond & (F.col("date") >= F.lit(lower).cast("date"))
    return races.filter(cond).limit(1).count() > 0


def should_load_postrace(
    wm: Watermark, races: DataFrame, today: dt.date | None = None
) -> bool:
    """Fact loads gate on a buffered race having occurred since last sync."""
    today = today or dt.date.today()
    if wm.last_successful_sync is None:
        return True
    return _race_since(races, wm.last_successful_sync, today)


def should_load_sprint(
    wm: Watermark,
    races: DataFrame,
    sessions: DataFrame,
    today: dt.date | None = None,
) -> bool:
    """Sprint gate: same, restricted to rounds with a session of type 'SR'
    via a semi-join (metadata.py:292-341 / join C1)."""
    today = today or dt.date.today()
    sprint_rounds = sessions.filter(F.col("type") == "SR").select("round_id")
    sprint_races = races.join(
        sprint_rounds, races.id == sprint_rounds.round_id, "left_semi"
    )
    if wm.last_successful_sync is None:
        return _race_since(sprint_races, None, today)
    return _race_since(sprint_races, wm.last_successful_sync, today)
