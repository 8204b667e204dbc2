"""CLI — the reference's argparse surface (SURVEY.md §2.J J5/J6;
/root/reference/main.py:286-342), over the Spark pipeline orchestrator.

    python -m f1_data_pipeline_spark --mode pre_season --source-zip dump.zip
    python -m f1_data_pipeline_spark --table race_result --year 2024 --round 3 \
        --payload-json round3.json
    python -m f1_data_pipeline_spark --mode post_race --force

Sources are local artifacts (a ZIP of CSV dumps for dims, JSON payload
files for facts) because this environment is offline; pointing the
extracts at `sources.json_api.fetch_json` URLs is a one-line swap.
Exit code = number of failed tables (main.py:385-388).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators.relational import (
    filter_fk_resolved,
    fk_lookup_join,
)
from f1_data_pipeline_spark.plans import pipeline as P
from f1_data_pipeline_spark.plans.incremental import should_load_preseason
from f1_data_pipeline_spark.session import get_spark
from f1_data_pipeline_spark.sources import csv_zip, json_api


def build_pipeline(spark, warehouse: str, source_zip: str | None, payload: dict | None):
    pipe = P.Pipeline(spark, warehouse)
    zip_cache: dict = {}

    def from_zip(table):
        def extract(s, **kw):
            if source_zip is None:
                raise ValueError(f"{table}: --source-zip required for dim loads")
            if not zip_cache:  # shared fetch-once (main.py:102-106 / J8)
                zip_cache.update(
                    csv_zip.read_zip_csv(s, source_zip, f"{warehouse}/__zip_work")
                )
            if table not in zip_cache:
                raise ValueError(f"{table}: member missing from {source_zip}")
            return zip_cache[table]

        return extract

    for dim in ("season", "driver", "team", "circuit", "round"):
        deps = ("season",) if dim == "round" else ()
        pipe.register(P.PipelineSpec(dim, P.FULL_REFRESH, from_zip(dim), deps))

    def race_result_extract(s, **kw):
        if payload is None:
            raise ValueError("race_result: --payload-json required")
        flat = json_api.flatten_race_results(json_api.payloads_to_df(s, [payload]))
        driver = s.read.parquet(pipe.table_path("driver")).select(
            F.col("id").alias("driver_id"),
            F.col("reference").alias("driver_reference"),
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
            "race_result", P.INCREMENTAL, race_result_extract,
            dependencies=("round", "driver"),
        )
    )
    return pipe


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="f1_data_pipeline_spark")
    ap.add_argument("--mode", choices=sorted(P.LOAD_MODES))
    ap.add_argument("--table")
    ap.add_argument("--year", type=int)
    ap.add_argument("--round", type=int, dest="round_num")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--warehouse", default="./warehouse")
    ap.add_argument("--source-zip")
    ap.add_argument("--payload-json", help="JSON payload file for fact loads")
    ap.add_argument(
        "--curate",
        metavar="SF_DIR",
        help="run the corpus-curation plan over SF_DIR/documents.parquet "
        "(beyond-reference LLM-data suite; plans/curation.py)",
    )
    ap.add_argument("--out", help="output directory for --curate / --profile")
    ap.add_argument(
        "--profile",
        metavar="PARQUET_PATH",
        help="profile a parquet table (null/cardinality stats per column, "
        "long format; operators/profile.py); writes the report to --out "
        "when given, always prints it as one JSON object",
    )
    args = ap.parse_args(argv)
    if args.curate:
        if not args.out:
            ap.error("--curate requires --out")
        from f1_data_pipeline_spark.plans.curation import curate

        stats = curate(get_spark("curation-cli"), args.curate, args.out)
        print(json.dumps(stats))
        return 0
    if args.profile:
        from f1_data_pipeline_spark.operators.profile import profile_long

        spark = get_spark("profile-cli")
        report = profile_long(spark.read.parquet(args.profile))
        if args.out:
            report.write.mode("overwrite").parquet(args.out)
        print(
            json.dumps(
                {
                    f"{r['col_name']}.{r['stat']}": r["value"]
                    for r in report.collect()
                }
            )
        )
        return 0
    if not args.mode and not args.table:
        ap.error("one of --mode / --table is required")

    payload = None
    if args.payload_json:
        with open(args.payload_json) as fh:
            payload = json.load(fh)

    spark = get_spark("f1-pipeline-cli")
    pipe = build_pipeline(spark, args.warehouse, args.source_zip, payload)
    kwargs = {
        k: v
        for k, v in {"year": args.year, "round_num": args.round_num}.items()
        if v is not None
    }

    if args.table:
        # single-table run bypasses gates — force-like (main.py:129-167)
        results = [pipe.run_table(args.table, **kwargs)]
    else:
        gate = None
        if not args.force and args.year is not None:
            gate = lambda t: should_load_preseason(  # noqa: E731
                pipe.store.get(t), args.year
            )
        registered = [t for t in P.LOAD_MODES[args.mode] if t in pipe.specs]
        results = [pipe._process_table(t, gate, **kwargs) for t in registered]

    summary = P.Pipeline.summarize(results)
    for r in results:
        line = f"{r.table:>20}  {r.status:<8} {r.records or 0:>8} rows  {r.seconds:.1f}s"
        if r.error:
            line += f"  ({r.error[:80]})"
        print(line)
    print(f"summary: {summary}")
    return summary.get("failed", 0)


if __name__ == "__main__":
    sys.exit(main())
