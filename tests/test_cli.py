"""CLI parity (J5/J6): the reference's argparse surface drives the same
pre-season / single-table flows over local source artifacts."""

from __future__ import annotations

import json
import zipfile

import pytest

from f1_data_pipeline_spark.__main__ import main

from tests.test_e2e_f1 import DRIVERS_CSV, RACES_CSV, SEASONS_CSV, _race_doc

TEAMS_CSV = "id,name,nationality,reference,country_code\n1,Red Bull,Austrian,red_bull,AUT\n"
CIRCUITS_CSV = (
    "id,name,reference,country,country_code,locality,latitude,longitude,altitude\n"
    "1,Bahrain,bahrain,Bahrain,BHR,Sakhir,26.0325,50.5106,7\n"
)


@pytest.fixture
def artifacts(tmp_path):
    zp = tmp_path / "dump.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("drivers.csv", DRIVERS_CSV)
        zf.writestr("seasons.csv", SEASONS_CSV)
        zf.writestr("races.csv", RACES_CSV)
        zf.writestr("constructors.csv", TEAMS_CSV)
        zf.writestr("circuits.csv", CIRCUITS_CSV)
    pj = tmp_path / "round3.json"
    pj.write_text(json.dumps(_race_doc()))
    return {"zip": str(zp), "payload": str(pj), "wh": str(tmp_path / "wh")}


def test_cli_pre_season_then_fact(spark, artifacts, capsys):
    rc = main(
        [
            "--mode", "pre_season",
            "--source-zip", artifacts["zip"],
            "--warehouse", artifacts["wh"],
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "'success': 5" in out

    rc = main(
        [
            "--table", "race_result",
            "--year", "2024", "--round", "3",
            "--payload-json", artifacts["payload"],
            "--warehouse", artifacts["wh"],
        ]
    )
    assert rc == 0
    rr = spark.read.parquet(artifacts["wh"] + "/race_result")
    assert rr.count() == 2  # ghost driver dropped


def test_cli_missing_source_fails_cleanly(artifacts, capsys):
    rc = main(["--mode", "pre_season", "--warehouse", artifacts["wh"]])
    assert rc == 5  # every dim failed, exit code = failed-table count
    assert "--source-zip required" in capsys.readouterr().out


def test_cli_curate(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "curated")
    rc = main(["--curate", sf_dir, "--out", out])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_curated"] > 0
    assert spark.read.parquet(out + "/corpus").count() == stats["n_curated"]


def test_cli_curate_requires_out(capsys):
    with pytest.raises(SystemExit):
        main(["--curate", "/tmp/x"])
    assert "--curate requires --out" in capsys.readouterr().err


def test_cli_profile(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "profile")
    rc = main(["--profile", f"{sf_dir}/orders.parquet", "--out", out])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert report["*.n_rows"] == n_orders
    assert report["o_orderkey.n_distinct"] == n_orders
    assert report["o_orderkey.null_frac"] == 0.0
    assert spark.read.parquet(out).count() == len(report)
