"""E1 — CLI smoke: ``fhir-etl SD_00000001 --source DIR --out DIR`` runs the
snapshot → pipeline → ordered-load path end-to-end (reference
``app/cli.py:11-29``). Invoked in-process via click's CliRunner (a subprocess
would pay a second 20 s SparkSession; the surface under test — argument
parsing, snapshot wiring, sink calls — is identical)."""

from __future__ import annotations

import json
import os

from click.testing import CliRunner

from tests.fixtures import endpoint_tables


def test_cli_fhir_etl_end_to_end(spark, tmp_path):
    from kf_task_fhir_etl_spark.app.cli import cli
    from kf_task_fhir_etl_spark.plans.transform import ALL_TARGETS

    source = tmp_path / "source"
    source.mkdir()
    for endpoint, df in endpoint_tables(spark).items():
        df.write.parquet(str(source / f"{endpoint}.parquet"))
    out = tmp_path / "out"

    runner = CliRunner()
    result = runner.invoke(
        cli, ["fhir-etl", "SD_00000001", "--source", str(source), "--out", str(out)]
    )
    assert result.exit_code == 0, result.output

    study_out = out / "SD_00000001"
    written = sorted(os.listdir(study_out))
    assert "Patient" in written and "ResearchStudy" in written
    # load order is the fixed dependency order, echoed by the CLI
    echoed = result.output.split("SD_00000001: ")[-1].strip().split(", ")
    assert echoed == [t for t in ALL_TARGETS if t in echoed]

    patients = spark.read.parquet(str(study_out / "Patient"))
    rows = patients.collect()
    assert rows and set(patients.columns) == {"resource_type", "target_id", "resource_json"}
    assert all(json.loads(r["resource_json"])["resourceType"] == "Patient" for r in rows)

    # idempotent re-run: the keyed MERGE sink replaces, never duplicates
    result2 = runner.invoke(
        cli, ["fhir-etl", "SD_00000001", "--source", str(source), "--out", str(out)]
    )
    assert result2.exit_code == 0, result2.output
    assert spark.read.parquet(str(study_out / "Patient")).count() == len(rows)


def test_cli_unknown_study_fails(spark, tmp_path):
    from kf_task_fhir_etl_spark.app.cli import cli

    source = tmp_path / "source"
    source.mkdir()
    for endpoint, df in endpoint_tables(spark).items():
        df.write.parquet(str(source / f"{endpoint}.parquet"))

    result = CliRunner().invoke(
        cli, ["fhir-etl", "SD_MISSING", "--source", str(source), "--out", str(tmp_path / "o")]
    )
    assert result.exit_code != 0
    assert "SD_MISSING not found" in str(result.exception)
