"""CLI entry point — E1 parity with the reference's click surface
(reference ``app/cli.py:11-29``: ``kidsfirst fhir-etl SD_X SD_Y`` →
``Ingest(kf_study_ids).run()``).

The Spark engine's run is the same three stages the reference drives —
snapshot → transform/build → dependency-ordered load — with the extract and
load ends swapped for engine-mode equivalents:

- **extract**: instead of a live Dataservice Postgres (no JDBC jar in this
  container; the Derby round-trip in ``tests/test_sources_sinks.py`` proves
  the S1/S2 scan path), the snapshot reads a directory of endpoint parquet
  tables (``studies.parquet``, ``participants.parquet``, …) and applies the
  S3 descendant fan-out (``sources.lineage.descendant_snapshot``) per study.
- **load**: keyed idempotent parquet MERGE per target
  (``sources.sinks.keyed_parquet_upsert``), or the S8 FHIR REST upsert when
  ``--fhir-url`` is given (reference ``kf_api_fhir_service.py:37-94``).
"""

from __future__ import annotations

import os

import click

from kf_task_fhir_etl_spark import __version__

CONTEXT_SETTINGS = {"help_option_names": ["-h", "--help"]}


@click.group(context_settings=CONTEXT_SETTINGS)
@click.version_option(version=__version__)
def cli() -> None:
    pass


@click.command()
@click.argument("kf_study_ids", required=True, nargs=-1)
@click.option(
    "--source",
    "source_dir",
    required=True,
    type=click.Path(exists=True, file_okay=False),
    help="Directory of endpoint parquet tables (the Dataservice snapshot in engine form).",
)
@click.option(
    "--out",
    "out_dir",
    default=None,
    type=click.Path(file_okay=False),
    help="Output directory: one keyed parquet table per <study>/<target>. Required unless --fhir-url.",
)
@click.option(
    "--fhir-url",
    default=None,
    help="Load via FHIR REST upsert (PUT-else-POST) against this base URL instead of parquet.",
)
def fhir_etl(kf_study_ids: tuple[str, ...], source_dir: str, out_dir: str | None, fhir_url: str | None) -> None:
    """Ingest a Kids First study(ies) into the engine sink or a FHIR server.

    \b
    Arguments:
        \b
        KF_STUDY_IDS - a KF study ID(s) concatenated by whitespace, e.g., SD_BHJXBDQK SD_M3DBXD12
    """
    if out_dir is None and fhir_url is None:
        raise click.UsageError("one of --out or --fhir-url is required")

    from kf_task_fhir_etl_spark.etl import run_pipeline
    from kf_task_fhir_etl_spark.plans.transform import ALL_TARGETS
    from kf_task_fhir_etl_spark.session import get_spark
    from kf_task_fhir_etl_spark.sources.lineage import descendant_snapshot
    from kf_task_fhir_etl_spark.sources.sinks import (
        default_submit,
        fhir_upsert_sink,
        keyed_parquet_upsert,
        load_all,
    )

    spark = get_spark("kf-task-fhir-etl")
    tables = {
        fname[: -len(".parquet")]: spark.read.parquet(os.path.join(source_dir, fname))
        for fname in sorted(os.listdir(source_dir))
        if fname.endswith(".parquet")
    }

    for kf_study_id in kf_study_ids:
        click.echo(f"⏳ {kf_study_id}")
        snapshot = descendant_snapshot(tables, kf_study_id, strict=True)
        resources = run_pipeline(snapshot)
        ordered = [t for t in ALL_TARGETS if t in resources]

        if fhir_url is not None:
            def write(target: str, df) -> None:
                fhir_upsert_sink(df, fhir_url, default_submit)
        else:
            def write(target: str, df) -> None:
                keyed_parquet_upsert(
                    spark, df, os.path.join(out_dir, kf_study_id, target), "target_id"
                )

        written = load_all(resources, ordered, write)
        click.echo(f"✅ {kf_study_id}: {', '.join(written)}")


cli.add_command(fhir_etl)
