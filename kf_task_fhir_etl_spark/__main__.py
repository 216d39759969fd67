"""``python -m kf_task_fhir_etl_spark fhir-etl SD_X --source DIR --out DIR``."""

from kf_task_fhir_etl_spark.app.cli import cli

if __name__ == "__main__":
    cli()
