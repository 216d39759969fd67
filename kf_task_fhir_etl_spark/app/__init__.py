from kf_task_fhir_etl_spark.app.cli import cli

__all__ = ["cli"]
