from kf_task_fhir_etl_spark.sources import jdbc, lineage, rest, sinks

__all__ = ["jdbc", "lineage", "rest", "sinks"]
