from kf_task_fhir_etl_spark.plans.mappings import AUDIT_COLUMNS, MAPPINGS, rename_to_concepts
from kf_task_fhir_etl_spark.plans.transform import TransformResult, transform_study

__all__ = ["AUDIT_COLUMNS", "MAPPINGS", "rename_to_concepts", "TransformResult", "transform_study"]
