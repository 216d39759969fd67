"""Practitioner builder — reference ``entity_builders/practitioner.py:11-63``.

Keyed by INVESTIGATOR|TARGET_SERVICE_ID; flat resource with official/secondary
identifiers, ``active: true``, optional ``name`` array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders.base import (
    DATASERVICE,
    col,
    build_from_plan,
    identifiers,
    meta,
    practitioner_id,
)
from kf_task_fhir_etl_spark.functions.json_build import string_or_null

CLASS_NAME = "practitioner"
API_PATH = "Practitioner"


def plan(wide: DataFrame):
    kf_id = col("INVESTIGATOR|TARGET_SERVICE_ID")
    external_id = string_or_null(col("INVESTIGATOR|ID"))
    name = string_or_null(col("INVESTIGATOR|NAME"))

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        practitioner_id().alias("id"),
        meta(f"http://hl7.org/fhir/StructureDefinition/{API_PATH}").alias("meta"),
        identifiers(f"{DATASERVICE}/investigators/", kf_id, external_id).alias("identifier"),
        F.lit(True).alias("active"),
        F.when(name.isNotNull(), F.array(F.struct(name.alias("text")))).alias("name"),
    )
    return practitioner_id(), resource, None


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
