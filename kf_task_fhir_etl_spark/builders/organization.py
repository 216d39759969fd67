"""Organization builder — reference ``entity_builders/organization.py:11-53``."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders.base import (
    DATASERVICE,
    col,
    build_from_plan,
    identifiers,
    meta,
    organization_id,
)
from kf_task_fhir_etl_spark.functions.json_build import string_or_null

CLASS_NAME = "organization"
API_PATH = "Organization"


def plan(wide: DataFrame):
    kf_id = col("INVESTIGATOR|TARGET_SERVICE_ID")
    institution = string_or_null(col("INVESTIGATOR|INSTITUTION"))

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        organization_id().alias("id"),
        meta(f"http://hl7.org/fhir/StructureDefinition/{API_PATH}").alias("meta"),
        identifiers(f"{DATASERVICE}/investigators/", kf_id).alias("identifier"),
        F.lit(True).alias("active"),
        institution.alias("name"),
    )
    return organization_id(), resource, None


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
