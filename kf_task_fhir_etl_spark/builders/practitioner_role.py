"""PractitionerRole builder — reference ``entity_builders/practitioner_role.py:16-82``.

Composite reference key (practitioner + organization, ``practitioner_role.py:21-28``):
with deterministic surrogate IDs both references are inline expressions — no
re-entrant lookup, no join.
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
    organization_id,
    practitioner_id,
    practitioner_role_id,
    reference,
)
from kf_task_fhir_etl_spark.functions.json_build import string_or_null

CLASS_NAME = "practitioner_role"
API_PATH = "PractitionerRole"


def plan(wide: DataFrame):
    kf_id = col("INVESTIGATOR|TARGET_SERVICE_ID")
    external_id = string_or_null(col("INVESTIGATOR|ID"))

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        practitioner_role_id().alias("id"),
        meta(f"http://hl7.org/fhir/StructureDefinition/{API_PATH}").alias("meta"),
        identifiers(f"{DATASERVICE}/investigators/", kf_id, external_id).alias("identifier"),
        F.lit(True).alias("active"),
        reference("Practitioner", practitioner_id()).alias("practitioner"),
        reference("Organization", organization_id()).alias("organization"),
        F.array(
            F.struct(
                F.array(
                    F.struct(
                        F.lit("http://terminology.hl7.org/CodeSystem/practitioner-role").alias("system"),
                        F.lit("researcher").alias("code"),
                        F.lit("Researcher").alias("display"),
                    )
                ).alias("coding")
            )
        ).alias("code"),
    )
    return practitioner_role_id(), resource, None


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
