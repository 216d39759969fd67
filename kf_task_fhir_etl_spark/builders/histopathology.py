"""Histopathology (Observation) builder — reference
``entity_builders/histopathology.py:28-126``.

Three-way inline references (Patient subject, Condition focus, Specimen
specimen, ``histopathology.py:91-117``); tumor-descriptor value gated on the
histopathology missing-data sentinel variant (``histopathology.py:19-25``).
Only built when biospecimen-diagnoses joined (reference ``etl/ingest.py:389-391``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders.base import (
    DATASERVICE,
    col,
    disease_id,
    build_from_plan,
    histopathology_id,
    identifiers,
    meta,
    patient_id,
    reference,
    specimen_id,
)
from kf_task_fhir_etl_spark.functions.json_build import (
    HISTOPATHOLOGY_MISSING_VALUES,
    not_missing,
    string_or_null,
)

CLASS_NAME = "histopathology"
API_PATH = "Observation"

STATUS_CODE = "final"


def plan(wide: DataFrame):
    study_id = col("STUDY|TARGET_SERVICE_ID")
    bd_id = col("BIOSPECIMEN_DIAGNOSIS|TARGET_SERVICE_ID")
    tumor_descriptor = string_or_null(col("BIOSPECIMEN|TUMOR_DESCRIPTOR"))

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        histopathology_id().alias("id"),
        meta(f"http://hl7.org/fhir/StructureDefinition/{API_PATH}", study_id).alias("meta"),
        identifiers(f"{DATASERVICE}/biospecimen-diagnoses/", bd_id).alias("identifier"),
        F.lit(STATUS_CODE).alias("status"),
        F.array(
            F.struct(
                F.array(
                    F.struct(
                        F.lit("http://terminology.hl7.org/CodeSystem/observation-category").alias("system"),
                        F.lit("laboratory").alias("code"),
                        F.lit("Laboratory").alias("display"),
                    )
                ).alias("coding"),
                F.lit("Histopathology").alias("text"),
            )
        ).alias("category"),
        F.struct(
            F.array(
                F.struct(
                    F.lit("http://snomed.info/sct").alias("system"),
                    F.lit("250537006").alias("code"),
                    F.lit("Histopathology finding (finding)").alias("display"),
                )
            ).alias("coding"),
            F.lit("Histopathology").alias("text"),
        ).alias("code"),
        reference("Patient", patient_id()).alias("subject"),
        F.array(reference("Condition", disease_id())).alias("focus"),
        reference("Specimen", specimen_id()).alias("specimen"),
        F.when(
            not_missing(tumor_descriptor, HISTOPATHOLOGY_MISSING_VALUES),
            F.struct(tumor_descriptor.alias("text")),
        ).alias("valueCodeableConcept"),
    )
    # not_none parity for all three references (histopathology.py:91-117):
    # a record missing any of subject/focus/specimen is skipped, never
    # emitted with a null element
    return histopathology_id(), resource, (
        col("PARTICIPANT|TARGET_SERVICE_ID").isNotNull()
        & col("DIAGNOSIS|TARGET_SERVICE_ID").isNotNull()
        & col("BIOSPECIMEN|TARGET_SERVICE_ID").isNotNull()
    )


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
