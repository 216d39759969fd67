"""VitalStatus (Observation) builder — reference ``entity_builders/vital_status.py:29-134``.

Keyed by OUTCOME|TARGET_SERVICE_ID; birth-relative ``_effectiveDateTime``
extension (C6) with swallowed-cast semantics; vital-status recode to SNOMED
codings (``vital_status.py:15-26``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders.base import (
    DATASERVICE,
    coded_concept,
    col,
    build_from_plan,
    identifiers,
    meta,
    patient_id,
    reference,
    vital_status_id,
)
from kf_task_fhir_etl_spark.functions.json_build import relative_date_extension, string_or_null
from kf_task_fhir_etl_spark.functions.recode import recode_coding_array

CLASS_NAME = "vital_status"
API_PATH = "Observation"

STATUS_CODE = "final"

_SNOMED = "http://snomed.info/sct"
# reference ``vital_status.py:15-26``
CODE_CODING = {
    "Alive": (_SNOMED, "438949009", "Alive (finding)"),
    "Deceased": (_SNOMED, "419099009", "Dead (finding)"),
}


def plan(wide: DataFrame):
    study_id = col("STUDY|TARGET_SERVICE_ID")
    outcome_id = col("OUTCOME|TARGET_SERVICE_ID")
    vital_status = string_or_null(col("OUTCOME|VITAL_STATUS"))
    event_age_days = col("OUTCOME|EVENT_AGE_DAYS")

    value_coding = recode_coding_array(vital_status, CODE_CODING)

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        vital_status_id().alias("id"),
        meta("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/vital-status", study_id).alias("meta"),
        identifiers(f"{DATASERVICE}/outcomes/", outcome_id).alias("identifier"),
        F.lit(STATUS_CODE).alias("status"),
        F.struct(
            F.array(
                F.struct(
                    F.lit(_SNOMED).alias("system"),
                    F.lit("263493007").alias("code"),
                    F.lit("Clinical status (attribute)").alias("display"),
                )
            ).alias("coding"),
            F.lit("Clinical status").alias("text"),
        ).alias("code"),
        reference("Patient", patient_id()).alias("subject"),
        relative_date_extension(event_age_days).alias("_effectiveDateTime"),
        coded_concept(vital_status, value_coding).alias("valueCodeableConcept"),
    )
    # not_none(Patient ref) parity (vital_status.py:73-80): records without
    # a resolvable subject are skipped, not emitted
    return vital_status_id(), resource, col("PARTICIPANT|TARGET_SERVICE_ID").isNotNull()


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
