"""ResearchSubject builder — reference ``entity_builders/research_subject.py:18-72``.

Composite reference key (study + individual, ``research_subject.py:24-31``)
computed inline from the deterministic ID expressions.
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
    patient_id,
    reference,
    research_study_id,
    research_subject_id,
)
from kf_task_fhir_etl_spark.functions.json_build import string_or_null

CLASS_NAME = "research_subject"
API_PATH = "ResearchSubject"

STATUS_CODE = "off-study"


def plan(wide: DataFrame):
    study_id = col("STUDY|TARGET_SERVICE_ID")
    participant_id = col("PARTICIPANT|TARGET_SERVICE_ID")
    external_id = string_or_null(col("PARTICIPANT|ID"))

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        research_subject_id().alias("id"),
        meta(f"http://hl7.org/fhir/StructureDefinition/{API_PATH}", study_id).alias("meta"),
        identifiers(f"{DATASERVICE}/participants/", participant_id, external_id).alias("identifier"),
        F.lit(STATUS_CODE).alias("status"),
        reference("ResearchStudy", research_study_id()).alias("study"),
        reference("Patient", patient_id()).alias("individual"),
    )
    return research_subject_id(), resource, None


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
