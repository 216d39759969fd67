"""Disease (Condition) builder — reference ``entity_builders/disease.py:38-200``.

Missing-data sentinel gates (F2, ``disease.py:26-35``) on every ontology
coding; verification-status recode (``disease.py:13-24``); birth-relative
``_recordedDate`` extension with swallowed-cast semantics (``disease.py:160-194``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders.base import (
    DATASERVICE,
    coded_concept,
    col,
    disease_id,
    build_from_plan,
    identifiers,
    meta,
    patient_id,
    reference,
)
from kf_task_fhir_etl_spark.functions.json_build import (
    not_missing,
    relative_date_extension,
    string_or_null,
)
from kf_task_fhir_etl_spark.functions.recode import recode_coding_array

CLASS_NAME = "disease"
API_PATH = "Condition"

_VER_STATUS = "http://terminology.hl7.org/CodeSystem/condition-ver-status"
# reference ``disease.py:13-24``
VERIFICATION_STATUS_CODING = {
    "True": (_VER_STATUS, "confirmed", "Confirmed"),
    "False": (_VER_STATUS, "refuted", "Refuted"),
}

_CODING_T = "struct<system:string,code:string>"


def _ontology_coding(value: Column, system: str) -> Column:
    """One {system, code} coding, absent when the value is a missing-data
    sentinel (disease.py:123-143)."""
    return F.when(not_missing(value), F.struct(F.lit(system).alias("system"), value.alias("code")))


def plan(wide: DataFrame):
    study_id = col("STUDY|TARGET_SERVICE_ID")
    diagnosis_id = col("DIAGNOSIS|TARGET_SERVICE_ID")
    affected_status = string_or_null(col("PARTICIPANT|IS_AFFECTED_UNDER_STUDY"))
    name = col("DIAGNOSIS|NAME")
    mondo_id = string_or_null(col("DIAGNOSIS|MONDO_ID"))
    icd_id = string_or_null(col("DIAGNOSIS|ICD_ID"))
    ncit_id = string_or_null(col("DIAGNOSIS|NCIT_ID"))
    tumor_location = string_or_null(col("DIAGNOSIS|TUMOR_LOCATION"))
    uberon_id = string_or_null(col("DIAGNOSIS|UBERON_TUMOR_LOCATION_ID"))
    event_age_days = col("DIAGNOSIS|EVENT_AGE_DAYS")

    ver_coding = recode_coding_array(affected_status, VERIFICATION_STATUS_CODING)

    code_codings = F.filter(
        F.array(
            _ontology_coding(mondo_id, "http://purl.obolibrary.org/obo/mondo.owl"),
            _ontology_coding(icd_id, "https://www.who.int/classifications/classification-of-diseases"),
            _ontology_coding(ncit_id, "http://purl.obolibrary.org/obo/ncit.owl"),
        ),
        lambda x: x.isNotNull(),
    )

    body_site_codings = F.filter(
        F.array(_ontology_coding(uberon_id, "http://purl.obolibrary.org/obo/uberon.owl")),
        lambda x: x.isNotNull(),
    )
    body_site = F.when(
        tumor_location.isNotNull() | (F.size(body_site_codings) > 0),
        F.array(
            F.struct(
                F.when(F.size(body_site_codings) > 0, body_site_codings).alias("coding"),
                tumor_location.alias("text"),
            )
        ),
    )

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        disease_id().alias("id"),
        meta("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/disease", study_id).alias("meta"),
        identifiers(f"{DATASERVICE}/diagnoses/", diagnosis_id).alias("identifier"),
        F.struct(
            F.array(
                F.struct(
                    F.lit("http://terminology.hl7.org/CodeSystem/condition-clinical").alias("system"),
                    F.lit("active").alias("code"),
                    F.lit("Active").alias("display"),
                )
            ).alias("coding"),
            F.lit("Active").alias("text"),
        ).alias("clinicalStatus"),
        F.array(
            F.struct(
                F.array(
                    F.struct(
                        F.lit("http://terminology.hl7.org/CodeSystem/condition-category").alias("system"),
                        F.lit("encounter-diagnosis").alias("code"),
                        F.lit("Encounter Diagnosis").alias("display"),
                    )
                ).alias("coding")
            )
        ).alias("category"),
        reference("Patient", patient_id()).alias("subject"),
        coded_concept(affected_status, ver_coding).alias("verificationStatus"),
        # code is emitted unconditionally with text=name (disease.py:122-144)
        F.struct(
            F.when(F.size(code_codings) > 0, code_codings).alias("coding"),
            name.alias("text"),
        ).alias("code"),
        body_site.alias("bodySite"),
        relative_date_extension(event_age_days).alias("_recordedDate"),
    )
    return disease_id(), resource, col("PARTICIPANT|TARGET_SERVICE_ID").isNotNull()


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
