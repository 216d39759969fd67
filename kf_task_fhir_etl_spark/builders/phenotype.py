"""Phenotype (Condition) builder — reference ``entity_builders/phenotype.py:38-154``.

Observed→verification-status recode (``phenotype.py:13-24``), HPO/SNOMED
codings behind missing-data sentinel gates (``phenotype.py:96-111``),
birth-relative ``_recordedDate`` extension (``phenotype.py:114-148``).
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
    phenotype_id,
    reference,
)
from kf_task_fhir_etl_spark.functions.json_build import (
    not_missing,
    relative_date_extension,
    string_or_null,
)
from kf_task_fhir_etl_spark.functions.recode import recode_coding_array

CLASS_NAME = "phenotype"
API_PATH = "Condition"

_VER_STATUS = "http://terminology.hl7.org/CodeSystem/condition-ver-status"
# observed Positive/Negative → confirmed/refuted (phenotype.py:13-24)
VERIFICATION_STATUS_CODING = {
    "Positive": (_VER_STATUS, "confirmed", "Confirmed"),
    "Negative": (_VER_STATUS, "refuted", "Refuted"),
}


def plan(wide: DataFrame):
    study_id = col("STUDY|TARGET_SERVICE_ID")
    phen_id = col("PHENOTYPE|TARGET_SERVICE_ID")
    observed = col("PHENOTYPE|OBSERVED")
    name = col("PHENOTYPE|NAME")
    hpo_id = string_or_null(col("PHENOTYPE|HPO_ID"))
    snomed_id = string_or_null(col("PHENOTYPE|SNOMED_ID"))
    event_age_days = col("PHENOTYPE|EVENT_AGE_DAYS")

    ver_coding = recode_coding_array(observed, VERIFICATION_STATUS_CODING)

    code_codings = F.filter(
        F.array(
            F.when(
                not_missing(hpo_id),
                F.struct(F.lit("http://purl.obolibrary.org/obo/hp.owl").alias("system"), hpo_id.alias("code")),
            ),
            F.when(
                not_missing(snomed_id),
                F.struct(F.lit("http://snomed.info/sct").alias("system"), snomed_id.alias("code")),
            ),
        ),
        lambda x: x.isNotNull(),
    )

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        phenotype_id().alias("id"),
        meta("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/phenotype", study_id).alias("meta"),
        identifiers(f"{DATASERVICE}/phenotypes/", phen_id).alias("identifier"),
        reference("Patient", patient_id()).alias("subject"),
        # verificationStatus emitted unconditionally with text=observed
        # (phenotype.py:88-94, even when observed is null)
        F.struct(ver_coding.alias("coding"), observed.alias("text")).alias("verificationStatus"),
        F.struct(
            F.when(F.size(code_codings) > 0, code_codings).alias("coding"),
            name.alias("text"),
        ).alias("code"),
        relative_date_extension(event_age_days).alias("_recordedDate"),
    )
    return phenotype_id(), resource, col("PARTICIPANT|TARGET_SERVICE_ID").isNotNull()


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
