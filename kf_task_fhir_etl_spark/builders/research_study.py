"""ResearchStudy builder — reference ``entity_builders/research_study.py:33-121``.

dbGaP accession rebuild (F3 prefix predicates + C2 split, ``research_study.py:76-86``),
category recode incl. the composite ``CANCERANDBIRTHDEFECT`` → two codings
(``research_study.py:92-104``), keyword accumulation, principal-investigator
reference (inline PractitionerRole ID).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders.base import (
    DATASERVICE,
    col,
    build_from_plan,
    identifier,
    meta,
    non_empty_array,
    practitioner_role_id,
    reference,
    research_study_id,
)
from kf_task_fhir_etl_spark.functions.json_build import string_or_null
from kf_task_fhir_etl_spark.functions.strings import dbgap_accession

CLASS_NAME = "research_study"
API_PATH = "ResearchStudy"

STATUS_CODE = "completed"

# domain → snomed coding; reference ``research_study.py:14-30``
_SNOMED = "http://snomed.info/sct"
CATEGORY_CODING = {
    "BIRTHDEFECT": (_SNOMED, "276720006", "Dysmorphism (disorder)"),
    "CANCER": (_SNOMED, "86049000", "Malignant neoplasm, primary (morphologic abnormality)"),
    "COVID19": (_SNOMED, "840539006", "Disease caused by Severe acute respiratory syndrome coronavirus 2"),
}


def _coding_struct(key: str) -> Column:
    system, code, display = CATEGORY_CODING[key]
    return F.struct(F.lit(system).alias("system"), F.lit(code).alias("code"), F.lit(display).alias("display"))


def _category_codings(domain: Column) -> Column:
    """coding list per domain; composite CANCERANDBIRTHDEFECT emits both
    (reference ``research_study.py:96-102``); unmapped domains → null (text only)."""
    expr = None
    for key in CATEGORY_CODING:
        arr = F.array(_coding_struct(key))
        expr = F.when(domain == key, arr) if expr is None else expr.when(domain == key, arr)
    return expr.when(
        domain == "CANCERANDBIRTHDEFECT", F.array(_coding_struct("CANCER"), _coding_struct("BIRTHDEFECT"))
    )


def plan(wide: DataFrame):
    study_id = col("STUDY|TARGET_SERVICE_ID")
    external_id = string_or_null(col("STUDY|ID"))
    version = col("STUDY|VERSION")
    study_name = string_or_null(col("STUDY|NAME"))
    domain = string_or_null(col("STUDY|DOMAIN"))
    program = string_or_null(col("STUDY|PROGRAM"))
    short_code = string_or_null(col("STUDY|SHORT_CODE"))
    investigator_id = col("INVESTIGATOR|TARGET_SERVICE_ID")

    # identifier: official + dbGaP secondary only for phs-prefixed IDs
    official = identifier("official", study_id, f"{DATASERVICE}/studies/")
    dbgap = F.when(
        external_id.isNotNull() & external_id.startswith("phs"),
        identifier(
            "secondary",
            dbgap_accession(external_id, version),
            "https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/study.cgi?study_id=",
        ),
    )
    ident = F.filter(F.array(official, dbgap), lambda x: x.isNotNull())

    category = F.when(
        domain.isNotNull(),
        F.array(F.struct(_category_codings(domain).alias("coding"), domain.alias("text"))),
    )

    keyword = non_empty_array(
        F.array(
            F.when(program.isNotNull(), F.struct(F.array(F.struct(program.alias("code"))).alias("coding"))),
            F.when(short_code.isNotNull(), F.struct(F.array(F.struct(short_code.alias("code"))).alias("coding"))),
        )
    )

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        research_study_id().alias("id"),
        meta(f"http://hl7.org/fhir/StructureDefinition/{API_PATH}", study_id).alias("meta"),
        ident.alias("identifier"),
        F.lit(STATUS_CODE).alias("status"),
        study_name.alias("title"),
        category.alias("category"),
        keyword.alias("keyword"),
        F.when(investigator_id.isNotNull(), reference("PractitionerRole", practitioner_role_id())).alias(
            "principalInvestigator"
        ),
    )
    return research_study_id(), resource, None


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
