"""Patient builder — reference ``entity_builders/patient.py:118-198``.

The canonical builder shape: official/secondary identifiers, per-study meta
tag, US Core race/ethnicity extensions (dict-lookup recodes into OMB coding
structs, ``patient.py:12-105``), administrative gender recode
(``patient.py:108-115``). All native column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders.base import (
    DATASERVICE,
    col,
    build_from_plan,
    identifiers,
    meta,
    patient_id,
)
from kf_task_fhir_etl_spark.functions.json_build import string_or_null
from kf_task_fhir_etl_spark.functions.recode import recode, recode_coding

CLASS_NAME = "patient"
API_PATH = "Patient"

_OMB_SYSTEM = "urn:oid:2.16.840.1.113883.6.238"
_NULL_FLAVOR = "http://terminology.hl7.org/CodeSystem/v3-NullFlavor"

# value → (system, code, display); reference ``patient.py:12-77``
OMB_RACE_CATEGORY = {
    "American Indian or Alaska Native": (_OMB_SYSTEM, "1002-5", "American Indian or Alaska Native"),
    "Asian": (_OMB_SYSTEM, "2028-9", "Asian"),
    "Black or African American": (_OMB_SYSTEM, "2054-5", "Black or African American"),
    "Native Hawaiian or Other Pacific Islander": (_OMB_SYSTEM, "2076-8", "Native Hawaiian or Other Pacific Islander"),
    "White": (_OMB_SYSTEM, "2106-3", "White"),
    "Other": (_NULL_FLAVOR, "OTH", "other"),
    "Not Available": (_NULL_FLAVOR, "NAVU", "not available"),
    "Unknown": (_NULL_FLAVOR, "UNK", "unknown"),
}

# reference ``patient.py:80-105``
OMB_ETHNICITY_CATEGORY = {
    "Hispanic or Latino": (_OMB_SYSTEM, "2135-2", "Hispanic or Latino"),
    "Not Hispanic or Latino": (_OMB_SYSTEM, "2186-5", "Not Hispanic or Latino"),
    "Unknown": (_NULL_FLAVOR, "UNK", "unknown"),
}

# reference ``patient.py:108-115``
ADMINISTRATIVE_GENDER = {
    "Male": "male",
    "Female": "female",
    "Unknown": "unknown",
    "Other": "other",
}

_CODING_T = "struct<system:string,code:string,display:string>"


def _us_core_extension(value: Column, url: str, mapping: dict[str, tuple[str, str, str]]) -> Column:
    """The us-core-race/ethnicity extension: a ``text`` sub-extension always,
    plus an ``ombCategory`` sub-extension when the value recodes
    (reference ``patient.py:166-192``). Absent entirely when value is null."""
    omb = recode_coding(value, mapping)
    text_elem = F.struct(
        F.lit("text").alias("url"),
        value.alias("valueString"),
        F.lit(None).cast(_CODING_T).alias("valueCoding"),
    )
    omb_elem = F.when(
        omb.isNotNull(),
        F.struct(
            F.lit("ombCategory").alias("url"),
            F.lit(None).cast("string").alias("valueString"),
            omb.alias("valueCoding"),
        ),
    )
    return F.when(
        value.isNotNull(),
        F.struct(
            F.lit(url).alias("url"),
            F.filter(F.array(text_elem, omb_elem), lambda x: x.isNotNull()).alias("extension"),
        ),
    )


def plan(wide: DataFrame):
    study_id = col("STUDY|TARGET_SERVICE_ID")
    participant_id = col("PARTICIPANT|TARGET_SERVICE_ID")
    external_id = string_or_null(col("PARTICIPANT|ID"))
    race = string_or_null(col("PARTICIPANT|RACE"))
    ethnicity = string_or_null(col("PARTICIPANT|ETHNICITY"))
    gender = string_or_null(col("PARTICIPANT|GENDER"))

    race_ext = _us_core_extension(
        race, "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race", OMB_RACE_CATEGORY
    )
    ethnicity_ext = _us_core_extension(
        ethnicity, "http://hl7.org/fhir/us/core/StructureDefinition/us-core-ethnicity", OMB_ETHNICITY_CATEGORY
    )
    extension = F.filter(F.array(race_ext, ethnicity_ext), lambda x: x.isNotNull())

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        patient_id().alias("id"),
        meta(f"http://hl7.org/fhir/StructureDefinition/{API_PATH}", study_id).alias("meta"),
        identifiers(f"{DATASERVICE}/participants/", participant_id, external_id).alias("identifier"),
        F.when(F.size(extension) > 0, extension).alias("extension"),
        recode(gender, ADMINISTRATIVE_GENDER).alias("gender"),
    )
    return patient_id(), resource, None


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
