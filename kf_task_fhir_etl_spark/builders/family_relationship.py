"""FamilyRelationship (Observation) builder — reference
``entity_builders/family_relationship.py:310-404``.

Runs over the SEPARATE family_relationship table (reference
``etl/ingest.py:256-258``), not the wide table. Subject/focus are double
Patient references computed inline from participant1/participant2
(``family_relationship.py:376-391``). The ~60-entry relation→v3-RoleCode map
(``family_relationship.py:16-307``) is an inline literal recode.

Deviation note: the reference reads ``record[CONCEPT.PROJECT.ID]`` for the
study tag (``family_relationship.py:330``) — a column the FR rename map never
produces; we omit the meta tag instead of reproducing the broken read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders.base import (
    DATASERVICE,
    coded_concept,
    col,
    family_relationship_id,
    finalize,
    identifiers,
    meta,
    patient_id_from,
)
from kf_task_fhir_etl_spark.functions.json_build import string_or_null
from kf_task_fhir_etl_spark.functions.recode import recode_coding_array

CLASS_NAME = "family_relationship"
API_PATH = "Observation"

STATUS_CODE = "final"

_ROLE = "http://terminology.hl7.org/CodeSystem/v3-RoleCode"
_NULL_FLAVOR = "http://terminology.hl7.org/CodeSystem/v3-NullFlavor"

# relation value → (system, code, display); reference ``family_relationship.py:16-307``
CODE_CODING: dict[str, tuple[str, str, str]] = {
    "Aunt": (_ROLE, "AUNT", "aunt"),
    "Brother": (_ROLE, "BRO", "brother"),
    "Brother-in-law": (_ROLE, "BROINLAW", "brother-in-law"),
    "Brother-Monozygotic Twin": (_ROLE, "TWINBRO", "twin brother"),
    "Child": (_ROLE, "CHILD", "child"),
    "Cousin": (_ROLE, "COUSN", "cousin"),
    "Daughter": (_ROLE, "DAUC", "daughter"),
    "father": (_ROLE, "FTH", "father"),
    "Father": (_ROLE, "FTH", "father"),
    "First cousin once removed": (_ROLE, "EXT", "extended family member"),
    "Grandchild": (_ROLE, "GRNDCHILD", "grandchild"),
    "Granddaughter": (_ROLE, "GRNDDAU", "granddaughter"),
    "Grandfather": (_ROLE, "GRFTH", "grandfather"),
    "Grandmother": (_ROLE, "GRMTH", "grandmother"),
    "Grandson": (_ROLE, "GRNDSON", "grandson"),
    "Great Nephew": (_ROLE, "EXT", "extended family member"),
    "Husband": (_ROLE, "HUSB", "husband"),
    "Married in aunt": (_ROLE, "EXT", "extended family member"),
    "Married in Husband": (_ROLE, "HUSB", "husband"),
    "Married in-Spouse": (_ROLE, "SPS", "spouse"),
    "Maternal aunt": (_ROLE, "MAUNT", "maternal aunt"),
    "Maternal Aunt": (_ROLE, "MAUNT", "maternal aunt"),
    "Maternal cousin": (_ROLE, "MCOUSN", "maternal cousin"),
    "Maternal Cousin": (_ROLE, "MCOUSN", "maternal cousin"),
    "Maternal grandfather": (_ROLE, "MGRFTH", "maternal grandfather"),
    "Maternal Granddaughter": (_ROLE, "GRNDDAU", "granddaughter"),
    "Maternal Grandfather": (_ROLE, "MGRFTH", "maternal grandfather"),
    "Maternal grandmother": (_ROLE, "MGRMTH", "maternal grandmother"),
    "Maternal Grandmother": (_ROLE, "MGRMTH", "maternal grandmother"),
    "Maternal great aunt": (_ROLE, "EXT", "extended family member"),
    "Maternal Great Aunt": (_ROLE, "EXT", "extended family member"),
    "Maternal Great Grandmother": (_ROLE, "MGGRMTH", "maternal great-grandmother"),
    "Maternal Great Uncle": (_ROLE, "EXT", "extended family member"),
    "Maternal half-sister": (_ROLE, "EXT", "extended family member"),
    "Maternal Relation": (_ROLE, "EXT", "extended family member"),
    "Maternal uncle": (_ROLE, "MUNCLE", "maternal uncle"),
    "mother": (_ROLE, "MTH", "mother"),
    "Mother": (_ROLE, "MTH", "mother"),
    "Nephew": (_ROLE, "NEPHEW", "nephew"),
    "Niece": (_ROLE, "NIECE", "niece"),
    "Paternal aunt": (_ROLE, "PAUNT", "paternal aunt"),
    "Paternal cousin": (_ROLE, "PCOUSN", "paternal cousin"),
    "Paternal Cousin": (_ROLE, "PCOUSN", "paternal cousin"),
    "Paternal grandfather": (_ROLE, "PGRFTH", "paternal grandfather"),
    "Paternal grandmother": (_ROLE, "PGRMTH", "paternal grandmother"),
    "Paternal Grandmother": (_ROLE, "PGRMTH", "paternal grandmother"),
    "Paternal uncle": (_ROLE, "PUNCLE", "paternal uncle"),
    "Proband": (_ROLE, "CHILD", "child"),
    "Sibling": (_ROLE, "SIB", "sibling"),
    "Sister": (_ROLE, "SIS", "sister"),
    "Son": (_ROLE, "SONC", "son"),
    "Spouse": (_ROLE, "SPS", "spouse"),
    "Twin Brother": (_ROLE, "TWINBRO", "twin brother"),
    "Twin Sister": (_ROLE, "TWINSIS", "twin sister"),
    "Uncle": (_ROLE, "UNCLE", "uncle"),
    "Uncle-married in": (_ROLE, "EXT", "extended family member"),
    "Wife": (_ROLE, "WIFE", "wife"),
    "Other": (_NULL_FLAVOR, "OTH", "other"),
}


def build(family_relationship: DataFrame) -> DataFrame:
    # not_none parity for subject/focus (family_relationship.py:376-391)
    family_relationship = family_relationship.filter(
        col("FAMILY_RELATIONSHIP|PERSON1|TARGET_SERVICE_ID").isNotNull()
        & col("FAMILY_RELATIONSHIP|PERSON2|TARGET_SERVICE_ID").isNotNull()
    )
    fr_id = col("FAMILY_RELATIONSHIP|TARGET_SERVICE_ID")
    external_id = string_or_null(col("FAMILY_RELATIONSHIP|ID"))
    p1 = col("FAMILY_RELATIONSHIP|PERSON1|TARGET_SERVICE_ID")
    p2 = col("FAMILY_RELATIONSHIP|PERSON2|TARGET_SERVICE_ID")
    relation = string_or_null(col("FAMILY_RELATIONSHIP|RELATION_FROM_1_TO_2"))

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        family_relationship_id().alias("id"),
        meta("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/family-relationship").alias("meta"),
        identifiers(f"{DATASERVICE}/family-relationships/", fr_id, external_id).alias("identifier"),
        F.lit(STATUS_CODE).alias("status"),
        F.struct(
            F.array(
                F.struct(
                    F.lit(_ROLE).alias("system"),
                    F.lit("FAMMEMB").alias("code"),
                    F.lit("family member").alias("display"),
                )
            ).alias("coding"),
            F.lit("Family Relationship").alias("text"),
        ).alias("code"),
        F.struct(F.concat(F.lit("Patient/"), patient_id_from(p1)).alias("reference")).alias("subject"),
        F.array(F.struct(F.concat(F.lit("Patient/"), patient_id_from(p2)).alias("reference"))).alias("focus"),
        coded_concept(relation, recode_coding_array(relation, CODE_CODING)).alias("valueCodeableConcept"),
    )
    return finalize(
        family_relationship.select(family_relationship_id().alias("target_id"), resource.alias("resource")),
        API_PATH,
    )
