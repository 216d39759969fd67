"""Family (Group) builder — reference ``entity_builders/family.py:22-122``.

The A1 aggregation (``family.py:28-47``): group by (study, family), take the
first species and the distinct participant list. Spark expresses it as
``groupBy().agg(min(species), sort_array(collect_set(participant)))`` —
``sort_array`` replaces pandas' insertion-order ``unique()`` for determinism
(SURVEY.md §7). Member Patient references are computed inline from the
participant IDs via ``transform`` — the reference's per-member
``get_target_id_from_record`` loop (``family.py:100-113``) with zero lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders.base import (
    DATASERVICE,
    col,
    family_id,
    finalize,
    identifiers,
    meta,
    patient_id_from,
    surrogate_id,
)
from kf_task_fhir_etl_spark.functions.json_build import string_or_null
from kf_task_fhir_etl_spark.functions.recode import recode

CLASS_NAME = "family"
API_PATH = "Group"

# species → Group.type, default "person" (family.py:14-19,78); species values
# from the public kf-lib-data-ingest constants.SPECIES namespace
TYPE_CODE = {
    "Canis lupus familiaris": "animal",
    "Drosophila melanogaster": "animal",
    "Homo Sapiens": "person",
    "Mus musculus": "animal",
}


def build(wide: DataFrame) -> DataFrame:
    grouped = (
        wide.filter(col("FAMILY|TARGET_SERVICE_ID").isNotNull())
        .groupBy(
            col("STUDY|TARGET_SERVICE_ID").alias("study_id"),
            col("FAMILY|TARGET_SERVICE_ID").alias("fam_id"),
        )
        .agg(
            F.min(col("PARTICIPANT|SPECIES")).alias("species"),
            F.min(col("FAMILY|ID")).alias("external_id"),
            F.sort_array(F.collect_set(col("PARTICIPANT|TARGET_SERVICE_ID"))).alias("participant_ids"),
        )
    )

    member = F.transform(
        F.col("participant_ids"),
        lambda pid: F.struct(
            F.struct(F.concat(F.lit("Patient/"), patient_id_from(pid)).alias("reference")).alias("entity"),
            F.lit(False).alias("inactive"),
        ),
    )

    fam = F.col("fam_id")
    external_id = string_or_null(F.col("external_id"))
    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        surrogate_id("family", fam).alias("id"),
        meta(f"http://hl7.org/fhir/StructureDefinition/{API_PATH}", F.col("study_id")).alias("meta"),
        identifiers(f"{DATASERVICE}/families/", fam, external_id).alias("identifier"),
        recode(F.col("species"), TYPE_CODE, default="person").alias("type"),
        F.lit(True).alias("actual"),
        F.struct(
            F.array(
                F.struct(
                    F.lit("http://terminology.hl7.org/CodeSystem/v3-RoleCode").alias("system"),
                    F.lit("FAMMEMB").alias("code"),
                    F.lit("family member").alias("display"),
                )
            ).alias("coding")
        ).alias("code"),
        F.when(F.size(member) > 0, F.size(member)).alias("quantity"),
        F.when(F.size(member) > 0, member).alias("member"),
    )
    return finalize(
        grouped.select(
            surrogate_id("family", fam).alias("target_id"),
            resource.alias("resource"),
        ),
        API_PATH,
    )
