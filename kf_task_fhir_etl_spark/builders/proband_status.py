"""ProbandStatus (Observation) builder — reference ``entity_builders/proband_status.py:30-99``.

Domain assertion F7 (``proband_status.py:40``): only rows with is_proband in
{"True","False"} yield resources (the reference raises/skips otherwise — here
a filter). The reference's ``bool(proband_status)`` at ``proband_status.py:63``
is a Python truthiness bug (``bool("False") is True``), reproduced faithfully
for parity: the identifier value is JSON ``true`` whenever the status string
is non-empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders.base import (
    col,
    build_from_plan,
    meta,
    patient_id,
    proband_status_id,
    reference,
)

CLASS_NAME = "proband_status"
API_PATH = "Observation"

STATUS_CODE = "final"

_V2_0136 = "http://terminology.hl7.org/CodeSystem/v2-0136"
# reference ``proband_status.py:16-27``
VALUE_CODING = {"True": ("Y", "Yes"), "False": ("N", "No")}


def plan(wide: DataFrame):
    study_id = col("STUDY|TARGET_SERVICE_ID")
    proband = col("PARTICIPANT|IS_PROBAND")

    value_coding = None
    for key, (code, display) in VALUE_CODING.items():
        c = F.struct(F.lit(_V2_0136).alias("system"), F.lit(code).alias("code"), F.lit(display).alias("display"))
        value_coding = F.when(proband == key, c) if value_coding is None else value_coding.when(proband == key, c)

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        proband_status_id().alias("id"),
        meta(f"http://hl7.org/fhir/StructureDefinition/{API_PATH}", study_id).alias("meta"),
        F.array(
            F.struct(
                F.lit("official").alias("use"),
                F.lit("https://kf-api-dataservice.kidsfirstdrc.org/participants?is_proband=").alias("system"),
                # bool("False") is True — reproduced (proband_status.py:63)
                F.lit(True).alias("value"),
            )
        ).alias("identifier"),
        F.lit(STATUS_CODE).alias("status"),
        F.struct(
            F.array(
                F.struct(
                    F.lit("http://snomed.info/sct").alias("system"),
                    F.lit("85900004").alias("code"),
                    F.lit("Proband (finding)").alias("display"),
                )
            ).alias("coding"),
            F.lit("Proband status").alias("text"),
        ).alias("code"),
        reference("Patient", patient_id()).alias("subject"),
        F.struct(
            F.array(value_coding).alias("coding"),
            proband.alias("text"),
        ).alias("valueCodeableConcept"),
    )
    # F7 proband-domain gate: only literal "True"/"False" build a resource
    return proband_status_id(), resource, proband.isin("True", "False")


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
