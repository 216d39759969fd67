"""SequencingCenter (Organization) builder — reference
``entity_builders/sequencing_center.py:25-69``.

The reference builds its KF_ID→NAME map by introspecting the public
kf-lib-data-ingest ``constants.SEQUENCING.CENTER`` classes
(``sequencing_center.py:12-22``). That library isn't vendored here, so the
map is a configurable module-level dict seeded with representative public
entries; callers can pass their own via ``build(wide, names=...)``.
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
    sequencing_center_id,
)
from kf_task_fhir_etl_spark.functions.recode import recode

CLASS_NAME = "sequencing_center"
API_PATH = "Organization"

# KF_ID → NAME, the shape produced by the reference's class introspection
# over constants.SEQUENCING.CENTER (sequencing_center.py:12-22).
SEQUENCING_CENTER_NAME: dict[str, str] = {
    "SC_DGDDMBVV": "Broad Institute",
    "SC_X1N69WJM": "Baylor College of Medicine",
    "SC_K52V7463": "Washington University",
    "SC_WWEQ9HFY": "HudsonAlpha Institute for Biotechnology",
    "SC_FN7NH453": "St Jude Children's Research Hospital",
}


def plan(wide: DataFrame, names: dict[str, str] | None = None):
    sc_id = col("SEQUENCING|CENTER|TARGET_SERVICE_ID")
    name = recode(sc_id, names or SEQUENCING_CENTER_NAME)

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        sequencing_center_id().alias("id"),
        meta(f"http://hl7.org/fhir/StructureDefinition/{API_PATH}").alias("meta"),
        identifiers(f"{DATASERVICE}/sequencing-centers/", sc_id).alias("identifier"),
        name.alias("name"),
    )
    return sequencing_center_id(), resource, None


def build(wide: DataFrame, names: dict[str, str] | None = None) -> DataFrame:
    return build_from_plan(lambda w: plan(w, names), wide, API_PATH)
