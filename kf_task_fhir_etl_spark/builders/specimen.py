"""Specimen builder — reference ``entity_builders/specimen.py:438-638``, the
largest lookup surface in the reference:

- ~70-entry composition→NCIT/OBI coding map (``specimen.py:16-362``),
- analyte DNA/RNA→OBI (``specimen.py:365-376``),
- collection-method→SNOMED (``specimen.py:379-435``),
- meta.security consent codes (``specimen.py:497-511``),
- prefix-dispatched body-site coding systems NCIT:/UBERON:/EFO:
  (``specimen.py:535,614-627``),
- birth-relative ``_collectedDateTime`` + float volume quantity with
  swallowed-cast semantics (``specimen.py:552-597``).

All maps are inline literal ``F.when`` chains — constant-folded, codegen'd,
no shuffle. Plain-string dict keys from the kf-lib-data-ingest constants
namespace are inlined at their public values.
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
    patient_id,
    reference,
    specimen_id,
)
from kf_task_fhir_etl_spark.functions.json_build import relative_date_extension, string_or_null, try_cast
from kf_task_fhir_etl_spark.functions.recode import recode_coding

CLASS_NAME = "specimen"
API_PATH = "Specimen"

STATUS_CODE = "unavailable"

_NCIT = "http://purl.obolibrary.org/obo/ncit.owl"
_OBI = "http://purl.obolibrary.org/obo/obi.owl"
_SNOMED = "http://snomed.info/sct"

# composition value → (system, code, display); reference ``specimen.py:16-362``
COMPOSITION: dict[str, tuple[str, str, str]] = {
    "Amniocytes": (_NCIT, "C118138", "Reactive Amniocyte"),
    "amniotic fluid": (_NCIT, "C13188", " Amniotic Fluid"),
    "blood": (_NCIT, "C17610", "Blood Sample"),
    "Blood": (_NCIT, "C17610", "Blood Sample"),
    "Blood Derived Cancer - Bone Marrow, Post-treatment": (_NCIT, "C164009", "Bone Marrow Sample"),
    "Blood Derived Cancer - Peripheral Blood, Post-treatment": (_NCIT, "C173496", "Peripheral Blood"),
    "Blood EDTA": (_NCIT, "C158462", "EDTA Blood Cell Fraction"),
    "Blood-Lymphocyte": (_NCIT, "C12535", "Lymphocyte"),
    "bone": (_NCIT, "C12366", "Bone"),
    "Bone": (_NCIT, "C12366", "Bone"),
    "Bone marrow": (_NCIT, "C164009", "Bone Marrow Sample"),
    "Bone Marrow": (_NCIT, "C164009", "Bone Marrow Sample"),
    "brain": (_NCIT, "C12439", "Brain"),
    "Brain Tissue": (_NCIT, "C12439", "Brain"),
    "Buccal": (_NCIT, "C172264", "Buccal Cell Sample"),
    "Buccal Cell Normal": (_NCIT, "C172264", "Buccal Cell Sample"),
    "Buccal Swab": (_NCIT, "C113747", "Buccal Swab"),
    "Buccal Mucosa": (_NCIT, "C12505", "Buccal Mucosa"),
    "Buffy Coat": (_NCIT, "C84507", "Buffy Coat"),
    "Cartilage": (_NCIT, "C12373", "Cartilage"),
    "Cell Freeze": (_NCIT, "C12508", "Cell"),
    "Cells": (_NCIT, "C12508", "Cell"),
    "Cerebral Spinal Fluid": (_NCIT, "C185194", "Cerebrospinal Fluid Sample"),
    "Cheek Swab": (_NCIT, "C113747", "Buccal Swab"),
    "chest wall": (_NCIT, "C62484", "Chest Wall"),
    "Cyst Fluid": (_NCIT, "C2978", "Cyst"),
    "DNA": (_OBI, "OBI:0001051", "DNA extract"),
    "dura": (_NCIT, "C32488", "Dura Mater"),
    "Epstein-Barr Virus Immortalized Cells": (_NCIT, "C163993", "EBV Immortalized Lymphocytes"),
    "Fetal Tissue Liver": (_NCIT, "C34169", "Fetal Liver"),
    "Fetal Tissue Unspecified": (_NCIT, "C17730", "Fetal Tissue"),
    "Fibroblast": (_NCIT, "C12482", "Fibroblast"),
    "Fibroblasts": (_NCIT, "C12482", "Fibroblast"),
    "Fibroblasts from Bone Marrow Normal": (_NCIT, "C12482", "Fibroblast"),
    "groin": (_NCIT, "C12726", "Inguinal Region"),
    "Hair": (_NCIT, "C32705", "Hair"),
    "Derived Cell Line": (_NCIT, "C156445", "Derived Cell Line"),
    "LCL": (_NCIT, "C32941", "Lateral Ligament"),
    "Leukocyte": (_NCIT, "C12529", "Leukocyte"),
    "lung": (_NCIT, "C33024", "Lung Tissue"),
    "lymph node": (_NCIT, "C12745", "Lymph Node"),
    "Lymphocytes": (_NCIT, "C12535", "Lymphocyte"),
    "marrow": (_NCIT, "C164009", "Bone Marrow Sample"),
    "mediastinum": (_NCIT, "C12748", "Mediastinum"),
    "Mononuclear Cells": (_NCIT, "C178965", "Peripheral Blood Mononuclear Cell Sample"),
    "muscle": (_NCIT, "C12435", "Muscle Tissue"),
    "Muscle": (_NCIT, "C12435", "Muscle Tissue"),
    "Myocyte": (_NCIT, "C12612", "Muscle Cell"),
    "Negative Lymph Node": (_NCIT, "C36174", "Negative Lymph Node"),
    "Patient Derived Xenograft": (_NCIT, "C122936", "Patient Derived Xenograft"),
    "PBMC": (_NCIT, "C178965", "Peripheral Blood Mononuclear Cell Sample"),
    "Peripheral blood": (_NCIT, "C173496", "Peripheral Blood"),
    "Peripheral Whole Blood": (_NCIT, "C173496", "Peripheral Blood"),
    "Plasma": (_NCIT, "C185204", "Plasma Sample"),
    "Primary Blood Derived Cancer - Bone Marrow": (_NCIT, "C164009", "Bone Marrow Sample"),
    "Primary Blood Derived Cancer - Peripheral Blood": (_NCIT, "C173496", "Peripheral Blood"),
    "Recurrent Blood Derived Cancer - Peripheral Blood": (_NCIT, "C173496", "Peripheral Blood"),
    "saliva": (_NCIT, "C174119", "Saliva Sample"),
    "Saliva": (_NCIT, "C174119", "Saliva Sample"),
    "Serum": (_NCIT, "C178987", "Serum Sample"),
    "skin": (_NCIT, "C33563", "Skin Tissue"),
    "Solid Tissue": (_NCIT, "C164014", "Solid Tissue Specimen"),
    "Tissue Cell Culture": (_NCIT, "C17201", "Tissue Culture"),
    "Tissue FFPE": (_NCIT, "C172265", "Formalin-Fixed Paraffin-Embedded Tissue Sample"),
    "Tissue Flash Frozen": (_NCIT, "C158417", "Frozen Tissue"),
    "Tissue Freezing Media": (_NCIT, "C158417", "Frozen Tissue"),
    "Tissue Perineum": (_NCIT, "C33301", "Perineum"),
    "Tumor": (_NCIT, "C18009", "Tumor Tissue"),
    "Vascular tissue": (_NCIT, "C33853", "Vascular Smooth Muscle Tissue"),
}

# analyte → OBI coding; reference ``specimen.py:365-376``
ANALYTE_TYPE = {
    "DNA": (_OBI, "OBI:0001051", "DNA extract"),
    "RNA": (_OBI, "OBI:0000880", "RNA extract"),
}

# procurement → SNOMED coding; reference ``specimen.py:379-435``
COLLECTION_METHOD = {
    "Autopsy": (_SNOMED, "29240004", "Autopsy examination (procedure)"),
    "Biopsy": (_SNOMED, "86273004", "Biopsy (procedure)"),
    "Blood Collection - Maternal": (_SNOMED, "396540005", "Phlebotomy (procedure)"),
    "Blood Collection - Paternal": (_SNOMED, "396540005", "Phlebotomy (procedure)"),
    "Blood Collection - Proband": (_SNOMED, "396540005", "Phlebotomy (procedure)"),
    "Blood Draw": (_SNOMED, "396540005", "Phlebotomy (procedure)"),
    "Bone Marrow Aspiration": (_SNOMED, "49401003", "Bone marrow aspiration procedure (procedure)"),
    "Saliva Collection - Maternal": (_SNOMED, "225098009", "Collection of sample of saliva (procedure)"),
    "Saliva Collection - Paternal": (_SNOMED, "225098009", "Collection of sample of saliva (procedure)"),
    "Saliva Collection - Proband": (_SNOMED, "225098009", "Collection of sample of saliva (procedure)"),
    "Surgical Resections": (_SNOMED, "65801008", "Excision (procedure)"),
}

_CODING_T = "struct<system:string,code:string,display:string>"

_lookup_coding = recode_coding


def plan(wide: DataFrame):
    study_id = col("STUDY|TARGET_SERVICE_ID")
    biospecimen_id = col("BIOSPECIMEN|TARGET_SERVICE_ID")
    consent_type = string_or_null(col("BIOSPECIMEN|CONSENT_SHORT_NAME"))
    dbgap_consent_code = string_or_null(col("BIOSPECIMEN|DBGAP_STYLE_CONSENT_CODE"))
    external_sample_id = string_or_null(col("BIOSPECIMEN_GROUP|ID"))
    external_aliquot_id = string_or_null(col("BIOSPECIMEN|ID"))
    tissue_type = string_or_null(col("BIOSPECIMEN|TISSUE_TYPE"))
    composition = col("BIOSPECIMEN|COMPOSITION")
    analyte = col("BIOSPECIMEN|ANALYTE")
    ncit_tissue = string_or_null(col("BIOSPECIMEN|NCIT_TISSUE_TYPE_ID"))
    event_age_days = col("BIOSPECIMEN|EVENT_AGE_DAYS")
    volume_ul = col("BIOSPECIMEN|VOLUME_UL")
    procurement = string_or_null(col("BIOSPECIMEN|SAMPLE_PROCUREMENT"))
    anatomy_site = string_or_null(col("BIOSPECIMEN|ANATOMY_SITE"))
    uberon_site = string_or_null(col("BIOSPECIMEN|UBERON_ANATOMY_SITE_ID"))
    ncit_site = string_or_null(col("BIOSPECIMEN|NCIT_ANATOMY_SITE_ID"))

    # meta with conditional security labels (specimen.py:497-511)
    security = F.filter(
        F.array(
            F.when(
                consent_type.isNotNull(),
                F.struct(
                    F.lit(f"{DATASERVICE}/biospecimens?consent_type=").alias("system"),
                    consent_type.alias("code"),
                ),
            ),
            F.when(
                dbgap_consent_code.isNotNull(),
                F.struct(
                    F.lit(f"{DATASERVICE}/biospecimens?dbgap_consent_code=").alias("system"),
                    dbgap_consent_code.alias("code"),
                ),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    meta_struct = F.struct(
        F.array(F.lit(f"http://hl7.org/fhir/StructureDefinition/{API_PATH}")).alias("profile"),
        F.array(F.struct(study_id.alias("code"))).alias("tag"),
        F.when(F.size(security) > 0, security).alias("security"),
    )

    # identifier: official + two query-param-system secondaries (specimen.py:513-529)
    ident = F.filter(
        F.array(
            identifier("official", biospecimen_id, f"{DATASERVICE}/biospecimens/"),
            F.when(
                external_sample_id.isNotNull(),
                identifier("secondary", external_sample_id, f"{DATASERVICE}/biospecimens?external_sample_id="),
            ),
            F.when(
                external_aliquot_id.isNotNull(),
                identifier("secondary", external_aliquot_id, f"{DATASERVICE}/biospecimens?external_aliquot_id="),
            ),
        ),
        lambda x: x.isNotNull(),
    )

    # type: text + NCIT tissue / composition / analyte codings (specimen.py:531-547)
    type_codings = F.filter(
        F.array(
            F.when(
                ncit_tissue.isNotNull() & ncit_tissue.startswith("NCIT:"),
                F.struct(F.lit(_NCIT).alias("system"), ncit_tissue.alias("code"), F.lit(None).cast("string").alias("display")),
            ),
            _lookup_coding(composition, COMPOSITION),
            _lookup_coding(analyte, ANALYTE_TYPE),
        ),
        lambda x: x.isNotNull(),
    )
    specimen_type = F.when(
        tissue_type.isNotNull() | (F.size(type_codings) > 0),
        F.struct(
            tissue_type.alias("text"),
            F.when(F.size(type_codings) > 0, type_codings).alias("coding"),
        ),
    )

    # collection block (specimen.py:549-632)
    volume = try_cast(volume_ul, "double")
    quantity = F.when(
        volume.isNotNull(),
        F.struct(
            volume.alias("value"),
            F.lit("microliters").alias("unit"),
            F.lit("http://unitsofmeasure.org").alias("system"),
            F.lit("uL").alias("code"),
        ),
    )
    method_coding = _lookup_coding(procurement, COLLECTION_METHOD)
    method = F.when(
        procurement.isNotNull(),
        F.struct(
            F.when(method_coding.isNotNull(), F.array(method_coding)).alias("coding"),
            procurement.alias("text"),
        ),
    )
    # bodySite: uberon/EFO prefix-dispatched system + NCIT coding (specimen.py:610-629)
    uberon_coding = F.when(
        uberon_site.isNotNull(),
        F.struct(
            F.when(uberon_site.startswith("UBERON:"), F.lit("http://purl.obolibrary.org/obo/uberon.owl"))
            .when(uberon_site.startswith("EFO:"), F.lit("http://www.ebi.ac.uk/efo/efo.owl"))
            .alias("system"),
            uberon_site.alias("code"),
        ),
    )
    ncit_site_coding = F.when(
        ncit_site.isNotNull() & ncit_site.startswith("NCIT:"),
        F.struct(F.lit(_NCIT).alias("system"), ncit_site.alias("code")),
    )
    body_site_codings = F.filter(F.array(uberon_coding, ncit_site_coding), lambda x: x.isNotNull())
    body_site = F.when(
        anatomy_site.isNotNull() | (F.size(body_site_codings) > 0),
        F.struct(
            anatomy_site.alias("text"),
            F.when(F.size(body_site_codings) > 0, body_site_codings).alias("coding"),
        ),
    )

    collected = relative_date_extension(event_age_days)
    collection = F.when(
        collected.isNotNull() | quantity.isNotNull() | method.isNotNull() | body_site.isNotNull(),
        F.struct(
            collected.alias("_collectedDateTime"),
            quantity.alias("quantity"),
            method.alias("method"),
            body_site.alias("bodySite"),
        ),
    )

    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        specimen_id().alias("id"),
        meta_struct.alias("meta"),
        ident.alias("identifier"),
        F.lit(STATUS_CODE).alias("status"),
        reference("Patient", patient_id()).alias("subject"),
        specimen_type.alias("type"),
        collection.alias("collection"),
    )
    # not_none(Patient ref) parity (specimen.py:487-494)
    return specimen_id(), resource, col("PARTICIPANT|TARGET_SERVICE_ID").isNotNull()


def build(wide: DataFrame) -> DataFrame:
    return build_from_plan(plan, wide, API_PATH)
