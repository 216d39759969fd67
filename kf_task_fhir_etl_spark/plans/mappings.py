"""Declarative schema system: the reference's 14 rename maps.

The reference renames each Dataservice endpoint table's columns into a flat
``"ENTITY|ATTRIBUTE"`` concept namespace (reference ``etl/ingest.py:147-477``;
the CONCEPT attributes serialize to these flat pipe-delimited strings — the
reference mixes them freely with literals like ``"STUDY|DOMAIN"`` and
``"GENOMIC_FILE|LATEST_DID"`` in the same maps, ``etl/ingest.py:152-158,423``).

Spark expression: ``rename_to_concepts`` is a single ``select`` with aliases —
rename-by-select keeps Catalyst's column pruning intact through the join
cascade (a ``withColumnRenamed`` chain would too, but one select is one
projection node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Dropped from every endpoint table before transform (reference ``etl/ingest.py:121``).
AUDIT_COLUMNS = ("uuid", "created_at", "modified_at")

# endpoint → {source column: concept column}; one dict per reference rename map.
MAPPINGS: dict[str, dict[str, str]] = {
    # reference etl/ingest.py:147-163
    "studies": {
        "investigator_id": "INVESTIGATOR|TARGET_SERVICE_ID",
        "attribution": "STUDY|ATTRIBUTION",
        "data_access_authority": "STUDY|AUTHORITY",
        "domain": "STUDY|DOMAIN",
        "external_id": "STUDY|ID",
        "kf_id": "STUDY|TARGET_SERVICE_ID",
        "name": "STUDY|NAME",
        "program": "STUDY|PROGRAM",
        "release_status": "STUDY|RELEASE_STATUS",
        "short_code": "STUDY|SHORT_CODE",
        "short_name": "STUDY|SHORT_NAME",
        "version": "STUDY|VERSION",
        "visible": "STUDY|VISIBLE",
    },
    # reference etl/ingest.py:169-177
    "investigators": {
        "external_id": "INVESTIGATOR|ID",
        "institution": "INVESTIGATOR|INSTITUTION",
        "kf_id": "INVESTIGATOR|TARGET_SERVICE_ID",
        "name": "INVESTIGATOR|NAME",
        "visible": "INVESTIGATOR|VISIBLE",
    },
    # reference etl/ingest.py:195-210
    "participants": {
        "family_id": "FAMILY|TARGET_SERVICE_ID",
        "study_id": "STUDY|TARGET_SERVICE_ID",
        "affected_status": "PARTICIPANT|IS_AFFECTED_UNDER_STUDY",
        "diagnosis_category": "STUDY|CATEGORY",
        "ethnicity": "PARTICIPANT|ETHNICITY",
        "external_id": "PARTICIPANT|ID",
        "gender": "PARTICIPANT|GENDER",
        "is_proband": "PARTICIPANT|IS_PROBAND",
        "kf_id": "PARTICIPANT|TARGET_SERVICE_ID",
        "race": "PARTICIPANT|RACE",
        "species": "PARTICIPANT|SPECIES",
        "visible": "PARTICIPANT|VISIBLE",
    },
    # reference etl/ingest.py:228-234
    "families": {
        "external_id": "FAMILY|ID",
        "kf_id": "FAMILY|TARGET_SERVICE_ID",
        "visible": "FAMILY|VISIBLE",
    },
    # reference etl/ingest.py:246-255
    "family-relationships": {
        "participant1_id": "FAMILY_RELATIONSHIP|PERSON1|TARGET_SERVICE_ID",
        "participant2_id": "FAMILY_RELATIONSHIP|PERSON2|TARGET_SERVICE_ID",
        "external_id": "FAMILY_RELATIONSHIP|ID",
        "kf_id": "FAMILY_RELATIONSHIP|TARGET_SERVICE_ID",
        "participant1_to_participant2_relation": "FAMILY_RELATIONSHIP|RELATION_FROM_1_TO_2",
        "visible": "FAMILY_RELATIONSHIP|VISIBLE",
    },
    # reference etl/ingest.py:264-280
    "diagnoses": {
        "external_id": "DIAGNOSIS|ID",
        "source_text_diagnosis": "DIAGNOSIS|NAME",
        "diagnosis_category": "DIAGNOSIS|CATEGORY",
        "source_text_tumor_location": "DIAGNOSIS|TUMOR_LOCATION",
        "age_at_event_days": "DIAGNOSIS|EVENT_AGE_DAYS",
        "mondo_id_diagnosis": "DIAGNOSIS|MONDO_ID",
        "icd_id_diagnosis": "DIAGNOSIS|ICD_ID",
        "uberon_id_tumor_location": "DIAGNOSIS|UBERON_TUMOR_LOCATION_ID",
        "ncit_id_diagnosis": "DIAGNOSIS|NCIT_ID",
        "spatial_descriptor": "DIAGNOSIS|SPATIAL_DESCRIPTOR",
        "participant_id": "PARTICIPANT|TARGET_SERVICE_ID",
        "kf_id": "DIAGNOSIS|TARGET_SERVICE_ID",
        "visible": "DIAGNOSIS|VISIBLE",
    },
    # reference etl/ingest.py:292-304
    "phenotypes": {
        "external_id": "PHENOTYPE|ID",
        "source_text_phenotype": "PHENOTYPE|NAME",
        "hpo_id_phenotype": "PHENOTYPE|HPO_ID",
        "snomed_id_phenotype": "PHENOTYPE|SNOMED_ID",
        "observed": "PHENOTYPE|OBSERVED",
        "age_at_event_days": "PHENOTYPE|EVENT_AGE_DAYS",
        "participant_id": "PARTICIPANT|TARGET_SERVICE_ID",
        "kf_id": "PHENOTYPE|TARGET_SERVICE_ID",
        "visible": "PHENOTYPE|VISIBLE",
    },
    # reference etl/ingest.py:316-326
    "outcomes": {
        "participant_id": "PARTICIPANT|TARGET_SERVICE_ID",
        "age_at_event_days": "OUTCOME|EVENT_AGE_DAYS",
        "disease_related": "OUTCOME|DISEASE_RELATED",
        "external_id": "OUTCOME|ID",
        "kf_id": "OUTCOME|TARGET_SERVICE_ID",
        "visible": "OUTCOME|VISIBLE",
        "vital_status": "OUTCOME|VITAL_STATUS",
    },
    # reference etl/ingest.py:338-346
    "biospecimen-diagnoses": {
        "biospecimen_id": "BIOSPECIMEN|TARGET_SERVICE_ID",
        "diagnosis_id": "DIAGNOSIS|TARGET_SERVICE_ID",
        "external_id": "BIOSPECIMEN_DIAGNOSIS|ID",
        "kf_id": "BIOSPECIMEN_DIAGNOSIS|TARGET_SERVICE_ID",
        "visible": "BIOSPECIMEN_DIAGNOSIS|VISIBLE",
    },
    # reference etl/ingest.py:357-380
    "biospecimens": {
        "participant_id": "PARTICIPANT|TARGET_SERVICE_ID",
        "sequencing_center_id": "SEQUENCING|CENTER|TARGET_SERVICE_ID",
        "age_at_event_days": "BIOSPECIMEN|EVENT_AGE_DAYS",
        "analyte_type": "BIOSPECIMEN|ANALYTE",
        "composition": "BIOSPECIMEN|COMPOSITION",
        "consent_type": "BIOSPECIMEN|CONSENT_SHORT_NAME",
        "dbgap_consent_code": "BIOSPECIMEN|DBGAP_STYLE_CONSENT_CODE",
        "external_aliquot_id": "BIOSPECIMEN|ID",
        "external_sample_id": "BIOSPECIMEN_GROUP|ID",
        "kf_id": "BIOSPECIMEN|TARGET_SERVICE_ID",
        "method_of_smaple_procurement": "BIOSPECIMEN|SAMPLE_PROCUREMENT",
        "ncit_id_anatomical_site": "BIOSPECIMEN|NCIT_ANATOMY_SITE_ID",
        "ncit_id_tissue_type": "BIOSPECIMEN|NCIT_TISSUE_TYPE_ID",
        "source_text_anatomical_site": "BIOSPECIMEN|ANATOMY_SITE",
        "source_text_tissue_type": "BIOSPECIMEN|TISSUE_TYPE",
        "source_text_tumor_descriptor": "BIOSPECIMEN|TUMOR_DESCRIPTOR",
        "spatial_descriptor": "BIOSPECIMEN|SPATIAL_DESCRIPTOR",
        "uberon_id_anatomical_site": "BIOSPECIMEN|UBERON_ANATOMY_SITE_ID",
        "visible": "BIOSPECIMEN|VISIBLE",
        "volume_ul": "BIOSPECIMEN|VOLUME_UL",
    },
    # reference etl/ingest.py:402-410
    "biospecimen-genomic-files": {
        "genomic_file_id": "GENOMIC_FILE|TARGET_SERVICE_ID",
        "biospecimen_id": "BIOSPECIMEN|TARGET_SERVICE_ID",
        "kf_id": "BIOSPECIMEN_GENOMIC_FILE|TARGET_SERVICE_ID",
        "visible": "BIOSPECIMEN_GENOMIC_FILE|VISIBLE",
        "external_id": "BIOSPECIMEN_GENOMIC_FILE|ID",
    },
    # reference etl/ingest.py:421-434
    "genomic-files": {
        "latest_did": "GENOMIC_FILE|LATEST_DID",
        "external_id": "GENOMIC_FILE|ID",
        "data_type": "GENOMIC_FILE|DATA_TYPE",
        "file_format": "GENOMIC_FILE|FILE_FORMAT",
        "is_harmonized": "GENOMIC_FILE|HARMONIZED",
        "reference_genome": "GENOMIC_FILE|REFERENCE_GENOME",
        "controlled_access": "GENOMIC_FILE|CONTROLLED_ACCESS",
        "availability": "GENOMIC_FILE|AVAILABILITY",
        "kf_id": "GENOMIC_FILE|TARGET_SERVICE_ID",
        "visible": "GENOMIC_FILE|VISIBLE",
    },
    # reference etl/ingest.py:448-456
    "sequencing-experiment-genomic-files": {
        "external_id": "SEQUENCING_GENOMIC_FILE|ID",
        "sequencing_experiment_id": "SEQUENCING|TARGET_SERVICE_ID",
        "genomic_file_id": "GENOMIC_FILE|TARGET_SERVICE_ID",
        "kf_id": "SEQUENCING_GENOMIC_FILE|TARGET_SERVICE_ID",
        "visible": "SEQUENCING_GENOMIC_FILE|VISIBLE",
    },
    # reference etl/ingest.py:470-477
    "sequencing-experiments": {
        "experiment_strategy": "SEQUENCING|STRATEGY",
        "external_id": "SEQUENCING|ID",
        "kf_id": "SEQUENCING|TARGET_SERVICE_ID",
        "visible": "SEQUENCING|VISIBLE",
    },
}


def rename_to_concepts(
    df: DataFrame, endpoint: str, drop_audit: bool = True, pad_missing: bool = True
) -> DataFrame:
    """Apply one endpoint's rename map as a single projection.

    Unmapped source columns ride along unrenamed, exactly like
    ``pd.DataFrame.rename`` in the reference (they are pruned later by
    Catalyst if no builder touches them). With ``pad_missing`` (default),
    mapped concept columns whose source column is absent are added as typed
    nulls — the builders assume the full Dataservice endpoint schema
    (reference record dicts always carry every column), so partial inputs
    behave as all-null rather than failing analysis.
    """
    mapping = MAPPINGS[endpoint]
    cols = []
    for name in df.columns:
        if drop_audit and name in AUDIT_COLUMNS:
            continue
        cols.append(F.col(f"`{name}`").alias(mapping.get(name, name)))
    if pad_missing:
        present = set(df.columns)
        for source, concept in mapping.items():
            if source not in present:
                cols.append(F.lit(None).cast("string").alias(concept))
    return df.select(cols)


# Columns whose PRESENCE (not value) changes builder semantics — the
# DRSDocumentReference A2 aggregation widens its grouping key when sequencing
# experiments were joined (reference ``drs_document_reference.py:170-206``) —
# so they must never be padded in.
DYNAMIC_PRESENCE_COLUMNS = ("SEQUENCING|TARGET_SERVICE_ID", "SEQUENCING|STRATEGY")


def pad_concepts(
    df: DataFrame, exclude: tuple[str, ...] = DYNAMIC_PRESENCE_COLUMNS
) -> DataFrame:
    """Add every known concept column absent from ``df`` as a null string.

    The builders reference cross-entity columns unconditionally (e.g. the
    Disease builder reads STUDY|TARGET_SERVICE_ID); on a partial-presence
    wide table those columns don't exist and analysis would fail. Padding
    them null reproduces what the full cascade yields for unjoined rows —
    and Catalyst prunes any padded column no builder touches, so the extra
    width is plan-only."""
    known = {concept for mapping in MAPPINGS.values() for concept in mapping.values()}
    missing = sorted(known - set(df.columns) - set(exclude))
    if not missing:
        return df
    return df.select("*", *[F.lit(None).cast("string").alias(c) for c in missing])
