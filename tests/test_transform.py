"""Transform-cascade property tests (SURVEY.md §5.3)."""

from __future__ import annotations

import pytest

from kf_task_fhir_etl_spark.plans.transform import ALL_TARGETS, transform_study

from .fixtures import endpoint_tables


@pytest.fixture(scope="module")
def transformed(spark):
    return transform_study(endpoint_tables(spark))


def test_outputs_and_targets(transformed):
    assert set(transformed.tables) == {"default", "family_relationship"}
    # all 16 targets active for the full fixture set, in dependency order
    assert transformed.targets == list(ALL_TARGETS)


def test_wide_table_row_provenance(transformed):
    wide = transformed.tables["default"]
    rows = wide.collect()
    participants = {r["PARTICIPANT|TARGET_SERVICE_ID"] for r in rows}
    assert {"PT_00000001", "PT_00000002", "PT_00000003"} <= participants
    diagnoses = {r["DIAGNOSIS|TARGET_SERVICE_ID"] for r in rows}
    assert {"DG_00000001", "DG_00000002"} <= diagnoses
    gfs = {r["GENOMIC_FILE|TARGET_SERVICE_ID"] for r in rows}
    assert {"GF_00000001", "GF_00000002"} <= gfs


def test_normalization_stringly_typed(transformed):
    wide = transformed.tables["default"]
    assert all(t == "string" for _, t in wide.dtypes)
    # audit columns dropped everywhere
    assert not any(c in wide.columns for c in ("uuid", "created_at", "modified_at"))


def test_family_relationship_separate(transformed):
    fr = transformed.tables["family_relationship"]
    assert fr.count() == 2
    assert "FAMILY_RELATIONSHIP|RELATION_FROM_1_TO_2" in fr.columns


def test_fanout_cross_product(transformed):
    """J4×J5: participant with 1 diagnosis and 1 phenotype keeps both in one
    row-space; PT_1 has diagnosis+phenotype+outcome fan-out."""
    wide = transformed.tables["default"]
    pt1 = wide.filter(wide["`PARTICIPANT|TARGET_SERVICE_ID`"] == "PT_00000001")
    assert pt1.count() >= 1
    row = pt1.collect()[0]
    assert row["DIAGNOSIS|TARGET_SERVICE_ID"] == "DG_00000001"
    assert row["PHENOTYPE|TARGET_SERVICE_ID"] == "PH_00000001"


def test_conditional_targets_without_biospecimen_diagnoses(spark):
    tables = endpoint_tables(spark)
    tables.pop("biospecimen-diagnoses")
    result = transform_study(tables)
    assert "Histopathology" not in result.targets
    assert "Specimen" in result.targets


def test_conditional_join_skips_missing_tables(spark):
    tables = endpoint_tables(spark)
    minimal = {k: tables[k] for k in ("studies", "participants")}
    result = transform_study(minimal)
    assert result.targets == ["Patient", "ProbandStatus", "ResearchStudy", "ResearchSubject"]
    wide = result.tables["default"]
    assert "FAMILY|ID" not in wide.columns


def test_partial_presence_cascade_starts_anywhere(spark):
    """The cascade runs over ANY present subset (the reference would crash —
    pandas merge KeyError; see plans/transform._outer docstring)."""
    tables = endpoint_tables(spark)
    # investigators without studies
    result = transform_study({"investigators": tables["investigators"]})
    assert result.targets == ["Practitioner", "Organization", "PractitionerRole"]
    assert result.tables["default"].count() > 0
    # families with no prior merged table
    result = transform_study({"families": tables["families"]})
    assert result.targets == ["Family"]
    assert result.tables["default"].count() > 0


def test_partial_presence_missing_key_pads_null(spark):
    """biospecimen-diagnoses without diagnoses: the DIAGNOSIS key is absent
    on the accumulated side → treated as all-null (never matches), rows from
    both sides survive."""
    tables = endpoint_tables(spark)
    sub = {k: tables[k] for k in ("studies", "participants", "biospecimen-diagnoses")}
    result = transform_study(sub)
    wide = result.tables["default"]
    n_bd = tables["biospecimen-diagnoses"].count()
    n_part = tables["participants"].count()
    # every participant row and every biospecimen-diagnosis row is present
    assert wide.filter(wide["PARTICIPANT|TARGET_SERVICE_ID"].isNotNull()).count() >= n_part
    assert wide.filter(wide["BIOSPECIMEN|TARGET_SERVICE_ID"].isNotNull()).count() >= n_bd
