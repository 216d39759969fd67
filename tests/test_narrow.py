"""Narrow-path ≡ wide-path equivalence: every builder must emit identical
resources from its minimal join as from the full wide table."""

from __future__ import annotations

import json

import pytest

from kf_task_fhir_etl_spark.etl import run_pipeline
from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

from .fixtures import endpoint_tables


@pytest.fixture(scope="module")
def both_paths(spark):
    tables = endpoint_tables(spark)
    wide = run_pipeline(tables)
    narrow = build_resources_narrow(tables)
    return wide, narrow


def test_same_targets(both_paths):
    wide, narrow = both_paths
    assert set(wide) == set(narrow)


def test_resources_identical(both_paths):
    wide, narrow = both_paths
    for target in wide:
        w = {r["target_id"]: json.loads(r["resource_json"]) for r in wide[target].collect()}
        n = {r["target_id"]: json.loads(r["resource_json"]) for r in narrow[target].collect()}
        assert set(w) == set(n), f"{target}: id sets differ"
        for tid in w:
            assert w[tid] == n[tid], f"{target}/{tid}: resource differs\nwide={w[tid]}\nnarrow={n[tid]}"


def test_children_build_without_participants(spark):
    """Disease/Phenotype/VitalStatus carry their own participant FK — absent
    participants must not silently drop them (wide-path parity: the wide
    cascade still emits their rows with null study columns)."""
    from .fixtures import endpoint_tables
    from kf_task_fhir_etl_spark.etl import run_pipeline

    tables = endpoint_tables(spark)
    sub = {k: tables[k] for k in ("studies", "diagnoses")}
    wide = run_pipeline(sub)
    narrow = build_resources_narrow(sub)
    assert "Disease" in narrow and "Disease" in wide
    w = {r["target_id"]: json.loads(r["resource_json"]) for r in wide["Disease"].collect()}
    n = {r["target_id"]: json.loads(r["resource_json"]) for r in narrow["Disease"].collect()}
    assert w and w == n


def test_drs_builds_without_sequencing_experiments(spark):
    """sequencing-experiment-genomic-files WITHOUT sequencing-experiments:
    SEQUENCING|TARGET_SERVICE_ID exists but STRATEGY doesn't — the A2
    aggregation must widen the key without referencing STRATEGY."""
    from .fixtures import endpoint_tables
    from kf_task_fhir_etl_spark.etl import run_pipeline

    tables = endpoint_tables(spark)
    sub = {
        k: tables[k]
        for k in (
            "studies", "participants", "biospecimens", "biospecimen-genomic-files",
            "genomic-files", "sequencing-experiment-genomic-files",
        )
    }
    wide = run_pipeline(sub)
    narrow = build_resources_narrow(sub)
    w = {r["target_id"]: json.loads(r["resource_json"]) for r in wide["DRSDocumentReference"].collect()}
    n = {r["target_id"]: json.loads(r["resource_json"]) for r in narrow["DRSDocumentReference"].collect()}
    assert w and w == n


def test_drs_builds_from_genomic_files_alone(spark):
    """Wide path targets DRSDocumentReference whenever genomic-files is
    present; narrow path must too (empty participant/biospecimen lists)."""
    from .fixtures import endpoint_tables
    from kf_task_fhir_etl_spark.etl import run_pipeline

    tables = endpoint_tables(spark)
    sub = {"genomic-files": tables["genomic-files"]}
    wide = run_pipeline(sub)
    narrow = build_resources_narrow(sub)
    w = {r["target_id"]: json.loads(r["resource_json"]) for r in wide["DRSDocumentReference"].collect()}
    n = {r["target_id"]: json.loads(r["resource_json"]) for r in narrow["DRSDocumentReference"].collect()}
    assert w and w == n
