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
