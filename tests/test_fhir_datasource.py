"""The fhir_search Python DataSource: spark.read.format end-to-end with an
offline page map."""

from __future__ import annotations

import json


def test_fhir_search_datasource(spark):
    from kf_task_fhir_etl_spark.sources.fhir_datasource import FhirSearchDataSource

    spark.dataSource.register(FhirSearchDataSource)
    host = "https://fhir.example.org"
    pages = {
        f"{host}/Patient": {
            "total": 2,
            "link": [{"relation": "next", "url": "http://localhost:8000/Patient?page=2"}],
            "entry": [{"resource": {"id": "a", "resourceType": "Patient"}}],
        },
        f"{host}/Patient?page=2": {
            "total": 2,
            "link": [],
            "entry": [{"resource": {"id": "b", "resourceType": "Patient"}}],
        },
    }
    df = (
        spark.read.format("fhir_search")
        .option("host", host)
        .option("endpoint", "Patient")
        .option("pages", json.dumps(pages))
        .load()
    )
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["resource_type"] == "Patient"
    # composes with downstream relational ops
    assert df.filter(df.id == "b").count() == 1
