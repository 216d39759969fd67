"""S6 as a first-class Spark source: the Python DataSource API (Spark 4).

Registers a ``fhir_search`` format so the paginated FHIR scan composes like
any other source:

    spark.dataSource.register(FhirSearchDataSource)
    df = (spark.read.format("fhir_search")
          .option("host", "https://fhir.example.org")
          .option("endpoint", "Patient")
          .option("filters", '{"name": "..."}')
          .load())

Pagination is serial (each bundle links the next), so the scan is a single
input partition; Catalyst still gets a real relation — downstream
filters/projections compose, and the fetch happens on an executor, not the
driver. For offline tests the ``pages`` option carries a serialized
``{url: bundle}`` map instead of a live host.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader

FHIR_SCAN_SCHEMA = "id string, resource_type string, resource_json string"


class FhirSearchDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fhir_search"

    def schema(self) -> str:
        return FHIR_SCAN_SCHEMA

    def reader(self, schema) -> "FhirSearchReader":
        return FhirSearchReader(self.options)


class FhirSearchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.host = options.get("host", "")
        self.endpoint = options.get("endpoint", "")
        self.filters = json.loads(options["filters"]) if options.get("filters") else None
        self.pages = json.loads(options["pages"]) if options.get("pages") else None

    def read(self, partition) -> Iterator[tuple]:
        from kf_task_fhir_etl_spark.sources.rest import default_fetch, yield_resources

        if self.pages is not None:
            pages = self.pages

            def fetch(url: str, params: dict | None = None) -> dict:
                return pages[url]

        else:
            fetch = default_fetch()

        for entry in yield_resources(self.host, self.endpoint, self.filters, fetch):
            resource = entry["resource"]
            yield (
                resource["id"],
                resource.get("resourceType"),
                json.dumps(resource, separators=(",", ":")),
            )
