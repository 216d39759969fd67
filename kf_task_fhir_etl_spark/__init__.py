"""kf_task_fhir_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the query and data-processing capabilities of the reference
ETL task service (kids-first/kf-task-fhir-etl, surveyed in /root/repo/SURVEY.md)
as an idiomatic Spark DataFrame engine:

- ``plans``      — the concept-rename maps + conditional outer-join cascade
                   (reference ``etl/ingest.py:137-493``) as declarative Spark plans.
- ``functions``  — normalize (``clean_up_df`` parity), dict-lookup recodes,
                   string/cast helpers, nested-JSON (FHIR resource) assembly.
- ``builders``   — the 16 entity builders re-expressed as native column
                   expressions (reference ``target_api_plugins/entity_builders/``).
- ``operators``  — large-scale training-data operators (dedup, similarity
                   search, text analysis, multimodal plumbing) beyond the
                   reference surface.
- ``sources``    — parquet/JDBC/paginated-REST scans and keyed upsert sinks.
- ``streaming``  — Structured Streaming equivalents for the events table.

Everything here is DataFrame/SQL-first so Catalyst plans it; Python UDFs are
reserved for genuinely non-relational steps (none in the reference surface).
"""

__version__ = "0.1.0"
