"""End-to-end pipeline: extract → transform → build → load.

The Spark re-expression of the reference's ``Ingest`` driver
(``etl/ingest.py:42-531``):

- **extract**: a catalog of endpoint DataFrames (parquet/JDBC/REST — see
  ``sources``), replacing the Postgres snapshot dict (``etl/ingest.py:53-127``).
- **transform**: ``plans.transform.transform_study`` — the conditional
  outer-join cascade + normalize (``etl/ingest.py:129-493``).
- **build**: every applicable entity builder in the fixed dependency order
  (``kf_api_fhir_service.py:115-132``) over the wide/FR tables → one
  ``(resource_type, target_id, resource_json)`` DataFrame per target.
- **load**: keyed idempotent sink (``sinks``) — parquet MERGE-by-key engine
  mode or FHIR REST upsert parity mode (``kf_api_fhir_service.py:37-94``).

With deterministic surrogate IDs the dependency order no longer gates
correctness (references are pure functions), so builders can run in
parallel; the order is preserved for load-time referential integrity against
a real FHIR server.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kf_task_fhir_etl_spark.builders import BUILDERS
from kf_task_fhir_etl_spark.plans.mappings import pad_concepts
from kf_task_fhir_etl_spark.plans.transform import TransformResult, transform_study


def cache_snapshot(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """S5 — cache the per-study snapshot between extract and transform
    (reference holds it in RAM, ``etl/ingest.py:94-95``; here a deliberate
    knob: each endpoint table feeds several joins/builders, so caching avoids
    re-scanning the source per consumer)."""
    return {name: df.cache() for name, df in tables.items()}


def build_resources(
    transformed: TransformResult, metadata: DataFrame | None = None
) -> dict[str, DataFrame]:
    """Run every applicable builder; returns {target_name: resource_df}."""
    out: dict[str, DataFrame] = {}
    for target in transformed.targets:
        module, table_key = BUILDERS[target]
        table = transformed.tables.get(table_key)
        if table is None:
            continue
        # partial-presence wide tables lack cross-entity columns builders
        # reference unconditionally — pad them null (presence-sensitive
        # SEQUENCING columns excepted; see mappings.DYNAMIC_PRESENCE_COLUMNS)
        table = pad_concepts(table)
        if target == "DRSDocumentReference":
            out[target] = module.build(table, metadata=metadata)
        else:
            out[target] = module.build(table)
    return out


def run_pipeline(
    endpoint_tables: dict[str, DataFrame],
    metadata: DataFrame | None = None,
    cache_wide: bool = False,
) -> dict[str, DataFrame]:
    """extract(already-loaded tables) → transform → build.

    ``cache_wide``: persist the transform outputs before the builders
    consume them — the Spark analogue of the reference holding the wide
    pandas frame in RAM (``etl/ingest.py:485``). Off by default: measured
    at bench scale the end-to-end cost is dominated by driver-side plan
    construction (16 builders × a 100+-column cascade schema), not by
    recomputation, so the cache's materialization job only added time
    (11 s → 14 s at sf0.01). Turn it on when builders are RUN (actions
    issued) separately rather than composed into one job, or when the
    cascade input is expensive relative to executor memory."""
    transformed = transform_study(endpoint_tables)
    if cache_wide:
        for key, df in transformed.tables.items():
            transformed.tables[key] = df.cache()
    return build_resources(transformed, metadata=metadata)
