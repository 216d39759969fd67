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
from pyspark.sql import functions as F

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
    transformed: TransformResult,
    metadata: DataFrame | None = None,
    parallelism: int = 8,
) -> dict[str, DataFrame]:
    """Run every applicable builder; returns {target_name: resource_df}
    in dependency order.

    Builders only CONSTRUCT plans here (no actions), and with deterministic
    surrogate IDs they are independent of each other — so construction runs
    on a thread pool: each builder's time is part py4j round-trip latency
    (overlappable) and part Python expression construction (GIL-bound), so
    the win is real but bounded — measured ~0.9 s off q85's 9.2 s warm
    wall at sf0.1 for the 16-builder set. Results are re-ordered to
    ``transformed.targets`` so load-time referential integrity is
    unaffected. ``parallelism=1`` restores sequential construction."""
    # partial-presence wide tables lack cross-entity columns builders
    # reference unconditionally — pad them null (presence-sensitive
    # SEQUENCING columns excepted; see mappings.DYNAMIC_PRESENCE_COLUMNS).
    # Padded once per source table, not once per builder: the projection is
    # ~100 driver-side column expressions, and all 16 builders share it.
    padded: dict[str, DataFrame] = {}
    jobs: list[tuple[str, object, DataFrame]] = []
    for target in transformed.targets:
        module, table_key = BUILDERS[target]
        if table_key not in padded:
            table = transformed.tables.get(table_key)
            padded[table_key] = None if table is None else pad_concepts(table)
        if padded[table_key] is None:
            continue
        jobs.append((target, module, padded[table_key]))

    def _build(job: tuple[str, object, DataFrame]) -> tuple[str, DataFrame]:
        target, module, table = job
        if target == "DRSDocumentReference":
            return target, module.build(table, metadata=metadata)
        return target, module.build(table)

    if parallelism > 1 and len(jobs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=parallelism) as ex:
            built = dict(ex.map(_build, jobs))
    else:
        built = dict(map(_build, jobs))
    return {target: built[target] for target, _, _ in jobs}


def build_resources_union(
    transformed: TransformResult,
    metadata: DataFrame | None = None,
) -> DataFrame:
    """Fused single-pass build: ONE select over ONE scan of the
    (checkpointed) wide table emits every row-wise builder's
    ``(target, resource_type, target_id, resource_json)`` struct — 13
    serialized resources per input row via an array of null-able elements
    + explode — followed by one dedupe shuffle on (target, target_id).
    Aggregating builders (Family, DRSDocumentReference) and the separate
    family_relationship table keep their own plans and union in.

    Why: the classic dict path (``build_resources``) makes 16 independent
    passes over the wide table — after ``localCheckpoint`` column pruning
    can no longer narrow them, so that is 16 full-width scans and 16
    dedupe shuffles. Fused: 1 scan + 1 shuffle for the row-wise set (the
    at-scale win), and both routes share the builders' ``plan()``
    expressions, so they cannot drift (equivalence pinned in
    tests/test_builders.py::test_single_pass_union_equals_classic_dict;
    q85 runs this path under its oracle).
    Use the dict path when per-target DataFrames are needed (the
    dependency-ordered load); use this when the consumer wants the union
    (bulk export, counting gates)."""
    from kf_task_fhir_etl_spark.builders.base import fused_element

    padded: dict[str, DataFrame] = {}
    fused_jobs: list[tuple[str, object, DataFrame]] = []
    classic_jobs: list[tuple[str, object, DataFrame]] = []
    for target in transformed.targets:
        module, table_key = BUILDERS[target]
        if table_key not in padded:
            table = transformed.tables.get(table_key)
            padded[table_key] = None if table is None else pad_concepts(table)
        table = padded[table_key]
        if table is None:
            continue
        if table_key == "default" and hasattr(module, "plan"):
            fused_jobs.append((target, module, table))
        else:
            classic_jobs.append((target, module, table))

    def _element(job: tuple[str, object, DataFrame]):
        target, module, table = job
        tid, resource, keep = module.plan(table)
        return fused_element(target, module.API_PATH, tid, resource, keep)

    def _classic(job: tuple[str, object, DataFrame]) -> DataFrame:
        target, module, table = job
        df = (
            module.build(table, metadata=metadata)
            if target == "DRSDocumentReference"
            else module.build(table)
        )
        return df.select(
            F.lit(target).alias("target"), "resource_type", "target_id", "resource_json"
        )

    # expression construction is py4j-round-trip-bound (same rationale and
    # measured win as build_resources' pool); element order follows
    # transformed.targets either way
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as ex:
        elems = list(ex.map(_element, fused_jobs))
        classic = list(ex.map(_classic, classic_jobs))
    fused = None
    if elems:
        fused = (
            padded["default"]
            .select(F.explode(F.filter(F.array(*elems), lambda x: x.isNotNull())).alias("e"))
            .select("e.*")
            .dropDuplicates(["target", "target_id"])
        )
    for df in classic:
        fused = df if fused is None else fused.unionByName(df)
    if fused is None:
        # degenerate input (no applicable tables): mirror the classic dict
        # path's empty-{} behavior with an empty, correctly-typed union.
        # Prefer a session we can reach from an input DataFrame; fall back
        # to getOrCreate (getActiveSession() is thread-local and None on
        # worker threads — the q115 concurrent-study pattern).
        from pyspark.sql import SparkSession

        spark = next(
            (df.sparkSession for df in transformed.tables.values() if df is not None),
            None,
        ) or SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        return spark.createDataFrame(
            [], "target string, resource_type string, target_id string, resource_json string"
        )
    return fused


def run_pipeline(
    endpoint_tables: dict[str, DataFrame],
    metadata: DataFrame | None = None,
    cache_wide: bool = False,
    checkpoint_wide: bool = True,
    single_pass: bool = False,
):
    """extract(already-loaded tables) → transform → build.

    ``single_pass=True`` returns ONE unioned DataFrame via
    ``build_resources_union`` (fused scan) instead of the per-target dict
    — the mode for union consumers (bulk export, q85).

    ``checkpoint_wide`` (default ON): eagerly ``localCheckpoint`` the
    transform outputs before the 16 builders consume them — the Spark
    analogue of the reference materializing the wide pandas frame in RAM
    (``etl/ingest.py:485``). This truncates the 12-join cascade out of
    every builder's logical plan, so Catalyst analyzes/optimizes the
    cascade ONCE instead of 16× (measured at sf0.01: downstream
    optimize+execute of the 16-builder union drops 10.4 s → 0.4 s for a
    one-time ~2.5 s materialization; end-to-end ~18 s → ~9 s). At scale
    the trade is the same one the reference already makes: one wide-table
    materialization versus sixteen re-executions of the join cascade —
    strictly fewer shuffles. Set False to keep the pipeline fully lazy
    (e.g. when only one builder's output will ever be consumed and the
    optimizer's column pruning makes its single cascade pass cheap).

    ``cache_wide``: legacy knob — ``.cache()`` the transform outputs
    without truncating lineage. Superseded by ``checkpoint_wide`` (cache
    keeps the full cascade in every builder's analyzed plan, so it saved
    recomputation but not the dominant plan-construction cost; measured
    it *added* 3 s at sf0.01)."""
    transformed = transform_study(endpoint_tables)
    if cache_wide:
        for key, df in transformed.tables.items():
            transformed.tables[key] = df.cache()
    elif checkpoint_wide:
        for key, df in transformed.tables.items():
            transformed.tables[key] = df.localCheckpoint(eager=True)
    if single_pass:
        return build_resources_union(transformed, metadata=metadata)
    return build_resources(transformed, metadata=metadata)
