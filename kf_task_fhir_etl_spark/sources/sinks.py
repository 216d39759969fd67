"""S8/S9 — sinks: FHIR REST upsert (parity mode) and keyed idempotent
parquet MERGE (engine mode).

S8 reproduces ``submit`` (reference ``kf_api_fhir_service.py:37-94``): PUT
``/{type}/{id}`` when an id is present, falling back to POST when the server
reports the id unknown; executed with ``foreachPartition`` so each executor
holds one HTTP session and streams its partition (the Spark analog of the
reference's async submit loop, ``etl/ingest.py:514``).

S9's dependency order is data in ``plans.transform.ALL_TARGETS``; ``load_all``
walks it.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Submit = Callable[[str, str, str, dict], str]
"""submit(host, api_path, resource_id, body) -> server-assigned id."""


def default_submit(headers: dict | None = None, auth: tuple[str, str] | None = None) -> Submit:
    """requests-backed PUT-else-POST (import gated to live mode)."""
    import requests

    session = requests.Session()

    def submit(host: str, api_path: str, resource_id: str, body: dict) -> str:
        resp = None
        if resource_id:
            url = "/".join(v.strip("/") for v in (host, api_path, resource_id))
            resp = session.put(url, json=body, headers=headers, auth=auth)
            if resp.status_code not in {200, 201} and "no resource with this ID exists" in resp.text:
                resp = None
        if resp is None:
            url = "/".join(v.strip("/") for v in (host, api_path))
            resp = session.post(url, json=body, headers=headers, auth=auth)
        if resp.status_code in {200, 201}:
            return resp.json()["id"]
        raise RuntimeError(f"Sent to /{api_path}: {resp.status_code} {resp.text[:500]}")

    return submit


def fhir_upsert_sink(resources: DataFrame, host: str, submit_factory: Callable[[], Submit]) -> None:
    """Write a builder-output DataFrame (resource_type, target_id,
    resource_json) to a FHIR server. ``submit_factory`` is called once per
    partition on the executor (sessions are not picklable)."""

    def write_partition(rows) -> None:
        submit = submit_factory()
        for row in rows:
            body = json.loads(row["resource_json"])
            submit(host, row["resource_type"], row["target_id"], body)

    resources.foreachPartition(write_partition)


def keyed_parquet_upsert(spark: SparkSession, df: DataFrame, path: str, key: str) -> None:
    """Idempotent keyed MERGE into a parquet table (engine mode; Delta's
    MERGE INTO without the Delta jar): existing rows not matched by the new
    keys survive, matched keys are replaced, new keys append. Two scans + one
    write; at scale this is the classic copy-on-write upsert — partition the
    table (e.g. by study) so only touched partitions rewrite."""
    if os.path.exists(path):
        current = spark.read.parquet(path)
        merged = current.join(df.select(key).distinct(), on=[key], how="left_anti").unionByName(df)
    else:
        merged = df
    # materialize before overwrite (can't read and overwrite the same files lazily)
    staging = path.rstrip("/") + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    final = spark.read.parquet(staging)
    final.write.mode("overwrite").parquet(path)
    # clean staging
    import shutil

    shutil.rmtree(staging, ignore_errors=True)


def load_all(
    resources_by_target: dict[str, DataFrame],
    ordered_targets: list[str],
    write: Callable[[str, DataFrame], None],
) -> list[str]:
    """S9 — dependency-ordered load driver: walk the fixed target order
    (reference ``kf_api_fhir_service.py:115-132``; subset rule
    ``etl/ingest.py:487-489``) and hand each resource DataFrame to ``write``.
    Returns the targets written, in order."""
    written = []
    for target in ordered_targets:
        df = resources_by_target.get(target)
        if df is not None:
            write(target, df)
            written.append(target)
    return written
