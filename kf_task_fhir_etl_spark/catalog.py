"""Catalog of named DataFrames over a testdata scale-factor directory.

Mirrors the reference's snapshot abstraction ``{endpoint: DataFrame}``
(reference ``etl/ingest.py:94-122``): one named table per parquet file, with
temp views registered so both the DataFrame and SQL surfaces see them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/column pruning into it.

    Timestamp normalization: the testdata parquet stores naive µs timestamps
    (``timestamp[us]``, isAdjustedToUTC=false → Spark TIMESTAMP_NTZ). The
    session timezone is pinned to UTC (session.py), so casting NTZ →
    TimestampType preserves the wall clock and hash-matches DuckDB, which
    reads the same columns as naive TIMESTAMP. Older generations of the
    testdata stored ``events.ts`` as TIMESTAMP(NANOS), surfaced as long ns
    via ``spark.sql.legacy.parquet.nanosAsLong`` — both layouts normalize to
    the same TimestampType column here, and downstream operators never see
    the difference. The cast is a zero-shuffle projection; pushdown/pruning
    still reach the scan.
    """
    df = spark.read.parquet(table_path(sf_dir, name))
    if any(dtype == "timestamp_ntz" for _, dtype in df.dtypes):
        # The NTZ→timestamp cast preserves the wall clock ONLY under a UTC
        # session timezone; a session built outside session.get_spark would
        # silently shift every timestamp relative to the DuckDB oracle. Fail
        # loudly instead (ADVICE r01).
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise AssertionError(
                f"load_table requires spark.sql.session.timeZone=UTC (got {tz!r}); "
                "build the session via kf_task_fhir_etl_spark.session.get_spark"
            )
    for col_name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col_name, F.col(col_name).cast("timestamp"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — float division loses precision on 1.7e18 ns
        # epochs (double mantissa is 53 bits) and can round across a µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_catalog(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES, register_views: bool = False
) -> dict[str, DataFrame]:
    """Load every table that exists under ``sf_dir`` (missing ones skipped —
    the reference's join cascade is presence-conditional, ``etl/ingest.py:167-483``)."""
    catalog: dict[str, DataFrame] = {}
    for name in tables:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            catalog[name] = df
            if register_views:
                df.createOrReplaceTempView(name)
    return catalog
