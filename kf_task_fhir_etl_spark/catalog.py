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

    ``events.ts`` is TIMESTAMP(NANOS) in the parquet footer; Spark reads it as
    long nanoseconds (``spark.sql.legacy.parquet.nanosAsLong``), which we
    convert to a standard µs timestamp here so downstream operators see a
    TimestampType column.
    """
    df = spark.read.parquet(table_path(sf_dir, name))
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
