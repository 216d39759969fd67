"""SparkSession factory tuned for both local testing and cluster scale.

Local runs use ``local[$SPARK_GRAFT_CPUS]`` (default all cores). The configs
are chosen to hold at cluster scale: AQE on (runtime coalesce + skew-join),
shuffle partitions sized by env, Arrow enabled for the few pandas boundaries,
UTC session timezone so results hash-match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "kf_task_fhir_etl_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
    real cluster set it (or rely on AQE coalescing) to ~2-3x total cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # older testdata generations carried TIMESTAMP(NANOS); surfaced as
        # long ns and normalized to TimestampType in catalog.load_table
        # (current naive-µs layout normalizes there too)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # PySpark 4 captures a Python call site (stack walk + JVM origin RPC)
        # for EVERY DataFrame/Column call to enrich error messages. On
        # plan-construction-heavy programs (16 JSON builders; cProfile shows
        # 39k py4j round-trips building q85) that's pure driver overhead —
        # off by default here, flip on when debugging an analysis error.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUG", "false"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
