"""S1/S2 — JDBC scans of the Dataservice Postgres, and the JDBC sink.

The reference issues ``SELECT * FROM study WHERE kf_id = :id`` via SQLAlchemy
(reference ``etl/ingest.py:68-80``). In Spark the same scans are JDBC reads
with the predicate pushed into the source query — Catalyst additionally
pushes later filters/column pruning down to the database.

No Postgres ships in this container, but Spark bundles the embedded Derby
driver — ``tests/test_sources_sinks.py::test_jdbc_roundtrip_embedded_derby``
round-trips write_table → read_table against ``jdbc:derby:memory:`` and
asserts predicate pushdown (PushedFilters) in the executed plan, so both
wrappers are exercised live; only the Postgres dialect specifically is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    predicate: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC scan. ``predicate`` becomes a pushed-down source query (the S1
    point scan: ``predicate="kf_id = 'SD_X'"``). For big tables pass
    ``partition_column`` + bounds so the scan parallelizes across executors
    instead of a single connection: Spark issues ``num_partitions`` stride
    queries (``partition_column >= lo AND < hi``), one per task, so a 100 TB
    endpoint table reads at cluster width while the database sees bounded,
    index-friendly range scans (Derby round-trip with a >1-partition assert
    in tests/test_sources_sinks.py). The two forms are mutually exclusive in
    Spark's JDBC source (``query`` cannot be stride-partitioned) — rejected
    here with a clear error instead of Spark's late one; a partitioned point
    scan is a contradiction anyway (one key, one row)."""
    if predicate and partition_column:
        raise ValueError(
            "read_table: 'predicate' (source-query form) and 'partition_column' "
            "(stride-partitioned form) cannot be combined — Spark's JDBC source "
            "forbids partitioning a query option; push the filter via .filter() "
            "on the partitioned dbtable read instead"
        )
    reader = spark.read.format("jdbc").option("url", url)
    if predicate:
        reader = reader.option("query", f"SELECT * FROM {table} WHERE {predicate}")
    else:
        reader = reader.option("dbtable", table)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000_000))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """JDBC sink (the BASELINE.json Postgres target). ``batchsize`` batches
    inserts per round-trip; partition count controls write concurrency."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
