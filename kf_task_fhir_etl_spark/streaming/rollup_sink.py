"""Streaming continuous-aggregate maintenance: a ``foreachBatch`` sink that
rolls each microbatch up and MERGES it into a stored rollup table.

This wires the streaming surface to ``operators/rollup.py``'s mergeable
state: because every stored measure merges (sums add, HLL sketches union),
the sink never needs to re-read raw history — each trigger shuffles only
(batch rollup + stored rollup)-sized data, the invariant that makes a
perpetual 100 TB/day event stream maintainable. Contrast the built-in
streaming aggregation (``groupBy().agg()`` on the stream): its state lives
in the state store and cannot be queried mid-stream or re-rolled to coarser
grains; the stored-parquet rollup here is itself a table — q53-style
re-rollable, joinable, and shareable across queries.

``foreachBatch`` gives at-least-once batch delivery on restart; the merge
is NOT idempotent under replay, so production deployments pair it with the
standard epoch-id guard (skip batchId ≤ last committed) — the batch id is
passed to the merge function for exactly that purpose.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kf_task_fhir_etl_spark.operators import rollup


def merge_batch_into_store(
    spark: SparkSession, batch_df: DataFrame, store_path: str, grain: str = "hour"
) -> None:
    """Roll one (micro)batch up and merge it into the parquet rollup store.
    First batch bootstraps the store. The read-merge-overwrite is safe here
    because the store is rollup-sized (buckets × types), not data-sized."""
    increment = rollup.time_bucket_rollup(batch_df, grain)
    if os.path.exists(store_path):
        current = spark.read.parquet(store_path)
        merged = rollup.merge_rollups(current, increment)
    else:
        merged = increment
    # materialize before overwrite: the merged plan reads store_path itself
    out = merged.collect()
    spark.createDataFrame(out, merged.schema).write.mode("overwrite").parquet(store_path)


def rollup_stream(
    events: DataFrame, store_path: str, grain: str = "hour", checkpoint: str | None = None
):
    """Attach the rollup-merge sink to an event stream. Returns the started
    StreamingQuery; callers drive it (``processAllAvailable`` locally)."""
    spark = events.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001 — see module docstring
        merge_batch_into_store(spark, batch_df, store_path, grain)

    writer = events.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
