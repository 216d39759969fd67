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

Crash-safety, replay guarding, and the single-writer contract live in the
shared ``streaming/versioned_store.py`` layout (extracted r06 so the CDC
sink shares the identical commit discipline — see that module's docstring
for the full guarantees); this module keeps its original public surface
(``last_committed_batch`` / ``read_store`` / ``merge_batch_into_store`` /
``rollup_stream``) as thin delegations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kf_task_fhir_etl_spark.operators import rollup
from kf_task_fhir_etl_spark.streaming.versioned_store import (  # noqa: F401 (re-exports)
    apply_batch,
    last_committed_batch,
    read_store,
    version_path as _version_path,
)


def merge_batch_into_store(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    grain: str = "hour",
    batch_id: int | None = None,
) -> bool:
    """Roll one (micro)batch up and merge it into the rollup store.
    First batch bootstraps the store. Replay-guarded + crash-safe via
    ``versioned_store.apply_batch`` (single-writer contract documented
    there); ``collect_store=True`` because the store is rollup-sized
    (buckets × types), never data-sized — the driver materialization
    decouples the read from the write at trivial cost."""

    def merge(current: DataFrame | None) -> DataFrame:
        increment = rollup.time_bucket_rollup(batch_df, grain)
        return increment if current is None else rollup.merge_rollups(current, increment)

    return apply_batch(spark, store_path, merge, batch_id=batch_id, collect_store=True)


def rollup_stream(
    events: DataFrame, store_path: str, grain: str = "hour", checkpoint: str | None = None
):
    """Attach the rollup-merge sink to an event stream. Returns the started
    StreamingQuery; callers drive it (``processAllAvailable`` locally)."""
    spark = events.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_store(spark, batch_df, store_path, grain, batch_id=batch_id)

    writer = events.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
