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
is NOT idempotent under replay, so the sink carries the standard epoch-id
guard: the last committed batchId is persisted next to the store and any
batch with ``batchId <= last`` is skipped. The store itself is probed with
``spark.read`` (not a local-filesystem ``os.path`` check), so the sink
behaves identically on HDFS/S3 paths. The guard's remaining window is the
gap between the store overwrite and the meta write — a crash exactly there
replays one batch into the store (closing it fully needs a transactional
table format such as Delta/Iceberg, which this container doesn't ship).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException

from kf_task_fhir_etl_spark.operators import rollup


def _try_read(spark: SparkSession, path: str) -> DataFrame | None:
    """Probe a parquet table by reading it — works on any Hadoop filesystem
    (local/HDFS/S3), unlike ``os.path.exists`` which is always false on
    remote stores and would silently reset the rollup (ADVICE r02)."""
    try:
        df = spark.read.parquet(path)
        df.schema  # force analysis so a missing path surfaces here
        return df
    except AnalysisException:
        return None


def _meta_path(store_path: str) -> str:
    return store_path.rstrip("/") + ".meta"


def last_committed_batch(spark: SparkSession, store_path: str) -> int:
    """The highest batchId already merged into the store (-1 when fresh)."""
    meta = _try_read(spark, _meta_path(store_path))
    if meta is None:
        return -1
    row = meta.collect()
    return row[0]["batch_id"] if row else -1


def merge_batch_into_store(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    grain: str = "hour",
    batch_id: int | None = None,
) -> bool:
    """Roll one (micro)batch up and merge it into the parquet rollup store.
    First batch bootstraps the store. The read-merge-overwrite is safe here
    because the store is rollup-sized (buckets × types), not data-sized.

    With ``batch_id`` set, the merge is replay-guarded: batches at or below
    the persisted last-committed id are skipped (returns False), and the id
    is committed after a successful merge."""
    if batch_id is not None and batch_id <= last_committed_batch(spark, store_path):
        return False
    increment = rollup.time_bucket_rollup(batch_df, grain)
    current = _try_read(spark, store_path)
    merged = increment if current is None else rollup.merge_rollups(current, increment)
    # materialize before overwrite: the merged plan reads store_path itself
    out = merged.collect()
    spark.createDataFrame(out, merged.schema).write.mode("overwrite").parquet(store_path)
    if batch_id is not None:
        spark.createDataFrame([(batch_id,)], "batch_id long").write.mode("overwrite").parquet(
            _meta_path(store_path)
        )
    return True


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
