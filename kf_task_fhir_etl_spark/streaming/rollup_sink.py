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

Crash-safety without a transactional table format (none ships in this
container), via a never-overwrite layout:

- each commit writes a FRESH store version ``{store}.v{batchId}`` — the
  live version is never touched;
- the commit point is a create-if-absent of a marker FILE
  ``{store}.commits/{batchId}`` AFTER the version is fully written
  (``FileSystem.createNewFile`` — atomic on HDFS, check-then-create on
  the local FS and S3A; older stores' directory markers are still
  honored, since readers only look at marker NAMES);
- readers resolve the store by listing the marker dir and reading
  ``.v{max}``; a crash mid-version-write leaves garbage with no marker, so
  the previous version stays live and the replayed batch rebuilds — no
  window in which accumulated state can be lost (the overwrite-in-place
  layout this replaces lost the WHOLE store to a crash mid-overwrite,
  because the replay guard then skipped the batches that could rebuild it);
- superseded versions/markers are deleted best-effort after commit,
  RETAINING the immediately-previous version as a lag buffer for
  concurrent readers (failure leaves garbage, never corruption); an
  unreadable version that HAS a commit marker raises instead of reading
  as fresh — silent reset is the one failure this layout must never
  allow.

``foreachBatch`` gives at-least-once batch delivery on restart; the merge
is NOT idempotent under replay, so the marker id doubles as the epoch
guard: any batch with ``batchId <= max committed`` is skipped. All paths go
through the Hadoop FileSystem API, so behavior is identical on
local/HDFS/S3 (ADVICE r02: an ``os.path`` probe is always false remotely
and would silently reset the rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException

from kf_task_fhir_etl_spark.operators import rollup


def _fs(spark: SparkSession, path_str: str):
    path = spark._jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def _commits_dir(store_path: str) -> str:
    return store_path.rstrip("/") + ".commits"


def _version_path(store_path: str, batch_id: int) -> str:
    return store_path.rstrip("/") + f".v{batch_id}"


def _committed_ids(spark: SparkSession, store_path: str) -> list[int]:
    fs, path = _fs(spark, _commits_dir(store_path))
    if not fs.exists(path):
        return []
    ids = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        try:
            ids.append(int(name))
        except ValueError:
            continue
    return sorted(ids)


def last_committed_batch(spark: SparkSession, store_path: str) -> int:
    """The highest batchId with a commit marker (-1 when fresh)."""
    ids = _committed_ids(spark, store_path)
    return ids[-1] if ids else -1


def _read_version(spark: SparkSession, store_path: str, batch_id: int) -> DataFrame:
    """Read a COMMITTED store version. A marker exists for it, so an
    unreadable version is corruption/out-of-band deletion — raise rather
    than let a caller mistake an existing store for a fresh one (the
    silent-reset failure mode this layout exists to prevent)."""
    try:
        df = spark.read.parquet(_version_path(store_path, batch_id))
        df.schema  # force analysis so a missing path surfaces here
        return df
    except AnalysisException as exc:
        raise RuntimeError(
            f"rollup store {store_path!r} has commit marker {batch_id} but its "
            f"version data is unreadable — refusing to treat an existing store "
            f"as fresh"
        ) from exc


def read_store(spark: SparkSession, store_path: str) -> DataFrame | None:
    """The committed rollup (None when fresh): the store version named by
    the highest commit marker."""
    last = last_committed_batch(spark, store_path)
    if last < 0:
        return None
    return _read_version(spark, store_path, last)


def merge_batch_into_store(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    grain: str = "hour",
    batch_id: int | None = None,
) -> bool:
    """Roll one (micro)batch up and merge it into the rollup store.
    First batch bootstraps the store. The read-merge-write is safe here
    because the store is rollup-sized (buckets × types), not data-sized.

    Replay-guarded: batches at or below the last committed marker are
    skipped (returns False); the marker is created only after the new
    store version is fully written. ``batch_id=None`` auto-assigns
    ``last + 1`` (non-streaming callers).

    SINGLE-WRITER contract: the list-markers → read → merge → write
    sequence is not safe under concurrent writers to the same store (two
    callers can both merge against the same base and both claim commit id
    ``last + 1`` — a classic lost update). Structured Streaming's
    ``foreachBatch`` serializes batches per query, which is the intended
    deployment; for any other caller two probes turn a detected race into
    an error: a pre-write probe (BEFORE the version parquet is touched, so
    a stale-base merge never overwrites data another writer already
    committed under this id) and a ``createNewFile`` commit claim. The
    claim is atomic only where the FileSystem implements it so (HDFS);
    the default implementation — local FS, S3A — is check-then-create, so
    a narrow double-commit window remains there, as does the window where
    two writers interleave parquet writes to the same version path. The
    single-writer CONTRACT is the guarantee; the probes only shrink the
    detection window and bound the blast radius."""
    committed = _committed_ids(spark, store_path)  # ONE listing per batch
    last = committed[-1] if committed else -1
    if batch_id is not None and batch_id <= last:
        return False
    commit_id = batch_id if batch_id is not None else last + 1
    fs, marker = _fs(spark, _commits_dir(store_path) + f"/{commit_id}")
    if fs.exists(marker):
        raise RuntimeError(
            f"rollup store {store_path!r}: commit marker {commit_id} already "
            f"exists — concurrent writer detected before any data was "
            f"written; this sink requires a single writer per store (see "
            f"merge_batch_into_store docstring)"
        )
    increment = rollup.time_bucket_rollup(batch_df, grain)
    current = None if last < 0 else _read_version(spark, store_path, last)
    merged = increment if current is None else rollup.merge_rollups(current, increment)
    out = merged.collect()  # rollup-sized; decouples the read from the write
    new_version = _version_path(store_path, commit_id)
    spark.createDataFrame(out, merged.schema).write.mode("overwrite").parquet(new_version)
    # COMMIT POINT: create-if-absent of the marker FILE (atomic on HDFS,
    # best-effort elsewhere — see docstring). A loser that raced past the
    # pre-write probe raises here instead of silently double-committing;
    # HDFS signals the loss as FileAlreadyExistsException from create(),
    # normalized to the same error. (_committed_ids and read_store only
    # look at marker NAMES, so file markers coexist with the directory
    # markers older stores may hold.)
    fs.mkdirs(_fs(spark, _commits_dir(store_path))[1])
    try:
        claimed = fs.createNewFile(marker)
    except Exception as exc:  # py4j-wrapped FileAlreadyExistsException et al.
        raise RuntimeError(
            f"rollup store {store_path!r}: lost the commit race for marker "
            f"{commit_id} — concurrent writer detected; version data for "
            f"this id may be interleaved (single-writer contract violated)"
        ) from exc
    if not claimed:
        raise RuntimeError(
            f"rollup store {store_path!r}: lost the commit race for marker "
            f"{commit_id} — concurrent writer detected; version data for "
            f"this id may be interleaved (single-writer contract violated)"
        )
    # best-effort cleanup, RETAINING the immediately-previous version as a
    # lag buffer: a concurrent reader that resolved `last` just before this
    # commit can still finish its action (markers below `last` go too)
    for old_id in [i for i in committed if i < last]:
        try:
            old_fs, old_path = _fs(spark, _version_path(store_path, old_id))
            old_fs.delete(old_path, True)
            _, old_marker = _fs(spark, _commits_dir(store_path) + f"/{old_id}")
            old_fs.delete(old_marker, True)
        except Exception:
            pass
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
