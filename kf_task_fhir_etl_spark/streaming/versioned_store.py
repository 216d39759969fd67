"""Versioned-marker keyed store — the crash-safe, replay-guarded
read-merge-write layout shared by the streaming sinks (rollup maintenance,
CDC apply) in a container with no transactional table format.

Extracted from ``rollup_sink`` (r06) when the CDC-apply sink needed the
identical commit discipline; the layout and its guarantees are unchanged:

- each commit writes a FRESH store version ``{store}.v{batchId}`` — the
  live version is never touched;
- the commit point is a create-if-absent of a marker FILE
  ``{store}.commits/{batchId}`` AFTER the version is fully written
  (atomic on HDFS; check-then-create on the local FS and S3A);
- readers resolve the store by listing marker NAMES and reading
  ``.v{max}``; a crash mid-version-write leaves garbage with no marker,
  so the previous version stays live and the replayed batch rebuilds;
- an unreadable version that HAS a commit marker raises instead of
  reading as fresh — silent reset is the one failure this layout must
  never allow;
- superseded versions/markers are deleted best-effort after commit,
  RETAINING the immediately-previous version as a lag buffer for
  concurrent readers;
- ``foreachBatch`` gives at-least-once delivery, so the marker id doubles
  as the epoch guard: a batch at or below the last committed id is
  skipped;
- SINGLE-WRITER contract per store (see ``apply_batch``): the probes only
  shrink the race-detection window, they are not a lock.

All paths go through the Hadoop FileSystem API, so behavior is identical
on local/HDFS/S3 (an ``os.path`` probe is always false remotely and would
silently reset the store).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def hadoop_fs(spark: SparkSession, path_str: str):
    path = spark._jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def commits_dir(store_path: str) -> str:
    return store_path.rstrip("/") + ".commits"


def version_path(store_path: str, batch_id: int) -> str:
    return store_path.rstrip("/") + f".v{batch_id}"


def committed_ids(spark: SparkSession, store_path: str) -> list[int]:
    fs, path = hadoop_fs(spark, commits_dir(store_path))
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
    ids = committed_ids(spark, store_path)
    return ids[-1] if ids else -1


def read_version(spark: SparkSession, store_path: str, batch_id: int) -> DataFrame:
    """Read a COMMITTED store version. A marker exists for it, so an
    unreadable/missing version directory is corruption, not freshness —
    raise rather than silently resetting accumulated state."""
    try:
        return spark.read.parquet(version_path(store_path, batch_id))
    except AnalysisException as exc:
        raise RuntimeError(
            f"store {store_path!r} has commit marker {batch_id} but its "
            f"version directory is unreadable — refusing to treat an "
            f"inconsistent store as fresh"
        ) from exc


def read_store(spark: SparkSession, store_path: str) -> DataFrame | None:
    """The committed store contents (None when fresh): the version named by
    the highest commit marker."""
    last = last_committed_batch(spark, store_path)
    if last < 0:
        return None
    return read_version(spark, store_path, last)


def apply_batch(
    spark: SparkSession,
    store_path: str,
    merge_fn: Callable[[DataFrame | None], DataFrame],
    batch_id: int | None = None,
    collect_store: bool = False,
) -> bool:
    """Replay-guarded read-merge-write commit: ``merge_fn(current)`` maps
    the committed store (None when fresh) to the next version, which is
    written to a NEW version path and then committed by marker creation.
    Returns False when the batch id is already committed (replay).
    ``batch_id=None`` auto-assigns ``last + 1`` (non-streaming callers).

    ``collect_store=True`` materializes the merged result on the driver
    before writing — ONLY for stores known to be aggregate-sized (the
    rollup sink's buckets × types). Table-sized stores (CDC) keep the
    write distributed: the new version is a different directory from the
    version being read, so no read-overwrite hazard exists.

    SINGLE-WRITER contract: the list-markers → read → merge → write
    sequence is not safe under concurrent writers to the same store (two
    callers can both merge against the same base and both claim commit id
    ``last + 1`` — a classic lost update). Structured Streaming's
    ``foreachBatch`` serializes batches per query, which is the intended
    deployment; for any other caller two probes turn a detected race into
    an error: a pre-write probe (BEFORE the version parquet is touched,
    so a stale-base merge never overwrites data another writer already
    committed under this id) and a ``createNewFile`` commit claim. The
    claim is atomic only where the FileSystem implements it so (HDFS);
    the default implementation — local FS, S3A — is check-then-create,
    so a narrow double-commit window remains there, as does the window
    where two writers interleave parquet writes to the same version path.
    The single-writer CONTRACT is the guarantee; the probes only shrink
    the detection window and bound the blast radius."""
    committed = committed_ids(spark, store_path)  # ONE listing per batch
    last = committed[-1] if committed else -1
    if batch_id is not None and batch_id <= last:
        return False
    commit_id = batch_id if batch_id is not None else last + 1
    fs, marker = hadoop_fs(spark, commits_dir(store_path) + f"/{commit_id}")
    if fs.exists(marker):
        raise RuntimeError(
            f"store {store_path!r}: commit marker {commit_id} already exists "
            f"— concurrent writer detected before any data was written; this "
            f"sink requires a single writer per store (see apply_batch "
            f"docstring)"
        )
    current = None if last < 0 else read_version(spark, store_path, last)
    merged = merge_fn(current)
    new_version = version_path(store_path, commit_id)
    if collect_store:
        out = merged.collect()  # aggregate-sized; decouples read from write
        spark.createDataFrame(out, merged.schema).write.mode("overwrite").parquet(new_version)
    else:
        merged.write.mode("overwrite").parquet(new_version)
    # COMMIT POINT: create-if-absent of the marker FILE (atomic on HDFS,
    # best-effort elsewhere — see docstring). A loser that raced past the
    # pre-write probe raises here instead of silently double-committing;
    # HDFS signals the loss as FileAlreadyExistsException from create(),
    # normalized to the same error. (committed_ids and read_store only look
    # at marker NAMES, so file markers coexist with the directory markers
    # older stores may hold.)
    fs.mkdirs(hadoop_fs(spark, commits_dir(store_path))[1])
    try:
        claimed = fs.createNewFile(marker)
    except Exception as exc:  # py4j-wrapped FileAlreadyExistsException et al.
        raise RuntimeError(
            f"store {store_path!r}: lost the commit race for marker "
            f"{commit_id} — concurrent writer detected; version data for "
            f"this id may be interleaved (single-writer contract violated)"
        ) from exc
    if not claimed:
        raise RuntimeError(
            f"store {store_path!r}: lost the commit race for marker "
            f"{commit_id} — concurrent writer detected; version data for "
            f"this id may be interleaved (single-writer contract violated)"
        )
    # best-effort cleanup, RETAINING the immediately-previous version as a
    # lag buffer: a concurrent reader that resolved `last` just before this
    # commit can still finish its action (markers below `last` go too)
    for old_id in [i for i in committed if i < last]:
        try:
            old_fs, old_path = hadoop_fs(spark, version_path(store_path, old_id))
            old_fs.delete(old_path, True)
            _, old_marker = hadoop_fs(spark, commits_dir(store_path) + f"/{old_id}")
            old_fs.delete(old_marker, True)
        except Exception:
            pass
    return True
