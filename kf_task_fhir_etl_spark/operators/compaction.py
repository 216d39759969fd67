"""Small-file compaction — the bin-packing rewrite every partitioned table
at 100 TB runs as maintenance (the operator behind Delta's OPTIMIZE /
Iceberg's rewrite_data_files, re-expressed on plain parquet layouts like the
ones q119's partitioned staging writes).

Why it exists: streaming sinks and per-batch appends leave partition dirs
with hundreds of KB-sized files; every later scan then pays one task + one
footer read per file, and the driver pays the listing. Compaction rewrites
each partition's files into ~target-sized bins, preserving rows exactly.

Shape:
- the FILE inventory is metadata (one row per file — manifest-scale even at
  100 TB tables); it is listed driver-side (a real deployment reads the
  table-format manifest instead) and the bin ASSIGNMENT is computed
  relationally (one window over the inventory, no data read);
- the REWRITE fans out one small job per bin (read that bin's files,
  coalesce(1), write one file into the destination partition dir),
  submitted concurrently — per-bin jobs are independent, touch only their
  own files, and never shuffle (coalesce of a few input splits);
- the caller owns destination staging/atomicity (the q127 gate wraps the
  rewrite in catalog.staged_layout's build-then-rename publish; the
  operator itself enforces a fresh destination and documents the
  single-writer contract rather than faking transactionality).

Binning rule (deterministic, window-expressible in any SQL engine): within
a partition, order files by (bytes DESC, path ASC) and cut on the running
total — ``bin = floor((cumsum − bytes) / target)``. Every bin lands in
[target − max_file, target + max_file) except the last; the rule is a
one-pass scan, needs no iteration, and two engines computing it over the
same inventory agree exactly (q127's oracle re-derives the expected row
counts; the binning arithmetic itself is pytest-pinned).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def list_files(path: str) -> list[dict]:
    """Inventory of data files under a (possibly partitioned) parquet
    layout: [{partition, file, bytes}], partition = the file's RELATIVE DIR
    PATH ('' for a flat layout) — for a multi-level layout that is the full
    chain ``k1=v1/k2=v2``, not a single value. Consumers extracting
    partition VALUES must parse accordingly (``partition_values``; a naive
    ``split('=')[1]`` reads 'v1/k2' from a two-level path — r06 review).
    Marker/temp entries (hidden, `_SUCCESS`, …) are skipped the same way
    content_fingerprint skips them."""
    out: list[dict] = []
    for root, dirs, names in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        rel = os.path.relpath(root, path)
        partition = "" if rel == "." else rel
        for name in names:
            if name.startswith((".", "_")):
                continue
            full = os.path.join(root, name)
            out.append({"partition": partition, "file": full, "bytes": os.stat(full).st_size})
    return sorted(out, key=lambda r: (r["partition"], r["file"]))


def _unescape_path_name(v: str) -> str | None:
    """Invert Hive/Spark partition-path escaping: ``%XX`` byte escapes
    (Spark's ``ExternalCatalogUtils.escapePathName`` writes ':' as
    ``%3A`` etc.) and the ``__HIVE_DEFAULT_PARTITION__`` sentinel for a
    NULL partition value."""
    if v == "__HIVE_DEFAULT_PARTITION__":
        return None
    out: list[str] = []
    i = 0
    while i < len(v):
        ch = v[i]
        if ch == "%" and i + 3 <= len(v):
            hex2 = v[i + 1 : i + 3]
            # STRICTLY two hex digits, matching the engines' unescape —
            # int(x, 16) alone also accepts '+2'/' 1', decoding sequences
            # Spark would keep literal (r06 review)
            if all(c in "0123456789abcdefABCDEF" for c in hex2):
                out.append(chr(int(hex2, 16)))
                i += 3
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def partition_values(partition: str) -> dict[str, str | None]:
    """Parse a ``list_files`` partition label (``k1=v1/k2=v2``) into its
    column→value dict ({} for a flat layout). The one correct way to read
    VALUES out of the label — splitting the whole string on '=' silently
    mis-parses multi-level layouts, and raw dir names carry Hive ``%XX``
    escapes (a value 'a:b' is written as ``a%3Ab``) plus the
    ``__HIVE_DEFAULT_PARTITION__`` NULL sentinel, both of which the
    engines decode when READING the column — so a join between parsed
    labels and read-back values must decode too (r06 review, 7th pass)."""
    if not partition:
        return {}
    out: dict[str, str | None] = {}
    for seg in partition.split(os.sep):
        k, _, v = seg.partition("=")
        out[k] = _unescape_path_name(v)
    return out


def compaction_plan(spark: SparkSession, files: list[dict], target_bytes: int) -> DataFrame:
    """Bin assignment over a file inventory (see module docstring for the
    rule): returns (partition, file, bytes, bin). Pure metadata relational
    work — one window, no data files touched."""
    if not files:
        return spark.createDataFrame([], "partition string, file string, bytes bigint, bin int")
    inv = spark.createDataFrame(files, "partition string, file string, bytes bigint")
    w = (
        Window.partitionBy("partition")
        .orderBy(F.desc("bytes"), F.asc("file"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return inv.select(
        "partition",
        "file",
        "bytes",
        F.floor((F.sum("bytes").over(w) - F.col("bytes")) / F.lit(target_bytes))
        .cast("int")
        .alias("bin"),
    )


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int,
    parallelism: int = 8,
) -> DataFrame:
    """Rewrite ``src_path``'s layout into ``dst_path`` with ≤ one file per
    bin per partition. Returns the per-partition summary DataFrame
    (partition, n_files_before, n_bins, n_files_after). ``dst_path`` must
    not exist (single-writer: stage + atomic rename is the caller's
    publish step, catalog.staged_layout being the proven wrapper)."""
    if os.path.exists(dst_path):
        raise ValueError(
            f"compact: destination {dst_path!r} exists — compaction writes a "
            "fresh layout; publish via rename (catalog.staged_layout)"
        )
    files = list_files(src_path)
    plan = compaction_plan(spark, files, target_bytes).collect()  # manifest-scale
    bins: dict[tuple[str, int], list[str]] = {}
    for r in plan:
        bins.setdefault((r["partition"], r["bin"]), []).append(r["file"])
    by_partition: dict[str, list[list[str]]] = {}
    for (partition, bin_id), paths in sorted(bins.items()):
        by_partition.setdefault(partition, []).append(paths)

    def rewrite_partition(item: tuple[str, list[list[str]]]) -> None:
        partition, bin_list = item
        out_dir = os.path.join(dst_path, partition) if partition else dst_path
        # bins WITHIN a partition dir run sequentially: concurrent append
        # jobs into one directory race on the committer's shared
        # `_temporary` staging; partitions (distinct dirs) run in parallel
        for paths in bin_list:
            # one output file per bin: the bin's files are a handful of
            # input splits, so coalesce(1) is a local concat, not a shuffle
            # mergeSchema: append layouts evolve (newer small files carry
            # late-added columns — the exact streaming-sink pathology this
            # op maintains); the default single-footer schema would
            # silently drop those columns from rows in older-footer bins
            # while row counts still matched (r06 review). Extra footer
            # reads are metadata-sized — negligible next to the rewrite.
            spark.read.option("mergeSchema", "true").parquet(*sorted(paths)).coalesce(
                1
            ).write.mode("append").parquet(out_dir)

    from concurrent.futures import ThreadPoolExecutor

    items = sorted(by_partition.items())
    with ThreadPoolExecutor(max_workers=max(1, min(parallelism, len(items) or 1))) as ex:
        list(ex.map(rewrite_partition, items))

    after = list_files(dst_path)
    summary: dict[str, dict[str, int]] = {}
    for r in files:
        s = summary.setdefault(r["partition"], {"before": 0, "bins": 0, "after": 0})
        s["before"] += 1
    for (partition, _b), _paths in bins.items():
        summary[partition]["bins"] += 1
    for r in after:
        summary[r["partition"]]["after"] += 1
    return spark.createDataFrame(
        [
            (p, s["before"], s["bins"], s["after"])
            for p, s in sorted(summary.items())
        ],
        "partition string, n_files_before int, n_bins int, n_files_after int",
    )
