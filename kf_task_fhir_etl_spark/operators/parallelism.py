"""Scale-adaptive parallelism floor for CPU-dense stages over byte-small
inputs (optimization guide §2.5 "input skew" / §2.2).

Two distinct serialization traps share one root cause — BYTES are a bad
proxy for CPU-dense work (the r12 AQE experiment's lesson, inverted):

- **Scans.** A small parquet table is one file with one row group, so the
  scan plans as ONE task no matter how many cores exist; every downstream
  CPU-dense map (md5 shingling, tokenization, n-gram hashing) serializes
  on it. ``widen_for_cpu`` round-robin-repartitions such a scan up to the
  session's default parallelism. At scale the scan already exceeds core
  count and the probe short-circuits to a no-op — no shuffle is ever added
  on the path where the data is big. (Keyless ``repartition(n)`` is
  deterministic under retries: sort-before-repartition is on by default.)

- **Post-shuffle stages.** AQE's byte-based partition coalescing collapses
  a small-byte exchange to 1-2 partitions (`minPartitionSize` = 1 MB), so
  a CPU-dense consumer (LSH band self-join + Jaccard verify: O(pairs) of
  array intersections from KB-sized inputs) runs serial. Pinning an
  EXPLICIT partition count on that one exchange opts it out of AQE
  coalescing without touching the global config (the r12 experiment
  showed the global flip destroys exactly these stages in the other
  direction). ``cpu_partitions`` is the cluster-parameterized count to
  pin: the session's default parallelism, i.e. every core locally and the
  executor-core total on a cluster — never a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cpu_partitions(df_or_spark) -> int:
    """The session's core-wide parallelism (cluster-parameterized, never a
    constant): the right partition count for a CPU-bound, byte-small stage."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return spark.sparkContext.defaultParallelism


def widen_for_cpu(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to core parallelism when its planned
    scan yields fewer partitions; returns ``df`` unchanged (NO added shuffle)
    when the input is already core-wide — the 100 TB path. Project down to
    the needed columns BEFORE widening so the added local shuffle moves only
    the bytes the CPU-dense consumer reads (guide §2.3)."""
    if df.isStreaming:
        # a stream has no planned partition count to probe; its stateful
        # consumers set parallelism through the shuffle-partition conf
        return df
    target = cpu_partitions(df)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
