"""Z-order (Morton) clustering — multi-dimensional data skipping, the
layout-maintenance member the bucketed (q95), partitioned (q119), and
compacted (q127) layouts still lacked. Interleaving the bits of N quantized
dimensions puts rows that are close in EVERY dimension into the same
z-range; range-partitioning the write by the z-value then gives each output
file a tight min/max envelope on EACH dimension, so a box query (user range
× value range) skips most files on ordinary parquet min/max pruning — the
Delta/Iceberg OPTIMIZE ZORDER technique, expressed as plain Spark.

Spark-first shape:

- ``z_value`` is a PURE UNROLLED EXPRESSION (bits × ncols shift/mask/or
  terms — whole-stage codegen, no UDF), and deliberately SQL-portable: the
  q130 gate's DuckDB oracle recomputes the identical interleave with the
  same ``& >> <<`` arithmetic, so z-values hash-check cross-engine.
- inputs are quantized by the CALLER to non-negative ints < 2^bits
  (``quantize_fixed`` covers the common fixed-range case); quantization is
  domain knowledge, interleaving is not.
- ``zorder_write`` = repartitionByRange(z) → sortWithinPartitions(z) →
  parquet. RANGE partitioning is the point: hash partitioning would
  scatter each z-range across every file and destroy the envelopes. At
  100 TB the range exchange samples the z-distribution (Spark's
  RangePartitioner) and each task writes one tight file — the same
  one-shuffle cost as any global sort-write.

The skipping property is MEASURED, not assumed: ``file_envelopes`` reads
back per-file min/max of the dimension columns (one metadata-sized
aggregation over input_file_name), and ``box_query_file_hits`` counts how
many files a box query must touch under min/max pruning — q130 gates that
a z-ordered layout touches ≤ half the files a same-file-count
random-layout write touches (on the driver corpora it is ~3-4× fewer).

Reference point: this is the standard Morton-code construction (Morton
1966; used by Delta OPTIMIZE ZORDER BY and Iceberg's sort-order zorder) —
public technique, re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_fixed(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Fixed-range quantizer: map [lo, hi] linearly onto [0, 2^bits),
    clamping out-of-range values — the caller-side half of the z-value
    contract. NULL stays NULL (and z_value of any NULL dim is NULL: a row
    with an unknown dimension has no defined z-position; callers route
    null-dim rows to a dedicated file the same way Hive routes
    __HIVE_DEFAULT_PARTITION__)."""
    if hi <= lo:
        raise ValueError(f"quantize_fixed: empty range [{lo}, {hi}]")
    n = (1 << bits) - 1
    scaled = F.floor((col - F.lit(lo)) / F.lit(float(hi - lo)) * F.lit(n + 1))
    clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit(n)).cast("bigint")
    # explicit NULL **and NaN** passthrough: Spark's greatest/least IGNORE
    # nulls (greatest(NULL, 0) = 0) and the engines disagree on NaN (Spark
    # floor→0, DuckDB sorts NaN greatest→255 — measured), so both quantize
    # to NULL z instead of silently landing in a real bucket (pytest-pinned)
    undefined = col.isNull() | F.isnan(col.cast("double"))
    return F.when(undefined, F.lit(None).cast("bigint")).otherwise(clamped)


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` quantized dimensions: bit i of
    column j lands at position ``i*ncols + j``. Unrolled shift/mask/or
    expression — codegen'd, UDF-free, and reproducible in ANSI SQL with
    the same arithmetic (the q130 oracle does exactly that)."""
    if not cols:
        raise ValueError("z_value needs at least one column")
    ncols = len(cols)
    if bits * ncols > 62:
        raise ValueError(f"bits*ncols must fit a signed 64-bit z, got {bits}*{ncols}")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1).cast("bigint"))
            # plain shiftleft: the shift amount is a Python int here (the
            # call_function detour is only for COLUMN shift amounts)
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return z


def zorder_write(
    df: DataFrame, path: str, zcol: Column, num_files: int
) -> None:
    """Cluster-by-z write: one range exchange on the z-value (each output
    file covers one contiguous z-range), sort within partitions so row
    groups inside a file are tight too, drop the helper column, write.

    ``__z`` is reserved: an input frame that already carries it would have
    its column silently REPLACED by the clustering key and then dropped
    from the written layout — reject loudly instead (ADVICE r06; the same
    reserved-name hazard cdc_stream guards against)."""
    if "__z" in df.columns:
        raise ValueError(
            "zorder_write: input already has a '__z' column, which this "
            "writer reserves for the clustering key; rename it first"
        )
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("error")
        .parquet(path)
    )


def file_envelopes(spark, path: str, dim_cols: list[str]) -> DataFrame:
    """Per-file min/max envelope of each dimension column: one aggregation
    grouped by input_file_name — metadata-sized output (one row per file),
    the relational stand-in for reading parquet footer stats."""
    df = spark.read.parquet(path)
    aggs = []
    for c in dim_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def box_query_file_hits(
    envelopes: DataFrame, box: dict[str, tuple[float, float]]
) -> DataFrame:
    """(n_files, n_hit) for a box query under min/max pruning: a file must
    be read iff EVERY queried dimension's [min,max] envelope intersects
    the box — the standard parquet row-group/file skipping rule."""
    cond = None
    for c, (lo, hi) in box.items():
        inter = (F.col(f"min_{c}") <= F.lit(hi)) & (F.col(f"max_{c}") >= F.lit(lo))
        cond = inter if cond is None else (cond & inter)
    return envelopes.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias("n_hit"),
    )
