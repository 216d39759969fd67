"""Incremental time-bucket rollups (continuous-aggregate maintenance).

The hypertable pattern q53 gates is a one-shot aggregate; at 100 TB the
events table is never re-scanned — new batches are rolled up as they land
and MERGED into the stored rollup, and coarser grains (hour → day → month)
are derived from the stored rollup, not from raw events. That only works if
every stored measure is **mergeable state**:

- ``n`` / ``sum_value``: plain sums — associative, exact;
- ``users_sketch``: HyperLogLog sketch binary (``hll_sketch_agg``), merged
  with ``hll_union_agg`` — the mergeable replacement for COUNT(DISTINCT),
  which is NOT mergeable (distinct counts don't add) and is exactly what
  breaks naive incremental rollups.

Every function here is one ``groupBy`` with map-side partial aggregation on
a bounded-cardinality key (buckets × types), so a merge shuffles only
rollup-sized data regardless of how much raw input produced it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_KEYS = ("bucket", "event_type")


def time_bucket_rollup(
    events: DataFrame,
    grain: str = "hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Roll raw events up to ``grain``: exact count + sum, HLL user sketch.
    The bucket stays a TIMESTAMP so it can be re-truncated to coarser
    grains without parsing."""
    return (
        events.groupBy(
            F.date_trunc(grain, F.col(ts_col)).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.hll_sketch_agg(F.col(user_col).cast("string")).alias("users_sketch"),
        )
    )


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Merge rollup increments (e.g. yesterday's stored rollup + today's
    batch rollup): counts/sums add, sketches union. Input batches may
    overlap in buckets arbitrarily — the group-by re-combines them."""
    merged = rollups[0]
    for r in rollups[1:]:
        merged = merged.unionByName(r)
    return (
        merged.groupBy(*ROLLUP_KEYS)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.hll_union_agg("users_sketch").alias("users_sketch"),
        )
    )


def reroll_to_grain(rollup: DataFrame, grain: str) -> DataFrame:
    """Derive a coarser grain from a stored rollup WITHOUT touching raw
    events: re-truncate the bucket and merge. Valid for any grain coarser
    than the stored one (hour → day/week/month)."""
    return (
        rollup.withColumn("bucket", F.date_trunc(grain, F.col("bucket")))
        .groupBy(*ROLLUP_KEYS)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.hll_union_agg("users_sketch").alias("users_sketch"),
        )
    )


def finalize_rollup(rollup: DataFrame) -> DataFrame:
    """Read-side projection: estimate the sketch into a user count. Kept
    separate so the stored form stays mergeable."""
    return rollup.select(
        *ROLLUP_KEYS,
        "n",
        "sum_value",
        F.hll_sketch_estimate("users_sketch").alias("approx_users"),
    )
