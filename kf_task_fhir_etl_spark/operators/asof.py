"""As-of and range joins — operators Spark lacks natively, composed from
built-ins (task-brief custom-operator path (a): composition, not UDFs).

**As-of join** (for each left row, the latest right row with ``ts ≤ left.ts``
per key): the union-window trick — tag both sides, sort within key by
``(ts, right-first)``, and carry the last-seen right payload forward with
``last(..., ignorenulls=True)``. One shuffle on the key, no range explosion;
works at any skew AQE can split. Equal timestamps: the right side sorts
first, so an exactly-simultaneous right row is visible to the left row
(inclusive ≤, matching DuckDB's ASOF JOIN).

**Range join** (left rows matched to right rows within a bounded time
window): bucketize the range key to hour buckets and equi-join on
(key, bucket ∈ {b-1, b}) before the exact range filter — the classic
bucketed range join; the join fans out 2× instead of O(n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + most recent right payload at-or-before each left ts."""
    right_payload = right_payload or [c for c in right.columns if c not in (key, ts_col)]
    payload_struct = F.struct(
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
    )
    r = right.select(
        F.col(key),
        F.col(ts_col),
        F.lit(1).alias("__is_right"),
        payload_struct.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (key, ts_col)],
    )
    l = left.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left.columns if c not in (key, ts_col)],
    )
    combined = r.unionByName(l)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_asof = combined.withColumn("__last_right", F.last("__payload", ignorenulls=True).over(w))
    return (
        with_asof.filter(F.col("__is_right") == 0)
        .select(
            key,
            ts_col,
            *[c for c in left.columns if c not in (key, ts_col)],
            F.col("__last_right.*"),
        )
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    lookback_seconds: int = 3600,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """For each left row, count right rows of the same key with
    ``right.ts ∈ (left.ts − lookback, left.ts]``. Bucketed: both sides get an
    epoch bucket of width ``lookback_seconds``; a right row can only match
    left rows in its own or the following bucket, so the equi-join on
    (key, bucket) with a 2-bucket fan-out replaces the unbounded theta-join."""
    bucket = lambda c: F.floor(c.cast("long") / F.lit(lookback_seconds))  # noqa: E731
    l = left.select(
        F.col(key), F.col(ts_col), F.monotonically_increasing_id().alias("__lid")
    ).withColumn("__bucket", bucket(F.col(ts_col)))
    # each right row appears in its bucket and the next
    r = (
        right.select(F.col(key).alias("__rkey"), F.col(ts_col).alias("__rts"))
        .withColumn("__b0", bucket(F.col("__rts")))
        .select("__rkey", "__rts", F.explode(F.array(F.col("__b0"), F.col("__b0") + 1)).alias("__bucket"))
    )
    joined = l.join(
        r,
        (l[key] == r["__rkey"])
        & (l["__bucket"] == r["__bucket"])
        & (r["__rts"] <= l[ts_col])
        & (r["__rts"] > l[ts_col] - F.expr(f"INTERVAL {lookback_seconds} SECONDS")),
        "left",
    )
    return (
        joined.groupBy("__lid", key, ts_col)
        .agg(F.count("__rts").alias(count_alias))
        .drop("__lid")
    )
