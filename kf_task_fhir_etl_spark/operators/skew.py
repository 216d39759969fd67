"""Skew-mitigation utilities: deterministic salted joins.

AQE's skew-join splitting handles sort-merge skew automatically (enabled in
``session.py``), but aggregate/join skew on a pathological hot key sometimes
needs explicit salting. The salt here is derived from a hash of a
distinguishing column — deterministic, so results are reproducible and no
RNG state ships to executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(col: Column, buckets: int) -> Column:
    """Stable salt in [0, buckets) from any column (xxhash64 — fast, JVM)."""
    return F.pmod(F.xxhash64(col), F.lit(buckets))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_from: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the left side's hot keys are spread across
    ``buckets`` partitions: left rows get a salt from ``salt_from`` (a
    left-side column that varies within a key, e.g. its primary key), and the
    right side is replicated ``buckets`` times so every salted partition sees
    its match. Right-side replication costs buckets× its size — use for
    dimension-sized right sides with a skewed fact on the left."""
    l = left.withColumn("__salt", deterministic_salt(F.col(salt_from), buckets))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<bigint>"))
    )
    return l.join(r, on=[key, "__salt"], how=how).drop("__salt")


def salted_count(df: DataFrame, key: str, salt_from: str, buckets: int = 8) -> DataFrame:
    """Two-phase aggregation for skewed group-bys: partial count per
    (key, salt) then final sum per key. Spark's partial aggregation usually
    does this already; explicit salting helps when the second-stage key is
    still hot (e.g. count-distinct rewrites)."""
    partial = (
        df.withColumn("__salt", deterministic_salt(F.col(salt_from), buckets))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("n"))
