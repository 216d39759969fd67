"""Data profiling — the per-column summary pass an ETL engine runs before
trusting a new feed (null counts, exact distinct cardinality, min/max).

One aggregate over ONE scan computes every metric for every column
(4 × |cols| aggregate expressions in a single hash-less global agg), and the
single result row explodes into long format (column, metrics) — no
per-column scans, no driver-side loop over columns at execution time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str], exact: bool = True, rsd: float = 0.01) -> DataFrame:
    """(column, n_nulls, n_distinct, min_value, max_value) per requested
    column — min/max taken in the column's NATIVE ordering, then rendered
    as strings (so integer columns don't sort lexicographically).

    ``exact`` picks the distinct-count strategy: True (default, the q103
    oracle-checkable mode) uses ``count_distinct`` — N distinct aggregates
    in one global agg compile to an Expand (row × |cols|) feeding a single
    final reducer, fine for profiling samples and small feeds; False swaps
    in ``approx_count_distinct`` (HLL++, ``rsd`` error), keeping the whole
    profile one map-side reduction with fixed-size state — the 100 TB
    mode. Same schema either way, so callers flip the flag, not their
    downstream code."""
    nd = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c), rsd=rsd))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            nd(c).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"{c}__nulls").alias("n_nulls"),
                    F.col(f"{c}__nd").alias("n_distinct"),
                    F.col(f"{c}__min").alias("min_value"),
                    F.col(f"{c}__max").alias("max_value"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return one.select(rows).select("p.*")
