"""Bucketed-table helpers: shuffle-free co-located joins.

SCALE.md claims big repeated equi-joins should be bucketed so the join is
co-located; these helpers make that claim concrete and testable. Bucketing
in Spark hash-partitions data into a fixed number of files per partition AT
WRITE TIME and records the layout in the catalog — two tables bucketed the
same way (same column, same count) then join with **zero Exchange** on
either side: the 100 TB shuffle happens once at write, not on every query.

Requires ``saveAsTable`` (bucket metadata lives in the metastore; a plain
``parquet(path)`` write silently drops it). Sort each bucket by the join key
so the join is also merge-ready without an in-memory sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the physical plan has no Exchange under either join child —
    assert it with ``require_no_shuffle_join``."""
    return spark.table(left_table).join(spark.table(right_table), on=[key])


def require_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the plan re-shuffles either join input (defeats bucketing).

    The check is textual over the executed plan: no Exchange operator may
    appear below the first join node."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_pos = min(
        (plan.find(tok) for tok in ("SortMergeJoin", "ShuffledHashJoin") if plan.find(tok) >= 0),
        default=-1,
    )
    if join_pos < 0:
        raise AssertionError(f"no shuffle-style join found in plan:\n{plan}")
    below = plan[join_pos:]
    if "Exchange hashpartitioning" in below:
        raise AssertionError(f"join input re-shuffled despite bucketing:\n{plan}")
