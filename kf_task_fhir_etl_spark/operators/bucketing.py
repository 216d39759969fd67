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
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table — managed by
    default, external when ``path`` is given (the data files land at
    ``path`` while the bucket spec still registers in the catalog)."""
    writer = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str | None = None,
    left_key: str | None = None,
    right_key: str | None = None,
    hint: str | None = None,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (either one shared
    ``key`` or a ``left_key``/``right_key`` pair). With matching bucket
    specs the physical plan has no Exchange under either join child —
    assert it with ``require_no_shuffle_join``. ``hint`` (e.g. ``"merge"``)
    pins the join strategy so a broadcast pick can't silently bypass the
    bucketed layout being exercised."""
    left, right = spark.table(left_table), spark.table(right_table)
    if hint is not None:
        left = left.hint(hint)
    if key is not None:
        return left.join(right, on=[key])
    return left.join(right, on=left[left_key] == right[right_key])


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


def write_partitioned(df: DataFrame, path: str, partition_col: str, mode: str = "overwrite") -> None:
    """Persist ``df`` partitioned by ``partition_col`` — one directory per
    value, the layout that lets a filter (static OR runtime) skip whole
    directories at planning time instead of reading-and-discarding rows."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def require_dynamic_partition_pruning(df: DataFrame) -> None:
    """Raise unless the physical plan prunes a partitioned scan with a
    RUNTIME (join-derived) filter — the ``dynamicpruning`` subquery Spark
    inserts when the dimension side's selective filter is only knowable at
    execution time. The q119 gate calls this so the layout being exploited
    is an asserted property, not a hope (the q95 pattern: fail loudly, not
    slowly)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruning" not in plan.lower():
        raise AssertionError(
            "expected a dynamicpruning expression in the partitioned scan's "
            "PartitionFilters — the join is reading every partition:\n" + plan[:4000]
        )
