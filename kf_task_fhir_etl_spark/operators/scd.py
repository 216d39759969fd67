"""Slowly-changing-dimension (SCD type 2) history maintenance — the
incremental-merge counterpart of the keyed upsert sink (sources/sinks.py):
instead of overwriting a key's row, each snapshot application CLOSES the
superseded version (valid_to = snapshot epoch) and OPENS a new one, so the
table answers "what did this dimension look like at time T" forever.

Relational by construction: one full-outer equi-join on the key per
snapshot application — closed history passes through untouched (no shuffle),
and the join decides kept-open / close / open per key in a single pass. At
100 TB the history table should be written BUCKETED on the key
(operators/bucketing.py) so the nightly apply co-locates with each incoming
snapshot and the only exchange is the snapshot's own.

Epochs are caller-supplied integers (or dates cast to int) — never
wall-clock reads — so re-runs and retries produce identical histories, and
open rows carry an explicit ``open_end`` sentinel (the classic 9999 "high
date") rather than NULL, which keeps interval predicates sargable
(``valid_from <= t AND t < valid_to``) and hash-comparable across engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_END = 9999


def scd2_init(
    snapshot: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    t: int,
    open_end: int = OPEN_END,
) -> DataFrame:
    """Seed a history from the first snapshot: every row open at epoch t."""
    return snapshot.select(
        *key_cols,
        *attr_cols,
        F.lit(t).alias("valid_from"),
        F.lit(open_end).alias("valid_to"),
    )


def _all(conds: list[Column]) -> Column:
    return reduce(lambda a, b: a & b, conds)


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    t: int,
    open_end: int = OPEN_END,
) -> DataFrame:
    """Apply ``snapshot`` (the complete dimension state at epoch ``t``) to
    ``history``:

    - key in both, attributes unchanged → current row stays open;
    - key in both, attributes changed → current row closes at ``t``, a new
      row opens at ``t``;
    - key only in history (deleted upstream) → current row closes at ``t``;
    - key only in snapshot (new) → a new row opens at ``t``.

    Attribute comparison is null-safe. Closed rows never join — they are a
    passthrough union branch, so cost per application is bounded by
    |current| + |snapshot|, not by history depth."""
    closed = history.filter(F.col("valid_to") != open_end)
    cur = history.filter(F.col("valid_to") == open_end).withColumn("__cur", F.lit(True))
    snap = snapshot.select(
        *[F.col(c).alias(f"__s_{c}") for c in key_cols + attr_cols]
    ).withColumn("__snap", F.lit(True))
    cond = _all([cur[k].eqNullSafe(snap[f"__s_{k}"]) for k in key_cols])
    j = cur.join(snap, cond, "full_outer")
    # presence is detected via explicit marker columns, NOT key-column
    # null checks — the join condition is null-safe, so keys containing
    # NULL components are legal and must not read as "absent"
    in_cur = j["__cur"].isNotNull()
    in_snap = j["__snap"].isNotNull()
    same = _all([j[a].eqNullSafe(j[f"__s_{a}"]) for a in attr_cols])

    kept_open = j.filter(in_cur & in_snap & same).select(
        *key_cols, *attr_cols, "valid_from", "valid_to"
    )
    closed_now = j.filter(in_cur & (~in_snap | ~same)).select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lit(t).alias("valid_to"),
    )
    opened = j.filter(in_snap & (~in_cur | ~same)).select(
        *[F.col(f"__s_{c}").alias(c) for c in key_cols + attr_cols],
        F.lit(t).alias("valid_from"),
        F.lit(open_end).alias("valid_to"),
    )
    return closed.unionByName(kept_open).unionByName(closed_now).unionByName(opened)


def scd2_as_of(history: DataFrame, t: int) -> DataFrame:
    """The dimension state at epoch ``t`` — the half-open interval lookup
    the sentinel keeps sargable."""
    return history.filter((F.col("valid_from") <= t) & (F.lit(t) < F.col("valid_to"))).drop(
        "valid_from", "valid_to"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Changelog between two snapshots of a keyed table — the INVERSE of
    streaming/cdc.py's apply (which folds a changelog INTO a table): emit
    (keys…, op, new-side values) with op ∈ I/U/D, the feed a downstream
    CDC consumer or an ivm.apply_agg_delta caller needs when upstream only
    publishes full snapshots (the "snapshot-to-CDC" bridge every lakehouse
    table format ships as its change-data-feed).

    One null-safe full-outer equi-join on the key, decided per row:
    old-side absent → I, new-side absent → D (value columns NULL — the row
    no longer exists), both present → U only when some compared column
    differs NULL-SAFELY (a NULL→NULL column is unchanged; NULL→value is a
    change); identical rows are dropped. ``compare_cols`` defaults to all
    shared non-key columns. Keys join with eqNullSafe so a malformed
    NULL-keyed row pairs with its counterpart instead of fabricating an
    I+D pair. At scale this is one co-partitioned join; snapshots stored
    bucketed on the key (operators/bucketing.py) diff with no exchange at
    all."""
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in set(keys)
        ]
    o = old.select(
        F.lit(True).alias("__o_present"),
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__ov_{c}") for c in compare_cols],
    )
    n = new.select(
        F.lit(True).alias("__n_present"),
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__nv_{c}") for c in compare_cols],
    )
    cond = None
    for k in keys:
        eq = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full")
    # presence bits, not key-null tests: a full-outer-missing side leaves
    # ALL its columns NULL — including the literal — so isNotNull on the
    # literal is the presence test that stays correct even for rows whose
    # every key column is legitimately NULL
    old_present = F.col("__o_present").isNotNull()
    new_present = F.col("__n_present").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__ov_{c}").eqNullSafe(F.col(f"__nv_{c}"))
    op = (
        F.when(~old_present, F.lit("I"))
        .when(~new_present, F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
                for k in keys
            ],
            "op",
            *[F.col(f"__nv_{c}").alias(c) for c in compare_cols],
        )
    )
