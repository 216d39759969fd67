"""Streaming join+aggregate materialized-view maintenance — the warehouse
MATERIALIZED VIEW ``SELECT keys, COUNT(*), SUM(x)… FROM R JOIN S USING
(on) GROUP BY keys`` kept current from a MULTIPLEXED signed changelog
stream over BOTH base tables (VERDICT r09 Next #3: the composition proof
for the IVM family, lifted onto the streaming/storage substrate the
leaderboard built).

ONE STORE, ONE COMMIT, THREE PARTITIONS: the partitioned versioned store
(``versioned_store.apply_batch_partitioned``, dict form — partitions may
hold different relations) holds base R, base S, and the view, committed
by one marker per microbatch. The classic multi-store hole (view advanced
against an already-advanced base under at-least-once replay) is closed by
construction, and a microbatch that carries changes for only ONE side
leaves the other side's partition untouched on disk — carried forward by
manifest reference, byte-identical.

Per microbatch:

1. split the batch by ``side_col`` into ΔR / ΔS (each a signed changelog:
   the side's columns + op ∈ {+1, −1}); a side with no rows is None;
2. ``ivm.apply_join_view_delta`` folds the three-term delta join
   Δ(R⋈S) = ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS into the stored view — the base tables
   are touched ONLY by the broadcast delta-driven joins, never rescanned;
3. each side's base partition is maintained as a SIGNED MULTISET — one
   stored row per distinct tuple with its multiplicity ``__m`` (the
   standard changelog-to-table compaction): a null-safe full-outer merge
   of the batch's per-tuple op sums, exact zeros vanishing. The join
   re-expands multiplicities lazily (``array_repeat``), so bag join
   semantics are exact. A malformed log that drives ``__m`` negative
   stays in the store (loud downstream, the apply_agg_delta convention)
   but contributes nothing to joins until compensated;
4. one dict-form commit: only the partitions a batch touched rewrite.

View bootstrap is IVM itself: a fresh store starts from the EMPTY view
(dtypes derived from the declared join+agg plan over zero rows) and the
initial load is just the first changelog — no from-scratch build path
exists to drift from the incremental one.

Scale shape: the per-batch shuffles are changelog-sized (the delta
groupBys) plus the touched bases' merge; the view is aggregate-sized; a
one-sided batch costs nothing on the other side's storage. For deltas too
large to broadcast set ``broadcast_deltas=False`` (shuffle joins, never a
base×base join).

Reference anchor: the reference pipeline recomputes everything per run
(``etl/ingest.py`` full-table loads, no materialized views, no streaming
surface — SURVEY.md §2.8); this composes the engine's own join-IVM (q144)
and partitioned-store (q155) extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.operators import ivm
from kf_task_fhir_etl_spark.streaming import versioned_store

R_PART = "R"
S_PART = "S"
VIEW_PART = "view"
MULT_COL = "__m"


def apply_base_delta(cur: DataFrame | None, delta: DataFrame, cols: list[str], sign_col: str) -> DataFrame:
    """Maintain a signed-multiset base partition: ``cur`` is (cols, __m),
    ``delta`` is (cols, sign). Null-safe full-outer merge per distinct
    tuple; exact-zero multiplicities vanish. This is apply_agg_delta with
    the GROUP being the whole tuple — kept separate because the base has
    no untouched-group pass-through subtlety (a tuple the delta does not
    name merges with __dm = 0 … and is therefore simply not in the
    batch-sized right side at all)."""
    d = (
        delta.groupBy(*cols)
        .agg(F.sum(F.col(sign_col)).cast("bigint").alias("__dm"))
        .filter(F.col("__dm") != 0)
        .select(*[F.col(c).alias(f"__d_{c}") for c in cols], "__dm")
    )
    if cur is None:
        return d.select(
            *[F.col(f"__d_{c}").alias(c) for c in cols], F.col("__dm").alias(MULT_COL)
        )
    merged = cur.join(d, ivm.ns_eq_cond(cols, [f"__d_{c}" for c in cols]), "full")
    zero = F.lit(0).cast("bigint")
    return merged.select(
        *[F.coalesce(F.col(c), F.col(f"__d_{c}")).alias(c) for c in cols],
        (F.coalesce(F.col(MULT_COL), zero) + F.coalesce(F.col("__dm"), zero)).alias(MULT_COL),
    ).filter(F.col(MULT_COL) != 0)


def expand_base(stored: DataFrame | None, cols: list[str], template: DataFrame) -> DataFrame:
    """Stored multiset → bag of rows for the delta joins (``array_repeat``
    re-expansion; non-positive multiplicities expand to nothing). None →
    the empty bag with the side's exact dtypes (``template``-derived)."""
    if stored is None:
        return template.select(*cols).limit(0)
    return (
        stored.select(*cols, F.explode(F.array_repeat(F.lit(1), F.col(MULT_COL).cast("int"))).alias("__x"))
        .drop("__x")
    )


def join_agg_view_stream(
    changes: DataFrame,
    store_path: str,
    side_col: str,
    r_cols: list[str],
    s_cols: list[str],
    on: list[str],
    keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n",
    op_col: str = "op",
    checkpoint: str | None = None,
    broadcast_deltas: bool = True,
):
    """Attach the join+agg matview sink to a multiplexed changelog stream.
    Stream rows carry ``side_col`` ∈ {'R', 'S'}, the UNION of both sides'
    columns (a row populates its own side's columns; the other side's are
    ignored), and ``op_col`` ∈ {+1, −1}. Returns the started
    StreamingQuery; read back with ``read_view`` / ``read_base``."""
    for side, cols in (("R", r_cols), ("S", s_cols)):
        missing = [c for c in cols if c not in changes.columns]
        if missing:
            raise ValueError(f"join_agg_view_stream: stream lacks {side} columns {missing}")
    dunder = [c for c in changes.columns if c.startswith("__")]
    if dunder:
        raise ValueError(
            f"join_agg_view_stream: column names {dunder} are reserved "
            "('__'-prefixed); rename them on the change stream"
        )
    spark = changes.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        staged = batch_df.withColumn(
            "__side",
            F.when(F.col(side_col).isin("R", "S"), F.col(side_col)).otherwise(
                F.raise_error(F.lit("join_agg_view_stream: side must be 'R' or 'S'"))
            ),
        )

        def merge(read_parts):
            delta_r = staged.filter(F.col("__side") == "R").select(*r_cols, F.col(op_col).alias("__op"))
            delta_s = staged.filter(F.col("__side") == "S").select(*s_cols, F.col(op_col).alias("__op"))
            has_r = bool(delta_r.take(1))
            has_s = bool(delta_s.take(1))
            if not has_r and not has_s:
                return {}  # bump the replay guard, rewrite nothing
            r_stored = read_parts([R_PART])
            s_stored = read_parts([S_PART])
            r_old = expand_base(r_stored, r_cols, delta_r)
            s_old = expand_base(s_stored, s_cols, delta_s)
            view_stored = read_parts([VIEW_PART])
            if view_stored is None:
                # dtype-exact empty view from the declared plan over 0 rows
                view_stored = (
                    r_old.limit(0)
                    .join(s_old.limit(0), on)
                    .groupBy(*keys)
                    .agg(
                        F.count(F.lit(1)).alias(count_col),
                        *[F.sum(src).alias(alias) for alias, src in sum_cols.items()],
                    )
                )
            new_view = ivm.apply_join_view_delta(
                view_stored,
                r_old,
                s_old,
                delta_r if has_r else None,
                delta_s if has_s else None,
                on=on,
                keys=keys,
                sum_cols=sum_cols,
                count_col=count_col,
                sign_col="__op",
                broadcast_deltas=broadcast_deltas,
            )
            out = {VIEW_PART: new_view}
            if has_r:
                out[R_PART] = apply_base_delta(r_stored, delta_r, r_cols, "__op")
            if has_s:
                out[S_PART] = apply_base_delta(s_stored, delta_s, s_cols, "__op")
            return out

        versioned_store.apply_batch_partitioned(spark, store_path, merge, batch_id=batch_id)

    writer = changes.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_view(spark: SparkSession, store_path: str) -> DataFrame | None:
    """The maintained aggregate view (None when the store is fresh)."""
    return versioned_store.read_partitions(spark, store_path, [VIEW_PART])


def read_base(spark: SparkSession, store_path: str, side: str) -> DataFrame | None:
    """A maintained base multiset (columns + ``__m``); None when absent."""
    if side not in (R_PART, S_PART):
        raise ValueError(f"read_base: side must be 'R' or 'S', got {side!r}")
    return versioned_store.read_partitions(spark, store_path, [side])


# ---------------------------------------------------------------------------
# Streaming COUNT(DISTINCT) view maintenance (r10, completing the IVM
# streaming matrix: agg q133 / join+agg q152 / top-k q151 / distinct HERE).
# The support relation is the table-sized piece, so it buckets by GROUP-key
# hash like the leaderboard base: a microbatch rewrites only the buckets
# its delta's groups hash into (plus the aggregate-sized view partition);
# support rows and view rows share one widened schema so the commit stays
# ONE partitionBy write. apply_distinct_count_delta's untouched-group
# pass-through composes with the bucket slicing exactly: groups outside
# the touched buckets never even reach the operator — they carry forward
# as unopened files.
# ---------------------------------------------------------------------------

SUPPORT_MULT = "__m"
VIEW_COUNT = "__n"


def distinct_count_view_stream(
    changes: DataFrame,
    store_path: str,
    keys: list[str],
    value_col: str,
    op_col: str = "op",
    checkpoint: str | None = None,
    buckets: int = 16,
):
    """Maintain ``SELECT keys, COUNT(DISTINCT value) GROUP BY keys`` (plus
    its Gupta/Mumick support relation) from a signed changelog stream.
    Stream rows: keys… + value_col + op_col (+1/−1). Per microbatch the
    delta's touched buckets' support slices merge through
    ``ivm.apply_distinct_count_delta`` and rewrite; every other bucket's
    files carry forward by manifest reference; the view partition (one
    aggregate-sized partition) rewrites whole. Read back with
    ``read_distinct_view`` / ``read_distinct_support``."""
    dunder = [c for c in changes.columns if c.startswith("__")]
    if dunder:
        raise ValueError(
            f"distinct_count_view_stream: column names {dunder} are reserved "
            "('__'-prefixed); rename them on the change stream"
        )
    from kf_task_fhir_etl_spark.operators import ivm

    spark = changes.sparkSession
    bucket = versioned_store.bucket_value_expr(keys, buckets)
    data_cols = keys + [value_col]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.select(*data_cols, F.col(op_col).alias("__op"))

        def merge(read_parts):
            touched = sorted(
                r["__b"] for r in delta.select(bucket.alias("__b")).distinct().collect()
            )
            sup_slice = read_parts(touched) if touched else None
            if sup_slice is not None:
                sup_cur = sup_slice.select(*keys, value_col, F.col(SUPPORT_MULT))
            else:
                sup_cur = ivm.distinct_count_support(
                    delta.select(*data_cols).limit(0), keys, value_col, mult_col=SUPPORT_MULT
                )
            view_slice = read_parts([VIEW_PART])
            if view_slice is not None:
                view_cur = view_slice.select(*keys, F.col(VIEW_COUNT))
            else:
                view_cur = (
                    delta.limit(0)
                    .groupBy(*keys)
                    .agg(F.count_distinct(value_col).alias(VIEW_COUNT))
                )
            new_view, new_sup = ivm.apply_distinct_count_delta(
                view_cur,
                sup_cur,
                delta,
                keys,
                value_col,
                count_col=VIEW_COUNT,
                mult_col=SUPPORT_MULT,
                sign_col="__op",
            )
            vt = dict(new_view.dtypes)[VIEW_COUNT]
            st = dict(new_sup.dtypes)[SUPPORT_MULT]
            val_t = dict(new_sup.dtypes)[value_col]
            # one widened schema so base buckets + view commit in ONE write
            out = new_sup.select(
                *keys,
                value_col,
                F.col(SUPPORT_MULT),
                F.lit(None).cast(vt).alias(VIEW_COUNT),
                bucket.alias("__b"),
            ).unionByName(
                new_view.select(
                    *keys,
                    F.lit(None).cast(val_t).alias(value_col),
                    F.lit(None).cast(st).alias(SUPPORT_MULT),
                    F.col(VIEW_COUNT),
                    F.lit(VIEW_PART).alias("__b"),
                )
            )
            return out, "__b", touched + [VIEW_PART]

        versioned_store.apply_batch_partitioned(spark, store_path, merge, batch_id=batch_id)

    writer = changes.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_distinct_view(
    spark: SparkSession, store_path: str, keys: list[str], count_alias: str = "n_distinct"
) -> DataFrame | None:
    """The maintained COUNT(DISTINCT) view — a partition-pruned read of
    the view partition (support buckets never scanned)."""
    view = versioned_store.read_partitions(spark, store_path, [VIEW_PART])
    if view is None:
        return None
    return view.select(*keys, F.col(VIEW_COUNT).alias(count_alias))


def read_distinct_support(
    spark: SparkSession, store_path: str, keys: list[str], value_col: str
) -> DataFrame | None:
    """The maintained support relation (keys, value, multiplicity)."""
    last = versioned_store.last_committed_batch(spark, store_path)
    if last < 0:
        return None
    parts = [
        v for v in versioned_store.read_manifest(spark, store_path, last) if v != VIEW_PART
    ]
    sup = versioned_store.read_partitions(spark, store_path, parts) if parts else None
    if sup is None:
        return None
    return sup.select(*keys, value_col, F.col(SUPPORT_MULT).alias("m"))
