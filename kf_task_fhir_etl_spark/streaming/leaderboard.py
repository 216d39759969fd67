"""Streaming top-k maintenance — a CDC change stream drives BOTH a keyed
base table (LWW, streaming/cdc.py semantics) and its per-group top-k view
(operators/ivm.py::apply_topk_delta) — the leaderboard-over-an-ingest-edge
shape, and the piece that makes the IVM family stream-ready end to end.

ONE STORE, ONE COMMIT: base rows (with their ``__op``/``__order`` LWW
markers, tombstones included) and view rows (tagged ``__op = '__view__'``)
live in the SAME versioned store, produced by one merge function and
committed by one marker. Two separate stores would re-open the classic
multi-store atomicity hole under at-least-once replay: base committed,
view crashed → the replayed view merge would derive its entity changelog
against the ALREADY-ADVANCED base and double-apply. With one commit the
pair can never diverge — a replayed batch is skipped for both or applied
for both.

Per microbatch the sink is pure composition of proven pieces:

1. ``cdc_reduce`` the batch per ENTITY (keys + id) — LWW winners;
2. ``cdc_apply_batch`` → the new base (LWW merge, tombstones retained);
3. derive the entity changelog for the view as a PRE-vs-POST snapshot
   diff of ONLY the touched entities (two broadcast-semi slices + one
   batch-sized join): live before ≠ live after → (−1 old)/(+1 new) as
   applicable; unchanged → nothing. Diffing LWW's actual OUTCOME — not
   the raw batch ops — is what keeps base and view converged when an
   out-of-order change LOSES the merge (a stale delete against an
   already-newer upsert must be a view no-op, because it was a base
   no-op); it also makes NULL-score transitions fall out (a NULL-score
   row never ranked, so its appearance/disappearance emits only the
   non-NULL side of the diff);
4. ``apply_topk_delta`` → the new view (inserts fold; only member-hit
   deletes re-rank their groups — against the new LIVE base, which is
   exactly the operator's post-changelog ``base_new`` contract);
5. union, tag, one commit.

Scale shape: steps 1-2 are batch-sized; step 3 is the CDC copy-on-write
merge (table-sized, distributed — partition the store by a key prefix at
real scale); step 4 is view-sized folds plus pruned re-ranks. The view
adds k·|groups| rows to the store — noise next to the base.

Reference anchor: the reference pipeline has no streaming surface and no
materialized-view maintenance (SURVEY.md §2.8); this composes the
engine's own CDC (q128) and top-k IVM (q149) extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.streaming import cdc, versioned_store

TAG_VIEW = "__view__"


def _split_store(current: DataFrame | None):
    if current is None:
        return None, None
    return (
        current.filter(F.col("__op") != TAG_VIEW),
        current.filter(F.col("__op") == TAG_VIEW),
    )


def topk_stream(
    changes: DataFrame,
    store_path: str,
    keys: list[str],
    id_col: str,
    score_col: str,
    k: int,
    order_col: str,
    op_col: str,
    checkpoint: str | None = None,
):
    """Attach the leaderboard sink to a CDC change stream. Stream rows are
    (keys…, id, score, order_col, op_col) with op ∈ {'upsert', 'delete'}
    (delete rows may carry a null score — they name the pre-batch row by
    id). Returns the started StreamingQuery; read results back with
    ``read_leaderboard`` / ``read_live_table``. The ``'__view__'`` op
    value is reserved for the store's view tag and rejected IN-PLAN."""
    reserved = {"__op", "__order", "__rn"}
    clashes = (reserved & set(changes.columns)) | (reserved & {op_col, order_col})
    if clashes:
        raise ValueError(
            f"topk_stream: column names {sorted(clashes)} are reserved for "
            "the store's internal markers; rename them on the change stream"
        )
    spark = changes.sparkSession
    ent_keys = keys + [id_col]
    data_cols = keys + [id_col, score_col]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        staged = (
            batch_df.withColumn(
                "__op",
                F.when(
                    F.col(op_col) != TAG_VIEW, F.col(op_col)
                ).otherwise(
                    F.raise_error(
                        F.lit("topk_stream: op value '__view__' is reserved")
                    )
                ),
            )
            .withColumn("__order", F.col(order_col))
            .drop(op_col, order_col)
        )

        def merge(current: DataFrame | None) -> DataFrame:
            cur_base, cur_view_tagged = _split_store(current)
            winners = cdc.cdc_reduce(staged, ent_keys, "__order", "__op")
            base_new = cdc.cdc_apply_batch(
                cur_base, winners, ent_keys, "__order", "__op"
            )
            live_new = base_new.filter(F.col("__op") != cdc.OP_DELETE).select(
                *data_cols
            )
            if cur_base is None:
                cur_live = live_new.limit(0)
                cur_view = live_new.limit(0)
            else:
                cur_live = cur_base.filter(F.col("__op") != cdc.OP_DELETE).select(
                    *data_cols
                )
                cur_view = cur_view_tagged.select(*data_cols)
            # entity changelog = pre-vs-post snapshot diff of the TOUCHED
            # entities (see module docstring step 3): LWW's outcome, not
            # the raw ops, drives the view
            touched = winners.select(*ent_keys)
            pre = cur_live.join(F.broadcast(touched), ent_keys, "left_semi").select(
                *ent_keys, F.col(score_col).alias("__old")
            )
            post = live_new.join(F.broadcast(touched), ent_keys, "left_semi").select(
                *ent_keys, F.col(score_col).alias("__new")
            )
            j = touched.join(pre, ent_keys, "left").join(post, ent_keys, "left")
            changed = ~F.col("__old").eqNullSafe(F.col("__new"))
            minus = j.filter(F.col("__old").isNotNull() & changed).select(
                *keys, id_col, F.col("__old").alias(score_col),
                F.lit(-1).alias("__sign"),
            )
            plus = j.filter(F.col("__new").isNotNull() & changed).select(
                *keys, id_col, F.col("__new").alias(score_col),
                F.lit(1).alias("__sign"),
            )
            delta = minus.unionByName(plus)
            from kf_task_fhir_etl_spark.operators.ivm import apply_topk_delta

            view_new = apply_topk_delta(
                cur_view,
                live_new,
                delta,
                keys=keys,
                id_col=id_col,
                score_col=score_col,
                k=k,
                sign_col="__sign",
            )
            order_t = dict(staged.dtypes)["__order"]
            return base_new.unionByName(
                view_new.select(
                    *data_cols,
                    F.lit(TAG_VIEW).alias("__op"),
                    F.lit(None).cast(order_t).alias("__order"),
                )
            )

        versioned_store.apply_batch(spark, store_path, merge, batch_id=batch_id)

    writer = changes.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_leaderboard(spark: SparkSession, store_path: str, data_cols: list[str]) -> DataFrame | None:
    """The maintained top-k view (None when the store is fresh)."""
    store = versioned_store.read_store(spark, store_path)
    if store is None:
        return None
    return store.filter(F.col("__op") == TAG_VIEW).select(*data_cols)


def read_live_table(spark: SparkSession, store_path: str, data_cols: list[str]) -> DataFrame | None:
    """The maintained live base table (tombstones and view rows stripped)."""
    store = versioned_store.read_store(spark, store_path)
    if store is None:
        return None
    return store.filter(
        (F.col("__op") != TAG_VIEW) & (F.col("__op") != cdc.OP_DELETE)
    ).select(*data_cols)
