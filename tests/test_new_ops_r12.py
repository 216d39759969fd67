"""r12 additions: shared label-graph CC in the forest insert fold (r11
ADVICE), replay-token unification across the streaming sinks (VERDICT r11
Next #2), bucket-count migration (Next #3), add-column schema evolution on
the versioned store (Next #4), and the bounded-stats guardrail (Next #5).
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)

from kf_task_fhir_etl_spark.streaming import versioned_store as vs


# ---------------------------------------------------------------------------
# graph_delta: phase 2 computes the label-graph CC exactly ONCE (r11 ADVICE —
# spanning_forest(comps=None) used to recompute the identical labeling)
# ---------------------------------------------------------------------------


def test_forest_delta_insert_fold_runs_one_cc(spark, monkeypatch):
    """An insert-only batch's phase 2 must invoke connected_components
    exactly once: the labeling feeds BOTH the broadcast remap and the
    label-graph spanning forest (passed via comps=). One BFS (inside
    spanning_forest) is expected; a second CC is the regression."""
    from kf_task_fhir_etl_spark.operators import dedup, graph, graph_delta

    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "node bigint")
    edges = spark.createDataFrame([(1, 2), (3, 4)], "id_a bigint, id_b bigint")
    comps = dedup.connected_components(nodes, edges, node_col="node")
    forest = graph_delta.spanning_forest(nodes, edges, comps=comps)

    calls = {"cc": 0, "bfs": 0}
    real_cc = graph_delta.connected_components

    def counting_cc(*a, **k):
        calls["cc"] += 1
        return real_cc(*a, **k)

    real_bfs = graph.bfs_distances

    def counting_bfs(*a, **k):
        calls["bfs"] += 1
        return real_bfs(*a, **k)

    monkeypatch.setattr(graph_delta, "connected_components", counting_cc)
    monkeypatch.setattr(graph, "bfs_distances", counting_bfs)
    delta = spark.createDataFrame([(2, 3, 1)], "id_a bigint, id_b bigint, op int")
    edges_new = spark.createDataFrame(
        [(1, 2), (3, 4), (2, 3)], "id_a bigint, id_b bigint"
    )
    l2, f2 = graph_delta.apply_components_delta_forest(comps, forest, edges_new, delta)
    want = dedup.connected_components(nodes, edges_new, node_col="node")
    assert sorted(map(tuple, l2.collect())) == sorted(map(tuple, want.collect()))
    assert calls == {"cc": 1, "bfs": 1}
    # the merged component still has exactly one spanning tree: 3 edges
    assert f2.count() == 3


# ---------------------------------------------------------------------------
# replay-token unification (VERDICT r11 Missing #1 / Next #2): topk_stream
# and both matview sinks now guard by manifest replay_token, so maintenance
# commits interleave without desynchronizing the stream — the q160 shape.
# ---------------------------------------------------------------------------


def test_stream_replay_floor_token_and_legacy_fallback(spark, tmp_path):
    """floor = recorded replay_token when present; for a pre-token store
    (batch-id-as-commit-id) the last commit id IS the last applied batch
    id; None when fresh."""
    one = spark.createDataFrame([(1,)], "x bigint")
    fresh = str(tmp_path / "fresh")
    assert vs.stream_replay_floor(spark, fresh) is None
    legacy = str(tmp_path / "legacy")
    vs.apply_batch_partitioned(spark, legacy, lambda rp: {"b0": one}, batch_id=3)
    assert vs.stream_replay_floor(spark, legacy) == 3
    tokened = str(tmp_path / "tokened")
    vs.apply_batch_partitioned(spark, tokened, lambda rp: {"b0": one}, replay_token=7)
    assert vs.stream_replay_floor(spark, tokened) == 7
    # a tokenless maintenance commit carries the token forward
    vs.apply_batch_partitioned(spark, tokened, lambda rp: {})
    assert vs.stream_replay_floor(spark, tokened) == 7


def _run_file_stream(spark, src, ckpt, schema, attach):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "e*"))
    )
    q = attach(stream, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_topk_stream_survives_interleaved_maintenance_commit(spark, tmp_path):
    """q160's interleave shape on the leaderboard store: stream a batch,
    quiesce, take a tokenless maintenance commit, resume the SAME
    checkpoint — the next batch must still apply (with batch-id-as-
    commit-id it read as a replay and was silently dropped)."""
    from kf_task_fhir_etl_spark.streaming import leaderboard

    schema = "g string, id bigint, s double, seq long, op string"
    src, ckpt, store = (str(tmp_path / n) for n in ("src", "ckpt", "store"))

    def attach(stream, c):
        return leaderboard.topk_stream(
            stream, store, keys=["g"], id_col="id", score_col="s", k=1,
            order_col="seq", op_col="op", checkpoint=c, buckets=3,
        )

    spark.createDataFrame(
        [("a", 1, 5.0, 1, "upsert")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e1"))
    _run_file_stream(spark, src, ckpt, schema, attach)
    vs.apply_batch_partitioned(spark, store, lambda rp: {})  # maintenance
    spark.createDataFrame(
        [("a", 2, 9.0, 2, "upsert")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e2"))
    _run_file_stream(spark, src, ckpt, schema, attach)
    view = leaderboard.read_leaderboard(spark, store, ["g", "id", "s"])
    assert sorted(tuple(r) for r in view.collect()) == [("a", 2, 9.0)]


def test_matview_stream_survives_interleaved_maintenance_commit(spark, tmp_path):
    from kf_task_fhir_etl_spark.streaming import matview

    schema = "side string, k bigint, pri string, qty double, op int"
    src, ckpt, store = (str(tmp_path / n) for n in ("src", "ckpt", "store"))

    def attach(stream, c):
        return matview.join_agg_view_stream(
            stream, store, side_col="side", r_cols=["k", "pri"],
            s_cols=["k", "qty"], on=["k"], keys=["pri"],
            sum_cols={"sq": "qty"}, count_col="n", op_col="op",
            checkpoint=c, buckets=3,
        )

    spark.createDataFrame(
        [("R", 1, "HI", None, 1)], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e1"))
    _run_file_stream(spark, src, ckpt, schema, attach)
    vs.apply_batch_partitioned(spark, store, lambda rp: {})  # maintenance
    spark.createDataFrame(
        [("S", 1, None, 4.0, 1)], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e2"))
    _run_file_stream(spark, src, ckpt, schema, attach)
    view = matview.read_view(spark, store, ["pri", "n", "sq"])
    assert sorted(tuple(r) for r in view.collect()) == [("HI", 1, 4.0)]


def test_distinct_view_stream_survives_interleaved_maintenance_commit(spark, tmp_path):
    from kf_task_fhir_etl_spark.streaming import matview

    schema = "g string, v bigint, op int"
    src, ckpt, store = (str(tmp_path / n) for n in ("src", "ckpt", "store"))

    def attach(stream, c):
        return matview.distinct_count_view_stream(
            stream, store, keys=["g"], value_col="v", op_col="op",
            checkpoint=c, buckets=3,
        )

    spark.createDataFrame([("a", 1, 1)], schema).coalesce(1).write.parquet(
        os.path.join(src, "e1")
    )
    _run_file_stream(spark, src, ckpt, schema, attach)
    vs.apply_batch_partitioned(spark, store, lambda rp: {})  # maintenance
    spark.createDataFrame(
        [("a", 2, 1), ("b", 5, 1)], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e2"))
    _run_file_stream(spark, src, ckpt, schema, attach)
    view = matview.read_distinct_view(spark, store, ["g"])
    assert sorted(tuple(r) for r in view.collect()) == [("a", 2), ("b", 1)]


def test_matview_replayed_batch_against_legacy_store_not_double_applied(spark, tmp_path):
    """The upgrade hazard itself: a store whose last commit carries NO
    token (the r10/r11 batch-id scheme) sees its last batch REPLAYED
    after upgrade. The signed-multiset merge is not idempotent, so
    without the commit-id floor the replay would double every
    multiplicity — the floor must skip it."""
    from kf_task_fhir_etl_spark.streaming import matview

    schema = "side string, k bigint, pri string, qty double, op int"
    src, ckpt, store = (str(tmp_path / n) for n in ("src", "ckpt", "store"))
    # legacy store: base R bucket committed directly under batch_id=0
    # (manifest has no replay_token), matching what the r11 sink wrote
    bucket = vs.bucket_value_expr(["k"], 3)
    r_rows = spark.createDataFrame([(1, "HI")], "k bigint, pri string").select(
        "k", "pri", F.lit(None).cast("double").alias("qty"),
        F.lit(1).cast("bigint").alias("__m"),
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("sq"),
        F.concat(F.lit("R."), bucket).alias("__b"),
    )
    vs.apply_batch_partitioned(
        spark, store,
        lambda rp: (r_rows, "__b", [r["__b"] for r in r_rows.select("__b").distinct().collect()]),
        batch_id=0,
    )
    before = matview.read_base(spark, store, "R", ["k", "pri"]).collect()
    # a FRESH checkpoint replays the same changelog as batch_id=0
    spark.createDataFrame(
        [("R", 1, "HI", None, 1)], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e1"))

    def attach(stream, c):
        return matview.join_agg_view_stream(
            stream, store, side_col="side", r_cols=["k", "pri"],
            s_cols=["k", "qty"], on=["k"], keys=["pri"],
            sum_cols={"sq": "qty"}, count_col="n", op_col="op",
            checkpoint=c, buckets=3,
        )

    _run_file_stream(spark, src, ckpt, schema, attach)
    after = matview.read_base(spark, store, "R", ["k", "pri"]).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))  # __m still 1


# ---------------------------------------------------------------------------
# bucket-count migration (VERDICT r11 Missing #2 / Next #3):
# versioned_store.rebucket_store + the sinks' recorded-count adoption
# ---------------------------------------------------------------------------


def _cdc_commit(spark, store, rows, key_cols, buckets, token):
    """One partitioned CDC-shaped commit: rows carry (__op, __order) and
    hash into `buckets` by key — the cdc_stream sink's layout."""
    from kf_task_fhir_etl_spark.streaming import cdc

    bucket = vs.bucket_value_expr(key_cols, buckets)
    staged = rows.withColumn("__b", bucket)
    touched = sorted(r["__b"] for r in staged.select("__b").distinct().collect())

    def merge(read_parts):
        cur = read_parts(touched)
        cur = cur.drop("__b") if cur is not None else None
        merged = cdc.cdc_apply_batch(cur, rows, key_cols, "__order", "__op")
        return merged.withColumn("__b", bucket), "__b", touched

    vs.apply_batch_partitioned(spark, store, merge, replay_token=token, buckets=buckets)


def test_rebucket_store_migrates_and_post_commits_touch_only_new_buckets(spark, tmp_path):
    """4→8 migration: content identical, count recorded, token carried;
    a post-migration commit touching one key rewrites ONLY that key's
    new-domain bucket (every other partition carried forward by path)."""
    store = str(tmp_path / "store")
    rows = spark.createDataFrame(
        [(i, f"v{i}", "upsert", 1) for i in range(40)],
        "k bigint, val string, __op string, __order long",
    )
    _cdc_commit(spark, store, rows, ["k"], buckets=4, token=0)
    before = sorted(map(tuple, vs.read_partitions(spark, store).drop("__b").collect()))
    n_parts = vs.rebucket_store(spark, store, ["k"], 8)
    assert 4 < n_parts <= 8
    last = vs.last_committed_batch(spark, store)
    meta = vs.read_manifest_meta(spark, store, last)
    assert meta["buckets"] == 8
    assert meta["replay_token"] == 0  # tokenless commit carried it forward
    after = sorted(map(tuple, vs.read_partitions(spark, store).drop("__b").collect()))
    assert after == before
    # every row now sits in its NEW-domain bucket
    expect_b = vs.bucket_value_expr(["k"], 8)
    moved = vs.read_partitions(spark, store).filter(F.col("__b") != expect_b)
    assert moved.count() == 0
    # post-migration single-key commit: only that bucket's path changes
    m_before = vs.read_manifest(spark, store, last)
    one = spark.createDataFrame(
        [(7, "NEW", "upsert", 2)], "k bigint, val string, __op string, __order long"
    )
    _cdc_commit(spark, store, one, ["k"], buckets=8, token=1)
    last2 = vs.last_committed_batch(spark, store)
    m_after = vs.read_manifest(spark, store, last2)
    hit = one.select(vs.bucket_value_expr(["k"], 8).alias("b")).collect()[0]["b"]
    assert m_after[hit] != m_before[hit]
    assert {v: p for v, p in m_after.items() if v != hit} == {
        v: p for v, p in m_before.items() if v != hit
    }


def test_rebucket_store_idempotent_and_layout_guards(spark, tmp_path):
    store = str(tmp_path / "store")
    # fresh: no-op, no commit
    assert not os.path.exists(vs.manifests_dir(store))
    with pytest.raises(RuntimeError, match="not a partitioned"):
        vs.rebucket_store(spark, store, ["k"], 8)
    rows = spark.createDataFrame(
        [(1, "upsert", 1)], "k bigint, __op string, __order long"
    )
    _cdc_commit(spark, store, rows, ["k"], buckets=4, token=0)
    vs.rebucket_store(spark, store, ["k"], 8)
    ids = vs.committed_ids(spark, store)
    assert vs.rebucket_store(spark, store, ["k"], 8) == 0  # idempotent re-run
    assert vs.committed_ids(spark, store) == ids  # ... with no new commit
    # heterogeneous layouts rejected loudly
    het = str(tmp_path / "het")
    one = spark.createDataFrame([(1,)], "x bigint")
    vs.apply_batch_partitioned(spark, het, lambda rp: {"view": one}, buckets=4)
    with pytest.raises(RuntimeError, match="non-bucket partitions"):
        vs.rebucket_store(spark, het, ["x"], 8)


def test_rebucket_leaderboard_store_mid_stream(spark, tmp_path):
    """Prefix-less base buckets + an excluded view partition: migrate a
    live leaderboard store 3→6 while quiesced, resume the SAME checkpoint
    — the sink adopts the recorded count, the view partition carries
    forward through the migration commit untouched, and post-migration
    maintenance keeps base and view converged."""
    from kf_task_fhir_etl_spark.streaming import leaderboard

    schema = "g string, id bigint, s double, seq long, op string"
    src, ckpt, store = (str(tmp_path / n) for n in ("src", "ckpt", "store"))

    def attach(stream, c):
        return leaderboard.topk_stream(
            stream, store, keys=["g"], id_col="id", score_col="s", k=1,
            order_col="seq", op_col="op", checkpoint=c, buckets=3,
        )

    spark.createDataFrame(
        [("a", 1, 5.0, 1, "upsert"), ("b", 7, 2.0, 1, "upsert")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e1"))
    _run_file_stream(spark, src, ckpt, schema, attach)
    last0 = vs.last_committed_batch(spark, store)
    view_path_before = vs.read_manifest(spark, store, last0)["view"]
    vs.rebucket_store(spark, store, ["g"], 6, exclude=("view",))
    last1 = vs.last_committed_batch(spark, store)
    m = vs.read_manifest(spark, store, last1)
    assert m["view"] == view_path_before  # excluded: carried by reference
    assert vs.read_manifest_meta(spark, store, last1)["buckets"] == 6
    base_vals = sorted(v for v in m if v != "view")
    want_vals = sorted(
        r["b"]
        for r in spark.createDataFrame([("a",), ("b",)], "g string")
        .select(vs.bucket_value_expr(["g"], 6).alias("b")).distinct().collect()
    )
    assert base_vals == want_vals
    spark.createDataFrame(
        [("a", 2, 9.0, 2, "upsert")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e2"))
    _run_file_stream(spark, src, ckpt, schema, attach)  # buckets=3 arg, 6 recorded
    view = leaderboard.read_leaderboard(spark, store, ["g", "id", "s"])
    assert sorted(tuple(r) for r in view.collect()) == [("a", 2, 9.0), ("b", 7, 2.0)]


def test_rebucket_matview_store_migrates_both_sides_in_one_pass(spark, tmp_path):
    """The prefixed layout: R.* and S.* re-hash under the new count in ONE
    commit (each row keeps its own side prefix), the view is excluded,
    and the resumed stream's delta joins still find their base slices —
    the maintained view stays identical to the recompute."""
    from kf_task_fhir_etl_spark.streaming import matview

    schema = "side string, k bigint, pri string, qty double, op int"
    src, ckpt, store = (str(tmp_path / n) for n in ("src", "ckpt", "store"))

    def attach(stream, c):
        return matview.join_agg_view_stream(
            stream, store, side_col="side", r_cols=["k", "pri"],
            s_cols=["k", "qty"], on=["k"], keys=["pri"],
            sum_cols={"sq": "qty"}, count_col="n", op_col="op",
            checkpoint=c, buckets=2,
        )

    spark.createDataFrame(
        [("R", 1, "HI", None, 1), ("R", 2, "LO", None, 1),
         ("S", 1, None, 4.0, 1), ("S", 2, None, 6.0, 1)], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e1"))
    _run_file_stream(spark, src, ckpt, schema, attach)
    vs.rebucket_store(spark, store, ["k"], 5, exclude=("view",))
    last = vs.last_committed_batch(spark, store)
    m = vs.read_manifest(spark, store, last)
    assert vs.read_manifest_meta(spark, store, last)["buckets"] == 5
    sides = {v.split(".")[0] for v in m if v != "view"}
    assert sides == {"R", "S"}  # both sides present, prefixes preserved
    # every base partition name sits in the 5-domain
    for v in m:
        if v != "view":
            assert int(v.split(".b")[1]) < 5
    # resumed stream: ΔS join must find R's rows in the NEW buckets
    spark.createDataFrame(
        [("S", 2, None, 1.0, 1)], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e2"))
    _run_file_stream(spark, src, ckpt, schema, attach)
    view = matview.read_view(spark, store, ["pri", "n", "sq"])
    assert sorted(tuple(r) for r in view.collect()) == [
        ("HI", 1, 4.0), ("LO", 2, 7.0)
    ]


def test_cdc_stream_adopts_recorded_bucket_count_after_migration(spark, tmp_path):
    """The resumed-stream shape: a store built at 4 buckets, migrated to
    8 while quiesced, resumed with the ORIGINAL buckets=4 argument — the
    sink must adopt the recorded count (new writes land in the 8-domain
    buckets) and the live table must stay LWW-correct."""
    from kf_task_fhir_etl_spark.streaming import cdc

    schema = "k bigint, val string, seq long, op string"
    src, ckpt, store = (str(tmp_path / n) for n in ("src", "ckpt", "store"))

    def attach(stream, c):
        return cdc.cdc_stream(
            stream, store, key_cols=["k"], order_col="seq", op_col="op",
            checkpoint=c, buckets=4,
        )

    spark.createDataFrame(
        [(i, f"v{i}", 1, "upsert") for i in range(20)], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e1"))
    _run_file_stream(spark, src, ckpt, schema, attach)
    vs.rebucket_store(spark, store, ["k"], 8)
    spark.createDataFrame(
        [(3, "rewritten", 2, "upsert")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e2"))
    _run_file_stream(spark, src, ckpt, schema, attach)  # buckets=4 arg, 8 recorded
    last = vs.last_committed_batch(spark, store)
    assert vs.read_manifest_meta(spark, store, last)["buckets"] == 8
    # the e2 write landed in key 3's EIGHT-domain bucket
    hit = spark.createDataFrame([(3,)], "k bigint").select(
        vs.bucket_value_expr(["k"], 8).alias("b")
    ).collect()[0]["b"]
    got = spark.read.parquet(vs.read_manifest(spark, store, last)[hit])
    assert [r["val"] for r in got.filter(F.col("k") == 3).collect()] == ["rewritten"]
    live = cdc.read_table(spark, store)
    want = {(i, "rewritten" if i == 3 else f"v{i}") for i in range(20)}
    assert {(r["k"], r["val"]) for r in live.collect()} == want


# ---------------------------------------------------------------------------
# add-column schema evolution (VERDICT r11 Missing #3 / Next #4):
# versioned_store.add_columns — lazy, zero-data-I/O declaration
# ---------------------------------------------------------------------------


def test_add_columns_lazy_backfill_leaves_files_untouched(spark, tmp_path):
    store = str(tmp_path / "store")
    rows = spark.createDataFrame(
        [(i, f"v{i}", "upsert", 1) for i in range(10)],
        "k bigint, val string, __op string, __order long",
    )
    _cdc_commit(spark, store, rows, ["k"], buckets=3, token=0)
    last0 = vs.last_committed_batch(spark, store)
    parts_before = vs.read_manifest(spark, store, last0)
    vs.add_columns(spark, store, {"score": "double"})
    last1 = vs.last_committed_batch(spark, store)
    assert last1 > last0
    meta = vs.read_manifest_meta(spark, store, last1)
    assert meta["added_cols"] == {"score": "double"}
    assert meta["replay_token"] == 0  # tokenless commit carried it
    # LAZY: the evolution commit touched zero partition data — every
    # manifest entry still points at the pre-evolution directories
    assert vs.read_manifest(spark, store, last1) == parts_before
    got = vs.read_partitions(spark, store)
    assert "score" in got.columns
    assert got.filter(F.col("score").isNotNull()).count() == 0
    # as-of the pre-evolution commit reads the OLD schema
    old = vs.read_partitions(spark, store, as_of=last0)
    assert "score" not in old.columns


def test_add_columns_guards_and_idempotence(spark, tmp_path):
    store = str(tmp_path / "store")
    rows = spark.createDataFrame([(1, "upsert", 1)], "k bigint, __op string, __order long")
    _cdc_commit(spark, store, rows, ["k"], buckets=2, token=0)
    with pytest.raises(ValueError, match="reserved"):
        vs.add_columns(spark, store, {"__oops": "string"})
    with pytest.raises(ValueError, match="invalid spark dtype"):
        vs.add_columns(spark, store, {"c": "no_such_type"})
    with pytest.raises(ValueError, match="empty column map"):
        vs.add_columns(spark, store, {})
    with pytest.raises(RuntimeError, match="not a partitioned store"):
        vs.add_columns(spark, str(tmp_path / "flat"), {"c": "string"})
    vs.add_columns(spark, store, {"c": "string"})
    ids = vs.committed_ids(spark, store)
    vs.add_columns(spark, store, {"c": "string"})  # idempotent: no commit
    assert vs.committed_ids(spark, store) == ids
    with pytest.raises(ValueError, match="dtype conflicts"):
        vs.add_columns(spark, store, {"c": "bigint"})


def test_cdc_merge_spans_schema_evolution(spark, tmp_path):
    """Pre-evolution rows read NULL for the new column; a post-evolution
    LWW merge carries real values; untouched buckets keep their
    pre-evolution files and still read through the widened schema."""
    store = str(tmp_path / "store")
    old = spark.createDataFrame(
        [(i, f"v{i}", "upsert", 1) for i in range(10)],
        "k bigint, val string, __op string, __order long",
    )
    _cdc_commit(spark, store, old, ["k"], buckets=3, token=0)
    vs.add_columns(spark, store, {"note": "string"})
    new = spark.createDataFrame(
        [(3, "v3b", "N3", "upsert", 2)],
        "k bigint, val string, note string, __op string, __order long",
    )
    _cdc_commit(spark, store, new, ["k"], buckets=3, token=1)
    got = {
        (r["k"], r["val"], r["note"])
        for r in vs.read_partitions(spark, store).collect()
    }
    want = {(i, f"v{i}", None) for i in range(10) if i != 3} | {(3, "v3b", "N3")}
    assert got == want


def test_drop_columns_lazy_projection_and_guards(spark, tmp_path):
    """Dropping is a zero-data-I/O declaration: manifest paths unchanged,
    readers project the name out, as-of pre-drop still sees it, re-drop
    is a no-op, re-ADD of a dropped name raises, and a rebucket pass
    materializes the narrowed schema."""
    store = str(tmp_path / "store")
    rows = spark.createDataFrame(
        [(i, f"v{i}", float(i), "upsert", 1) for i in range(8)],
        "k bigint, val string, extra double, __op string, __order long",
    )
    _cdc_commit(spark, store, rows, ["k"], buckets=3, token=0)
    last0 = vs.last_committed_batch(spark, store)
    parts_before = vs.read_manifest(spark, store, last0)
    vs.drop_columns(spark, store, ["extra"])
    last1 = vs.last_committed_batch(spark, store)
    assert vs.read_manifest(spark, store, last1) == parts_before  # lazy
    assert vs.read_manifest_meta(spark, store, last1)["dropped_cols"] == ["extra"]
    assert "extra" not in vs.read_partitions(spark, store).columns
    assert "extra" in vs.read_partitions(spark, store, as_of=last0).columns
    ids = vs.committed_ids(spark, store)
    vs.drop_columns(spark, store, ["extra"])  # idempotent: no commit
    assert vs.committed_ids(spark, store) == ids
    with pytest.raises(ValueError, match="previously DROPPED"):
        vs.add_columns(spark, store, {"extra": "double"})
    with pytest.raises(ValueError, match="reserved"):
        vs.drop_columns(spark, store, ["__op"])
    with pytest.raises(ValueError, match="empty column list"):
        vs.drop_columns(spark, store, [])
    # a full-rewrite pass materializes the narrowed schema on disk
    vs.rebucket_store(spark, store, ["k"], 5)
    last2 = vs.last_committed_batch(spark, store)
    any_part = next(iter(vs.read_manifest(spark, store, last2).values()))
    assert "extra" not in spark.read.parquet(any_part).columns
    got = {(r["k"], r["val"]) for r in vs.read_partitions(spark, store).collect()}
    assert got == {(i, f"v{i}") for i in range(8)}


def test_add_then_drop_retires_the_declaration(spark, tmp_path):
    """Dropping a column that only ever existed as an add_columns
    declaration retires it: reads stop backfilling, added_cols no longer
    carries it, and the files were never touched by either commit."""
    store = str(tmp_path / "store")
    rows = spark.createDataFrame(
        [(1, "upsert", 1)], "k bigint, __op string, __order long"
    )
    _cdc_commit(spark, store, rows, ["k"], buckets=2, token=0)
    vs.add_columns(spark, store, {"c": "string"})
    assert "c" in vs.read_partitions(spark, store).columns
    vs.drop_columns(spark, store, ["c"])
    last = vs.last_committed_batch(spark, store)
    meta = vs.read_manifest_meta(spark, store, last)
    assert meta.get("added_cols") is None and meta["dropped_cols"] == ["c"]
    assert "c" not in vs.read_partitions(spark, store).columns


def test_cdc_stream_continues_after_column_drop(spark, tmp_path):
    """The resumed-stream shape for drops: quiesce, drop a data column,
    resume with the NARROWED source schema — the LWW merge spans the
    vintages (store slice reads without the column) and the live table
    reflects post-drop rows."""
    from kf_task_fhir_etl_spark.streaming import cdc

    schema_wide = "k bigint, val string, extra double, seq long, op string"
    schema_narrow = "k bigint, val string, seq long, op string"
    src, ckpt, store = (str(tmp_path / n) for n in ("src", "ckpt", "store"))

    def attach(schema):
        def inner(stream, c):
            return cdc.cdc_stream(
                stream, store, key_cols=["k"], order_col="seq", op_col="op",
                checkpoint=c, buckets=3,
            )
        return inner

    spark.createDataFrame(
        [(i, f"v{i}", float(i), 1, "upsert") for i in range(6)], schema_wide
    ).coalesce(1).write.parquet(os.path.join(src, "e1"))
    _run_file_stream(spark, src, ckpt, schema_wide, attach(schema_wide))
    vs.drop_columns(spark, store, ["extra"])
    spark.createDataFrame(
        [(2, "v2b", 2, "upsert")], schema_narrow
    ).coalesce(1).write.parquet(os.path.join(src, "e2"))
    _run_file_stream(spark, src, ckpt, schema_narrow, attach(schema_narrow))
    live = cdc.read_table(spark, store)
    assert "extra" not in live.columns
    want = {(i, "v2b" if i == 2 else f"v{i}") for i in range(6)}
    assert {(r["k"], r["val"]) for r in live.collect()} == want


def test_maintenance_matrix_evolution_migration_retention_compose(spark, tmp_path):
    """One store through the FULL maintenance lifecycle: stream →
    add_columns → compact_tombstones → rebucket_store → resume. Each
    pass carries the others' meta forward (token, retention, added_cols,
    buckets all survive every commit class), the rebucket pass reads
    through the declared evolution (so it eagerly materializes the
    column it rewrites), and the resumed stream still enforces retention
    and lands in the new-domain buckets."""
    from kf_task_fhir_etl_spark.streaming import cdc

    schema_a = "k bigint, val string, seq long, op string"
    schema_b = "k bigint, val string, score double, seq long, op string"
    src, ckpt, store = (str(tmp_path / n) for n in ("src", "ckpt", "store"))

    def attach(stream, c):
        return cdc.cdc_stream(
            stream, store, key_cols=["k"], order_col="seq", op_col="op",
            checkpoint=c, buckets=3,
        )

    # e1: upsert keys 0-9 at seq 2; e2: delete evens at seq 3
    spark.createDataFrame(
        [(i, f"v{i}", 2, "upsert") for i in range(10)], schema_a
    ).coalesce(1).write.parquet(os.path.join(src, "e1"))
    spark.createDataFrame(
        [(i, None, 3, "delete") for i in range(0, 10, 2)], schema_a
    ).coalesce(1).write.parquet(os.path.join(src, "e2"))
    _run_file_stream(spark, src, ckpt, schema_a, attach)
    # maintenance stack, quiesced: evolve, compact (watermark 4), migrate
    vs.add_columns(spark, store, {"score": "double"})
    cdc.compact_tombstones(spark, store, min_retained_order=4)
    vs.rebucket_store(spark, store, ["k"], 7)
    last = vs.last_committed_batch(spark, store)
    meta = vs.read_manifest_meta(spark, store, last)
    assert meta["buckets"] == 7
    assert meta["retention"] == 4
    assert meta["added_cols"] == {"score": "double"}
    assert meta["replay_token"] == 1  # two stream batches applied: 0, 1
    # tombstones compacted; the rebucket materialized the evolved column
    stored = vs.read_partitions(spark, store)
    assert stored.filter(F.col("__op") == "delete").count() == 0
    assert "score" in stored.columns
    # e3: a seq-1 zombie for deleted key 0 (drops at intake) and a seq-5
    # re-score of key 1 carrying the evolved column
    spark.createDataFrame(
        [(0, "ZOMBIE", None, 1, "upsert"), (1, "v1b", 9.5, 5, "upsert")],
        schema_b,
    ).coalesce(1).write.parquet(os.path.join(src, "e3"))
    _run_file_stream(spark, src, ckpt, schema_b, attach)
    live = {
        (r["k"], r["val"], r["score"])
        for r in cdc.read_table(spark, store).collect()
    }
    want = {(i, f"v{i}", None) for i in (3, 5, 7, 9)} | {(1, "v1b", 9.5)}
    assert live == want
    # the e3 write landed in key 1's SEVEN-domain bucket
    hit = spark.createDataFrame([(1,)], "k bigint").select(
        vs.bucket_value_expr(["k"], 7).alias("b")
    ).collect()[0]["b"]
    last2 = vs.last_committed_batch(spark, store)
    got = spark.read.parquet(vs.read_manifest(spark, store, last2)[hit])
    assert [r["val"] for r in got.filter(F.col("k") == 1).collect()] == ["v1b"]


# ---------------------------------------------------------------------------
# bounded-stats guardrail (VERDICT r11 Next #5): the localCheckpoint
# origin-stats autopsy turned into an immediate, named error
# ---------------------------------------------------------------------------


def test_bounded_stats_probe_chain_trips_and_store_resets(spark, tmp_path):
    """The r11 measurement chain drives the helper: self-join generations
    through localCheckpoint compound the estimate until the bound trips;
    a parquet round-trip resets the stats and the same bound passes."""
    from kf_task_fhir_etl_spark.operators.lifecycle import (
        assert_bounded_stats,
        planned_stats_bits,
    )

    a = spark.createDataFrame([(1, 2)], "x bigint, y bigint")
    cur, tripped = a, False
    try:
        for gen in range(10):
            nxt = cur.join(cur.withColumnRenamed("y", f"y{gen}"), "x").localCheckpoint()
            assert_bounded_stats(nxt, max_bits=512)
            cur = nxt.select("x", "y")
    except RuntimeError as exc:
        tripped = True
        assert "sizeInBytes" in str(exc) and "parquet" in str(exc)
    assert tripped, "chained checkpoints never exceeded the bound"
    path = str(tmp_path / "reset")
    cur.write.parquet(path)
    back = spark.read.parquet(path)
    assert planned_stats_bits(back) < 64  # real file sizes
    assert assert_bounded_stats(back, max_bits=512) is back


def test_graph_delta_trips_on_chained_inmemory_state(spark, tmp_path):
    """The wired operators assert their state INPUTS: a single apply from
    in-memory inputs passes (the input labeling is tiny even though the
    apply's own output compounds internally), but chaining the output
    back in WITHOUT a store round-trip trips the named error within two
    generations — while a parquet round-trip resets the chain forever."""
    from kf_task_fhir_etl_spark.operators import graph_delta

    comps = spark.createDataFrame([(1, 1), (2, 1), (3, 3)], "node bigint, component bigint")
    delta = spark.createDataFrame([(2, 3, 1)], "id_a bigint, id_b bigint, op int")
    edges_new = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    cur, tripped_at = comps, None
    try:
        for gen in range(4):
            cur = graph_delta.apply_components_delta(
                cur, edges_new, delta
            ).localCheckpoint()
    except RuntimeError as exc:
        tripped_at = gen
        assert "apply_components_delta comps input" in str(exc)
    assert tripped_at is not None and tripped_at <= 2, (
        f"chained in-memory state never tripped the input guard (got to gen {gen})"
    )
    # the fix the error names: a store round-trip resets the chain
    path = str(tmp_path / "state")
    comps.write.parquet(path)
    out = graph_delta.apply_components_delta(
        spark.read.parquet(path), edges_new, delta
    )
    assert sorted(map(tuple, out.collect())) == [(1, 1), (2, 1), (3, 1)]
