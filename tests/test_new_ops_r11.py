"""Round-11 operator tests: the r10 ADVICE fixes (cdc '__part' guard,
named-field event sentinels, leaderboard empty-batch early-out, flat-layout
error), manifest v2 (replay tokens + retention meta), bucketed matview base
partitions, lazy SSSP edge staging, spanning-forest CC delete maintenance,
and CDC tombstone compaction."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.streaming import versioned_store as vs


# ---------------------------------------------------------------------------
# r10 ADVICE: cdc_stream blanket '__'-prefix rejection (the '__part' hole)
# ---------------------------------------------------------------------------


def test_cdc_stream_rejects_part_column(spark, tmp_path):
    """A change stream carrying '__part' used to pass the enumerated
    reserved set, then apply_batch_partitioned's tuple form silently
    replaced it and partitionBy dropped it from the stored files."""
    from kf_task_fhir_etl_spark.streaming import cdc

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .selectExpr("value AS k", "value AS seq", "'upsert' AS op", "value AS __part")
    )
    with pytest.raises(ValueError, match="reserved"):
        cdc.cdc_stream(stream, str(tmp_path / "s"), ["k"], order_col="seq", op_col="op")


# ---------------------------------------------------------------------------
# r10 ADVICE: named-field sentinel construction
# ---------------------------------------------------------------------------


def test_events_sentinel_named_fields(spark):
    from kf_task_fhir_etl_spark.streaming.events import EVENTS_SCHEMA, _sentinel_row

    # kwarg order is irrelevant: the tuple comes out in SCHEMA order
    row = _sentinel_row(
        EVENTS_SCHEMA, props=None, value=0.5, event_type="t", user_id=7,
        ts=None, event_id=-1,
    )
    assert row == [(-1, None, 7, "t", 0.5, None)]
    # a missing or extra field fails loudly instead of misassigning
    with pytest.raises(ValueError, match="sentinel"):
        _sentinel_row(EVENTS_SCHEMA, event_id=-1, ts=None, user_id=7,
                      event_type="t", value=0.5)
    with pytest.raises(ValueError, match="sentinel"):
        _sentinel_row(EVENTS_SCHEMA, event_id=-1, ts=None, user_id=7,
                      event_type="t", value=0.5, props=None, extra=1)


# ---------------------------------------------------------------------------
# r10 ADVICE: topk_stream empty-batch early-out
# ---------------------------------------------------------------------------


def test_topk_stream_empty_batch_rewrites_nothing(spark, tmp_path):
    """A microbatch with no rows must bump the replay guard with zero
    partition I/O: same manifest parts, no new data dirs."""
    from kf_task_fhir_etl_spark.streaming import leaderboard

    schema = "g string, id bigint, s double, seq long, op string"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("a", 1, 5.0, 1, "upsert"), ("a", 2, 3.0, 1, "upsert")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e1"))
    spark.createDataFrame([], schema).coalesce(1).write.parquet(os.path.join(src, "e2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "e*"))
    )
    store = str(tmp_path / "store")
    q = leaderboard.topk_stream(
        stream, store, keys=["g"], id_col="id", score_col="s", k=1,
        order_col="seq", op_col="op", checkpoint=str(tmp_path / "ckpt"), buckets=3,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ids = vs.committed_ids(spark, store)
    assert len(ids) >= 2  # the empty batch still committed (replay guard)
    m_first = vs.read_manifest(spark, store, ids[0])
    m_last = vs.read_manifest(spark, store, ids[-1])
    assert m_first == m_last  # every partition carried forward by reference
    view = leaderboard.read_leaderboard(spark, store, ["g", "id", "s"])
    assert sorted(tuple(r) for r in view.collect()) == [("a", 1, 5.0)]


# ---------------------------------------------------------------------------
# r10 ADVICE: flat-layout stores open through the partitioned API loudly
# name the LAYOUT, not corruption
# ---------------------------------------------------------------------------


def test_flat_store_through_partitioned_api_names_the_layout(spark, tmp_path):
    store = str(tmp_path / "flat")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    vs.apply_batch(spark, store, lambda cur: df, batch_id=0)
    with pytest.raises(RuntimeError, match="FLAT layout"):
        vs.read_partitions(spark, store, ["b0"])
    # genuine corruption (manifests dir exists, manifest file missing)
    # still raises the corruption message
    store2 = str(tmp_path / "part")
    vs.apply_batch_partitioned(
        spark, store2, lambda rp: {"b0": df}, batch_id=0
    )
    fs, mpath = vs.hadoop_fs(spark, vs.manifests_dir(store2) + "/0")
    fs.delete(mpath, False)
    with pytest.raises(RuntimeError, match="unreadable"):
        vs.read_partitions(spark, store2, ["b0"])


# ---------------------------------------------------------------------------
# manifest v2: replay tokens decouple the stream's replay guard from the
# commit sequence; retention carries forward monotonically
# ---------------------------------------------------------------------------


def test_replay_token_survives_maintenance_commit(spark, tmp_path):
    """The failure the token exists to prevent: a maintenance commit at
    last+1 jumps ahead of the stream's batch counter; with batch_id-based
    guarding every later stream batch would read as a replay and be
    silently dropped."""
    store = str(tmp_path / "store")
    one = spark.createDataFrame([(1,)], "k int")

    # stream batch 0 (token 0)
    assert vs.apply_batch_partitioned(
        spark, store, lambda rp: {"b0": one}, replay_token=0
    )
    # replay of batch 0 → skipped
    assert not vs.apply_batch_partitioned(
        spark, store, lambda rp: {"b0": one}, replay_token=0
    )
    # tokenless MAINTENANCE commit applies and carries the token forward
    assert vs.apply_batch_partitioned(spark, store, lambda rp: {"b0": one})
    last = vs.last_committed_batch(spark, store)
    meta = vs.read_manifest_meta(spark, store, last)
    assert meta["replay_token"] == 0
    # replay of batch 0 is STILL skipped after the maintenance commit
    assert not vs.apply_batch_partitioned(
        spark, store, lambda rp: {"b0": one}, replay_token=0
    )
    # the stream's NEXT batch (token 1) applies even though its token is
    # far below the auto-assigned commit ids
    assert vs.apply_batch_partitioned(
        spark, store, lambda rp: {"b0": one}, replay_token=1
    )
    last = vs.last_committed_batch(spark, store)
    assert vs.read_manifest_meta(spark, store, last)["replay_token"] == 1


def test_retention_meta_grows_monotonically(spark, tmp_path):
    store = str(tmp_path / "store")
    one = spark.createDataFrame([(1,)], "k int")
    vs.apply_batch_partitioned(spark, store, lambda rp: {"b0": one}, retention=5)
    vs.apply_batch_partitioned(spark, store, lambda rp: {"b0": one}, retention=3)
    last = vs.last_committed_batch(spark, store)
    assert vs.read_manifest_meta(spark, store, last)["retention"] == 5


def test_manifest_v1_backcompat(spark, tmp_path):
    """A pre-r11 store whose manifest is the bare parts map still reads:
    partition values can never be 'v' mapping to an int."""
    import json

    store = str(tmp_path / "store")
    one = spark.createDataFrame([(1,)], "k int")
    vs.apply_batch_partitioned(spark, store, lambda rp: {"b0": one}, batch_id=0)
    parts = vs.read_manifest(spark, store, 0)
    # rewrite the manifest in the v1 (flat map) format
    fs, p = vs.hadoop_fs(spark, vs.manifests_dir(store) + "/0")
    out = fs.create(p, True)
    out.write(bytearray(json.dumps(parts).encode("utf-8")))
    out.close()
    assert vs.read_manifest(spark, store, 0) == parts
    assert vs.read_manifest_meta(spark, store, 0) == {"parts": parts}
    assert vs.read_partitions(spark, store, ["b0"]).count() == 1


# ---------------------------------------------------------------------------
# bucketed matview base partitions (VERDICT r10 Missing #1)
# ---------------------------------------------------------------------------


def _mv_file_listing(path: str) -> list[tuple[str, int, float]]:
    return sorted(
        (f, os.path.getsize(os.path.join(path, f)), os.path.getmtime(os.path.join(path, f)))
        for f in os.listdir(path)
        if not f.startswith(".")
    )


def test_matview_untouched_r_bucket_survives_r_touching_batch_byte_identical(spark, tmp_path):
    """The r10 layout rewrote ALL of base R whenever any R change arrived;
    the bucketed layout must leave every R bucket the batch's keys do NOT
    hash into in place — same manifest path, same file names/sizes/mtimes."""
    from kf_task_fhir_etl_spark.streaming import matview

    buckets = 4
    schema = "side string, k bigint, pri string, qty double, op int"
    b1 = [("R", k, f"p{k % 3}", None, 1) for k in range(1, 9)]
    b2 = [("R", 1, "p1", None, 1)]  # touches ONLY key 1's bucket
    b3 = [("S", 1, None, 10.0, 1), ("S", 2, None, 5.0, 1)]
    src = str(tmp_path / "src")
    for n, rows in enumerate((b1, b2, b3), 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, f"e{n}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "e*"))
    )
    store = str(tmp_path / "store")
    q = matview.join_agg_view_stream(
        stream, store, side_col="side",
        r_cols=["k", "pri"], s_cols=["k", "qty"], on=["k"], keys=["pri"],
        sum_cols={"sum_qty": "qty"}, count_col="n", op_col="op",
        checkpoint=str(tmp_path / "ckpt"), buckets=buckets,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # which bucket does key 1 hash into? (the shared bucket expression)
    b_of_1 = (
        spark.createDataFrame([(1,)], "k bigint")
        .select(vs.bucket_value_expr(["k"], buckets).alias("b"))
        .collect()[0]["b"]
    )
    m1 = vs.read_manifest(spark, store, 1)  # after batch 2 (ids 0,1,2)
    r_parts = {v: p for v, p in m1.items() if v.startswith("R.")}
    untouched = [v for v in r_parts if v != f"R.{b_of_1}"]
    assert untouched, "test needs ≥2 distinct R buckets from batch 1"
    # every untouched R bucket still points into the batch-0 data dir
    for v in untouched:
        assert ".vp0" in r_parts[v], (v, r_parts[v])
    assert f"R.{b_of_1}" in m1 and ".vp1" in m1[f"R.{b_of_1}"]
    # byte identity across the S-only batch too (manifest 0 is GC'd past
    # the lag buffer; the untouched dirs themselves are still referenced)
    listing_before = {v: _mv_file_listing(r_parts[v]) for v in untouched}
    m2 = vs.read_manifest(spark, store, 2)
    for v in untouched:
        assert m2[v] == r_parts[v]
        assert _mv_file_listing(m2[v]) == listing_before[v]
    # and no S batch rewrote any R bucket
    assert all(".vp2" not in p for v, p in m2.items() if v.startswith("R."))
    # the view is still exactly the recompute: k=1 has TWO R copies
    # (multiset) × one S row → n=2 sum=20; k=2 one copy → n=1 sum=5
    view = sorted(
        tuple(r)
        for r in matview.read_view(spark, store, ["pri", "n", "sum_qty"]).collect()
    )
    assert view == [("p1", 2, 20.0), ("p2", 1, 5.0)]


def test_matview_rejects_unbucketed_r10_layout(spark, tmp_path):
    """A store whose manifest still holds whole-side 'R'/'S' partitions
    (the r10 layout) must be rejected loudly, never read as empty."""
    from kf_task_fhir_etl_spark.streaming import matview

    store = str(tmp_path / "old")
    df = spark.createDataFrame([(1, "a", 1)], "k bigint, pri string, __m bigint")
    vs.apply_batch_partitioned(spark, store, lambda rp: {"R": df}, batch_id=0)
    with pytest.raises(RuntimeError, match="un-bucketed"):
        matview.read_base(spark, store, "R", ["k", "pri"])
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .selectExpr("'R' AS side", "value AS k", "'a' AS pri",
                    "CAST(NULL AS double) AS qty", "1 AS op")
    )
    with pytest.raises(RuntimeError, match="un-bucketed"):
        matview.join_agg_view_stream(
            rate, store, side_col="side", r_cols=["k", "pri"],
            s_cols=["k", "qty"], on=["k"], keys=["pri"],
            sum_cols={"sum_qty": "qty"},
        )


# ---------------------------------------------------------------------------
# lazy SSSP edge staging (VERDICT r10 What's-wrong #2 + ADVICE)
# ---------------------------------------------------------------------------


def test_sssp_noop_batch_never_materializes_the_edge_set(spark):
    """A no-improvement insert batch must cost the seed join and ONE
    empty-frontier check — never the O(|E|) symmetrize/checkpoint of the
    post-changelog edge set. Proven with a POISONED edges_new: any
    evaluation of it raises, so the assertion is that the call succeeds."""
    from kf_task_fhir_etl_spark.operators import graph, graph_delta

    old = spark.createDataFrame([(0, 1, 2), (1, 2, 2)], "src bigint, dst bigint, w bigint")
    src = spark.createDataFrame([(0,)], "node bigint")
    dist_old = graph.sssp_distances(old, src)
    poison = spark.range(1).select(
        F.col("id").alias("src"),
        (F.col("id") + 1).alias("dst"),
        F.when(F.col("id") >= 0, F.raise_error(F.lit("edges_new was evaluated")))
        .otherwise(F.lit(0)).cast("bigint").alias("w"),
    )
    delta = spark.createDataFrame([(0, 2, 99)], "src bigint, dst bigint, w bigint")
    got = {
        r["node"]: r["dist"]
        for r in graph_delta.apply_sssp_inserts(dist_old, poison, delta).collect()
    }
    assert got == {0: 0, 1: 2, 2: 4}


def test_sssp_staged_edges_reused_across_batches(spark):
    """stage_sssp_edges pays the symmetrize/min-collapse once; two insert
    batches against the same staged frame both land on the recompute."""
    from kf_task_fhir_etl_spark.etl import release_checkpoints
    from kf_task_fhir_etl_spark.operators import graph, graph_delta

    old = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 10), (2, 3, 10)], "src bigint, dst bigint, w bigint"
    )
    src = spark.createDataFrame([(0,)], "node bigint")
    d1 = spark.createDataFrame([(0, 2, 1)], "src bigint, dst bigint, w bigint")
    d2 = spark.createDataFrame([(0, 3, 2)], "src bigint, dst bigint, w bigint")
    edges_new = old.unionByName(d1).unionByName(d2)
    staged = graph_delta.stage_sssp_edges(edges_new)
    try:
        cur = graph.sssp_distances(old, src)
        cur = graph_delta.apply_sssp_inserts(cur, edges_new, d1, edges_staged=staged)
        cur = graph_delta.apply_sssp_inserts(cur, edges_new, d2, edges_staged=staged)
        got = {r["node"]: r["dist"] for r in cur.collect()}
        want = {
            r["node"]: r["dist"] for r in graph.sssp_distances(edges_new, src).collect()
        }
        # 2 takes the d1 shortcut (1), 3 the d2 shortcut (2); 1 keeps the
        # direct edge (10 beats 1+10 through the shortcut)
        assert got == want == {0: 0, 1: 10, 2: 1, 3: 2}
    finally:
        release_checkpoints([staged], blocking=False)


# ---------------------------------------------------------------------------
# spanning forest + forest-maintained CC deletes (VERDICT r10 Next #4)
# ---------------------------------------------------------------------------


def _forest_invariants(spark, nodes_df, edges_df, forest_df, node_col="node"):
    """forest ⊆ canonical(edges); |forest| = n_nodes − n_components; the
    forest's components equal the graph's components."""
    from kf_task_fhir_etl_spark.operators.dedup import connected_components

    canon = (
        edges_df.filter(F.col("id_a") != F.col("id_b"))
        .select(F.least("id_a", "id_b").alias("id_a"), F.greatest("id_a", "id_b").alias("id_b"))
        .distinct()
    )
    assert forest_df.join(canon, ["id_a", "id_b"], "left_anti").count() == 0
    comps = connected_components(nodes_df, edges_df, node_col=node_col)
    n_comp = comps.select("component").distinct().count()
    n_nodes = nodes_df.distinct().count()
    assert forest_df.count() == n_nodes - n_comp
    fc = connected_components(nodes_df, forest_df, node_col=node_col)
    assert sorted(map(tuple, fc.collect())) == sorted(map(tuple, comps.collect()))


def test_spanning_forest_bootstrap_invariants(spark):
    import random

    from kf_task_fhir_etl_spark.operators import graph_delta

    rng = random.Random(411)
    n = 30
    edges = sorted({
        tuple(sorted(rng.sample(range(n), 2))) for _ in range(45)
    })
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    edges_df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    forest = graph_delta.spanning_forest(nodes_df, edges_df)
    _forest_invariants(spark, nodes_df, edges_df, forest)


def test_forest_delta_nontree_delete_is_noop_without_cc_or_bfs(spark, monkeypatch):
    """A batch of only NON-tree deletes must return the labeling and
    forest unchanged WITHOUT any CC or BFS call (the certificate pays)."""
    from kf_task_fhir_etl_spark.operators import dedup, graph, graph_delta

    # triangle 1-2-3 plus spur 3-4: forest (via BFS from root 1) takes
    # (1,2), (1,3), (3,4); the (2,3) triangle edge is non-tree
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "node bigint")
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "id_a bigint, id_b bigint"
    )
    comps = dedup.connected_components(nodes, edges, node_col="node")
    forest = graph_delta.spanning_forest(nodes, edges, comps=comps)
    assert sorted(map(tuple, forest.collect())) == [(1, 2), (1, 3), (3, 4)]

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
    delta = spark.createDataFrame([(2, 3, -1)], "id_a bigint, id_b bigint, op int")
    edges_new = edges.filter(~((F.col("id_a") == 2) & (F.col("id_b") == 3)))
    l2, f2 = graph_delta.apply_components_delta_forest(comps, forest, edges_new, delta)
    assert calls == {"cc": 0, "bfs": 0}
    assert sorted(map(tuple, l2.collect())) == sorted(map(tuple, comps.collect()))
    assert sorted(map(tuple, f2.collect())) == sorted(map(tuple, forest.collect()))


def test_forest_delta_tree_delete_splits_and_rebuilds(spark):
    """Deleting a TREE edge (the 3-4 spur bridge) splits; labels match the
    recompute and the new forest still satisfies the invariants."""
    from kf_task_fhir_etl_spark.operators import dedup, graph_delta

    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "node bigint")
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "id_a bigint, id_b bigint"
    )
    comps = dedup.connected_components(nodes, edges, node_col="node")
    forest = graph_delta.spanning_forest(nodes, edges, comps=comps)
    delta = spark.createDataFrame([(3, 4, -1)], "id_a bigint, id_b bigint, op int")
    edges_new = edges.filter(~((F.col("id_a") == 3) & (F.col("id_b") == 4)))
    l2, f2 = graph_delta.apply_components_delta_forest(comps, forest, edges_new, delta)
    want = dedup.connected_components(nodes, edges_new, node_col="node")
    assert sorted(map(tuple, l2.collect())) == sorted(map(tuple, want.collect()))
    _forest_invariants(spark, nodes, edges_new, f2)


def test_forest_delta_rebridge_and_new_nodes(spark):
    """A tree delete split re-bridged by an insert in the SAME batch, plus
    a brand-new two-node component — labels ≡ recompute, forest invariants
    hold, and the forest gained the representative inserted edges."""
    from kf_task_fhir_etl_spark.operators import dedup, graph_delta

    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "node bigint")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a bigint, id_b bigint"
    )
    comps = dedup.connected_components(nodes, edges, node_col="node")
    forest = graph_delta.spanning_forest(nodes, edges, comps=comps)
    # delete tree edge (2,3); insert (1,4) re-bridging, and (9,10) new comp
    delta = spark.createDataFrame(
        [(2, 3, -1), (1, 4, 1), (9, 10, 1)], "id_a bigint, id_b bigint, op int"
    )
    edges_new = spark.createDataFrame(
        [(1, 2), (3, 4), (1, 4), (9, 10)], "id_a bigint, id_b bigint"
    )
    all_nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 9, 10)], "node bigint")
    l2, f2 = graph_delta.apply_components_delta_forest(comps, forest, edges_new, delta)
    want = dedup.connected_components(all_nodes, edges_new, node_col="node")
    assert sorted(map(tuple, l2.collect())) == sorted(map(tuple, want.collect()))
    _forest_invariants(spark, all_nodes, edges_new, f2)


def test_forest_delta_randomized_parity(spark, tmp_path):
    """Seeded random graphs and changelogs: labels ≡ from-scratch CC and
    forest invariants hold after every batch. State is stored through
    PARQUET between batches — the production shape, and load-bearing for
    the test too: localCheckpoint carries the ORIGIN plan's size stats
    into its leaf (verified: ckpt sizeInBytes == plan sizeInBytes, and it
    DOUBLES per self-referencing generation from the Long.MaxValue leaf
    default), so chaining raw/checkpointed state across batches grows
    million-bit sizeInBytes values that spin Catalyst's stats products at
    100% driver CPU. Parquet resets stats to actual file sizes."""
    import random

    from kf_task_fhir_etl_spark.operators import dedup, graph_delta

    rng = random.Random(1107)
    n = 26
    cur_edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(34)})
    nodes = [(i,) for i in range(n)]
    nodes_df = spark.createDataFrame(nodes, "node bigint")
    edges_df = spark.createDataFrame(cur_edges, "id_a bigint, id_b bigint")
    comps = dedup.connected_components(nodes_df, edges_df, node_col="node")
    forest = graph_delta.spanning_forest(nodes_df, edges_df, comps=comps)
    node_set = set(range(n))
    for batch in range(2):
        dels = [e for e in cur_edges if rng.random() < 0.25]
        survivors = [e for e in cur_edges if e not in dels]
        ins = sorted({
            tuple(sorted(rng.sample(range(n + 6), 2))) for _ in range(8)
        } - set(survivors))
        new_edges = sorted(set(survivors) | set(ins))
        node_set |= {x for e in ins for x in e}
        delta_rows = [(x, y, -1) for x, y in dels] + [(x, y, 1) for x, y in ins]
        delta = spark.createDataFrame(delta_rows, "id_a bigint, id_b bigint, op int")
        edges_new = spark.createDataFrame(new_edges, "id_a bigint, id_b bigint")
        comps, forest = graph_delta.apply_components_delta_forest(
            comps, forest, edges_new, delta
        )
        # store the state between batches (the operator contract; see
        # docstring — parquet, not localCheckpoint, resets the stats)
        cdir, fdir = str(tmp_path / f"c{batch}"), str(tmp_path / f"f{batch}")
        comps.write.parquet(cdir)
        forest.write.parquet(fdir)
        comps = spark.read.parquet(cdir)
        forest = spark.read.parquet(fdir)
        all_nodes_df = spark.createDataFrame(sorted((i,) for i in node_set), "node bigint")
        want = dedup.connected_components(all_nodes_df, edges_new, node_col="node")
        assert sorted(map(tuple, comps.collect())) == sorted(map(tuple, want.collect())), batch
        cur_edges = new_edges
    # full forest invariants once, on the final state (each is 2 more CC
    # passes — per-batch labels parity above already pins correctness)
    _forest_invariants(spark, all_nodes_df, edges_new, forest)


# ---------------------------------------------------------------------------
# CDC tombstone compaction/retention (VERDICT r10 Next #5)
# ---------------------------------------------------------------------------


def _run_cdc(spark, tmp_path, batches, schema, name, buckets=4):
    from kf_task_fhir_etl_spark.streaming import cdc

    src = str(tmp_path / f"{name}_src")
    for n, rows in enumerate(batches, 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, f"e{n}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "e*"))
    )
    store = str(tmp_path / f"{name}_store")
    q = cdc.cdc_stream(
        stream, store, key_cols=["k"], order_col="seq", op_col="op",
        checkpoint=str(tmp_path / f"{name}_ckpt"), buckets=buckets,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return src, store


def test_compact_tombstones_drops_only_expired_and_preserves_live(spark, tmp_path):
    from kf_task_fhir_etl_spark.streaming import cdc

    schema = "k bigint, v string, seq long, op string"
    batches = [
        [(i, f"v{i}", 1, "upsert") for i in range(8)],
        [(1, None, 2, "delete"), (2, None, 5, "delete")],
    ]
    _, store = _run_cdc(spark, tmp_path, batches, schema, "ct")
    before = sorted(tuple(r) for r in cdc.read_table(spark, store).collect())
    n = cdc.compact_tombstones(spark, store, min_retained_order=4)
    assert n >= 1
    # post-compaction live table ≡ pre-compaction
    after = sorted(tuple(r) for r in cdc.read_table(spark, store).collect())
    assert after == before
    # the seq-5 tombstone (newer than the watermark) survives in the store
    raw = vs.read_partitions(spark, store)
    tombs = {r["k"] for r in raw.filter(F.col("__op") == "delete").collect()}
    assert tombs == {2}
    # watermark recorded
    last = vs.last_committed_batch(spark, store)
    assert vs.read_manifest_meta(spark, store, last)["retention"] == 4
    # second pass: nothing expired → zero buckets rewritten, still commits
    # (old markers are GC'd past the lag buffer, so compare the MAX id)
    assert cdc.compact_tombstones(spark, store, min_retained_order=4) == 0
    assert vs.last_committed_batch(spark, store) == last + 1


def test_compact_tombstones_rewrites_only_tombstone_buckets(spark, tmp_path):
    from kf_task_fhir_etl_spark.streaming import cdc

    schema = "k bigint, v string, seq long, op string"
    batches = [
        [(i, f"v{i}", 1, "upsert") for i in range(12)],
        [(3, None, 2, "delete")],
    ]
    _, store = _run_cdc(spark, tmp_path, batches, schema, "cb")
    last = vs.last_committed_batch(spark, store)
    m_before = vs.read_manifest(spark, store, last)
    b3 = (
        spark.createDataFrame([(3,)], "k bigint")
        .select(vs.bucket_value_expr(["k"], 4).alias("b")).collect()[0]["b"]
    )
    cdc.compact_tombstones(spark, store, min_retained_order=3)
    m_after = vs.read_manifest(spark, store, vs.last_committed_batch(spark, store))
    for v, p in m_before.items():
        if v == b3:
            assert m_after[v] != p  # the tombstone's bucket rewrote
        else:
            assert m_after[v] == p  # every other bucket carried forward


def test_late_change_older_than_watermark_dropped_at_sink(spark, tmp_path):
    """After compaction, a resumed stream (same checkpoint) delivering a
    change older than the watermark must DROP it — the tombstone that
    would have beaten it is gone."""
    from kf_task_fhir_etl_spark.streaming import cdc

    schema = "k bigint, v string, seq long, op string"
    src, store = _run_cdc(
        spark, tmp_path,
        [[(1, "a", 2, "upsert"), (2, "b", 2, "upsert")],
         [(1, None, 3, "delete")]],
        schema, "lt",
    )
    cdc.compact_tombstones(spark, store, min_retained_order=4)
    # late files: a stale zombie (seq 1 < wm) and a genuine update (seq 5)
    spark.createDataFrame(
        [(1, "zombie", 1, "upsert")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e3"))
    spark.createDataFrame(
        [(2, "b2", 5, "upsert")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e4"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "e*"))
    )
    q = cdc.cdc_stream(
        stream, store, key_cols=["k"], order_col="seq", op_col="op",
        checkpoint=str(tmp_path / "lt_ckpt"), buckets=4,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in cdc.read_table(spark, store).collect())
    assert got == [(2, "b2")]  # zombie dropped, key 1 stays deleted


# ---------------------------------------------------------------------------
# the localCheckpoint origin-stats carry (the r11 autopsy, pinned as a
# measurement so a Spark behavior change surfaces here first)
# ---------------------------------------------------------------------------


def test_local_checkpoint_carries_origin_stats(spark):
    """localCheckpoint truncates lineage but the LogicalRDD leaf CARRIES
    the origin plan's sizeInBytes — and the estimate DOUBLES per
    self-join generation from the Long.MaxValue leaf default. This is why
    graph state chained in memory across batches eventually spins the
    driver in BigInteger stats products, and why the maintenance
    operators' contract says store state through parquet (which resets
    stats to actual file sizes). If this assertion ever FAILS, Spark
    started resetting stats at the checkpoint and the parquet contract
    can be relaxed."""
    def bits(df):
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()).bit_length()

    a = spark.createDataFrame([(1, 2)], "x bigint, y bigint")
    assert bits(a) <= 64  # unknown-size leaf default
    cur = a
    growth = []
    for gen in range(3):
        nxt = cur.join(cur.withColumnRenamed("y", f"y{gen}"), "x")
        ck = nxt.localCheckpoint()
        assert bits(ck) == bits(nxt)  # stats carried through the leaf
        growth.append(bits(ck))
        cur = ck.select("x", "y")
    assert growth[1] > 1.5 * growth[0] and growth[2] > 1.5 * growth[1]
    # and the storage boundary RESETS: parquet stats are actual file sizes
    import tempfile, os, uuid
    path = os.path.join(tempfile.gettempdir(), f"stats_reset_{uuid.uuid4().hex[:8]}")
    cur.write.parquet(path)
    assert bits(spark.read.parquet(path)) < 40  # a few KB of real files
