"""Round-7 operator tests: the Bloom filter's dense-array word store
(VERDICT r06 #1 — the map<int,bigint> probe was O(filter-size) per lookup)
and the bloom_prepare reuse/release lifecycle (VERDICT r06 #5, ADVICE r06).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark import etl
from kf_task_fhir_etl_spark.operators import bloom
from kf_task_fhir_etl_spark.operators.lifecycle import is_checkpointed_relation


# ---------------------------------------------------------------------------
# Dense array<bigint> word store (q129)
# ---------------------------------------------------------------------------


def test_bloom_dense_words_match_independent_map_build(spark):
    """The dense array must hold EXACTLY the per-word bit_or values the r06
    map container held — computed here by an independent method (the same
    position expression, aggregated to a word→bits dict via collect, never
    through bloom_build's densify join/array_sort path), with zero-filled
    gaps at every absent word index. Pins the map≡array parity VERDICT r06
    #1 asked for, including the array being DENSE (length num_bits/64) and
    correctly ORDERED (a collect_list without the array_sort would pass a
    set-compare but scramble indexes — exactly what the probe's O(1)
    element_at would then read wrong)."""
    num_bits, num_hashes = 64 * 32, 5
    keys = spark.range(300).select((F.col("id") * 7 + 1).alias("k"))
    built = bloom.bloom_build(keys, "k", num_bits=num_bits, num_hashes=num_hashes)
    words = built.first()["words"]
    assert len(words) == num_bits // 64

    # independent reconstruction: explode positions, fold per-word in Python
    pos_rows = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.lit(i), F.col("k").cast("bigint")), F.lit(num_bits))
                    for i in range(num_hashes)
                ]
            )
        ).alias("pos")
    ).collect()
    expected = {}
    for r in pos_rows:
        w, b = r["pos"] // 64, r["pos"] % 64
        expected[w] = expected.get(w, 0) | (1 << b)
    for w in range(num_bits // 64):
        exp = expected.get(w, 0)
        if exp > (1 << 63) - 1:  # Spark bigint is signed two's-complement
            exp -= 1 << 64
        assert words[w] == exp, f"word {w}: dense={words[w]} independent={exp}"


def test_bloom_dense_probe_equals_exact_semi_join_rows(spark):
    """Prune → exact semi join must equal the plain semi join (no false
    negatives), and the dense-array probe must agree with a driver-side
    re-evaluation of the membership test against the collected words —
    the row-level map≡array parity check."""
    num_bits, num_hashes = 64 * 64, 7
    small = spark.range(500).select((F.col("id") * 3).alias("k"))
    big = spark.range(4000).select(F.col("id").alias("k"))
    bl = bloom.bloom_build(small, "k", num_bits=num_bits, num_hashes=num_hashes)
    words = bl.first()["words"]
    pruned = {r["k"] for r in bloom.bloom_prune(big, "k", bl).collect()}

    # driver-side replay of the same bit tests over the same dense words
    hashes = big.select(
        "k",
        *[
            F.pmod(F.xxhash64(F.lit(i), F.col("k").cast("bigint")), F.lit(num_bits)).alias(f"p{i}")
            for i in range(num_hashes)
        ],
    ).collect()
    replay = set()
    for r in hashes:
        ok = True
        for i in range(num_hashes):
            p = r[f"p{i}"]
            if not (words[p // 64] >> (p % 64)) & 1:
                ok = False
                break
        if ok:
            replay.add(r["k"])
    assert pruned == replay
    exact = {r["k"] for r in big.join(small, "k", "semi").collect()}
    assert exact <= pruned  # no false negatives


# ---------------------------------------------------------------------------
# bloom_prepare reuse + release lifecycle
# ---------------------------------------------------------------------------


def test_bloom_prepare_reuse_and_release(spark):
    """A prepared filter is recognized by bloom_prune (no second
    checkpoint, no duplicate build jobs — the lifecycle.prepared contract),
    and release_checkpoints frees its blocks for real: re-executing the
    released relation fails loudly because the truncated lineage cannot
    be recomputed (the test_pipeline_memo release-proof pattern)."""
    small = spark.range(200).select(F.col("id").alias("k"))
    big = spark.range(1000).select(F.col("id").alias("k"))
    bl = bloom.bloom_build(small, "k", num_bits=64 * 8, num_hashes=4)
    prepped = bloom.bloom_prepare(bl)
    assert is_checkpointed_relation(prepped)

    jsc = spark.sparkContext._jsc.sc()
    ids_before = {info.id() for info in jsc.getRDDStorageInfo()}
    p1 = {r["k"] for r in bloom.bloom_prune(big, "k", prepped).collect()}
    p2 = {r["k"] for r in bloom.bloom_prune(big, "k", prepped).collect()}
    assert p1 == p2  # deterministic hashes → identical prunes
    assert set(range(200)) <= p1  # no false negatives
    # neither prune took its own checkpoint — no NEW pinned storage beyond
    # the prepared blocks (set-diff, not a count: the ContextCleaner may
    # concurrently retire storage from earlier tests)
    ids_after = {info.id() for info in jsc.getRDDStorageInfo()}
    assert ids_after <= ids_before

    etl.release_checkpoints([prepped])
    with pytest.raises(Exception):
        prepped.count()  # blocks gone, lineage truncated → loud failure


def test_bloom_unprepared_prune_still_works_and_checkpoints_once(spark):
    """Passing a raw (unprepared) build is still valid — bloom_prune takes
    its own eager checkpoint so multi-consumer probes run the build once;
    the reuse path is opt-in, not required."""
    small = spark.range(50).select(F.col("id").alias("k"))
    big = spark.range(200).select(F.col("id").alias("k"))
    bl = bloom.bloom_build(small, "k", num_bits=64 * 4, num_hashes=3)
    pruned = bloom.bloom_prune(big, "k", bl)
    got = {r["k"] for r in pruned.collect()}
    assert set(range(50)) <= got


# ---------------------------------------------------------------------------
# connected_components checkpoint release (VERDICT r06 missing #1)
# ---------------------------------------------------------------------------


def test_connected_components_releases_superseded_round_checkpoints(spark):
    """After a multi-round CC call, the only NEW pinned storage is the
    final round's checkpoint (the returned frame's lineage root) — every
    superseded round's labels and the staged edge table are freed (the
    test_pipeline_memo storage-probe pattern). The path graph 0-1-...-7
    forces several min-label rounds, so without the release the probe
    would see O(rounds) new persisted RDDs plus the edge blocks."""
    import time

    from kf_task_fhir_etl_spark.operators import dedup

    jsc = spark.sparkContext._jsc.sc()
    ids_before = {info.id() for info in jsc.getRDDStorageInfo()}

    n = 8
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    comp = dedup.connected_components(nodes, edges)
    rows = comp.collect()
    assert {r["component"] for r in rows} == {0}  # one path component

    # releases are non-blocking — poll briefly for the BlockManager
    # removals to land before asserting
    deadline = time.time() + 20
    while time.time() < deadline:
        new_ids = {info.id() for info in jsc.getRDDStorageInfo()} - ids_before
        if len(new_ids) <= 1:
            break
        time.sleep(0.2)
    assert len(new_ids) <= 1, f"orphaned checkpoint blocks: {sorted(new_ids)}"
    # the surviving checkpoint is still the result's backing store
    assert {r["component"] for r in comp.collect()} == {0}


def test_zorder_write_rejects_reserved_z_column(spark, tmp_path):
    """zorder_write reserves __z for the clustering key; an input frame
    already carrying one would silently lose it from the written layout —
    must reject loudly (ADVICE r06, mirroring cdc_stream's guard)."""
    from kf_task_fhir_etl_spark.operators import zorder

    df = spark.range(10).select(F.col("id"), F.lit(1).alias("__z"))
    with pytest.raises(ValueError, match="__z"):
        zorder.zorder_write(df, str(tmp_path / "out"), F.col("id"), 2)


# ---------------------------------------------------------------------------
# triangle_count (operators/graph.py, q131)
# ---------------------------------------------------------------------------


def test_triangle_count_known_graphs(spark):
    """K4 (every node in 3 of the 4 triangles), a path (no triangles), and
    input noise — duplicate edges, reversed duplicates, self-loops — which
    canonicalization must absorb."""
    from kf_task_fhir_etl_spark.operators import graph

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noise = [(b, a) for a, b in k4] + [(2, 2), (0, 1), (3, 1)]  # reversed + loops + dups
    edges = spark.createDataFrame(k4 + noise, "src int, dst int")
    got = {r["node"]: r["n_tri"] for r in graph.triangle_count(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    path = spark.createDataFrame([(i, i + 1) for i in range(5)], "src int, dst int")
    assert graph.triangle_count(path).count() == 0


def test_triangle_count_matches_bruteforce_on_random_graph(spark):
    """Degree-ordered orientation vs a driver-side brute force over a
    deterministic pseudo-random graph — pins exactly-once production."""
    import itertools

    from kf_task_fhir_etl_spark.operators import graph

    edges = [
        (a, b)
        for a, b in itertools.combinations(range(30), 2)
        if (a * 7 + b * 13) % 5 == 0
    ]
    adj = {n: set() for n in range(30)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for a, b, c in itertools.combinations(range(30), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["n_tri"] for r in graph.triangle_count(df).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# expectations suite (operators/expectations.py, q132)
# ---------------------------------------------------------------------------


def test_expectations_aggregate_checks(spark):
    from kf_task_fhir_etl_spark.operators import expectations as ex

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (2, None, -1.0), (3, "z", None)],
        "id int, cat string, x double",
    )
    out = {
        r["constraint_name"]: (r["metric"], r["passed"])
        for r in ex.expect_suite(
            df,
            [
                {"name": "id_unique", "kind": "unique", "cols": ["id"]},
                {"name": "cat_not_null", "kind": "not_null", "col": "cat"},
                {"name": "cat_one_null_ok", "kind": "not_null", "col": "cat", "max_ratio": 0.25},
                {"name": "x_nonneg", "kind": "range", "col": "x", "lo": 0.0},
                {"name": "x_le_10", "kind": "range", "col": "x", "hi": 10.0},
                {"name": "cat_allowed", "kind": "values", "col": "cat", "allowed": ["a", "b"]},
            ],
        ).collect()
    }
    assert out["id_unique"] == (1.0, False)  # one duplicate id
    assert out["cat_not_null"] == (1.0, False)
    assert out["cat_one_null_ok"] == (1.0, True)  # 1/4 ≤ 0.25
    assert out["x_nonneg"] == (1.0, False)  # -1.0; NULL x not counted
    assert out["x_le_10"] == (1.0, False)  # 50.0
    assert out["cat_allowed"] == (1.0, False)  # 'z'; NULL not counted


def test_expectations_referential_and_union(spark):
    from kf_task_fhir_etl_spark.operators import expectations as ex

    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = ex.expect_referential(child, "fk", parent, "pk", "fk_check").first()
    assert (row["metric"], row["passed"]) == (1.0, False)  # 9 orphaned; NULL excluded
    both = ex.union_results(
        [
            ex.expect_referential(child, "fk", parent, "pk", "a"),
            ex.expect_referential(parent, "pk", child, "fk", "b"),
        ]
    )
    assert both.count() == 2
    with pytest.raises(ValueError):
        ex.expect_suite(child, [])


# ---------------------------------------------------------------------------
# incremental view maintenance (operators/ivm.py, q133)
# ---------------------------------------------------------------------------


def test_ivm_insert_delete_merge_and_zero_removal(spark):
    from kf_task_fhir_etl_spark.operators import ivm

    view = spark.createDataFrame(
        [("a", 2, 10.0), ("b", 1, 5.0), ("c", 3, 30.0)],
        "k string, n bigint, s double",
    )
    delta = spark.createDataFrame(
        [
            ("a", 7.0, 1),   # insert into existing group
            ("b", 5.0, -1),  # delete b's only row → group must VANISH
            ("d", 2.0, 1),   # brand-new group
            ("c", 10.0, -1),
            ("c", 1.0, 1),   # net c: n 3→3, s 30→21
        ],
        "k string, x double, op int",
    )
    out = {
        r["k"]: (r["n"], r["s"])
        for r in ivm.apply_agg_delta(view, delta, ["k"], {"s": "x"}).collect()
    }
    assert out == {"a": (3, 17.0), "c": (3, 21.0), "d": (1, 2.0)}
    assert "b" not in out


def test_ivm_untouched_groups_survive_and_bad_schema_rejected(spark):
    from kf_task_fhir_etl_spark.operators import ivm

    view = spark.createDataFrame([("a", 1, 1.0)], "k string, n bigint, s double")
    delta = spark.createDataFrame([("z", 4.0, 1)], "k string, x double, op int")
    out = {r["k"]: (r["n"], r["s"]) for r in ivm.apply_agg_delta(view, delta, ["k"], {"s": "x"}).collect()}
    assert out == {"a": (1, 1.0), "z": (1, 4.0)}
    with pytest.raises(ValueError, match="lacks sum column"):
        ivm.apply_agg_delta(view, delta, ["k"], {"missing": "x"})
    with pytest.raises(ValueError, match="lacks count column"):
        ivm.apply_agg_delta(view.drop("n"), delta, ["k"], {"s": "x"})


def test_ivm_matches_full_recompute_on_random_changelog(spark):
    """incremental ≡ recompute on a generated base + changelog — the IVM
    contract, checked independently of the q133 oracle."""
    from kf_task_fhir_etl_spark.operators import ivm

    base = spark.range(200).select(
        (F.col("id") % 17).alias("k"), (F.col("id") * 1.5).alias("x")
    )
    view = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    dels = base.filter(F.col("id") % 3 == 0).select("k", "x", F.lit(-1).alias("op"))
    ins = spark.range(200, 260).select(
        (F.col("id") % 23).alias("k"), (F.col("id") * 1.5).alias("x"), F.lit(1).alias("op")
    )
    got = {
        r["k"]: (r["n"], round(r["s"], 6))
        for r in ivm.apply_agg_delta(view, dels.unionByName(ins), ["k"], {"s": "x"}).collect()
    }
    surviving = base.filter(F.col("id") % 3 != 0).select("k", "x").unionByName(
        spark.range(200, 260).select((F.col("id") % 23).alias("k"), (F.col("id") * 1.5).alias("x"))
    )
    want = {
        r["k"]: (r["n"], round(r["s"], 6))
        for r in surviving.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# funnel (operators/funnel.py, q134)
# ---------------------------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")


def test_funnel_strict_order_and_first_touch(spark):
    import datetime as dt

    from kf_task_fhir_etl_spark.operators import funnel

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1 completes in order
        (1, t(0), "view"), (1, t(10), "click"), (1, t(20), "purchase"),
        # u2: click BEFORE view only — must stop at view
        (2, t(5), "click"), (2, t(6), "view"),
        # u3: click at the SAME ts as view — strictly-after excludes it
        (3, t(0), "view"), (3, t(0), "click"),
        # u4: first click pre-view is ignored, second click counts;
        # purchase before that click does not
        (4, t(0), "click"), (4, t(1), "view"), (4, t(2), "purchase"), (4, t(3), "click"),
    ]
    out = {r["step_idx"]: (r["step"], r["n_users"], r["avg_s_from_first"]) for r in funnel.funnel_counts(_ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert out[1] == ("view", 4, 0.0)
    assert out[2] == ("click", 2, 6.0)  # u1 gap 10s, u4 gap 2s → avg 6.0
    assert out[3] == ("purchase", 1, 20.0)  # only u1


def test_funnel_trajectories_and_handle_release(spark):
    import datetime as dt

    from kf_task_fhir_etl_spark.operators import funnel

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [(1, t(0), "a"), (1, t(1), "b"), (2, t(0), "a")]
    handles = []
    traj = funnel.funnel_trajectories(_ev(spark, rows), ["a", "b"], handles_out=handles)
    got = {r["user"]: (r["t1"] is not None, r["t2"] is not None) for r in traj.collect()}
    assert got == {1: (True, True), 2: (True, False)}
    # only SHARED frames checkpoint: step 1 (feeds traj + step 2), not the
    # final step (single consumer — r07 review, fourth pass)
    assert len(handles) == 1
    etl.release_checkpoints(handles)
    with pytest.raises(ValueError):
        funnel.funnel_counts(_ev(spark, rows), [])


# ---------------------------------------------------------------------------
# exact set-similarity join (operators/setsim.py, q135)
# ---------------------------------------------------------------------------


def test_setsim_exact_no_false_negatives_vs_bruteforce(spark):
    """Prefix filtering must return EXACTLY the brute-force pair set —
    including boundary pairs where |∩|·den == num·|∪| (the off-by-one a
    float ceil would drop)."""
    import itertools

    from kf_task_fhir_etl_spark.operators import setsim

    sets = {
        0: ["a", "b", "c", "d", "e"],
        1: ["a", "b", "c", "d", "f"],       # J=4/6 with 0
        2: ["a", "b", "c", "d", "e", "f"],  # J=5/6 with 0 — boundary at 5/6
        3: ["x", "y", "z"],
        4: ["x", "y", "z"],                 # J=1 with 3
        5: ["a", "x"],
        6: [],                              # empty set: excluded
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in sets.items()], "id int, toks array<string>"
    )
    for t_num, t_den in [(5, 6), (2, 3), (1, 1)]:
        got = {
            (r["id_a"], r["id_b"])
            for r in setsim.set_similarity_join(df, "id", "toks", t_num, t_den).collect()
        }
        want = set()
        for a, b in itertools.combinations(sorted(sets), 2):
            sa, sb = set(sets[a]), set(sets[b])
            if not sa or not sb:
                continue
            if len(sa & sb) * t_den >= t_num * len(sa | sb):
                want.add((a, b))
        assert got == want, f"t={t_num}/{t_den}: {got} != {want}"


def test_setsim_dedups_tokens_and_rejects_bad_threshold(spark):
    from kf_task_fhir_etl_spark.operators import setsim

    df = spark.createDataFrame(
        [(1, ["a", "a", "b"]), (2, ["b", "a", "b"])], "id int, toks array<string>"
    )
    rows = setsim.set_similarity_join(df, "id", "toks", 1, 1).collect()
    assert len(rows) == 1 and rows[0]["jaccard"] == 1.0 and rows[0]["n_inter"] == 2
    with pytest.raises(ValueError):
        setsim.set_similarity_join(df, "id", "toks", 0, 1)
    with pytest.raises(ValueError):
        setsim.set_similarity_join(df, "id", "toks", 3, 2)


# ---------------------------------------------------------------------------
# snapshot diff (operators/scd.py::snapshot_diff, q136)
# ---------------------------------------------------------------------------


def test_snapshot_diff_iud_and_nullsafe_compare(spark):
    from kf_task_fhir_etl_spark.operators import scd

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "k int, s string, x double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),      # unchanged → dropped
         (2, "b", 2.0),      # NULL → value: U
         (3, None, 3.0),     # value → NULL: U
         (5, "e", 5.0)],     # absent in old: I   (4 deleted: D)
        "k int, s string, x double",
    )
    got = {r["k"]: (r["op"], r["s"], r["x"]) for r in scd.snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        2: ("U", "b", 2.0),
        3: ("U", None, 3.0),
        4: ("D", None, None),  # delete carries no new-side values
        5: ("I", "e", 5.0),
    }


def test_snapshot_diff_roundtrip_through_cdc_semantics(spark):
    """Applying the emitted changelog to `old` must reconstruct `new`
    exactly — diff and apply are inverses (checked with plain DataFrame
    ops: delete Ds, upsert I/Us)."""
    from kf_task_fhir_etl_spark.operators import scd

    old = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("x")
    )
    new = (
        spark.range(40)
        .filter(F.col("id") % 4 != 0)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0 + (F.col("id") % 3)).alias("x"))
    )
    feed = scd.snapshot_diff(old, new, ["k"])
    upserts = feed.filter(F.col("op") != "D").select("k", "x")
    deletes = feed.filter(F.col("op") == "D").select("k")
    rebuilt = (
        old.join(feed.select("k"), "k", "left_anti")  # untouched rows
        .unionByName(upserts)
    )
    assert rebuilt.join(deletes, "k", "inner").count() == 0
    diff = rebuilt.exceptAll(new).unionByName(new.exceptAll(rebuilt))
    assert diff.count() == 0


def test_expectations_empty_table_passes_with_zero_metrics(spark):
    """SUM over zero rows is NULL — the suite must still report metric 0.0
    / passed TRUE on an empty table (r07 review: a NULL passed is skipped
    by both an alerting and a proceed-on-pass consumer)."""
    from kf_task_fhir_etl_spark.operators import expectations as ex

    empty = spark.createDataFrame([], "id int, cat string, x double")
    rows = ex.expect_suite(
        empty,
        [
            {"name": "u", "kind": "unique", "cols": ["id"]},
            {"name": "nn", "kind": "not_null", "col": "cat"},
            {"name": "rg", "kind": "range", "col": "x", "lo": 0.0, "hi": 1.0},
            {"name": "vals", "kind": "values", "col": "cat", "allowed": ["a"]},
        ],
    ).collect()
    assert all(r["metric"] == 0.0 and r["passed"] is True for r in rows), rows


def test_ivm_null_key_group_merges_nullsafe(spark):
    """SQL GROUP BY emits a NULL-key group; the merge must treat it as ONE
    group (eqNullSafe join), so deltas reach it and deletes can zero it
    out — a plain equi-join splits it into two rows (r07 review)."""
    from kf_task_fhir_etl_spark.operators import ivm

    view = spark.createDataFrame([(None, 2, 10.0), ("a", 1, 5.0)], "k string, n bigint, s double")
    delta = spark.createDataFrame(
        [(None, 4.0, 1), ("b", 1.0, 1)], "k string, x double, op int"
    )
    out = {r["k"]: (r["n"], r["s"]) for r in ivm.apply_agg_delta(view, delta, ["k"], {"s": "x"}).collect()}
    assert out == {None: (3, 14.0), "a": (1, 5.0), "b": (1, 1.0)}
    # deleting the NULL group's remaining rows must vanish it
    kill = spark.createDataFrame([(None, 10.0, -1)], "k string, x double, op int")
    view2 = spark.createDataFrame([(None, 1, 10.0)], "k string, n bigint, s double")
    assert ivm.apply_agg_delta(view2, kill, ["k"], {"s": "x"}).count() == 0


def test_bloom_prune_mismatch_releases_internal_checkpoint(spark):
    """A rejected unprepared prune must not leave its internal filter
    checkpoint pinned (r07 review, fourth pass): after the raise, no new
    persisted RDDs remain beyond what existed before the call."""
    small = spark.range(50).select(F.col("id").alias("k"))
    probe_str = spark.range(50).select(F.col("id").cast("string").alias("k"))
    bl = bloom.bloom_build(small, "k", num_bits=64 * 4, num_hashes=3)
    jsc = spark.sparkContext._jsc.sc()
    ids_before = {info.id() for info in jsc.getRDDStorageInfo()}
    with pytest.raises(ValueError, match="type-"):
        bloom.bloom_prune(probe_str, "k", bl)
    ids_after = {info.id() for info in jsc.getRDDStorageInfo()}
    assert ids_after <= ids_before
    # a PREPARED filter survives its rejection — the caller holds the
    # handle and may retry with a corrected probe side
    prepped = bloom.bloom_prepare(bloom.bloom_build(small, "k", num_bits=64 * 4, num_hashes=3))
    with pytest.raises(ValueError, match="type-"):
        bloom.bloom_prune(probe_str, "k", prepped)
    ok = bloom.bloom_prune(spark.range(50).select(F.col("id").alias("k")), "k", prepped)
    assert ok.count() >= 50
    etl.release_checkpoints([prepped])


def test_ivm_rejects_reserved_staging_columns(spark):
    from kf_task_fhir_etl_spark.operators import ivm

    view = spark.createDataFrame([("a", 1, 1.0, 9)], "k string, n bigint, s double, __dn int")
    delta = spark.createDataFrame([("a", 1.0, 1)], "k string, x double, op int")
    with pytest.raises(ValueError, match="reserved staging names"):
        ivm.apply_agg_delta(view, delta, ["k"], {"s": "x"})


def test_bloom_prepared_shape_row_cached_across_prunes(spark):
    """Repeat prunes against one prepared filter read the immutable shape
    row ONCE — the second prune must not run another one-row job (r07
    review, eighth pass). Pinned by poisoning .first() after the first
    prune: a second call that still works proves the cache path."""
    small = spark.range(100).select(F.col("id").alias("k"))
    big = spark.range(300).select(F.col("id").alias("k"))
    prepped = bloom.bloom_prepare(bloom.bloom_build(small, "k", num_bits=64 * 8, num_hashes=4))
    p1 = bloom.bloom_prune(big, "k", prepped).count()
    assert getattr(prepped, "_bloom_shape_row", None) is not None

    def boom():
        raise AssertionError("first() must not run on a cached prepared filter")

    orig = prepped.first
    prepped.first = boom
    try:
        p2 = bloom.bloom_prune(big, "k", prepped).count()
    finally:
        prepped.first = orig
    assert p1 == p2
    etl.release_checkpoints([prepped])


def test_bloom_prune_rejects_reserved_probe_columns_without_leak(spark):
    from kf_task_fhir_etl_spark.operators import bloom as bl_mod

    small = spark.range(10).select(F.col("id").alias("k"))
    big = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("__bloom_words"))
    filt = bl_mod.bloom_build(small, "k", num_bits=64 * 2, num_hashes=2)
    jsc = spark.sparkContext._jsc.sc()
    ids_before = {info.id() for info in jsc.getRDDStorageInfo()}
    with pytest.raises(ValueError, match="__bloom"):
        bl_mod.bloom_prune(big, "k", filt)
    # raised BEFORE any internal checkpoint — zero new pinned storage
    assert {info.id() for info in jsc.getRDDStorageInfo()} <= ids_before


def test_expectations_boundless_range_rejected(spark):
    from kf_task_fhir_etl_spark.operators import expectations as ex

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="never fail"):
        ex.expect_suite(df, [{"name": "r", "kind": "range", "col": "x"}])


def test_lifecycle_prepared_noops_on_checkpointed_input(spark):
    from kf_task_fhir_etl_spark.operators import lifecycle

    df = spark.range(5)
    once = lifecycle.prepared(df)
    twice = lifecycle.prepared(once)
    assert twice is once  # no duplicate block copy
