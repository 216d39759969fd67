"""Round-8 operator tests: the lifecycle consolidation (VERDICT r07
missing #3 — ``is_checkpointed_relation``/``prepared`` canonical in
operators/lifecycle.py, sketch/bloom re-pointed), the prepare_sketch
idempotence that fell out of it, and the IVM schema-preservation fix
(ADVICE r07 — merged views must keep the input view's dtypes)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.operators import bloom, lifecycle, sketch
from kf_task_fhir_etl_spark.operators.ivm import apply_agg_delta


# ---------------------------------------------------------------------------
# Lifecycle consolidation (VERDICT r07 missing #3 / ADVICE r07)
# ---------------------------------------------------------------------------


def test_checkpoint_probe_has_one_definition():
    """The r08 transitional shims are RETIRED (r09, VERDICT r08 missing
    #2): sketch.py must expose neither the underscore alias nor
    prepare_sketch — lifecycle.py is the one canonical import path, so a
    sketch.py refactor can no longer silently change bloom's
    prepare/reuse behavior (the ADVICE r07 drift hazard)."""
    assert not hasattr(sketch, "_is_checkpointed_relation")
    assert not hasattr(sketch, "prepare_sketch")
    assert callable(lifecycle.is_checkpointed_relation)


def test_prepared_is_idempotent_on_sketches(spark):
    """Re-preparing an already-prepared sketch must be a no-op (same
    object back, no second set of pinned blocks) — the lifecycle.prepared
    contract; previously each call copied the blocks."""
    words = spark.range(100).select(F.concat(F.lit("w"), F.col("id")).alias("word"))
    cms = sketch.cms_build(words, "word", depth=3, width=64)
    once = lifecycle.prepared(cms)
    assert lifecycle.is_checkpointed_relation(once)
    jsc = spark.sparkContext._jsc.sc()
    ids_before = {info.id() for info in jsc.getRDDStorageInfo()}
    twice = lifecycle.prepared(once)
    assert twice is once
    ids_after = {info.id() for info in jsc.getRDDStorageInfo()}
    assert ids_after <= ids_before  # no NEW pinned storage from the re-prepare


def test_prepared_recognized_across_operators(spark):
    """A lifecycle.prepared() filter is recognized by bloom_prune and a
    prepared() sketch by cms_estimate via the shared probe — one
    lifecycle across the prepare-aware operators."""
    small = spark.range(50).select(F.col("id").alias("k"))
    bl = lifecycle.prepared(bloom.bloom_build(small, "k", num_bits=64 * 4, num_hashes=3))
    big = spark.range(200).select(F.col("id").alias("k"))
    pruned = {r["k"] for r in bloom.bloom_prune(big, "k", bl).collect()}
    assert set(range(50)) <= pruned  # no false negatives through the prepared path


# ---------------------------------------------------------------------------
# IVM schema preservation (ADVICE r07)
# ---------------------------------------------------------------------------


def _dtypes(df):
    return dict(df.dtypes)


def test_ivm_preserves_view_schema_exactly(spark):
    """The merge arithmetic widens (decimal(18,4) → decimal(38,4); count
    promotes) — apply_agg_delta must cast every maintained column back to
    the INPUT view's dtype so the docstring's 'same schema' holds and the
    maintained view round-trips through schema-strict unionByName
    (ADVICE r07)."""
    view = spark.createDataFrame(
        [("a", 2, Decimal("10.5000")), ("b", 1, Decimal("3.0000"))],
        "k string, n bigint, total decimal(18,4)",
    )
    delta = spark.createDataFrame(
        [("a", Decimal("1.2500"), 1), ("c", Decimal("7.0000"), 1)],
        "k string, amount decimal(18,4), op int",
    )
    out = apply_agg_delta(view, delta, ["k"], {"total": "amount"})
    # dtype equality (nullability may tighten: the merged count is provably
    # non-null, which every strict consumer accepts)
    assert _dtypes(out) == _dtypes(view), f"{out.dtypes} != {view.dtypes}"
    # values still correct under the cast-back
    got = {r["k"]: (r["n"], r["total"]) for r in out.collect()}
    assert got == {
        "a": (3, Decimal("11.7500")),
        "b": (1, Decimal("3.0000")),
        "c": (1, Decimal("7.0000")),
    }
    # the round-trip the ADVICE names: strict unionByName with the view
    view.unionByName(out)  # raises on any dtype mismatch


def test_ivm_preserves_int_count_and_double_sum(spark):
    """Non-decimal views too: an int count column and double sum keep
    their types through the merge."""
    view = spark.createDataFrame(
        [("x", 1, 2.5)], "k string, n int, s double"
    )
    delta = spark.createDataFrame(
        [("x", 0.5, 1), ("y", 1.0, 1)], "k string, v double, op int"
    )
    out = apply_agg_delta(view, delta, ["k"], {"s": "v"})
    assert _dtypes(out) == {"k": "string", "n": "int", "s": "double"}
    got = {r["k"]: (r["n"], r["s"]) for r in out.collect()}
    assert got == {"x": (2, 3.0), "y": (1, 1.0)}


# ---------------------------------------------------------------------------
# pattern_spans / funnel_with_negation (operators/patterns.py — r08)
# ---------------------------------------------------------------------------

from datetime import datetime, timedelta

from kf_task_fhir_etl_spark.operators import graph, patterns


def _ev(spark, rows):
    """rows: (user, type, seconds-offset) → events frame with µs-precision ts."""
    base = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, t, base + timedelta(seconds=s)) for u, t, s in rows],
        "user_id bigint, event_type string, ts timestamp",
    )


def test_pattern_spans_boundary_semantics(spark):
    """Open-interval negation: a deny tied to the anchor's or target's
    microsecond does NOT void; one strictly inside does. Latest anchor
    wins; a target with no prior anchor emits nothing."""
    ev = _ev(
        spark,
        [
            (1, "A", 0), (1, "N", 0), (1, "B", 10),      # deny tied at anchor → survives
            (2, "A", 0), (2, "N", 5), (2, "B", 10),      # strictly inside → killed
            (3, "A", 0), (3, "B", 10), (3, "N", 10),     # deny tied at target → survives
            (4, "A", 0), (4, "A", 6), (4, "N", 3), (4, "B", 10),  # later anchor clears the deny
            (5, "B", 10),                                  # no prior anchor → absent
            (6, "A", 10), (6, "B", 10),                    # anchor NOT strictly earlier → absent
        ],
    )
    got = {
        (r["user_id"], r["start_us"], r["end_us"])
        for r in patterns.pattern_spans(ev, "A", "B", ["N"]).collect()
    }
    us = lambda s: int(datetime(2024, 1, 1).timestamp() + s) * 1_000_000
    assert got == {
        (1, us(0), us(10)),
        (3, us(0), us(10)),
        (4, us(6), us(10)),
    }


def test_pattern_spans_matches_bruteforce(spark):
    """Randomized parity against a driver-side brute force (every
    (anchor, target) rule re-evaluated in Python sets)."""
    import random

    rng = random.Random(8)
    rows = [
        (rng.randrange(12), rng.choice("ABN"), rng.randrange(500))
        for _ in range(400)
    ]
    ev = _ev(spark, rows)
    got = {
        (r["user_id"], r["start_us"], r["end_us"])
        for r in patterns.pattern_spans(ev, "A", "B", ["N"]).collect()
    }
    base_us = int(datetime(2024, 1, 1).timestamp()) * 1_000_000
    per_user = {}
    for u, t, s in rows:
        per_user.setdefault(u, []).append((t, base_us + s * 1_000_000))
    want = set()
    for u, evs in per_user.items():
        a_ts = [ts for t, ts in evs if t == "A"]
        n_ts = [ts for t, ts in evs if t == "N"]
        for t, ts in evs:
            if t != "B":
                continue
            prior = [x for x in a_ts if x < ts]
            if not prior:
                continue
            start = max(prior)
            if any(start < x < ts for x in n_ts):
                continue
            want.add((u, start, ts))
    assert got == want


def test_funnel_with_negation_cascade(spark):
    """The void cascades: a dirty first transition removes the user from
    EVERY later step even when the raw trajectory completes."""
    ev = _ev(
        spark,
        [
            # u1: clean A→B→C
            (1, "A", 0), (1, "B", 10), (1, "C", 20),
            # u2: N inside (A, B) → counted at step 1 only (even though C exists)
            (2, "A", 0), (2, "N", 5), (2, "B", 10), (2, "C", 20),
            # u3: M inside (B, C) → steps 1 and 2
            (3, "A", 0), (3, "B", 10), (3, "M", 15), (3, "C", 20),
            # u4: never reaches B
            (4, "A", 0), (4, "C", 5),
            # u5: N strictly AT t1 (tie) → not inside the open interval → clean
            (5, "A", 0), (5, "N", 0), (5, "B", 10), (5, "C", 20),
        ],
    )
    got = {
        r["step_idx"]: r["n_users"]
        for r in patterns.funnel_with_negation(
            ev, ["A", "B", "C"], denies=[["N"], ["M"]]
        ).collect()
    }
    assert got == {1: 5, 2: 3, 3: 2}  # step2: u1,u3,u5; step3: u1,u5


def test_funnel_with_negation_empty_denies_equals_funnel_counts(spark):
    """With every deny set empty the report must equal funnel_counts'
    n_users column (same first-touch trajectory, no veto)."""
    import random

    rng = random.Random(17)
    rows = [
        (rng.randrange(20), rng.choice(["A", "B", "C"]), rng.randrange(300))
        for _ in range(600)
    ]
    ev = _ev(spark, rows)
    neg = {
        r["step_idx"]: r["n_users"]
        for r in patterns.funnel_with_negation(
            ev, ["A", "B", "C"], denies=[[], []]
        ).collect()
    }
    from kf_task_fhir_etl_spark.operators import funnel

    plain = {
        r["step_idx"]: r["n_users"]
        for r in funnel.funnel_counts(ev, ["A", "B", "C"]).collect()
    }
    assert neg == plain


def test_funnel_with_negation_validates_deny_arity(spark):
    ev = _ev(spark, [(1, "A", 0)])
    with pytest.raises(ValueError, match="deny sets"):
        patterns.funnel_with_negation(ev, ["A", "B"], denies=[["N"], ["M"]])


# ---------------------------------------------------------------------------
# k_core (operators/graph.py — r08)
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def _brute_kcore(pairs, k):
    import collections

    es = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    while True:
        deg = collections.Counter()
        for u, v in es:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(u, v) for u, v in es if u in keep and v in keep}
        if nxt == es:
            break
        es = nxt
    deg = collections.Counter()
    for u, v in es:
        deg[u] += 1
        deg[v] += 1
    return dict(deg)


def test_k_core_peels_chain_into_clique(spark):
    """4-clique + a pendant chain: the 2-core keeps only the clique —
    the chain peels one node per round (multi-round fixpoint), which
    also exercises the per-round checkpoint/release loop."""
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    got = {
        (r["node"], r["deg"])
        for r in graph.k_core(_edges(spark, clique + chain), k=2).collect()
    }
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_k_core_empty_when_k_exceeds_connectivity(spark):
    got = graph.k_core(_edges(spark, [(1, 2), (2, 3), (3, 1)]), k=3).collect()
    assert got == []  # a triangle has max coreness 2


def test_k_core_matches_bruteforce_random(spark):
    import random

    rng = random.Random(29)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    for k in (2, 3):
        got = {
            (r["node"], r["deg"])
            for r in graph.k_core(_edges(spark, pairs), k=k).collect()
        }
        assert got == set(_brute_kcore(pairs, k).items()), f"k={k}"


def test_k_core_rejects_bad_k(spark):
    with pytest.raises(ValueError, match="k must be"):
        graph.k_core(_edges(spark, [(1, 2)]), k=0)


# ---------------------------------------------------------------------------
# bfs_distances (operators/graph.py — r08)
# ---------------------------------------------------------------------------


def test_bfs_distances_known_graph(spark):
    """Path + branch + unreachable island: exact hop levels, multi-source
    min, unreachable nodes absent, isolated source reports 0."""
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (2, 5), (8, 9)])
    sources = spark.createDataFrame([(1,), (7,)], "node bigint")
    got = {(r["node"], r["dist"]) for r in graph.bfs_distances(edges, sources).collect()}
    assert got == {(1, 0), (7, 0), (2, 1), (3, 2), (5, 2), (4, 3)}
    # 8, 9 unreachable → absent


def test_bfs_distances_matches_bruteforce(spark):
    import collections
    import random

    rng = random.Random(41)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(60)]
    srcs = [0, 7, 13]
    edges = _edges(spark, pairs)
    sources = spark.createDataFrame([(s,) for s in srcs], "node bigint")
    got = {(r["node"], r["dist"]) for r in graph.bfs_distances(edges, sources).collect()}
    adj = collections.defaultdict(set)
    for u, v in pairs:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    dist = {s: 0 for s in srcs}
    frontier, d = set(srcs), 0
    while frontier:
        d += 1
        nxt = {m for n in frontier for m in adj[n] if m not in dist}
        for m in nxt:
            dist[m] = d
        frontier = nxt
    assert got == set(dist.items())


def test_bfs_distances_directed_mode(spark):
    """directed=True must not traverse edges backwards."""
    edges = _edges(spark, [(1, 2), (3, 2)])
    sources = spark.createDataFrame([(1,)], "node bigint")
    got = {(r["node"], r["dist"]) for r in graph.bfs_distances(edges, sources, directed=True).collect()}
    assert got == {(1, 0), (2, 1)}  # 3 only reaches 2, never reached


def test_bfs_distances_max_depth_guard(spark):
    edges = _edges(spark, [(i, i + 1) for i in range(10)])
    sources = spark.createDataFrame([(0,)], "node bigint")
    with pytest.raises(RuntimeError, match="max_depth"):
        graph.bfs_distances(edges, sources, max_depth=3)


# ---------------------------------------------------------------------------
# value_runs (operators/patterns.py — r08)
# ---------------------------------------------------------------------------


def test_value_runs_islands_and_boundaries(spark):
    """Runs split on False AND on NULL; min_len filters; single-row runs
    count; per-group independence."""
    rows = [
        # g, ord, flag
        ("a", 1, True), ("a", 2, True), ("a", 3, False), ("a", 4, True),
        ("a", 5, None), ("a", 6, True), ("a", 7, True), ("a", 8, True),
        ("b", 1, True),
        ("c", 1, False),
    ]
    df = spark.createDataFrame(rows, "g string, o int, f boolean")
    got = {
        (r["g"], r["run_start"], r["run_end"], r["run_len"])
        for r in patterns.value_runs(df, "g", "o", "f").collect()
    }
    assert got == {
        ("a", 1, 2, 2), ("a", 4, 4, 1), ("a", 6, 8, 3), ("b", 1, 1, 1),
    }
    got2 = {
        (r["g"], r["run_start"], r["run_end"], r["run_len"])
        for r in patterns.value_runs(df, "g", "o", "f", min_len=2).collect()
    }
    assert got2 == {("a", 1, 2, 2), ("a", 6, 8, 3)}


def test_value_runs_matches_bruteforce(spark):
    import random

    rng = random.Random(53)
    rows = [
        (g, i, rng.random() < 0.6)
        for g in range(6)
        for i in range(rng.randrange(5, 40))
    ]
    # make orders unique per group
    seen = set()
    rows = [r for r in rows if not (r[:2] in seen or seen.add(r[:2]))]
    df = spark.createDataFrame(rows, "g int, o int, f boolean")
    got = {
        (r["g"], r["run_start"], r["run_end"], r["run_len"])
        for r in patterns.value_runs(df, "g", "o", "f").collect()
    }
    per_group = {}
    for g, o, f in rows:
        per_group.setdefault(g, []).append((o, f))
    want = set()
    for g, lst in per_group.items():
        lst.sort()
        run = []
        for o, f in lst + [(None, False)]:
            if f:
                run.append(o)
            elif run:
                want.add((g, run[0], run[-1], len(run)))
                run = []
    assert got == want


# ---------------------------------------------------------------------------
# minhash_index / incremental_dedup (operators/dedup.py — r08)
# ---------------------------------------------------------------------------


def test_incremental_dedup_screens_near_dups(spark):
    from kf_task_fhir_etl_spark.operators import dedup

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "completely different text about distributed query engines"),
        ],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup
            (11, "an entirely novel document mentioning nothing seen before"),
            (12, "completely different text about distributed query engines"),  # exact dup
        ],
        "doc_id bigint, text string",
    )
    index = dedup.minhash_index(corpus)
    survivors = {r["doc_id"] for r in dedup.incremental_dedup(batch, index, corpus).collect()}
    assert survivors == {11}


def test_incremental_dedup_index_append_composes(spark):
    """The index is append-only: screening batch2 against index(corpus) ∪
    index(batch1 survivors) must flag a batch2 doc that duplicates a
    batch1 survivor."""
    from kf_task_fhir_etl_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id bigint, text string",
    )
    batch1 = spark.createDataFrame(
        [(10, "iota kappa lambda mu nu xi omicron pi rho sigma")],
        "doc_id bigint, text string",
    )
    index = dedup.minhash_index(corpus)
    s1 = dedup.incremental_dedup(batch1, index, corpus)
    assert {r["doc_id"] for r in s1.collect()} == {10}
    # extend index + corpus with the accepted batch
    index2 = index.unionByName(dedup.minhash_index(s1))
    corpus2 = corpus.unionByName(s1)
    batch2 = spark.createDataFrame(
        [
            (20, "iota kappa lambda mu nu xi omicron pi rho sigma"),  # dup of 10
            (21, "totally fresh words never indexed anywhere at all"),
        ],
        "doc_id bigint, text string",
    )
    s2 = {r["doc_id"] for r in dedup.incremental_dedup(batch2, index2, corpus2).collect()}
    assert s2 == {21}


# ---------------------------------------------------------------------------
# r08 first-review-pass fixes
# ---------------------------------------------------------------------------


def test_bfs_directed_null_endpoints_dropped(spark):
    """A directed edge list from an outer join carries NULL endpoints —
    they must never enter the frontier as a phantom node (r08 review)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, None), (None, 3)], "src bigint, dst bigint"
    )
    sources = spark.createDataFrame([(1,)], "node bigint")
    got = {(r["node"], r["dist"]) for r in graph.bfs_distances(edges, sources, directed=True).collect()}
    assert got == {(1, 0), (2, 1)}


def test_bfs_releases_all_superseded_rounds(spark):
    """At loop exit no superseded round may stay pinned: only the
    caller-owned result checkpoint survives (r08 review — prev_rounds
    held the last frontier + near-full-size visited)."""
    jsc = spark.sparkContext._jsc.sc()
    before = {info.id() for info in jsc.getRDDStorageInfo()}
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    sources = spark.createDataFrame([(1,)], "node bigint")
    out = graph.bfs_distances(edges, sources)
    assert out.count() == 4
    after = {info.id() for info in jsc.getRDDStorageInfo()}
    assert len(after - before) == 1  # exactly the returned visited frame


def test_k_core_exact_depth_fixpoint_not_spurious_raise(spark):
    """A graph whose peel depth is exactly max_rounds must return its
    (correct) core, not raise — the guard counts PRODUCTIVE rounds (r08
    review off-by-one). Chain + triangle peels one chain node per round."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 4)]
    # k=2: chain 1-2-3 peels in 3 rounds (one pendant per round)
    got = {
        (r["node"], r["deg"])
        for r in graph.k_core(_edges(spark, pairs), k=2, max_rounds=3).collect()
    }
    assert got == {(4, 2), (5, 2), (6, 2)}
    with pytest.raises(RuntimeError, match="max_rounds"):
        graph.k_core(_edges(spark, pairs), k=2, max_rounds=2)


def test_ivm_key_dtype_mismatch_raises_and_match_preserves(spark):
    """A delta keyed wider than the view must raise LOUDLY up front
    (r08 review, second pass: casting it back down would abort mid-merge
    under ANSI or silently wrap with ANSI off); matching key dtypes pass
    through unwidened."""
    view = spark.createDataFrame([(1, 1, 2.0)], "k int, n bigint, s double")
    wide = spark.createDataFrame([(1, 1.0, 1)], "k bigint, v double, op int")
    with pytest.raises(ValueError, match="key dtypes"):
        apply_agg_delta(view, wide, ["k"], {"s": "v"})
    ok = spark.createDataFrame([(1, 1.0, 1), (2, 3.0, 1)], "k int, v double, op int")
    out = apply_agg_delta(view, ok, ["k"], {"s": "v"})
    assert dict(out.dtypes)["k"] == "int"
    view.unionByName(out)  # strict round-trip


def test_minhash_banding_validation():
    """bands must divide num_hashes: bands > num_hashes degenerates to
    all-docs-collide (rows_per_band 0), a non-divisor silently drops
    hashes (r08 review)."""
    from kf_task_fhir_etl_spark.operators import dedup

    with pytest.raises(ValueError, match="divisor"):
        dedup._validate_banding(8, 16)
    with pytest.raises(ValueError, match="divisor"):
        dedup._validate_banding(8, 3)
    with pytest.raises(ValueError, match="divisor"):
        dedup._validate_banding(8, 0)
    dedup._validate_banding(8, 4)  # ok


def test_minhash_index_and_candidates_reject_bad_banding(spark):
    from kf_task_fhir_etl_spark.operators import dedup

    docs = spark.createDataFrame([(1, "some text here")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="divisor"):
        dedup.minhash_index(docs, bands=16)
    with pytest.raises(ValueError, match="divisor"):
        dedup.minhash_lsh_candidates(docs, num_hashes=8, bands=3)


def test_bfs_max_depth_raise_releases_everything(spark):
    """The guard raise must not pin any round (r08 review, second pass —
    the release-before-raise discipline): nothing was served, so the
    BlockManager set returns to its pre-call state."""
    jsc = spark.sparkContext._jsc.sc()
    before = {info.id() for info in jsc.getRDDStorageInfo()}
    edges = _edges(spark, [(i, i + 1) for i in range(10)])
    sources = spark.createDataFrame([(0,)], "node bigint")
    with pytest.raises(RuntimeError, match="max_depth"):
        graph.bfs_distances(edges, sources, max_depth=3)
    after = {info.id() for info in jsc.getRDDStorageInfo()}
    assert after <= before


def test_incremental_dedup_stages_candidates_for_release(spark):
    """The candidate frame has three consumers — with handles_out it is
    checkpointed once and the caller's release frees it for real (r08
    review, second pass)."""
    from kf_task_fhir_etl_spark import etl
    from kf_task_fhir_etl_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),
         (11, "some new unrelated words appear in this one")],
        "doc_id bigint, text string",
    )
    index = dedup.minhash_index(corpus)
    handles = []
    out = dedup.incremental_dedup(batch, index, corpus, handles_out=handles)
    got = {r["doc_id"] for r in out.collect()}
    assert got == {11}
    assert len(handles) == 2  # staged new_docs + staged candidates
    etl.release_checkpoints(handles)
    with pytest.raises(Exception):
        handles[1].count()  # truncated lineage — release was real


def test_hashed_tokens_single_definition():
    """verify_jaccard_pairs and incremental_dedup share ONE tokenization
    convention (r08 review, second pass): the helper exists and the old
    inline copies are gone."""
    import inspect

    from kf_task_fhir_etl_spark.operators import dedup

    src_verify = inspect.getsource(dedup.verify_jaccard_pairs)
    src_incr = inspect.getsource(dedup.incremental_dedup)
    assert "_hashed_tokens" in src_verify and "_hashed_tokens" in src_incr
    assert "word_tokens" not in src_verify and "word_tokens" not in src_incr


def test_pattern_spans_and_bfs_drop_null_keys(spark):
    """NULL user events and NULL source nodes are excluded at intake
    (r08 review, third pass): SQL join semantics are the contract — no
    phantom NULL-keyed outputs."""
    ev = spark.createDataFrame(
        [(None, "A", datetime(2024, 1, 1)), (None, "B", datetime(2024, 1, 1, 0, 1)),
         (1, "A", datetime(2024, 1, 1)), (1, "B", datetime(2024, 1, 1, 0, 1))],
        "user_id bigint, event_type string, ts timestamp",
    )
    got = patterns.pattern_spans(ev, "A", "B").collect()
    assert [r["user_id"] for r in got] == [1]
    edges = _edges(spark, [(1, 2)])
    sources = spark.createDataFrame([(1,), (None,)], "node bigint")
    nodes = {r["node"] for r in graph.bfs_distances(edges, sources).collect()}
    assert nodes == {1, 2}


def test_ivm_key_guard_message_handles_absent_key(spark):
    """A key present on only one side reports ABSENT loudly instead of
    crashing while formatting the error (r08 review, third pass)."""
    view = spark.createDataFrame([("a", 1, 2.0)], "c_custkey string, n bigint, s double")
    delta = spark.createDataFrame([("a", 1.0, 1)], "custkey string, v double, op int")
    with pytest.raises(ValueError, match="ABSENT"):
        apply_agg_delta(view, delta, ["custkey"], {"s": "v"})


def test_incremental_dedup_param_mismatch_is_loud(spark):
    """Probing an index with different LSH parameters must raise, not
    silently find zero candidates and wave every near-dup through (r08
    review, sixth pass)."""
    from kf_task_fhir_etl_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id bigint, text string"
    )
    index = dedup.minhash_index(corpus, num_hashes=8, bands=4)
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="params"):
        dedup.incremental_dedup(batch, index, corpus, bands=2)
    with pytest.raises(ValueError, match="params"):
        dedup.incremental_dedup(batch, index, corpus, shingle_size=4)
    # an index frame WITHOUT the metadata column is rejected too
    with pytest.raises(ValueError, match="metadata"):
        dedup.incremental_dedup(batch, index.drop("params"), corpus)
    # matching params still screen correctly
    out = dedup.incremental_dedup(batch, index, corpus)
    assert out.count() == 0


def test_ivm_lossy_measure_cast_raises(spark):
    """A delta measure that cannot up-cast losslessly into the view's
    sum column must raise up front — the silent alternative truncated
    the merged value while the count advanced (r08 review, seventh
    pass). A non-integral count column is rejected too."""
    view = spark.createDataFrame([("a", 1, 10)], "k string, n bigint, s int")
    delta = spark.createDataFrame([("a", 0.5, 1)], "k string, v double, op int")
    with pytest.raises(ValueError, match="up-cast"):
        apply_agg_delta(view, delta, ["k"], {"s": "v"})
    # int measure into bigint view column is lossless and fine
    view2 = spark.createDataFrame([("a", 1, 10)], "k string, n bigint, s bigint")
    delta2 = spark.createDataFrame([("a", 5, 1)], "k string, v int, op int")
    out = apply_agg_delta(view2, delta2, ["k"], {"s": "v"})
    assert {(r["k"], r["n"], r["s"]) for r in out.collect()} == {("a", 2, 15)}
    bad_count = spark.createDataFrame([("a", 1.0, 10)], "k string, n double, s bigint")
    with pytest.raises(ValueError, match="integral"):
        apply_agg_delta(bad_count, delta2, ["k"], {"s": "v"})


def test_incremental_dedup_mixed_params_index_rejected(spark):
    """An append-only index where one segment was built with different
    parameters must be rejected whole — a single-row probe would pass on
    whichever segment it sampled while the mismatched segment silently
    contributed zero candidates (r08 review, seventh pass)."""
    from kf_task_fhir_etl_spark.operators import dedup

    c1 = spark.createDataFrame([(1, "alpha beta gamma delta")], "doc_id bigint, text string")
    c2 = spark.createDataFrame([(2, "epsilon zeta eta theta")], "doc_id bigint, text string")
    mixed = dedup.minhash_index(c1, bands=4).unionByName(dedup.minhash_index(c2, bands=2))
    batch = spark.createDataFrame([(10, "alpha beta gamma delta")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="params"):
        dedup.incremental_dedup(batch, mixed, c1.unionByName(c2), bands=4)


def test_ivm_lossless_integral_measures_accepted(spark):
    """int measure → double view sum and bigint measure → decimal(19,0)
    view sum are LOSSLESS and must pass the validator (r08 review,
    eighth pass: both were spuriously rejected)."""
    view = spark.createDataFrame([("a", 1, 2.0)], "k string, n bigint, s double")
    delta = spark.createDataFrame([("a", 5, 1)], "k string, v int, op int")
    out = apply_agg_delta(view, delta, ["k"], {"s": "v"})
    assert {(r["k"], r["n"], r["s"]) for r in out.collect()} == {("a", 2, 7.0)}
    view2 = spark.createDataFrame(
        [("a", 1, Decimal(10))], "k string, n bigint, s decimal(19,0)"
    )
    delta2 = spark.createDataFrame([("a", 2**62, 1)], "k string, v bigint, op int")
    out2 = apply_agg_delta(view2, delta2, ["k"], {"s": "v"})
    assert {r["s"] for r in out2.collect()} == {Decimal(10 + 2**62)}
    # long → double stays rejected (lossy above 2^53)
    delta3 = spark.createDataFrame([("a", 5, 1)], "k string, v bigint, op int")
    with pytest.raises(ValueError, match="up-cast"):
        apply_agg_delta(view, delta3, ["k"], {"s": "v"})


def test_ivm_scale0_decimal_measure_accepted(spark):
    """decimal(p<=18, 0) measures up-cast losslessly into a bigint view
    sum (r08 review, tenth pass — warehouse integer quantities arrive as
    scale-0 decimals and were spuriously rejected)."""
    view = spark.createDataFrame([("a", 1, 10)], "k string, n bigint, s bigint")
    delta = spark.createDataFrame(
        [("a", Decimal(7), 1)], "k string, v decimal(10,0), op int"
    )
    out = apply_agg_delta(view, delta, ["k"], {"s": "v"})
    assert {(r["k"], r["n"], r["s"]) for r in out.collect()} == {("a", 2, 17)}
    # decimal(19,0) can exceed bigint — still rejected
    wide = spark.createDataFrame(
        [("a", Decimal(7), 1)], "k string, v decimal(19,0), op int"
    )
    with pytest.raises(ValueError, match="up-cast"):
        apply_agg_delta(view, wide, ["k"], {"s": "v"})


def test_incremental_dedup_index_corpus_desync_is_loud(spark):
    """A candidate whose indexed doc is missing from the corpus frame
    must raise — it previously vanished in the verify joins and the
    duplicate silently survived (r08 review, eleventh pass)."""
    from kf_task_fhir_etl_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id bigint, text string"
    )
    extra = spark.createDataFrame(
        [(10, "iota kappa lambda mu nu xi omicron")], "doc_id bigint, text string"
    )
    # index extended, corpus NOT — the trap
    index = dedup.minhash_index(corpus).unionByName(dedup.minhash_index(extra))
    batch = spark.createDataFrame(
        [(20, "iota kappa lambda mu nu xi omicron")], "doc_id bigint, text string"
    )
    # the assertion rides the verify join: loud at ACTION time (an
    # executor-raised assert_true — zero extra jobs at construction)
    with pytest.raises(Exception, match="out of sync"):
        dedup.incremental_dedup(batch, index, corpus).collect()
    # lockstep extension works and catches the duplicate
    out = dedup.incremental_dedup(batch, index, corpus.unionByName(extra))
    assert out.count() == 0


def test_incremental_dedup_check_coverage_flags_unindexed_corpus(spark):
    """Opt-in reverse lockstep check: a corpus doc missing from the index
    (corpus extended, index forgotten) is invisible to the screen — with
    check_coverage=True it raises; off by default because screening
    against a deliberate index subset is legitimate (r08 review, twelfth
    pass)."""
    from kf_task_fhir_etl_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "iota kappa lambda mu nu xi omicron")],
        "doc_id bigint, text string",
    )
    index = dedup.minhash_index(corpus.filter("doc_id = 1"))  # doc 2 unindexed
    batch = spark.createDataFrame(
        [(20, "iota kappa lambda mu nu xi omicron")], "doc_id bigint, text string"
    )
    # default: doc 20 (dup of unindexed 2) silently survives — documented
    assert dedup.incremental_dedup(batch, index, corpus).count() == 1
    with pytest.raises(ValueError, match="not in the index"):
        dedup.incremental_dedup(batch, index, corpus, check_coverage=True)


def test_k_core_guard_accepts_terminal_empty_round(spark):
    """A graph that peels EMPTY in exactly max_rounds+1 productive rounds
    terminates with the (known, empty) answer instead of a spurious
    'still peeling' raise (r08 review, thirteenth pass)."""
    path = [(i, i + 1) for i in range(1, 7)]  # 1-2-3-4-5-6-7 peels empty in 3
    got = graph.k_core(_edges(spark, path), k=2, max_rounds=2).collect()
    assert got == []


def test_ivm_scale0_decimal_into_double_accepted(spark):
    """decimal(p<=15,0) is exact in double — accepted; decimal(16,0) is
    not — rejected (r08 review, fifteenth pass)."""
    view = spark.createDataFrame([("a", 1, 2.0)], "k string, n bigint, s double")
    ok = spark.createDataFrame([("a", Decimal(3), 1)], "k string, v decimal(10,0), op int")
    out = apply_agg_delta(view, ok, ["k"], {"s": "v"})
    assert {(r["k"], r["s"]) for r in out.collect()} == {("a", 5.0)}
    wide = spark.createDataFrame([("a", Decimal(3), 1)], "k string, v decimal(16,0), op int")
    with pytest.raises(ValueError, match="up-cast"):
        apply_agg_delta(view, wide, ["k"], {"s": "v"})


def test_verify_jaccard_broadcast_kernel_tolerates_null_text(spark):
    """The opt-in broadcast kernel must not crash on a NULL-text doc —
    it maps to the empty token set (Jaccard 0, excluded at any positive
    threshold, matching the relational path's drop) instead of
    frozenset(None) (r08 review, fifteenth pass)."""
    from kf_task_fhir_etl_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, None)],
        "doc_id bigint, text string",
    )
    cands = spark.createDataFrame([(1, 2), (1, 3)], "id_a bigint, id_b bigint")
    out = dedup.verify_jaccard_pairs(docs, cands, threshold=0.5, small_corpus=True)
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {(1, 2)}


def test_incremental_dedup_null_text_docs_are_invisible(spark):
    """NULL-text docs have no shingles: un-indexable in the corpus,
    candidate-less in the batch — no hot md5('') bucket, no spurious
    desync assert, batch NULL-text docs always survive (r08 review,
    sixteenth pass)."""
    from kf_task_fhir_etl_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None)], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta"), (11, None)], "doc_id bigint, text string"
    )
    index = dedup.minhash_index(corpus)
    # doc 2's NULL text is not indexed at all
    assert index.filter("id = 2").count() == 0
    out = {r["doc_id"] for r in dedup.incremental_dedup(batch, index, corpus).collect()}
    assert out == {11}  # dup 10 screened; NULL-text 11 survives, no assert fired


def test_funnel_with_negation_empty_denies_stages_nothing(spark):
    """With every deny set empty the trajectory has one consumer — no
    extra handle may be pinned for it (r08 review, sixteenth pass)."""
    ev = _ev(spark, [(1, "A", 0), (1, "B", 5)])
    handles = []
    patterns.funnel_with_negation(ev, ["A", "B"], denies=[[]], handles_out=handles).collect()
    # only funnel_trajectories' own per-step frames (here: the step-1
    # completion frame) — no traj handle on top
    assert len(handles) == 1


def test_check_coverage_ignores_unindexable_docs(spark):
    """check_coverage must not flag NULL-text corpus docs — they can
    never be indexed, so a lockstep index was reported as desynced (r08
    review, seventeenth pass)."""
    from kf_task_fhir_etl_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None)], "doc_id bigint, text string"
    )
    index = dedup.minhash_index(corpus)
    batch = spark.createDataFrame(
        [(10, "unrelated words entirely here")], "doc_id bigint, text string"
    )
    out = dedup.incremental_dedup(batch, index, corpus, check_coverage=True)
    assert out.count() == 1  # no spurious raise; non-dup batch doc survives
