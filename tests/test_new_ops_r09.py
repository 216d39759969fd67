"""Round-9 operator tests: the incremental_dedup params-validation memo
(VERDICT r08 #7), the k_core handles_out release handle (r08 ADVICE),
weighted SSSP, join-view IVM, streaming pattern spans (VERDICT r08
#4-#6), and the round's extensions — distinct-count/minmax/top-k IVM,
the streaming funnel, the streaming top-k leaderboard, personalized
PageRank, and the IVM-family broadcast-probe plan asserts."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark import etl
from kf_task_fhir_etl_spark.operators import dedup, graph


# ---------------------------------------------------------------------------
# incremental_dedup params-validation memo (VERDICT r08 #7)
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


_CORPUS_ROWS = [(i, f"alpha beta gamma delta {i}") for i in range(20)]
_BATCH_ROWS = [(100, "alpha beta gamma delta 3"), (101, "totally different words here now")]


def _collect_spy(spark, monkeypatch):
    """Count DataFrame.collect calls — incremental_dedup's construction
    path is lazy except the params validation (and the opt-in coverage
    join), so the count isolates exactly the validation reads. Patches
    the CONCRETE class (Spark 4's classic DataFrame overrides collect;
    patching the pyspark.sql.DataFrame base would miss it)."""
    calls = []
    cls = type(spark.range(1))
    orig = cls.collect

    def spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(cls, "collect", spy)
    return calls


def test_params_validation_memoized_for_checkpointed_index(spark, monkeypatch):
    """The SECOND probe of the same prepared (checkpointed) index frame
    must skip the limit(1) params read entirely — the resident-driver
    steady state VERDICT r08 #7 asked for."""
    corpus = _docs(spark, _CORPUS_ROWS)
    index = dedup.minhash_index(corpus).localCheckpoint()
    batch = _docs(spark, _BATCH_ROWS)
    calls = _collect_spy(spark, monkeypatch)
    dedup.incremental_dedup(batch, index, corpus)  # plan construction only
    first_probe = len(calls)
    assert first_probe == 1  # exactly the params validation read
    dedup.incremental_dedup(batch, index, corpus)
    assert len(calls) == first_probe  # memo hit: zero new eager reads
    etl.release_checkpoints([index])


def test_params_validation_not_memoized_for_lazy_index(spark, monkeypatch):
    """A LAZY index could gain a mismatched appended segment between
    probes — its verdict must never be cached (the memo's documented
    gate), so each probe re-runs the one validation read."""
    corpus = _docs(spark, _CORPUS_ROWS)
    index = dedup.minhash_index(corpus)  # lazy: no checkpoint
    batch = _docs(spark, _BATCH_ROWS)
    calls = _collect_spy(spark, monkeypatch)
    dedup.incremental_dedup(batch, index, corpus)
    dedup.incremental_dedup(batch, index, corpus)
    assert len(calls) == 2  # one validation read per probe, no caching


def test_params_memo_is_per_params_not_per_frame(spark):
    """A memoized pass for one params tag must NOT vouch for different
    probe params against the same frame: the mismatch still raises."""
    corpus = _docs(spark, _CORPUS_ROWS)
    index = dedup.minhash_index(corpus).localCheckpoint()
    batch = _docs(spark, _BATCH_ROWS)
    dedup.incremental_dedup(batch, index, corpus)  # validates h8.b4 params
    with pytest.raises(ValueError, match="probe LSH params"):
        dedup.incremental_dedup(batch, index, corpus, num_hashes=16, bands=8)
    etl.release_checkpoints([index])


def test_memoized_probe_results_unchanged(spark):
    """Memo on/off must be invisible to results: the second (memo-hit)
    probe returns exactly the first probe's survivors."""
    corpus = _docs(spark, _CORPUS_ROWS)
    index = dedup.minhash_index(corpus).localCheckpoint()
    batch = _docs(spark, _BATCH_ROWS)
    r1 = sorted(r["doc_id"] for r in dedup.incremental_dedup(batch, index, corpus).collect())
    r2 = sorted(r["doc_id"] for r in dedup.incremental_dedup(batch, index, corpus).collect())
    assert r1 == r2
    assert 101 in r1  # the genuinely-new doc always survives
    assert 100 not in r1  # the near-dup of corpus doc 3 is screened
    etl.release_checkpoints([index])


# ---------------------------------------------------------------------------
# k_core handles_out (r08 ADVICE)
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_k_core_handles_out_releases_final_checkpoint(spark):
    """k_core's returned frame aggregates over the final round's edge
    checkpoint; handles_out must hand that checkpoint back so the caller
    can release it AFTER materializing the result (r08 ADVICE — the
    funnel_counts contract). Releasing before reading would fail; the
    correct order works and frees the blocks for real."""
    # 4-clique (core) + a pendant chain that peels away
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11)]
    e = _edges(spark, clique + chain)
    handles: list[DataFrame] = []
    core = graph.k_core(e, k=3, handles_out=handles)
    assert len(handles) == 1
    got = {r["node"]: r["deg"] for r in core.collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    etl.release_checkpoints(handles)
    with pytest.raises(Exception):
        handles[0].count()  # blocks gone, truncated lineage → loud failure


# ---------------------------------------------------------------------------
# Join-view IVM (VERDICT r08 #5)
# ---------------------------------------------------------------------------


def _ivm_frames(spark):
    """R(k, pri), S(k, qty) with duplicates and NULL keys on both sides."""
    r = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (3, "b"), (None, "x")], "k int, pri string"
    )
    s = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5), (3, 7), (None, 99)], "k int, qty int"
    )
    return r, s


def _recompute(r_new, s_new):
    return (
        r_new.join(s_new, ["k"])
        .groupBy("pri")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qty").cast("int").alias("sum_qty"))
    )


def _rows(df):
    return sorted((r["pri"], r["n"], r["sum_qty"]) for r in df.collect())


def test_join_view_delta_both_sides_matches_recompute(spark):
    """The full contract: inserts AND deletes on BOTH sides — including a
    matching (r_del, s_del) pair whose double-deletion the ΔR⋈ΔS term
    must compensate — maintained view ≡ from-scratch over the new states."""
    from kf_task_fhir_etl_spark.operators import ivm

    r_old, s_old = _ivm_frames(spark)
    view = _recompute(r_old, s_old)
    # ΔR: insert (4,'b'), delete one (3,'b') copy; ΔS: insert (4,30),
    # delete (3,7) — the (3,'b')×(3,7) pair leaves both sides at once
    delta_r = spark.createDataFrame(
        [(4, "b", 1), (3, "b", -1)], "k int, pri string, op int"
    )
    delta_s = spark.createDataFrame([(4, 30, 1), (3, 7, -1)], "k int, qty int, op int")
    got = ivm.apply_join_view_delta(
        view, r_old, s_old, delta_r, delta_s, on=["k"], keys=["pri"],
        sum_cols={"sum_qty": "qty"},
    )
    r_new = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (None, "x"), (4, "b")], "k int, pri string"
    )
    s_new = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5), (None, 99), (4, 30)], "k int, qty int"
    )
    assert _rows(got) == _rows(_recompute(r_new, s_new))
    assert dict(got.dtypes) == dict(view.dtypes)  # schema preservation inherited


def test_join_view_delta_one_sided_and_group_vanish(spark):
    """One-sided changelog; a group whose every joined row is deleted
    VANISHES (zero-count removal through the join algebra)."""
    from kf_task_fhir_etl_spark.operators import ivm

    r_old, s_old = _ivm_frames(spark)
    view = _recompute(r_old, s_old)
    # delete BOTH (3,'b') copies from R: group 'b' loses its only joined
    # rows (2 copies × s(3,7)) and must vanish
    delta_r = spark.createDataFrame(
        [(3, "b", -1), (3, "b", -1)], "k int, pri string, op int"
    )
    got = ivm.apply_join_view_delta(
        view, r_old, s_old, delta_r, None, on=["k"], keys=["pri"],
        sum_cols={"sum_qty": "qty"},
    )
    r_new = spark.createDataFrame([(1, "a"), (2, "a"), (None, "x")], "k int, pri string")
    assert _rows(got) == _rows(_recompute(r_new, s_old))
    assert not [r for r in got.collect() if r["pri"] == "b"]


def test_join_delta_validation(spark):
    from kf_task_fhir_etl_spark.operators import ivm

    r_old, s_old = _ivm_frames(spark)
    with pytest.raises(ValueError, match="both deltas are None"):
        ivm.join_delta(r_old, s_old, None, None, on=["k"])
    bad_schema = spark.createDataFrame([(1, 1)], "k int, op int")  # lacks pri
    with pytest.raises(ValueError, match="columns"):
        ivm.join_delta(r_old, s_old, bad_schema, None, on=["k"])
    wide_key = spark.createDataFrame([(1, "a", 1)], "k bigint, pri string, op int")
    with pytest.raises(ValueError, match="dtypes drift"):
        ivm.join_delta(r_old, s_old, wide_key, None, on=["k"])
    clash = s_old.withColumnRenamed("qty", "pri")
    with pytest.raises(ValueError, match="both sides"):
        ivm.join_delta(r_old, clash, None, clash.withColumn("op", F.lit(1)), on=["k"])


# ---------------------------------------------------------------------------
# Weighted SSSP (VERDICT r08 #4)
# ---------------------------------------------------------------------------


def _brute_sssp(edges, sources, directed=False):
    """Driver-side Bellman-Ford over (s, t, w) tuples — the independent
    method the randomized parity check compares against."""
    adj = list(edges) + ([] if directed else [(t, s, w) for s, t, w in edges])
    dist = {s: 0 for s in sources}
    for _ in range(len({n for e in adj for n in e[:2]} | set(sources)) + 1):
        changed = False
        for s, t, w in adj:
            if s == t or s is None or t is None or w is None:
                continue
            if s in dist and dist[s] + w < dist.get(t, float("inf")):
                dist[t] = dist[s] + w
                changed = True
        if not changed:
            break
    return dist


def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src bigint, dst bigint, w bigint")


def _srcs(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node bigint")


def test_sssp_prefers_light_multi_hop_path(spark):
    """The defining weighted case: a heavy direct edge loses to a light
    two-hop path — hop-BFS would say dist(2) = 1, SSSP must say 2."""
    e = _wedges(spark, [(0, 2, 10), (0, 1, 1), (1, 2, 1)])
    got = {r["node"]: r["dist"] for r in graph.sssp_distances(e, _srcs(spark, [0])).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_sssp_multi_source_and_unreachable(spark):
    """Nearest-source semantics + unreachable nodes absent + an isolated
    source reports 0 (the bfs_distances conventions)."""
    e = _wedges(spark, [(0, 1, 5), (1, 2, 5), (10, 11, 1)])
    got = {
        r["node"]: r["dist"]
        for r in graph.sssp_distances(e, _srcs(spark, [0, 2, 99])).collect()
    }
    # node 1 is 5 from either source; 10/11 unreachable; 99 isolated source
    assert got == {0: 0, 2: 0, 1: 5, 99: 0}


def test_sssp_directed_vs_undirected(spark):
    e = _wedges(spark, [(0, 1, 3), (2, 1, 4)])
    d = {r["node"]: r["dist"] for r in graph.sssp_distances(e, _srcs(spark, [0]), directed=True).collect()}
    assert d == {0: 0, 1: 3}  # 1→2 edge is 2→1 only; 2 unreachable
    u = {r["node"]: r["dist"] for r in graph.sssp_distances(e, _srcs(spark, [0])).collect()}
    assert u == {0: 0, 1: 3, 2: 7}


def test_sssp_parallel_edges_and_nulls(spark):
    """Parallel edges collapse to the min weight; NULL endpoints/weights
    and self-loops are dropped, never phantom nodes."""
    rows = [(0, 1, 9), (0, 1, 2), (1, 1, 1), (None, 1, 1), (1, None, 1), (1, 2, None)]
    e = spark.createDataFrame(rows, "src bigint, dst bigint, w bigint")
    got = {r["node"]: r["dist"] for r in graph.sssp_distances(e, _srcs(spark, [0])).collect()}
    assert got == {0: 0, 1: 2}


def test_sssp_randomized_brute_force_parity(spark):
    """Random sparse graphs, integer weights — distances must equal the
    driver-side Bellman-Ford exactly (both directed and undirected)."""
    import random

    rng = random.Random(909)
    for directed in (False, True):
        for trial in range(3):
            n = rng.randint(6, 14)
            m = rng.randint(n, 3 * n)
            edges = [
                (rng.randrange(n), rng.randrange(n), rng.randint(1, 9))
                for _ in range(m)
            ]
            sources = sorted(rng.sample(range(n), rng.randint(1, 2)))
            want = _brute_sssp(edges, sources, directed)
            got = {
                r["node"]: r["dist"]
                for r in graph.sssp_distances(
                    _wedges(spark, edges), _srcs(spark, sources), directed=directed
                ).collect()
            }
            assert got == want, (directed, trial, edges, sources)


def test_sssp_max_rounds_guard(spark):
    """A path graph needing more productive rounds than the guard raises
    loudly; exactly-at-the-bound gets its free fixpoint confirmation."""
    chain = [(i, i + 1, 1) for i in range(6)]
    e = _wedges(spark, chain)
    with pytest.raises(RuntimeError, match="max_rounds"):
        graph.sssp_distances(e, _srcs(spark, [0]), max_rounds=3, directed=True)
    ok = graph.sssp_distances(e, _srcs(spark, [0]), max_rounds=6, directed=True)
    assert ok.count() == 7  # eccentricity exactly 6: no spurious raise


def test_sssp_double_weights(spark):
    e = spark.createDataFrame(
        [(0, 1, 0.5), (1, 2, 0.25), (0, 2, 1.0)], "src bigint, dst bigint, w double"
    )
    got = {r["node"]: r["dist"] for r in graph.sssp_distances(e, _srcs(spark, [0])).collect()}
    assert got == {0: 0.0, 1: 0.5, 2: 0.75}


def test_k_core_without_handles_matches(spark):
    """handles_out=None keeps the r08 behavior (GC-reclaimed lifetime) and
    identical results."""
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = _edges(spark, clique + [(0, 20)])
    with_h: list[DataFrame] = []
    a = {(r["node"], r["deg"]) for r in graph.k_core(e, 2, handles_out=with_h).collect()}
    b = {(r["node"], r["deg"]) for r in graph.k_core(e, 2).collect()}
    assert a == b and len(a) == 4
    etl.release_checkpoints(with_h)


# ---------------------------------------------------------------------------
# streaming pattern spans (VERDICT r08 #6 — streaming/patterns.py)
# ---------------------------------------------------------------------------


def _span_events(spark, rows):
    """rows: (user, µs, type) — µs as integers so tie semantics are exact."""
    return spark.createDataFrame(
        rows, "user_id bigint, us bigint, event_type string"
    ).select("user_id", F.timestamp_micros("us").alias("ts"), "event_type")


def _run_spans_stream(spark, tmp_path, batches, name, deny=("N",)):
    """Write one parquet dir per microbatch (write order = mtime order =
    batch order under maxFilesPerTrigger=1), run the stateful stream to a
    memory sink, return the emitted spans as a SORTED LIST (duplicates
    matter — the operator emits one row per matching target event)."""
    from kf_task_fhir_etl_spark.streaming import patterns as spat

    src = str(tmp_path / f"{name}_src")
    schema = None
    for i, rows in enumerate(batches, 1):
        df = _span_events(spark, rows)
        schema = df.schema
        df.coalesce(1).write.parquet(f"{src}/b{i}.parquet")
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(f"{src}/*.parquet")
    )
    spans = spat.streaming_pattern_spans(raw, "A", "B", list(deny))
    q = (
        spans.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return sorted(tuple(r) for r in spark.table(name).collect())


def test_streaming_spans_cross_batch_state(spark, tmp_path):
    """Spans and vetoes that straddle microbatch boundaries must resolve
    from the carried per-user state: anchor in batch 1 + target in batch 2
    matches; a deny on either side of the boundary voids iff it sits
    strictly inside the open interval."""
    b1 = [
        (1, 100, "A"),                      # → matches the batch-2 B
        (2, 100, "A"), (2, 150, "N"),       # deny inside, carried → voided
        (3, 50, "N"), (3, 100, "A"),        # deny BEFORE anchor → harmless
        (4, 100, "A"),                      # deny arrives in batch 2
    ]
    b2 = [
        (1, 200, "B"),
        (2, 200, "B"),
        (3, 200, "B"),
        (4, 150, "N"), (4, 200, "B"),
    ]
    got = _run_spans_stream(spark, tmp_path, [b1, b2], "spans_xbatch")
    assert got == [(1, 100, 200), (3, 100, 200)]


def test_streaming_spans_strict_tie_semantics(spark, tmp_path):
    """Same-µs ties follow the batch SET rule on BOTH sides of a batch
    boundary: an anchor at the target's exact µs is never 'before' it
    (in-batch via searchsorted, cross-batch via the guarded state seed);
    a deny tied to the start or end µs never voids (open interval)."""
    b1 = [
        (1, 100, "A"), (1, 100, "B"),        # in-batch tie → no span
        (2, 100, "A"),                        # cross-batch tie with b2's B
        (3, 100, "A"),
        (4, 100, "A"), (4, 100, "N"),        # deny tied to start → harmless
    ]
    b2 = [
        (2, 100, "B"),                        # → no span (anchor not < target)
        (3, 200, "N"), (3, 200, "B"),        # deny tied to end → harmless
        (4, 200, "B"),
        (5, 300, "A"), (5, 400, "B"), (5, 400, "B"),  # two targets, one µs
    ]
    got = _run_spans_stream(spark, tmp_path, [b1, b2], "spans_ties")
    assert got == [(3, 100, 200), (4, 100, 200), (5, 300, 400), (5, 300, 400)]


def test_streaming_spans_match_batch_operator_randomized(spark, tmp_path):
    """Stream ≡ batch on a randomized event log with heavy µs collisions:
    the union of the time-split microbatches fed to the stateful matcher
    must reproduce operators/patterns.py::pattern_spans row-for-row
    (duplicates included)."""
    import random

    from kf_task_fhir_etl_spark.operators import patterns as bpat

    rng = random.Random(945)
    rows = [
        (rng.randrange(12), rng.randrange(60), rng.choice(["A", "B", "N", "C"]))
        for _ in range(400)
    ]
    # value-based split (same-µs rows co-batch) = the ordering contract
    batches = [
        [r for r in rows if r[1] <= 20],
        [r for r in rows if 20 < r[1] <= 40],
        [r for r in rows if r[1] > 40],
    ]
    got = _run_spans_stream(spark, tmp_path, batches, "spans_rand")
    want = sorted(
        tuple(r)
        for r in bpat.pattern_spans(_span_events(spark, rows), "A", "B", ["N"]).collect()
    )
    assert got == want


def test_time_split_reader_files_are_ordered_and_complete(spark):
    """The staged time-split layout: one file per split, mtimes ascending
    in event-time order, non-null ts ranges DISJOINT across files (so
    same-µs rows can never straddle a microbatch), union exact."""
    import os

    from kf_task_fhir_etl_spark.catalog import load_table
    from kf_task_fhir_etl_spark.streaming.events import read_events_stream_time_split
    from .conftest import SF_SMOKE

    read_events_stream_time_split(spark, SF_SMOKE, n_splits=3)  # ensures staging
    from kf_task_fhir_etl_spark.catalog import staged_base

    stage = staged_base("tsplit3_stream", SF_SMOKE, ["events"])
    files = sorted(
        (f for f in os.listdir(stage) if f.endswith(".parquet")),
        key=lambda f: os.path.getmtime(os.path.join(stage, f)),
    )
    assert len(files) == 3
    total = 0
    prev_hi = None
    for f in files:
        part = spark.read.parquet(os.path.join(stage, f))
        total += part.count()
        rng = part.agg(
            F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
        ).collect()[0]
        if prev_hi is not None and rng["lo"] is not None:
            assert rng["lo"] > prev_hi, "splits overlap or tie across files"
        prev_hi = rng["hi"] if rng["hi"] is not None else prev_hi
    assert total == load_table(spark, SF_SMOKE, "events").count()


# ---------------------------------------------------------------------------
# distinct-count IVM (operators/ivm.py::apply_distinct_count_delta)
# ---------------------------------------------------------------------------


def _dc_base(spark, rows):
    return spark.createDataFrame(rows, "g string, v bigint")


def _dc_bootstrap(spark, rows):
    from kf_task_fhir_etl_spark.operators import ivm

    base = _dc_base(spark, rows)
    view = (
        base.filter(F.col("v").isNotNull())
        .groupBy("g")
        .agg(F.count_distinct("v").alias("n_distinct"))
    )
    support = ivm.distinct_count_support(base, ["g"], "v")
    return base, view, support


def _dc_apply(spark, rows, inserts, deletes):
    from kf_task_fhir_etl_spark.operators import ivm

    _, view, support = _dc_bootstrap(spark, rows)
    delta = spark.createDataFrame(
        [(g, v, 1) for g, v in inserts] + [(g, v, -1) for g, v in deletes],
        "g string, v bigint, op int",
    )
    return ivm.apply_distinct_count_delta(view, support, delta, ["g"], "v")


def test_distinct_count_delta_matches_recompute(spark):
    """The whole contract: incremental ≡ from-scratch recompute over the
    post-changelog rows — multiplicity decrements that keep the value,
    last-copy deletes that remove it, inserts of known and novel values,
    and a brand-new group, all in one changelog."""
    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 7), ("b", 8), ("c", 9)]
    inserts = [("a", 3), ("d", 99)]          # known group new value; NEW group
    deletes = [("a", 1), ("b", 8), ("c", 9)]  # decrement / remove / vanish group
    new_view, new_support = _dc_apply(spark, rows, inserts, deletes)
    post = [r for r in rows if r not in []]  # base rows
    post = list(rows)
    for d in deletes:
        post.remove(d)
    post += inserts
    want = {
        (r["g"], r["n_distinct"])
        for r in _dc_base(spark, post)
        .filter(F.col("v").isNotNull())
        .groupBy("g")
        .agg(F.count_distinct("v").alias("n_distinct"))
        .collect()
    }
    got = {(r["g"], r["n_distinct"]) for r in new_view.collect()}
    assert got == want == {("a", 3), ("b", 1), ("d", 1)}  # c vanished
    # the maintained support equals a from-scratch support build
    from kf_task_fhir_etl_spark.operators import ivm

    want_sup = {
        (r["g"], r["v"], r["m"])
        for r in ivm.distinct_count_support(_dc_base(spark, post), ["g"], "v").collect()
    }
    assert {(r["g"], r["v"], r["m"]) for r in new_support.collect()} == want_sup


def test_distinct_count_delta_null_values_are_noops_and_null_keys_merge(spark):
    """NULL-valued changelog rows are no-ops (COUNT(DISTINCT) ignores
    NULL); a NULL-keyed group maintains null-safely as ONE group."""
    rows = [(None, 1), (None, 2), ("a", 1)]
    inserts = [(None, 3), ("a", None)]   # null KEY is real; null VALUE is a no-op
    deletes = [(None, 2)]
    new_view, new_support = _dc_apply(spark, rows, inserts, deletes)
    got = {(r["g"], r["n_distinct"]) for r in new_view.collect()}
    assert got == {(None, 2), ("a", 1)}  # {1,3} under NULL key; 'a' untouched
    sup = {(r["g"], r["v"], r["m"]) for r in new_support.collect()}
    assert sup == {(None, 1, 1), (None, 3, 1), ("a", 1, 1)}


def test_distinct_count_delta_malformed_log_stays_loud(spark):
    """A delete with no matching insert leaves a NEGATIVE multiplicity row
    (never silently dropped) and the value still counts as present until
    compensated — the apply_agg_delta loudness convention."""
    rows = [("a", 1)]
    new_view, new_support = _dc_apply(spark, rows, [], [("a", 2), ("a", 2)])
    sup = {(r["g"], r["v"], r["m"]) for r in new_support.collect()}
    assert sup == {("a", 1, 1), ("a", 2, -2)}
    assert {(r["g"], r["n_distinct"]) for r in new_view.collect()} == {("a", 2)}


def test_distinct_count_delta_validation(spark):
    from kf_task_fhir_etl_spark.operators import ivm

    _, view, support = _dc_bootstrap(spark, [("a", 1)])
    ok_delta = spark.createDataFrame([("a", 2, 1)], "g string, v bigint, op int")
    # wrong value dtype in the delta
    bad_val = spark.createDataFrame([("a", 2, 1)], "g string, v int, op int")
    with pytest.raises(ValueError, match="dtype"):
        ivm.apply_distinct_count_delta(view, support, bad_val, ["g"], "v")
    # non-integral count column
    with pytest.raises(ValueError, match="integral"):
        ivm.apply_distinct_count_delta(
            view.withColumn("n_distinct", F.col("n_distinct").cast("double")),
            support, ok_delta, ["g"], "v",
        )
    # reserved staging name on the support
    with pytest.raises(ValueError, match="reserved"):
        ivm.apply_distinct_count_delta(
            view, support.withColumn("__dm", F.lit(1)), ok_delta, ["g"], "v"
        )
    # missing key column in the delta
    with pytest.raises(ValueError, match="lacks"):
        ivm.apply_distinct_count_delta(
            view, support, ok_delta.drop("g"), ["g"], "v"
        )


# ---------------------------------------------------------------------------
# streaming funnel (streaming/patterns.py::streaming_funnel_trajectories)
# ---------------------------------------------------------------------------


def _run_funnel_stream(spark, tmp_path, batches, name, steps=("A", "B", "C")):
    """Run the stateful funnel over one-parquet-dir-per-microbatch input;
    return the FINAL trajectory per user (max reached) as a dict
    user -> (reached, us1..usk)."""
    from kf_task_fhir_etl_spark.streaming import patterns as spat

    src = str(tmp_path / f"{name}_src")
    schema = None
    for i, rows in enumerate(batches, 1):
        df = _span_events(spark, rows)
        schema = df.schema
        df.coalesce(1).write.parquet(f"{src}/b{i}.parquet")
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(f"{src}/*.parquet")
    )
    traj = spat.streaming_funnel_trajectories(raw, list(steps))
    q = (
        traj.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = {}
    for r in spark.table(name).collect():
        prev = out.get(r["user_id"])
        if prev is None or r["reached"] > prev[0]:
            out[r["user_id"]] = (r["reached"], *[r[f"us{i+1}"] for i in range(len(steps))])
    return out


def test_streaming_funnel_cross_batch_advancement(spark, tmp_path):
    """Steps completed in different microbatches must chain through the
    carried state; a step-2 event BEFORE t1 never counts even though it
    arrives in the same batch as the step-1 event."""
    b1 = [
        (1, 100, "A"),
        (2, 50, "B"), (2, 100, "A"),   # B before t1 — must not count
        (3, 100, "A"), (3, 200, "B"),
    ]
    b2 = [
        (1, 300, "B"), (1, 400, "C"),
        (2, 300, "B"),
        (3, 300, "C"),
    ]
    got = _run_funnel_stream(spark, tmp_path, [b1, b2], "fun_xbatch")
    assert got == {
        1: (3, 100, 300, 400),
        2: (2, 100, 300, None),
        3: (3, 100, 200, 300),
    }


def test_streaming_funnel_strict_after_ties(spark, tmp_path):
    """A step event at EXACTLY the prior step's completion µs never
    advances — in-batch and across a batch boundary."""
    b1 = [
        (1, 100, "A"), (1, 100, "B"),    # in-batch tie: B not after t1
        (2, 100, "A"),
    ]
    b2 = [
        (1, 200, "B"),                    # later B does advance
        (2, 100, "B"), (2, 200, "B"),    # cross-batch tie ignored; 200 counts
    ]
    got = _run_funnel_stream(spark, tmp_path, [b1, b2], "fun_ties")
    assert got == {1: (2, 100, 200, None), 2: (2, 100, 200, None)}


def test_streaming_funnel_matches_batch_operator_randomized(spark, tmp_path):
    """Stream ≡ batch on randomized events with µs collisions: final
    streamed trajectories must equal funnel_trajectories' rows (converted
    to µs), users absent from step 1 absent from both."""
    import random

    from kf_task_fhir_etl_spark.operators import funnel as bfun

    rng = random.Random(947)
    rows = [
        (rng.randrange(10), rng.randrange(50), rng.choice(["A", "B", "C", "X"]))
        for _ in range(300)
    ]
    batches = [
        [r for r in rows if r[1] <= 15],
        [r for r in rows if 15 < r[1] <= 33],
        [r for r in rows if r[1] > 33],
    ]
    got = _run_funnel_stream(spark, tmp_path, batches, "fun_rand")
    traj = bfun.funnel_trajectories(_span_events(spark, rows), ["A", "B", "C"])
    want = {}
    for r in traj.select(
        "user",
        *[F.unix_micros(F.col(f"t{i}")).alias(f"us{i}") for i in (1, 2, 3)],
    ).collect():
        us = (r["us1"], r["us2"], r["us3"])
        want[r["user"]] = (sum(1 for x in us if x is not None), *us)
    assert got == want


# ---------------------------------------------------------------------------
# MIN/MAX IVM (operators/ivm.py::apply_minmax_delta)
# ---------------------------------------------------------------------------


def _mm_frames(spark, base_rows, inserts, deletes):
    """base_rows: pre-changelog (g, x). Returns (view, base_new, delta,
    post_rows)."""
    base = spark.createDataFrame(base_rows, "g string, x bigint")
    view = base.groupBy("g").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    post = list(base_rows)
    for d in deletes:
        post.remove(d)
    post += inserts
    base_new = spark.createDataFrame(post, "g string, x bigint") if post else \
        spark.createDataFrame([], "g string, x bigint")
    delta = spark.createDataFrame(
        [(g, x, 1) for g, x in inserts] + [(g, x, -1) for g, x in deletes],
        "g string, x bigint, op int",
    )
    return view, base_new, delta, post


def _mm_apply(spark, base_rows, inserts, deletes):
    from kf_task_fhir_etl_spark.operators import ivm

    view, base_new, delta, post = _mm_frames(spark, base_rows, inserts, deletes)
    out = ivm.apply_minmax_delta(
        view, base_new, delta, ["g"], min_cols={"lo": "x"}, max_cols={"hi": "x"}
    )
    got = {(r["g"], r["lo"], r["hi"]) for r in out.collect()}
    want = {
        (r["g"], r["lo"], r["hi"])
        for r in spark.createDataFrame(post, "g string, x bigint")
        .groupBy("g")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    } if post else set()
    return got, want


def test_minmax_delta_delete_exposes_second_extremum(spark):
    """The exact case that makes MIN/MAX non-self-maintainable: deleting
    the current min must surface the unknown second min (recompute path);
    deleting a non-extreme row must leave both extrema untouched."""
    base = [("a", 1), ("a", 5), ("a", 9), ("b", 2), ("b", 4), ("b", 6)]
    got, want = _mm_apply(spark, base, [], [("a", 1), ("b", 4)])
    assert got == want == {("a", 5, 9), ("b", 2, 6)}


def test_minmax_delta_insert_only_folds_and_new_group(spark):
    """Insert-only groups fold algebraically (new extremum adopted,
    interior insert ignored); a never-seen group appears."""
    base = [("a", 3), ("a", 7)]
    got, want = _mm_apply(spark, base, [("a", 1), ("a", 5), ("c", 42)], [])
    assert got == want == {("a", 1, 7), ("c", 42, 42)}


def test_minmax_delta_group_vanish_and_mixed(spark):
    """A group emptied by deletes vanishes; a group with BOTH inserts and
    deletes takes the recompute path and lands on the post-state extrema."""
    base = [("a", 5), ("b", 1), ("b", 9)]
    got, want = _mm_apply(spark, base, [("b", 0)], [("a", 5), ("b", 9)])
    assert got == want == {("b", 0, 1)}


def test_minmax_delta_null_measures(spark):
    """SQL MIN/MAX ignore NULLs: NULL inserts never displace extrema, an
    all-NULL group exists with NULL extrema, and a value landing on an
    all-NULL group replaces them."""
    base = [("a", None), ("b", 3)]
    got, want = _mm_apply(spark, base, [("a", 4), ("b", None), ("d", None)], [])
    assert got == want == {("a", 4, 4), ("b", 3, 3), ("d", None, None)}


def test_minmax_delta_untouched_passthrough_and_bounded_base_touch(spark):
    """Untouched groups pass through byte-exact, and the base is consulted
    ONLY for delete-touched groups: a poisoned base row in an insert-only
    group must be invisible to the fold (proof the recompute never reads
    it)."""
    from kf_task_fhir_etl_spark.operators import ivm

    view = spark.createDataFrame(
        [("a", 3, 7), ("b", 1, 2), ("c", 5, 5)], "g string, lo bigint, hi bigint"
    )
    # base poisoned for insert-only 'a' (a -999 the fold must never see);
    # correct for delete-touched 'b'
    base_new = spark.createDataFrame(
        [("a", -999), ("b", 2), ("c", 5)], "g string, x bigint"
    )
    delta = spark.createDataFrame(
        [("a", 10, 1), ("b", 1, -1)], "g string, x bigint, op int"
    )
    out = ivm.apply_minmax_delta(
        view, base_new, delta, ["g"], min_cols={"lo": "x"}, max_cols={"hi": "x"}
    )
    got = {(r["g"], r["lo"], r["hi"]) for r in out.collect()}
    assert got == {("a", 3, 10), ("b", 2, 2), ("c", 5, 5)}


def test_minmax_delta_validation(spark):
    from kf_task_fhir_etl_spark.operators import ivm

    view, base_new, delta, _ = _mm_frames(spark, [("a", 1)], [], [])
    ok = dict(min_cols={"lo": "x"}, max_cols={"hi": "x"})
    with pytest.raises(ValueError, match="no min_cols"):
        ivm.apply_minmax_delta(view, base_new, delta, ["g"])
    with pytest.raises(ValueError, match="both"):
        ivm.apply_minmax_delta(
            view, base_new, delta, ["g"], min_cols={"lo": "x"}, max_cols={"lo": "x"}
        )
    with pytest.raises(ValueError, match="exactly"):
        ivm.apply_minmax_delta(
            view, base_new.withColumn("x", F.col("x").cast("int")), delta, ["g"], **ok
        )
    with pytest.raises(ValueError, match="lacks"):
        ivm.apply_minmax_delta(view.drop("hi"), base_new, delta, ["g"], **ok)
    with pytest.raises(ValueError, match="reserved"):
        ivm.apply_minmax_delta(
            view.withColumn("__has_del", F.lit(1)), base_new, delta, ["g"], **ok
        )


# ---------------------------------------------------------------------------
# top-k IVM (operators/ivm.py::apply_topk_delta)
# ---------------------------------------------------------------------------


def _tk_frames(spark, base_rows, k=2):
    from pyspark.sql import Window

    base = spark.createDataFrame(base_rows, "g string, id bigint, s double")
    w = Window.partitionBy("g").orderBy(F.col("s").desc(), F.col("id"))
    view = (
        base.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= k).drop("__r")
    )
    return base, view


def _tk_apply(spark, base_rows, inserts, deletes, k=2, base_override=None):
    """inserts: (g, id, s) +1 rows; deletes: (g, id) −1 rows (score rides
    as NULL — deletes name the pre-batch row by id). Returns (got, want)
    vs a from-scratch top-k over the post rows."""
    from pyspark.sql import Window

    from kf_task_fhir_etl_spark.operators import ivm

    _, view = _tk_frames(spark, base_rows, k)
    post = [r for r in base_rows if (r[0], r[1]) not in {(g, i) for g, i in deletes}]
    post += inserts
    base_new = spark.createDataFrame(
        base_override if base_override is not None else post, "g string, id bigint, s double"
    )
    delta = spark.createDataFrame(
        [(g, i, s, 1) for g, i, s in inserts]
        + [(g, i, None, -1) for g, i in deletes],
        "g string, id bigint, s double, op int",
    )
    out = ivm.apply_topk_delta(view, base_new, delta, ["g"], "id", "s", k)
    got = {tuple(r) for r in out.collect()}
    w = Window.partitionBy("g").orderBy(F.col("s").desc(), F.col("id"))
    want = {
        tuple(r)
        for r in spark.createDataFrame(post, "g string, id bigint, s double")
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= 2 if k == 2 else F.col("__r") <= k)
        .drop("__r")
        .collect()
    }
    return got, want


def test_topk_delta_insert_displaces_and_new_group(spark):
    base = [("a", 1, 10.0), ("a", 2, 8.0), ("a", 3, 5.0)]
    got, want = _tk_apply(spark, base, [("a", 9, 9.0), ("b", 7, 1.0)], [])
    assert got == want == {("a", 1, 10.0), ("a", 9, 9.0), ("b", 7, 1.0)}


def test_topk_delta_member_delete_promotes_hidden_row(spark):
    """Deleting a stored member must surface the row BELOW the cut — only
    the recompute path can know it."""
    base = [("a", 1, 10.0), ("a", 2, 8.0), ("a", 3, 5.0)]
    got, want = _tk_apply(spark, base, [], [("a", 1)])
    assert got == want == {("a", 2, 8.0), ("a", 3, 5.0)}


def test_topk_delta_nonmember_delete_never_reads_base(spark):
    """A delete below the cut is a provable no-op — poison the base for
    that group and the fold must not see it."""
    base = [("a", 1, 10.0), ("a", 2, 8.0), ("a", 3, 5.0)]
    # post-state would be rows 1,2 on top; poisoned base says otherwise
    got, _ = _tk_apply(
        spark, base, [], [("a", 3)],
        base_override=[("a", 99, 999.0)],
    )
    assert got == {("a", 1, 10.0), ("a", 2, 8.0)}


def test_topk_delta_update_member_and_nonmember(spark):
    """CDC update = delete + insert of one entity: a member update
    recomputes (score drop can demote it), a non-member update folds
    (score jump can promote it)."""
    base = [("a", 1, 10.0), ("a", 2, 8.0), ("a", 3, 5.0)]
    # member 1 drops to 1.0 -> falls out; non-member 3 jumps to 9.0 -> in
    inserts = [("a", 1, 1.0), ("a", 3, 9.0)]
    deletes = [("a", 1), ("a", 3)]
    post = [("a", 1, 1.0), ("a", 2, 8.0), ("a", 3, 9.0)]
    from kf_task_fhir_etl_spark.operators import ivm

    _, view = _tk_frames(spark, base, 2)
    base_new = spark.createDataFrame(post, "g string, id bigint, s double")
    delta = spark.createDataFrame(
        [("a", 1, 10.0, -1), ("a", 1, 1.0, 1), ("a", 3, 5.0, -1), ("a", 3, 9.0, 1)],
        "g string, id bigint, s double, op int",
    )
    out = ivm.apply_topk_delta(view, base_new, delta, ["g"], "id", "s", 2)
    assert {tuple(r) for r in out.collect()} == {("a", 3, 9.0), ("a", 2, 8.0)}


def test_topk_delta_untouched_group_vanish_ties_and_small_groups(spark):
    """Untouched groups byte-exact; a group emptied by deletes vanishes;
    groups with < k rows keep all rows; score ties break by id."""
    base = [("a", 1, 5.0), ("b", 2, 3.0), ("c", 4, 7.0), ("c", 3, 7.0)]
    got, want = _tk_apply(spark, base, [("c", 5, 7.0)], [("b", 2)])
    # c: three rows tied at 7.0 -> ids 3,4 win
    assert got == want == {("a", 1, 5.0), ("c", 3, 7.0), ("c", 4, 7.0)}


def test_topk_delta_null_score_insert_and_validation(spark):
    from kf_task_fhir_etl_spark.operators import ivm

    base = [("a", 1, 5.0)]
    _, view = _tk_frames(spark, base, 2)
    base_new = spark.createDataFrame(base + [("a", 2, None)], "g string, id bigint, s double")
    # NULL-score insert can never rank — view unchanged
    delta = spark.createDataFrame([("a", 2, None, 1)], "g string, id bigint, s double, op int")
    out = ivm.apply_topk_delta(view, base_new, delta, ["g"], "id", "s", 2)
    assert {tuple(r) for r in out.collect()} == {("a", 1, 5.0)}
    with pytest.raises(ValueError, match="k must be"):
        ivm.apply_topk_delta(view, base_new, delta, ["g"], "id", "s", 0)
    with pytest.raises(ValueError, match="dtypes differ"):
        ivm.apply_topk_delta(
            view, base_new.withColumn("s", F.col("s").cast("float")), delta,
            ["g"], "id", "s", 2,
        )
    with pytest.raises(ValueError, match="lacks"):
        ivm.apply_topk_delta(view.drop("s"), base_new, delta, ["g"], "id", "s", 2)
    with pytest.raises(Exception, match="NULL id"):
        bad = spark.createDataFrame([("a", None, 1.0, 1)], "g string, id bigint, s double, op int")
        ivm.apply_topk_delta(view, base_new, bad, ["g"], "id", "s", 2).collect()


# ---------------------------------------------------------------------------
# personalized PageRank (operators/graph.py::personalized_pagerank)
# ---------------------------------------------------------------------------


def _ppr_edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _ppr_seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def _ppr_numpy(pairs, seeds, iters=5, d=0.85, digits=12):
    """Same-rounding sequential replica: per round w_sum per node, dangling
    mass rounded to `digits`, pr' = round((1-d)*r + d*(w + D*r), digits)."""
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    out = {n: [] for n in nodes}
    for a, b in pairs:
        out[a].append(b)
    s = [n for n in seeds if n in idx]
    r = {n: (1.0 / len(s) if n in s else 0.0) for n in nodes}
    pr = dict(r)
    for _ in range(iters):
        w = {n: 0.0 for n in nodes}
        for a in nodes:
            if out[a]:
                share = pr[a] / len(out[a])
                for b in out[a]:
                    w[b] += share
        dmass = round(sum(pr[n] for n in nodes if not out[n]), digits)
        pr = {
            n: round((1 - d) * r[n] + d * (w[n] + dmass * r[n]), digits) for n in nodes
        }
    return {n: round(pr[n], 6) for n in nodes}


def test_ppr_matches_numpy_with_dangling(spark):
    """Directed graph with a dangling sink: the restart-proportional
    dangling redistribution must match a same-rounding sequential
    replica bit-for-bit (12dp per round, 6dp published)."""
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("d", "a")]  # c dangles
    got = {
        r["node"]: r["pr"]
        for r in graph.personalized_pagerank(
            _ppr_edges(spark, pairs), _ppr_seeds(spark, ["a", "d"]), iters=5
        ).collect()
    }
    assert got == _ppr_numpy(pairs, ["a", "d"])


def test_ppr_unreachable_nodes_carry_zero_and_seeds_intersect(spark):
    """A component with no seed gets rank 0.0 rows (full-vector
    contract); seeds absent from the graph carry no restart mass."""
    pairs = [("a", "b"), ("x", "y")]  # two components
    got = {
        r["node"]: r["pr"]
        for r in graph.personalized_pagerank(
            _ppr_edges(spark, pairs), _ppr_seeds(spark, ["a", "ghost"]), iters=3
        ).collect()
    }
    assert set(got) == {"a", "b", "x", "y"}
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got == _ppr_numpy(pairs, ["a"], iters=3)  # ghost contributed nothing


def test_ppr_mass_conserved_and_empty_seeds_raise(spark):
    pairs = [("a", "b"), ("b", "a"), ("b", "c")]
    res = graph.personalized_pagerank(
        _ppr_edges(spark, pairs), _ppr_seeds(spark, ["b"]), iters=4
    ).collect()
    assert abs(sum(r["pr"] for r in res) - 1.0) < 1e-6
    with pytest.raises(ValueError, match="no source node"):
        graph.personalized_pagerank(
            _ppr_edges(spark, pairs), _ppr_seeds(spark, ["zzz"]), iters=2
        )


# ---------------------------------------------------------------------------
# streaming top-k leaderboard (streaming/leaderboard.py)
# ---------------------------------------------------------------------------


def _lb_run(spark, tmp_path, batches, name, k=2):
    """batches: list of lists of (g, id, price, seq, op). Runs the sink,
    returns (view_rows, live_rows) as sorted tuples."""
    import os

    from kf_task_fhir_etl_spark.streaming import leaderboard

    src = str(tmp_path / f"{name}_src")
    schema = "g string, id bigint, price double, seq long, op string"
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
    q = leaderboard.topk_stream(
        stream, store, keys=["g"], id_col="id", score_col="price", k=k,
        order_col="seq", op_col="op", checkpoint=str(tmp_path / f"{name}_ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    cols = ["g", "id", "price"]
    view = sorted(tuple(r) for r in leaderboard.read_leaderboard(spark, store, cols).collect())
    live = sorted(tuple(r) for r in leaderboard.read_live_table(spark, store, cols).collect())
    return view, live


def _lb_expect(spark, live_rows, k=2):
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.col("price").desc(), F.col("id"))
    df = spark.createDataFrame(live_rows, "g string, id bigint, price double")
    return sorted(
        tuple(r)
        for r in df.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
        .collect()
    )


def test_leaderboard_stream_updates_deletes_match_recompute(spark, tmp_path):
    """Inserts, CDC updates, and deletes across microbatches: the final
    view must equal a from-scratch top-k over the final live table."""
    b1 = [
        ("a", 1, 10.0, 1, "upsert"), ("a", 2, 8.0, 1, "upsert"),
        ("a", 3, 5.0, 1, "upsert"), ("b", 7, 3.0, 1, "upsert"),
    ]
    b2 = [
        ("a", 1, 1.0, 2, "upsert"),   # member demoted by update
        ("a", 4, 9.0, 2, "upsert"),   # new entity into the top
        ("b", 7, None, 2, "delete"),  # group vanishes
    ]
    view, live = _lb_run(spark, tmp_path, [b1, b2], "lb_upd")
    want_live = [("a", 1, 1.0), ("a", 2, 8.0), ("a", 3, 5.0), ("a", 4, 9.0)]
    assert live == sorted(want_live)
    assert view == _lb_expect(spark, want_live) == sorted([("a", 4, 9.0), ("a", 2, 8.0)])


def test_leaderboard_stale_change_loses_lww_and_view_follows(spark, tmp_path):
    """An out-of-order change that LOSES the LWW merge must be a view
    no-op too — the delta diffs the merge OUTCOME, not the raw ops: a
    seq-1 delete arriving after a seq-2 upsert cannot evict the row from
    base OR view."""
    b1 = [("a", 1, 10.0, 2, "upsert"), ("a", 2, 8.0, 2, "upsert")]
    b2 = [("a", 1, None, 1, "delete"),   # stale: loses to the seq-2 upsert
          ("a", 2, 99.0, 1, "upsert")]  # stale: must NOT re-price
    view, live = _lb_run(spark, tmp_path, [b1, b2], "lb_stale")
    want_live = [("a", 1, 10.0), ("a", 2, 8.0)]
    assert live == sorted(want_live)
    assert view == _lb_expect(spark, want_live)


def test_leaderboard_batch_boundary_independence(spark, tmp_path):
    """The same change set in different microbatch splits converges to
    the same view and live table."""
    changes = [
        ("a", 1, 10.0, 1, "upsert"), ("a", 2, 8.0, 1, "upsert"),
        ("a", 3, 5.0, 1, "upsert"), ("a", 1, None, 2, "delete"),
        ("a", 4, 9.0, 2, "upsert"), ("a", 3, 12.0, 3, "upsert"),
    ]
    results = []
    for si, split in enumerate(([changes], [changes[:3], changes[3:]],
                                [[c] for c in changes])):
        results.append(_lb_run(spark, tmp_path, split, f"lb_split{si}"))
    assert results[0] == results[1] == results[2]
    want_live = [("a", 2, 8.0), ("a", 3, 12.0), ("a", 4, 9.0)]
    assert results[0][1] == sorted(want_live)
    assert results[0][0] == _lb_expect(spark, want_live)


def test_leaderboard_reserved_names_and_view_tag_rejected(spark, tmp_path):
    from kf_task_fhir_etl_spark.streaming import leaderboard

    schema = "g string, id bigint, price double, seq long, op string"
    bad_schema = schema.replace("op string", "__op string")
    seed_dir = str(tmp_path / "seed_src")
    spark.createDataFrame(
        [("a", 1, 1.0, 1, "upsert")], bad_schema
    ).coalesce(1).write.parquet(seed_dir)
    stream = spark.readStream.schema(bad_schema).parquet(seed_dir)
    with pytest.raises(ValueError, match="reserved"):
        leaderboard.topk_stream(
            stream, str(tmp_path / "s"), ["g"], "id", "price", 2, "seq", "__op"
        )
    # '__view__' as an op VALUE dies in-plan inside the sink
    import os

    src = str(tmp_path / "tag_src")
    spark.createDataFrame(
        [("a", 1, 1.0, 1, "__view__")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "e1"))
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "e*"))
    )
    q = leaderboard.topk_stream(
        stream2, str(tmp_path / "tag_store"), ["g"], "id", "price", 2,
        "seq", "op", checkpoint=str(tmp_path / "tag_ckpt"),
    )
    with pytest.raises(Exception, match="reserved|__view__|StreamingQuery"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()


# ---------------------------------------------------------------------------
# plan-shape asserts: the IVM family's probe joins ARE broadcast
# (the docstrings' scale claims, machine-checked — the q95/q129 discipline)
# ---------------------------------------------------------------------------


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_distinct_count_probes_are_broadcast(spark):
    """The support/view slicing (semi + anti + view-anti) must compile to
    BroadcastHashJoin — a shuffled probe would re-exchange the table-sized
    support per batch, the exact cost the operator's docstring excludes."""
    from kf_task_fhir_etl_spark.operators import ivm

    base = _dc_base(spark, [("a", 1), ("a", 2), ("b", 3)])
    view = (
        base.groupBy("g").agg(F.count_distinct("v").alias("n_distinct"))
    )
    support = ivm.distinct_count_support(base, ["g"], "v")
    delta = spark.createDataFrame([("a", 9, 1)], "g string, v bigint, op int")
    new_view, new_support = ivm.apply_distinct_count_delta(
        view, support, delta, ["g"], "v"
    )
    for frame, want in ((new_support, 2), (new_view, 1)):
        plan = _executed_plan(frame)
        assert plan.count("BroadcastHashJoin") >= want, plan
        assert "SortMergeJoin LeftSemi" not in plan and "SortMergeJoin LeftAnti" not in plan, plan


def test_minmax_and_topk_probes_are_broadcast(spark):
    """Same contract for the extrema/rank hybrids: untouched-passthrough
    anti, touched semi, and the base recompute slice are all broadcast
    probes; only the fold/merge itself may shuffle."""
    from kf_task_fhir_etl_spark.operators import ivm

    view, base_new, delta, _ = _mm_frames(
        spark, [("a", 1), ("b", 2)], [("a", 9)], [("b", 2)]
    )
    mm = ivm.apply_minmax_delta(
        view, base_new, delta, ["g"], min_cols={"lo": "x"}, max_cols={"hi": "x"}
    )
    plan = _executed_plan(mm)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin LeftSemi" not in plan and "SortMergeJoin LeftAnti" not in plan, plan

    _, tview = _tk_frames(spark, [("a", 1, 5.0), ("a", 2, 3.0)], 2)
    tbase = spark.createDataFrame([("a", 2, 3.0)], "g string, id bigint, s double")
    tdelta = spark.createDataFrame(
        [("a", 1, None, -1), ("a", 3, 7.0, 1)], "g string, id bigint, s double, op int"
    )
    tk = ivm.apply_topk_delta(tview, tbase, tdelta, ["g"], "id", "s", 2)
    plan = _executed_plan(tk)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin LeftSemi" not in plan and "SortMergeJoin LeftAnti" not in plan, plan
