"""Unit tests for the r06 operators: weighted label propagation
(operators/graph.py), t-digest quantiles (operators/tdigest.py), and
small-file compaction (operators/compaction.py) — gates q125/q126/q127."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.operators import compaction, graph, tdigest

# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def _labels(df):
    return {r["node"]: r["label"] for r in df.collect()}


def test_label_propagation_two_weighted_communities(spark):
    # two triangles bridged by ONE light edge: heavy intra-community weights
    # must pull each triangle onto its own min label
    tri = [("a1", "a2", 5), ("a2", "a3", 5), ("a1", "a3", 5),
           ("b1", "b2", 5), ("b2", "b3", 5), ("b1", "b3", 5),
           ("a3", "b1", 1)]
    e0 = spark.createDataFrame(tri, "src string, dst string, w long")
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    got = _labels(graph.label_propagation(edges, iters=4, weight="w"))
    assert {got["a1"], got["a2"], got["a3"]} == {"a1"}
    assert {got["b1"], got["b2"], got["b3"]} == {"b1"}


def test_label_propagation_tie_breaks_to_min_label(spark):
    # node x receives equal weight from labels 'a' and 'b' → adopts 'a'
    edges = spark.createDataFrame(
        [("a", "x", 3), ("b", "x", 3)], "src string, dst string, w long"
    )
    got = _labels(graph.label_propagation(edges, iters=1, weight="w"))
    assert got["x"] == "a"


def test_label_propagation_no_in_edges_keeps_label_and_default_weight(spark):
    # 's' has no in-edges → keeps its own label every round; weight=None
    # counts edges (so two parallel u→v edges outweigh one heavy... they
    # weigh 2 vs 1)
    edges = spark.createDataFrame(
        [("s", "v", 9), ("u", "v", 1), ("u", "v", 1)], "src string, dst string, w long"
    )
    unweighted = _labels(graph.label_propagation(edges, iters=1))
    assert unweighted["s"] == "s"
    assert unweighted["v"] == "u"  # 2 unweighted edges beat 1
    weighted = _labels(graph.label_propagation(edges, iters=1, weight="w"))
    assert weighted["v"] == "s"  # weight 9 beats 1+1


def test_label_propagation_deterministic_across_runs(spark):
    import random

    random.seed(3)
    rows = [(f"n{random.randrange(40)}", f"n{random.randrange(40)}", random.randrange(1, 5))
            for _ in range(200)]
    edges = spark.createDataFrame(rows, "src string, dst string, w long").filter(
        F.col("src") != F.col("dst")
    )
    a = _labels(graph.label_propagation(edges, iters=3, weight="w"))
    b = _labels(graph.label_propagation(edges, iters=3, weight="w"))
    assert a == b


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------


def test_tdigest_exact_on_tiny_groups(spark):
    # fewer values than centroids → every value is its own centroid and the
    # digest's quantiles interpolate the exact data
    df = spark.createDataFrame([("g", float(v)) for v in range(1, 12)], "g string, v double")
    d = tdigest.tdigest_build(df, "g", "v", delta=200.0)
    row = d.collect()[0]
    assert row["n"] == 11 and len(row["means"]) == 11
    est = {r["prob"]: r["est"] for r in tdigest.tdigest_quantiles(d, [0.0, 0.5, 1.0]).collect()}
    assert est[0.0] == 1.0 and est[1.0] == 11.0
    assert est[0.5] == pytest.approx(6.0, abs=0.5)


def test_tdigest_rank_bound_and_state_bound_any_sharding(spark):
    import random

    random.seed(11)
    vals = [random.gauss(0, 1) for _ in range(4000)]
    exact = sorted(vals)

    def rank_of(x: float) -> float:
        import bisect

        return bisect.bisect_left(exact, x) / len(exact)

    for parts in (1, 7, 32):
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double").repartition(
            parts
        )
        d = tdigest.tdigest_build(df, "g", "v", delta=100.0)
        row = d.collect()[0]
        assert row["n"] == 4000
        assert len(row["means"]) <= 100  # k1 bound: ~delta/2 + sweep slack
        assert abs(sum(row["weights"]) - 4000) < 1e-6
        for r in tdigest.tdigest_quantiles(d, [0.1, 0.5, 0.9, 0.99]).collect():
            assert abs(rank_of(r["est"]) - r["prob"]) <= 0.03, (parts, r)


def test_tdigest_merge_equals_whole_build_bounds(spark):
    # split one group's data into two "day" digests, re-key, merge → the
    # merged digest satisfies the same rank bound as a whole-data build
    import random

    random.seed(5)
    vals = [random.expovariate(0.1) for _ in range(3000)]
    df = spark.createDataFrame(
        [(f"day{i % 2}", v) for i, v in enumerate(vals)], "g string, v double"
    )
    daily = tdigest.tdigest_build(df, "g", "v", delta=100.0)
    monthly = tdigest.tdigest_merge(daily.withColumn("group", F.lit("month")))
    row = monthly.collect()[0]
    assert row["n"] == 3000
    exact = sorted(vals)
    import bisect

    for r in tdigest.tdigest_quantiles(monthly, [0.5, 0.95]).collect():
        rank = bisect.bisect_left(exact, r["est"]) / len(exact)
        assert abs(rank - r["prob"]) <= 0.03


def test_tdigest_nulls_and_nans_excluded(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("g", float("nan")), ("g", 3.0)], "g string, v double"
    )
    row = tdigest.tdigest_build(df, "g", "v").collect()[0]
    assert row["n"] == 2 and row["vmin"] == 1.0 and row["vmax"] == 3.0


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------


def test_compaction_plan_binning_arithmetic(spark):
    # ordered by bytes DESC then path; bin = floor((cumsum - bytes)/target)
    files = [
        {"partition": "p=1", "file": "a", "bytes": 60},
        {"partition": "p=1", "file": "b", "bytes": 50},
        {"partition": "p=1", "file": "c", "bytes": 40},
        {"partition": "p=1", "file": "d", "bytes": 30},
        {"partition": "p=2", "file": "e", "bytes": 10},
    ]
    plan = {
        (r["partition"], r["file"]): r["bin"]
        for r in compaction.compaction_plan(spark, files, target_bytes=100).collect()
    }
    # cumsums: a=60 (bin floor(0/100)=0), b=110 (floor(60/100)=0),
    # c=150 (floor(110/100)=1), d=180 (floor(150/100)=1)
    assert plan == {("p=1", "a"): 0, ("p=1", "b"): 0, ("p=1", "c"): 1, ("p=1", "d"): 1, ("p=2", "e"): 0}


def test_compact_preserves_rows_and_honors_bins(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(0, 20000).select(
        (F.col("id") % 3).cast("string").alias("part"),
        "id",
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(12).write.partitionBy("part").parquet(src)
    n_before_files = len(compaction.list_files(src))
    assert n_before_files > 6
    summary = {r["partition"]: r for r in compaction.compact(spark, src, dst, 128 * 1024).collect()}
    for part, s in summary.items():
        assert s["n_files_after"] == s["n_bins"] <= s["n_files_before"]
    a = spark.read.parquet(src).select("id", "payload", "part")
    b = spark.read.parquet(dst).select("id", "payload", "part")
    assert a.count() == b.count() == 20000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # fresh-destination contract
    with pytest.raises(ValueError, match="exists"):
        compaction.compact(spark, src, dst, 128 * 1024)


def test_compact_flat_unpartitioned_layout(spark, tmp_path):
    src, dst = str(tmp_path / "flat_src"), str(tmp_path / "flat_dst")
    spark.range(0, 5000).repartition(9).write.parquet(src)
    summary = compaction.compact(spark, src, dst, 10**9).collect()
    assert len(summary) == 1 and summary[0]["partition"] == ""
    assert summary[0]["n_files_after"] == 1  # everything fits one bin
    assert spark.read.parquet(dst).count() == 5000


def test_tdigest_partials_fold_incrementally_across_arrow_batches(spark):
    """The level-1 stage digests one Arrow batch at a time into running
    per-group state (r06 review finding: pd.concat of the whole partition
    would void the bounded-state claim). Force many small batches through
    one partition and pin that the multi-batch merge path still satisfies
    the k1 state bound and the rank band."""
    import bisect
    import random

    random.seed(23)
    vals = [random.gauss(5, 2) for _ in range(3000)]
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    try:
        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, v double"
        ).coalesce(1)  # ~24 batches through ONE partition's running state
        d = tdigest.tdigest_build(df, "g", "v", delta=100.0)
        row = d.collect()[0]
        assert row["n"] == 3000
        assert len(row["means"]) <= 100  # state bound survives per-batch merging
        exact = sorted(vals)
        for r in tdigest.tdigest_quantiles(d, [0.1, 0.5, 0.9, 0.99]).collect():
            rank = bisect.bisect_left(exact, r["est"]) / len(exact)
            assert abs(rank - r["prob"]) <= 0.03, r
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_compaction_partition_values_multi_level(tmp_path):
    """list_files labels a file with its full relative dir chain;
    partition_values is the parser that stays correct on multi-level
    layouts (r06 review: split('=')[1] reads 'v1/k2' from k1=v1/k2=v2)."""
    import os

    d = tmp_path / "k1=v1" / "k2=v2"
    d.mkdir(parents=True)
    (d / "part-0.parquet").write_bytes(b"x")
    (tmp_path / "_SUCCESS").write_bytes(b"")
    files = compaction.list_files(str(tmp_path))
    assert len(files) == 1
    assert files[0]["partition"] == os.path.join("k1=v1", "k2=v2")
    assert compaction.partition_values(files[0]["partition"]) == {"k1": "v1", "k2": "v2"}
    assert compaction.partition_values("") == {}
    assert compaction.partition_values("event_type=click") == {"event_type": "click"}


def test_tdigest_keeps_null_group(spark):
    """SQL GROUP BY keeps the null group; the level-1 pandas fold must not
    silently drop it (r06 review: pandas groupby defaults to dropna=True)."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 5.0), (None, 7.0), (None, 9.0)],
        "g string, v double",
    )
    rows = {r["group"]: r for r in tdigest.tdigest_build(df, "g", "v").collect()}
    assert set(rows) == {"a", None}
    assert rows[None]["n"] == 3
    assert rows[None]["vmin"] == 5.0 and rows[None]["vmax"] == 9.0
    est = {
        (r["group"], r["prob"]): r["est"]
        for r in tdigest.tdigest_quantiles(
            tdigest.tdigest_build(df, "g", "v"), [0.5]
        ).collect()
    }
    assert est[(None, 0.5)] == pytest.approx(7.0)


def test_partition_values_decodes_hive_escapes_and_null_sentinel():
    """Raw partition dir names carry Hive %XX escapes and the
    __HIVE_DEFAULT_PARTITION__ NULL sentinel; engines decode them when
    reading the column back, so the parser must too or label↔column joins
    silently drop escaped groups (r06 review, 7th pass)."""
    assert compaction.partition_values("event_type=a%3Ab") == {"event_type": "a:b"}
    assert compaction.partition_values("k=100%25") == {"k": "100%"}
    assert compaction.partition_values("k=__HIVE_DEFAULT_PARTITION__") == {"k": None}
    # malformed escape passes through untouched rather than raising
    assert compaction.partition_values("k=50%ZZ") == {"k": "50%ZZ"}
    # round-trip against Spark's own writer escaping is pinned implicitly
    # by q127 (single-level, unescaped values) — this covers the decode law


# ---------------------------------------------------------------------------
# Bloom-filter join pruning (operators/bloom.py, q129)
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    """The Bloom contract: every member passes (prune → exact join ≡ plain
    join), and false positives stay near the analytic bound."""
    from kf_task_fhir_etl_spark.operators import bloom

    small = spark.range(0, 400).select((F.col("id") * 13 + 5).alias("k"))
    big = spark.range(0, 30000).select(F.col("id").alias("k"))
    bl = bloom.bloom_build(small, "k", num_bits=64 * 256, num_hashes=7)
    pruned = bloom.bloom_prune(big, "k", bl)
    exact = big.join(small, "k", "leftsemi")
    assert exact.join(pruned, "k", "left_anti").count() == 0  # no false negatives
    n_members = exact.count()
    fp = pruned.count() - n_members
    bound = bloom.bloom_fpr_bound(400, 64 * 256, 7)
    # generous ×5 over the analytic rate (double-hashing isn't perfectly
    # independent); an all-pass regression produces ~30k-400 ≫ this
    assert fp <= max(5 * bound * 30000, 25), (fp, bound)


def test_bloom_null_keys_excluded_both_sides(spark):
    """xxhash64(NULL, seed) returns the SEED, not NULL — so nulls must be
    explicitly excluded at build and failed at probe (SQL join semantics:
    NULL never matches)."""
    from kf_task_fhir_etl_spark.operators import bloom

    small = spark.createDataFrame([(None,), (7,)], "k bigint")
    bl = bloom.bloom_build(small, "k", num_bits=64 * 4, num_hashes=3)
    probe = spark.createDataFrame([(None,), (7,), (8,)], "k bigint")
    got = {r["k"] for r in bloom.bloom_prune(probe, "k", bl).collect()}
    assert None not in got and 7 in got


def test_bloom_prune_plan_is_broadcast_no_big_shuffle(spark):
    """The scale property: the big side's plan is scan → broadcast(1-row
    filter) → codegen'd filter — NO Exchange on the probe side."""
    from kf_task_fhir_etl_spark.operators import bloom

    small = spark.range(0, 100).select(F.col("id").alias("k"))
    big = spark.range(0, 5000).select(F.col("id").alias("k"))
    bl = bloom.bloom_build(small, "k", num_bits=64 * 16, num_hashes=4)
    plan = bloom.bloom_prune(big, "k", bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    # the probe side must carry no shuffle. Tree printing is root-first:
    # the region BEFORE the join line is its ANCESTORS (asserting on it is
    # vacuous — r06 review caught exactly that); the probe child prints
    # BETWEEN the join line and the BroadcastExchange subtree (BuildRight).
    after_join = plan.split("BroadcastNestedLoopJoin", 1)[1]
    probe_side = after_join.split("BroadcastExchange", 1)[0]
    assert "Exchange" not in probe_side, probe_side
    # and the assertion itself must have teeth: an injected probe-side
    # shuffle lands in that region
    shuffled = bloom.bloom_prune(big.repartition(7), "k", bl)
    plan2 = shuffled._jdf.queryExecution().executedPlan().toString()
    region = plan2.split("BroadcastNestedLoopJoin", 1)[1].split("BroadcastExchange", 1)[0]
    assert "Exchange" in region, region


def test_bloom_rejects_cross_type_probe_and_canonicalizes_widths(spark):
    """xxhash64 hashes int 7 and bigint 7 DIFFERENTLY — an unnormalized
    type mismatch silently prunes every matching row (r06 review). Same-
    class widths normalize (int build, bigint probe works); cross-class
    raises loudly."""
    from kf_task_fhir_etl_spark.operators import bloom

    small_int = spark.createDataFrame([(7,), (9,)], "k int")
    bl = bloom.bloom_build(small_int, "k", num_bits=64 * 4, num_hashes=3)
    probe_big = spark.createDataFrame([(7,), (9,), (100,)], "k bigint")
    got = {r["k"] for r in bloom.bloom_prune(probe_big, "k", bl).collect()}
    assert {7, 9} <= got  # widths canonicalized → no false negatives
    probe_str = spark.createDataFrame([("7",)], "k string")
    with pytest.raises(ValueError, match="type"):
        bloom.bloom_prune(probe_str, "k", bl)


def test_bloom_rejects_bad_parameters(spark):
    from kf_task_fhir_etl_spark.operators import bloom

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom.bloom_build(df, "k", num_bits=100, num_hashes=3)
    with pytest.raises(ValueError, match="num_hashes"):
        bloom.bloom_build(df, "k", num_bits=64, num_hashes=0)


def test_bloom_string_keys(spark):
    """Key type is whatever xxhash64 accepts — strings included (the
    documents/url dedup shape)."""
    from kf_task_fhir_etl_spark.operators import bloom

    small = spark.createDataFrame([("a",), ("b",)], "k string")
    probe = spark.createDataFrame([("a",), ("b",), ("zz",), ("yy",)], "k string")
    bl = bloom.bloom_build(small, "k", num_bits=64 * 8, num_hashes=5)
    got = {r["k"] for r in bloom.bloom_prune(probe, "k", bl).collect()}
    assert {"a", "b"} <= got  # no false negatives; zz/yy may or may not pass


# ---------------------------------------------------------------------------
# Z-order clustering (operators/zorder.py, q130)
# ---------------------------------------------------------------------------


def test_zorder_interleave_is_morton(spark):
    """Bit-exact Morton property on known values: z(1,0)=1, z(0,1)=2,
    z(3,3)=15, z(2^k a', 0) places bits at even positions."""
    from kf_task_fhir_etl_spark.operators import zorder

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (255, 0), (0, 255)], "a bigint, b bigint"
    )
    z = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder.z_value([F.col("a"), F.col("b")], bits=8).alias("z")
        ).collect()
    }
    assert z[(0, 0)] == 0 and z[(1, 0)] == 1 and z[(0, 1)] == 2 and z[(3, 3)] == 15
    assert z[(255, 0)] == 0b0101010101010101
    assert z[(0, 255)] == 0b1010101010101010


def test_zorder_rejects_overflow_and_empty(spark):
    from kf_task_fhir_etl_spark.operators import zorder

    with pytest.raises(ValueError, match="at least one"):
        zorder.z_value([], bits=8)
    with pytest.raises(ValueError, match="64-bit"):
        zorder.z_value([F.col("a"), F.col("b")], bits=32)
    with pytest.raises(ValueError, match="empty range"):
        zorder.quantize_fixed(F.col("a"), 5.0, 5.0, 8)


def test_quantize_fixed_clamps_and_keeps_null(spark):
    from kf_task_fhir_etl_spark.operators import zorder

    df = spark.createDataFrame(
        [(-10.0,), (0.0,), (250.0,), (499.99,), (1000.0,), (None,)], "v double"
    )
    got = [
        r["q"]
        for r in df.select(zorder.quantize_fixed(F.col("v"), 0.0, 500.0, 8).alias("q")).collect()
    ]
    assert got == [0, 0, 128, 255, 255, None]


def test_zorder_layout_skips_box_queries(spark, tmp_path):
    """The measured property: a box query under min/max pruning touches
    FEW files of a z-ordered layout and ~all files of a random layout of
    the same file count."""
    import os

    from kf_task_fhir_etl_spark.operators import zorder

    src = spark.range(0, 40000).select(
        (F.col("id") % 251).alias("qa"), ((F.col("id") * 31) % 256).alias("qb")
    )
    zorder.zorder_write(
        src, str(tmp_path / "zo"), zorder.z_value([F.col("qa"), F.col("qb")], 8), 16
    )
    src.repartition(16).write.parquet(str(tmp_path / "rand"))
    box = {"qa": (100, 140), "qb": (60, 120)}
    hz = zorder.box_query_file_hits(
        zorder.file_envelopes(spark, str(tmp_path / "zo"), ["qa", "qb"]), box
    ).collect()[0]
    hr = zorder.box_query_file_hits(
        zorder.file_envelopes(spark, str(tmp_path / "rand"), ["qa", "qb"]), box
    ).collect()[0]
    assert hz["n_files"] == 16 and hr["n_files"] == 16
    assert hz["n_hit"] <= 8  # tight envelopes
    assert hr["n_hit"] == 16  # every random file intersects the box
    assert hz["n_hit"] < hr["n_hit"]
