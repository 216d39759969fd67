"""Round-7 operator tests: the Bloom filter's dense-array word store
(VERDICT r06 #1 — the map<int,bigint> probe was O(filter-size) per lookup)
and the bloom_prepare reuse/release lifecycle (VERDICT r06 #5, ADVICE r06).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark import etl
from kf_task_fhir_etl_spark.operators import bloom
from kf_task_fhir_etl_spark.operators.sketch import _is_checkpointed_relation


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
    checkpoint, no duplicate build jobs — the prepare_sketch contract),
    and release_checkpoints frees its blocks for real: re-executing the
    released relation fails loudly because the truncated lineage cannot
    be recomputed (the test_pipeline_memo release-proof pattern)."""
    small = spark.range(200).select(F.col("id").alias("k"))
    big = spark.range(1000).select(F.col("id").alias("k"))
    bl = bloom.bloom_build(small, "k", num_bits=64 * 8, num_hashes=4)
    prepped = bloom.bloom_prepare(bl)
    assert _is_checkpointed_relation(prepped)

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
