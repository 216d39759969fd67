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
    """sketch's underscore alias and lifecycle's public probe must be the
    SAME function object — the cross-module private import is gone, and a
    sketch.py refactor can no longer silently change bloom's
    prepare/reuse behavior (the ADVICE r07 drift hazard)."""
    assert sketch._is_checkpointed_relation is lifecycle.is_checkpointed_relation


def test_prepare_sketch_is_idempotent(spark):
    """Re-preparing an already-prepared sketch must be a no-op (same
    object back, no second set of pinned blocks) — the lifecycle.prepared
    contract prepare_sketch now delegates to; previously each call copied
    the blocks."""
    words = spark.range(100).select(F.concat(F.lit("w"), F.col("id")).alias("word"))
    cms = sketch.cms_build(words, "word", depth=3, width=64)
    once = sketch.prepare_sketch(cms)
    assert lifecycle.is_checkpointed_relation(once)
    jsc = spark.sparkContext._jsc.sc()
    ids_before = {info.id() for info in jsc.getRDDStorageInfo()}
    twice = sketch.prepare_sketch(once)
    assert twice is once
    ids_after = {info.id() for info in jsc.getRDDStorageInfo()}
    assert ids_after <= ids_before  # no NEW pinned storage from the re-prepare


def test_prepared_and_prepare_sketch_interchangeable(spark):
    """A lifecycle.prepared() filter is recognized by bloom_prune and a
    prepare_sketch() sketch by the shared probe — one lifecycle across
    the prepare-aware operators."""
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
