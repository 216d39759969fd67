"""Focused tests for operators/parallelism.py (r13): the scale-adaptive
parallelism floor for CPU-dense, byte-small stages (guide §2.5)."""
from __future__ import annotations

from kf_task_fhir_etl_spark.operators.parallelism import cpu_partitions, widen_for_cpu


def test_widen_narrow_input_reaches_core_parallelism(spark):
    df = spark.range(100).coalesce(1)
    w = widen_for_cpu(df)
    assert w.rdd.getNumPartitions() == cpu_partitions(df)
    # widening is row-preserving (round-robin repartition, no data change)
    assert sorted(r.id for r in w.collect()) == list(range(100))


def test_widen_is_identity_on_core_wide_input(spark):
    # the 100 TB path: an input already at/above core parallelism must pass
    # through UNTOUCHED — no added shuffle (object identity, not just plan
    # equality)
    wide = spark.range(1000).repartition(cpu_partitions(spark))
    assert widen_for_cpu(wide) is wide


def test_widened_minhash_signatures_identical(spark):
    # the consumer-level equivalence: signatures are min-aggregated per id,
    # so partitioning cannot change values
    from kf_task_fhir_etl_spark.operators.dedup import minhash_signatures

    rows = [(i, f"document text number {i} with some shared shingle mass") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    one = minhash_signatures(docs.coalesce(1)).collect()
    wide = minhash_signatures(docs.repartition(8)).collect()
    assert sorted(map(repr, one)) == sorted(map(repr, wide))
