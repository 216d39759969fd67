"""Salted-join/aggregation utilities: results must equal the unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.operators import skew


def test_salted_join_equals_plain_join(spark):
    # skewed fact: 90% of rows share one key
    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(1000)], "id long, k string"
    )
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"v{i}") for i in range(0, 1000, 10)], "k string, v string"
    )
    plain = {(r["id"], r["v"]) for r in fact.join(dim, "k").collect()}
    salted = {
        (r["id"], r["v"])
        for r in skew.salted_join(fact, dim, key="k", salt_from="id", buckets=8).collect()
    }
    assert salted == plain


def test_salted_count_equals_plain_count(spark):
    df = spark.createDataFrame(
        [(i, "hot" if i % 5 else f"k{i}") for i in range(500)], "id long, k string"
    )
    plain = {(r["k"], r["count"]) for r in df.groupBy("k").count().collect()}
    salted = {
        (r["k"], r["n"]) for r in skew.salted_count(df, key="k", salt_from="id", buckets=4).collect()
    }
    assert salted == plain


def test_lsh_bucket_cap_drops_hot_buckets(spark):
    from kf_task_fhir_etl_spark.operators import dedup

    # 20 near-identical docs (one giant bucket) + 2 distinct ones
    rows = [(i, "common shared text body for everyone") for i in range(20)]
    rows += [(100, "completely different document"), (101, "another unique one entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.minhash_lsh_candidates(df).count()
    capped = dedup.minhash_lsh_candidates(df, max_bucket=5).count()
    assert uncapped >= 190  # 20*19/2 pairs from the hot bucket
    assert capped == 0


def test_multimodal_metadata_scan_prunes_binary(spark, tmp_path):
    import contextlib
    import io

    from kf_task_fhir_etl_spark.operators import multimodal

    rows = [(1, "image", bytearray(b"xx"), ("image/png", 64, 64, None))]
    path = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA).write.parquet(path)
    stats = multimodal.metadata_stats(spark.read.parquet(path))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        stats.explain("formatted")
    plan = buf.getvalue()
    # the binary payload column must be pruned out of the parquet ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "content" not in read_schema
    assert stats.collect()[0]["n"] == 1
