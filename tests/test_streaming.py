"""Structured Streaming smoke tests: the streaming forms of q21/q22 must
produce the same aggregates as their batch counterparts over the same input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.streaming import events as se

from .conftest import SF_SMOKE


def _to_ts(df):
    # events ts arrives as long ns (TIMESTAMP(NANOS) via nanosAsLong);
    # integer division — float division corrupts 1.7e18 ns epochs
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # stream source wants a directory of parquet files with a fixed schema
    out = str(tmp_path_factory.mktemp("events_stream"))
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").write.mode("overwrite").parquet(out)
    return out


def test_windowed_counts_stream_equals_batch(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    raw = _to_ts(spark.readStream.format("parquet").schema(schema).load(events_dir))
    stream_agg = se.windowed_event_counts(raw, watermark="0 seconds")
    se.run_stream_to_memory(stream_agg, "win_counts", output_mode="complete")
    got = {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }

    batch = (
        _to_ts(spark.read.parquet(events_dir))
        .groupBy(
            F.date_format(F.window("ts", "1 hour").start, "yyyy-MM-dd HH:00").alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    want = {(r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"]) for r in batch.collect()}
    assert got == want


def test_session_windows_stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    raw = _to_ts(spark.readStream.format("parquet").schema(schema).load(events_dir))
    sessions = se.sessionized_counts(raw, gap="30 minutes", watermark="0 seconds")
    se.run_stream_to_memory(sessions, "sessions", output_mode="complete")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows
    # session invariant: end - start ≥ 0 and every user appears
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    n_users = spark.read.parquet(events_dir).select("user_id").distinct().count()
    assert len({r["user_id"] for r in rows}) == n_users
