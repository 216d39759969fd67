"""Structured-Streaming source over the documents table — the corpus ops
(operators/filters.py, operators/corpus.py) are pure column expressions, so
they run unchanged on a microbatch stream: the continuous-ingest form of the
corpus gatekeeping pass (filter/score/redact documents as they arrive,
before they ever land in the training pool).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (one file = one
    microbatch locally; a landing directory in production). Same glob
    discipline as streaming/events.py::read_events_stream."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .load(f"{sf_dir}/documents.parque*")
    )
