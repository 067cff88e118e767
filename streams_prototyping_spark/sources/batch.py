"""Batch source connectors beyond parquet.

The reference reads only Kafka topics (SURVEY §2 Part C: no file
formats at all); a complete engine ingests the common lake formats
with explicit schemas (schema inference is a correctness and
performance hazard at 100 TB — a schema-on-read engine should never
scan data twice to guess types).

Every reader takes an explicit StructType and returns a plain
DataFrame, so downstream operators are format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with explicit schema — no inferSchema pass.

    Scale note: inferSchema=True reads the data twice; with an explicit
    schema the scan is single-pass and the parser can fail fast on
    malformed rows (mode=FAILFAST surfaces corruption instead of
    silently nulling)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines with explicit schema (single-pass, FAILFAST)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_delimited_text(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """The reference's wire format (value_format='delimited') as a
    batch source: raw text lines CSV-decoded into typed columns."""
    from streams_prototyping_spark.streaming.sources import decode_delimited

    return decode_delimited(spark.read.text(path), schema)
