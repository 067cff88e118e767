"""Streaming source/sink layer — the engine's answer to the reference's
Kafka surface (SURVEY §2 A1/A15/A16, B1/B2).

``create_stream`` is the thin declarative API the reference models with
KSQL DDL comments (CREATE STREAM name (cols) WITH (kafka_topic=...,
value_format='delimited'), StreamStreamJoin.java:29-33): bind a name +
schema + transport to a streaming DataFrame. Kafka is optional — the
file and rate transports run without a broker, which is how tests and
the driver harness exercise the streaming layer.

Wire format: the reference's delimited CSV values
(value_format='delimited') decode via from_csv on ingest — ONCE, into
typed columns (the reference re-parses per operator, SURVEY §1.1); we
re-encode with concat_ws only at a Kafka egress.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def decode_delimited(raw: DataFrame, schema: T.StructType, value_col: str = "value") -> DataFrame:
    """CSV-decode a delimited value column into typed columns
    (SURVEY §2 A2; reference X.fromDelimitedString).

    Quoting is DISABLED to match the reference's naive value.split(",")
    semantics (and our encoder, which never quotes): without this, a
    '"' inside a field desynchronizes the parse."""
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    return raw.select(
        F.from_csv(
            F.col(value_col).cast("string"),
            F.lit(ddl),
            {"quote": "", "escape": ""},
        ).alias("r")
    ).select("r.*")


def decode_json(raw: DataFrame, schema: T.StructType, value_col: str = "value") -> DataFrame:
    """JSON-decode a value column into typed columns — the
    value_format='json' twin of decode_delimited (KSQL's other wire
    format). Unknown fields are ignored, missing fields arrive null —
    the schema-on-read contract a crawl feed actually needs."""
    return raw.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("r")
    ).select("r.*")


def encode_json(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Inverse codec for egress: struct -> JSON text value column."""
    cols = cols or df.columns
    return df.select(F.to_json(F.struct(*cols)).alias("value"))


def encode_delimited(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Inverse codec for egress (reference X.toDelimitedString).

    Each field goes through coalesce(cast(string), '') before concat_ws:
    concat_ws SKIPS null arguments entirely, so a null field would emit
    fewer delimiters and silently shift every later column on decode.
    An empty string keeps field positions stable (and round-trips back
    to null for non-string types, matching the reference's naive
    split-on-comma semantics)."""
    cols = cols or df.columns
    return df.select(
        F.concat_ws(
            ",", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
        ).alias("value")
    )


def _require_kafka(spark: SparkSession) -> None:
    """Fail with an actionable message when the spark-sql-kafka
    connector jar is absent (it is not bundled with plain pyspark);
    without this the error is an opaque DATA_SOURCE_NOT_FOUND deep in
    the first .load()."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            "Kafka transport requires the spark-sql-kafka-0-10 connector on "
            "the classpath (spark-submit --packages org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:<spark-version>). Use the 'file' "
            "transport for broker-free runs."
        ) from exc


def create_stream(
    spark: SparkSession,
    name: str,
    schema: T.StructType,
    *,
    transport: str = "file",
    path: str | None = None,
    kafka_topic: str | None = None,
    kafka_bootstrap: str = "localhost:9092",
    value_format: str = "parquet",
    rate_rows_per_sec: int = 1000,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """CREATE STREAM name (schema) WITH (transport...) -> streaming DF.

    transports:
    - "file": replayable directory source (parquet or delimited text) —
      the broker-free twin of a Kafka topic; exactly the replay harness
      SURVEY §5.3 calls for.
    - "kafka": real Kafka source; values decoded per value_format
      ("delimited" -> from_csv with the schema).
    - "rate": synthetic load source for throughput experiments.

    Scale note: a Kafka topic's partitions map 1:1 to Spark input
    partitions; file sources parallelize by file. Either way the
    downstream plan is identical — transports are swappable without
    touching queries.
    """
    if transport == "file":
        if path is None:
            raise ValueError("file transport requires path=")
        reader = spark.readStream
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        if value_format == "delimited":
            raw = reader.format("text").load(path)
            df = decode_delimited(raw, schema)
        elif value_format == "json":
            raw = reader.format("text").load(path)
            df = decode_json(raw, schema)
        else:
            df = reader.schema(schema).format("parquet").load(path)
    elif transport == "kafka":
        _require_kafka(spark)
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", kafka_bootstrap)
            .option("subscribe", kafka_topic or name)
            .load()
        )
        # reference serdes: key ByteArray (ignored), value String
        # (Aggregations.java:65-68); delimited/json decode per B1.
        if value_format == "delimited":
            df = decode_delimited(raw, schema)
        elif value_format == "json":
            df = decode_json(raw, schema)
        else:
            df = raw
    elif transport == "rate":
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rate_rows_per_sec)
            .load()
        )
        df = rate  # (timestamp, value) — caller maps into the schema
    else:
        raise ValueError(f"unknown transport {transport!r}")
    return df


def write_kafka(df: DataFrame, topic: str, checkpoint: str, bootstrap: str = "localhost:9092"):
    """KStream.to(topic) twin (SURVEY §2 A15): delimited-encode and
    produce. Returns the StreamingQuery handle."""
    return (
        encode_delimited(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
