"""Streaming sinks beyond Kafka: the continuously-maintained table.

The reference's KSQL layer materializes query results as TABLES
(CREATE TABLE foo AS SELECT ..., SURVEY §2 B2) — a changelog-compacted
KTable backed by a topic. The Spark-native equivalent is foreachBatch
upserting each micro-batch into a keyed table; here (no Delta/Iceberg
in the container) the merge is overwrite-by-snapshot for complete-mode
aggregates, which is exactly the KTable read-view: latest value per
key.

Scale note: with a real lakehouse format this becomes MERGE INTO on
the key (transactional upsert); the pipeline code does not change —
only `_write_snapshot`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def materialize_table(
    df: DataFrame, path: str, checkpoint: str, query_name: str = "materialized"
) -> StreamingQuery:
    """CREATE TABLE AS <streaming aggregate>: maintain a parquet table
    holding the aggregate's current state, refreshed per micro-batch.
    ``df`` must be a complete-mode-capable aggregate (the snapshot IS
    the table)."""

    def _write_snapshot(batch_df: DataFrame, batch_id: int) -> None:
        # overwrite = atomic-enough snapshot for parquet; a lakehouse
        # format would MERGE INTO on the aggregate key instead
        batch_df.write.mode("overwrite").parquet(path)

    return (
        df.writeStream.foreachBatch(_write_snapshot)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read the current state of a materialized table."""
    return spark.read.parquet(path)
