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


def dedup_against_store(
    df: DataFrame,
    store_path: str,
    checkpoint: str,
    key_col: str = "norm_md5",
    query_name: str = "dedup_store",
) -> StreamingQuery:
    """Incremental dedup with a PERSISTENT fingerprint store: each
    micro-batch is (1) deduped within itself, (2) anti-joined against
    the accumulated store — surviving rows are appended to the store
    and are the batch's output. This is the archive half of the
    hot-window/archive split: dropDuplicatesWithinWatermark bounds
    state to the watermark horizon, while the store remembers every
    key ever seen across restarts (it is rebuilt from the store files,
    not from streaming state, on recovery).

    Scale note: the store is an append-only keyed parquet table; the
    anti-join is an equi-join on a 128-bit hash that AQE broadcasts
    while the delta is small. At warehouse scale the store is bucketed
    by key so the probe is shuffle-free, and compaction is a routine
    background OPTIMIZE. Exactly-once: foreachBatch may retry a batch,
    so the append is idempotent-keyed by (batch_id) subdirectory —
    a retried batch overwrites its own output rather than doubling it.
    """
    spark = df.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_store(spark, batch_df, batch_id, store_path, key_col)

    return (
        df.writeStream.foreachBatch(_merge)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )


def merge_batch_into_store(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    key_col: str,
) -> None:
    """One idempotent merge step (the foreachBatch body of
    dedup_against_store, factored out so retries are unit-testable).

    The anti-join MUST exclude the current batch's own partition: a
    retried batch would otherwise see its previous attempt in the
    store, anti-join itself to empty, and the overwrite would ERASE
    its keys — the exact data loss the per-batch directory exists to
    prevent. Partition-discovery reads give us the batch_id column to
    filter on."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    batch = batch_df.dropDuplicates([key_col])
    try:
        seen = (
            spark.read.option("basePath", store_path)
            .parquet(store_path)
            .filter(F.col("batch_id") != batch_id)
        )
        novel = batch.join(seen.select(key_col).distinct(), key_col, "left_anti")
    except AnalysisException:  # first batch: store does not exist yet
        novel = batch
    novel.write.mode("overwrite").parquet(f"{store_path}/batch_id={batch_id}")
