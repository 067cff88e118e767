"""CREATE TABLE AS SELECT over a stream (SURVEY §2 B2): foreachBatch
maintains a parquet table; its final state equals the batch aggregate."""

import pyspark.sql.functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.streaming.sinks import materialize_table, read_table
from streams_prototyping_spark.streaming.sources import create_stream


def test_materialized_table_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "value").limit(500)
    src = str(tmp_path / "src")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    stream = create_stream(
        spark, "ev", ev.schema, transport="file", path=src, max_files_per_trigger=1
    )
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    q = materialize_table(
        agg, str(tmp_path / "table"), str(tmp_path / "ckpt"), "mat_test"
    )
    q.processAllAvailable()
    q.stop()

    got = sorted(map(tuple, read_table(spark, str(tmp_path / "table")).collect()))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(src)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
            .collect(),
        )
    )
    assert got == want
