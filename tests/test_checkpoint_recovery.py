"""Checkpoint recovery: a streaming aggregation stopped and restarted
from its checkpoint resumes state and emits each window EXACTLY once
into a file sink — Spark's answer to the reference's changelog-topic
durability (SURVEY §4.2: state store + checkpoint replace RocksDB +
changelog)."""

import datetime as dt

import pyspark.sql.functions as F

SCHEMA = "event_id long, ts timestamp, value double"
BASE = dt.datetime(2024, 6, 1, 0, 0, 0)


def _rows(*specs):
    return [
        (i, BASE + dt.timedelta(seconds=s), float(v)) for i, (s, v) in enumerate(specs)
    ]


def _start(spark, src, sink, ckpt):
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    agg = (
        stream.withWatermark("ts", "30 seconds")
        .groupBy(F.window("ts", "60 seconds").alias("w"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(F.col("w.start").alias("ws"), "total", "n")
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )


def test_restart_resumes_and_emits_exactly_once(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))

    # phase 1: two early windows + a watermark pusher that closes them
    spark.createDataFrame(
        _rows((10, 1.0), (70, 2.0), (600, 0.5)), SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    q = _start(spark, src, sink, ckpt)
    q.processAllAvailable()
    q.stop()

    emitted_phase1 = spark.read.parquet(sink).count()
    assert emitted_phase1 >= 2  # both early windows closed and written

    # phase 2: RESTART from checkpoint; a late-window row + final pusher
    spark.createDataFrame(
        _rows((660, 3.0), (1800, 0.25)), SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = _start(spark, src, sink, ckpt)
    q2.processAllAvailable()
    q2.stop()

    out = spark.read.parquet(sink).collect()
    by_window = {}
    for r in out:
        assert r.ws not in by_window, f"window {r.ws} emitted twice across restart"
        by_window[r.ws] = (r.total, r.n)

    # every closed window exactly once, with the right totals
    assert by_window[BASE] == (1.0, 1)
    assert by_window[BASE + dt.timedelta(seconds=60)] == (2.0, 1)
    assert by_window[BASE + dt.timedelta(seconds=600)] == (0.5, 1)
    assert by_window[BASE + dt.timedelta(seconds=660)] == (3.0, 1)
