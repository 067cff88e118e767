"""Streaming Markov twin: summed per-batch transition deltas must
equal the batch event_type_markov counts EXACTLY (integer equality)
for any micro-batch slicing — the chained last-type state carries the
batch-boundary transition a per-batch lag() would drop."""

import time as _time

from pyspark.sql import functions as F

from streams_prototyping_spark import registry
from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.streaming.pipelines import markov_transitions_stream

registry.load_all()


def test_markov_stream_deltas_sum_to_batch_counts(spark, sf_dir, tmp_path):
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
    )
    rows = ev.orderBy("ts", "event_id").collect()
    path = str(tmp_path / "markov")
    third = (len(rows) + 2) // 3
    for i in range(3):
        spark.createDataFrame(rows[i * third : (i + 1) * third], ev.schema).coalesce(
            1
        ).write.mode("append").parquet(path)
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = (
        markov_transitions_stream(stream)
        .writeStream.format("memory")
        .queryName("markov_stream")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got: dict[tuple, int] = {}
    for r in spark.table("markov_stream").collect():
        k = (r.prev_type, r.next_type)
        got[k] = got.get(k, 0) + r.n

    want = {
        (r.prev_type, r.next_type): r.n
        for r in registry.QUERIES["event_type_markov"](spark, sf_dir).collect()
    }
    assert got == want
