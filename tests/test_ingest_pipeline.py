"""End-to-end streaming training-data ingest: documents replayed as a
file stream with planted near-duplicates -> normalize -> quality gate
-> watermarked canonical dedup, converging to the batch twin
(text_normalize |> quality filter |> group-on-norm_md5)."""

import time

import pyspark.sql.functions as F
import pytest

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.functions.text_transform import (
    norm_text_col,
    quality_score_col,
)
from streams_prototyping_spark.streaming.pipelines import ingest_documents_stream

MIN_Q = 0.45


@pytest.fixture(scope="module")
def replayed(spark, sf_dir, tmp_path_factory):
    """documents + planted case/punctuation near-duplicates, written
    as two time-ordered chunks (duplicates arrive in chunk 2, within
    the dedup watermark horizon)."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = base.count()
    # near-dups: 20% of docs re-sent with case flips and punctuation —
    # byte-different, canonical-identical
    dups = (
        base.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.upper("text"), F.lit("!!")).alias("text"),
        )
    )
    t0 = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    chunk1 = base.withColumn("ingest_ts", t0 + F.make_interval(secs=F.col("doc_id") % 600))
    chunk2 = dups.withColumn(
        "ingest_ts", t0 + F.make_interval(secs=600 + F.col("doc_id") % 600)
    )
    path = str(tmp_path_factory.mktemp("ingest") / "feed")
    chunk1.coalesce(2).write.mode("append").parquet(path)
    time.sleep(1.1)
    chunk2.coalesce(2).write.mode("append").parquet(path)
    return path, n


def test_ingest_stream_converges_to_batch(spark, replayed):
    path, n_base = replayed
    stream = (
        spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 2)
        .parquet(path)
    )
    out = ingest_documents_stream(
        stream, min_quality=MIN_Q, dedup_watermark="30 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ingest_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("ingest_out").collect()

    # batch twin over the same replayed feed
    feed = spark.read.parquet(path)
    batch = (
        feed.select(
            "doc_id",
            norm_text_col("text").alias("norm_text"),
            quality_score_col("text").alias("quality"),
        )
        .filter(F.col("quality") >= MIN_Q)
        .select("doc_id", F.md5("norm_text").alias("norm_md5"))
    )
    want_keys = {r["norm_md5"] for r in batch.collect()}

    # exactly one surviving row per canonical text that passed the gate
    got_keys = [r["norm_md5"] for r in got]
    assert len(got_keys) == len(set(got_keys)), "stream emitted a canonical dup twice"
    assert set(got_keys) == want_keys
    # the planted near-dups collapsed: fewer outputs than inputs
    n_inputs = feed.count()
    assert len(got_keys) < n_inputs
    # quality gate actually dropped something (corpus spans the cutoff)
    n_gated = feed.filter(quality_score_col("text") < MIN_Q).count()
    assert n_gated > 0, "MIN_Q gates nothing — lower the test's quality bar"


def test_planted_near_dups_collapse(spark, replayed):
    """A case/punct-mangled copy must produce the SAME canonical key
    as its source (the reason dedup keys on norm_md5, not md5)."""
    path, _ = replayed
    feed = spark.read.parquet(path).select(
        "doc_id", F.md5(norm_text_col("text")).alias("norm_md5")
    )
    pairs = (
        feed.filter(F.col("doc_id") >= 1_000_000)
        .alias("d")
        .join(
            feed.filter(F.col("doc_id") < 1_000_000).alias("o"),
            F.col("d.doc_id") == F.col("o.doc_id") + 1_000_000,
        )
        .select(
            (F.col("d.norm_md5") == F.col("o.norm_md5")).alias("same")
        )
        .collect()
    )
    assert pairs and all(r["same"] for r in pairs)


def test_dedup_store_survives_restart(spark, tmp_path):
    """The persistent fingerprint store: duplicates are rejected both
    within a run AND across a stream restart (streaming state is
    irrelevant — the store itself is the memory)."""
    import time as _time

    from streams_prototyping_spark.streaming.sinks import dedup_against_store

    feed = str(tmp_path / "feed")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, norm_md5 string"

    def write_chunk(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(feed)
        _time.sleep(1.1)

    def run_stream():
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feed)
        )
        q = dedup_against_store(stream, store, ck)
        q.processAllAvailable()
        q.stop()

    # run 1: keys a,b then b,c (b is an in-run duplicate across batches)
    write_chunk([(1, "a"), (2, "b")])
    write_chunk([(3, "b"), (4, "c")])
    run_stream()
    # run 2 (restart, same checkpoint): c again (cross-run duplicate) + d
    write_chunk([(5, "c"), (6, "d")])
    run_stream()

    kept = spark.read.parquet(f"{store}/*/").collect()
    assert sorted(r["norm_md5"] for r in kept) == ["a", "b", "c", "d"]
    # the first arrival won in every case
    assert {r["norm_md5"]: r["doc_id"] for r in kept} == {"a": 1, "b": 2, "c": 4, "d": 6}


def test_dedup_store_merge_is_retry_idempotent(spark, tmp_path):
    """foreachBatch may re-run a batch after a partial failure; the
    merge must not anti-join the batch against its OWN previous
    attempt (which would erase its keys from the store)."""
    from streams_prototyping_spark.streaming.sinks import merge_batch_into_store

    store = str(tmp_path / "store")
    schema = "doc_id long, norm_md5 string"
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    merge_batch_into_store(spark, b0, 0, store, "norm_md5")
    # retry of batch 0 (same data) — keys must survive
    merge_batch_into_store(spark, b0, 0, store, "norm_md5")
    kept = spark.read.parquet(f"{store}/*/").collect()
    assert sorted(r["norm_md5"] for r in kept) == ["a", "b"]
    # next batch still deduped against batch 0
    b1 = spark.createDataFrame([(3, "b"), (4, "c")], schema)
    merge_batch_into_store(spark, b1, 1, store, "norm_md5")
    kept = spark.read.parquet(f"{store}/*/").collect()
    assert sorted(r["norm_md5"] for r in kept) == ["a", "b", "c"]
    # retry of batch 1 after the store already contains it
    merge_batch_into_store(spark, b1, 1, store, "norm_md5")
    kept = spark.read.parquet(f"{store}/*/").collect()
    assert sorted(r["norm_md5"] for r in kept) == ["a", "b", "c"]
