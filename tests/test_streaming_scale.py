"""Streaming semantics at sf0.1 (VERDICT r1 item 6) plus the optional
real-Kafka e2e (item 7).

The sf0.001 convergence tests in test_streaming_semantics.py verify
logic; these re-run the two stateful shapes that could hide state-size
pathologies — watermarked windowed aggregation and key-set streaming
dedup — against the 100k-event sf0.1 table, replayed in time-ordered
chunks without ever collecting the data to the driver.

The Kafka test exercises the gated connector path end-to-end when (and
only when) the environment provides it: it skips cleanly unless the
spark-sql-kafka jar is on the classpath AND
SPARK_GRAFT_KAFKA_BOOTSTRAP points at a reachable broker.
"""

import os
import time

import pyspark.sql.functions as F
import pytest

from streams_prototyping_spark.data import load_table

SF01 = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF01}/events.parquet"), reason=f"{SF01} not present"
)


def _last_state_rows(q) -> int:
    """numRowsTotal from the most recent progress that reported state
    (the final processAllAvailable batch can be a no-data tick with an
    empty stateOperators list)."""
    for p in reversed(q.recentProgress):
        ops = p.get("stateOperators") if isinstance(p, dict) else p["stateOperators"]
        if ops:
            return ops[0]["numRowsTotal"]
    raise AssertionError("no state operator progress recorded")


def _write_time_chunks(df, ts_col, path, n_chunks=4, sentinel_shift="INTERVAL 2 HOURS"):
    """Replay df into `path` as n time-ordered parquet chunks (plus a
    far-future watermark-sentinel row in the last chunk), computing the
    chunk boundaries with approxQuantile so nothing is collected."""
    cuts = df.approxQuantile(
        "ts_unix", [i / n_chunks for i in range(1, n_chunks)], 0.001
    )
    lo = float("-inf")
    bounds = [*cuts, float("inf")]
    max_ts = df.agg(F.max(ts_col)).first()[0]
    for i, hi in enumerate(bounds):
        chunk = df.filter((F.col("ts_unix") > lo) & (F.col("ts_unix") <= hi)).drop(
            "ts_unix"
        )
        if i == len(bounds) - 1:
            sentinel = (
                df.limit(1)
                .drop("ts_unix")
                .withColumn(ts_col, F.lit(max_ts) + F.expr(sentinel_shift))
            )
            chunk = chunk.unionByName(sentinel)
        chunk.coalesce(4).write.mode("append").parquet(path)
        lo = hi
        time.sleep(1.1)
    return max_ts


def test_windowed_agg_sf01_converges(spark, tmp_path):
    """Watermarked hourly aggregation over the full sf0.1 events table
    (~100k rows, ~35 days of event time -> ~850 open-then-closed
    windows x 5 event types). Catches state that fails to evict or
    windows that never finalize."""
    ev = (
        load_table(spark, SF01, "events")
        .select("ts", "event_type", "value")
        .withColumn("ts_unix", F.unix_timestamp("ts"))
    )
    path = str(tmp_path / "agg01")
    max_ts = _write_time_chunks(ev, "ts", path)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("agg01")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    n_state = _last_state_rows(q)
    q.stop()

    got = {
        (r.ws, r.event_type): (r.n, r.total)
        for r in spark.table("agg01").collect()
        if r.ws <= max_ts
    }
    batch = (
        spark.read.parquet(path)
        .filter(F.col("ts") <= max_ts)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total")
    )
    want = {(r.ws, r.event_type): (r.n, r.total) for r in batch.collect() if r.ws <= max_ts}
    assert got == want
    # watermark-bounded state: far fewer rows than events — windows
    # evict once closed (the sf0.001 suite can't see this distinction)
    assert n_state < 10_000, f"state holds {n_state} rows — windows not evicting"


def test_streaming_dedup_sf01_state_bounded(spark, tmp_path):
    """Streaming dedup over 100k distinct event_ids with a 25%
    duplicate re-send. dropDuplicatesWithinWatermark keeps state only
    within the watermark horizon — with keys arriving roughly in
    event-time order and a 2-day horizon over a 35-day replay, state
    must stay well below the full 125k key set (the unbounded
    dropDuplicates would hold every key forever)."""
    ev = (
        load_table(spark, SF01, "events")
        .select("event_id", "ts", "value")
        .withColumn("ts_unix", F.unix_timestamp("ts"))
    )
    n_events = ev.count()
    path = str(tmp_path / "dup01")
    # chunks 1..4 in time order, then re-send chunk 4: its most recent
    # rows are still inside the 2-day horizon (deduped BY STATE), its
    # older rows are behind the watermark (dropped as late) — both
    # dedup paths exercised, each id emitted exactly once either way.
    cuts = ev.approxQuantile("ts_unix", [0.25, 0.5, 0.75], 0.001)
    bounds = [float("-inf"), *cuts, float("inf")]
    for i in range(4):
        ev.filter(
            (F.col("ts_unix") > bounds[i]) & (F.col("ts_unix") <= bounds[i + 1])
        ).drop("ts_unix").coalesce(4).write.mode("append").parquet(path)
        time.sleep(1.1)
    ev.filter(F.col("ts_unix") > bounds[3]).drop("ts_unix").coalesce(4).write.mode(
        "append"
    ).parquet(path)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )
    from streams_prototyping_spark.streaming.pipelines import dedup_stream

    out = dedup_stream(stream, ["event_id"], "ts", watermark="2 days")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup01")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    n_state = _last_state_rows(q)
    q.stop()

    got = spark.table("dedup01").groupBy("event_id").count().collect()
    assert len(got) == n_events
    assert all(r["count"] == 1 for r in got), "a duplicate slipped through"
    assert n_state < n_events // 2, (
        f"dedup state holds {n_state} keys for {n_events} events — "
        "watermark horizon is not evicting"
    )


# ------------------------------------------------------------- kafka


def _kafka_connector_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def test_kafka_e2e_or_clean_skip(spark, tmp_path):
    """Real-broker Kafka e2e (reference Aggregations.java:64 runs
    against localhost:9092). Skips cleanly — with the reason in the
    report — when the connector jar or a broker is absent; with both
    present it round-trips delimited rows through a topic and back."""
    if not _kafka_connector_present(spark):
        pytest.skip("spark-sql-kafka connector not on classpath")
    bootstrap = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip("SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no broker)")

    from pyspark.sql import types as T

    from streams_prototyping_spark.streaming.sources import (
        create_stream,
        encode_delimited,
    )

    topic = f"sps_e2e_{int(time.time())}"
    df = spark.createDataFrame(
        [(1, 100, 2.5), (2, 200, -3.0)], "event_id long, ts_epoch long, value double"
    )
    (
        encode_delimited(df)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_epoch", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = create_stream(
        spark,
        topic,
        schema,
        transport="kafka",
        kafka_topic=topic,
        kafka_bootstrap=bootstrap,
        value_format="delimited",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("kafka_e2e")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.table("kafka_e2e").collect())
    assert got == [(1, 100, 2.5), (2, 200, -3.0)]


def test_kafka_record_shape_serde_roundtrip(spark):
    """The connector-independent half of the Kafka path (VERDICT r2
    item 4). Sandbox blocker, verified 2026-08-14: no spark-sql-kafka
    jar anywhere on disk and no network to fetch one (curl to Maven
    Central returns no route), so the real-broker e2e above must skip.
    What CAN be proven without the connector: our decode/encode layer
    consumes and produces records in the EXACT wire shape the Kafka
    source/sink contract defines — key/value as BINARY plus
    topic/partition/offset/timestamp/timestampType metadata columns on
    ingest (the reference's ByteArray/String serdes,
    Aggregations.java:65-68), and a value column on egress. If this
    passes, plugging in the jar changes only the transport, not the
    serde code path create_stream/write_kafka share with it."""
    import datetime as dt

    from pyspark.sql import types as T

    from streams_prototyping_spark.streaming.sources import (
        decode_delimited,
        encode_delimited,
    )

    schema = T.StructType(
        [
            T.StructField("impression_time", T.LongType()),
            T.StructField("impression_id", T.StringType()),
            T.StructField("user_id", T.StringType()),
            T.StructField("ad_id", T.StringType()),
        ]
    )
    # records exactly as spark.readStream.format("kafka").load() yields
    # them: binary key (ignored, like the reference's ByteArray serde),
    # binary CSV value, full metadata column set
    kafka_shape = (
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int"
    )
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (None, b"1700000000000,impression_745,user_41,ad_7", "impressions", 0, 0, t0, 0),
        (b"k1", b"1700000001000,impression_746,user_42,", "impressions", 1, 5, t0, 0),
        (None, b"1700000002000,,user_43,ad_9", "impressions", 0, 1, t0, 0),
    ]
    raw = spark.createDataFrame(rows, kafka_shape)

    typed = decode_delimited(raw, schema)
    got = [tuple(r) for r in typed.orderBy("impression_time").collect()]
    # empty wire fields decode to NULL (from_csv semantics; the
    # reference's split(",") would give "" — our encoder maps NULL->""
    # on egress so the round trip is stable)
    assert got == [
        (1700000000000, "impression_745", "user_41", "ad_7"),
        (1700000001000, "impression_746", "user_42", None),
        (1700000002000, None, "user_43", "ad_9"),
    ]

    # egress: encode back to the delimited wire value, re-ingest through
    # a binary value column (as the Kafka sink->source round trip would),
    # decode, and require value equality for non-empty fields
    wire = encode_delimited(typed).select(
        F.col("value").cast("binary").alias("value")
    )
    back = [
        tuple(r)
        for r in decode_delimited(wire, schema).orderBy("impression_time").collect()
    ]
    assert back == got


# ------------------------------------------------------- long-run soak


def _state_rows_per_batch(q) -> list:
    """numRowsTotal trajectory across every progress that reported a
    state operator (no-data ticks report an empty list and are skipped)."""
    out = []
    for p in q.recentProgress:
        ops = p.get("stateOperators") if isinstance(p, dict) else p["stateOperators"]
        if ops:
            out.append(max(op["numRowsTotal"] for op in ops))
    return out


def _write_chunk_parquet(path, order, names, arrays):
    """One micro-batch's worth of rows as a parquet file written with
    pyarrow directly (no Spark job per chunk: 55 chunks write in ~1 s),
    mtime forced to the chunk index so FileStreamSource replays them in
    order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    fp = os.path.join(path, f"chunk-{order:04d}.parquet")
    pq.write_table(pa.table(dict(zip(names, arrays))), fp)
    base_mtime = 1_700_000_000 + order * 10
    os.utime(fp, (base_mtime, base_mtime))
    return fp


def test_ingest_documents_soak_state_plateaus(spark, tmp_path):
    """VERDICT r4 item 7: drive the streaming ingest pipeline for >=50
    micro-batches at sustained rate and prove state PLATEAUS at the
    watermark-implied bound instead of growing with the corpus — the
    property that keeps a months-long 100 TB/day ingest job alive.

    55 one-minute chunks of 120 docs each (20% re-sends of the previous
    chunk's texts, exercising the dedup-by-state path every batch);
    watermark 5 minutes => steady-state keys ~= 6 chunks x ~100 fresh
    texts, vs ~5.5k distinct keys ingested overall."""
    import datetime as dt

    import pyarrow as pa

    from streams_prototyping_spark.streaming.pipelines import ingest_documents_stream

    n_chunks, per_chunk, resend = 55, 120, 24
    base = dt.datetime(2024, 1, 1)
    path = str(tmp_path / "soak_docs")
    for i in range(n_chunks):
        ids, texts, tss = [], [], []
        for j in range(per_chunk):
            if j < resend and i > 0:
                # re-send one of the previous chunk's FRESH texts (slots
                # >= resend are always first occurrences) under a new id
                src = (i - 1) * per_chunk + resend + j
                txt = f"Document body number {src} with unique payload."
            else:
                txt = f"Document body number {i * per_chunk + j} with unique payload."
            ids.append(i * per_chunk + j)
            texts.append(txt)
            tss.append(base + dt.timedelta(minutes=i, seconds=j % 60))
        _write_chunk_parquet(
            path, i,
            ["doc_id", "ingest_ts", "text"],
            [pa.array(ids, pa.int64()),
             pa.array(tss, pa.timestamp("us")),
             pa.array(texts, pa.string())],
        )

    stream = (
        spark.readStream.schema("doc_id long, ingest_ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = ingest_documents_stream(stream, dedup_watermark="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("soak_docs")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    traj = _state_rows_per_batch(q)
    q.stop()

    assert len(traj) >= 50, f"only {len(traj)} stateful micro-batches ran"
    # correctness across the whole soak: each distinct canonical text
    # emitted exactly once (re-sends deduped by state)
    emitted = spark.table("soak_docs").groupBy("norm_md5").count().collect()
    n_distinct = n_chunks * per_chunk - (n_chunks - 1) * resend
    assert len(emitted) == n_distinct
    assert all(r["count"] == 1 for r in emitted)
    # the bound: state NEVER exceeds the watermark-horizon key count —
    # 5-minute delay + in-chunk spread + the one-batch watermark lag
    # (the watermark applied to batch N is computed at the end of
    # batch N-1) holds ~9 chunks of keys; 10 is the hard ceiling
    horizon_bound = 10 * per_chunk
    assert max(traj) <= horizon_bound, (
        f"state peaked at {max(traj)} rows — above the watermark-implied "
        f"bound {horizon_bound}; eviction is not keeping up"
    )
    # the plateau: late-soak peak no higher than mid-soak peak (+20%
    # slack) — growth between the two windows means a leak
    mid_peak = max(traj[15:35])
    late_peak = max(traj[35:])
    assert late_peak <= mid_peak * 1.2, (
        f"state still growing late in the soak: mid peak {mid_peak}, "
        f"late peak {late_peak}"
    )


def test_stream_stream_join_soak_state_plateaus(spark, tmp_path):
    """The same >=50-batch soak for the reference's stream-stream left
    join (StreamStreamJoin.java topology): both buffers must plateau at
    (watermark + join window) seconds of data, not accumulate the full
    history. 55 one-minute chunks x 60 impressions (half clicked at
    +10 s, half never matched)."""
    import datetime as dt

    import pyarrow as pa

    from streams_prototyping_spark.streaming.pipelines import ads_with_clicks_stream

    n_chunks, per_chunk = 55, 60
    base = dt.datetime(2024, 1, 1)
    imp_path, clk_path = str(tmp_path / "soak_imp"), str(tmp_path / "soak_clk")
    for i in range(n_chunks):
        iid, uid, aid, its = [], [], [], []
        cu, cts, cid = [], [], []
        for j in range(per_chunk):
            user = i * 10_000 + j
            iid.append(i * 1_000 + j)
            uid.append(user)
            aid.append(j % 7)
            t = base + dt.timedelta(minutes=i, seconds=j % 50)
            its.append(t)
            if j % 2 == 0:  # half the impressions get a click +10 s
                cu.append(user)
                cts.append(t + dt.timedelta(seconds=10))
                cid.append(i * 1_000 + j)
        _write_chunk_parquet(
            imp_path, i,
            ["impression_id", "user_id", "ad_id", "imp_ts"],
            [pa.array(iid, pa.int64()), pa.array(uid, pa.int64()),
             pa.array(aid, pa.int64()), pa.array(its, pa.timestamp("us"))],
        )
        _write_chunk_parquet(
            clk_path, i,
            ["c_user_id", "click_ts", "click_id"],
            [pa.array(cu, pa.int64()), pa.array(cts, pa.timestamp("us")),
             pa.array(cid, pa.int64())],
        )

    imp = (
        spark.readStream.schema(
            "impression_id long, user_id long, ad_id long, imp_ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(imp_path)
    )
    clk = (
        spark.readStream.schema("c_user_id long, click_ts timestamp, click_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(clk_path)
    )
    joined = ads_with_clicks_stream(imp, clk, watermark="120 seconds")
    q = (
        joined.writeStream.format("memory")
        .queryName("soak_join")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    traj = _state_rows_per_batch(q)
    q.stop()

    assert len(traj) >= 50, f"only {len(traj)} stateful micro-batches ran"
    rows = spark.table("soak_join").collect()
    # every closed chunk emitted exactly its 60 impressions (clicked
    # matched, unclicked null-extended once); the last ~3 chunks may
    # still be open when the stream drains
    from collections import Counter

    per_imp = Counter(r.impression_id for r in rows)
    assert all(c == 1 for c in per_imp.values()), "duplicate emission"
    closed = [i for i in range(n_chunks - 4)]
    for i in closed[:: max(1, len(closed) // 10)]:  # sample every ~5th
        chunk_rows = [r for r in rows if i * 1_000 <= r.impression_id < i * 1_000 + per_chunk]
        assert len(chunk_rows) == per_chunk, (i, len(chunk_rows))
        assert sum(r.was_clicked for r in chunk_rows) == per_chunk // 2
    # state bound: (watermark 120 s + window 60 s) => at most ~4 open
    # minutes of imps + clicks per side, + eviction-granularity slack
    horizon_bound = 6 * (per_chunk + per_chunk // 2)
    assert max(traj) <= horizon_bound, (
        f"join state peaked at {max(traj)} rows (> {horizon_bound}): "
        "buffers are not evicting at the watermark horizon"
    )
    mid_peak = max(traj[15:35])
    late_peak = max(traj[35:])
    assert late_peak <= mid_peak * 1.2, (
        f"join state still growing: mid {mid_peak}, late {late_peak}"
    )
