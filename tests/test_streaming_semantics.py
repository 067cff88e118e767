"""Second streaming batch: the delimited wire format end-to-end,
session windows under streaming execution, and the watermark late-data
semantics that SURVEY §4.3 calls out as the one real divergence from
Kafka Streams (which keeps accepting late rows until state retention)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from streams_prototyping_spark.streaming.sources import (
    create_stream,
    decode_delimited,
    encode_delimited,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_epoch", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _run(df, name, mode):
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    return name


def test_delimited_transport_end_to_end(spark, sf_dir, tmp_path):
    """value_format='delimited' (reference StreamStreamJoin.java:30):
    CSV text files -> create_stream decode -> typed stream -> agg."""
    from streams_prototyping_spark.data import load_table

    ev = load_table(spark, sf_dir, "events").limit(200)
    lines = ev.select(
        F.concat_ws(
            ",", "event_id", F.unix_timestamp("ts"), "value"
        ).alias("value")
    )
    path = str(tmp_path / "wire")
    lines.coalesce(2).write.mode("overwrite").text(path)

    stream = create_stream(
        spark, "wire", SCHEMA, transport="file", path=path, value_format="delimited"
    )
    agg = stream.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    tbl = _run(agg, "wire_agg", "complete")
    got = spark.table(tbl).first()

    want = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    ).first()
    assert got.n == want.n == 200
    assert got.total == want.total


def test_delimited_codec_roundtrip_batch(spark):
    df = spark.createDataFrame(
        [(1, 1000, 2.5), (2, 2000, -3.25)], "event_id long, ts_epoch long, value double"
    )
    back = decode_delimited(encode_delimited(df), SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_session_window_streaming_converges(spark, sf_dir, tmp_path):
    """Append mode + sentinel: streaming session windows merge in
    STATE and only finalize when the watermark passes (complete mode
    does not re-merge sessions across micro-batches — a documented
    Spark behavior we pin here by testing the append path, which is
    also the mode a production sessionization job runs in)."""
    from streams_prototyping_spark.data import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value").limit(400)
    # sentinel: one far-future row pushes the watermark past every
    # real session so append mode emits them all, finalized
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(-1, max_ts, 0.0)], "user_id long, ts timestamp, value double"
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 HOURS"))
    # replay must be ROUGHLY time-ordered (like a real stream): random
    # file order would race the watermark and legitimately drop most
    # rows as late. FileStreamSource reads files in modification-time
    # order, so write time-sliced chunks sequentially.
    import time as _time

    path = str(tmp_path / "sess")
    all_rows = ev.unionByName(sentinel).orderBy("ts").collect()
    chunk = (len(all_rows) + 2) // 3
    for i in range(3):
        spark.createDataFrame(
            all_rows[i * chunk : (i + 1) * chunk], ev.schema
        ).coalesce(1).write.mode("append").parquet(path)
        _time.sleep(1.1)

    stream = create_stream(
        spark, "sess", ev.schema, transport="file", path=path, max_files_per_trigger=1
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "300 seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    tbl = _run(agg, "sess_stream", "append")
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.table(tbl).collect()
        if r.user_id != -1
    }

    batch = (
        spark.read.parquet(path)
        .filter(F.col("user_id") != -1)
        .groupBy(F.session_window("ts", "300 seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    want = {(r.user_id, r.session_start): r.n_events for r in batch.collect()}
    assert got == want


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    """SURVEY §4.3 semantic delta, pinned as a test: with a 30 s
    watermark in append mode, a row arriving AFTER its window's
    watermark has passed is dropped; Kafka Streams (no watermark, 24 h
    retention) would instead emit a revised aggregate. We document the
    Spark behavior deliberately — append emits each window ONCE, final.
    """
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def rows(*specs):
        return [(i, base + dt.timedelta(seconds=s), float(v)) for i, (s, v) in enumerate(specs)]

    schema = "event_id long, ts timestamp, value double"
    path = str(tmp_path / "late")
    # file 0: window [0,30) gets value 1; watermark pusher at +600 s
    spark.createDataFrame(rows((5, 1), (600, 99)), schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    agg = (
        stream.withWatermark("ts", "30 seconds")
        .groupBy(F.window("ts", "30 seconds").alias("w"))
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "total", "n")
    )
    q = agg.writeStream.format("memory").queryName("late_agg").outputMode("append").start()
    q.processAllAvailable()
    # file 1: a LATE row for the already-closed [0,30) window
    spark.createDataFrame(rows((10, 1000)), schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    q.processAllAvailable()
    q.stop()

    out = {r.ws: (r.total, r.n) for r in spark.table("late_agg").collect()}
    first_window = base
    assert out[first_window] == (1.0, 1), (
        "late row must NOT revise the closed window (it was dropped by the watermark)"
    )


def test_streaming_dedup_converges(spark, sf_dir, tmp_path):
    """Replay events with planted duplicates -> streaming dedup emits
    each event_id exactly once."""
    import time as _time

    from streams_prototyping_spark.data import load_table
    from streams_prototyping_spark.streaming.pipelines import dedup_stream

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value").limit(150)
    rows = ev.orderBy("ts").collect()
    path = str(tmp_path / "dup")
    # file 1: first 100; file 2: rows 50..150 (50 duplicates re-sent)
    spark.createDataFrame(rows[:100], ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    _time.sleep(1.1)
    spark.createDataFrame(rows[50:], ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = dedup_stream(stream, ["event_id"], "ts", watermark="30 days")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.table("dedup_stream_t").groupBy("event_id").count().collect()
    assert len(got) == 150
    assert all(r["count"] == 1 for r in got)


def test_hopping_window_streaming_converges(spark, sf_dir, tmp_path):
    """Hopping (sliding) windows under streaming execution converge to
    the batch twin (append + sentinel, time-ordered replay)."""
    import time as _time

    from streams_prototyping_spark.data import load_table

    ev = load_table(spark, sf_dir, "events").select("ts", "value").limit(300)
    max_ts = ev.agg(F.max("ts")).first()[0]
    # NOTE: the sentinel must flow THROUGH the watermark operator — a
    # pre-watermark filter that dropped it would freeze the watermark
    # at real-data time and the tail windows would never close. Its
    # own far-future windows are excluded from the compare by time.
    sentinel = spark.createDataFrame(
        [(max_ts, 0.0)], "ts timestamp, value double"
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 HOURS"))
    path = str(tmp_path / "hop")
    rows = ev.unionByName(sentinel).orderBy("ts").collect()
    half = len(rows) // 2
    for chunk in (rows[:half], rows[half:]):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        _time.sleep(1.1)

    stream = create_stream(
        spark, "hop", ev.schema, transport="file", path=path, max_files_per_trigger=1
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "300 seconds", "60 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    tbl = _run(agg, "hop_stream", "append")
    got = {r.ws: r.n for r in spark.table(tbl).collect() if r.ws <= max_ts}

    batch = (
        spark.read.parquet(path)
        .groupBy(F.window("ts", "300 seconds", "60 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    want = {r.ws: r.n for r in batch.collect() if r.ws <= max_ts}
    assert got == want


def test_rate_source_smoke(spark):
    """The rate transport produces schema-stable synthetic load."""
    s = create_stream(spark, "r", schema=None, transport="rate", rate_rows_per_sec=100)
    assert s.isStreaming
    assert set(s.columns) == {"timestamp", "value"}
    q = (
        s.writeStream.format("memory").queryName("rate_smoke").outputMode("append").start()
    )
    import time as _time

    _time.sleep(3)
    q.stop()
    assert spark.table("rate_smoke").count() > 0


def test_kafka_transport_fails_actionably_without_connector(spark):
    """No spark-sql-kafka jar in this container: the kafka transport
    must fail with an actionable message, not an opaque load error."""
    import pytest

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        create_stream(spark, "t", schema=None, transport="kafka", kafka_topic="t")


def test_ewma_stateful_stream_converges_to_batch_fold(spark, sf_dir, tmp_path):
    """The streaming EWMA (one state row per user) must produce the
    SAME final smoothed value as the batch fold over the full ordered
    history, regardless of micro-batch boundaries."""
    import time as _time

    from streams_prototyping_spark import registry
    from streams_prototyping_spark.streaming.pipelines import ewma_stateful_stream

    registry.load_all()
    from streams_prototyping_spark.data import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    rows = ev.orderBy("ts", "event_id").collect()
    path = str(tmp_path / "ewma")
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
        ewma_stateful_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_stream")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # last emitted row per user (max n_events) is the final state
    got: dict[int, tuple] = {}
    for r in spark.table("ewma_stream").collect():
        prev = got.get(r["user_id"])
        if prev is None or r["n_events"] > prev[0]:
            got[r["user_id"]] = (r["n_events"], r["ewma"])
    want = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in registry.QUERIES["ewma_per_user"](spark, sf_dir).collect()
    }
    assert got == want


def _has_protobuf() -> bool:
    """transformWithStateInPandas runs its Python state server over a
    protobuf protocol; this sandbox ships no google.protobuf (and no
    pip channel — PROBE_CONNECTORS.md §5), so the tws tests skip-gate
    exactly like the Kafka e2e."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no parent 'google' namespace at all
        return False


def test_tws_pipelines_construct_and_fail_actionably_without_protobuf(
    spark, tmp_path
):
    """Even without protobuf the pipelines must BUILD (the plan is
    JVM-side; the dependency bites only when the streaming Python
    runner boots), so users get a normal analyzed DataFrame and the
    missing-dependency error only at start() — pinned here so the seam
    stays honest."""
    from streams_prototyping_spark.streaming.pipelines import (
        dedup_ttl_stream,
        ewma_tws_stream,
    )

    src = tmp_path / "tws_probe"
    src.mkdir()
    ev = spark.readStream.schema(
        "user_id long, ts timestamp, event_id long, value double"
    ).parquet(str(src))
    df = ewma_tws_stream(ev)
    assert df.isStreaming and set(df.columns) == {"user_id", "n_events", "ewma"}
    d = dedup_ttl_stream(
        spark.readStream.schema("fingerprint string").parquet(str(src)),
        ttl_ms=1000,
    )
    assert d.isStreaming and set(d.columns) == {"fingerprint", "is_new", "n_copies"}


def test_ewma_transform_with_state_matches_legacy_and_batch(spark, sf_dir, tmp_path):
    """The transformWithStateInPandas twin (Spark 4 StatefulProcessor,
    RocksDB-backed typed ValueState) must land on the SAME final table
    as the batch fold — proving the modern stateful API carries the
    exact legacy applyInPandasWithState semantics before new operators
    build on it."""
    import time as _time

    import pytest

    if not _has_protobuf():
        pytest.skip("no google.protobuf in sandbox (tws state protocol)")

    from streams_prototyping_spark import registry
    from streams_prototyping_spark.data import load_table
    from streams_prototyping_spark.streaming.pipelines import ewma_tws_stream

    registry.load_all()
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    rows = ev.orderBy("ts", "event_id").collect()
    path = str(tmp_path / "ewma_tws")
    third = (len(rows) + 2) // 3
    for i in range(3):
        spark.createDataFrame(rows[i * third : (i + 1) * third], ev.schema).coalesce(
            1
        ).write.mode("append").parquet(path)
        _time.sleep(1.1)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        q = (
            ewma_tws_stream(stream)
            .writeStream.format("memory")
            .queryName("ewma_tws")
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    got: dict[int, tuple] = {}
    for r in spark.table("ewma_tws").collect():
        p = got.get(r["user_id"])
        if p is None or r["n_events"] > p[0]:
            got[r["user_id"]] = (r["n_events"], r["ewma"])
    want = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in registry.QUERIES["ewma_per_user"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_ttl_stream_cross_batch_and_expiry(spark, tmp_path):
    """The TTL ingest dedup: a fingerprint stays a duplicate across
    micro-batches while its state lives, and RE-ENTERS as new after the
    TTL horizon passes — the bounded-state contract for unbounded
    ingest. Also checks the no-TTL variant never forgets."""
    import time as _time

    import pytest

    from streams_prototyping_spark.streaming.pipelines import dedup_ttl_stream

    if not _has_protobuf():
        pytest.skip("no google.protobuf in sandbox (tws state protocol)")

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        for ttl_ms, expect_reentry in ((1500, True), (None, False)):
            src = str(tmp_path / f"src_{ttl_ms}")
            name = f"ttl_dedup_{ttl_ms}"
            q = (
                dedup_ttl_stream(
                    spark.readStream.schema("fingerprint string")
                    .option("maxFilesPerTrigger", 1)
                    .parquet(src),
                    ttl_ms=ttl_ms,
                )
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .start()
            )
            # batch 1: A twice + B once -> A new (2 copies), B new
            spark.createDataFrame(
                [("A",), ("A",), ("B",)], "fingerprint string"
            ).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
            # batch 2 (within TTL): A again -> duplicate
            spark.createDataFrame([("A",)], "fingerprint string").coalesce(
                1
            ).write.mode("append").parquet(src)
            q.processAllAvailable()
            rows = spark.table(name).collect()
            got = {(r.fingerprint, r.n_copies): r.is_new for r in rows}
            assert got[("A", 2)] is True and got[("B", 1)] is True
            assert got[("A", 3)] is False  # cross-batch state held
            # batch 3: after the horizon, A re-enters
            _time.sleep(2.5)
            spark.createDataFrame([("A",)], "fingerprint string").coalesce(
                1
            ).write.mode("append").parquet(src)
            q.processAllAvailable()
            q.stop()
            rows = spark.table(name).collect()
            last_a = max(
                (r for r in rows if r.fingerprint == "A"),
                key=lambda r: r.n_copies if r.is_new is False else 0,
            )
            a_flags = [
                (r.n_copies, r.is_new) for r in rows if r.fingerprint == "A"
            ]
            if expect_reentry:
                assert (1, True) in a_flags, a_flags  # state expired -> new again
            else:
                assert (4, False) in a_flags, a_flags  # never forgot
            del last_a
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_holt_stateful_stream_converges_exactly(spark, sf_dir, tmp_path):
    """The streaming Holt state (fixed-point integers) must equal the
    batch fold BIT-FOR-BIT — no float tolerance — regardless of
    micro-batch boundaries. This is the payoff of the quantized
    recurrence: streaming/batch parity becomes exact equality."""
    import time as _time

    from pyspark.sql import functions as F

    from streams_prototyping_spark import registry
    from streams_prototyping_spark.data import load_table
    from streams_prototyping_spark.operators.timeseries import HOLT_SCALE
    from streams_prototyping_spark.streaming.pipelines import holt_stateful_stream

    registry.load_all()
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_epoch"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * (HOLT_SCALE // 100))
            .cast("long")
            .alias("xs")
        )
    )
    rows = daily.orderBy("day_epoch", "event_type").collect()
    path = str(tmp_path / "holt_daily")
    third = (len(rows) + 2) // 3
    for i in range(3):
        spark.createDataFrame(rows[i * third : (i + 1) * third], daily.schema).coalesce(
            1
        ).write.mode("append").parquet(path)
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        holt_stateful_stream(stream)
        .writeStream.format("memory")
        .queryName("holt_stream")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got: dict[str, tuple] = {}
    for r in spark.table("holt_stream").collect():
        prev = got.get(r["event_type"])
        if prev is None or r["n_days"] > prev[0]:
            got[r["event_type"]] = (
                r["n_days"],
                r["level"],
                r["trend"],
                r["forecast_next"],
            )
    want = {
        r["event_type"]: (r["n_days"], r["level"], r["trend"], r["forecast_next"])
        for r in registry.QUERIES["holt_smoothing_daily"](spark, sf_dir).collect()
    }
    assert got == want  # exact equality, by fixed-point design


def test_per_record_changelog_emission(spark, tmp_path):
    """A17 closed (VERDICT r2 item 3): ctr_changelog_stream emits ONE
    update per INPUT RECORD — the reference's cache-disabled changelog
    (Aggregations.java:69) — not one per key per micro-batch. Replays
    7 joined records across 3 micro-batches (one batch carries 3 rows
    of the same ad, the case per-batch update mode collapses) and
    checks the full emitted sequence."""
    import datetime as dt

    from streams_prototyping_spark.streaming.pipelines import ctr_changelog_stream

    base = dt.datetime(2024, 1, 1)
    schema = "ad_id long, impression_id long, imp_ts timestamp, was_clicked boolean"

    def rows(*specs):
        return [
            (ad, imp, base + dt.timedelta(seconds=s), bool(c))
            for (ad, imp, s, c) in specs
        ]

    path = str(tmp_path / "awc")
    files = [
        rows((7, 1, 0, True), (7, 2, 5, False), (9, 3, 6, True)),
        # 3 records of ad 7 in ONE batch: update mode would emit 1 row,
        # the changelog must emit 3
        rows((7, 4, 10, False), (7, 5, 11, False), (7, 6, 12, True)),
        rows((9, 7, 20, False)),
    ]
    spark.createDataFrame(files[0], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = (
        ctr_changelog_stream(stream)
        .writeStream.format("memory")
        .queryName("ctr_changelog")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    for f in files[1:]:
        spark.createDataFrame(f, schema).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
    q.stop()

    out = spark.table("ctr_changelog").collect()
    n_input = sum(len(f) for f in files)
    assert len(out) == n_input, "exactly one emitted update per input record"

    by_ad: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.ad_id, r.seq)):
        by_ad.setdefault(r.ad_id, []).append(r)
    # seq is unbroken across the micro-batch boundary
    assert [r.seq for r in by_ad[7]] == [1, 2, 3, 4, 5]
    assert [r.seq for r in by_ad[9]] == [1, 2]
    # the changelog replays the exact per-record fold (imp_ts order)
    assert [(r.n_clicked, r.n_unclicked) for r in by_ad[7]] == [
        (1, 0), (1, 1), (1, 2), (1, 3), (2, 3)
    ]
    assert [r.impression_id for r in by_ad[7]] == [1, 2, 4, 5, 6]
    # final changelog row == the batch aggregate (convergence)
    last = by_ad[7][-1]
    assert (last.n_clicked, last.n_unclicked, last.ctr) == (2, 3, 2 / 5)


def test_stream_stream_join_state_eviction(spark, tmp_path):
    """SURVEY Part C' item 2, pinned (VERDICT r2 item 5): once both
    watermarks pass an impression's join window, (a) the null-extended
    left row emits EXACTLY once, and (b) the state row is evicted, so a
    late matching click is dropped rather than producing a second
    (matched) result — Kafka Streams 1.1 would emit both (eager
    duplicates); we implement the declared SQL semantics."""
    import datetime as dt

    from streams_prototyping_spark.streaming.pipelines import ads_with_clicks_stream

    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    imp_schema = "impression_id long, user_id long, ad_id long, imp_ts timestamp"
    clk_schema = "c_user_id long, click_ts timestamp, click_id long"
    imp_path, clk_path = str(tmp_path / "imp"), str(tmp_path / "clk")

    # batch 1: imp 1 (user 100) will never match; imp 2 (user 200)
    # matches click 501 inside the +/-60 s window
    spark.createDataFrame(
        [(1, 100, 11, ts(0)), (2, 200, 22, ts(5))], imp_schema
    ).coalesce(1).write.mode("overwrite").parquet(imp_path)
    spark.createDataFrame([(200, ts(10), 501)], clk_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(clk_path)

    imp = spark.readStream.schema(imp_schema).parquet(imp_path)
    clk = spark.readStream.schema(clk_schema).parquet(clk_path)
    joined = ads_with_clicks_stream(imp, clk, watermark="10 seconds")
    q = (
        joined.writeStream.format("memory")
        .queryName("awc_evict")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()

    # batch 2: advance BOTH watermarks far past imp 1's window
    # (watermark = 500-10 = 490 >> 0+60) -> imp 1's state is evictable
    spark.createDataFrame([(3, 300, 33, ts(500))], imp_schema).coalesce(1).write.mode(
        "append"
    ).parquet(imp_path)
    spark.createDataFrame([(300, ts(500), 502)], clk_schema).coalesce(1).write.mode(
        "append"
    ).parquet(clk_path)
    q.processAllAvailable()

    # batch 3: a LATE click for imp 1 — event time inside the join
    # window (t=30), but the click watermark is already at ~490
    spark.createDataFrame([(100, ts(30), 503)], clk_schema).coalesce(1).write.mode(
        "append"
    ).parquet(clk_path)
    q.processAllAvailable()
    # one more batch so any state-cleanup output flushes
    spark.createDataFrame([(4, 400, 44, ts(600))], imp_schema).coalesce(1).write.mode(
        "append"
    ).parquet(imp_path)
    spark.createDataFrame([(400, ts(600), 504)], clk_schema).coalesce(1).write.mode(
        "append"
    ).parquet(clk_path)
    q.processAllAvailable()
    progress = q.lastProgress
    q.stop()

    rows_imp1 = [
        r for r in spark.table("awc_evict").collect() if r.impression_id == 1
    ]
    # exactly ONE result for the unmatched impression: null-extended,
    # emitted after the watermark closed its window; the late click 503
    # was dropped (state evicted), not joined
    assert len(rows_imp1) == 1, rows_imp1
    assert rows_imp1[0].click_id is None and rows_imp1[0].was_clicked is False
    all_clicks = {
        r.click_id for r in spark.table("awc_evict").collect() if r.click_id
    }
    assert 503 not in all_clicks
    # and the join's state is bounded: far fewer rows than a
    # retain-everything buffer (imp 1/2 + old clicks must be gone)
    state = (progress or {}).get("stateOperators") or []
    if state:
        assert state[0]["numRowsTotal"] <= 4, state[0]


def test_source_cap_admission_converges_to_batch(spark, sf_dir, tmp_path):
    """Streaming per-source admission cap (the ingest twin of
    source_doc_cap): replayed in time-ordered file chunks, the admitted
    set must equal the batch 'first CAP docs per source by
    (ingest_ts, doc_id)' — including the cross-batch counter carry
    (a source whose cap is half-used by chunk 1 admits exactly the
    remainder from chunk 2)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from streams_prototyping_spark.data import load_table
    from streams_prototyping_spark.streaming.pipelines import (
        source_cap_admission_stream,
    )

    CAP = 13
    t0 = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .withColumn("ingest_ts", t0 + F.make_interval(secs=F.col("doc_id") % 600))
    )
    # two time-ordered replay chunks -> counter must carry across batches
    path = str(tmp_path / "docs")
    docs.filter(F.col("doc_id") % 600 < 300).coalesce(1).write.parquet(f"{path}/c1")
    docs.filter(F.col("doc_id") % 600 >= 300).coalesce(1).write.parquet(f"{path}/c2")
    stream = (
        spark.readStream.schema("doc_id long, source string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/c*")
    )
    q = (
        source_cap_admission_stream(stream, cap=CAP)
        .writeStream.format("memory")
        .queryName("cap_admit")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.source, r.admit_seq)
        for r in spark.table("cap_admit").collect()
    }
    w = Window.partitionBy("source").orderBy("ingest_ts", "doc_id")
    want = {
        (r.doc_id, r.source, r.admit_seq)
        for r in docs.select(
            "doc_id", "source", F.row_number().over(w).alias("admit_seq")
        )
        .filter(F.col("admit_seq") <= CAP)
        .collect()
    }
    assert got == want
    # and the cap actually bound: every source is exactly at CAP here
    per_src = {}
    for _, s, _ in got:
        per_src[s] = per_src.get(s, 0) + 1
    assert all(v == CAP for v in per_src.values())


def test_source_cap_admission_spans_arrow_chunks(spark, tmp_path):
    """applyInPandasWithState delivers a large group's micro-batch as
    MULTIPLE Arrow chunks (arrow.maxRecordsPerBatch). The admitted set
    must still be 'first CAP by (ingest_ts, doc_id)' over the WHOLE
    micro-batch — a per-chunk sort admits whichever rows arrived in the
    early chunks instead (ADVICE r7). Rows are written in DESCENDING
    event-time order so storage order disagrees with event order: with
    chunked per-chunk sorting, the old code admitted the LATEST rows."""
    import pyspark.sql.functions as F

    from streams_prototyping_spark.streaming.pipelines import (
        source_cap_admission_stream,
    )

    N, CAP, CHUNK = 500, 100, 50
    t0 = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    rows = (
        spark.range(N)
        .select(
            F.col("id").alias("doc_id"),
            F.lit("s0").alias("source"),
            (t0 + F.make_interval(secs=(N - 1) - F.col("id"))).alias("ingest_ts"),
        )
        .orderBy("doc_id")  # storage order = descending ingest_ts
    )
    path = str(tmp_path / "docs")
    rows.coalesce(1).write.parquet(path)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(CHUNK))
    try:
        stream = spark.readStream.schema(
            "doc_id long, source string, ingest_ts timestamp"
        ).parquet(path)
        q = (
            source_cap_admission_stream(stream, cap=CAP)
            .writeStream.format("memory")
            .queryName("cap_admit_chunks")
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    got = {
        (r.doc_id, r.admit_seq)
        for r in spark.table("cap_admit_chunks").collect()
    }
    # earliest ingest_ts = highest doc_id: first CAP by event time are
    # doc_ids N-1 .. N-CAP, admit_seq 1..CAP in that order
    want = {(N - 1 - i, i + 1) for i in range(CAP)}
    assert got == want


def test_token_cap_admission_converges_to_batch(spark, sf_dir, tmp_path):
    """Streaming per-source TOKEN budget (VERDICT r7 item 5): replayed
    in time-ordered chunks, the admitted set must equal the batch
    'prefix of (ingest_ts, doc_id) order whose cumulative tokens fit
    the budget' — cumsum counts ALL docs (monotone prefix), and the
    counter carries across micro-batches."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from streams_prototyping_spark.data import load_table
    from streams_prototyping_spark.streaming.pipelines import (
        token_cap_admission_stream,
    )

    BUDGET = 700
    t0 = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .withColumn("ingest_ts", t0 + F.make_interval(secs=F.col("doc_id") % 600))
    )
    path = str(tmp_path / "docs")
    docs.filter(F.col("doc_id") % 600 < 300).coalesce(1).write.parquet(f"{path}/c1")
    docs.filter(F.col("doc_id") % 600 >= 300).coalesce(1).write.parquet(f"{path}/c2")
    stream = (
        spark.readStream.schema(
            "doc_id long, source string, n_tokens long, ingest_ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/c*")
    )
    q = (
        token_cap_admission_stream(stream, budget=BUDGET)
        .writeStream.format("memory")
        .queryName("tok_admit")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.source, r.n_tokens, r.cum_tokens)
        for r in spark.table("tok_admit").collect()
    }
    w = (
        Window.partitionBy("source")
        .orderBy("ingest_ts", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.doc_id, r.source, r.n_tokens, r.cum_tokens)
        for r in docs.select(
            "doc_id",
            "source",
            "n_tokens",
            F.sum("n_tokens").over(w).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= BUDGET)
        .collect()
    }
    assert got == want
    assert got  # the budget actually admitted something
    # and it actually bound: at least one source was cut off
    n_all = docs.count()
    assert len(got) < n_all


def test_token_cap_windowed_budget_and_state_expiry(spark, tmp_path):
    """Windowed mode: the budget resets per (source, event-time
    window) — tokens-per-window rate limiting — and state for closed
    windows is dropped by the event-time timeout instead of
    accumulating forever."""
    import pyspark.sql.functions as F

    from streams_prototyping_spark.streaming.pipelines import (
        token_cap_admission_stream,
    )

    WIN, BUDGET, LATE = 60, 100, 30
    t0 = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    # one source, 3 windows x 5 docs x 30 tokens: budget 100 admits
    # exactly 3 docs (cum 30,60,90; the 4th would hit 120) per window
    rows = spark.range(15).select(
        F.col("id").alias("doc_id"),
        F.lit("s0").alias("source"),
        F.lit(30).cast("long").alias("n_tokens"),
        (t0 + F.make_interval(secs=F.col("id") * 12)).alias("ingest_ts"),
    )
    path = str(tmp_path / "docs")
    # time-ordered replay in 3 chunks so windows close as the
    # watermark advances past them
    for i in range(3):
        rows.filter((F.col("doc_id") >= i * 5) & (F.col("doc_id") < (i + 1) * 5)) \
            .coalesce(1).write.parquet(f"{path}/c{i}")
    stream = (
        spark.readStream.schema(
            "doc_id long, source string, n_tokens long, ingest_ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/c*")
    )
    q = (
        token_cap_admission_stream(
            stream, budget=BUDGET, window_seconds=WIN, lateness_seconds=LATE
        )
        .writeStream.format("memory")
        .queryName("tok_admit_win")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    progress = q.lastProgress
    q.stop()
    got = {
        (r.doc_id, r.win_start, r.cum_tokens)
        for r in spark.table("tok_admit_win").collect()
    }
    # doc i is at t = 12i s -> window floor(12i/60)*60; docs 0..4 in
    # win 0, 5..9 in win 60, 10..14 in win 120; first 3 of each admitted
    base = 1717200000  # irrelevant absolute epoch; compute from data
    wins = sorted({w for _, w, _ in got})
    assert len(wins) == 3 and wins[1] - wins[0] == 60 and wins[2] - wins[1] == 60
    per_win = {}
    for _, w, c in got:
        per_win.setdefault(w, []).append(c)
    assert all(sorted(v) == [30, 60, 90] for v in per_win.values())
    # state expiry: closed windows' state was removed by the event-time
    # timeout — total state rows stay below the total window count
    state = (progress or {}).get("stateOperators") or []
    if state:
        assert state[0]["numRowsTotal"] <= 2, state[0]
