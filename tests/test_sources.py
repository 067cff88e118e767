"""Batch source connectors: CSV / JSON / delimited-text ingestion with
explicit schemas round-trips the parquet truth."""

import pyspark.sql.functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.sources.batch import (
    read_csv,
    read_delimited_text,
    read_json,
)


def _nation_rows(spark, sf_dir):
    return sorted(map(tuple, load_table(spark, sf_dir, "nation").collect()))


def test_csv_source(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "csv")
    n.coalesce(1).write.option("header", True).mode("overwrite").csv(path)
    back = read_csv(spark, path, n.schema)
    assert sorted(map(tuple, back.collect())) == _nation_rows(spark, sf_dir)


def test_json_source(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "json")
    n.coalesce(1).write.mode("overwrite").json(path)
    back = read_json(spark, path, n.schema)
    assert sorted(map(tuple, back.collect())) == _nation_rows(spark, sf_dir)


def test_delimited_text_source(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "txt")
    n.select(
        F.concat_ws(",", "n_nationkey", "n_name", "n_regionkey").alias("value")
    ).coalesce(1).write.mode("overwrite").text(path)
    back = read_delimited_text(spark, path, n.schema)
    assert sorted(map(tuple, back.collect())) == _nation_rows(spark, sf_dir)


def test_csv_failfast_surfaces_corruption(spark, tmp_path):
    """FAILFAST mode raises on malformed rows instead of silently
    nulling them — corruption must be loud at 100 TB."""
    import pytest
    from pyspark.sql import types as T

    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("k,v\n1,2.5\nnot_an_int,oops\n")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((PySparkException, Py4JJavaError)):
        read_csv(spark, str(p), schema).collect()


def test_encode_delimited_null_field_keeps_positions(spark):
    """A null mid-row field must still emit its delimiter (concat_ws
    alone would skip it and shift every later column on decode)."""
    from streams_prototyping_spark.streaming.sources import (
        decode_delimited,
        encode_delimited,
    )

    df = spark.createDataFrame(
        [(1, None, "x"), (2, "b", None)], "id int, mid string, tail string"
    )
    encoded = [r.value for r in encode_delimited(df).orderBy("value").collect()]
    assert encoded == ["1,,x", "2,b,"]
    back = decode_delimited(
        encode_delimited(df).selectExpr("value"), df.schema
    )
    got = sorted(map(tuple, back.collect()))
    assert got == [(1, None, "x"), (2, "b", None)]


def test_json_codec_roundtrip_batch(spark):
    from pyspark.sql import types as T

    from streams_prototyping_spark.streaming.sources import decode_json, encode_json

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_epoch", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, 1000, 2.5), (2, 2000, -3.25), (3, None, None)],
        "event_id long, ts_epoch long, value double",
    )
    back = decode_json(encode_json(df), schema)
    assert sorted(map(tuple, back.collect()), key=str) == sorted(
        map(tuple, df.collect()), key=str
    )


def test_json_stream_transport_end_to_end(spark, sf_dir, tmp_path):
    """value_format='json' through create_stream: JSON-lines files ->
    typed stream -> agg, converging to the batch source."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from streams_prototyping_spark.data import load_table
    from streams_prototyping_spark.streaming.sources import create_stream, encode_json

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_timestamp("ts").alias("ts_epoch"), "value"
    ).limit(200)
    path = str(tmp_path / "jsonwire")
    encode_json(ev).coalesce(2).write.mode("overwrite").text(path)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_epoch", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = create_stream(
        spark, "jsonwire", schema, transport="file", path=path, value_format="json"
    )
    agg = stream.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("jsonwire_agg")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("jsonwire_agg").first()
    want = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    ).first()
    assert (got.n, got.total) == (want.n, want.total) and got.n == 200


def test_load_table_normalizes_events_ts_encodings(spark, tmp_path):
    """The driver regenerates testdata between rounds and the events.ts
    encoding has drifted (TIMESTAMP(NANOS) in one round, naive micros
    read as TIMESTAMP_NTZ in the next). load_table must yield a plain
    UTC TIMESTAMP either way — epoch casts downstream depend on it."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from streams_prototyping_spark.data import load_table

    base = 1_704_067_200_000_000  # 2024-01-01 in micros
    rows = {
        "event_id": [1, 2],
        "ts": pa.array([base, base + 61_000_000], type=pa.timestamp("us")),
        "user_id": [7, 8],
        "event_type": ["view", "click"],
        "value": [1.5, 2.5],
        "props": ["{}", "{}"],
    }
    d = tmp_path / "ntz"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "events.parquet"))
    df = load_table(spark, str(d), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = {r.event_id: r.epoch for r in df.selectExpr(
        "event_id", "CAST(ts AS BIGINT) AS epoch").collect()}
    assert got == {1: base // 1_000_000, 2: base // 1_000_000 + 61}

    # nanos-as-long legacy encoding: same instants, same result
    rows["ts"] = pa.array(
        [base * 1000, (base + 61_000_000) * 1000], type=pa.timestamp("ns")
    )
    d2 = tmp_path / "nanos"
    d2.mkdir()
    pq.write_table(pa.table(rows), str(d2 / "events.parquet"))
    df2 = load_table(spark, str(d2), "events")
    assert isinstance(df2.schema["ts"].dataType, T.TimestampType)
    got2 = {r.event_id: r.epoch for r in df2.selectExpr(
        "event_id", "CAST(ts AS BIGINT) AS epoch").collect()}
    assert got2 == got


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC round trip of a real table plus the scan-level property the
    format exists for: predicate pushdown reaches the ORC scan just as
    it does for parquet, so format choice never changes plan quality."""
    from streams_prototyping_spark.sources.batch import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders").limit(2000)
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)

    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert [f.name for f in back.schema.fields] == [
        f.name for f in orders.schema.fields
    ]
    want = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    ).first()[0]
    got = back.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    ).first()[0]
    assert got == want

    filtered = back.where(F.col("o_totalprice") > 1000.0)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan


def test_avro_missing_path_fails_actionably(spark, tmp_path):
    """No files -> a clear FileNotFoundError naming the path (the
    spark-avro module is absent in this sandbox, so the pure-Python
    fallback handles the error surface)."""
    import pytest

    from streams_prototyping_spark.sources.batch import read_avro

    with pytest.raises(FileNotFoundError, match="nope"):
        read_avro(spark, str(tmp_path / "nope"))


def test_avro_distributed_roundtrip_orders(spark, sf_dir, tmp_path):
    """Distributed Avro round trip of a real table: write one container
    file per partition from inside the executors, read back with one
    task per file, values preserved exactly. Mirrors the ORC round
    trip so format choice never changes results (timestamps travel as
    epoch longs — the reference's own datagen schemas model time as
    unix_long)."""
    from streams_prototyping_spark.sources.batch import read_avro, write_avro

    orders = (
        load_table(spark, sf_dir, "orders")
        .limit(2000)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.unix_timestamp("o_orderdate").alias("order_epoch"),
        )
        .repartition(4)
    )
    n_rows = orders.count()
    path = str(tmp_path / "orders_avro")
    parts = write_avro(orders, path)
    assert 1 <= len(parts) <= 4 and sum(n for _, n in parts) == n_rows

    back = read_avro(spark, path)
    assert [f.name for f in back.schema.fields] == list(orders.columns)
    assert back.count() == n_rows
    want = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
        F.sum("order_epoch"),
    ).first()
    got = back.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
        F.sum("order_epoch"),
    ).first()
    assert tuple(got) == tuple(want)


def test_avro_datagen_shaped_impressions(spark, tmp_path):
    """End-to-end with records shaped like the reference's datagen
    schemas (src/main/resources/impressions.avro: impresssiontime
    unix_long, impressionid string, userid/adid keyed strings —
    reference file, reproduced by field name only): write via the
    pure-Python OCF writer, read distributed, run the CTR-style
    aggregate the reference's topology computes over this stream."""
    from streams_prototyping_spark.sources import avro_py
    from streams_prototyping_spark.sources.batch import read_avro

    schema = {
        "type": "record",
        "name": "impressions",
        "fields": [
            {"name": "impresssiontime", "type": "long"},
            {"name": "impressionid", "type": "string"},
            {"name": "userid", "type": "string"},
            {"name": "adid", "type": ["null", "string"]},
        ],
    }
    recs = [
        {
            "impresssiontime": 1 + 10 * i,
            "impressionid": f"imp_{i}",
            "userid": f"user_{i % 7}",
            "adid": None if i % 11 == 0 else f"ad_{i % 5}",
        }
        for i in range(1000)
    ]
    d = tmp_path / "imps"
    d.mkdir()
    avro_py.write_avro_file(str(d / "part-00000.avro"), schema, recs[:500])
    avro_py.write_avro_file(
        str(d / "part-00001.avro"), schema, recs[500:], codec="null"
    )

    df = read_avro(spark, str(d))
    assert df.schema["adid"].nullable and not df.schema["userid"].nullable
    per_ad = {
        r.adid: r.n
        for r in df.where(F.col("adid").isNotNull())
        .groupBy("adid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want: dict = {}
    for r in recs:
        if r["adid"] is not None:
            want[r["adid"]] = want.get(r["adid"], 0) + 1
    assert per_ad == want


def test_avro_unsupported_schema_names_the_fragment(spark):
    """Types outside the supported surface fail naming the exact
    fragment (and timestamps point at the epoch-long convention)."""
    import pytest
    from pyspark.sql import types as T

    from streams_prototyping_spark.sources import avro_py

    with pytest.raises(NotImplementedError, match="fixed"):
        avro_py.spark_struct_of(
            {
                "type": "record",
                "name": "t",
                "fields": [{"name": "f", "type": "fixed"}],
            }
        )
    with pytest.raises(NotImplementedError, match="epoch longs"):
        avro_py.avro_schema_of(
            T.StructType([T.StructField("ts", T.TimestampType())])
        )


def test_write_avro_rejects_unimplemented_modes(spark, tmp_path):
    """ADVICE r4: write_avro accepted mode='append' but silently
    overwrote colliding part files — data loss presented as success.
    Non-overwrite modes must refuse loudly."""
    import pytest

    from streams_prototyping_spark.sources.batch import write_avro

    df = spark.range(5).select(F.col("id").alias("k"))
    for mode in ("append", "error", "ignore"):
        with pytest.raises(NotImplementedError, match="overwrite"):
            write_avro(df, str(tmp_path / "avro_mode"), mode=mode)


def test_dataset_cache_key_tracks_regeneration(tmp_path):
    """ADVICE r4: adaptive-depth caches keyed only by sf_dir go stale
    when the dataset at that path is regenerated; the key must change
    with the parquet's mtime (file and part-directory layouts both)."""
    import os

    from streams_prototyping_spark.data import dataset_cache_key

    f = tmp_path / "embeddings.parquet"
    f.write_bytes(b"x")
    k1 = dataset_cache_key(str(tmp_path), "embeddings")
    os.utime(f, (1000, 2000))
    k2 = dataset_cache_key(str(tmp_path), "embeddings")
    assert k1 != k2

    # directory layout: max part mtime
    d = tmp_path / "orders.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"a")
    k3 = dataset_cache_key(str(tmp_path), "orders")
    p2 = d / "part-1.parquet"
    p2.write_bytes(b"b")
    os.utime(p2, (9999999999, 9999999999))
    k4 = dataset_cache_key(str(tmp_path), "orders")
    assert k3 != k4

    # missing dataset: stable sentinel, no raise
    assert dataset_cache_key(str(tmp_path), "lineitem")[2] == 0.0
