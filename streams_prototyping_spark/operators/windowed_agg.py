"""The reference's App 1 — windowed AVG aggregation pipeline.

Reference: Aggregations.java (apurvam/streams-prototyping). Topology
(Aggregations.java:79-149): stream("orders") -> mapValues projection
(x2 = order_value*2; :86-94) -> groupBy constant key (:96) -> 30 s
tumbling window (:97-98) -> custom fold (sum(x2), sum(v), count)
(:100-129) -> mapValues division to averages (:131-139) -> toStream
with "{winStart}-{winEnd}-{key}" formatted key (:141-148) -> sink.
Declared KSQL intent (Aggregations.java:75-77):
  SELECT constant_key, avg(order_total*2), avg(order_total)
  FROM orders GROUP BY constant_key  [30 s window realized at :98]

Spark-first mapping: the hand-rolled partial aggregation (sums+count
then divide) IS Spark's HashAggregate partial/final split, so the whole
topology is a single declarative groupBy — Catalyst handles projection
pushdown (the reference does it by hand, :87) and map-side partial agg.

Driver-table mapping (FIXTURES.md §2): orders.o_orderdate -> event
time, orders.o_totalprice -> order_value.

Scale notes: tumbling-window groupBy is a single hash-aggregate
shuffle keyed by (window, key) — partial combine on the map side means
shuffle volume is O(distinct windows), not O(rows). No skew risk: window
keys are uniformly time-distributed. At 100 TB this is the canonical
cheap aggregation; nothing to tune beyond AQE partition coalescing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.operators.common import dsum_sql
from streams_prototyping_spark.registry import register

WINDOW_S = 30  # Aggregations.java:98 — TimeWindows.of(30_000)

_WINDOWED_AVG_ORACLE = f"""
WITH projected AS (
    -- reference Aggregations.java:86-94: keep only the values needed
    SELECT CAST(floor(epoch(o_orderdate)/{WINDOW_S})*{WINDOW_S} AS BIGINT) AS window_start,
           o_totalprice * 2 AS x2,
           o_totalprice AS v
    FROM orders
)
SELECT window_start,
       window_start + {WINDOW_S} AS window_end,
       '0' AS group_key,
       {dsum_sql('x2')} / count(*) AS avg_x2,
       {dsum_sql('v')} / count(*) AS avg_v,
       count(*) AS n_orders,
       window_start || '-' || (window_start + {WINDOW_S}) || '-0' AS wkey
FROM projected
GROUP BY window_start
"""


@register("windowed_avg", oracle=_WINDOWED_AVG_ORACLE)
def windowed_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query: 30 s tumbling-window avg(x*2), avg(x) on orders.

    Covers SURVEY §2 A3 (projection w/ computed column), A5 (constant
    group key), A7 (tumbling window), A8+A9 (partial sums+count then
    final divide — expressed declaratively), A14 (formatted window
    key), B3 (avg over expression).
    """
    orders = load_table(spark, sf_dir, "orders")
    projected = orders.select(
        F.col("o_orderdate").alias("ts"),
        (F.col("o_totalprice") * 2).alias("x2"),
        F.col("o_totalprice").alias("v"),
    )
    win = F.window("ts", f"{WINDOW_S} seconds")
    agg = (
        projected.groupBy(win.alias("w"), F.lit("0").alias("group_key"))
        .agg(
            # exact decimal sums -> deterministic doubles (see common.py);
            # Spark still plans this as partial+final HashAggregate.
            F.sum(F.col("x2").cast("decimal(18,2)")).alias("sum_x2"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("sum_v"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return agg.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"),
        F.unix_timestamp(F.col("w.end")).alias("window_end"),
        "group_key",
        (F.col("sum_x2").cast("double") / F.col("n_orders")).alias("avg_x2"),
        (F.col("sum_v").cast("double") / F.col("n_orders")).alias("avg_v"),
        "n_orders",
        F.concat_ws(
            "-",
            F.unix_timestamp(F.col("w.start")),
            F.unix_timestamp(F.col("w.end")),
            F.col("group_key"),
        ).alias("wkey"),
    )


_CSV_ROUNDTRIP_ORACLE = """
SELECT o_orderkey,
       o_orderstatus,
       o_totalprice,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch
FROM orders
"""


@register("csv_roundtrip", oracle=_CSV_ROUNDTRIP_ORACLE)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimited-CSV codec (SURVEY §2 A2/A16): encode rows to the
    reference's wire format (comma-delimited string,
    StreamStreamJoin.java:30 value_format='delimited') then decode with
    from_csv back to typed columns. The oracle selects the raw fields —
    it matches iff the codec round-trips losslessly.

    Scale note: encode/decode are pure JVM expressions inside
    whole-stage codegen (no UDF); parse once at ingest, per SURVEY §1.1
    (the reference re-parses at every operator — we don't).
    """
    orders = load_table(spark, sf_dir, "orders")
    encoded = orders.select(
        F.concat_ws(
            ",",
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.col("o_totalprice"),
            F.unix_timestamp("o_orderdate"),
        ).alias("value")
    )
    schema = "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, order_epoch BIGINT"
    return encoded.select(F.from_csv("value", schema).alias("r")).select("r.*")


_AVRO_ROUNDTRIP_ORACLE = """
SELECT o_orderkey,
       o_orderstatus,
       o_totalprice,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch
FROM orders
"""


@register("avro_roundtrip", oracle=_AVRO_ROUNDTRIP_ORACLE)
def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro Object Container File codec round trip (the reference ships
    Avro datagen schemas — src/main/resources/impressions.avro,
    click.avro): encode the orders table to sync-framed deflate Avro
    part files (one per partition, written inside the executors), then
    read them back with one task per file. The oracle selects the raw
    fields — it matches iff the container format round-trips
    losslessly. Timestamps travel as epoch longs, the reference
    datagen's own unix_long convention.

    Scale note: write and read both parallelize per file with no
    driver data movement (sources/batch.py write_avro/read_avro);
    when the external spark-avro module is present read_avro switches
    to the vectorized JVM scan with no caller change.
    """
    import hashlib
    import os
    import tempfile

    from streams_prototyping_spark.sources.batch import read_avro, write_avro

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
    )
    # key the temp path by session as well as sf_dir: two concurrent
    # sessions on one machine (bench + pytest against the same sf_dir)
    # must not race write_avro's rmtree against the other's read
    tag = hashlib.md5(
        f"{sf_dir}:{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_avro_{tag}")
    # r11 (guide §2.6/§4): the pure-Python codec is CPU-bound, so the
    # part count follows the cluster's parallelism (floored at the
    # historical 8) instead of pinning 8 tasks onto however many cores
    # exist — write and read both parallelize per file. At production
    # scale part files are sized by bytes (~128-512 MB each), not count;
    # here rows-per-part at any driver SF stays far below that bound.
    n_parts = max(8, spark.sparkContext.defaultParallelism)
    write_avro(orders.repartition(n_parts), path)
    return read_avro(spark, path)


_GLOBAL_AVG_ORACLE = f"""
SELECT '0' AS group_key,
       {dsum_sql('o_totalprice * 2')} / count(*) AS avg_x2,
       {dsum_sql('o_totalprice')} / count(*) AS avg_v,
       count(*) AS n_orders
FROM orders
"""


@register("global_avg", oracle=_GLOBAL_AVG_ORACLE)
def global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-key global aggregate (SURVEY §2 A5 — groupBy((k,v)->"0"),
    Aggregations.java:96) without the window: the declared KSQL query's
    GROUP BY constant_key (Aggregations.java:75-77).

    Scale note: a global aggregate is the textbook partial-agg case —
    every partition combines locally, a single tiny final reduce. The
    constant key is NOT a skew problem because only partial results
    (one row per partition) reach the single reducer.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.lit("0").alias("group_key"))
        .agg(
            F.sum((F.col("o_totalprice") * 2).cast("decimal(18,2)")).alias("sx2"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sv"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "group_key",
            (F.col("sx2").cast("double") / F.col("n_orders")).alias("avg_x2"),
            (F.col("sv").cast("double") / F.col("n_orders")).alias("avg_v"),
            "n_orders",
        )
    )


_JSON_ROUNDTRIP_ORACLE = """
SELECT o_orderkey,
       o_orderstatus,
       o_totalprice,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch
FROM orders
"""


@register("json_roundtrip", oracle=_JSON_ROUNDTRIP_ORACLE)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines codec round trip (SURVEY §2 A16 serde surface — the
    third wire format next to csv_roundtrip and avro_roundtrip; KSQL
    streams declare value_format='json' as commonly as 'delimited'):
    encode rows with to_json(struct(...)), decode with from_json
    against the explicit schema. The oracle selects the raw fields —
    it matches iff the codec is lossless, including the
    double-precision price (Jackson's shortest-representation doubles
    reparse exactly).

    Scale note: both directions are JVM expressions inside whole-stage
    codegen — no files, no UDF, no Python; the schema is explicit so
    decode is single-pass with no inference scan (sources/batch.py
    read_json applies the same rule to on-disk JSON).
    """
    orders = load_table(spark, sf_dir, "orders")
    encoded = orders.select(
        F.to_json(
            F.struct(
                F.col("o_orderkey"),
                F.col("o_orderstatus"),
                F.col("o_totalprice"),
                F.unix_timestamp("o_orderdate").alias("order_epoch"),
            )
        ).alias("value")
    )
    schema = "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, order_epoch BIGINT"
    return encoded.select(F.from_json("value", schema).alias("r")).select("r.*")
