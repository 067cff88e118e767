"""The two reference apps rebuilt line-by-line through the
Kafka-Streams-shaped topology API must equal the registered
declarative queries — the 'port your topology 1:1' compatibility claim.
"""

import pyspark.sql.functions as F

from streams_prototyping_spark import topology as tp
from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import QUERIES, load_all

load_all()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_aggregations_topology_matches_declarative(spark, sf_dir):
    """reference Aggregations.java:79-149 as a topology chain."""
    orders = load_table(spark, sf_dir, "orders")

    result = (
        tp.stream(orders.withColumnRenamed("o_orderdate", "ts"))
        .map_values(  # :86-94 — project, compute x2, drop other fields
            ts=F.col("ts"),
            x2=F.col("o_totalprice") * 2,
            v=F.col("o_totalprice"),
        )
        .group_by(F.lit("0"))  # :96 — constant key
        .windowed_by("ts", 30)  # :97-98
        .aggregate(  # :100-129 — sums+count fold
            sum_x2=F.sum(F.col("x2").cast("decimal(18,2)")),
            sum_v=F.sum(F.col("v").cast("decimal(18,2)")),
            n_orders=F.count(F.lit(1)),
        )
        .map_values(  # :131-139 — final division
            avg_x2=F.col("sum_x2").cast("double") / F.col("n_orders"),
            avg_v=F.col("sum_v").cast("double") / F.col("n_orders"),
            n_orders=F.col("n_orders"),
        )
        .to_stream()  # :141-148 — "{start}-{end}-{key}" key
        .to_df()
    )

    declarative = QUERIES["windowed_avg"](spark, sf_dir)
    got = _rows(result.select("wkey", "avg_x2", "avg_v", "n_orders"))
    want = _rows(declarative.select("wkey", "avg_x2", "avg_v", "n_orders"))
    assert got == want


def test_join_topology_matches_declarative(spark, sf_dir):
    """reference StreamStreamJoin.java:61-145 as a topology chain."""
    ev = load_table(spark, sf_dir, "events")
    impressions = (
        tp.stream(
            ev.filter(F.col("event_type") == "view").select(
                F.col("event_id").alias("impression_id"),
                F.col("ts").alias("imp_ts"),
                "user_id",
                (F.col("user_id") % 10).cast("long").alias("ad_id"),
            )
        ).select_key("user_id")  # :78-83 rekey impressions
    )
    clicks = (
        tp.stream(
            ev.filter(F.col("event_type") == "click").select(
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
                F.col("user_id").alias("c_user_id"),
            )
        ).select_key("c_user_id")  # :72-76 rekey clicks
    )
    ctr = (
        impressions.left_join(clicks, 60, "imp_ts", "click_ts")  # :85-95
        .map_values(
            ad_id=F.col("ad_id"),
            was_clicked=F.col("click_id").isNotNull(),  # :88-94
            click_id=F.col("click_id"),
        )
        .select_key("ad_id")  # :97-100 rekey by adId
        .group_by_key()  # :106
        .aggregate(  # :107-131 conditional counts
            n_clicked=F.count("click_id"),
            n_total=F.count(F.lit(1)),
        )
        .map_values(  # :132-143 declared ctr semantics
            n_clicked=F.col("n_clicked"),
            n_total=F.col("n_total"),
            ctr=F.col("n_clicked").cast("double") / F.col("n_total"),
        )
        .to_stream()
        .to_df()
    )

    declarative = QUERIES["ctr_per_ad"](spark, sf_dir)
    assert _rows(ctr.select("ad_id", "n_clicked", "n_total", "ctr")) == _rows(
        declarative.select("ad_id", "n_clicked", "n_total", "ctr")
    )


def test_topology_api_runs_streaming(spark, sf_dir, tmp_path):
    """The topology veneer is execution-mode-agnostic: the same chain
    built over a streaming DataFrame runs as a Structured Streaming
    query and converges to the batch build."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("ts"), "o_totalprice"
    ).limit(300)
    path = str(tmp_path / "orders_stream")
    orders.repartition(2).write.mode("overwrite").parquet(path)

    def build(df):
        return (
            tp.stream(df)
            .map_values(
                ts=F.col("ts"),
                x2=F.col("o_totalprice") * 2,
                v=F.col("o_totalprice"),
            )
            .group_by(F.lit("0"))
            .windowed_by("ts", 30)
            .aggregate(
                sum_v=F.sum(F.col("v").cast("decimal(18,2)")),
                n=F.count(F.lit(1)),
            )
            .map_values(
                avg_v=F.col("sum_v").cast("double") / F.col("n"), n=F.col("n")
            )
            .to_stream()
            .to_df()
        )

    streaming_src = spark.readStream.schema(orders.schema).parquet(path)
    q = (
        build(streaming_src)
        .writeStream.format("memory")
        .queryName("topo_stream")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = _rows(spark.table("topo_stream").select("wkey", "avg_v", "n"))
    want = _rows(build(spark.read.parquet(path)).select("wkey", "avg_v", "n"))
    assert got == want


def test_to_stream_honors_key_format(spark, sf_dir):
    """key_format is compiled to a JVM-side format_string, not ignored."""
    from streams_prototyping_spark import topology as tp
    from streams_prototyping_spark.data import load_table

    ev = load_table(spark, sf_dir, "events").limit(200)
    table = (
        tp.stream(ev)
        .group_by("event_type")
        .windowed_by("ts", 30)
        .aggregate(n=F.count(F.lit(1)))
    )
    default = table.to_stream().df.select("wkey").limit(1).collect()[0].wkey
    custom = (
        table.to_stream(key_format="{key}@{start}..{end}")
        .df.select("wkey")
        .limit(1)
        .collect()[0]
        .wkey
    )
    start, end, key = default.split("-", 2)
    assert custom.count("@") == 1 and ".." in custom
    k2, rest = custom.split("@", 1)
    s2, e2 = rest.split("..", 1)
    assert int(s2) < int(e2)
