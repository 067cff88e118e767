"""Streaming e2e (SURVEY §5.3): replay fixtures through a file source
and assert the streaming pipelines CONVERGE to their batch twins —
the standard Structured Streaming test pattern."""

import pyspark.sql.functions as F
import pytest

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.streaming.pipelines import (
    ads_with_clicks_stream,
    ctr_stateful_stream,
    windowed_avg_stream,
)
from streams_prototyping_spark.streaming.sources import create_stream

SENTINEL_ID = -1  # far-future rows that push the watermark to flush state


def _replay_dir(df, path, n_files=4):
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return path


def _run_to_end(df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def test_windowed_avg_converges_to_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select("ts", "value").limit(300)
    path = _replay_dir(events, str(tmp_path / "events"))

    stream = create_stream(
        spark, "events", events.schema, transport="file", path=path,
        max_files_per_trigger=1,
    )
    out = windowed_avg_stream(stream)
    spark.catalog.clearCache()
    tbl = _run_to_end(out, "wavg_stream", "complete")

    got = {
        r.window_start: (round(r.avg_x2, 6), round(r.avg_v, 6), r.n_events)
        for r in spark.table(tbl).collect()
    }
    batch = (
        spark.read.parquet(path)
        .groupBy(F.window("ts", "30 seconds").alias("w"))
        .agg(
            (F.sum(F.col("value") * 2) / F.count("*")).alias("avg_x2"),
            (F.sum("value") / F.count("*")).alias("avg_v"),
            F.count("*").alias("n_events"),
        )
    )
    want = {
        r["w"].start: (round(r.avg_x2, 6), round(r.avg_v, 6), r.n_events)
        for r in batch.collect()
    }
    assert got == want


def _imp_clk_fixture(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    imp = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("impression_id"),
        F.col("ts").alias("imp_ts"),
        "user_id",
        (F.col("user_id") % 10).cast("long").alias("ad_id"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("c_user_id"),
    )
    # sentinel rows 2 h past the max event: advance both watermarks so
    # every outer-join null row is flushed before the stream ends
    max_ts = ev.agg(F.max("ts")).first()[0]
    sent_imp = spark.createDataFrame(
        [(SENTINEL_ID, max_ts, SENTINEL_ID, SENTINEL_ID)],
        "impression_id long, imp_ts timestamp, user_id long, ad_id long",
    ).withColumn("imp_ts", F.col("imp_ts") + F.expr("INTERVAL 2 HOURS"))
    sent_clk = spark.createDataFrame(
        [(SENTINEL_ID, max_ts, SENTINEL_ID)],
        "click_id long, click_ts timestamp, c_user_id long",
    ).withColumn("click_ts", F.col("click_ts") + F.expr("INTERVAL 2 HOURS"))
    return imp.unionByName(sent_imp), clk.unionByName(sent_clk)


def test_stream_stream_join_converges_to_batch(spark, sf_dir, tmp_path):
    imp, clk = _imp_clk_fixture(spark, sf_dir)
    ipath = _replay_dir(imp, str(tmp_path / "imp"), n_files=3)
    cpath = _replay_dir(clk, str(tmp_path / "clk"), n_files=3)

    s_imp = create_stream(spark, "imp", imp.schema, transport="file", path=ipath)
    s_clk = create_stream(spark, "clk", clk.schema, transport="file", path=cpath)
    joined = ads_with_clicks_stream(s_imp, s_clk)
    tbl = _run_to_end(joined, "ssj_stream", "append")

    got = (
        spark.table(tbl)
        .filter(F.col("impression_id") != SENTINEL_ID)
        .groupBy("was_clicked")
        .count()
        .collect()
    )
    got = {r.was_clicked: r["count"] for r in got}

    b_imp = spark.read.parquet(ipath).filter(F.col("impression_id") != SENTINEL_ID)
    b_clk = spark.read.parquet(cpath).filter(F.col("click_id") != SENTINEL_ID)
    cond = (b_imp.user_id == b_clk.c_user_id) & b_clk.click_ts.between(
        b_imp.imp_ts - F.expr("INTERVAL 60 SECONDS"),
        b_imp.imp_ts + F.expr("INTERVAL 60 SECONDS"),
    )
    batch = b_imp.join(b_clk, cond, "left_outer").select(
        F.col("click_id").isNotNull().alias("was_clicked")
    )
    want = {r.was_clicked: r["count"] for r in batch.groupBy("was_clicked").count().collect()}
    assert got == want


def test_ctr_stateful_converges_to_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: the
    LAST emitted row per ad equals the batch conditional counts."""
    imp, clk = _imp_clk_fixture(spark, sf_dir)
    # materialize the batch join as the replayable ads_with_clicks fixture
    cond = (imp.user_id == clk.c_user_id) & clk.click_ts.between(
        imp.imp_ts - F.expr("INTERVAL 60 SECONDS"),
        imp.imp_ts + F.expr("INTERVAL 60 SECONDS"),
    )
    awc = (
        imp.filter(F.col("impression_id") != SENTINEL_ID)
        .join(clk.filter(F.col("click_id") != SENTINEL_ID), cond, "left_outer")
        .select(
            "impression_id", "user_id", "ad_id",
            F.col("click_id").isNotNull().alias("was_clicked"),
        )
    )
    path = _replay_dir(awc, str(tmp_path / "awc"), n_files=4)

    stream = create_stream(
        spark, "awc", awc.schema, transport="file", path=path,
        max_files_per_trigger=1,  # several micro-batches -> real state reuse
    )
    out = ctr_stateful_stream(stream)
    tbl = _run_to_end(out, "ctr_state_stream", "update")

    # final state per ad: total count only grows, so the row with the
    # max total is the last update (sink row order is not guaranteed)
    updates = spark.table(tbl).toPandas()
    updates["total"] = updates["n_clicked"] + updates["n_unclicked"]
    final = updates.sort_values("total").groupby("ad_id").last()

    batch = (
        spark.read.parquet(path)
        .groupBy("ad_id")
        .agg(
            F.count(F.when(F.col("was_clicked"), 1)).alias("n_clicked"),
            F.count(F.when(~F.col("was_clicked"), 1)).alias("n_unclicked"),
        )
        .collect()
    )
    for r in batch:
        assert final.loc[r.ad_id, "n_clicked"] == r.n_clicked, r.ad_id
        assert final.loc[r.ad_id, "n_unclicked"] == r.n_unclicked, r.ad_id
        total = r.n_clicked + r.n_unclicked
        assert final.loc[r.ad_id, "ctr"] == pytest.approx(r.n_clicked / total)


def test_stream_static_enrichment_converges(spark, sf_dir, tmp_path):
    """Stream-static broadcast join + windowed agg equals the batch
    twin over the same replayed files."""
    from streams_prototyping_spark.streaming.pipelines import enriched_events_stream

    events = load_table(spark, sf_dir, "events").select("ts", "user_id", "value").limit(400)
    path = _replay_dir(events, str(tmp_path / "events_enrich"))
    user_dim = (
        spark.read.parquet(path)
        .select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 4).cast("int"))
    )

    stream = create_stream(
        spark, "events_enrich", spark.read.parquet(path).schema,
        transport="file", path=path, max_files_per_trigger=1,
    )
    out = enriched_events_stream(stream, user_dim)
    tbl = _run_to_end(out, "enrich_stream", "complete")

    got = {
        (r.window_start, r.segment): (r.n_events, round(r.total_value, 6))
        for r in spark.table(tbl).collect()
    }
    batch = (
        spark.read.parquet(path)
        .join(user_dim, "user_id")
        .groupBy(F.window("ts", "30 seconds").alias("w"), "segment")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )
    want = {
        (r["w"].start, r.segment): (r.n_events, round(r.total_value, 6))
        for r in batch.collect()
    }
    assert got == want


def test_outlier_gate_stream_matches_batch(spark, sf_dir, tmp_path):
    """Stateless stream gate == batch gate row-for-row (same thresholds,
    append mode, no watermark needed)."""
    from streams_prototyping_spark import registry
    from streams_prototyping_spark.operators.analytics_ext import mad_thresholds_df
    from streams_prototyping_spark.streaming.pipelines import outlier_gate_stream

    registry.load_all()
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).limit(500)
    path = _replay_dir(events, str(tmp_path / "gate_events"))

    thresholds = mad_thresholds_df(spark, sf_dir)
    stream = create_stream(
        spark, "gate_events", events.schema, transport="file", path=path,
        max_files_per_trigger=1,
    )
    tbl = _run_to_end(outlier_gate_stream(stream, thresholds), "gate_stream", "append")

    got = {r.event_id: (r.robust_z, r.is_outlier) for r in spark.table(tbl).collect()}
    ids = {r.event_id for r in spark.read.parquet(path).collect()}
    batch = registry.QUERIES["value_outliers_mad"](spark, sf_dir)
    want = {
        r.event_id: (r.robust_z, r.is_outlier)
        for r in batch.collect() if r.event_id in ids
    }
    assert got == want


def test_session_window_stream_converges_to_batch(spark, sf_dir, tmp_path):
    """Streaming session windows (merging state) must land on the same
    final sessions as the batch session_window over the same data."""
    from streams_prototyping_spark.streaming.pipelines import (
        SESSION_GAP_S,
        session_stats_stream,
    )

    events = (
        load_table(spark, sf_dir, "events")
        .select("ts", "user_id", "value")
        .filter(F.col("user_id") < 40)
    )
    path = _replay_dir(events, str(tmp_path / "sess_events"))

    stream = create_stream(
        spark, "sess_events", events.schema, transport="file", path=path,
        max_files_per_trigger=1,
    )
    # The replay files are not time-ordered, so each micro-batch spans
    # the full month and a short watermark would drop most input as
    # late (session windows filter late rows even in complete mode —
    # unlike fixed windows). The merge logic is what this test proves;
    # a replay-spanning watermark keeps every row live. Eviction
    # boundedness is pinned separately (tests/test_streaming_scale.py).
    out = session_stats_stream(stream, watermark="40 days")
    spark.catalog.clearCache()
    tbl = _run_to_end(out, "sess_stream", "complete")

    got = {
        (r.user_id, r.session_start): (r.n_events, round(r.sum_value, 6))
        for r in spark.table(tbl).collect()
    }
    batch = (
        spark.read.parquet(path)
        .groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
    want = {
        (r.user_id, r.session_start): (r.n_events, round(r.sum_value, 6))
        for r in batch.collect()
    }
    assert got == want


def test_hll_registers_stream_exactly_matches_batch(spark, sf_dir, tmp_path):
    """Streaming HLL registers must equal the batch sketch EXACTLY
    (integers): same hll_reg_rho projection, max() merge across
    micro-batches. Also pins the no-dedup property — the replay
    contains duplicate uids and the registers still match the
    distinct-side batch sketch."""
    from streams_prototyping_spark.operators.stats_audits import hll_reg_rho
    from streams_prototyping_spark.streaming.pipelines import hll_registers_stream

    ids = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(F.col("user_id").cast("string").alias("uid"))
    )
    path = _replay_dir(ids, str(tmp_path / "ids"))

    stream = create_stream(
        spark, "ids", ids.schema, transport="file", path=path,
        max_files_per_trigger=1,
    )
    tbl = _run_to_end(hll_registers_stream(stream), "hll_stream", "complete")
    got = {(r.reg, r.rho) for r in spark.table(tbl).collect()}

    batch = (
        hll_reg_rho(spark.read.parquet(path).distinct())
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )
    want = {(r.reg, r.rho) for r in batch.collect()}
    assert got == want
    assert len(got) <= 64  # bounded state, no watermark needed


def test_count_min_cells_stream_exactly_matches_batch(spark, sf_dir, tmp_path):
    """Streaming CMS cells must equal the batch sketch's cells exactly:
    counting tokens one-by-one across micro-batches sums to the batch
    word-count-per-bucket sums."""
    from streams_prototyping_spark.functions.corpus_stats import (
        CMS_ROWS,
        CMS_WIDTH,
        _cms_bucket_spark,
    )
    from streams_prototyping_spark.streaming.pipelines import count_min_cells_stream

    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .limit(5000)
    )
    path = _replay_dir(toks, str(tmp_path / "toks"))

    stream = create_stream(
        spark, "toks", toks.schema, transport="file", path=path,
        max_files_per_trigger=1,
    )
    tbl = _run_to_end(count_min_cells_stream(stream), "cms_stream", "complete")
    got = {(r.r, r.bucket): r.cell_n for r in spark.table(tbl).collect()}

    buckets = F.array(*[F.expr(_cms_bucket_spark(r)) for r in range(CMS_ROWS)])
    batch = (
        spark.read.parquet(path)
        .select(F.posexplode(buckets).alias("r", "bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_n"))
    )
    want = {(r.r, r.bucket): r.cell_n for r in batch.collect()}
    assert got == want
    assert len(got) <= CMS_ROWS * CMS_WIDTH  # bounded sketch state


def test_histogram_bins_stream_exactly_matches_batch(spark, sf_dir, tmp_path):
    """Streaming histogram sketch == batch sketch, cell by cell (the
    mergeable-state property histogram_quantile_audit's scale story
    rests on), replayed across micro-batches."""
    from streams_prototyping_spark.operators.stats_audits import HQ_BIN_CENTS
    from streams_prototyping_spark.streaming.pipelines import histogram_bins_stream

    cents = (
        load_table(spark, sf_dir, "orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    )
    path = _replay_dir(cents, str(tmp_path / "cents"))
    stream = create_stream(
        spark, "cents", cents.schema, transport="file", path=path,
        max_files_per_trigger=1,
    )
    tbl = _run_to_end(
        histogram_bins_stream(stream, HQ_BIN_CENTS), "hist_stream", "complete"
    )
    got = {r.bin: r.cnt for r in spark.table(tbl).collect()}
    batch = (
        spark.read.parquet(path)
        .select((F.col("cents") / HQ_BIN_CENTS).cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want = {r.bin: r.cnt for r in batch.collect()}
    assert got == want and len(got) > 3


def test_ivf_assign_stream_matches_batch_assignment(spark, sf_dir, tmp_path):
    """Streamed vectors route to the SAME cells as the batch trained
    assignment (kmeans_final_assign) — the index-maintenance contract:
    a vector ingested via the stream is searchable in exactly the cell
    batch retraining would have put it in."""
    from streams_prototyping_spark.functions.clustering import (
        _final_assign,
        trained_centroids,
    )
    from streams_prototyping_spark.streaming.pipelines import ivf_assign_stream

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    path = _replay_dir(vecs, str(tmp_path / "vecs"))
    cent_pdf = trained_centroids(spark, sf_dir).toPandas()

    stream = create_stream(
        spark, "vecs", vecs.schema, transport="file", path=path,
        max_files_per_trigger=1,
    )
    tbl = _run_to_end(
        ivf_assign_stream(stream, cent_pdf), "ivf_assign_stream", "append"
    )
    got = {r.vec_id: r.cell for r in spark.table(tbl).collect()}
    want = {
        r.vec_id: r.cell
        for r in _final_assign(spark, sf_dir).select("vec_id", "cell").collect()
    }
    assert got == want and len(got) >= 400


def test_dim_moments_stream_exactly_matches_batch(spark, sf_dir, tmp_path):
    """Streaming per-dimension moments == batch moments cell-by-cell
    (the mergeable sufficient statistics the covariance/Mahalanobis
    family reads), replayed across micro-batches."""
    from streams_prototyping_spark.streaming.pipelines import dim_moments_stream

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    path = _replay_dir(vecs, str(tmp_path / "mvecs"))
    stream = create_stream(
        spark, "mvecs", vecs.schema, transport="file", path=path,
        max_files_per_trigger=1,
    )
    tbl = _run_to_end(dim_moments_stream(stream), "dim_moments", "complete")
    got = {r.i: (r.n, r.s1, r.s2) for r in spark.table(tbl).collect()}

    batch = (
        spark.read.parquet(path)
        .select(F.posexplode("v").alias("i", "xi"))
        .groupBy("i")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("xi"), 8).cast("decimal(28,8)")).alias("s1"),
            F.sum(
                F.round(F.col("xi") * F.col("xi"), 10).cast("decimal(38,10)")
            ).alias("s2"),
        )
    )
    want = {r.i: (r.n, r.s1, r.s2) for r in batch.collect()}
    assert got == want and len(got) == 64
