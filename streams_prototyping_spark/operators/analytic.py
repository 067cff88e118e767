"""Analytic surface: SQL OVER() window functions + event-time windows.

The reference's "windows" are TIME windows only (SURVEY §2 Part C:
no rank/row_number/lag/lead anywhere in its 408 LoC); both families
live here. Event-time windowing (tumbling/hopping/session) is the batch
twin of the Structured Streaming pipelines in streaming/ — identical
expressions, so streaming results are oracle-checkable against these.

Oracle bucketing follows SURVEY §7 hard-part #3: DuckDB has no
window()/session_window(), so twins use epoch arithmetic
(floor(epoch/w)*w) and gaps-and-islands, which match Spark's semantics
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.operators.common import dsum_sql
from streams_prototyping_spark.registry import register

# --------------------------------------------------------------------------
# SQL OVER() window functions
# --------------------------------------------------------------------------

_ROWNUM_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice,
       CAST(row_number() OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_extendedprice, l_partkey)
            AS BIGINT) AS rn
FROM lineitem
"""


@register("window_row_number", oracle=_ROWNUM_ORACLE)
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number() OVER (PARTITION BY ... ORDER BY ...).

    Scale note: one shuffle on the partition key + per-partition sort;
    no global sort. l_orderkey has bounded fan-out (max 7 lines), so
    no skew.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the testdata — extend the
    # ORDER BY until ties are impossible so row_number is deterministic.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_extendedprice", "l_partkey"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.row_number().over(w).cast("long").alias("rn"),
    )


_TOPN_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(row_number() OVER (PARTITION BY p_brand
                                   ORDER BY p_retailprice DESC, p_partkey)
                AS BIGINT) AS rnk
    FROM part
) WHERE rnk <= 3
"""


@register("window_topn_per_group", oracle=_TOPN_ORACLE)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand — the distributed top-N-per-key pattern
    (deterministic tie-break on p_partkey).

    Scale note: Spark rewrites rank-filter patterns into a
    WindowGroupLimit (partial top-N before the shuffle) — shuffle
    volume is O(groups * N), not O(rows).
    """
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


_LAG_ORACLE = """
SELECT user_id,
       event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
       value,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       round(value - coalesce(lag(value) OVER w, value), 2) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("window_lag_lead", oracle=_LAG_ORACLE)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event-time order — the per-entity
    sequence-analysis primitive (sessionization, funnel deltas).
    event_id in the ORDER BY makes ties deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.col("value")), 2
        ).alias("delta"),
    )


_RUNNING_ORACLE = """
SELECT user_id,
       event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_total,
       CAST(count(*) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS running_n
FROM events
"""


@register("window_running_sum", oracle=_RUNNING_ORACLE)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user with an explicit ROWS frame (decimal-exact
    for oracle parity; SURVEY §2 Part C — frame specs)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
        F.count(F.lit(1)).over(w).cast("long").alias("running_n"),
    )


_RANK_DENSE_ORACLE = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS BIGINT) AS bal_rank,
       CAST(dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS BIGINT) AS bal_dense_rank,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS bal_quartile
FROM customer
"""


@register("window_rank_ntile", oracle=_RANK_DENSE_ORACLE)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile — ranking function family. rank and
    dense_rank are tie-stable (equal inputs, equal outputs) so no
    tie-break is needed; ntile gets one for determinism."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    wt = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.ntile(4).over(wt).cast("long").alias("bal_quartile"),
    )


# --------------------------------------------------------------------------
# event-time windows over `events` (batch twins of streaming/pipelines.py)
# --------------------------------------------------------------------------

TUMBLE_S = 30  # matches the reference's 30 s window (Aggregations.java:98)


_TUMBLE_ORACLE = f"""
SELECT CAST(floor(epoch(ts)/{TUMBLE_S})*{TUMBLE_S} AS BIGINT) AS window_start,
       event_type,
       count(*) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("events_tumbling_window", oracle=_TUMBLE_ORACLE)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30 s tumbling window per event_type over the events stream table
    (SURVEY §2 A7 on the stream fixture; batch twin of the streaming
    windowed agg)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", f"{TUMBLE_S} seconds").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


HOP_SIZE_S = 300
HOP_SLIDE_S = 60

# A row with timestamp t belongs to size/slide = 5 hopping windows whose
# starts are (floor(epoch/slide) - k)*slide for k = 0..4, keeping only
# starts where t < start + size — exactly Spark's window(ts, size, slide)
# assignment.
_HOP_ORACLE = f"""
SELECT window_start, count(*) AS n_events, {dsum_sql('value')} AS sum_value
FROM (
    SELECT (CAST(floor(epoch(ts)/{HOP_SLIDE_S}) AS BIGINT) - k.k) * {HOP_SLIDE_S} AS window_start,
           value
    FROM events
    CROSS JOIN (SELECT unnest(range(0, {HOP_SIZE_S // HOP_SLIDE_S})) AS k) k
    WHERE epoch(ts) < (CAST(floor(epoch(ts)/{HOP_SLIDE_S}) AS BIGINT) - k.k) * {HOP_SLIDE_S} + {HOP_SIZE_S}
      AND (CAST(floor(epoch(ts)/{HOP_SLIDE_S}) AS BIGINT) - k.k) >= 0
)
GROUP BY window_start
"""


@register("events_hopping_window", oracle=_HOP_ORACLE)
def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 min hopping window sliding every 60 s (SURVEY §2 Part C:
    hopping absent in reference, present in Spark/KSQL surface).

    Scale note: hopping windows multiply rows by size/slide (5x here) —
    Spark's window() does this with an internal explode BEFORE the
    partial agg, so the shuffle still carries only per-(window,key)
    partials.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", f"{HOP_SIZE_S} seconds", f"{HOP_SLIDE_S} seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


SESSION_GAP_S = 300

_SESSION_ORACLE = f"""
WITH marked AS (
    SELECT user_id, ts, value,
           CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                     <= {SESSION_GAP_S}
                THEN 0 ELSE 1 END AS new_session
    FROM events
), numbered AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_no
    FROM marked
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       count(*) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM numbered
GROUP BY user_id, session_no
"""


@register("events_session_window", oracle=_SESSION_ORACLE)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5 min inactivity gap) per user via Spark's
    native session_window; the oracle reproduces the semantics with the
    classic gaps-and-islands construction (lag + cumulative sum).

    Scale note: session_window is a first-class Spark operator — in
    streaming it maintains per-key session state with watermark-bounded
    eviction; in batch it plans as sort-within-partition + merge, one
    shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
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


_CUBE_ORACLE = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
       CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
       {dsum_sql('l_quantity')} AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_agg", oracle=_CUBE_ORACLE)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all 2^k grouping-set combinations in one pass
    (completes the grouping-sets family next to rollup_agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "sum_qty",
            "n",
        )
    )


_RANGE_FRAME_ORACLE = """
SELECT user_id,
       event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
           PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS hour_total,
       CAST(count(*) OVER (
           PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS hour_n
FROM events
"""


@register("window_range_frame", oracle=_RANGE_FRAME_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time epoch: per-user trailing-1-hour
    totals — the sliding-window analytic that ROWS frames cannot
    express (frame width is in VALUE units, not row counts). RANGE
    frames are tie-safe, so no tie-break column is needed."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("hour_total"),
        F.count(F.lit(1)).over(w).cast("long").alias("hour_n"),
    )


_MULTI_ROLLUP_ORACLE = """
WITH b AS (
    SELECT CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS day_start,
           CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS hour_start,
           value
    FROM events
)
SELECT coalesce(day_start, -1) AS day_start,
       coalesce(hour_start, -1) AS hour_start,
       CAST(grouping(hour_start) AS INTEGER) AS g_hour,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM b
GROUP BY GROUPING SETS ((day_start), (day_start, hour_start))
"""


@register("events_multi_rollup", oracle=_MULTI_ROLLUP_ORACLE)
def events_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hourly AND daily
    aggregates of the event stream in ONE pass via grouping sets —
    the continuous-aggregate pattern (coarser rollups derived in the
    same shuffle rather than re-scanning).

    Scale note: grouping sets expand rows k-fold BEFORE partial
    aggregation, but partials collapse to O(distinct buckets) ahead of
    the shuffle — strictly cheaper than k separate scans of a 100 TB
    stream table.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long").alias("day_start"),
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long").alias("hour_start"),
        "value",
    )
    return (
        b.groupingSets(
            [["day_start"], ["day_start", "hour_start"]],
            "day_start",
            "hour_start",
        )
        .agg(
            F.grouping("hour_start").cast("int").alias("g_hour"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("day_start", F.lit(-1)).alias("day_start"),
            F.coalesce("hour_start", F.lit(-1)).alias("hour_start"),
            "g_hour",
            "n_events",
            "sum_value",
        )
    )


_GAP_FILL_ORACLE = """
WITH bounds AS (
    SELECT date_trunc('day', min(o_orderdate)) AS d0,
           date_trunc('day', max(o_orderdate)) AS d1
    FROM orders
), spine AS (
    -- list-form generate_series (the table-function form only takes
    -- constants in DuckDB)
    SELECT CAST(floor(epoch(unnest(generate_series(d0, d1, INTERVAL 1 DAY)))) AS BIGINT)
        AS day_epoch
    FROM bounds
), daily AS (
    SELECT CAST(floor(epoch(date_trunc('day', o_orderdate))) AS BIGINT) AS day_epoch,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
)
SELECT s.day_epoch,
       coalesce(d.n_orders, 0) AS n_orders,
       coalesce(d.total, 0.0) AS total
FROM spine s LEFT JOIN daily d ON d.day_epoch = s.day_epoch
"""


@register("gap_fill_daily", oracle=_GAP_FILL_ORACLE)
def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series: a generated dense date spine left-joined
    to the sparse daily aggregate, zero-filling missing days — the
    series-densification pattern every time-series dashboard needs
    (sparse windows never emit rows on their own).

    Scale note: the spine is generated from ONE min/max row (a scalar
    aggregate broadcast into sequence()), so densification costs one
    broadcast join over the aggregated — already tiny — daily table,
    never touching raw 100 TB rows twice.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.unix_timestamp(F.date_trunc("day", "o_orderdate")).alias("day_epoch")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    bounds = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("d0"),
        F.date_trunc("day", F.max("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("d")
    ).select(F.unix_timestamp("d").alias("day_epoch"))
    return spine.join(daily, "day_epoch", "left").select(
        "day_epoch",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )
