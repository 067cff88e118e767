"""The declarative (KSQL-modeled) query layer, run as real SQL text.

The reference documents its pipelines as KSQL (SURVEY §3.3):
  CREATE TABLE foo AS SELECT constant_key, avg(order_total*2),
    avg(order_total) FROM orders GROUP BY constant_key
  (Aggregations.java:75-77, 30 s window realized at :98)
  CREATE STREAM ads_with_clicks AS SELECT ... FROM impressions
    LEFT JOIN clicks ON ... (StreamStreamJoin.java:35-38)
  CREATE TABLE ctr AS SELECT adid, ... (StreamStreamJoin.java:40-42)

Our engine gets this layer from Catalyst for free: register sources as
views, submit SQL text, the full parse -> analyze -> optimize ->
execute lifecycle runs (SURVEY §3.3). These queries prove the B1/B2
surface with the SAME semantics as the DataFrame twins in
windowed_agg.py / ctr.py — the point is that a KSQL user can paste a
query shape into spark.sql() and get the identical answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register

_KSQL_WAVG_SPARK = """
SELECT window_start,
       window_start + 30 AS window_end,
       '0' AS constant_key,
       CAST(sum(CAST(order_total * 2 AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_x2,
       CAST(sum(CAST(order_total AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_v
FROM (
    SELECT o_totalprice AS order_total,
           CAST(floor(unix_timestamp(o_orderdate) / 30) * 30 AS BIGINT) AS window_start
    FROM orders
)
GROUP BY window_start
"""

_KSQL_WAVG_ORACLE = """
SELECT window_start,
       window_start + 30 AS window_end,
       '0' AS constant_key,
       CAST(sum(CAST(order_total * 2 AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_x2,
       CAST(sum(CAST(order_total AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_v
FROM (
    SELECT o_totalprice AS order_total,
           CAST(floor(epoch(o_orderdate) / 30) * 30 AS BIGINT) AS window_start
    FROM orders
)
GROUP BY window_start
"""


@register("ksql_windowed_avg", oracle=_KSQL_WAVG_ORACLE)
def ksql_windowed_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declared App-1 query (Aggregations.java:75-77) as SQL text
    through Catalyst — same answer as the DataFrame twin windowed_avg.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_KSQL_WAVG_SPARK)


_KSQL_CTR_BODY = """
WITH impressions AS (
    SELECT event_id AS impressionid, ts AS impressiontime, user_id AS userid,
           CAST(user_id % 10 AS BIGINT) AS adid
    FROM events WHERE event_type = 'view'
), clicks AS (
    SELECT event_id AS clickid, ts AS clicktime, user_id AS userid
    FROM events WHERE event_type = 'click'
), ads_with_clicks AS (
    -- CREATE STREAM ads_with_clicks AS SELECT impression.impressionid
    -- as impid, ... (StreamStreamJoin.java:35-38)
    SELECT impressions.impressionid AS impid,
           impressions.userid AS userid,
           impressions.adid AS adid,
           clicks.clickid AS clickid
    FROM impressions
    LEFT JOIN clicks
      ON impressions.userid = clicks.userid
     AND clicks.clicktime BETWEEN impressions.impressiontime - INTERVAL 60 SECOND
                              AND impressions.impressiontime + INTERVAL 60 SECOND
)
-- CREATE TABLE ctr AS SELECT adid, (count(*) WHERE clickid != NULL) /
-- count(*) (StreamStreamJoin.java:40-42, declared semantics)
SELECT adid,
       count(clickid) AS clicked,
       count(*) AS total,
       CAST(count(clickid) AS DOUBLE) / count(*) AS ctr
FROM ads_with_clicks
GROUP BY adid
"""

# identical text runs on DuckDB (INTERVAL / CTE / filtered-count are
# shared SQL) — the one dialect-portable query in the suite.
_KSQL_CTR_SPARK = _KSQL_CTR_BODY
_KSQL_CTR_ORACLE = _KSQL_CTR_BODY


@register("ksql_ctr", oracle=_KSQL_CTR_ORACLE)
def ksql_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declared App-2 pipeline (both KSQL statements,
    StreamStreamJoin.java:35-42) as one SQL text — stream-stream left
    join + filtered-count CTR, identical SQL accepted by both engines.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_KSQL_CTR_SPARK)


# ----------------------------------------------------- recursive CTE

_RSPINE_SPARK = """
WITH RECURSIVE m(n) AS (
    SELECT 0
    UNION ALL
    SELECT n + 1 FROM m WHERE n < 79
), spine AS (
    SELECT CAST(add_months(DATE '1995-01-01', n) AS DATE) AS month_start FROM m
), monthly AS (
    SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS month_start,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
)
SELECT s.month_start,
       coalesce(monthly.n_orders, 0) AS n_orders,
       coalesce(monthly.revenue, CAST(0.0 AS DOUBLE)) AS revenue
FROM spine s LEFT JOIN monthly ON monthly.month_start = s.month_start
"""

_RSPINE_ORACLE = """
WITH RECURSIVE m(n) AS (
    SELECT 0
    UNION ALL
    SELECT n + 1 FROM m WHERE n < 79
), spine AS (
    SELECT CAST(DATE '1995-01-01' + to_months(n) AS DATE) AS month_start FROM m
), monthly AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
)
SELECT s.month_start,
       coalesce(monthly.n_orders, 0) AS n_orders,
       coalesce(monthly.revenue, CAST(0.0 AS DOUBLE)) AS revenue
FROM spine s LEFT JOIN monthly ON monthly.month_start = s.month_start
"""


@register("recursive_month_spine", oracle=_RSPINE_ORACLE)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month spine (Spark 4's recursive CTE support,
    absent from every KSQL-era engine): an 80-month recursively
    generated calendar LEFT JOINed to monthly order rollups, so empty
    months surface as zero rows — the recursion-based twin of
    gap_fill_daily's sequence() spine.

    Scale note: the recursion materializes 80 driver-sized rows (one
    UnionLoop iteration each); the orders side is one partial-agg
    shuffle keyed by month. Spark's recursive CTEs are UNION ALL only
    (monotone recursion, no cycle risk here); graph closure stays with
    the iterative DataFrame loop in dedup_pipeline.py.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RSPINE_SPARK)
