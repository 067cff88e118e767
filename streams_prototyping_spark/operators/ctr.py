"""The reference's App 2 — stream-stream windowed left join + CTR.

Reference: StreamStreamJoin.java (apurvam/streams-prototyping).
Topology (:61-145): stream("impressions"), stream("clicks") -> rekey
both by impression_id (:72-83) -> leftJoin within +/-60 s windows
(:85-95) -> wasClicked = click != null (:88-94) -> rekey by ad_id
(:97-100) -> groupByKey conditional-count aggregate (:105-131) ->
ctr = clicks/impressions with zero guard (:132-143) -> sink (:145).
Declared KSQL (:35-42):
  CREATE STREAM ads_with_clicks AS SELECT ... FROM impressions
    LEFT JOIN clicks ON impressions.impressionid = clicks.impressionid
    WINDOW TUMBLING (size 30 second);
  CREATE TABLE ctr AS SELECT adid,
    (count(*) WHERE clickid != NULL) / count(*) FROM ads_with_clicks;

Driver-table mapping (no impressions/clicks tables exist): events
rows with event_type='view' play impressions, event_type='click' play
clicks; user_id is the join identity, user_id % 10 the ad_id analog.

Semantics choices (SURVEY §2 Part C'):
- ctr_per_ad implements the DECLARED semantics: clicks / count(*).
- ctr_literal implements the literal topology: clicks / non-clicked
  impressions with the 0-when-no-clicks guard (StreamStreamJoin.java:
  138-141), with the remaining div-by-zero returning NULL (both
  engines' non-ANSI double semantics).
- Kafka Streams 1.1's eager leftJoin emits spurious (imp, null)
  before a late match; the batch join (and Spark's watermarked
  streaming join — streaming/pipelines.py) emits each result once,
  matching the declared SQL intent.

Scale notes: the join is an equi-join on user_id with a time-range
residual — Catalyst plans a shuffled hash/sort-merge join on the
equi-key and evaluates the BETWEEN as a post-join filter, so it scales
as a normal keyed shuffle (NOT a cross join). Skewed join keys (a bot
user with millions of events) are handled by AQE skew-join splitting;
in streaming the watermark bounds both state stores. The rekey maps of
the reference (:72-83,:97-100) vanish: keys are columns and Catalyst's
EnsureRequirements inserts exactly the shuffles needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register

JOIN_WINDOW_S = 60  # StreamStreamJoin.java:95 — JoinWindows.of(60_000)

# Shared CTE prefix: derive the two streams from `events`.
_STREAMS_CTE = """
WITH impressions AS (
    SELECT event_id AS impression_id,
           ts AS imp_ts,
           user_id,
           CAST(user_id % 10 AS BIGINT) AS ad_id
    FROM events WHERE event_type = 'view'
), clicks AS (
    SELECT event_id AS click_id,
           ts AS click_ts,
           user_id
    FROM events WHERE event_type = 'click'
), joined AS (
    SELECT i.impression_id, i.user_id, i.ad_id,
           c.click_id,
           (c.click_id IS NOT NULL) AS was_clicked
    FROM impressions i
    LEFT JOIN clicks c
      ON i.user_id = c.user_id
     AND c.click_ts BETWEEN i.imp_ts - INTERVAL 60 SECOND
                        AND i.imp_ts + INTERVAL 60 SECOND
)
"""


def _impressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("impression_id"),
        F.col("ts").alias("imp_ts"),
        "user_id",
        (F.col("user_id") % 10).cast("long").alias("ad_id"),
    )


def _clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("c_user_id"),
    )


def _ads_with_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed left outer join (SURVEY §2 A10) + null-flag (A11)."""
    imp = _impressions(spark, sf_dir)
    clk = _clicks(spark, sf_dir)
    cond = (F.col("user_id") == F.col("c_user_id")) & F.col("click_ts").between(
        F.col("imp_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_S} SECONDS"),
        F.col("imp_ts") + F.expr(f"INTERVAL {JOIN_WINDOW_S} SECONDS"),
    )
    return imp.join(clk, cond, "left_outer").select(
        "impression_id",
        "user_id",
        "ad_id",
        "click_id",
        F.col("click_id").isNotNull().alias("was_clicked"),
    )


_JOIN_ORACLE = (
    _STREAMS_CTE
    + """
SELECT impression_id, user_id, ad_id, click_id, was_clicked FROM joined
"""
)

BUCKET_S = 2 * JOIN_WINDOW_S  # bucket width must be >= 2x the join range


def _time_bucketed_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as the plain range join, but keyed on
    (user_id, time_bucket) with the click side exploded into the <= 2
    buckets its +/-60 s halo can touch.

    Scale rationale: the plain plan keys the shuffle on user_id only —
    a hot user (bot) makes one reducer evaluate |imps_u| x |clicks_u|
    BETWEEN comparisons. Bucketing adds event-time to the shuffle key,
    so a key's work is bounded by its traffic per 2-minute bucket, at
    the cost of duplicating the click stream <= 2x. Correctness: with
    bucket width >= 2x the range, an impression's bucket is always in
    the click's halo set, and the halo buckets are distinct, so every
    qualifying pair joins exactly once; unmatched impressions survive
    once via the left join.
    """
    imp = _impressions(spark, sf_dir).withColumn(
        "bucket", F.floor(F.unix_timestamp("imp_ts") / BUCKET_S)
    )
    clk = _clicks(spark, sf_dir)
    halo = F.array_distinct(
        F.array(
            F.floor((F.unix_timestamp("click_ts") - JOIN_WINDOW_S) / BUCKET_S),
            F.floor((F.unix_timestamp("click_ts") + JOIN_WINDOW_S) / BUCKET_S),
        )
    )
    clk_exploded = clk.withColumn("bucket", F.explode(halo))
    cond = (
        (F.col("user_id") == F.col("c_user_id"))
        & (imp.bucket == clk_exploded.bucket)
        & F.col("click_ts").between(
            F.col("imp_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_S} SECONDS"),
            F.col("imp_ts") + F.expr(f"INTERVAL {JOIN_WINDOW_S} SECONDS"),
        )
    )
    return imp.join(clk_exploded, cond, "left_outer").select(
        "impression_id",
        "user_id",
        "ad_id",
        "click_id",
        F.col("click_id").isNotNull().alias("was_clicked"),
    )


@register("stream_stream_join_bucketed", oracle=_JOIN_ORACLE)
def stream_stream_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant variant of stream_stream_left_join (same oracle —
    results must be identical): time-bucketed shuffle keys bound the
    per-reducer work for hot join keys. See _time_bucketed_left_join.
    """
    return _time_bucketed_left_join(spark, sf_dir)


@register("stream_stream_left_join", oracle=_JOIN_ORACLE)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed stream-stream LEFT OUTER equi-join with time-range
    residual (SURVEY §2 A10) and CASE-style null-flag derivation (A11,
    B8: clickid IS NOT NULL). Batch twin of the streaming join in
    streaming/pipelines.py (reference StreamStreamJoin.java:85-95)."""
    return _ads_with_clicks(spark, sf_dir)


_CTR_ORACLE = (
    _STREAMS_CTE
    + """
SELECT ad_id,
       count(click_id) AS n_clicked,
       count(*) AS n_total,
       CAST(count(click_id) AS DOUBLE) / count(*) AS ctr
FROM joined
GROUP BY ad_id
"""
)


@register("ctr_per_ad", oracle=_CTR_ORACLE)
def ctr_per_ad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ad click-through rate with the DECLARED semantics
    (StreamStreamJoin.java:40-42): clicks / all impressions. Covers
    SURVEY §2 A6 (groupByKey), A12 (conditional counts), B7 (filtered
    count), A13 (ratio)."""
    joined = _ads_with_clicks(spark, sf_dir)
    return joined.groupBy("ad_id").agg(
        F.count("click_id").alias("n_clicked"),
        F.count(F.lit(1)).alias("n_total"),
        (F.count("click_id").cast("double") / F.count(F.lit(1))).alias("ctr"),
    )


_CTR_LITERAL_ORACLE = (
    _STREAMS_CTE
    + """
SELECT ad_id,
       count(*) FILTER (WHERE was_clicked) AS n_clicked,
       count(*) FILTER (WHERE NOT was_clicked) AS n_unclicked,
       CASE WHEN count(*) FILTER (WHERE was_clicked) = 0 THEN 0.0
            ELSE CAST(count(*) FILTER (WHERE was_clicked) AS DOUBLE)
                 / NULLIF(count(*) FILTER (WHERE NOT was_clicked), 0)
       END AS ctr
FROM joined
GROUP BY ad_id
"""
)


@register("ctr_literal", oracle=_CTR_LITERAL_ORACLE)
def ctr_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LITERAL topology semantics (SURVEY §2 Part C' item 1): the
    adder increments either the click or the impression counter
    (StreamStreamJoin.java:119-127); final division numClicks /
    numImpressions (:141) guarded to 0.0 only when numClicks == 0
    (:138-140). NULLIF keeps the remaining div-by-zero NULL in both
    engines."""
    joined = _ads_with_clicks(spark, sf_dir)
    n_clicked = F.count(F.when(F.col("was_clicked"), 1))
    n_unclicked = F.count(F.when(~F.col("was_clicked"), 1))
    return joined.groupBy("ad_id").agg(
        n_clicked.alias("n_clicked"),
        n_unclicked.alias("n_unclicked"),
        F.when(n_clicked == 0, F.lit(0.0))
        .otherwise(n_clicked.cast("double") / F.nullif(n_unclicked, F.lit(0)))
        .alias("ctr"),
    )


# --------------------------------------------- Wilson lower-bound CTR

WILSON_Z = 1.96  # 95% two-sided

_WILSON_ORACLE = (
    _STREAMS_CTE
    + f"""
, agg AS (
    SELECT ad_id,
           count(*) AS n_impressions,
           count(click_id) AS n_clicked,
           CAST(count(click_id) AS DOUBLE) / count(*) AS p,
           CAST(count(*) AS DOUBLE) AS n,
           CAST({WILSON_Z} AS DOUBLE) AS z
    FROM joined GROUP BY ad_id
)
SELECT ad_id, n_impressions, n_clicked,
       round(p, 6) AS ctr,
       round(GREATEST(CAST(0 AS DOUBLE),
           (p + z * z / (2 * n)
              - z * sqrt(p * (1 - p) / n + z * z / (4 * n * n)))
           / (1 + z * z / n)), 6) AS wilson_lb
FROM agg
"""
)


@register("wilson_ci_ctr", oracle=_WILSON_ORACLE)
def wilson_ci_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score lower confidence bound on each ad's CTR — the
    uncertainty-aware extension of ctr_per_ad (reference declared
    semantics, StreamStreamJoin.java:40-42): ranking ads by the raw
    ratio overrates low-traffic ads; ranking by the Wilson lower bound
    (the classic 'sort by lower bound of a Bernoulli proportion' rule)
    is what an ad server actually orders by.

    Determinism: p, n are exact-integer-derived doubles; the bound is
    one fixed IEEE expression tree mirrored token-for-token in the
    oracle SQL, rounded at 6 dp on both sides. The z literal is CAST to
    DOUBLE in the SQL: DuckDB evaluates a bare 1.96 * 1.96 as
    DECIMAL-exact 3.8416 while Spark's double gives 3.841599...9997 —
    the sf0.01 gate missed it (rounding masked all 10 ads) and the sf1
    check caught it, which is exactly why changed queries re-verify at
    higher SFs.

    Scale: identical plan shape to ctr_per_ad — the keyed join then one
    partial-combined aggregate per ad; the bound is a scalar expression
    on O(ads) rows.
    """
    joined = _ads_with_clicks(spark, sf_dir)
    z = F.lit(WILSON_Z)
    agg = joined.groupBy("ad_id").agg(
        F.count(F.lit(1)).alias("n_impressions"),
        F.count("click_id").alias("n_clicked"),
    )
    p = F.col("n_clicked").cast("double") / F.col("n_impressions")
    n = F.col("n_impressions").cast("double")
    # clamp at 0: the bound is [0,1] mathematically, but for p=0 the
    # two algebraically-equal z-terms differ by one ulp and the raw
    # expression can land at -1e-17 -> round -> IEEE negative zero,
    # which DuckDB prints as -0.0 and Spark as 0.0 (caught by the
    # sf0.001 parity test; the clamp is standard for Wilson anyway)
    lb = F.greatest(
        F.lit(0.0),
        (p + z * z / (2 * n) - z * F.sqrt(p * (1 - p) / n + z * z / (4 * n * n)))
        / (1 + z * z / n),
    )
    return agg.select(
        "ad_id",
        "n_impressions",
        "n_clicked",
        F.round(p, 6).alias("ctr"),
        F.round(lb, 6).alias("wilson_lb"),
    )
