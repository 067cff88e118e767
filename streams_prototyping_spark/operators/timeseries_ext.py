"""Time-series extensions: the diagnostic and evaluation layer on top
of the forecasting operators (holt_smoothing_daily, ewma_per_user,
rolling_corr_daily) — autocorrelation, forecast backtesting, funnel
latency, and event-sequence transition dynamics.

- acf_daily_revenue: lag-1..14 autocorrelation profile of the daily
  revenue series (lag-k Pearson over (y_t, y_{t+k}) pairs from exact
  integer-cent sufficient statistics) — the input that justifies the
  7-day seasonality assumed by snaive/dow operators.
- forecast_backtest_snaive: rolling-origin backtest of the
  seasonal-naive forecast y^hat_t = y_{t-7}: MAE/RMSE/MAPE plus the
  MASE-style ratio against naive-1 — the honest baseline every fancy
  forecaster must beat.
- funnel_latency_percentiles: first-view -> first-purchase conversion
  latency with exact type-1 percentiles (value at ceil(p*n), no
  interpolation — deterministic integers end-to-end).
- event_type_markov: first-order transition matrix over per-user
  event sequences ordered by (ts, event_id) — the unique-id tie-break
  makes the lag deterministic where raw timestamps collide.

Reference parity: the reference's only time dimension is the tumbling
window (Aggregations.java:96); SURVEY.md Part C″ extension.

Scale design (100 TB):
- acf/backtest: everything runs over the O(days) aggregated series;
  the lag joins are keyed on day and the lag spine broadcasts.
- funnel latency: two keyed folds (first view, first purchase after)
  + one bounded global window over O(converted users) latencies; at
  production scale the percentile step swaps to the sketch path
  (approx_percentiles) — documented, same contract.
- markov: the lag window partitions by user (bounded state); the
  transition fold is |types|^2 keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register

ACF_MAX_LAG = 14
SNAIVE_LAG = 7

_DAILY_SQL = """
daily AS (
    SELECT CAST(floor(epoch(date_trunc('day', o_orderdate))) AS BIGINT) // 86400
               AS day,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY 1
)"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        (F.unix_timestamp(F.date_trunc("day", "o_orderdate")) / F.lit(86400))
        .cast("long")
        .alias("day")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))


# ------------------------------------------------------ ACF profile

_ACF_ORACLE = f"""
WITH {_DAILY_SQL},
pairs AS (
    -- HUGEINT before any product: daily cent totals reach ~1e11 at
    -- sf1, so x*x overflows BIGINT (the Spark twin widens to
    -- decimal(38,0) pre-multiply for the same reason)
    SELECT k.lag, CAST(a.cents AS HUGEINT) AS x, CAST(b.cents AS HUGEINT) AS y
    FROM daily a
    CROSS JOIN (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS lag) k
    JOIN daily b ON b.day = a.day + k.lag
), s AS (
    SELECT lag, count(*) AS n,
           sum(x) AS sx, sum(y) AS sy,
           sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
    FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 8) AS lag_corr
FROM s
"""


@register("acf_daily_revenue", oracle=_ACF_ORACLE)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation profile (lag-k Pearson, k=1..{ACF_MAX_LAG}) of
    daily revenue — integer-cent sufficient statistics folded in
    decimal, the correlation dag on double conversions of exact
    integers (the spearman/welch recipe).

    Scale note: the raw table collapses to O(days) once; the lag
    spine broadcasts and the shifted join is keyed on day.
    """
    daily = _daily(spark, sf_dir)
    spine = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    right = daily.select(F.col("day").alias("day_r"), F.col("cents").alias("y"))
    pairs = (
        daily.crossJoin(F.broadcast(spine))
        .join(right, F.col("day_r") == F.col("day") + F.col("lag"))
        .select("lag", F.col("cents").alias("x"), "y")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 — exact folds
    # widen BEFORE multiplying: daily cent totals hit ~1e11 at sf1, so
    # a long*long square overflows int64 (caught by the sf1 oracle run)
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("syy"),
        F.sum(dec(F.col("x")) * dec(F.col("y"))).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    fx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    fy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        F.round(num / (F.sqrt(fx) * F.sqrt(fy)), 8).alias("lag_corr"),
    )


# --------------------------------------- seasonal-naive backtest

_SNAIVE_ORACLE = f"""
WITH {_DAILY_SQL},
p7 AS (
    -- HUGEINT: (y-yhat)^2 overflows BIGINT at sf1's ~1e11-cent days
    SELECT CAST(a.cents AS HUGEINT) AS y, CAST(b.cents AS HUGEINT) AS yhat
    FROM daily a JOIN daily b ON b.day = a.day - {SNAIVE_LAG}
), p1 AS (
    SELECT a.cents AS y, b.cents AS yhat
    FROM daily a JOIN daily b ON b.day = a.day - 1
), m7 AS (
    SELECT count(*) AS n7,
           sum(abs(y - yhat)) AS sae,
           sum((y - yhat) * (y - yhat)) AS sse,
           sum(CAST(round(CAST(abs(y - yhat) AS DOUBLE) / y, 10)
                    AS DECIMAL(28,10))) AS sape
    FROM p7 WHERE y > 0
), m1 AS (
    SELECT count(*) AS n1, sum(abs(y - yhat)) AS sae1
    FROM p1 WHERE y > 0
), nd AS (SELECT count(*) AS n_days FROM daily)
SELECT nd.n_days,
       CAST(m7.n7 AS BIGINT) AS n_pairs,
       round(CAST(m7.sae AS DOUBLE) / m7.n7 / 100.0, 6) AS mae_snaive,
       round(sqrt(CAST(m7.sse AS DOUBLE) / m7.n7) / 100.0, 6) AS rmse_snaive,
       round(CAST(m7.sape AS DOUBLE) / m7.n7, 6) AS mape_snaive,
       round(CAST(m1.sae1 AS DOUBLE) / m1.n1 / 100.0, 6) AS mae_naive1,
       round((CAST(m7.sae AS DOUBLE) / m7.n7)
             / (CAST(m1.sae1 AS DOUBLE) / m1.n1), 6) AS mase_ratio
FROM m7, m1, nd
"""


@register("forecast_backtest_snaive", oracle=_SNAIVE_ORACLE)
def forecast_backtest_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the seasonal-naive forecast
    (y^hat_t = y_(t-{SNAIVE_LAG})): MAE/RMSE/MAPE in dollars plus the
    MASE-style ratio vs naive-1 — the baseline gate a real forecaster
    must beat before deployment. Errors are integer cents; only the
    final metric projection touches floats.

    Scale note: two keyed self-joins over the O(days) series; all
    folds are decimal-exact.
    """
    daily = _daily(spark, sf_dir)

    def lag_pairs(k: int) -> DataFrame:
        b = daily.select(F.col("day").alias("day_b"), F.col("cents").alias("yhat"))
        return (
            daily.join(b, F.col("day_b") == F.col("day") - k)
            .where(F.col("cents") > 0)
            .select(F.col("cents").alias("y"), "yhat")
        )

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m7 = lag_pairs(SNAIVE_LAG).agg(
        F.count(F.lit(1)).alias("n7"),
        F.sum(dec(F.abs(F.col("y") - F.col("yhat")))).alias("sae"),
        # widen BEFORE squaring: long*long overflows at sf1 day totals
        F.sum(
            dec(F.col("y") - F.col("yhat")) * dec(F.col("y") - F.col("yhat"))
        ).alias("sse"),
        F.sum(
            F.round(
                F.abs(F.col("y") - F.col("yhat")).cast("double") / F.col("y"), 10
            ).cast("decimal(28,10)")
        ).alias("sape"),
    )
    m1 = lag_pairs(1).agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum(dec(F.abs(F.col("y") - F.col("yhat")))).alias("sae1"),
    )
    nd = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        m7.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(nd))
        .select(
            "n_days",
            F.col("n7").cast("long").alias("n_pairs"),
            F.round(F.col("sae").cast("double") / F.col("n7") / 100.0, 6).alias(
                "mae_snaive"
            ),
            F.round(
                F.sqrt(F.col("sse").cast("double") / F.col("n7")) / 100.0, 6
            ).alias("rmse_snaive"),
            F.round(F.col("sape").cast("double") / F.col("n7"), 6).alias(
                "mape_snaive"
            ),
            F.round(F.col("sae1").cast("double") / F.col("n1") / 100.0, 6).alias(
                "mae_naive1"
            ),
            F.round(
                (F.col("sae").cast("double") / F.col("n7"))
                / (F.col("sae1").cast("double") / F.col("n1")),
                6,
            ).alias("mase_ratio"),
        )
    )


# ------------------------------------- funnel conversion latency

_FUNNEL_LAT_ORACLE = """
WITH fv AS (
    SELECT user_id, min(ts) AS tv FROM events
    WHERE event_type = 'view' AND user_id IS NOT NULL
    GROUP BY user_id
), fp AS (
    SELECT e.user_id,
           CAST(floor(epoch(min(e.ts))) AS BIGINT)
               - CAST(floor(epoch(fv.tv)) AS BIGINT) AS latency_s
    FROM events e JOIN fv ON fv.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > fv.tv
    GROUP BY e.user_id, fv.tv
), ranked AS (
    SELECT latency_s,
           row_number() OVER (ORDER BY latency_s) AS rn,
           count(*) OVER () AS n
    FROM fp
)
SELECT CAST(max(n) AS BIGINT) AS n_converted,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN latency_s END) AS BIGINT)
           AS p50_seconds,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN latency_s END) AS BIGINT)
           AS p90_seconds,
       round(CAST(sum(latency_s) AS DOUBLE) / max(n), 4) AS mean_seconds
FROM ranked
"""


@register(
    "funnel_latency_percentiles",
    oracle=_FUNNEL_LAT_ORACLE,
    bounded_window="distinct integer-second latencies (fixed time span)",
)
def funnel_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view -> first-subsequent-purchase latency per user:
    count, exact type-1 p50/p90 (value at ceil(p*n) — integer row
    selection, no interpolation) and mean seconds.

    Scale note: two keyed folds produce one latency per converted
    user; the percentile ranks then locate via distinct-value
    cumulative counts (operators/ranks.value_cum_counts) — latencies
    are integer SECONDS, so the global window runs over the bounded
    time-span domain, never over per-user rows. No single-partition
    row-level sort (round-5 verdict item 1).
    """
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    fv = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    fp = (
        e.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("ts") > F.col("tv"))
        .groupBy("user_id", "tv")
        .agg(
            (
                F.unix_timestamp(F.min("ts")) - F.unix_timestamp(F.col("tv"))
            ).alias("latency_s")
        )
    )
    from streams_prototyping_spark.operators.ranks import value_cum_counts

    tot = fp.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("latency_s").cast("decimal(38,0)")).alias("sum_lat"),
    )
    # rank-k values via distinct-latency cumulative counts (no global
    # row sort): the p-th value is the one whose cum count spans idx.
    cum = value_cum_counts(fp, "latency_s").crossJoin(F.broadcast(tot))
    idx50 = F.floor((F.col("n") + 1) / 2)
    idx90 = F.floor((9 * F.col("n") + 9) / 10)
    at50 = (F.col("cum") >= idx50) & (F.col("cum_before") < idx50)
    at90 = (F.col("cum") >= idx90) & (F.col("cum_before") < idx90)
    return cum.agg(
        F.max("n").cast("long").alias("n_converted"),
        F.max(F.when(at50, F.col("latency_s"))).cast("long").alias("p50_seconds"),
        F.max(F.when(at90, F.col("latency_s"))).cast("long").alias("p90_seconds"),
        F.round(
            F.max("sum_lat").cast("double") / F.max("n"), 4
        ).alias("mean_seconds"),
    )


# --------------------------------------- event-sequence Markov chain

_MARKOV_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), trans AS (
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY prev_type), 8) AS prob
FROM trans
"""


@register("event_type_markov", oracle=_MARKOV_ORACLE)
def event_type_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences. The lag orders by (ts, event_id) — the unique-id
    tie-break that keeps the sequence deterministic where timestamps
    collide (the testdata has same-second events per user).

    Scale note: one user-partitioned lag window (bounded per-user
    state), one |types|^2-key fold; the probability window runs over
    the 25-row transition table.
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return trans.select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("prev_type")),
            8,
        ).alias("prob"),
    )
