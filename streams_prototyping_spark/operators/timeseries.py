"""Time-series model operators: per-group OLS trend and linear
gap interpolation with reconstruction-error audit.

- user_value_trend: per-user ordinary-least-squares slope/intercept of
  event value over time — the "is this metric drifting" primitive
  behind alerting and cohort health dashboards. Closed-form OLS from
  sufficient statistics (n, Σx, Σy, Σxy, Σx²), never an iterative fit.
- interpolate_masked_days: linear interpolation over the daily order
  series with every 5th day deterministically masked, reporting the
  reconstruction error on the masked days — the gap-repair operator
  plus its own accuracy audit in one query (a pipeline owner sees
  exactly how trustworthy interpolated points are).

Reference parity note: the reference repo (apurvam/streams-prototyping)
has no time-series operators; these extend the engine per the
north-star mandate (SURVEY.md Part C'').

Determinism across engines: OLS sufficient statistics are EXACT —
x is integer seconds from a fixed 2024-01-01 base (span ≤ 2.6e6 s, so
x² ≤ 7e12 is exact in BIGINT and DOUBLE alike), Σx/Σx² accumulate as
DECIMAL(38,0), y-sums as pre-rounded DECIMAL(28,4) — so partial-agg
order cannot fork them; the closed-form division happens once, in
doubles cast from identical decimals, with an identical expression
tree on both engines. Interpolation arithmetic is a single expression
over already-exact window values, rounded at output.

Scale design (100 TB): user_value_trend is one partial-combined
groupBy(user_id) over a narrow projection — the canonical scalable
aggregate (sufficient statistics ARE the partial state; this is why
closed-form OLS beats any iterative fit at scale). The interpolation
windows run over the aggregated DAILY series (O(days) rows, thousands
— not raw events), so the unpartitioned ORDER BY day window is a
single small task by construction; a longer-horizon deployment
partitions the window by year and stitches boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register

X_BASE = 1_704_067_200  # epoch of 2024-01-01 00:00:00 UTC (events epoch base)
MASK_EVERY = 5          # interpolate_masked_days: mask every 5th day

_TREND_ORACLE = f"""
WITH pts AS (
    SELECT user_id,
           CAST(floor(epoch(ts)) AS BIGINT) - {X_BASE} AS x,
           CAST(value AS DOUBLE) AS y
    FROM events
), s AS (
    SELECT user_id,
           count(*) AS n,
           CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
           CAST(sum(CAST(round(y, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sy,
           CAST(sum(CAST(round(x * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
           CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx
    FROM pts GROUP BY user_id
)
SELECT user_id, n AS n_points,
       round(86400.0 * (n * sxy - sx * sy)
             / nullif(n * sxx - sx * sx, 0.0), 6) AS slope_per_day,
       round((sy - ((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)) * sx)
             / n, 6) AS intercept
FROM s
"""


@register("user_value_trend", oracle=_TREND_ORACLE)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value over time: slope (value units
    per day) and intercept (value at the {X_BASE} epoch base), from
    exact sufficient statistics. Degenerate users (single point or
    zero time variance) get NULL slope/intercept via nullif.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        (F.unix_timestamp("ts") - F.lit(X_BASE)).alias("x"),
        F.col("value").cast("double").alias("y"),
    )
    s = pts.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.round("y", 4).cast("decimal(28,4)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
    )
    n = F.col("n")
    denom = F.nullif(n * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0))
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return s.select(
        "user_id",
        n.alias("n_points"),
        F.round(F.lit(86400.0) * slope, 6).alias("slope_per_day"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("intercept"),
    )


# ------------------------------------------------- masked-day interpolation

_INTERP_ORACLE = f"""
WITH daily AS (
    SELECT CAST(floor(epoch(date_trunc('day', o_orderdate))) AS BIGINT) AS day_epoch,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
), m AS (
    SELECT day_epoch, n_orders, total,
           ((day_epoch // 86400) % {MASK_EVERY} = 0) AS is_masked,
           CASE WHEN (day_epoch // 86400) % {MASK_EVERY} = 0 THEN NULL
                ELSE total END AS obs,
           CASE WHEN (day_epoch // 86400) % {MASK_EVERY} = 0 THEN NULL
                ELSE day_epoch END AS obs_day
    FROM daily
), w AS (
    SELECT day_epoch, n_orders, total, is_masked,
           last_value(obs IGNORE NULLS) OVER (
               ORDER BY day_epoch
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
           last_value(obs_day IGNORE NULLS) OVER (
               ORDER BY day_epoch
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
           first_value(obs IGNORE NULLS) OVER (
               ORDER BY day_epoch
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
           first_value(obs_day IGNORE NULLS) OVER (
               ORDER BY day_epoch
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
    FROM m
)
SELECT day_epoch, is_masked, n_orders,
       round(total, 6) AS total,
       round(CASE WHEN NOT is_masked THEN total
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * (CAST(day_epoch - pd AS DOUBLE)
                                         / CAST(nd - pd AS DOUBLE)) END, 6) AS filled,
       CASE WHEN is_masked THEN
            round(abs(CASE WHEN pv IS NULL THEN nv
                           WHEN nv IS NULL THEN pv
                           ELSE pv + (nv - pv) * (CAST(day_epoch - pd AS DOUBLE)
                                                  / CAST(nd - pd AS DOUBLE)) END
                      - total), 6)
            ELSE NULL END AS abs_err
FROM w
"""


@register(
    "interpolate_masked_days",
    oracle=_INTERP_ORACLE,
    bounded_window="calendar days (fixed time span)",
)
def interpolate_masked_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the daily order-revenue series with
    every {MASK_EVERY}th day masked, plus per-masked-day reconstruction
    error — the gap-repair operator carrying its own accuracy audit.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.unix_timestamp(F.date_trunc("day", "o_orderdate")).alias("day_epoch")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    # day_epoch is always a multiple of 86400, so this division is exact
    is_masked = ((F.col("day_epoch") / F.lit(86400)).cast("long") % MASK_EVERY) == 0
    m = daily.select(
        "day_epoch",
        "n_orders",
        "total",
        is_masked.alias("is_masked"),
        F.when(~is_masked, F.col("total")).alias("obs"),
        F.when(~is_masked, F.col("day_epoch")).alias("obs_day"),
    )
    wp = Window.orderBy("day_epoch").rowsBetween(Window.unboundedPreceding, -1)
    wn = Window.orderBy("day_epoch").rowsBetween(1, Window.unboundedFollowing)
    w = m.select(
        "day_epoch",
        "n_orders",
        "total",
        "is_masked",
        F.last("obs", ignorenulls=True).over(wp).alias("pv"),
        F.last("obs_day", ignorenulls=True).over(wp).alias("pd"),
        F.first("obs", ignorenulls=True).over(wn).alias("nv"),
        F.first("obs_day", ignorenulls=True).over(wn).alias("nd"),
    )
    interp = (
        F.when(~F.col("is_masked"), F.col("total"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                (F.col("day_epoch") - F.col("pd")).cast("double")
                / (F.col("nd") - F.col("pd")).cast("double")
            )
        )
    )
    return w.select(
        "day_epoch",
        "is_masked",
        "n_orders",
        F.round("total", 6).alias("total"),
        F.round(interp, 6).alias("filled"),
        F.when(F.col("is_masked"), F.round(F.abs(interp - F.col("total")), 6)).alias(
            "abs_err"
        ),
    )


# ------------------------------------------------ trailing rolling median

ROLL_W = 7  # trailing window (days), current day inclusive

_ROLLMED_ORACLE = f"""
WITH daily AS (
    SELECT CAST(floor(epoch(date_trunc('day', o_orderdate))) AS BIGINT) AS day_epoch,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
), w AS (
    SELECT day_epoch, total,
           list_sort(list(total) OVER (
               ORDER BY day_epoch
               ROWS BETWEEN {ROLL_W - 1} PRECEDING AND CURRENT ROW)) AS win
    FROM daily
)
SELECT day_epoch,
       round(total, 6) AS total,
       CAST(len(win) AS BIGINT) AS n_window,
       round(CASE WHEN len(win) % 2 = 1 THEN win[(len(win) + 1) // 2]
                  ELSE (win[len(win) // 2] + win[len(win) // 2 + 1]) / 2.0 END,
             6) AS rolling_median
FROM w
"""


@register(
    "rolling_median_daily",
    oracle=_ROLLMED_ORACLE,
    bounded_window="calendar days (fixed time span)",
)
def rolling_median_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact {ROLL_W}-day trailing median of daily order revenue — the
    robust rolling smoother (a single outlier day cannot move it,
    unlike a rolling mean). Computed by collecting the trailing window
    into an in-row sorted array: exact, deterministic, and cheap
    because the window is a small CONSTANT (the aggregated daily
    series, not raw rows).

    Scale note: same single-series window argument as
    interpolate_masked_days — O(days) rows, window state O(ROLL_W);
    a per-key variant partitions the window by the key and scales as
    one keyed shuffle. Approximate sketches are unnecessary when the
    window is constant-bounded; they enter only for
    unbounded-cardinality windows (the approx_percentiles path).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.unix_timestamp(F.date_trunc("day", "o_orderdate")).alias("day_epoch")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )
    win = Window.orderBy("day_epoch").rowsBetween(-(ROLL_W - 1), 0)
    arr = F.array_sort(F.collect_list("total").over(win))
    n = F.size(arr)
    med = F.when(
        n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(arr, (n / 2).cast("int"))
            + F.element_at(arr, (n / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return daily.select(
        "day_epoch",
        F.round("total", 6).alias("total"),
        n.cast("long").alias("n_window"),
        F.round(med, 6).alias("rolling_median"),
    )


# ---------------------------------------------- day-of-week seasonality

_DOW_ORACLE = """
WITH d AS (
    SELECT ((CAST(floor(epoch(date_trunc('day', o_orderdate))) AS BIGINT)
             // 86400 + 4) % 7) AS dow,
           o_totalprice
    FROM orders
), agg AS (
    SELECT dow, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM d GROUP BY dow
), tot AS (SELECT CAST(sum(CAST(round(revenue, 6) AS DECIMAL(25,6))) AS DOUBLE) AS total FROM agg)
SELECT dow, n_orders,
       round(revenue, 6) AS revenue,
       round(revenue / n_orders, 6) AS mean_order_value,
       round(revenue / tot.total, 6) AS revenue_share
FROM agg CROSS JOIN tot
"""


@register("orders_dow_seasonality", oracle=_DOW_ORACLE)
def orders_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile of order revenue (0=Sunday).
    The weekday is derived arithmetically from the epoch day number
    ((days + 4) % 7 — 1970-01-01 was a Thursday) instead of calendar
    functions, because Spark's dayofweek (1=Sunday) and DuckDB's dow
    (0=Sunday) disagree by convention — the epoch formula is the same
    integer arithmetic in both engines.

    Scale note: one partial-combined 7-key aggregate over a narrow
    projection plus a broadcast 1-row total — scan-bound at any scale.
    """
    o = load_table(spark, sf_dir, "orders")
    day = (F.unix_timestamp(F.date_trunc("day", "o_orderdate")) / F.lit(86400)).cast(
        "long"
    )
    agg = o.groupBy(((day + 4) % 7).alias("dow")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )
    tot = agg.agg(
        F.sum(F.round("revenue", 6).cast("decimal(25,6)")).cast("double").alias("total")
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_orders",
        F.round("revenue", 6).alias("revenue"),
        F.round(F.col("revenue") / F.col("n_orders"), 6).alias("mean_order_value"),
        F.round(F.col("revenue") / F.col("total"), 6).alias("revenue_share"),
    )


# ------------------------------------ Holt double-exponential smoothing

HOLT_ALPHA_NUM, HOLT_ALPHA_DEN = 5, 10   # alpha = 0.5
HOLT_BETA_NUM, HOLT_BETA_DEN = 3, 10     # beta = 0.3
HOLT_SCALE = 10**6                       # fixed-point: value 1.00 == 1e6 units

# level update on fixed-point ints: l' = floor((5*x + 5*(l+b)) / 10)
_HOLT_L = (
    f"CAST(FLOOR(({HOLT_ALPHA_NUM} * {{x}} + ({HOLT_ALPHA_DEN} - {HOLT_ALPHA_NUM})"
    f" * ({{l}} + {{b}})) / {HOLT_ALPHA_DEN}) AS BIGINT)"
)
# trend update: b' = floor((3*(l' - l) + 7*b) / 10)
_HOLT_B = (
    f"CAST(FLOOR(({HOLT_BETA_NUM} * ({{lnew}} - {{l}}) + ({HOLT_BETA_DEN} - "
    f"{HOLT_BETA_NUM}) * {{b}}) / {HOLT_BETA_DEN}) AS BIGINT)"
)

_HOLT_ORACLE = f"""
WITH RECURSIVE daily AS (
    SELECT event_type,
           CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
           CAST(sum(CAST(value AS DECIMAL(18,2))) * {HOLT_SCALE // 100} AS BIGINT)
               AS xs
    FROM events GROUP BY 1, 2
), seq AS (
    SELECT event_type, xs,
           row_number() OVER (PARTITION BY event_type ORDER BY day_epoch) AS idx,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM daily
), init AS (
    SELECT s1.event_type, s1.n, s1.xs AS l, s2.xs - s1.xs AS b
    FROM seq s1 JOIN seq s2
      ON s2.event_type = s1.event_type AND s1.idx = 1 AND s2.idx = 2
), step AS (
    SELECT event_type, n, 1 AS t, l, b FROM init
    UNION ALL
    SELECT s.event_type, s.n, s.t + 1,
           {_HOLT_L.format(x='d.xs', l='s.l', b='s.b')},
           {_HOLT_B.format(lnew=_HOLT_L.format(x='d.xs', l='s.l', b='s.b'), l='s.l', b='s.b')}
    FROM step s JOIN seq d
      ON d.event_type = s.event_type AND d.idx = s.t + 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       round(CAST(l AS DOUBLE) / {HOLT_SCALE}, 6) AS level,
       round(CAST(b AS DOUBLE) / {HOLT_SCALE}, 6) AS trend,
       round(CAST(l + b AS DOUBLE) / {HOLT_SCALE}, 6) AS forecast_next
FROM step WHERE t = n
"""


@register("holt_smoothing_daily", oracle=_HOLT_ORACLE)
def holt_smoothing_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend, alpha=0.5,
    beta=0.3) over the daily value series per event type, emitting the
    final state and one-step-ahead forecast — the classic short-horizon
    forecaster one level up from `ewma_per_user` (which has no trend
    term).

    Determinism: the recurrence runs in FIXED-POINT integer arithmetic
    (values scaled to 1e6 units; alpha/beta applied as integer ratios
    with a shared floor-div idiom) — the same quantize-everything
    recipe as pagerank_parts, so both engines walk identical integer
    trajectories; floats appear only at output. The Spark side folds
    the recurrence in-row over the time-ordered array (the ewma
    pattern); the oracle steps the identical recurrence with a
    recursive CTE.

    Scale note: one partial-aggregated groupBy(event_type, day) over
    raw events, then a per-type fold over O(days) elements inside
    codegen — state per group is two bigints, the streaming twin keeps
    exactly that in applyInPandasWithState.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_epoch"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * (HOLT_SCALE // 100))
        .cast("long")
        .alias("xs")
    )
    seqs = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("day_epoch"), F.col("xs")))
        ).alias("rows")
    )
    xs = "transform(rows, r -> r.xs)"
    lstep = _HOLT_L.format(x="x", l="acc.l", b="acc.b")
    fold = (
        f"aggregate(slice({xs}, 2, size({xs}) - 1), "
        f"named_struct('l', element_at({xs}, 1), "
        f"'b', element_at({xs}, 2) - element_at({xs}, 1)), "
        f"(acc, x) -> named_struct("
        f"'l', {lstep}, "
        f"'b', {_HOLT_B.format(lnew=lstep, l='acc.l', b='acc.b')}))"
    )
    return seqs.filter(F.expr(f"size({xs}) >= 2")).select(
        "event_type",
        F.expr(f"size({xs})").cast("long").alias("n_days"),
        F.round(F.expr(f"CAST(({fold}).l AS DOUBLE)") / HOLT_SCALE, 6).alias("level"),
        F.round(F.expr(f"CAST(({fold}).b AS DOUBLE)") / HOLT_SCALE, 6).alias("trend"),
        F.round(
            F.expr(f"CAST(({fold}).l + ({fold}).b AS DOUBLE)") / HOLT_SCALE, 6
        ).alias("forecast_next"),
    )


# ------------------------------------- seasonal residual anomalies

ANOM_SIGMA = 2.0  # |residual| > ANOM_SIGMA * sigma flags a day

_ANOM_ORACLE = f"""
WITH daily AS (
    SELECT CAST(floor(epoch(date_trunc('day', o_orderdate))) AS BIGINT) AS day_epoch,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
), keyed AS (
    SELECT day_epoch, total, ((day_epoch // 86400) + 4) % 7 AS dow FROM daily
), dow_mean AS (
    -- mean in exact integer micro-dollars: (2s+n)//(2n) is round-half-
    -- up without touching doubles — the cents sum / day count lands
    -- EXACTLY on 6-dp halves at sf10 (3500 days of integer cents), and
    -- round(double) forks engines there
    SELECT dow,
           CAST((2 * CAST(sum(CAST(total AS DECIMAL(18,2))) * 10000 AS BIGINT)
                 + count(*)) // (2 * count(*)) AS DOUBLE) / 1e6 AS expected
    FROM keyed GROUP BY dow
), resid AS (
    SELECT k.day_epoch, k.total, k.dow, m.expected,
           CAST(CAST(k.total AS DECIMAL(18,2)) - CAST(m.expected AS DECIMAL(18,6))
               AS DOUBLE) AS residual
    FROM keyed k JOIN dow_mean m USING (dow)
), sigma AS (
    SELECT sqrt(CAST(sum(CAST(residual AS DECIMAL(19,6))
                    * CAST(residual AS DECIMAL(19,6))) AS DOUBLE)
                / count(*)) AS s
    FROM resid
)
SELECT r.day_epoch, r.total, r.dow, r.expected,
       round(r.residual, 6) AS residual,
       (abs(r.residual) > {ANOM_SIGMA} * g.s) AS is_anomaly
FROM resid r CROSS JOIN sigma g
"""


@register("seasonal_residual_anomalies", oracle=_ANOM_ORACLE)
def seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly flags on the daily revenue series:
    subtract the day-of-week mean (the dominant seasonal component),
    then flag days whose residual exceeds {ANOM_SIGMA}x the RMS
    residual — the additive-decomposition anomaly gate behind
    revenue/traffic monitoring (a raw threshold would fire every
    weekend; the deseasonalized one only on genuine outliers).

    Determinism: day-of-week uses the engine-neutral epoch-day
    arithmetic (epoch day 0 = Thursday, so +4 lands Sunday=0); the
    dow means are computed in exact integer micro-dollars with
    (2s+n)//(2n) round-half-up — the cents-sum/day-count ratio lands
    EXACTLY on 6-dp halves at sf10, where round(double) is
    engine-dependent (the mahalanobis/bigram_lm lesson); residuals
    are exact decimal differences; sigma's sum of squares is an EXACT
    decimal product of the 6-dp residuals (12-dp squares, order-free
    exact sum); sqrt is IEEE-identical on identical
    doubles.

    Scale note: everything after the first partial-combined daily
    rollup runs on O(days) rows; the sigma scalar broadcasts back.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.unix_timestamp(F.date_trunc("day", "o_orderdate")).alias("day_epoch")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )
    keyed = daily.select(
        "day_epoch", "total", F.expr("((day_epoch div 86400) + 4) % 7").alias("dow")
    )
    dow_mean = (
        keyed.groupBy("dow")
        .agg(
            (F.sum(F.col("total").cast("decimal(18,2)")) * 10000)
            .cast("long")
            .alias("s_micro"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "dow",
            (
                F.expr("CAST((2 * s_micro + cnt) div (2 * cnt) AS DOUBLE)")
                / F.lit(1e6)
            ).alias("expected"),
        )
    )
    resid = keyed.join(dow_mean, "dow").select(
        "day_epoch",
        "total",
        "dow",
        "expected",
        (
            F.col("total").cast("decimal(18,2)")
            - F.col("expected").cast("decimal(18,6)")
        )
        .cast("double")
        .alias("residual"),
    )
    sigma = resid.agg(
        F.sqrt(
            F.sum(
                F.col("residual").cast("decimal(19,6)")
                * F.col("residual").cast("decimal(19,6)")
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("s")
    )
    return resid.crossJoin(F.broadcast(sigma)).select(
        "day_epoch",
        "total",
        "dow",
        "expected",
        F.round("residual", 6).alias("residual"),
        (F.abs(F.col("residual")) > F.lit(ANOM_SIGMA) * F.col("s")).alias(
            "is_anomaly"
        ),
    )


# ---------------------------------------------- rolling correlation

CORR_WIN = 7  # trailing days in the correlation window

_ROLLCORR_ORACLE = f"""
WITH daily AS (
    SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
           sum(CASE WHEN event_type = 'view'
                    THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2))
               END) AS x,
           sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2))
               END) AS y
    FROM events GROUP BY 1
), stats AS (
    SELECT day_epoch,
           count(*) OVER w AS n,
           CAST(sum(x) OVER w AS DOUBLE) AS sx,
           CAST(sum(y) OVER w AS DOUBLE) AS sy,
           CAST(sum(CAST(x AS DECIMAL(19,2)) * CAST(x AS DECIMAL(19,2))) OVER w
               AS DOUBLE) AS sxx,
           CAST(sum(CAST(y AS DECIMAL(19,2)) * CAST(y AS DECIMAL(19,2))) OVER w
               AS DOUBLE) AS syy,
           CAST(sum(CAST(x AS DECIMAL(19,2)) * CAST(y AS DECIMAL(19,2))) OVER w
               AS DOUBLE) AS sxy
    FROM daily
    WINDOW w AS (ORDER BY day_epoch ROWS BETWEEN {CORR_WIN - 1} PRECEDING
                 AND CURRENT ROW)
)
SELECT day_epoch, CAST(n AS BIGINT) AS n_days,
       round(sx, 2) AS x_sum, round(sy, 2) AS y_sum,
       CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN NULL
            ELSE round((n * sxy - sx * sy)
                       / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
       END AS corr7
FROM stats
"""


@register(
    "rolling_corr_daily",
    oracle=_ROLLCORR_ORACLE,
    bounded_window="calendar days (fixed time span)",
)
def rolling_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {CORR_WIN}-day Pearson correlation between daily view
    spend and daily purchase spend — the "are these metrics still
    coupled" drift monitor (a decoupling day is a leading incident
    indicator that neither series' own anomaly gate sees).

    Determinism: the five sufficient statistics (Σx, Σy, Σx², Σy²,
    Σxy) accumulate as EXACT decimals inside the window frame (2-dp
    inputs, 4-dp products), so the closed-form correlation is computed
    from identical doubles in both engines; zero-variance windows emit
    NULL identically. Same sufficient-statistics-as-state design as
    user_value_trend, pushed into a sliding frame.

    Scale note: raw events partial-aggregate to O(days) rows before
    any window; the unpartitioned ORDER BY day frame runs on that tiny
    series (a year is 365 rows), partitioned by year at longer
    horizons.
    """
    ev = load_table(spark, sf_dir, "events")
    dec0 = F.lit(0).cast("decimal(18,2)")
    daily = ev.groupBy(
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_epoch")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "view", F.col("value").cast("decimal(18,2)"))
            .otherwise(dec0)
        ).alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("value").cast("decimal(18,2)")
            ).otherwise(dec0)
        ).alias("y"),
    )
    w = Window.orderBy("day_epoch").rowsBetween(-(CORR_WIN - 1), 0)
    xd = F.col("x").cast("decimal(19,2)")
    yd = F.col("y").cast("decimal(19,2)")
    stats = daily.select(
        "day_epoch",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).cast("double").alias("sx"),
        F.sum("y").over(w).cast("double").alias("sy"),
        F.sum(xd * xd).over(w).cast("double").alias("sxx"),
        F.sum(yd * yd).over(w).cast("double").alias("syy"),
        F.sum(xd * yd).over(w).cast("double").alias("sxy"),
    )
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(var_x) * F.sqrt(var_y)
    )
    return stats.select(
        "day_epoch",
        F.col("n").cast("long").alias("n_days"),
        F.round("sx", 2).alias("x_sum"),
        F.round("sy", 2).alias("y_sum"),
        F.when((var_x <= 0) | (var_y <= 0), F.lit(None).cast("double"))
        .otherwise(F.round(corr, 6))
        .alias("corr7"),
    )


# ------------------------------------------ Mann-Kendall trend test

_MK_DAILY = """
    SELECT date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS di,
           sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
    FROM orders GROUP BY 1
"""

_MK_ORACLE = f"""
WITH d AS ({_MK_DAILY}
), p AS (
    SELECT CASE WHEN b.cents > a.cents THEN 1
                WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
    FROM d a JOIN d b ON b.di > a.di
), s AS (
    SELECT CAST(sum(sgn) AS BIGINT) AS s_stat,
           (SELECT count(*) FROM d) AS n
    FROM p
), t AS (
    SELECT coalesce(sum(tp * (tp - 1) * (2 * tp + 5)), 0) AS tie_term
    FROM (SELECT count(*) AS tp FROM d GROUP BY cents) g WHERE tp > 1
), v AS (
    SELECT s.n, s.s_stat,
           (s.n * (s.n - 1) * (2 * s.n + 5) - t.tie_term) AS var18
    FROM s, t
)
SELECT CAST(n AS BIGINT) AS n_days, s_stat,
       round(CAST(var18 AS DOUBLE) / 18, 6) AS var_s,
       CASE WHEN s_stat > 0 THEN round((s_stat - 1) / sqrt(var18 / 18.0), 4)
            WHEN s_stat < 0 THEN round((s_stat + 1) / sqrt(var18 / 18.0), 4)
            ELSE 0.0 END AS z_stat,
       CASE WHEN (CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var18 / 18.0)
                       WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var18 / 18.0)
                       ELSE 0.0 END) > 1.96 THEN 'increasing'
            WHEN (CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var18 / 18.0)
                       WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var18 / 18.0)
                       ELSE 0.0 END) < -1.96 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM v
"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue in integer cents keyed by day index — the
    shared fixed-point series the non-parametric trend tests run on."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("2024-01-01")).alias("di")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"))


@register("mann_kendall_trend", oracle=_MK_ORACLE)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall non-parametric trend test over daily revenue:
    S = sum of sign(x_j - x_i) over ordered day pairs, tie-corrected
    variance, continuity-corrected z. The whole trajectory is integer
    (cents, signs, 18*Var) until the final sqrt of an identical
    double, so engines cannot fork (round-3 fixed-point recipe).

    Scale note: the pairwise join runs over the AGGREGATED daily
    series (O(days) rows — bounded by calendar span, not corpus
    size), so the O(days^2) pair fan-out is a constant-size broadcast
    nested-loop by construction, exactly like join_theta_residual.
    Raw orders collapse in one partial-combined aggregate first.
    """
    d = _daily_cents(spark, sf_dir)
    a, b = d.alias("a"), d.alias("b")
    p = a.join(F.broadcast(b), F.col("b.di") > F.col("a.di")).select(
        F.when(F.col("b.cents") > F.col("a.cents"), 1)
        .when(F.col("b.cents") < F.col("a.cents"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    s = p.agg(F.sum("sgn").cast("long").alias("s_stat")).crossJoin(
        F.broadcast(d.agg(F.count("*").alias("n")))
    )
    ties = (
        d.groupBy("cents")
        .agg(F.count("*").alias("tp"))
        .filter(F.col("tp") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("tp") * (F.col("tp") - 1) * (2 * F.col("tp") + 5)),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    v = s.crossJoin(F.broadcast(ties)).withColumn(
        "var18",
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term"),
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            F.round((F.col("s_stat") - 1) / F.sqrt(F.col("var18") / 18.0), 4),
        )
        .when(
            F.col("s_stat") < 0,
            F.round((F.col("s_stat") + 1) / F.sqrt(F.col("var18") / 18.0), 4),
        )
        .otherwise(F.lit(0.0))
    )
    z_raw = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(F.col("var18") / 18.0))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(F.col("var18") / 18.0))
        .otherwise(F.lit(0.0))
    )
    return v.select(
        F.col("n").cast("long").alias("n_days"),
        "s_stat",
        F.round(F.col("var18").cast("double") / 18, 6).alias("var_s"),
        z.alias("z_stat"),
        F.when(z_raw > 1.96, "increasing")
        .when(z_raw < -1.96, "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    )


# ------------------------------------------------- Theil-Sen slope

_TS_ORACLE = """
WITH d AS (
    SELECT date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) // 7 AS wk,
           sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
    FROM orders GROUP BY 1
), p AS (
    SELECT round(CAST(b.cents - a.cents AS DOUBLE) / (b.wk - a.wk) / 100, 9) AS slope
    FROM d a JOIN d b ON b.wk > a.wk
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       round(quantile_cont(slope, 0.5), 6) AS median_slope_per_week,
       round(quantile_cont(slope, 0.25), 6) AS q1_slope,
       round(quantile_cont(slope, 0.75), 6) AS q3_slope
FROM p
"""


@register("theil_sen_slope", oracle=_TS_ORACLE)
def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator over WEEKLY revenue: the
    median of all pairwise slopes (dollars/week), with the IQR as the
    spread report — the outlier-resistant complement to
    user_value_trend's OLS (a single anomalous week cannot move the
    median slope). Weekly, not daily, deliberately: day-of-week
    seasonality (orders_dow_seasonality measures it) contaminates
    daily pairwise slopes, and the weekly series also bounds the
    O(n^2) pair set at ~sqrt the daily size (59k vs 2.9M pairs over
    the test span — measured 25 s -> sub-second for the exact
    percentile fold). Slopes are rounded to 9 dp at definition so
    both engines take the exact quantiles of identical value sets
    (Spark `percentile` == DuckDB `quantile_cont` interpolation);
    all three quantiles come from ONE percentile(array) buffer.

    Scale note: pairs are formed over the O(weeks) aggregated series
    (see mann_kendall_trend) — cost is bounded by calendar span;
    corpus size only affects the initial partial-combined aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.expr(
            "datediff(to_date(o_orderdate), DATE '2024-01-01') DIV 7"
        ).alias("wk")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"))
    a, b = d.alias("a"), d.alias("b")
    p = a.join(F.broadcast(b), F.col("b.wk") > F.col("a.wk")).select(
        F.round(
            (F.col("b.cents") - F.col("a.cents")).cast("double")
            / (F.col("b.wk") - F.col("a.wk"))
            / 100,
            9,
        ).alias("slope")
    )
    q = p.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.percentile("slope", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("qs"),
    )
    return q.select(
        "n_pairs",
        F.round(F.col("qs")[1], 6).alias("median_slope_per_week"),
        F.round(F.col("qs")[0], 6).alias("q1_slope"),
        F.round(F.col("qs")[2], 6).alias("q3_slope"),
    )
