"""Statistical audit operators: deterministic sketches and evaluation
statistics a pipeline owner runs over production tables.

Each operator is a fully oracle-checked statistic (no rows-only
checks): where the classic formulation uses engine-specific RNG or
float folds, the implementation is restructured so BOTH engines
compute bit-identical results (portable md5 hashing, decimal sums,
round-before-use transcendentals — the round-2/3 determinism recipe).

- hll_distinct_audit: a REAL HyperLogLog (m=64 registers) built from
  portable md5 bits, audited against the exact distinct count. Like
  count_min_heavy_hitters this makes the sketch itself hash-checkable
  by the driver, not just a bounds twin: register selection and the
  leading-zero rank are derived from disjoint substrings of one md5,
  and the leading-zero count is computed from the HEX STRING (strip
  leading '0's + a 4-case nibble table), so no engine-specific bit
  intrinsics are involved.
- roc_auc_value_purchase: EXACT ROC AUC (Mann-Whitney rank-sum with
  midrank tie handling) of `value` as a predictor of purchase events.
- calibration_bins: reliability table for a min-max-normalized score
  vs the purchase label (mean predicted vs empirical rate per decile
  bin) — the ECE table a team reads next to the AUC.
- changepoint_daily_revenue: cumulative-deviation change-point scan
  over the daily revenue series, all in integer cents (fixed-point —
  no float drift anywhere in the trajectory).
- benford_first_digit: first-significant-digit distribution of order
  totals vs the Benford expectation with per-digit chi-square terms.
- equidepth_value_histogram: exact equi-depth (by-count) decile
  histogram of l_extendedprice, assigned BY VALUE so the only window
  runs over the distinct-value table, never the raw rows.
- aa_split_audit: hash users into two arms (the A/A experiment that
  validates the splitter itself) and compare conversion rates with a
  two-proportion pooled z statistic.

Reference parity: the reference (apurvam/streams-prototyping, 408 Java
LoC) has no statistics layer; these extend the engine for the
LLM-pipeline mandate (SURVEY.md Part C). The aggregate-state shapes,
however, are exactly the reference's partial-fold model
(Aggregations.java:100-129): HLL registers and CMS cells are mergeable
partial states, the same way its (sum,sum,count) CSV string is.

Scale design (100 TB):
- hll_distinct_audit: the sketch is a 64-cell max-aggregate — the
  mergeable O(1) state that survives any partitioning (map-side
  partial max per register, one 64-row shuffle). The exact side is
  the audit; production estimates from the sketch alone.
- roc_auc / calibration: group-by-score first, so the ranking window
  runs over DISTINCT score values (bounded domain: 2-dp money), not
  rows. For unbounded-cardinality scores the same plan runs over
  rounded scores (the calibration view is inherently binned anyway).
- changepoint: the window runs over the O(days) aggregated series.
- equidepth: boundaries from the distinct-value cumulative table;
  unbounded domains would swap in approx_percentile boundaries
  (the sketch path exists: approx_percentiles).
- aa_split: one user-keyed aggregate + one global fold. No shuffle
  beyond the groupBy(user) that conversion attribution needs anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register
from streams_prototyping_spark.functions.portable_hash import portable_hash64_sql

# --------------------------------------------------------- HyperLogLog

HLL_M = 64  # registers (p = 6)
# alpha_64 = 0.7213 / (1 + 1.079/64), rounded once, shared by both engines
HLL_ALPHA = 0.709340955


def _hll_rho_sql(tail: str) -> str:
    """Leading-zero rank (rho) of a 15-hex-char (60-bit) string, as
    portable SQL over a column named ``tail``: 4 bits per stripped
    leading '0' plus a 4-case table for the first non-zero nibble.
    An all-zero tail has rank 61 (all 60 bits zero + 1)."""
    stripped = f"regexp_replace({tail}, '^0+', '')"
    return (
        f"CASE WHEN length({stripped}) = 0 THEN 61 "
        f"ELSE 4 * (15 - length({stripped})) + "
        f"(CASE WHEN nib >= 8 THEN 0 WHEN nib >= 4 THEN 1 "
        f"WHEN nib >= 2 THEN 2 ELSE 3 END) + 1 END"
    )


_HLL_ORACLE = f"""
WITH u AS (
    SELECT DISTINCT CAST(user_id AS VARCHAR) AS uid
    FROM events WHERE user_id IS NOT NULL
), h AS (
    SELECT CAST('0x' || substr(md5('hll:' || uid), 1, 15) AS BIGINT) % {HLL_M} AS reg,
           substr(md5('hll:' || uid), 16, 15) AS tail
    FROM u
), n AS (
    SELECT reg, tail,
           CAST('0x' || substr(regexp_replace(tail, '^0+', '') || '1', 1, 1) AS INT) AS nib
    FROM h
), r AS (
    SELECT reg, max({_hll_rho_sql('tail')}) AS rho FROM n GROUP BY reg
), s AS (
    SELECT count(*) AS n_present,
           CAST(sum(CAST(power(2.0, -rho) AS DECIMAL(38,25))) AS DOUBLE) AS pow_present
    FROM r
), e AS (
    SELECT CAST({HLL_M} AS BIGINT) AS m,
           CAST(n_present AS BIGINT) AS nonzero_registers,
           CAST({HLL_M} - n_present AS BIGINT) AS empty_registers,
           round({HLL_ALPHA} * {HLL_M * HLL_M} /
                 (pow_present + ({HLL_M} - n_present) * 1.0), 4) AS raw_est
    FROM s
), x AS (
    SELECT count(DISTINCT user_id) AS exact_distinct
    FROM events WHERE user_id IS NOT NULL
)
SELECT m, nonzero_registers, empty_registers, raw_est,
       CASE WHEN raw_est <= 2.5 * {HLL_M} AND empty_registers > 0
            THEN round({HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / empty_registers), 4)
            ELSE raw_est END AS est,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       round(abs((CASE WHEN raw_est <= 2.5 * {HLL_M} AND empty_registers > 0
                       THEN round({HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / empty_registers), 4)
                       ELSE raw_est END) - exact_distinct) / exact_distinct, 4)
           AS rel_err
FROM e, x
"""


def hll_reg_rho(df: DataFrame, uid_col: str = "uid") -> DataFrame:
    """Per-row (reg, rho) HLL projection over a string id column —
    the ONE definition both the batch audit and the streaming sketch
    twin use (single-sourced constants, round-2 lesson). Register
    index and leading-zero rank come from disjoint substrings of one
    md5; rho is computed from the hex string (strip '0's + nibble
    table), so no engine bit intrinsics are involved."""
    h = df.select(
        F.expr(
            f"CAST(conv(substring(md5(concat('hll:', {uid_col})), 1, 15), 16, 10) AS BIGINT) % {HLL_M}"
        ).alias("reg"),
        F.expr(f"substring(md5(concat('hll:', {uid_col})), 16, 15)").alias("tail"),
    )
    n = h.select(
        "reg",
        "tail",
        F.expr(
            "CAST(conv(substring(concat(regexp_replace(tail, '^0+', ''), '1'), 1, 1), 16, 10) AS INT)"
        ).alias("nib"),
    )
    return n.select("reg", F.expr(_hll_rho_sql("tail")).alias("rho"))


@register("hll_distinct_audit", oracle=_HLL_ORACLE)
def hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-count sketch audited against
    the exact count. See module docstring; the sketch state is the
    64-row (register, max-rho) table — the canonical mergeable shape
    (same partial-fold model as the reference's aggregate state,
    Aggregations.java:100-129, re-expressed as a distributed max).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    # distinct() is a speed-only optimization: register max is
    # idempotent under duplicates (the property the streaming twin
    # relies on to skip dedup state entirely)
    u = ev.select(F.col("user_id").cast("string").alias("uid")).distinct()
    r = hll_reg_rho(u).groupBy("reg").agg(F.max("rho").alias("rho"))
    s = r.agg(
        F.count("*").alias("n_present"),
        F.expr(
            "CAST(sum(CAST(power(2.0, -rho) AS DECIMAL(38,25))) AS DOUBLE)"
        ).alias("pow_present"),
    )
    e = s.select(
        F.lit(HLL_M).cast("long").alias("m"),
        F.col("n_present").cast("long").alias("nonzero_registers"),
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("empty_registers"),
        F.round(
            F.lit(HLL_ALPHA)
            * F.lit(HLL_M * HLL_M)
            / (F.col("pow_present") + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1.0)),
            4,
        ).alias("raw_est"),
    )
    x = ev.agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    est = F.when(
        (F.col("raw_est") <= 2.5 * HLL_M) & (F.col("empty_registers") > 0),
        F.round(
            F.lit(HLL_M)
            * F.log(F.lit(float(HLL_M)) / F.col("empty_registers")),
            4,
        ),
    ).otherwise(F.col("raw_est"))
    return (
        e.crossJoin(F.broadcast(x))  # both sides are 1 row
        .select(
            "m",
            "nonzero_registers",
            "empty_registers",
            "raw_est",
            est.alias("est"),
            "exact_distinct",
            F.round(
                F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 4
            ).alias("rel_err"),
        )
    )


# ---------------------------------------------------------- exact AUC

_AUC_ORACLE = """
WITH g AS (
    SELECT value AS score, count(*) AS n,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
    FROM events GROUP BY value
), w AS (
    SELECT score, n, pos,
           sum(n) OVER (ORDER BY score
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
    FROM g
), s AS (
    SELECT CAST(sum(pos) AS BIGINT) AS npos,
           CAST(sum(n) - sum(pos) AS BIGINT) AS nneg,
           sum(CAST(pos AS DECIMAL(28,1)) * CAST(cum_n - n AS DECIMAL(28,1))
               + CAST(pos AS DECIMAL(28,1)) * CAST(n + 1 AS DECIMAL(28,1)) / 2)
               AS pos_rank_sum
    FROM w
)
SELECT npos, nneg, auc, round(2 * auc - 1, 6) AS gini
FROM (
    SELECT npos, nneg,
           round(CAST(pos_rank_sum - CAST(npos AS DECIMAL(28,1)) * CAST(npos + 1 AS DECIMAL(28,1)) / 2
                      AS DOUBLE)
                 / (CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE)), 6) AS auc
    FROM s
) t
"""


@register(
    "roc_auc_value_purchase",
    oracle=_AUC_ORACLE,
    bounded_window="distinct 2-dp score cents",
)
def roc_auc_value_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of `value` as a ranking score for purchase
    events, via the Mann-Whitney rank-sum identity with midrank tie
    handling: group rows by score first so the ranking window runs
    over DISTINCT scores (bounded 2-dp domain), then
    AUC = (sum of positive midranks - npos(npos+1)/2) / (npos*nneg).
    Rank sums accumulate in DECIMAL(28,1) (midranks have .5
    granularity), so partial-agg order cannot fork engines.

    Scale: one keyed aggregate (map-side combined) + one window over
    the distinct-score table + a scalar fold. For genuinely
    continuous scores the same plan runs over round(score, k) —
    which only merges ties, and the midrank formula already handles
    ties exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(F.col("value").alias("score")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("pos"),
    )
    w = g.withColumn(
        "cum_n",
        F.sum("n").over(
            Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    s = w.agg(
        F.sum("pos").cast("long").alias("npos"),
        (F.sum("n") - F.sum("pos")).cast("long").alias("nneg"),
        F.sum(
            F.col("pos").cast("decimal(28,1)") * (F.col("cum_n") - F.col("n")).cast("decimal(28,1)")
            + F.col("pos").cast("decimal(28,1)") * (F.col("n") + 1).cast("decimal(28,1)") / 2
        ).alias("pos_rank_sum"),
    )
    auc = F.round(
        (
            F.col("pos_rank_sum")
            - F.col("npos").cast("decimal(28,1)") * (F.col("npos") + 1).cast("decimal(28,1)") / 2
        ).cast("double")
        / (F.col("npos").cast("double") * F.col("nneg").cast("double")),
        6,
    )
    return s.select("npos", "nneg", auc.alias("auc"), F.round(2 * auc - 1, 6).alias("gini"))


# -------------------------------------------------- calibration table

_CAL_ORACLE = """
WITH b AS (
    SELECT min(value) AS minv, max(value) AS maxv FROM events
), p AS (
    SELECT least(CAST(floor((value - minv) / (maxv - minv) * 10) AS INT), 9) AS bin,
           round((value - minv) / (maxv - minv), 9) AS prob,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
    FROM events, b
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(label) AS BIGINT) AS pos,
       round(CAST(sum(CAST(prob AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS mean_pred,
       round(CAST(sum(label) AS DOUBLE) / count(*), 6) AS pos_rate,
       round(abs(round(CAST(sum(CAST(prob AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6)
                 - round(CAST(sum(label) AS DOUBLE) / count(*), 6)), 6) AS gap
FROM p GROUP BY bin
"""


@register("calibration_bins", oracle=_CAL_ORACLE)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability (calibration) table: min-max-normalize `value`
    into a [0,1] pseudo-probability, bin into deciles, and compare
    mean predicted probability vs empirical purchase rate per bin —
    the table behind an ECE number / reliability diagram. Per-bin
    probability means are decimal sums of round(prob, 9) so
    accumulation order cannot fork engines.

    Scale: the min/max bounds row broadcasts (1 row); binning is a
    narrow projection; one 10-group aggregate. No shuffle beyond the
    10-key agg.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("minv"), F.max("value").alias("maxv"))
    prob = (F.col("value") - F.col("minv")) / (F.col("maxv") - F.col("minv"))
    p = ev.crossJoin(F.broadcast(b)).select(
        F.least(F.floor(prob * 10).cast("int"), F.lit(9)).alias("bin"),
        F.round(prob, 9).alias("prob"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    mean_pred = F.round(
        F.sum(F.col("prob").cast("decimal(18,9)")).cast("double") / F.count("*"), 6
    )
    pos_rate = F.round(F.sum("label").cast("double") / F.count("*"), 6)
    return p.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("label").cast("long").alias("pos"),
        mean_pred.alias("mean_pred"),
        pos_rate.alias("pos_rate"),
        F.round(F.abs(mean_pred - pos_rate), 6).alias("gap"),
    )


# ------------------------------------------- change-point (CUSUM scan)

_CHANGEPOINT_ORACLE = """
WITH d AS (
    SELECT o_orderdate AS day,
           sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
    FROM orders GROUP BY o_orderdate
), m AS (
    SELECT sum(cents) // count(*) AS mean_cents FROM d
), c AS (
    SELECT day, cents,
           sum(cents - mean_cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dev
    FROM d, m
)
SELECT day, cents, cum_dev,
       CAST(abs(cum_dev) = max(abs(cum_dev)) OVER () AS BOOLEAN) AS is_peak
FROM c
"""


@register(
    "changepoint_daily_revenue",
    oracle=_CHANGEPOINT_ORACLE,
    bounded_window="calendar days (fixed time span)",
)
def changepoint_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-deviation change-point scan over daily revenue: the
    day where |cumsum(daily - mean)| peaks is the classic CUSUM
    change-point estimate. The whole trajectory is integer cents
    (round-3 fixed-point recipe — no float op between days), so both
    engines compute identical integers by construction.

    Scale: raw orders collapse to O(days) rows in one partial-combined
    aggregate; every window after that runs over the daily series.
    """
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
    )
    m = d.agg(F.expr("sum(cents) DIV count(*)").alias("mean_cents"))
    c = d.crossJoin(F.broadcast(m)).withColumn(
        "cum_dev",
        F.sum(F.col("cents") - F.col("mean_cents")).over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return c.select(
        "day",
        "cents",
        "cum_dev",
        (
            F.abs(F.col("cum_dev"))
            == F.max(F.abs(F.col("cum_dev"))).over(
                Window.partitionBy()
            )
        ).alias("is_peak"),
    )


# ------------------------------------------------------- Benford audit

# round(log10(1 + 1/d), 6) for d in 1..9, precomputed once so both
# engines share the identical constants (no engine log10 in the path)
_BENFORD = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}
_BENFORD_CASE = "CAST(CASE digit " + " ".join(
    f"WHEN {d} THEN {v}" for d, v in _BENFORD.items()
) + " END AS DOUBLE)"

_BENFORD_ORACLE = f"""
WITH d AS (
    SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
               AS digit
    FROM orders WHERE o_totalprice >= 1
), g AS (
    SELECT digit, count(*) AS n, sum(count(*)) OVER () AS total FROM d GROUP BY digit
)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / total, 6) AS obs_share,
       {_BENFORD_CASE} AS exp_share,
       round(pow(CAST(n AS DOUBLE) - total * ({_BENFORD_CASE}), 2)
             / (total * ({_BENFORD_CASE})), 6) AS chi2_term
FROM g
"""


@register(
    "benford_first_digit",
    oracle=_BENFORD_ORACLE,
    bounded_window="9 leading digits",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs the
    Benford expectation — the classic synthetic-data / fraud smell
    test. Expected shares are literals precomputed once (no engine
    log10 in the path); per-digit chi-square terms let the reader
    form the test statistic at any digit subset.

    Scale: one 9-group aggregate over a narrow projection; the
    window total runs over 9 rows.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.expr(
            "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS INT)"
        ).alias("digit")
    )
    g = (
        d.groupBy("digit")
        .agg(F.count("*").alias("n"))
        .withColumn("total", F.sum("n").over(Window.partitionBy()))
    )
    exp_share = F.expr(_BENFORD_CASE)
    return g.select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("obs_share"),
        exp_share.alias("exp_share"),
        F.round(
            F.pow(F.col("n").cast("double") - F.col("total") * exp_share, 2)
            / (F.col("total") * exp_share),
            6,
        ).alias("chi2_term"),
    )


# -------------------------------------------- equi-depth histogram

_EQUIDEPTH_ORACLE = """
WITH g AS (
    SELECT l_extendedprice AS price, count(*) AS cnt FROM lineitem GROUP BY l_extendedprice
), w AS (
    SELECT price, cnt,
           sum(cnt) OVER (ORDER BY price
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(cnt) OVER () AS total
    FROM g
)
SELECT CAST((cum - cnt) * 10 // total AS INT) AS bin,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_values,
       min(price) AS lo, max(price) AS hi,
       round(CAST(sum(cnt) AS DOUBLE) / max(total), 6) AS share
FROM w GROUP BY bin
"""


@register(
    "equidepth_value_histogram",
    oracle=_EQUIDEPTH_ORACLE,
    bounded_window="distinct 2-dp value cents",
)
def equidepth_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth decile histogram of l_extendedprice, assigned
    BY VALUE: each distinct price belongs wholly to the bin its first
    row falls in ((cum-cnt)*10 div total), so ties never straddle
    bins and the ranking window runs over the DISTINCT-value table,
    not the raw rows — the shape that survives 100x (2-dp money has a
    bounded distinct domain; truly unbounded domains swap these exact
    boundaries for the approx_percentiles sketch, already registered).
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_extendedprice").alias("price")).agg(
        F.count("*").alias("cnt")
    )
    # r12 (guide §2.4, the operators/ranks two-level idiom, gated by
    # corpus size): at sf100-scale the 2-dp money domain has millions
    # of distinct values and the global ordered window (Exchange
    # SinglePartition) serializes the cumulative pass on one task —
    # switch to the two-level bucket prefix there ($100-bucket
    # subtotals cumulate on the O(buckets) table, interiors under
    # PARTITION BY bucket; `total` as a broadcast scalar). Below
    # ranks.TWO_LEVEL_MIN_ROWS the single-window shape stays: measured
    # at sf0.1 (583k distinct prices) the two-level extra stages cost
    # more than the ~0.4 s single task they replace (1.37 -> 1.86 s).
    # Integer sums — cum/total identical either way (oracle-verified on
    # both paths).
    from streams_prototyping_spark.data import table_n
    from streams_prototyping_spark.operators.ranks import TWO_LEVEL_MIN_ROWS

    if table_n(spark, sf_dir, "lineitem") >= TWO_LEVEL_MIN_ROWS:
        b = g.withColumn("_bkt", (F.col("price") / 100).cast("long"))
        bkt = b.groupBy("_bkt").agg(F.sum("cnt").alias("bcnt"))
        wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, 0)
        boff = bkt.select(
            "_bkt", (F.sum("bcnt").over(wb) - F.col("bcnt")).alias("_boff")
        )
        wv = Window.partitionBy("_bkt").orderBy("price").rowsBetween(
            Window.unboundedPreceding, 0
        )
        total = g.agg(F.sum("cnt").alias("total"))
        w = (
            b.join(F.broadcast(boff), "_bkt")
            .select(
                "price",
                "cnt",
                (F.col("_boff") + F.sum("cnt").over(wv)).alias("cum"),
            )
            .crossJoin(F.broadcast(total))
        )
    else:
        w = g.select(
            "price",
            "cnt",
            F.sum("cnt")
            .over(
                Window.orderBy("price").rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("cum"),
            F.sum("cnt").over(Window.partitionBy()).alias("total"),
        )
    return (
        w.groupBy(
            F.expr("CAST((cum - cnt) * 10 DIV total AS INT)").alias("bin")
        )
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_values"),
            F.min("price").alias("lo"),
            F.max("price").alias("hi"),
            F.round(F.sum("cnt").cast("double") / F.max("total"), 6).alias("share"),
        )
    )


# ---------------------------------------------------- A/A split audit

_AA_ORACLE = """
WITH u AS (
    SELECT CAST('0x' || substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
               AS arm,
           max(CASE WHEN event_type = 'purchase' AND value >= 150 THEN 1 ELSE 0 END)
               AS converted
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
), s AS (
    SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
           sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS c0,
           sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS c1
    FROM u
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       CAST(c0 AS BIGINT) AS c0, CAST(c1 AS BIGINT) AS c1,
       round(CAST(c0 AS DOUBLE) / n0, 6) AS rate0,
       round(CAST(c1 AS DOUBLE) / n1, 6) AS rate1,
       CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN 0.0
            ELSE round((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
                       / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                              * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                              * (1.0 / n0 + 1.0 / n1)), 4) END AS z_stat,
       CAST(abs(n0 - n1) * 10 <= (n0 + n1) AS BOOLEAN) AS balance_ok
FROM s
"""


@register("aa_split_audit", oracle=_AA_ORACLE)
def aa_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A experiment audit: hash users into two arms with the
    portable hash (the same deterministic splitter dataset_split
    uses), attribute a conversion flag per user, and compare arm
    conversion rates with the pooled two-proportion z statistic. On a
    healthy splitter |z| is small and arm sizes are balanced — this
    is the query that validates the experiment infrastructure before
    any real A/B test is trusted.

    Scale: one user-keyed aggregate (the attribution shuffle) then a
    scalar fold; sqrt/division run on identical doubles in both
    engines and the z statistic is rounded at output.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.expr(
            "CAST(conv(substring(md5(concat('arm:', CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2"
        ).alias("arm"),
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") >= 150), 1)
            .otherwise(0)
        ).alias("converted"),
    )
    s = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    rate0 = F.col("c0").cast("double") / F.col("n0")
    rate1 = F.col("c1").cast("double") / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = F.when(
        (F.col("c0") + F.col("c1") == 0)
        | (F.col("c0") + F.col("c1") == F.col("n0") + F.col("n1")),
        F.lit(0.0),
    ).otherwise(
        F.round(
            (rate0 - rate1)
            / F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))),
            4,
        )
    )
    return s.select(
        "n0",
        "n1",
        "c0",
        "c1",
        F.round(rate0, 6).alias("rate0"),
        F.round(rate1, 6).alias("rate1"),
        z.alias("z_stat"),
        (F.abs(F.col("n0") - F.col("n1")) * 10 <= (F.col("n0") + F.col("n1"))).alias(
            "balance_ok"
        ),
    )


# ------------------------------------- mergeable histogram quantile audit

HQ_BIN_CENTS = 5000  # $50 equi-width bins — the mergeable sketch state
HQ_QUANTILES = (0.5, 0.9, 0.99)

_HQ_QLIST = ", ".join(repr(q) for q in HQ_QUANTILES)

_HQ_ORACLE = f"""
WITH c AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
    FROM orders
), bins AS (
    SELECT cents // {HQ_BIN_CENTS} AS bin, count(*) AS cnt
    FROM c GROUP BY 1
), cum AS (
    SELECT bin, cnt,
           sum(cnt) OVER (ORDER BY bin) AS cum
    FROM bins
), nn AS (SELECT count(*) AS n FROM c),
qs AS (
    SELECT q, CAST(ceil(q * nn.n) AS BIGINT) AS target
    FROM (SELECT unnest([{_HQ_QLIST}]) AS q) CROSS JOIN nn
), est AS (
    SELECT q.q, q.target,
           round((b.bin * {HQ_BIN_CENTS}
                  + {HQ_BIN_CENTS} * CAST(q.target - (b.cum - b.cnt) AS DOUBLE)
                    / b.cnt) / 100.0, 4) AS est_value
    FROM qs q JOIN cum b
      ON b.cum >= q.target AND b.cum - b.cnt < q.target
), ranked AS (
    SELECT cents, row_number() OVER (ORDER BY cents, o_orderkey) AS rn FROM c
)
SELECT CAST(e.q AS DOUBLE) AS q, e.est_value,
       round(r.cents / 100.0, 4) AS exact_value,
       round(abs(e.est_value - round(r.cents / 100.0, 4)), 4) AS abs_err
FROM est e JOIN ranked r ON r.rn = e.target
"""


@register(
    "histogram_quantile_audit",
    oracle=_HQ_ORACLE,
    bounded_window="histogram bins + 500-cent price buckets",
)
def histogram_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a MERGEABLE equi-width histogram sketch (bin ->
    count, ${HQ_BIN_CENTS}-cent bins over order value), linearly
    interpolated within the containing bin, audited against the exact
    type-1 quantiles — the trade a pipeline actually makes when
    per-group exact sorts stop fitting (histogram state merges
    associatively across partitions/days; exact ranks don't).

    Scale note: the sketch is one partial-combined groupBy over
    O(bins) state; the exact audit side locates each target rank via
    two-level distinct-cents cumulative counts
    (operators/ranks.bucketed_cum_counts, bucketed on the SAME
    {HQ_BIN_CENTS}-cent grid) — bucket offsets cumulate on the O(bins)
    table, interiors under PARTITION BY bucket; no row-level global
    sort anywhere (round-5 verdict item 1). Integer bin arithmetic
    end-to-end: the estimate is deterministic cross-engine.
    """
    o = load_table(spark, sf_dir, "orders")
    c = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    bins = c.groupBy((F.col("cents") / HQ_BIN_CENTS).cast("long").alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = bins.select(
        "bin",
        "cnt",
        F.sum("cnt").over(Window.orderBy("bin")).alias("cum"),
    )
    # r12 (guide §2.3): n = Σ bin counts — a 30-row fold over the bins
    # aggregate's own exchange (ReuseExchange dedups it) instead of a
    # second full orders scan+count.
    n = bins.agg(F.sum("cnt").alias("n"))
    qs = (
        spark.createDataFrame([(q,) for q in HQ_QUANTILES], "q double")
        .crossJoin(F.broadcast(n))
        .select("q", F.ceil(F.col("q") * F.col("n")).cast("long").alias("target"))
    )
    est = qs.join(
        cum,
        (F.col("cum") >= F.col("target")) & (F.col("cum") - F.col("cnt") < F.col("target")),
    ).select(
        "q",
        "target",
        F.round(
            (
                F.col("bin") * HQ_BIN_CENTS
                + HQ_BIN_CENTS
                * (F.col("target") - (F.col("cum") - F.col("cnt"))).cast("double")
                / F.col("cnt")
            )
            / 100.0,
            4,
        ).alias("est_value"),
    )
    from streams_prototyping_spark.operators.ranks import bucketed_cum_counts

    # exact rank-target values via the two-level distinct-cents prefix
    # sum (the old row_number tiebreak on o_orderkey only ordered rows
    # of equal cents — the selected VALUE is identical)
    cumc = bucketed_cum_counts(
        c, "cents", lambda v: (v / HQ_BIN_CENTS).cast("long")
    )
    exact = F.round(F.col("cents") / 100.0, 4)
    return est.join(
        cumc,
        (F.col("cum") >= F.col("target")) & (F.col("cum_before") < F.col("target")),
    ).select(
        "q",
        "est_value",
        exact.alias("exact_value"),
        F.round(F.abs(F.col("est_value") - exact), 4).alias("abs_err"),
    )


# ------------------------------------------------------- CUPED audit

CUPED_CUTOFF = "2024-01-16 00:00:00"  # pre-period | experiment period


_CUPED_ORACLE = f"""
WITH per_user AS (
    SELECT user_id,
           CAST({portable_hash64_sql("'aa:' || CAST(user_id AS VARCHAR)")} % 2
                AS BIGINT) AS arm,
           CAST(sum(CASE WHEN ts <  TIMESTAMP '{CUPED_CUTOFF}'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS x,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_CUTOFF}'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS y
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
), g AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(x * x) AS DOUBLE) AS sxx,
           CAST(sum(x * y) AS DOUBLE) AS sxy
    FROM per_user
), theta AS (
    SELECT round((sxy / n - sx / n * (sy / n))
                 / (sxx / n - sx / n * (sx / n)), 8) AS th
    FROM g
), arm_m AS (
    SELECT arm,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(x * x) AS DOUBLE) AS sxx,
           CAST(sum(y * y) AS DOUBLE) AS syy,
           CAST(sum(x * y) AS DOUBLE) AS sxy
    FROM per_user GROUP BY arm
)
SELECT a.arm,
       CAST(a.n AS BIGINT) AS n_users,
       round(a.sy / a.n / 100.0, 6) AS mean_post,
       round((a.syy / a.n - (a.sy / a.n) * (a.sy / a.n)) / 10000.0, 6)
           AS var_post,
       round(((a.syy / a.n - (a.sy / a.n) * (a.sy / a.n))
              - 2 * t.th * (a.sxy / a.n - (a.sx / a.n) * (a.sy / a.n))
              + t.th * t.th * (a.sxx / a.n - (a.sx / a.n) * (a.sx / a.n)))
             / 10000.0, 6) AS var_adjusted,
       t.th AS theta
FROM arm_m a CROSS JOIN theta t
"""


@register("cuped_variance_reduction", oracle=_CUPED_ORACLE)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al. 2013): reduce experiment-metric variance with
    the pre-period covariate — adjusted metric y' = y - theta (x - E x),
    theta = cov(x,y)/var(x) POOLED across arms (per-arm theta would
    bias the estimator). Reports per arm: users, post-period mean,
    raw and adjusted variance, and the pooled theta — the dashboard
    that tells an experimenter how much sensitivity the covariate buys
    before they size the next test.

    Determinism: per-user pre/post sums are exact integer cents; all
    (co)variances derive from six exact moments per arm; the one
    division chain runs in IEEE double over the same expression shape
    in both engines, rounded at the output.

    Scale note: one scan -> per-user fold (map-side combinable) ->
    six-moment per-arm fold; O(arms) rows after two partial-combined
    aggregations, nothing user-level survives. The split is the same
    portable-hash splitter aa_split_audit validates.
    """
    from streams_prototyping_spark.functions.portable_hash import portable_hash64

    cutoff = F.lit(CUPED_CUTOFF).cast("timestamp_ntz")
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = ev.groupBy("user_id").agg(
        (
            portable_hash64(F.concat(F.lit("aa:"), F.col("user_id").cast("string")))
            % 2
        )
        .cast("long")
        .alias("arm"),
        F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    g = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    theta = g.select(
        F.round(
            (F.col("sxy") / F.col("n") - F.col("sx") / F.col("n") * (F.col("sy") / F.col("n")))
            / (F.col("sxx") / F.col("n") - F.col("sx") / F.col("n") * (F.col("sx") / F.col("n"))),
            8,
        ).alias("th")
    )
    arm_m = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    mean = lambda s: F.col(s) / F.col("n")  # noqa: E731
    var_y = mean("syy") - mean("sy") * mean("sy")
    cov_xy = mean("sxy") - mean("sx") * mean("sy")
    var_x = mean("sxx") - mean("sx") * mean("sx")
    return arm_m.crossJoin(F.broadcast(theta)).select(
        F.col("arm").cast("long").alias("arm"),
        F.col("n").cast("long").alias("n_users"),
        F.round(mean("sy") / 100.0, 6).alias("mean_post"),
        F.round(var_y / 10000.0, 6).alias("var_post"),
        F.round(
            (var_y - 2 * F.col("th") * cov_xy + F.col("th") * F.col("th") * var_x)
            / 10000.0,
            6,
        ).alias("var_adjusted"),
        F.col("th").alias("theta"),
    )


# ------------------------------------------- CUPED-adjusted experiment readout

_READOUT_ORACLE = f"""
WITH per_user AS (
    SELECT user_id,
           CAST({portable_hash64_sql("'aa:' || CAST(user_id AS VARCHAR)")} % 2
                AS BIGINT) AS arm,
           CAST(sum(CASE WHEN ts <  TIMESTAMP '{CUPED_CUTOFF}'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS x,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_CUTOFF}'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS y
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
), g AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(x * x) AS DOUBLE) AS sxx,
           CAST(sum(x * y) AS DOUBLE) AS sxy
    FROM per_user
), theta AS (
    SELECT round((sxy / n - sx / n * (sy / n))
                 / (sxx / n - sx / n * (sx / n)), 8) AS th
    FROM g
), adj AS (
    -- theta has exactly 8 dp, x is integer: theta*x is an EXACT
    -- decimal, so the adjusted sums are order-independent
    SELECT arm, y,
           CAST(y AS DECIMAL(28,8))
             - CAST(t.th AS DECIMAL(12,8)) * x AS a
    FROM per_user CROSS JOIN theta t
), am AS (
    SELECT arm,
           count(*) AS n,
           CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
           CAST(sum(a) AS DOUBLE) AS sa,
           -- DECIMAL(19,8) squares to the hugeint-backed DECIMAL(38,16)
           -- in DuckDB (18,8 would try the int64 kernel and overflow);
           -- Spark uses 18,8 -> (37,16) under its cap. Both are EXACT,
           -- so the sums still agree bit-for-bit.
           CAST(sum(CAST(CAST(a AS DECIMAL(19,8)) * CAST(a AS DECIMAL(19,8))
                         AS DECIMAL(38,16))) AS DOUBLE) AS saa
    FROM adj GROUP BY arm
), w AS (
    SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
           max(CASE WHEN arm = 1 THEN n END) AS n1,
           max(CASE WHEN arm = 0 THEN sy END) AS sy0,
           max(CASE WHEN arm = 1 THEN sy END) AS sy1,
           max(CASE WHEN arm = 0 THEN syy END) AS syy0,
           max(CASE WHEN arm = 1 THEN syy END) AS syy1,
           max(CASE WHEN arm = 0 THEN sa END) AS sa0,
           max(CASE WHEN arm = 1 THEN sa END) AS sa1,
           max(CASE WHEN arm = 0 THEN saa END) AS saa0,
           max(CASE WHEN arm = 1 THEN saa END) AS saa1
    FROM am
), m AS (
    SELECT n0, n1,
           round((sy1 / n1 - sy0 / n0) / 100.0, 6) AS diff_raw,
           (syy0 - sy0 * sy0 / n0) / (n0 - 1) AS vy0,
           (syy1 - sy1 * sy1 / n1) / (n1 - 1) AS vy1,
           round((sa1 / n1 - sa0 / n0) / 100.0, 6) AS diff_adj,
           (saa0 - sa0 * sa0 / n0) / (n0 - 1) AS va0,
           (saa1 - sa1 * sa1 / n1) / (n1 - 1) AS va1
    FROM w
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       diff_raw,
       round((diff_raw * 100.0) / sqrt(vy1 / n1 + vy0 / n0), 6) AS t_raw,
       diff_adj,
       round((diff_adj * 100.0) / sqrt(va1 / n1 + va0 / n0), 6) AS t_adj,
       (SELECT th FROM theta) AS theta
FROM m
"""


@register("experiment_readout_cuped", oracle=_READOUT_ORACLE)
def experiment_readout_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full experiment readout: raw AND CUPED-adjusted treatment
    effect with Welch t statistics, in one pass. The adjusted metric
    y' = y - theta x uses the pooled theta (cuped_variance_reduction's
    estimator); because theta carries exactly 8 dp and x is integer
    cents, y' is an EXACT decimal per user — the adjusted moment sums
    stay order-independent, so even the variance-reduced t statistic
    is bit-identical cross-engine. Decimal types are chosen so no
    intermediate hits Spark's precision cap: theta is decimal(12,8)
    (|theta| < 1e4 by construction of a regression slope on
    same-unit cents), so th*x is decimal(33,8) — full 8-dp scale, no
    rounding — and a is squared through a decimal(18,8) down-cast
    (exact while |y'| < 1e10 cents per user) so a*a is decimal(37,16),
    under the 38 cap. The previous decimal(20,8) theta cast pushed
    th*x to decimal(38,6), silently rounding each user's adjusted
    metric to 6 dp and diverging from the DuckDB oracle's full-scale
    arithmetic.

    Scale note: two partial-combined per-user folds (moments for
    theta; adjusted moments per arm), O(1) output — the query an
    experimentation platform runs per metric per day at any user
    count.
    """
    from streams_prototyping_spark.functions.portable_hash import portable_hash64

    cutoff = F.lit(CUPED_CUTOFF).cast("timestamp_ntz")
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = ev.groupBy("user_id").agg(
        (
            portable_hash64(F.concat(F.lit("aa:"), F.col("user_id").cast("string")))
            % 2
        )
        .cast("long")
        .alias("arm"),
        F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    g = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    theta = g.select(
        F.round(
            (F.col("sxy") / F.col("n") - F.col("sx") / F.col("n") * (F.col("sy") / F.col("n")))
            / (F.col("sxx") / F.col("n") - F.col("sx") / F.col("n") * (F.col("sx") / F.col("n"))),
            8,
        ).alias("th")
    )
    adj = per_user.crossJoin(F.broadcast(theta)).select(
        "arm",
        "y",
        (
            F.col("y").cast("decimal(28,8)")
            - F.col("th").cast("decimal(12,8)") * F.col("x")
        ).alias("a"),
    )
    am = adj.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).cast("double").alias("syy"),
        F.sum("a").cast("double").alias("sa"),
        F.sum(
            (F.col("a").cast("decimal(18,8)") * F.col("a").cast("decimal(18,8)"))
            .cast("decimal(38,16)")
        ).cast("double").alias("saa"),
    )
    pick = lambda arm, c: F.max(F.when(F.col("arm") == arm, F.col(c)))  # noqa: E731
    w = am.agg(
        pick(0, "n").alias("n0"), pick(1, "n").alias("n1"),
        pick(0, "sy").alias("sy0"), pick(1, "sy").alias("sy1"),
        pick(0, "syy").alias("syy0"), pick(1, "syy").alias("syy1"),
        pick(0, "sa").alias("sa0"), pick(1, "sa").alias("sa1"),
        pick(0, "saa").alias("saa0"), pick(1, "saa").alias("saa1"),
    )
    vy0 = (F.col("syy0") - F.col("sy0") * F.col("sy0") / F.col("n0")) / (F.col("n0") - 1)
    vy1 = (F.col("syy1") - F.col("sy1") * F.col("sy1") / F.col("n1")) / (F.col("n1") - 1)
    va0 = (F.col("saa0") - F.col("sa0") * F.col("sa0") / F.col("n0")) / (F.col("n0") - 1)
    va1 = (F.col("saa1") - F.col("sa1") * F.col("sa1") / F.col("n1")) / (F.col("n1") - 1)
    diff_raw = F.round((F.col("sy1") / F.col("n1") - F.col("sy0") / F.col("n0")) / 100.0, 6)
    diff_adj = F.round((F.col("sa1") / F.col("n1") - F.col("sa0") / F.col("n0")) / 100.0, 6)
    return w.crossJoin(F.broadcast(theta)).select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        diff_raw.alias("diff_raw"),
        F.round(diff_raw * 100.0 / F.sqrt(vy1 / F.col("n1") + vy0 / F.col("n0")), 6).alias("t_raw"),
        diff_adj.alias("diff_adj"),
        F.round(diff_adj * 100.0 / F.sqrt(va1 / F.col("n1") + va0 / F.col("n0")), 6).alias("t_adj"),
        F.col("th").alias("theta"),
    )


# ---------------------------------------- isotonic calibration (PAV)

_ISO_BINS_CTE = """
b AS (
    SELECT min(value) AS minv, max(value) AS maxv FROM events
), p AS (
    SELECT least(CAST(floor((value - minv) / (maxv - minv) * 10) AS INT), 9)
               AS bin,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
    FROM events, b
), bins AS (
    SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(label) AS BIGINT) AS pos
    FROM p GROUP BY bin
)"""

_ISO_ORACLE = f"""
WITH {_ISO_BINS_CTE},
r AS (
    SELECT j.bin AS jb, k.bin AS kb,
           CAST(sum(m.pos) AS DOUBLE) / sum(m.n) AS avg_rate
    FROM bins j JOIN bins k ON k.bin >= j.bin
    JOIN bins m ON m.bin BETWEEN j.bin AND k.bin
    GROUP BY j.bin, k.bin
), innermin AS (
    SELECT i.bin, r.jb, min(r.avg_rate) AS mn
    FROM bins i JOIN r ON r.jb <= i.bin AND r.kb >= i.bin
    GROUP BY i.bin, r.jb
), iso AS (
    SELECT bin, round(max(mn), 6) AS iso_rate FROM innermin GROUP BY bin
)
SELECT bins.bin, bins.n, bins.pos,
       round(CAST(bins.pos AS DOUBLE) / bins.n, 6) AS raw_rate,
       iso.iso_rate
FROM bins JOIN iso ON iso.bin = bins.bin
"""


@register("isotonic_calibration", oracle=_ISO_ORACLE)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the score-decile reliability
    table: the weighted monotone fit of per-bin purchase rate, via the
    exact minimax closed form iso_i = max_(j<=i) min_(k>=i)
    mean(rate over bins j..k) — algebraically identical to
    pool-adjacent-violators but expressible as three joins over the
    10-row bin table in BOTH engines, with every range mean an exact
    int/int ratio (no sequential pooling state to replicate).
    This is the standard way to turn a quality-classifier's raw score
    into a usable probability when the reliability diagram sags.

    Determinism: range means are single IEEE divisions of exact int64
    sums; min/max over identical doubles cannot fork; one 6-dp round
    at the end.

    Scale design: the corpus-sized work is the SAME one-pass 10-group
    aggregate calibration_bins runs; the minimax runs on the 10-row
    result (bins^3 = 1000 combinations — constants, broadcast joins).
    At 100 TB nothing changes: PAV input is always bins, not rows.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("minv"), F.max("value").alias("maxv"))
    prob = (F.col("value") - F.col("minv")) / (F.col("maxv") - F.col("minv"))
    bins = (
        ev.crossJoin(F.broadcast(b))
        .select(
            F.least(F.floor(prob * 10).cast("int"), F.lit(9)).alias("bin"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
                "label"
            ),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("label").cast("long").alias("pos"),
        )
        .persist()
    )
    j = bins.select(F.col("bin").alias("jb"))
    k = bins.select(F.col("bin").alias("kb"))
    m = bins.select(F.col("bin").alias("mb"), "n", "pos")
    r = (
        j.join(F.broadcast(k), F.col("kb") >= F.col("jb"))
        .join(
            F.broadcast(m),
            (F.col("mb") >= F.col("jb")) & (F.col("mb") <= F.col("kb")),
        )
        .groupBy("jb", "kb")
        .agg(
            (F.sum("pos").cast("double") / F.sum("n")).alias("avg_rate")
        )
    )
    i = bins.select(F.col("bin").alias("ib"))
    innermin = (
        i.join(
            F.broadcast(r),
            (F.col("jb") <= F.col("ib")) & (F.col("kb") >= F.col("ib")),
        )
        .groupBy("ib", "jb")
        .agg(F.min("avg_rate").alias("mn"))
    )
    iso = innermin.groupBy("ib").agg(F.round(F.max("mn"), 6).alias("iso_rate"))
    return (
        bins.join(iso, bins["bin"] == iso["ib"])
        .select(
            "bin",
            "n",
            "pos",
            F.round(F.col("pos").cast("double") / F.col("n"), 6).alias(
                "raw_rate"
            ),
            "iso_rate",
        )
    )
