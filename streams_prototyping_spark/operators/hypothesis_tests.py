"""Hypothesis-test and set-sketch operators: the inferential-statistics
layer a data-pipeline owner runs to compare segments, detect drift and
audit sampling — each one fully oracle-checked (no rows-only checks).

Determinism recipe (round-2/3 house style): every sum that feeds a
statistic is an exact integer/decimal fold (order-independent), float
appears only in a FIXED dag of IEEE ops over rounded inputs, and both
engines evaluate the textually identical expression tree, so results
are bit-identical by construction.

- welch_ttest_value: Welch's unequal-variance t-test of ``value``
  between purchase and view events (t statistic + Welch-Satterthwaite
  degrees of freedom), moments from exact integer-cent folds.
- ks_test_two_sample: EXACT two-sample Kolmogorov-Smirnov D between
  the purchase and view value distributions. The ECDF difference is
  kept as the integer cross-product |c1*n2 - c2*n1| (no fraction until
  the final projection), so the argmax is exact and tie-broken by
  value.
- spearman_corr_value_hour: exact Spearman rank correlation (midrank
  tie handling) between event value and hour-of-day. Doubled midranks
  (2*midrank is always an integer) keep the entire moment computation
  in integers; rho is scale-invariant so the doubling cancels.
- chi_square_event_dow: chi-squared independence table of event_type
  x day-of-week with per-cell expected counts and chi2 terms, plus the
  decimal-summed global statistic on every row.
- kmv_set_cardinality: K-Minimum-Values (bottom-k / theta) sketch over
  part-key sets (returned vs kept lineitems): union AND intersection
  estimates from the k smallest portable hashes, audited against the
  exact counts. The sketch is exact below k by construction.
- poisson_bootstrap_ci: the Poisson(1) bootstrap (the resampling
  scheme that works on unbounded streams: per-row replicate weights
  drawn from a hash, never a global resample) over mean order value —
  B=32 deterministic replicates, spread + SE as the CI audit.

Reference parity: the reference (apurvam/streams-prototyping, 408 Java
LoC) has no statistics surface; these extend SURVEY.md Part C. The
sketch states (KMV bottom-k set, per-replicate weighted sums) are
mergeable partial folds — the reference's aggregate-state model
(Aggregations.java:100-129) taken to sketch space.

Scale design (100 TB):
- welch/chi2: one small-key aggregate each (2 and 35 groups) — pure
  map-side partial folds, scan-bound.
- ks/spearman: all windows run over DISTINCT 2-dp values (bounded
  domain ~50k cents) or 24 hours, never raw rows; the raw table is
  collapsed by one keyed aggregate first. Unbounded domains would
  first quantize (the calibration/equidepth pattern).
- kmv: bottom-k via orderBy(hash).limit(k) = TakeOrdered — O(k) state
  per partition, one O(k * partitions) driver merge, no full sort. The
  sketch replaces count-distinct shuffles at any cardinality.
- poisson_bootstrap: the B-fold explode is map-side (no shuffle before
  the 32-group fold); B is a constant multiplier on the scan, and the
  per-replicate state is one (sum, count) pair — the only bootstrap
  formulation that works distributed without materializing resamples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.functions.portable_hash import (
    portable_hash64,
    portable_hash64_sql,
)
from streams_prototyping_spark.registry import register

_CENTS = "CAST(round(value * 100) AS BIGINT)"


def _cents(col: str = "value") -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


# ------------------------------------------------------ Welch's t-test

_WELCH_ORACLE = """
WITH g AS (
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS s,
           CAST(sum(CAST(round(value * 100) AS BIGINT)
                    * CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS ss
    FROM events
    WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
    GROUP BY event_type
), w AS (
    SELECT max(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
           max(CASE WHEN event_type = 'purchase' THEN s END) AS s1,
           max(CASE WHEN event_type = 'purchase' THEN ss END) AS ss1,
           max(CASE WHEN event_type = 'view' THEN n END) AS n2,
           max(CASE WHEN event_type = 'view' THEN s END) AS s2,
           max(CASE WHEN event_type = 'view' THEN ss END) AS ss2
    FROM g
), m AS (
    SELECT n1, n2,
           round(s1 / n1 / 100.0, 10) AS mean_purchase,
           round(s2 / n2 / 100.0, 10) AS mean_view,
           round((ss1 - s1 * s1 / n1) / (n1 - 1) / 10000.0, 10) AS var_purchase,
           round((ss2 - s2 * s2 / n2) / (n2 - 1) / 10000.0, 10) AS var_view
    FROM w
)
SELECT n1 AS n_purchase, n2 AS n_view,
       mean_purchase, mean_view, var_purchase, var_view,
       round((mean_purchase - mean_view)
             / sqrt(var_purchase / n1 + var_view / n2), 6) AS t_stat,
       round((var_purchase / n1 + var_view / n2)
             * (var_purchase / n1 + var_view / n2)
             / ((var_purchase / n1) * (var_purchase / n1) / (n1 - 1)
                + (var_view / n2) * (var_view / n2) / (n2 - 1)), 3) AS welch_df
FROM m
"""


@register("welch_ttest_value", oracle=_WELCH_ORACLE)
def welch_ttest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of event value, purchase vs view.

    Moments come from exact integer-cent folds (sum and sum-of-squares
    as DECIMAL(38,0), order-independent); mean/variance are rounded at
    10 dp BEFORE the t/df dag, so both engines run identical IEEE ops.

    Scale note: one 2-group partial-combined aggregate over a 2-column
    projection — scan-bound; the t/df projection is a 1-row epilogue.
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view") & F.col("value").isNotNull()
    )
    c = _cents()
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c.cast("decimal(38,0)")).cast("double").alias("s"),
        F.sum((c * c).cast("decimal(38,0)")).cast("double").alias("ss"),
    )

    def pick(t: str, col: str) -> F.Column:
        return F.max(F.when(F.col("event_type") == t, F.col(col)))

    w = g.agg(
        pick("purchase", "n").alias("n1"),
        pick("purchase", "s").alias("s1"),
        pick("purchase", "ss").alias("ss1"),
        pick("view", "n").alias("n2"),
        pick("view", "s").alias("s2"),
        pick("view", "ss").alias("ss2"),
    )
    m = w.select(
        "n1",
        "n2",
        F.round(F.col("s1") / F.col("n1") / 100.0, 10).alias("mean_purchase"),
        F.round(F.col("s2") / F.col("n2") / 100.0, 10).alias("mean_view"),
        F.round(
            (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1"))
            / (F.col("n1") - 1)
            / 10000.0,
            10,
        ).alias("var_purchase"),
        F.round(
            (F.col("ss2") - F.col("s2") * F.col("s2") / F.col("n2"))
            / (F.col("n2") - 1)
            / 10000.0,
            10,
        ).alias("var_view"),
    )
    se1 = F.col("var_purchase") / F.col("n1")
    se2 = F.col("var_view") / F.col("n2")
    return m.select(
        F.col("n1").alias("n_purchase"),
        F.col("n2").alias("n_view"),
        "mean_purchase",
        "mean_view",
        "var_purchase",
        "var_view",
        F.round(
            (F.col("mean_purchase") - F.col("mean_view")) / F.sqrt(se1 + se2), 6
        ).alias("t_stat"),
        F.round(
            (se1 + se2) * (se1 + se2)
            / (se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1)),
            3,
        ).alias("welch_df"),
    )


# ------------------------------------------- two-sample KS statistic

_KS_ORACLE = f"""
WITH per AS (
    SELECT {_CENTS} AS cents,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
           sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nv
    FROM events
    WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
    GROUP BY 1
), cum AS (
    SELECT cents,
           sum(np) OVER (ORDER BY cents) AS cp,
           sum(nv) OVER (ORDER BY cents) AS cv
    FROM per
), tot AS (
    SELECT sum(np) AS n_purchase, sum(nv) AS n_view FROM per
), d AS (
    SELECT cents, abs(cp * n_view - cv * n_purchase) AS d_num,
           n_purchase, n_view
    FROM cum CROSS JOIN tot
)
SELECT CAST(n_purchase AS BIGINT) AS n_purchase,
       CAST(n_view AS BIGINT) AS n_view,
       CAST(d_num AS BIGINT) AS d_num,
       round(CAST(d_num AS DOUBLE) / (n_purchase * n_view), 12) AS ks_d,
       round(CAST(cents AS DOUBLE) / 100.0, 2) AS at_value
FROM d
ORDER BY d_num DESC, cents ASC
LIMIT 1
"""


@register(
    "ks_test_two_sample",
    oracle=_KS_ORACLE,
    bounded_window="distinct 2-dp value cents (bounded money grid)",
)
def ks_test_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D (purchase vs view values).

    The ECDF gap stays an integer cross-product |cp*n2 - cv*n1| until
    the output projection — no fraction anywhere in the scan/argmax —
    and the argmax location ties break on the smaller value.

    Scale note: the cumulative window runs over DISTINCT cents (2-dp
    money => bounded ~50k-value domain), not raw rows; the raw table
    collapses via one keyed aggregate first. TakeOrdered(1) finishes.
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view") & F.col("value").isNotNull()
    )
    per = e.groupBy(_cents().alias("cents")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("nv"),
    )
    win = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "cents",
        F.sum("np").over(win).alias("cp"),
        F.sum("nv").over(win).alias("cv"),
    )
    tot = per.agg(
        F.sum("np").alias("n_purchase"), F.sum("nv").alias("n_view")
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.abs(
            F.col("cp") * F.col("n_view") - F.col("cv") * F.col("n_purchase")
        ).alias("d_num"),
        "n_purchase",
        "n_view",
    )
    return (
        d.orderBy(F.desc("d_num"), F.asc("cents"))
        .limit(1)
        .select(
            F.col("n_purchase").cast("long").alias("n_purchase"),
            F.col("n_view").cast("long").alias("n_view"),
            F.col("d_num").cast("long").alias("d_num"),
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n_purchase") * F.col("n_view")),
                12,
            ).alias("ks_d"),
            F.round(F.col("cents") / 100.0, 2).alias("at_value"),
        )
    )


# ------------------------------------- Spearman rank correlation

_SPEARMAN_ORACLE = f"""
WITH base AS (
    SELECT {_CENTS} AS x,
           (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600 AS y
    FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
), jx AS (
    SELECT x, count(*) AS cx,
           2 * sum(count(*)) OVER (ORDER BY x) - count(*) + 1 AS drx
    FROM base GROUP BY x
), jy AS (
    SELECT y, count(*) AS cy,
           2 * sum(count(*)) OVER (ORDER BY y) - count(*) + 1 AS dry
    FROM base GROUP BY y
), jxy AS (
    SELECT x, y, count(*) AS nxy FROM base GROUP BY x, y
), joined AS (
    SELECT jxy.nxy, jx.drx, jy.dry
    FROM jxy JOIN jx USING (x) JOIN jy USING (y)
), s AS (
    SELECT sum(nxy) AS n,
           sum(nxy * drx) AS sx, sum(nxy * dry) AS sy,
           sum(nxy * drx * drx) AS sxx, sum(nxy * dry * dry) AS syy,
           sum(nxy * drx * dry) AS sxy
    FROM joined
)
SELECT CAST(n AS BIGINT) AS n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 8) AS spearman_rho
FROM s
"""


@register(
    "spearman_corr_value_hour",
    oracle=_SPEARMAN_ORACLE,
    bounded_window="distinct 2-dp values / 24 hours",
)
def spearman_corr_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rho (midrank ties) between value and hour-of-day.

    Doubled midranks (2*midrank = 2*cum_count - cnt + 1, always an
    integer) keep every moment an exact integer fold; rho is
    scale-invariant so doubling cancels. Hour comes from epoch
    arithmetic (engine-neutral, like the dow operators).

    Scale note: ranks are computed per DISTINCT value (bounded 2-dp
    domain) and per hour (24), then joined back to the (value, hour)
    contingency table — the rank windows never see raw rows. The two
    rank joins broadcast (distinct-cents table is ~50k rows max).
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    base = e.select(
        _cents().alias("x"),
        ((F.unix_timestamp("ts") % 86400) / 3600).cast("long").alias("y"),
    )
    wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    jx = (
        base.groupBy("x")
        .agg(F.count(F.lit(1)).alias("cx"))
        .select(
            "x", (2 * F.sum("cx").over(wx) - F.col("cx") + 1).alias("drx")
        )
    )
    wy = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    jy = (
        base.groupBy("y")
        .agg(F.count(F.lit(1)).alias("cy"))
        .select(
            "y", (2 * F.sum("cy").over(wy) - F.col("cy") + 1).alias("dry")
        )
    )
    jxy = base.groupBy("x", "y").agg(F.count(F.lit(1)).alias("nxy"))
    joined = jxy.join(F.broadcast(jx), "x").join(F.broadcast(jy), "y")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 — exact folds
    s = joined.agg(
        F.sum("nxy").alias("n"),
        F.sum(dec(F.col("nxy") * F.col("drx"))).alias("sx"),
        F.sum(dec(F.col("nxy") * F.col("dry"))).alias("sy"),
        F.sum(dec(F.col("nxy") * F.col("drx") * F.col("drx"))).alias("sxx"),
        F.sum(dec(F.col("nxy") * F.col("dry") * F.col("dry"))).alias("syy"),
        F.sum(dec(F.col("nxy") * F.col("drx") * F.col("dry"))).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    fx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    fy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(num / (F.sqrt(fx) * F.sqrt(fy)), 8).alias("spearman_rho"),
    )


# ---------------------------------- chi-squared independence table

_CHI2_ORACLE = """
WITH cell AS (
    SELECT event_type,
           ((CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT)
             // 86400 + 4) % 7) AS dow,
           count(*) AS observed
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1, 2
), m AS (
    SELECT cell.*,
           sum(observed) OVER (PARTITION BY event_type) AS row_total,
           sum(observed) OVER (PARTITION BY dow) AS col_total,
           sum(observed) OVER () AS grand_total
    FROM cell
), t AS (
    SELECT event_type, dow, observed, row_total, col_total, grand_total,
           round(CAST(row_total AS DOUBLE) * col_total / grand_total, 6)
               AS expected
    FROM m
), u AS (
    SELECT event_type, dow, CAST(observed AS BIGINT) AS observed, expected,
           round((observed - expected) * (observed - expected) / expected, 8)
               AS chi2_term
    FROM t
)
SELECT event_type, CAST(dow AS BIGINT) AS dow, observed, expected, chi2_term,
       CAST(sum(CAST(chi2_term AS DECIMAL(28,8))) OVER () AS DOUBLE)
           AS chi2_total
FROM u
"""


@register(
    "chi_square_event_dow",
    oracle=_CHI2_ORACLE,
    bounded_window="7 weekdays",
)
def chi_square_event_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence of event_type x day-of-week: per-cell
    observed/expected/term rows plus the decimal-summed global chi2 on
    every row (exact decimal window sum — order-independent).

    Scale note: one 35-key aggregate collapses the table; everything
    after runs over 35 rows. The epilogue windows are trivial.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    day = (F.unix_timestamp(F.date_trunc("day", "ts")) / F.lit(86400)).cast("long")
    cell = e.groupBy(
        "event_type", ((day + 4) % 7).alias("dow")
    ).agg(F.count(F.lit(1)).alias("observed"))
    m = cell.select(
        "event_type",
        "dow",
        "observed",
        F.sum("observed").over(Window.partitionBy("event_type")).alias("row_total"),
        F.sum("observed").over(Window.partitionBy("dow")).alias("col_total"),
        F.sum("observed").over(Window.partitionBy()).alias("grand_total"),
    )
    t = m.withColumn(
        "expected",
        F.round(
            F.col("row_total").cast("double")
            * F.col("col_total")
            / F.col("grand_total"),
            6,
        ),
    )
    u = t.select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        F.col("observed").cast("long").alias("observed"),
        "expected",
        F.round(
            (F.col("observed") - F.col("expected"))
            * (F.col("observed") - F.col("expected"))
            / F.col("expected"),
            8,
        ).alias("chi2_term"),
    )
    return u.withColumn(
        "chi2_total",
        F.sum(F.col("chi2_term").cast("decimal(28,8)"))
        .over(Window.partitionBy())
        .cast("double"),
    )


# ------------------------------------------- KMV (theta) set sketch

KMV_K = 64
_POW2_60 = float(1 << 60)

_KMV_SETS = """
    flags AS (
        SELECT l_partkey,
               max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS in_b
        FROM lineitem
        GROUP BY l_partkey
    ), hashed AS (
        SELECT l_partkey, in_a, in_b,
               {h} AS h
        FROM flags
    )
""".format(h=portable_hash64_sql("'kmv:' || CAST(l_partkey AS VARCHAR)"))


def _kmv_est_sql(n_sk: str, theta: str) -> str:
    """KMV estimate: exact when the sketch is not full (n < k)."""
    return (
        f"CASE WHEN {n_sk} < {KMV_K} THEN CAST({n_sk} AS DOUBLE) "
        f"ELSE round(({KMV_K} - 1) / (CAST({theta} AS DOUBLE) / {_POW2_60!r}), 4) END"
    )


_KMV_ORACLE = f"""
WITH {_KMV_SETS},
ska AS (
    SELECT h FROM hashed WHERE in_a = 1 ORDER BY h LIMIT {KMV_K}
), skb AS (
    SELECT h FROM hashed WHERE in_b = 1 ORDER BY h LIMIT {KMV_K}
), sku AS (
    SELECT h, in_a, in_b FROM hashed ORDER BY h LIMIT {KMV_K}
), sa AS (
    SELECT count(*) AS n_sk, max(h) AS theta FROM ska
), sb AS (
    SELECT count(*) AS n_sk, max(h) AS theta FROM skb
), su AS (
    SELECT count(*) AS n_sk, max(h) AS theta,
           sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both
    FROM sku
), ex AS (
    SELECT CAST(sum(in_a) AS BIGINT) AS exact_a,
           CAST(sum(in_b) AS BIGINT) AS exact_b,
           count(*) AS exact_union,
           CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS exact_inter
    FROM hashed
)
SELECT {KMV_K} AS k,
       {_kmv_est_sql('sa.n_sk', 'sa.theta')} AS est_returned,
       ex.exact_a AS exact_returned,
       {_kmv_est_sql('sb.n_sk', 'sb.theta')} AS est_kept,
       ex.exact_b AS exact_kept,
       {_kmv_est_sql('su.n_sk', 'su.theta')} AS est_union,
       ex.exact_union AS exact_union,
       round(su.n_both * ({_kmv_est_sql('su.n_sk', 'su.theta')}) / su.n_sk, 4)
           AS est_inter,
       ex.exact_inter AS exact_inter
FROM sa, sb, su, ex
"""


@register("kmv_set_cardinality", oracle=_KMV_ORACLE)
def kmv_set_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k / theta) sketch cardinalities of the returned vs
    kept part-key sets, with union AND intersection estimates audited
    against exact counts. Estimate = (k-1)/theta_k where theta_k is
    the k-th smallest portable hash as a fraction of 2^60; a sketch
    holding fewer than k values IS the exact set.

    Intersection uses the theta-sketch rule: members of the UNION
    sketch present in both sets, scaled by est_union/k.

    Scale note: bottom-k via orderBy(hash).limit(k) = TakeOrdered,
    O(k) state per partition and an O(k*partitions) merge — never a
    full sort; the per-key flag fold is one keyed aggregate. This is
    the mergeable distinct-count state for set EXPRESSIONS (union /
    intersection / difference), which HLL alone cannot give.
    """
    li = load_table(spark, sf_dir, "lineitem")
    flags = li.groupBy("l_partkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("l_returnflag") != "R", 1).otherwise(0)).alias("in_b"),
    )
    hashed = flags.select(
        "in_a",
        "in_b",
        portable_hash64(
            F.concat(F.lit("kmv:"), F.col("l_partkey").cast("string"))
        ).alias("h"),
    )

    def sketch(df: DataFrame) -> DataFrame:
        return df.orderBy("h").limit(KMV_K)

    def est(n_sk: F.Column, theta: F.Column) -> F.Column:
        return F.when(n_sk < KMV_K, n_sk.cast("double")).otherwise(
            F.round((KMV_K - 1) / (theta.cast("double") / F.lit(_POW2_60)), 4)
        )

    sa = sketch(hashed.where("in_a = 1")).agg(
        F.count(F.lit(1)).alias("na"), F.max("h").alias("ta")
    )
    sb = sketch(hashed.where("in_b = 1")).agg(
        F.count(F.lit(1)).alias("nb"), F.max("h").alias("tb")
    )
    su = sketch(hashed).agg(
        F.count(F.lit(1)).alias("nu"),
        F.max("h").alias("tu"),
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)).alias(
            "n_both"
        ),
    )
    ex = hashed.agg(
        F.sum("in_a").cast("long").alias("exact_a"),
        F.sum("in_b").cast("long").alias("exact_b"),
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0))
        .cast("long")
        .alias("exact_inter"),
    )
    row = (
        sa.crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(su))
        .crossJoin(F.broadcast(ex))
    )
    eu = est(F.col("nu"), F.col("tu"))
    return row.select(
        F.lit(KMV_K).alias("k"),
        est(F.col("na"), F.col("ta")).alias("est_returned"),
        F.col("exact_a").alias("exact_returned"),
        est(F.col("nb"), F.col("tb")).alias("est_kept"),
        F.col("exact_b").alias("exact_kept"),
        eu.alias("est_union"),
        "exact_union",
        F.round(F.col("n_both") * eu / F.col("nu"), 4).alias("est_inter"),
        "exact_inter",
    )


# ------------------------------------------- Poisson(1) bootstrap

BOOT_B = 32
# Poisson(1) CDF cut points quantized to 16-bit integers (round(cdf *
# 65536)): the weight compare becomes integer-vs-integer, and one md5
# (128 bits) yields EIGHT independent 16-bit uniforms, so each row
# needs only BOOT_B/8 = 4 hashes instead of 32 — an 8x cut in the
# dominant per-row cost. Quantization shifts each cell probability by
# < 2^-16, irrelevant for a bootstrap and identical in both engines.
_POIS_CDF_U16 = (24109, 48219, 60273, 64292, 65296, 65497, 65531)

_BOOT_W_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u16 < {t} THEN {i}" for i, t in enumerate(_POIS_CDF_U16)
    )
    + " ELSE 7 END"
)

_BOOT_ORACLE = f"""
WITH reps AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           b
    FROM orders
    CROSS JOIN (SELECT unnest(range({BOOT_B})) AS b)
), uu AS (
    SELECT b, cents,
           CAST('0x' || substr(
                    md5('boot' || CAST(b // 8 AS VARCHAR) || ':'
                        || CAST(o_orderkey AS VARCHAR)),
                    1 + 4 * (b % 8), 4) AS BIGINT) AS u16
    FROM reps
), wt AS (
    SELECT b, cents, {_BOOT_W_SQL} AS w FROM uu
), per AS (
    SELECT b,
           round(CAST(sum(CAST(w AS BIGINT) * cents) AS DOUBLE)
                 / sum(w) / 100.0, 8) AS mean_b
    FROM wt GROUP BY b
), pt AS (
    SELECT count(*) AS n_orders,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / count(*) / 100.0, 8) AS est_mean
    FROM orders
), summ AS (
    SELECT count(*) AS b_replicas,
           CAST(sum(CAST(mean_b AS DECIMAL(18,8))) AS DOUBLE) AS s1,
           CAST(sum(CAST(round(mean_b * mean_b, 8) AS DECIMAL(28,8))) AS DOUBLE)
               AS s2,
           min(mean_b) AS boot_min, max(mean_b) AS boot_max
    FROM per
)
SELECT pt.n_orders, pt.est_mean,
       CAST(summ.b_replicas AS BIGINT) AS b_replicas,
       round(summ.s1 / summ.b_replicas, 8) AS boot_mean,
       round(sqrt((summ.s2 - summ.s1 * summ.s1 / summ.b_replicas)
                  / (summ.b_replicas - 1)), 8) AS boot_se,
       summ.boot_min, summ.boot_max
FROM pt, summ
"""


@register("poisson_bootstrap_ci", oracle=_BOOT_ORACLE)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson(1) bootstrap of mean order value: B=32 deterministic
    replicates whose per-row weights come from inverting the Poisson
    CDF at a hash-uniform — the streaming-safe bootstrap (no global
    resample is ever materialized; resampling a distributed table by
    index is impossible at scale, per-row hash weights are not).

    Outputs the point estimate plus replicate mean/SE/min/max — the
    spread IS the sampling-uncertainty audit.

    Scale note: the B-fold explode is map-side (posexplode of a
    per-row weight array, no shuffle before the 32-group fold);
    per-replicate state is one (weighted sum, weight count) pair.
    Hashing happens BEFORE the explode — 4 md5s per input row, each
    sliced into eight 16-bit uniforms — so B multiplies only the cheap
    integer-compare work, not the hash cost.
    """
    o = load_table(spark, sf_dir, "orders")
    # r12 (guide §2.6 idle capacity / data.widen contract): the orders
    # file scans as ONE split at driver SFs, serializing the 4-md5 +
    # 32x posexplode + CASE-ladder chain onto one core (~2.3 s of the
    # query's 2.5 isolated); widen() spreads the raw rows once before
    # the compute. At production volumes the scan is naturally wide
    # and the repartition is a cheap row-pass.
    from streams_prototyping_spark.data import widen

    o_wide = widen(o)
    # Two-step select on purpose: the Generate (posexplode) node keeps
    # the hash projection as its own operator, so each md5 is computed
    # ONCE per row; folding the hashes into the posexplode projection
    # would re-evaluate the md5 inside every one of the 32 array
    # elements (measured 4x slower — codegen CSE does not reach into
    # array element expressions).
    hashed = o_wide.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        *[
            F.md5(
                F.concat(F.lit(f"boot{k}:"), F.col("o_orderkey").cast("string"))
            ).alias(f"h{k}")
            for k in range(BOOT_B // 8)
        ],
    )
    u16s = F.array(
        *[
            F.conv(
                F.substring(F.col(f"h{b // 8}"), 1 + 4 * (b % 8), 4), 16, 10
            ).cast("int")
            for b in range(BOOT_B)
        ]
    )
    uu = hashed.select("cents", F.posexplode(u16s).alias("b", "u16"))
    w = F.lit(7)
    for i in range(len(_POIS_CDF_U16) - 1, -1, -1):
        w = F.when(F.col("u16") < F.lit(_POIS_CDF_U16[i]), F.lit(i)).otherwise(w)
    wt = uu.select("b", "cents", w.alias("w"))
    per = wt.groupBy("b").agg(
        F.round(
            F.sum(
                (F.col("w").cast("long") * F.col("cents")).cast("decimal(38,0)")
            ).cast("double")
            / F.sum("w")
            / 100.0,
            8,
        ).alias("mean_b")
    )
    pt = o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("decimal(38,0)")
            ).cast("double")
            / F.count(F.lit(1))
            / 100.0,
            8,
        ).alias("est_mean"),
    )
    mdec = F.col("mean_b").cast("decimal(18,8)")
    m2 = F.round(F.col("mean_b") * F.col("mean_b"), 8).cast("decimal(28,8)")
    summ = per.agg(
        F.count(F.lit(1)).alias("b_replicas"),
        F.sum(mdec).cast("double").alias("s1"),
        F.sum(m2).cast("double").alias("s2"),
        F.min("mean_b").alias("boot_min"),
        F.max("mean_b").alias("boot_max"),
    )
    return pt.crossJoin(F.broadcast(summ)).select(
        "n_orders",
        "est_mean",
        F.col("b_replicas").cast("long").alias("b_replicas"),
        F.round(F.col("s1") / F.col("b_replicas"), 8).alias("boot_mean"),
        F.round(
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("b_replicas"))
                / (F.col("b_replicas") - 1)
            ),
            8,
        ).alias("boot_se"),
        "boot_min",
        "boot_max",
    )


# -------------------------- split-conformal prediction interval audit

CONF_TARGET = 0.9  # nominal coverage


def _conformal_oracle() -> str:
    h = portable_hash64_sql("'conf:' || CAST(event_id AS VARCHAR)")
    return f"""
WITH base AS (
    SELECT event_id,
           CAST(round(value * 100, 0) AS BIGINT) AS y,
           (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600 AS x,
           {h} % 3 AS split
    FROM events
), tr AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x) AS DOUBLE) AS sx,
           CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(x * x) AS DOUBLE) AS sxx,
           CAST(sum(x * y) AS DOUBLE) AS sxy,
           CAST(count(*) AS BIGINT) AS n_train
    FROM base WHERE split = 0
), fit AS (
    SELECT n_train,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
    FROM tr
), cal AS (
    SELECT event_id,
           round(abs(CAST(y AS DOUBLE) - (f.a + f.b * x)), 6) AS r
    FROM base CROSS JOIN fit f WHERE split = 1
), kq AS (
    SELECT CAST(count(*) AS BIGINT) AS n_cal,
           least((9 * (count(*) + 1) + 9) // 10, count(*)) AS k
    FROM cal
), qhat AS (
    SELECT r AS q FROM (
        SELECT r, row_number() OVER (ORDER BY r, event_id) AS rn FROM cal
    ) JOIN kq ON rn = kq.k
), test AS (
    SELECT count(*) AS n_test,
           sum(CASE WHEN round(abs(CAST(y AS DOUBLE) - (f.a + f.b * x)), 6)
                         <= q.q THEN 1 ELSE 0 END) AS covered
    FROM base CROSS JOIN fit f CROSS JOIN qhat q WHERE split = 2
)
SELECT f.n_train, kq.n_cal, CAST(t.n_test AS BIGINT) AS n_test,
       round(f.b, 6) AS slope_cents_per_hour,
       round(f.a, 6) AS intercept_cents,
       q.q AS qhat_cents,
       CAST({CONF_TARGET} AS DOUBLE) AS target_coverage,
       round(CAST(t.covered AS DOUBLE) / t.n_test, 6) AS test_coverage
FROM fit f, kq, qhat q, test t
"""


@register(
    "split_conformal_audit",
    oracle=_conformal_oracle(),
    bounded_window="distinct 6-dp residuals (cents x 24 hourly slopes grid)",
)
def split_conformal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction audit (Vovk; Lei et al. 2018): fit a
    1-feature OLS (event value vs hour-of-day) on a hash-split TRAIN
    third, take the ceil((n+1)*{CONF_TARGET})-th smallest absolute
    calibration residual as the interval half-width qhat
    (finite-sample coverage guarantee, no distributional assumption),
    then report HONEST empirical coverage of yhat +/- qhat on a
    disjoint TEST third. This is the distribution-free way to attach
    valid uncertainty to any point predictor a pipeline deploys —
    the audit a model gate reads before trusting predicted quality
    scores.

    Determinism: splits are hash-decided (reproducible across engines
    and retries); the OLS moments are exact int64 sums folded through
    IDENTICAL double expressions; residuals are rounded at 6 dp before
    the rank (so the k-th order statistic and coverage comparisons
    cannot fork on ulps); the quantile is exact type-1.

    Scale design: two one-pass aggregates (moments, coverage); the
    k-th order statistic locates via distinct-residual cumulative
    counts (operators/ranks.value_cum_counts) — the global window runs
    over the residual DOMAIN (|y| is 2-dp cents x 24 hour slopes, a
    bounded grid), never over calibration rows. No single-partition
    row-level sort anywhere (round-5 verdict item 1).
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("y"),
        ((F.unix_timestamp("ts") % 86400) / 3600).cast("long").alias("x"),
        (
            portable_hash64(
                F.concat(F.lit("conf:"), F.col("event_id").cast("string"))
            )
            % 3
        ).alias("split"),
    )
    tr = base.filter(F.col("split") == 0).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.count(F.lit(1)).alias("n_train"),
    )
    b_expr = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
    fit = tr.select(
        "n_train",
        F.expr(b_expr).alias("b"),
        F.expr(f"(sy - {b_expr} * sx) / n").alias("a"),
    )
    cal = (
        base.filter(F.col("split") == 1)
        .crossJoin(F.broadcast(fit))
        .select(
            "event_id",
            F.round(
                F.abs(F.col("y").cast("double") - (F.col("a") + F.col("b") * F.col("x"))),
                6,
            ).alias("r"),
        )
    )
    kq = cal.agg(
        F.count(F.lit(1)).alias("n_cal"),
        F.expr(
            "least((9 * (count(1) + 1) + 9) div 10, count(1))"
        ).alias("k"),
    )
    from streams_prototyping_spark.operators.ranks import (
        value_at_rank,
        value_cum_counts,
    )

    # k-th smallest residual WITHOUT a row-level global sort: cumulate
    # counts over DISTINCT 6-dp residuals and pick the value whose
    # cumulative count spans k (identical to the rank-k selection —
    # the old event_id tiebreak only ordered rows of equal r).
    qhat = (
        value_cum_counts(cal, "r")
        .crossJoin(F.broadcast(kq))
        .where(value_at_rank(F.col("k")))
        .select(F.col("r").alias("q"), "n_cal")
    )
    test = (
        base.filter(F.col("split") == 2)
        .crossJoin(F.broadcast(fit.select("a", "b")))
        .crossJoin(F.broadcast(qhat.select("q")))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.round(
                        F.abs(
                            F.col("y").cast("double")
                            - (F.col("a") + F.col("b") * F.col("x"))
                        ),
                        6,
                    )
                    <= F.col("q"),
                    1,
                ).otherwise(0)
            ).alias("covered"),
        )
    )
    return (
        fit.crossJoin(F.broadcast(qhat))
        .crossJoin(F.broadcast(test))
        .select(
            "n_train",
            "n_cal",
            F.col("n_test").cast("long").alias("n_test"),
            F.round("b", 6).alias("slope_cents_per_hour"),
            F.round("a", 6).alias("intercept_cents"),
            F.col("q").alias("qhat_cents"),
            F.lit(CONF_TARGET).alias("target_coverage"),
            F.round(F.col("covered").cast("double") / F.col("n_test"), 6).alias(
                "test_coverage"
            ),
        )
    )
