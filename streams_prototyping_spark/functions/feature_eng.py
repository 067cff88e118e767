"""Feature-engineering and drift operators: the tabular-ML prep layer
(encodings, hashed features, importance sampling) plus the two
production drift statistics (PSI, mutual information) — all
oracle-checked with the house determinism recipe.

- target_encoding_loo: leave-one-out target encoding of the customer
  market segment against total order spend — THE high-cardinality
  categorical encoder (LOO removes the self-leak that makes naive
  target encoding overfit).
- woe_iv_mktsegment: weight-of-evidence / information value of the
  segment predicting a positive account balance — the credit-scoring
  encoder with the Laplace-smoothed log-odds.
- psi_drift_report: Population Stability Index of order totals, late
  period vs early period, over exact equi-depth decile bins trained on
  the EARLY period only (the production train-vs-serve drift monitor).
- feature_hash_onehot: signed feature hashing (hashing trick) of the
  categorical customer columns into a 32-dim sparse vector — the
  stateless encoder that needs no vocabulary broadcast at any scale.
- importance_downsample: deterministic importance sampling of the
  document corpus — keep probability proportional to a length-derived
  weight, decided by a hash-uniform, with per-source acceptance audit
  (the quality-weighted downsampling stage of a training-data mix).
- mutual_information_value_type: mutual information between event type
  and value quartile from the contingency table — the nonlinear
  dependence complement to chi-square.

Reference parity: no feature layer exists in the reference
(apurvam/streams-prototyping, 408 Java LoC); SURVEY.md Part C″
extension. The encoders are one-aggregate-plus-broadcast shapes — the
reference's partial-fold state model applied to feature statistics.

Determinism: all counts/sums are exact integer/decimal folds; ln()
runs on rounded inputs and its output is rounded again (the same
round-before-use pattern the KL/HLL operators established); hash
decisions use the portable md5 hash.

Scale design (100 TB):
- target/woe encoders: one keyed aggregate to per-entity sums, one
  small-key aggregate to segment stats, broadcast back. No window over
  raw rows anywhere.
- psi/mi: bins assigned BY VALUE via a broadcast 9-row (3-row)
  boundary table trained from the distinct-value cumulative table —
  the raw scan never sorts; boundary training touches only the
  bounded 2-dp distinct domain.
- feature hashing: pure per-row projection (map-side, shuffle only
  for the final per-customer fold); vocabulary-free by construction.
- importance_downsample: per-row hash decision, one small per-source
  audit fold. The corpus max-length normalizer is a 1-row broadcast.
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

_POW2_60 = float(1 << 60)


# ------------------------------------------- leave-one-out target enc

_LOO_ORACLE = """
WITH spend AS (
    SELECT c.c_custkey, c.c_mktsegment,
           coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS cents
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
), seg AS (
    SELECT c_mktsegment, count(*) AS seg_n, sum(cents) AS seg_cents
    FROM spend GROUP BY c_mktsegment
)
SELECT s.c_custkey, s.c_mktsegment,
       round(CAST(s.cents AS DOUBLE) / 100.0, 2) AS spend,
       CASE WHEN g.seg_n > 1
            THEN round(CAST(g.seg_cents - s.cents AS DOUBLE)
                       / (g.seg_n - 1) / 100.0, 6)
            END AS loo_encoding
FROM spend s JOIN seg g USING (c_mktsegment)
"""


@register("target_encoding_loo", oracle=_LOO_ORACLE)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each customer's segment encoded
    as the mean spend of the OTHER customers in the segment (removes
    the self-leak of naive target encoding; NULL for singletons).

    Scale note: one keyed fold to per-customer cents, one 5-key
    segment fold broadcast back — the raw orders table is touched
    once, integer cents end-to-end.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")), F.lit(0)
            ).alias("cents")
        )
    )
    seg = spend.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("seg_n"), F.sum("cents").alias("seg_cents")
    )
    return spend.join(F.broadcast(seg), "c_mktsegment").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("cents").cast("double") / 100.0, 2).alias("spend"),
        F.when(
            F.col("seg_n") > 1,
            F.round(
                (F.col("seg_cents") - F.col("cents")).cast("double")
                / (F.col("seg_n") - 1)
                / 100.0,
                6,
            ),
        ).alias("loo_encoding"),
    )


# ------------------------------------------------------------- WoE/IV

_WOE_ORACLE = """
WITH lab AS (
    SELECT c_mktsegment, CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS good
    FROM customer
), seg AS (
    SELECT c_mktsegment,
           sum(good) AS n_good, sum(1 - good) AS n_bad
    FROM lab GROUP BY c_mktsegment
), tot AS (
    SELECT sum(n_good) AS tg, sum(n_bad) AS tb, count(*) AS k FROM seg
), w AS (
    SELECT s.c_mktsegment,
           CAST(s.n_good AS BIGINT) AS n_good, CAST(s.n_bad AS BIGINT) AS n_bad,
           round((s.n_good + 0.5) / (t.tg + 0.5 * t.k), 10) AS pg,
           round((s.n_bad + 0.5) / (t.tb + 0.5 * t.k), 10) AS pb
    FROM seg s CROSS JOIN tot t
), v AS (
    SELECT c_mktsegment, n_good, n_bad, pg, pb,
           round(ln(round(pg / pb, 10)), 8) AS woe
    FROM w
)
SELECT c_mktsegment, n_good, n_bad, pg, pb, woe,
       round((pg - pb) * woe, 8) AS iv_term,
       CAST(sum(CAST(round((pg - pb) * woe, 8) AS DECIMAL(28,8))) OVER ()
            AS DOUBLE) AS iv_total
FROM v
"""


@register(
    "woe_iv_mktsegment",
    oracle=_WOE_ORACLE,
    bounded_window="5 market segments",
)
def woe_iv_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information value of market segment vs a
    positive-balance label, Laplace-smoothed (+0.5 per class per bin).
    ln runs on a 10-dp-rounded ratio and is rounded to 8 dp (the
    KL-operator pattern); the IV total is a decimal window sum.

    Scale note: one 5-key aggregate; everything downstream is 5 rows.
    """
    c = load_table(spark, sf_dir, "customer")
    lab = c.select(
        "c_mktsegment",
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("good"),
    )
    seg = lab.groupBy("c_mktsegment").agg(
        F.sum("good").alias("n_good"), F.sum(1 - F.col("good")).alias("n_bad")
    )
    tot = seg.agg(
        F.sum("n_good").alias("tg"),
        F.sum("n_bad").alias("tb"),
        F.count(F.lit(1)).alias("k"),
    )
    w = seg.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        F.col("n_good").cast("long").alias("n_good"),
        F.col("n_bad").cast("long").alias("n_bad"),
        F.round((F.col("n_good") + 0.5) / (F.col("tg") + 0.5 * F.col("k")), 10).alias(
            "pg"
        ),
        F.round((F.col("n_bad") + 0.5) / (F.col("tb") + 0.5 * F.col("k")), 10).alias(
            "pb"
        ),
    )
    v = w.withColumn("woe", F.round(F.log(F.round(F.col("pg") / F.col("pb"), 10)), 8))
    v = v.withColumn("iv_term", F.round((F.col("pg") - F.col("pb")) * F.col("woe"), 8))
    return v.withColumn(
        "iv_total",
        F.sum(F.col("iv_term").cast("decimal(28,8)"))
        .over(Window.partitionBy())
        .cast("double"),
    )


# ------------------------------------------------------------ PSI drift

PSI_BINS = 10

_PSI_ORACLE = f"""
WITH o AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CAST(floor(epoch(date_trunc('day', o_orderdate))) AS BIGINT) // 86400
               AS day
    FROM orders
), rng AS (
    SELECT (min(day) + max(day)) // 2 AS split_day FROM o
), tagged AS (
    SELECT cents, CASE WHEN day <= split_day THEN 'a' ELSE 'b' END AS period
    FROM o CROSS JOIN rng
), acum AS (
    SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum,
           sum(cnt) OVER () AS na
    FROM (SELECT cents, count(*) AS cnt FROM tagged WHERE period = 'a'
          GROUP BY cents)
), edges AS (
    SELECT i, min(cents) AS edge
    FROM acum CROSS JOIN (SELECT unnest(range(1, {PSI_BINS})) AS i)
    WHERE cum * {PSI_BINS} >= i * na
    GROUP BY i
), binned AS (
    SELECT t.period,
           (SELECT count(*) FROM edges e WHERE t.cents > e.edge) AS bin
    FROM tagged t
), cellcount AS (
    SELECT bin,
           sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS cb
    FROM binned GROUP BY bin
), spine AS (
    SELECT unnest(range({PSI_BINS})) AS bin
), tots AS (
    SELECT sum(ca) AS na, sum(cb) AS nb FROM cellcount
), p AS (
    SELECT s.bin,
           CAST(coalesce(c.ca, 0) AS BIGINT) AS count_early,
           CAST(coalesce(c.cb, 0) AS BIGINT) AS count_late,
           round((coalesce(c.ca, 0) + 1.0) / (t.na + {PSI_BINS}), 10) AS p_early,
           round((coalesce(c.cb, 0) + 1.0) / (t.nb + {PSI_BINS}), 10) AS p_late
    FROM spine s LEFT JOIN cellcount c USING (bin) CROSS JOIN tots t
), v AS (
    SELECT bin, count_early, count_late, p_early, p_late,
           round((p_late - p_early) * round(ln(round(p_late / p_early, 10)), 8), 8)
               AS psi_term
    FROM p
)
SELECT CAST(bin AS BIGINT) AS bin, count_early, count_late, p_early, p_late,
       psi_term,
       CAST(sum(CAST(psi_term AS DECIMAL(28,8))) OVER () AS DOUBLE) AS psi_total
FROM v
"""


@register(
    "psi_drift_report",
    oracle=_PSI_ORACLE,
    bounded_window="distinct 2-dp cents of the early period",
)
def psi_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of order totals, late half vs early
    half of the date range, over exact equi-depth deciles trained on
    the EARLY period only — the train-vs-serve drift monitor. Add-one
    smoothing keeps empty bins finite; terms are rounded before the
    decimal total.

    Scale note: decile edges come from the cumulative table over
    DISTINCT cents of the early period (bounded 2-dp domain) and
    broadcast as 9 rows; bin assignment is a per-row comparison count,
    so the raw scan never sorts or shuffles by value. The per-bin fold
    is {PSI_BINS} keys.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.unix_timestamp(F.date_trunc("day", "o_orderdate")) / F.lit(86400))
        .cast("long")
        .alias("day"),
    )
    rng = o.agg(((F.min("day") + F.max("day")) / 2).cast("long").alias("split_day"))
    tagged = o.crossJoin(F.broadcast(rng)).select(
        "cents",
        F.when(F.col("day") <= F.col("split_day"), "a").otherwise("b").alias("period"),
    )
    # r12 (guide §2.3/§2.4, gated by corpus size): above
    # ranks.TWO_LEVEL_MIN_ROWS one (period, cents) pre-reduce feeds
    # BOTH the edge trainer and the bin counter (acnt is a filter over
    # percell's own exchange — ReuseExchange dedups it, saving a full
    # orders pass) and the cumulative edge pass uses the two-level
    # bucket prefix instead of a single-partition ordered window over
    # the distinct early cents, with `na` as a broadcast scalar.
    # Below the threshold the original shape stays — measured faster
    # at sf0.1 (1.50 vs 2.16 s: the extra bucket/broadcast stages cost
    # more than the ~75k-row single task they replace). Oracle-verified
    # on both paths.
    from streams_prototyping_spark.data import table_n
    from streams_prototyping_spark.operators.ranks import TWO_LEVEL_MIN_ROWS

    percell = tagged.groupBy("period", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    if table_n(spark, sf_dir, "orders") >= TWO_LEVEL_MIN_ROWS:
        acnt = percell.where("period = 'a'").select("cents", "cnt")
        b = acnt.withColumn("_bkt", (F.col("cents") / 100_000).cast("long"))
        bkt = b.groupBy("_bkt").agg(F.sum("cnt").alias("bcnt"))
        wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, 0)
        boff = bkt.select(
            "_bkt", (F.sum("bcnt").over(wb) - F.col("bcnt")).alias("_boff")
        )
        wv = Window.partitionBy("_bkt").orderBy("cents").rowsBetween(
            Window.unboundedPreceding, 0
        )
        na_row = acnt.agg(F.sum("cnt").alias("na"))
        acum = (
            b.join(F.broadcast(boff), "_bkt")
            .select(
                "cents",
                (F.col("_boff") + F.sum("cnt").over(wv)).alias("cum"),
            )
            .crossJoin(F.broadcast(na_row))
        )
    else:
        acnt = tagged.where("period = 'a'").groupBy("cents").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
        acum = acnt.select(
            "cents",
            F.sum("cnt").over(wcum).alias("cum"),
            F.sum("cnt").over(Window.partitionBy()).alias("na"),
        )
    spine9 = spark.range(1, PSI_BINS).select(F.col("id").alias("i"))
    edges = (
        acum.crossJoin(F.broadcast(spine9))
        .where(F.col("cum") * PSI_BINS >= F.col("i") * F.col("na"))
        .groupBy("i")
        .agg(F.min("cents").alias("edge"))
    )
    # one row per (period, cents) going into the edge join, so the
    # post-join count("edge") IS the bin index (0..9)
    binned = (
        percell.join(F.broadcast(edges), F.col("cents") > F.col("edge"), "left")
        .groupBy("period", "cents", "cnt")
        .agg(F.count("edge").alias("bin"))
    )
    cellcount = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == "a", F.col("cnt")).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("period") == "b", F.col("cnt")).otherwise(0)).alias("cb"),
    )
    spine = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    tots = cellcount.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    p = (
        spine.join(F.broadcast(cellcount), "bin", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.coalesce(F.col("ca"), F.lit(0)).cast("long").alias("count_early"),
            F.coalesce(F.col("cb"), F.lit(0)).cast("long").alias("count_late"),
            F.round(
                (F.coalesce(F.col("ca"), F.lit(0)) + 1.0)
                / (F.col("na") + PSI_BINS),
                10,
            ).alias("p_early"),
            F.round(
                (F.coalesce(F.col("cb"), F.lit(0)) + 1.0)
                / (F.col("nb") + PSI_BINS),
                10,
            ).alias("p_late"),
        )
    )
    v = p.withColumn(
        "psi_term",
        F.round(
            (F.col("p_late") - F.col("p_early"))
            * F.round(F.log(F.round(F.col("p_late") / F.col("p_early"), 10)), 8),
            8,
        ),
    )
    return v.withColumn(
        "psi_total",
        F.sum(F.col("psi_term").cast("decimal(28,8)"))
        .over(Window.partitionBy())
        .cast("double"),
    )


# ------------------------------------------------------ feature hashing

HASH_DIM = 32

_FH_ORACLE = f"""
WITH feats AS (
    SELECT c_custkey, 'seg:' || c_mktsegment AS feat FROM customer
    UNION ALL
    SELECT c_custkey, 'nat:' || CAST(c_nationkey AS VARCHAR) AS feat FROM customer
), hashed AS (
    SELECT c_custkey,
           {portable_hash64_sql('feat')} % {HASH_DIM} AS idx,
           CASE WHEN {portable_hash64_sql('feat')} % {2 * HASH_DIM} < {HASH_DIM}
                THEN 1 ELSE -1 END AS sign
    FROM feats
)
SELECT c_custkey, CAST(idx AS BIGINT) AS idx,
       CAST(sum(sign) AS BIGINT) AS val
FROM hashed
GROUP BY c_custkey, idx
"""


@register("feature_hash_onehot", oracle=_FH_ORACLE)
def feature_hash_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed feature hashing (Weinberger hashing trick) of the
    categorical customer columns into a {HASH_DIM}-dim sparse vector:
    index = h mod D, sign from the next hash bit (keeps collision
    noise zero-mean). Output is the sparse (entity, idx, val) triple
    table a trainer consumes.

    Scale note: vocabulary-free per-row projection — no dictionary
    broadcast, no state; the only shuffle is the per-customer fold.
    The same plan shape holds for any D because D never materializes
    as data.
    """
    c = load_table(spark, sf_dir, "customer")
    feats = c.select(
        "c_custkey", F.concat(F.lit("seg:"), F.col("c_mktsegment")).alias("feat")
    ).unionAll(
        c.select(
            "c_custkey",
            F.concat(F.lit("nat:"), F.col("c_nationkey").cast("string")).alias("feat"),
        )
    )
    h = portable_hash64(F.col("feat"))
    # sign bit: (h // D) % 2 == (h % 2D) // D — the latter avoids an
    # engine-varying float division ((h % 2D) < D <=> bit is 0)
    hashed = feats.select(
        "c_custkey",
        (h % HASH_DIM).alias("idx"),
        F.when((h % (2 * HASH_DIM)) < HASH_DIM, 1).otherwise(-1).alias("sign"),
    )
    return hashed.groupBy("c_custkey", "idx").agg(
        F.sum("sign").cast("long").alias("val")
    ).select(
        "c_custkey", F.col("idx").cast("long").alias("idx"), "val"
    )


# --------------------------------------------- importance downsampling

_IMP_ORACLE = f"""
WITH mx AS (
    SELECT max(n_chars) AS max_chars FROM documents
), w AS (
    SELECT d.source,
           round(greatest(0.05, least(1.0,
               CAST(d.n_chars AS DOUBLE) / m.max_chars * 2.0)), 6) AS wt,
           CAST({portable_hash64_sql("'imp:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)
               / {_POW2_60!r} AS u
    FROM documents d CROSS JOIN mx m
), dec AS (
    SELECT source, wt, CASE WHEN u < wt THEN 1 ELSE 0 END AS keep FROM w
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS accept_rate,
       round(CAST(sum(CAST(round(wt * 1000000) AS BIGINT)) AS DOUBLE)
             / count(*) / 1000000.0, 6) AS expected_rate
FROM dec
GROUP BY source
"""


@register("importance_downsample", oracle=_IMP_ORACLE)
def importance_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance downsampling: keep each document with
    probability proportional to a length-derived weight, decided by a
    portable hash-uniform (RNG-free, reproducible across runs and
    engines). Per-source audit compares realized vs expected keep rate
    — the drift alarm for the sampler itself.

    Scale note: pure per-row decision (hash + compare), one small
    per-source fold; the max-length normalizer is a 1-row broadcast.
    This is the shape that downsamples 100 TB in one scan with no
    shuffle of the payload.
    """
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("n_chars").alias("max_chars"))
    w = d.crossJoin(F.broadcast(mx)).select(
        "source",
        F.round(
            F.greatest(
                F.lit(0.05),
                F.least(
                    F.lit(1.0),
                    F.col("n_chars").cast("double") / F.col("max_chars") * 2.0,
                ),
            ),
            6,
        ).alias("wt"),
        (
            portable_hash64(
                F.concat(F.lit("imp:"), F.col("doc_id").cast("string"))
            ).cast("double")
            / F.lit(_POW2_60)
        ).alias("u"),
    )
    dec = w.select(
        "source", "wt", F.when(F.col("u") < F.col("wt"), 1).otherwise(0).alias("keep")
    )
    return dec.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.round(F.sum("keep").cast("double") / F.count(F.lit(1)), 6).alias(
            "accept_rate"
        ),
        F.round(
            F.sum(F.round(F.col("wt") * 1000000).cast("long").cast("decimal(38,0)"))
            .cast("double")
            / F.count(F.lit(1))
            / 1000000.0,
            6,
        ).alias("expected_rate"),
    )


# ------------------------------------------------- mutual information

MI_BINS = 4

_MI_ORACLE = f"""
WITH e AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE value IS NOT NULL
), acum AS (
    SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum, sum(cnt) OVER () AS n
    FROM (SELECT cents, count(*) AS cnt FROM e GROUP BY cents)
), edges AS (
    SELECT i, min(cents) AS edge
    FROM acum CROSS JOIN (SELECT unnest(range(1, {MI_BINS})) AS i)
    WHERE cum * {MI_BINS} >= i * n
    GROUP BY i
), binned AS (
    SELECT event_type,
           (SELECT count(*) FROM edges x WHERE e.cents > x.edge) AS qbin
    FROM e
), cell AS (
    SELECT event_type, qbin, count(*) AS c FROM binned GROUP BY 1, 2
), m AS (
    SELECT cell.*,
           sum(c) OVER (PARTITION BY event_type) AS rx,
           sum(c) OVER (PARTITION BY qbin) AS cy,
           sum(c) OVER () AS n
    FROM cell
), v AS (
    SELECT event_type, CAST(qbin AS BIGINT) AS qbin, CAST(c AS BIGINT) AS observed,
           round(CAST(c AS DOUBLE) / n
                 * round(ln(round(CAST(c AS DOUBLE) * n / (rx * cy), 10)), 8), 8)
               AS mi_term
    FROM m
)
SELECT event_type, qbin, observed, mi_term,
       CAST(sum(CAST(mi_term AS DECIMAL(28,8))) OVER () AS DOUBLE) AS mi_total
FROM v
"""


@register(
    "mutual_information_value_type",
    oracle=_MI_ORACLE,
    bounded_window="distinct 2-dp cents x event types",
)
def mutual_information_value_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and value quartile from
    the 5x{MI_BINS} contingency table — detects the nonlinear
    dependence chi-square terms only hint at. Quartile edges are exact
    equi-depth over the distinct 2-dp value domain; MI terms use the
    round-ln-round pattern and a decimal total.

    Scale note: identical shape to chi_square_event_dow — one keyed
    fold to the contingency table, windows over 20 rows; the quartile
    edges broadcast as 3 rows.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull()).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    cnt = e.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    acum = cnt.select(
        "cents",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    spine = spark.range(1, MI_BINS).select(F.col("id").alias("i"))
    edges = (
        acum.crossJoin(F.broadcast(spine))
        .where(F.col("cum") * MI_BINS >= F.col("i") * F.col("n"))
        .groupBy("i")
        .agg(F.min("cents").alias("edge"))
    )
    percell = e.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    binned = (
        percell.join(F.broadcast(edges), F.col("cents") > F.col("edge"), "left")
        .groupBy("event_type", "cents", "cnt")
        .agg(F.count("edge").alias("qbin"))
    )
    cell = binned.groupBy("event_type", "qbin").agg(F.sum("cnt").alias("c"))
    m = cell.select(
        "event_type",
        "qbin",
        "c",
        F.sum("c").over(Window.partitionBy("event_type")).alias("rx"),
        F.sum("c").over(Window.partitionBy("qbin")).alias("cy"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    v = m.select(
        "event_type",
        F.col("qbin").cast("long").alias("qbin"),
        F.col("c").cast("long").alias("observed"),
        F.round(
            F.col("c").cast("double")
            / F.col("n")
            * F.round(
                F.log(
                    F.round(
                        F.col("c").cast("double") * F.col("n") / (F.col("rx") * F.col("cy")),
                        10,
                    )
                ),
                8,
            ),
            8,
        ).alias("mi_term"),
    )
    return v.withColumn(
        "mi_total",
        F.sum(F.col("mi_term").cast("decimal(28,8)"))
        .over(Window.partitionBy())
        .cast("double"),
    )
