"""Selection-under-constraints operators: the Pareto frontier
(skyline) and one-pass weighted sampling — the pieces a curation
pipeline uses to pick 'best' rows when 'best' is multi-objective or
probabilistic.

- pareto_frontier_parts: the skyline of the part catalog (minimize
  retail price, maximize size): a part survives iff nothing is
  cheaper-and-at-least-as-big or same-price-and-bigger. Computed with
  ONE range-frame window over price (the sort-and-sweep skyline
  algorithm), not the naive O(n^2) dominance self-join.
- weighted_sample_es: Efraimidis-Spirakis one-pass weighted sampling
  without replacement (k largest u^(1/w), realized as ln(u)/w keys):
  the distributed reservoir — every row gets a deterministic
  hash-derived key, TakeOrdered keeps k, and the union of partition
  top-ks is exact. RNG-free like every sampler in this engine.

Reference parity: no selection surface in the reference (408 Java
LoC); SURVEY.md Part C″ extension.

Scale design (100 TB):
- skyline: one shuffle to order by price; the sweep is a range-frame
  window (running max of size over strictly-cheaper rows). For the
  2-objective case this is exactly linear after the sort; higher
  dimensions would tile by grid cells first (documented seam).
- weighted sampling: per-row key projection (hash + ln, map-side),
  then TakeOrdered(k) — O(k) state per partition, O(k * partitions)
  merge, no global sort, single scan. This is why ES-sampling (not
  inverse-CDF resampling) is the weighted sampler that scales.
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
ES_K = 64


# ------------------------------------------------- Pareto frontier

_PARETO_ORACLE = """
WITH p AS (
    SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
           CAST(p_size AS BIGINT) AS p_size
    FROM part
), swept AS (
    SELECT p.*,
           max(p_size) OVER (ORDER BY price_cents
                             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_cheaper,
           max(p_size) OVER (PARTITION BY price_cents) AS best_same_price
    FROM p
)
SELECT p_partkey, round(CAST(price_cents AS DOUBLE) / 100.0, 2) AS price,
       p_size
FROM swept
WHERE (best_cheaper IS NULL OR p_size > best_cheaper)
  AND p_size >= best_same_price
"""


@register(
    "pareto_frontier_parts",
    oracle=_PARETO_ORACLE,
    bounded_window="distinct 2-dp retail prices (bounded value grid)",
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of the part catalog: minimize price, maximize size.
    Dominated iff some part is strictly cheaper with >= size, or same
    price with strictly larger size (equal points both survive —
    strict Pareto dominance). Sort-and-sweep, but the sweep runs over
    the DISTINCT-price table: one keyed max per price, a running max
    over distinct prices, then a join back — no dominance self-join.

    Scale note (round-6 lint): the only global window cumulates over
    distinct 2-dp prices (bounded value domain — the aggregate's own
    grouping key), never over part rows; row-level work is one keyed
    aggregate and one shuffle join on price_cents.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    per_price = p.groupBy("price_cents").agg(
        F.max("p_size").alias("best_same_price")
    )
    w_cheaper = Window.orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sweep = per_price.select(
        "price_cents",
        "best_same_price",
        F.max("best_same_price").over(w_cheaper).alias("best_cheaper"),
    )
    swept = p.join(sweep, "price_cents")
    return swept.where(
        (F.col("best_cheaper").isNull() | (F.col("p_size") > F.col("best_cheaper")))
        & (F.col("p_size") >= F.col("best_same_price"))
    ).select(
        "p_partkey",
        F.round(F.col("price_cents").cast("double") / 100.0, 2).alias("price"),
        "p_size",
    )


# ------------------------------- Efraimidis-Spirakis weighted sample

_ES_ORACLE = f"""
WITH w AS (
    SELECT doc_id, source, n_chars,
           CAST({portable_hash64_sql("'es:' || CAST(doc_id AS VARCHAR)")} + 1
                AS DOUBLE) / {_POW2_60!r} AS u
    FROM documents WHERE n_chars > 0
), keyed AS (
    -- round BEFORE ranking: a 1-ulp ln() disagreement between libms
    -- must not flip the order near the k-th key; ties break on doc_id
    SELECT doc_id, source, n_chars,
           round(ln(u) / n_chars, 12) AS es_key
    FROM w
)
SELECT doc_id, source, n_chars, es_key,
       CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT keyed.*, row_number() OVER (ORDER BY es_key DESC, doc_id) AS rnk
    FROM keyed
) WHERE rnk <= {ES_K}
"""


@register("weighted_sample_es", oracle=_ES_ORACLE)
def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement:
    keep the {ES_K} documents with the largest u^(1/w) keys
    (equivalently largest ln(u)/w — monotone transform, avoids pow
    underflow), w = n_chars, u a portable hash-uniform in (0, 1].
    Inclusion probability is proportional to weight; the sample is
    deterministic and reproducible across engines and runs.

    Scale note: the key is a map-side projection; orderBy().limit(k)
    plans as TakeOrderedAndProject (per-partition top-{ES_K}, merged at
    the driver — no single-partition exchange of the table), and the
    rnk column is then a row_number over the already-{ES_K}-row result
    (round-5 verdict item 1: limit FIRST, rank the K survivors).
    """
    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (
        portable_hash64(F.concat(F.lit("es:"), F.col("doc_id").cast("string"))) + 1
    ).cast("double") / F.lit(_POW2_60)
    # round BEFORE ranking (1-ulp ln() cross-engine safety; doc_id ties)
    keyed = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 12).alias("es_key"),
    )
    topk = keyed.orderBy(F.col("es_key").desc(), F.col("doc_id")).limit(ES_K)
    ranked = topk.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("es_key").desc(), F.col("doc_id"))),
    )
    return ranked.where(F.col("rnk") <= ES_K).select(
        "doc_id",
        "source",
        "n_chars",
        "es_key",
        F.col("rnk").cast("long").alias("rnk"),
    )


# ----------------------- Poisson-PPS sampling + Horvitz-Thompson audit

PPS_N_TARGET = 2048  # expected sample size


def _pps_oracle() -> str:
    u = portable_hash64_sql("'pps:' || CAST(o_orderkey AS VARCHAR)")
    return f"""
WITH base AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
           CAST({u} + 1 AS DOUBLE) / {_POW2_60!r} AS u
    FROM orders
), tot AS (
    SELECT CAST(sum(cents) AS DOUBLE) AS t_cents,
           CAST(count(*) AS BIGINT) AS n_pop
    FROM base
), probs AS (
    SELECT b.o_orderkey, b.cents, b.u,
           least(1.0, CAST(b.cents AS DOUBLE) * {PPS_N_TARGET} / t.t_cents)
               AS pi,
           t.t_cents, t.n_pop
    FROM base b CROSS JOIN tot t
), sampled AS (
    SELECT * FROM probs WHERE u < pi
)
SELECT max(p.n_pop) AS n_pop,
       round(CAST((SELECT sum(CAST(round(pi, 9) AS DECIMAL(20,9)))
                   FROM probs) AS DOUBLE), 3) AS n_expected,
       count(*) AS n_sampled,
       round(max(p.t_cents) / 100, 2) AS exact_total,
       round(CAST(sum(CAST(round(CAST(p.cents AS DOUBLE) / p.pi, 6)
                           AS DECIMAL(28,6))) AS DOUBLE) / 100, 2)
           AS ht_total,
       round(CAST(sum(CAST(round(1.0 / p.pi, 9) AS DECIMAL(20,9)))
                  AS DOUBLE), 3) AS ht_count
FROM sampled p
"""


@register("pps_horvitz_thompson", oracle=_pps_oracle())
def pps_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson PPS (probability-proportional-to-size) sampling with the
    Horvitz-Thompson estimator audit — how a pipeline estimates corpus
    totals from a tiny sample instead of scanning everything: each
    order is included independently with pi = min(1, n*size/total)
    (size = price in exact cents, inclusion decided by the portable
    hash-uniform, so the sample is reproducible across engines, runs,
    and task retries). HT re-weights each sampled row by 1/pi: the
    revenue estimate is near-exact BY CONSTRUCTION (pi proportional to
    the estimand makes y/pi constant — the PPS optimality property,
    visible in the output), while the order-COUNT estimate carries
    real variance — the side-by-side is the point of the audit.

    Determinism: pi is one double expression of exact int64 inputs in
    identical operation order; HT contributions are rounded (6/9 dp)
    then summed as exact decimals, so Spark's partial aggregation and
    DuckDB's single-threaded fold agree bit-for-bit.

    Scale design: one narrow projection (hash + compare) and one
    global aggregate — no shuffle beyond the 1-row totals broadcast;
    at 100 TB this is THE way to audit corpus statistics without a
    full pass per question.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
        (
            (
                portable_hash64(
                    F.concat(F.lit("pps:"), F.col("o_orderkey").cast("string"))
                )
                + 1
            ).cast("double")
            / F.lit(_POW2_60)
        ).alias("u"),
    )
    tot = base.agg(
        F.sum("cents").cast("double").alias("t_cents"),
        F.count(F.lit(1)).alias("n_pop"),
    )
    probs = base.crossJoin(F.broadcast(tot)).select(
        "o_orderkey",
        "cents",
        "u",
        F.least(
            F.lit(1.0),
            F.col("cents").cast("double") * PPS_N_TARGET / F.col("t_cents"),
        ).alias("pi"),
        "t_cents",
        "n_pop",
    )
    n_expected = probs.agg(
        F.round(
            F.sum(F.round("pi", 9).cast("decimal(20,9)")).cast("double"), 3
        ).alias("v")
    )
    sampled = probs.filter(F.col("u") < F.col("pi"))
    return (
        sampled.agg(
            F.max("n_pop").alias("n_pop"),
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.max("t_cents") / 100, 2).alias("exact_total"),
            F.round(
                F.sum(
                    F.round(F.col("cents").cast("double") / F.col("pi"), 6).cast(
                        "decimal(28,6)"
                    )
                ).cast("double")
                / 100,
                2,
            ).alias("ht_total"),
            F.round(
                F.sum(F.round(F.lit(1.0) / F.col("pi"), 9).cast("decimal(20,9)"))
                .cast("double"),
                3,
            ).alias("ht_count"),
        )
        .crossJoin(F.broadcast(n_expected.select(F.col("v").alias("n_expected"))))
        .select(
            "n_pop",
            "n_expected",
            "n_sampled",
            "exact_total",
            "ht_total",
            "ht_count",
        )
    )


# ------------------------------- quota sampling per source (stratified)

QS_TOTAL = 256  # total sample budget across sources


def _qs_oracle() -> str:
    u = portable_hash64_sql("'qs:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH sz AS (
    SELECT source, count(*) AS n,
           CAST(round(sqrt(count(*)), 6) AS DECIMAL(18,6)) AS w
    FROM documents GROUP BY source
), tot AS (
    SELECT sum(w) AS sw FROM sz
), quota AS (
    SELECT source, n,
           least(n, greatest(1, CAST(ceil(
               {QS_TOTAL} * CAST(w AS DOUBLE) / CAST(sw AS DOUBLE)
           ) AS BIGINT))) AS q
    FROM sz CROSS JOIN tot
), ranked AS (
    SELECT d.doc_id, d.source,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY {u}, d.doc_id) AS rnk
    FROM documents d
)
SELECT r.doc_id, r.source, CAST(r.rnk AS BIGINT) AS rnk,
       CAST(q.q AS BIGINT) AS quota
FROM ranked r JOIN quota q ON q.source = r.source
WHERE r.rnk <= q.q
"""


@register(
    "quota_sample_per_source",
    oracle=_qs_oracle(),
    bounded_window=None,  # all windows partitioned by source
)
def quota_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified quota sampling: a {QS_TOTAL}-document budget split
    across sources proportionally to sqrt(source size) (the sub-linear
    upsampling rule mixture recipes use — same weighting as
    dataset_interleave), each source contributing its q highest-ranked
    documents under a deterministic per-document hash order. The
    hash-ranked prefix IS a uniform sample within each source, and the
    whole selection is reproducible across engines and runs (RNG-free,
    like every sampler in this engine).

    Determinism: per-source weights are 6-dp-rounded sqrt counts
    summed as exact decimals (a raw double sum's order-dependence
    could fork the quota at a ceil boundary); ranks tie-break on
    doc_id.

    Scale design: source sizes are one partial-combined aggregate
    (broadcast back as O(sources) rows); ranking is a source-
    partitioned window with a LITERAL rank<={QS_TOTAL} pre-filter —
    InferWindowGroupLimit prunes each partition to its local top
    {QS_TOTAL} before the shuffle (the column-valued quota filter
    then trims to q_s <= {QS_TOTAL} rows per source). No global sort,
    no single-partition window, shuffle volume O(sources x {QS_TOTAL}).
    """
    d = load_table(spark, sf_dir, "documents")
    sz = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sqrt(F.count(F.lit(1))), 6).cast("decimal(18,6)").alias("w"),
    )
    tot = sz.agg(F.sum("w").alias("sw"))
    quota = sz.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.least(
            F.col("n"),
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(
                    F.lit(QS_TOTAL)
                    * F.col("w").cast("double")
                    / F.col("sw").cast("double")
                ),
            ),
        ).alias("quota"),
    )
    u = portable_hash64(F.concat(F.lit("qs:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(u, F.col("doc_id"))
    ranked = (
        d.select("doc_id", "source", F.row_number().over(w).alias("rnk"))
        # literal bound first: rewritten to WindowGroupLimit (per-
        # partition top-k pre-prune); the data-dependent quota bound
        # below cannot be (it is a column, not a literal)
        .filter(F.col("rnk") <= QS_TOTAL)
    )
    return ranked.join(F.broadcast(quota.select("source", "quota")), "source").where(
        F.col("rnk") <= F.col("quota")
    ).select(
        "doc_id",
        "source",
        F.col("rnk").cast("long").alias("rnk"),
        F.col("quota").cast("long").alias("quota"),
    )
