"""Record-level governance operators: probabilistic record linkage
(Fellegi & Sunter 1969 — the model behind Splink/dedupe.io) and a
k-anonymity / l-diversity privacy audit. Both treat the customer table
as the "records" corpus.

Scale design (100 TB): linkage candidate generation is BLOCKED — an
equi-join on a composite block key, so pair volume is
sum(block_size^2), never N^2 (the fuzzy_name_pairs pattern); the
field u-probabilities come from one global value-frequency aggregate
per field (tiny, broadcast as a 1-row cross join). The anonymity audit
is two keyed aggregates (group -> ladder level). Everything is exact
integer/decimal arithmetic until one final rounded division, so the
DuckDB twins hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register

# ------------------------------------------ Fellegi-Sunter linkage weights

# Comparison fields over blocked customer pairs. m = P(agree | match) is
# the usual hand-set prior (Splink's default starting point); u =
# P(agree | non-match) is ESTIMATED from the data as sum_v (n_v/N)^2 —
# the probability two random records agree on the field.
FS_FIELDS = (
    # (name, spark expr producing the compared value, m-probability)
    ("segment", "c_mktsegment", 0.95),
    ("bal_band", "CAST(floor(c_acctbal / 1000) AS BIGINT)", 0.90),
    ("id_digit", "c_custkey % 10", 0.80),
)
FS_T_MATCH = 4.0  # total log2-weight thresholds: >= -> match
FS_T_POSSIBLE = 0.0  # in [possible, match) -> clerical review

# Corpus-adaptive blocking (the LSH-depth lesson applied to linkage):
# a FIXED block key is quadratic — N records over a constant number of
# blocks means block sizes, and therefore candidate pairs, grow as N^2.
# The balance-band width shrinks with the corpus so the expected block
# size stays ~FS_TARGET_BLOCK: bands_needed = N div (nations * target),
# width = ACCTBAL_SPAN div bands_needed — pure int64 arithmetic, so the
# driver-side value and the oracle's scalar params CTE cannot fork.
FS_TARGET_BLOCK = 32
FS_N_NATIONS = 25
FS_ACCTBAL_SPAN = 11000  # c_acctbal ∈ [-999.99, 9999.99]

_FS_BW_CACHE: dict = {}


def _fs_block_width(spark: SparkSession, sf_dir: str) -> int:
    from streams_prototyping_spark.data import dataset_cache_key

    key = dataset_cache_key(sf_dir, "customer")
    if key not in _FS_BW_CACHE:
        n = load_table(spark, sf_dir, "customer").count()
        bands = max(1, n // (FS_N_NATIONS * FS_TARGET_BLOCK))
        _FS_BW_CACHE[key] = max(1, FS_ACCTBAL_SPAN // bands)
    return _FS_BW_CACHE[key]


_FS_BW_SQL = (
    f"greatest(1, {FS_ACCTBAL_SPAN} // greatest(1, "
    f"(SELECT count(*) FROM customer) // {FS_N_NATIONS * FS_TARGET_BLOCK}))"
)


def _fs_weight_sql(field: str, m: float) -> str:
    """Per-field agreement/disagreement log2 weight, rounded at 6 dp
    BEFORE summation (both engines sum exact decimals)."""
    return (
        f"CAST(round(CASE WHEN a_{field} = b_{field} "
        f"THEN log2({m} / u_{field}) "
        f"ELSE log2({1.0 - m} / (1 - u_{field})) END, 6) AS DECIMAL(18,6))"
    )


def _fs_u_sql(field: str) -> str:
    """u-probability: sum over values of (freq/N)^2, as one double
    division of exact int64 aggregates — NO intermediate rounding:
    Python round() is banker's, DuckDB's is half-away, so a rounded u
    could fork between the Spark (driver-computed) and oracle sides;
    the raw IEEE quotient of identical integers cannot."""
    return (
        f"CAST((SELECT sum(n * n) FROM (SELECT count(*) AS n "
        f"FROM recs GROUP BY v_{field})) AS DOUBLE) "
        f"/ ((SELECT CAST(count(*) AS DOUBLE) FROM recs) "
        f"* (SELECT CAST(count(*) AS DOUBLE) FROM recs))"
    )


def _fs_recs_cte() -> str:
    cols = ", ".join(
        f"{expr.replace('c_', 'c.c_')} AS v_{name}" for name, expr, _ in FS_FIELDS
    )
    return f"""
params AS (
    SELECT {_FS_BW_SQL} AS bw
), recs AS MATERIALIZED (
    SELECT c.c_custkey AS rec_id,
           c.c_nationkey AS blk_nation,
           CAST(floor(c.c_acctbal / p.bw) AS BIGINT) AS blk_bal,
           {cols}
    FROM customer c CROSS JOIN params p
)"""


def _fs_oracle() -> str:
    u_cols = ",\n           ".join(
        f"{_fs_u_sql(name)} AS u_{name}" for name, _, _ in FS_FIELDS
    )
    w_sum = " + ".join(_fs_weight_sql(name, m) for name, _, m in FS_FIELDS)
    a_cols = ", ".join(f"a.v_{name} AS a_{name}" for name, _, _ in FS_FIELDS)
    b_cols = ", ".join(f"b.v_{name} AS b_{name}" for name, _, _ in FS_FIELDS)
    return f"""
WITH {_fs_recs_cte()},
u AS (
    SELECT {u_cols}
), cand AS (
    SELECT a.rec_id AS id_a, b.rec_id AS id_b, {a_cols}, {b_cols}
    FROM recs a JOIN recs b
      ON a.blk_nation = b.blk_nation AND a.blk_bal = b.blk_bal
     AND a.rec_id < b.rec_id
), scored AS (
    SELECT CAST({w_sum} AS DOUBLE) AS weight
    FROM cand CROSS JOIN u
)
SELECT CAST(floor(weight) AS BIGINT) AS weight_band,
       CASE WHEN weight >= {FS_T_MATCH} THEN 'match'
            WHEN weight >= {FS_T_POSSIBLE} THEN 'possible'
            ELSE 'non_match' END AS decision,
       count(*) AS n_pairs,
       round(min(weight), 6) AS min_weight,
       round(max(weight), 6) AS max_weight
FROM scored
GROUP BY weight_band, decision
"""


@register("fs_linkage_weights", oracle=_fs_oracle())
def fs_linkage_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over blocked
    customer pairs: each candidate pair gets a total log2 match weight
    — sum over comparison fields of log2(m/u) on agreement and
    log2((1-m)/(1-u)) on disagreement — with m hand-set priors and u
    (chance-agreement) estimated from global value frequencies.
    Output is the match-weight histogram (1-point bands) crossed with
    the three-way Fellegi-Sunter decision (match / possible /
    non_match), i.e. the threshold-setting artifact a linkage pipeline
    owner actually looks at.

    Scale design: blocking on (nation, acctbal band) makes the
    candidate join an equi-join, and the band width is
    CORPUS-ADAPTIVE (_fs_block_width — the LSH-depth lesson): a fixed
    block key would make pair volume sum(block^2) ~ N^2/consts, i.e.
    quadratic; shrinking the width to hold expected block size at
    ~{FS_TARGET_BLOCK} keeps candidates O(N). The width formula is
    pure int64 and mirrored as the oracle's scalar params CTE.
    u-probabilities are one aggregate per field over the record
    table (each a scalar, cross-joined as a broadcast 1-row literal);
    the weight sum is exact decimal arithmetic (per-field weights
    rounded at 6 dp, summed losslessly), so floor() banding cannot
    fork between engines. At production scale the m's come from the EM
    pass over the same comparison-vector counts this query already
    materializes.
    """
    c = load_table(spark, sf_dir, "customer")
    bw = _fs_block_width(spark, sf_dir)
    sel = [
        F.col("c_custkey").alias("rec_id"),
        F.col("c_nationkey").alias("blk_nation"),
        F.expr(f"CAST(floor(c_acctbal / {bw}) AS BIGINT)").alias("blk_bal"),
    ] + [F.expr(expr).alias(f"v_{name}") for name, expr, _ in FS_FIELDS]
    recs = c.select(*sel)

    n = recs.count()
    # u per field: one tiny aggregate each — driver-side scalars, the
    # same shape as the adaptive-depth params elsewhere (bounded by the
    # field count, not the corpus).
    us = {}
    for name, _, _ in FS_FIELDS:
        sq = (
            recs.groupBy(f"v_{name}")
            .count()
            .agg(F.sum(F.col("count") * F.col("count")).alias("ss"))
            .collect()[0]["ss"]
        )
        us[name] = float(sq) / (float(n) * float(n))

    a = recs.alias("a")
    b = recs.alias("b")
    cand = a.join(
        b,
        (F.col("a.blk_nation") == F.col("b.blk_nation"))
        & (F.col("a.blk_bal") == F.col("b.blk_bal"))
        & (F.col("a.rec_id") < F.col("b.rec_id")),
    )
    import math

    weight = None
    for name, _, m in FS_FIELDS:
        agree_w = round(math.log2(m / us[name]), 6)
        disagree_w = round(math.log2((1.0 - m) / (1.0 - us[name])), 6)
        term = (
            F.when(
                F.col(f"a.v_{name}") == F.col(f"b.v_{name}"), F.lit(agree_w)
            )
            .otherwise(F.lit(disagree_w))
            .cast("decimal(18,6)")
        )
        weight = term if weight is None else weight + term
    scored = cand.select(weight.cast("double").alias("weight"))
    return (
        scored.groupBy(
            F.floor("weight").cast("long").alias("weight_band"),
            F.when(F.col("weight") >= FS_T_MATCH, "match")
            .when(F.col("weight") >= FS_T_POSSIBLE, "possible")
            .otherwise("non_match")
            .alias("decision"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.min("weight"), 6).alias("min_weight"),
            F.round(F.max("weight"), 6).alias("max_weight"),
        )
    )


# ------------------------------------------------ k-anonymity / l-diversity

K_ANON_K = 5  # re-identification risk threshold

# Generalization ladder: progressively coarser quasi-identifier sets.
# Level 0 is the most specific (highest utility, worst k); each level
# drops/coarsens one QI — the Samarati/Sweeney generalization lattice
# walked as a single unpivoted query.
_QI_LADDER = (
    # (level, spark/duck expr for the composite QI key)
    (
        0,
        "CAST(c_nationkey AS STRING) || '|' || c_mktsegment || '|' "
        "|| CAST(CAST(floor(c_acctbal / 500) AS BIGINT) AS STRING)",
    ),
    (1, "CAST(c_nationkey AS STRING) || '|' || c_mktsegment"),
    (2, "c_mktsegment"),
)
# sensitive attribute for l-diversity: the account-balance decile
_SENSITIVE = "CAST(floor(c_acctbal / 1000) AS BIGINT)"


def _k_anon_oracle() -> str:
    levels = "\nUNION ALL\n".join(
        f"SELECT {lvl} AS level, {expr} AS qi, {_SENSITIVE} AS sens, "
        f"c_custkey FROM customer"
        for lvl, expr in _QI_LADDER
    )
    return f"""
WITH leveled AS (
    {levels}
), grouped AS (
    SELECT level, qi,
           count(*) AS k,
           count(DISTINCT sens) AS l
    FROM leveled GROUP BY level, qi
)
SELECT level,
       count(*) AS n_groups,
       min(k) AS min_k,
       min(l) AS min_l,
       CAST(sum(CASE WHEN k < {K_ANON_K} THEN k ELSE 0 END) AS BIGINT)
           AS n_records_below_k,
       round(CAST(sum(CASE WHEN k < {K_ANON_K} THEN k ELSE 0 END) AS DOUBLE)
             / sum(k), 6) AS frac_below_k
FROM grouped
GROUP BY level
"""


@register("k_anonymity_audit", oracle=_k_anon_oracle())
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    2007) across a generalization ladder: for each level of
    progressively coarser quasi-identifiers — (nation, segment,
    balance-band) -> (nation, segment) -> (segment) — report the group
    count, worst-case k (smallest equivalence class), worst-case l
    (fewest distinct sensitive values in a class), and how many
    records sit in classes below k={K_ANON_K} (the re-identifiable
    fraction). This is the table a privacy review reads to pick the
    cheapest generalization level that clears policy.

    Scale design: one union of narrow projections (the ladder is a
    constant-size lattice walk), one keyed aggregate per level on the
    QI key, one per-level rollup — two shuffles of key-sized rows
    regardless of corpus width. count(DISTINCT sens) per group is
    bounded by the sensitive attribute's cardinality, not the corpus.
    """
    c = load_table(spark, sf_dir, "customer")
    leveled = None
    for lvl, expr in _QI_LADDER:
        part = c.select(
            F.lit(lvl).cast("int").alias("level"),
            F.expr(expr).alias("qi"),
            F.expr(_SENSITIVE).alias("sens"),
        )
        leveled = part if leveled is None else leveled.unionAll(part)
    grouped = leveled.groupBy("level", "qi").agg(
        F.count(F.lit(1)).alias("k"),
        F.count_distinct("sens").alias("l"),
    )
    below = F.when(F.col("k") < K_ANON_K, F.col("k")).otherwise(F.lit(0))
    return grouped.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("k").alias("min_k"),
        F.min("l").alias("min_l"),
        F.sum(below).alias("n_records_below_k"),
        F.round(F.sum(below).cast("double") / F.sum("k"), 6).alias("frac_below_k"),
    )


# --------------------------------------- Fellegi-Sunter EM parameter fit

EM_ROUNDS = 3
EM_LAM0, EM_M0, EM_U0 = 0.01, 0.9, 0.1


def _em_round_ctes(r: int, prev: str) -> str:
    """One unrolled EM round over the (<=8-row) comparison-pattern
    table: E-step weights as exact DECIMAL(14,12), M-step parameter
    updates as double ratios of exact decimal sums."""
    names = [name for name, _, _ in FS_FIELDS]
    pm = " * ".join(
        f"(CASE WHEN g_{n} = 1 THEN p.m_{n} ELSE 1 - p.m_{n} END)" for n in names
    )
    pu = " * ".join(
        f"(CASE WHEN g_{n} = 1 THEN p.u_{n} ELSE 1 - p.u_{n} END)" for n in names
    )
    gcols = ", ".join(f"g_{n}" for n in names)
    m_up = ",\n           ".join(
        f"greatest(least(CAST(sum(n * w * g_{n}) AS DOUBLE) "
        f"/ greatest(CAST(sum(n * w) AS DOUBLE), 1e-30), 1 - 1e-6), 1e-6) AS m_{n}"
        for n in names
    )
    u_up = ",\n           ".join(
        f"greatest(least(CAST(sum(n * g_{n}) - sum(n * w * g_{n}) AS DOUBLE) "
        f"/ greatest(CAST(sum(n) - sum(n * w) AS DOUBLE), 1e-30), 1 - 1e-6), 1e-6)"
        f" AS u_{n}"
        for n in names
    )
    return f"""
e{r} AS (
    SELECT {gcols}, n,
           p.lam * {pm} AS pm,
           (1 - p.lam) * {pu} AS pu
    FROM pat CROSS JOIN {prev} p
), w{r} AS (
    SELECT {gcols}, n,
           CAST(round(pm / (pm + pu), 12) AS DECIMAL(14,12)) AS w
    FROM e{r}
), p{r} AS (
    SELECT greatest(least(CAST(sum(n * w) AS DOUBLE) / sum(n), 1 - 1e-6), 1e-6)
               AS lam,
           {m_up},
           {u_up}
    FROM w{r}
)"""


def _fs_em_oracle() -> str:
    names = [name for name, _, _ in FS_FIELDS]
    gammas = ", ".join(
        f"CASE WHEN a.v_{n} = b.v_{n} THEN 1 ELSE 0 END AS g_{n}" for n in names
    )
    init_cols = ", ".join(
        [f"CAST({EM_LAM0} AS DOUBLE) AS lam"]
        + [f"CAST({EM_M0} AS DOUBLE) AS m_{n}" for n in names]
        + [f"CAST({EM_U0} AS DOUBLE) AS u_{n}" for n in names]
    )
    rounds = "".join(
        "," + _em_round_ctes(r, f"p{r - 1}" if r > 1 else "p0")
        for r in range(1, EM_ROUNDS + 1)
    )
    last = f"p{EM_ROUNDS}"
    out = [f"SELECT 'lambda' AS param, round(lam, 9) AS value FROM {last}"]
    for n in names:
        out.append(f"SELECT 'm_{n}', round(m_{n}, 9) FROM {last}")
        out.append(f"SELECT 'u_{n}', round(u_{n}, 9) FROM {last}")
    unpivot = "\nUNION ALL ".join(out)
    return f"""
WITH {_fs_recs_cte()},
cand AS (
    SELECT {gammas}
    FROM recs a JOIN recs b
      ON a.blk_nation = b.blk_nation AND a.blk_bal = b.blk_bal
     AND a.rec_id < b.rec_id
), pat AS (
    SELECT {", ".join(f"g_{n}" for n in names)}, count(*) AS n
    FROM cand GROUP BY {", ".join(f"g_{n}" for n in names)}
), p0 AS (
    SELECT {init_cols}
){rounds}
{unpivot}
"""


@register("fs_em_params", oracle=_fs_em_oracle())
def fs_em_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised EM fit of the Fellegi-Sunter parameters (the core
    of Splink / Winkler's method): over the blocked pairs' agreement
    patterns (2^3 = 8 comparison vectors), {EM_ROUNDS} EM rounds
    estimate lambda (match proportion) and per-field m/u
    probabilities. E-step: P(match | pattern) from the current
    params; M-step: weighted MLE updates. Emits the fitted parameter
    vector — the data-driven replacement for fs_linkage_weights'
    hand-set m priors.

    Scale design: the corpus-sized work is ONE aggregation — blocked
    pairs folded to <=8 pattern counts (map-side combinable). EM then
    runs driver-side on those 8 integers (the markov_attribution
    absorbing-solve precedent: a constant-size model fold, not a data
    fold). At 100 TB nothing changes: the pattern table is still 8
    rows.

    Determinism: E-step weights are snapped to exact DECIMAL(14,12)
    grid points in both engines (double round -> decimal cast in
    DuckDB, format-string quantize in Python), so every M-step sum is
    exact decimal arithmetic; the double ratio/clamp chains use the
    same operation order on both sides.
    """
    from decimal import Decimal

    names = [name for name, _, _ in FS_FIELDS]
    c = load_table(spark, sf_dir, "customer")
    bw = _fs_block_width(spark, sf_dir)
    sel = [
        F.col("c_custkey").alias("rec_id"),
        F.col("c_nationkey").alias("blk_nation"),
        F.expr(f"CAST(floor(c_acctbal / {bw}) AS BIGINT)").alias("blk_bal"),
    ] + [F.expr(expr).alias(f"v_{name}") for name, expr, _ in FS_FIELDS]
    recs = c.select(*sel)
    a = recs.alias("a")
    b = recs.alias("b")
    cand = a.join(
        b,
        (F.col("a.blk_nation") == F.col("b.blk_nation"))
        & (F.col("a.blk_bal") == F.col("b.blk_bal"))
        & (F.col("a.rec_id") < F.col("b.rec_id")),
    ).select(
        *[
            F.when(F.col(f"a.v_{n}") == F.col(f"b.v_{n}"), 1)
            .otherwise(0)
            .alias(f"g_{n}")
            for n in names
        ]
    )
    pats = [
        (tuple(int(row[f"g_{n}"]) for n in names), int(row["n"]))
        for row in cand.groupBy(*[f"g_{n}" for n in names])
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]

    lam = EM_LAM0
    m = {n: EM_M0 for n in names}
    u = {n: EM_U0 for n in names}
    for _ in range(EM_ROUNDS):
        weighted = []
        for gs, n in pats:
            pm = lam
            pu = 1 - lam
            for i, f in enumerate(names):
                pm = pm * (m[f] if gs[i] == 1 else 1 - m[f])
                pu = pu * (u[f] if gs[i] == 1 else 1 - u[f])
            w = Decimal(f"{round(pm / (pm + pu), 12):.12f}")
            weighted.append((gs, n, w))
        s = sum((n * w for _, n, w in weighted), Decimal(0))
        t = sum(n for _, n, _ in weighted)
        new_m, new_u = {}, {}
        for i, f in enumerate(names):
            sg = sum((n * w for gs, n, w in weighted if gs[i] == 1), Decimal(0))
            ng = sum(n for gs, n, _ in weighted if gs[i] == 1)
            new_m[f] = max(min(float(sg) / max(float(s), 1e-30), 1 - 1e-6), 1e-6)
            new_u[f] = max(
                min(
                    float(Decimal(ng) - sg) / max(float(Decimal(t) - s), 1e-30),
                    1 - 1e-6,
                ),
                1e-6,
            )
        lam = max(min(float(s) / t, 1 - 1e-6), 1e-6)
        m, u = new_m, new_u

    rows = [("lambda", round(lam, 9))]
    for n in names:
        rows.append((f"m_{n}", round(m[n], 9)))
        rows.append((f"u_{n}", round(u[n], 9)))
    return spark.createDataFrame(rows, "param string, value double")
