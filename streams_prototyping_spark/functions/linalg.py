"""Distributed linear algebra over the embeddings / events tables.

Four operators a training-data pipeline runs on its embedding store
that none of the similarity family covers:

- embedding_covariance: the dim x dim covariance matrix as rows — the
  input to whitening, PCA, and Mahalanobis outlier gates.
- pca_power_iteration: top principal component by fixed-count power
  iteration ON the covariance rows — deterministic cross-engine via
  per-iteration decimal rounding (the pagerank/Holt fixed-point trick
  applied to eigenvectors).
- mahalanobis_outliers: per-vector distance under the diagonal
  covariance model — the embedding-store corruption gate.
- ols_value_normal_eq: multivariate OLS (two features + intercept) by
  exact normal equations + Cramer's rule — closed-form model training
  as a single distributed aggregation.

Scale design: the covariance reduction is the only part that touches
the corpus — a single nested-transform generator emits each row's
upper-triangle products map-side (NO join, no shuffle of vector rows)
into a dim²-group partial aggregate, so 100 TB of embeddings shuffle
only ~dim²/2 partial sums per partition; the result is a shared
persisted stage (consumed by covariance/PCA alike). Power iteration
then works on dim² rows (a few KB at dim=64); at production scale you
would collect that matrix and call numpy.linalg.eigh on the driver —
the SQL iteration here exists because it is exactly reproducible in
both engines, which numpy eigensolvers are not.

No reference counterpart (the reference has no numeric-array surface
at all — SURVEY §2 Part C); this is north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register
from streams_prototyping_spark.stage_cache import shared_stage

EMB_DIM = 64
PCA_T = 6  # fixed power-iteration count (deterministic, both engines)

# ---------------------------------------------------- covariance

_COV_CTE = f"""
x AS (
    SELECT vec_id, CAST(i AS INT) AS i,
           CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS xi
    FROM embeddings
    CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i)
), m AS (
    SELECT i,
           count(*) AS n,
           round(CAST(sum(CAST(round(xi, 8) AS DECIMAL(28,8))) AS DOUBLE)
                 / count(*), 8) AS mean_v
    FROM x GROUP BY i
), p AS (
    SELECT a.i AS i, b.i AS j,
           CAST(sum(CAST(round(a.xi * b.xi, 10) AS DECIMAL(38,10))) AS DOUBLE)
               AS s
    FROM x a JOIN x b ON b.vec_id = a.vec_id AND b.i >= a.i
    GROUP BY 1, 2
), cov AS MATERIALIZED (
    -- MATERIALIZED: PCA's per-iteration CTEs below reference the
    -- covariance ~2x per level; DuckDB inlines plain CTEs, so the
    -- corpus-sized pairwise fold re-ran ~2^PCA_T times (OOM at sf1
    -- under a bounded memory_limit)
    -- + 0.0 folds IEEE negative zero into +0.0 (a round() of a tiny
    -- negative otherwise hashes as 'float:-0.0' in one engine only)
    SELECT p.i, p.j,
           round(p.s / ma.n - ma.mean_v * mb.mean_v, 6) + 0.0 AS cov
    FROM p
    JOIN m ma ON ma.i = p.i
    JOIN m mb ON mb.i = p.j
)"""

_COV_ORACLE = f"""
WITH {_COV_CTE}
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, cov FROM cov
"""


def _cov_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle (i <= j) covariance rows: (i int, j int, cov),
    shared per (session, sf): embedding_covariance and
    pca_power_iteration both read this one persisted stage.

    Plan: ONE generator emits each row's dim*(dim+1)/2 upper-triangle
    products directly (a nested transform over the array — no vector
    self-join, no chained-explode that generates the full dim² and
    filters half away), then a dim²-group partial-combine aggregate:
    per input partition only ~2k partial rows shuffle regardless of
    corpus size. Means join in afterwards over dim-sized broadcasts.
    """

    def build() -> DataFrame:
        e = load_table(spark, sf_dir, "embeddings")
        v = e.select(
            "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
        )
        tri = v.select(
            F.explode(
                F.expr(
                    "flatten(transform(v, (x, i) -> "
                    "transform(slice(v, i + 1, size(v) - i), "
                    "(y, k) -> struct(i AS i, i + k AS j, x * y AS p))))"
                )
            ).alias("t")
        ).select("t.i", "t.j", "t.p")
        pairs = tri.groupBy("i", "j").agg(
            F.sum(F.round(F.col("p"), 10).cast("decimal(38,10)"))
            .cast("double")
            .alias("s")
        )
        means = (
            v.select(F.posexplode("v").alias("i", "xi"))
            .groupBy("i")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.round(F.col("xi"), 8).cast("decimal(28,8)")).cast("double")
                    / F.count(F.lit(1)),
                    8,
                ).alias("mean_v"),
            )
        )
        ma = means.select(F.col("i").alias("mi"), "n", F.col("mean_v").alias("mean_i"))
        mb = means.select(F.col("i").alias("mj"), F.col("mean_v").alias("mean_j"))
        return (
            pairs.join(F.broadcast(ma), pairs["i"] == ma["mi"])
            .join(F.broadcast(mb), pairs["j"] == mb["mj"])
            .select(
                "i",
                "j",
                (
                    F.round(
                        F.col("s") / F.col("n") - F.col("mean_i") * F.col("mean_j"), 6
                    )
                    + F.lit(0.0)
                ).alias("cov"),
            )
        )

    return shared_stage(spark, sf_dir, "linalg/cov_triangle", build)


@register("embedding_covariance", oracle=_COV_ORACLE)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim x dim covariance of the embedding corpus, upper triangle as
    rows (i <= j) — whitening / PCA / Mahalanobis input. Decimal-exact
    sums (products rounded to 10 dp before accumulation) make the
    matrix bit-identical cross-engine."""
    return _cov_triangle(spark, sf_dir).select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        "cov",
    )


# ---------------------------------------------------- power iteration

def _pca_iter_cte(t: int) -> str:
    prev = f"v{t - 1}"
    return f"""w{t} AS MATERIALIZED (
    SELECT c.i,
           CAST(sum(CAST(round(c.cov * p.comp, 12) AS DECIMAL(38,12)))
                AS DOUBLE) AS w
    FROM covfull c JOIN {prev} p ON p.i = c.j GROUP BY c.i
), n{t} AS (
    SELECT sqrt(CAST(sum(CAST(round(w * w, 12) AS DECIMAL(38,12))) AS DOUBLE))
        AS nrm
    FROM w{t}
), v{t} AS (
    SELECT i, round(w / nrm, 10) + 0.0 AS comp FROM w{t} CROSS JOIN n{t}
)"""


_PCA_ORACLE = (
    f"WITH {_COV_CTE},\n"
    + """covfull AS MATERIALIZED (
    SELECT i, j, cov FROM cov
    UNION ALL
    SELECT j AS i, i AS j, cov FROM cov WHERE i <> j
), v0 AS (
    SELECT unnest(range(%d)) AS i, 0.125 AS comp
),
""" % EMB_DIM
    + ",\n".join(_pca_iter_cte(t) for t in range(1, PCA_T + 1))
    + f"""
SELECT CAST(v.i AS BIGINT) AS dim, v.comp AS component,
       round(n.nrm, 6) AS eigenvalue
FROM v{PCA_T} v CROSS JOIN n{PCA_T} n
"""
)


@register("pca_power_iteration", oracle=_PCA_ORACLE)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance via
    {PCA_T} fixed power iterations: w = C v; v = w/||w||, every product
    decimal-rounded before summation so the trajectory is bit-identical
    cross-engine (sqrt and division are IEEE-correctly-rounded in both).
    Returns one row per dimension plus the Rayleigh-norm eigenvalue
    estimate ||w_T|| (v_{{T-1}} is unit-norm).

    Scale note: the corpus-sized work is embedding_covariance's
    shared reduction; each iteration here joins dim² rows against a
    broadcast dim-row vector — constant-size work. At 100 TB you
    would collect the 64x64 matrix and use numpy.linalg.eigh; the SQL
    iteration is the oracle-checkable twin proving the math.
    """
    def build() -> DataFrame:
        cov = _cov_triangle(spark, sf_dir)
        # cov is the shared persisted stage; the mirrored union re-reads
        # the cache, so no extra checkpoint here
        covfull = cov.union(
            cov.where(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "cov"
            )
        )
        v = spark.range(EMB_DIM).select(
            F.col("id").cast("int").alias("i"), F.lit(0.125).alias("comp")
        )
        nrm_df = None
        for _ in range(PCA_T):
            prev = v.select(F.col("i").alias("pj"), "comp")
            w = (
                covfull.join(F.broadcast(prev), covfull["j"] == prev["pj"])
                .groupBy(covfull["i"].alias("i"))
                .agg(
                    F.sum(
                        F.round(F.col("cov") * F.col("comp"), 12).cast(
                            "decimal(38,12)"
                        )
                    )
                    .cast("double")
                    .alias("w")
                )
            )
            nrm_df = w.agg(
                F.sqrt(
                    F.sum(
                        F.round(F.col("w") * F.col("w"), 12).cast("decimal(38,12)")
                    ).cast("double")
                ).alias("nrm")
            )
            v = (
                w.crossJoin(F.broadcast(nrm_df))
                .select(
                    "i",
                    (F.round(F.col("w") / F.col("nrm"), 10) + F.lit(0.0)).alias(
                        "comp"
                    ),
                )
                .localCheckpoint()
            )
        return v.crossJoin(F.broadcast(nrm_df)).select(
            F.col("i").cast("long").alias("dim"),
            F.col("comp").alias("component"),
            F.round(F.col("nrm"), 6).alias("eigenvalue"),
        )

    # The trained component is a shipped artifact (the kmeans/ANN-index
    # policy): build once per (session, sf), readers hit the cache.
    return shared_stage(spark, sf_dir, "linalg/pca_top_component", build)


# ---------------------------------------------------- OLS via normal equations

# Exact integer moments (hour/dow are small ints, value snapped to
# cents) are cast to DOUBLE before the determinant arithmetic: the
# 3x3 Cramer determinants reach ~1e27, past both int64 and exact-double
# integer range, but IEEE double +,-,* are correctly rounded and both
# engines evaluate the SAME expression tree, so the results are
# bit-identical; beta relative error ~1e-15 vanishes at the 8 dp round.
_OLS_DET_SELECT = """
SELECT CAST(n AS BIGINT) AS n,
       round(det0 / det, 8) AS beta0_cents,
       round(det1 / det, 8) AS beta1_cents,
       round(det2 / det, 8) AS beta2_cents,
       round(1.0 - (syy - (det0 / det) * sy
                        - (det1 / det) * sx1y
                        - (det2 / det) * sx2y)
                 / (syy - sy * sy / n), 6) AS r_squared
FROM (
    SELECT n, sy, sx1y, sx2y, syy,
           n * (sx11 * sx22 - sx12 * sx12)
             - sx1 * (sx1 * sx22 - sx12 * sx2)
             + sx2 * (sx1 * sx12 - sx11 * sx2) AS det,
           sy * (sx11 * sx22 - sx12 * sx12)
             - sx1 * (sx1y * sx22 - sx12 * sx2y)
             + sx2 * (sx1y * sx12 - sx11 * sx2y) AS det0,
           n * (sx1y * sx22 - sx12 * sx2y)
             - sy * (sx1 * sx22 - sx12 * sx2)
             + sx2 * (sx1 * sx2y - sx1y * sx2) AS det1,
           n * (sx11 * sx2y - sx1y * sx12)
             - sx1 * (sx1 * sx2y - sx1y * sx2)
             + sy * (sx1 * sx12 - sx11 * sx2) AS det2
    FROM {src}
)
"""

_OLS_ORACLE = (
    """
WITH feat AS (
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS x1,
           ((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7 AS x2,
           CAST(round(value * 100) AS BIGINT) AS yc
    FROM events
), mom AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x1) AS DOUBLE) AS sx1,
           CAST(sum(x2) AS DOUBLE) AS sx2,
           CAST(sum(x1 * x1) AS DOUBLE) AS sx11,
           CAST(sum(x1 * x2) AS DOUBLE) AS sx12,
           CAST(sum(x2 * x2) AS DOUBLE) AS sx22,
           CAST(sum(yc) AS DOUBLE) AS sy,
           CAST(sum(x1 * yc) AS DOUBLE) AS sx1y,
           CAST(sum(x2 * yc) AS DOUBLE) AS sx2y,
           CAST(sum(yc * yc) AS DOUBLE) AS syy
    FROM feat
)
"""
    + _OLS_DET_SELECT.format(src="mom")
)


@register("ols_value_normal_eq", oracle=_OLS_ORACLE)
def ols_value_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate OLS — value(cents) ~ hour-of-day + day-of-week +
    intercept — solved exactly by normal equations + Cramer's rule.
    The nine sufficient moments are exact integer sums; the 3x3 solve
    runs in IEEE double over the identical expression tree in both
    engines (see module note), betas rounded at 8 dp, R-squared at 6.

    Scale note: model training as ONE map-side-combinable aggregation
    — no gradient loop, no collect, shuffle of exactly one moment row
    per partition; the same pattern extends to any feature count whose
    normal matrix fits in a row (the closed-form regime; beyond ~100s
    of features switch to L-BFGS driver-side). Epoch-arithmetic
    features sidestep the Spark/DuckDB dow() convention split (the
    orders_dow_seasonality trick).
    """
    ev = load_table(spark, sf_dir, "events")
    feat = ev.select(
        ((F.unix_timestamp("ts") / F.lit(3600)).cast("long") % 24).alias("x1"),
        (((F.unix_timestamp("ts") / F.lit(86400)).cast("long") + 4) % 7).alias("x2"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    )
    mom = feat.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("sx22"),
        F.sum("yc").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("yc")).cast("double").alias("sx1y"),
        F.sum(F.col("x2") * F.col("yc")).cast("double").alias("sx2y"),
        F.sum(F.col("yc") * F.col("yc")).cast("double").alias("syy"),
    )
    # Parameterized spark.sql binds the moment DataFrame directly into
    # the query — no session-global temp view, so concurrent invocations
    # in one session cannot race on a name and nothing leaks into the
    # catalog.
    return spark.sql(_OLS_DET_SELECT.format(src="{mom}"), mom=mom)


# ---------------------------------------------------- Mahalanobis outliers

MAHA_THRESHOLD = 104.0  # ~ chi2_{64}.ppf(0.999): flag the extreme tail


_MAHA_ORACLE = f"""
WITH x AS (
    SELECT vec_id, CAST(i AS INT) AS i,
           CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS xi
    FROM embeddings
    CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i)
), st AS (
    SELECT i,
           round(CAST(sum(CAST(round(xi, 8) AS DECIMAL(28,8))) AS DOUBLE)
                 / count(*), 8) AS mean_v,
           count(*) AS n,
           CAST(sum(CAST(round(xi * xi, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sxx
    FROM x GROUP BY i
), v AS (
    SELECT i, mean_v,
           round(sxx / n - mean_v * mean_v, 8) AS var_v
    FROM st
), terms AS (
    SELECT x.vec_id,
           CAST(round((x.xi - v.mean_v) * (x.xi - v.mean_v) / v.var_v, 8)
                AS DECIMAL(28,8)) AS term
    FROM x JOIN v ON v.i = x.i
)
SELECT vec_id,
       -- round the exact DECIMAL sum, then cast: rounding the double
       -- instead hits engine-specific half-ties when the 8-dp sum ends
       -- in ..50 (25/20k vectors flipped 1 ulp at sf1)
       CAST(round(sum(term), 6) AS DOUBLE) AS maha_sq,
       (CAST(round(sum(term), 6) AS DOUBLE) > {MAHA_THRESHOLD!r}) AS is_outlier
FROM terms GROUP BY vec_id
"""


@register("mahalanobis_outliers", oracle=_MAHA_ORACLE)
def mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector squared Mahalanobis distance under the DIAGONAL
    covariance model (sum over dims of (x-mean)²/var) with a
    chi-square tail cutoff — the embedding-store outlier gate
    (corrupt encodes, wrong-modality rows, adversarial inserts) that
    runs before vectors enter the ANN index. Diagonal on purpose: the
    full-matrix distance needs the inverse covariance (driver-side
    numpy, not oracle-checkable); the diagonal form catches
    per-dimension scale anomalies and stays one scan + two keyed
    reductions at any corpus size.

    Per-dimension terms round at 8 dp then sum in decimal, so the
    score is bit-identical cross-engine.
    """
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id",
        F.posexplode(
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        ).alias("i", "xi"),
    )
    st = x.groupBy("i").agg(
        F.round(
            F.sum(F.round(F.col("xi"), 8).cast("decimal(28,8)")).cast("double")
            / F.count(F.lit(1)),
            8,
        ).alias("mean_v"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("xi") * F.col("xi"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("sxx"),
    )
    v = st.select(
        "i",
        "mean_v",
        F.round(
            F.col("sxx") / F.col("n") - F.col("mean_v") * F.col("mean_v"), 8
        ).alias("var_v"),
    )
    terms = x.join(F.broadcast(v), "i").select(
        "vec_id",
        F.round(
            (F.col("xi") - F.col("mean_v"))
            * (F.col("xi") - F.col("mean_v"))
            / F.col("var_v"),
            8,
        )
        .cast("decimal(28,8)")
        .alias("term"),
    )
    # round the exact decimal sum (HALF_UP in both engines), THEN cast
    score = F.round(F.sum("term"), 6).cast("double")
    return terms.groupBy("vec_id").agg(
        score.alias("maha_sq"),
        (score > MAHA_THRESHOLD).alias("is_outlier"),
    )
