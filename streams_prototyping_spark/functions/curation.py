"""Dataset curation operators: benchmark decontamination and domain
mixture weighting — the two curation decisions every LLM training run
makes after dedup and quality filtering.

- decontamination_overlap: training documents that share winnowing
  fingerprints with a held-out evaluation set (here: source = 'src0'
  stands in for the benchmark corpus). The standard n-gram-collision
  contamination check (GPT-3 appendix C / PaLM-style 8-gram overlap),
  done as a keyed join on the winnowing index — never a document
  cross product.
- domain_mixture_weights: per-source corpus statistics and
  temperature-scaled sampling weights w_s ∝ share_s^ALPHA (the
  mixture-flattening rule used to up-weight small domains when
  composing a training mix).

Both are exact DuckDB-oracled; the fingerprint index is the shared
cached stage from dedup_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.functions.dedup_pipeline import (
    _GRAMS_DUCK,
    WINNOW_W,
    winnow_fps_df,
)
from streams_prototyping_spark.registry import register

EVAL_SOURCE = "src0"   # held-out "benchmark" corpus
MIN_SHARED_FPS = 2     # 1 shared fingerprint = a common phrase; >=2 = overlap

_WINNOW_FPS_CTE = f"""
hashed AS (
    SELECT doc_id, source,
           list_transform({_GRAMS_DUCK}, s ->
               CAST('0x' || substr(md5('win:' || s), 1, 15) AS BIGINT)) AS hashes
    FROM documents
), fps AS (
    SELECT doc_id, source, unnest(list_distinct(list_transform(
               range(1, greatest(len(hashes) - {WINNOW_W} + 1, 1) + 1),
               i -> list_min(hashes[i:i+{WINNOW_W - 1}])))) AS fingerprint
    FROM hashed
)
"""

_DECONTAM_ORACLE = f"""
WITH {_WINNOW_FPS_CTE}
SELECT t.doc_id AS train_doc_id,
       e.doc_id AS eval_doc_id,
       count(*) AS n_shared_fps
FROM fps t JOIN fps e ON e.fingerprint = t.fingerprint
WHERE t.source <> '{EVAL_SOURCE}' AND e.source = '{EVAL_SOURCE}'
GROUP BY t.doc_id, e.doc_id
HAVING count(*) >= {MIN_SHARED_FPS}
"""


@register("decontamination_overlap", oracle=_DECONTAM_ORACLE)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination check: (train doc, eval doc) pairs
    sharing >= {MIN_SHARED_FPS} winnowing fingerprints, i.e. at least
    two independent {WINNOW_W + 2}-word runs in common with the
    held-out '{EVAL_SOURCE}' corpus. Flagged training docs get dropped
    (or the shared spans get masked) before training.

    Scale note: the join is keyed on fingerprint — cost is
    O(index collisions), never O(train x eval). The eval side's index
    is tiny (benchmarks are small) and broadcasts; fingerprints that
    are corpus-wide stopword phrases can be capped by document
    frequency exactly like tfidf's df side if a real corpus makes any
    single fingerprint hot.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    fps = winnow_fps_df(spark, sf_dir).join(docs, "doc_id")
    train = fps.filter(F.col("source") != EVAL_SOURCE).select(
        F.col("doc_id").alias("train_doc_id"), "fingerprint"
    )
    ev = fps.filter(F.col("source") == EVAL_SOURCE).select(
        F.col("doc_id").alias("eval_doc_id"), "fingerprint"
    )
    return (
        train.join(F.broadcast(ev), "fingerprint")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= MIN_SHARED_FPS)
    )


# --------------------------------------------------- mixture weights

ALPHA = 0.7  # mixture temperature: w ∝ share^alpha (flattens head domains)

_MIXTURE_ORACLE = f"""
WITH per_source AS (
    SELECT source,
           count(*) AS n_docs,
           sum(len(string_split(text, ' '))) AS n_tokens
    FROM documents GROUP BY source
), shares AS (
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS token_share
    FROM per_source
)
SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(token_share, 6) AS token_share,
       round(pow(token_share, {ALPHA}) / sum(pow(token_share, {ALPHA})) OVER (), 6)
           AS mixture_weight
FROM shares
"""


@register(
    "domain_mixture_weights",
    oracle=_MIXTURE_ORACLE,
    bounded_window="document sources",
)
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix composition: per-source doc/token counts, raw token
    share, and temperature-scaled sampling weight
    w_s = share_s^{ALPHA} / sum(share^{ALPHA}) — the standard rule for
    up-weighting small high-quality domains in the final mixture.

    Scale note: one partial-agg shuffle keyed by source (domain count
    is tiny), then two window totals over the domain-count-sized
    aggregate — the corpus is scanned once, everything after fits on
    one executor regardless of data size.
    """
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    shares = per_source.select(
        "source", "n_docs", "n_tokens", share.alias("token_share")
    )
    weight = F.pow("token_share", ALPHA) / F.sum(F.pow("token_share", ALPHA)).over(w)
    return shares.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("token_share", 6).alias("token_share"),
        weight.alias("w_raw"),
    ).select(
        "source",
        "n_docs",
        "n_tokens",
        "token_share",
        F.round("w_raw", 6).alias("mixture_weight"),
    )


# ------------------------------------------- end-to-end curation select

# The per-doc keep/drop decision a curation run actually materializes:
# every document tagged with the FIRST pipeline stage that rejects it
# (stage order mirrors a real pipeline: holdout isolation -> cheap
# quality gate -> normalized exact dedup among survivors -> benchmark
# decontamination). Composes the already-oracled building blocks —
# single-sourced on both engines (the oracle embeds the component
# oracles as subqueries).

from streams_prototyping_spark.functions.corpus_stats import (  # noqa: E402
    _GOPHER_ORACLE,
    gopher_features_df,
)
from streams_prototyping_spark.functions.text_transform import (  # noqa: E402
    _NORMALIZE_ORACLE,
    text_normalize,
)

_SELECT_REASON_SQL = f"""
CASE WHEN source = '{EVAL_SOURCE}' THEN 'eval_holdout'
     WHEN NOT passes THEN 'quality'
     WHEN doc_id <> min_keep THEN 'duplicate'
     WHEN contaminated THEN 'contaminated'
     ELSE 'kept' END
"""

_PIPELINE_SELECT_ORACLE = f"""
WITH base AS (
    SELECT d.doc_id, d.source, g.passes, n.norm_md5
    FROM documents d
    JOIN ({_GOPHER_ORACLE}) g ON g.doc_id = d.doc_id
    JOIN ({_NORMALIZE_ORACLE}) n ON n.doc_id = d.doc_id
), contam AS (
    SELECT DISTINCT train_doc_id AS doc_id FROM ({_DECONTAM_ORACLE})
), flagged AS (
    SELECT b.doc_id, b.source, b.passes,
           (c.doc_id IS NOT NULL) AS contaminated,
           min(CASE WHEN b.source <> '{EVAL_SOURCE}' AND b.passes
                    THEN b.doc_id END)
               OVER (PARTITION BY b.norm_md5) AS min_keep
    FROM base b LEFT JOIN contam c ON c.doc_id = b.doc_id
)
SELECT doc_id,
       {_SELECT_REASON_SQL} AS reason,
       ({_SELECT_REASON_SQL} = 'kept') AS keep
FROM flagged
"""


@register("curation_pipeline_select", oracle=_PIPELINE_SELECT_ORACLE)
def curation_pipeline_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final corpus selection: per-document keep/drop verdict with the
    first rejecting stage as the reason (eval_holdout | quality |
    duplicate | contaminated | kept). Duplicate resolution keeps the
    lowest doc_id among QUALITY-PASSING members of each normalized
    content group — rejected docs cannot claim survivorship.

    Scale note: composes the registered building blocks by doc-keyed
    joins for single-sourcing; a production pipeline fuses the quality
    and normalization projections into one scan pass (they are
    independent narrow columns — see gopher_quality_filter /
    text_normalize plans), keeps the dedup window as one hash-keyed
    shuffle on norm_md5, and broadcasts the contaminated-id set (it is
    bounded by the benchmark corpus size).
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    g = gopher_features_df(spark, sf_dir).select("doc_id", "passes")
    n = text_normalize(spark, sf_dir).select("doc_id", "norm_md5")
    contam = (
        decontamination_overlap(spark, sf_dir)
        .select(F.col("train_doc_id").alias("doc_id"))
        .distinct()
        .withColumn("contaminated_flag", F.lit(True))
    )
    base = (
        d.join(g, "doc_id")
        .join(n, "doc_id")
        .join(F.broadcast(contam), "doc_id", "left")
    )
    win = Window.partitionBy("norm_md5")
    candidate = (F.col("source") != EVAL_SOURCE) & F.col("passes")
    min_keep = F.min(F.when(candidate, F.col("doc_id"))).over(win)
    reason = (
        F.when(F.col("source") == EVAL_SOURCE, "eval_holdout")
        .when(~F.col("passes"), "quality")
        .when(F.col("doc_id") != F.col("min_keep"), "duplicate")
        .when(F.coalesce(F.col("contaminated_flag"), F.lit(False)), "contaminated")
        .otherwise("kept")
    )
    return (
        base.withColumn("min_keep", min_keep)
        .withColumn("reason", reason)
        .select("doc_id", "reason", (F.col("reason") == "kept").alias("keep"))
    )


# --------------------------------------------------- per-source audit

from streams_prototyping_spark.functions.corpus_stats import (  # noqa: E402
    _BOILER_ORACLE,
    _UNIGRAM_ORACLE,
    boiler_features_df,
    unigram_features_df,
)
from streams_prototyping_spark.functions.text import (  # noqa: E402
    _QUALITY_ORACLE,
    quality_score,
)

_SOURCE_REPORT_ORACLE = f"""
WITH q AS (SELECT doc_id, quality_score FROM ({_QUALITY_ORACLE})),
g AS (SELECT doc_id, passes FROM ({_GOPHER_ORACLE})),
u AS (SELECT doc_id, mean_nll FROM ({_UNIGRAM_ORACLE})),
b AS (SELECT doc_id, boiler_frac FROM ({_BOILER_ORACLE}))
SELECT d.source,
       count(*) AS n_docs,
       round(CAST(sum(CASE WHEN g.passes THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS gopher_pass_rate,
       round(CAST(sum(CAST(q.quality_score AS DECIMAL(25,6))) AS DOUBLE)
             / count(*), 6) AS mean_quality,
       round(CAST(sum(CAST(u.mean_nll AS DECIMAL(25,6))) AS DOUBLE)
             / count(*), 6) AS mean_doc_nll,
       round(CAST(sum(CAST(b.boiler_frac AS DECIMAL(25,6))) AS DOUBLE)
             / count(*), 6) AS mean_boiler_frac
FROM documents d
JOIN q ON q.doc_id = d.doc_id
JOIN g ON g.doc_id = d.doc_id
JOIN u ON u.doc_id = d.doc_id
JOIN b ON b.doc_id = d.doc_id
GROUP BY d.source
"""


@register("source_quality_report", oracle=_SOURCE_REPORT_ORACLE)
def source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: doc counts, Gopher pass rate,
    mean quality score, mean unigram NLL and mean boilerplate fraction
    — the audit table a pipeline owner reads before adjusting mixture
    weights or thresholds.

    Scale note: per-doc features are narrow projections (or
    already-keyed aggregates) joined on doc_id, then one source-keyed
    partial-combined aggregation; per-doc doubles are pre-rounded, so
    the decimal sums make the report deterministic across engines and
    partitionings. Output is domain-count sized.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    q = quality_score(spark, sf_dir).select("doc_id", "quality_score")
    g = gopher_features_df(spark, sf_dir).select("doc_id", "passes")
    u = unigram_features_df(spark, sf_dir).select("doc_id", "mean_nll")
    b = boiler_features_df(spark, sf_dir).select("doc_id", "boiler_frac")

    def dmean(col: str):
        return F.round(
            F.sum(F.col(col).cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        )

    return (
        d.join(q, "doc_id")
        .join(g, "doc_id")
        .join(u, "doc_id")
        .join(b, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.when(F.col("passes"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("gopher_pass_rate"),
            dmean("quality_score").alias("mean_quality"),
            dmean("mean_nll").alias("mean_doc_nll"),
            dmean("boiler_frac").alias("mean_boiler_frac"),
        )
    )


# ------------------------------------------------- per-source hard doc cap

SOURCE_CAP = 256  # max documents kept per source (quality-ranked)

_CAP_ORACLE = f"""
WITH q AS (SELECT doc_id, quality_score FROM ({{quality}})),
ranked AS (
    SELECT d.doc_id, d.source, q.quality_score AS quality,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY q.quality_score DESC, d.doc_id) AS rnk
    FROM documents d JOIN q USING (doc_id)
)
SELECT doc_id, source, quality, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {SOURCE_CAP}
"""


def _cap_oracle() -> str:
    from streams_prototyping_spark.functions.text import _QUALITY_ORACLE

    return _CAP_ORACLE.format(quality=_QUALITY_ORACLE)


@register("source_doc_cap", oracle=_cap_oracle())
def source_doc_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: keep at most {SOURCE_CAP} documents per
    source, ranked by quality (ties -> doc_id) — the C4-style per-host
    frequency cap that stops any single domain from dominating the
    training mix. Complements quota_sample_per_source (sqrt-
    proportional BUDGETS chosen uniformly) with the other standard
    shape: a HARD ceiling choosing the BEST documents.

    Scale design: the rank is a source-partitioned window with a
    LITERAL bound, so Catalyst rewrites it to WindowGroupLimit —
    every task pre-prunes to its local top {SOURCE_CAP} per source
    BEFORE the shuffle; shuffle volume is O(sources x {SOURCE_CAP}),
    never corpus-sized. No global sort, no single-partition window.
    """
    from streams_prototyping_spark.functions.text_transform import quality_score_col
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", quality_score_col("text").alias("quality")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        scored.select(
            "doc_id", "source", "quality", F.row_number().over(w).alias("rnk")
        )
        .filter(F.col("rnk") <= SOURCE_CAP)
        .select("doc_id", "source", "quality", F.col("rnk").cast("long").alias("rnk"))
    )


# -------------------------------------------- per-source token budget cap

SOURCE_TOKEN_BUDGET = 600  # max training tokens admitted per source

_TOKEN_CAP_ORACLE = f"""
WITH q AS (SELECT doc_id, quality_score FROM ({{quality}})),
toks AS (
    SELECT d.doc_id, d.source,
           len(string_split(d.text, ' ')) AS n_tokens,
           q.quality_score AS quality
    FROM documents d JOIN q USING (doc_id)
),
summed AS (
    SELECT doc_id, source, n_tokens, quality,
           sum(n_tokens) OVER (PARTITION BY source
                               ORDER BY quality DESC, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum_tokens
    FROM toks
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, quality,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM summed WHERE cum_tokens <= {SOURCE_TOKEN_BUDGET}
"""


def _token_cap_oracle() -> str:
    from streams_prototyping_spark.functions.text import _QUALITY_ORACLE

    return _TOKEN_CAP_ORACLE.format(quality=_QUALITY_ORACLE)


@register("source_token_cap", oracle=_token_cap_oracle())
def source_token_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN budget: admit each source's documents in
    quality order (ties -> doc_id) while the source's cumulative token
    count stays within {SOURCE_TOKEN_BUDGET} — the unit a training-data
    loader actually budgets (source_doc_cap's twin: docs bound the
    CARDINALITY a domain contributes, this bounds its gradient SHARE).
    The admitted set is a PREFIX of the quality ranking (cum_tokens is
    monotone along the order), so the decision is deterministic and the
    streaming twin (token_cap_admission_stream) can reproduce it with
    one counter per source.

    Scale design: one corpus-sized shuffle keyed by source (inherent:
    per-source token totals need the source's rows together), then a
    source-PARTITIONED running sum — no empty-partition window, no
    global sort. Skewed sources are AQE's skew-split case; the output
    is bounded at O(sources x budget/avg_doc_tokens) rows.
    """
    from streams_prototyping_spark.functions.text_transform import quality_score_col
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        quality_score_col("text").alias("quality"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.select(
            "doc_id",
            "source",
            "n_tokens",
            "quality",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= SOURCE_TOKEN_BUDGET)
    )
