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


@register("domain_mixture_weights", oracle=_MIXTURE_ORACLE)
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
