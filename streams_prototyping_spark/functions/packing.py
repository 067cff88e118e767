"""Sequence packing and budgeted selection — the last-mile batch prep
between a curated corpus and a training run.

- sequence_packing: assign documents to fixed-size context-window bins
  by a running token count over a deterministic order (the SQL
  formulation of greedy sequential packing: bin = floor(cumsum/CTX)).
  Real packers also split oversize docs — that is doc_chunking's job
  upstream; this operator packs the (bounded-size) chunks/docs.
- token_budget_select: keep the highest-quality documents until a
  global token budget is exhausted — data selection under a compute
  budget, the decision rule behind "train on the best N tokens".

Both are single window-function passes with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.functions.text import _STOP_LIST_SQL
from streams_prototyping_spark.registry import register

CTX_TOKENS = 512       # context window size (words here; tokens in prod)
TOKEN_BUDGET = 10_000  # global training-token budget for the selector

_PACKING_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
), packed AS (
    SELECT doc_id, n_tokens,
           sum(n_tokens) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
    FROM toks
)
SELECT doc_id, n_tokens,
       CAST(floor((cum_tokens - n_tokens) / {CTX_TOKENS}) AS BIGINT) AS bin_id,
       CAST(cum_tokens - n_tokens
            - floor((cum_tokens - n_tokens) / {CTX_TOKENS}) * {CTX_TOKENS} AS BIGINT)
           AS offset_in_bin
FROM packed
"""


@register("sequence_packing", oracle=_PACKING_ORACLE)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing of documents into {CTX_TOKENS}-token
    context bins: each doc starts at the running token offset of its
    predecessors (deterministic doc_id order), bin = offset div
    {CTX_TOKENS}. Docs may straddle a boundary — the attention-mask /
    EOS handling downstream deals with that, as in standard packed
    pretraining batches.

    Scale note: one running-sum window. A single global ORDER BY is the
    textbook scale trap — production packs per shard
    (partitionBy(split/shard)), which this plan becomes by adding the
    shard to the window spec; Spark executes the global form as one
    range-partitioned sort, which is still a single shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    start = F.col("cum_tokens") - F.col("n_tokens")
    return packed.select(
        "doc_id",
        "n_tokens",
        F.floor(start / CTX_TOKENS).cast("long").alias("bin_id"),
        (start - F.floor(start / CTX_TOKENS) * CTX_TOKENS).cast("long").alias(
            "offset_in_bin"
        ),
    )


_BUDGET_ORACLE = f"""
WITH scored AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           round(0.4 * (CASE WHEN len(string_split(text, ' ')) >= 100 THEN 1.0
                             ELSE CAST(len(string_split(text, ' ')) AS DOUBLE) / 100 END)
               + 0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                        / len(string_split(text, ' ')))
               + 0.2 * (CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN ({_STOP_LIST_SQL}))) AS DOUBLE)
                        / len(string_split(text, ' '))), 6) AS q
    FROM documents
), ranked AS (
    SELECT doc_id, n_tokens, q,
           sum(n_tokens) OVER (ORDER BY q DESC, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
    FROM scored
)
SELECT doc_id, n_tokens, q, cum_tokens
FROM ranked WHERE cum_tokens <= {TOKEN_BUDGET}
"""


@register("token_budget_select", oracle=_BUDGET_ORACLE)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection under a token budget: rank documents by quality
    (ties → doc_id) and keep the prefix whose cumulative token count
    fits {TOKEN_BUDGET} — "train on the best N tokens", the selection
    rule quality scoring exists to feed.

    Scale note: same single running-sum window as sequence_packing; at
    corpus scale the exact global rank is replaced by a quality-score
    histogram cutoff (two scans, no global sort) — the window form is
    the specification the histogram approximation is checked against.
    """
    from streams_prototyping_spark.functions.text_transform import quality_score_col

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        quality_score_col("text").alias("q"),
    )
    w = Window.orderBy(F.col("q").desc(), "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return ranked.filter(F.col("cum_tokens") <= TOKEN_BUDGET)
