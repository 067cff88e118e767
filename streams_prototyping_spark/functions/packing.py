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


# ----------------------------------------------- deterministic epoch order

N_EPOCHS = 3

_EPOCH_ORACLE = f"""
WITH e AS (
    SELECT doc_id, CAST(unnest(range(0, {N_EPOCHS})) AS BIGINT) AS epoch
    FROM documents
)
SELECT doc_id, epoch,
       CAST(row_number() OVER (
           PARTITION BY epoch
           ORDER BY md5('epoch' || epoch || ':' || doc_id), doc_id
       ) AS BIGINT) AS position
FROM e
"""


@register("epoch_shuffle_order", oracle=_EPOCH_ORACLE)
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-epoch training order: each epoch permutes the
    corpus by md5('epoch{{e}}:' || doc_id) — a different but fully
    deterministic shuffle per epoch, so a crashed run resumes on the
    exact same order without shipping any RNG state (the data-loader
    contract every reproducible training setup needs).

    Scale note: the sort key is computed scan-side; at production scale
    the global row_number becomes a sort on the hash key (total order
    is inherent to the contract) executed once per epoch and written
    out — or, cheaper, consumers range-partition directly on the hash
    key and skip materializing positions entirely.
    """
    d = load_table(spark, sf_dir, "documents")
    e = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_EPOCHS - 1))).alias("epoch"),
    ).select("doc_id", F.col("epoch").cast("long").alias("epoch"))
    key = F.md5(
        F.concat(F.lit("epoch"), F.col("epoch"), F.lit(":"), F.col("doc_id"))
    )
    w = Window.partitionBy("epoch").orderBy(key, F.col("doc_id"))
    return e.select(
        "doc_id", "epoch", F.row_number().over(w).cast("long").alias("position")
    )


# ----------------------------------------------- weighted source interleave

_INTERLEAVE_ORACLE = """
WITH w AS (
    SELECT source, round(sqrt(count(*)), 6) AS weight FROM documents GROUP BY source
), ranked AS (
    SELECT d.doc_id, d.source, w.weight,
           CAST(row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id)
                AS BIGINT) AS src_rank
    FROM documents d JOIN w ON w.source = d.source
), keyed AS (
    SELECT doc_id, source, src_rank,
           round(src_rank / weight, 6) AS sched_key
    FROM ranked
)
SELECT doc_id, source, src_rank, sched_key,
       CAST(row_number() OVER (ORDER BY sched_key, source, doc_id) AS BIGINT)
           AS global_pos
FROM keyed
"""


@register("dataset_interleave", oracle=_INTERLEAVE_ORACLE)
def dataset_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted interleave: each source's documents are
    spaced along a global schedule at intervals of 1/weight (weight =
    sqrt(source size) — the sub-linear upsampling every mixture recipe
    applies), so a sequential reader sees sources blended in
    proportion instead of concatenated — the actual data-loader
    ordering that domain_mixture_weights' ratios get compiled into.

    Scale note: per-source ranks are one keyed window; the global
    order is a sort on the schedule key (inherent to emitting a total
    order — production writes it once per mixture revision, or
    range-partitions consumers on sched_key).
    """
    d = load_table(spark, sf_dir, "documents")
    wt = d.groupBy("source").agg(
        F.round(F.sqrt(F.count("*")), 6).alias("weight")
    )
    ranked = d.join(F.broadcast(wt), "source").select(
        "doc_id",
        "source",
        "weight",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("doc_id"))
        .cast("long")
        .alias("src_rank"),
    )
    keyed = ranked.select(
        "doc_id",
        "source",
        "src_rank",
        F.round(F.col("src_rank") / F.col("weight"), 6).alias("sched_key"),
    )
    return keyed.select(
        "doc_id",
        "source",
        "src_rank",
        "sched_key",
        F.row_number()
        .over(Window.orderBy("sched_key", "source", "doc_id"))
        .cast("long")
        .alias("global_pos"),
    )
