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


@register(
    "sequence_packing",
    oracle=_PACKING_ORACLE,
    bounded_window="4096-doc_id buckets of the two-level prefix sum",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing of documents into {CTX_TOKENS}-token
    context bins: each doc starts at the running token offset of its
    predecessors (deterministic doc_id order), bin = offset div
    {CTX_TOKENS}. Docs may straddle a boundary — the attention-mask /
    EOS handling downstream deals with that, as in standard packed
    pretraining batches.

    Scale note: the running sum is the two-level bucket-parallel
    prefix sum (operators/ranks.bucketed_running_sums, buckets of 4096
    doc_ids) — per-bucket token subtotals cumulate on the tiny bucket
    table, interiors run under PARTITION BY bucket. No single-partition
    ORDER BY of the corpus anywhere (round-6 lint: the old global
    window serialized every document through one task).
    """
    from streams_prototyping_spark.operators.ranks import bucketed_running_sums

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    packed = bucketed_running_sums(
        toks,
        F.floor(F.col("doc_id") / 4096),
        [F.col("doc_id").asc()],
        {"cum_tokens": F.col("n_tokens")},
    )
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


@register(
    "token_budget_select",
    oracle=_BUDGET_ORACLE,
    bounded_window="1/64-quality-grid buckets of the two-level prefix sum",
)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection under a token budget: rank documents by quality
    (ties → doc_id) and keep the prefix whose cumulative token count
    fits {TOKEN_BUDGET} — "train on the best N tokens", the selection
    rule quality scoring exists to feed.

    Scale note: the cumulative token count over the quality-descending
    order is the two-level bucket-parallel prefix sum
    (operators/ranks.bucketed_running_sums; buckets = 6-dp quality
    score negated and coarsened to 1/64 grid so the bucket id is
    monotone along q DESC). Per-bucket subtotals cumulate on the tiny
    score-grid table; interiors run under PARTITION BY bucket — no
    single-partition global sort of the corpus (round-6 lint).

    Residual bound (ADVICE r6): the 1/64 grid is <=65 occupied buckets,
    so one bucket interior is still a single task over O(n/65) rows —
    a constant-factor improvement that removes the single-partition
    exchange, not per-task O(1). The knob is the grid density: a
    quality score concentrating mass in one 1/64 cell (or a corpus
    where n/65 outgrows a task) calls for a finer grid or a
    span-derived width.
    """
    from streams_prototyping_spark.functions.text_transform import quality_score_col
    from streams_prototyping_spark.operators.ranks import bucketed_running_sums

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        quality_score_col("text").alias("q"),
    )
    ranked = bucketed_running_sums(
        scored,
        F.floor(F.col("q") * -64),
        [F.col("q").desc(), F.col("doc_id").asc()],
        {"cum_tokens": F.col("n_tokens")},
    )
    return ranked.filter(F.col("cum_tokens") <= TOKEN_BUDGET).select(
        "doc_id", "n_tokens", "q", "cum_tokens"
    )


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


@register(
    "dataset_interleave",
    oracle=_INTERLEAVE_ORACLE,
    bounded_window="unit sched_key buckets of the two-level prefix sum",
)
def dataset_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted interleave: each source's documents are
    spaced along a global schedule at intervals of 1/weight (weight =
    sqrt(source size) — the sub-linear upsampling every mixture recipe
    applies), so a sequential reader sees sources blended in
    proportion instead of concatenated — the actual data-loader
    ordering that domain_mixture_weights' ratios get compiled into.

    Scale note: per-source ranks are one keyed window; the global
    position over the schedule key is a two-level bucket-parallel
    running COUNT (operators/ranks.bucketed_running_sums with a lit(1)
    measure, buckets = floor(sched_key): O(sqrt(largest source))
    buckets) — emitting the total order never single-partitions the
    corpus (round-6 lint).
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
    from streams_prototyping_spark.operators.ranks import bucketed_running_sums

    pos = bucketed_running_sums(
        keyed,
        F.floor(F.col("sched_key")),
        [F.col("sched_key").asc(), F.col("source").asc(), F.col("doc_id").asc()],
        {"global_pos": F.lit(1)},
    )
    return pos.select(
        "doc_id",
        "source",
        "src_rank",
        "sched_key",
        F.col("global_pos").cast("long").alias("global_pos"),
    )
