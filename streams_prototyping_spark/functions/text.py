"""Text-analysis operators over the documents table.

Language-ID (stopword-ratio heuristic), quality scoring, token
counting (whitespace + regex "BPE-ish" pre-tokenizer), and document
fingerprinting. Everything is a JVM-side Catalyst expression (split /
higher-order array functions / regexp) — no Python in the row path, so
these run at full scan speed over 100 TB and every one has an exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.functions.portable_hash import (
    portable_hash64,
    portable_hash64_sql,
)
from streams_prototyping_spark.registry import register

# ------------------------------------------------------------------ tokens

# Non-capturing BPE-ish pre-tokenizer: letter runs, digit runs, single
# other non-space chars. Same regex semantics (greedy, non-overlapping,
# left-to-right) in Java regex and RE2.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

_TOKEN_ORACLE = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
       length(text) AS n_chars_calc,
       CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS n_tokens,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS avg_word_len
FROM documents
"""


@register("token_stats", oracle=_TOKEN_ORACLE)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace words, distinct words, chars, regex
    pre-tokenizer count, average word length."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct_words"),
        F.length("text").cast("long").alias("n_chars_calc"),
        F.regexp_count("text", F.lit(TOKEN_REGEX)).cast("long").alias("n_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(words),
            6,
        ).alias("avg_word_len"),
    )


# ------------------------------------------------------------------ lang id

# n-gram/stopword-ratio heuristic. The testdata vocabulary is synthetic
# English-ish for every lang label, so the POINT here is the portable,
# deterministic classifier shape, not label recovery.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

LANG_EN_MIN = 0.10      # stopword ratio thresholds (one home; eval reuses)
LANG_ENLIKE_MIN = 0.03

_LANG_ORACLE = f"""
WITH w AS (
    SELECT doc_id, lang AS labeled_lang, string_split(text, ' ') AS words FROM documents
), scored AS (
    SELECT doc_id, labeled_lang,
           CAST(len(list_filter(words, x -> x IN ({_STOP_LIST_SQL}))) AS DOUBLE)
               / len(words) AS stop_ratio
    FROM w
)
SELECT doc_id, labeled_lang,
       round(stop_ratio, 6) AS stop_ratio,
       CASE WHEN stop_ratio >= {LANG_EN_MIN} THEN 'en'
            WHEN stop_ratio >= {LANG_ENLIKE_MIN} THEN 'en-like'
            ELSE 'unknown' END AS predicted_lang
FROM scored
"""


@register("lang_id_heuristic", oracle=_LANG_ORACLE)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English stopword ratio -> 3-way class.
    (A real system scores per-language stopword/character-n-gram sets
    the same way — one filter+ratio per language, still one scan.)"""
    d = load_table(spark, sf_dir, "documents")
    stop_ratio = F.size(
        F.filter(
            F.split("text", " "),
            lambda x: x.isin(*EN_STOPWORDS),
        )
    ).cast("double") / F.size(F.split("text", " "))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.when(stop_ratio >= LANG_EN_MIN, "en")
        .when(stop_ratio >= LANG_ENLIKE_MIN, "en-like")
        .otherwise("unknown")
        .alias("predicted_lang"),
    )


# ------------------------------------------------------------- quality score

_QUALITY_ORACLE = f"""
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words, text FROM documents
), feat AS (
    SELECT doc_id,
           len(words) AS n_words,
           CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS distinct_ratio,
           CAST(len(list_filter(words, x -> x IN ({_STOP_LIST_SQL}))) AS DOUBLE)
               / len(words) AS stop_ratio,
           CASE WHEN len(words) >= 100 THEN 1.0
                ELSE CAST(len(words) AS DOUBLE) / 100 END AS length_score
    FROM w
)
SELECT doc_id, n_words,
       round(distinct_ratio, 6) AS distinct_ratio,
       round(stop_ratio, 6) AS stop_ratio,
       round(0.4 * length_score + 0.4 * distinct_ratio + 0.2 * stop_ratio, 6)
           AS quality_score
FROM feat
"""


@register("quality_score", oracle=_QUALITY_ORACLE)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length saturation + lexical diversity
    + stopword ratio, combined into one [0,1] score — the standard
    cheap pre-filter before expensive model-based quality scoring."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    distinct_ratio = F.size(F.array_distinct(words)).cast("double") / n_words
    stop_ratio = (
        F.size(F.filter(words, lambda x: x.isin(*EN_STOPWORDS))).cast("double") / n_words
    )
    length_score = F.when(n_words >= 100, F.lit(1.0)).otherwise(
        n_words.cast("double") / 100
    )
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(
            0.4 * length_score + 0.4 * distinct_ratio + 0.2 * stop_ratio, 6
        ).alias("quality_score"),
    )


# -------------------------------------------------------------- fingerprint

_FINGERPRINT_ORACLE = f"""
SELECT doc_id,
       {portable_hash64_sql('text')} AS content_hash,
       {portable_hash64_sql("array_to_string((string_split(text, ' '))[1:8], ' ')")} AS prefix_hash,
       length(text) AS n_chars_calc
FROM documents
"""


@register("doc_fingerprint", oracle=_FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-content hash + 8-word-prefix hash
    (the rolling-hash/winnowing building block; combined with the
    MinHash/SimHash sketches in dedup.py this is the fingerprint set a
    crawl pipeline indexes on)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        portable_hash64(F.col("text")).alias("content_hash"),
        portable_hash64(
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8))
        ).alias("prefix_hash"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


# ------------------------------------------------------------- chunking

CHUNK_SIZE = 64   # words per chunk
CHUNK_STRIDE = 48  # overlap = size - stride = 16 words

_CHUNK_ORACLE = f"""
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
), keyed AS (
    SELECT doc_id, words,
           CAST(unnest(range(0, greatest(CAST(ceil(len(words) / {CHUNK_STRIDE}.0) AS BIGINT), 1))) AS BIGINT) AS chunk_id
    FROM w
), chunks AS (
    SELECT doc_id, chunk_id,
           array_to_string(words[(chunk_id * {CHUNK_STRIDE} + 1):(chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE})], ' ') AS chunk_text
    FROM keyed
)
SELECT doc_id, chunk_id, chunk_text,
       len(string_split(chunk_text, ' ')) AS chunk_words
FROM chunks
"""


@register("doc_chunking", oracle=_CHUNK_ORACLE)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking ({CHUNK_SIZE}-word chunks,
    {CHUNK_SIZE - CHUNK_STRIDE}-word overlap) — the context-window prep
    step of every LLM training pipeline.

    Scale note: chunking is a generator explode (no shuffle) pipelined
    into whatever writes the chunks; output row count is
    len/stride per doc, bounded per-row, so memory stays flat.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    # chunk k covers words [k*stride, k*stride + size); k while start < len
    chunks = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(
                F.ceil((F.size(words)) / CHUNK_STRIDE).cast("int") - 1, F.lit(0)
            ),
        ),
        lambda k: F.struct(
            k.cast("long").alias("chunk_id"),
            F.concat_ws(
                " ", F.slice(words, k * CHUNK_STRIDE + 1, CHUNK_SIZE)
            ).alias("chunk_text"),
        ),
    )
    return (
        d.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
        .withColumn("chunk_words", F.size(F.split("chunk_text", " ")).cast("long"))
    )


# ----------------------------------------------------------- train/val split

_SPLIT_ORACLE = f"""
SELECT doc_id,
       CASE WHEN {portable_hash64_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90
            THEN 'train' ELSE 'val' END AS split
FROM documents
"""


@register("dataset_split", oracle=_SPLIT_ORACLE)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/val split by content-stable hash —
    the reproducible alternative to RNG sampling: the assignment is a
    pure function of doc_id, so reruns, backfills and incremental
    arrivals land in the same split."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        portable_hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    )
    return d.select(
        "doc_id",
        F.when(bucket < 90, "train").otherwise("val").alias("split"),
    )
