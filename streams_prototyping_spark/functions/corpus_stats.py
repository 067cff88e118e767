"""Corpus-frequency text operators: boilerplate detection, Gopher-style
rule filtering, and unigram-LM importance scoring.

These are the cross-document statistics a training-data pipeline
computes between dedup and mixing:

- boilerplate_phrases: phrases (trigrams) that recur across >= K
  distinct documents are boilerplate (nav bars, license headers,
  template text); each document is scored by the fraction of its
  trigrams that are boilerplate. This is the n-gram analogue of
  CCNet/RefinedWeb line-level dedup (the synthetic corpus has no line
  structure, so the phrase is the repeated unit).
- gopher_quality_filter: the per-rule boolean breakdown of the
  Gopher/MassiveText heuristic filters (word count bounds, mean word
  length, stopword evidence, max word length, top-word concentration).
  Per-rule booleans (not just the final verdict) are what a pipeline
  audits when tuning thresholds.
- unigram_logprob: per-document mean negative log-likelihood under the
  corpus's own unigram LM — the cheap importance/perplexity-style
  score (CCNet uses a KenLM; the unigram version is the same plan
  shape: frequency table join + per-doc aggregate).

Reference parity note: the reference repo (apurvam/streams-prototyping)
has no text operators; these extend the engine for the LLM-pipeline
mandate (SURVEY.md Part C''). Trigram construction is shared with
winnowing/decontamination via dedup_pipeline._GRAMS_* so every
operator agrees on what a trigram is.

Scale design (100 TB): boilerplate is two keyed aggregations over the
exploded trigram stream (map-side partial combine applies to both) and
one shuffle join back on gram; the doc-frequency threshold shrinks the
boilerplate side by ~10x before the join, and at production scale that
side is still millions of rows -> keyed shuffle join (AQE may elect to
broadcast it; we do not force it). unigram_logprob's frequency table
is top-V truncatable and explicitly broadcast (a real vocab fits in
one executor); the per-doc aggregate is a keyed partial-combine
aggregation. gopher_quality_filter is a pure narrow projection at scan
speed — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.functions.dedup_pipeline import (
    _GRAMS_DUCK,
    _GRAMS_SPARK,
)
from streams_prototyping_spark.functions.text import EN_STOPWORDS, _STOP_LIST_SQL
from streams_prototyping_spark.registry import register

# ----------------------------------------------------------- boilerplate

BOILER_MIN_DOCS = 3  # trigram in >= 3 distinct docs => boilerplate

_BOILER_ORACLE = f"""
WITH g AS (
    SELECT doc_id, unnest({_GRAMS_DUCK}) AS gram FROM documents
), b AS (
    SELECT gram FROM g GROUP BY gram
    HAVING count(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
)
SELECT g.doc_id,
       count(*) AS n_grams,
       sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler_grams,
       round(CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS boiler_frac
FROM g LEFT JOIN b ON b.gram = g.gram
GROUP BY g.doc_id
"""


@register("boilerplate_phrases", oracle=_BOILER_ORACLE)
def boilerplate_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus boilerplate detection: a trigram occurring in >=
    {BOILER_MIN_DOCS} distinct documents is boilerplate; each document
    reports how much of it is boilerplate.

    Scale note: both aggregations partial-combine map-side (distinct
    doc-per-gram first, then gram counts); the join back is keyed on
    gram — never a document cross product — and the >= K threshold
    shrinks the right side an order of magnitude before the join.
    """
    d = load_table(spark, sf_dir, "documents")
    grams = d.select("doc_id", F.explode(F.expr(_GRAMS_SPARK)).alias("gram"))
    boiler = (
        grams.distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= BOILER_MIN_DOCS)
        .select("gram", F.lit(1).alias("is_boiler"))
    )
    return (
        grams.join(boiler, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).alias("n_boiler_grams"),
            F.round(
                F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).cast("double")
                / F.count("*"),
                6,
            ).alias("boiler_frac"),
        )
    )


# -------------------------------------------------------- gopher filter

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MIN_STOPWORDS = 2     # distinct stopwords present
GOPHER_MAX_WORD_LEN = 20
GOPHER_MAX_TOP_WORD_FRAC = 0.12

_GOPHER_ORACLE = f"""
WITH w AS (
    SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
), feat AS (
    SELECT doc_id,
           len(words) AS n_words,
           CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(words) AS mean_wlen,
           len(list_filter(list_distinct(words), x -> x IN ({_STOP_LIST_SQL})))
               AS n_stopwords,
           list_max(list_transform(words, x -> length(x))) AS max_wlen,
           CAST(list_max(list_transform(list_distinct(words),
                    w2 -> len(list_filter(words, x -> x = w2)))) AS DOUBLE)
               / len(words) AS top_word_frac
    FROM w
)
SELECT doc_id, n_words,
       round(mean_wlen, 6) AS mean_wlen,
       CAST(n_stopwords AS BIGINT) AS n_stopwords,
       CAST(max_wlen AS BIGINT) AS max_wlen,
       round(top_word_frac, 6) AS top_word_frac,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}) AS r_word_count,
       (mean_wlen BETWEEN {GOPHER_MIN_MEAN_WLEN} AND {GOPHER_MAX_MEAN_WLEN})
           AS r_mean_wlen,
       (n_stopwords >= {GOPHER_MIN_STOPWORDS}) AS r_stopwords,
       (max_wlen <= {GOPHER_MAX_WORD_LEN}) AS r_max_wlen,
       (top_word_frac <= {GOPHER_MAX_TOP_WORD_FRAC}) AS r_top_word,
       ((n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
        AND (mean_wlen BETWEEN {GOPHER_MIN_MEAN_WLEN} AND {GOPHER_MAX_MEAN_WLEN})
        AND (n_stopwords >= {GOPHER_MIN_STOPWORDS})
        AND (max_wlen <= {GOPHER_MAX_WORD_LEN})
        AND (top_word_frac <= {GOPHER_MAX_TOP_WORD_FRAC})) AS passes
FROM feat
"""


@register("gopher_quality_filter", oracle=_GOPHER_ORACLE)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style heuristic quality rules with a per-rule
    boolean breakdown plus the combined verdict.

    Scale note: pure narrow projection — every feature (including the
    top-word concentration, computed as a per-row O(distinct x words)
    array fold rather than an explode+groupBy shuffle) runs inside
    whole-stage codegen at scan speed.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    mean_wlen = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
        / n_words
    )
    n_stop = F.size(
        F.filter(F.array_distinct(words), lambda x: x.isin(*EN_STOPWORDS))
    )
    max_wlen = F.array_max(F.transform(words, F.length))
    top_word_frac = (
        F.array_max(
            F.transform(
                F.array_distinct(words),
                lambda w2: F.size(F.filter(words, lambda x: x == w2)),
            )
        ).cast("double")
        / n_words
    )
    r_word_count = n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    r_mean_wlen = mean_wlen.between(GOPHER_MIN_MEAN_WLEN, GOPHER_MAX_MEAN_WLEN)
    r_stopwords = n_stop >= GOPHER_MIN_STOPWORDS
    r_max_wlen = max_wlen <= GOPHER_MAX_WORD_LEN
    r_top_word = top_word_frac <= GOPHER_MAX_TOP_WORD_FRAC
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_wlen"),
        n_stop.cast("long").alias("n_stopwords"),
        max_wlen.cast("long").alias("max_wlen"),
        F.round(top_word_frac, 6).alias("top_word_frac"),
        r_word_count.alias("r_word_count"),
        r_mean_wlen.alias("r_mean_wlen"),
        r_stopwords.alias("r_stopwords"),
        r_max_wlen.alias("r_max_wlen"),
        r_top_word.alias("r_top_word"),
        (r_word_count & r_mean_wlen & r_stopwords & r_max_wlen & r_top_word).alias(
            "passes"
        ),
    )


# ------------------------------------------------------ unigram logprob

_UNIGRAM_ORACLE = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), freq AS (
    SELECT word, count(*) AS n FROM w GROUP BY word
), tot AS (
    SELECT sum(n) AS total FROM freq
)
SELECT w.doc_id,
       count(*) AS n_words,
       round(avg(-ln(CAST(freq.n AS DOUBLE) / tot.total)), 6) AS mean_nll,
       round(min(-ln(CAST(freq.n AS DOUBLE) / tot.total)), 6) AS min_nll,
       round(max(-ln(CAST(freq.n AS DOUBLE) / tot.total)), 6) AS max_nll
FROM w JOIN freq USING (word) CROSS JOIN tot
GROUP BY w.doc_id
"""


@register("unigram_logprob", oracle=_UNIGRAM_ORACLE)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram LM — the cheap importance/"perplexity" score used to rank
    documents before expensive model-based scoring (CCNet's KenLM
    filter is this plan shape with a 5-gram LM).

    Scale note: the frequency table is one partial-combined aggregation
    over the token stream; it is explicitly broadcast for the lookup
    join (a production vocab is top-V truncated to stay broadcastable,
    with an OOV floor — here the corpus vocab is naturally small). The
    per-doc aggregate partial-combines on doc_id. Total: two shuffles
    of key-count rows, never a re-shuffle of the token stream.
    """
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    freq = tokens.groupBy("word").agg(F.count("*").alias("n"))
    total = freq.agg(F.sum("n").alias("total"))
    nll = -F.log(F.col("n").cast("double") / F.col("total"))
    return (
        tokens.join(F.broadcast(freq), "word")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.round(F.avg(nll), 6).alias("mean_nll"),
            F.round(F.min(nll), 6).alias("min_nll"),
            F.round(F.max(nll), 6).alias("max_nll"),
        )
    )
