"""Text transformation / filtering operators for training-data prep.

Three families the reference has no equivalent of (SURVEY §2 Part C,
north-star LLM-pipeline set):

- text_normalize: canonicalization (case fold, punctuation strip,
  whitespace collapse) — the first stage of every text pipeline, and
  the canonical form exact dedup should key on.
- repetition_stats: Gopher-style (Rae et al. 2021) within-document
  repetition features — duplicate-trigram fraction and top-trigram
  fraction — the standard cheap filter for degenerate/boilerplate text.
- pii_masking: deterministic pseudonymization of a customer dimension
  (stable surrogate key, regex digit masking, value banding) — the
  privacy pass run before any user-linked table joins a training set.

Everything is JVM-side Catalyst regexp/array expressions with exact
DuckDB oracles; no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table, widen
from streams_prototyping_spark.functions.portable_hash import (
    portable_hash64,
    portable_hash64_sql,
)
from streams_prototyping_spark.registry import register

# ---------------------------------------------------------- normalize

# Java regex and RE2 agree on these patterns (no lookaround, no
# backrefs): strip non-alphanumeric/non-whitespace, then collapse ALL
# whitespace runs (space, tab, newline) to one space — deleting
# non-space whitespace instead of collapsing it would glue adjacent
# words together and fork the canonical dedup key.
_PUNCT_RE = r"[^a-z0-9\s]"
_WS_RE = r"\s+"


def norm_text_col(col: str = "text"):
    """Canonical-text Column (lowercase, punctuation-stripped,
    whitespace-collapsed) — shared by the batch query and the
    streaming ingest pipeline so both dedup on the identical key."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(col)), _PUNCT_RE, ""), _WS_RE, " "
        )
    )


def quality_score_col(col: str = "text"):
    """[0,1] quality Column (length saturation + lexical diversity +
    stopword ratio) — the formula of functions/text.py quality_score,
    reusable over any text column (batch or streaming)."""
    from streams_prototyping_spark.functions.text import EN_STOPWORDS

    stop_words = EN_STOPWORDS
    words = F.split(col, " ")
    n_words = F.size(words)
    distinct_ratio = F.size(F.array_distinct(words)).cast("double") / n_words
    stop_ratio = (
        F.size(F.filter(words, lambda x: x.isin(*stop_words))).cast("double") / n_words
    )
    length_score = F.when(n_words >= 100, F.lit(1.0)).otherwise(
        n_words.cast("double") / 100
    )
    return F.round(0.4 * length_score + 0.4 * distinct_ratio + 0.2 * stop_ratio, 6)

_NORMALIZE_ORACLE = f"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '{_PUNCT_RE}', '', 'g'),
                           '{_WS_RE}', ' ', 'g')) AS norm_text,
       length(trim(regexp_replace(regexp_replace(lower(text), '{_PUNCT_RE}', '', 'g'),
                                  '{_WS_RE}', ' ', 'g'))) AS norm_chars,
       md5(trim(regexp_replace(regexp_replace(lower(text), '{_PUNCT_RE}', '', 'g'),
                               '{_WS_RE}', ' ', 'g'))) AS norm_md5
FROM documents
"""


@register("text_normalize", oracle=_NORMALIZE_ORACLE)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text canonicalization: lowercase, strip punctuation, collapse
    whitespace, trim — plus the md5 of the canonical form (the key
    "normalized exact dedup" groups on, catching case/punctuation-only
    near-copies that byte-exact dedup misses).

    Scale note: three regexp passes fused into one codegen'd
    projection over the scan — no shuffle, full scan speed.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = norm_text_col()
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("long").alias("norm_chars"),
        F.md5(norm).alias("norm_md5"),
    )


# --------------------------------------------------------- repetition

# trigram construction shared with winnowing/decontamination
# (functions/dedup_pipeline.py) so every operator agrees on what a
# trigram is
from streams_prototyping_spark.functions.dedup_pipeline import (  # noqa: E402
    _GRAMS_DUCK,
    _GRAMS_W_SPARK,
)

_REPETITION_ORACLE = f"""
WITH g AS (
    SELECT doc_id, unnest({_GRAMS_DUCK}) AS gram FROM documents
), counts AS (
    SELECT doc_id, gram, count(*) AS n FROM g GROUP BY doc_id, gram
)
SELECT doc_id,
       sum(n) AS n_trigrams,
       round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_trigram_frac,
       round(CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE) / sum(n), 6)
           AS dup_trigram_frac
FROM counts
GROUP BY doc_id
"""


@register("repetition_stats", oracle=_REPETITION_ORACLE)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition features (Gopher/MassiveText-style
    quality filters): total trigrams, fraction covered by the single
    most frequent trigram, and fraction occurring more than once.
    Degenerate documents (boilerplate, keyword stuffing, generation
    loops) light up on exactly these two ratios.

    Scale note: SHUFFLE-FREE — the obvious explode + groupBy(doc_id,
    gram) re-aggregation ships O(total trigrams) rows through a
    shuffle (~the corpus itself at 100 TB). Instead each row sorts its
    own trigram array (O(n log n) per document, inside codegen) and a
    single left-to-right fold over the sorted array counts run
    lengths: max run = top-trigram count, elements in runs > 1 = dup
    count. Pure narrow projection at full scan speed; the DuckDB
    oracle computes the same features via the explode shape, proving
    the fold equivalent. (widen() fans the single-file local scan out
    to every core; a real deployment's scan is already wide.)
    """
    d = widen(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", F.split("text", " ").alias("_w")
    )
    grams = _GRAMS_W_SPARK
    # fold state: (prev gram, current run, max run, dup count, total)
    fold = f"""
    aggregate(
        array_sort({grams}),
        named_struct('prev', CAST(NULL AS STRING), 'run', 0L,
                     'max_run', 0L, 'dup', 0L, 'total', 0L),
        (s, x) -> named_struct(
            'prev', x,
            'run', IF(s.prev IS NOT NULL AND x = s.prev, s.run + 1, 1L),
            'max_run', greatest(s.max_run,
                                IF(s.prev IS NOT NULL AND x = s.prev, s.run + 1, 1L)),
            'dup', s.dup + CASE WHEN s.prev IS NOT NULL AND x = s.prev
                                THEN IF(s.run = 1, 2L, 1L) ELSE 0L END,
            'total', s.total + 1),
        s -> named_struct('max_run', s.max_run, 'dup', s.dup, 'total', s.total))
    """
    return d.select("doc_id", F.expr(fold).alias("f")).select(
        "doc_id",
        F.col("f.total").alias("n_trigrams"),
        F.round(F.col("f.max_run").cast("double") / F.col("f.total"), 6).alias(
            "top_trigram_frac"
        ),
        F.round(F.col("f.dup").cast("double") / F.col("f.total"), 6).alias(
            "dup_trigram_frac"
        ),
    )


# --------------------------------------------------------------- PII

_PII_ORACLE = f"""
SELECT {portable_hash64_sql("'pii:' || CAST(c_custkey AS VARCHAR)")} AS surrogate_id,
       regexp_replace(c_name, '[0-9]', '*', 'g') AS name_masked,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_band,
       c_mktsegment
FROM customer
"""


@register("pii_masking", oracle=_PII_ORACLE)
def pii_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pseudonymization of the customer dimension: a stable keyed
    surrogate id (salted portable hash — reruns and incremental loads
    assign the same surrogate), regex digit-masking of the name, and
    account-balance generalization into 1000-unit bands
    (k-anonymity-style coarsening). The natural key never appears in
    the output.

    Scale note: pure projection — scan-speed, no shuffle; the
    surrogate is computed identically at every site that needs to
    join pseudonymized tables, so downstream joins still co-locate.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        portable_hash64(
            F.concat(F.lit("pii:"), F.col("c_custkey").cast("string"))
        ).alias("surrogate_id"),
        F.regexp_replace("c_name", "[0-9]", "*").alias("name_masked"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("acctbal_band"),
        "c_mktsegment",
    )


# ------------------------------------------------- collapse repeats

# Degeneration cleanup: drop word i when it closes an immediate
# unigram loop (w[i] == w[i-1]) or an immediate bigram loop
# (w[i] == w[i-2] AND w[i-1] == w[i-3]). The mask is computed over the
# ORIGINAL positions (no cascade after removal) — a deliberate,
# documented approximation that keeps the operator a pure portable
# projection instead of a sequential fold; one pass removes one loop
# "lap", which is what the repetition_stats gate needs to stop firing.

_KEEP_MASK_SPARK = """
filter(
    transform(split(text, ' '), (w, i) -> named_struct('w', w, 'i', i)),
    s -> NOT (
        (s.i >= 1 AND s.w = element_at(split(text, ' '), s.i))
        OR (s.i >= 3
            AND s.w = element_at(split(text, ' '), s.i - 1)
            AND element_at(split(text, ' '), s.i) = element_at(split(text, ' '), s.i - 2))
    )
)
"""

_CLEAN_SPARK = f"array_join(transform({_KEEP_MASK_SPARK}, s -> s.w), ' ')"

# DuckDB: words are 1-indexed; i >= 2 / i >= 4 are the same guards.
_CLEAN_DUCK = """
array_to_string(list_transform(list_filter(
    list_transform(range(1, len(string_split(text, ' ')) + 1),
                   i -> {'w': (string_split(text, ' '))[i], 'i': i}),
    s -> NOT (
        (s.i >= 2 AND s.w = (string_split(text, ' '))[s.i - 1])
        OR (s.i >= 4
            AND s.w = (string_split(text, ' '))[s.i - 2]
            AND (string_split(text, ' '))[s.i - 1] = (string_split(text, ' '))[s.i - 3])
    )), s -> s.w), ' ')
"""

_COLLAPSE_ORACLE = f"""
SELECT doc_id,
       {_CLEAN_DUCK} AS clean_text,
       CAST(len(string_split(text, ' '))
            - len(string_split({_CLEAN_DUCK}, ' ')) AS BIGINT) AS n_removed
FROM documents
"""


@register("collapse_repeats", oracle=_COLLAPSE_ORACLE)
def collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation-loop cleanup: collapse immediate unigram ("the the")
    and bigram ("a b a b") repeats to one occurrence per lap — the
    cheap degeneration scrub applied to model-generated or template
    text before it re-enters a training mix.

    Scale note: pure narrow projection (position mask over the word
    array inside codegen) — no shuffle, full scan speed, and the same
    static-mask semantics in both engines (a cascading fold would
    remove nested laps too; documented approximation).
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    clean = F.expr(_CLEAN_SPARK)
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        (
            F.size(F.split("text", " ")) - F.size(F.split(clean, " "))
        ).cast("long").alias("n_removed"),
    )
