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

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.functions.portable_hash import (
    portable_hash64,
    portable_hash64_sql,
)
from streams_prototyping_spark.registry import register

# ---------------------------------------------------------- normalize

# Java regex and RE2 agree on these patterns (no lookaround, no
# backrefs): strip non-alphanumeric/space, collapse space runs.
_PUNCT_RE = "[^a-z0-9 ]"
_WS_RE = " +"

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
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), _PUNCT_RE, ""), _WS_RE, " "
        )
    )
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("long").alias("norm_chars"),
        F.md5(norm).alias("norm_md5"),
    )


# --------------------------------------------------------- repetition

_REP_GRAMS_DUCK = """
CASE WHEN len(string_split(text, ' ')) >= 3
     THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
                         i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))
     ELSE [text] END
"""

_REPETITION_ORACLE = f"""
WITH g AS (
    SELECT doc_id, unnest({_REP_GRAMS_DUCK}) AS gram FROM documents
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

    Scale note: explode + two-level aggregation keyed by doc_id — the
    shuffle is O(distinct trigrams) with partial map-side combine, and
    doc_id keys are unique so there is no skew; this is the
    explode-then-reaggregate shape that beats per-row O(n²) array
    self-matching at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    grams = F.when(
        F.size(words) >= 3,
        F.zip_with(
            F.zip_with(
                F.slice(words, 1, F.size(words) - 2),
                F.slice(words, 2, F.size(words) - 2),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            F.slice(words, 3, F.size(words) - 2),
            lambda ab, c: F.concat_ws(" ", ab, c),
        ),
    ).otherwise(F.array(F.col("text")))
    counts = (
        d.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.groupBy("doc_id").agg(
        F.sum("n").alias("n_trigrams"),
        F.round(F.max("n").cast("double") / F.sum("n"), 6).alias("top_trigram_frac"),
        F.round(
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).cast("double")
            / F.sum("n"),
            6,
        ).alias("dup_trigram_frac"),
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
