"""Span-level dedup and token-distribution quality signals.

- span_dedup: C4-style duplicated-span removal. C4 deduplicates at the
  granularity of three-sentence spans; this corpus has no sentence
  structure (single-line word streams), so the repeated unit is a
  fixed-width word span. Any span occurring in >= SPAN_MIN_DOCS
  distinct documents is "duplicated text"; each document reports how
  much of it is duplicated and the cleaned text with those spans
  removed (the actual C4 transformation, not just a score).
- token_entropy: per-document Shannon entropy of the token
  distribution plus type-token ratio — the cheapest repetition /
  degeneracy signals (low entropy = looping or template text), used
  alongside repetition_stats' trigram features.

Reference parity note: the reference repo (apurvam/streams-prototyping)
has no text operators; these extend the engine for the LLM-pipeline
mandate (SURVEY.md Part C'').

Determinism: entropy contributions are `p * round(ln(p), 6)` —
transcendentals rounded BEFORE use (the corpus_stats discipline) —
then rounded to 8 dp and summed as DECIMAL(18,8), so partial-agg
order cannot fork the result across engines. p itself is one IEEE
division of exact integers, identical everywhere.

Scale design (100 TB): span extraction is a generator explode (narrow,
scan-speed); the duplicated-span set is a partial-combined groupBy on
span with a HAVING threshold that shrinks it orders of magnitude
before the membership join back (same shape as boilerplate_phrases —
AQE may broadcast the shrunken side). Document reassembly partial-
combines collect_list on doc_id: the only corpus-sized shuffle is the
(doc, pos, span) stream, keyed once. token_entropy is one
partial-combined (doc, word) count and one doc-keyed aggregate —
the token stream shuffles once, collapsed to distinct pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register

SPAN_W = 4          # words per (non-overlapping) span
SPAN_MIN_DOCS = 3   # span in >= 3 distinct docs => duplicated text

_SPAN_ORACLE = f"""
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
), idx AS (
    SELECT doc_id, words,
           CAST(unnest(range(0, greatest(
               CAST(ceil(len(words) / {SPAN_W}.0) AS BIGINT), 1))) AS BIGINT) AS pos
    FROM w
), spans AS (
    SELECT doc_id, pos,
           array_to_string(words[(pos * {SPAN_W} + 1):(pos * {SPAN_W} + {SPAN_W})],
                           ' ') AS span
    FROM idx
), dup AS (
    SELECT span FROM spans GROUP BY span
    HAVING count(DISTINCT doc_id) >= {SPAN_MIN_DOCS}
), flagged AS (
    SELECT s.doc_id, s.pos, s.span, (dup.span IS NOT NULL) AS is_dup
    FROM spans s LEFT JOIN dup ON dup.span = s.span
)
SELECT doc_id,
       count(*) AS n_spans,
       sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup_spans,
       round(CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_frac,
       coalesce(string_agg(span, ' ' ORDER BY pos)
                    FILTER (WHERE NOT is_dup), '') AS clean_text
FROM flagged GROUP BY doc_id
"""


@register("span_dedup", oracle=_SPAN_ORACLE)
def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicated-span removal: {SPAN_W}-word spans occurring
    in >= {SPAN_MIN_DOCS} distinct documents are removed from every
    document; emits per-doc dup stats and the cleaned text.

    Scale note: collect_list(struct(pos, span)) partial-combines per
    doc; array_sort restores document order without a sort exchange
    (order lives inside the row, not the shuffle).
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_spans = F.greatest(
        F.ceil(F.size(words) / F.lit(float(SPAN_W))).cast("int"), F.lit(1)
    )
    spans = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.array_join(
                    F.slice(words, i * SPAN_W + 1, SPAN_W), " "
                ),
            )
        ).alias("pos", "span"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "span")
    dup = (
        spans.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= SPAN_MIN_DOCS)
        .select("span", F.lit(True).alias("is_dup_hit"))
    )
    flagged = spans.join(dup, "span", "left").select(
        "doc_id", "pos", "span", F.col("is_dup_hit").isNotNull().alias("is_dup")
    )
    n_dup = F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        n_dup.alias("n_dup_spans"),
        F.round(n_dup.cast("double") / F.count("*"), 6).alias("dup_frac"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("is_dup"), F.struct("pos", "span"))
                    )
                ),
                lambda s: s["span"],
            ),
            " ",
        ).alias("clean_text"),
    )


# ---------------------------------------------------------- token entropy

_ENTROPY_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           unnest(string_split(text, ' ')) AS word
    FROM documents
), tf AS (
    SELECT doc_id, n_tokens, word, count(*) AS tf
    FROM toks GROUP BY doc_id, n_tokens, word
)
SELECT doc_id, n_tokens,
       count(*) AS n_types,
       round(CAST(count(*) AS DOUBLE) / n_tokens, 6) AS ttr,
       -- exact integer micro-nats: sum(tf * ln6_micro) is pure int64,
       -- and (2s+n)//(2n) is round-half-up — no double product ever
       -- rounded, so no engine-specific half-tie (0.025 * a 6-dp ln
       -- lands exactly on ..975, which the engines tie-broke apart)
       CAST((2 * sum(-tf * CAST(CAST(round(
                 ln(CAST(tf AS DOUBLE) / n_tokens), 6) AS DECIMAL(18,6))
                 * 1000000 AS BIGINT))
             + n_tokens) // (2 * n_tokens) AS DOUBLE) / 1e6 AS token_entropy
FROM tf GROUP BY doc_id, n_tokens
"""


@register("token_entropy", oracle=_ENTROPY_ORACLE)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy (nats) and
    type-token ratio — low entropy flags repetitive/degenerate text.

    Scale note: one partial-combined (doc, word) count, one doc-keyed
    aggregate; n_tokens rides the group key (functionally dependent on
    doc_id) so no second pass over the tokens is needed.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    tf = (
        d.select(
            "doc_id",
            F.size(words).cast("long").alias("n_tokens"),
            F.explode(words).alias("word"),
        )
        .groupBy("doc_id", "n_tokens", "word")
        .agg(F.count("*").alias("tf"))
    )
    p = F.col("tf").cast("double") / F.col("n_tokens")
    # 6-dp ln as exact integer micro-nats (decimal cast makes the *1e6
    # scale-up lossless); tf * micro stays pure int64 — no double
    # product is ever rounded, so no engine-specific half-tie (the
    # 8-dp round of p*ln6 landed exactly on ..975 for uniform-tf docs)
    ln6_micro = (F.round(F.log(p), 6).cast("decimal(18,6)") * 1000000).cast("long")
    return (
        tf.groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").alias("n_types"),
            F.round(F.count("*").cast("double") / F.col("n_tokens"), 6).alias("ttr"),
            F.sum(-F.col("tf") * ln6_micro).alias("_s_micro"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_types",
            "ttr",
            # (2s+n) div (2n): round-half-up mean in pure int64
            (
                F.expr("(2 * _s_micro + n_tokens) div (2 * n_tokens)")
                .cast("double")
                / F.lit(1e6)
            ).alias("token_entropy"),
        )
    )
