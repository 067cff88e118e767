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

from pyspark.sql import DataFrame, SparkSession, Window
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
    # r11 (the cross_doc_ngram_novelty lesson): project split(text)
    # ONCE per row before the span lambda — referenced inside the
    # transform it re-splits the whole text per span position (no CSE
    # in HOF lambdas), O(words^2/{SPAN_W}) string work per document.
    d = d.select("doc_id", F.split("text", " ").alias("_words"))
    words = F.col("_words")
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
    # The whole computation is per-document, so run it as a NARROW map
    # over the scan (guide §2.4: remove shuffles outright) instead of
    # explode + two shuffles of the token stream: sort the token array
    # once per row, find run boundaries (each run = one distinct word),
    # and fold entropy over the run lengths. The r11 before-plan paid
    # 2 Exchanges of ~100x-exploded rows; this plan has zero.
    # 6-dp ln as exact integer micro-nats (decimal cast makes the *1e6
    # scale-up lossless); tf * micro stays pure int64 — no double
    # product is ever rounded, so no engine-specific half-tie (the
    # 8-dp round of p*ln6 landed exactly on ..975 for uniform-tf docs);
    # the integer fold is order-independent, so sorting tokens first
    # cannot fork the sum from the exploded groupBy it replaces.
    # explode() dropped null-text rows; the narrow map must too
    base = d.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.array_sort(F.split("text", " ")).alias("_sw"),
    ).select(
        "doc_id",
        "n_tokens",
        # 1-based start positions of each distinct-word run
        F.expr(
            "filter(sequence(1, size(_sw)), i -> i = 1 OR _sw[i - 1] != _sw[i - 2])"
        ).alias("_runs"),
    )
    # run length = next run start (or n+1) - this run start
    tf_of = (
        "transform(_runs, (s, j) -> "
        "coalesce(try_element_at(_runs, j + 2), n_tokens + 1) - s)"
    )
    micro = (
        "aggregate({tfs}, CAST(0 AS BIGINT), (acc, tf) -> acc - tf * "
        "CAST(CAST(round(ln(CAST(tf AS DOUBLE) / n_tokens), 6) "
        "AS DECIMAL(18,6)) * 1000000 AS BIGINT))"
    ).format(tfs=tf_of)
    return base.select(
        "doc_id",
        "n_tokens",
        F.size("_runs").cast("long").alias("n_types"),
        F.round(F.size("_runs").cast("double") / F.col("n_tokens"), 6).alias("ttr"),
        # (2s+n) div (2n): round-half-up mean in pure int64
        (
            F.expr(f"(2 * ({micro}) + n_tokens) div (2 * n_tokens)")
            .cast("double")
            / F.lit(1e6)
        ).alias("token_entropy"),
    )


# ---------------------------------------------------------------------------
# Exact-substring duplication spans (Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better"): any >= DUP_K-word
# substring appearing in >= 2 distinct documents is duplicated text.
# Overlapping duplicated windows are merged into MAXIMAL spans by
# interval union, so a 30-word verbatim repeat reports as ONE span of
# 30 words, not 23 overlapping 8-word hits.

DUP_K = 8  # minimum duplicated-substring length, in words

# Shared CTE prefix: tokenize -> overlapping gram hashes -> cross-doc
# duplicated grams -> hit positions -> interval-union islands ->
# maximal (doc_id, s, e) spans. Both exact-substring queries build on
# `spans`; keeping one copy means a parameter tune cannot
# de-synchronize the two oracles.
_DUP_ISLANDS_CTE = f"""
w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
), grams AS (
    SELECT doc_id,
           CAST(unnest(range(0, len(words) - {DUP_K} + 1)) AS BIGINT) AS pos,
           words
    FROM w WHERE len(words) >= {DUP_K}
), hashed AS (
    SELECT doc_id, pos,
           md5(array_to_string(words[(pos + 1):(pos + {DUP_K})], ' ')) AS gram
    FROM grams
), dup AS (
    SELECT gram FROM hashed GROUP BY gram
    HAVING count(DISTINCT doc_id) >= 2
), hits AS (
    SELECT h.doc_id, h.pos FROM hashed h JOIN dup USING (gram)
), marked AS (
    SELECT doc_id, pos,
           CASE WHEN pos > coalesce(max(pos + {DUP_K} - 1) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                THEN 1 ELSE 0 END AS new_island
    FROM hits
), islanded AS (
    SELECT doc_id, pos,
           sum(new_island) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM marked
), spans AS (
    SELECT doc_id, island,
           min(pos) AS s, max(pos) + {DUP_K} - 1 AS e
    FROM islanded GROUP BY doc_id, island
)"""

_DUP_SUBSTR_ORACLE = f"""
WITH {_DUP_ISLANDS_CTE}, per_doc AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_dup_spans,
           CAST(sum(e - s + 1) AS BIGINT) AS dup_words,
           CAST(max(e - s + 1) AS BIGINT) AS longest_dup_span
    FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
       coalesce(p.n_dup_spans, 0) AS n_dup_spans,
       coalesce(p.dup_words, 0) AS dup_words,
       coalesce(p.longest_dup_span, 0) AS longest_dup_span,
       round(CAST(coalesce(p.dup_words, 0) AS DOUBLE)
             / len(string_split(d.text, ' ')), 6) AS dup_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def _dup_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated spans (doc_id, s, e): every
    overlapping DUP_K-word window is hashed; windows whose hash occurs
    in >= 2 distinct docs are duplicated; overlapping hits are merged
    into maximal spans by interval union (running-max-of-ends island
    detection). Shared stage — per-doc stats and the span catalog both
    consume it, so the gram shuffle is paid once per session.

    Scale design (100 TB): the gram stream is a generator explode of
    O(words) rows per doc (same volume as the token stream every text
    query already shuffles) keyed by a 128-bit md5 — never the raw
    text; the duplicated-gram set shrinks by the HAVING threshold
    before the membership join back — which is pinned to SHUFFLE_HASH,
    never broadcast: the dup-gram set is corpus-derived (O(duplicated
    windows), unbounded in the corpus), and md5 strings compress ~3x
    in shuffle files, so AQE's bytes-based estimate passes the 64 MB
    broadcast threshold while the deserialized driver-side hash
    relation blows the heap (observed at sf10: 50 M grams, broadcast
    build OOM). Shuffle-hash keeps the build per-partition;
    island merge is one doc-keyed window over only the HIT positions
    (O(duplicated windows), not O(corpus)). No all-pairs anything —
    this is the suffix-array dedup recast as three keyed shuffles.
    """
    from streams_prototyping_spark.stage_cache import shared_stage

    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        words = F.split("text", " ")
        grams = (
            d.filter(F.size(words) >= DUP_K)
            .select(
                "doc_id",
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(0), F.size(words) - DUP_K),
                        lambda i: F.md5(
                            F.array_join(F.slice(words, i + 1, DUP_K), " ")
                        ),
                    )
                ).alias("pos", "gram"),
            )
            .select("doc_id", F.col("pos").cast("long").alias("pos"), "gram")
        )
        dup = (
            grams.groupBy("gram")
            .agg(F.count_distinct("doc_id").alias("ndocs"))
            .filter(F.col("ndocs") >= 2)
            .select("gram")
        )
        hits = grams.join(dup.hint("shuffle_hash"), "gram").select("doc_id", "pos")
        w_prev = (
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_run = (
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        islanded = hits.select(
            "doc_id",
            "pos",
            F.sum(
                F.when(
                    F.col("pos")
                    > F.coalesce(
                        F.max(F.col("pos") + DUP_K - 1).over(w_prev), F.lit(-1)
                    ),
                    1,
                ).otherwise(0)
            )
            .over(w_run)
            .alias("island"),
        )
        return islanded.groupBy("doc_id", "island").agg(
            F.min("pos").alias("s"), (F.max("pos") + DUP_K - 1).alias("e")
        )

    return shared_stage(spark, sf_dir, "dup_islands", build)


@register("dup_substring_spans", oracle=_DUP_SUBSTR_ORACLE)
def dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats over the maximal duplicated spans
    (_dup_islands): span count, duplicated word total, longest span,
    duplicated fraction — the doc-level keep/trim signal of Lee-et-al
    exact-substring dedup.

    Determinism: pure integer position arithmetic plus one final
    rounded division — engines cannot fork.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    spans = _dup_islands(spark, sf_dir)
    span_len = F.col("e") - F.col("s") + 1
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(span_len).alias("dup_words"),
        F.max(span_len).alias("longest_dup_span"),
    )
    return (
        d.select("doc_id", F.size(words).cast("long").alias("n_words"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("dup_words", F.lit(0)).alias("dup_words"),
            F.coalesce("longest_dup_span", F.lit(0)).alias("longest_dup_span"),
            F.round(
                F.coalesce("dup_words", F.lit(0)).cast("double") / F.col("n_words"), 6
            ).alias("dup_frac"),
        )
    )


_DUP_CATALOG_ORACLE = f"""
WITH {_DUP_ISLANDS_CTE}, texts AS (
    SELECT s.doc_id,
           array_to_string(w.words[(s.s + 1):(s.e + 1)], ' ') AS span_text,
           s.e - s.s + 1 AS span_words
    FROM spans s JOIN w ON w.doc_id = s.doc_id
)
SELECT span_text,
       CAST(max(span_words) AS BIGINT) AS span_words,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM texts GROUP BY span_text
"""


@register("dup_span_catalog", oracle=_DUP_CATALOG_ORACLE)
def dup_span_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog of the maximal duplicated substrings themselves: each
    (doc, island) from _dup_islands is joined back to its document and
    sliced to the actual span text, then grouped by text with document
    and occurrence counts — the artifact a pipeline owner feeds into a
    boilerplate blocklist or uses to eyeball WHAT is duplicated, not
    just how much. (A maximal island's text can be doc-specific — a
    30-word run in one doc whose middle 8 words alone recur elsewhere
    catalogs as two different entries — so n_docs here counts exact
    full-span matches, intentionally stricter than the window-level
    duplication that seeded it.)

    Scale design: the islands stage is shared with dup_substring_spans
    (built once per session); the text slice is a doc-keyed join
    against the document table (O(islands) rows through the join, and
    islands are O(duplicated regions), corpus-sublinear after dedup
    thresholds); the final group-by keys on span text whose volume is
    bounded by total duplicated words.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    spans = _dup_islands(spark, sf_dir)
    texts = spans.join(d.select("doc_id", words.alias("w")), "doc_id").select(
        "doc_id",
        F.array_join(
            F.slice(F.col("w"), F.col("s") + 1, F.col("e") - F.col("s") + 1), " "
        ).alias("span_text"),
        (F.col("e") - F.col("s") + 1).alias("span_words"),
    )
    return texts.groupBy("span_text").agg(
        F.max("span_words").alias("span_words"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_occurrences"),
    )
