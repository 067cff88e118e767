"""Token-distribution statistics: per-source KL divergence (domain
shift) and the vocabulary coverage curve (tokenizer sizing).

- kl_divergence_sources: KL(P_source || P_corpus) over unigram token
  distributions — the quantitative "how different is this source from
  the mix" number behind domain-mixture decisions
  (domain_mixture_weights chooses proportions; this measures drift).
  No smoothing is needed: every source token appears in the corpus
  distribution by construction, so Q(w) > 0 wherever P(w) > 0.
- vocab_coverage_curve: fraction of the token stream covered by the
  top-k most frequent words for a ladder of k — the curve a tokenizer
  owner reads to pick a vocabulary size (where it flattens, bigger
  vocab stops paying).

Determinism (round-2 recipe): ln() is rounded to 9 dp AT DEFINITION
(1-ulp libm differences cannot survive into the product), per-term
results rounded to 12 dp and decimal-summed so accumulation order
cannot fork engines; integer counts everywhere else.

Reference parity note: the reference (apurvam/streams-prototyping)
has no corpus statistics; these extend the engine for the
LLM-pipeline mandate (SURVEY.md Part C'').

Scale design (100 TB): both operators collapse the token stream in
ONE partial-combined aggregate ((source, word) / word counts); the
corpus-distribution side is vocabulary-sized and broadcast into the
per-source join; totals are 1-row broadcasts. The coverage window
runs over the DISTINCT-word frequency table ordered by count — O(V),
never O(corpus). Nothing after the first aggregate touches a
corpus-sized row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register

COVERAGE_KS = (10, 30, 100, 300, 1000, 3000, 10000)

_KL_ORACLE = """
WITH toks AS (
    SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
), sc AS (
    SELECT source, word, count(*) AS nw FROM toks GROUP BY source, word
), st AS (
    SELECT source, sum(nw) AS ns FROM sc GROUP BY source
), cw AS (
    SELECT word, sum(nw) AS cnw FROM sc GROUP BY word
), ct AS (
    SELECT sum(nw) AS ctot FROM sc
), terms AS (
    SELECT sc.source, st.ns,
           round((CAST(sc.nw AS DOUBLE) / st.ns)
                 * (round(ln(CAST(sc.nw AS DOUBLE) / st.ns), 9)
                    - round(ln(CAST(cw.cnw AS DOUBLE) / ct.ctot), 9)), 12) AS term
    FROM sc JOIN st USING (source) JOIN cw USING (word) CROSS JOIN ct
)
SELECT source,
       CAST(max(ns) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab_words,
       round(CAST(sum(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6) AS kl_vs_corpus
FROM terms GROUP BY source
"""


@register("kl_divergence_sources", oracle=_KL_ORACLE)
def kl_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(P_source || P_corpus) over unigram distributions, one row
    per source — see module docstring for the determinism recipe and
    why no smoothing is required.

    Scale: one (source, word) aggregate over the token stream (map-
    side combined); the corpus word table and the per-source totals
    are vocabulary-/source-sized and broadcast; the final fold is a
    per-source sum of pre-rounded decimal terms.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split("text", " ")).alias("word"))
    sc = toks.groupBy("source", "word").agg(F.count("*").alias("nw"))
    st = sc.groupBy("source").agg(F.sum("nw").alias("ns"))
    cw = sc.groupBy("word").agg(F.sum("nw").alias("cnw"))
    ct = sc.agg(F.sum("nw").alias("ctot"))
    p = F.col("nw").cast("double") / F.col("ns")
    q = F.col("cnw").cast("double") / F.col("ctot")
    terms = (
        sc.join(F.broadcast(st), "source")
        .join(cw, "word")
        .crossJoin(F.broadcast(ct))
        .select(
            "source",
            "ns",
            F.round(p * (F.round(F.log(p), 9) - F.round(F.log(q), 9)), 12).alias(
                "term"
            ),
        )
    )
    return terms.groupBy("source").agg(
        F.max("ns").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("vocab_words"),
        F.round(
            F.sum(F.col("term").cast("decimal(28,12)")).cast("double"), 6
        ).alias("kl_vs_corpus"),
    )


def _cov_cases_duck() -> str:
    return ", ".join(
        f"sum(CASE WHEN rnk <= {k} THEN n ELSE 0 END) AS c{k}" for k in COVERAGE_KS
    )


_COV_ORACLE = f"""
WITH wc AS (
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
), r AS (
    SELECT n,
           row_number() OVER (ORDER BY n DESC, word ASC) AS rnk,
           sum(n) OVER () AS total
    FROM wc
), a AS (
    SELECT max(total) AS total, count(*) AS vocab, {_cov_cases_duck()}
    FROM r
)
SELECT u.kc.k AS top_k,
       CAST(vocab AS BIGINT) AS vocab_size,
       CAST(u.kc.c AS BIGINT) AS tokens_covered,
       round(CAST(u.kc.c AS DOUBLE) / total, 6) AS coverage
FROM a, (SELECT unnest([{', '.join(
    "{'k': %d, 'c': c%d}" % (k, k) for k in COVERAGE_KS
)}]) AS kc FROM a) u
"""


@register("vocab_coverage_curve", oracle=_COV_ORACLE)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-stream coverage of the top-k vocabulary for a ladder of
    k — the tokenizer-sizing curve. One row per k with the covered
    token count and share.

    Scale (round-6 lint): only ranks <= max(k) matter, so the rank
    window runs over an orderBy().limit(max_k) — TakeOrderedAndProject
    (per-partition top-k, merged once), never a single-partition sort
    of the vocabulary; total tokens and vocab size come from one
    separate 1-row fold. The k-ladder is conditional sums, exploded
    into rows at the end (7 rows).
    """
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    max_k = max(COVERAGE_KS)
    top = wc.orderBy(F.col("n").desc(), F.col("word").asc()).limit(max_k)
    r = top.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("word").asc()))
        .alias("rnk"),
    )
    tot = wc.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    a = r.crossJoin(F.broadcast(tot)).agg(
        F.max("total").alias("total"),
        F.max("vocab").alias("vocab"),
        *[
            F.sum(F.when(F.col("rnk") <= k, F.col("n")).otherwise(0)).alias(f"c{k}")
            for k in COVERAGE_KS
        ],
    )
    kc = F.explode(
        F.array(
            *[
                F.struct(F.lit(k).alias("k"), F.col(f"c{k}").alias("c"))
                for k in COVERAGE_KS
            ]
        )
    ).alias("kc")
    return a.select("total", "vocab", kc).select(
        F.col("kc.k").alias("top_k"),
        F.col("vocab").cast("long").alias("vocab_size"),
        F.col("kc.c").cast("long").alias("tokens_covered"),
        F.round(F.col("kc.c").cast("double") / F.col("total"), 6).alias("coverage"),
    )
