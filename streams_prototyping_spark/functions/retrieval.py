"""Sparse lexical retrieval: BM25 top-k over an inverted index.

A training-data pipeline uses BM25 twice: as the retrieval baseline
that dense (ANN) retrieval is measured against, and as the matcher for
targeted corpus queries ("find documents about X to up/down-sample").
This module implements the canonical Okapi BM25 ranking function as a
pure DataFrame plan over a term-postings table.

Reference parity note: the reference repo (apurvam/streams-prototyping)
has no retrieval operators; this extends the engine for the
LLM-pipeline mandate (SURVEY.md Part C'').

Determinism across engines (same discipline as corpus_stats/clustering):
- idf is rounded to 6 dp AT DEFINITION (ln differs by ulps across
  libms; rounded-before-use it cannot fork a downstream product);
- per-term score contributions are rounded to 6 dp and summed as
  DECIMAL(18,6) — exact and order-independent, so Spark's partial
  aggregation and DuckDB's single-threaded sum agree bit-for-bit;
- avgdl is an integer-sum / integer-count division (exact inputs, one
  IEEE division — identical in both engines).

Scale design (100 TB): the postings table (doc, term, tf) is ONE
partial-combined aggregation over the token stream — the same shared
shape as the trigram tf stage in corpus_stats. Document length and
term df are partial-combined aggregates of the postings table (never
the raw tokens). The query side (a handful of query documents' distinct
terms) is broadcast into the postings join, so the only shuffle moving
corpus-sized data is the postings groupBy itself; scoring partial-
combines on (query, candidate) before the final top-k, and the top-k
is a WindowGroupLimit (per-partition k rows survive), never a global
sort. At production scale the postings table is a bucketed(term)
checkpoint reused across every retrieval query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register
from streams_prototyping_spark.stage_cache import shared_stage

BM25_K1 = 1.2
BM25_B = 0.75
N_QUERY_DOCS = 3   # query set: doc_id < 3 (their distinct terms)
BM25_TOP_K = 5


def word_tf_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram postings: per-(doc, word) term frequency. The retrieval
    twin of corpus_stats.gram_tf_df (which is trigram-keyed); shared so
    every lexical-retrieval query builds the index once per session."""

    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        return (
            d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
            .groupBy("doc_id", "word")
            .agg(F.count("*").alias("tf"))
        )

    return shared_stage(spark, sf_dir, "word_tf", build)


_BM25_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
    SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
), dl AS (
    SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
), stats AS (
    SELECT count(*) AS n_docs,
           CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
    FROM dl
), dft AS (
    SELECT word, count(*) AS df FROM tf GROUP BY word
), idf AS (
    SELECT word,
           round(ln(1.0 + (CAST(stats.n_docs - df AS DOUBLE) + 0.5)
                          / (CAST(df AS DOUBLE) + 0.5)), 6) AS idf
    FROM dft CROSS JOIN stats
), q AS (
    SELECT DISTINCT doc_id AS query_doc, word FROM tf
    WHERE doc_id < {N_QUERY_DOCS}
), scored AS (
    SELECT q.query_doc, tf.doc_id AS cand_doc,
           round(idf.idf * (CAST(tf.tf AS DOUBLE) * ({BM25_K1} + 1.0))
                 / (CAST(tf.tf AS DOUBLE)
                    + {BM25_K1} * (1.0 - {BM25_B}
                                   + {BM25_B} * (CAST(dl.dl AS DOUBLE) / stats.avgdl))),
                 6) AS contrib
    FROM q
    JOIN tf ON tf.word = q.word AND tf.doc_id <> q.query_doc
    JOIN dl ON dl.doc_id = tf.doc_id
    JOIN idf ON idf.word = q.word
    CROSS JOIN stats
), agg AS (
    SELECT query_doc, cand_doc,
           round(CAST(sum(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE), 6) AS score
    FROM scored GROUP BY query_doc, cand_doc
)
SELECT query_doc, cand_doc, score, rnk FROM (
    SELECT query_doc, cand_doc, score,
           CAST(row_number() OVER (PARTITION BY query_doc
                                   ORDER BY score DESC, cand_doc ASC) AS BIGINT) AS rnk
    FROM agg
) WHERE rnk <= {BM25_TOP_K}
"""


@register("bm25_topk", oracle=_BM25_ORACLE)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-{BM25_TOP_K}: each of the first {N_QUERY_DOCS}
    documents (its distinct terms as the query) ranked against every
    other document. k1={BM25_K1}, b={BM25_B}, idf = ln(1 + (N-df+0.5)/(df+0.5))
    (the always-positive Lucene variant).

    Scale note: query terms broadcast into the term-keyed postings
    join; doclen joins doc-keyed; contributions partial-combine on
    (query, candidate); rank<=k collapses to WindowGroupLimit. The
    corpus-sized shuffle happens exactly once (the shared postings
    build).
    """
    tf = word_tf_df(spark, sf_dir)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    dft = tf.groupBy("word").agg(F.count("*").alias("df"))
    idf = dft.crossJoin(F.broadcast(stats)).select(
        "word",
        F.round(
            F.log(
                F.lit(1.0)
                + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            ),
            6,
        ).alias("idf"),
    )
    q = (
        tf.filter(F.col("doc_id") < N_QUERY_DOCS)
        .select(F.col("doc_id").alias("query_doc"), "word")
        .distinct()
    )
    qidf = q.join(idf, "word")  # query-side: tiny, carries idf with it
    # r11 NOTE (measured, then reverted): broadcast-joining qidf BEFORE
    # the dl join looked like guide §3.2 (shrink before the shuffle),
    # but the query-term broadcast FANS OUT (a posting row matches up
    # to N_QUERY_DOCS query docs), so the dl join shuffled MORE rows,
    # each wider by (query_doc, idf). Same-session A/B: original
    # 2.43-4.11 s vs reordered 3.74-5.28 s at sf0.1 — the original
    # order (dl join on the un-fanned postings, then broadcast) wins.
    scored = (
        tf.join(dl, "doc_id")
        .withColumnRenamed("doc_id", "cand_doc")
        .join(F.broadcast(qidf), "word")
        .filter(F.col("cand_doc") != F.col("query_doc"))
        .crossJoin(F.broadcast(stats))
        .select(
            "query_doc",
            "cand_doc",
            F.round(
                F.col("idf")
                * (F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B) * (F.col("dl").cast("double") / F.col("avgdl"))
                    )
                ),
                6,
            ).alias("contrib"),
        )
    )
    agg = scored.groupBy("query_doc", "cand_doc").agg(
        F.round(
            F.sum(F.col("contrib").cast("decimal(18,6)")).cast("double"), 6
        ).alias("score")
    )
    w = Window.partitionBy("query_doc").orderBy(
        F.col("score").desc(), F.col("cand_doc").asc()
    )
    return (
        agg.select(
            "query_doc",
            "cand_doc",
            "score",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= BM25_TOP_K)
    )


# ------------------------------------------------- positional phrase search

N_PHRASES = 3        # corpus-derived query phrases (top bigrams)
PHRASE_TOP_DOCS = 10  # docs reported per phrase

_PHRASE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents
), adj AS (
    SELECT a.doc_id, a.word AS w1, b.word AS w2
    FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
), phrases AS (
    SELECT w1, w2, w1 || ' ' || w2 AS phrase FROM (
        SELECT w1, w2, count(*) AS cnt,
               row_number() OVER (ORDER BY count(*) DESC, w1, w2) AS prn
        FROM adj GROUP BY w1, w2
    ) WHERE prn <= {N_PHRASES}
), occ AS (
    SELECT p.phrase, a.doc_id, count(*) AS n_occ
    FROM adj a JOIN phrases p ON a.w1 = p.w1 AND a.w2 = p.w2
    GROUP BY p.phrase, a.doc_id
)
SELECT phrase, doc_id, n_occ, rnk FROM (
    SELECT phrase, doc_id, n_occ,
           CAST(row_number() OVER (PARTITION BY phrase
                                   ORDER BY n_occ DESC, doc_id) AS BIGINT) AS rnk
    FROM occ
) WHERE rnk <= {PHRASE_TOP_DOCS}
"""


@register("phrase_search_positional", oracle=_PHRASE_ORACLE)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase matching over positional postings — the retrieval
    capability BM25's bag-of-words postings cannot express (a doc
    containing both words non-adjacently must NOT match). Query
    phrases are corpus-derived (the top {N_PHRASES} bigrams, count
    then lexicographic tie-break) so the query needs no external
    input; per phrase the top {PHRASE_TOP_DOCS} docs by occurrence
    count are returned.

    Reference parity: no retrieval surface in the reference
    (apurvam/streams-prototyping, 408 Java LoC); SURVEY Part C″.

    Scale note: the positional postings table (doc, pos, word) is a
    pure explode — no aggregation, no shuffle to build. Adjacency is
    ONE self-join keyed on (doc_id, pos+1) — co-partitioned on doc,
    never corpus×corpus. The tiny phrase table broadcasts into the
    occurrence scan, and the per-phrase rank<=k is a WindowGroupLimit.
    At 100 TB the postings would be a bucketed(doc_id) checkpoint and
    the adjacency join is shuffle-free within buckets.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    adj = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos") == F.col("a.pos") + 1),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.word").alias("w1"),
        F.col("b.word").alias("w2"),
    )
    # global top-N via orderBy+limit: plans as TakeOrderedAndProject
    # (per-partition top-N then a driver merge of N-row heads), never
    # the single-partition global window a row_number() would cost
    phrases = (
        adj.groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w1", "w2")
        .limit(N_PHRASES)
        .select("w1", "w2", F.concat_ws(" ", "w1", "w2").alias("phrase"))
    )
    occ = (
        adj.join(F.broadcast(phrases), ["w1", "w2"])
        .groupBy("phrase", "doc_id")
        .agg(F.count("*").alias("n_occ"))
    )
    wr = Window.partitionBy("phrase").orderBy(F.col("n_occ").desc(), "doc_id")
    return occ.select(
        "phrase",
        "doc_id",
        "n_occ",
        F.row_number().over(wr).cast("long").alias("rnk"),
    ).filter(F.col("rnk") <= PHRASE_TOP_DOCS)
