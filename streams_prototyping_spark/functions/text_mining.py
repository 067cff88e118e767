"""Corpus mining operators: keyword extraction, cross-source
vocabulary geometry, and the vocabulary-growth law — the
corpus-understanding layer next to the token statistics and Zipf
health checks.

- rake_keywords: RAKE (Rapid Automatic Keyword Extraction, Rose 2010)
  word scores: candidate phrases are maximal stopword-free runs;
  word score = degree/frequency where degree sums the lengths of the
  phrases containing the word. Top-25, all-integer statistics.
- source_vocab_overlap: pairwise vocabulary Jaccard AND overlap
  (Szymkiewicz-Simpson) coefficients between sources — the corpus
  mixing matrix that decides whether two sources are near-duplicates
  at the vocabulary level.
- heaps_law_fit: Heaps' law exponent (V ~ K * n^beta) from the
  cumulative vocabulary-vs-tokens curve in doc_id order, fitted by
  log-log OLS — the growth forecast that sizes tokenizer vocab and
  dedup state ahead of a 100x corpus scale-up.

Reference parity: no text surface in the reference (408 Java LoC);
SURVEY.md Part C″ extension, sharing EN_STOPWORDS with the lang-id
heuristic (`functions/text.py:67`).

Scale design (100 TB):
- rake: the phrase-id running count partitions BY DOCUMENT (state
  bounded by doc length); phrase stats fold on (doc, phrase) keys and
  word stats on word keys — no global window until the 25-row top-k
  (TakeOrdered via rank-filter over the word-stat table, which is
  vocabulary-sized, not corpus-sized).
- vocab overlap: the pair join is keyed on word over the DISTINCT
  (source, word) table; with S sources each posting list fans out at
  most S(S-1)/2 — bounded by the source count, not the corpus.
- heaps: first-seen trick (min doc per word) turns cumulative
  distinct into one fold + one running sum over O(docs) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table, widen
from streams_prototyping_spark.functions.text import EN_STOPWORDS, _STOP_LIST_SQL
from streams_prototyping_spark.registry import register
from streams_prototyping_spark.stage_cache import shared_stage

RAKE_TOP = 25


# --------------------------------------------------------------- RAKE

_RAKE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
), flagged AS (
    SELECT doc_id, word, pos,
           CASE WHEN word IN ({_STOP_LIST_SQL}) THEN 1 ELSE 0 END AS is_stop
    FROM toks
), phrased AS (
    SELECT doc_id, word, is_stop,
           sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
    FROM flagged
), members AS (
    SELECT doc_id, phrase_id, word FROM phrased WHERE is_stop = 0
), plen AS (
    SELECT doc_id, phrase_id, word,
           count(*) OVER (PARTITION BY doc_id, phrase_id) AS phrase_len
    FROM members
), wstat AS (
    SELECT word, count(*) AS freq, sum(phrase_len) AS degree
    FROM plen GROUP BY word
)
SELECT word, CAST(freq AS BIGINT) AS freq, CAST(degree AS BIGINT) AS degree,
       round(CAST(degree AS DOUBLE) / freq, 6) AS rake_score,
       CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT wstat.*,
           row_number() OVER (
               ORDER BY CAST(degree AS DOUBLE) / freq DESC, word) AS rnk
    FROM wstat
) WHERE rnk <= {RAKE_TOP}
"""


@register("rake_keywords", oracle=_RAKE_ORACLE)
def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword scores over the corpus: phrases are maximal
    stopword-free runs; score(word) = degree/freq where degree sums
    the lengths of phrases containing the word (a word that always
    appears inside long collocations outranks one of equal frequency
    appearing alone). Top-{RAKE_TOP} with word tie-breaks; every
    statistic is an integer until the final division.

    Scale note: see module docstring — per-doc windows, keyed folds,
    vocabulary-sized rank window.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    flagged = toks.withColumn(
        "is_stop", F.when(F.col("word").isin(*EN_STOPWORDS), 1).otherwise(0)
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    phrased = flagged.withColumn(
        "phrase_id",
        F.sum("is_stop").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    members = phrased.where(F.col("is_stop") == 0).select(
        "doc_id", "phrase_id", "word"
    )
    plen = members.withColumn(
        "phrase_len",
        F.count(F.lit(1)).over(Window.partitionBy("doc_id", "phrase_id")),
    )
    wstat = plen.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("phrase_len").alias("degree")
    )
    score = F.col("degree").cast("double") / F.col("freq")
    ranked = wstat.withColumn(
        "rnk", F.row_number().over(Window.orderBy(score.desc(), F.col("word")))
    )
    return ranked.where(F.col("rnk") <= RAKE_TOP).select(
        "word",
        F.col("freq").cast("long").alias("freq"),
        F.col("degree").cast("long").alias("degree"),
        F.round(score, 6).alias("rake_score"),
        F.col("rnk").cast("long").alias("rnk"),
    )


# ------------------------------------------------- vocabulary overlap

_VOCAB_OVERLAP_ORACLE = """
WITH vocab AS (
    SELECT DISTINCT source, word FROM (
        SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
    )
), vsize AS (
    SELECT source, count(*) AS v FROM vocab GROUP BY source
), inter AS (
    SELECT a.source AS source_a, b.source AS source_b, count(*) AS inter
    FROM vocab a JOIN vocab b
      ON a.word = b.word AND a.source < b.source
    GROUP BY 1, 2
)
SELECT i.source_a, i.source_b,
       CAST(i.inter AS BIGINT) AS inter,
       CAST(va.v AS BIGINT) AS vocab_a, CAST(vb.v AS BIGINT) AS vocab_b,
       round(CAST(i.inter AS DOUBLE) / (va.v + vb.v - i.inter), 6) AS jaccard,
       round(CAST(i.inter AS DOUBLE) / least(va.v, vb.v), 6) AS overlap_coef
FROM inter i
JOIN vsize va ON va.source = i.source_a
JOIN vsize vb ON vb.source = i.source_b
"""


@register("source_vocab_overlap", oracle=_VOCAB_OVERLAP_ORACLE)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard and Szymkiewicz-Simpson overlap
    between sources — the vocabulary-level mixing matrix (high overlap
    coefficient with asymmetric sizes = one source is a sublanguage of
    the other, a dedup/contamination smell Jaccard alone hides).

    Scale note: the pair join is keyed on word over the distinct
    (source, word) vocabulary table; fan-out per word is bounded by
    the source count squared, never the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select("source", F.explode(F.split("text", " ")).alias("word")).distinct()
    )
    vsize = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a = vocab.select(F.col("source").alias("source_a"), "word")
    b = vocab.select(F.col("source").alias("source_b"), F.col("word").alias("wb"))
    inter = (
        a.join(b, (F.col("word") == F.col("wb")) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    va = vsize.select(F.col("source").alias("sa"), F.col("v").alias("vocab_a"))
    vb = vsize.select(F.col("source").alias("sb"), F.col("v").alias("vocab_b"))
    return (
        inter.join(F.broadcast(va), F.col("sa") == F.col("source_a"))
        .join(F.broadcast(vb), F.col("sb") == F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            F.round(
                F.col("inter").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("inter").cast("double")
                / F.least(F.col("vocab_a"), F.col("vocab_b")),
                6,
            ).alias("overlap_coef"),
        )
    )


# ------------------------------------------------------- Heaps' law

_HEAPS_ORACLE = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), per_doc AS (
    SELECT doc_id, count(*) AS n_toks FROM toks GROUP BY doc_id
), first_seen AS (
    SELECT word, min(doc_id) AS first_doc FROM toks GROUP BY word
), new_words AS (
    SELECT first_doc AS doc_id, count(*) AS n_new FROM first_seen GROUP BY first_doc
), curve AS (
    SELECT p.doc_id,
           sum(p.n_toks) OVER (ORDER BY p.doc_id) AS tokens_cum,
           sum(coalesce(w.n_new, 0)) OVER (ORDER BY p.doc_id) AS vocab_cum
    FROM per_doc p LEFT JOIN new_words w ON w.doc_id = p.doc_id
), pts AS (
    SELECT doc_id, tokens_cum, vocab_cum,
           round(ln(CAST(tokens_cum AS DOUBLE)), 8) AS lx,
           round(ln(CAST(vocab_cum AS DOUBLE)), 8) AS ly
    FROM curve WHERE vocab_cum > 0
), s AS (
    SELECT count(*) AS k,
           CAST(sum(CAST(lx AS DECIMAL(18,8))) AS DOUBLE) AS sx,
           CAST(sum(CAST(ly AS DECIMAL(18,8))) AS DOUBLE) AS sy,
           CAST(sum(CAST(round(lx * lx, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(round(lx * ly, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxy
    FROM pts
)
SELECT CAST(s.k AS BIGINT) AS n_points,
       (SELECT CAST(max(tokens_cum) AS BIGINT) FROM curve) AS total_tokens,
       (SELECT CAST(max(vocab_cum) AS BIGINT) FROM curve) AS total_vocab,
       round((s.k * s.sxy - s.sx * s.sy) / (s.k * s.sxx - s.sx * s.sx), 6)
           AS heaps_beta,
       round((s.sy - ((s.k * s.sxy - s.sx * s.sy)
                      / (s.k * s.sxx - s.sx * s.sx)) * s.sx) / s.k, 6)
           AS heaps_ln_k
FROM s
"""


@register(
    "heaps_law_fit",
    oracle=_HEAPS_ORACLE,
    bounded_window="4096-doc_id buckets of the two-level prefix sum",
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V = K * n^beta over the cumulative
    vocabulary-vs-tokens curve in doc_id order: beta (and ln K) by
    log-log OLS — forecasts vocabulary (and dedup/tokenizer state) at
    a 100x corpus scale-up. Cumulative distinct uses the first-seen
    trick: one min-fold per word, then a running sum over O(docs).

    Scale note: no expanding-frame distinct anywhere; both running
    sums are the two-level bucket-parallel prefix sum
    (operators/ranks.bucketed_running_sums, 4096-doc_id buckets) — the
    O(docs) curve never single-partitions (round-6 lint) — and the fit
    is a 1-row epilogue.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    first_seen = toks.groupBy("word").agg(F.min("doc_id").alias("first_doc"))
    new_words = first_seen.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    from streams_prototyping_spark.operators.ranks import bucketed_running_sums

    curve = bucketed_running_sums(
        per_doc.join(new_words, "doc_id", "left").select(
            "doc_id",
            F.col("n_toks"),
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        ),
        F.floor(F.col("doc_id") / 4096),
        [F.col("doc_id").asc()],
        {"tokens_cum": F.col("n_toks"), "vocab_cum": F.col("n_new")},
    ).select("doc_id", "tokens_cum", "vocab_cum")
    pts = curve.where(F.col("vocab_cum") > 0).select(
        "tokens_cum",
        "vocab_cum",
        F.round(F.log(F.col("tokens_cum").cast("double")), 8).alias("lx"),
        F.round(F.log(F.col("vocab_cum").cast("double")), 8).alias("ly"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("lx").cast("decimal(18,8)")).cast("double").alias("sx"),
        F.sum(F.col("ly").cast("decimal(18,8)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("lx") * F.col("lx"), 8).cast("decimal(28,8)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("lx") * F.col("ly"), 8).cast("decimal(28,8)"))
        .cast("double")
        .alias("sxy"),
    )
    tot = curve.agg(
        F.max("tokens_cum").cast("long").alias("total_tokens"),
        F.max("vocab_cum").cast("long").alias("total_vocab"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.crossJoin(F.broadcast(tot)).select(
        F.col("k").cast("long").alias("n_points"),
        "total_tokens",
        "total_vocab",
        F.round(slope, 6).alias("heaps_beta"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 6).alias(
            "heaps_ln_k"
        ),
    )


# ------------------------------------------------ naive Bayes train + eval

_NB_ORACLE = """
WITH toks AS (
    SELECT doc_id, source, w
    FROM (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ) WHERE w <> ''
), vocab AS (
    SELECT DISTINCT w FROM toks
), vn AS (SELECT count(*) AS v FROM vocab),
src AS (
    SELECT source,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_toks
    FROM toks GROUP BY source
), total AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
cnt AS (
    SELECT w, source, count(*) AS c FROM toks GROUP BY w, source
), lik AS (
    SELECT v.w, s.source,
           round(ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE)
                    / (s.n_toks + vn.v)), 8) AS lnl
    FROM vocab v
    CROSS JOIN src s
    CROSS JOIN vn
    LEFT JOIN cnt c ON c.w = v.w AND c.source = s.source
), prior AS (
    SELECT s.source,
           round(ln(CAST(s.n_docs AS DOUBLE) / t.n), 8) AS lnp
    FROM src s CROSS JOIN total t
), tf AS (
    SELECT doc_id, source, w, count(*) AS tf FROM toks GROUP BY 1, 2, 3
), scored AS (
    SELECT t.doc_id, t.source AS actual_source, l.source AS cand,
           -- tf cast to DECIMAL(10,0): a bare bigint multiplicand makes
           -- Spark clamp (20,8)x(20,0) to (38,6), silently dropping 2 dp
           -- the oracle kept (2/400 confusion cells flipped at sf1)
           CAST(sum(CAST(l.lnl AS DECIMAL(20,8)) * CAST(t.tf AS DECIMAL(10,0)))
                AS DOUBLE)
               + max(p.lnp) AS score
    FROM tf t
    JOIN lik l ON l.w = t.w
    JOIN prior p ON p.source = l.source
    GROUP BY 1, 2, 3
), pred AS (
    SELECT doc_id, actual_source, cand AS predicted_source
    FROM (
        SELECT doc_id, actual_source, cand,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand) AS rn
        FROM scored
    ) WHERE rn = 1
)
SELECT actual_source, predicted_source, count(*) AS n_docs
FROM pred GROUP BY 1, 2
"""


@register("naive_bayes_confusion", oracle=_NB_ORACLE)
def naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes source classifier, trained AND evaluated
    distributed: Laplace-smoothed per-source word log-likelihoods plus
    doc-count log-priors, each document scored against all candidate
    sources and argmax'd (ties -> lexicographically first source), the
    resubstitution confusion matrix as output. The third member of the
    train-a-model-in-SQL family (ols_value_normal_eq: regression,
    kmeans_lloyd: clustering, this: classification) — NB is the
    classical fast quality/domain classifier over web-scale corpora.

    Determinism: ln() terms round at 8 dp then sum as exact decimals,
    so scores are order-independent and cross-engine identical; exact
    score ties fall to the source-name tie-break in both engines.

    Scale note: the model (vocab x sources likelihood grid + priors)
    is vocabulary-sized and BROADCAST; scoring is a map-side join over
    the token stream + one (doc, candidate) partial-combined fold.
    Candidate fan-out multiplies tokens by |sources| — with many
    classes you shard candidates or prune by prior, same plan shape.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", "source", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
    )

    def build_model() -> DataFrame:
        # the trained artifact: vocab x sources log-likelihood grid plus
        # per-source log-priors — built once per (session, sf) and
        # cached (the kmeans/ANN-index policy); the build derives
        # vocab/src/cnt from the token stream in one plan
        vocab = toks.select("w").distinct()
        vn = vocab.agg(F.count(F.lit(1)).alias("v"))
        src = toks.groupBy("source").agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_toks"),
        )
        total = toks.agg(F.countDistinct("doc_id").alias("n"))
        cnt = toks.groupBy("w", "source").agg(F.count(F.lit(1)).alias("c"))
        lik = (
            vocab.crossJoin(F.broadcast(src.select("source", "n_toks")))
            .crossJoin(F.broadcast(vn))
            .join(cnt, ["w", "source"], "left")
            .select(
                "w",
                "source",
                F.round(
                    F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                        / (F.col("n_toks") + F.col("v"))
                    ),
                    8,
                ).alias("lnl"),
            )
        )
        prior = src.crossJoin(F.broadcast(total)).select(
            "source",
            F.round(F.log(F.col("n_docs").cast("double") / F.col("n")), 8).alias(
                "lnp"
            ),
        )
        return lik.join(prior, "source").select(
            "w", F.col("source").alias("cand"), "lnl", "lnp"
        )

    model = shared_stage(spark, sf_dir, "nb/model", build_model)
    # score on (doc, word, tf) instead of the raw token stream: the
    # candidate fan-out then multiplies distinct doc-words, not tokens
    tf = toks.groupBy("doc_id", "source", "w").agg(F.count(F.lit(1)).alias("tf"))
    # r12 (guide §1.2 per-task work): the fold over the |sources|
    # fan-out (31.7M rows at sf1) ran a decimal(20,8)x(10,0) multiply-
    # sum — measured 25.6 s of the query's 26.5 at sf1. lnl is rounded
    # to 8 dp, so lnl·1e8 is an exact int64 (|lnl|<20 → |lnl8|<2e9;
    # per-(doc,cand) sums stay ≤ doc_tokens·2e9 ≈ 4e11, far inside
    # both int64 and double's 2^53 exact-integer range), and the long
    # multiply-add fold is order-independent and exact like the
    # decimal one. score = double(Σ)/1e8 equals the decimal-sum cast
    # bit-for-bit: both are the correctly-rounded double of the same
    # integer×10⁻⁸ (equivalence pinned by
    # tests/test_r12_optimizations.py; oracle green at sf0.01).
    lnl8 = F.round(F.col("lnl") * 1e8, 0).cast("long")
    scored = (
        tf.join(F.broadcast(model.withColumn("lnl8", lnl8)), "w")
        .groupBy("doc_id", F.col("source").alias("actual_source"), "cand")
        .agg(
            (
                (F.sum(F.col("lnl8") * F.col("tf")).cast("double") / F.lit(1e8))
                + F.max("lnp")
            ).alias("score")
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand"))
    pred = (
        scored.select(
            "doc_id", "actual_source", "cand", F.row_number().over(w_rank).alias("rn")
        )
        .where(F.col("rn") == 1)
    )
    return pred.groupBy(
        "actual_source", F.col("cand").alias("predicted_source")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


# ------------------------------------------- log-odds word shift

FW_SRC_A = "src0"
FW_SRC_B = "src1"
FW_ALPHA0 = 100.0  # Dirichlet prior mass (informative, background-shaped)
FW_TOP = 15

_FW_ORACLE = f"""
WITH toks AS (
    SELECT source, w FROM (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ) WHERE w <> ''
), bg AS (
    SELECT w, count(*) AS yw FROM toks GROUP BY w
), bgn AS (SELECT count(*) AS n FROM toks),
cnt AS (
    SELECT w,
           sum(CASE WHEN source = '{FW_SRC_A}' THEN 1 ELSE 0 END) AS y1,
           sum(CASE WHEN source = '{FW_SRC_B}' THEN 1 ELSE 0 END) AS y2
    FROM toks WHERE source IN ('{FW_SRC_A}', '{FW_SRC_B}')
    GROUP BY w
), tot AS (
    SELECT sum(y1) AS n1, sum(y2) AS n2 FROM cnt
), scored AS (
    SELECT b.w,
           CAST(c.y1 AS BIGINT) AS y1, CAST(c.y2 AS BIGINT) AS y2,
           round(
             (ln((c.y1 + {FW_ALPHA0!r} * b.yw / bgn.n)
                 / (t.n1 + {FW_ALPHA0!r} - c.y1 - {FW_ALPHA0!r} * b.yw / bgn.n))
              - ln((c.y2 + {FW_ALPHA0!r} * b.yw / bgn.n)
                   / (t.n2 + {FW_ALPHA0!r} - c.y2 - {FW_ALPHA0!r} * b.yw / bgn.n)))
             / sqrt(1.0 / (c.y1 + {FW_ALPHA0!r} * b.yw / bgn.n)
                    + 1.0 / (c.y2 + {FW_ALPHA0!r} * b.yw / bgn.n)), 6) AS z
    FROM cnt c
    JOIN bg b ON b.w = c.w
    CROSS JOIN bgn CROSS JOIN tot t
)
SELECT w, y1, y2, z, rnk FROM (
    SELECT w, y1, y2, z,
           CAST(row_number() OVER (ORDER BY abs(z) DESC, w) AS BIGINT) AS rnk
    FROM scored
) WHERE rnk <= {FW_TOP}
"""


@register("log_odds_word_shift", oracle=_FW_ORACLE)
def log_odds_word_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Fightin' Words' (Monroe, Colaresi & Quinn 2008): z-scored
    log-odds word differences between two sources under an informative
    Dirichlet prior shaped by the FULL corpus — the editorially
    meaningful 'what distinguishes feed A from feed B' report, immune
    to the raw-frequency and PMI pathologies (rare words dominating).
    One source pair per invocation ({FW_SRC_A} vs {FW_SRC_B} here;
    parameterized in production).

    Determinism: counts are exact integers; the z expression is the
    same double tree in both engines, rounded at 6 dp BEFORE the
    |z|-rank (with a word tie-break), so the top-{FW_TOP} is stable.

    Scale note: two partial-combined word counts (pair + background)
    joined on the word key; the scored table is vocabulary-sized and
    the top-k is a WindowGroupLimit. O(corpus) scan, O(vocab) shuffle.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    toks = d.select("source", F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    bg = toks.groupBy("w").agg(F.count(F.lit(1)).alias("yw"))
    bgn = toks.agg(F.count(F.lit(1)).alias("n"))
    pair = toks.where(F.col("source").isin(FW_SRC_A, FW_SRC_B))
    cnt = pair.groupBy("w").agg(
        F.sum(F.when(F.col("source") == FW_SRC_A, 1).otherwise(0)).alias("y1"),
        F.sum(F.when(F.col("source") == FW_SRC_B, 1).otherwise(0)).alias("y2"),
    )
    tot = cnt.agg(F.sum("y1").alias("n1"), F.sum("y2").alias("n2"))
    j = (
        cnt.join(bg, "w")
        .crossJoin(F.broadcast(bgn))
        .crossJoin(F.broadcast(tot))
    )
    aw = F.lit(FW_ALPHA0) * F.col("yw") / F.col("n")
    delta = F.log(
        (F.col("y1") + aw) / (F.col("n1") + F.lit(FW_ALPHA0) - F.col("y1") - aw)
    ) - F.log(
        (F.col("y2") + aw) / (F.col("n2") + F.lit(FW_ALPHA0) - F.col("y2") - aw)
    )
    var = 1.0 / (F.col("y1") + aw) + 1.0 / (F.col("y2") + aw)
    scored = j.select(
        "w",
        F.col("y1").cast("long").alias("y1"),
        F.col("y2").cast("long").alias("y2"),
        F.round(delta / F.sqrt(var), 6).alias("z"),
    )
    wr = Window.orderBy(F.abs(F.col("z")).desc(), "w")
    return scored.select(
        "w", "y1", "y2", "z", F.row_number().over(wr).cast("long").alias("rnk")
    ).where(F.col("rnk") <= FW_TOP)
