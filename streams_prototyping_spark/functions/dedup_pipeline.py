"""End-to-end dedup pipeline stages: candidate pairs -> connected
components -> canonical survivor selection -> incremental arrivals.

The reference repo has no dedup at all (SURVEY §2 Part C); these are
the north-star LLM-pipeline operators that turn the pairwise detectors
in dedup.py into an actual deduplication *decision*: which documents
to keep.

- dedup_clusters: connected components over the MinHash-LSH candidate
  graph (est_jaccard >= threshold), via iterative min-label
  propagation on DataFrames. The DuckDB oracle computes the same
  components with a recursive CTE, so the fixpoint is fully checked.
- dedup_canonical: one surviving doc per cluster — the highest
  quality_score (ties -> smallest doc_id), the "keep best" policy
  every training-data pipeline applies after clustering.
- dedup_incremental: new-batch arrivals anti-joined against the
  existing corpus on exact content — the steady-state shape of a
  crawl pipeline (dedup the delta, not the world).
- winnowing_fingerprint: Schleimer et al. 2003 winnowing — per
  window of w consecutive k-gram hashes keep the minimum; the
  selected hash set is the document's plagiarism/near-dup index key.

Scale design (100 TB): label propagation shuffles O(edges) per round
and converges in O(diameter) rounds — near-dup clusters are tiny and
dense (diameter ~2-3), so rounds stay single digits even at billions
of docs; each round persists its labels and unpersists the previous
round (bounded lineage, bounded memory). Production would swap the
loop for large-star/small-star (same DataFrame ops, fewer rounds) and
checkpoint labels to a table every few rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table, widen
from streams_prototyping_spark.functions.dedup import (
    EST_JACCARD_MIN,
    K_PERMS,
    _bands_cte_duck,
    _SIGS_CTE_DUCK,
    minhash_lsh_pairs_df,
)
from streams_prototyping_spark.functions.text import _STOP_LIST_SQL
from streams_prototyping_spark.registry import register
from streams_prototyping_spark.stage_cache import shared_stage

MAX_CC_ROUNDS = 15  # raise loudly rather than return a non-fixpoint

# ----------------------------------------------------------- clusters

# DuckDB recursive twin: min reachable doc_id per node == component id.
# The edge list is exactly minhash_lsh_pairs' output (both directions).
_EST_EXPR = (
    "("
    + " + ".join(
        f"CASE WHEN sa.sig_{j} = sb.sig_{j} THEN 1 ELSE 0 END" for j in range(K_PERMS)
    )
    + f") / CAST({K_PERMS} AS DOUBLE)"
)

_CLUSTERS_CTE = (
    _SIGS_CTE_DUCK.replace("WITH shingled", "WITH RECURSIVE shingled", 1)
    + ", "
    + _bands_cte_duck()
    + f""",
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT c.doc_a, c.doc_b
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.doc_a
    JOIN sigs sb ON sb.doc_id = c.doc_b
    WHERE {_EST_EXPR} >= {EST_JACCARD_MIN}
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
    SELECT doc_id AS node, doc_id AS label FROM documents
    UNION
    SELECT e.dst AS node, r.label
    FROM reach r JOIN edges e ON e.src = r.node
),
clusters AS (
    SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
)
"""
)

_CLUSTERS_ORACLE = (
    _CLUSTERS_CTE
    + """
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM clusters
"""
)


def dedup_clusters_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) — connected components of the LSH candidate
    graph by iterative min-label propagation; persisted via shared_stage
    (consumed by dedup_clusters AND dedup_canonical)."""

    def build() -> DataFrame:
        pairs = minhash_lsh_pairs_df(spark, sf_dir).select("doc_a", "doc_b")
        edges = pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        ).toDF("src", "dst").persist()
        n_edges = edges.count()  # materialize once; also forces the persist

        labels = (
            widen(load_table(spark, sf_dir, "documents"))
            .select(F.col("doc_id"), F.col("doc_id").alias("label"))
            .persist()
        )
        prev_sum = labels.agg(F.sum("label")).collect()[0][0] or 0

        # min-label propagation: labels only ever decrease, so
        # sum(label) strictly decreases until the fixpoint — a scalar
        # convergence probe, no row-level diff join needed.
        for _ in range(MAX_CC_ROUNDS):
            if n_edges == 0:
                break
            prop = edges.join(
                labels, edges["src"] == labels["doc_id"], "inner"
            ).select(F.col("dst").alias("doc_id"), F.col("label"))
            new_labels = (
                labels.select("doc_id", "label")
                .union(prop)
                .groupBy("doc_id")
                .agg(F.min("label").alias("label"))
                .persist()
            )
            new_sum = new_labels.agg(F.sum("label")).collect()[0][0] or 0
            labels.unpersist()
            labels = new_labels
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        else:
            raise RuntimeError(
                f"dedup_clusters did not converge in {MAX_CC_ROUNDS} rounds"
            )
        # localCheckpoint materializes the fixpoint and truncates the
        # iterative lineage chain, so the per-round persists can be
        # released without risking a full recompute.
        result = labels.select(
            "doc_id", F.col("label").alias("cluster_id")
        ).localCheckpoint()
        labels.unpersist()
        edges.unpersist()
        return result

    return shared_stage(spark, sf_dir, "dedup/clusters", build, persist=False)


@register("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over the
    MinHash-LSH candidate graph (est_jaccard >= {EST_JACCARD_MIN}).
    cluster_id = min doc_id in the component; singleton docs form
    their own cluster.

    Scale note: each propagation round is one keyed shuffle of the
    O(edges) edge list against the O(docs)-row label table; rounds =
    component diameter (~2-3 for dup clusters). Labels persist per
    round with the previous round released, so lineage and memory stay
    bounded; the oracle proves the fixpoint exactly via a recursive
    CTE.
    """
    clusters = dedup_clusters_df(spark, sf_dir)
    w_cnt = F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
    return clusters.select("doc_id", "cluster_id", w_cnt.alias("cluster_size"))


# ---------------------------------------------------------- canonical

# quality score fragment (same formula as functions/text.py
# quality_score; stopword list shared via text._STOP_LIST_SQL).
_QUALITY_DUCK = f"""
quality AS (
    SELECT doc_id,
           round(0.4 * (CASE WHEN len(string_split(text, ' ')) >= 100 THEN 1.0
                             ELSE CAST(len(string_split(text, ' ')) AS DOUBLE) / 100 END)
               + 0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                        / len(string_split(text, ' ')))
               + 0.2 * (CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN ({_STOP_LIST_SQL}))) AS DOUBLE)
                        / len(string_split(text, ' '))), 6) AS q
    FROM documents
)
"""

_CANONICAL_ORACLE = (
    _CLUSTERS_CTE
    + ", "
    + _QUALITY_DUCK
    + """
SELECT cluster_id, doc_id AS canonical_doc_id, q AS canonical_quality,
       cluster_size
FROM (
    SELECT c.cluster_id, c.doc_id, quality.q,
           count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY quality.q DESC, c.doc_id) AS rn
    FROM clusters c JOIN quality ON quality.doc_id = c.doc_id
)
WHERE rn = 1
"""
)


@register("dedup_canonical", oracle=_CANONICAL_ORACLE)
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical survivor per near-duplicate cluster: the member with
    the highest quality_score (ties -> smallest doc_id). This is the
    *output* of the dedup pipeline — the kept document set.

    Scale note: one window rank over the clustered docs joined to the
    (scan-only) quality features; both sides are keyed by doc_id /
    cluster_id, no new shuffle shape beyond the clustering itself.
    """
    from streams_prototyping_spark.functions.text_transform import quality_score_col

    clusters = dedup_clusters_df(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    quality = d.select("doc_id", quality_score_col("text").alias("q"))
    joined = clusters.join(quality, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.col("q").desc(), F.col("doc_id"))
    wc = Window.partitionBy("cluster_id")
    return (
        joined.select(
            "cluster_id",
            "doc_id",
            "q",
            F.count(F.lit(1)).over(wc).alias("cluster_size"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc_id"),
            F.col("q").alias("canonical_quality"),
            "cluster_size",
        )
    )


# -------------------------------------------------------- incremental

_INCREMENTAL_ORACLE = """
SELECT n.doc_id, md5(n.text) AS text_md5
FROM documents n
WHERE n.doc_id % 10 = 0
  AND NOT EXISTS (
      SELECT 1 FROM documents c
      WHERE c.doc_id % 10 <> 0 AND c.text = n.text
  )
"""


@register("dedup_incremental", oracle=_INCREMENTAL_ORACLE)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (delta) dedup: treat doc_id % 10 = 0 as the newly
    arrived batch and anti-join it against the existing corpus on
    exact content — new docs that survive are genuinely novel.

    Scale note: the steady-state crawl shape — the delta is small, the
    corpus fingerprint table is huge, and the LEFT ANTI equi-join on
    content hash shuffles only the delta plus matching corpus keys
    (AQE broadcasts the delta side when it fits). In production the
    corpus side is the checkpointed fingerprint table, bucketed by
    hash so the probe is shuffle-free.
    """
    d = load_table(spark, sf_dir, "documents")
    arrivals = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    return (
        arrivals.join(corpus, arrivals["text"] == corpus["text"], "left_anti")
        .select("doc_id", F.md5("text").alias("text_md5"))
    )


# --------------------------------------------------------- winnowing

WINNOW_W = 4  # window of consecutive k-gram hashes; k = 3 words

# non-distinct, in-order trigram list (winnowing needs positions, so
# dedup.py's distinct shingle set does not apply).
_GRAMS_SPARK = """
CASE WHEN size(split(text, ' ')) >= 3
     THEN zip_with(
         zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 2),
                  slice(split(text, ' '), 2, size(split(text, ' ')) - 2),
                  (a, b) -> concat(a, ' ', b)),
         slice(split(text, ' '), 3, size(split(text, ' ')) - 2),
         (ab, c) -> concat(ab, ' ', c))
     ELSE array(text) END
"""

_GRAMS_DUCK = """
CASE WHEN len(string_split(text, ' ')) >= 3
     THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
                         i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))
     ELSE [text] END
"""

# r11: hoisted twin of _GRAMS_SPARK over a pre-projected `_w` word
# array (consumers project split(text) once per row alongside text) —
# the single-expression form evaluates split(text) six times per row,
# and the zip_with tree is interpreted (no subexpression elimination).
# Same gram list, same output.
#
# CONSUMER CONTRACT (ADVICE r11): a projection feeding this template
# must carry BOTH `_w` (the split(text) array) AND the original `text`
# column — the short-document ELSE branch references text directly; a
# consumer projecting only `_w` fails analysis with an unresolved-
# column error far from this definition. Same contract for
# _BIGRAMS_W_SPARK's ELSE branch.
_GRAMS_W_SPARK = """
CASE WHEN size(_w) >= 3
     THEN zip_with(
         zip_with(slice(_w, 1, size(_w) - 2),
                  slice(_w, 2, size(_w) - 2),
                  (a, b) -> concat(a, ' ', b)),
         slice(_w, 3, size(_w) - 2),
         (ab, c) -> concat(ab, ' ', c))
     ELSE array(text) END
"""

_WINNOW_ORACLE = f"""
WITH hashed AS (
    SELECT doc_id,
           list_transform({_GRAMS_DUCK}, s ->
               CAST('0x' || substr(md5('win:' || s), 1, 15) AS BIGINT)) AS hashes
    FROM documents
), windowed AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, greatest(len(hashes) - {WINNOW_W} + 1, 1) + 1),
               i -> list_min(hashes[i:i+{WINNOW_W - 1}]))) AS fps
    FROM hashed
)
SELECT doc_id, unnest(fps) AS fingerprint FROM windowed
"""


def winnow_fps_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fingerprint) — the winnowing index rows, one per
    distinct selected hash per doc. Shared by winnowing_fingerprint
    and the decontamination overlap join (functions/curation.py).

    r12: the EXPLODED index is the shared stage (it was the hash
    arrays before, with the window-min selection recomputed per
    consumer reference — decontamination_overlap references the fps
    frame on BOTH join sides, so the interpreted window-min HOF ran
    twice per execution). The fingerprint index is the artifact a
    production pipeline checkpoints; its build cost is published in
    the bench's stage_build_sec."""

    def build() -> DataFrame:
        d = widen(load_table(spark, sf_dir, "documents"))
        hashed = d.select(
            "doc_id", "text", F.split("text", " ").alias("_w")
        ).select(
            "doc_id",
            F.expr(
                f"transform({_GRAMS_W_SPARK}, s -> "
                "CAST(conv(substring(md5(concat('win:', s)), 1, 15), 16, 10) AS BIGINT))"
            ).alias("hashes"),
        )
        fps = F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size("hashes") - WINNOW_W + 1, F.lit(1)),
                ),
                lambda i: F.array_min(F.slice("hashes", i, WINNOW_W)),
            )
        )
        return hashed.select("doc_id", F.explode(fps).alias("fingerprint"))

    return shared_stage(spark, sf_dir, "dedup/winnow_fps", build)


@register("winnowing_fingerprint", oracle=_WINNOW_ORACLE)
def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): hash every word-trigram in order, slide a window of
    {WINNOW_W} consecutive hashes, keep each window's minimum, emit the
    distinct selected hashes. Guarantees any shared run of
    {WINNOW_W + 2} words between two docs shares a fingerprint —
    the positional near-dup index complementing MinHash's set sketch.

    Scale note: pure per-row array expressions (one md5 per trigram,
    computed once into an array, then O(n·w) mins) followed by a
    generator explode — no shuffle; the fingerprint index table
    (fingerprint -> doc) is the groupBy consumers build on top.
    """
    return winnow_fps_df(spark, sf_dir)


# -------------------------------------------------- dedup savings report

_SAVINGS_ORACLE = (
    _CLUSTERS_CTE
    + """
, sized AS (
    SELECT c.cluster_id, count(*) AS cluster_size,
           sum(d.n_chars) AS chars_total,
           max(d.n_chars) AS chars_kept
    FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
    GROUP BY c.cluster_id
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       count(*) AS n_clusters,
       CAST(sum(cluster_size - 1) AS BIGINT) AS docs_removable,
       CAST(sum(chars_total - chars_kept) AS BIGINT) AS chars_removable
FROM sized GROUP BY cluster_size
"""
)


@register("dedup_savings_report", oracle=_SAVINGS_ORACLE)
def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup business case, by cluster size: how many clusters of
    each size exist, how many documents deduplication would remove
    (size-1 per cluster, keeping one survivor) and how many characters
    that saves under a keep-the-largest policy — the report that
    decides whether the dedup pipeline is worth its compute at the
    next scale-up (heavy tail of big clusters = yes).

    Scale note: consumes the SHARED cluster stage (one label
    propagation per session) joined to a doc-size projection; the
    report is O(distinct cluster sizes) after two keyed folds.
    """
    d = widen(load_table(spark, sf_dir, "documents")).select("doc_id", "n_chars")
    clusters = dedup_clusters_df(spark, sf_dir)
    sized = (
        clusters.join(d, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.sum("n_chars").alias("chars_total"),
            F.max("n_chars").alias("chars_kept"),
        )
    )
    return sized.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("cluster_size") - 1).cast("long").alias("docs_removable"),
        F.sum(F.col("chars_total") - F.col("chars_kept"))
        .cast("long")
        .alias("chars_removable"),
    ).select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "n_clusters",
        "docs_removable",
        "chars_removable",
    )
