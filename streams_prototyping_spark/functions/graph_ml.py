"""Graph-ML operators over the co-purchase graph: link prediction,
bounded k-core decomposition, and the degree-distribution health
profile — extending the graph family (cc_star_contraction,
pagerank_parts, triangle_count) with the analysis layer.

- jaccard_link_prediction: common-neighbor Jaccard scores for
  NON-adjacent node pairs at distance 2 — the classic link-prediction
  baseline (Liben-Nowell & Kleinberg). All-integer sufficient
  statistics (|common|, degrees), global top-20 with id tie-breaks.
- k_core_decomposition: nodes of the 3-core via synchronous peeling,
  bounded at {KCORE_ROUNDS} rounds (the distributed-peeling round
  budget), with an honest `converged` flag computed from the final
  state rather than assumed.
- degree_distribution: degree histogram plus the log-log OLS slope
  (power-law exponent estimate) — the skew profile that predicts
  which graph joins need salting.

Reference parity: no graph surface in the reference (408 Java LoC);
SURVEY.md Part C″ extension. Edge build matches triangle_count
(`functions/graph.py:366`): co-purchase edges with >= {PR_MIN_CO}
shared orders.

Scale design (100 TB):
- link prediction: the wedge join fans out per CENTER node as
  deg^2/2; at production scale hub centers are thresholded or
  down-sampled (documented cap) — here the co-purchase degree cap
  keeps it exact. The candidate anti-join and degree joins are keyed.
- k-core: each peel round is one degree fold + one semi-join filter
  over a SHRINKING edge list, persisted per round (the cc_star
  pattern); rounds are bounded, state is O(edges).
- degree distribution: two keyed folds; the OLS fit runs over
  O(distinct degrees) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


from streams_prototyping_spark.functions.graph import PR_MIN_CO, copurchase_und_df
from streams_prototyping_spark.registry import register
from streams_prototyping_spark.stage_cache import shared_stage

KCORE_K = 3
KCORE_ROUNDS = 6
LINKPRED_TOP = 20

_UND_SQL = f"""
baskets AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), und AS MATERIALIZED (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM baskets a JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {PR_MIN_CO}
)"""


# the canonical co-purchase edge list is the stage shared by the whole
# graph family — built once per (session, sf) in functions/graph.py


def _bidir(und: DataFrame) -> DataFrame:
    return und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


# ------------------------------------------------- link prediction

_LINKPRED_ORACLE = f"""
WITH {_UND_SQL},
adj AS (
    SELECT src, dst FROM und
    UNION ALL
    SELECT dst AS src, src AS dst FROM und
), deg AS (
    SELECT src AS node, count(*) AS d FROM adj GROUP BY src
), wedge AS (
    SELECT a1.dst AS a, a2.dst AS c, count(*) AS cn
    FROM adj a1 JOIN adj a2
      ON a1.src = a2.src AND a1.dst < a2.dst
    GROUP BY 1, 2
), cand AS (
    SELECT w.a, w.c, w.cn
    FROM wedge w
    WHERE NOT EXISTS (
        SELECT 1 FROM und e WHERE e.src = w.a AND e.dst = w.c
    )
), scored AS (
    SELECT cand.a AS node_a, cand.c AS node_b,
           CAST(cand.cn AS BIGINT) AS common_neighbors,
           CAST(da.d AS BIGINT) AS deg_a, CAST(dc.d AS BIGINT) AS deg_b,
           CAST(cand.cn AS DOUBLE) / (da.d + dc.d - cand.cn) AS jac
    FROM cand
    JOIN deg da ON da.node = cand.a
    JOIN deg dc ON dc.node = cand.c
)
SELECT node_a, node_b, common_neighbors, deg_a, deg_b,
       round(jac, 6) AS jaccard
FROM scored
ORDER BY jac DESC, node_a, node_b
LIMIT {LINKPRED_TOP}
"""


@register("jaccard_link_prediction", oracle=_LINKPRED_ORACLE)
def jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{LINKPRED_TOP} predicted links: non-adjacent pairs at
    distance 2 ranked by neighborhood Jaccard |Γa∩Γc| / |Γa∪Γc|.
    Sufficient statistics are integers; the ranking division is one
    deterministic double per pair with id tie-breaks.

    Scale note: the wedge join is keyed on the center node (deg^2
    fan-out per center — hub thresholds apply at production scale,
    see module docstring); the existing-edge removal is a keyed
    anti-join; TakeOrdered keeps {LINKPRED_TOP} rows.
    """
    und = copurchase_und_df(spark, sf_dir)
    adj = _bidir(und)
    deg = adj.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    a1, a2 = adj.alias("a1"), adj.alias("a2")
    wedge = (
        a1.join(
            a2,
            (F.col("a1.src") == F.col("a2.src"))
            & (F.col("a1.dst") < F.col("a2.dst")),
        )
        .groupBy(F.col("a1.dst").alias("a"), F.col("a2.dst").alias("c"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    cand = wedge.join(
        und,
        (wedge["a"] == und["src"]) & (wedge["c"] == und["dst"]),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("na"), F.col("d").alias("deg_a"))
    dc = deg.select(F.col("node").alias("nc"), F.col("d").alias("deg_b"))
    scored = (
        cand.join(F.broadcast(da), F.col("na") == F.col("a"))
        .join(F.broadcast(dc), F.col("nc") == F.col("c"))
        .select(
            F.col("a").alias("node_a"),
            F.col("c").alias("node_b"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.col("deg_a").cast("long").alias("deg_a"),
            F.col("deg_b").cast("long").alias("deg_b"),
            (
                F.col("cn").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("cn"))
            ).alias("jac"),
        )
    )
    return (
        scored.orderBy(F.col("jac").desc(), "node_a", "node_b")
        .limit(LINKPRED_TOP)
        .select(
            "node_a",
            "node_b",
            "common_neighbors",
            "deg_a",
            "deg_b",
            F.round("jac", 6).alias("jaccard"),
        )
    )


# ------------------------------------------------------------ k-core

def _kcore_round_sql(r: int) -> str:
    prev = "und" if r == 0 else f"e{r - 1}"
    # AS MATERIALIZED: DuckDB would otherwise inline each CTE into its
    # 3 use sites, expanding the unrolled peel to 3^rounds base scans
    return f"""
d{r} AS MATERIALIZED (
    SELECT node, count(*) AS d FROM (
        SELECT src AS node FROM {prev} UNION ALL SELECT dst FROM {prev}
    ) GROUP BY node
), keep{r} AS MATERIALIZED (
    SELECT node FROM d{r} WHERE d >= {KCORE_K}
), e{r} AS MATERIALIZED (
    SELECT e.src, e.dst FROM {prev} e
    JOIN keep{r} ka ON ka.node = e.src
    JOIN keep{r} kb ON kb.node = e.dst
)"""


_KCORE_ORACLE = (
    f"WITH {_UND_SQL},\n"
    + ",\n".join(_kcore_round_sql(r).strip() for r in range(KCORE_ROUNDS))
    + f""",
fdeg AS (
    SELECT node, count(*) AS core_degree FROM (
        SELECT src AS node FROM e{KCORE_ROUNDS - 1}
        UNION ALL SELECT dst FROM e{KCORE_ROUNDS - 1}
    ) GROUP BY node
), conv AS (
    SELECT CASE WHEN count(*) = 0 THEN true ELSE false END AS converged
    FROM fdeg WHERE core_degree < {KCORE_K}
)
SELECT f.node, CAST(f.core_degree AS BIGINT) AS core_degree, c.converged
FROM fdeg f CROSS JOIN conv c
"""
)


@register("k_core_decomposition", oracle=_KCORE_ORACLE)
def k_core_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core of the co-purchase graph by synchronous peeling,
    bounded at {KCORE_ROUNDS} rounds: each round drops nodes with
    degree < {KCORE_K} and the edges touching them. The `converged`
    flag reports whether the final state is a true fixpoint (no
    surviving node below {KCORE_K}) — honest bounded iteration, the
    same contract as bfs_reachability's hop bound.

    Scale note: each round is one degree fold plus two keyed
    semi-joins over a SHRINKING edge list, eagerly localCheckpoint'ed
    per round (lineage truncation — the round plan references the edge
    list three times, so an untruncated plan grows 3^rounds). State
    never exceeds O(current edges).
    """

    def build() -> DataFrame:
        edges = copurchase_und_df(spark, sf_dir)
        for _ in range(KCORE_ROUNDS):
            deg = (
                edges.select(F.col("src").alias("node"))
                .unionAll(edges.select(F.col("dst").alias("node")))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("d"))
            )
            keep = deg.where(F.col("d") >= KCORE_K).select("node")
            ka = keep.select(F.col("node").alias("ka"))
            kb = keep.select(F.col("node").alias("kb"))
            # localCheckpoint (eager) truncates lineage each round —
            # the round plan references `edges` three times, so without
            # truncation the logical plan grows 3^rounds
            edges = (
                edges.join(ka, F.col("ka") == F.col("src"))
                .join(kb, F.col("kb") == F.col("dst"))
                .select("src", "dst")
                .localCheckpoint()
            )
        fdeg = (
            edges.select(F.col("src").alias("node"))
            .unionAll(edges.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_degree"))
        )
        conv = fdeg.agg(
            (
                F.count(F.when(F.col("core_degree") < KCORE_K, 1)) == 0
            ).alias("converged")
        )
        return (
            fdeg.crossJoin(F.broadcast(conv))
            .select(
                "node",
                F.col("core_degree").cast("long").alias("core_degree"),
                "converged",
            )
            .localCheckpoint()
        )

    return shared_stage(spark, sf_dir, "graph_ml/kcore", build, persist=False)


# ----------------------------------------------- degree distribution

_DEGDIST_ORACLE = f"""
WITH {_UND_SQL},
deg AS (
    SELECT node, count(*) AS d FROM (
        SELECT src AS node FROM und UNION ALL SELECT dst FROM und
    ) GROUP BY node
), hist AS (
    SELECT d AS degree, count(*) AS n_nodes FROM deg GROUP BY d
), pts AS (
    SELECT degree, n_nodes,
           round(ln(CAST(degree AS DOUBLE)), 8) AS lx,
           round(ln(CAST(n_nodes AS DOUBLE)), 8) AS ly
    FROM hist
), s AS (
    SELECT count(*) AS k,
           CAST(sum(CAST(lx AS DECIMAL(18,8))) AS DOUBLE) AS sx,
           CAST(sum(CAST(ly AS DECIMAL(18,8))) AS DOUBLE) AS sy,
           CAST(sum(CAST(round(lx * lx, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(round(lx * ly, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxy
    FROM pts
)
SELECT p.degree, CAST(p.n_nodes AS BIGINT) AS n_nodes,
       CAST(s.k AS BIGINT) AS n_points,
       round((s.k * s.sxy - s.sx * s.sy) / (s.k * s.sxx - s.sx * s.sx), 6)
           AS loglog_slope
FROM pts p CROSS JOIN s
"""


@register("degree_distribution", oracle=_DEGDIST_ORACLE)
def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-purchase graph with the log-log OLS
    slope (power-law exponent estimate ~ -alpha) on every row — the
    skew health profile that predicts which graph joins need salting.
    Log points are round-before-use; OLS sums are decimal folds.

    Scale note: two keyed folds (node degree, then histogram); the
    regression runs over O(distinct degrees) rows — tens, at any
    corpus size.
    """
    und = copurchase_und_df(spark, sf_dir)
    deg = (
        _bidir(und)
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    hist = deg.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    pts = hist.select(
        "degree",
        "n_nodes",
        F.round(F.log(F.col("degree").cast("double")), 8).alias("lx"),
        F.round(F.log(F.col("n_nodes").cast("double")), 8).alias("ly"),
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
    return pts.crossJoin(F.broadcast(s)).select(
        "degree",
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("k").cast("long").alias("n_points"),
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("loglog_slope"),
    )


# ----------------------------------------------- label propagation

LP_ROUNDS = 3


def _lp_round_cte(t: int) -> str:
    prev = f"lab{t - 1}"
    return f"""nl{t} AS (
    SELECT e.dst AS node, l.community, count(*) AS c
    FROM edges e JOIN {prev} l ON l.node = e.src
    GROUP BY 1, 2
), lab{t} AS (
    SELECT node, community FROM (
        SELECT node, community,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, community) AS rn
        FROM nl{t}
    ) WHERE rn = 1
)"""


_LP_ORACLE = (
    f"WITH {_UND_SQL},\n"
    + """edges AS (
    SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und
), lab0 AS (
    SELECT src AS node, src AS community FROM edges GROUP BY src
),
"""
    + ",\n".join(_lp_round_cte(t) for t in range(1, LP_ROUNDS + 1))
    + f"""
SELECT CAST(l.node AS BIGINT) AS part_key,
       CAST(l.community AS BIGINT) AS community,
       CAST(s.sz AS BIGINT) AS community_size
FROM lab{LP_ROUNDS} l
JOIN (SELECT community, count(*) AS sz FROM lab{LP_ROUNDS} GROUP BY 1) s
  ON s.community = l.community
"""
)


@register("label_prop_communities", oracle=_LP_ORACLE)
def label_prop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation ({LP_ROUNDS} fixed rounds) over
    the co-purchase graph: every node starts as its own community and
    each round adopts the most frequent label among its neighbors
    (ties -> smallest label, so the trajectory is deterministic and
    cross-engine identical — the usual random tie-break is what makes
    vanilla LPA non-reproducible). Emits (node, community,
    community_size) — the communities detector, where
    cc_star_contraction only finds connectivity.

    Scale note: each round is one keyed edge join + per-node majority
    (a groupBy + WindowGroupLimit top-1) — the same shuffle shape as
    one PageRank iteration, O(edges) per round with bounded rounds;
    per-round localCheckpoint truncates lineage exactly as the
    cc_star/k-core loops do.
    """
    und = copurchase_und_df(spark, sf_dir)
    edges = und.union(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    lab = edges.groupBy("src").agg(F.lit(0)).select(
        F.col("src").alias("node"), F.col("src").alias("community")
    )
    # r11 (the pagerank_parts pattern, guide §1.2/§2.6): the rounds form
    # a LINEAR DAG — each lab_t is referenced exactly once by lab_{t+1}
    # — so the per-round eager localCheckpoint only cost a blocking
    # driver action per hop. The chain now builds lazily and
    # materializes ONCE at the final checkpoint (edges stays
    # checkpointed — it IS referenced every round); the final lab is
    # checkpointed because sizes + the output join consume it twice.
    for _ in range(LP_ROUNDS):
        prev = lab.select(F.col("node").alias("lnode"), "community")
        nl = (
            edges.join(prev, edges["src"] == prev["lnode"])
            .groupBy(F.col("dst").alias("node"), "community")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("community"))
        lab = (
            nl.select("node", "community", F.row_number().over(w).alias("rn"))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
    lab = lab.localCheckpoint()
    sizes = lab.groupBy("community").agg(F.count(F.lit(1)).alias("sz"))
    return lab.join(sizes, "community").select(
        F.col("node").cast("long").alias("part_key"),
        F.col("community").cast("long").alias("community"),
        F.col("sz").cast("long").alias("community_size"),
    )


# ----------------------------------------------- community modularity

def _modularity_oracle() -> str:
    rounds = ",\n".join(_lp_round_cte(t) for t in range(1, LP_ROUNDS + 1))
    return (
        f"WITH {_UND_SQL},\n"
        + """edges AS (
    SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und
), lab0 AS (
    SELECT src AS node, src AS community FROM edges GROUP BY src
),
"""
        + rounds
        + f""",
labf AS MATERIALIZED (SELECT node, community FROM lab{LP_ROUNDS}),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
intra AS (
    SELECT ca.community, count(*) AS e_c
    FROM und u
    JOIN labf ca ON ca.node = u.src
    JOIN labf cb ON cb.node = u.dst
    WHERE ca.community = cb.community
    GROUP BY ca.community
), deg AS (
    SELECT l.community, count(*) AS d_c
    FROM edges e JOIN labf l ON l.node = e.src
    GROUP BY l.community
), sizes AS (
    SELECT community, count(*) AS sz FROM labf GROUP BY community
), terms AS (
    SELECT s.community, s.sz, coalesce(i.e_c, 0) AS e_c, d.d_c,
           round(CAST(coalesce(i.e_c, 0) AS DOUBLE) / m.m
                 - (CAST(d.d_c AS DOUBLE) / (2 * m.m))
                   * (CAST(d.d_c AS DOUBLE) / (2 * m.m)), 12) AS contribution
    FROM sizes s
    LEFT JOIN intra i ON i.community = s.community
    JOIN deg d ON d.community = s.community
    CROSS JOIN m
), q AS (
    SELECT round(CAST(sum(CAST(contribution AS DECIMAL(16,12))) AS DOUBLE), 6)
               AS modularity
    FROM terms
)
SELECT CAST(t.community AS BIGINT) AS community,
       CAST(t.sz AS BIGINT) AS size,
       CAST(t.e_c AS BIGINT) AS intra_edges,
       CAST(t.d_c AS BIGINT) AS degree_sum,
       t.contribution, q.modularity
FROM terms t CROSS JOIN q
"""
    )


@register("community_modularity", oracle=_modularity_oracle())
def community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation communities — the
    standard did-the-detector-find-real-structure score: Q = sum over
    communities of e_c/m - (d_c/2m)^2 (intra-edge fraction minus the
    random-graph expectation at the same degrees). Emits the
    per-community decomposition (size, intra edges, degree mass,
    contribution) with the global Q on every row — the table that says
    WHICH communities carry the structure, not just whether Q > 0.

    Determinism: every input is an exact integer count; contributions
    are one identical double expression rounded at 12 dp and summed as
    exact decimals, so the engines' aggregation orders cannot fork Q.

    Scale design: the communities table comes from the shared
    fixed-round LPA (localCheckpointed per round); intra-edge counting
    is two keyed joins of the edge list against it (O(edges)); degree
    mass is one keyed fold. The per-community table is O(communities)
    — already bounded by the detector's output.
    """
    comm = label_prop_communities(spark, sf_dir).select(
        F.col("part_key").alias("node"), "community"
    ).localCheckpoint()
    und = copurchase_und_df(spark, sf_dir)
    m = und.agg(F.count(F.lit(1)).alias("m"))
    ca = comm.select(F.col("node").alias("src"), F.col("community").alias("c_src"))
    cb = comm.select(F.col("node").alias("dst"), F.col("community").alias("c_dst"))
    intra = (
        und.join(ca, "src")
        .join(cb, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("community"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    deg = (
        _bidir(und)
        .join(comm.select(F.col("node").alias("src"), "community"), "src")
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("d_c"))
    )
    sizes = comm.groupBy("community").agg(F.count(F.lit(1)).alias("sz"))
    half = F.col("d_c").cast("double") / (2 * F.col("m"))
    terms = (
        sizes.join(intra, "community", "left")
        .join(deg, "community")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "sz",
            F.coalesce("e_c", F.lit(0)).alias("e_c"),
            "d_c",
            F.round(
                F.coalesce("e_c", F.lit(0)).cast("double") / F.col("m")
                - half * half,
                12,
            ).alias("contribution"),
        )
        # terms is consumed twice (the global-Q aggregate and the output
        # join); without a barrier the whole intra/deg/sizes join subtree
        # executes twice (r11 before-plan: 48 Exchanges). O(communities)
        # rows — the checkpoint is tiny.
        .localCheckpoint()
    )
    q = terms.agg(
        F.round(
            F.sum(F.col("contribution").cast("decimal(16,12)")).cast("double"), 6
        ).alias("modularity")
    )
    return terms.crossJoin(F.broadcast(q)).select(
        F.col("community").cast("long").alias("community"),
        F.col("sz").cast("long").alias("size"),
        F.col("e_c").cast("long").alias("intra_edges"),
        F.col("d_c").cast("long").alias("degree_sum"),
        "contribution",
        "modularity",
    )
