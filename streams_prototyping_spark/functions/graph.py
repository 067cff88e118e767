"""Distributed graph primitives: star-contraction connected components
and deterministic PageRank.

`dedup_clusters` (dedup_pipeline.py) uses plain min-label propagation,
whose round count is the component DIAMETER — fine for near-dup
clusters (dense, diameter 2-3), wrong for long-chain graphs. The
scale-canonical alternative is alternating large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce and
Beyond", SOCC'14): O(log n) rounds on ANY graph shape, each round two
keyed shuffles over the current edge list. `cc_star_contraction`
implements it on DataFrames against the same LSH candidate graph and
is oracle-checked against the same recursive-CTE fixpoint, so both
algorithms are proven to compute identical components.

`pagerank_parts` runs a fixed 5-iteration damped PageRank over the
co-purchase part graph. Engine determinism for an iterative float
algorithm follows the kmeans_lloyd recipe (REFLECTION round 2): every
per-edge contribution is rounded THEN decimal-summed (order-free
exact), and each iteration's rank is re-rounded before use, so Spark
and DuckDB walk bit-identical trajectories.

Scale design (100 TB): both algorithms shuffle O(edges) per round with
partial map-side combines; neither materializes anything super-linear
in the edge list. PageRank's per-iteration state is one (node, rank)
table persisted and released round-over-round; star contraction's edge
list shrinks monotonically toward the star forest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table, widen
from streams_prototyping_spark.functions.dedup import minhash_lsh_pairs_df
from streams_prototyping_spark.functions.dedup_pipeline import _CLUSTERS_ORACLE
from streams_prototyping_spark.registry import register
from streams_prototyping_spark.stage_cache import (
    shared_stage,
    track_local_checkpoint,
)

MAX_STAR_ROUNDS = 15  # raise loudly rather than return a non-fixpoint


# ------------------------------------- large-star / small-star CC


def _canon(df: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (a < b), no self-loops, distinct."""
    return (
        df.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _bidir(und: DataFrame) -> DataFrame:
    return und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _mins(und: DataFrame) -> DataFrame:
    """(src, m) where m = min(neighbors(src) ∪ {src})."""
    return (
        _bidir(und)
        .groupBy("src")
        .agg(F.min("dst").alias("mnd"))
        .select("src", F.least("mnd", "src").alias("m"))
    )


def cc_star_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) via alternating large-star/small-star.

    Each alternation: large-star hangs every strictly-larger neighbor
    of u onto m(u); small-star hangs every smaller neighbor (and u)
    onto m(u). Edges only ever rewire toward smaller ids, so per-node
    min labels are monotone non-increasing; convergence is verified
    EXACTLY by checking the label assignment is a fixpoint over the
    ORIGINAL edge list (one O(edges) join), not inferred from a probe.
    """

    def build() -> DataFrame:
        # localCheckpoint (not persist): persist caches BLOCKS but the
        # logical plan is still re-analyzed whole every round, and this
        # loop's lineage DOUBLES per round (_bidir/_canon each reference
        # their input twice) — at sf1 Catalyst spent 87 s optimizing the
        # round-2 fixpoint join over 3.5k cached rows. Checkpointing
        # truncates the plan to a leaf each round: 161 s -> ~8 s.
        orig = _canon(
            minhash_lsh_pairs_df(spark, sf_dir).select(
                F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
            )
        ).localCheckpoint()
        n_orig = orig.count()

        docs = widen(load_table(spark, sf_dir, "documents")).select("doc_id").persist()

        und = orig
        for _ in range(MAX_STAR_ROUNDS):
            if n_orig == 0:
                break
            # ---- large-star: {(v, m(u)) : v ∈ Γ(u), v > u}
            mins = _mins(und)
            large = _canon(
                _bidir(und)
                .filter(F.col("dst") > F.col("src"))
                .join(mins, "src")
                .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            )
            # ---- small-star: {(v, m(u)) : v ∈ Γ(u), v ≤ u} ∪ {(u, m(u))}
            mins2 = _mins(large)
            small = _canon(
                _bidir(large)
                .filter(F.col("dst") < F.col("src"))
                .join(mins2, "src")
                .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                .union(mins2.select(F.col("src"), F.col("m").alias("dst")))
            ).localCheckpoint()  # eager: materializes AND truncates lineage
            und = small

            # exact fixpoint check against the ORIGINAL edges: every
            # endpoint pair must map to the same label.
            labels = _mins(und)
            bad = (
                orig.join(
                    labels.select(F.col("src").alias("a"), F.col("m").alias("la")),
                    orig["src"] == F.col("a"),
                )
                .join(
                    labels.select(F.col("src").alias("b"), F.col("m").alias("lb")),
                    orig["dst"] == F.col("b"),
                )
                .filter(F.col("la") != F.col("lb"))
                .limit(1)
                .count()
            )
            if bad == 0:
                break
        else:
            raise RuntimeError(
                f"cc_star_contraction did not converge in {MAX_STAR_ROUNDS} rounds"
            )

        labels = _mins(und) if n_orig else und.sparkSession.createDataFrame(
            [], "src bigint, m bigint"
        )
        result = (
            docs.join(labels, docs["doc_id"] == labels["src"], "left")
            .select(
                "doc_id",
                F.coalesce(F.col("m"), F.col("doc_id")).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        # checkpointed round frames are tiny (O(edge-list) rows) and few
        # (<= MAX_STAR_ROUNDS); their blocks are left to session GC
        docs.unpersist()
        return result

    return shared_stage(spark, sf_dir, "graph/cc_star", build, persist=False)


@register("cc_star_contraction", oracle=_CLUSTERS_ORACLE)
def cc_star_contraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the MinHash-LSH candidate graph via
    alternating large-star/small-star contraction — the O(log n)-round
    algorithm that replaces diameter-bounded label propagation on
    graphs with long chains. Same output contract as `dedup_clusters`
    (cluster_id = min doc_id of the component; singletons keep their
    own id), checked against the same recursive-CTE oracle — the two
    algorithms are mutually verifying.

    Scale note: each round is two keyed shuffles over the CURRENT edge
    list, which shrinks monotonically toward the star forest; the
    convergence test is an exact O(edges) fixpoint join, not a
    heuristic probe.
    """
    clusters = cc_star_df(spark, sf_dir)
    w_cnt = F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
    return clusters.select("doc_id", "cluster_id", w_cnt.alias("cluster_size"))


# --------------------------------------------------------- PageRank

PR_ITERS = 5
PR_MIN_CO = 2  # co-purchase edge threshold (co_count >= 2)
PR_SCALE = 10**9           # fixed-point: rank 1.0 == 10^9
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100       # damping 0.85 as a ratio
PR_TELEPORT_NUM = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN  # 0.15*scale

def copurchase_und_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (src < dst) co-purchase edge list (pairs bought
    together in >= PR_MIN_CO orders), shared per session: pagerank,
    triangle counting, BFS, k-core, link prediction and the degree
    profile all consume the SAME materialized stage, so the expensive
    basket self-join runs once per (session, sf) — the checkpointed
    edge table a production deployment would maintain."""

    def build() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        baskets = li.select("l_orderkey", "l_partkey").distinct()
        a, b = baskets.alias("a"), baskets.alias("b")
        return (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
            )
            .agg(F.count(F.lit(1)).alias("co"))
            .filter(F.col("co") >= PR_MIN_CO)
            .select("src", "dst")
            .localCheckpoint()
        )

    return shared_stage(spark, sf_dir, "graph/copurchase_und", build, persist=False)


_PR_EDGES_CTE = f"""
baskets AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), und AS MATERIALIZED (
    -- MATERIALIZED: every iteration CTE below references edges/deg/nn;
    -- DuckDB inlines plain CTEs, re-running this corpus-sized basket
    -- self-join once per reference (observed: >50 GB of spill at sf1)
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM baskets a JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {PR_MIN_CO}
), edges AS MATERIALIZED (
    SELECT src, dst FROM und UNION ALL SELECT dst AS src, src AS dst FROM und
), deg AS MATERIALIZED (
    SELECT src AS node, count(*) AS degree FROM edges GROUP BY 1
), nn AS MATERIALIZED (
    SELECT count(*) AS n FROM deg
)"""


def _pr_iter_cte(i: int) -> str:
    prev = f"pr{i - 1}"
    return f"""pr{i} AS (
    SELECT e.dst AS node,
           (({PR_TELEPORT_NUM} // min(nn.n))
            + ({PR_DAMP_NUM} * sum(p.pr // d.degree)) // {PR_DAMP_DEN}) AS pr
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN deg d ON d.node = e.src
    CROSS JOIN nn
    GROUP BY e.dst
)"""


_PAGERANK_ORACLE = (
    "WITH "
    + _PR_EDGES_CTE
    + f",\npr0 AS (SELECT node, {PR_SCALE} // min(nn.n) AS pr"
    " FROM deg CROSS JOIN nn GROUP BY node),\n"
    + ",\n".join(_pr_iter_cte(i) for i in range(1, PR_ITERS + 1))
    + f"""
SELECT p.node AS part_key, d.degree,
       round(CAST(p.pr AS DOUBLE) / {PR_SCALE}, 9) AS pagerank
FROM pr{PR_ITERS} p JOIN deg d ON d.node = p.node
"""
)


@register("pagerank_parts", oracle=_PAGERANK_ORACLE)
def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{PR_ITERS}-iteration damped (0.85) PageRank over the undirected
    co-purchase part graph (edges = part pairs bought together in >=
    {PR_MIN_CO} orders) — graph centrality as a catalog-importance
    score, and the repo's canonical iterative message-passing pattern
    alongside kmeans_lloyd.

    Determinism: the whole trajectory is FIXED-POINT INTEGER
    arithmetic — ranks are bigints scaled by 1e9; contributions are
    integer-divided by degree, summed exactly, damped as (85*sum)//100
    — so both engines compute identical integers at every hop with no
    float op anywhere (the kmeans decimal-sum recipe taken to its
    limit: round-before-use becomes quantize-everything). The float
    rank appears only at output. The ~1e-9 truncation per hop is the
    algorithm's documented quantization, applied identically in both
    engines; the mass deficit (ranks sum to slightly < 1) is the
    price of bit-exactness and is irrelevant to ranking order.

    Scale note: per iteration one keyed shuffle of the edge list
    (partial-combined at the map side, integer sums) joined against
    the O(nodes) rank table; ranks persist round-over-round with the
    previous iteration released. Undirected edges mean in-degree ==
    out-degree, so there is no dangling-mass term to redistribute.
    """
    und = copurchase_und_df(spark, sf_dir)
    edges = und.union(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    ).persist()
    n = deg.count()  # node count; also materializes edges+deg

    # r11 (guide §1.2/§2.6): the {PR_ITERS} iterations form a LINEAR
    # DAG — each pr_i is referenced exactly once by pr_{i+1}, there is
    # no convergence probe — so the per-iteration persist()+count()
    # barrier bought nothing and cost a blocking driver action (job
    # round-trip + cache write) per hop. The chain now builds lazily
    # and materializes ONCE at the final localCheckpoint: identical
    # integer trajectory, {PR_ITERS}+1 sequential jobs collapsed to 1
    # (edges/deg stay persisted — they ARE multiply referenced).
    pr = deg.select("node", F.lit(PR_SCALE // n).cast("long").alias("pr"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(pr, pr["node"] == edges["src"])
            .join(
                deg.select(F.col("node").alias("dn"), "degree"),
                F.col("dn") == edges["src"],
            )
            .select(F.col("dst"), F.expr("pr div degree").alias("c"))
        )
        pr = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                (
                    F.lit(PR_TELEPORT_NUM // n)
                    + F.expr(f"({PR_DAMP_NUM} * s) div {PR_DAMP_DEN}")
                ).cast("long").alias("pr"),
            )
        )
    out = pr.join(deg, "node").select(
        F.col("node").alias("part_key"),
        "degree",
        F.round(F.col("pr").cast("double") / F.lit(float(PR_SCALE)), 9).alias(
            "pagerank"
        ),
    )
    result = out.localCheckpoint()
    deg.unpersist()
    edges.unpersist()
    return result


# --------------------------------------------------- triangle counting

_TRI_ORACLE = f"""
WITH baskets AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), und AS MATERIALIZED (
    -- MATERIALIZED (und/deg/oriented): the 3-way triangle join below
    -- references oriented 3x and und/deg 4x; DuckDB inlines plain
    -- CTEs, re-running the corpus-sized basket self-join per
    -- reference (observed: OOM/50+ GB spill at sf1)
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM baskets a JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {PR_MIN_CO}
), deg AS MATERIALIZED (
    SELECT node, count(*) AS d FROM (
        SELECT src AS node FROM und UNION ALL SELECT dst FROM und
    ) GROUP BY node
), oriented AS MATERIALIZED (
    -- orient each edge from the (degree, id)-smaller endpoint to the
    -- larger: every triangle {{a≺b≺c}} appears exactly once as
    -- (a→b, a→c, b→c)
    SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.src < u.dst)
                THEN u.src ELSE u.dst END AS src,
           CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.src < u.dst)
                THEN u.dst ELSE u.src END AS dst
    FROM und u
    JOIN deg da ON da.node = u.src
    JOIN deg db ON db.node = u.dst
), tri AS (
    SELECT count(*) AS n_triangles
    FROM oriented e1
    JOIN oriented e2 ON e2.src = e1.src AND e2.dst > e1.dst
    JOIN oriented e3 ON e3.src = e1.dst AND e3.dst = e2.dst
), wedges AS (
    SELECT sum(d * (d - 1) / 2) AS n_wedges FROM deg
)
SELECT CAST(t.n_triangles AS BIGINT) AS n_triangles,
       CAST(w.n_wedges AS BIGINT) AS n_wedges,
       (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       round(3.0 * t.n_triangles / w.n_wedges, 6) AS clustering_coeff
FROM tri t CROSS JOIN wedges w
"""


@register("triangle_count", oracle=_TRI_ORACLE)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count and clustering coefficient of the
    co-purchase graph, via degree-ordered edge orientation (every
    triangle counted exactly once as a≺b≺c) — the graph-density health
    metric next to pagerank_parts, and the canonical example of taming
    a combinatorial join: orienting by (degree, id) bounds every
    node's out-neighborhood by O(sqrt(edges)), so the wedge join is
    near-linear instead of quadratic on skewed degree distributions
    (the arboricity argument behind every MapReduce triangle counter).

    Scale note: two keyed self-joins over the oriented edge list; the
    orientation step is two broadcast-able joins against the O(nodes)
    degree table. All integer arithmetic — nothing to round.
    """
    # r11 (guide §5 driver / the numeric_profile idiom): the four
    # sequential driver actions (edge count, node count barrier,
    # triangle-join count, wedge collect) collapse into ONE lazy
    # single-row action — the scalar subtrees crossJoin as 1-row
    # broadcasts and run concurrently inside the consumer's job. The
    # triangle join itself is unchanged; the oriented edge list is
    # checkpointed (it feeds all three join sides — >1 fan-out, the
    # greedy_match lesson) where persist+count was a blocking barrier.
    und = copurchase_und_df(spark, sf_dir)
    # track_local_checkpoint (ADVICE r11): deg/oriented blocks are
    # released by stage_cache.release_all alongside the shared stages.
    deg = track_local_checkpoint(
        und.select(F.col("src").alias("node"))
        .union(und.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)
    )
    da = deg.select(F.col("node").alias("sn"), F.col("d").alias("sd"))
    db = deg.select(F.col("node").alias("dn"), F.col("d").alias("dd"))
    fwd = (F.col("sd") < F.col("dd")) | (
        (F.col("sd") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    oriented = track_local_checkpoint(
        und.join(F.broadcast(da), F.col("sn") == F.col("src"))
        .join(F.broadcast(db), F.col("dn") == F.col("dst"))
        .select(
            F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("src"),
            F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("dst"),
        )
        .localCheckpoint(eager=False)
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e2.src") == F.col("e1.src")) & (F.col("e2.dst") > F.col("e1.dst")),
        )
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.dst")) & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nw = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) / 2")).cast("long").alias("n_wedges"),
    )
    ne = und.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(nw))
        .crossJoin(F.broadcast(ne))
        .select(
            "n_triangles",
            "n_wedges",
            "n_edges",
            "n_nodes",
            F.when(
                F.col("n_wedges") == 0, F.lit(None).cast("double")
            )
            .otherwise(
                F.round(
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
                )
            )
            .alias("clustering_coeff"),
        )
    )


# --------------------------------------------------- bounded-hop BFS

BFS_MAX_HOPS = 3

_BFS_ORACLE = f"""
WITH RECURSIVE baskets AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), und AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM baskets a JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {PR_MIN_CO}
), edges AS (
    SELECT src, dst FROM und UNION ALL SELECT dst AS src, src AS dst FROM und
), seed AS (
    SELECT min(src) AS node FROM edges
), walk AS (
    SELECT node, 0 AS hops FROM seed
    UNION ALL
    SELECT e.dst AS node, w.hops + 1
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.hops < {BFS_MAX_HOPS}
)
SELECT node AS part_key, CAST(min(hops) AS BIGINT) AS hops
FROM walk GROUP BY node
"""


@register("bfs_reachability", oracle=_BFS_ORACLE)
def bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS over the co-purchase graph: shortest hop count
    (<= {BFS_MAX_HOPS}) from the smallest part id in the edge set to
    every reachable node — the "related products within N hops"
    primitive, and the frontier-expansion pattern (iterative keyed
    join + min-aggregate) that generalizes to any seed set.

    Determinism: pure integer hop arithmetic; the seed is the minimum
    node id (no RNG).

    Scale note: each hop is one keyed join of the CURRENT FRONTIER
    (not the full distance table) against the edge list, then a
    min-combine — frontier size is bounded by the graph's neighborhood
    growth, and visited nodes stop propagating (their min can't
    improve, so re-expansion is suppressed by the frontier diff).
    """
    und = copurchase_und_df(spark, sf_dir)
    edges = und.union(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    edges.count()

    dist = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).alias("hops")
    ).persist()
    frontier = dist
    for hop in range(1, BFS_MAX_HOPS + 1):
        expanded = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"), F.lit(hop).alias("hops"))
            .distinct()
        )
        # new frontier = nodes not already reached at a smaller hop
        new_frontier = expanded.join(dist, "node", "left_anti").persist()
        n_new = new_frontier.count()
        new_dist = dist.union(new_frontier).persist()
        new_dist.count()
        dist.unpersist()
        if frontier is not dist:
            frontier.unpersist()
        dist = new_dist
        frontier = new_frontier
        if n_new == 0:
            break
    out = dist.select(
        F.col("node").alias("part_key"), F.col("hops").cast("long").alias("hops")
    ).localCheckpoint()
    dist.unpersist()
    frontier.unpersist()
    edges.unpersist()
    return out
