"""Retrieval-eval and graph-ml tests: metric semantics the oracle hash
can't express (NDCG bounds/monotonicity, RRF rank arithmetic, k-core
degree invariant, link-prediction non-adjacency) plus plan shapes."""

from streams_prototyping_spark import registry
from streams_prototyping_spark.plans.introspect import plan_facts

registry.load_all()


def test_ndcg_bounds_and_idcg_consistency(spark, sf_dir):
    rows = registry.QUERIES["ndcg_at_k"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_rel_in_k <= 10
        assert r.n_rel_in_k <= r.n_rel_total
        assert r.dcg <= r.idcg + 1e-9  # ideal ranking dominates
        if r.idcg > 0:
            assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        else:
            assert r.ndcg is None


def test_rrf_score_matches_rank_arithmetic(spark, sf_dir):
    rows = registry.QUERIES["rrf_fusion_topk"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = 1.0 / (60 + r.r_overlap) + 1.0 / (60 + r.r_jaccard)
        assert abs(r.rrf_score - want) < 1e-9
        assert 1 <= r.rnk <= 5
        assert 0.0 < r.jaccard <= 1.0
    # per query, rnk is a contiguous prefix
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_doc, []).append(r.rnk)
    for q, rnks in per_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), q


def test_kcore_members_have_core_degree_at_least_k(spark, sf_dir):
    rows = registry.QUERIES["k_core_decomposition"](spark, sf_dir).collect()
    if not rows:
        return  # empty 3-core is legal on tiny graphs
    conv = rows[0].converged
    assert all(r.converged == conv for r in rows)
    if conv:
        assert all(r.core_degree >= 3 for r in rows)


def test_link_prediction_pairs_not_adjacent(spark, sf_dir):
    from streams_prototyping_spark.functions.graph_ml import copurchase_und_df

    preds = registry.QUERIES["jaccard_link_prediction"](spark, sf_dir).collect()
    edges = {
        (r.src, r.dst) for r in copurchase_und_df(spark, sf_dir).collect()
    }
    for r in preds:
        assert (r.node_a, r.node_b) not in edges
        assert r.node_a < r.node_b
        union = r.deg_a + r.deg_b - r.common_neighbors
        assert abs(r.jaccard - r.common_neighbors / union) < 1e-5
        assert r.common_neighbors >= 1


def test_degree_distribution_accounts_all_nodes(spark, sf_dir):
    from streams_prototyping_spark.functions.graph_ml import copurchase_und_df

    rows = registry.QUERIES["degree_distribution"](spark, sf_dir).collect()
    edges = copurchase_und_df(spark, sf_dir).collect()
    nodes = {r.src for r in edges} | {r.dst for r in edges}
    assert sum(r.n_nodes for r in rows) == len(nodes)
    assert sum(r.degree * r.n_nodes for r in rows) == 2 * len(edges)
    assert all(r.n_points == len(rows) for r in rows)


def test_new_ops_plans_stay_jvm_side(spark, sf_dir):
    for name in (
        "ndcg_at_k",
        "rrf_fusion_topk",
        "jaccard_link_prediction",
        "degree_distribution",
    ):
        facts = plan_facts(registry.QUERIES[name](spark, sf_dir))
        assert not facts.has_python, name
        assert not facts.has_cartesian, name
