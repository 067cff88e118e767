"""Physical-plan regression tests — the scale guarantees (SURVEY §4,
build brief: 'explain the plan and iterate until it's the plan you'd
want'). These assert the properties that matter at 100 TB: pushdown,
pruning, broadcast strategy, top-k short-circuits, partial aggregation,
and no accidental cartesian products."""

import pytest

from streams_prototyping_spark import registry

registry.load_all()


def _plan(spark, sf_dir, name, mode="formatted"):
    df = registry.QUERIES[name](spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_filter_reaches_parquet_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_project")
    assert "GreaterThanOrEqual(l_shipdate" in plan  # timestamp predicate pushed
    assert "GreaterThan(l_quantity,25.0)" in plan
    # column pruning: untouched wide columns never leave the scan
    assert "l_comment" not in plan
    assert "l_tax" not in plan
    # '*' prefixes mark operators inside a WholeStageCodegen span
    assert "* Filter" in plan and "* Project" in plan


def test_small_dims_are_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast_chain", mode="simple")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    plan = _plan(spark, sf_dir, "join_broadcast_chain")
    # aggregation is partial+final (map-side combine before the shuffle)
    assert "partial_sum" in plan or "partial_count" in plan


def test_topk_never_global_sorts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sort_limit_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full Sort operator


def test_topn_per_group_uses_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "window_topn_per_group")
    # rank-filter rewritten to WindowGroupLimit: per-partition top-N
    # before the shuffle, so shuffle volume is O(groups * N)
    assert "WindowGroupLimit" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "partial_sum" in plan
    assert "LessThanOrEqual(l_shipdate" in plan  # filter pushed to scan


def test_semi_join_for_in_subquery(spark, sf_dir):
    plan = _plan(spark, sf_dir, "subquery_in")
    assert "LeftSemi" in plan


def test_time_range_join_is_not_cartesian(spark, sf_dir):
    """The +/-60 s stream-stream join must key on the equi-column and
    apply the BETWEEN as a residual — a cartesian product here would be
    the classic 100 TB killer."""
    plan = _plan(spark, sf_dir, "stream_stream_left_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_candidate_join_is_keyed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "minhash_lsh_pairs")
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "filter_project", "scalar_functions"]
)
def test_no_python_in_relational_paths(spark, sf_dir, name):
    """The relational surface must stay JVM-side — Python appears only
    in the multimodal decode path."""
    plan = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_asof_join_is_shuffle_free_of_joins(spark, sf_dir):
    """The as-of join must compile to window functions over ONE user_id
    shuffle — no join operator, no per-user range-join blow-up."""
    plan = _plan(spark, sf_dir, "join_asof", mode="simple")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1


def test_sessionize_reuses_one_exchange(spark, sf_dir):
    """lag, the running session counter, and the final per-session
    aggregate all key on user_id; Catalyst must plan exactly one
    shuffle for the whole pipeline."""
    plan = _plan(spark, sf_dir, "sessionize_events", mode="simple")
    assert plan.count("Exchange") == 1


def test_grouping_sets_single_pass(spark, sf_dir):
    """GROUPING SETS plans as Expand + one aggregate, not a UNION of
    per-set passes."""
    plan = _plan(spark, sf_dir, "grouping_sets_agg")
    assert "Expand" in plan
    assert "Union" not in plan


def test_tfidf_df_side_is_broadcast(spark, sf_dir):
    """The vocabulary (document-frequency) table joins back to the
    corpus-sized tf table by broadcast, never a shuffled corpus join."""
    plan = _plan(spark, sf_dir, "tfidf_top_terms", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# Queries allowed to contain a nested-loop/cartesian operator: the
# deliberate tiny cross join demo, and 1-row scalar broadcasts
# (BroadcastNestedLoopJoin over a single aggregate row is O(n), not
# O(n^2) — it is how Catalyst attaches uncorrelated scalar results).
_CARTESIAN_ALLOWED = {"cross_join_small"}


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """Registry-wide guard: CartesianProduct in any query plan is the
    100 TB killer; it may appear only in the explicit demo."""
    offenders = []
    for name in sorted(registry.QUERIES):
        if name in _CARTESIAN_ALLOWED:
            continue
        try:
            plan = _plan(spark, sf_dir, name, mode="simple")
        except Exception:
            continue  # non-plannable entries surface in their own tests
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_repetition_fold_is_shuffle_free(spark, sf_dir):
    """The Gopher repetition features must be a narrow fold — the
    explode+reaggregate alternative ships ~the corpus through a
    shuffle at scale (REFLECTION round 2)."""
    from streams_prototyping_spark.plans.introspect import plan_facts

    facts = plan_facts(registry.QUERIES["repetition_stats"](spark, sf_dir))
    assert facts.shuffles <= 1  # widen()'s fan-out repartition only
    plan = _plan(spark, sf_dir, "repetition_stats", mode="simple")
    assert "HashAggregate" not in plan  # no re-aggregation pass at all


def test_winnowing_is_narrow(spark, sf_dir):
    from streams_prototyping_spark.plans.introspect import plan_facts

    facts = plan_facts(registry.QUERIES["winnowing_fingerprint"](spark, sf_dir))
    assert facts.shuffles <= 1  # widen() only; fingerprinting never shuffles
    assert facts.has_cartesian is False


def test_decontamination_joins_keyed_with_broadcast_eval(spark, sf_dir):
    """The contamination check must be a keyed fingerprint join with
    the (small) eval index broadcast — never a doc cross product."""
    from streams_prototyping_spark.plans.introspect import plan_facts

    df = registry.QUERIES["decontamination_overlap"](spark, sf_dir)
    facts = plan_facts(df)
    assert facts.has_cartesian is False
    assert facts.broadcast_joins >= 1  # eval fingerprint side broadcast
    plan = _plan(spark, sf_dir, "decontamination_overlap", mode="simple")
    assert "SortMergeJoin" not in plan


def test_bm25_postings_join_keyed_query_broadcast(spark, sf_dir):
    """BM25: the corpus-sized side joins keyed on word/doc; the query
    side (distinct terms of a handful of docs) must broadcast, and the
    top-k must not global-sort."""
    plan = _plan(spark, sf_dir, "bm25_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    # partial aggregation before the (query, cand) shuffle
    assert "HashAggregate" in plan


def test_semantic_dedup_pair_join_is_cell_keyed(spark, sf_dir):
    """SemDeDup pairs must be an equi-join on the k-means cell, never a
    nested-loop over the corpus."""
    plan = _plan(spark, sf_dir, "semantic_dedup")
    assert "CartesianProduct" not in plan


def test_span_dedup_membership_join_keyed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "span_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cms_probe_join_broadcasts_cells(spark, sf_dir):
    """The 256-cell CMS table must broadcast into the probe join."""
    plan = _plan(spark, sf_dir, "count_min_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_use_group_limit(spark, sf_dir):
    """Anchor side broadcasts; rank<=k collapses to WindowGroupLimit."""
    plan = _plan(spark, sf_dir, "hard_negative_mining")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_random_projection_is_narrow(spark, sf_dir):
    """JL projection must be a pure scan-speed projection: no exchange."""
    plan = _plan(spark, sf_dir, "random_projection_embed")
    assert "Exchange" not in plan


def test_ivf_pq_routing_and_lut_broadcast(spark, sf_dir):
    """The composed IVF-PQ query must broadcast routing + LUT and keep
    every join keyed — candidate vectors are never cross-joined."""
    plan = _plan(spark, sf_dir, "ivf_pq_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_salted_join_actually_shuffles(spark, sf_dir):
    """The salting demo is only meaningful on a shuffle join: pin that
    the replicated dim does NOT broadcast (the shuffle_hash hint) and
    nothing cartesians — the composite (salt, key) equi-join shape."""
    from streams_prototyping_spark.plans.introspect import plan_facts

    facts = plan_facts(registry.QUERIES["salted_skew_join"](spark, sf_dir))
    assert facts.broadcast_joins == 0, facts.summary
    assert not facts.has_cartesian
    assert facts.shuffles >= 2  # fact and replicated-dim exchanges


def test_pca_iterations_stay_broadcast(spark, sf_dir):
    """Power iteration joins dim^2 rows to a broadcast 64-row vector;
    a shuffle per iteration would be the wrong plan at any scale."""
    from streams_prototyping_spark.plans.introspect import plan_facts

    facts = plan_facts(registry.QUERIES["pca_power_iteration"](spark, sf_dir))
    assert not facts.has_cartesian
    assert facts.sort_merge_joins == 0, facts.summary


def test_dup_substring_spans_plan_shape(spark, sf_dir):
    """Gram membership join is hash-keyed and the island window is
    doc-partitioned — no global single-partition window, no cartesian."""
    plan = _plan(spark, sf_dir, "dup_substring_spans")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # doc-keyed island windows, never a global (empty-key) window sort
    assert "Window" in plan
    import re as _re
    assert not _re.search(r"partitionBy=\[\]", plan)


def test_global_window_lint_full_registry(spark, sf_dir):
    """Round-6 lint (VERDICT r5 item 2): no registered query may plan
    an empty-partition Window over RAW (non-aggregated, non-limited)
    input — that is 'Exchange SinglePartition', the parallelism ceiling
    that correctness tests and single-box scaling alphas cannot see.
    Windows over AGGREGATED input are allowed only with an explicit
    bounded_window annotation naming the key domain, and annotations
    must not go stale. Covers every registered query. NOTE: mostly
    plan-build work, but NOT execution-free — the iterative/shared-
    stage queries (fs_em_params, greedy_match_assign, the cached ANN
    index stages) run eager localCheckpoints and driver-side
    convergence collects while CONSTRUCTING their plans, so this test
    executes real Spark jobs over sf_dir (~90 s; ADVICE r6)."""
    from streams_prototyping_spark.plans.introspect import global_windows

    problems = []
    agg_queries = set()
    for name, fn in sorted(registry.QUERIES.items()):
        gw = global_windows(fn(spark, sf_dir))
        raw = [d for c, d in gw if c == "raw"]
        if raw:
            problems.append(f"{name}: RAW global window {raw}")
        if any(c == "aggregated" for c, _ in gw):
            agg_queries.add(name)
            if name not in registry.BOUNDED_WINDOWS:
                problems.append(
                    f"{name}: aggregated global window without a "
                    f"bounded_window annotation"
                )
    stale = set(registry.BOUNDED_WINDOWS) - agg_queries
    if stale:
        problems.append(f"stale bounded_window annotations: {sorted(stale)}")
    assert not problems, "\n".join(problems)


def test_cross_joins_declare_broadcast():
    """Repo convention, now linted instead of remembered (VERDICT r6
    item 6): every ``.crossJoin(`` in engine source must broadcast its
    argument explicitly — scalar/aggregate frames are tiny, but without
    the hint the initial plan is a CartesianProduct and correct
    execution depends on AQE guessing the size right. Only the explicit
    tiny-demo (cross_join_small) is exempt."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "streams_prototyping_spark"
    allowed = {("operators/advanced.py", "r.crossJoin(p)")}
    offenders = []
    for py in sorted(pkg.rglob("*.py")):
        src = py.read_text()
        rel = str(py.relative_to(pkg))
        for m in re.finditer(r"\.crossJoin\(", src):
            rest = src[m.end():].lstrip()
            line = src[: m.start()].count("\n") + 1
            snippet = src.splitlines()[line - 1].strip()
            if (rel, snippet) in allowed:
                continue
            if not (rest.startswith("F.broadcast(") or rest.startswith("broadcast(")):
                offenders.append(f"{rel}:{line}: {snippet}")
    assert not offenders, (
        "crossJoin without an explicit broadcast hint:\n" + "\n".join(offenders)
    )


def test_bounded_window_annotations_measured():
    """VERDICT r6 item 2: the bounded_window annotations are semantic
    claims the plan lint cannot prove — so they are MEASURED instead
    of trusted. scripts/annotation_cardinality.py executes every
    annotated query's global-window input subtree at sf0.1/sf1/sf10
    and commits ANNOTATION_CARDINALITY.json; this test reds when

    - an annotation is missing from the committed measurement (added
      without re-running the sweep), or
    - a measured window input violates the thresholds: already larger
      than the single-task cap, or tracking corpus growth
      (alpha > 0.9) while large — i.e. the claimed bounded domain is
      factually unbounded in the way that matters."""
    import json
    from pathlib import Path

    art = Path(__file__).resolve().parent.parent / "ANNOTATION_CARDINALITY.json"
    assert art.exists(), (
        "ANNOTATION_CARDINALITY.json missing — run "
        "scripts/annotation_cardinality.py and commit the artifact"
    )
    doc = json.loads(art.read_text())
    measured = set(doc["annotations"])
    unmeasured = set(registry.BOUNDED_WINDOWS) - measured
    assert not unmeasured, (
        f"bounded_window annotations never measured: {sorted(unmeasured)} — "
        "re-run scripts/annotation_cardinality.py"
    )
    reds = {
        name: rec
        for name, rec in doc["annotations"].items()
        if rec["red"] and name in registry.BOUNDED_WINDOWS
    }
    assert not reds, (
        "bounded_window annotations FALSIFIED by measurement "
        f"(corpus-tracking or over the single-task cap): {reds}"
    )


def test_source_doc_cap_uses_group_limit(spark, sf_dir):
    """The per-source cap must pre-prune via WindowGroupLimit (literal
    rank bound) — shuffle volume O(sources x cap), never corpus-sized."""
    plan = _plan(spark, sf_dir, "source_doc_cap")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_ngram_novelty_join_is_keyed(spark, sf_dir):
    """The df join back must be keyed on gram (broadcast at small SF by
    stats, shuffle at scale) — never a nested loop."""
    plan = _plan(spark, sf_dir, "cross_doc_ngram_novelty")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # document frequency aggregates partially before any join
    assert "partial_count" in plan
