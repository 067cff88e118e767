"""Round-3 operator tests: plan-shape assertions for the properties
that matter at 100 TB, plus semantic edge checks the oracle hash can't
express (invariants rather than values)."""

import pytest
from pyspark.sql import functions as F

from streams_prototyping_spark import registry
from streams_prototyping_spark.plans.introspect import plan_facts

registry.load_all()


# ------------------------------------------------------ plan shapes


def test_scd2_single_keyed_window_chain(spark, sf_dir):
    """SCD2 must be one daily partial-agg plus user-keyed windows —
    never a self-join on the history."""
    facts = plan_facts(registry.QUERIES["scd2_user_tier"](spark, sf_dir))
    assert facts.shuffles <= 2 and not facts.has_cartesian
    assert facts.sort_merge_joins == 0  # no joins at all


def test_cdc_apply_is_one_shuffle(spark, sf_dir):
    facts = plan_facts(registry.QUERIES["cdc_apply_changelog"](spark, sf_dir))
    assert facts.shuffles == 1 and facts.scans == 1


def test_sliding_distinct_has_no_range_self_join(spark, sf_dir):
    """The scalable shape is contribution-explode + keyed agg; a range
    self-join would show up as a join with no equi-keys."""
    facts = plan_facts(registry.QUERIES["sliding_distinct_users"](spark, sf_dir))
    assert not facts.has_cartesian
    assert facts.sort_merge_joins == 0  # only the broadcast bounds join


def test_zorder_is_scan_plus_one_rollup(spark, sf_dir):
    facts = plan_facts(registry.QUERIES["zorder_cell_stats"](spark, sf_dir))
    assert facts.shuffles == 1 and not facts.has_python


def test_knn_candidate_join_is_bucket_keyed(spark, sf_dir):
    """kNN eval must probe LSH buckets (equi-join), not cross the
    corpus with itself."""
    from streams_prototyping_spark.plans.introspect import explain_str

    df = registry.QUERIES["knn_label_eval"](spark, sf_dir)
    facts = plan_facts(df)
    assert not facts.has_cartesian
    simple = explain_str(df, "simple")
    assert "bucket" in simple  # the join key survives into the plan


def test_bpe_counts_over_vocabulary_not_corpus(spark, sf_dir):
    """Pair explosion must run after the word-frequency aggregate (the
    vocabulary), so the plan has exactly two aggregate exchanges plus
    the final single-reducer top-k."""
    facts = plan_facts(registry.QUERIES["bpe_pair_counts"](spark, sf_dir))
    assert facts.shuffles <= 4 and not facts.has_python


# ------------------------------------------------- semantic invariants


def test_scd2_versions_contiguous_and_non_overlapping(spark, sf_dir):
    rows = registry.QUERIES["scd2_user_tier"](spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1)), user
        assert sum(r.is_current for r in rs) == 1 and rs[-1].is_current
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from  # seamless history
            assert a.tier != b.tier  # a version only exists on change


def test_cdc_deleted_keys_are_absent(spark, sf_dir):
    """A user whose latest op is a delete must not appear."""
    out = registry.QUERIES["cdc_apply_changelog"](spark, sf_dir)
    assert out.filter(F.col("last_op") == "delete").count() == 0


def test_cc_star_equals_label_propagation(spark, sf_dir):
    """The two CC algorithms must agree exactly — mutual verification
    beyond the shared oracle."""
    a = registry.QUERIES["cc_star_contraction"](spark, sf_dir)
    b = registry.QUERIES["dedup_clusters"](spark, sf_dir)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pagerank_mass_and_positivity(spark, sf_dir):
    rows = registry.QUERIES["pagerank_parts"](spark, sf_dir).collect()
    assert rows, "co-purchase graph unexpectedly empty"
    total = sum(r.pagerank for r in rows)
    # fixed-point truncation loses a little mass but never adds any
    assert 0.5 < total <= 1.000001
    assert all(r.pagerank > 0 and r.degree >= 1 for r in rows)


def test_triangle_clustering_coeff_bounds(spark, sf_dir):
    row = registry.QUERIES["triangle_count"](spark, sf_dir).collect()[0]
    assert row.n_triangles >= 0 and row.n_wedges > 0
    assert row.clustering_coeff is None or 0.0 <= row.clustering_coeff <= 1.0
    # every triangle contributes 3 wedges, so 3T <= wedges
    assert 3 * row.n_triangles <= row.n_wedges


def test_holt_forecast_is_level_plus_trend(spark, sf_dir):
    for r in registry.QUERIES["holt_smoothing_daily"](spark, sf_dir).collect():
        assert abs((r.level + r.trend) - r.forecast_next) < 2e-6, r


def test_rolling_corr_bounds(spark, sf_dir):
    for r in registry.QUERIES["rolling_corr_daily"](spark, sf_dir).collect():
        assert r.corr7 is None or -1.000001 <= r.corr7 <= 1.000001
        assert 1 <= r.n_days <= 7


def test_blocklist_keep_matches_threshold(spark, sf_dir):
    from streams_prototyping_spark.functions.curation_ext import BLOCK_FRAC_MAX

    for r in registry.QUERIES["blocklist_filter"](spark, sf_dir).collect():
        assert r.keep == (r.n_blocked / r.n_words <= BLOCK_FRAC_MAX)


def test_knn_eval_accuracy_bounds(spark, sf_dir):
    rows = registry.QUERIES["knn_label_eval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_correct <= r.n_eval
        assert abs(r.accuracy - r.n_correct / r.n_eval) < 1e-6


def test_bpe_ranks_dense_and_sorted(spark, sf_dir):
    rows = sorted(
        registry.QUERIES["bpe_pair_counts"](spark, sf_dir).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_minhash_error_keys_are_k_quantized(spark, sf_dir):
    from streams_prototyping_spark.functions.dedup import EST_JACCARD_MIN, K_PERMS

    rows = registry.QUERIES["minhash_estimate_error"](spark, sf_dir).collect()
    for r in rows:
        assert abs(r.est_jaccard * K_PERMS - round(r.est_jaccard * K_PERMS)) < 1e-9
        assert r.est_jaccard >= EST_JACCARD_MIN
        assert 0.0 <= r.mae <= 1.0 and r.n_pairs >= 1


def test_zorder_cells_are_tight(spark, sf_dir):
    """The point of the layout: per-cell bounding boxes must be far
    tighter than the global range on BOTH dimensions (that's what
    makes parquet min/max skipping effective)."""
    rows = registry.QUERIES["zorder_cell_stats"](spark, sf_dir).collect()
    ck_range = max(r.ck_hi for r in rows) - min(r.ck_lo for r in rows)
    day_range = max(r.day_hi for r in rows) - min(r.day_lo for r in rows)
    mean_ck_span = sum(r.ck_hi - r.ck_lo for r in rows) / len(rows)
    mean_day_span = sum(r.day_hi - r.day_lo for r in rows) / len(rows)
    assert mean_ck_span <= ck_range / 4
    assert mean_day_span <= day_range / 4


def test_sliding_distinct_matches_direct_computation(spark, sf_dir):
    """Cross-check the explode-based shape against a direct (range
    join) computation at test scale."""
    from streams_prototyping_spark.data import load_table
    from streams_prototyping_spark.operators.lakehouse import DAY, SLIDE_DAYS

    out = {
        r.window_day: r.active_users_7d
        for r in registry.QUERIES["sliding_distinct_users"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp(F.date_trunc("day", "ts")).alias("d")
    )
    pairs = {(r.user_id, r.d) for r in ev.distinct().collect()}
    days = sorted({d for _, d in pairs})
    for wday in days:
        expect = len(
            {u for (u, d) in pairs if wday - (SLIDE_DAYS - 1) * DAY <= d <= wday}
        )
        assert out[wday] == expect, wday


def test_bfs_hops_bounded_with_single_seed(spark, sf_dir):
    from streams_prototyping_spark.functions.graph import BFS_MAX_HOPS

    rows = registry.QUERIES["bfs_reachability"](spark, sf_dir).collect()
    assert sum(1 for r in rows if r.hops == 0) == 1  # exactly the seed
    assert all(0 <= r.hops <= BFS_MAX_HOPS for r in rows)


def test_kfold_per_label_balance(spark, sf_dir):
    from streams_prototyping_spark.functions.curation_ext import KFOLD_K

    rows = registry.QUERIES["stratified_kfold_assign"](spark, sf_dir).collect()
    assert {r.fold for r in rows} <= set(range(KFOLD_K))
    per = {}
    for r in rows:
        per.setdefault(r.label, {}).setdefault(r.fold, 0)
        per[r.label][r.fold] += 1
    for label, folds in per.items():
        counts = [folds.get(f, 0) for f in range(KFOLD_K)]
        assert max(counts) - min(counts) <= 1, (label, counts)


def test_weak_supervision_verdict_consistent(spark, sf_dir):
    for r in registry.QUERIES["weak_supervision_vote"](spark, sf_dir).collect():
        assert r.votes_keep + r.votes_drop + r.votes_abstain == 3
        if r.verdict == "keep":
            assert r.votes_keep > r.votes_drop
        elif r.verdict == "drop":
            assert r.votes_drop > r.votes_keep
        else:
            assert r.votes_keep == r.votes_drop
        assert r.conflict == (r.votes_keep > 0 and r.votes_drop > 0)


def test_lang_confusion_fractions_sum_to_one(spark, sf_dir):
    rows = registry.QUERIES["lang_confusion_matrix"](spark, sf_dir).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.labeled_lang, 0.0)
        by_label[r.labeled_lang] += r.frac_of_label
    for label, tot in by_label.items():
        assert abs(tot - 1.0) < 1e-4, (label, tot)


def test_shapley_efficiency_axiom(spark, sf_dir):
    """Shapley's defining property over the counted population: credits
    sum to v(all channels) - v(empty) where v counts CHANNEL-TOUCHED
    conversions (zero-touch conversions — first event is the purchase —
    carry no assignable credit and cancel out of every marginal, so the
    operator excludes them and v(empty) = 0). The independent recompute
    checks reachable_conversions against the raw journeys."""
    from streams_prototyping_spark.operators.product_analytics import (
        ATTR_CHANNELS,
        ATTR_CONV,
    )
    from streams_prototyping_spark.data import load_table
    from pyspark.sql import Window

    rows = registry.QUERIES["shapley_attribution"](spark, sf_dir).collect()
    assert {r.channel for r in rows} == set(ATTR_CHANNELS)
    total_phi = sum(r.shapley_conversions for r in rows)
    v_full = rows[0].reachable_conversions
    assert abs(total_phi - v_full) < 5e-6  # efficiency: v(empty) = 0

    # independent: channel-touched converters from the raw journeys
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", F.col("event_type").alias("state"),
        F.row_number().over(w).alias("rn"),
    )
    fc = (
        seq.where(F.col("state") == ATTR_CONV)
        .groupBy("user_id").agg(F.min("rn").alias("conv_rn"))
    )
    touched = (
        seq.join(fc, "user_id")
        .where(F.col("rn") < F.col("conv_rn"))
        .select("user_id").distinct().count()
    )
    assert v_full == touched


def test_markov_removal_effects_bounded(spark, sf_dir):
    """Removing a node cannot raise absorption probability (all chain
    contributions are non-negative), so 0 <= effect <= 1 and
    p_conv_removed <= p_conv, for every channel."""
    for r in registry.QUERIES["markov_attribution_removal"](spark, sf_dir).collect():
        assert 0.0 < r.p_conv <= 1.0
        assert 0.0 <= r.p_conv_removed <= r.p_conv + 1e-9, r
        assert 0.0 <= r.removal_effect <= 1.0, r


def test_cuped_theta_reduces_pooled_variance(spark, sf_dir):
    """The guarantee CUPED actually makes: theta = cov/var minimizes
    the POOLED adjusted variance, so var(y - theta x) <= var(y) over
    all users (theta = 0 recovers var(y)). Per-arm variances can go
    either way on small arms — that is reporting, not the estimator's
    contract."""
    from streams_prototyping_spark.data import load_table
    from streams_prototyping_spark.functions.portable_hash import portable_hash64
    from streams_prototyping_spark.operators.stats_audits import CUPED_CUTOFF

    out = registry.QUERIES["cuped_variance_reduction"](spark, sf_dir).collect()
    theta = out[0].theta
    cutoff = F.lit(CUPED_CUTOFF).cast("timestamp_ntz")
    cents = F.round(F.col("value") * 100).cast("long")
    pu = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(0)).alias("y"),
        )
        .select((F.col("y") - F.lit(theta) * F.col("x")).alias("adj"), "y")
    )
    r = pu.agg(
        F.var_pop("adj").alias("va"), F.var_pop("y").alias("vy")
    ).first()
    assert r.va <= r.vy + 1e-6, (r.va, r.vy, theta)


def test_kaplan_meier_curve_invariants(spark, sf_dir):
    """S(d) is a survival function: starts <= 1, non-increasing in
    duration, and 0 only if the last risk set converts entirely; risk
    sets strictly shrink as durations pass."""
    rows = sorted(
        registry.QUERIES["kaplan_meier_survival"](spark, sf_dir).collect(),
        key=lambda r: r.duration_days,
    )
    assert rows, "curve must have conversion steps"
    prev_s, prev_risk = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 <= r.survival <= prev_s + 1e-9, r
        assert 0 < r.d_events <= r.n_risk, r
        if prev_risk is not None:
            assert r.n_risk < prev_risk, r  # risk set shrinks past each step
        prev_s, prev_risk = r.survival, r.n_risk
