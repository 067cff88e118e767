"""Hypothesis-test operator tests: statistical invariants the oracle
hash can't express (consistency against scipy-free closed forms, bound
checks) plus plan-shape assertions for the scale properties (windows
over distinct-value tables only; bottom-k sketches bounded by k)."""

import math

from streams_prototyping_spark import registry
from streams_prototyping_spark.plans.introspect import plan_facts

registry.load_all()


def test_welch_t_matches_recomputation(spark, sf_dir):
    row = registry.QUERIES["welch_ttest_value"](spark, sf_dir).collect()[0]
    assert row.n_purchase > 1 and row.n_view > 1
    assert row.var_purchase > 0 and row.var_view > 0
    se = row.var_purchase / row.n_purchase + row.var_view / row.n_view
    assert abs(row.t_stat - (row.mean_purchase - row.mean_view) / math.sqrt(se)) < 1e-5
    # Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
    assert min(row.n_purchase, row.n_view) - 1 <= row.welch_df <= (
        row.n_purchase + row.n_view - 2
    )


def test_ks_d_bounds_and_fraction(spark, sf_dir):
    row = registry.QUERIES["ks_test_two_sample"](spark, sf_dir).collect()[0]
    assert 0.0 < row.ks_d <= 1.0
    assert row.d_num <= row.n_purchase * row.n_view
    assert abs(row.ks_d - row.d_num / (row.n_purchase * row.n_view)) < 1e-9


def test_spearman_in_unit_range_and_n(spark, sf_dir):
    row = registry.QUERIES["spearman_corr_value_hour"](spark, sf_dir).collect()[0]
    assert -1.0 <= row.spearman_rho <= 1.0
    assert row.n > 0


def test_chi_square_table_is_consistent(spark, sf_dir):
    rows = registry.QUERIES["chi_square_event_dow"](spark, sf_dir).collect()
    n = sum(r.observed for r in rows)
    exp_sum = sum(r.expected for r in rows)
    # expected counts partition N (up to per-cell rounding)
    assert abs(exp_sum - n) < 0.01 * len(rows)
    total = rows[0].chi2_total
    assert all(abs(r.chi2_total - total) < 1e-9 for r in rows)
    assert abs(total - sum(r.chi2_term for r in rows)) < 1e-6
    assert total >= 0.0


def test_kmv_exact_below_k_and_estimates_close(spark, sf_dir):
    row = registry.QUERIES["kmv_set_cardinality"](spark, sf_dir).collect()[0]
    assert row.exact_union >= max(row.exact_returned, row.exact_kept)
    assert row.exact_inter <= min(row.exact_returned, row.exact_kept)
    for est, exact in [
        (row.est_returned, row.exact_returned),
        (row.est_kept, row.exact_kept),
        (row.est_union, row.exact_union),
    ]:
        if exact < row.k:
            assert est == float(exact)  # sketch not full => exact by construction
        else:
            assert abs(est - exact) / exact < 0.5  # ~4 sigma at k=64
    # inclusion-exclusion sanity on the estimates
    assert row.est_inter <= row.est_union + 1e-9


def test_poisson_bootstrap_spread_brackets_point_estimate(spark, sf_dir):
    row = registry.QUERIES["poisson_bootstrap_ci"](spark, sf_dir).collect()[0]
    assert row.b_replicas == 32
    assert row.boot_min <= row.boot_mean <= row.boot_max
    # the point estimate sits inside the replicate spread
    assert row.boot_min <= row.est_mean <= row.boot_max
    assert row.boot_se > 0
    # Poisson-bootstrap SE of a mean ~ sd/sqrt(n); loose factor-5 sanity
    assert row.boot_se < row.est_mean


# --------------------------------------------------------- plan shapes


def test_ks_window_runs_over_distinct_values_not_rows(spark, sf_dir):
    df = registry.QUERIES["ks_test_two_sample"](spark, sf_dir)
    facts = plan_facts(df)
    assert not facts.has_cartesian
    assert not facts.has_python
    # one shuffle collapses raw rows to distinct cents, one feeds the
    # (single-partition, bounded-domain) ECDF window — nothing else
    assert facts.shuffles <= 3


def test_bootstrap_plan_has_no_shuffle_before_replicate_fold(spark, sf_dir):
    df = registry.QUERIES["poisson_bootstrap_ci"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # explode(sequence) must be map-side: exactly the replicate fold's
    # exchange plus the 1-row epilogue exchanges; no join-driven shuffle
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_kmv_sketch_is_take_ordered(spark, sf_dir):
    df = registry.QUERIES["kmv_set_cardinality"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # bottom-k, never a full sort
    assert "CartesianProduct" not in plan
