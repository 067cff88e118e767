"""Stats-audit operator tests: semantic invariants the oracle hash
can't express, plus plan-shape assertions for the 100 TB properties
(the module's windows must run over aggregated/distinct tables, never
raw rows; sketch states must be bounded)."""

import math

import pytest

from streams_prototyping_spark import registry
from streams_prototyping_spark.plans.introspect import plan_facts

registry.load_all()


# ---------------------------------------------------------- semantics


def test_hll_estimate_within_expected_error(spark, sf_dir):
    """m=64 HLL has ~13% standard error; assert a loose 3-sigma bound
    and that the audit columns are internally consistent."""
    row = registry.QUERIES["hll_distinct_audit"](spark, sf_dir).collect()[0]
    assert row.m == 64
    assert row.nonzero_registers + row.empty_registers == 64
    assert row.exact_distinct > 0
    assert row.rel_err == round(abs(row.est - row.exact_distinct) / row.exact_distinct, 4)
    assert row.rel_err < 0.40  # 3 sigma for m=64

def test_auc_in_unit_interval_and_gini_consistent(spark, sf_dir):
    row = registry.QUERIES["roc_auc_value_purchase"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.auc <= 1.0
    assert row.gini == round(2 * row.auc - 1, 6)
    assert row.npos > 0 and row.nneg > 0


def test_calibration_bins_partition_the_rows(spark, sf_dir):
    rows = registry.QUERIES["calibration_bins"](spark, sf_dir).collect()
    bins = {r.bin for r in rows}
    assert bins <= set(range(10))
    for r in rows:
        assert 0 <= r.pos <= r.n
        assert 0.0 <= r.mean_pred <= 1.0
        assert r.gap == round(abs(r.mean_pred - r.pos_rate), 6)


def test_changepoint_cumdev_ends_near_zero(spark, sf_dir):
    """cumsum(daily - mean) must return to ~0 at the last day (the
    residual is only the floor-division truncation times n_days), and
    exactly one peak day family is flagged."""
    rows = registry.QUERIES["changepoint_daily_revenue"](spark, sf_dir).collect()
    rows.sort(key=lambda r: r.day)
    n = len(rows)
    assert abs(rows[-1].cum_dev) <= n  # truncation residual < 1 cent/day
    peaks = [r for r in rows if r.is_peak]
    assert peaks and all(
        abs(p.cum_dev) == max(abs(r.cum_dev) for r in rows) for p in peaks
    )


def test_benford_shares_and_chi2(spark, sf_dir):
    rows = registry.QUERIES["benford_first_digit"](spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    # expected shares are the Benford constants
    for r in rows:
        assert abs(r.exp_share - math.log10(1 + 1 / r.digit)) < 1e-6
        assert r.chi2_term >= 0


def test_equidepth_bins_are_balanced(spark, sf_dir):
    """Equi-depth deciles: each bin holds ~10% of rows (value-granular
    assignment can shift a bin by the largest tie group)."""
    rows = registry.QUERIES["equidepth_value_histogram"](spark, sf_dir).collect()
    total = sum(r.n_rows for r in rows)
    assert len(rows) == 10
    for r in rows:
        assert r.lo <= r.hi
        assert 0.02 <= r.n_rows / total <= 0.25
    # bins tile the value axis without overlap
    rows.sort(key=lambda r: r.bin)
    for a, b in zip(rows, rows[1:]):
        assert a.hi < b.lo


def test_aa_split_is_sane(spark, sf_dir):
    row = registry.QUERIES["aa_split_audit"](spark, sf_dir).collect()[0]
    assert row.n0 > 0 and row.n1 > 0
    assert 0 <= row.c0 <= row.n0 and 0 <= row.c1 <= row.n1
    assert row.rate0 == round(row.c0 / row.n0, 6)
    # the splitter is the same deterministic hash everywhere: re-running
    # must give identical arms (no RNG anywhere)
    row2 = registry.QUERIES["aa_split_audit"](spark, sf_dir).collect()[0]
    assert row == row2


# ---------------------------------------------------------- plan shapes


def test_hll_sketch_state_is_bounded(spark, sf_dir):
    """The register table is 64 rows regardless of corpus size; the
    plan must be aggregates only — no joins beyond the two 1-row
    broadcast folds, no Python."""
    facts = plan_facts(registry.QUERIES["hll_distinct_audit"](spark, sf_dir))
    assert not facts.has_cartesian and not facts.has_python
    assert facts.sort_merge_joins == 0


def test_auc_window_runs_over_distinct_scores(spark, sf_dir):
    """groupBy(score) must come BEFORE the ranking window: the plan
    has a partial-combined aggregate feeding the window, and the
    window input is the distinct-score table."""
    from streams_prototyping_spark.plans.introspect import explain_str

    df = registry.QUERIES["roc_auc_value_purchase"](spark, sf_dir)
    simple = explain_str(df, "simple")
    # plan text is top-down: an upstream (input-side) aggregate appears
    # BELOW the window, i.e. after it in the text
    assert simple.rindex("HashAggregate") > simple.index("Window")
    facts = plan_facts(df)
    assert not facts.has_cartesian and not facts.has_python


def test_calibration_bounds_row_is_broadcast(spark, sf_dir):
    facts = plan_facts(registry.QUERIES["calibration_bins"](spark, sf_dir))
    assert facts.sort_merge_joins == 0
    assert not facts.has_cartesian or facts.broadcast_joins >= 0  # 1-row side


def test_changepoint_windows_over_daily_series(spark, sf_dir):
    """Orders must collapse to O(days) rows before any window: the
    aggregate exchange precedes the window in the plan."""
    from streams_prototyping_spark.plans.introspect import explain_str

    df = registry.QUERIES["changepoint_daily_revenue"](spark, sf_dir)
    simple = explain_str(df, "simple")
    # top-down text: the daily aggregate must sit BELOW (after) the window
    assert simple.rindex("HashAggregate") > simple.index("Window")


def test_equidepth_window_over_distinct_values(spark, sf_dir):
    from streams_prototyping_spark.plans.introspect import explain_str

    df = registry.QUERIES["equidepth_value_histogram"](spark, sf_dir)
    simple = explain_str(df, "simple")
    # top-down text: the distinct-value aggregate sits BELOW the window
    assert simple.rindex("HashAggregate") > simple.index("Window")
    facts = plan_facts(df)
    assert not facts.has_python


# ------------------------------------- trend tests & distribution stats


def test_mann_kendall_consistency(spark, sf_dir):
    row = registry.QUERIES["mann_kendall_trend"](spark, sf_dir).collect()[0]
    assert row.var_s > 0
    max_s = row.n_days * (row.n_days - 1) // 2
    assert -max_s <= row.s_stat <= max_s
    assert row.trend in {"increasing", "decreasing", "no_trend"}
    # z and trend agree
    if row.trend == "no_trend":
        assert abs(row.z_stat) <= 1.97


def test_theil_sen_quantiles_ordered(spark, sf_dir):
    row = registry.QUERIES["theil_sen_slope"](spark, sf_dir).collect()[0]
    assert row.q1_slope <= row.median_slope_per_week <= row.q3_slope
    # n weeks -> n*(n-1)/2 pairs: recover n and check integrality
    import math

    n = (1 + math.isqrt(1 + 8 * row.n_pairs)) // 2
    assert n * (n - 1) // 2 == row.n_pairs


def test_kl_divergence_nonnegative_and_partitions(spark, sf_dir):
    rows = registry.QUERIES["kl_divergence_sources"](spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        # KL >= 0 up to the 12-dp term rounding
        assert r.kl_vs_corpus >= -1e-6
        assert 0 < r.vocab_words <= r.n_tokens


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = sorted(
        registry.QUERIES["vocab_coverage_curve"](spark, sf_dir).collect(),
        key=lambda r: r.top_k,
    )
    assert [r.top_k for r in rows] == [10, 30, 100, 300, 1000, 3000, 10000]
    for a, b in zip(rows, rows[1:]):
        assert a.coverage <= b.coverage
        assert a.tokens_covered <= b.tokens_covered
    assert rows[-1].coverage <= 1.0
    # once k >= vocab, coverage is exactly 1
    full = [r for r in rows if r.top_k >= r.vocab_size]
    for r in full:
        assert r.coverage == 1.0


def test_kl_join_small_sides_broadcast(spark, sf_dir):
    """The per-source totals and corpus-total sides must broadcast;
    no cartesian beyond the 1-row total fold."""
    facts = plan_facts(registry.QUERIES["kl_divergence_sources"](spark, sf_dir))
    assert facts.broadcast_joins >= 2
    assert not facts.has_python


def test_coverage_window_over_vocab_only(spark, sf_dir):
    from streams_prototyping_spark.plans.introspect import explain_str

    df = registry.QUERIES["vocab_coverage_curve"](spark, sf_dir)
    simple = explain_str(df, "simple")
    assert simple.rindex("HashAggregate") > simple.index("Window")
