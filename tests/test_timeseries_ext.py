"""Time-series extension tests: metric identities and sequence
invariants the oracle hash can't express, plus plan shapes."""

from streams_prototyping_spark import registry
from streams_prototyping_spark.plans.introspect import plan_facts

registry.load_all()


def test_acf_has_all_lags_in_unit_range(spark, sf_dir):
    rows = registry.QUERIES["acf_daily_revenue"](spark, sf_dir).collect()
    lags = {r.lag for r in rows}
    assert lags == set(range(1, 15))
    for r in rows:
        assert -1.0 - 1e-9 <= r.lag_corr <= 1.0 + 1e-9
    # gaps in the calendar mean counts aren't strictly monotone in
    # lag, but every lag must align at least one pair
    assert all(r.n_pairs >= 1 for r in rows)


def test_snaive_backtest_metric_relations(spark, sf_dir):
    row = registry.QUERIES["forecast_backtest_snaive"](spark, sf_dir).collect()[0]
    assert 0 < row.n_pairs < row.n_days
    assert row.rmse_snaive >= row.mae_snaive - 1e-9  # RMSE >= MAE always
    assert row.mape_snaive >= 0
    assert row.mase_ratio > 0
    assert abs(row.mase_ratio - row.mae_snaive / row.mae_naive1) < 1e-4


def test_funnel_latency_percentiles_ordered(spark, sf_dir):
    row = registry.QUERIES["funnel_latency_percentiles"](spark, sf_dir).collect()[0]
    assert row.n_converted > 0
    assert 0 <= row.p50_seconds <= row.p90_seconds
    assert row.mean_seconds > 0


def test_markov_rows_form_distributions(spark, sf_dir):
    rows = registry.QUERIES["event_type_markov"](spark, sf_dir).collect()
    per_prev = {}
    for r in rows:
        assert 0.0 < r.prob <= 1.0
        per_prev.setdefault(r.prev_type, 0.0)
        per_prev[r.prev_type] += r.prob
    for prev, tot in per_prev.items():
        assert abs(tot - 1.0) < 1e-6, prev


def test_timeseries_ext_plans_jvm_side(spark, sf_dir):
    for name in (
        "acf_daily_revenue",
        "forecast_backtest_snaive",
        "funnel_latency_percentiles",
        "event_type_markov",
    ):
        facts = plan_facts(registry.QUERIES[name](spark, sf_dir))
        assert not facts.has_python, name
        assert not facts.has_cartesian, name
