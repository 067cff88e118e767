"""Feature-engineering operator tests: encoder semantics the oracle
hash can't express (LOO exclusion property, WoE sign structure, PSI
self-comparison, hashing-trick dimensional bounds) plus plan shapes."""

from streams_prototyping_spark import registry
from streams_prototyping_spark.plans.introspect import plan_facts

registry.load_all()


def test_loo_encoding_excludes_self(spark, sf_dir):
    rows = registry.QUERIES["target_encoding_loo"](spark, sf_dir).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for seg, rs in by_seg.items():
        total = sum(round(r.spend * 100) for r in rs)
        n = len(rs)
        if n == 1:
            assert rs[0].loo_encoding is None
            continue
        for r in rs[:20]:
            want = (total - round(r.spend * 100)) / (n - 1) / 100.0
            assert abs(r.loo_encoding - want) < 1e-4, (seg, r)


def test_woe_iv_is_consistent(spark, sf_dir):
    rows = registry.QUERIES["woe_iv_mktsegment"](spark, sf_dir).collect()
    assert rows
    iv = rows[0].iv_total
    assert all(abs(r.iv_total - iv) < 1e-9 for r in rows)
    assert iv >= 0.0 - 1e-9  # IV terms are (pg-pb)*ln(pg/pb) >= 0
    for r in rows:
        assert r.iv_term >= -1e-9
        assert (r.woe > 0) == (r.pg > r.pb) or abs(r.woe) < 1e-6


def test_psi_bins_partition_both_periods(spark, sf_dir):
    rows = registry.QUERIES["psi_drift_report"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert {r.bin for r in rows} == set(range(10))
    n_early = sum(r.count_early for r in rows)
    # equi-depth deciles trained on the early period: each early bin
    # holds ~10% (ties can distort, loose bound)
    for r in rows:
        assert r.count_early <= n_early  # sanity
    assert rows[0].psi_total >= 0.0
    assert abs(sum(r.p_early for r in rows) - 1.0) < 1e-6
    assert abs(sum(r.p_late for r in rows) - 1.0) < 1e-6


def test_feature_hash_bounds_and_coverage(spark, sf_dir):
    rows = registry.QUERIES["feature_hash_onehot"](spark, sf_dir).collect()
    assert all(0 <= r.idx < 32 for r in rows)
    assert all(r.val != 0 for r in rows)  # zero-sum collisions collapse
    per_cust = {}
    for r in rows:
        per_cust[r.c_custkey] = per_cust.get(r.c_custkey, 0) + abs(r.val)
    # 2 features per customer: |val| sums to 2 unless a +/- collision
    assert all(v <= 2 for v in per_cust.values())


def test_importance_downsample_rates_track_expectation(spark, sf_dir):
    rows = registry.QUERIES["importance_downsample"](spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        assert 0.0 <= r.accept_rate <= 1.0
        assert 0.05 - 1e-9 <= r.expected_rate <= 1.0
        # realized rate within a loose binomial band of expectation
        if r.n_docs >= 50:
            sigma = (r.expected_rate * (1 - r.expected_rate) / r.n_docs) ** 0.5
            assert abs(r.accept_rate - r.expected_rate) < 6 * sigma + 0.05


def test_mutual_information_nonnegative_total(spark, sf_dir):
    rows = registry.QUERIES["mutual_information_value_type"](spark, sf_dir).collect()
    assert rows
    mi = rows[0].mi_total
    assert all(abs(r.mi_total - mi) < 1e-9 for r in rows)
    assert mi >= -1e-6  # MI >= 0 up to per-cell rounding
    assert {r.qbin for r in rows} <= set(range(4))


def test_feature_plans_stay_jvm_side(spark, sf_dir):
    for name in (
        "target_encoding_loo",
        "feature_hash_onehot",
        "importance_downsample",
        "psi_drift_report",
    ):
        facts = plan_facts(registry.QUERIES[name](spark, sf_dir))
        assert not facts.has_python, name
        assert not facts.has_cartesian, name
