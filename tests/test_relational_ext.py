"""Bounds for the sketch/sampling operators.

Round 2: these four queries became fully oracle-checked (exact column +
bounds boolean for the sketches; deterministic md5-prefix filters for
the samples). The pytest layer keeps the semantic assertions: sketch
estimates within bounds, sample fractions in range, determinism.
"""

from streams_prototyping_spark import registry

registry.load_all()


def test_approx_percentiles_within_bounds(spark, sf_dir):
    rows = registry.QUERIES["approx_percentiles"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_ok, r.o_orderpriority
        assert r.p50_exact <= r.p99_exact


def test_approx_distinct_within_bounds(spark, sf_dir):
    rows = registry.QUERIES["approx_distinct_users"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_ok, r.event_type
        assert 0 < r.exact_users <= r.n_events


def test_sample_stable_fraction_and_determinism(spark, sf_dir):
    from streams_prototyping_spark.data import load_table

    n_full = load_table(spark, sf_dir, "lineitem").count()
    n1 = registry.QUERIES["sample_stable"](spark, sf_dir).count()
    # md5 prefix <= '19' keeps 26/256 ~ 10.2%; allow generous slack
    assert 0.05 * n_full < n1 < 0.16 * n_full
    assert registry.QUERIES["sample_stable"](spark, sf_dir).count() == n1


def test_stratified_sample_fractions(spark, sf_dir):
    got = {
        r.event_type: r["count"]
        for r in registry.QUERIES["stratified_sample"](spark, sf_dir)
        .groupBy("event_type")
        .count()
        .collect()
    }
    from streams_prototyping_spark.data import load_table

    full = {
        r.event_type: r["count"]
        for r in load_table(spark, sf_dir, "events").groupBy("event_type").count().collect()
    }
    assert got["purchase"] == full["purchase"]  # threshold 'ff' keeps all
    assert got["view"] < full["view"] * 0.3  # ~10% threshold downsamples hard
    # determinism: content-hash membership -> identical count on re-run
    again = registry.QUERIES["stratified_sample"](spark, sf_dir).count()
    assert again == sum(got.values())
