"""Bounds for the sketch/sampling operators that have no SQL oracle."""

import pyspark.sql.functions as F

from streams_prototyping_spark import registry

registry.load_all()


def test_approx_percentiles_bracket_exact(spark, sf_dir):
    approx = {
        r.o_orderpriority: (r.p50_approx, r.p99_approx)
        for r in registry.QUERIES["approx_percentiles"](spark, sf_dir).collect()
    }
    exact = {
        r.o_orderpriority: (r.p50, r.p99)
        for r in registry.QUERIES["percentiles_exact"](spark, sf_dir).collect()
    }
    for k, (p50e, p99e) in exact.items():
        p50a, p99a = approx[k]
        assert abs(p50a - p50e) / p50e < 0.05, k
        assert abs(p99a - p99e) / p99e < 0.05, k


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
    assert got["purchase"] == full["purchase"]  # fraction 1.0 keeps all
    assert got["view"] < full["view"] * 0.3  # 0.1 fraction downsamples hard
    # determinism: same seed -> same sample
    again = registry.QUERIES["stratified_sample"](spark, sf_dir).count()
    assert again == sum(got.values())
