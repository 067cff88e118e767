"""Runtime-filter (bloom) join pruning — the scale lever for selective
fact-fact joins (SURVEY §4.2: at 100 TB a selective dimension predicate
should prune the probe-side scan, not just the join).

Spark injects a bloom_filter_agg on the creation (filtered) side and a
might_contain predicate on the application side when the join is a
shuffle join. Local testdata is far below the production thresholds, so
the test lowers them — the assertion is about plan shape, which is what
carries to the cluster.
"""

from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


def _with_confs(spark, confs):
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    return saved


def _restore(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_prunes_probe_side(spark, sf_dir):
    saved = _with_confs(spark, _CONFS)
    try:
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
        plan = j._jdf.queryExecution().explainString(mode)
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan.lower() or "BloomFilter" in plan, plan
        # and the filtered plan still computes the right answer
        [row] = j.collect()
        o_cnt = (
            li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey).count()
        )
        assert row["count"] == o_cnt
    finally:
        _restore(spark, saved)
