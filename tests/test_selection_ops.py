"""Selection-operator tests: Pareto dominance verified against a
brute-force oracle on a sample; ES-sampling inclusion bias checked
statistically; plan shapes."""

from streams_prototyping_spark import registry
from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.plans.introspect import plan_facts

registry.load_all()


def test_pareto_frontier_is_mutually_nondominated_and_complete(spark, sf_dir):
    import pyspark.sql.functions as F

    frontier = registry.QUERIES["pareto_frontier_parts"](spark, sf_dir).collect()
    assert frontier
    pts = [(round(r.price * 100), r.p_size) for r in frontier]
    # frontier points must not dominate each other
    for p in pts:
        for q in pts:
            if q != p:
                assert not (
                    q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
                ), (p, q)
    # brute-force check on a sample of non-frontier parts: each must be
    # dominated by at least one frontier point
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("pc"),
        F.col("p_size").cast("long").alias("sz"),
    )
    in_front = {r.p_partkey for r in frontier}
    others = [r for r in part.limit(300).collect() if r.p_partkey not in in_front]
    for r in others:
        assert any(
            q[0] <= r.pc and q[1] >= r.sz and (q[0] < r.pc or q[1] > r.sz)
            for q in pts
        ), r


def test_es_sample_prefers_heavy_docs(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = registry.QUERIES["weighted_sample_es"](spark, sf_dir).collect()
    assert len(rows) <= 64
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    assert all(r.es_key <= 0 for r in rows)  # ln(u)/w is always <= 0
    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    stats = d.agg(F.avg("n_chars").alias("m"), F.count(F.lit(1)).alias("n")).collect()[0]
    if stats.n > 2 * len(rows):
        sample_mean = sum(r.n_chars for r in rows) / len(rows)
        # weight-proportional inclusion biases the sample toward long
        # docs: sample mean length must exceed the corpus mean
        assert sample_mean > stats.m


def test_selection_plans(spark, sf_dir):
    facts = plan_facts(registry.QUERIES["weighted_sample_es"](spark, sf_dir))
    assert not facts.has_python and not facts.has_cartesian
    df = registry.QUERIES["weighted_sample_es"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # rank<=k over a global ORDER BY must stay a window-limit/TakeOrdered
    # shape, never a full global sort materialization
    assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan
    facts2 = plan_facts(registry.QUERIES["pareto_frontier_parts"](spark, sf_dir))
    assert not facts2.has_python and not facts2.has_cartesian
