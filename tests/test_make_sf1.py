"""Validity pins for the sf1 upscale (scripts/make_sf1.py). The whole
sf1 scaling argument rests on the upscale being measurement-valid:
10x rows with UNCHANGED per-key cardinalities and join selectivities
(naive duplication would square join outputs). Skip-gated on the
generated dataset like the sf1 oracle check."""

import os

import pytest
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"


def _sf1():
    d = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    if not os.path.exists(os.path.join(d, "_SUCCESS_SF1")):
        pytest.skip("sf1 upscale not generated (scripts/make_sf1.py)")
    return d


def test_rowcounts_scale_10x_and_dims_fixed(spark):
    sf1 = _sf1()
    for t, factor in [
        ("lineitem", 10), ("orders", 10), ("customer", 10), ("events", 10),
        ("documents", 10), ("embeddings", 10), ("region", 1), ("nation", 1),
    ]:
        n01 = spark.read.parquet(f"{SF01}/{t}.parquet").count()
        n1 = spark.read.parquet(f"{sf1}/{t}.parquet").count()
        assert n1 == factor * n01, (t, n01, n1)


def test_keys_unique_across_replicas(spark):
    """Key shifting must keep PKs globally unique — a collision would
    silently double per-key cardinality for the colliding keys."""
    sf1 = _sf1()
    for t, pk in [("orders", "o_orderkey"), ("customer", "c_custkey"),
                  ("part", "p_partkey"), ("documents", "doc_id"),
                  ("embeddings", "vec_id")]:
        df = spark.read.parquet(f"{sf1}/{t}.parquet")
        assert df.select(pk).distinct().count() == df.count(), t


def test_join_selectivity_preserved(spark):
    """The property naive duplication would break: orders joined to
    customer must yield exactly 10x the sf0.1 match count (each
    replica joins only within itself), and per-key fan-in stays at the
    sf0.1 maximum."""
    sf1 = _sf1()
    o01 = spark.read.parquet(f"{SF01}/orders.parquet")
    c01 = spark.read.parquet(f"{SF01}/customer.parquet")
    n01 = o01.join(c01, o01.o_custkey == c01.c_custkey).count()
    o1 = spark.read.parquet(f"{sf1}/orders.parquet")
    c1 = spark.read.parquet(f"{sf1}/customer.parquet")
    n1 = o1.join(c1, o1.o_custkey == c1.c_custkey).count()
    assert n1 == 10 * n01, (n01, n1)

    max01 = (
        o01.groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    )
    max1 = o1.groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    assert max1 == max01, "per-key fan-in grew — replicas leaked into each other"


def test_document_replicas_are_not_exact_duplicates(spark):
    """Replica text perturbation keeps the corpus duplicate RATE at
    its sf0.1 level: the count of distinct texts must scale ~10x, not
    stay flat (flat = every doc gained 9 exact twins, which would
    quadratically inflate every dedup candidate join)."""
    sf1 = _sf1()
    d01 = spark.read.parquet(f"{SF01}/documents.parquet")
    d1 = spark.read.parquet(f"{sf1}/documents.parquet")
    u01 = d01.select("text").distinct().count()
    u1 = d1.select("text").distinct().count()
    assert u1 >= 9 * u01, (u01, u1)
