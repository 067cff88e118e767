"""Partition-layout behavior — the production file layout for fact
tables at 100 TB (REFLECTION.md item 3): partition by date, prune at
plan time for date predicates, and prune dynamically from a filtered
dimension join (DPP).

The driver testdata ships one flat parquet file per table, so this test
writes a small date-partitioned copy of `events` and asserts the two
pruning behaviors on it — the plan properties are scale-invariant.
"""

import pytest
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "events_by_date")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.partitionBy("event_date").mode("overwrite").parquet(path)
    return path


def _plan(spark, df, mode="formatted"):
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_static_partition_pruning(spark, partitioned_events):
    ev = spark.read.parquet(partitioned_events)
    n_days = ev.select("event_date").distinct().count()
    assert n_days > 3  # the layout actually split

    one_day = ev.select("event_date").distinct().orderBy("event_date").first()[0]
    q = ev.filter(F.col("event_date") == F.lit(one_day)).groupBy("event_type").count()
    plan = _plan(spark, q)
    # the date predicate lands in PartitionFilters (directory pruning),
    # not in the row-level data filters
    assert "PartitionFilters" in plan
    assert f"isnotnull(event_date" in plan
    # and the pruned read returns exactly the one day's rows
    full = spark.read.parquet(partitioned_events)
    expected = full.filter(F.col("event_date") == F.lit(one_day)).count()
    assert q.agg(F.sum("count")).first()[0] == expected


def test_dynamic_partition_pruning_from_dim_join(spark, partitioned_events, tmp_path):
    """A selectively-filtered dimension joined on the partition column
    must inject a runtime subquery filter into the fact scan (DPP) — at
    100 TB this is the difference between scanning 3 days and 3 years.

    Note the filter must be one Catalyst counts as selective (a real
    comparison): a bare boolean column is simplified to an attribute
    reference, which the DPP rule does NOT treat as selective — found
    the hard way, asserted here so the layout recipe stays honest.
    """
    ev = spark.read.parquet(partitioned_events)
    dim_path = str(tmp_path / "date_dim")
    ev.select("event_date").distinct().withColumn(
        "campaign",
        F.when(F.dayofmonth("event_date") % 2 == 0, "SUMMER").otherwise("NONE"),
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    q = (
        ev.join(dim.filter(F.col("campaign") == "SUMMER"), "event_date")
        .groupBy("event_type")
        .count()
    )
    plan = _plan(spark, q)
    assert "dynamicpruningexpression" in plan, plan
    # result parity with the statically-filtered equivalent
    summer_days = [r[0] for r in dim.filter("campaign = 'SUMMER'").collect()]
    expected = (
        ev.filter(F.col("event_date").isin(summer_days))
        .groupBy("event_type")
        .count()
        .collect()
    )
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, expected))
