"""operators/ranks.py — the scalable rank/prefix-sum building blocks
that replaced every corpus-sized single-partition window (round 6).
Each helper is checked against the naive global-window ground truth on
small frames, including ties, descending order, multi-measure sums,
and bucket-boundary edges."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from streams_prototyping_spark.operators.ranks import (
    bucketed_cum_counts,
    bucketed_row_cum,
    bucketed_running_sums,
    value_at_rank,
    value_cum_counts,
)


@pytest.fixture(scope="module")
def values_df(spark):
    # duplicates, a gap, and values straddling bucket boundaries of 10
    rows = [(v,) for v in [3, 7, 7, 9, 10, 10, 10, 11, 25, 25, 31, 40, 40, 41]]
    return spark.createDataFrame(rows, "v long")


def _ground_truth_cum(df):
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    return {
        r["v"]: r["cum"]
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("v", F.sum("cnt").over(w).alias("cum"))
        .collect()
    }


def test_value_cum_counts_matches_ground_truth(values_df):
    truth = _ground_truth_cum(values_df)
    got = {r["v"]: (r["cum"], r["cum_before"], r["cnt"])
           for r in value_cum_counts(values_df, "v").collect()}
    assert set(got) == set(truth)
    for v, (cum, cum_before, cnt) in got.items():
        assert cum == truth[v]
        assert cum_before == cum - cnt


def test_bucketed_cum_counts_equals_single_level(values_df):
    single = {r["v"]: (r["cum"], r["cum_before"])
              for r in value_cum_counts(values_df, "v").collect()}
    two = {r["v"]: (r["cum"], r["cum_before"])
           for r in bucketed_cum_counts(
               values_df, "v", lambda c: F.floor(c / 10)
           ).collect()}
    assert single == two


def test_value_at_rank_selects_kth(values_df, spark):
    # sorted values: rank k (1-based) -> k-th smallest, ties collapsed
    all_sorted = sorted(v[0] for v in values_df.collect())
    cum = value_cum_counts(values_df, "v")
    for k in (1, 2, 4, 7, len(all_sorted)):
        sel = cum.where(value_at_rank(F.lit(k))).collect()
        assert len(sel) == 1
        assert sel[0]["v"] == all_sorted[k - 1]


def test_bucketed_row_cum_matches_range_frame(values_df):
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    truth = [r["c"] for r in values_df.select(
        "v", F.count(F.lit(1)).over(w).alias("c")).orderBy("v").collect()]
    got_df = bucketed_row_cum(values_df, "v", lambda c: F.floor(c / 10), "c")
    got = [r["c"] for r in got_df.orderBy("v").collect()]
    assert got == truth


def test_bucketed_row_cum_descending(values_df):
    w = Window.orderBy(F.col("v").desc()).rangeBetween(Window.unboundedPreceding, 0)
    truth = [r["c"] for r in values_df.select(
        "v", F.count(F.lit(1)).over(w).alias("c")).orderBy("v").collect()]
    got_df = bucketed_row_cum(
        values_df, "v", lambda c: F.floor(c / 10), "c", ascending=False
    )
    got = [r["c"] for r in got_df.orderBy("v").collect()]
    assert got == truth


def test_bucketed_running_sums_matches_global_window(spark):
    rows = [(i, (i * 7) % 13 + 1, ((i * 3) % 5) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    truth = {
        r["id"]: (r["ca"], r["cb"])
        for r in df.select(
            "id", F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
        ).collect()
    }
    got_df = bucketed_running_sums(
        df,
        F.floor(F.col("id") / 16),
        [F.col("id").asc()],
        {"ca": F.col("a"), "cb": F.col("b")},
    )
    got = {r["id"]: (r["ca"], r["cb"]) for r in got_df.collect()}
    assert got == truth


def test_bucketed_running_sums_descending_leading_key(spark):
    # q desc with doc_id tiebreak (the token_budget_select shape):
    # bucket = floor(-q * 4) is monotone non-decreasing along the order
    rows = [(i, round(((i * 37) % 11) / 10.0, 1)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, q double")
    w = Window.orderBy(F.col("q").desc(), F.col("id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    truth = {r["id"]: r["rn"] for r in df.select(
        "id", F.sum(F.lit(1)).over(w).alias("rn")).collect()}
    got_df = bucketed_running_sums(
        df,
        F.floor(F.col("q") * -4),
        [F.col("q").desc(), F.col("id").asc()],
        {"rn": F.lit(1)},
    )
    got = {r["id"]: r["rn"] for r in got_df.collect()}
    assert got == truth


def test_running_sums_no_single_partition_window_over_rows(spark):
    """The whole point: the only empty-partition window in the plan
    must sit over the bucket AGGREGATE, never over the input rows."""
    from streams_prototyping_spark.plans.introspect import global_windows

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    out = bucketed_running_sums(
        df, F.floor(F.col("id") / 64), [F.col("id").asc()], {"c": F.col("m")}
    )
    assert all(cls != "raw" for cls, _ in global_windows(out))
