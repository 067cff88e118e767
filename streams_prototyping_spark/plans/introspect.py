"""Physical-plan introspection — the 'explain and iterate' tooling.

Used by tests/test_plans.py and scripts/dump_plans.py; keeps the
jvm-reflection plumbing in one place.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """df.explain() as a string (modes: simple, extended, formatted,
    codegen, cost)."""
    spark = df.sparkSession
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def executed_plan_str(df: DataFrame) -> str:
    """The post-AQE executed plan (only meaningful after an action)."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanFacts:
    """The scale-relevant facts extracted from a physical plan."""

    broadcast_joins: int
    sort_merge_joins: int
    shuffles: int
    has_cartesian: bool
    has_python: bool
    pushed_filters: bool
    scans: int

    @property
    def summary(self) -> str:
        return (
            f"scans={self.scans} shuffles={self.shuffles} "
            f"bhj={self.broadcast_joins} smj={self.sort_merge_joins} "
            f"cartesian={self.has_cartesian} python={self.has_python} "
            f"pushdown={self.pushed_filters}"
        )


def plan_facts(df: DataFrame) -> PlanFacts:
    simple = explain_str(df, "simple")
    formatted = explain_str(df, "formatted")
    return PlanFacts(
        broadcast_joins=simple.count("BroadcastHashJoin"),
        sort_merge_joins=simple.count("SortMergeJoin"),
        shuffles=simple.count("Exchange hashpartitioning")
        + simple.count("Exchange rangepartitioning"),
        has_cartesian="CartesianProduct" in simple,
        has_python=any(
            m in simple for m in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas")
        ),
        # true iff at least one scan has a NON-empty pushed-filter list:
        # inspect the text AFTER each marker (a segment starting with ']'
        # is an empty 'PushedFilters: []' entry)
        pushed_filters=any(
            not seg.startswith("]")
            for seg in formatted.split("PushedFilters: [")[1:]
        ),
        scans=simple.count("Scan parquet"),
    )
