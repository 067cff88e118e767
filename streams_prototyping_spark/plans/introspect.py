"""Physical-plan introspection — the 'explain and iterate' tooling.

Used by tests/test_plans.py and scripts/dump_plans.py; keeps the
jvm-reflection plumbing in one place.
"""

from __future__ import annotations

import re
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
    # empty-partition (single-task) windows, by input class — see
    # global_windows(); raw must be 0 everywhere, agg requires a
    # registered bounded_window annotation.
    raw_gwin: int = 0
    agg_gwin: int = 0

    @property
    def summary(self) -> str:
        return (
            f"scans={self.scans} shuffles={self.shuffles} "
            f"bhj={self.broadcast_joins} smj={self.sort_merge_joins} "
            f"cartesian={self.has_cartesian} python={self.has_python} "
            f"pushdown={self.pushed_filters} "
            f"gwin=raw:{self.raw_gwin},agg:{self.agg_gwin}"
        )


_ATTR_ID = re.compile(r"#\d+L?")


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


# Logical-plan node classes for the global-window lint.
_LIMIT_NODES = ("GlobalLimit", "WindowGroupLimit")
_AGG_NODES = ("Aggregate", "Deduplicate")
# Literal / generated leaves (quantile spines, spark.range bin ids,
# 1-row parameter frames) — bounded by construction. LogicalRDD is
# deliberately NOT here (ADVICE r6): localCheckpoint() materializes
# arbitrarily large corpus-sized frames as LogicalRDD leaves, so
# treating the node class as bounded would let an empty-partition
# window over checkpointed data silently pass the exact lint built to
# hard-fail that shape. A genuinely small driver-created frame that
# feeds a global window must instead be capped in-plan (limit/top-k)
# or aggregated + annotated like every other input.
_LITERAL_LEAVES = ("LocalRelation", "OneRowRelation", "Range")
_CLASS_RANK = {"raw": 0, "aggregated": 1, "bounded": 2}


def _window_input_class(node) -> str:
    """Classify a global window's input subtree:

    - ``bounded``  — a limit/top-k (or literal spine) caps the row
      count on every leaf path; always safe.
    - ``aggregated`` — every leaf path passes a groupBy/distinct, so
      the window sees one row per distinct key. Safe ONLY if the key
      domain is value-bounded (2-dp cents, calendar days, bin ids) —
      which is a semantic fact the plan cannot prove, so the registry
      requires an explicit ``bounded_window=`` annotation stating it.
    - ``raw`` — some leaf path reaches a file-backed relation (or a
      cached InMemoryRelation, conservatively) with no aggregate in
      between: the window serializes corpus-sized rows through one
      task. Never acceptable; the lint hard-fails.

    Joins/unions take the WORST child class (a join against a raw side
    scales with the raw side).
    """
    name = node.nodeName()
    if name in _LIMIT_NODES:
        return "bounded"
    if name in _AGG_NODES:
        return "aggregated"
    kids = _children(node)
    if not kids:
        return "bounded" if name in _LITERAL_LEAVES else "raw"
    return min((_window_input_class(k) for k in kids), key=_CLASS_RANK.get)


def global_windows(df: DataFrame) -> list[tuple[str, str]]:
    """THE plan lint for round-5 verdict item 2 (and the round-6 sweep
    that found six MORE corpus-sized cases the alphas missed): a
    Window with an EMPTY partition spec plans as ``Exchange
    SinglePartition`` — every input row funnels through ONE task, a
    parallelism ceiling invisible to correctness tests and to scaling
    exponents measured on a single box.

    Walks the optimized logical plan (physical plans rename expression
    grouping keys to ``_groupingexpression#N``, losing the information
    this lint needs) and returns ``(input_class, description)`` per
    empty-partition window whose input class is not ``bounded``.
    tests/test_plans.py asserts: no ``raw`` entries anywhere, and every
    ``aggregated`` entry belongs to a query with a registered
    ``bounded_window`` annotation naming the key domain.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    out: list[tuple[str, str]] = []

    def walk(node):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            order = [
                _ATTR_ID.sub("", node.orderSpec().apply(i).child().toString())
                for i in range(node.orderSpec().size())
            ]
            cls = _window_input_class(_children(node)[0])
            if cls != "bounded":
                out.append((cls, f"Window(orderBy={order}) input={cls}"))
        for k in _children(node):
            walk(k)

    walk(plan)
    return out


def global_window_input_counts(df: DataFrame) -> list[tuple[str, int]]:
    """MEASURE each empty-partition window's input instead of trusting
    the annotation (r6 verdict item 2): execute every such window's
    CHILD subtree and count its rows. A ``bounded_window`` annotation
    claims the key domain does not track corpus size — plan walking
    cannot prove that semantic fact, but running the child at several
    scale factors can FALSIFY it: an annotated input whose row count
    grows ~linearly with the corpus re-opens the single-partition class
    the lint exists to close (scripts/annotation_cardinality.py sweeps
    sf0.1/sf1/sf10 and tests/test_plans.py reds on corpus-tracking
    growth in the committed artifact).

    Returns ``[(input_class, n_rows), ...]`` for each empty-partition
    window whose input class is not ``bounded``.
    """
    spark = df.sparkSession
    plan = df._jdf.queryExecution().optimizedPlan()
    out: list[tuple[str, int]] = []

    def walk(node):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            child = _children(node)[0]
            cls = _window_input_class(child)
            if cls != "bounded":
                jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                    spark._jsparkSession, child
                )
                out.append((cls, DataFrame(jdf, spark).count()))
        for k in _children(node):
            walk(k)

    walk(plan)
    return out


def plan_facts(df: DataFrame) -> PlanFacts:
    simple = explain_str(df, "simple")
    formatted = explain_str(df, "formatted")
    gwin = global_windows(df)
    return PlanFacts(
        raw_gwin=sum(1 for cls, _ in gwin if cls == "raw"),
        agg_gwin=sum(1 for cls, _ in gwin if cls == "aggregated"),
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
