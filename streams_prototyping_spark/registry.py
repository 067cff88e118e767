"""Central query registry.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions)
registers here as a named batch query, optionally paired with an ANSI
SQL oracle string that DuckDB runs over the same parquet tables. The
driver's correctness harness consumes this via ``__spark_entry__.py``.

Contract (see __spark_entry__.py docstring): the Spark DataFrame and
the oracle SQL must produce identical column NAMES (driver sorts
columns by name before value-hashing), so every computed column is
aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# Queries whose plan contains an empty-partition window over an
# AGGREGATED input, with the human-stated reason the key domain is
# bounded (the fact the plan lint cannot prove mechanically — see
# plans/introspect.global_windows). tests/test_plans.py fails any
# aggregated global window without an entry here, and any stale entry.
BOUNDED_WINDOWS: dict[str, str] = {}


def register(
    name: str,
    oracle: Optional[str] = None,
    bounded_window: Optional[str] = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query.

    ``oracle`` is the DuckDB-runnable ANSI SQL twin; omit it only for
    genuinely non-SQL-expressible operators (the driver then records a
    weaker rows-only check).

    ``bounded_window`` declares WHY the query's empty-partition
    window(s) over aggregated input are safe at 100 TB — the value
    domain that bounds the window's row count (e.g. "distinct 2-dp
    cents", "calendar days", "histogram bins"). Required by the plan
    lint for every such window; forbidden when the plan has none.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if bounded_window is not None:
            BOUNDED_WINDOWS[name] = bounded_window
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imports are inside the function so `import streams_prototyping_spark`
    # stays cheap and circular imports are impossible.
    from streams_prototyping_spark.operators import (  # noqa: F401
        windowed_agg,
        ctr,
        relational,
        analytic,
        advanced,
        sql_layer,
        functions_ext,
        product_analytics,
        timeseries,
        tpch_ext,
        analytics_ext,
        lakehouse,
        stats_audits,
        hypothesis_tests,
        timeseries_ext,
        selection_ops,
    )
    from streams_prototyping_spark.functions import (  # noqa: F401
        clustering,
        corpus_stats,
        curation,
        dedup,
        dedup_pipeline,
        graph,
        packing,
        retrieval,
        similarity,
        span_quality,
        text,
        recall,  # imports similarity AND clustering; must load after both
        curation_ext,
        text_transform,
        multimodal,
        distribution_stats,
        feature_eng,
        retrieval_eval,
        graph_ml,
        text_mining,
        linalg,
        vector_quant,
        records,
        similarity_banded,  # imports similarity; must load after it
    )
