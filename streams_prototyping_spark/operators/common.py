"""Shared expression helpers for oracle-parity queries.

Floating-point sums are order-dependent, and Spark's shuffle order is
nondeterministic — a raw ``sum(double)`` over 60k rows can differ from
DuckDB's in the last few ulps, which breaks the driver's value-hash
compare. Money-like columns in the testdata have exactly 2 decimal
places, so we sum EXACTLY in decimal and cast the final result back to
double: bit-identical in every engine, and on Spark the decimal sum is
still whole-stage-codegen'd JVM work (no perf cliff at 100 TB — decimal
aggregation is what TPC-DS does all day).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str) -> Column:
    """Exact sum of a 2-decimal money column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,2)")).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def davg(col: Column | str) -> Column:
    """Exact-numerator average of a 2-decimal column (double result).

    sum is exact decimal; the single final division is deterministic.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,2)")).cast("double") / F.count(c)


def davg_sql(expr: str) -> str:
    return f"(CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / count({expr}))"


def epoch_seconds(col: Column | str) -> Column:
    """Timestamp -> whole epoch seconds (bigint), truncating like
    DuckDB's CAST(floor(epoch(ts)) AS BIGINT). unix_timestamp handles
    both TIMESTAMP and TIMESTAMP_NTZ inputs (the testdata parquet is
    NTZ; session timezone is pinned to UTC so the two coincide)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(c)


EPOCH_SQL = "CAST(floor(epoch({expr})) AS BIGINT)"


def epoch_seconds_sql(expr: str) -> str:
    return EPOCH_SQL.format(expr=expr)


def tumbling_start(col: Column | str, width_s: int) -> Column:
    """Start of the tumbling window containing ts, as epoch seconds.

    Matches Spark's window(ts, f"{width_s} seconds").start and the
    DuckDB twin floor(epoch(ts)/w)*w.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(F.unix_timestamp(c) / width_s) * width_s).cast("long")


def tumbling_start_sql(expr: str, width_s: int) -> str:
    return f"CAST(floor(epoch({expr})/{width_s})*{width_s} AS BIGINT)"
