"""Shared expression helpers for oracle-parity queries.

Floating-point sums are order-dependent, and Spark's shuffle order is
nondeterministic — a raw ``sum(double)`` over 60k rows can differ from
DuckDB's in the last few ulps, which breaks the driver's value-hash
compare. Money-like columns in the testdata have exactly 2 decimal
places, so queries sum EXACTLY in decimal and cast the final result
back to double: bit-identical in every engine, and on Spark the decimal
sum is still whole-stage-codegen'd JVM work (no perf cliff at 100 TB —
decimal aggregation is what TPC-DS does all day).

Spark-side queries write the pattern inline
(``F.sum(col.cast("decimal(18,2)")).cast("double")``) so each plan is
self-describing; the SQL twin uses :func:`dsum_sql`. Products of 2-dp
columns multiply the DECIMALS (exact at 4 dp) — rounding a double
product to decimal rounds differently across engines.

Timestamps: the testdata parquet loads as TIMESTAMP_NTZ, which cannot
cast directly to BIGINT — epoch extraction is ``F.unix_timestamp``
(session timezone is pinned to UTC by data.ensure_session_defaults, so
NTZ wall time == DuckDB's ``epoch()``).
"""

from __future__ import annotations


def dsum_sql(expr: str) -> str:
    """DuckDB SQL: exact decimal sum of a 2-dp expression, as double."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) "
