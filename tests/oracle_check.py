"""Local replica of the driver's DuckDB-oracle correctness check.

Stricter than the driver: we require the value multisets to match
EXACTLY (cell-by-cell canonical string equality), so any representation
drift (float noise, timestamp timezone, int width) fails here first.
"""

from __future__ import annotations

import math

import duckdb

from streams_prototyping_spark.data import TABLES


def _canon_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:nan"
        return f"float:{v!r}"
    if isinstance(v, int):
        return f"int:{v}"
    return f"{type(v).__name__}:{v}"


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    try:
        import os

        # Bounded memory + absolute spill dir: the default (80% of RAM,
        # cwd-relative .tmp) dies with a bad-allocation OOM when a
        # concurrent Spark session holds most of the box at sf1 —
        # spilling to disk keeps big-oracle queries (pagerank, LSH
        # self-joins) deterministic instead of environment-dependent.
        os.makedirs("/tmp/duckdb_oracle_spill", exist_ok=True)
        # Default fits alongside a running Spark session at sf<=1; the
        # sf10 targeted pass needs more for the vector self-join oracles
        # (list columns don't spill in DuckDB's hash join) — override
        # via SPARK_GRAFT_ORACLE_MEM for those runs.
        con.execute(
            f"SET memory_limit='{os.environ.get('SPARK_GRAFT_ORACLE_MEM', '24GB')}'"
        )
        con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            # driver testdata ships single files; Spark-written sets
            # (e.g. the sf1 upscale) are part-file directories
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def compare_to_oracle(spark, query_fn, oracle: str, sf_dir: str) -> None:
    sdf = query_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(oracle, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"column names differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_canon = _canon_rows(s_cols, s_rows)
    o_canon = _canon_rows(o_cols, o_rows)
    if s_canon != o_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, o_canon) if a != b
        ][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
