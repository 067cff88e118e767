"""The adaptive index-depth formulas (LSH bits, k-means K) exist in
two engines: a Python driver-side computation and a DuckDB scalar
subquery inside the oracle CTEs. If they ever disagree for some corpus
size, the Spark query and its oracle would build different indexes and
the hash check would fail confusingly far from the cause — so pin the
cross-engine agreement here, Spark-free, across boundary values
(powers of two, off-by-ones, the clamp edges)."""

import math

import duckdb

from streams_prototyping_spark.functions import clustering, similarity

NS = [1, 2, 100, 127, 128, 129, 200, 255, 256, 257, 1000, 2000, 2047,
      2048, 2049, 16384, 20000, 100000, 524288, 10**6, 10**7]


def _duck_eval(expr_template: str, n: int) -> int:
    """Evaluate the oracle's depth expression against a fake vecs CTE
    of n rows (count(*) is all the expression reads)."""
    con = duckdb.connect()
    try:
        return con.execute(
            f"WITH vecs AS (SELECT * FROM range({n})) "
            f"SELECT {expr_template} FROM vecs"
        ).fetchone()[0]
    finally:
        con.close()


def _py_lsh_bits(n: int) -> int:
    raw = math.ceil(math.log2(n / float(similarity.TARGET_BUCKET_OCC))) if n else 0
    return max(similarity.LSH_BITS, min(similarity.MAX_LSH_BITS, raw))


def _py_k_cells(n: int) -> int:
    return max(
        clustering.K_CELLS,
        min(clustering.MAX_K_CELLS, math.ceil(n / float(clustering.TARGET_CELL_SIZE))),
    )


def test_lsh_bits_formula_matches_oracle_expression():
    for n in NS:
        assert _py_lsh_bits(n) == _duck_eval(similarity._NB_EXPR_DUCK, n), n


def test_k_cells_formula_matches_oracle_expression():
    for n in NS:
        assert _py_k_cells(n) == _duck_eval(clustering._K_EXPR_DUCK, n), n


def test_depths_are_pinned_at_driver_tested_sfs():
    """All committed correctness artifacts were produced at embeddings
    counts <= 2000 — the formulas MUST yield the historical constants
    there, or old artifacts would stop being reproducible."""
    for n in (200, 2000):  # sf0.01, sf0.1
        assert _py_lsh_bits(n) == similarity.LSH_BITS
        assert _py_k_cells(n) == clustering.K_CELLS


def test_adaptive_depth_cross_engine_at_sf1(spark):
    """End-to-end proof that BOTH engines build the SAME deepened
    index on a corpus large enough to trigger the adaptive formulas:
    at the sf1 upscale (20k vectors -> 8 LSH bits) the Spark query and
    its DuckDB oracle still hash-match. Skipped when the sf1 dataset
    is absent (regenerate with `python scripts/make_sf1.py`)."""
    import os

    import pytest

    from streams_prototyping_spark import registry
    from tests.oracle_check import compare_to_oracle

    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    if not os.path.exists(os.path.join(sf1, "_SUCCESS_SF1")):
        pytest.skip("sf1 upscale not generated (scripts/make_sf1.py)")
    registry.load_all()
    for name in ("ann_lsh_topk_multiprobe", "knn_label_eval"):
        compare_to_oracle(
            spark, registry.QUERIES[name], registry.ORACLES[name], sf1
        )


def test_depths_grow_on_upscale():
    """At the sf1 upscale (20k vectors) both indexes deepen, which is
    the whole point: bucket/cell occupancy stays near target instead of
    growing 10x (measured: knn_label_eval alpha 1.15 -> 0.13)."""
    assert _py_lsh_bits(20000) == 8
    assert _py_k_cells(20000) > clustering.K_CELLS
    # occupancy near target at both scales
    for n in (2000, 20000, 10**6):
        occ = n / 2 ** _py_lsh_bits(n)
        assert occ <= 2 * similarity.TARGET_BUCKET_OCC or (
            _py_lsh_bits(n) == similarity.MAX_LSH_BITS
        )
