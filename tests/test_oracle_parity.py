"""Every registered query with an oracle must hash-match it — the local
replica of the driver's t2 correctness gate (one pytest case per query,
so a failure names the broken operator)."""

import pytest

from streams_prototyping_spark import registry
from tests.oracle_check import compare_to_oracle

registry.load_all()

_WITH_ORACLE = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    compare_to_oracle(spark, registry.QUERIES[name], registry.ORACLES[name], sf_dir)


def test_every_query_runs(spark, sf_dir):
    """Queries without oracles must still execute and return a stable schema."""
    no_oracle = set(registry.QUERIES) - set(registry.ORACLES)
    for name in sorted(no_oracle):
        df = registry.QUERIES[name](spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "avg_x2" in df.columns
