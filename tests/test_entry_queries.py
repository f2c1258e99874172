"""Every declared query hash-matches its DuckDB oracle at sf0.001 (fast) —
the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF0001
from tests.oracle_harness import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF0001)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    compare(df, ORACLES[name], SF0001)
