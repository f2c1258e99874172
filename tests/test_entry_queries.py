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


def test_no_silently_empty_oracles():
    """Guard against literals going stale when the driver regenerates
    testdata (round 4 lesson: REGION_0 → EUROPE, fully-ordered customers,
    re-drawn embeddings): an oracle that returns 0 rows at sf0.01 would
    keep 'matching' an equally-empty Spark result while checking nothing.
    DuckDB-only, so the scan is cheap. Queries that are legitimately empty
    at sf0.01 must be allowlisted here with a reason."""
    from tests.oracle_harness import duckdb_run

    legitimately_empty: dict[str, str] = {}
    empty = []
    for name, sql in ORACLES.items():
        if name in legitimately_empty:
            continue
        _cols, rows = duckdb_run(sql, "/root/testdata/sf0.01")
        if len(rows) == 0:
            empty.append(name)
    assert not empty, f"oracles with 0 rows at sf0.01 (stale literals?): {empty}"


def test_audit_class_registry_is_consistent():
    """Registry-level audit-class marking (VERDICT r11 item 6): every
    name in AUDIT_CLASS_QUERIES must be a registered query, the two
    deliberately-superlinear SemDeDup baseline tiers must be marked, and
    every entry must name a registered production-scale twin so a user
    scanning the registry can find the tier to run instead."""
    marked = entrymod.AUDIT_CLASS_QUERIES
    assert set(marked) <= set(QUERIES), sorted(set(marked) - set(QUERIES))
    assert {"semantic_dedup_fixed", "semantic_dedup_sqrt"} <= set(marked)
    for name, (why, twin) in marked.items():
        assert why and twin, name
        # the twin field must reference at least one registered query
        assert any(q in twin for q in QUERIES), (name, twin)


def test_rows_only_twin_map_is_consistent():
    """Machine-readable rows-only pairing (VERDICT r12 item 8): the six
    permanent no-oracle queries each name a hash-exact twin. The map must
    cover EXACTLY the no-oracle set (a new rows-only query without a twin
    fails here, as does a rows-only query that gains an oracle but keeps
    a stale map entry), every twin must be registered AND value-oracled,
    and no query may be its own twin."""
    twins = entrymod.ROWS_ONLY_TWINS
    no_oracle = set(QUERIES) - set(ORACLES)
    assert set(twins) == no_oracle, (
        sorted(set(twins) ^ no_oracle)
    )
    for name, twin in twins.items():
        assert twin in QUERIES, (name, twin)
        assert twin in ORACLES, (name, twin)  # twin must be hash-exact
        assert twin != name, name


def test_rows_only_twins_share_metric_grain(spark):
    """The pairing argument only holds if each twin computes the SAME
    metric shape (VERDICT r13 item 8, locking the r13 supplier-key
    upgrade): the twin must carry the rows-only query's key/grain column
    (its first output column) and at least half of its columns overall —
    a twin drifting to a different grain fails here before a verdict has
    to argue about it. Column inspection only (no job runs except the
    eager MLlib fits the rows-only plans themselves perform)."""
    for name, twin in entrymod.ROWS_ONLY_TWINS.items():
        cols = QUERIES[name](spark, SF0001).columns
        twin_cols = QUERIES[twin](spark, SF0001).columns
        assert cols[0] == twin_cols[0], (name, twin, cols, twin_cols)
        shared = set(cols) & set(twin_cols)
        assert len(shared) * 2 >= len(cols), (name, twin, cols, twin_cols)
    # pin the r13 upgrade specifically: both HLL-per-brand queries are
    # keyed on p_brand and estimate DISTINCT SUPPLIERS (not orders)
    assert QUERIES["approx_supplier_counts"](spark, SF0001).columns == [
        "p_brand",
        "approx_suppliers",
    ]
