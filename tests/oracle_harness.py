"""Local replica of the driver's DuckDB-oracle comparison (SURVEY.md §5.1):
run a Spark DataFrame and a DuckDB SQL on the same parquet tables, compare
row count, column names, and an order-insensitive value multiset.
"""

from __future__ import annotations

import math
import os

import duckdb

from flink_recommendation_system_spark.schemas import TESTDATA_TABLES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


# Spark dtype → expected DuckDB type (schema parity check)
_TYPE_MAP = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "array<string>": "VARCHAR[]",
    "array<bigint>": "BIGINT[]",
    "array<double>": "DOUBLE[]",
}


def _check_types(spark_df, oracle_query: str, sf_dir: str) -> None:
    import duckdb as _d

    con = _d.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    ddt = {r[0]: r[1] for r in con.execute(f"DESCRIBE {oracle_query}").fetchall()}
    con.close()
    for c, st in spark_df.dtypes:
        exp = _TYPE_MAP.get(st)
        if exp is not None and c in ddt:
            assert ddt[c] == exp, f"dtype mismatch {c}: spark={st} duck={ddt[c]}"


def compare(spark_df, oracle_query: str, sf_dir: str) -> None:
    """Assert the Spark result and the oracle result match (count, column
    names sorted, column dtypes, order-insensitive value multiset)."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d_cols, d_rows = duckdb_run(oracle_query, sf_dir)
    assert sorted(s_cols) == sorted(d_cols), f"columns {s_cols} vs {d_cols}"
    _check_types(spark_df, oracle_query, sf_dir)
    assert len(s_rows) == len(d_rows), f"rowcount {len(s_rows)} vs {len(d_rows)}"
    sm = _multiset(s_cols, s_rows)
    dm = _multiset(d_cols, d_rows)
    if sm != dm:
        only_s = [k for k in sm if sm[k] != dm.get(k, 0)][:5]
        only_d = [k for k in dm if dm[k] != sm.get(k, 0)][:5]
        raise AssertionError(
            f"value multiset mismatch; spark-only={only_s} duck-only={only_d}"
        )
