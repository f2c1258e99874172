"""Seeded ADVERSARIAL test-data generator (VERDICT r14 item 1).

Produces an sf-shaped parquet directory (same 10 tables, byte-identical
schemas) whose CONTENT is hostile: NULL-dense FK/value columns, empty and
whitespace-only and unicode text (CJK, RTL, emoji, combining accents),
negative / extreme / -0.0 / NaN / Inf numerics, pre-1970 and far-future
timestamps, duplicate keys, dangling foreign keys, empty and NULL-element
embedding vectors. The point is NOT to make queries fail — it is to run the
SAME 234-query Spark-vs-DuckDB oracle harness (tools/local_correctness.py)
on data where engine-semantics differences (NULL ordering at LIMIT
boundaries, NaN grouping, unicode collation, overflow promotion) actually
bite. Every divergence found is a defect in OUR query/oracle pair to fix.

All mutation is driven by a single seeded numpy Generator — the directory
is reproducible bit-for-bit for a given (seed, base-dir) pair.

Profiles:
    hostile  (default) — every table keeps its base row count (plus ~3%%
              appended duplicates); mutation rates per column class below.
    corners  — additionally truncates chosen tables to empty / single-row
              (region empty, supplier 1 row) to exercise empty-input plans.

Usage::

    python tools/make_adversarial_sf.py \
        [--base /root/testdata/sf0.001] [--out .adversarial_sf] \
        [--seed 15] [--profile hostile]
"""

from __future__ import annotations

import argparse
import datetime as dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# --- mutation rates per column class ------------------------------------
NULL_RATE_KEY = 0.03      # FK / id columns
NULL_RATE_VALUE = 0.10    # measure / text columns
STRING_SWAP_RATE = 0.12   # replace with a hostile string
DOUBLE_SWAP_RATE = 0.08   # replace with a hostile double
NAN_RATE = 0.01           # NaN / ±Inf injection (subset of doubles)
INT_SWAP_RATE = 0.05      # negative / large ints (non-key int columns)
TS_SWAP_RATE = 0.06       # extreme timestamps
DANGLE_RATE = 0.04        # FK -> nonexistent key
DUP_ROW_RATE = 0.03       # appended duplicate rows (exact + key-dup)
EMB_EMPTY_RATE = 0.03     # embedding -> []
EMB_NULL_ELT_RATE = 0.02  # one element inside the vector -> NULL

# Key (join) columns get the low NULL rate; everything else the high one.
KEY_COLS = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "event_id", "user_id",
    "doc_id", "vec_id",
}

# FK columns eligible for dangling-reference injection.
FK_COLS = {
    "c_nationkey", "s_nationkey", "n_regionkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "user_id",
}

HOSTILE_STRINGS = [
    "",                          # empty
    " ",                         # single space
    "\t \n",                     # whitespace soup
    "  leading and trailing  ",
    "héllo wörld",               # latin-1-ish accents
    "é́tude",         # combining accents
    "以呂波耳本部止千利奴流乎",       # CJK
    "مرحبا بالعالم",              # RTL arabic
    "🚀🔥💯",                     # emoji (surrogate pairs in UTF-16 land)
    "ZMIXßCASE",            # sharp s (case-folding trap)
    "null",                      # the string, not the value
    "NaN",
    'a,"b",c',                   # csv-hostile
    "line1\nline2",
    "'); DROP TABLE t;--",
    "\x00-adjacent" if False else "ctl-free",  # literal NUL excluded (parquet-stats-safe)
    "x" * 2000,                  # very long
]

HOSTILE_DOUBLES = [0.0, -0.0, 1e18, -1e18, 1e-300, -1e-300, 123456789.987654321]
HOSTILE_FLOATS_NONFINITE = [float("nan"), float("inf"), float("-inf")]
HOSTILE_INTS = [-1, 0, -999999, 2**31 - 1, 10**9]
HOSTILE_TIMESTAMPS = [
    dt.datetime(1905, 3, 31, 23, 59, 59, 999999),
    dt.datetime(1969, 12, 31, 23, 59, 59),       # just before epoch
    dt.datetime(1970, 1, 1, 0, 0, 0),            # epoch exactly
    dt.datetime(2199, 12, 31, 0, 0, 1),
    dt.datetime(2000, 2, 29, 12, 0, 0),          # leap day
]


def _mutate_column(name: str, typ: pa.DataType, vals: list, rng) -> list:
    n = len(vals)
    if n == 0:
        return vals
    out = list(vals)
    null_rate = NULL_RATE_KEY if name in KEY_COLS else NULL_RATE_VALUE

    def picks(rate):
        return np.flatnonzero(rng.random(n) < rate)

    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        for i in picks(STRING_SWAP_RATE):
            out[i] = HOSTILE_STRINGS[int(rng.integers(len(HOSTILE_STRINGS)))]
    elif pa.types.is_float64(typ) or pa.types.is_float32(typ):
        for i in picks(DOUBLE_SWAP_RATE):
            out[i] = HOSTILE_DOUBLES[int(rng.integers(len(HOSTILE_DOUBLES)))]
        for i in picks(NAN_RATE):
            out[i] = HOSTILE_FLOATS_NONFINITE[
                int(rng.integers(len(HOSTILE_FLOATS_NONFINITE)))]
    elif pa.types.is_integer(typ) and name not in KEY_COLS:
        lim = 2**31 - 1 if pa.types.is_int32(typ) else None
        for i in picks(INT_SWAP_RATE):
            v = HOSTILE_INTS[int(rng.integers(len(HOSTILE_INTS)))]
            out[i] = min(v, lim) if lim is not None else v
    elif pa.types.is_timestamp(typ):
        for i in picks(TS_SWAP_RATE):
            out[i] = HOSTILE_TIMESTAMPS[int(rng.integers(len(HOSTILE_TIMESTAMPS)))]
    elif pa.types.is_list(typ):  # embeddings
        for i in picks(EMB_EMPTY_RATE):
            out[i] = []
        for i in picks(EMB_NULL_ELT_RATE):
            v = out[i]
            if v:
                v = list(v)
                v[int(rng.integers(len(v)))] = None
                out[i] = v

    if name in FK_COLS and pa.types.is_integer(typ):
        for i in picks(DANGLE_RATE):
            out[i] = 987_654_321 if not pa.types.is_int32(typ) else 1_987_654
    # NULL injection last so it can land on mutated cells too.
    for i in picks(null_rate):
        out[i] = None
    return out


def _mutate_table(tbl: pa.Table, rng) -> pa.Table:
    schema = tbl.schema
    cols = {f.name: tbl.column(f.name).to_pylist() for f in schema}
    n = tbl.num_rows

    # Appended duplicate rows: half exact duplicates, half key-duplicates
    # with re-randomized value columns (same key, different payload).
    n_dup = max(1, int(n * DUP_ROW_RATE)) if n > 0 else 0
    dup_idx = rng.integers(0, n, size=n_dup) if n > 0 else []
    for name in cols:
        base = cols[name]
        extra = [base[int(i)] for i in dup_idx]
        cols[name] = base + extra
    # Perturb value columns of the second half of the duplicates so they
    # are key-dups, not pure row-dups.
    half = n_dup // 2
    for f in schema:
        if f.name in KEY_COLS or half == 0:
            continue
        seg = cols[f.name]
        for j in range(len(seg) - half, len(seg)):
            if pa.types.is_floating(f.type) and seg[j] is not None:
                seg[j] = float(seg[j]) + 0.5
            elif pa.types.is_string(f.type) and seg[j] is not None:
                seg[j] = seg[j] + "~dup"

    mutated = {
        f.name: _mutate_column(f.name, f.type, cols[f.name], rng)
        for f in schema
    }
    arrays = [pa.array(mutated[f.name], type=f.type) for f in schema]
    return pa.Table.from_arrays(arrays, schema=schema)


def generate(base: str, out: str, seed: int, profile: str) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        tbl = pq.read_table(src)
        mut = _mutate_table(tbl, rng)
        if profile == "corners":
            if t == "region":
                mut = mut.slice(0, 0)      # empty table
            elif t == "supplier":
                mut = mut.slice(0, 1)      # single row
        pq.write_table(mut, os.path.join(out, f"{t}.parquet"))
        print(f"{t}: {tbl.num_rows} -> {mut.num_rows} rows")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".adversarial_sf"))
    ap.add_argument("--seed", type=int, default=15)
    ap.add_argument("--profile", choices=["hostile", "corners"],
                    default="hostile")
    args = ap.parse_args()
    generate(args.base, args.out, args.seed, args.profile)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
