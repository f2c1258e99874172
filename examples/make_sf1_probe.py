"""Generate a deterministic sf1-SHAPED dataset for scale probing
(VERDICT r06 item 7): a real 10x-rows scale point over sf0.1 — continued
key sequences and 10x entity cardinality where the driver's own scaling
law grows them (users, customers, docs, vectors; products stay fixed at
100, the fixed-catalog law observed sf0.01 -> sf0.1) — NOT disjoint-id
replicas, so skew, AQE coalescing, and duplicate-cluster growth behave
like a genuine scale-up.

PROBE DATA ONLY: never used for correctness oracles (TESTDATA.md's
driver-generated parquet remains the only correctness input); writes to
/tmp/sf1_probe by default. Distributions are matched to the sf0.1
marginals (event-type mix, value range, props.k domain, doc vocab and
word frequencies, n_chars range); the exact driver RNG is unknown, so
absolute times at sf1 are comparable only within this probe, and the
headline metric is the sf0.1 -> sf1 RATIO per query.

Usage: python examples/make_sf1_probe.py [outdir]
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"

# sf0.1 -> sf1 multipliers per the observed sf0.01 -> sf0.1 law
N_EVENTS = 1_000_000
N_USERS = 15_000
N_PRODUCTS = 100          # fixed catalog
N_CUSTOMERS = 150_000
N_SUPPLIERS = 10_000
N_PARTS = 200_000
N_ORDERS = 1_500_000
N_LINEITEM = 6_000_000
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64

TS_LO, TS_HI = 1_704_067_200, 1_706_659_200  # the sf0.1 30-day window


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows", flush=True)


def main(outdir: str = "/tmp/sf1_probe") -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)

    # --- events ---------------------------------------------------------
    ts_s = rng.integers(TS_LO, TS_HI, N_EVENTS, dtype=np.int64)
    events = pa.table(
        {
            "event_id": pa.array(np.arange(N_EVENTS, dtype=np.int64)),
            "ts": pa.array(ts_s * 1_000_000, type=pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, N_USERS, N_EVENTS, dtype=np.int64)
            ),
            "event_type": pa.array(
                np.array(["signup", "click", "error", "view", "purchase"])[
                    rng.integers(0, 5, N_EVENTS)
                ]
            ),
            "value": pa.array(rng.uniform(0.0, 560.21, N_EVENTS)),
            "props": pa.array(
                [
                    '{"k": %d}' % k
                    for k in rng.integers(0, N_PRODUCTS, N_EVENTS)
                ]
            ),
        }
    )
    _write(outdir, "events", events)

    # --- region / nation (fixed dimensions) -----------------------------
    _write(
        outdir,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
                "r_name": pa.array([f"Region#{i}" for i in range(5)]),
            }
        ),
    )
    _write(
        outdir,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
                "n_name": pa.array([f"Nation#{i}" for i in range(25)]),
                "n_regionkey": pa.array(
                    (np.arange(25) % 5).astype(np.int32)
                ),
            }
        ),
    )

    # --- customer (continued key sequence — the fuzzy-join corpus) ------
    keys = np.arange(1, N_CUSTOMERS + 1, dtype=np.int64)
    _write(
        outdir,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(keys),
                "c_name": pa.array([f"Customer#{k:09d}" for k in keys]),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, N_CUSTOMERS).astype(np.int32)
                ),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, N_CUSTOMERS), 2)
                ),
                "c_mktsegment": pa.array(
                    np.array(
                        ["AUTOMOBILE", "BUILDING", "FURNITURE",
                         "HOUSEHOLD", "MACHINERY"]
                    )[rng.integers(0, 5, N_CUSTOMERS)]
                ),
            }
        ),
    )

    # --- supplier / part -------------------------------------------------
    skeys = np.arange(1, N_SUPPLIERS + 1, dtype=np.int64)
    _write(
        outdir,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(skeys),
                "s_name": pa.array([f"Supplier#{k:09d}" for k in skeys]),
                "s_nationkey": pa.array(
                    rng.integers(0, 25, N_SUPPLIERS).astype(np.int32)
                ),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, N_SUPPLIERS), 2)
                ),
            }
        ),
    )
    pkeys = np.arange(1, N_PARTS + 1, dtype=np.int64)
    _write(
        outdir,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(pkeys),
                "p_name": pa.array([f"Part#{k:09d}" for k in pkeys]),
                "p_brand": pa.array(
                    [f"Brand#{b}" for b in rng.integers(1, 6, N_PARTS)]
                ),
                "p_type": pa.array(
                    np.array(["SMALL", "MEDIUM", "LARGE", "ECONOMY",
                              "PROMO"])[rng.integers(0, 5, N_PARTS)]
                ),
                "p_size": pa.array(
                    rng.integers(1, 51, N_PARTS).astype(np.int32)
                ),
                "p_retailprice": pa.array(
                    np.round(rng.uniform(900.0, 2000.0, N_PARTS), 2)
                ),
            }
        ),
    )

    # --- orders / lineitem ----------------------------------------------
    okeys = np.arange(1, N_ORDERS + 1, dtype=np.int64)
    odate_s = rng.integers(
        694_224_000, 883_526_400, N_ORDERS, dtype=np.int64
    )  # 1992-1998
    _write(
        outdir,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(
                    rng.integers(1, N_CUSTOMERS + 1, N_ORDERS, dtype=np.int64)
                ),
                "o_orderstatus": pa.array(
                    np.array(["O", "F", "P"])[rng.integers(0, 3, N_ORDERS)]
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000.0, 400000.0, N_ORDERS), 2)
                ),
                "o_orderdate": pa.array(
                    odate_s * 1_000_000, type=pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                              "4-NOT SPECIFIED", "5-LOW"])[
                        rng.integers(0, 5, N_ORDERS)
                    ]
                ),
            }
        ),
    )
    li_order = np.repeat(okeys, 4)
    li_odate = np.repeat(odate_s, 4)
    n_li = li_order.shape[0]
    assert n_li == N_LINEITEM
    _write(
        outdir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(li_order),
                "l_partkey": pa.array(
                    rng.integers(1, N_PARTS + 1, n_li, dtype=np.int64)
                ),
                "l_suppkey": pa.array(
                    rng.integers(1, N_SUPPLIERS + 1, n_li, dtype=np.int64)
                ),
                "l_linenumber": pa.array(
                    np.tile(np.arange(1, 5, dtype=np.int32), N_ORDERS)
                ),
                "l_quantity": pa.array(
                    rng.integers(1, 51, n_li).astype(np.float64)
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900.0, 100000.0, n_li), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, n_li) / 100.0, 2)
                ),
                "l_tax": pa.array(
                    np.round(rng.integers(0, 9, n_li) / 100.0, 2)
                ),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    np.array(["O", "F"])[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": pa.array(
                    (li_odate + rng.integers(86_400, 121 * 86_400, n_li))
                    * 1_000_000,
                    type=pa.timestamp("us"),
                ),
            }
        ),
    )

    # --- documents (sf0.1 vocab + word frequencies, i.i.d. sampling) ----
    import duckdb

    con = duckdb.connect()
    freq = con.sql(
        f"""
        WITH w AS (
            SELECT unnest(string_split(text, ' ')) AS word
            FROM '{SF01}/documents.parquet'
        )
        SELECT word, count(*) AS c FROM w WHERE word != '' GROUP BY 1
        """
    ).fetchall()
    words = np.array([w for w, _ in freq])
    probs = np.array([c for _, c in freq], dtype=np.float64)
    probs /= probs.sum()
    langs = np.array(["en", "es", "de", "fr", "zh"])
    texts, nchars = [], []
    lens = rng.integers(8, 101, N_DOCS)
    for L in lens:
        t = " ".join(rng.choice(words, size=L, p=probs))
        texts.append(t)
        nchars.append(len(t))
    _write(
        outdir,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(langs[rng.integers(0, 5, N_DOCS)]),
                "source": pa.array(
                    [f"src{s}" for s in rng.integers(0, 20, N_DOCS)]
                ),
                "n_chars": pa.array(np.array(nchars, dtype=np.int64)),
            }
        ),
    )

    # --- embeddings ------------------------------------------------------
    emb = rng.standard_normal((N_VECS, DIM)).astype(np.float32)
    _write(
        outdir,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(N_VECS, dtype=np.int64)),
                "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
                "label": pa.array(
                    rng.integers(0, 10, N_VECS).astype(np.int32)
                ),
            }
        ),
    )
    print("done:", outdir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_probe")
