"""Local replica of the driver's sf0.01 correctness gate over the FULL
registered surface (the driver's own window covers only the first 50
``queries()`` entries per round).

Emits one JSON object per query to ``CORRECTNESS_LOCAL.json`` in the repo
root, in the driver's row shape (rows_match / schema_match / hash_match /
spark_rows / oracle_rows / err), so out-of-window queries carry a current
sf0.01 signal between driver window rotations (VERDICT r04 item 8).

Usage::

    python tools/local_correctness.py [--sf-dir /root/testdata/sf0.01] \
        [--only name1,name2] [--out CORRECTNESS_LOCAL.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_harness import _multiset, duckdb_run  # noqa: E402


def run_one(spark, fn, sql: str | None, sf_dir: str) -> dict:
    row: dict = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        df = fn(spark, sf_dir)
        scols = df.columns
        srows = [tuple(r) for r in df.collect()]
        row["spark_rows"] = len(srows)
        if sql is None:
            # rows-only tier: stricter than the driver's >= 0 gate — every
            # registered oracle-less query is non-empty at sf0.01, so an
            # empty result here means total breakage, not a pass
            row["rows_match"] = row["spark_rows"] > 0
            return row
        ocols, orows = duckdb_run(sql, sf_dir)
        row["oracle_rows"] = len(orows)
        row["rows_match"] = len(srows) == len(orows)
        row["schema_match"] = sorted(scols) == sorted(ocols)
        row["hash_match"] = _multiset(scols, srows) == _multiset(ocols, orows)
    except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
        row["err"] = f"{type(e).__name__}: {e}"[:500]
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_LOCAL.json"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from flink_recommendation_system_spark.session import (
        LOCAL_SF_MAX_PARTITION_BYTES,
        get_spark,
    )

    queries = entrymod.queries()
    sqls = entrymod.oracle_sql()
    names = list(queries)
    if args.only:
        want = [n.strip() for n in args.only.split(",") if n.strip()]
        missing = [n for n in want if n not in queries]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
        names = want

    spark = get_spark(
        "local-correctness", max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES
    )
    results: dict[str, dict] = {}
    t_total = time.time()
    n_bad = 0
    partial_path = args.out + ".partial.jsonl"
    with open(partial_path, "w"):
        pass  # truncate any previous partial log
    for name in names:
        print(f"RUN  {name}", flush=True)
        t0 = time.time()
        row = run_one(spark, queries[name], sqls.get(name), args.sf_dir)
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        ok = row["err"] is None and (
            row["hash_match"] or (sqls.get(name) is None and row["rows_match"])
        )
        if not ok:
            n_bad += 1
        print(f"{'PASS' if ok else 'FAIL'} {name} ({row['sec']}s)"
              + (f" err={row['err']}" if row["err"] else ""),
              flush=True)
        # incremental record: a crashed/killed sweep keeps its evidence
        with open(partial_path, "a") as f:
            f.write(json.dumps({name: row}) + "\n")

    payload = {
        "sf_dir": args.sf_dir,
        "total_sec": round(time.time() - t_total, 1),
        "n_queries": len(names),
        "n_fail": n_bad,
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"\n{len(names) - n_bad}/{len(names)} ok in {payload['total_sec']}s "
          f"→ {args.out}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
