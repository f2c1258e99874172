#!/usr/bin/env python
"""Isolate and time individual registered queries (guide §1).

For each named query: capture ``explain('formatted')`` to
``plans/r16/<name>_<tag>.txt`` and time N noop-sink runs (the noop sink
computes every column of every row and discards it — guide §1.4), with
``setJobDescription`` labels (guide §1.5).

Usage::

    python tools/isolate.py --queries pq_topk,semantic_dedup \
        [--sf-dir /root/testdata/sf0.1] [--runs 3] [--tag before] [--no-plan]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--outdir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16"))
    args = ap.parse_args()

    from flink_recommendation_system_spark.session import (
        LOCAL_SF_MAX_PARTITION_BYTES,
        get_spark,
    )
    import __spark_entry__ as entrymod

    spark = get_spark("isolate", max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    os.makedirs(args.outdir, exist_ok=True)

    # session/JIT warm-up mirroring bench.py so isolated numbers are
    # comparable to in-bench numbers (cold-JVM ramp otherwise dominates)
    entrymod.entry(spark).count()
    from flink_recommendation_system_spark.schemas import TESTDATA_TABLES
    from flink_recommendation_system_spark.sources.tables import load_table
    for t in TESTDATA_TABLES:
        try:
            load_table(spark, args.sf_dir, t).count()
        except Exception:
            pass
    for _warm in ("lpa_labels", "minhash_near_dups", "bm25_topk",
                  "pricing_summary", "user_sessions", "subword_token_counts",
                  "deduped_corpus_quality_artifact", "semantic_dedup_artifact"):
        try:
            qs[_warm](spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
        except Exception:
            pass

    result: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if not args.no_plan:
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
        obs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            obs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        result[name] = {"runs": obs, "best": min(obs),
                        "median": sorted(obs)[len(obs) // 2]}
        print(json.dumps({name: result[name]}), flush=True)
    print(json.dumps({"tag": args.tag, "results": result}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
