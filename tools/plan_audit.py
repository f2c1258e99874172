"""Physical-plan audit over the registered query surface: runs every
``queries()`` entry's ``.explain``-level plan through a set of
scale-antipattern detectors and writes a one-line-per-query report.

Detectors (the 100 TB checklist PERFORMANCE.md argues from):

- ``cartesian``      CartesianProduct anywhere (never acceptable)
- ``nested_loop``    BroadcastNestedLoopJoin — acceptable ONLY for
                     1-row/scalar broadcasts; flagged for review
- ``python_row``     BatchEvalPython (row-at-a-time Python) — forbidden
                     on oracle paths; Arrow (ArrowEvalPython / InPandas)
                     is reported separately as ``python_arrow``
- ``global_sort``    informational: a Sort over an Exchange
                     SinglePartition — fine when the sorted relation is
                     a top-k/aggregate result (metadata scale), a
                     scale bug when it's the fact table; reviewed
                     case-by-case in PERFORMANCE.md
- ``no_codegen``     zero WholeStageCodegen stages in a NON-adaptive
                     plan (under AQE the pre-execution plan hides stage
                     markers, so the detector skips AdaptiveSparkPlan
                     roots rather than report noise)

Usage::

    python tools/plan_audit.py [--sf-dir /root/testdata/sf0.01] \
        [--only name1,name2] [--out PLAN_AUDIT.md]

Exit code 1 if any ``cartesian`` or ``python_row`` hit is found.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit_plan(plan: str) -> dict[str, bool]:
    adaptive = "AdaptiveSparkPlan" in plan
    flags = {
        "cartesian": "CartesianProduct" in plan,
        "nested_loop": "BroadcastNestedLoopJoin" in plan,
        "python_row": "BatchEvalPython" in plan,
        "python_arrow": (
            "ArrowEvalPython" in plan
            or "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
        ),
        "no_codegen": (
            not adaptive
            and "WholeStageCodegen" not in plan
            and "*(" not in plan
        ),
        "global_sort": (
            "Exchange SinglePartition" in plan and "Sort [" in plan
        ),
    }
    return flags


# MLlib's recommendForAllUsers IS a blocked cross product of the factor
# matrices (per-block top-k; the textbook serving plan for dense MF) — the
# CartesianProduct lives inside MLlib, not in this repo's plan. The
# value-oracled twin of the surrounding machinery is `mf_scoring_fixed`,
# whose plan broadcasts the catalog side instead.
CARTESIAN_BY_DESIGN = {"als_recommendations"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default="PLAN_AUDIT.md")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as em

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = em.queries()
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    rows, bad = [], []
    for name, fn in qs.items():
        try:
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # constructability is itself part of audit
            rows.append((name, {"error": True}, repr(e)[:120]))
            bad.append(name)
            continue
        flags = audit_plan(plan)
        rows.append((name, flags, ""))
        if (flags["cartesian"] and name not in CARTESIAN_BY_DESIGN) or flags[
            "python_row"
        ]:
            bad.append(name)

    lines = [
        "# PLAN_AUDIT — physical-plan antipattern scan",
        "",
        f"Surface: {len(rows)} queries at {args.sf_dir}. Detectors: see",
        "`tools/plan_audit.py`. `nested_loop` rows are broadcast joins of",
        "scalar (1-row aggregate) or bounded-small relations (centroid",
        "tables, the contract-tiny query/seed sets) unless noted;",
        "`python_arrow` rows are the",
        "multimodal/extension operators whose Python is Arrow-batched by",
        "design. HARD failures (cartesian / row-at-a-time Python): "
        f"**{len(bad)}**.",
        "",
        "| query | flags |",
        "|---|---|",
    ]
    for name, flags, err in sorted(rows):
        if err:
            lines.append(f"| {name} | ERROR: {err} |")
            continue
        hits = [k for k, v in flags.items() if v]
        lines.append(f"| {name} | {', '.join(hits) if hits else 'clean'} |")
    out = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(out)
    n_clean = sum(1 for _, fl, e in rows if not e and not any(fl.values()))
    print(f"{len(rows)} plans audited → {args.out}; clean: {n_clean}; "
          f"hard failures: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
