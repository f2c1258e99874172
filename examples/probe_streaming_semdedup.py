"""Scale probe for the STREAMING semantic-dedup path (VERDICT r11 item 7):
measure the per-micro-batch cost of the foreachBatch body at sf0.1 and the
sf1 probe, with and without the round-12-removed disjointness guard, to
demonstrate the full-store semi-join scan the `check_disjoint=False` fix
deleted from every trigger.

This replays EXACTLY what `streaming.semantic_dedup.
start_streaming_semantic_dedup`'s process() does per trigger — store reads
with the `batch < N` exclusion, one shared `ivf_cell_assignments` pass,
`incremental_semantic_pairs`, three per-batch parquet writes — but driven
by a deterministic vec_id-hash batcher so both guard modes see identical
batches, and with wall-clock per trigger. The guard-mode contrast cannot
run inside the real streaming query (the knob was deliberately removed
from the streaming surface), which is the point: this probe documents what
the removal bought.

PROBE ONLY — never a correctness input. Usage:
    python examples/probe_streaming_semdedup.py [sf_dir] [n_batches] [mode]
mode = "off" | "on" | "both" (default both). Run the two modes as SEPARATE
invocations when comparing: a shared JVM accumulates localCheckpointed
RDDs and shuffle files across replays, and the r12 first cuts showed the
contamination (a 12-15 s GC/cleanup spike straddling the run boundary)
dwarfing the guard delta itself. Prints one JSON line with per-batch
seconds; in "both" mode the two runs' accumulated pair sets are asserted
identical (the guard never fires on disjoint replay batches — the
contrast measures only its per-trigger store-scan cost).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from flink_recommendation_system_spark.operators.similarity import (  # noqa: E402
    incremental_semantic_pairs,
    ivf_cell_assignments,
)
from flink_recommendation_system_spark.session import (  # noqa: E402
    LOCAL_SF_MAX_PARTITION_BYTES,
    get_spark,
)
from flink_recommendation_system_spark.streaming.semantic_dedup import (  # noqa: E402
    ASSIGN_SCHEMA,
    VEC_SCHEMA,
    _read_store,
)


def run_replay(
    spark, emb, n_batches: int, n_cells: int, check_disjoint: bool
) -> dict:
    """One full replay of the corpus through the foreachBatch body; returns
    per-batch wall seconds and the accumulated distinct pair count."""
    root = tempfile.mkdtemp(prefix=f"semprobe_{check_disjoint}_")
    assign_path, vecs_path, pairs_path = (
        f"{root}/assign",
        f"{root}/vecs",
        f"{root}/pairs",
    )
    per_batch = []
    for b in range(n_batches):
        raw = (
            emb.filter(F.col("vec_id") % n_batches == b)
            .select("vec_id", "embedding")
            .localCheckpoint()
        )
        t0 = time.monotonic()
        store_assign = _read_store(
            spark, assign_path, ASSIGN_SCHEMA, before_batch=b
        )
        store_vecs = _read_store(spark, vecs_path, VEC_SCHEMA, before_batch=b)
        # the round-12 at-least-once ingestion screen, mirrored from
        # process(): within-batch id dedup + anti-join vs the assignment
        # store already scanned this trigger
        vecs = (
            raw.dropDuplicates(["vec_id"])
            .join(
                store_assign.select("vec_id").distinct(),
                "vec_id",
                "left_anti",
            )
            .localCheckpoint()
        )
        new_assign = ivf_cell_assignments(
            vecs, n_cells, 8, 64, 11
        ).localCheckpoint()
        pairs = incremental_semantic_pairs(
            vecs,
            store_assign,
            store_vecs,
            threshold=0.45,
            n_cells=n_cells,
            n_probe=8,
            dim=64,
            seed=11,
            new_assign=new_assign,
            check_disjoint=check_disjoint,
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_path}/batch={b}")
        new_assign.write.mode("overwrite").parquet(f"{assign_path}/batch={b}")
        vecs.write.mode("overwrite").parquet(f"{vecs_path}/batch={b}")
        per_batch.append(round(time.monotonic() - t0, 3))
    all_pairs = (
        spark.read.parquet(pairs_path)
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    shutil.rmtree(root)
    return {"per_batch_sec": per_batch, "total_sec": round(sum(per_batch), 2),
            "n_pairs": all_pairs}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    spark = get_spark(
        app_name="probe_streaming_semdedup",
        max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").localCheckpoint()
    n = emb.count()
    # the occupancy law the batch IVF tier uses (ceil(n/16), the same
    # clamp as semantic_dedup_ivf), pinned at stream start
    n_cells = max(8, min(2048, -(-n // 16)))
    # warmup replay (2 batches over a 10% slice) so the first measured
    # mode does not absorb JVM/codegen warmup — the r12 first cut showed
    # batch 0 at 9.7 s vs a 1.7 s steady state purely from warmup
    run_replay(
        spark, emb.filter(F.col("vec_id") % 10 == 0), 2, n_cells, False
    )
    modes = {"off": (False,), "on": (True,), "both": (False, True)}[which]
    results = {}
    for mode in modes:
        key = "guard_on" if mode else "guard_off"
        results[key] = run_replay(spark, emb, n_batches, n_cells, mode)
    if len(modes) == 2:
        assert (
            results["guard_on"]["n_pairs"] == results["guard_off"]["n_pairs"]
        )
    print(json.dumps({
        "sf_dir": sf_dir, "n_vecs": n, "n_cells": n_cells,
        "n_batches": n_batches, **results,
    }))


if __name__ == "__main__":
    main()
