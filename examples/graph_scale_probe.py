"""Round-13 sf1 (10×) probe for the ITERATIVE GRAPH family — VERDICT r12
item 6: the dedup family has measured 10× ratio rows in PERFORMANCE.md;
this script produces the matching rows for `pagerank`,
`connected_components_star`, `scc_components` (superstep loops with
localCheckpoint lineage truncation) and `effective_diameter` (HyperANF),
confirming the per-iteration cost scales ~linearly in edges.

Probe design (same convention as examples/scale_experiment.py): the
sf0.1 edge relations are replicated 10× with DISJOINT shifted vertex
ids, so edge volume grows 10× while per-vertex density (degree, ball
growth) is unchanged — the scaling question is "does a superstep's cost
track |E|", not "what happens when the graph gets denser" (density is a
data property, not a plan property). Each operator runs best-of-2 warm
at 1× and 10× on local[32].

Run: python examples/graph_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_recommendation_system_spark.operators import graph as G  # noqa: E402
from flink_recommendation_system_spark.operators.hyperanf import (  # noqa: E402
    hyperanf,
)
from flink_recommendation_system_spark.session import (  # noqa: E402
    LOCAL_SF_MAX_PARTITION_BYTES,
    get_spark,
)

N = 10
SHIFT = 50_000_000  # larger than any sf0.1 vertex id → replicas disjoint


def replicate_edges(edges: DataFrame, n: int) -> DataFrame:
    src, dst = edges.columns[0], edges.columns[1]
    parts = [
        edges.select(
            (F.col(src) + F.lit(k * SHIFT)).alias(src),
            (F.col(dst) + F.lit(k * SHIFT)).alias(dst),
        )
        for k in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def force(df: DataFrame) -> None:
    df.select(F.xxhash64(*df.columns).alias("_h")).agg(
        F.expr("bit_xor(_h)")
    ).collect()


def timed(label: str, fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f} s")
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "graph-scale-probe", max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    liked = em._liked(spark, sf_dir)
    und1 = G.undirected(G.co_review_edges(liked)).localCheckpoint()
    undN = replicate_edges(und1, N).repartition(32).localCheckpoint()
    dig1 = em._temporal_digraph_edges(spark, sf_dir).localCheckpoint()
    digN = replicate_edges(dig1, N).repartition(32).localCheckpoint()
    # the bipartite liked graph effective_diameter's HyperANF runs on
    off = 10_000_000
    bedges1 = (
        liked.select(
            F.col("user_id").alias("src"),
            (F.col("product_id") + F.lit(off)).alias("dst"),
        )
        .unionByName(
            liked.select(
                (F.col("product_id") + F.lit(off)).alias("src"),
                F.col("user_id").alias("dst"),
            )
        )
        .localCheckpoint()
    )
    bedgesN = replicate_edges(bedges1, N).repartition(32).localCheckpoint()

    print(
        f"edges: und {und1.count()} → {undN.count()}, "
        f"dig {dig1.count()} → {digN.count()}, "
        f"bip {bedges1.count()} → {bedgesN.count()}"
    )

    for label, e1, eN, fn in [
        ("pagerank(3)", und1, undN, lambda e: G.pagerank(e)),
        (
            "connected_components_star",
            und1,
            undN,
            lambda e: G.connected_components_star(e),
        ),
        (
            "scc_components",
            dig1,
            digN,
            lambda e: G.strongly_connected_components(e),
        ),
        (
            "effective_diameter (hyperanf h=3)",
            bedges1,
            bedgesN,
            lambda e: hyperanf(e),
        ),
    ]:
        t1 = timed(f"{label} 1x", lambda: force(fn(e1)))
        tN = timed(f"{label} {N}x", lambda: force(fn(eN)))
        print(f"{label}: ratio {tN / t1:.1f}x at {N}x edges")

    spark.stop()


if __name__ == "__main__":
    main()
