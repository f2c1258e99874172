"""Temporal-graph analytics: earliest-arrival reachability over a
TIMESTAMPED interaction relation (Wu et al. 2014, "Path Problems in
Temporal Graphs" — the earliest-arrival semantics; H. Wu's single-pass
algorithm re-expressed as frontier relational algebra).

Static reachability over-counts on interaction data: an edge can only
carry information FORWARD in time, so "u reaches v" requires a path whose
timestamps are non-decreasing. The operator here works on a bipartite
interaction fact (user, item, t) with product-mediated flow:

    info at user u with arrival a
      → any interaction (u, p, t) with t ≥ a puts it on item p at t
      → any interaction (v, p, t2) with t2 ≥ t delivers it to v at t2

Each user→user hop is therefore TWO hash equi-joins with time
inequalities (a bounded theta-condition on top of the item key), and the
state per vertex is a single BIGINT (min arrival) — merged with ``min``
exactly like the engine's BFS/SCC label fixpoints.

Cross-engine exactness: timestamps are epoch-second BIGINTs, arrival =
min over integer candidates — no floats anywhere; the oracle unrolls the
hop CTEs with identical semantics.

Scale design (100 TB): the frontier is partitioned by the join keys
(user, then item); per-hop state is one row per touched vertex; hop
relations are localCheckpointed (the fixpoint lineage-truncation
convention). The time filter ``t ≥ a`` rides the join as a residual
condition on a hash equi-join — never a range/cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def earliest_arrival(
    interactions: DataFrame,
    seeds: DataFrame,
    max_user_hops: int = 2,
    user_col: str = "user_id",
    item_col: str = "product_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Earliest arrival time at every user reachable from ``seeds``
    within ``max_user_hops`` product-mediated hops.

    ``interactions``: (user, item, t) rows, t = epoch-second BIGINT.
    ``seeds``: (id) — arrival 0 (their own first interaction starts the
    clock; a seed's outgoing interactions all satisfy t ≥ 0).

    Output: (id, arrival_sec, hops) — min arrival per reached user and
    the hop count at which that minimum is first achieved (seeds row:
    arrival 0, hops 0). Later hops can only ADD vertices or keep equal
    arrivals (min is monotone), mirroring the unrolled oracle exactly.
    """
    inter = interactions.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("p"),
        F.col(ts_col).cast("long").alias("t"),
    ).localCheckpoint()

    state = seeds.select(
        F.col("id").cast("long").alias("id"),
        F.lit(0).cast("long").alias("arrival"),
        F.lit(0).cast("int").alias("hops"),
    ).localCheckpoint()

    for hop in range(1, max_user_hops + 1):
        on_item = (
            state.join(inter, state["id"] == inter["u"])
            .filter(F.col("t") >= F.col("arrival"))
            .groupBy("p")
            .agg(F.min("t").alias("item_t"))
        )
        delivered = (
            on_item.join(inter, "p")
            .filter(F.col("t") >= F.col("item_t"))
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("t").alias("arrival"))
            .withColumn("hops", F.lit(hop).cast("int"))
        )
        state = (
            state.unionByName(delivered)
            .groupBy("id")
            .agg(F.min(F.struct("arrival", "hops")).alias("_m"))
            .select(
                "id",
                F.col("_m.arrival").alias("arrival"),
                F.col("_m.hops").alias("hops"),
            )
            .localCheckpoint()
        )
    return state.select(
        "id", F.col("arrival").alias("arrival_sec"), "hops"
    )
