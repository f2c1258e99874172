"""Supervised training-set construction over the events/review domain —
the last mile of a training-data pipeline: turning cleaned facts into
labeled examples. Both operators are deterministic (seeded-hash sampling,
exact integer time windows) and therefore value-oracle-checkable.

Reference tie-in: the reference's CF model consumes positive-only
(user, product) pairs (Recommendations.java:68-77); a learned ranker needs
the same pairs plus sampled negatives and/or outcome labels — the two
shapes here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def negative_sampled_pairs(
    positives: DataFrame,
    items: DataFrame,
    user_col: str = "user_id",
    item_col: str = "product_id",
    ratio: int = 1,
    salt: str = "negsample",
) -> DataFrame:
    """Per user: every positive (label 1) plus ``ratio`` × as many
    deterministic hash-sampled negatives (label 0) drawn from ``items``
    minus the user's positives. Output: (user_col, item_col, label).

    Determinism: negatives are the lowest-``md5(salt‖user‖item)`` items the
    user has NOT interacted with — no RNG, stable across engines/runs, so
    the sampled dataset itself is oracle-checkable (the property that makes
    experiment reruns and lineage audits possible at all).

    Scale shape: ``items`` is the item DIM (catalog), not a fact table —
    the candidate space is ``users × catalog`` built with the dim broadcast,
    then a per-user window keeps the k lowest hashes. On a 100 TB pipeline
    the catalog side stays broadcastable (items ≪ interactions); if the
    catalog itself is huge, pre-filter candidates by hash prefix
    (md5 % B == user % B) before the window so each user scores catalog/B
    candidates instead of the full dim.
    """
    # NULL keys are dropped up front: a NULL user/item would make the hash
    # inputs NULL, where Spark's concat_ws SKIPS the element but ANSI '||'
    # propagates NULL — the one expression in this operator whose engines
    # disagree. Filtering both sides keeps the hash domain NULL-free (and a
    # NULL interaction key is not a usable training example anyway).
    pos = (
        positives.filter(
            F.col(user_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(user_col, item_col)
        .distinct()
    )
    items = items.filter(F.col(item_col).isNotNull())
    k_per_user = pos.groupBy(user_col).agg(
        (F.count(F.lit(1)) * ratio).alias("_k")
    )
    cand = (
        k_per_user.crossJoin(F.broadcast(items.select(item_col).distinct()))
        .join(pos, [user_col, item_col], "left_anti")
        .withColumn(
            "_h",
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(salt),
                    F.col(user_col).cast("string"),
                    F.col(item_col).cast("string"),
                )
            ),
        )
    )
    w = Window.partitionBy(user_col).orderBy(F.col("_h").asc())
    negs = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_k"))
        .select(user_col, item_col, F.lit(0).cast("long").alias("label"))
    )
    return pos.select(
        user_col, item_col, F.lit(1).cast("long").alias("label")
    ).unionByName(negs)


def conversion_labels(
    events: DataFrame,
    trigger_type: str = "click",
    outcome_type: str = "purchase",
    horizon_sec: int = 3600,
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    ts_col: str = "s",
) -> DataFrame:
    """Label every ``trigger_type`` event with whether the same user
    produced an ``outcome_type`` event within ``[0, horizon_sec]`` seconds
    of it. Output: (id_col, user_col, ts_col, converted BOOLEAN) — the
    supervised label join behind CTR/conversion models.

    The window START is INCLUSIVE (round-13 review): callers feed
    second-truncated timestamps, where a strict ``>`` would label the
    FASTEST conversions — purchase 0.7 s after the click, same truncated
    second — as negatives, systematically poisoning the positive class.
    The cost is that an outcome in the same second but fractionally
    BEFORE the trigger also counts; at 1-second resolution the two are
    indistinguishable, and counting them is the smaller labeling error.

    Distributed shape (same blocking family as
    ``rangejoin.bounded_diff_self_join``): outcomes land in their
    ``horizon``-sized bucket; each trigger probes its own and the next
    bucket — a (user, bucket) hash equi-join, never an unbounded theta
    join — then the exact window predicate filters and a left-semi marks
    the trigger. Per-trigger output is one row regardless of outcome
    multiplicity.
    """
    b = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(horizon_sec))) / F.lit(
        horizon_sec
    )
    triggers = events.filter(F.col(type_col) == trigger_type).select(
        id_col, user_col, ts_col
    )
    outcomes = events.filter(F.col(type_col) == outcome_type).select(
        user_col,
        F.col(ts_col).alias("_o_ts"),
        b.cast("long").alias("_bucket"),
    )
    probes = triggers.withColumn(
        "_bucket", F.explode(F.array(b.cast("long"), b.cast("long") + 1))
    )
    hits = (
        probes.join(outcomes, [user_col, "_bucket"])
        .filter(
            (F.col("_o_ts") >= F.col(ts_col))
            & (F.col("_o_ts") <= F.col(ts_col) + horizon_sec)
        )
        .select(id_col)
        .distinct()
    )
    return triggers.join(
        hits.withColumn("_conv", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        user_col,
        ts_col,
        F.coalesce(F.col("_conv"), F.lit(False)).alias("converted"),
    )
