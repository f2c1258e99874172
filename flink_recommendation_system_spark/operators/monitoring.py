"""Drift / changepoint monitoring primitives shared by the batch query
(`plans.mining_queries.q_cusum_changepoint`) and the streaming store
reader (`streaming.monitor.read_cusum`) — one definition, so replay
parity is structural, not coincidental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_over_daily(daily: DataFrame) -> DataFrame:
    """Page's CUSUM changepoint scan over a ``(d, x)`` daily-count relation
    (d = epoch day BIGINT, x = count BIGINT). The mean division is scaled
    out — dev_t = n·x_t − Σx is integer, so the running statistic
    S'_t = n·S_t stays an exact BIGINT; the argmax-|S'| day is flagged
    (earliest wins ties).

    Output: one row per day — (d, x, cusum_scaled, is_changepoint)."""
    tot = daily.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "d", "x", (F.col("n") * F.col("x") - F.col("sx")).alias("dev")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cus = dev.select("d", "x", F.sum("dev").over(w).alias("cusum_scaled"))
    peak = (
        cus.select(
            F.abs(F.col("cusum_scaled")).alias("a"), F.col("d").alias("pd")
        )
        .orderBy(F.col("a").desc(), "pd")
        .limit(1)
    )
    return cus.crossJoin(F.broadcast(peak)).select(
        "d",
        "x",
        "cusum_scaled",
        (
            (F.abs(F.col("cusum_scaled")) == F.col("a"))
            & (F.col("d") == F.col("pd"))
        ).alias("is_changepoint"),
    )
