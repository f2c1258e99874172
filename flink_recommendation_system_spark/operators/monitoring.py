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

    Days are gap-filled across [min, max] so an absent day enters the
    series as x = 0 (round-13 review): a zero-event day is a DATA POINT —
    an outage is exactly the changepoint this scan exists to find — and
    dropping it from the series shifts n, the mean, and the |S'| peak.
    Same spine convention as ``ewma_over_daily`` below.

    Output: one row per calendar day in range —
    (d, x, cusum_scaled, is_changepoint)."""
    bounds = daily.agg(F.min("d").alias("d_lo"), F.max("d").alias("d_hi"))
    all_days = bounds.select(
        F.explode(F.sequence("d_lo", "d_hi")).alias("d")
    )
    daily = all_days.join(daily, "d", "left").select(
        "d", F.coalesce("x", F.lit(0)).alias("x")
    )
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


EWMA_WINDOW = 20  # truncation horizon; dropped tail < 2^-20 of the oldest


def ewma_over_daily(daily: DataFrame, window: int = EWMA_WINDOW) -> DataFrame:
    """Exact-dyadic EWMA (α = 1/2) over a ``(d, x)`` daily-count relation:
    ewma(d) = Σ_{i=0..window-1} x(d−i)·2^{−(i+1)}, accumulated as BIGINT
    2^-window units and converted with ONE exactly-representable division.
    Days are gap-filled across [min, max] so absent days contribute zero.
    Shared by the batch `ewma_event_trend` query and the streaming
    monitor's read-side (`streaming.monitor.read_ewma`) — parity is
    by-construction (counts are linear over micro-batches).

    Output: (d, n_events, ewma)."""
    bounds = daily.agg(F.min("d").alias("d_lo"), F.max("d").alias("d_hi"))
    all_days = bounds.select(F.explode(F.sequence("d_lo", "d_hi")).alias("d"))
    filled = all_days.join(daily, "d", "left").select(
        "d", F.coalesce("x", F.lit(0)).alias("n_events")
    )
    contrib = filled.select(
        "d",
        "n_events",
        F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("i"),
    ).select(
        (F.col("d") + F.col("i")).alias("td"),
        F.expr(
            f"n_events * shiftleft(CAST(1 AS BIGINT), {window} - 1 - i)"
        ).alias("units"),
    )
    units = contrib.groupBy("td").agg(F.sum("units").alias("u"))
    return filled.join(units, filled["d"] == units["td"]).select(
        "d",
        "n_events",
        (F.col("u").cast("double") / F.lit(float(1 << window))).alias("ewma"),
    )
