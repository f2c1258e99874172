"""Event-time windowed aggregation with watermark-based late-data handling.

The reference carries a watermark but never consumes it — no windows, no
stateful aggregation exist there (SURVEY.md §2.8 "Not implemented"). A real
stream engine needs them, so this module adds the standard set as
extensions, each expressed once and runnable in batch (oracle-checkable)
and streaming (watermark + state) modes:

- tumbling-window counts/sums per event type;
- sliding windows (via ``F.window`` slideDuration);
- session windows (gap-based, ``F.session_window``).

Scale notes: windowed aggregation shuffles on (window, key) with map-side
partial aggregation; the watermark bounds state size — without it a 100 TB
stream accumulates unbounded window state. ``withWatermark`` + append mode
emits each window exactly once when it finalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NS = 1_000_000_000


def events_with_event_time(events: DataFrame) -> DataFrame:
    """events.ts is epoch-nanos LongType (see sources.tables.load_table);
    derive a proper TIMESTAMP event-time column plus exact epoch seconds."""
    sec = F.expr(f"CAST(ts DIV {NS} AS BIGINT)")
    return events.withColumn("ts_sec", sec).withColumn(
        "event_time", F.timestamp_seconds(sec)
    )


def tumbling_window_stats(
    events: DataFrame, width_sec: int = 3600, watermark: str | None = None
) -> DataFrame:
    """Per (tumbling window, event_type): event count and value sum.

    Output uses exact integer window bounds (``win_start_sec``) so the
    DuckDB oracle can reproduce it with integer arithmetic — the TIMESTAMP
    window struct stays internal. value_sum accumulates on the integer
    CENTS grid (values are 2-dp in the data; round-13 review: a plain
    double sum is order-dependent across partial-agg merge orders, so the
    2-dp rounding could flip between engines at a half-cent boundary —
    the same integer-grid discipline as every money query in the suite),
    then converts with one IEEE division.
    """
    e = events_with_event_time(events)
    if watermark is not None:
        e = e.withWatermark("event_time", watermark)
    win = F.window("event_time", f"{width_sec} seconds")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        e.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(cents).cast("double") / 100.0, 2
            ).alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start_sec"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def windowed_review_counts(
    reviews: DataFrame, width_sec: int = 86400, watermark: str | None = None
) -> DataFrame:
    """Per (tumbling window, product_id) review count + average rating —
    the windowed aggregation a recommendation speed layer actually serves
    (event_windows is per event TYPE; this is per PRODUCT over the review
    fact). Runs in batch (oracle-checked: `windowed_review_counts`) and
    streaming (watermark + append; replay-parity pytest in
    tests/test_streaming_windows.py) from this one definition.

    Exactness: ratings are integer-valued doubles (1.0–5.0), so the sum
    is order-independent exact and avg is one IEEE division; 6-dp
    rounding then matches DuckDB bit-for-bit. `reviews.ts` is epoch
    SECONDS (sources.tables.reviews_from_events), so the event-time
    column is an exact conversion.

    Scale notes: one (window, product) shuffle with map-side partial agg;
    in streaming mode the watermark bounds state to the open windows."""
    e = reviews.withColumn("event_time", F.timestamp_seconds(F.col("ts")))
    if watermark is not None:
        e = e.withWatermark("event_time", watermark)
    win = F.window("event_time", f"{width_sec} seconds")
    return (
        e.groupBy(win, "product_id")
        .agg(
            F.count(F.lit(1)).alias("n_reviews"),
            F.round(F.avg("rating"), 6).alias("avg_rating"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start_sec"),
            "product_id",
            "n_reviews",
            "avg_rating",
        )
    )


def sliding_window_stats(
    events: DataFrame,
    width_sec: int = 7200,
    slide_sec: int = 3600,
    watermark: str | None = None,
) -> DataFrame:
    """Per (sliding window, event_type) counts — each event contributes to
    ``width/slide`` overlapping windows. Same exact-integer output contract
    as the tumbling variant."""
    e = events_with_event_time(events)
    if watermark is not None:
        e = e.withWatermark("event_time", watermark)
    win = F.window("event_time", f"{width_sec} seconds", f"{slide_sec} seconds")
    return (
        e.groupBy(win, "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start_sec"),
            "event_type",
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame, gap_sec: int = 1800, watermark: str | None = None
) -> DataFrame:
    """Per-user session windows (gap-close after ``gap_sec`` of silence):
    session start + event count. The canonical stateful-streaming operator
    the reference lacks."""
    e = events_with_event_time(events)
    if watermark is not None:
        e = e.withWatermark("event_time", watermark)
    win = F.session_window("event_time", f"{gap_sec} seconds")
    return (
        e.groupBy(win, "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("session_window.start")).alias(
                "session_start_sec"
            ),
            "user_id",
            "n_events",
        )
    )
