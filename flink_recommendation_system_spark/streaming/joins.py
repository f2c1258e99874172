"""Stream-stream joins and streaming deduplication — the remaining
Structured-Streaming operator families (beyond the reference's surface,
which has neither; SURVEY.md §2.8 "Not implemented").

- ``stream_stream_join``: inner join of two event streams on a key with an
  event-time range bound. Both sides carry watermarks so the state store
  can evict rows whose match window has passed — without the time bound a
  stream-stream join's state grows forever.
- ``dedup_stream``: watermarked `dropDuplicates` — exactly-once event
  delivery semantics over an at-least-once transport, state bounded by the
  watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "event_time",
    right_time: str = "event_time",
    watermark: str = "1 hour",
    max_lag: str = "30 minutes",
) -> DataFrame:
    """Inner stream-stream equi-join on ``key`` where the right event
    occurs within [left_time, left_time + max_lag]. Column names on the
    right are suffixed `_r`."""
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    rw = rw.select(
        *[F.col(c).alias(f"{c}_r") for c in rw.columns]
    )
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col(f"{right_time}_r") >= F.col(left_time))
        & (
            F.col(f"{right_time}_r")
            <= F.col(left_time) + F.expr(f"INTERVAL {max_lag}")
        )
    )
    return lw.join(rw, cond, "inner")


def stream_stream_left_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "event_time",
    right_time: str = "event_time",
    watermark: str = "1 hour",
    max_lag: str = "30 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream join: like ``stream_stream_join`` but left
    rows with no match within the time bound are emitted null-padded — only
    once the watermark has passed their match window (the engine must be
    sure no future right row can still match). Late-arriving left rows near
    the end of a bounded replay therefore stay unemitted: that is the
    correct semantics, not data loss."""
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    rw = rw.select(*[F.col(c).alias(f"{c}_r") for c in rw.columns])
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col(f"{right_time}_r") >= F.col(left_time))
        & (
            F.col(f"{right_time}_r")
            <= F.col(left_time) + F.expr(f"INTERVAL {max_lag}")
        )
    )
    return lw.join(rw, cond, "left_outer")


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    time_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked streaming deduplication on ``keys``: duplicates arriving
    within the watermark horizon are dropped exactly once; state for old
    keys is evicted as the watermark advances."""
    return stream.withWatermark(time_col, watermark).dropDuplicates(
        keys + [time_col]
    )


def dedup_stream_within_watermark(
    stream: DataFrame,
    keys: list[str],
    time_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """`dropDuplicatesWithinWatermark` (Spark 3.5+): dedups on ``keys``
    ALONE — a retried event whose retry carries a DIFFERENT timestamp
    (the at-least-once-transport reality `dedup_stream`'s exact
    (key, time) match cannot handle) still collapses, as long as the
    retry lands within the watermark delay of the first arrival. State
    per key is evicted one watermark horizon after first sight, so this
    is the production exactly-once ingest shape: key-only dedup with
    bounded state."""
    return stream.withWatermark(
        time_col, watermark
    ).dropDuplicatesWithinWatermark(keys)
