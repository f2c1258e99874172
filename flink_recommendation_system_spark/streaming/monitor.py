"""Continuous changepoint monitoring: per-micro-batch daily-count store +
read-side CUSUM.

Daily counts are LINEAR — the count relation of a union is the per-day sum
of the per-batch relations — so the streaming profile follows the exact
store pattern of ``streaming.sketch``: each micro-batch writes ITS OWN
(d, x) partial counts under ``store_path/batch=N`` (overwrite → a replayed
batch after a crash rewrites identical rows, idempotent by construction),
and the current CUSUM verdict is computed read-side over the day-summed
store via the SAME ``operators.monitoring.cusum_over_daily`` the batch
query uses. Streaming state is ZERO (stateless foreachBatch); the store is
at most |days| rows per batch.

This is the "has the event rate shifted" production monitor: the expensive
raw stream collapses to a calendar-bounded grid in-flight, and the
changepoint scan itself always runs on that tiny grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..errors import is_path_not_found
from ..operators.monitoring import cusum_over_daily

_NS_PER_DAY = 86_400_000_000_000


def daily_counts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """(d, x) per-day counts from an epoch-nanos LongType ``ts_col`` —
    integer DIV bucketing, the engine-wide exactness contract."""
    return (
        events.select(
            F.expr(f"CAST({ts_col} DIV {_NS_PER_DAY} AS BIGINT)").alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("x"))
    )


def start_daily_counts_refresh(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
):
    """Maintain the per-batch daily-count store over an event stream whose
    ``ts_col`` is epoch-nanos LongType. Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        counts = daily_counts(batch_df, ts_col)
        counts.write.mode("overwrite").parquet(
            f"{store_path}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_cusum(spark: SparkSession, store_path: str) -> DataFrame:
    """The current changepoint verdict: day-wise sum over every batch's
    counts (linearity), then the shared CUSUM scan — identical to the
    batch query over the concatenated input (pinned in
    tests/test_streaming_monitor.py)."""
    try:
        store = spark.read.parquet(store_path)
    except AnalysisException as e:
        if is_path_not_found(e):
            return spark.createDataFrame(
                [], "d long, x long, cusum_scaled long, is_changepoint boolean"
            )
        raise
    merged = store.groupBy("d").agg(F.sum("x").alias("x"))
    return cusum_over_daily(merged)


def read_ewma(spark: SparkSession, store_path: str) -> DataFrame:
    """The current smoothed trend: day-wise sum over every batch's counts
    (linearity), then the shared exact-dyadic EWMA — identical to the
    batch `ewma_event_trend` over the concatenated input (pinned in
    tests/test_streaming_monitor.py)."""
    from ..operators.monitoring import ewma_over_daily

    try:
        store = spark.read.parquet(store_path)
    except AnalysisException as e:
        if is_path_not_found(e):
            return spark.createDataFrame(
                [], "d long, n_events long, ewma double"
            )
        raise
    merged = store.groupBy("d").agg(F.sum("x").alias("x"))
    return ewma_over_daily(merged)
