"""Streaming changepoint monitor: a 3-batch file replay must produce the
EXACT batch CUSUM verdict over the full input (daily counts are linear;
the scan core is shared code), and a replayed batch must not
double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_recommendation_system_spark.plans.mining_queries import (
    q_cusum_changepoint,
)
from flink_recommendation_system_spark.sources.tables import load_table
from flink_recommendation_system_spark.streaming.monitor import (
    daily_counts,
    read_cusum,
    start_daily_counts_refresh,
)
from tests.conftest import SF0001


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_streaming_cusum_equals_batch(spark, tmp_path):
    events = load_table(spark, SF0001, "events").select("ts", "user_id")

    src = str(tmp_path / "in")
    for i, (lo, hi) in enumerate([(0, 50), (50, 100), (100, 10**9)]):
        (
            events.filter((F.col("user_id") >= lo) & (F.col("user_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .json(f"{src}/b{i}")
        )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q = start_daily_counts_refresh(
        stream,
        store_path=str(tmp_path / "counts"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = _rows(read_cusum(spark, str(tmp_path / "counts")))
    want = _rows(q_cusum_changepoint(spark, SF0001))
    assert got == want and got


def test_streaming_cusum_replay_idempotent(spark, tmp_path):
    """A replayed batch (crash before checkpoint commit) rewrites its own
    partition: the verdict equals the single-pass result."""
    events = load_table(spark, SF0001, "events").limit(500)
    store = str(tmp_path / "counts")
    counts = daily_counts(events)
    counts.write.mode("overwrite").parquet(f"{store}/batch=0")
    counts.write.mode("overwrite").parquet(f"{store}/batch=0")  # replay
    got = _rows(read_cusum(spark, store))
    want = _rows(
        __import__(
            "flink_recommendation_system_spark.operators.monitoring",
            fromlist=["cusum_over_daily"],
        ).cusum_over_daily(counts)
    )
    assert got == want and got


def test_read_cusum_empty_store_is_empty_verdict(spark, tmp_path):
    df = read_cusum(spark, str(tmp_path / "nonexistent"))
    assert df.count() == 0
    assert df.columns == ["d", "x", "cusum_scaled", "is_changepoint"]


def test_streaming_ewma_equals_batch(spark, tmp_path):
    """Replaying the event stream through the daily-count store and
    reading the EWMA verdict must equal the batch ewma_event_trend over
    the same events — counts are linear over micro-batches and the scan
    core is shared."""
    import flink_recommendation_system_spark.plans.mining_queries as mq
    from flink_recommendation_system_spark.streaming.monitor import (
        read_ewma,
        start_daily_counts_refresh,
    )
    from flink_recommendation_system_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    src = str(tmp_path / "src")
    events.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_daily_counts_refresh(
        stream,
        store_path=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["d"], r["n_events"], r["ewma"])
        for r in read_ewma(spark, str(tmp_path / "store")).collect()
    }
    want = {
        (r["d"], r["n_events"], r["ewma"])
        for r in mq.q_ewma_event_trend(spark, sf).collect()
    }
    assert got == want and len(want) > 0


def test_read_ewma_empty_store(spark, tmp_path):
    from flink_recommendation_system_spark.streaming.monitor import read_ewma

    assert read_ewma(spark, str(tmp_path / "missing")).count() == 0
