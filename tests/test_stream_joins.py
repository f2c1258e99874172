"""Stream-stream join and streaming dedup: file replay vs the equivalent
batch computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_recommendation_system_spark.sources.tables import load_table
from flink_recommendation_system_spark.streaming.joins import (
    dedup_stream,
    stream_stream_join,
)
from flink_recommendation_system_spark.streaming.windows import (
    events_with_event_time,
)
from tests.conftest import SF0001


def _event_stream(spark, tmp_path, name, df, files=2):
    src = str(tmp_path / name)
    df.repartition(files).write.parquet(src)
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_stream_stream_join_matches_batch(spark, tmp_path):
    events = events_with_event_time(load_table(spark, SF0001, "events")).select(
        "event_id", "user_id", "event_type", "event_time"
    )
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")

    cs = _event_stream(spark, tmp_path, "clicks", clicks)
    ps = _event_stream(spark, tmp_path, "purchases", purchases)
    joined = stream_stream_join(
        cs, ps, "user_id", watermark="10 hours", max_lag="30 minutes"
    )
    q = (
        joined.select("event_id", "event_id_r")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["event_id"], r["event_id_r"])
        for r in spark.sql("select * from ssj").collect()
    }

    p = purchases.select(
        F.col("user_id").alias("user_id_r"),
        F.col("event_id").alias("event_id_r"),
        F.col("event_time").alias("event_time_r"),
    )
    batch = (
        clicks.join(p, (F.col("user_id") == F.col("user_id_r")))
        .filter(
            (F.col("event_time_r") >= F.col("event_time"))
            & (
                F.col("event_time_r")
                <= F.col("event_time") + F.expr("INTERVAL 30 minutes")
            )
        )
        .select("event_id", "event_id_r")
    )
    expected = {(r["event_id"], r["event_id_r"]) for r in batch.collect()}
    assert got == expected
    assert len(expected) > 0, "fixture produced no joinable pairs"


def test_dedup_stream_drops_replayed_duplicates(spark, tmp_path):
    events = events_with_event_time(load_table(spark, SF0001, "events")).select(
        "event_id", "user_id", "event_time"
    ).limit(100)
    doubled = events.union(events)  # at-least-once transport replays
    src = str(tmp_path / "dup_in")
    doubled.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # watermark must exceed the fixture's full time span (~41 days):
    # rows older than the watermark are dropped as LATE, not as duplicates,
    # and the replay files are unordered — a short watermark makes this
    # test depend on file processing order.
    q = (
        dedup_stream(stream, ["event_id"], watermark="2000 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("select event_id from dedup_out").collect()
    ids = [r["event_id"] for r in out]
    assert len(ids) == len(set(ids)) == 100


def test_stream_stream_left_join_emits_matches_and_unmatched(spark, tmp_path):
    """Left-outer: the matched subset equals the batch inner join; every
    emitted unmatched row is genuinely matchless in batch; unmatched rows
    are null-padded. (Unmatched rows whose window the final watermark has
    not passed are legitimately withheld, so we assert subset + coverage of
    old rows rather than exact equality.)"""
    from flink_recommendation_system_spark.streaming.joins import (
        stream_stream_left_join,
    )

    events = events_with_event_time(load_table(spark, SF0001, "events")).select(
        "event_id", "user_id", "event_type", "event_time"
    )
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")

    cs = _event_stream(spark, tmp_path, "lclicks", clicks)
    ps = _event_stream(spark, tmp_path, "lpurch", purchases)
    joined = stream_stream_left_join(
        cs, ps, "user_id", watermark="2 hours", max_lag="30 minutes"
    )
    q = (
        joined.select("event_id", "event_id_r")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sslj")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from sslj").collect()
    got_matched = {
        (r["event_id"], r["event_id_r"]) for r in rows if r["event_id_r"] is not None
    }
    got_unmatched = {r["event_id"] for r in rows if r["event_id_r"] is None}

    p = purchases.select(
        F.col("user_id").alias("user_id_r"),
        F.col("event_id").alias("event_id_r"),
        F.col("event_time").alias("event_time_r"),
    )
    inner = (
        clicks.join(p, F.col("user_id") == F.col("user_id_r"))
        .filter(
            (F.col("event_time_r") >= F.col("event_time"))
            & (F.col("event_time_r") <= F.col("event_time") + F.expr("INTERVAL 30 minutes"))
        )
        .select("event_id", "event_id_r")
    )
    expected_matched = {(r["event_id"], r["event_id_r"]) for r in inner.collect()}
    matched_left_ids = {a for a, _ in expected_matched}
    all_left_ids = {r["event_id"] for r in clicks.collect()}

    assert got_matched == expected_matched
    # every emitted unmatched row is truly matchless
    assert got_unmatched <= (all_left_ids - matched_left_ids)
    # and the join did emit a meaningful share of the matchless rows
    assert len(got_unmatched) > 0


def test_dedup_within_watermark_collapses_shifted_retries(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a retry carrying a DIFFERENT
    timestamp (the real at-least-once transport case exact (key, time)
    dedup cannot handle) still collapses to one row per key when it
    arrives within the watermark delay."""
    from flink_recommendation_system_spark.streaming.joins import (
        dedup_stream_within_watermark,
    )

    events = events_with_event_time(
        load_table(spark, SF0001, "events")
    ).select("event_id", "user_id", "event_time").limit(100)
    # retries arrive 90 seconds later than the original
    retries = events.withColumn(
        "event_time", F.col("event_time") + F.expr("INTERVAL 90 SECONDS")
    )
    src = str(tmp_path / "dupww_in")
    events.union(retries).repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_stream_within_watermark(
            stream, ["event_id"], watermark="2000 hours"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_ww_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    ids = [
        r["event_id"]
        for r in spark.sql("select event_id from dedup_ww_out").collect()
    ]
    assert len(ids) == len(set(ids)) == 100
