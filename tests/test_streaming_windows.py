"""Windowed aggregation in real streaming mode: file-source replay with
watermark; completed windows must equal the batch-mode result (the same
function, which is itself oracle-checked via the driver contract)."""

from __future__ import annotations

from flink_recommendation_system_spark.sources.tables import (
    load_table,
    reviews_from_events,
)
from flink_recommendation_system_spark.streaming.windows import (
    tumbling_window_stats,
    windowed_review_counts,
)
from tests.conftest import SF0001


def test_streaming_tumbling_windows_match_batch(spark, tmp_path):
    events = load_table(spark, SF0001, "events")
    # replay input: the same events as parquet split across files
    src = str(tmp_path / "events_in")
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    windowed = tumbling_window_stats(stream, width_sec=3600, watermark="0 seconds")
    q = (
        windowed.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_agg")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["win_start_sec"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in spark.sql("select * from win_agg").collect()
    }
    expected = {
        (r["win_start_sec"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in tumbling_window_stats(events, width_sec=3600).collect()
    }
    assert got == expected


def test_streaming_append_mode_emits_finalized_windows(spark, tmp_path):
    """Append mode + watermark: all windows strictly below the final
    watermark are emitted exactly once."""
    events = load_table(spark, SF0001, "events")
    src = str(tmp_path / "events_in2")
    events.orderBy("ts").coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    windowed = tumbling_window_stats(stream, width_sec=3600, watermark="1 hour")
    q = (
        windowed.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("select * from win_append").collect()
    keys = [(r["win_start_sec"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys)), "a finalized window was emitted twice"
    # emitted rows must agree with the batch computation
    expected = {
        (r["win_start_sec"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in tumbling_window_stats(events, width_sec=3600).collect()
    }
    for r in rows:
        assert expected[(r["win_start_sec"], r["event_type"])] == (
            r["n_events"],
            r["value_sum"],
        )

def test_streaming_review_counts_match_batch(spark, tmp_path):
    """The round-8 watermarked tumbling-window review query: the SAME
    windowed_review_counts definition run over a file-replay stream with a
    watermark must equal its batch-mode result (which is itself
    oracle-checked via the driver contract as `windowed_review_counts`)."""
    reviews = reviews_from_events(spark, SF0001)
    src = str(tmp_path / "reviews_in")
    reviews.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    windowed = windowed_review_counts(
        stream, width_sec=86400, watermark="1 hour"
    )
    q = (
        windowed.writeStream.outputMode("complete")
        .format("memory")
        .queryName("review_win")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["win_start_sec"], r["product_id"]): (r["n_reviews"], r["avg_rating"])
        for r in spark.sql("select * from review_win").collect()
    }
    expected = {
        (r["win_start_sec"], r["product_id"]): (r["n_reviews"], r["avg_rating"])
        for r in windowed_review_counts(reviews, width_sec=86400).collect()
    }
    assert got == expected


def test_streaming_review_counts_append_finalized_once(spark, tmp_path):
    """Append mode + watermark on the review windows: each finalized
    window emits exactly once and agrees with batch."""
    reviews = reviews_from_events(spark, SF0001)
    src = str(tmp_path / "reviews_in2")
    reviews.orderBy("ts").coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    windowed = windowed_review_counts(
        stream, width_sec=86400, watermark="1 hour"
    )
    q = (
        windowed.writeStream.outputMode("append")
        .format("memory")
        .queryName("review_win_append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("select * from review_win_append").collect()
    assert rows, "no window finalized — replay must close at least one"
    keys = [(r["win_start_sec"], r["product_id"]) for r in rows]
    assert len(keys) == len(set(keys)), "a finalized window emitted twice"
    expected = {
        (r["win_start_sec"], r["product_id"]): (r["n_reviews"], r["avg_rating"])
        for r in windowed_review_counts(reviews, width_sec=86400).collect()
    }
    for r in rows:
        assert expected[(r["win_start_sec"], r["product_id"])] == (
            r["n_reviews"],
            r["avg_rating"],
        )


def test_streaming_session_windows_match_batch(spark, tmp_path):
    """Gap-based session windows under a real watermarked stream: the
    same session_window_stats definition replayed file-by-file must, in
    complete mode, equal the batch result (which is oracle-checked via
    the driver contract as `user_sessions`)."""
    from flink_recommendation_system_spark.streaming.windows import (
        session_window_stats,
    )

    events = load_table(spark, SF0001, "events")
    src = str(tmp_path / "events_sess")
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # the replay is UNORDERED (repartition(4)) across a 30-day span, so
    # the watermark must exceed the span or session merging would drop
    # late batches as expired state; cross-batch merging is the thing
    # under test here, drop semantics are covered by the tumbling tests
    windowed = session_window_stats(
        stream, gap_sec=1800, watermark="800 hours"
    )
    q = (
        windowed.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_win")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["session_start_sec"], r["user_id"]): r["n_events"]
        for r in spark.sql("select * from sess_win").collect()
    }
    expected = {
        (r["session_start_sec"], r["user_id"]): r["n_events"]
        for r in session_window_stats(events, gap_sec=1800).collect()
    }
    assert got == expected


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """The watermarked stream-stream interval join replayed over
    time-ordered file splits must emit exactly the registered batch
    twin's pairs (click_attribution_pairs): inner interval joins emit
    each qualifying pair once, and an in-order replay keeps every row
    inside the watermark."""
    from pyspark.sql import functions as F

    from flink_recommendation_system_spark.plans.streaming_queries import (
        q_click_attribution_pairs,
    )
    from flink_recommendation_system_spark.sources.tables import load_table
    from flink_recommendation_system_spark.streaming.interval_join import (
        click_purchase_interval_join,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("CAST(ts DIV 1000000000 AS BIGINT)").alias("s"),
    )
    lo, hi = ev.agg(F.min("s"), F.max("s")).first()
    span = (hi - lo + 1) or 1
    src = str(tmp_path / "ssj_in")
    with_file = ev.withColumn(
        "f", ((F.col("s") - F.lit(lo)) * 3 / F.lit(span)).cast("int")
    )
    for i in range(3):
        with_file.filter(F.col("f") == i).drop("f").coalesce(1).write.mode(
            "append"
        ).json(src)
    stream = spark.readStream.schema(
        ev.schema
    ).option("maxFilesPerTrigger", 1).json(src)
    out = click_purchase_interval_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {tuple(r) for r in spark.sql("select * from ssj").collect()}
    assert streamed, "stream emitted nothing"
    batch = {
        tuple(r) for r in q_click_attribution_pairs(spark, sf).collect()
    }
    assert streamed == batch
