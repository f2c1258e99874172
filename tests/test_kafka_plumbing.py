"""Kafka option/format plumbing (S4/S5) — there is no broker in this
container, so these tests pin everything short of a live connection:

1. the option names match the spark-sql-kafka connector's documented
   contract (spelled out here independently, so a typo in the pipeline
   module fails the test rather than a production deploy);
2. the format string actually reaches Spark's data-source resolution
   (the expected failure is "kafka ... not found", i.e. a missing package,
   never an option/analysis error).

Reference: RealTimeRecommendations.java:40-68.
"""

from __future__ import annotations

import pytest

from flink_recommendation_system_spark.streaming.pipeline import (
    KAFKA_FORMAT,
    kafka_sink_options,
    kafka_source_options,
    read_review_stream_kafka,
)

# Documented option names for spark-sql-kafka (Structured Streaming + Kafka
# integration guide). Deliberately re-spelled here as the independent truth.
SOURCE_REQUIRED = {"kafka.bootstrap.servers", "subscribe"}
SOURCE_ALL = SOURCE_REQUIRED | {"startingOffsets"}
SINK_REQUIRED = {"kafka.bootstrap.servers", "topic", "checkpointLocation"}


def test_kafka_source_option_contract():
    opts = kafka_source_options("broker:9092", topic="Reviews")
    assert set(opts) == SOURCE_ALL
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "Reviews"
    assert opts["startingOffsets"] == "earliest"  # reference replays history


def test_kafka_sink_option_contract(tmp_path):
    opts = kafka_sink_options("broker:9092", topic="Output",
                              checkpoint_dir=str(tmp_path))
    assert set(opts) == SINK_REQUIRED
    assert opts["topic"] == "Output"
    assert opts["checkpointLocation"] == str(tmp_path)


def test_kafka_format_reaches_source_resolution(spark):
    """Building the Kafka reader must fail on DATA_SOURCE_NOT_FOUND (the
    package is simply absent here) — any other error means the format or
    option plumbing is broken."""
    with pytest.raises(Exception) as exc:
        read_review_stream_kafka(spark, "broker:9092")
    msg = str(exc.value)
    assert KAFKA_FORMAT in msg
    assert "not found" in msg.lower() or "failed to find" in msg.lower()


def test_kafka_format_reaches_sink_resolution(spark, tmp_path):
    """The SINK twin of the source-resolution test: starting the Kafka
    writer must fail on data-source resolution ("not found" — the package
    is absent in this container), never on an option/analysis error, so a
    production deploy's only missing piece is the spark-sql-kafka jar."""
    from pyspark.sql import functions as F

    from flink_recommendation_system_spark.streaming.pipeline import (
        write_output_kafka,
    )

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .select(
            F.col("value").alias("user_id"),
            F.array(F.lit(1).cast("long")).alias("recommended_products"),
        )
    )
    with pytest.raises(Exception) as exc:
        write_output_kafka(
            stream, "broker:9092", checkpoint_dir=str(tmp_path / "ckpt")
        )
    msg = str(exc.value)
    assert KAFKA_FORMAT in msg
    assert "not found" in msg.lower() or "failed to find" in msg.lower()
