"""Batch sources (SURVEY.md §2.1).

The reference ingests by scanning Redis into the client heap
(Recommendations.java:136-155; ProductReviewAggregation.java:63-82) or reading
CSV with pandas (spliter.py:18-20). Spark-first replacement: parquet table
scans — Catalyst pushes predicates/column pruning into the scan, and nothing
transits the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver testdata table (TESTDATA.md) as a DataFrame.

    The testdata parquet stores timestamps as INT64 TIMESTAMP(NANOS), which
    Spark's reader rejects by default; ``nanosAsLong`` (runtime-settable SQL
    conf) reads them as epoch-nanosecond LongType. All engine code treats
    these columns as epoch-nanos and converts with exact integer arithmetic
    (``ts DIV 1_000_000_000``) so DuckDB oracles agree bit-for-bit.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_csv_reviews(spark: SparkSession, path: str) -> DataFrame:
    """CSV scan of review rows `(UserId, ProductId, Review, Timestamp)` —
    the reference's file contract (spliter.py:19; kafka_stream_generator.py:20-24).
    """
    from ..schemas import REVIEW_SCHEMA

    return spark.read.schema(REVIEW_SCHEMA).csv(path)


def reviews_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's `events` table to the reference's review fact
    (FIXTURES.md §1: `value` ↔ rating, `props` ↔ JSON payload).

    Deterministic mapping (mirrored bit-for-bit by the DuckDB oracle in
    ``oracles.REVIEWS_CTE``):

    - ``user_id``    = events.user_id
    - ``product_id`` = CAST(props.k AS BIGINT)   (JSON payload key)
    - ``rating``     = (floor(value) % 5) + 1.0  ∈ {1.0 … 5.0}, matching the
      reference rating domain (data/stream.edges col 3; BASELINE.md)
    - ``ts``         = epoch seconds of events.ts

    floor + integer modulo are exact on doubles, so Spark and DuckDB agree
    bit-for-bit — no float-roundoff hazard in the derivation itself.
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.get_json_object("props", "$.k").cast("long").alias("product_id"),
        (F.floor("value").cast("long") % 5 + F.lit(1.0)).cast("double").alias("rating"),
        F.expr("CAST(ts DIV 1000000000 AS BIGINT)").alias("ts"),
    )
