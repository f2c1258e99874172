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


# Columns the engine contract types as epoch-nanosecond LongType (all other
# timestamp columns — orders.o_orderdate, lineitem.l_shipdate — stay
# TIMESTAMP_NTZ, matching DuckDB's naive TIMESTAMP).
_NANOS_CONTRACT: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver testdata table (TESTDATA.md) as a DataFrame.

    ``events.ts`` is normalized to epoch-nanosecond LongType — the contract
    every consumer relies on (exact integer arithmetic like
    ``ts DIV 1_000_000_000`` that DuckDB's ``epoch_ns`` reproduces
    bit-for-bit). The testdata generator has shipped two encodings across
    rounds: INT64 TIMESTAMP(NANOS), which ``nanosAsLong`` surfaces as
    LongType already, and TIMESTAMP_MICROS, which Spark reads as
    TIMESTAMP/TIMESTAMP_NTZ and we convert with ``unix_micros × 1000``
    (session timezone is UTC, so the NTZ→TIMESTAMP cast is
    instant-preserving and matches DuckDB's naive-as-UTC ``epoch_ns``).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the driver calls us with a VANILLA session (see .claude/skills/verify):
    # pin UTC at runtime so the NTZ→TIMESTAMP cast below is instant-preserving
    # regardless of the host JVM timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ts_types = ("timestamp", "timestamp_ntz")
    convert = [
        f.name
        for f in df.schema.fields
        if f.name in _NANOS_CONTRACT.get(name, ())
        and f.dataType.typeName() in ts_types
    ]
    if convert:
        df = df.select(
            *[
                (
                    (F.unix_micros(F.col(c).cast("timestamp")) * 1000).alias(c)
                    if c in convert
                    else F.col(c)
                )
                for c in df.columns
            ]
        )
    return df


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

    DOMAIN PRECONDITION (round-13 review): the mapping yields the
    documented {1.0 … 5.0} range only for value >= 0 — both engines use
    sign-of-dividend modulo, so a negative value would map to
    {-3.0 … 0.0} IDENTICALLY on both sides (invisible to the oracle).
    The driver generator draws value >= 0 at every SF (verified
    min(value) >= 0 at sf0.001/0.01/0.1); a deployment feeding real
    events with signed values must pmod here and in every oracle CTE.
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.get_json_object("props", "$.k").cast("long").alias("product_id"),
        (F.floor("value").cast("long") % 5 + F.lit(1.0)).cast("double").alias("rating"),
        F.expr("CAST(ts DIV 1000000000 AS BIGINT)").alias("ts"),
    )


def load_documents_jsonl(
    spark: SparkSession, path: str, strict: bool = False
) -> DataFrame:
    """JSONL document-corpus scan — the interchange format LLM pipelines
    actually ship (one JSON object per line: doc_id, text, and optional
    lang/source metadata). Column order and types are pinned to the
    documents-table contract so every corpus operator (dedup, quality,
    chunking, ...) runs unchanged on JSONL shards.

    Malformed lines: ``strict=False`` (default) drops them — the scan is
    ``spark.read.text`` + per-line ``from_json`` (a malformed line parses
    to a null struct), sidestepping Spark's restriction on filtering a
    JSON scan's corrupt-record column; lines without a ``doc_id`` drop
    too (the hygiene stance for crawl data). ``strict=True`` fails the
    job instead (FAILFAST schema read).
    """
    from pyspark.sql import functions as F

    schema = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    if strict:
        df = spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    else:
        df = (
            spark.read.text(path)
            .select(F.from_json("value", schema).alias("r"))
            .select("r.*")
        )
    # BOTH modes drop id-less rows: FAILFAST only rejects malformed JSON,
    # and a well-formed line without doc_id would otherwise leak a NULL id
    # into the documents contract every downstream operator keys on.
    df = df.filter(F.col("doc_id").isNotNull())
    return df.select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("lang", F.lit("und")).alias("lang"),
        F.coalesce("source", F.lit("unknown")).alias("source"),
        F.coalesce("n_chars", F.length(F.coalesce("text", F.lit("")))).cast(
            "long"
        ).alias("n_chars"),
    )
