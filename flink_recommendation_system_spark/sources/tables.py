"""Batch sources (SURVEY.md §2.1).

The reference ingests by scanning Redis into the client heap
(Recommendations.java:136-155; ProductReviewAggregation.java:63-82) or reading
CSV with pandas (spliter.py:18-20). Spark-first replacement: parquet table
scans — Catalyst pushes predicates/column pruning into the scan, and nothing
transits the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


# Columns the engine contract types as epoch-nanosecond LongType (all other
# timestamp columns — orders.o_orderdate, lineitem.l_shipdate — stay
# TIMESTAMP_NTZ, matching DuckDB's naive TIMESTAMP).
_NANOS_CONTRACT: dict[str, tuple[str, ...]] = {"events": ("ts",)}

# rating derivation domain: value must be a sane finite non-negative
# number (floor + cents-free modulo stay exact; the bound keeps the
# intermediate BIGINT far from overflow). Mirrored by the oracle twins in
# oracles.py — change BOTH or neither.
RATING_VALUE_BOUND = 1e15

# props payload validation (round-15 adversarial finding): the payload
# contract is EXACTLY the reference's single-key wire shape {"k": N}.
# JSON-parser leniency differs BETWEEN engines on malformed input —
# Spark's get_json_object AND from_json both accept trailing garbage
# ('{"k":54}~dup' → 54) while DuckDB's json parser rejects it, and
# DuckDB's TRY_CAST rounds '1.5' to 2 where Spark yields NULL — so the
# extraction is defined as a STRICT full-document regex match (21-case
# cross-engine parity pinned in tests). Anything else → NULL product_id.
# The whitespace class is the EXPLICIT engine-identical [ \t\r\n], not
# \s (round 16, ADVICE r15 item 2): Java's \s includes \x0B (vertical
# tab) while RE2's does not, so '{"k":5}\x0b' extracted 5 in Spark but
# NULL in DuckDB — a latent divergence in the canonical product_id
# derivation. JSON itself allows only space/\t/\r/\n as insignificant
# whitespace, so the explicit class is also the wire-correct one. The
# anchor is \z (end of INPUT — identical in Java and RE2), not $: Java's
# $ also matches before a FINAL LINE TERMINATOR (\n, \r, U+0085,
# U+2028, U+2029) while RE2's does not, so a payload ending in U+0085
# matched in Spark but not DuckDB under the old anchor.
PRODUCT_KEY_PATTERN = (
    r'^[ \t\r\n]*\{[ \t\r\n]*"k"[ \t\r\n]*:[ \t\r\n]*'
    r'(-?\d+)[ \t\r\n]*\}[ \t\r\n]*\z'
)


# Spark-SQL-dialect twins of the canonical expressions (for queries whose
# Spark side is SQL text — e.g. the sql_surface front-end query). Spark
# string literals process backslash escapes, so the pattern's backslashes
# are doubled; DuckDB's standard strings don't (see oracles.py twins).
PRODUCT_ID_EXPR_SPARKSQL = (
    "try_cast(nullif(regexp_extract(props, '"
    + PRODUCT_KEY_PATTERN.replace("\\", "\\\\")
    + "', 1), '') AS BIGINT)"
)
RATING_EXPR_SPARKSQL = (
    "CASE WHEN value >= 0 AND value < 1000000000000000.0 THEN "
    "CAST(CAST(floor(value) AS BIGINT) % 5 + 1.0 AS DOUBLE) END"
)


def product_id_col() -> Column:
    """THE canonical product-id extraction from ``events.props`` (strict
    wire-shape regex; NULL on anything else — see PRODUCT_KEY_PATTERN).
    Every Spark-side consumer of props must use this; the oracle twin is
    ``oracles.PRODUCT_ID_EXPR_SQL``."""
    return (
        F.nullif(F.regexp_extract("props", PRODUCT_KEY_PATTERN, 1), F.lit(""))
        .try_cast("long")
    )


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
    - ``product_id`` = TRY-parse of props.k (JSON payload key): NULL when
      props is not valid JSON or k is not numeric
    - ``rating``     = (floor(value) % 5) + 1.0  ∈ {1.0 … 5.0} when
      0 ≤ value < 1e15, else NULL (the documented rating domain; the
      reference's domain is data/stream.edges col 3, BASELINE.md)
    - ``ts``         = epoch seconds of events.ts

    floor + integer modulo are exact on doubles, so Spark and DuckDB agree
    bit-for-bit — no float-roundoff hazard in the derivation itself.

    DIRTY-DATA TOTALITY (round-15 adversarial sweep): the raw mapping was
    only total on clean data — on hostile rows the TWO ENGINES FAILED
    DIFFERENTLY: Spark's floor() silently wraps ±Inf to ±Long.MAX while
    DuckDB crashes casting Inf to INT64, and DuckDB's json_extract throws
    on malformed props while Spark's get_json_object returns NULL. The
    derivation now makes the domain EXPLICIT and identical cross-engine:
    out-of-domain value → NULL rating (NaN/±Inf excluded because the
    `value < 1e15` comparison is false for NaN in both engines — NaN
    compares greater than everything), malformed/non-strict props → NULL
    product_id via the strict PRODUCT_KEY_PATTERN match (see that
    constant's comment; oracles.PRODUCT_ID_EXPR_SQL / RATING_EXPR_SQL are
    the single canonical SQL twins). NULLs then flow through downstream
    joins/filters/aggs with engine-identical semantics.
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        F.col("user_id").cast("long").alias("user_id"),
        product_id_col().alias("product_id"),
        F.when(
            (F.col("value") >= 0) & (F.col("value") < F.lit(RATING_VALUE_BOUND)),
            (F.floor("value").cast("long") % 5 + F.lit(1.0)).cast("double"),
        ).alias("rating"),
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


def load_table_clean(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load_table`` through the table-level measure-domain contract
    (round 15): every measure column present and ``abs(col) <
    MEASURE_BOUND`` — the guard that makes exact-integer-cents arithmetic
    total in BOTH engines (Spark ANSI crashes casting NaN/Inf/1e20 to
    BIGINT and overflows ±1e18 sum trees; DuckDB errors on the Inf cast
    but silently promotes sums to HUGEINT). A no-op row-wise on the clean
    generator data. Oracle twin: ``oracles.clean_tables_sql`` (same
    column list, ``oracles.MEASURE_GUARD_COLS``)."""
    from functools import reduce

    from ..operators._util import finite_measure
    from ..oracles import MEASURE_GUARD_COLS

    df = load_table(spark, sf_dir, name)
    cols = MEASURE_GUARD_COLS.get(name, ())
    if not cols:
        return df
    return df.filter(
        reduce(lambda a, b: a & b, (finite_measure(c, b) for c, b in cols))
    )
