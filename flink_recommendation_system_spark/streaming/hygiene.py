"""Streaming corpus-hygiene gate — the ingest-time face of the round-4
compliance/quality operators: every micro-batch of (doc_id, text) is
quality-gated, PII-redacted, and Bloom-screened against a pre-fitted
benchmark filter, then fanned out to accepted/rejected parquet sinks.

This is the shape of a continuous 100 TB ingest: per-document decisions
only (quality stats, regex redaction, O(k) bloom probes — no joins against
anything but broadcast/bitmap state), so a micro-batch's cost is linear in
its own size regardless of corpus history. The eval-benchmark filter is a
FITTED ARTIFACT (`bloom.bloom_fit` words), loaded once and probed via the
Arrow bitmap path — exactly the persisted-model use-case that probe exists
for; refreshing the benchmark set means re-fitting the artifact, never
touching the stream.

Idempotence follows the module pattern of `streaming.near_dup`: both sinks
write ``mode("overwrite")`` into per-batch subdirectories, so a replayed
micro-batch overwrites its own output instead of duplicating it; and
(round 12) each batch dedups its own doc_ids and anti-joins the ids both
sinks already decided, so an at-least-once redelivery in a LATER batch —
which per-batch overwrite cannot screen — is not re-gated or re-accepted.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..errors import is_path_not_found
from ..operators.bloom import DEFAULT_K, DEFAULT_M_BITS, bloom_probe_arrow
from ..operators.text import quality_stats, redact_pii, token_ngrams

_ID_BATCH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("batch", LongType())]
)


def _prior_ids(
    spark: SparkSession, path: str, before_batch: int
) -> DataFrame:
    """doc_ids already decided by batches STRICTLY BEFORE ``before_batch``
    — the redelivery screen's store (the sink itself doubles as it).
    Schema-supplied read so a footer-less crash remnant reads empty, and
    only missing-path means 'no sink yet' (the near_dup/semantic_dedup
    store-reader contract)."""
    try:
        df = spark.read.schema(_ID_BATCH_SCHEMA).parquet(path)
    except AnalysisException as e:
        if is_path_not_found(e):
            return spark.createDataFrame(
                [], StructType([StructField("doc_id", LongType())])
            )
        raise
    return df.filter(F.col("batch") < before_batch).select("doc_id")


def hygiene_gate(
    docs: DataFrame,
    bloom_words: list[int],
    decon_n: int = 8,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    min_quality: int = 3,
) -> DataFrame:
    """The batch-expressible core (shared by the stream and its parity
    test): per document, quality score, PII-redacted text + counts, and
    contamination flag. Output: (doc_id, quality_score, n_email, n_ipv4,
    n_phone, contaminated, verdict, redacted) where ``verdict`` is
    'accept' or the first failing gate ('quality' | 'contaminated').

    PII never rejects — redaction is the remediation — but the counts ride
    along for audit. Contamination is any distinct ``decon_n``-gram the
    bloom filter flags.

    ``n_chars`` (which `quality_stats` consumes) is always derived from the
    text itself here — a stream batch carries only (doc_id, text), and
    deriving keeps batch and stream verdicts identical by construction.
    """
    docs = docs.select(
        "doc_id", "text", F.length("text").cast("long").alias("n_chars")
    )
    scored = quality_stats(docs).select("doc_id", "quality_score")
    red = redact_pii(docs)
    grams = token_ngrams(docs, decon_n).select("doc_id", "ngram").distinct()
    dirty = (
        bloom_probe_arrow(grams, bloom_words, m_bits=m_bits, k=k)
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id")
        .join(red, "doc_id")
        .join(dirty, "doc_id", "left")
        .select(
            "doc_id",
            "quality_score",
            "n_email",
            "n_ipv4",
            "n_phone",
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
            F.when(F.col("quality_score") < min_quality, F.lit("quality"))
            .when(F.coalesce("contaminated", F.lit(False)), F.lit("contaminated"))
            .otherwise(F.lit("accept"))
            .alias("verdict"),
            "redacted",
        )
    )


def start_hygiene_stream(
    doc_stream: DataFrame,
    bloom_words: list[int],
    accepted_path: str,
    rejected_path: str,
    checkpoint_dir: str,
    decon_n: int = 8,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    min_quality: int = 3,
):
    """Start the gate over a streaming (doc_id, text) DataFrame. Accepted
    docs land under ``accepted_path`` with their REDACTED text; rejects
    land under ``rejected_path`` with the failing verdict for audit."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        raw = batch_df.select("doc_id", "text").localCheckpoint()
        if not raw.take(1):
            return
        spark = raw.sparkSession
        # At-least-once ingestion hygiene (the dedup twins' round-12
        # contract): a duplicate doc_id WITHIN a batch would fan out
        # multiplicatively through hygiene_gate's self-joins (2 copies →
        # 8 output rows), and a doc redelivered in a LATER batch would be
        # re-accepted into the sink. Dedup within the batch, then screen
        # against the ids both sinks already decided — the sinks double
        # as the store, and the screen is a column-pruned id scan.
        decided = _prior_ids(spark, accepted_path, batch_id).unionByName(
            _prior_ids(spark, rejected_path, batch_id)
        )
        # groupBy/max, not dropDuplicates (the r13 near_dup/semantic_dedup
        # determinism fix, extended here by the r14 review): dropDuplicates
        # keeps an ARBITRARY row, so a batch carrying two rows with the
        # same id but different text could gate/redact/accept a DIFFERENT
        # text on replay than the first attempt did — max() pins the same
        # byte-wise-greatest payload on every attempt.
        docs = (
            raw.groupBy("doc_id")
            .agg(F.max("text").alias("text"))
            .join(decided, "doc_id", "left_anti")
            .localCheckpoint()
        )
        gated = hygiene_gate(
            docs, bloom_words, decon_n, m_bits, k, min_quality
        ).localCheckpoint()
        gated.filter(F.col("verdict") == "accept").select(
            "doc_id", F.col("redacted").alias("text"),
            "n_email", "n_ipv4", "n_phone",
        ).write.mode("overwrite").parquet(
            f"{accepted_path}/batch={batch_id}"
        )
        gated.filter(F.col("verdict") != "accept").select(
            "doc_id", "verdict", "quality_score", "contaminated"
        ).write.mode("overwrite").parquet(
            f"{rejected_path}/batch={batch_id}"
        )

    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_accepted(spark: SparkSession, accepted_path: str) -> DataFrame:
    return spark.read.parquet(accepted_path).select(
        "doc_id", "text", "n_email", "n_ipv4", "n_phone"
    )
