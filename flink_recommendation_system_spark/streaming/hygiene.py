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
micro-batch overwrites its own output instead of duplicating it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import DEFAULT_K, DEFAULT_M_BITS, bloom_probe_arrow
from ..operators.text import quality_stats, redact_pii, token_ngrams


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
        docs = batch_df.select("doc_id", "text").localCheckpoint()
        if not docs.take(1):
            return
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
