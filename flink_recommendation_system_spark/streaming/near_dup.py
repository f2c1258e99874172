"""Continuous near-duplicate detection over a document stream — the
streaming face of the incremental MinHash pipeline (operators.dedup).

Shape: each micro-batch of (doc_id, text) is paired against the persisted
corpus signature store with ``incremental_minhash_pairs`` (new×store ∪
new×new — the store is never re-paired), the surviving near-dup pairs are
appended to the pairs table, and the batch's signatures join the store.
This is the ``foreachBatch`` dual-sink pattern (T3) applied to corpus
hygiene: a 100 TB ingest keeps dedup state as signatures (num_hashes longs
per doc), never raw bodies.

Idempotence: both sinks write ``mode("overwrite")`` into a per-batch
subdirectory (``batch=N``). A failed/retried micro-batch overwrites its own
directory instead of double-appending — the same checkpoint-replay contract
the speed layer's sinks follow (streaming.pipeline).

Long-running deployments should periodically compact the store (rewrite
the accumulated ``batch=N`` directories into one partition set via
``publish_minhash_signatures`` / ``publish_minhash_bands``) — thousands of
small per-batch files would otherwise dominate the per-trigger store scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from ..operators.dedup import incremental_minhash_pairs, minhash_signatures

SIG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sig", ArrayType(LongType())),
    ]
)


def _read_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Signature store accumulated so far (empty before the first batch).
    Batch subdirectories surface as a ``batch`` partition column, dropped
    here — consumers see the plain (doc_id, sig) contract."""
    try:
        df = spark.read.parquet(store_path)
    except Exception:
        return spark.createDataFrame([], SIG_SCHEMA)
    return df.select("doc_id", "sig")


def start_streaming_near_dup(
    doc_stream: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
):
    """Start the continuous near-dup query over a streaming DataFrame with
    (doc_id, text) columns. Emits (a_id, b_id, est_jaccard) rows under
    ``pairs_path`` and maintains the signature store under ``store_path``.

    Every near-dup pair of the full corpus is emitted exactly once — when
    its later document arrives (new×store) or when both arrive together
    (new×new); equivalence with the batch ``minhash_lsh_pairs`` over the
    union is pinned in tests/test_streaming_near_dup.py.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select("doc_id", "text").localCheckpoint()
        if not docs.take(1):
            return
        spark = docs.sparkSession
        store = _read_store(spark, store_path)
        pairs = incremental_minhash_pairs(
            docs,
            store,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            threshold=threshold,
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_path}/batch={batch_id}")
        minhash_signatures(docs, num_hashes, shingle_n).write.mode(
            "overwrite"
        ).parquet(f"{store_path}/batch={batch_id}")

    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_near_dup_pairs(spark: SparkSession, pairs_path: str) -> DataFrame:
    """All near-dup pairs emitted so far: (a_id, b_id, est_jaccard)."""
    return spark.read.parquet(pairs_path).select("a_id", "b_id", "est_jaccard")
