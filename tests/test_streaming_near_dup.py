"""Continuous near-dup detection: a 3-batch file replay of the documents
corpus must emit EXACTLY the pairs the batch MinHash-LSH computes over the
full corpus — each pair once, when its later document arrives."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators import dedup as D
from flink_recommendation_system_spark.sources.tables import load_table
from flink_recommendation_system_spark.streaming.near_dup import (
    read_near_dup_pairs,
    start_streaming_near_dup,
)
from tests.conftest import SF0001


def test_streaming_near_dup_equals_batch_pairs(spark, tmp_path):
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")

    # three disjoint ingestion batches, one JSON file each, replayed in order
    src = str(tmp_path / "in")
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        (
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .json(f"{src}/b{i}")
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )

    q = start_streaming_near_dup(
        stream,
        store_path=str(tmp_path / "sigs"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["a_id"], r["b_id"], r["est_jaccard"])
        for r in read_near_dup_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    expected = {
        (r["a_id"], r["b_id"], r["est_jaccard"])
        for r in D.minhash_lsh_pairs(docs).collect()
    }
    assert got == expected
    assert expected  # corpus contains near-dups; the test is not vacuous

    # the signature store converged to one signature per document
    sigs = spark.read.parquet(str(tmp_path / "sigs"))
    assert sigs.select("doc_id").distinct().count() == docs.count()


def test_read_store_excludes_current_and_later_batches(spark, tmp_path):
    """Replay safety: a retried batch must not see its own (possibly
    partial) prior write — _read_store(before_batch=N) returns only
    batches < N, and a missing store path is an empty store."""
    from flink_recommendation_system_spark.operators.dedup import (
        minhash_signatures,
    )
    from flink_recommendation_system_spark.streaming.near_dup import (
        _read_store,
    )

    store = str(tmp_path / "sigs")
    assert _read_store(spark, store, before_batch=0).count() == 0  # missing

    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") < 10)
    b1 = docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
    minhash_signatures(b0).write.parquet(f"{store}/batch=0")
    minhash_signatures(b1).write.parquet(f"{store}/batch=1")

    ids_before_1 = {
        r["doc_id"] for r in _read_store(spark, store, before_batch=1).collect()
    }
    assert ids_before_1 == {r["doc_id"] for r in b0.collect()}
    ids_before_2 = {
        r["doc_id"] for r in _read_store(spark, store, before_batch=2).collect()
    }
    assert ids_before_2 == {
        r["doc_id"] for r in b0.union(b1).collect()
    }
