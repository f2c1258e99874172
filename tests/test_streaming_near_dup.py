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


def test_compaction_preserves_store_and_future_pairs(spark, tmp_path):
    import glob

    from flink_recommendation_system_spark.streaming.near_dup import (
        _read_store,
        compact_signature_store,
    )

    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    store = str(tmp_path / "sigs")

    # simulate three committed ingestion batches
    parts = [(0, 170), (170, 340), (340, 10**9)]
    for i, (lo, hi) in enumerate(parts):
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        D.minhash_signatures(batch, 32, 5).write.mode("overwrite").parquet(
            f"{store}/batch={i}"
        )
    before = {
        (r.doc_id, tuple(r.sig))
        for r in _read_store(spark, store, before_batch=3).collect()
    }
    n_files_before = len(glob.glob(f"{store}/batch=*/*.parquet"))

    n = compact_signature_store(spark, store, target_partitions=1)
    assert n == len(before)

    after = {
        (r.doc_id, tuple(r.sig))
        for r in _read_store(spark, store, before_batch=3).collect()
    }
    assert after == before  # signature set bit-identical through compaction
    n_files_after = len(glob.glob(f"{store}/batch=*/*.parquet"))
    assert n_files_after < n_files_before
    assert not glob.glob(f"{store}.compact") and not glob.glob(f"{store}.old")

    # a post-compaction batch still pairs against the full compacted store:
    # duplicate an existing doc under a new id and expect a cross-store pair
    dup = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    new_sigs = D.minhash_signatures(dup, 32, 5)
    pairs = D.incremental_pairs_from_signatures(
        new_sigs,
        _read_store(spark, store, before_batch=99),
        num_hashes=32,
        bands=8,
        threshold=0.5,
    )
    assert (0, 10_000) in {
        (r.a_id, r.b_id) for r in pairs.collect()
    }


def test_compaction_recovers_from_crash_between_renames(spark, tmp_path):
    import os

    from flink_recommendation_system_spark.streaming.near_dup import (
        _read_store,
        compact_signature_store,
    )

    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    store = str(tmp_path / "sigs2")
    D.minhash_signatures(docs, 32, 5).write.mode("overwrite").parquet(
        f"{store}/batch=0"
    )
    before = {
        (r.doc_id, tuple(r.sig))
        for r in _read_store(spark, store, before_batch=9).collect()
    }
    # simulate the crash window: store renamed away, retry must roll back
    os.rename(store, store + ".old")
    n = compact_signature_store(spark, store, target_partitions=1)
    assert n == len(before)
    after = {
        (r.doc_id, tuple(r.sig))
        for r in _read_store(spark, store, before_batch=9).collect()
    }
    assert after == before


def test_at_least_once_redelivery_in_later_batch(spark, tmp_path):
    """A doc redelivered in a LATER batch (different batch id, so the
    before_batch store exclusion cannot screen it) must be screened by
    the ingestion anti-join: signature store stays unique per id, pairs
    are emitted exactly once, and the verdict equals the batch LSH over
    the distinct corpus."""
    docs = (
        load_table(spark, SF0001, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 120)
        .localCheckpoint()
    )
    src = str(tmp_path / "in")
    b0 = docs.filter(F.col("doc_id") < 60)
    redelivered = b0.filter(F.col("doc_id") < 3)
    b1 = docs.filter(F.col("doc_id") >= 60).unionByName(redelivered)
    b0.coalesce(1).write.mode("append").json(f"{src}/b0")
    b1.coalesce(1).write.mode("append").json(f"{src}/b1")

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

    sigs = spark.read.parquet(str(tmp_path / "sigs")).select("doc_id")
    assert sigs.count() == sigs.distinct().count(), (
        "redelivery duplicated rows in the signature store"
    )
    pairs = read_near_dup_pairs(spark, str(tmp_path / "pairs"))
    assert pairs.count() == pairs.distinct().count(), (
        "redelivery re-emitted already-emitted pairs"
    )
    got = {
        (r["a_id"], r["b_id"]) for r in pairs.collect()
    }
    want = {
        (r["a_id"], r["b_id"])
        for r in D.minhash_lsh_pairs(docs).select("a_id", "b_id").collect()
    }
    assert got == want


def test_incremental_pairs_never_emit_self_pair_on_overlap(spark):
    """Operator-level defense-in-depth (r14 dedup review — mirrors the
    guard incremental_semantic_pairs has carried since r12): if a store
    doc reaches the operator again as 'new' (an upstream redelivery
    screen failing, check_disjoint off as on the streaming path), the
    cross join must not emit the (id, id) self-pair whose est_jaccard
    1.0 would drop the document against its own store copy."""
    docs = (
        load_table(spark, SF0001, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 40)
    )
    sigs = D.minhash_signatures(docs).localCheckpoint()
    store = sigs.filter(F.col("doc_id") < 30)
    new = sigs.filter(
        (F.col("doc_id") >= 25) & (F.col("doc_id") < 40)
    )  # ids 25-29 overlap the store
    pairs = D.incremental_pairs_from_signatures(
        new, store, check_disjoint=False
    )
    self_rows = pairs.filter(F.col("a_id") == F.col("b_id")).count()
    assert self_rows == 0
