"""Checkpoint-aware store compaction (round-13 advisor finding).

The failure mode under test: a micro-batch interrupted AFTER its sinks
wrote but BEFORE its checkpoint commit is replayed on restart. If
compaction folded that batch's rows into the consolidated partition, the
replay's ``batch >= N`` self-exclusion no longer screens them — the
ingestion anti-join then screens the replayed documents away and the
replay overwrites ``pairs/batch=N`` with an EMPTY result (silent permanent
pair loss). With ``checkpoint_dir`` passed, only committed batches fold
and the interrupted batch's directories survive verbatim.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators import dedup as D
from flink_recommendation_system_spark.sources.tables import load_table
from flink_recommendation_system_spark.streaming.compaction import (
    batch_ids,
    compact_batched_store,
    max_committed_batch,
)
from flink_recommendation_system_spark.streaming.near_dup import (
    compact_signature_store,
    read_near_dup_pairs,
    start_streaming_near_dup,
)
from tests.conftest import SF0001


def test_max_committed_batch_reads_commit_markers(tmp_path):
    ckpt = tmp_path / "ckpt"
    assert max_committed_batch(str(ckpt)) is None  # no checkpoint yet
    (ckpt / "commits").mkdir(parents=True)
    assert max_committed_batch(str(ckpt)) is None  # empty commits dir
    (ckpt / "commits" / "0").write_text("v1")
    (ckpt / "commits" / "1").write_text("v1")
    (ckpt / "commits" / ".metadata").write_text("x")  # ignored
    assert max_committed_batch(str(ckpt)) == 1
    # offsets/2 existing without commits/2 is exactly the replay case —
    # the committed max must stay 1
    (ckpt / "offsets").mkdir()
    (ckpt / "offsets" / "2").write_text("v1")
    assert max_committed_batch(str(ckpt)) == 1


def test_compaction_skips_uncommitted_batches(spark, tmp_path):
    """Batches 0,1 committed + batch 2 uncommitted: fold 0,1 into
    batch=1, carry batch=2 through verbatim, byte-identical contents."""
    store = str(tmp_path / "store")
    ckpt = tmp_path / "ckpt"
    (ckpt / "commits").mkdir(parents=True)
    for i in (0, 1):
        (ckpt / "commits" / str(i)).write_text("v1")

    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    for i, (lo, hi) in enumerate([(0, 50), (50, 100), (100, 150)]):
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        D.minhash_signatures(batch, 32, 5).write.parquet(
            f"{store}/batch={i}"
        )
    before = {
        (r.doc_id, int(r.batch), tuple(r.sig))
        for r in spark.read.parquet(store).collect()
    }

    n = compact_batched_store(
        spark, store, checkpoint_dir=str(ckpt), target_partitions=1
    )

    assert batch_ids(store) == [1, 2]  # 0,1 folded to 1; 2 untouched
    after = spark.read.parquet(store)
    # contents identical up to the folded rows' batch id moving 0 -> 1
    remap = {
        (doc_id, 1 if b == 0 else b, sig) for doc_id, b, sig in before
    }
    got = {
        (r.doc_id, int(r.batch), tuple(r.sig)) for r in after.collect()
    }
    assert got == remap
    n_committed = sum(1 for r in before if int(r[1]) <= 1)
    assert n == n_committed
    # the uncommitted batch's rows are still excluded by its own replay
    excl = after.filter(F.col("batch") < 2)
    assert excl.count() == n_committed


def test_compaction_noop_without_any_commit(spark, tmp_path):
    store = str(tmp_path / "store")
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    D.minhash_signatures(docs.limit(20), 32, 5).write.parquet(
        f"{store}/batch=0"
    )
    assert compact_batched_store(spark, store, checkpoint_dir=str(ckpt)) == 0
    assert batch_ids(store) == [0]
    # missing store entirely is also a no-op, not an error
    assert compact_batched_store(spark, str(tmp_path / "none")) == 0


def test_interrupted_batch_replay_after_compaction_end_to_end(
    spark, tmp_path
):
    """The full disaster scenario, end to end: run the near-dup stream,
    fake a crash-before-commit of the last batch by deleting its commit
    marker, compact WITH the checkpoint, restart — the replayed batch
    must re-emit its pairs (not an empty overwrite) and the final pairs
    must equal the batch LSH over the whole corpus."""
    docs = (
        load_table(spark, SF0001, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 150)
        .localCheckpoint()
    )
    src = str(tmp_path / "in")
    for i, (lo, hi) in enumerate([(0, 50), (50, 100), (100, 150)]):
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
    store = str(tmp_path / "sigs")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    q = start_streaming_near_dup(
        stream, store_path=store, pairs_path=pairs, checkpoint_dir=ckpt
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)  # restart below reuses the same checkpoint

    # fake the crash: batch 2's sinks are on disk but its commit is not
    last = max_committed_batch(ckpt)
    assert last == 2
    os.remove(os.path.join(ckpt, "commits", "2"))
    crc = os.path.join(ckpt, "commits", ".2.crc")  # hadoop checksum twin
    if os.path.exists(crc):
        os.remove(crc)

    n = compact_signature_store(
        spark, store, target_partitions=1, checkpoint_dir=ckpt
    )
    assert n > 0
    assert batch_ids(store) == [1, 2]  # batch 2 (uncommitted) untouched

    # restart: Structured Streaming replays batch 2
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q2 = start_streaming_near_dup(
        stream2, store_path=store, pairs_path=pairs, checkpoint_dir=ckpt
    )
    q2.processAllAvailable()
    q2.stop()

    got = {
        (r["a_id"], r["b_id"], r["est_jaccard"])
        for r in read_near_dup_pairs(spark, pairs).collect()
    }
    expected = {
        (r["a_id"], r["b_id"], r["est_jaccard"])
        for r in D.minhash_lsh_pairs(docs).collect()
    }
    assert got == expected
    assert expected, "corpus slice has no near-dups; test is vacuous"
    sigs = spark.read.parquet(store).select("doc_id")
    assert sigs.count() == sigs.distinct().count() == docs.count()


def test_output_sink_compaction(spark, tmp_path):
    """compact_output_sink folds committed trigger directories and the
    output rows survive byte-identical."""
    from flink_recommendation_system_spark.streaming.pipeline import (
        compact_output_sink,
    )

    out = str(tmp_path / "output")
    ckpt = tmp_path / "ckpt"
    (ckpt / "commits").mkdir(parents=True)
    rows = []
    for i in range(4):
        spark.createDataFrame(
            [(f"msg-{i}-{j}",) for j in range(5)], "value STRING"
        ).write.parquet(f"{out}/batch={i}")
        rows += [f"msg-{i}-{j}" for j in range(5)]
        if i < 3:  # batch 3 never committed
            (ckpt / "commits" / str(i)).write_text("v1")

    n = compact_output_sink(spark, out, str(ckpt), target_partitions=1)
    assert n == 15
    assert batch_ids(out) == [2, 3]
    got = sorted(r.value for r in spark.read.parquet(out).collect())
    assert got == sorted(rows)


def test_staged_swap_self_heals(spark, tmp_path):
    """staged_swap heals a crashed prior swap on entry — a caller that
    forgets the heal no longer risks deleting the .old backup (round-13
    advisor finding)."""
    from flink_recommendation_system_spark.sources.warehouse import (
        staged_swap,
    )

    path = str(tmp_path / "table")
    spark.range(10).write.parquet(path)
    # crash window: live dir renamed away, .old holds the only copy
    os.rename(path, path + ".old")

    # a write_fn that READS the live path (merge_upsert's shape): without
    # the self-heal this raises PATH_NOT_FOUND / builds from nothing
    def rebuild(staging: str) -> None:
        spark.read.parquet(path).withColumn(
            "id", F.col("id") + 100
        ).write.parquet(staging)

    staged_swap(rebuild, path)
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == list(
        range(100, 110)
    )
    assert not os.path.exists(path + ".old")


def test_transient_swap_error_is_narrow():
    """Only the JVM FileNotFoundException class name marks an error
    transient — an error that merely mentions the phrase must surface
    immediately instead of burning retries (round-13 advisor finding)."""
    from flink_recommendation_system_spark.sources.warehouse import (
        _is_transient_swap_error,
    )

    assert _is_transient_swap_error(
        RuntimeError(
            "Job aborted due to stage failure: java.io.FileNotFoundException:"
            " File file:/tmp/t/part-0.parquet does not exist"
        )
    )
    assert not _is_transient_swap_error(
        RuntimeError(
            "config error: set ignoreMissingFiles to skip "
            "FileNotFoundException-style listing races"
        )
    )
    assert not _is_transient_swap_error(RuntimeError("out of memory"))


def test_streaming_dedup_deterministic_on_conflicting_payloads(
    spark, tmp_path
):
    """A batch carrying the same doc_id twice with DIFFERENT texts must
    pick deterministically (byte-max), so a replay emits identical
    signatures (round-13 advisor finding: dropDuplicates kept an
    arbitrary row)."""
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "aaaa bbbb cccc dddd eeee"), (1, "zzzz yyyy xxxx wwww vvvv"),
         (2, "some other document body here")],
        "doc_id LONG, text STRING",
    ).coalesce(1).write.json(f"{src}/b0")
    stream = spark.readStream.schema("doc_id LONG, text STRING").json(
        f"{src}/b*"
    )
    store = str(tmp_path / "sigs")
    q = start_streaming_near_dup(
        stream,
        store_path=store,
        pairs_path=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    sigs = spark.read.parquet(store)
    assert sigs.count() == 2
    got = {r.doc_id: tuple(r.sig) for r in sigs.collect()}
    # byte-max text wins: the 'zzzz...' payload
    expect = {
        r.doc_id: tuple(r.sig)
        for r in D.minhash_signatures(
            spark.createDataFrame(
                [(1, "zzzz yyyy xxxx wwww vvvv"),
                 (2, "some other document body here")],
                "doc_id LONG, text STRING",
            ),
            32,
            5,
        ).collect()
    }
    assert got == expect


def test_compaction_tolerates_torn_uncommitted_write(spark, tmp_path):
    """The crash this feature targets can leave a FOOTER-LESS part file
    in the uncommitted batch directory. Compaction must neither parse it
    (schema inference would raise) nor alter it — the directory is
    carried into the compacted store byte-identical, ready for the
    replay's overwrite."""
    store = str(tmp_path / "store")
    ckpt = tmp_path / "ckpt"
    (ckpt / "commits").mkdir(parents=True)
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    for i in (0, 1):
        D.minhash_signatures(docs.limit(30 + i), 32, 5).write.parquet(
            f"{store}/batch={i}"
        )
        (ckpt / "commits" / str(i)).write_text("v1")
    torn = tmp_path / "store" / "batch=2"
    torn.mkdir()
    junk = b"PAR1\x00\x07torn-mid-write"  # magic but no footer
    (torn / "part-00000.parquet").write_bytes(junk)

    n = compact_signature_store(spark, store, checkpoint_dir=str(ckpt))
    assert n > 0
    assert batch_ids(store) == [1, 2]
    assert (
        tmp_path / "store" / "batch=2" / "part-00000.parquet"
    ).read_bytes() == junk  # verbatim, bytes included
    # the committed rows all read back from the consolidated partition
    folded = spark.read.parquet(f"{store}/batch=1")
    assert folded.count() == n


def test_compaction_accepts_file_scheme_paths(spark, tmp_path):
    """Spark-style file: URIs must work end-to-end — the os-level heal/
    listing/swap calls normalize the scheme once at entry."""
    store = str(tmp_path / "store")
    ckpt = tmp_path / "ckpt"
    (ckpt / "commits").mkdir(parents=True)
    (ckpt / "commits" / "0").write_text("v1")
    spark.range(10).write.parquet(f"{store}/batch=0")
    n = compact_batched_store(
        spark, f"file://{store}", checkpoint_dir=f"file://{ckpt}"
    )
    assert n == 10
    assert batch_ids(store) == [0]
    assert spark.read.parquet(store).count() == 10


def test_compaction_under_concurrent_reader_exercises_retry(
    spark, tmp_path, monkeypatch
):
    """Soak the checkpoint-aware compactor under a CONCURRENT reader
    (VERDICT r13 item 7 — the one scenario the suite didn't cover): a
    reader loop hammers the store through ``read_parquet_retry``
    (materialize=True) while ``compact_batched_store`` swaps the folded
    store live via ``staged_swap``. The swap's missing-path window is
    widened deterministically (the rename that parks the live dir at
    ``.old`` sleeps before the staging dir goes live), so the reader
    provably lands inside it: the transient-error classifier must fire at
    least once (the counter hook), every read must succeed after retries,
    and every successful read must see the FULL row count — never a
    half-swapped store."""
    import threading
    import time as _time

    from flink_recommendation_system_spark.sources import warehouse as WH

    store = str(tmp_path / "store")
    ckpt = tmp_path / "ckpt"
    (ckpt / "commits").mkdir(parents=True)
    for i in (0, 1, 2):
        (ckpt / "commits" / str(i)).write_text("v1")
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    per_batch = 20
    for i in (0, 1, 2):
        docs.orderBy("doc_id").offset(per_batch * i).limit(
            per_batch
        ).write.parquet(f"{store}/batch={i}")
    total = 3 * per_batch

    # counter hook: every retryable read failure consults the classifier
    calls = {"transient": 0}
    real_classify = WH._is_transient_swap_error

    def counting_classify(e):
        hit = real_classify(e)
        if hit:
            calls["transient"] += 1
        return hit

    monkeypatch.setattr(WH, "_is_transient_swap_error", counting_classify)

    # widen the rename window: after the live dir is parked at .old the
    # store path is briefly MISSING — hold it missing long enough that
    # the reader loop provably lands inside
    real_rename = os.rename

    def slow_rename(src, dst):
        real_rename(src, dst)
        if dst.rstrip("/").endswith(".old"):
            _time.sleep(0.8)

    monkeypatch.setattr(os, "rename", slow_rename)

    stop = threading.Event()
    errors: list[BaseException] = []
    counts: list[int] = []

    def reader():
        while not stop.is_set():
            try:
                df = WH.read_parquet_retry(
                    spark, store, retries=60, delay_s=0.05, materialize=True
                )
                counts.append(df.count())
            except BaseException as e:  # surfaced in the main thread
                errors.append(e)
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    _time.sleep(0.3)  # reader warm and mid-loop before the swap starts
    folded = compact_batched_store(spark, store, checkpoint_dir=str(ckpt))
    stop.set()
    t.join(timeout=120)
    assert not t.is_alive()
    assert not errors, errors
    assert folded == total
    assert batch_ids(store) == [2]
    assert counts and all(c == total for c in counts), counts[:10]
    assert calls["transient"] >= 1, "retry path never exercised"
