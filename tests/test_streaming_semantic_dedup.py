"""Continuous semantic dedup: a 3-batch file replay of the embeddings
corpus must accumulate EXACTLY the qualifying cosine pairs — and hence the
same kept set — that the batch pinned-cell ``semantic_dedup_ivf`` computes
over the full corpus (VERDICT r09 item 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators import similarity as S
from flink_recommendation_system_spark.sources.tables import load_table
from flink_recommendation_system_spark.streaming.semantic_dedup import (
    read_semantic_dropped,
    read_semantic_pairs,
    start_streaming_semantic_dedup,
)
from tests.conftest import SF0001

N_CELLS = 128
N_PROBE = 8


def _emb(spark):
    return load_table(spark, SF0001, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def test_streaming_semantic_dedup_equals_batch(spark, tmp_path):
    emb = _emb(spark)

    # three disjoint ingestion batches in NON-id order (the middle id
    # range arrives LAST) so new×store pairs exercise both least/greatest
    # canonicalization directions
    src = str(tmp_path / "in")
    ranges = [(0, 170), (340, 10**9), (170, 340)]
    for i, (lo, hi) in enumerate(ranges):
        (
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .json(f"{src}/b{i}")
        )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )

    q = start_streaming_semantic_dedup(
        stream,
        store_path=str(tmp_path / "store"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_cells=N_CELLS,
        n_probe=N_PROBE,
    )
    q.processAllAvailable()
    q.stop()

    dropped = {
        r["vec_id"]
        for r in read_semantic_dropped(
            spark, str(tmp_path / "pairs")
        ).collect()
    }
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    kept_stream = all_ids - dropped
    # batch twin at the SAME pinned cell count (min_cells = max_cells
    # collapses the adaptive clamp to exactly N_CELLS)
    kept_batch = {
        r["vec_id"]
        for r in S.semantic_dedup_ivf(
            emb,
            n_probe=N_PROBE,
            max_cells=N_CELLS,
            min_cells=N_CELLS,
        ).collect()
    }
    assert kept_stream == kept_batch
    assert dropped, "corpus contains semantic dups; test is not vacuous"

    # every pair is canonical and emitted exactly once across batches
    pairs = read_semantic_pairs(spark, str(tmp_path / "pairs")).collect()
    keys = [(r["id_a"], r["id_b"]) for r in pairs]
    assert len(keys) == len(set(keys)), "a pair was emitted twice"
    assert all(a < b for a, b in keys)


def test_cross_batch_planted_duplicate_is_caught(spark, tmp_path):
    """A vector identical to a batch-0 vector arriving in batch 1 must be
    dropped via the new×store path (identical vectors share every probed
    cell)."""
    emb = _emb(spark).filter(F.col("vec_id") < 50)
    planted = emb.withColumn("vec_id", F.col("vec_id") + 100000)

    src = str(tmp_path / "in")
    emb.coalesce(1).write.mode("append").json(f"{src}/b0")
    planted.coalesce(1).write.mode("append").json(f"{src}/b1")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q = start_streaming_semantic_dedup(
        stream,
        store_path=str(tmp_path / "store"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_cells=N_CELLS,
        n_probe=N_PROBE,
    )
    q.processAllAvailable()
    q.stop()
    dropped = {
        r["vec_id"]
        for r in read_semantic_dropped(
            spark, str(tmp_path / "pairs")
        ).collect()
    }
    originals = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert {i + 100000 for i in originals} <= dropped


def test_read_store_excludes_current_and_later_batches(spark, tmp_path):
    """Replay safety: a retried batch must not see its own (possibly
    partial) prior write — _read_store(before_batch=N) returns only
    batches < N, and a missing store path is an empty store."""
    from flink_recommendation_system_spark.streaming.semantic_dedup import (
        ASSIGN_SCHEMA,
        _read_store,
    )

    store = str(tmp_path / "assign")
    assert (
        _read_store(spark, store, ASSIGN_SCHEMA, before_batch=0).count() == 0
    )

    emb = _emb(spark)
    b0 = emb.filter(F.col("vec_id") < 10)
    b1 = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    S.ivf_cell_assignments(b0, N_CELLS, N_PROBE).write.parquet(
        f"{store}/batch=0"
    )
    S.ivf_cell_assignments(b1, N_CELLS, N_PROBE).write.parquet(
        f"{store}/batch=1"
    )
    seen0 = {
        r["vec_id"]
        for r in _read_store(
            spark, store, ASSIGN_SCHEMA, before_batch=1
        ).collect()
    }
    seen1 = {
        r["vec_id"]
        for r in _read_store(
            spark, store, ASSIGN_SCHEMA, before_batch=2
        ).collect()
    }
    assert seen0 == {r["vec_id"] for r in b0.collect()}
    assert seen1 == {r["vec_id"] for r in b0.unionByName(b1).collect()}


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """The foreachBatch body replayed with the same batch id (the
    crash-between-write-and-checkpoint-commit case) must overwrite its
    own per-batch directories and leave the pairs table IDENTICAL —
    never see its own half-written output via the store."""
    from flink_recommendation_system_spark.streaming import semantic_dedup as SD

    emb = _emb(spark).filter(F.col("vec_id") < 120).localCheckpoint()
    store = str(tmp_path / "store")
    pairs = str(tmp_path / "pairs")

    # hand-drive two batches through the same process body the stream uses
    def process(batch_df, batch_id):
        store_assign = SD._read_store(
            spark, f"{store}/assign", SD.ASSIGN_SCHEMA, before_batch=batch_id
        )
        store_vecs = SD._read_store(
            spark, f"{store}/vecs", SD.VEC_SCHEMA, before_batch=batch_id
        )
        new_assign = S.ivf_cell_assignments(
            batch_df, N_CELLS, N_PROBE
        ).localCheckpoint()
        p = S.incremental_semantic_pairs(
            batch_df, store_assign, store_vecs,
            n_cells=N_CELLS, n_probe=N_PROBE, new_assign=new_assign,
        )
        p.write.mode("overwrite").parquet(f"{pairs}/batch={batch_id}")
        new_assign.write.mode("overwrite").parquet(
            f"{store}/assign/batch={batch_id}"
        )
        batch_df.write.mode("overwrite").parquet(
            f"{store}/vecs/batch={batch_id}"
        )

    b0 = emb.filter(F.col("vec_id") < 60)
    # batch 1: the rest plus EXACT copies of batch-0 vectors under new ids
    # (cosine 1.0 — guarantees cross-store pairs so the equality assert
    # is not vacuous at this tiny slice)
    b1 = emb.filter(F.col("vec_id") >= 60).unionByName(
        b0.withColumn("vec_id", F.col("vec_id") + 100000)
    )
    process(b0, 0)
    process(b1, 1)
    first = sorted(
        tuple(r)
        for r in SD.read_semantic_pairs(spark, pairs).collect()
    )
    process(b1, 1)  # replay the last batch (post-crash retry)
    second = sorted(
        tuple(r)
        for r in SD.read_semantic_pairs(spark, pairs).collect()
    )
    assert first == second
    assert first, "no pairs at all — idempotence test is vacuous"


def test_compact_semantic_store_preserves_replay_contract(spark, tmp_path):
    """Compaction folds both store tables into one partition (at the max
    folded batch id, so any later batch's ``batch < N`` read still sees
    every row) without changing their contents, and a post-compaction
    batch still pairs against the full compacted store."""
    from flink_recommendation_system_spark.streaming.semantic_dedup import (
        ASSIGN_SCHEMA,
        _read_store,
        compact_semantic_store,
    )

    emb = _emb(spark).filter(F.col("vec_id") < 90)
    store = str(tmp_path / "store")
    for i, (lo, hi) in enumerate([(0, 30), (30, 60), (60, 90)]):
        b = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        S.ivf_cell_assignments(b, N_CELLS, N_PROBE).write.parquet(
            f"{store}/assign/batch={i}"
        )
        b.write.parquet(f"{store}/vecs/batch={i}")
    before = sorted(
        (r["vec_id"], r["cell"])
        for r in _read_store(
            spark, f"{store}/assign", ASSIGN_SCHEMA, before_batch=99
        ).collect()
    )
    n_assign, n_vecs = compact_semantic_store(spark, store)
    after = sorted(
        (r["vec_id"], r["cell"])
        for r in _read_store(
            spark, f"{store}/assign", ASSIGN_SCHEMA, before_batch=99
        ).collect()
    )
    assert before == after
    assert n_assign == len(before)
    assert n_vecs == emb.count()
    # the consolidated store sits entirely at the max folded id (2),
    # visible to batch 3+ via the batch < N read
    import os

    assert os.path.isdir(f"{store}/assign/batch=2")
    assert not os.path.isdir(f"{store}/assign/batch=0")
    assert not os.path.isdir(f"{store}/assign/batch=1")


def test_incremental_disjointness_guard(spark):
    """Overlapping ids between a batch and the vector store must raise —
    silently collapsed pairs are the failure mode the guard exists for."""
    import pytest

    emb = _emb(spark).filter(F.col("vec_id") < 20)
    assign = S.ivf_cell_assignments(emb, N_CELLS, N_PROBE)
    with pytest.raises(ValueError, match="overlap"):
        S.incremental_semantic_pairs(
            emb, assign, emb, n_cells=N_CELLS, n_probe=N_PROBE
        ).count()


def test_read_semantic_pairs_before_first_batch(spark, tmp_path):
    """Both read APIs share the missing-path contract (VERDICT r11 item
    4): before any batch commits, the pairs table reads as EMPTY with the
    stable schema — not AnalysisException."""
    missing = str(tmp_path / "never_written")
    pairs = read_semantic_pairs(spark, missing)
    assert pairs.columns == ["id_a", "id_b", "cosine"]
    assert pairs.count() == 0
    dropped = read_semantic_dropped(spark, missing)
    assert dropped.columns == ["vec_id"]
    assert dropped.count() == 0


def test_at_least_once_redelivery_in_later_batch(spark, tmp_path):
    """At-least-once delivery re-sends a batch-0 vector in a LATER batch
    (different batch id, so the before_batch store exclusion does NOT
    screen it). The live foreachBatch body must neither raise (the
    disjointness guard is off on the streaming path — VERDICT r11 item 3)
    nor let the redelivered vector self-pair against its own store copy
    and drop itself; the verdict must equal the batch tier over the
    DISTINCT corpus."""
    emb = _emb(spark).filter(F.col("vec_id") < 120).localCheckpoint()

    src = str(tmp_path / "in")
    # a ZERO vector gets no assignment rows (ivf_cell_assignments skips
    # it) but does land in the vecs store — the redelivery screen must
    # catch its re-send too (round-12 review: an assign-side screen
    # would re-ingest it forever)
    dim = len(emb.first()["embedding"])
    zero = spark.createDataFrame(
        [(100001, [0.0] * dim)], ["vec_id", "embedding"]
    )
    b0 = emb.filter(F.col("vec_id") < 60).unionByName(zero)
    # batch 1 = the rest PLUS redelivered copies of the three lowest ids
    # AND the zero vector
    redelivered = b0.filter(
        (F.col("vec_id") < 3) | (F.col("vec_id") == 100001)
    )
    b1 = emb.filter(F.col("vec_id") >= 60).unionByName(redelivered)
    b0.coalesce(1).write.mode("append").json(f"{src}/b0")
    b1.coalesce(1).write.mode("append").json(f"{src}/b1")

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q = start_streaming_semantic_dedup(
        stream,
        store_path=str(tmp_path / "store"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_cells=N_CELLS,
        n_probe=N_PROBE,
    )
    q.processAllAvailable()
    q.stop()

    pairs = read_semantic_pairs(spark, str(tmp_path / "pairs"))
    assert pairs.filter(F.col("id_a") == F.col("id_b")).count() == 0, (
        "a redelivered vector self-paired against its own store copy"
    )
    # the ingestion screen must keep both store tables UNIQUE per id and
    # the pair table exactly-once: a redelivered id re-ingested would
    # duplicate its store rows forever and re-emit every pair it touches
    for sub in ("assign", "vecs"):
        store = spark.read.parquet(str(tmp_path / "store" / sub))
        ids = store.select("vec_id", *(
            ["cell"] if sub == "assign" else []
        ))
        assert ids.count() == ids.distinct().count(), (
            f"redelivery duplicated rows in the {sub} store"
        )
    assert pairs.count() == pairs.distinct().count(), (
        "redelivery re-emitted already-emitted pairs"
    )
    dropped = {
        r["vec_id"]
        for r in read_semantic_dropped(
            spark, str(tmp_path / "pairs")
        ).collect()
    }
    kept_stream = {
        r["vec_id"] for r in emb.select("vec_id").collect()
    } - dropped
    kept_batch = {
        r["vec_id"]
        for r in S.semantic_dedup_ivf(
            emb, n_probe=N_PROBE, max_cells=N_CELLS, min_cells=N_CELLS
        ).collect()
    }
    assert kept_stream == kept_batch
