"""Streaming count-min sketch: a 3-batch file replay must converge to the
EXACT cells of the batch sketch over the full input (linearity), and the
merged sketch must serve the same estimates."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators.sketches import (
    cms_build,
    cms_estimate,
)
from flink_recommendation_system_spark.sources.tables import load_table
from flink_recommendation_system_spark.streaming.sketch import (
    read_cms,
    start_cms_refresh,
)
from tests.conftest import SF0001

W, D = 128, 4


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    events = load_table(spark, SF0001, "events").select("user_id")

    src = str(tmp_path / "in")
    for i, (lo, hi) in enumerate([(0, 50), (50, 100), (100, 10**9)]):
        (
            events.filter((F.col("user_id") >= lo) & (F.col("user_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .json(f"{src}/b{i}")
        )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q = start_cms_refresh(
        stream,
        "user_id",
        store_path=str(tmp_path / "cms"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        width=W,
        depth=D,
    )
    q.processAllAvailable()
    q.stop()

    merged = read_cms(spark, str(tmp_path / "cms"))
    full = cms_build(events, "user_id", W, D)
    sym_diff = merged.exceptAll(full).union(full.exceptAll(merged))
    assert sym_diff.count() == 0

    # the merged sketch serves identical estimates to the batch sketch
    probes = events.select("user_id").distinct().limit(20)
    got = {
        (r["user_id"], r["est_cnt"])
        for r in cms_estimate(merged, probes, "user_id", W, D).collect()
    }
    want = {
        (r["user_id"], r["est_cnt"])
        for r in cms_estimate(full, probes, "user_id", W, D).collect()
    }
    assert got == want and got


def test_streaming_cms_replay_idempotent(spark, tmp_path):
    """A replayed batch (crash before checkpoint commit) rewrites its own
    partition rather than double-counting: merging after a simulated
    re-process of batch 0 equals the single-pass result."""
    events = load_table(spark, SF0001, "events").select("user_id").limit(200)
    store = str(tmp_path / "cms")
    sk = cms_build(events, "user_id", W, D)
    sk.write.mode("overwrite").parquet(f"{store}/batch=0")
    sk.write.mode("overwrite").parquet(f"{store}/batch=0")  # replay
    merged = read_cms(spark, store)
    sym_diff = merged.exceptAll(sk).union(sk.exceptAll(merged))
    assert sym_diff.count() == 0


def test_streaming_histogram_quantiles_equal_batch(spark, tmp_path):
    """3-batch replay: merged histogram == batch histogram bit-for-bit,
    and the quantile estimates served from it are identical."""
    from flink_recommendation_system_spark.operators.sketches import (
        histogram_quantiles,
        log_histogram,
    )
    from flink_recommendation_system_spark.streaming.sketch import (
        read_histogram,
        start_histogram_refresh,
    )

    events = load_table(spark, SF0001, "events").select("value")
    src = str(tmp_path / "in")
    third = events.count() // 3
    # three roughly equal batches by a deterministic row split
    parts = events.withColumn(
        "g", (F.monotonically_increasing_id() % 3).cast("int")
    )
    for i in range(3):
        (
            parts.filter(F.col("g") == i)
            .select("value")
            .coalesce(1)
            .write.mode("append")
            .json(f"{src}/b{i}")
        )
    stream = (
        spark.readStream.schema("value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q = start_histogram_refresh(
        stream,
        "value",
        store_path=str(tmp_path / "hist"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    merged = read_histogram(spark, str(tmp_path / "hist"))
    # compare against the batch histogram over what the stream actually
    # ingested (the JSON round-trip is the same rows)
    ingested = spark.read.json(f"{src}/b*").select(
        F.col("value").cast("double").alias("value")
    )
    full = log_histogram(ingested, "value")
    sym = merged.exceptAll(full).union(full.exceptAll(merged))
    assert sym.count() == 0

    qs = [(1, 2), (9, 10)]
    got = {
        (r["q_num"], r["q_den"]): r["est"]
        for r in histogram_quantiles(merged, qs).collect()
    }
    want = {
        (r["q_num"], r["q_den"]): r["est"]
        for r in histogram_quantiles(full, qs).collect()
    }
    assert got == want and got
    assert third > 0  # three real batches


def test_read_cms_empty_before_first_batch(spark, tmp_path):
    """A store with no committed batch is an EMPTY sketch, not an error
    (same contract as the near-dup signature store)."""
    from flink_recommendation_system_spark.streaming.sketch import (
        read_cms,
        read_histogram,
    )

    assert read_cms(spark, str(tmp_path / "nope")).count() == 0
    assert read_histogram(spark, str(tmp_path / "nope2")).count() == 0


def test_streaming_hll_equals_batch_registers(spark, tmp_path):
    """3-batch replay must converge to the EXACT batch register table
    (per-bucket max is the HLL union), and the served estimate must equal
    the batch estimate bit-for-bit."""
    from flink_recommendation_system_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from flink_recommendation_system_spark.streaming.sketch import (
        read_hll,
        start_hll_refresh,
    )

    events = load_table(spark, SF0001, "events").select("user_id")
    src = str(tmp_path / "in")
    for i, (lo, hi) in enumerate([(0, 50), (50, 100), (100, 10**9)]):
        (
            events.filter((F.col("user_id") >= lo) & (F.col("user_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .json(f"{src}/b{i}")
        )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q = start_hll_refresh(
        stream,
        "user_id",
        store_path=str(tmp_path / "hll"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    merged = {
        (r["bucket"], r["rho"])
        for r in read_hll(spark, str(tmp_path / "hll")).collect()
    }
    batch = {
        (r["bucket"], r["rho"])
        for r in hll_registers(events, "user_id").collect()
    }
    assert merged == batch
    served = hll_estimate(read_hll(spark, str(tmp_path / "hll"))).collect()
    direct = hll_estimate(hll_registers(events, "user_id")).collect()
    assert served[0]["est"] == direct[0]["est"]


def test_read_hll_empty_before_first_batch(spark, tmp_path):
    from flink_recommendation_system_spark.streaming.sketch import read_hll

    assert read_hll(spark, str(tmp_path / "missing")).count() == 0


def test_read_hll_rejects_width_mismatch(spark, tmp_path):
    """A store built with a non-default register width must fail loudly on
    a default-width read (silent mismatch = wrong estimate)."""
    import pytest as _pytest

    from flink_recommendation_system_spark.streaming.sketch import (
        read_hll,
        start_hll_refresh,
    )

    events = load_table(spark, SF0001, "events").select("user_id")
    src = str(tmp_path / "in")
    events.coalesce(1).write.mode("append").json(f"{src}/b0")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q = start_hll_refresh(
        stream, "user_id",
        store_path=str(tmp_path / "hll"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        b=6,
    )
    q.processAllAvailable()
    q.stop()
    with _pytest.raises(ValueError, match="b=6"):
        read_hll(spark, str(tmp_path / "hll"))
    assert read_hll(spark, str(tmp_path / "hll"), b=6).count() <= 64


def test_cms_store_compaction_preserves_sums_and_uncommitted(spark, tmp_path):
    """Sketch-store compaction (round 13): folding committed batches must
    not change the read-side cell-wise sum, and an UNCOMMITTED batch's
    directory must survive verbatim — its replay overwrites batch=N
    idempotently; folding it would double-count the batch forever."""
    from flink_recommendation_system_spark.streaming.compaction import (
        batch_ids,
    )
    from flink_recommendation_system_spark.streaming.sketch import (
        compact_sketch_store,
    )

    events = load_table(spark, SF0001, "events").select("user_id")
    store = str(tmp_path / "cms")
    ckpt = tmp_path / "ckpt"
    (ckpt / "commits").mkdir(parents=True)
    # sf0.001 user ids span 0-14; keep all three batches non-empty
    for i, (lo, hi) in enumerate([(0, 5), (5, 10), (10, 10**9)]):
        b = events.filter((F.col("user_id") >= lo) & (F.col("user_id") < hi))
        cms_build(b, "user_id", W, D).write.parquet(f"{store}/batch={i}")
        if i < 2:  # batch 2 written but never committed
            (ckpt / "commits" / str(i)).write_text("v1")

    before = {
        (r.r, r.j): r.cnt for r in read_cms(spark, store).collect()
    }
    n = compact_sketch_store(spark, store, checkpoint_dir=str(ckpt))
    assert n > 0
    assert batch_ids(store) == [1, 2]  # 0,1 folded; 2 untouched
    after = {
        (r.r, r.j): r.cnt for r in read_cms(spark, store).collect()
    }
    assert after == before

    # replay of the uncommitted batch: overwrite batch=2 with the SAME
    # sketch — totals unchanged (the idempotence the fold must preserve)
    b2 = events.filter(F.col("user_id") >= 10)
    cms_build(b2, "user_id", W, D).write.mode("overwrite").parquet(
        f"{store}/batch=2"
    )
    replayed = {
        (r.r, r.j): r.cnt for r in read_cms(spark, store).collect()
    }
    assert replayed == before
    # estimates served off the compacted store match the batch sketch
    est = cms_estimate(
        read_cms(spark, store),
        spark.createDataFrame([(5,)], "user_id BIGINT"),
        "user_id",
        W,
        D,
    ).collect()[0]["est_cnt"]
    truth = events.filter(F.col("user_id") == 5).count()
    assert est >= truth
