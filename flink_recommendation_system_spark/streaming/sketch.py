"""Continuous frequency profiling: per-micro-batch count-min sketches.

The batch operator (``operators.sketches.cms_build``) is LINEAR — the
sketch of a union is the cell-wise sum of the sketches — which makes it
the natural streaming profile: each micro-batch writes ITS OWN sketch
under ``store_path/batch=N`` (overwrite, so a replayed batch after a
crash rewrites identical cells — idempotent by construction, the same
contract as ``streaming.near_dup``'s signature store), and the current
corpus-wide sketch is the read-side cell-wise sum. No per-key state
anywhere: the streaming state is ZERO (stateless foreachBatch), the
store is at most depth*width cells per batch, and ``compact``-style
consolidation is just re-partitioning the sum.

This is the shape for "what are the hot keys / how skewed is the stream"
questions over unbounded key domains (URLs, n-grams, user ids) where a
streaming groupBy's state would grow with the key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..errors import is_path_not_found
from ..operators.sketches import cms_build


def _read_store(spark: SparkSession, store_path: str, schema: str) -> DataFrame:
    """Read a per-batch sketch store; a store with NO committed batch yet
    (missing path — e.g. a serving job racing the first micro-batch, or a
    restart over an empty dir) is an EMPTY sketch, not an error — the same
    contract as streaming.near_dup._read_store. Any other read failure
    surfaces."""
    try:
        return spark.read.parquet(store_path)
    except AnalysisException as e:
        if is_path_not_found(e):
            return spark.createDataFrame([], schema)
        raise


def start_cms_refresh(
    stream: DataFrame,
    key_col: str,
    store_path: str,
    checkpoint_dir: str,
    width: int = 1024,
    depth: int = 4,
):
    """Maintain a per-batch count-min-sketch store over ``stream[key_col]``.
    Returns the StreamingQuery. Read the merged sketch with ``read_cms``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sk = cms_build(batch_df, key_col, width, depth)
        sk.write.mode("overwrite").parquet(f"{store_path}/batch={batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def compact_sketch_store(
    spark: SparkSession,
    store_path: str,
    checkpoint_dir: str | None = None,
    target_partitions: int | None = None,
) -> int:
    """Fold a per-batch sketch store's committed ``batch=N`` directories
    into one partition (streaming.compaction.compact_batched_store — the
    same maintenance pass as the signature/semantic/output compactors).
    Works for all three stores here: the read-side merges are cell-wise
    sum (CMS, histogram) or per-bucket max (HLL), both order- and
    partition-independent, so folding changes nothing a reader sees.

    The checkpoint matters MORE for the additive stores than for the
    dedup stores: their readers sum over EVERY batch directory with no
    ``batch < N`` exclusion, so folding an UNCOMMITTED batch's cells and
    then having Structured Streaming replay that batch (which rewrites
    its ``batch=N`` directory) would DOUBLE-COUNT the batch forever.
    Pass the stream's ``checkpoint_dir`` and only committed batches —
    which are never replayed — fold. Returns rows folded."""
    from .compaction import compact_batched_store

    return compact_batched_store(
        spark,
        store_path,
        checkpoint_dir=checkpoint_dir,
        target_partitions=target_partitions,
    )


def read_cms(spark: SparkSession, store_path: str) -> DataFrame:
    """The current corpus-wide sketch: cell-wise sum over every batch's
    sketch — identical to ``cms_build`` over the concatenated input
    (linearity; pinned in tests/test_streaming_sketch.py). Feed it to
    ``operators.sketches.cms_estimate``."""
    return (
        _read_store(spark, store_path, "r INT, j LONG, cnt LONG")
        .groupBy("r", "j")
        .agg(F.sum("cnt").alias("cnt"))
    )


def start_histogram_refresh(
    stream: DataFrame,
    value_col: str,
    store_path: str,
    checkpoint_dir: str,
    scale: int = 100,
):
    """Maintain a per-batch log-histogram store over ``stream[value_col]``
    (operators.sketches.log_histogram — same linearity argument as the
    CMS above: per-batch partitions overwrite idempotently, the corpus
    histogram is the read-side cell-wise sum). Feed ``read_histogram`` to
    ``operators.sketches.histogram_quantiles`` for continuously-fresh
    approximate percentiles with fixed state."""
    from ..operators.sketches import log_histogram

    def process(batch_df: DataFrame, batch_id: int) -> None:
        h = log_histogram(batch_df, value_col, scale)
        h.write.mode("overwrite").parquet(f"{store_path}/batch={batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_histogram(spark: SparkSession, store_path: str) -> DataFrame:
    """The current corpus-wide log-histogram: cell-wise sum over batches."""
    return (
        _read_store(spark, store_path, "b INT, p LONG, cnt LONG")
        .groupBy("b", "p")
        .agg(F.sum("cnt").alias("cnt"))
    )


def start_hll_refresh(
    stream: DataFrame,
    key_col: str,
    store_path: str,
    checkpoint_dir: str,
    b: int | None = None,
):
    """Maintain a per-batch portable-HLL register store over
    ``stream[key_col]`` — the distinct-count member of the streaming
    sketch trio (CMS = frequency, log-histogram = quantiles, HLL =
    cardinality). Same idempotence story: each micro-batch OVERWRITES its
    own partition, so replays are harmless; the corpus-wide registers are
    the read-side per-bucket MAX (the HLL union — max of maxes equals the
    registers of the concatenated input). Feed ``read_hll`` to
    ``operators.sketches.hll_estimate``."""
    from ..operators.sketches import HLL_B, hll_registers

    b_eff = HLL_B if b is None else b

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # persist b with the registers: the estimator's math depends on it,
        # and a reader defaulting to the wrong width would silently compute
        # a wrong cardinality — read_hll validates it instead
        regs = hll_registers(batch_df, key_col, b_eff).withColumn(
            "b", F.lit(b_eff)
        )
        regs.write.mode("overwrite").parquet(f"{store_path}/batch={batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_hll(
    spark: SparkSession, store_path: str, b: int | None = None
) -> DataFrame:
    """The current corpus-wide HLL registers: per-bucket MAX over every
    batch's registers (union semantics; NOT a sum — summing rho values
    would inflate the estimate, which is why this reader exists instead of
    reusing the additive ones above).

    The store records the register width ``b`` each batch was built with;
    the read RAISES if batches disagree or if the caller's expected ``b``
    (default ``HLL_B``, matching ``hll_estimate``'s default) does not
    match — a silent width mismatch would feed ``hll_estimate`` the wrong
    m and return a wrong number with no error."""
    from ..operators.sketches import HLL_B

    df = _read_store(spark, store_path, "bucket INT, rho INT, b INT")
    expect = HLL_B if b is None else b
    bs = [r["b"] for r in df.select("b").distinct().collect()]
    if len(bs) > 1:
        raise ValueError(f"HLL store mixes register widths b={sorted(bs)}")
    if bs and bs[0] != expect:
        raise ValueError(
            f"HLL store was built with b={bs[0]}, reader expects b={expect}; "
            "pass the matching b to read_hll AND hll_estimate"
        )
    return (
        df.groupBy("bucket").agg(F.max("rho").alias("rho"))
    )
