"""Shared physical-plan helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Small-scan guard for hash/explode-heavy fan-out stages: a
    sub-split-size parquet (one row group) scans as ONE partition, which
    serializes the whole explode+hash+partial-agg phase on one core
    (measured: the sf0.1 documents table is a single 600 KB row group, so
    every signature/postings build ran single-threaded — MinHash 6.8 s →
    2.8 s once spread). Repartitions up to ``defaultParallelism`` ONLY
    when the input has fewer partitions — at real scale the corpus is
    thousands of splits and this is a no-op (no shuffle inserted), unlike
    an unconditional ``repartition`` which would force a full extra
    shuffle of the corpus."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
