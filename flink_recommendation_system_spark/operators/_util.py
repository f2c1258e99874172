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
    shuffle of the corpus.

    Cost note: inspecting the partition count plans the query once at
    operator-CONSTRUCTION time (``df.rdd``) — acceptable for these
    operators, whose callers execute the result immediately; environments
    where ``.rdd`` is unavailable (Spark Connect) skip the guard rather
    than fail, since it is purely a local-performance adaptation."""
    try:
        par = df.sparkSession.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n < par:
        return df.repartition(par)
    return df


def md5_half_hashes(key):
    """THE cross-engine double-hash base (one definition — bloom and the
    count-min sketch both derive their Kirsch-Mitzenmacher positions
    ``(h1 + i*h2) mod m`` from it, and their DuckDB oracles embed the same
    construction): h1/h2 = first/second 8-hex-char halves of md5(key) as
    integers, h2 forced odd so the stride never degenerates on
    power-of-two m. Returns (h1, h2) Columns; project them BEFORE any
    explode (no CSE inside Generate arrays — PERFORMANCE.md round 4c)."""
    from pyspark.sql import functions as F

    md5 = F.md5(key)
    h1 = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
    h2 = (
        F.conv(F.substring(md5, 9, 8), 16, 10)
        .cast("long")
        .bitwiseOR(F.lit(1).cast("long"))
    )
    return h1, h2
