"""Checkpoint-aware compaction for per-batch streaming store tables.

The package's streaming sinks (near_dup, semantic_dedup, the enriched
output sink, the sketch stores) all write each micro-batch into its own
``batch=N`` subdirectory with ``mode("overwrite")`` — the replay contract:
a batch retried after a crash overwrites its own output and, where a store
feeds back into the pipeline, the store read EXCLUDES ``batch >= N`` so a
retry never sees its own partial write. The price is one directory per
trigger forever; this module is the shared maintenance pass that folds
them back.

Why compaction must consult the CHECKPOINT, not just "the stream is
stopped" (round-13 advisor finding): a micro-batch can be interrupted
after its sinks wrote but before its checkpoint commit. On restart,
Structured Streaming replays exactly the batches whose ``offsets/N``
exists without ``commits/N``. If compaction folds such a batch's rows into
a low batch id, the replay's ``batch >= N`` self-exclusion no longer
screens them: the rows now LOOK like prior corpus, the ingestion anti-join
screens the replayed documents away, and the replay overwrites
``batch=N`` with an EMPTY result — silent permanent output loss. Folding
into ``batch=<max existing id>`` (the obvious alternative) is worse: when
the uncommitted batch IS the max id, its replay excludes ``batch >= N`` —
the entire folded store — and then overwrites that one directory with just
its own rows, destroying the corpus store.

The fix implemented here: read the commit markers and fold ONLY batches
``<= max committed id`` (which Structured Streaming will never replay),
into ``batch=<max folded id>``; any uncommitted batch directories are
carried through verbatim so the replay contract is untouched. Without a
``checkpoint_dir`` the caller must guarantee the last written batch
committed — the legacy contract, still supported for stores maintained
outside a Structured Streaming checkpoint.

Filesystem note: listings/renames here are local-FS (``os``), matching
``sources.warehouse.staged_swap``; a cluster deployment swaps these for
the Hadoop FileSystem API (or a table format whose metadata commit
replaces the whole ritual).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _local_path(path: str) -> str:
    """Strip a ``file:``/``file://`` scheme so os.* calls work on the
    same paths Spark writes."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:"):
        return path[len("file:"):]
    return path


def batch_ids(path: str) -> list[int]:
    """Sorted ``batch=N`` partition ids present under ``path`` (empty for
    a missing path — no store yet)."""
    try:
        names = os.listdir(_local_path(path))
    except FileNotFoundError:
        return []
    ids = []
    for name in names:
        if name.startswith("batch="):
            try:
                ids.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(ids)


def max_committed_batch(checkpoint_dir: str) -> int | None:
    """Largest micro-batch id whose commit marker exists under
    ``<checkpoint>/commits`` — the last batch Structured Streaming will
    NOT replay on restart (replay set = offsets without commits). None if
    no batch has committed yet (then nothing is safe to compact)."""
    commits = os.path.join(_local_path(checkpoint_dir), "commits")
    try:
        names = os.listdir(commits)
    except FileNotFoundError:
        return None
    ids = [int(n) for n in names if n.isdigit()]
    return max(ids) if ids else None


def compact_batched_store(
    spark: SparkSession,
    path: str,
    checkpoint_dir: str | None = None,
    target_partitions: int | None = None,
) -> int:
    """Fold the committed ``batch=N`` partitions of a per-batch store into
    one consolidated partition, preserving the replay contract. Returns
    the number of rows folded (0 when there is nothing safe to fold).

    With ``checkpoint_dir``: only batches ``<= max committed id`` fold
    (into ``batch=<max folded id>``); uncommitted batch directories are
    rewritten verbatim under their original ids, so a restart's replay of
    an uncommitted batch still (a) excludes its own rows via the
    ``batch >= N`` store-read exclusion and (b) sees every committed row
    via ``batch < N``. Safe to run against a stream stopped at ANY
    boundary, committed or not.

    Without ``checkpoint_dir``: every partition folds (legacy contract —
    the caller MUST guarantee the last written batch's checkpoint commit
    landed; merely stopping the stream does not guarantee that).

    The rewrite stages into ``<path>.compact`` and swaps via
    ``sources.warehouse.staged_swap`` (which heals a prior crashed swap
    first): the live path is never half-written, and a crash between the
    swap's renames rolls back from ``.old`` on the next attempt.

    Torn-write safety (round-13 review): only the COMMITTED batch
    directories are ever read through Spark — committed means the sink's
    job commit finished, so their files are complete. An uncommitted
    directory may hold a footer-less part file from the very
    crash-mid-write this pass must tolerate, so it is carried into the
    staging tree by a filesystem copy (genuinely verbatim, bytes
    included), never parsed.
    """
    import shutil

    # staged_swap heals on entry, but the ids listing below reads the live
    # path BEFORE the swap runs — heal explicitly so a crashed prior
    # compaction doesn't present an empty/missing store here. Normalize
    # the scheme once: every os-level call below (heal, listing, copy,
    # swap renames) needs the bare path Spark's file: URIs refer to.
    from ..sources.warehouse import heal_staged_swap, staged_swap

    path = _local_path(path).rstrip("/")
    heal_staged_swap(path)
    ids = batch_ids(path)
    if not ids:
        return 0
    if checkpoint_dir is not None:
        committed = max_committed_batch(checkpoint_dir)
        if committed is None:
            return 0
        fold_ids = [i for i in ids if i <= committed]
    else:
        fold_ids = ids
    if not fold_ids:
        return 0
    fold_bound = max(fold_ids)
    keep_ids = [i for i in ids if i > fold_bound]

    # read ONLY the committed directories (no basePath: the batch
    # partition column is re-added as a literal, normalized to long to
    # line up with the stores' LongType read schemas)
    folded: DataFrame = (
        spark.read.parquet(*[f"{path}/batch={i}" for i in fold_ids])
        .withColumn("batch", F.lit(fold_bound).cast("long"))
    )
    if target_partitions is not None:
        folded = folded.repartition(target_partitions)

    n = 0

    def _write(staging: str) -> None:
        nonlocal n
        folded.write.mode("overwrite").partitionBy("batch").parquet(staging)
        # count the freshly-written consolidated output (merge_upsert's
        # pattern) instead of re-scanning the fragmented input a second
        # time; runs BEFORE the verbatim copies so only folded rows count
        n = spark.read.parquet(staging).count()
        for i in keep_ids:
            shutil.copytree(
                f"{path}/batch={i}", f"{staging}/batch={i}"
            )

    staged_swap(_write, path, staging_suffix=".compact")
    return n
