"""Model-table warehouse layout (M5): partitioned and bucketed publication
of the engine's model tables, replacing the reference's Redis keyspace.

At 100 TB the layout IS the optimization:

- **Partitioned** tables prune whole directories at scan time (e.g. the
  ratings fact partitioned by rating bucket or date → predicate pushdown
  becomes partition pruning).
- **Bucketed** tables pre-shuffle by join key at write time: two tables
  bucketed by the same key join with ZERO exchange — the recurring
  user-keyed joins (ratings ⨝ recommendations ⨝ stream batch) hit this
  constantly, so paying the shuffle once at publish beats paying it per
  query.

Bucketing requires the table catalog (``saveAsTable``); plain-path parquet
gets partitioning only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..errors import is_path_not_found


def heal_staged_swap(path: str) -> None:
    """Roll back a crash between ``staged_swap``'s two renames: the live
    directory missing with ``<path>.old`` present means ``.old`` holds
    the ONLY copy of the table — restore it before reading. Callers of
    ``staged_swap`` MUST run this first; without it a retry would read
    PATH_NOT_FOUND, rebuild from partial inputs, and then delete the
    ``.old`` backup, losing previously published rows."""
    import os

    old = path.rstrip("/") + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)


def staged_swap(write_fn, path: str, staging_suffix: str = ".staging") -> None:
    """Atomically replace the table at ``path``: ``write_fn(staging)``
    writes the new contents into ``<path><staging_suffix>``, then two
    renames swap it live with a ``.old`` rollback window. A crash at any
    point leaves either the old table live, or the old table at ``.old``
    where ``heal_staged_swap`` restores it — the live path is never
    half-written. ONE shared copy of this ritual (round 12): it was
    previously hand-rolled in merge_upsert and both streaming-store
    compactors, and the crash-window logic must not drift between them.

    Heals a crashed prior swap itself before doing anything (round 13):
    the heal used to be a caller obligation enforced only by convention,
    and a caller that forgot would rebuild from a missing live path and
    then DELETE the ``.old`` backup — the exact loss mode the heal
    exists to prevent. ``heal_staged_swap`` stays public for read-side
    callers; write_fn callbacks that read the live path (e.g.
    merge_upsert) rely on the heal having run by the time they execute.

    Readers can still observe a missing path for the microseconds
    between the two renames — concurrent-reader call sites pair this
    with ``read_parquet_retry``; the compactors run while their stream
    is paused, so they don't need it."""
    import os
    import shutil

    heal_staged_swap(path)
    old = path.rstrip("/") + ".old"
    staging = path.rstrip("/") + staging_suffix
    write_fn(staging)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(staging, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def _is_transient_swap_error(e: Exception) -> bool:
    """PATH_NOT_FOUND at analysis time, or an executor-side
    ``java.io.FileNotFoundException`` from a listing that went stale
    mid-swap — the two faces of reading across a concurrent
    ``staged_swap``. Anchored on the fully-qualified JVM class name
    (round-13 advisor finding): a bare substring match would also retry
    genuinely fatal errors that merely MENTION the string somewhere in a
    Py4J stack trace, masking the real failure for retries*delay."""
    if isinstance(e, AnalysisException):
        return is_path_not_found(e)
    return "java.io.FileNotFoundException" in str(e)


def read_parquet_retry(
    spark: SparkSession,
    path: str,
    retries: int = 3,
    delay_s: float = 0.1,
    materialize: bool = False,
) -> DataFrame:
    """Read a staged-swap-published table, retrying the transient errors
    a concurrent swap produces: PATH_NOT_FOUND in the rename window, or
    an executor FileNotFoundException when the file listing went stale
    before the job ran. A genuinely absent table still raises after the
    retries (first-ever publish has not happened: that IS an error for a
    model consumer).

    ``materialize=True`` localCheckpoints the table INSIDE the retry
    loop — required when the caller's job runs lazily LATER (e.g. the
    speed layer's per-trigger model read feeding a join): without it the
    returned DataFrame still holds the original file listing, and a swap
    landing between this call and the downstream action fails the job
    beyond the retry's reach. Size note: intended for model/dim tables;
    a table format with snapshot isolation replaces this at warehouse
    scale."""
    import time

    for attempt in range(retries + 1):
        try:
            df = spark.read.parquet(path)
            if materialize:
                df = df.localCheckpoint()
            return df
        except Exception as e:
            if not _is_transient_swap_error(e) or attempt == retries:
                raise
            time.sleep(delay_s)
    raise AssertionError("unreachable")


def publish_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Overwrite-publish a model table partitioned by the given columns."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def publish_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Overwrite-publish as a bucketed catalog table. Joins between tables
    bucketed by the same column/count require no exchange (verify with
    `.explain`: no Exchange above either scan)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, bucket_col
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> int:
    """Keyed MERGE into a plain-parquet model table — the warehouse
    generalization of the reference's overwrite-on-publish Redis MULTI
    (SURVEY.md §2.1 S7): rows in ``updates`` replace target rows with the
    same key, new keys append, and (with ``delete_col``) rows whose
    boolean flag is true act as tombstones that remove the key instead.
    Returns the resulting row count.

    Semantics = ``MERGE INTO target USING updates ON keys WHEN MATCHED
    [AND delete] THEN DELETE / WHEN MATCHED THEN UPDATE SET * / WHEN NOT
    MATCHED [AND NOT delete] THEN INSERT *`` — the Delta/Iceberg statement,
    expressed with one anti-join (survivors = target minus updated keys)
    plus a union, which is exactly the physical plan a format-level MERGE
    produces for full-row updates. ``updates`` must carry one row per key
    (enforced: ambiguous multi-row updates raise).

    Plain parquet cannot rewrite in place (the read feeds the write), so
    the result stages into ``<target>.staging`` and swaps via two renames —
    crash-safe the same way as ``compact_signature_store``: the live
    directory is never half-written. A table format (Delta/Iceberg) would
    replace the swap with a metadata commit and rewrite only matched
    files; at 100 TB you'd partition the target and prune the anti-join to
    touched partitions first.
    """
    heal_staged_swap(target_path)

    # pin the batch once: the dup-key check below and the staged write are
    # two actions, and without this the whole upstream transformation
    # (often a foreachBatch micro-batch pipeline) would recompute per
    # action — updates are per-batch keyed deltas, small by contract
    updates = updates.localCheckpoint()
    dup = (
        updates.groupBy(*key_cols).count().filter("count > 1").limit(1).count()
    )
    if dup:
        raise ValueError("updates must contain at most one row per key")
    data_cols = [c for c in updates.columns if c != delete_col]
    upserts = updates
    if delete_col is not None:
        # NULL flag = NOT a delete (a streaming batch missing the field
        # must upsert, not silently tombstone the key)
        upserts = updates.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).select(*data_cols)
    try:
        target = spark.read.parquet(target_path)
        survivors = target.join(
            updates.select(*key_cols), key_cols, "left_anti"
        )
        result = survivors.unionByName(upserts)
    except AnalysisException as e:
        if not is_path_not_found(e):
            raise
        result = upserts
    n = 0

    def _write(staging: str) -> None:
        nonlocal n
        result.write.mode("overwrite").parquet(staging)
        n = spark.read.parquet(staging).count()

    staged_swap(_write, target_path)
    return n

