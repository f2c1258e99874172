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
