"""Arrow-vectorized Pandas UDFs — the engine's user extension surface
(SURVEY.md §2.10): where the reference exposes Flink function interfaces
(MapFunction, GroupReduceFunction, RichMapFunction), this engine exposes
`pandas_udf` (scalar), `applyInPandas` (grouped map), `mapInPandas`
(iterator), and `foreachBatch` (sinks).

Everything in the engine's own hot paths is built-in JVM functions; these
exist for user-defined logic that genuinely needs Python, at Arrow batch
granularity (~10-100× faster than row-at-a-time Python UDFs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def _zscore_udf(v: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
    # Pure vectorized pandas arithmetic over an Arrow batch.
    return (v - mean) / std.where(std != 0, 1.0)


def rating_zscore(df: DataFrame, value_col: str = "rating", key_col: str = "product_id") -> DataFrame:
    """Per-key z-score of a value column: the group stats come from a
    JVM-side aggregation + broadcast join (cheap, built-in); only the final
    normalize runs in Python as a scalar Pandas UDF — the canonical split
    of work between Catalyst and Arrow."""
    stats = df.groupBy(key_col).agg(
        F.avg(value_col).alias("_mean"),
        F.stddev_pop(value_col).alias("_std"),
    )
    # null-safe equality: a plain equi-join drops every NULL-key row (the
    # groupBy even PRODUCES a NULL-group stats row that NULL != NULL can
    # never match) — a normalization helper must be row-preserving
    return (
        df.join(
            F.broadcast(stats.withColumnRenamed(key_col, "_k")),
            F.col(key_col).eqNullSafe(F.col("_k")),
        )
        .drop("_k")
        .withColumn(
            f"{value_col}_z",
            _zscore_udf(F.col(value_col), F.col("_mean"), F.col("_std")),
        )
        .drop("_mean", "_std")
    )


def cosine_pairs_pandas(
    pairs: DataFrame, a_col: str = "a_vec", b_col: str = "b_vec"
) -> DataFrame:
    """Alternative numpy-backed cosine for pre-joined vector pairs.

    NOT used on the oracle-checked paths (numpy's pairwise/SIMD summation
    order differs from the left-fold the DuckDB oracle reproduces), but at
    very high pair counts the Arrow batch transfer + BLAS beats interpreted
    higher-order functions — users can opt in where last-ulp determinism
    does not matter.
    """
    import numpy as np

    @pandas_udf(DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.stack(a.to_numpy()).astype(np.float64)
        bv = np.stack(b.to_numpy()).astype(np.float64)
        num = (av * bv).sum(axis=1)
        den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        return pd.Series(num / den)

    return pairs.withColumn("cosine_sim", _cos(F.col(a_col), F.col(b_col)))


def top_k_per_group_pandas(
    df: DataFrame, group_col: str, order_col: str, k: int
) -> DataFrame:
    """Grouped-map (`applyInPandas`) top-k — the GroupReduceFunction analog
    (SURVEY.md §2.10). Built-in window functions are preferred for this
    exact task; this exists as the template for genuinely custom per-group
    logic."""

    def take_top(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.nlargest(k, order_col)

    return df.groupBy(group_col).applyInPandas(take_top, df.schema)


def sentence_split_udtf():
    """Python UDTF (Spark 4, SURVEY.md §2.10's table-function slot — the
    Flink side would be a `TableFunction`/flatMap): one input document row
    → one output row per sentence with its index. Arrow-optimized
    (``useArrow``). UDTFs are the lazy row-expansion escape hatch when the
    fan-out logic genuinely needs Python; engine-internal fan-outs use
    JVM ``explode``/``posexplode`` instead (see PERFORMANCE.md).

    Returns the registrable UDTF object; use as
    ``udtf_obj(F.lit(...), ...)`` or register with
    ``spark.udtf.register``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx: int, sentence: string", useArrow=True)
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            if text is None:
                return
            idx = 0
            for raw in text.replace("!", ".").replace("?", ".").split("."):
                s = raw.strip()
                if s:
                    yield idx, s
                    idx += 1

    return SentenceSplit
