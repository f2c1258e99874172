"""As-of join — the canonical time-series operator Spark's built-in join
family lacks (SURVEY.md §2.4 notes the reference lacks it too). For every
left row, attach the most recent right row with ``right.ts <= left.ts`` for
the same key.

Implementation (pure DataFrame composition, SURVEY.md §7 custom-operator
tier (a)): tag and union both sides, then a per-key window running
``last(..., ignorenulls=True)`` ordered by (ts, side) — right rows sort
before left rows at equal timestamps, giving the standard inclusive
(``<=``) as-of semantics. One shuffle on the key, one window sort; no
range-explosion, no per-row lookups. All carried columns travel as ONE
struct through a single ``last`` so every as-of field comes from the same
matched right row — per-column ``last`` calls would silently mix rows
whenever a right-side value column is legitimately NULL (DuckDB ASOF JOIN
carries the whole row; so must we).

Scale notes: state per key is a single carried value (the window function
streams); skewed keys behave like any window partition — salt the key and
merge if a single entity dominates. The DuckDB oracle uses its native
``ASOF LEFT JOIN``, so the semantics are pinned to an independent
implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """LEFT as-of join: every ``left`` row, plus the ``value_cols`` (and
    timestamp, as ``{right_ts}{suffix}``) of the latest ``right`` row with
    ``right_ts <= left_ts`` for the same ``key``; nulls when no prior right
    row exists.

    ``right`` must be unique per (key, right_ts) — pre-aggregate if not
    (ties would otherwise be nondeterministic).
    """
    carried = [f"{c}{suffix}" for c in value_cols] + [f"{right_ts}{suffix}"]
    carry_type = StructType(
        [
            StructField(n, right.schema[c].dataType)
            for c, n in zip(value_cols, carried[:-1])
        ]
        + [StructField(carried[-1], right.schema[right_ts].dataType)]
    )

    left_only_cols = [c for c in left.columns if c != key]
    # align the union schemas: left contributes its own ts as the sort key
    # and a NULL carry struct (skipped by last(ignorenulls)); right rows
    # carry ALL their as-of fields in one non-null struct, so the window
    # can never stitch together fields from different right rows.
    l_u = left.select(
        F.col(key),
        F.col(left_ts).alias("_rts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(carry_type).alias("_carry"),
        *left_only_cols,
    )
    r_u = right.select(
        F.col(key),
        F.col(right_ts).alias("_rts"),
        F.lit(0).alias("_side"),
        F.struct(
            *[F.col(c).alias(n) for c, n in zip(value_cols, carried[:-1])],
            F.col(right_ts).alias(carried[-1]),
        ).alias("_carry"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_only_cols
        ],
    )
    unioned = l_u.unionByName(r_u)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_rts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        key,
        "_side",
        *left_only_cols,
        F.last("_carry", ignorenulls=True).over(w).alias("_carry"),
    )
    return filled.filter(F.col("_side") == 1).select(
        key,
        *left_only_cols,
        *[F.col("_carry").getField(n).alias(n) for n in carried],
    )
