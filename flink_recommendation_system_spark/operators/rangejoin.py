"""Range join — the second time-series join Spark lacks natively
(alongside the as-of join): pairs of rows whose timestamps fall within a
bounded difference of each other.

A naive formulation is a theta-join (`|a.ts - b.ts| <= delta`) which Spark
executes as a nested-loop — quadratic. The distributed shape used here is
**bucketing**: assign each row to a coarse time bucket of width ``delta``,
explode each left row into its bucket and the two adjacent ones, equi-join
on (key, bucket) — Catalyst plans a hash join — then apply the exact bound
as a post-filter. Candidates are only the ±1-bucket neighborhood, so work
scales with actual temporal density instead of the cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, delta: int) -> Column:
    # exact integer bucketing (float division could truncate wrong at
    # exact multiples of delta)
    return ((ts - ts % delta) / delta).cast("long")


def bounded_diff_self_join(
    rows: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    delta: int,
) -> DataFrame:
    """All pairs (a, b) with the same ``key``, ``a.id < b.id``, and
    ``|a.ts - b.ts| <= delta``. Output: (key, a_id, b_id, a_ts, b_ts).
    """
    a_bucket = _bucket(F.col("a_ts"), delta)
    a = rows.select(
        F.col(key),
        F.col(id_col).alias("a_id"),
        F.col(ts_col).alias("a_ts"),
    ).withColumn(
        "bucket",
        F.explode(F.array(a_bucket - 1, a_bucket, a_bucket + 1)),
    )
    b = rows.select(
        F.col(key),
        F.col(id_col).alias("b_id"),
        F.col(ts_col).alias("b_ts"),
        _bucket(F.col(ts_col), delta).alias("bucket"),
    )
    return (
        a.join(b, [key, "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.abs(F.col("a_ts") - F.col("b_ts")) <= delta)
        .select(key, "a_id", "b_id", "a_ts", "b_ts")
        .distinct()
    )


def _cell(c: Column, grid: int) -> Column:
    # exact floor division on LONGs (valid for negative values too, unlike
    # `%`). Integer `div`, NOT `/`: the Column `/` operator is IEEE double
    # division, which rounds the numerator above 2^53 — with
    # epoch-nanosecond intervals that can shift a cell id by one and
    # silently drop overlapping pairs at the emit-once check.
    return F.call_function("div", c - F.pmod(c, F.lit(grid)), F.lit(grid))


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    grid: int,
    start_col: str = "start",
    end_col: str = "end",
    keys: list[str] | None = None,
    a_prefix: str = "a_",
    b_prefix: str = "b_",
) -> DataFrame:
    """Pairs of rows whose CLOSED intervals [start_col, end_col] overlap
    (``a.start <= b.end AND b.start <= a.end``), optionally restricted to
    equal ``keys``. Output: ``keys`` + every other column of each side
    under ``a_prefix``/``b_prefix``.

    The third time-series join Spark lacks natively (with as-of and
    bounded-diff): the naive formulation is a pure theta-join → a
    nested-loop cross product. Distributed shape: each interval explodes
    to the grid cells it covers (ceil(len/grid)+1 rows — pick ``grid``
    near the typical interval length), candidates come from a (keys, cell)
    hash equi-join, and each overlapping pair is emitted EXACTLY ONCE with
    no distinct: it is kept only at the cell containing
    ``max(a.start, b.start)`` — for an overlapping pair both intervals
    cover that cell (max start <= min end), and it is unique.

    Degenerate inputs (an interval spanning the whole timeline) explode to
    timeline/grid cells — the same hot-key hazard as any blocking scheme;
    cap or split such intervals upstream like the pair-generating dedup
    operators cap theirs.

    Inverted intervals (``end < start``) denote the EMPTY interval and are
    dropped from both sides before blocking: a closed interval with no
    points overlaps nothing, and without the filter ``sequence()``'s
    automatic descending step would still explode such rows to cells and
    could emit pairs for a mathematically empty interval.
    """
    if grid < 1:
        raise ValueError("grid must be a positive integer")
    if (a is b) and a_prefix == b_prefix:
        raise ValueError("self-join requires distinct prefixes")
    keys = list(keys or [])

    def prep(df: DataFrame, prefix: str):
        others = [c for c in df.columns if c not in keys]
        out = df.select(
            *[F.col(k) for k in keys],
            *[F.col(c).alias(f"{prefix}{c}") for c in others],
        )
        s = F.col(f"{prefix}{start_col}")
        e = F.col(f"{prefix}{end_col}")
        cells = out.filter(s <= e).withColumn(
            "_cell", F.explode(F.sequence(_cell(s, grid), _cell(e, grid)))
        )
        return cells, s, e

    a_cells, a_s, a_e = prep(a, a_prefix)
    b_cells, b_s, b_e = prep(b, b_prefix)
    joined = a_cells.join(b_cells, keys + ["_cell"])
    overlap = (a_s <= b_e) & (b_s <= a_e)
    emit_once = F.col("_cell") == _cell(F.greatest(a_s, b_s), grid)
    return joined.filter(overlap & emit_once).drop("_cell")
