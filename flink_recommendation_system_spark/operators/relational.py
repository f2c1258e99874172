"""Relational operator library (SURVEY.md §2.2-2.6, §2.9, §2.11).

Named, composable wrappers over the DataFrame API for every relational
operator the reference implements — filters, projections, string parsing,
aggregations with HAVING, the full join family (the reference only has
inner + anti; we expose semi/outer too since any user of a query engine
needs them), set ops, global top-k, and deterministic sampling/splits.

All of these compile to pure Catalyst plans: predicate pushdown, column
pruning, partial aggregation, and join-strategy selection (broadcast vs
sort-merge, AQE-switched) come for free. Nothing here drops to Python
execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --- projections / filters / scalar expressions (§2.2, §2.9) ---------------


def numeric_filter(df: DataFrame, column: str, op: str, value: float) -> DataFrame:
    """Comparison filters F1-F4 (Recommendations.java:153,174;
    ProductReviewAggregation.java:48; spliter.py:22)."""
    c = F.col(column)
    ops = {"<": c < value, "<=": c <= value, ">": c > value, ">=": c >= value, "=": c == value}
    return df.filter(ops[op])


def to_edges(reviews: DataFrame) -> DataFrame:
    """P1 structural rename (Recommendations.java:29-33): review tuple →
    weighted bipartite edge (src=user, dst=product, weight=rating)."""
    return reviews.select(
        F.col("user_id").alias("src"),
        F.col("product_id").alias("dst"),
        F.col("rating").alias("weight"),
    )


def to_kv_strings(ratings: DataFrame) -> DataFrame:
    """Encode (user_id, product_id, rating) as the reference's Redis member
    string `"productId:rating"` (RealTimeRecommendations.java:81,86)."""
    return ratings.select(
        "user_id",
        F.concat_ws(
            ":", F.col("product_id").cast("string"), F.col("rating").cast("string")
        ).alias("member"),
    )


def parse_kv_strings(members: DataFrame) -> DataFrame:
    """P4 string parse (Recommendations.java:142-149;
    ProductReviewAggregation.java:72-78): `"productId:rating"` →
    (product_id LONG, rating DOUBLE) via split + cast."""
    parts = F.split(F.col("member"), ":")
    return members.select(
        "user_id",
        F.element_at(parts, 1).cast("long").alias("product_id"),
        F.element_at(parts, 2).cast("double").alias("rating"),
    )


# --- aggregations (§2.3) ----------------------------------------------------


def group_avg_having(
    df: DataFrame, key: str, value: str, min_count: int
) -> DataFrame:
    """A1 (ProductReviewAggregation.java:37-51): AVG per key with a HAVING
    count filter; Catalyst plans partial+final aggregation automatically."""
    return (
        df.groupBy(key)
        .agg(
            F.round(F.avg(value), 6).alias("avg_value"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") > min_count)
    )


def set_union_agg(df: DataFrame, key: str, value: str) -> DataFrame:
    """A5 (Recommendations.java:68-77): repeated SADD ≡ collect_set. The
    array is sorted so downstream hashing is deterministic."""
    return df.groupBy(key).agg(
        F.array_sort(F.collect_set(value)).alias(f"{value}_set")
    )


# --- joins (§2.4) -----------------------------------------------------------


def equi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """J1/J4 inner equi-join; Catalyst/AQE pick broadcast vs shuffle."""
    return left.join(right, on)


def broadcast_join(fact: DataFrame, dim: DataFrame, on: list[str]) -> DataFrame:
    """Dimension-table join with an explicit broadcast hint — at 100 TB the
    fact side must never shuffle for a small-dim join."""
    return fact.join(F.broadcast(dim), on)


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """LEFT SEMI — rows of left with a match in right (EXISTS)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """J3 LEFT ANTI (Recommendations.java:71-75): rows of left without a
    match in right (NOT EXISTS)."""
    return left.join(right, on, "left_anti")


def left_outer_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """LEFT OUTER — the shape of the stream-side lookup with fallback (J5):
    unmatched rows survive with nulls for COALESCE downstream."""
    return left.join(right, on, "left")


# --- sorts / limits / top-k (§2.5) -----------------------------------------


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """O1 global top-k (ProductReviewAggregation.java:51 intended
    semantics): orderBy+limit compiles to TakeOrderedAndProject — per-
    partition heap of k rows + single merge, no total sort. Callers must
    pass a total order (tie-break) for deterministic results."""
    return df.orderBy(*order).limit(k)


def capped_sorted_array(col: Column, cap: int) -> Column:
    """F5+O2 (RealTimeRecommendations.java:106-110): drop nulls, cap at
    ``cap`` elements. Reference order is Java-Set arbitrary; we sort first
    for deterministic semantics (SURVEY.md §7)."""
    return F.slice(
        F.array_sort(F.filter(col, lambda x: x.isNotNull())), 1, cap
    )


# --- set operations (§2.6) --------------------------------------------------


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """U1-style set union (Gelly edge-set semantics)."""
    return a.union(b).distinct()


# --- sampling / dataset utilities (§2.11) ----------------------------------

_KNUTH = 2654435761  # Knuth multiplicative-hash constant (public domain)


def deterministic_split(
    df: DataFrame, key: str, frac_permille: int
) -> tuple[DataFrame, DataFrame]:
    """X1 (spliter.py:24-25) re-expressed reproducibly: the reference uses
    pandas ``sample(frac, random_state=200)`` + complement; engine-portable
    equivalent is a multiplicative-hash bucket on the key — exact integer
    arithmetic, so any engine (and the DuckDB oracle) derives the same
    split. Returns (selected, complement).
    """
    bucket = (F.col(key) * F.lit(_KNUTH)) % F.lit(1000)
    return (
        df.filter(bucket < frac_permille),
        df.filter(bucket >= frac_permille),
    )


def random_split(
    df: DataFrame, fractions: list[float], seed: int = 200
) -> list[DataFrame]:
    """X1 literal form: seeded random split (pandas `random_state=200`,
    spliter.py:24). Seed-stable within Spark but not across engines — use
    ``deterministic_split`` when cross-engine reproducibility matters."""
    return df.randomSplit(fractions, seed=seed)


def global_positions(
    df: DataFrame, order_cols: list[Column], position_col: str = "position"
) -> DataFrame:
    """Contiguous global rank (1..N) under a TOTAL ordering — the
    distributed ``zipWithIndex`` shape: range-repartition on the sort key,
    sort within partitions, take per-partition row numbers, and add each
    partition's starting offset (a #partitions-row metadata collect, the
    same tiny driver round-trip ``zipWithIndex`` itself performs). The
    naive ``row_number() OVER (ORDER BY ...)`` funnels every row through
    ONE task (Exchange SinglePartition); this shape keeps the sort
    distributed (Exchange rangepartitioning) and scales to any N.

    ``order_cols`` must be a total order (include a unique tie-break):
    ties straddling a range boundary would otherwise make positions
    depend on the sampled partition bounds.

    The result is deterministic even though range boundaries are sampled:
    under a total order, the global rank of a row is boundary-invariant.
    """
    positions, _total = _global_positions_with_total(
        df, order_cols, position_col
    )
    return positions


def _global_positions_with_total(
    df: DataFrame, order_cols: list[Column], position_col: str
) -> tuple[DataFrame, int]:
    """``global_positions`` plus the total row count — N is the sum of
    the per-partition counts the offset pass already collects, so callers
    that need it (``global_ntile``) get it for free instead of paying a
    second full aggregation over the input."""
    ranged = df.repartitionByRange(*order_cols).sortWithinPartitions(
        *order_cols
    )
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    counts = sorted(
        (r["_pid"], r["n"])
        for r in with_pid.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )  # metadata: one row per partition, not a data path
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    spark = df.sparkSession
    offset_df = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], ["_pid", "_offset"])
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    positions = (
        with_pid.withColumn("_local", F.row_number().over(w))
        .join(offset_df, "_pid")
        .withColumn(
            position_col,
            (F.col("_offset") + F.col("_local")).cast("bigint"),
        )
        .drop("_pid", "_local", "_offset")
    )
    return positions, acc


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list[Column],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact SQL ``ntile(n) OVER (ORDER BY ...)`` WITHOUT the
    single-partition global sort that window form forces (every row
    through ONE task). Rides ``global_positions`` for the contiguous
    1..N rank, then recovers ntile's exact bucket law arithmetically:
    with q = N DIV n and rem = N % n, the first rem buckets hold q+1
    rows and the rest hold q, so

        bucket(r) = (r-1) DIV (q+1) + 1              if r <= rem*(q+1)
                    rem + (r-1-rem*(q+1)) DIV q + 1  otherwise

    Integer DIV throughout — no double rounding at any N. ``order_cols``
    must be a total order (same contract as ``global_positions``). The
    only driver round-trip is the #partitions-row offset collect already
    inside the rank pass — N is the sum of those per-partition counts,
    so the bucket constants (q, rem, cut) fold into the plan as literals
    with no second scan and no broadcast join. The position column is
    dropped; callers needing both rank and bucket compose
    ``global_positions`` with the same arithmetic."""
    positions, n = _global_positions_with_total(
        df, order_cols, position_col="_pos"
    )
    q, rem = n // n_buckets, n % n_buckets
    cut = rem * (q + 1)
    return (
        positions.withColumn(
            bucket_col,
            F.when(
                F.col("_pos") <= F.lit(cut),
                F.expr(f"(_pos - 1) DIV {q + 1} + 1"),
            )
            .otherwise(
                # q = 0 (N < n_buckets) never reaches this branch
                # (cut = N); max() keeps the literal divisor nonzero
                F.expr(f"{rem} + (_pos - 1 - {cut}) DIV {max(q, 1)} + 1")
            )
            .cast("long"),
        )
        .drop("_pos")
    )


def uniform_sample_k(
    df: DataFrame, k: int, id_col: str, salt: str = "sample"
) -> DataFrame:
    """EXACTLY-k uniform sample, deterministic and partition-invariant:
    rank every row by the portable md5-derived hash of (salt, id) and keep
    the k smallest (ties broken by id). Unlike ``df.sample(fraction)``
    (binomial row count, partitioning-dependent) this returns the same k
    rows for the same (input, salt) on ANY cluster layout — the property a
    training-data pipeline needs for reproducible eval carve-outs — and
    unlike a fraction-based filter it hits an exact size target.

    Plan shape: orderBy+limit compiles to ``TakeOrderedAndProject`` —
    per-partition top-k heaps and a single k-row merge, no global sort. A
    DuckDB oracle is the same ORDER BY hash LIMIT k.
    """
    if k < 1:
        raise ValueError("k must be positive")
    from .dedup import portable_hash64

    h = portable_hash64(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )
    # NULLS LAST on both keys: Spark's bare asc() is NULLS FIRST while
    # DuckDB defaults to NULLS LAST — a NULL id (hash is then NULL too)
    # would be deterministically included here and excluded by the oracle
    return df.orderBy(h.asc_nulls_last(), F.col(id_col).asc_nulls_last()).limit(k)


# 52·ln(2) as an exact double literal (the same 17-sig-digit constant is
# inlined in the DuckDB oracle, so neither engine evaluates ln(2) itself)
_LN2_52 = 36.04365338911715
# 2^38 quantization grid (the pagerank/bm25 construction): both engines'
# libm ln() agree to <1 ulp on identical integer-exact arguments, and the
# grid absorbs that before the rank comparison
_KEY_GRID = 274877906944.0


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    salt: str = "wsample",
) -> DataFrame:
    """EXACTLY-k weighted sample without replacement (PPS — probability
    proportional to size), deterministic and partition-invariant: the
    Efraimidis-Spirakis exponential-key scheme with hash-derived
    randomness. Each row gets E_i = -ln(u_i) / w_i where u_i is the
    portable md5 hash of (salt, id) — E_i ~ Exp(rate w_i), so the k
    smallest keys are a PPS-without-replacement draw — and the same
    (input, salt) returns the same rows on ANY cluster layout, the
    reproducibility contract ``uniform_sample_k`` gives the uniform case.

    Cross-engine exactness: u_i is the hash's top 52 bits + 1 (an
    integer-exact double, so both engines take ln() of bit-identical
    arguments); -ln(u) unfolds to 52·ln2 - ln(u_int) with 52·ln2 inlined
    as one shared literal; the final key is quantized to the 2^-38 grid
    before ranking (ties broken by id). Rows with NULL or non-positive
    weight are excluded (a zero weight has infinite key; a negative one
    is undefined).

    Plan shape: orderBy+limit compiles to ``TakeOrderedAndProject`` —
    per-partition top-k heaps, single k-row merge, no global sort.
    """
    if k < 1:
        raise ValueError("k must be positive")
    from .dedup import portable_hash64

    h = portable_hash64(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )
    u_int = (F.shiftrightunsigned(h, 12) + F.lit(1)).cast("double")
    key = (F.lit(_LN2_52) - F.log(u_int)) / F.col(weight_col).cast("double")
    key_q = F.floor(key * _KEY_GRID + F.lit(0.5)) / F.lit(_KEY_GRID)
    return (
        df.filter(F.col(weight_col) > 0)
        .orderBy(key_q.asc_nulls_last(), F.col(id_col).asc_nulls_last())
        .limit(k)
    )
