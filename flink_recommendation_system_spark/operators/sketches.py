"""Frequency-sketch operators: EXACT distributed heavy-hitters via a
Misra-Gries candidate pass + exact recount, and a mergeable count-min
sketch for point frequency estimates under a FIXED state budget.

Why not just ``groupBy(key).count().filter(...)``? At 100 TB that shuffles
every distinct key — for high-cardinality keys (URLs, user ids, n-grams)
the shuffle is the whole corpus's key space. The two-pass shape bounds the
shuffle by the CANDIDATE set instead:

  pass 1  per-partition Misra-Gries summaries of capacity k (bounded
          memory, no shuffle); any key with global count > n/(k+1)
          provably survives in at least one partition's summary, so with
          k >= 1/min_share the candidate union is a SUPERSET of every true
          heavy hitter — Misra & Gries 1982, the classic streaming
          frequent-items guarantee;
  pass 2  broadcast the candidate set, semi-join the input against it, and
          take EXACT counts of candidates only — the map-side combine now
          holds at most |candidates| keys per task, so the shuffle is
          bounded by candidates x partitions, independent of the key
          cardinality.

The result is bit-for-bit equal to the naive groupBy (the sketch only
generates candidates; counts are exact), which is what makes the operator
fully oracle-checkable — unusual for a "sketch" operator.

Reference anchor: complements the HLL distinct-count surface
(``analytics_queries.q_approx_supplier_counts``); the reference's
aggregation suite (``DataBaseConnector.java`` GROUP BY paths) has no
bounded-memory frequent-items shape at all.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    share_num: int,
    share_den: int,
    key_type: str = "bigint",
) -> DataFrame:
    """All NON-NULL keys whose exact count is >= ceil(non_null_total *
    share_num/share_den), with those exact counts. Output: (key, cnt).
    NULL keys are excluded by contract (see the inline note) — mirror the
    exclusion in any comparison query (e.g. WHERE key IS NOT NULL).

    The threshold is integer arithmetic (``(share_num*n + share_den-1) //
    share_den``) so a DuckDB oracle computes the identical cutoff — no
    float-representation drift across engines.
    """
    if share_num <= 0 or share_den <= 0:
        raise ValueError("share must be a positive fraction")
    # NULL keys are EXCLUDED up front (documented contract): pandas
    # value_counts never emits a NULL candidate and the semi-join cannot
    # match one, so silently passing NULLs through would under-report a
    # heavy NULL group — and a NULL in any Arrow batch would coerce the
    # int64 key column to float64, corrupting keys above 2^53. The
    # threshold denominator is therefore the NON-NULL row count.
    keyed = df.select(F.col(key_col).alias("key")).filter(
        F.col(key_col).isNotNull()
    )
    total = keyed.count()  # scalar loop-control action, not a data path
    min_count = (share_num * total + share_den - 1) // share_den
    # capacity: k + 1 > den/num  =>  every key with count >= min_count
    # exceeds some partition's n_p/(k+1) and survives pass 1
    capacity = share_den // share_num + 1

    def misra_gries(batches: Iterator) -> Iterator:
        import pandas as pd

        # Batch-merged Misra-Gries (mergeable-summaries form, Agarwal et
        # al. 2012): exact value_counts per Arrow batch (C-speed, no
        # per-row Python), merge into the running summary, and when the
        # summary exceeds capacity subtract the (capacity+1)-th largest
        # count from everything and drop the non-positives. Every unit of
        # subtraction hits >= capacity+1 keys at once, so the cumulative
        # undercount is <= n_p/(capacity+1) — the same survival guarantee
        # as the classic per-item decrement.
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf["key"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: v - cut for k, v in counters.items() if v > cut
                }
        yield pd.DataFrame({"key": list(counters.keys())})

    candidates = (
        keyed.mapInPandas(misra_gries, schema=f"key {key_type}").distinct()
    )
    return (
        keyed.join(F.broadcast(candidates), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(min_count))
        .select(F.col("key").alias(key_col), "cnt")
    )


# --- count-min sketch --------------------------------------------------------
#
# Cormode & Muthukrishnan 2005: a depth x width counter matrix; each key
# increments one counter per row (position = h_r(key) mod width); the point
# estimate is the MIN over rows — always >= the true count, with error
# <= n/width at confidence 1 - (1/2)^depth under pairwise-independent hashes.
#
# Why it earns a place next to the exact Misra-Gries pass: the CMS state is
# a FIXED size (depth x width counters) regardless of key cardinality or
# corpus size, and two sketches over disjoint corpora merge by cell-wise
# ADDITION — the shape for per-shard profiling (sketch each partition/day,
# merge on read) where even the heavy-hitter candidate pass is too much
# coordination. The build is one partial-aggregated groupBy on (row, cell):
# the shuffle carries at most depth*width rows PER TASK, independent of the
# input's key space.
#
# Determinism: positions use Kirsch-Mitzenmacher double hashing over ONE
# portable md5 per key — row r addresses (h1 + r*h2) mod width, with h1/h2
# the first/second 8-hex-char halves of md5(key) and h2 forced odd (the
# same construction operators.bloom uses) — so the hash cost is md5 ONCE
# per input row, not once per (row, key), and a DuckDB oracle reproduces
# every counter — and therefore every estimate — exactly.


def _with_h1_h2(keyed: DataFrame, *carry: str) -> DataFrame:
    """Project the two md5-half hashes of ``key`` BEFORE any Generate:
    expressions inside a ``posexplode`` array are not common-subexpression
    eliminated, so hashing in the explode costs 2*depth md5s per row and
    runs in the (slower) Generate node — hoisting measured the sf0.1 build
    6.0 s → 1.4 s for identical output."""
    from ._util import md5_half_hashes

    h1, h2 = md5_half_hashes(F.col("key"))
    return keyed.select(*carry, h1.alias("h1"), h2.alias("h2"))


def _cms_positions(width: int, depth: int):
    """(r, j) position pairs from hoisted (h1, h2) under KM double
    hashing: row r addresses (h1 + r*h2) mod width."""
    return F.posexplode(
        F.array(
            *[
                (F.col("h1") + F.lit(r) * F.col("h2")) % F.lit(width)
                for r in range(depth)
            ]
        )
    )


def cms_build(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Build a count-min sketch over ``df[key_col]`` (NULLs excluded, same
    contract as ``heavy_hitters_exact``). Output: SPARSE cell table
    (r, j, cnt) with at most depth*width rows — zero cells are omitted
    (``cms_estimate`` coalesces absent cells to 0)."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be positive")
    keyed = df.select(F.col(key_col).cast("string").alias("key")).filter(
        F.col(key_col).isNotNull()
    )
    return (
        _with_h1_h2(keyed)
        .select(_cms_positions(width, depth).alias("r", "j"))
        .groupBy("r", "j")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the SAME (width, depth) —
    exactly the sketch of the concatenated inputs (the linearity that makes
    per-shard sketching composable)."""
    return (
        a.unionByName(b).groupBy("r", "j").agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    width: int,
    depth: int,
) -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]``: min over the
    sketch's depth rows of the addressed counters (absent sparse cell = 0).
    Output: (key_col, est_cnt), always >= the true count.

    Plan shape: the probe side fans out to depth rows per key, then joins
    the sketch — which is at most depth*width rows, so it BROADCASTS; the
    corpus itself is never touched."""
    kx = (
        probes.filter(F.col(key_col).isNotNull())  # same NULL contract as cms_build
        .select(
            F.col(key_col).alias("_orig"),
            F.col(key_col).cast("string").alias("key"),
        )
        .distinct()
    )
    addressed = _with_h1_h2(kx, "_orig").select(
        "_orig", _cms_positions(width, depth).alias("r", "j")
    )
    return (
        addressed.join(F.broadcast(sketch), ["r", "j"], "left")
        .groupBy("_orig")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
        .select(F.col("_orig").alias(key_col), "est_cnt")
    )


# --- log-scale histogram / approximate quantiles -----------------------------
#
# The fixed-state scale path for quantiles: exact percentiles
# (`percentile(...)`) materialize per-group value multisets — state grows
# with the data. A log-scale histogram is a FIXED ~8·64-cell state
# (octave = floor(log2), 2^HIST_SUB_BITS sub-buckets per octave →
# relative bucket width 2^-HIST_SUB_BITS = 12.5%), built by one
# partial-aggregated groupBy and mergeable across shards by cell-wise
# addition (like the count-min sketch). The returned quantile is the
# LOWER BOUND of the first bucket reaching rank ceil(q·n) — a
# deterministic integer, so unlike t-digest/KLL the whole estimator is
# reproducible cross-engine and fully value-oracle-checkable.
#
# All bucket arithmetic is integer-exact in both engines: values are
# fixed-point scaled with the floor(x·scale + 0.5) grid construction,
# floor(log2(n)) = length(bin(n)) - 1 (string length of the binary
# rendering — parity pinned in tests), and bounds come from bit shifts.

HIST_SUB_BITS = 3


def _hist_b(n):
    return (F.length(F.bin(n)) - 1).cast("int")


def log_histogram(
    df: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """Log-scale histogram of ``floor(value*scale + 0.5)`` (POSITIVE
    values only — scaled n >= 1; zero/negative rows are excluded by
    contract, count them separately if they matter). Output: sparse
    (b, p, cnt) — octave b, sub-bucket prefix p."""
    n = F.floor(F.col(value_col) * F.lit(scale) + F.lit(0.5)).cast("long")
    rows = df.select(n.alias("n")).filter(F.col("n") >= 1)
    b = _hist_b(F.col("n"))
    sub = HIST_SUB_BITS
    p = F.when(
        b >= sub,
        F.expr(f"shiftright(n, CAST(length(bin(n)) AS INT) - {sub + 1})"),
    ).otherwise(F.col("n"))
    return (
        rows.select(b.alias("b"), p.alias("p"))
        .groupBy("b", "p")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_log_histograms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — the histogram of the concatenated inputs."""
    return a.unionByName(b).groupBy("b", "p").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame, quantiles: list[tuple[int, int]]
) -> DataFrame:
    """Quantile estimates from a ``log_histogram``: for q = num/den the
    scaled-integer LOWER BOUND of the first bucket whose cumulative count
    reaches rank ceil(q·n) (ranks in exact integer arithmetic — no float
    thresholds to drift cross-engine). True quantile lies in
    [est, est·(1 + 2^-HIST_SUB_BITS)). Output: (q_num, q_den, est).

    The cumulative window is a single-partition sort over the ≤ ~8·64-row
    histogram — metadata-scale, not a data path.

    An EMPTY histogram yields one row per requested quantile with
    ``est = NULL`` (left join below) — callers can tell 'no data' apart
    from a dropped quantile."""
    from pyspark.sql import Window

    sub = HIST_SUB_BITS
    lo = F.when(
        F.col("b") >= sub,
        F.expr(f"shiftleft(p, b - {sub})"),
    ).otherwise(F.col("p"))
    w = (
        Window.orderBy("b", "p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select("b", "p", "cnt", F.sum("cnt").over(w).alias("cum"))
    total = hist.agg(F.sum("cnt").alias("total"))
    spark = hist.sparkSession
    qs = spark.createDataFrame(quantiles, "q_num INT, q_den INT")
    # rank threshold in integer ceil: (num*total + den - 1) DIV den
    return (
        qs.crossJoin(F.broadcast(total))
        .join(
            F.broadcast(cum),
            F.col("cum")
            >= F.expr("(q_num * total + q_den - 1) DIV q_den"),
            "left",
        )
        .groupBy("q_num", "q_den")
        .agg(F.min(lo).alias("est"))
    )


# --- portable HyperLogLog ----------------------------------------------------
#
# Flajolet et al. 2007. Spark's built-in approx_count_distinct is HLL++
# with an engine-private hash — a DuckDB oracle cannot reproduce its
# estimates (that query stays rows-only with a tolerance test). This is
# the PORTABLE twin: registers from the md5-derived 32-bit hash (bucket =
# low b bits, rho = leading-zero rank of the remaining 32-b bits via the
# cross-engine length(bin(w)) identity), so both engines materialize the
# IDENTICAL register table, and the estimator's register sum
# Σ 2^-M[j] is a sum of dyadic rationals (denominators ≤ 2^(33-b)) that
# double arithmetic represents EXACTLY in any order — the estimate is
# deterministic and value-oracle-checkable. Registers merge by per-bucket
# MAX (the HLL union), like every other sketch here.

HLL_B = 8  # 2^8 = 256 registers; standard error 1.04/sqrt(m) ~ 6.5%


def hll_registers(df: DataFrame, key_col: str, b: int = HLL_B) -> DataFrame:
    """Sparse HLL register table (bucket, rho) over non-NULL keys: one
    partial-agg groupBy bounded by 2^b cells — fixed state, any key
    cardinality. rho = 1 + leading zeros of the high 32-b hash bits
    (w == 0 → 33-b, the max rank)."""
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    from .dedup import portable_hash32

    m = 1 << b
    keyed = df.select(F.col(key_col).cast("string").alias("key")).filter(
        F.col(key_col).isNotNull()
    )
    h = portable_hash32(F.col("key"))
    bucket = (h % F.lit(m)).cast("int")
    # exact high-bits extraction: integer shift, not float division
    w = F.shiftrightunsigned(h, b)
    # rho = leading zeros of the (32-b)-bit window + 1
    #     = (32-b) - bit_length(w) + 1, with the w == 0 maximum 33-b
    rho = F.when(w == 0, F.lit(33 - b)).otherwise(
        F.lit(33 - b) - F.length(F.bin(w))
    )
    return (
        keyed.select(bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """HLL union: per-bucket max of the registers."""
    return a.unionByName(b).groupBy("bucket").agg(F.max("rho").alias("rho"))



def _hll_guarded_est(b: int):
    """The guarded estimator over an agg row with columns (s, nonzero,
    _maxb, _dups): one definition for the global and per-group forms.
    Raises (lazily, inside the estimator job) on registers built with a
    larger b (bucket >= m) or on a table with duplicate bucket rows (a
    union instead of ``hll_merge`` — zeros would go negative / s inflate
    silently)."""
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    zeros = F.lit(m) - F.col("nonzero")
    raw = F.lit(alpha * m * m) / (F.col("s") + zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    bad = (F.coalesce(F.col("_maxb"), F.lit(-1)) >= m) | (F.col("_dups") > 0)
    return F.when(
        bad,
        F.expr(
            f"assert_true(false, 'invalid HLL register table for b={b}: "
            "either built with a larger b (bucket >= m) or it contains "
            "duplicate bucket rows — combine sketches with hll_merge, "
            "not union')"
        ).cast("double"),
    ).otherwise(F.round(est, 4))


def _hll_agg_cols():
    return [
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("rho"))), F.lit(0.0)).alias("s"),
        F.count(F.lit(1)).alias("nonzero"),
        F.max("bucket").alias("_maxb"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("bucket"))).alias("_dups"),
    ]


def hll_estimate(registers: DataFrame, b: int = HLL_B) -> DataFrame:
    """Cardinality estimate from a register table: the classic HLL
    estimator with the small-range linear-counting correction. Output:
    one row (est DOUBLE, rounded to 4 dp). Every arithmetic step is
    engine-portable: the register sum is exact in doubles (dyadic
    rationals), alpha_m is the same closed formula, and ln() only enters
    on the linear-counting branch over a small integer ratio. Invalid
    register tables (larger-b build, duplicate buckets from a raw union)
    fail loudly inside the same single-row job — see ``_hll_guarded_est``."""
    agg = registers.agg(*_hll_agg_cols())
    return agg.select(_hll_guarded_est(b).alias("est"))


def hll_registers_by(
    df: DataFrame, group_col: str, key_col: str, b: int = HLL_B
) -> DataFrame:
    """Per-group HLL registers (group, bucket, rho) — the portable twin of
    ``approx_count_distinct(...).groupBy(group)``: state is <= 2^b cells
    PER GROUP, one partial-agg groupBy on (group, bucket)."""
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    from .dedup import portable_hash32

    m = 1 << b
    keyed = df.select(
        F.col(group_col).alias("grp"),
        F.col(key_col).cast("string").alias("key"),
    ).filter(F.col(key_col).isNotNull())
    h = portable_hash32(F.col("key"))
    w = F.shiftrightunsigned(h, b)
    rho = F.when(w == 0, F.lit(33 - b)).otherwise(
        F.lit(33 - b) - F.length(F.bin(w))
    )
    return (
        keyed.select(
            "grp",
            (h % F.lit(m)).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
        .select(F.col("grp").alias(group_col), "bucket", "rho")
    )


def hll_estimate_by(
    registers: DataFrame, group_col: str, b: int = HLL_B
) -> DataFrame:
    """Per-group cardinality estimates from ``hll_registers_by`` output:
    (group, est) — the same guarded estimator as the global form
    (``_hll_guarded_est``), applied per group."""
    agg = registers.groupBy(group_col).agg(*_hll_agg_cols())
    return agg.select(group_col, _hll_guarded_est(b).alias("est"))
