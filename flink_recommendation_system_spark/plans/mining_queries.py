"""Data-mining / warehouse-maintenance suite: market-basket association
rules, 2-D skyline (Pareto frontier), Z-order layout clustering with
data-skipping stats, lag-k autocorrelation and CUSUM changepoint over the
event stream, and a CDC snapshot diff — six shapes a production analytics
engine is asked for that the earlier suites don't cover.

Everything follows the repo-wide exactness discipline: money on the
integer-cents grid, correlations from exact BIGINT sufficient statistics
with ONE final IEEE division/sqrt, every top-k and window with a total-order
tie-break — so the DuckDB value oracles match bit-for-bit at any SF.

Entries: ``name → (spark_fn, oracle_sql | None)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators._util import VALID_TS_SQL
from ..sources.tables import load_table, load_table_clean
from .streaming_queries import SESSION_GAP_SEC

QUERIES: dict = {}

_NS_PER_HOUR = 3_600_000_000_000
_NS_PER_DAY = 86_400_000_000_000


# --- market-basket association rules -----------------------------------------


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets at the brand level: for every
    unordered brand pair appearing in ≥5 common orders, the pair count and
    the lift  cnt(ab)·N / (cnt(a)·cnt(b))  — the classic market-basket
    output (Agrawal et al., VLDB'94) restricted to 2-itemsets.

    Exactness: all counts are BIGINT; lift is ONE IEEE division of two
    exact integer products (cnt_ab·N ≲ 1e9, cnt_a·cnt_b ≲ 1e9 even at
    sf100 brand cardinality stays 25), rounded to 6 dp.

    Scale design (100 TB): baskets are distinct (order, brand) — a
    partial-aggregated groupBy; the pair expansion self-joins on the order
    key, so it shuffles once on l_orderkey and the per-order fan-out is
    bounded by the basket size squared (~7² here); brand marginals are a
    25-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    # count_distinct skips NULL keys like SQL COUNT(DISTINCT ...) (round
    # 15: a distinct().count() here counted the NULL-orderkey group as an
    # order and shifted every lift by one denominator unit)
    n_orders = baskets.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    marg = baskets.groupBy("p_brand").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 5)
    )
    ma = marg.select(
        F.col("p_brand").alias("brand_a"), F.col("cnt").alias("cnt_a")
    )
    mb = marg.select(
        F.col("p_brand").alias("brand_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            F.round(
                (F.col("pair_cnt") * F.col("n_orders")).cast("double")
                / (F.col("cnt_a") * F.col("cnt_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


BASKET_LIFT_SQL = """
WITH baskets AS (
    SELECT DISTINCT l_orderkey, p_brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
marg AS (SELECT p_brand, count(*) AS cnt FROM baskets GROUP BY p_brand),
pairs AS (
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS pair_cnt
    FROM baskets a
    JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY 1, 2
    HAVING count(*) >= 5
)
SELECT brand_a, brand_b, pair_cnt,
       ma.cnt AS cnt_a, mb.cnt AS cnt_b,
       round(CAST(pair_cnt * n_orders AS DOUBLE)
             / CAST(ma.cnt * mb.cnt AS DOUBLE), 6) AS lift
FROM pairs
JOIN marg ma ON ma.p_brand = brand_a
JOIN marg mb ON mb.p_brand = brand_b
CROSS JOIN n
"""

QUERIES["basket_lift"] = (q_basket_lift, BASKET_LIFT_SQL)


# --- 2-D skyline (Pareto frontier) --------------------------------------------


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query (Börzsönyi et al., ICDE'01): parts not dominated on
    (retail price MINIMIZED, size MAXIMIZED). q dominates p iff
    (q.price < p.price AND q.size >= p.size) OR
    (q.price <= p.price AND q.size > p.size).

    Instead of the O(n²) dominance self-join, the 2-D skyline falls out of
    ONE sort: order by price (integer cents), track the running max size —
    p is dominated iff  max size over strictly-cheaper rows >= p.size,
    or max size over cheaper-or-equal rows (incl. p itself) > p.size.
    Both window frames are RANGE frames over the exact BIGINT cents key,
    so price ties group correctly in both engines.

    Scale design (100 TB): a global ORDER BY price is a range-partitioned
    sort (what the skyline's sort-filter-skyline algorithm distributes to:
    per-range local skyline + a cheap prefix-max merge of the range
    boundaries); no shuffle beyond the one sort, no pairwise join."""
    # skyline dimensions must be present and physical (round 15): a NULL
    # size can neither dominate nor be dominated coherently, and negative
    # sizes are metadata corruption, not geometry — excluded identically
    # in both engines (mirrored in the oracle's WHERE)
    part = load_table_clean(spark, sf_dir, "part").filter(
        F.col("p_partkey").isNotNull()
        & F.col("p_size").isNotNull()
        & (F.col("p_size") >= 0)
    )
    p = part.withColumn(
        "price_e2", F.round(F.col("p_retailprice") * 100).cast("long")
    )
    w_strict = Window.orderBy("price_e2").rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_leq = Window.orderBy("price_e2").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = p.select(
        "p_partkey",
        "p_name",
        "p_size",
        "price_e2",
        F.max("p_size").over(w_strict).alias("best_cheaper"),
        F.max("p_size").over(w_leq).alias("best_leq"),
    )
    return (
        flagged.filter(
            ~(
                (
                    F.col("best_cheaper").isNotNull()
                    & (F.col("best_cheaper") >= F.col("p_size"))
                )
                | (F.col("best_leq") > F.col("p_size"))
            )
        )
        .select(
            "p_partkey",
            "p_name",
            "p_size",
            (F.col("price_e2").cast("double") / F.lit(100.0)).alias(
                "p_retailprice"
            ),
        )
    )


PARETO_FRONTIER_SQL = """
WITH p AS (
    SELECT p_partkey, p_name, p_size,
           CAST(round(p_retailprice * 100) AS BIGINT) AS price_e2
    FROM part
    WHERE p_partkey IS NOT NULL AND p_size IS NOT NULL AND p_size >= 0
),
flagged AS (
    SELECT p_partkey, p_name, p_size, price_e2,
           max(p_size) OVER (ORDER BY price_e2
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_cheaper,
           max(p_size) OVER (ORDER BY price_e2
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS best_leq
    FROM p
)
SELECT p_partkey, p_name, p_size,
       CAST(price_e2 AS DOUBLE) / 100.0 AS p_retailprice
FROM flagged
WHERE NOT ((best_cheaper IS NOT NULL AND best_cheaper >= p_size)
           OR best_leq > p_size)
"""

QUERIES["pareto_frontier"] = (q_pareto_frontier, PARETO_FRONTIER_SQL)


# --- Z-order layout clustering ------------------------------------------------


def _morton_expr(x, y):
    """Interleave the low 6 bits of x (even positions) and y (odd): the
    Morton / Z-order curve key. Pure shift/mask integer arithmetic so both
    engines compute the identical BIGINT."""
    out = F.lit(0).cast("long")
    for i in range(6):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def _morton_sql(x: str, y: str) -> str:
    terms = []
    for i in range(6):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) file layout over part(p_size, price-rank) —
    what `OPTIMIZE ZORDER BY` does in lakehouse table formats: interleave
    the bit representations of the clustering columns, sort by the Morton
    key, cut into fixed-size files, and report per-file min/max stats for
    BOTH dimensions. Tight per-file ranges on both columns = effective
    data skipping for predicates on EITHER column, which a single-column
    sort cannot give.

    The price dimension is quantized to 64 rank buckets via ntile over the
    exact integer-cents price (tie-broken by p_partkey → total order, so
    ntile is deterministic in both engines). Output: file id, row count,
    and min/max of each dimension — the footer stats a scan planner would
    prune on.

    Scale design (100 TB): the Morton sort is a range-partitioned global
    sort (one shuffle); file cuts by row_number are what a writer's
    maxRecordsPerFile does; the ntile quantization would come from an
    approx-quantile sketch of the price column instead of an exact rank at
    real scale (same bucket semantics)."""
    # z-order coordinates are defined on present, non-negative values
    # (round 15: interleaving two's-complement bits of a NEGATIVE size
    # and ranking NULL keys put the engines' bit patterns and NULL
    # orders at odds); rows outside the coordinate domain are excluded
    # identically in both engines
    part = load_table_clean(spark, sf_dir, "part").filter(
        F.col("p_partkey").isNotNull()
        & F.col("p_size").isNotNull()
        & (F.col("p_size") >= 0)
    )
    p = part.withColumn(
        "price_e2", F.round(F.col("p_retailprice") * 100).cast("long")
    )
    w_rank = Window.orderBy("price_e2", "p_partkey")
    p = p.withColumn(
        "price_bucket", (F.ntile(64).over(w_rank) - 1).cast("long")
    )
    p = p.withColumn(
        "morton",
        _morton_expr(F.col("p_size").cast("long"), F.col("price_bucket")),
    )
    w_file = Window.orderBy("morton", "p_partkey")
    p = p.withColumn(
        "file_id",
        ((F.row_number().over(w_file) - F.lit(1)) / F.lit(100))
        .cast("long"),
    )
    p = p.withColumn("sz", F.col("p_size").cast("long"))
    return (
        p.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("sz").alias("min_size"),
            F.max("sz").alias("max_size"),
            F.min("price_bucket").alias("min_price_bucket"),
            F.max("price_bucket").alias("max_price_bucket"),
        )
    )


ZORDER_LAYOUT_SQL = f"""
WITH p AS (
    SELECT p_partkey, CAST(p_size AS BIGINT) AS sz,
           CAST(round(p_retailprice * 100) AS BIGINT) AS price_e2
    FROM part
    WHERE p_partkey IS NOT NULL AND p_size IS NOT NULL AND p_size >= 0
),
ranked AS (
    SELECT p_partkey, sz,
           CAST(ntile(64) OVER (ORDER BY price_e2, p_partkey) - 1 AS BIGINT)
               AS price_bucket
    FROM p
),
keyed AS (
    SELECT p_partkey, sz, price_bucket,
           ({_morton_sql('sz', 'price_bucket')}) AS morton
    FROM ranked
),
filed AS (
    SELECT sz, price_bucket,
           CAST((row_number() OVER (ORDER BY morton, p_partkey) - 1) // 100
                AS BIGINT) AS file_id
    FROM keyed
)
SELECT file_id, count(*) AS n_rows,
       min(sz) AS min_size, max(sz) AS max_size,
       min(price_bucket) AS min_price_bucket,
       max(price_bucket) AS max_price_bucket
FROM filed
GROUP BY file_id
"""

QUERIES["zorder_layout"] = (q_zorder_layout, ZORDER_LAYOUT_SQL)


# --- lag-k autocorrelation of the event rate ----------------------------------

_ACF_LAGS = [1, 2, 3, 6, 12, 24]


def q_event_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of the hourly event count series (k ∈ {1, 2,
    3, 6, 12, 24}) — the seasonality detector (a strong lag-24 peak =
    daily cycle). The series is the DENSE hourly spine from the first to
    the last observed hour with missing buckets as zero (autocorrelation
    requires regular spacing), then Pearson r over the (x_t, x_{t+k})
    pairs from exact BIGINT sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    Σy²):  r = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²) · (nΣy² − (Σy)²)).

    Exactness: every moment is an exact BIGINT (hourly counts ≤ ~1e4 even
    at sf100, squares·720 hours ≪ 2^63); the variance terms are exact
    integers below 2^53 so their double casts are exact; one IEEE multiply
    + sqrt + divide, rounded to 6 dp — bit-identical cross-engine.

    Scale design (100 TB): the raw scan partial-aggregates to (hour,
    count) — at most one row per hour regardless of input size; the dense
    spine, lag join, and moments all run on that tiny series. The spine's
    size is bounded by the explicit valid-time domain (operators._util.
    valid_ts — round-15 adversarial finding: one skewed clock otherwise
    inflates the spine by millions of buckets)."""
    from ..operators._util import valid_ts

    ev = load_table(spark, sf_dir, "events").filter(valid_ts("ts"))
    hourly = (
        ev.select(F.expr(f"CAST(ts DIV {_NS_PER_HOUR} AS BIGINT)").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    bounds = hourly.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1")).alias("h")
    )
    series = spine.join(hourly, "h", "left").select(
        "h", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    lags = spark.createDataFrame([(k,) for k in _ACF_LAGS], "lag long")
    s1, s2 = series.alias("s1"), series.alias("s2")
    pairs = s1.crossJoin(F.broadcast(lags)).join(
        s2, F.col("s2.h") == F.col("s1.h") + F.col("lag")
    )
    stats = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s1.x").alias("sx"),
        F.sum("s2.x").alias("sy"),
        F.sum(F.col("s1.x") * F.col("s2.x")).alias("sxy"),
        F.sum(F.col("s1.x") * F.col("s1.x")).alias("sxx"),
        F.sum(F.col("s2.x") * F.col("s2.x")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return stats.select(
        "lag",
        "n",
        F.round(num / F.sqrt(vx * vy), 6).alias("acf"),
    )


EVENT_AUTOCORRELATION_SQL = f"""
WITH hourly AS (
    SELECT CAST(epoch_ns(ts) // {_NS_PER_HOUR} AS BIGINT) AS h,
           count(*) AS x
    FROM events WHERE {VALID_TS_SQL} GROUP BY 1
),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
spine AS (
    SELECT CAST(u.i AS BIGINT) AS h
    FROM bounds, unnest(range(h0, h1 + 1)) AS u(i)
),
series AS (
    SELECT spine.h, CAST(coalesce(hourly.x, 0) AS BIGINT) AS x
    FROM spine LEFT JOIN hourly ON hourly.h = spine.h
),
lags AS (
    SELECT CAST(u.k AS BIGINT) AS lag
    FROM unnest(ARRAY{_ACF_LAGS}) AS u(k)
),
probe AS (
    -- precompute the probe key: ON s2.h = s1.h + lag is NOT an equi-join
    -- to DuckDB's planner (it fell into a blockwise-NL join that never
    -- finished on a wide spine); materializing h2 = s1.h + lag makes it
    -- a plain hash join, the same physical shape Spark picks
    SELECT lag, s1.h + lag AS h2, s1.x AS x1
    FROM series s1 CROSS JOIN lags
),
stats AS (
    SELECT lag, count(*) AS n,
           sum(p.x1) AS sx, sum(s2.x) AS sy,
           sum(p.x1 * s2.x) AS sxy,
           sum(p.x1 * p.x1) AS sxx,
           sum(s2.x * s2.x) AS syy
    FROM probe p
    JOIN series s2 ON s2.h = p.h2
    GROUP BY lag
)
SELECT lag, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf
FROM stats
"""

QUERIES["event_autocorrelation"] = (
    q_event_autocorrelation,
    EVENT_AUTOCORRELATION_SQL,
)


# --- CUSUM changepoint --------------------------------------------------------


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily event count series (Page
    1954): S_t = Σ_{i≤t} (x_i − mean); the day where |S_t| peaks is the
    most likely single changepoint. Kept EXACT by scaling out the mean
    division — dev_t = n·x_t − Σx is integer, so the running sum S'_t =
    n·S_t is an exact BIGINT (n ≤ ~30 days, n·x ≲ 1e6·30 ≪ 2^63).

    Output: one row per CALENDAR day in [min, max] — zero-event days are
    gap-filled as x = 0 (an outage is a changepoint, not a missing row) —
    with the count, the scaled CUSUM statistic, and is_changepoint on the
    argmax-|S'| row (earliest day wins ties).

    Scale design (100 TB): the scan partial-aggregates to one row per day;
    the running sum is a window over ≤ thousands of rows on the driver-
    scale series; nothing else touches the raw table. The scan body is
    shared with the streaming monitor (`streaming.monitor.read_cusum`) via
    `operators.monitoring.cusum_over_daily` — replay parity by
    construction."""
    from ..operators.monitoring import cusum_over_daily
    from ..streaming.monitor import daily_counts

    ev = load_table(spark, sf_dir, "events")
    return cusum_over_daily(daily_counts(ev))


CUSUM_CHANGEPOINT_SQL = f"""
WITH daily_sparse AS (
    SELECT CAST(epoch_ns(ts) // {_NS_PER_DAY} AS BIGINT) AS d,
           count(*) AS x
    FROM events GROUP BY 1
),
bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily_sparse),
days AS (SELECT unnest(generate_series(lo, hi)) AS d FROM bounds),
daily AS (
    SELECT days.d, COALESCE(s.x, 0) AS x
    FROM days LEFT JOIN daily_sparse s USING (d)
),
tot AS (SELECT count(*) AS n, sum(x) AS sx FROM daily),
cus AS (
    SELECT d, x,
           CAST(sum(n * x - sx) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cusum_scaled
    FROM daily CROSS JOIN tot
),
peak AS (
    SELECT abs(cusum_scaled) AS a, d AS pd FROM cus
    ORDER BY a DESC, pd ASC LIMIT 1
)
SELECT cus.d, cus.x, cus.cusum_scaled,
       (abs(cus.cusum_scaled) = peak.a AND cus.d = peak.pd)
           AS is_changepoint
FROM cus CROSS JOIN peak
"""

QUERIES["cusum_changepoint"] = (q_cusum_changepoint, CUSUM_CHANGEPOINT_SQL)


# --- CDC snapshot diff ---------------------------------------------------------

_SNAP_T1 = "1999-01-01"
_SNAP_T2 = "2000-01-01"


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff between two as-of snapshots of the
    per-customer order aggregate (orders before 1999-01-01 vs before
    2000-01-01): each customer is classified insert (absent from the old
    snapshot), update (present in both, aggregate changed) or unchanged —
    the comparison a MERGE INTO / incremental-materialization pipeline
    performs on every refresh. Totals stay on the integer-cents grid until
    the final divide so 'update vs unchanged' can never flip on a rounding
    boundary.

    Scale design (100 TB): both snapshots partial-aggregate per customer
    key, then ONE full outer join co-partitioned on that key (at real
    scale both sides come bucketed by customer, making the join
    shuffle-free); no row-level diff of the raw fact table."""
    orders = load_table_clean(spark, sf_dir, "orders")
    price_e2 = F.round(F.col("o_totalprice") * 100).cast("long")

    def snap(cutoff: str) -> DataFrame:
        return (
            orders.filter(
                F.col("o_orderdate")
                < F.lit(cutoff).cast("timestamp_ntz")
            )
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(price_e2).alias("tot_e2"),
            )
        )

    old = snap(_SNAP_T1).select(
        F.col("o_custkey").alias("custkey"),
        F.col("cnt").alias("old_cnt"),
        F.col("tot_e2").alias("old_e2"),
    )
    new = snap(_SNAP_T2).select(
        F.col("o_custkey").alias("custkey"),
        F.col("cnt").alias("new_cnt"),
        F.col("tot_e2").alias("new_e2"),
    )
    joined = old.join(new, "custkey", "full_outer")
    change = (
        F.when(F.col("old_cnt").isNull(), F.lit("insert"))
        .when(
            (F.col("old_cnt") != F.col("new_cnt"))
            | (F.col("old_e2") != F.col("new_e2")),
            F.lit("update"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        "custkey",
        change.alias("change_type"),
        "old_cnt",
        "new_cnt",
        (F.col("old_e2").cast("double") / F.lit(100.0)).alias("old_total"),
        (F.col("new_e2").cast("double") / F.lit(100.0)).alias("new_total"),
    )


SNAPSHOT_DIFF_SQL = f"""
WITH old AS (
    SELECT o_custkey AS custkey, count(*) AS old_cnt,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS old_e2
    FROM orders WHERE o_orderdate < TIMESTAMP '{_SNAP_T1}'
    GROUP BY 1
),
new AS (
    SELECT o_custkey AS custkey, count(*) AS new_cnt,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS new_e2
    FROM orders WHERE o_orderdate < TIMESTAMP '{_SNAP_T2}'
    GROUP BY 1
)
SELECT coalesce(old.custkey, new.custkey) AS custkey,
       CASE WHEN old.old_cnt IS NULL THEN 'insert'
            WHEN old.old_cnt != new.new_cnt OR old.old_e2 != new.new_e2
                THEN 'update'
            ELSE 'unchanged' END AS change_type,
       old_cnt, new_cnt,
       CAST(old_e2 AS DOUBLE) / 100.0 AS old_total,
       CAST(new_e2 AS DOUBLE) / 100.0 AS new_total
FROM old FULL OUTER JOIN new ON old.custkey = new.custkey
"""

QUERIES["snapshot_diff"] = (q_snapshot_diff, SNAPSHOT_DIFF_SQL)


# --- chi-square independence cells ---------------------------------------------


def q_chi_square_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event_type × 6-hour time-of-day
    bucket, reported per contingency cell: observed count, expected count
    R·C/N, and the cell contribution (O − E)²/E. The per-cell arithmetic
    is a FIXED expression tree over exact BIGINTs (R·C ≲ 1e10 ≪ 2^53, one
    division, one subtraction, one square, one division) so each double is
    bit-identical cross-engine; the grand chi² statistic is deliberately
    NOT summed here (a float sum over cells would be order-dependent) —
    the caller sums the 6-dp-rounded contributions, which is stable.

    The contingency grid is DENSIFIED (round-13 review): a (type, bucket)
    combination with zero observed events still contributes
    (0 − E)²/E = E to the statistic, so it must appear as an
    observed=0 row — omitting empty cells understates chi² and biases
    the test toward non-rejection. The bucket domain is the fixed 0..3
    (6-hour blocks of a day); the type domain is the observed types.

    Scale design (100 TB): the raw scan partial-aggregates straight to the
    ≤ |types|×4 cell grid; densification and marginals are window sums
    over that tiny grid (broadcast-scale), never a second scan.
    Event time is restricted to the valid analytic domain (round 15:
    pre-epoch timestamps produce NEGATIVE day-modulo buckets outside the
    densified 0..3 grid, driving a marginal to zero and the E-division
    with it)."""
    from ..operators._util import valid_ts

    # untyped (NULL event_type) rows are excluded too: NULL never
    # equi-joins back from the densified grid, so its marginal is zero
    # in both engines — undefined cell, not a category
    ev = load_table(spark, sf_dir, "events").filter(
        valid_ts("ts") & F.col("event_type").isNotNull()
    )
    sparse = (
        ev.select(
            "event_type",
            F.expr(
                f"CAST((ts % {_NS_PER_DAY}) DIV {6 * _NS_PER_HOUR}"
                " AS BIGINT)"
            ).alias("hour_bucket"),
        )
        .groupBy("event_type", "hour_bucket")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    grid = sparse.select("event_type").distinct().crossJoin(
        spark.range(4).select(
            F.col("id").cast("bigint").alias("hour_bucket")
        )
    )
    cells = grid.join(
        sparse, ["event_type", "hour_bucket"], "left"
    ).withColumn("observed", F.coalesce("observed", F.lit(0)))
    w_r = Window.partitionBy("event_type")
    w_c = Window.partitionBy("hour_bucket")
    w_n = Window.partitionBy()
    g = cells.select(
        "event_type",
        "hour_bucket",
        "observed",
        F.sum("observed").over(w_r).alias("r_tot"),
        F.sum("observed").over(w_c).alias("c_tot"),
        F.sum("observed").over(w_n).alias("n_tot"),
    )
    expected = (F.col("r_tot") * F.col("c_tot")).cast("double") / F.col(
        "n_tot"
    ).cast("double")
    diff = F.col("observed").cast("double") - expected
    return g.select(
        "event_type",
        "hour_bucket",
        "observed",
        F.round(expected, 6).alias("expected"),
        F.round(diff * diff / expected, 6).alias("contribution"),
    )


CHI_SQUARE_CELLS_SQL = f"""
WITH sparse AS (
    SELECT event_type,
           CAST((epoch_ns(ts) % {_NS_PER_DAY}) // {6 * _NS_PER_HOUR}
                AS BIGINT) AS hour_bucket,
           count(*) AS observed
    FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
),
grid AS (
    SELECT t.event_type, b.hour_bucket
    FROM (SELECT DISTINCT event_type FROM sparse) t
    CROSS JOIN (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT)
                    AS hour_bucket) b
),
cells AS (
    SELECT g.event_type, g.hour_bucket,
           COALESCE(s.observed, 0) AS observed
    FROM grid g LEFT JOIN sparse s USING (event_type, hour_bucket)
),
g AS (
    SELECT event_type, hour_bucket, observed,
           sum(observed) OVER (PARTITION BY event_type) AS r_tot,
           sum(observed) OVER (PARTITION BY hour_bucket) AS c_tot,
           sum(observed) OVER () AS n_tot
    FROM cells
)
SELECT event_type, hour_bucket, observed,
       round(CAST(r_tot * c_tot AS DOUBLE) / CAST(n_tot AS DOUBLE), 6)
           AS expected,
       round((CAST(observed AS DOUBLE)
              - CAST(r_tot * c_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
             * (CAST(observed AS DOUBLE)
                - CAST(r_tot * c_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
             / (CAST(r_tot * c_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)), 6)
           AS contribution
FROM g
"""

from ..oracles import valid_events_sql as _valid_events_sql  # noqa: E402

QUERIES["chi_square_cells"] = (
    q_chi_square_cells,
    _valid_events_sql(CHI_SQUARE_CELLS_SQL),
)


# --- gaps-and-islands activity streaks ------------------------------------------


def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user (the gaps-and-islands
    shape): distinct active days, grouped into islands by the classic
    day − row_number() difference (constant within a run of consecutive
    days), then per user the longest streak, its start day (earliest on
    ties), and the total number of streaks. Pure integer arithmetic.

    Scale design (100 TB): one scan → distinct (user, day) partial agg;
    the row_number window and the island groupBy are all partitioned BY
    USER, so no global sort and no skew beyond a single user's day count
    (bounded by the calendar)."""
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(
            "user_id", F.expr(f"CAST(ts DIV {_NS_PER_DAY} AS BIGINT)").alias("d")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "grp", F.col("d") - F.row_number().over(w)
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("start_d")
    )
    w_u = Window.partitionBy("user_id")
    return (
        streaks.withColumn("longest_streak", F.max("len").over(w_u))
        .groupBy("user_id", "longest_streak")
        .agg(
            F.min(
                F.when(
                    F.col("len") == F.col("longest_streak"),
                    F.col("start_d"),
                )
            ).alias("longest_start_d"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .select(
            "user_id", "longest_streak", "longest_start_d", "n_streaks"
        )
    )


ACTIVITY_STREAKS_SQL = f"""
WITH days AS (
    SELECT DISTINCT user_id,
           CAST(epoch_ns(ts) // {_NS_PER_DAY} AS BIGINT) AS d
    FROM events
),
isl AS (
    SELECT user_id, d,
           d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
    FROM days
),
streaks AS (
    SELECT user_id, grp, count(*) AS len, min(d) AS start_d
    FROM isl GROUP BY 1, 2
),
mx AS (
    SELECT user_id, max(len) AS longest_streak FROM streaks GROUP BY 1
)
SELECT s.user_id, mx.longest_streak,
       min(CASE WHEN s.len = mx.longest_streak THEN s.start_d END)
           AS longest_start_d,
       count(*) AS n_streaks
FROM streaks s JOIN mx ON s.user_id IS NOT DISTINCT FROM mx.user_id
GROUP BY 1, 2
"""

QUERIES["activity_streaks"] = (q_activity_streaks, ACTIVITY_STREAKS_SQL)


# --- multi-touch attribution -----------------------------------------------------

_ATTR_WINDOW_SEC = 3600


def q_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: for EVERY purchase — including a direct
    purchase with no prior touch, which reports n_touches = 0 with NULL
    first/last touch (round-13 review: an inner join dropped untouched
    purchases entirely, silently shrinking any downstream denominator
    like 'share of touch-assisted purchases') — the click/view touches by
    the same user in the preceding hour (s in (purchase−3600, purchase]),
    with the touch count and the first-/last-touch event types. Touch
    order is the total order (s, event_id) — event ids are unique, so
    min_by/max_by can never tie. Spark orders by the struct directly
    (lexicographic struct comparison); the DuckDB oracle, whose
    arg_min/arg_max cannot take a struct key, uses the exact HUGEINT key
    s·2^63 + event_id, collision-free for any BIGINT event_id (ADVICE
    r06: the old s·1e9 + event_id key silently mis-ordered ids ≥ 1e9).

    Scale design (100 TB): equi-join on user_id (one hash shuffle, both
    sides co-partitioned) with the time-range predicate evaluated inside
    the join; per-user fan-out is bounded by the hour window. At real
    scale the same plan runs as a bucketed join on user_id or a
    range-bucketed interval join (bucket by hour, join adjacent buckets)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "s", F.expr("CAST(ts DIV 1000000000 AS BIGINT)")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("s").alias("ps"),
    )
    touches = ev.filter(
        F.col("event_type").isin("click", "view")
    ).select(
        "user_id",
        F.col("s").alias("ts_s"),
        F.struct(F.col("s").alias("o_s"), F.col("event_id").alias("o_e"))
        .alias("ord"),
        F.col("event_type").alias("touch_type"),
    )
    # LEFT join with the window predicate in the ON clause (a post-join
    # filter would re-drop the unmatched purchases the left join keeps)
    joined = purchases.join(
        touches,
        (purchases["user_id"] == touches["user_id"])
        & (F.col("ts_s") <= F.col("ps"))
        & (F.col("ts_s") > F.col("ps") - _ATTR_WINDOW_SEC),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        # count(touch_type), not count(*): the unmatched purchase's one
        # all-NULL touch row must count as zero touches
        F.count("touch_type").alias("n_touches"),
        F.min_by("touch_type", "ord").alias("first_touch"),
        F.max_by("touch_type", "ord").alias("last_touch"),
    )


TOUCH_ATTRIBUTION_SQL = f"""
WITH ev AS (
    SELECT event_id, user_id, event_type,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events
),
purchases AS (
    SELECT event_id AS purchase_id, user_id, s AS ps
    FROM ev WHERE event_type = 'purchase'
),
touches AS (
    SELECT user_id, s AS ts_s,
           CAST(s AS HUGEINT) * 9223372036854775808 + event_id AS ord,
           event_type AS touch_type
    FROM ev WHERE event_type IN ('click', 'view')
)
SELECT purchase_id, count(touch_type) AS n_touches,
       arg_min(touch_type, ord) AS first_touch,
       arg_max(touch_type, ord) AS last_touch
FROM purchases LEFT JOIN touches
  ON purchases.user_id = touches.user_id
 AND ts_s <= ps AND ts_s > ps - {_ATTR_WINDOW_SEC}
GROUP BY purchase_id
"""

QUERIES["touch_attribution"] = (q_touch_attribution, TOUCH_ATTRIBUTION_SQL)


# --- k-anonymity audit ------------------------------------------------------------

_K_ANON = 5


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) of the customer table under the
    quasi-identifier (nation, market segment, account-balance bucket of
    1000 currency units): every equivalence class with its size and
    whether it meets k=5 — classes below k are the re-identification risk
    a privacy review flags before a dataset release. The balance bucket is
    integer cents shifted positive before the floor division, so negative
    balances bucket identically in both engines (no truncate-vs-floor
    divergence).

    Scale design (100 TB): one partial-aggregated groupBy on the QID
    columns; the audit output is at most the QID-combination cardinality,
    independent of row count."""
    cust = load_table_clean(spark, sf_dir, "customer")
    bucket = F.expr(
        "CAST((CAST(round(c_acctbal * 100) AS BIGINT) + 100000000)"
        " DIV 100000 AS BIGINT)"
    )
    return (
        cust.groupBy(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            "c_mktsegment",
            bucket.alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("meets_k", F.col("class_size") >= _K_ANON)
    )


K_ANONYMITY_SQL = f"""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment,
       CAST((CAST(round(c_acctbal * 100) AS BIGINT) + 100000000) // 100000
            AS BIGINT) AS bal_bucket,
       count(*) AS class_size,
       count(*) >= {_K_ANON} AS meets_k
FROM customer
GROUP BY 1, 2, 3
"""

QUERIES["k_anonymity"] = (q_k_anonymity, K_ANONYMITY_SQL)


_L_DIVERSITY = 3


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    necessary companion: an equivalence class can meet k yet leak its
    SENSITIVE attribute when every member shares one value (the
    homogeneity attack). Same quasi-identifier classes as `k_anonymity`
    (nation, segment, balance bucket); sensitive attribute = the
    customer's order-priority profile — distinct o_orderpriority values
    observed across the class's orders. Classes with < l distinct
    sensitive values are the leak. Customers without orders contribute
    no sensitive values (distinct count over the left join's NULLs is
    0 in both engines).

    Scale design (100 TB): one customer⨝orders join keyed on custkey
    (both bucketable), partial-agg to classes; output bounded by QID
    cardinality."""
    cust = load_table_clean(spark, sf_dir, "customer")
    # NULL priority is not a sensitive-attribute VALUE (round 15): it can
    # never equi-join back from the densified grid, but its presence in
    # the global distribution shifted every class's cumulative EMD terms
    # by an engine-dependent NULL sort position — quarantine it
    orders = (
        load_table_clean(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isNotNull())
        .select("o_custkey", "o_orderpriority")
    )
    bucket = F.expr(
        "CAST((CAST(round(c_acctbal * 100) AS BIGINT) + 100000000)"
        " DIV 100000 AS BIGINT)"
    )
    joined = cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nationkey"),
        "c_mktsegment",
        bucket.alias("bal_bucket"),
    ).join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
    return (
        joined.groupBy("nationkey", "c_mktsegment", "bal_bucket")
        .agg(
            F.countDistinct("c_custkey").alias("class_size"),
            F.countDistinct("o_orderpriority").alias("n_sensitive"),
        )
        .withColumn("meets_l", F.col("n_sensitive") >= _L_DIVERSITY)
    )


L_DIVERSITY_SQL = f"""
WITH j AS (
    SELECT c.c_custkey,
           CAST(c.c_nationkey AS BIGINT) AS nationkey,
           c.c_mktsegment,
           CAST((CAST(round(c.c_acctbal * 100) AS BIGINT) + 100000000)
                // 100000 AS BIGINT) AS bal_bucket,
           o.o_orderpriority
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
)
SELECT nationkey, c_mktsegment, bal_bucket,
       count(DISTINCT c_custkey) AS class_size,
       count(DISTINCT o_orderpriority) AS n_sensitive,
       count(DISTINCT o_orderpriority) >= {_L_DIVERSITY} AS meets_l
FROM j
GROUP BY 1, 2, 3
"""

QUERIES["l_diversity"] = (q_l_diversity, L_DIVERSITY_SQL)


# --- t-closeness (completes the privacy triad) ------------------------------

_T_CLOSENESS = 0.2


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    triad's third leg after `k_anonymity` and `l_diversity`: a class can
    be k-anonymous AND l-diverse yet still leak if its sensitive-value
    DISTRIBUTION diverges from the table-wide one (skewness attack).
    Same quasi-identifier classes (nation, segment, balance bucket);
    sensitive attribute = o_orderpriority, an ORDERED categorical (the
    leading digit orders it), so the distance is the ordered-EMD of the
    original paper: EMD = (1/(m−1))·Σᵢ |Σ_{j≤i}(p_j − q_j)|.

    Exactness: the inner cumulative differences are kept as INTEGER
    numerators — p_j − q_j = (c_j·G − g_j·C)/(C·G) with c/C the class,
    g/G the global counts — so the Σ|·| aggregation is a BIGINT sum
    (order-independent by construction, no float-accumulation hazard;
    products stay ≪ 2^63 at any driver SF — at true 100 TB counts use
    DECIMAL(38)); ONE final IEEE division by C·G·(m−1), rounded 6-dp.

    Class semantics (round-13 review): the sensitive attribute lives on
    ORDERS, so the distributions p/q are over order records — but
    ``class_size`` reports the class's CUSTOMER count, matching what the
    same class reports in `k_anonymity` and `l_diversity` (it previously
    reported the order-row count, so the triad disagreed about the same
    class). A class whose customers placed no orders has an EMPTY
    sensitive distribution — no EMD to compute — and is deliberately
    absent here (it vacuously satisfies any t); `l_diversity` reports it
    with n_sensitive = 0.

    Scale design (100 TB): customer⨝orders custkey join → partial-agg to
    (class, priority) cells; the dense grid and window run over ≤
    |QID classes|·m rows — metadata-sized, independent of fact rows."""
    cust = load_table_clean(spark, sf_dir, "customer")
    # NULL priority is not a sensitive-attribute VALUE (round 15): it can
    # never equi-join back from the densified grid, but its presence in
    # the global distribution shifted every class's cumulative EMD terms
    # by an engine-dependent NULL sort position — quarantine it
    orders = (
        load_table_clean(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isNotNull())
        .select("o_custkey", "o_orderpriority")
    )
    bucket = F.expr(
        "CAST((CAST(round(c_acctbal * 100) AS BIGINT) + 100000000)"
        " DIV 100000 AS BIGINT)"
    )
    cust_q = cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nationkey"),
        "c_mktsegment",
        bucket.alias("bal_bucket"),
    )
    class_cust = cust_q.groupBy(
        "nationkey", "c_mktsegment", "bal_bucket"
    ).agg(F.count(F.lit(1)).alias("class_size"))
    rows = cust_q.join(orders, F.col("c_custkey") == F.col("o_custkey"))
    cells = rows.groupBy(
        "nationkey", "c_mktsegment", "bal_bucket", "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("cell_n"))
    glob = rows.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("glob_n")
    )
    totals = glob.agg(
        F.sum("glob_n").alias("total_n"), F.count(F.lit(1)).alias("n_vals")
    )
    classes = cells.groupBy("nationkey", "c_mktsegment", "bal_bucket").agg(
        F.sum("cell_n").alias("class_n")
    )
    dense = (
        classes.join(F.broadcast(glob), F.lit(True))
        .join(
            cells,
            ["nationkey", "c_mktsegment", "bal_bucket", "o_orderpriority"],
            "left",
        )
        .withColumn("cell_n", F.coalesce("cell_n", F.lit(0)))
        .join(F.broadcast(totals), F.lit(True))
    )
    w = (
        Window.partitionBy("nationkey", "c_mktsegment", "bal_bucket")
        .orderBy("o_orderpriority")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.withColumn(
        "cum_num", F.sum(F.col("cell_n") * F.col("total_n") - F.col("glob_n") * F.col("class_n")).over(w)
    )
    return (
        cum.groupBy("nationkey", "c_mktsegment", "bal_bucket")
        .agg(
            F.round(
                F.sum(F.abs("cum_num")).cast("double")
                / (
                    F.first("class_n").cast("double")
                    * F.first("total_n").cast("double")
                    * (F.first("n_vals") - F.lit(1)).cast("double")
                ),
                6,
            ).alias("emd"),
        )
        .join(
            F.broadcast(class_cust),
            ["nationkey", "c_mktsegment", "bal_bucket"],
        )
        .select(
            "nationkey",
            "c_mktsegment",
            "bal_bucket",
            "class_size",
            "emd",
            (F.col("emd") <= F.lit(_T_CLOSENESS)).alias("meets_t"),
        )
    )


T_CLOSENESS_SQL = f"""
WITH cust_q AS (
    SELECT c_custkey,
           CAST(c_nationkey AS BIGINT) AS nationkey,
           c_mktsegment,
           CAST((CAST(round(c_acctbal * 100) AS BIGINT) + 100000000)
                // 100000 AS BIGINT) AS bal_bucket
    FROM customer
),
class_cust AS (
    SELECT nationkey, c_mktsegment, bal_bucket, count(*) AS class_size
    FROM cust_q GROUP BY 1, 2, 3
),
rows_ AS (
    SELECT q.nationkey, q.c_mktsegment, q.bal_bucket, o.o_orderpriority
    FROM cust_q q JOIN orders o ON o.o_custkey = q.c_custkey
    WHERE o.o_orderpriority IS NOT NULL
),
cells AS (
    SELECT nationkey, c_mktsegment, bal_bucket, o_orderpriority,
           count(*) AS cell_n
    FROM rows_ GROUP BY 1, 2, 3, 4
),
gdist AS (
    SELECT o_orderpriority, count(*) AS glob_n FROM rows_ GROUP BY 1
),
totals AS (SELECT sum(glob_n) AS total_n, count(*) AS n_vals FROM gdist),
classes AS (
    SELECT nationkey, c_mktsegment, bal_bucket, sum(cell_n) AS class_n
    FROM cells GROUP BY 1, 2, 3
),
dense AS (
    SELECT cl.nationkey, cl.c_mktsegment, cl.bal_bucket, cl.class_n,
           gl.o_orderpriority, gl.glob_n, coalesce(ce.cell_n, 0) AS cell_n,
           t.total_n, t.n_vals
    FROM classes cl
    CROSS JOIN gdist gl
    LEFT JOIN cells ce
      ON ce.nationkey = cl.nationkey
     AND ce.c_mktsegment = cl.c_mktsegment
     AND ce.bal_bucket = cl.bal_bucket
     AND ce.o_orderpriority = gl.o_orderpriority
    CROSS JOIN totals t
),
cum AS (
    SELECT *,
           sum(cell_n * total_n - glob_n * class_n) OVER (
               PARTITION BY nationkey, c_mktsegment, bal_bucket
               ORDER BY o_orderpriority
               ROWS UNBOUNDED PRECEDING
           ) AS cum_num
    FROM dense
)
SELECT e.nationkey, e.c_mktsegment, e.bal_bucket,
       cc.class_size, e.emd, e.emd <= {_T_CLOSENESS!r} AS meets_t
FROM (
    SELECT nationkey, c_mktsegment, bal_bucket,
           round(CAST(sum(abs(cum_num)) AS DOUBLE)
                 / (CAST(first(class_n) AS DOUBLE)
                    * CAST(first(total_n) AS DOUBLE)
                    * CAST(first(n_vals) - 1 AS DOUBLE)), 6) AS emd
    FROM cum
    GROUP BY 1, 2, 3
) e JOIN class_cust cc USING (nationkey, c_mktsegment, bal_bucket)
"""

QUERIES["t_closeness"] = (q_t_closeness, T_CLOSENESS_SQL)


# --- bipartite butterfly counts (round 9) -----------------------------------


def q_butterfly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user butterfly (2×2 biclique) counts on the bounded (user<200)
    bipartite liked graph — the bipartite analog of triangle counting
    (Wang et al., "Butterfly Counting in Bipartite Networks", the
    standard cohesion metric where triangles cannot exist): a butterfly
    is a user pair sharing TWO products. Each butterfly is generated
    exactly once as (user pair, C(common,2)): per user pair compute the
    common-product count c, butterflies on the pair = c·(c−1)/2 (exact
    BIGINT), then credit both endpoints. Same bounded-exact-tier stance
    as `triangle_counts` (the wedge join is Θ(Σ deg²) by nature); the
    count arithmetic is pure integers — full value oracle.

    Scale design (100 TB): one product-keyed wedge self-join (bounded by
    the user<200 exact-tier contract, exactly as `triangle_counts`; an
    unbounded run wants the co-review family's per-product fan-out cap)
    → pair-keyed partial-agg count → endpoint partial-agg sum. No floats
    anywhere."""
    from ..operators.graph import good_reviews
    from ..sources.tables import reviews_from_events

    liked = good_reviews(
        reviews_from_events(spark, sf_dir), user_cutoff=200
    )
    a, b = liked.alias("a"), liked.alias("b")
    pair_c = (
        a.join(
            b,
            (F.col("a.product_id") == F.col("b.product_id"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "bf", F.expr("CAST(c * (c - 1) DIV 2 AS BIGINT)")
        )
        .filter(F.col("bf") > 0)
    )
    per_user = pair_c.select(F.col("u").alias("id"), "bf").unionByName(
        pair_c.select(F.col("v").alias("id"), "bf")
    )
    return per_user.groupBy("id").agg(
        F.sum("bf").alias("n_butterflies")
    )


def _butterfly_counts_sql() -> str:
    from ..oracles import LIKED_200_CTE, REVIEWS_CTE

    return f"""
WITH {REVIEWS_CTE},
{LIKED_200_CTE},
pair_c AS (
    SELECT a.user_id AS u, b.user_id AS v, count(*) AS c
    FROM liked a
    JOIN liked b ON a.product_id = b.product_id
               AND a.user_id < b.user_id
    GROUP BY 1, 2
),
bf AS (
    SELECT u, v, CAST(c * (c - 1) // 2 AS BIGINT) AS bf
    FROM pair_c WHERE c >= 2
),
per_user AS (
    SELECT u AS id, bf FROM bf
    UNION ALL
    SELECT v AS id, bf FROM bf
)
SELECT id, CAST(sum(bf) AS BIGINT) AS n_butterflies
FROM per_user GROUP BY id
"""


BUTTERFLY_COUNTS_SQL = _butterfly_counts_sql()

QUERIES["butterfly_counts"] = (q_butterfly_counts, BUTTERFLY_COUNTS_SQL)


# --- deterministic implicit-feedback negative sampling (round 9) ------------

_NEG_PER_USER = 3
_NEG_SALT = "neg-v1"


def q_implicit_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pair negative sampling for implicit-feedback CF / retrieval
    training: per user (the liked cohort), the ``_NEG_PER_USER`` products
    the user did NOT interact with, drawn deterministically by salted
    portable hash — the regenerable negative set a training pipeline
    needs (same salt → same negatives on any run, engine, partitioning).
    Candidate grid = users × product catalog (the catalog is the fixed
    ~100-product dimension → broadcast), anti-joined against the user's
    INTERACTIONS — every review at any rating, not just the liked
    relation (round-13 review: a product the user rated 2.0 is a real
    interaction, and sampling it as a 'negative' poisons implicit-
    feedback training; likewise the catalog is every reviewed product,
    not only products someone liked). Ranked per user by
    (hash, product_id). Full value oracle (md5-derived hash, integer
    ranks).

    Scale design (100 TB): the catalog side is a broadcast dim; the grid
    is |users|·|catalog| rows of longs with codegen hashing; the
    interaction anti-join and the per-user top-k window shuffle on
    user_id once."""
    from ..operators.dedup import portable_hash32
    from ..operators.graph import good_reviews
    from ..sources.tables import reviews_from_events

    reviews = reviews_from_events(spark, sf_dir).localCheckpoint()
    liked = good_reviews(reviews)
    users = liked.select("user_id").distinct()
    # catalog excludes NULL product ids (round 15): a NULL "product" can
    # never match the interaction anti-join, and Spark's concat_ws SKIPS
    # the NULL in the sampling hash while SQL || null-propagates — an
    # unknown item is not a sampleable negative in either engine
    catalog = (
        reviews.select("product_id")
        .filter(F.col("product_id").isNotNull())
        .distinct()
    )
    grid = users.join(F.broadcast(catalog), F.lit(True))
    cand = grid.join(
        reviews.select("user_id", "product_id"),
        ["user_id", "product_id"],
        "left_anti",
    )
    h = portable_hash32(
        F.concat_ws(
            ":",
            F.lit(_NEG_SALT),
            F.col("user_id").cast("string"),
            F.col("product_id").cast("string"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("h").asc(), F.col("product_id").asc()
    )
    return (
        cand.withColumn("h", h)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _NEG_PER_USER)
        .select("user_id", "product_id", "rank")
    )


def _implicit_negatives_sql() -> str:
    from ..oracles import LIKED_CTE, REVIEWS_CTE

    return f"""
WITH {REVIEWS_CTE},
{LIKED_CTE},
users AS (SELECT DISTINCT user_id FROM liked),
catalog AS (SELECT DISTINCT product_id FROM reviews
            WHERE product_id IS NOT NULL),
cand AS (
    SELECT u.user_id, c.product_id
    FROM users u CROSS JOIN catalog c
    WHERE NOT EXISTS (
        SELECT 1 FROM reviews r
        WHERE r.user_id = u.user_id AND r.product_id = c.product_id
    )
),
h AS (
    SELECT user_id, product_id,
           CAST('0x' || substr(md5('{_NEG_SALT}:'
                || CAST(user_id AS VARCHAR) || ':'
                || CAST(product_id AS VARCHAR)), 1, 8) AS BIGINT) AS hv
    FROM cand
)
SELECT user_id, product_id,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY hv ASC, product_id ASC) AS BIGINT)
           AS rank
FROM h
QUALIFY rank <= {_NEG_PER_USER}
"""


IMPLICIT_NEGATIVES_SQL = _implicit_negatives_sql()

QUERIES["implicit_negatives"] = (q_implicit_negatives, IMPLICIT_NEGATIVES_SQL)


# --- exact weighted median --------------------------------------------------------


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact revenue-weighted median quantity per return flag: the smallest
    quantity q with  2·(cumulative revenue through q) ≥ total revenue —
    the lower weighted median, a shape neither engine has as a builtin.
    Weights are integer revenue cents and quantities sit on the integer-e2
    grid, so the cumulative comparison is pure BIGINT (2·Σ ≲ 1e13·2 ≪
    2^63) and can never flip on a rounding boundary.

    Scale design (100 TB): the raw scan partial-aggregates to one row per
    (flag, quantity) — bounded by the quantity domain, not the row count;
    the cumulative window then runs per flag over ≤ |quantities| rows."""
    li = load_table_clean(spark, sf_dir, "lineitem")
    grid = (
        li.select(
            "l_returnflag",
            F.round(F.col("l_quantity") * 100).cast("long").alias("qty_e2"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("w_e2"),
        )
        .groupBy("l_returnflag", "qty_e2")
        .agg(F.sum("w_e2").alias("w"))
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("qty_e2")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("l_returnflag")
    flagged = grid.select(
        "l_returnflag",
        "qty_e2",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_tot).alias("tot"),
    )
    return (
        flagged.filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("qty_e2").alias("med_e2"))
        .select(
            "l_returnflag",
            (F.col("med_e2").cast("double") / F.lit(100.0)).alias(
                "weighted_median_qty"
            ),
        )
    )


WEIGHTED_MEDIAN_SQL = """
WITH grid AS (
    SELECT l_returnflag,
           CAST(round(l_quantity * 100) AS BIGINT) AS qty_e2,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS w
    FROM lineitem GROUP BY 1, 2
),
flagged AS (
    SELECT l_returnflag, qty_e2,
           sum(w) OVER (PARTITION BY l_returnflag ORDER BY qty_e2
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(w) OVER (PARTITION BY l_returnflag) AS tot
    FROM grid
)
SELECT l_returnflag,
       CAST(min(qty_e2) AS DOUBLE) / 100.0 AS weighted_median_qty
FROM flagged WHERE cum * 2 >= tot
GROUP BY l_returnflag
"""

QUERIES["weighted_median"] = (q_weighted_median, WEIGHTED_MEDIAN_SQL)


# --- Benford first-digit audit -----------------------------------------------------

# log10(1 + 1/d) for d = 1..9, precomputed ONCE in Python and inlined as
# identical literals in both engines — no cross-engine libm dependence.
_BENFORD = {
    1: 0.301029995664, 2: 0.176091259056, 3: 0.124938736608,
    4: 0.096910013008, 5: 0.079181246048, 6: 0.066946789631,
    7: 0.057991946978, 8: 0.051152522447, 9: 0.045757490561,
}


def q_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed share of each leading
    significant digit vs the Benford expectation log10(1+1/d) — the
    classic fraud / synthetic-data screen. The leading digit comes from
    the integer-cents string (totals are positive), counts are exact, the
    expectation is an inlined constant, and the deviation is ONE IEEE
    division minus a literal, rounded 6 dp.

    Scale design (100 TB): one scan collapsing to ≤9 rows via partial agg;
    the grand total is a window sum over those 9 rows. Benford is
    defined on POSITIVE magnitudes — the domain is explicit (round 15:
    a 0.00 total produced leading digit 0, an index even try_element_at
    refuses; a negative total's leading '-' fails the digit cast)."""
    orders = load_table_clean(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        1,
        1,
    ).cast("long")
    counts = (
        orders.select(digit.alias("digit"))
        # a sub-cent positive total still rounds to cents "0" — digit 0
        # is outside Benford's domain (and outside the 1-indexed
        # expectation array), so the domain pin is on the DIGIT
        .filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    tot = Window.partitionBy()
    expected = F.try_element_at(
        F.lit([_BENFORD[d] for d in range(1, 10)]), F.col("digit").cast("int")
    )
    return counts.select(
        "digit",
        "observed",
        F.round(
            F.col("observed").cast("double")
            / F.sum("observed").over(tot).cast("double")
            - expected,
            6,
        ).alias("deviation"),
    )


_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {_BENFORD[d]!r}" for d in range(1, 10)
) + " END"

BENFORD_DEVIATION_SQL = f"""
WITH counts AS (
    SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           count(*) AS observed
    FROM orders WHERE o_totalprice > 0 GROUP BY 1
    HAVING digit BETWEEN 1 AND 9
)
SELECT digit, observed,
       round(CAST(observed AS DOUBLE)
             / CAST(sum(observed) OVER () AS DOUBLE)
             - ({_BENFORD_CASE}), 6) AS deviation
FROM counts
"""

QUERIES["benford_deviation"] = (q_benford_deviation, BENFORD_DEVIATION_SQL)


# --- incremental aggregate maintenance ----------------------------------------------

_INC_BASE_CUTOFF = "1999-01-01"
_INC_DELTA_END = "1999-07-01"


def q_incremental_agg_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: a base per-priority
    aggregate (orders before 1999-01-01) is REFRESHED by merging only the
    delta partition [1999-01-01, 1999-07-01) — count and integer-cents
    revenue are associative/commutative, so  merge(base, agg(delta)) =
    agg(base ∪ delta)  exactly. The oracle recomputes from scratch over
    the full range, proving the incremental path bit-identical — the
    correctness contract every incremental-materialization engine
    (dbt incremental, Materialize, Delta MERGE rollups) relies on.

    Scale design (100 TB): the refresh touches ONLY the delta partition
    (partition pruning on the date) plus the existing aggregate (one row
    per group), instead of rescanning the full history."""
    orders = load_table_clean(spark, sf_dir, "orders")
    price_e2 = F.round(F.col("o_totalprice") * 100).cast("long")

    def agg_range(lo: str | None, hi: str) -> DataFrame:
        df = orders.filter(
            F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz")
        )
        if lo is not None:
            df = df.filter(
                F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz")
            )
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum(price_e2).alias("rev_e2")
        )

    base = agg_range(None, _INC_BASE_CUTOFF)
    delta = agg_range(_INC_BASE_CUTOFF, _INC_DELTA_END)
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(F.sum("cnt").alias("n_orders"), F.sum("rev_e2").alias("rev_e2"))
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        (F.col("rev_e2").cast("double") / F.lit(100.0)).alias("revenue"),
    )


INCREMENTAL_AGG_UPDATE_SQL = f"""
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / 100.0 AS revenue
FROM orders
WHERE o_orderdate < TIMESTAMP '{_INC_DELTA_END}'
GROUP BY 1
"""

QUERIES["incremental_agg_update"] = (
    q_incremental_agg_update,
    INCREMENTAL_AGG_UPDATE_SQL,
)


# --- conversion latency quantiles ----------------------------------------------------


def q_conversion_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Discrete (type-1) quantiles of click→purchase latency: per user,
    each purchase is matched to the most recent prior-or-same-second click
    (the as-of shape); the latency distribution is then summarized at
    p50/p90/p99 by EXACT rank selection — value at row_number ceil(q·n)
    under the total order (latency, purchase_id) — not interpolation, so
    every output is an observed integer latency and the engines cannot
    drift.

    Scale design (100 TB): the as-of match is a per-user window (one hash
    shuffle on user_id); the final rank selection runs on the aggregated
    latency multiset. The global n is a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "s", F.expr("CAST(ts DIV 1000000000 AS BIGINT)")
    )
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "event_type", "s"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lat = (
        both.withColumn(
            "last_click_s",
            F.max(
                F.when(F.col("event_type") == "click", F.col("s"))
            ).over(w),
        )
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click_s").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            (F.col("s") - F.col("last_click_s")).alias("latency_s"),
        )
    )
    w_rank = Window.orderBy("latency_s", "purchase_id")
    ranked = lat.select(
        "latency_s",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    qs = spark.createDataFrame(
        [(50,), (90,), (99,)], "q_pct long"
    )
    return (
        ranked.crossJoin(F.broadcast(qs))
        .filter(
            F.col("rn")
            == -F.floor(-(F.col("q_pct") * F.col("n")) / F.lit(100))
        )
        .select("q_pct", F.col("latency_s").alias("latency"))
    )


CONVERSION_LATENCY_QUANTILES_SQL = """
WITH ev AS (
    SELECT event_id, user_id, event_type,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events WHERE event_type IN ('click', 'purchase')
),
lat AS (
    SELECT event_id AS purchase_id,
           s - max(CASE WHEN event_type = 'click' THEN s END) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS latency_s,
           event_type
    FROM ev
),
purch AS (
    SELECT purchase_id, latency_s FROM lat
    WHERE event_type = 'purchase' AND latency_s IS NOT NULL
),
ranked AS (
    SELECT latency_s,
           row_number() OVER (ORDER BY latency_s, purchase_id) AS rn,
           count(*) OVER () AS n
    FROM purch
),
qs AS (SELECT CAST(u.q AS BIGINT) AS q_pct FROM unnest([50, 90, 99]) AS u(q))
SELECT q_pct, latency_s AS latency
FROM ranked CROSS JOIN qs
WHERE rn = CAST(ceil(q_pct * n / 100.0) AS BIGINT)
"""

QUERIES["conversion_latency_quantiles"] = (
    q_conversion_latency_quantiles,
    CONVERSION_LATENCY_QUANTILES_SQL,
)


# --- popularity concentration (Gini) -------------------------------------------


def q_popularity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popularity concentration of product interactions — the Gini
    coefficient a recommender-health dashboard tracks (how head-heavy is
    engagement): with per-product counts x sorted ascending and ranked
    i = 1..n,  G = (2·Σ i·x_i − (n+1)·Σ x) / (n·Σ x).  Both sums are
    exact BIGINTs (ranks ≤ catalog size, counts ≤ row count), so G is ONE
    IEEE division of exact integers, rounded 6 dp; ties in x are ordered
    by product id — any tie order yields the same Σ i·x_i within a tie
    group sum, and the fixed order makes the intermediate relation
    deterministic too.

    Scale design (100 TB): the event scan partial-aggregates to one row
    per product; the rank is a window over the catalog-sized aggregate,
    not the raw stream."""
    from ..sources.tables import product_id_col

    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select(product_id_col().alias("product_id"))
        .filter(F.col("product_id").isNotNull())
        .groupBy("product_id")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.orderBy("x", "product_id")
    ranked = counts.select(
        "x", F.row_number().over(w).cast("long").alias("i")
    )
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    return stats.select(
        "n",
        F.col("sx").alias("total_interactions"),
        F.round(
            (2 * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast(
                "double"
            )
            / (F.col("n") * F.col("sx")).cast("double"),
            6,
        ).alias("gini"),
    )


POPULARITY_GINI_SQL = """
WITH counts AS (
    SELECT __PRODUCT_ID__ AS product_id,
           count(*) AS x
    FROM events
    WHERE __PRODUCT_ID__ IS NOT NULL
    GROUP BY 1
),
ranked AS (
    SELECT x,
           CAST(row_number() OVER (ORDER BY x, product_id) AS BIGINT) AS i
    FROM counts
),
stats AS (
    SELECT count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(i * x) AS BIGINT) AS six
    FROM ranked
)
SELECT n, sx AS total_interactions,
       round(CAST(2 * six - (n + 1) * sx AS DOUBLE)
             / CAST(n * sx AS DOUBLE), 6) AS gini
FROM stats
"""

QUERIES["popularity_gini"] = (q_popularity_gini, POPULARITY_GINI_SQL)


# --- incremental join-view maintenance ------------------------------------------


def q_incremental_join_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view (the other half of IVM,
    complementing `incremental_agg_update`'s aggregate): the materialized
    view V = orders ⋈ customer over orders before 1999-01-01 is refreshed
    with only the delta partition's join  ΔV = Δorders ⋈ customer  and
    unioned — joins distribute over union, so  V ∪ ΔV  is EXACTLY the view
    recomputed over the full range (the oracle recomputes from scratch).

    Scale design (100 TB): the refresh scans only the date-pruned delta
    (plan-pinned pushdown shape shared with `incremental_agg_update`) and
    re-joins it against the dimension; the existing view rows are reused
    verbatim — no re-join of the historical fact volume."""
    orders = load_table_clean(spark, sf_dir, "orders")
    cust = load_table_clean(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )

    def view_rows(lo: str | None, hi: str) -> DataFrame:
        df = orders.filter(
            F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz")
        )
        if lo is not None:
            df = df.filter(
                F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz")
            )
        return df.join(
            cust, df["o_custkey"] == cust["c_custkey"]
        ).select(
            "o_orderkey",
            "o_custkey",
            "c_name",
            "c_mktsegment",
            (
                F.round(F.col("o_totalprice") * 100).cast("long").cast(
                    "double"
                )
                / F.lit(100.0)
            ).alias("o_totalprice"),
        )

    base = view_rows(None, _INC_BASE_CUTOFF)
    delta = view_rows(_INC_BASE_CUTOFF, _INC_DELTA_END)
    return base.unionByName(delta)


INCREMENTAL_JOIN_UPDATE_SQL = f"""
SELECT o_orderkey, o_custkey, c_name, c_mktsegment,
       CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE) / 100.0
           AS o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate < TIMESTAMP '{_INC_DELTA_END}'
"""

QUERIES["incremental_join_update"] = (
    q_incremental_join_update,
    INCREMENTAL_JOIN_UPDATE_SQL,
)


# --- product-analytics KPIs -------------------------------------------------------


def q_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of (user, session)s with exactly one event,
    sessionized by the repo-wide gap convention (a NEW session starts when
    the inactivity gap is >= SESSION_GAP_SEC, matching `user_sessions` /
    `session_paths` — streaming_queries.py:84). Counts are exact; the rate
    is one IEEE division rounded 6 dp; a session is attributed to the day
    of its FIRST event.

    Scale design (100 TB): sessionization is the one user_id-partitioned
    window pass; the rollup partial-aggregates to ≤ |days| rows."""
    from ..operators._util import valid_ts

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(valid_ts("ts"))
        .withColumn("s", F.expr("CAST(ts DIV 1000000000 AS BIGINT)"))
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    sess = ev.select(
        "user_id",
        "s",
        "event_id",
        F.when(
            (F.col("s") - F.lag("s").over(w)) >= SESSION_GAP_SEC, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("new_sess"),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("s").alias("first_s"),
    )
    daily = per_sess.groupBy(
        F.expr("CAST(first_s DIV 86400 AS BIGINT)").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.when(F.col("n_events") == 1, F.lit(1)).otherwise(F.lit(0))
        ).alias("bounces"),
    )
    return daily.select(
        "d",
        "n_sessions",
        "bounces",
        F.round(
            F.col("bounces").cast("double")
            / F.col("n_sessions").cast("double"),
            6,
        ).alias("bounce_rate"),
    )


BOUNCE_RATE_DAILY_SQL = f"""
WITH ev AS (
    SELECT user_id, event_id,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events
),
flagged AS (
    SELECT user_id, event_id, s,
           CASE WHEN s - lag(s) OVER w >= {SESSION_GAP_SEC}
                THEN 1 ELSE 0 END AS new_sess
    FROM ev
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY s NULLS FIRST, event_id NULLS FIRST)
),
sess AS (
    SELECT user_id, s,
           sum(new_sess) OVER (PARTITION BY user_id
               ORDER BY s NULLS FIRST, event_id NULLS FIRST
               ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM flagged
),
per_sess AS (
    SELECT user_id, sess_id, count(*) AS n_events, min(s) AS first_s
    FROM sess GROUP BY 1, 2
),
daily AS (
    SELECT CAST(first_s // 86400 AS BIGINT) AS d,
           count(*) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS bounces
    FROM per_sess GROUP BY 1
)
SELECT d, n_sessions, bounces,
       round(CAST(bounces AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)
           AS bounce_rate
FROM daily
"""

from ..oracles import valid_events_sql as _valid_events_sql_b  # noqa: E402

QUERIES["bounce_rate_daily"] = (
    q_bounce_rate_daily,
    _valid_events_sql_b(BOUNCE_RATE_DAILY_SQL),
)


def q_lead_time_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment lead time distribution: integer days between the
    order date and each line's ship date, counted per (priority, days) —
    the ops KPI behind shipping SLAs. Day diffs are exact integer
    arithmetic on epoch days.

    Scale design (100 TB): fact⨝fact equi-join on the order key (both
    sides bucketed at real scale), then a partial-aggregated rollup to the
    (priority × ~120-day) grid."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    days = (
        F.unix_date(F.col("l_shipdate").cast("date"))
        - F.unix_date(F.col("o_orderdate").cast("date"))
    ).cast("long")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("o_orderpriority", days.alias("lead_days"))
        .groupBy("o_orderpriority", "lead_days")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


LEAD_TIME_HISTOGRAM_SQL = """
SELECT o_orderpriority,
       CAST(date_diff('day', CAST(o_orderdate AS DATE),
                      CAST(l_shipdate AS DATE)) AS BIGINT) AS lead_days,
       count(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""

QUERIES["lead_time_histogram"] = (
    q_lead_time_histogram,
    LEAD_TIME_HISTOGRAM_SQL,
)


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the share of total order revenue held by the
    top 10% of customers (by their own revenue, ties broken by customer
    key) — the "whale" KPI. Revenue stays integer cents end-to-end; the
    decile cut is an exact integer rank threshold ceil(n/10); the share is
    ONE IEEE division rounded 6 dp.

    Scale design (100 TB): one per-customer partial agg, one rank window
    over the aggregate, two scalar sums."""
    orders = load_table_clean(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "rev_e2"
        )
    )
    w = Window.orderBy(F.col("rev_e2").desc(), "o_custkey")
    ranked = per_cust.select(
        "rev_e2",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    cut = -F.floor(-F.col("n") / F.lit(10))
    return ranked.agg(
        F.max("n").alias("n_customers"),
        F.sum(
            F.when(F.col("rn") <= cut, F.col("rev_e2")).otherwise(F.lit(0))
        ).alias("top_e2"),
        F.sum("rev_e2").alias("tot_e2"),
    ).select(
        "n_customers",
        (F.col("top_e2").cast("double") / F.lit(100.0)).alias(
            "top_decile_revenue"
        ),
        F.round(
            F.col("top_e2").cast("double") / F.col("tot_e2").cast("double"),
            6,
        ).alias("top_decile_share"),
    )


REVENUE_CONCENTRATION_SQL = """
WITH per_cust AS (
    SELECT o_custkey,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_e2
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT rev_e2,
           CAST(row_number() OVER (ORDER BY rev_e2 DESC, o_custkey)
                AS BIGINT) AS rn,
           count(*) OVER () AS n
    FROM per_cust
)
SELECT max(n) AS n_customers,
       CAST(sum(CASE WHEN rn <= CAST(ceil(n / 10.0) AS BIGINT)
                THEN rev_e2 ELSE 0 END) AS DOUBLE) / 100.0
           AS top_decile_revenue,
       round(CAST(sum(CASE WHEN rn <= CAST(ceil(n / 10.0) AS BIGINT)
                      THEN rev_e2 ELSE 0 END) AS DOUBLE)
             / CAST(sum(rev_e2) AS DOUBLE), 6) AS top_decile_share
FROM ranked
"""

QUERIES["revenue_concentration"] = (
    q_revenue_concentration,
    REVENUE_CONCENTRATION_SQL,
)


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New vs returning active users per day — the top-line product
    analytics split: a user counts as NEW on the day of their first event,
    RETURNING on every later active day. All integers.

    Scale design (100 TB): distinct (user, day) partial agg; first-day is
    a per-user min over that aggregate (same shuffle key), and the rollup
    is calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(
            "user_id",
            F.expr(f"CAST(ts DIV {_NS_PER_DAY} AS BIGINT)").alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id")
    tagged = days.withColumn("first_d", F.min("d").over(w))
    return tagged.groupBy("d").agg(
        F.sum(
            F.when(F.col("d") == F.col("first_d"), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("new_users"),
        F.sum(
            F.when(F.col("d") != F.col("first_d"), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("returning_users"),
    )


NEW_VS_RETURNING_SQL = f"""
WITH days AS (
    SELECT DISTINCT user_id,
           CAST(epoch_ns(ts) // {_NS_PER_DAY} AS BIGINT) AS d
    FROM events
),
tagged AS (
    SELECT d, user_id,
           min(d) OVER (PARTITION BY user_id) AS first_d
    FROM days
)
SELECT d,
       CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users,
       CAST(sum(CASE WHEN d != first_d THEN 1 ELSE 0 END) AS BIGINT)
           AS returning_users
FROM tagged GROUP BY d
"""

QUERIES["new_vs_returning"] = (q_new_vs_returning, NEW_VS_RETURNING_SQL)


# --- exact-dyadic EWMA trend (round 7c) ------------------------------------

# ONE load-bearing constant shared with the batch core and the streaming
# reader (operators/monitoring.py) — imported, not re-declared, so the
# batch query, its SQL oracle, and read_ewma can never silently diverge
from ..operators.monitoring import EWMA_WINDOW as _EWMA_WINDOW


def q_ewma_event_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the daily event count
    with α = 1/2 — the classic ops smoothing/trend signal — computed in
    EXACT dyadic arithmetic so the value oracle is bit-for-bit:
    ewma(d) = Σ_{i=0..19} x(d−i) · 2^{−(i+1)}, accumulated as BIGINT
    2^-20 units (each count contributes x·2^(19−i)) and converted with
    ONE division by 2^20, whose result is exactly representable. Days
    are gap-filled across [min, max] so absent days contribute zero and
    every output day's window is complete.

    Scale design (100 TB): the daily rollup partial-aggregates the fact
    scan to ≤ |days| rows; the 20× contribution explode and the final
    sum run on that calendar-bounded relation — independent of fact
    volume."""
    from ..operators.monitoring import ewma_over_daily

    ev = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(ts DIV 1000000000 AS BIGINT) DIV 86400").alias("d")
    )
    daily = ev.groupBy("d").agg(F.count(F.lit(1)).alias("x"))
    return ewma_over_daily(daily, window=_EWMA_WINDOW)


EWMA_EVENT_TREND_SQL = f"""
WITH ev AS (
    SELECT CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 86400 AS d
    FROM events
),
daily AS (SELECT d, count(*) AS n_events FROM ev GROUP BY 1),
filled AS (
    SELECT gs.d, coalesce(daily.n_events, 0) AS n_events
    FROM (SELECT unnest(range((SELECT min(d) FROM daily),
                              (SELECT max(d) FROM daily) + 1)) AS d) gs
    LEFT JOIN daily USING (d)
),
contrib AS (
    SELECT f.d + u.i AS td,
           f.n_events * (1::BIGINT << ({_EWMA_WINDOW} - 1 - u.i)) AS units
    FROM filled f, unnest(range(0, {_EWMA_WINDOW})) AS u(i)
)
SELECT f.d, f.n_events,
       CAST((SELECT sum(c.units) FROM contrib c WHERE c.td = f.d) AS DOUBLE)
           / {float(1 << _EWMA_WINDOW)} AS ewma
FROM filled f
"""

QUERIES["ewma_event_trend"] = (q_ewma_event_trend, EWMA_EVENT_TREND_SQL)


# --- zone-map / data-skipping audit (round 7c) -----------------------------

# The fixed probe predicate: one ship-year. Zones whose [min, max] range
# misses it entirely are skippable — the file/partition pruning a
# lakehouse scan does with footer statistics.
_ZONE_Q_LO_DAYS = 9131   # 1995-01-01 as epoch days
_ZONE_Q_HI_DAYS = 9496   # 1996-01-01


def q_zone_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map audit for data skipping (Moerkotte 1998 "small
    materialized aggregates" — the mechanism behind parquet footer
    min/max pruning and ORC/Iceberg zone maps): bucket lineitem into
    FIXED 30-EPOCH-DAY ship-date zones (zone = ship_days DIV 30 — zones
    are write-layout blocks, not calendar months; a calendar-month label
    would drift ~5 days/year off these blocks), compute each zone's row
    count and min/max
    statistics for the ship date (epoch days, exact ints) and extended
    price (exact cents), and evaluate which zones a fixed one-year probe
    predicate could SKIP — plus each zone's min/max orderkey to show how
    badly a time-ordered layout fragments a key-range predicate (the
    motivation for the sibling `zorder_layout` query).

    Scale design (100 TB): one partial-agg'd scan → ≤ |30-day blocks| rows;
    this is exactly the statistics pass a writer runs per file at scale.
    """
    li = load_table_clean(spark, sf_dir, "lineitem").select(
        F.expr("CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)")
        .alias("ship_days"),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
        ).alias("price_cents"),
        "l_orderkey",
    )
    zones = (
        li.groupBy(
            F.expr("ship_days DIV 30").alias("zone")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ship_days").alias("min_ship_days"),
            F.max("ship_days").alias("max_ship_days"),
            F.min("price_cents").alias("min_price_cents"),
            F.max("price_cents").alias("max_price_cents"),
            F.min("l_orderkey").alias("min_orderkey"),
            F.max("l_orderkey").alias("max_orderkey"),
        )
    )
    skippable = (F.col("max_ship_days") < F.lit(_ZONE_Q_LO_DAYS)) | (
        F.col("min_ship_days") >= F.lit(_ZONE_Q_HI_DAYS)
    )
    return zones.withColumn("skippable_for_probe", skippable)


ZONE_MAP_STATS_SQL = f"""
WITH li AS (
    SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS ship_days,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
           l_orderkey
    FROM lineitem
),
zones AS (
    SELECT ship_days // 30 AS zone,
           count(*) AS n_rows,
           min(ship_days) AS min_ship_days,
           max(ship_days) AS max_ship_days,
           min(price_cents) AS min_price_cents,
           max(price_cents) AS max_price_cents,
           min(l_orderkey) AS min_orderkey,
           max(l_orderkey) AS max_orderkey
    FROM li GROUP BY 1
)
SELECT *,
       max_ship_days < {_ZONE_Q_LO_DAYS}
           OR min_ship_days >= {_ZONE_Q_HI_DAYS} AS skippable_for_probe
FROM zones
"""

QUERIES["zone_map_stats"] = (q_zone_map_stats, ZONE_MAP_STATS_SQL)


# --- additive seasonal decomposition (round 7c) -----------------------------


def q_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic additive decomposition of the daily event count —
    x(d) = trend + seasonal + residual — the moving-average flavor of
    STL every ops dashboard runs: trend = centered 7-day mean (full
    windows only), seasonal = day-of-week mean minus grand mean,
    residual = the rest. Every component is one division of exact
    integer sums (rounded 6 dp), and the residual subtracts
    already-rounded doubles — identical IEEE steps in both engines, so
    the whole decomposition value-oracles.

    Scale design (100 TB): one partial-agg'd scan to daily counts; the
    trend is a 7-row frame over the calendar-bounded relation; the
    seasonal/grand means are 7-row / 1-row broadcasts. The daily spine is
    bounded by the explicit valid-time domain (operators._util.valid_ts —
    round-15 adversarial finding)."""
    from ..operators._util import valid_ts

    ev = load_table(spark, sf_dir, "events").filter(valid_ts("ts")).select(
        F.expr("CAST(ts DIV 1000000000 AS BIGINT) DIV 86400").alias("d")
    )
    daily = ev.groupBy("d").agg(F.count(F.lit(1)).alias("x"))
    bounds = daily.agg(F.min("d").alias("d_lo"), F.max("d").alias("d_hi"))
    filled = (
        bounds.select(F.explode(F.sequence("d_lo", "d_hi")).alias("d"))
        .join(daily, "d", "left")
        .select("d", F.coalesce("x", F.lit(0)).alias("x"))
    )
    wf = Window.orderBy("d").rowsBetween(-3, 3)
    trended = filled.select(
        "d",
        "x",
        (F.col("d") % 7).alias("dow"),
        F.sum("x").over(wf).alias("_s7"),
        F.count(F.lit(1)).over(wf).alias("_n7"),
    ).filter(F.col("_n7") == 7)
    dow_means = filled.groupBy((F.col("d") % 7).alias("dow")).agg(
        F.sum("x").alias("_ds"), F.count(F.lit(1)).alias("_dn")
    )
    grand = filled.agg(
        F.sum("x").alias("_ts"), F.count(F.lit(1)).alias("_tn")
    )
    out = (
        trended.join(F.broadcast(dow_means), "dow")
        .crossJoin(F.broadcast(grand))
        .select(
            "d",
            "x",
            F.round(F.col("_s7").cast("double") / F.lit(7.0), 6).alias(
                "trend"
            ),
            F.round(
                F.col("_ds").cast("double") / F.col("_dn").cast("double")
                - F.col("_ts").cast("double") / F.col("_tn").cast("double"),
                6,
            ).alias("seasonal"),
        )
    )
    return out.withColumn(
        "residual",
        F.round(
            F.col("x").cast("double") - F.col("trend") - F.col("seasonal"), 6
        ),
    )


SEASONAL_DECOMPOSITION_SQL = f"""
WITH ev AS (
    SELECT CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 86400 AS d
    FROM events WHERE {VALID_TS_SQL}
),
daily AS (SELECT d, count(*) AS x FROM ev GROUP BY 1),
filled AS (
    SELECT gs.d, coalesce(daily.x, 0) AS x
    FROM (SELECT unnest(range((SELECT min(d) FROM daily),
                              (SELECT max(d) FROM daily) + 1)) AS d) gs
    LEFT JOIN daily USING (d)
),
trended AS (
    SELECT d, x, d % 7 AS dow,
           sum(x) OVER w AS s7, count(*) OVER w AS n7
    FROM filled
    WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
dow_means AS (
    SELECT d % 7 AS dow, sum(x) AS ds, count(*) AS dn
    FROM filled GROUP BY 1
),
grand AS (SELECT sum(x) AS ts, count(*) AS tn FROM filled)
SELECT t.d, t.x,
       round(CAST(t.s7 AS DOUBLE) / 7.0, 6) AS trend,
       round(CAST(m.ds AS DOUBLE) / CAST(m.dn AS DOUBLE)
             - CAST(g.ts AS DOUBLE) / CAST(g.tn AS DOUBLE), 6) AS seasonal,
       round(CAST(t.x AS DOUBLE)
             - round(CAST(t.s7 AS DOUBLE) / 7.0, 6)
             - round(CAST(m.ds AS DOUBLE) / CAST(m.dn AS DOUBLE)
                     - CAST(g.ts AS DOUBLE) / CAST(g.tn AS DOUBLE), 6), 6)
           AS residual
FROM trended t
JOIN dow_means m ON m.dow = t.dow
CROSS JOIN grand g
WHERE t.n7 = 7
"""

QUERIES["seasonal_decomposition"] = (
    q_seasonal_decomposition,
    SEASONAL_DECOMPOSITION_SQL,
)


# --- Markov removal-effect attribution (round 8) -----------------------------

_MARKOV_K = 12  # bounded absorption horizon (documented contract)
_MK_GRID = 274877906944.0  # 2^38


def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven multi-touch attribution via Markov removal effects
    (Anderl et al. 2014) — the method that replaced position rules
    (`touch_attribution` is the rule-based sibling): build the
    first-order journey chain (START → event types → CONV at the first
    purchase / NULL when none), estimate transition probabilities from
    counts, and credit each channel by how much the conversion
    probability drops when the channel is removed (its transitions
    redirect to NULL).

    Absorption probabilities are computed by K=12 bounded power
    iterations — a documented truncation (journey chains can cycle), the
    SAME number on both engines, with every per-step term quantized to
    the 2^-38 grid so state vectors stay exact dyadic rationals and the
    whole query value-oracles (transition probs are single IEEE count
    divisions; all scenarios advance in ONE relation per step, the
    betweenness all-sources trick).

    Output: (channel, p_conv_full, p_conv_removed, removal_effect,
    attribution_share), share = effect / Σ effects.

    Scale design (100 TB): the journey/transition build is one user_id
    window pass + a partial-agg to the tiny (from, to) domain; the
    iteration runs on a |scenarios|×|states| relation (tens of rows) —
    metadata-scale regardless of event volume."""
    # untyped (NULL event_type) rows are not journey states (round 15):
    # Spark's min_by/max_by would pick a NULL first/last channel where
    # SQL arg_min/arg_max skip NULL values — and a channel that doesn't
    # exist can't receive attribution anyway
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.expr("CAST(ts DIV 1000000000 AS BIGINT)").alias("s"),
        )
    )
    return markov_attribution_from_events(ev)


def markov_attribution_from_events(ev: DataFrame) -> DataFrame:
    """Core of `markov_attribution` over a prepared
    (user_id, event_id, event_type, s) relation — factored so tests can
    drive it with hand journey chains (the registered query's oracle
    checks the full pipeline; the unit test checks the MATH on a chain
    small enough to solve by hand)."""
    spark = ev.sparkSession
    # event_type completes the total order (round 15): duplicated fact
    # rows can share (s, event_id) and the journey chain depends on the
    # tie order; NULLS FIRST mirrored in the oracle
    w = Window.partitionBy("user_id").orderBy("s", "event_id", "event_type")
    # Pin the SEQUENCED relation once (round 16, revisits the r14 "don't
    # pin" measurement): r14 pinned kept+fp eagerly at AQE's coalesced
    # 1-partition layout and lost (5.8 → 6.3 s); pinning r with the
    # pin_layout-first pattern (user_id-hashed, full parallelism, lazy)
    # wins instead — the window sort runs ONCE where the four downstream
    # journey consumers each replayed it (A/B at sf0.1: prefix 1.5 →
    # 1.2 s, full query 5.5 → 3.5 s together with the driver-side
    # iteration below).
    from ..operators._util import pin_layout as _pin

    r = _pin(
        ev.withColumn("rn", F.row_number().over(w)), "user_id"
    ).localCheckpoint(eager=False)
    fp = (
        r.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("fp"))
    )
    j = r.join(fp, "user_id", "left")
    kept = j.filter(F.col("fp").isNull() | (F.col("rn") < F.col("fp")))

    w2 = Window.partitionBy("user_id").orderBy("rn")
    mid = (
        kept.withColumn("nxt", F.lead("event_type").over(w2))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("event_type").alias("f"), F.col("nxt").alias("t"))
    )
    firsts = kept.groupBy("user_id").agg(
        F.min_by("event_type", "rn").alias("t")
    ).select(F.lit("START").alias("f"), "t")
    start_conv = fp.filter(F.col("fp") == 1).select(
        F.lit("START").alias("f"), F.lit("CONV").alias("t")
    )
    lasts = (
        kept.groupBy("user_id")
        .agg(F.max_by("event_type", "rn").alias("f"))
        .join(fp, "user_id", "left")
        .select(
            "f",
            F.when(F.col("fp").isNotNull(), F.lit("CONV"))
            .otherwise(F.lit("DROPPED"))
            .alias("t"),
        )
    )
    trans = mid.unionByName(firsts).unionByName(start_conv).unionByName(lasts)
    cnt = trans.groupBy("f", "t").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("f").agg(F.sum("n").alias("d"))
    T = cnt.join(tot, "f").select(
        "f", "t", (F.col("n").cast("double") / F.col("d").cast("double")).alias("prob")
    ).localCheckpoint()

    chans = kept.select(F.col("event_type").alias("ch")).distinct()
    scen = chans.select(F.col("ch").alias("scenario")).unionByName(
        spark.createDataFrame([("FULL",)], "scenario STRING")
    ).localCheckpoint()
    states = T.select(F.col("f").alias("state")).distinct().localCheckpoint()

    # DRIVER-SIDE power iteration (round 16): the K=12 absorption loop
    # runs on a |scenarios| × |states| relation of TENS of rows — pure
    # metadata after the distributed journey/transition build above, the
    # same bounded-collect scale waiver as ``ivf_refit_centroids`` and
    # MLlib's Lloyd loop. The previous DataFrame loop spent 12 rounds of
    # broadcast-join jobs (+3 lineage checkpoints) on it; solving the
    # tiny absorbing chain on the driver is one collect of the
    # checkpointed T/scen/states relations (guide §1.2: fix the
    # algorithm's job shape before per-task tuning). BIT-IDENTICAL by
    # the query's own exactness contract: every per-step term is
    # quantized to the 2^-38 grid, so state vectors are exact dyadic
    # rationals and summation order (Python accumulation here, partial
    # aggregation before) cannot change a single bit; floor/× / ÷2^38
    # are the same IEEE ops in Python and in both engines.
    import math

    t_rows = [(r["f"], r["t"], r["prob"]) for r in T.collect()]
    scenarios = [r["scenario"] for r in scen.collect()]
    state_list = [r["state"] for r in states.collect()]
    state_set = set(state_list)

    def _q(x: float) -> float:
        return math.floor(x * _MK_GRID + 0.5) / _MK_GRID

    conv = {f: prob for (f, t, prob) in t_rows if t == "CONV"}
    base = {
        (s, f): _q(prob) for s in scenarios for f, prob in conv.items()
    }
    edges = {
        s: [
            (f, t, prob)
            for (f, t, prob) in t_rows
            if t in state_set and t != s
        ]
        for s in scenarios
    }
    p = {(s, st): 0.0 for s in scenarios for st in state_list}
    for _ in range(_MARKOV_K):
        terms: dict[tuple, float] = {}
        for s in scenarios:
            for f, t, prob in edges[s]:
                terms[(s, f)] = terms.get((s, f), 0.0) + _q(
                    prob * p[(s, t)]
                )
        p = {
            (s, st): base.get((s, st), 0.0) + terms.get((s, st), 0.0)
            for s in scenarios
            for st in state_list
        }

    rows = []
    if ("FULL", "START") in p:
        pf = p[("FULL", "START")]
        rows = [
            (s, pf, p[(s, "START")])
            for s in scenarios
            if s != "FULL" and (s, "START") in p
        ]
    eff = spark.createDataFrame(
        rows, "channel STRING, p_full DOUBLE, p_removed DOUBLE"
    ).select(
        "channel",
        "p_full",
        "p_removed",
        (F.col("p_full") - F.col("p_removed")).alias("effect"),
    )
    te = eff.agg(F.sum("effect").alias("te"))
    return eff.crossJoin(F.broadcast(te)).select(
        "channel",
        F.round("p_full", 6).alias("p_conv_full"),
        F.round("p_removed", 6).alias("p_conv_removed"),
        F.round("effect", 6).alias("removal_effect"),
        F.when(
            F.col("te") > 0, F.round(F.col("effect") / F.col("te"), 6)
        ).alias("attribution_share"),
    )


def _markov_sql(k: int = _MARKOV_K) -> str:
    g = _MK_GRID
    parts = [f"""e AS (
    SELECT user_id, event_id, event_type,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events
    WHERE event_type IS NOT NULL
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY s NULLS FIRST,
                                          event_id NULLS FIRST,
                                          event_type NULLS FIRST) AS rn
    FROM e
),
fp AS (
    SELECT user_id, min(rn) AS fp FROM r
    WHERE event_type = 'purchase' GROUP BY 1
),
kept AS MATERIALIZED (
    SELECT r.* FROM r LEFT JOIN fp USING (user_id)
    WHERE fp.fp IS NULL OR r.rn < fp.fp
),
mid AS (
    SELECT f, t FROM (
        SELECT event_type AS f,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS t
        FROM kept
    ) WHERE t IS NOT NULL
),
firsts AS (
    SELECT 'START' AS f, arg_min(event_type, rn) AS t
    FROM kept GROUP BY user_id
),
start_conv AS (
    SELECT 'START' AS f, 'CONV' AS t FROM fp WHERE fp = 1
),
lasts AS (
    SELECT l.f, CASE WHEN fp.user_id IS NOT NULL THEN 'CONV'
                     ELSE 'DROPPED' END AS t
    FROM (SELECT user_id, arg_max(event_type, rn) AS f
          FROM kept GROUP BY user_id) l
    LEFT JOIN fp USING (user_id)
),
trans AS (
    SELECT f, t FROM mid UNION ALL SELECT f, t FROM firsts
    UNION ALL SELECT f, t FROM start_conv UNION ALL SELECT f, t FROM lasts
),
cnt AS (SELECT f, t, count(*) AS n FROM trans GROUP BY 1, 2),
tot AS (SELECT f, sum(n) AS d FROM cnt GROUP BY 1),
tr AS MATERIALIZED (
    SELECT c.f, c.t, CAST(c.n AS DOUBLE) / CAST(tt.d AS DOUBLE) AS prob
    FROM cnt c JOIN tot tt USING (f)
),
scen AS MATERIALIZED (
    SELECT DISTINCT event_type AS scenario FROM kept
    UNION ALL SELECT 'FULL'
),
states AS MATERIALIZED (SELECT DISTINCT f AS state FROM tr),
base AS MATERIALIZED (
    SELECT s.scenario, t.f AS state,
           floor(t.prob * {g!r} + 0.5) / {g!r} AS bq
    FROM tr t, scen s WHERE t.t = 'CONV'
),
edges AS MATERIALIZED (
    SELECT s.scenario, t.f, t.t, t.prob
    FROM tr t
    JOIN states st ON st.state = t.t
    CROSS JOIN scen s
    WHERE t.t != s.scenario
),
p0 AS MATERIALIZED (SELECT s.scenario, st.state, 0.0 AS p FROM scen s, states st)"""]
    for i in range(1, k + 1):
        parts.append(f"""tm{i} AS MATERIALIZED (
    SELECT e.scenario, e.f AS state,
           sum(floor(e.prob * p.p * {g!r} + 0.5) / {g!r}) AS ts
    FROM edges e JOIN p{i - 1} p
      ON p.scenario = e.scenario AND p.state = e.t
    GROUP BY 1, 2
),
p{i} AS MATERIALIZED (
    SELECT g.scenario, g.state,
           coalesce(b.bq, 0.0) + coalesce(t.ts, 0.0) AS p
    FROM (SELECT s.scenario, st.state FROM scen s, states st) g
    LEFT JOIN base b ON b.scenario = g.scenario AND b.state = g.state
    LEFT JOIN tm{i} t ON t.scenario = g.scenario AND t.state = g.state
)""")
    parts.append(f"""fin AS (
    SELECT scenario, p FROM p{k} WHERE state = 'START'
),
eff AS (
    SELECT r.scenario AS channel,
           f.p AS p_full, r.p AS p_removed, f.p - r.p AS effect
    FROM fin r, (SELECT p FROM fin WHERE scenario = 'FULL') f
    WHERE r.scenario != 'FULL'
),
te AS (SELECT sum(effect) AS te FROM eff)""")
    return ",\n".join(parts)


MARKOV_ATTRIBUTION_SQL = (
    "WITH " + _markov_sql() + """
SELECT channel,
       round(p_full, 6) AS p_conv_full,
       round(p_removed, 6) AS p_conv_removed,
       round(effect, 6) AS removal_effect,
       CASE WHEN te.te > 0 THEN round(effect / te.te, 6) END
           AS attribution_share
FROM eff, te
"""
)

QUERIES["markov_attribution"] = (q_markov_attribution, MARKOV_ATTRIBUTION_SQL)


# round 15: substitute the canonical dirty-data-total fragments into every
# oracle that uses the __PRODUCT_ID__/__RATING__ placeholders (single
# definition in oracles.py — inline copies cannot drift; see the
# reviews_from_events docstring for the cross-engine rationale)
from ..oracles import canonicalize as _canonicalize  # noqa: E402

for _name, _entry in list(QUERIES.items()):
    if _entry[1] and "__PRODUCT_ID__" in _entry[1] or (
        _entry[1] and "__RATING__" in _entry[1]
    ):
        QUERIES[_name] = (_entry[0], _canonicalize(_entry[1]), *_entry[2:])
del _name, _entry


# round 15: route these oracles through the table-level measure-domain
# contract (oracles.clean_tables_sql — Spark twin load_table_clean in the
# matching query fns above; no-op on clean generator data)
from ..oracles import clean_tables_sql as _clean_tables_sql  # noqa: E402

_CLEAN_TABLE_MAP = {'benford_deviation': ('orders',), 'incremental_agg_update': ('orders',), 'incremental_join_update': ('customer', 'orders'), 'k_anonymity': ('customer',), 'l_diversity': ('customer', 'orders'), 'pareto_frontier': ('part',), 'revenue_concentration': ('orders',), 'snapshot_diff': ('orders',), 't_closeness': ('customer', 'orders'), 'weighted_median': ('lineitem',), 'zorder_layout': ('part',), 'zone_map_stats': ('lineitem',)}
for _n, _tabs in _CLEAN_TABLE_MAP.items():
    QUERIES[_n] = (
        QUERIES[_n][0],
        _clean_tables_sql(QUERIES[_n][1], *_tabs),
        *QUERIES[_n][2:],
    )
del _n, _tabs
