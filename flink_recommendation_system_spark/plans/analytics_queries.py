"""Second relational/analytical suite: multi-level aggregation (ROLLUP),
distinct-count aggregates (exact + HLL sketch), EXISTS-correlated counts,
conditional aggregation, and decile statistics — rounding out the §2.3/§2.9
surface with the aggregate shapes any warehouse workload needs.

Entries: ``name → (spark_fn, oracle_sql | None)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import global_ntile
from ..sources.tables import load_table, load_table_clean


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (nation, order priority): per-pair, per-nation subtotal,
    and grand total in one pass (partial-aggregated grouping sets)."""
    orders = load_table_clean(spark, sf_dir, "orders")
    cust = load_table_clean(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    )
    return (
        base.rollup("n_name", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


REVENUE_ROLLUP_SQL = """
SELECT n_name, o_orderpriority,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, o_orderpriority)
"""


def q_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count aggregates per part type (supplier diversity)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


PART_TYPE_STATS_SQL = """
SELECT p_type,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_orderkey) AS n_orders,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type
"""


def q_approx_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct-SUPPLIER count (approx_count_distinct) per part
    brand — the constant-memory sketch a 100 TB distinct-count uses
    (round-13 review: the query previously counted distinct ORDERS while
    its name promised suppliers — a consumer measuring supplier diversity
    per brand got order cardinalities ~100x off). Rows-only in the driver
    (HLL++ estimates are engine-specific); the portable-register twin
    `hll_brand_distinct` runs the same shape value-oracled."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias(
                "approx_suppliers"
            )
        )
    )


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders with at least one lineitem (EXISTS semi-join),
    counted by priority."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.join(li, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORDER_PRIORITY_COUNTS_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
GROUP BY o_orderpriority
"""


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-based conditional aggregation (pivot-style) in one scan: per
    nation, revenue split by high/low order value."""
    orders = load_table_clean(spark, sf_dir, "orders")
    cust = load_table_clean(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    hi = F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice")).otherwise(
        F.lit(0.0)
    )
    lo = F.when(F.col("o_totalprice") <= 100000, F.col("o_totalprice")).otherwise(
        F.lit(0.0)
    )
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum(hi), 2).alias("rev_high"),
            F.round(F.sum(lo), 2).alias("rev_low"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_order"),
        )
    )


CONDITIONAL_AGG_SQL = """
SELECT n_name,
       round(sum(CASE WHEN o_totalprice > 100000 THEN o_totalprice ELSE 0.0 END), 2)
           AS rev_high,
       round(sum(CASE WHEN o_totalprice <= 100000 THEN o_totalprice ELSE 0.0 END), 2)
           AS rev_low,
       round(avg(o_totalprice), 4) AS avg_order
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ntile(10) decile of customers by account balance + per-decile
    stats — WITHOUT the single-partition global sort `ntile() OVER
    (ORDER BY ...)` forces (Exchange SinglePartition funnels every row
    through one task). ``operators.relational.global_ntile`` recovers
    ntile's exact bucket law arithmetically from the distributed global
    rank (repartitionByRange + per-partition row_number, with the bucket
    constants folded in as plan literals); the ONLY driver round-trip is
    the #partitions-row offset collect — N is derived from those same
    offsets, so there is no COUNT(*) job and no broadcast join
    (round-12 follow-up removed them; this note tracked the code in
    round 13) — metadata-sized at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    with_decile = global_ntile(
        cust.select("c_acctbal", "c_custkey"),
        10,
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        bucket_col="decile",
    )
    return with_decile.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_balance"),
        F.round(F.min("c_acctbal"), 2).alias("min_balance"),
    )


CUSTOMER_DECILES_SQL = """
SELECT decile,
       count(*) AS n_customers,
       round(avg(c_acctbal), 4) AS avg_balance,
       round(min(c_acctbal), 2) AS min_balance
FROM (
    SELECT c_acctbal,
           ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS decile
    FROM customer
)
GROUP BY decile
"""


def q_order_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90/p99) of order value per priority —
    Spark `percentile` and DuckDB `quantile_cont` share linear
    interpolation, so values match exactly after rounding."""
    orders = load_table_clean(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


ORDER_VALUE_QUANTILES_SQL = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders
GROUP BY o_orderpriority
"""


def q_nations_in_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op: nation keys present in BOTH customer and supplier
    (complement of the union coverage in `active_nations`)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


NATIONS_IN_BOTH_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_customer_name_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth: regexp_extract the numeric suffix of the
    customer name, upper-case prefix, LIKE-style filter."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_name").like("%1%"))
        .select(
            "c_custkey",
            F.upper(F.col("c_name")).alias("name_upper"),
            F.regexp_extract("c_name", r"(\d+)$", 1).cast("long").alias(
                "name_num"
            ),
            F.length("c_name").cast("long").alias("name_len"),
        )
    )


CUSTOMER_NAME_PARSE_SQL = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       CAST(regexp_extract(c_name, '(\\d+)$', 1) AS BIGINT) AS name_num,
       CAST(length(c_name) AS BIGINT) AS name_len
FROM customer
WHERE c_name LIKE '%1%'
"""


def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL front end: the top-products pipeline written as
    Spark SQL text over registered views — everything the DataFrame API
    queries do is equally available to SQL users (the reference has no SQL
    surface at all; Catalyst gives it for free)."""
    from ..sources.tables import (
        PRODUCT_ID_EXPR_SPARKSQL,
        RATING_EXPR_SPARKSQL,
    )

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        f"""
        WITH reviews AS (
            SELECT user_id,
                   {PRODUCT_ID_EXPR_SPARKSQL} AS product_id,
                   {RATING_EXPR_SPARKSQL} AS rating
            FROM events_v
        )
        SELECT product_id,
               round(avg(rating), 6) AS avg_rating,
               count(*) AS review_cnt
        FROM reviews
        GROUP BY product_id
        HAVING count(*) > 10
        -- explicit NULL placement (round 16, ADVICE r15 item 3): Spark
        -- DESC defaults to NULLS LAST / ASC to NULLS FIRST while DuckDB
        -- defaults both to NULLS-LAST-for-ASC semantics, so a NULL
        -- product_id group (possible on hostile data) at the LIMIT
        -- boundary diverged; both sides now pin the same placement
        ORDER BY avg_rating DESC NULLS LAST, product_id ASC NULLS FIRST
        LIMIT 20
        """
    )


SQL_SURFACE_SQL = """
WITH reviews AS (
    SELECT user_id,
           __PRODUCT_ID__ AS product_id,
           __RATING__ AS rating
    FROM events
)
SELECT product_id,
       round(avg(rating), 6) AS avg_rating,
       count(*) AS review_cnt
FROM reviews
GROUP BY product_id
HAVING count(*) > 10
ORDER BY avg_rating DESC NULLS LAST, product_id ASC NULLS FIRST
LIMIT 20
"""


def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (mktsegment, orderpriority): all four grouping-set
    combinations in one pass."""
    orders = load_table_clean(spark, sf_dir, "orders")
    cust = load_table_clean(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


REVENUE_CUBE_SQL = """
SELECT c_mktsegment, o_orderpriority,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderpriority)
"""


def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bigram extraction + global top-50 — n-gram statistics for
    text-corpus analysis. Reuses ``operators.text.token_ngrams`` (explode +
    one lead window, all codegen, spread-guarded) — the original HOF
    ``transform`` over the token array was CodegenFallback and ran in the
    scan's (often single) partition."""
    from ..operators.text import token_ngrams

    docs = load_table(spark, sf_dir, "documents")
    exploded = token_ngrams(docs, 2).select(F.col("ngram").alias("bigram"))
    return (
        exploded.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(50)
    )


TOP_BIGRAMS_SQL = """
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
bigrams AS (
    SELECT unnest(list_transform(range(1, len(t)),
                  i -> concat(t[i], ' ', t[i + 1]))) AS bigram
    FROM toks
)
SELECT bigram, count(*) AS cnt
FROM bigrams
GROUP BY bigram
ORDER BY cnt DESC, bigram ASC
LIMIT 50
"""


def q_customer_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax aggregation (`max_by`): each customer's most recent order and
    its value, tie-broken by order key — one aggregation pass, no window
    sort. The oracle states the same result via a row_number window; result
    equality is what the gate checks, not implementation."""
    orders = load_table_clean(spark, sf_dir, "orders")
    tie = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", tie).alias("latest_orderkey"),
        F.round(F.max_by("o_totalprice", tie), 2).alias("latest_totalprice"),
        F.count(F.lit(1)).alias("n_orders"),
    )


CUSTOMER_LATEST_ORDER_SQL = """
SELECT o_custkey, latest_orderkey, latest_totalprice, n_orders FROM (
    SELECT o_custkey,
           o_orderkey AS latest_orderkey,
           -- + 0 folds IEEE -0.0 to +0.0 (Spark round() already
           -- normalizes the sign; DuckDB preserves it)
           round(o_totalprice, 2) + 0 AS latest_totalprice,
           count(*) OVER (PARTITION BY o_custkey) AS n_orders,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC)
               AS rn
    FROM orders
) WHERE rn = 1
"""


def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + cumulative window family: per customer order sequence, days
    since the previous order (lag), and running spend (ordered cumulative
    sum — sequential accumulation in BOTH engines, so the double sum is
    order-identical; prices rounded 2 dp before summing)."""
    orders = load_table_clean(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.datediff(
            F.to_date("o_orderdate"),
            F.to_date(F.lag("o_orderdate").over(w)),
        ).cast("long").alias("days_since_prev"),
        F.round(F.sum(F.round("o_totalprice", 2)).over(cum), 2).alias(
            "running_spend"
        ),
    )


CUSTOMER_ORDER_GAPS_SQL = """
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS order_seq,
       date_diff('day',
                 CAST(lag(o_orderdate) OVER w AS DATE),
                 CAST(o_orderdate AS DATE)) AS days_since_prev,
       round(sum(round(o_totalprice, 2)) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC NULLS FIRST,
                      o_orderkey ASC NULLS FIRST)
"""


# share = 3/400 (0.75%): at sf0.01 this separates the ~30 most active
# users from the other ~120 — a discriminating threshold, not return-all
HH_SHARE_NUM, HH_SHARE_DEN = 3, 400


def q_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitters (operators.sketches): users holding >= 0.75% of
    all events, with exact counts — Misra-Gries candidate pass + exact
    recount, bit-for-bit equal to the naive groupBy and therefore fully
    value-oracle-checkable."""
    from ..operators.sketches import heavy_hitters_exact

    events = load_table_clean(spark, sf_dir, "events")
    return heavy_hitters_exact(
        events, "user_id", HH_SHARE_NUM, HH_SHARE_DEN, key_type="bigint"
    )


HEAVY_USERS_SQL = f"""
WITH n AS (SELECT count(*) AS total FROM events
           WHERE user_id IS NOT NULL),
c AS (SELECT user_id, count(*) AS cnt FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id)
SELECT user_id, cnt
FROM c, n
WHERE cnt >= ({HH_SHARE_NUM} * total + {HH_SHARE_DEN - 1}) // {HH_SHARE_DEN}
"""


QUERIES: dict[str, tuple] = {
    "heavy_users": (q_heavy_users, HEAVY_USERS_SQL),
    "customer_order_gaps": (q_customer_order_gaps, CUSTOMER_ORDER_GAPS_SQL),
    "sql_surface": (q_sql_surface, SQL_SURFACE_SQL),
    "customer_latest_order": (q_customer_latest_order, CUSTOMER_LATEST_ORDER_SQL),
    "revenue_cube": (q_revenue_cube, REVENUE_CUBE_SQL),
    "top_bigrams": (q_top_bigrams, TOP_BIGRAMS_SQL),
    "revenue_rollup": (q_revenue_rollup, REVENUE_ROLLUP_SQL),
    "order_value_quantiles": (q_order_value_quantiles, ORDER_VALUE_QUANTILES_SQL),
    "nations_in_both": (q_nations_in_both, NATIONS_IN_BOTH_SQL),
    "customer_name_parse": (q_customer_name_parse, CUSTOMER_NAME_PARSE_SQL),
    "part_type_stats": (q_part_type_stats, PART_TYPE_STATS_SQL),
    "approx_supplier_counts": (q_approx_supplier_counts, None),
    "order_priority_counts": (q_order_priority_counts, ORDER_PRIORITY_COUNTS_SQL),
    "conditional_agg": (q_conditional_agg, CONDITIONAL_AGG_SQL),
    "customer_deciles": (q_customer_deciles, CUSTOMER_DECILES_SQL),
}


# Robust outlier detection: |value - median| > K_MAD * MAD per event type —
# the standard robust alternative to z-scores (median/MAD are insensitive
# to the outliers being hunted). Median and MAD are quantized to the 2^-38
# binary grid before the comparison (the pagerank/bm25 construction) so a
# 1-ULP interpolation difference between engines cannot flip a borderline
# row.
K_MAD = 3
_GRID = "CAST(274877906944 AS DOUBLE)"


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 15: events through the measure-domain contract (NaN/Inf values
    # poison the percentile), and degenerate groups (MAD = 0, >=50% of the
    # group at the median) are excluded in BOTH engines — the deviation
    # ratio is undefined there (Spark ANSI raises DIVIDE_BY_ZERO, DuckDB
    # yields inf)
    events = load_table_clean(spark, sf_dir, "events")
    grid = float(1 << 38)

    def q38(c):
        return (F.floor(c * F.lit(grid) + F.lit(0.5)).cast("double")
                / F.lit(grid))

    med = events.groupBy("event_type").agg(
        q38(F.expr("percentile(value, 0.5)")).alias("med")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            q38(
                F.expr("percentile(abs(value - med), 0.5)")
            ).alias("mad"),
            F.first("med").alias("med"),
        )
    )
    return (
        events.join(F.broadcast(mad), "event_type")
        .filter(
            (F.col("mad") > 0)
            & (F.abs(F.col("value") - F.col("med")) > K_MAD * F.col("mad"))
        )
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(
                F.abs(F.col("value") - F.col("med")) / F.col("mad"), 6
            ).alias("mad_dev"),
        )
    )


VALUE_OUTLIERS_SQL = f"""
WITH med AS (
    SELECT event_type,
           floor(quantile_cont(value, 0.5) * {_GRID} + 0.5) / {_GRID} AS med
    FROM events GROUP BY event_type
),
mad AS (
    SELECT e.event_type,
           floor(quantile_cont(abs(value - med), 0.5) * {_GRID} + 0.5)
               / {_GRID} AS mad,
           any_value(med) AS med
    FROM events e JOIN med USING (event_type)
    GROUP BY e.event_type
)
SELECT event_id, e.event_type, value,
       round(abs(value - med) / mad, 6) AS mad_dev
FROM events e JOIN mad USING (event_type)
WHERE mad > 0 AND abs(value - med) > {K_MAD} * mad
"""


# defined after the dict literal because the function lives at the end of
# the module; same (spark_fn, oracle_sql) contract as every other entry
QUERIES["value_outliers"] = (q_value_outliers, VALUE_OUTLIERS_SQL)


EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def q_user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event counts spread across one column per event
    type (explicit value list — deterministic schema, single-pass
    partial-aggregated grouping underneath). Missing combinations filled
    with 0 to match the conditional-aggregation oracle."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


USER_EVENT_PIVOT_SQL = """
SELECT user_id,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS error
FROM events
GROUP BY user_id
"""

QUERIES["user_event_pivot"] = (q_user_event_pivot, USER_EVENT_PIVOT_SQL)


PROFILE_TABLE = "orders"


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of a table in long format: per column, the
    row count, null count, and exact distinct count — the monitoring
    query a warehouse runs after every load. ONE aggregation pass
    computes every column's metrics side by side (a per-column agg loop
    would re-scan the table once per column); a stack expression then
    melts the single wide row to long format. Exact integer outputs keep
    the oracle trivial."""
    df = load_table(spark, sf_dir, PROFILE_TABLE)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in df.columns:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"_nn_{c}"
            )
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}" for c in df.columns
    )
    return wide.select(
        F.expr(
            f"stack({len(df.columns)}, {stack_args})"
        ).alias("column_name", "n_nulls", "n_distinct"),
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


TABLE_PROFILE_SQL = """
SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
       count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
       count(DISTINCT o_orderkey) AS n_distinct FROM orders
UNION ALL
SELECT 'o_custkey', count(*),
       count(CASE WHEN o_custkey IS NULL THEN 1 END),
       count(DISTINCT o_custkey) FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*),
       count(CASE WHEN o_orderstatus IS NULL THEN 1 END),
       count(DISTINCT o_orderstatus) FROM orders
UNION ALL
SELECT 'o_totalprice', count(*),
       count(CASE WHEN o_totalprice IS NULL THEN 1 END),
       count(DISTINCT o_totalprice) FROM orders
UNION ALL
SELECT 'o_orderdate', count(*),
       count(CASE WHEN o_orderdate IS NULL THEN 1 END),
       count(DISTINCT o_orderdate) FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*),
       count(CASE WHEN o_orderpriority IS NULL THEN 1 END),
       count(DISTINCT o_orderpriority) FROM orders
"""

QUERIES["table_profile"] = (q_table_profile, TABLE_PROFILE_SQL)


def q_revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id: revenue by (status), by
    (priority), and the grand total in one pass — the custom-grouping-set
    shape CUBE/ROLLUP can't express (no (status, priority) pair level)."""
    orders = load_table_clean(spark, sf_dir, "orders")
    gs = orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    )
    return gs.agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


REVENUE_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
            AS BIGINT) AS gid,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

QUERIES["revenue_grouping_sets"] = (
    q_revenue_grouping_sets,
    REVENUE_GROUPING_SETS_SQL,
)


def q_lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt, the inverse of `user_event_pivot`): the
    four lineitem measures as (orderkey, linenumber, measure, value) rows
    via the `stack` table-generating expression — one scan, no joins."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(4, 'quantity', l_quantity, 'extendedprice',"
            " l_extendedprice, 'discount', l_discount, 'tax', l_tax)"
        ).alias("measure", "value"),
    )


LINEITEM_MEASURES_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
       l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
"""

QUERIES["lineitem_measures_unpivot"] = (
    q_lineitem_measures_unpivot,
    LINEITEM_MEASURES_UNPIVOT_SQL,
)


# Count-min sketch frequency profile. Width deliberately modest so cell
# collisions actually occur at test SF (est > exact on some probes) — the
# oracle reproduces the over-estimates exactly, collisions included.
CMS_WIDTH, CMS_DEPTH = 256, 4
CMS_PROBE_LO, CMS_PROBE_HI = 1, 50  # probe part keys [1, 50]


def q_cms_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch line-count estimates per part (operators.sketches):
    build a depth x width sketch over lineitem.l_partkey — fixed-size
    state, shuffle bounded by depth*width cells per task regardless of part
    cardinality — then probe part keys [1, 50] against the broadcast
    sketch, alongside the exact counts of just those keys (probe-set
    semi-join first, so the exact pass's shuffle is bounded by the probe
    set too). est_cnt >= exact_cnt always; equality where no cell
    collision. Fully value-checked: positions use the portable md5 hash,
    so DuckDB rebuilds every counter bit-for-bit."""
    from ..operators.sketches import cms_build, cms_estimate

    li = load_table(spark, sf_dir, "lineitem")
    sketch = cms_build(li, "l_partkey", CMS_WIDTH, CMS_DEPTH)
    probes = spark.range(CMS_PROBE_LO, CMS_PROBE_HI + 1).select(
        F.col("id").alias("l_partkey")
    )
    est = cms_estimate(sketch, probes, "l_partkey", CMS_WIDTH, CMS_DEPTH)
    exact = (
        li.join(F.broadcast(probes), "l_partkey", "left_semi")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return (
        est.join(exact, "l_partkey", "left")
        .select(
            "l_partkey",
            "est_cnt",
            F.coalesce("exact_cnt", F.lit(0)).alias("exact_cnt"),
        )
    )


CMS_PART_COUNTS_SQL = f"""
WITH keys AS (
    SELECT CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)
               AS BIGINT) AS h1,
           CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 9, 8)
               AS BIGINT) | 1 AS h2
    FROM lineitem WHERE l_partkey IS NOT NULL
),
cells AS (
    SELECT r, (h1 + r * h2) % {CMS_WIDTH} AS j, count(*) AS cnt
    FROM keys CROSS JOIN (SELECT unnest(range(0, {CMS_DEPTH})) AS r) d
    GROUP BY r, j
),
probes AS (SELECT unnest(range({CMS_PROBE_LO}, {CMS_PROBE_HI + 1})) AS p),
addressed AS (
    SELECT p, r,
           (CAST('0x' || substr(md5(CAST(p AS VARCHAR)), 1, 8) AS BIGINT)
            + r * (CAST('0x' || substr(md5(CAST(p AS VARCHAR)), 9, 8)
                        AS BIGINT) | 1)) % {CMS_WIDTH} AS j
    FROM probes CROSS JOIN (SELECT unnest(range(0, {CMS_DEPTH})) AS r) d
),
est AS (
    SELECT a.p, min(coalesce(c.cnt, 0)) AS est_cnt
    FROM addressed a LEFT JOIN cells c ON c.r = a.r AND c.j = a.j
    GROUP BY a.p
),
exact AS (
    SELECT l_partkey, count(*) AS exact_cnt FROM lineitem
    WHERE l_partkey BETWEEN {CMS_PROBE_LO} AND {CMS_PROBE_HI}
    GROUP BY l_partkey
)
SELECT CAST(e.p AS BIGINT) AS l_partkey,
       e.est_cnt,
       coalesce(x.exact_cnt, 0) AS exact_cnt
FROM est e LEFT JOIN exact x ON x.l_partkey = e.p
"""

QUERIES["cms_part_counts"] = (q_cms_part_counts, CMS_PART_COUNTS_SQL)


# Log-histogram approximate quantiles: the fixed-state counterpart of
# `order_value_quantiles` (exact percentiles materialize per-group value
# multisets; the histogram is ~8*64 cells however large the table).
APPROX_Q = [(1, 2), (9, 10), (95, 100), (99, 100)]


def q_approx_order_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate o_totalprice quantiles from a log-scale histogram
    (operators.sketches.log_histogram): octave + 8 sub-buckets → 12.5%
    relative bucket width; the estimate is the first bucket's lower bound
    at rank ceil(q*n), all integer-exact arithmetic — fully value-checked
    (unlike t-digest/KLL, whose merge order changes results). est is in
    CENTS (the fixed-point scale), so true_p <= est/100 * 1.125."""
    from ..operators.sketches import histogram_quantiles, log_histogram

    orders = load_table_clean(spark, sf_dir, "orders")
    hist = log_histogram(orders, "o_totalprice", scale=100)
    return histogram_quantiles(hist, APPROX_Q)


_Q_VALUES = ", ".join(f"({n}, {d})" for n, d in APPROX_Q)
APPROX_ORDER_QUANTILES_SQL = f"""
WITH nv AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS n
    FROM orders
    WHERE floor(o_totalprice * 100 + 0.5) >= 1
),
hist AS (
    SELECT length(bin(n)) - 1 AS b,
           CASE WHEN length(bin(n)) - 1 >= 3
                THEN n >> (length(bin(n)) - 4)
                ELSE n END AS p,
           count(*) AS cnt
    FROM nv GROUP BY 1, 2
),
cum AS (
    SELECT b, p, cnt,
           sum(cnt) OVER (ORDER BY b, p ROWS UNBOUNDED PRECEDING) AS cum
    FROM hist
),
tot AS (SELECT sum(cnt) AS total FROM hist),
qs(q_num, q_den) AS (VALUES {_Q_VALUES})
SELECT q.q_num, q.q_den,
       min(CASE WHEN c.b >= 3 THEN c.p << (c.b - 3) ELSE c.p END) AS est
FROM qs q CROSS JOIN tot t
JOIN cum c ON c.cum >= (q.q_num * t.total + q.q_den - 1) // q.q_den
GROUP BY q.q_num, q.q_den
"""

QUERIES["approx_order_quantiles"] = (
    q_approx_order_quantiles,
    APPROX_ORDER_QUANTILES_SQL,
)


HLL_M = 1 << 8  # operators.sketches.HLL_B = 8
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def q_hll_part_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HyperLogLog distinct-part estimate over lineitem, with the
    exact count alongside (operators.sketches.hll_registers/estimate) —
    the cross-engine-checkable twin of `approx_supplier_counts` (whose
    Spark-private HLL++ hash keeps it rows-only). Register table and
    estimator arithmetic are reproduced bit-for-bit by the DuckDB oracle;
    the register sum is exact in doubles (dyadic rationals), so the
    estimate is deterministic. Fixed 256-cell state at any cardinality.

    Round 17 (guide §2.3/§2.4): the query carries an EXACT distinct
    audit, which already pays a full distinct-key shuffle — so the
    sketch is now derived from that same distinct pass instead of a
    second scan (registers over the distinct key set are identical to
    registers over the raw rows: same hash per key, max-merge is
    idempotent). One lineitem scan instead of two, and the md5 register
    hash runs once per DISTINCT key instead of once per row. The pure
    fixed-state-off-the-scan shape (no exact audit, no distinct shuffle)
    remains exactly what ``hll_brand_distinct`` exercises."""
    from ..operators.sketches import hll_estimate, hll_registers

    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        li.select("l_partkey")
        .filter(F.col("l_partkey").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    est = hll_estimate(hll_registers(keys, "l_partkey"))
    exact = keys.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return est.crossJoin(exact)




def _hll_est_sql(sum_expr: str = "s", nz: str = "nonzero") -> str:
    """The HLL estimator CASE — ONE SQL definition for both oracle
    queries (global and per-group), mirroring operators.sketches'
    shared ``_hll_guarded_est``."""
    raw = (f"(CAST({_HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M})"
           f" / ({sum_expr} + ({HLL_M} - {nz}))")
    return (
        f"round(CASE WHEN {raw} <= 2.5 * {HLL_M} AND ({HLL_M} - {nz}) > 0 "
        f"THEN CAST({HLL_M} AS DOUBLE) "
        f"* ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - {nz})) "
        f"ELSE {raw} END, 4)"
    )


HLL_PART_DISTINCT_SQL = f"""
WITH h AS (
    SELECT CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)
                AS BIGINT) AS hv
    FROM lineitem WHERE l_partkey IS NOT NULL
),
reg AS (
    SELECT CAST(hv % {HLL_M} AS INT) AS bucket,
           max(CASE WHEN hv // {HLL_M} = 0 THEN {33 - 8}
                    ELSE {33 - 8} - length(bin(hv // {HLL_M})) END) AS rho
    FROM h GROUP BY bucket
),
agg AS (
    SELECT coalesce(sum(power(2.0, -rho)), 0.0) AS s,
           count(*) AS nonzero
    FROM reg
)
SELECT {_hll_est_sql()} AS est,
       (SELECT count(DISTINCT l_partkey) FROM lineitem) AS exact_distinct
FROM agg
"""

QUERIES["hll_part_distinct"] = (q_hll_part_distinct, HLL_PART_DISTINCT_SQL)


def q_hll_brand_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP portable HLL: distinct-SUPPLIER estimates per part brand
    — the exact query shape of `approx_supplier_counts` (round 13: both
    switched from the order key to the supplier key their names promise),
    but with the md5-register sketch both engines reproduce, so the
    driver can hash-check the ESTIMATES (the built-in HLL++ variant stays
    rows-only). State <= 256 cells per brand; one (brand, bucket)
    partial agg."""
    from ..operators.sketches import hll_estimate_by, hll_registers_by

    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select("p_brand", "l_suppkey")
    regs = hll_registers_by(joined, "p_brand", "l_suppkey")
    return hll_estimate_by(regs, "p_brand")


HLL_BRAND_DISTINCT_SQL = f"""
WITH j AS (
    SELECT p_brand,
           CAST('0x' || substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 8)
                AS BIGINT) AS hv
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_suppkey IS NOT NULL
),
reg AS (
    SELECT p_brand, CAST(hv % {HLL_M} AS INT) AS bucket,
           max(CASE WHEN hv // {HLL_M} = 0 THEN {33 - 8}
                    ELSE {33 - 8} - length(bin(hv // {HLL_M})) END) AS rho
    FROM j GROUP BY p_brand, bucket
),
agg AS (
    SELECT p_brand,
           sum(power(2.0, -rho)) AS s,
           count(*) AS nonzero
    FROM reg GROUP BY p_brand
)
SELECT p_brand, {_hll_est_sql()} AS est
FROM agg
"""

QUERIES["hll_brand_distinct"] = (q_hll_brand_distinct, HLL_BRAND_DISTINCT_SQL)


def q_hll_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based set overlap — the set operation HLL alone cannot
    answer: distinct (user, product) CLICK interactions and PURCHASE
    interactions (the column names say _pairs because that is the grain
    computed — round-13 review: they previously claimed user counts; the
    PAIR grain is deliberate, see the inline note), their union via
    the register merge (per-bucket max — the only set op HLL supports
    natively), and the INTERSECTION by inclusion-exclusion
    |A∩B| ≈ |A| + |B| − |A∪B| (Flajolet's standard composition; error
    compounds, which is why the exact counts ride alongside — the audit a
    real deployment keeps until it trusts the sketch). All three
    estimates come from the portable md5 register tables, so the whole
    row value-oracles; overlap_ratio = intersection / union, one IEEE
    division of two deterministic estimates.

    Scale design (100 TB): two filtered scans → 256-cell register tables;
    merge and estimate are metadata-sized. At real scale the register
    tables are the stored per-segment sketches and this query never
    rescans the fact."""
    from ..operators.sketches import hll_estimate, hll_merge, hll_registers

    # (user, product) PAIR grain — users all do everything on this dense
    # generator, but interaction pairs overlap only partially, so the
    # estimates run in HLL's real regime (beyond linear counting)
    # NULL parity with the oracle: DuckDB's `||` null-propagates (a row
    # with missing $.k OR missing user_id produces a NULL pair, dropped
    # by count DISTINCT and the register build's IS NOT NULL guard),
    # while Spark's concat_ws silently skips NULLs and would keep a
    # truncated key — filter BOTH key parts explicitly before building
    # the pair. The key uses the canonical strict product_id (round 15:
    # raw $.k strings diverge between JSON parsers on malformed props).
    from ..sources.tables import product_id_col

    pid = product_id_col()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(pid.isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.concat_ws(
                ":",
                F.col("user_id").cast("string"),
                pid.cast("string"),
            ).alias("pair"),
        )
    )
    # Round 17 (guide §2.3/§2.4): the exact-pair audit already pays a
    # full distinct shuffle of the (event_type, pair) space, so ONE
    # distinct pass now feeds the sketches AND the exact counts —
    # registers over the distinct pair set equal registers over the raw
    # stream (same hash per key, max-merge idempotent). Events is
    # scanned once instead of three times, and the md5 register hash
    # runs per DISTINCT pair instead of per event row.
    dk = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    clicks = dk.filter(F.col("event_type") == "click")
    purch = dk.filter(F.col("event_type") == "purchase")
    ra = hll_registers(clicks, "pair").localCheckpoint()
    rb = hll_registers(purch, "pair").localCheckpoint()
    ea = hll_estimate(ra).select(F.col("est").alias("est_click_pairs"))
    eb = hll_estimate(rb).select(F.col("est").alias("est_purchase_pairs"))
    eu = hll_estimate(hll_merge(ra, rb)).select(
        F.col("est").alias("est_union")
    )
    # coalesce: agg over an EMPTY distinct relation yields NULL sums
    # where countDistinct yielded 0 — keep the 0
    exact = dk.agg(
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)),
            F.lit(0).cast("long"),
        ).alias("exact_click_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)),
            F.lit(0).cast("long"),
        ).alias("exact_purchase_pairs"),
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_click_pairs",
            "est_purchase_pairs",
            "est_union",
            F.round(
                F.col("est_click_pairs")
                + F.col("est_purchase_pairs")
                - F.col("est_union"),
                4,
            ).alias("est_intersection"),
            F.round(
                (
                    F.col("est_click_pairs")
                    + F.col("est_purchase_pairs")
                    - F.col("est_union")
                )
                / F.col("est_union"),
                6,
            ).alias("overlap_ratio"),
        )
        .crossJoin(exact)
    )


_HLL_PAIR = ("CAST(user_id AS VARCHAR) || ':' || "
             "CAST(__PRODUCT_ID__ AS VARCHAR)")


def _hll_reg_sql(pred: str) -> str:
    return f"""(
    SELECT CAST(hv % {HLL_M} AS INT) AS bucket,
           max(CASE WHEN hv // {HLL_M} = 0 THEN {33 - 8}
                    ELSE {33 - 8} - length(bin(hv // {HLL_M})) END) AS rho
    FROM (
        SELECT CAST('0x' || substr(md5({_HLL_PAIR}), 1, 8)
                    AS BIGINT) AS hv
        FROM events WHERE {_HLL_PAIR} IS NOT NULL AND {pred}
    ) GROUP BY bucket
)"""


HLL_SET_OVERLAP_SQL = f"""
WITH ra AS MATERIALIZED {_hll_reg_sql("event_type = 'click'")},
rb AS MATERIALIZED {_hll_reg_sql("event_type = 'purchase'")},
ru AS (
    SELECT bucket, max(rho) AS rho
    FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY bucket
),
ea AS (SELECT coalesce(sum(power(2.0, -rho)), 0.0) AS s,
              count(*) AS nonzero FROM ra),
eb AS (SELECT coalesce(sum(power(2.0, -rho)), 0.0) AS s,
              count(*) AS nonzero FROM rb),
eu AS (SELECT coalesce(sum(power(2.0, -rho)), 0.0) AS s,
              count(*) AS nonzero FROM ru),
est AS (
    SELECT (SELECT {_hll_est_sql()} FROM ea) AS est_click_pairs,
           (SELECT {_hll_est_sql()} FROM eb) AS est_purchase_pairs,
           (SELECT {_hll_est_sql()} FROM eu) AS est_union
)
SELECT est_click_pairs, est_purchase_pairs, est_union,
       round(est_click_pairs + est_purchase_pairs - est_union, 4)
           AS est_intersection,
       round((est_click_pairs + est_purchase_pairs - est_union) / est_union, 6)
           AS overlap_ratio,
       (SELECT count(DISTINCT CAST(user_id AS VARCHAR) || ':'
                              || CAST(__PRODUCT_ID__ AS VARCHAR))
        FROM events WHERE event_type = 'click') AS exact_click_pairs,
       (SELECT count(DISTINCT CAST(user_id AS VARCHAR) || ':'
                              || CAST(__PRODUCT_ID__ AS VARCHAR))
        FROM events WHERE event_type = 'purchase') AS exact_purchase_pairs
FROM est
"""

QUERIES["hll_set_overlap"] = (q_hll_set_overlap, HLL_SET_OVERLAP_SQL)


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: per ship month, the percentage of gross discounted
    revenue that comes from PROMO-type parts. One lineitem scan, part dim
    broadcast, conditional partial agg — the scan-bound plan a 100 TB fact
    table wants (no shuffle of lineitem beyond the month-key agg)."""
    li = load_table_clean(spark, sf_dir, "lineitem")
    part = load_table_clean(spark, sf_dir, "part")
    # exact integer-cents revenue grid (same recipe as nation_trade_flows):
    # round(sum(double), 2) differs between engines at half-cent boundaries,
    # so both the total and the percentage are derived from exact BIGINT
    # sums — the pct is an integer half-up division, never a double round.
    # (BIGINT headroom: ≤1e9/item × monthly group sizes at the test SFs;
    # a 100 TB deployment would swap the e4 grid for DECIMAL(38,4).)
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100).cast("long") - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .withColumn("rev_e4", rev_e4)
        .withColumn(
            "promo_e4",
            F.when(F.col("p_type") == "PROMO", F.col("rev_e4")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            # the ×100000 pct numerator goes through DECIMAL(38,0): a
            # BIGINT intermediate would silently wrap once a month's
            # promo_e4 sum passes ~9.2e13 (≈ $9.2e9 of monthly promo
            # revenue), while DuckDB auto-promotes its sum to HUGEINT —
            # decimal keeps both engines exact to 38 digits
            (
                F.expr(
                    "(CAST(sum(promo_e4) AS DECIMAL(38,0)) * 100000"
                    " + sum(rev_e4) DIV 2) DIV sum(rev_e4)"
                ).cast("double")
                / F.lit(1000.0)
            ).alias("promo_pct"),
            (
                F.expr("(sum(rev_e4) + 50) DIV 100").cast("double") / F.lit(100.0)
            ).alias("total_revenue"),
        )
    )


PROMO_REVENUE_SQL = """
WITH j AS (
    SELECT date_trunc('month', l_shipdate) AS ship_month,
           CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4,
           CASE WHEN p_type = 'PROMO'
                THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                ELSE 0 END AS promo_e4
    FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT CAST(ship_month AS TIMESTAMP) AS ship_month,
       CAST((100000 * sum(promo_e4) + sum(rev_e4) // 2)
            // sum(rev_e4) AS DOUBLE) / 1000.0 AS promo_pct,
       CAST((sum(rev_e4) + 50) // 100 AS DOUBLE) / 100.0 AS total_revenue
FROM j
GROUP BY 1
"""


QUERIES["promo_revenue"] = (q_promo_revenue, PROMO_REVENUE_SQL)


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum discounted revenue
    over a fixed ship-date quarter — the revenue view is aggregated once,
    the max is a broadcast single-row join back (no window over the whole
    supplier set), and ties are all returned (deterministic set)."""
    li = load_table_clean(spark, sf_dir, "lineitem")
    sup = load_table_clean(spark, sf_dir, "supplier")
    # exact integer-cents grid: the max lookup and the equi-join back both
    # run on the exact BIGINT sum, so a half-cent rounding flip can never
    # change WHICH supplier wins; the double conversion happens once, on
    # the already-selected row(s).
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100).cast("long") - F.round(F.col("l_discount") * 100).cast("long")
    )
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .withColumn("rev_e4", rev_e4)
        .groupBy("l_suppkey")
        .agg(F.sum("rev_e4").alias("rev_e4s"))
    )
    mx = revenue.agg(F.max("rev_e4s").alias("rev_e4s"))
    return (
        revenue.join(F.broadcast(mx), "rev_e4s")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            (
                F.expr("(rev_e4s + 50) DIV 100").cast("double") / F.lit(100.0)
            ).alias("total_revenue"),
        )
    )


TOP_SUPPLIER_SQL = """
WITH revenue AS (
    SELECT l_suppkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_e4s
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST((rev_e4s + 50) // 100 AS DOUBLE) / 100.0 AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_e4s = (SELECT max(rev_e4s) FROM revenue)
"""


QUERIES["top_supplier"] = (q_top_supplier, TOP_SUPPLIER_SQL)


def q_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender training-set construction (operators.training): every
    liked (user, product) pair labeled 1 plus an equal number of
    deterministic hash-sampled negatives per user labeled 0 — seeded-hash
    negative sampling, so the sampled dataset itself is value-checkable."""
    from ..operators.training import negative_sampled_pairs
    from ..sources.tables import reviews_from_events

    reviews = reviews_from_events(spark, sf_dir)
    liked = (
        reviews.filter((F.col("user_id") < 1000) & (F.col("rating") > 3.0))
        .select("user_id", "product_id")
        .distinct()
    )
    items = reviews.select("product_id").distinct()
    return negative_sampled_pairs(liked, items)


TRAINING_PAIRS_SQL = """
WITH reviews AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           __PRODUCT_ID__ AS product_id,
           __RATING__ AS rating
    FROM events
),
pos AS (
    -- NULL keys excluded to mirror the operator's NULL-free hash domain
    SELECT DISTINCT user_id, product_id FROM reviews
    WHERE user_id < 1000 AND rating > 3.0 AND product_id IS NOT NULL
),
k AS (SELECT user_id, count(*) AS _k FROM pos GROUP BY user_id),
items AS (
    SELECT DISTINCT product_id FROM reviews WHERE product_id IS NOT NULL
),
cand AS (
    SELECT k.user_id, i.product_id, k._k,
           md5('negsample' || '|' || CAST(k.user_id AS VARCHAR)
               || '|' || CAST(i.product_id AS VARCHAR)) AS _h
    FROM k CROSS JOIN items i
    ANTI JOIN pos p ON p.user_id = k.user_id AND p.product_id = i.product_id
),
negs AS (
    SELECT user_id, product_id FROM (
        SELECT user_id, product_id, _k,
               row_number() OVER (PARTITION BY user_id ORDER BY _h ASC) AS rn
        FROM cand
    ) WHERE rn <= _k
)
SELECT user_id, product_id, CAST(1 AS BIGINT) AS label FROM pos
UNION ALL
SELECT user_id, product_id, CAST(0 AS BIGINT) AS label FROM negs
"""


QUERIES["training_pairs"] = (q_training_pairs, TRAINING_PAIRS_SQL)


def q_click_conversion_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised conversion labels (operators.training): each click event
    marked with whether the same user purchased within the next hour
    (window start inclusive at the truncated second — a strict > labeled
    sub-second conversions as negatives; round-13 review) — bucketed
    (user, window) equi-join, never an unbounded theta join."""
    from ..operators.training import conversion_labels

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("CAST(ts DIV 1000000000 AS BIGINT)").alias("s"),
    )
    return conversion_labels(ev)


CLICK_CONVERSION_LABELS_SQL = """
WITH ev AS (
    SELECT event_id, user_id, event_type,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s
    FROM events
),
clicks AS (SELECT event_id, user_id, s FROM ev WHERE event_type = 'click'),
purch AS (SELECT user_id, s FROM ev WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id, c.s,
       EXISTS (SELECT 1 FROM purch p
               WHERE p.user_id = c.user_id
                 AND p.s >= c.s AND p.s <= c.s + 3600) AS converted
FROM clicks c
"""


QUERIES["click_conversion_labels"] = (
    q_click_conversion_labels,
    CLICK_CONVERSION_LABELS_SQL,
)


def q_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: discounted revenue between (supplier nation →
    customer nation) pairs per ship year — the 6-way join (lineitem ⨝
    orders ⨝ customer ⨝ supplier ⨝ nation ⨝ nation). Both nation dims
    broadcast; the fact-fact join (lineitem ⨝ orders) carries only the
    keys + measures, and Catalyst reorders the dim joins freely."""
    li = load_table_clean(spark, sf_dir, "lineitem")
    orders = load_table_clean(spark, sf_dir, "orders")
    cust = load_table_clean(spark, sf_dir, "customer")
    sup = load_table_clean(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    # exact integer-cents revenue grid: prices/discounts are 2-dp in the
    # data, so cents × (100 − pct) is an exact BIGINT per item and the SUM
    # is order-independent — round(sum(double),2) would differ between
    # engines exactly at a half-cent boundary (observed: single-item
    # groups off by 0.01 between Spark's BigDecimal HALF_UP and DuckDB's
    # float rounding)
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100).cast("long") - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(n1), sup["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("c_nk"))
        .withColumn("rev_e4", rev_e4)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            # integer half-up to CENTS, then one exact division: both
            # engines round the same BIGINT and map the same rational to
            # the same double — no double-rounding function in the path
            (
                F.expr("(sum(rev_e4) + 50) DIV 100").cast("double") / F.lit(100.0)
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


NATION_TRADE_FLOWS_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50)
            // 100 AS DOUBLE) / 100.0 AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
GROUP BY 1, 2, 3
"""


QUERIES["nation_trade_flows"] = (q_nation_trade_flows, NATION_TRADE_FLOWS_SQL)


def q_special_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three (brand AND size AND
    quantity-range) conjunctions — the disjunctive-predicate pattern that
    tests Catalyst's boolean simplification + pushdown. One row out."""
    li = load_table_clean(spark, sf_dir, "lineitem")
    part = load_table_clean(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 35))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(20, 50))
            & (F.col("l_quantity").between(20, 50))
        )
    )
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100).cast("long") - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        joined.filter(cond)
        .withColumn("rev_e4", rev_e4)
        .agg(
            (
                F.expr("(sum(rev_e4) + 50) DIV 100").cast("double") / F.lit(100.0)
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SPECIAL_DISCOUNT_REVENUE_SQL = """
SELECT CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50)
            // 100 AS DOUBLE) / 100.0 AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


QUERIES["special_discount_revenue"] = (
    q_special_discount_revenue,
    SPECIAL_DISCOUNT_REVENUE_SQL,
)


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated per-group scalar subquery): yearly-ized
    revenue from orders of a brand's parts whose quantity is below 20% of
    that part's average order quantity. Spark-first rewrite: the
    correlated subquery becomes ONE per-part aggregate joined back — the
    fact table is scanned twice (once for the stats, once for the probe),
    never once per part. Engine-exactness: quantities are integral, so
    the 0.2·avg test multiplies out to exact BIGINTs
    (5·n·qty < sum_qty ⟺ qty < 0.2·avg), and revenue sums on the
    integer-cents grid."""
    li = load_table_clean(spark, sf_dir, "lineitem")
    part = load_table_clean(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    )
    qty = F.round(F.col("l_quantity")).cast("long")
    per_part = (
        li.select("l_partkey", qty.alias("q"))
        .groupBy("l_partkey")
        .agg(F.sum("q").alias("sum_q"), F.count(F.lit(1)).alias("n_q"))
    )
    price_e2 = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.select("l_partkey", qty.alias("q"), price_e2.alias("p_e2"))
        .join(F.broadcast(part.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, "l_partkey")
        .filter(F.lit(5) * F.col("n_q") * F.col("q") < F.col("sum_q"))
        .agg(
            (
                F.sum("p_e2").cast("double") / F.lit(100.0) / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH per_part AS (
    SELECT l_partkey,
           sum(CAST(round(l_quantity) AS BIGINT)) AS sum_q,
           count(*) AS n_q
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
           / 100.0 / 7.0 AS avg_yearly,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
JOIN per_part USING (l_partkey)
WHERE 5 * n_q * CAST(round(l_quantity) AS BIGINT) < sum_q
"""

QUERIES["small_quantity_revenue"] = (
    q_small_quantity_revenue,
    SMALL_QUANTITY_REVENUE_SQL,
)


def q_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share): NATION_7's share of discounted
    revenue among ASIA-region customers per order year — the 7-way join
    (lineitem ⨝ orders ⨝ customer ⨝ supplier + broadcast nation×2/region)
    with a conditional-share aggregate. Revenue on the exact integer-cents
    grid; the share is one double division of exact BIGINTs rounded at
    6 dp (identical quotient bits cross-engine — the accepted
    personalized_pagerank rounding stance)."""
    li = load_table_clean(spark, sf_dir, "lineitem")
    orders = load_table_clean(spark, sf_dir, "orders")
    cust = load_table_clean(spark, sf_dir, "customer")
    sup = load_table_clean(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    cn = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select(F.col("n_nationkey").alias("c_nk"))
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100).cast("long") - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cn), cust["c_nationkey"] == F.col("c_nk"))
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(sn), sup["s_nationkey"] == F.col("s_nk"))
        .withColumn("rev_e4", rev_e4)
        .withColumn(
            "focal_e4",
            F.when(
                F.col("supp_nation") == "NATION_7", F.col("rev_e4")
            ).otherwise(F.lit(0).cast("long")),
        )
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum("focal_e4").cast("double") / F.sum("rev_e4").cast("double"),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


NATIONAL_MARKET_SHARE_SQL = """
WITH j AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4,
           CASE WHEN sn.n_name = 'NATION_7'
                THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                ELSE 0 END AS focal_e4
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
)
SELECT o_year,
       round(CAST(sum(focal_e4) AS DOUBLE) / CAST(sum(rev_e4) AS DOUBLE), 6)
           AS mkt_share,
       count(*) AS n_items
FROM j GROUP BY o_year
"""

QUERIES["national_market_share"] = (
    q_national_market_share,
    NATIONAL_MARKET_SHARE_SQL,
)


def q_skew_safe_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (operators.skew.salted_aggregate) on
    the engine's most skewed key — event_type has ~4 values over the whole
    fact table, so a plain groupBy funnels everything into 4 reducers.
    The salted form aggregates on (key, salt) first (spreading each hot
    key over 16 partials) and combines second; output is EXACTLY the
    plain groupBy (integer measures, so the value oracle proves the
    two-stage reduction end-to-end — the explicit tool for skew AQE's
    join splitting cannot fix, SURVEY §4)."""
    from ..operators.skew import salted_aggregate

    ev = load_table_clean(spark, sf_dir, "events").select(
        "event_type", F.floor("value").cast("long").alias("v_int")
    )
    s = salted_aggregate(ev, "event_type", "v_int", "sum")
    c = salted_aggregate(ev, "event_type", "v_int", "count")
    # null-safe combine (round 15 adversarial find): a plain equi-join
    # here silently DROPPED the NULL event_type group that both salted
    # aggregates correctly produced — groupBy keeps a NULL key, equi-join
    # doesn't match it
    return s.join(
        c, s["event_type"].eqNullSafe(c["event_type"])
    ).select(
        s["event_type"].alias("event_type"), "sum_v_int", "count_v_int"
    )


SKEW_SAFE_EVENT_STATS_SQL = """
SELECT event_type,
       CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_v_int,
       count(CAST(floor(value) AS BIGINT)) AS count_v_int
FROM events
GROUP BY event_type
"""

QUERIES["skew_safe_event_stats"] = (
    q_skew_safe_event_stats,
    SKEW_SAFE_EVENT_STATS_SQL,
)


def q_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative spend per customer over their order history —
    the UNBOUNDED-PRECEDING window frame (the one ranking-window family
    member not yet registered: rank/ntile/lag/max_by all are). Exact
    integer-cents accumulation so every prefix sum is engine-identical;
    (o_orderdate, o_orderkey) ordering makes the frame total and
    deterministic. At scale this is one range-partitioned sort per
    customer partition — no global sort."""
    orders = load_table_clean(spark, sf_dir, "orders").withColumn(
        "price_e2", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum("price_e2").over(w).cast("double") / F.lit(100.0)
        ).alias("running_spend"),
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
            )
        )
        .cast("long")
        .alias("order_seq"),
    )


CUSTOMER_RUNNING_SPEND_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC NULLS FIRST,
                               o_orderkey ASC NULLS FIRST
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 100.0 AS running_spend,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate ASC NULLS FIRST,
                                        o_orderkey ASC NULLS FIRST)
            AS BIGINT) AS order_seq
FROM orders
"""

QUERIES["customer_running_spend"] = (
    q_customer_running_spend,
    CUSTOMER_RUNNING_SPEND_SQL,
)


def q_price_size_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation / covariance / stddev per part brand — computed
    from EXACT INTEGER sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy² on
    the cents/size grids) rather than the engines' native corr()/stddev()
    aggregates, whose float accumulation differs cross-engine. The five
    sums are one partial-agg pass (the mergeable-statistics pattern every
    distributed stats library uses); the final formula is a single double
    expression over identical BIGINTs, so the 6-dp values hash-match."""
    # sufficient-statistics domain (round 15): the exact-BIGINT pattern
    # squares its inputs, so the generic 1e9 price contract is NOT tight
    # enough here ((1e11 cents)² overflows) — this query's own domain is
    # price < 1e6 and |size| < 1e4, mirrored in the oracle's WHERE
    from ..operators._util import finite_measure

    part = (
        load_table_clean(spark, sf_dir, "part")
        .filter(
            finite_measure("p_retailprice", 1e6)
            & (F.abs(F.col("p_size")) < 10000)
        )
        .select(
            "p_brand",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("x"),
            F.col("p_size").cast("long").alias("y"),
        )
    )
    s = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_num = (n * sxy - sx * sy).cast("double")
    vx = (n * sxx - sx * sx).cast("double")
    vy = (n * syy - sy * sy).cast("double")
    # degenerate-group guard (n=1 or zero variance): Spark's non-ANSI
    # double division yields NULL on a zero divisor where DuckDB yields
    # NaN/inf — exclude such groups in BOTH engines (the clustering_coeff
    # deg>=2 stance) rather than hash-mismatch on them
    s = s.filter(
        (n > 1)
        & (n * sxx - sx * sx > 0)
        & (n * syy - sy * sy > 0)
    )
    return s.select(
        "p_brand",
        "n",
        F.round(cov_num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("price_size_corr"),
        F.round(
            cov_num / (n * (n - 1)).cast("double") / F.lit(100.0), 6
        ).alias("sample_cov"),
        F.round(
            F.sqrt(vx / (n * (n - 1)).cast("double")) / F.lit(100.0), 6
        ).alias("price_stddev"),
    )


PRICE_SIZE_CORRELATION_SQL = """
WITH s AS (
    SELECT p_brand,
           count(*) AS n,
           sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS sx,
           sum(CAST(p_size AS BIGINT)) AS sy,
           sum(CAST(round(p_retailprice * 100) AS BIGINT)
               * CAST(p_size AS BIGINT)) AS sxy,
           sum(CAST(round(p_retailprice * 100) AS BIGINT)
               * CAST(round(p_retailprice * 100) AS BIGINT)) AS sxx,
           sum(CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT)) AS syy
    FROM part
    WHERE abs(p_retailprice) < 1000000.0 AND abs(p_size) < 10000
    GROUP BY p_brand
)
SELECT p_brand, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
           AS price_size_corr,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * (n - 1) AS DOUBLE) / 100.0, 6) AS sample_cov,
       round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                  / CAST(n * (n - 1) AS DOUBLE)) / 100.0, 6)
           AS price_stddev
FROM s
WHERE n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
"""

QUERIES["price_size_correlation"] = (
    q_price_size_correlation,
    PRICE_SIZE_CORRELATION_SQL,
)


def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the undirected co-review graph — the first
    summary a graph workload computes (and the skew diagnostic the
    fan-out caps in co_review_edges/adamic_adar are sized from): per
    degree value, how many vertices hold it. Exact integers."""
    from ..operators import graph as G
    from ..sources.tables import reviews_from_events

    liked = G.good_reviews(reviews_from_events(spark, sf_dir))
    edges = G.undirected(G.co_review_edges(liked))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_vertices")
    )


DEGREE_DISTRIBUTION_SQL = """
WITH reviews AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           __PRODUCT_ID__ AS product_id,
           __RATING__ AS rating
    FROM events
),
liked AS (
    SELECT DISTINCT user_id, product_id FROM reviews
    WHERE user_id < 1000 AND rating > 3.0
      AND product_id IS NOT NULL
),
pairs AS (
    SELECT DISTINCT a.user_id AS src, b.user_id AS dst
    FROM liked a JOIN liked b ON a.product_id = b.product_id
    WHERE a.user_id < b.user_id
),
edges AS (
    SELECT src, dst FROM pairs
    UNION
    SELECT dst AS src, src AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY src)
SELECT degree, count(*) AS n_vertices FROM deg GROUP BY degree
"""

QUERIES["degree_distribution"] = (
    q_degree_distribution,
    DEGREE_DISTRIBUTION_SQL,
)


# --- k-truss decomposition (round 7b) --------------------------------------

_KTRUSS_K = 4
_KTRUSS_ROUNDS = 8


def q_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss of the product co-like graph: product pair (p1 < p2) is an
    edge when its co-liker count reaches 60% of the maximum pair count
    (integer test c*10 >= max_c*6 — scale-relative, so the graph stays
    meaningfully sparse at every SF); then peel edges in < 2 triangles to
    fixpoint (operators.graph.ktruss_edges). Output (src, dst, support).
    FULL value oracle via unrolled peel rounds (converged rounds no-op).

    Scale design (100 TB): the co-like pair build is the standard fact
    self-join on user_id (bounded by the fixed product catalog); the
    peel runs on the ≤ |catalog|² edge relation — wedge joins partial-agg
    on 8-byte keys; the scalar max broadcasts."""
    from ..operators.graph import ktruss_edges
    from ..sources.tables import reviews_from_events

    reviews = reviews_from_events(spark, sf_dir)
    liked = (
        reviews.filter(F.col("rating") > 3.0)
        .select("user_id", "product_id")
        .distinct()
    )
    a, b = liked.alias("a"), liked.alias("b")
    pp = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.product_id") < F.col("b.product_id")),
        )
        .groupBy(
            F.col("a.product_id").alias("src"),
            F.col("b.product_id").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mx = pp.agg(F.max("c").alias("mx"))
    E = (
        pp.crossJoin(F.broadcast(mx))
        .filter(F.col("c") * 10 >= F.col("mx") * 6)
        .select("src", "dst")
    )
    return ktruss_edges(E, k=_KTRUSS_K, max_iterations=_KTRUSS_ROUNDS)


def _ktruss_sql(k: int = _KTRUSS_K, rounds: int = _KTRUSS_ROUNDS) -> str:
    from ..oracles import REVIEWS_CTE

    min_sup = k - 2
    body = []
    prev = "e0"
    for r in range(1, rounds + 1):
        body.append(f"""adj{r} AS MATERIALIZED (
    SELECT src AS u, dst AS w FROM {prev}
    UNION ALL SELECT dst, src FROM {prev}
),
sup{r} AS MATERIALIZED (
    SELECT p.u AS src, q.u AS dst, count(*) AS c
    FROM adj{r} p
    JOIN adj{r} q ON p.w = q.w AND p.u < q.u
    JOIN {prev} e ON e.src = p.u AND e.dst = q.u
    GROUP BY 1, 2
),
e{r} AS MATERIALIZED (
    SELECT e.src, e.dst FROM {prev} e
    JOIN sup{r} s ON s.src = e.src AND s.dst = e.dst AND s.c >= {min_sup}
)""")
        prev = f"e{r}"
    joined = ",\n".join(body)
    return f"""
WITH {REVIEWS_CTE},
liked AS MATERIALIZED (
    SELECT DISTINCT user_id, product_id FROM reviews WHERE rating > 3.0
),
pp AS MATERIALIZED (
    SELECT a.product_id AS src, b.product_id AS dst, count(*) AS c
    FROM liked a JOIN liked b
      ON a.user_id = b.user_id AND a.product_id < b.product_id
    GROUP BY 1, 2
),
e0 AS MATERIALIZED (
    SELECT src, dst FROM pp WHERE c * 10 >= (SELECT max(c) FROM pp) * 6
),
{joined},
supF AS (
    SELECT p.u AS src, q.u AS dst, count(*) AS c
    FROM adj{rounds} p
    JOIN adj{rounds} q ON p.w = q.w AND p.u < q.u
    JOIN {prev} e ON e.src = p.u AND e.dst = q.u
    GROUP BY 1, 2
)
SELECT e.src, e.dst, CAST(coalesce(s.c, 0) AS BIGINT) AS support
FROM {prev} e
LEFT JOIN supF s ON s.src = e.src AND s.dst = e.dst
"""


QUERIES["ktruss_edges"] = (q_ktruss_edges, _ktruss_sql())


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

_CLEAN_TABLE_MAP = {'value_outliers': ('events',), 'approx_order_quantiles': ('orders',), 'customer_running_spend': ('orders',), 'nation_trade_flows': ('customer', 'lineitem', 'orders', 'supplier'), 'national_market_share': ('customer', 'lineitem', 'orders', 'supplier'), 'price_size_correlation': ('part',), 'promo_revenue': ('lineitem', 'part'), 'skew_safe_event_stats': ('events',), 'small_quantity_revenue': ('lineitem', 'part'), 'special_discount_revenue': ('lineitem', 'part'), 'top_supplier': ('lineitem', 'supplier'), 'revenue_cube': ('customer', 'orders'), 'revenue_rollup': ('customer', 'orders'), 'revenue_grouping_sets': ('orders',), 'conditional_agg': ('customer', 'orders'), 'order_value_quantiles': ('orders',), 'heavy_users': ('events',), 'customer_latest_order': ('orders',), 'customer_order_gaps': ('orders',)}
for _n, _tabs in _CLEAN_TABLE_MAP.items():
    QUERIES[_n] = (
        QUERIES[_n][0],
        _clean_tables_sql(QUERIES[_n][1], *_tabs),
        *QUERIES[_n][2:],
    )
del _n, _tabs
