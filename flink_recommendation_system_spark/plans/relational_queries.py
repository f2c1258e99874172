"""Relational-operator query suite over the driver's TPC-H-ish tables.

Exercises the §2.2-2.6/§2.9/§2.11 operator inventory as realistic analytical
queries (SURVEY.md §5.5: the reference has no TPC suite, so joins/aggs/top-k
are validated TPC-H-style against the DuckDB oracle).

Each entry in ``QUERIES`` is ``name → (spark_fn, oracle_sql | None)``;
``__spark_entry__`` flattens these into the driver contract.

Cross-engine determinism: timestamps are epoch-nanos LongType on the Spark
side (see sources.tables.load_table); comparisons/outputs use exact integer
arithmetic, money sums round to 2 dp, averages to 4 dp, and every top-k
carries a full tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import (
    anti_join,
    deterministic_split,
    parse_kv_strings,
    semi_join,
    set_union_agg,
    to_kv_strings,
    top_k,
)
from ..operators._util import finite_measure
from ..sources.tables import load_table, load_table_clean, reviews_from_events


# lineitem/orders store TIMESTAMP(MILLIS) → TIMESTAMP_NTZ in Spark, plain
# TIMESTAMP in DuckDB; midnight-date literals compare identically. (Only
# `events.ts` is TIMESTAMP(NANOS) → LongType, handled in sources.tables.)
Q1_CUTOFF = "1998-09-02 00:00:00"
Q3_DATE = "1998-03-15 00:00:00"


def _ts_ntz(lit: str) -> F.Column:
    return F.expr(f"TIMESTAMP_NTZ '{lit}'")


# --- Q1-style pricing summary (A1 aggregation breadth) ----------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table_clean(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= _ts_ntz(Q1_CUTOFF))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3-style shipping priority (3-way join + agg + top-k) ------------------


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table_clean(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table_clean(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts_ntz(Q3_DATE)
    )
    li = load_table_clean(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts_ntz(Q3_DATE)
    )
    joined = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).join(cust, orders["o_custkey"] == cust["c_custkey"])
    agg = joined.groupBy("o_orderkey", "o_orderpriority").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )
    return top_k(agg, 10, F.col("revenue").desc(), F.col("o_orderkey").asc())


SHIPPING_PRIORITY_SQL = f"""
SELECT o_orderkey, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- Q5-style multi-join: revenue by nation in one region -------------------


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⨝ orders ⨝ lineitem ⨝ supplier ⨝ nation ⨝ region with the
    customer-nation = supplier-nation constraint — the join-reordering /
    broadcast showcase. nation+region are broadcast; Catalyst reorders the
    rest and AQE fixes skew at runtime."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # Round-4 testdata renamed regions (REGION_0 → EUROPE/ASIA/...); the
    # old literal matched nothing and the query degenerated to empty.
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nr = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            supp,
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nr), supp["s_nationkey"] == nr["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY n_name
"""


# --- join-family breadth ----------------------------------------------------


def q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return semi_join(cust, orders, ["c_custkey"]).select("c_custkey", "c_name")


CUSTOMERS_WITH_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (§2 J3). Round-4 testdata gives EVERY customer at least
    one order, so the original unrestricted anti-join degenerated to a
    guaranteed-empty result; restricting the right side to recent orders
    (≥ 2000-06-01) keeps the operator shape and makes the result
    discriminating again (~255 lapsed customers at sf0.01)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-06-01")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(cust, orders, ["c_custkey"]).select("c_custkey", "c_name")


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-06-01')
"""


def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + COALESCE-style count — the J5 lookup shape in batch
    form: unmatched customers keep 0."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    return (
        cust.join(orders, ["c_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table_clean(spark, sf_dir, "customer")
    orders = load_table_clean(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


REVENUE_BY_NATION_SQL = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- window functions / per-group top-k -------------------------------------


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
           ) AS rn
    FROM orders
) WHERE rn <= 3
"""


# --- set ops ----------------------------------------------------------------


def q_active_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION-distinct of nation keys present in customer or supplier (U1/U3
    set semantics on tables)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.union(supp).distinct()


ACTIVE_NATIONS_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


# --- string parse round-trip (P4/S6 encoding) -------------------------------


def q_kv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode reviews as the reference's Redis member strings
    `"productId:rating"` and parse back (P4) — exercises concat_ws, split,
    element_at, casts.

    Rows whose props.k does not CAST to a product id are dropped on BOTH
    sides (round-13 review: the oracle previously filtered only the raw
    string for NULL and then hard-CAST — a non-numeric key like "abc"
    crashed the oracle while Spark silently dropped the row; it now
    TRY_CASTs and filters post-cast, the same domain pin as Spark's
    ``.cast("long").isNotNull()``)."""
    # rating NULL is excluded like product NULL (round 15): a NULL rating
    # makes Spark's concat_ws SKIP the field ("12" with no colon — the
    # parse side then faults on element_at(2)) while DuckDB's concat
    # renders it as an empty trailing field — neither is a valid wire
    # member, so both engines drop the row
    reviews = reviews_from_events(spark, sf_dir).filter(
        F.col("product_id").isNotNull() & F.col("rating").isNotNull()
    )
    return parse_kv_strings(to_kv_strings(reviews))


KV_ROUNDTRIP_SQL = """
WITH kv AS (
    SELECT user_id,
           concat(CAST(k AS VARCHAR), ':', CAST(r AS VARCHAR)) AS member
    FROM (
        SELECT user_id, value,
               __PRODUCT_ID__ AS k,
               __RATING__ AS r
        FROM events
    )
    WHERE k IS NOT NULL AND r IS NOT NULL
)
SELECT user_id,
       CAST(split_part(member, ':', 1) AS BIGINT) AS product_id,
       CAST(split_part(member, ':', 2) AS DOUBLE) AS rating
FROM kv
"""


# --- collect_set aggregation (A5) ------------------------------------------


def q_user_product_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    liked = reviews_from_events(spark, sf_dir).select("user_id", "product_id")
    sets = set_union_agg(liked, "user_id", "product_id")
    # Driver-gate shape: ARRAY columns break the harness canonicalizer, so
    # the registered query joins the numerically-sorted set to a CSV string;
    # set_union_agg keeps the array API for library users.
    return sets.select(
        "user_id",
        F.concat_ws(
            ",", F.transform("product_id_set", lambda x: x.cast("string"))
        ).alias("product_id_set"),
    )


USER_PRODUCT_SETS_SQL = """
WITH reviews AS (
    SELECT user_id, __PRODUCT_ID__ AS product_id
    FROM events
)
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT product_id)), ',') AS product_id_set
FROM reviews GROUP BY user_id
"""


# --- deterministic split (X1) -----------------------------------------------


def q_split_db_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'database seed' side of the spliter.py split (80%), via the
    engine-portable multiplicative-hash bucket."""
    reviews = reviews_from_events(spark, sf_dir)
    db, _stream = deterministic_split(reviews, "user_id", 800)
    return db


SPLIT_DB_PART_SQL = """
WITH reviews AS (
    SELECT
        CAST(user_id AS BIGINT) AS user_id,
        __PRODUCT_ID__ AS product_id,
        __RATING__ AS rating,
        CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts
    FROM events
)
SELECT * FROM reviews WHERE (user_id * 2654435761) % 1000 < 800
"""


QUERIES: dict[str, tuple] = {
    "pricing_summary": (q_pricing_summary, PRICING_SUMMARY_SQL),
    "shipping_priority": (q_shipping_priority, SHIPPING_PRIORITY_SQL),
    "local_supplier_volume": (q_local_supplier_volume, LOCAL_SUPPLIER_VOLUME_SQL),
    "customers_with_orders": (q_customers_with_orders, CUSTOMERS_WITH_ORDERS_SQL),
    "customers_without_orders": (
        q_customers_without_orders,
        CUSTOMERS_WITHOUT_ORDERS_SQL,
    ),
    "customer_order_counts": (q_customer_order_counts, CUSTOMER_ORDER_COUNTS_SQL),
    "revenue_by_nation": (q_revenue_by_nation, REVENUE_BY_NATION_SQL),
    "top_orders_per_customer": (
        q_top_orders_per_customer,
        TOP_ORDERS_PER_CUSTOMER_SQL,
    ),
    "active_nations": (q_active_nations, ACTIVE_NATIONS_SQL),
    "kv_roundtrip": (q_kv_roundtrip, KV_ROUNDTRIP_SQL),
    "user_product_sets": (q_user_product_sets, USER_PRODUCT_SETS_SQL),
    "split_db_part": (q_split_db_part, SPLIT_DB_PART_SQL),
}


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    lineitems (l_returnflag = 'R'), with nation — fact⨝fact shuffle join
    plus broadcast dims, TakeOrderedAndProject on a deterministic
    (revenue DESC, custkey ASC) key."""
    li = load_table_clean(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table_clean(spark, sf_dir, "orders")
    cust = load_table_clean(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


RETURNED_ITEMS_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

QUERIES["returned_items"] = (q_returned_items, RETURNED_ITEMS_SQL)


Q18_QTY_THRESHOLD = 250


def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds the
    threshold, joined back to customer detail — the aggregate-then-semi-
    join-the-fact pattern (the HAVING set is small, so it broadcasts into
    the enrichment join instead of re-shuffling orders)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        orders.join(
            F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"]
        )
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


LARGE_VOLUME_ORDERS_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (
    SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING round(sum(l_quantity), 2) > {Q18_QTY_THRESHOLD}
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""

QUERIES["large_volume_orders"] = (q_large_volume_orders, LARGE_VOLUME_ORDERS_SQL)


def q_nation_balance_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one join family member not yet registered):
    per-nation customer account balance vs supplier account balance —
    nations with only customers or only suppliers keep a row with nulls
    on the absent side."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_balance"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_balance"))
    )
    return cust.join(supp, "nationkey", "full_outer")


NATION_BALANCE_OVERVIEW_SQL = """
WITH c AS (
    SELECT c_nationkey AS nationkey, round(sum(c_acctbal), 2) AS cust_balance
    FROM customer GROUP BY c_nationkey
),
s AS (
    SELECT s_nationkey AS nationkey, round(sum(s_acctbal), 2) AS supp_balance
    FROM supplier GROUP BY s_nationkey
)
SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
       cust_balance, supp_balance
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""

QUERIES["nation_balance_overview"] = (
    q_nation_balance_overview,
    NATION_BALANCE_OVERVIEW_SQL,
)


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (left-outer join + two-level aggregation — the
    classic skew distribution): per customer, the count of their
    non-urgent orders INCLUDING customers with none (left outer, so the
    zero bucket exists), then the distribution of customers over that
    count. The schema has no o_comment, so the reference query's comment
    NOT-LIKE filter becomes an o_orderpriority exclusion — same plan
    shape: filtered fact left-joined under a dim, count(join-key) per
    customer (NULL-safe zero), re-aggregate. At 100 TB the first agg is a
    partial-agg shuffle on c_custkey and the second on the (tiny) count
    domain; the all-customers left side never collapses to the driver."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


CUSTOMER_DISTRIBUTION_SQL = """
WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
                    AND o_orderpriority != '1-URGENT'
    GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
"""

QUERIES["customer_distribution"] = (
    q_customer_distribution,
    CUSTOMER_DISTRIBUTION_SQL,
)


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (multi-correlated EXISTS / NOT-EXISTS against the
    same fact table): suppliers who were the SOLE late shipper on a
    finalized multi-supplier order. The schema has no
    l_receiptdate/l_commitdate, so "late" is l_shipdate more than 90 days
    after o_orderdate — the correlation structure (EXISTS another supplier
    on the order, NOT EXISTS another LATE supplier on the order) is
    unchanged. Expressed Spark-first as one per-order aggregate (distinct
    supplier count, distinct late-supplier count) joined back to the late
    lineitems — two scans of lineitem instead of three correlated probes,
    the rewrite Catalyst cannot derive from EXISTS itself. numwait counts
    qualifying late lineitem ROWS, exactly as Q21's count(*) over l1 does
    (round-13 review: a distinct (order, supplier) pre-aggregation
    silently collapsed multi-lineitem waits and could reshuffle the
    top 10). Top 10 by numwait with name tie-break."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
    )
    late_items = li.filter(late).select("l_orderkey", "l_suppkey")
    waiting = (
        late_items.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return top_k(
        waiting.join(
            F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
        ).select("s_name", "numwait"),
        10,
        F.col("numwait").desc(),
        F.col("s_name").asc(),
    )


WAITING_SUPPLIERS_SQL = """
WITH li AS (
    SELECT l_orderkey, l_suppkey,
           (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
),
per_order AS (
    SELECT l_orderkey,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
    FROM li GROUP BY l_orderkey
),
waiting AS (
    SELECT l_suppkey, count(*) AS numwait
    FROM (SELECT l_orderkey, l_suppkey FROM li WHERE late) x
    JOIN per_order USING (l_orderkey)
    WHERE n_supp > 1 AND n_late = 1
    GROUP BY l_suppkey
)
SELECT s_name, numwait FROM waiting
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""

QUERIES["waiting_suppliers"] = (q_waiting_suppliers, WAITING_SUPPLIERS_SQL)


def q_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (anti-join + scalar-subquery threshold): customers
    with above-average account balance and no RECENT order (none since
    1999-01-01 — every customer in this dataset has SOME order, so like
    Q22's own 7-year recency clause the anti-join runs against the
    filtered fact), grouped by nation (the schema's stand-in for Q22's
    phone country code). The average is over positive-balance customers —
    a scalar subquery Spark expresses as a 1-row broadcast cross join.
    Engine-exactness: balances are a 2-dp grid, so the threshold test
    multiplies out the division (bal_e2 · n > sum_e2, exact BIGINTs)
    instead of comparing against a float average, and the output sum is
    integer cents divided once."""
    cust = load_table_clean(spark, sf_dir, "customer").withColumn(
        "bal_e2", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    thr = (
        cust.filter(F.col("bal_e2") > 0)
        .agg(
            F.sum("bal_e2").alias("sum_e2"),
            F.count(F.lit(1)).alias("n_pos"),
        )
    )
    orders = load_table_clean(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1999-01-01 00:00:00'")
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("bal_e2") * F.col("n_pos") > F.col("sum_e2"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (
                F.sum("bal_e2").cast("double") / F.lit(100.0)
            ).alias("totacctbal"),
        )
    )


GLOBAL_SALES_OPPORTUNITY_SQL = """
WITH c AS (
    SELECT c_custkey, c_nationkey,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_e2
    FROM customer
),
thr AS (
    SELECT sum(bal_e2) AS sum_e2, count(*) AS n_pos
    FROM c WHERE bal_e2 > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       count(*) AS numcust,
       CAST(sum(bal_e2) AS DOUBLE) / 100.0 AS totacctbal
FROM c CROSS JOIN thr
WHERE bal_e2 * n_pos > sum_e2
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
"""

QUERIES["global_sales_opportunity"] = (
    q_global_sales_opportunity,
    GLOBAL_SALES_OPPORTUNITY_SQL,
)


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated minimum-cost subquery): for each
    STANDARD part of size >= 40, the supplier who shipped it at the
    lowest observed price. The schema has no partsupp, so the observed
    lineitem prices stand in for ps_supplycost — the correlation
    structure (per-part MIN, equi-join back on the minimum to recover
    the supplying row) is unchanged. Prices compare on the exact
    integer-cents grid and the supplier tie-break is MIN(s_suppkey),
    expressed as one ``min(struct(price, suppkey))`` argmin aggregate —
    a single partial-aggregatable shuffle on l_partkey instead of
    Q2's correlated re-probe, which is the rewrite Catalyst cannot
    derive from a correlated subquery at 100 TB. Dimension joins
    (part/supplier/nation) broadcast."""
    part = load_table_clean(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") >= 40)
    )
    sup = load_table_clean(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table_clean(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey", "p_name")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    # NULL prices are excluded BEFORE the argmin (round-13 review):
    # Spark's min(struct) sorts NULL first, so one NULL-price lineitem —
    # exactly the dirty row integrity_report audits — would hijack the
    # per-part minimum (min_price=NULL, best_supp=the NULL row's
    # supplier), while SQL MIN ignores NULLs; align on ignore.
    # NULL supplier keys are excluded from the WHOLE argmin (round 15):
    # min(struct) sorts a NULL suppkey FIRST within a price tie — the
    # argmin would pick an unattributable shipment and the supplier join
    # would then drop the part entirely, while SQL MIN(l_suppkey) skips
    # NULLs and keeps it; quarantine the unattributable rows identically
    # in both engines instead.
    pick = (
        li.select("p_partkey", "p_name", cents.alias("cents"), "l_suppkey")
        .filter(F.col("cents").isNotNull() & F.col("l_suppkey").isNotNull())
        .groupBy("p_partkey", "p_name")
        .agg(F.min(F.struct("cents", "l_suppkey")).alias("best"))
        .select(
            "p_partkey",
            "p_name",
            (F.col("best.cents").cast("double") / 100.0).alias("min_price"),
            F.col("best.l_suppkey").alias("best_supp"),
        )
    )
    return (
        pick.join(
            F.broadcast(sup), F.col("best_supp") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("p_partkey", "p_name", "min_price", "s_name", "n_name")
    )


MIN_COST_SUPPLIER_SQL = """
WITH costs AS (
    SELECT l_partkey, l_suppkey,
           min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'STANDARD' AND p_size >= 40
      AND l_suppkey IS NOT NULL
    GROUP BY l_partkey, l_suppkey
),
best AS (
    SELECT l_partkey, min(cents) AS best_cents
    FROM costs GROUP BY l_partkey
),
pick AS (
    SELECT c.l_partkey, best_cents, min(l_suppkey) AS best_supp
    FROM costs c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.cents = b.best_cents
    GROUP BY c.l_partkey, best_cents
)
SELECT p_partkey, p_name,
       CAST(best_cents AS DOUBLE) / 100.0 AS min_price, s_name, n_name
FROM pick
JOIN part ON l_partkey = p_partkey
JOIN supplier ON best_supp = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""

QUERIES["min_cost_supplier"] = (q_min_cost_supplier, MIN_COST_SUPPLIER_SQL)


def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-line profit by nation and year — the
    widest join tree in TPC-H: fact + 3 dims + substring part filter):
    profit per supplier-nation per order-year over widget-named parts.
    The schema has no ps_supplycost, so cost is 60% of the part's
    retail price per unit — the measure structure
    (revenue - cost, both per lineitem) is unchanged. All arithmetic on
    the integer 1e-4-dollar grid (rev_e4 carries the discount exactly:
    price-cents x (100 - discount-pct)); the group sum stays a BIGINT
    until the final exact /10000 conversion, so cross-engine float
    summation order cannot flip a bit. Per-group sums stay far under
    2^63 (~max 1e9/row x rows-per-nation-year); the nation/part dims
    broadcast and the fact shuffles once on the group key."""
    li = load_table_clean(spark, sf_dir, "lineitem")
    part = load_table_clean(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    orders = load_table_clean(spark, sf_dir, "orders")
    sup = load_table_clean(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    cost_e4 = (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.round(F.col("l_quantity")).cast("long")
        * F.lit(60)
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (F.sum(rev_e4 - cost_e4).cast("double") / 10000.0).alias(
                "profit"
            )
        )
    )


NATION_PROFIT_SQL = """
SELECT n_name, year(o_orderdate) AS o_year,
       CAST(sum(
           CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))
           - CAST(round(p_retailprice * 100) AS BIGINT)
             * CAST(round(l_quantity) AS BIGINT) * 60
       ) AS DOUBLE) / 10000.0 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
"""

QUERIES["nation_profit"] = (q_nation_profit, NATION_PROFIT_SQL)


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (scalar-subquery threshold as a fraction of a
    global aggregate): parts whose total shipped value exceeds 1/1500
    of the whole corpus's value. The share test runs entirely on the
    integer-cents grid (``part_cents * 1500 > global_cents`` — no
    float division anywhere), so the cut is exact in both engines.
    Spark-first: one partial-agg shuffle on l_partkey, then the
    single-row global sum re-aggregated from the per-part sums and
    broadcast back as a cross join. The global branch shares the
    per-part partial-agg exchange via AQE exchange reuse (pinned in
    tests/test_plan_regressions.py), so at 100 TB the fact is read and
    shuffled ONCE and the threshold join moves one row."""
    li = load_table_clean(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per_part = (
        li.select(F.col("l_partkey").alias("p_partkey"), cents.alias("c"))
        .groupBy("p_partkey")
        .agg(F.sum("c").alias("v"))
    )
    total = per_part.agg(F.sum("v").alias("g"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("v") * 1500 > F.col("g"))
        .select(
            "p_partkey",
            (F.col("v").cast("double") / 100.0).alias("part_value"),
        )
    )


IMPORTANT_PARTS_SQL = """
WITH pv AS (
    SELECT l_partkey AS p_partkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS v
    FROM lineitem GROUP BY 1
)
SELECT p_partkey, CAST(v AS DOUBLE) / 100.0 AS part_value
FROM pv, (SELECT sum(v) AS g FROM pv)
WHERE v * 1500 > g
"""

QUERIES["important_parts"] = (q_important_parts, IMPORTANT_PARTS_SQL)


def q_shipping_mode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (join + two-way CASE split over a derived mode):
    lineitems bucketed by shipping delay (days from order date to ship
    date: <0 INVALID, <=30 FAST, <=90 MEDIUM, else SLOW — the schema has
    no l_shipmode), counting high-priority (1-URGENT/2-HIGH) vs
    low-priority order lines per bucket. The INVALID bucket is explicit
    (round-13 review): this generator genuinely ships some lineitems
    BEFORE their order date (see integrity_report), and a negative delay
    previously landed in FAST — impossible rows silently inflating the
    best bucket. Both engines compute the delay on midnight-aligned
    timestamps so the day arithmetic is exact; outputs are pure counts.
    One fact-fact join (orders side projected to two columns) and a
    4-group aggregate — map-side combine leaves ~4 rows per task at any
    scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    mode = (
        F.when(delay < 0, "INVALID")
        .when(delay <= 30, "FAST")
        .when(delay <= 90, "MEDIUM")
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(mode.alias("ship_mode"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


SHIPPING_MODE_STATS_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 0 THEN 'INVALID'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN 'MEDIUM'
            ELSE 'SLOW' END AS ship_mode,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY ship_mode
"""

QUERIES["shipping_mode_stats"] = (
    q_shipping_mode_stats,
    SHIPPING_MODE_STATS_SQL,
)


def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (NOT IN exclusion subquery + grouped
    COUNT DISTINCT): distinct suppliers per (brand, type, size) over a
    brand/size-filtered slice, excluding "complaint" suppliers (here:
    negative account balance — the schema has no s_comment). The NOT IN
    becomes a broadcast LEFT ANTI join (l_suppkey is non-null, so the
    NULL-poisoning NOT-IN edge case cannot arise and anti-join is
    exactly equivalent); the distinct count is one partial-aggregatable
    expand on the (tiny) group domain. Outputs are pure counts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SUPPLIER_PART_VARIETY_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#13'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""

QUERIES["supplier_part_variety"] = (
    q_supplier_part_variety,
    SUPPLIER_PART_VARIETY_SQL,
)


def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested IN chain with a correlated half-sum
    threshold): suppliers who in 1998 shipped MORE THAN HALF of some
    small-named part's total 1998 volume (Q20's
    ``ps_availqty > 0.5 * sum(l_quantity)`` correlated test, re-rooted
    on shipped volume since the schema has no partsupp). The half-sum
    compares as ``2 * supp_qty > total_qty`` on exact BIGINT quantities.
    Spark-first: one shuffle on (partkey, suppkey), the per-part total
    re-aggregated from those partials (AQE exchange reuse keeps the
    fact single-scan — pinned in tests/test_plan_regressions.py), and
    the final supplier set deduplicated before the broadcast dim
    joins."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sq = (
        li.filter(F.year("l_shipdate") == 1998)
        .join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("supp_qty"))
    )
    pt = sq.groupBy("l_partkey").agg(F.sum("supp_qty").alias("total_qty"))
    return (
        sq.join(pt, "l_partkey")
        .filter(F.col("supp_qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", "n_name")
    )


DOMINANT_PART_SUPPLIERS_SQL = """
WITH sq AS (
    SELECT l_partkey, l_suppkey,
           sum(CAST(round(l_quantity) AS BIGINT)) AS supp_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%' AND year(l_shipdate) = 1998
    GROUP BY 1, 2
),
pt AS (
    SELECT l_partkey, sum(supp_qty) AS total_qty FROM sq GROUP BY 1
)
SELECT DISTINCT s_name, n_name
FROM sq
JOIN pt USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE 2 * supp_qty > total_qty
"""

QUERIES["dominant_part_suppliers"] = (
    q_dominant_part_suppliers,
    DOMINANT_PART_SUPPLIERS_SQL,
)


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy join: customer-name pairs within edit
    distance 1, via FastSS deletion-neighborhood blocking (see
    ``operators.dedup.edit_distance_pairs`` — lossless candidate
    generation that stays linear even though every name shares the
    'Customer#' prefix, where prefix blocking would go quadratic).
    Output ids + exact distance; the oracle replays the same blocking
    and DuckDB's levenshtein agrees with Spark's on every pair."""
    from ..operators.dedup import edit_distance_pairs

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return edit_distance_pairs(cust, id_col="c_custkey", text_col="c_name")


FUZZY_NAME_PAIRS_SQL = """
WITH sigs AS (
    SELECT c_custkey, c_name,
           unnest(list_prepend(c_name,
               list_transform(range(1, length(c_name) + 1),
                   i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)))
           ) AS sig
    FROM customer
),
cand AS (
    SELECT DISTINCT a.c_custkey AS id1, b.c_custkey AS id2,
                    a.c_name AS s1, b.c_name AS s2
    FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.c_custkey < b.c_custkey
)
SELECT id1, id2, CAST(levenshtein(s1, s2) AS BIGINT) AS dist
FROM cand WHERE levenshtein(s1, s2) <= 1
"""

QUERIES["fuzzy_name_pairs"] = (q_fuzzy_name_pairs, FUZZY_NAME_PAIRS_SQL)


# FastSS-2 slice bound: the d≤2 neighborhood of sequential TPC-H customer
# names is dense (every pair differing in ≤2 digits qualifies), so the
# oracle-checked tier runs on a fixed-size slice — the quadratic-oracle
# losslessness proof doesn't need volume, it needs coverage of every
# blocking case (same-length substitutions, cross-length insertions,
# double deletions). The unbounded operator stays available via
# edit_distance_pairs(max_dist=2).
FUZZY_D2_MAX_KEY = 1000


def q_fuzzy_name_pairs_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FastSS-2 fuzzy join (VERDICT r06 item 5): customer-name pairs
    within edit distance 2 on the c_custkey <= FUZZY_D2_MAX_KEY slice,
    via the full ≤2-deletion-neighborhood blocking
    (``operators.dedup.edit_distance_pairs(max_dist=2)``). The oracle is
    the QUADRATIC ``levenshtein(s1, s2) <= 2`` join over the same slice —
    every green row is a standing losslessness proof of the k=2 blocking
    (the ``ppjoin_pairs`` pattern)."""
    from ..operators.dedup import edit_distance_pairs

    # entity-resolution contract (round 15): keys are unique — duplicated
    # key rows collapse to ONE deterministic representative (min name) and
    # nameless entities are excluded, else the pair multiset depends on
    # physical duplication (the oracle mirrors the same GROUP BY/min)
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(
            (F.col("c_custkey") <= FUZZY_D2_MAX_KEY)
            & F.col("c_name").isNotNull()
        )
        .groupBy("c_custkey")
        .agg(F.min("c_name").alias("c_name"))
    )
    return edit_distance_pairs(
        cust, id_col="c_custkey", text_col="c_name", max_dist=2
    )


FUZZY_NAME_PAIRS_D2_SQL = f"""
WITH c AS (
    SELECT c_custkey, min(c_name) AS c_name FROM customer
    WHERE c_custkey <= {FUZZY_D2_MAX_KEY} AND c_name IS NOT NULL
    GROUP BY c_custkey
    HAVING length(min(c_name)) <= 64
)
SELECT a.c_custkey AS id1, b.c_custkey AS id2,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM c a JOIN c b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
"""

QUERIES["fuzzy_name_pairs_d2"] = (q_fuzzy_name_pairs_d2, FUZZY_NAME_PAIRS_D2_SQL)


def q_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit in long format (the dbt-test /
    data-quality-gate shape a pipeline runs before publishing a
    snapshot): one row per check with its violation count — FK orphans
    via LEFT ANTI joins against the (broadcastable or partial-agg'd)
    key sets, primary-key duplicate counts via a grouped HAVING, NULL
    checks as conditional counts. Every check is a count over one scan
    + one anti-join/agg; the union of single-row aggregates moves a
    handful of rows regardless of fact volume.

    RAW tables BY DESIGN (round 16, ADVICE r15 item 1): this audit is
    the one consumer that must SEE dirty rows — routed through the
    measure-domain cleaner it could no longer report what it audits
    (lineitem_null_extendedprice was always 0 because NULL fails
    abs(col) < bound; NaN/Inf/extreme rows vanished from every check; a
    parent order dropped by the cleaner turned its lineitems into false
    orphans). Only the arithmetic-sensitive totalprice check carries an
    explicit per-check domain predicate (finite_measure on both price
    columns, mirrored in the oracle) so the exact-cents cast stays total
    under ANSI on hostile data."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )

    # orphan = a NON-NULL FK with no parent (round-13 review): a NULL FK
    # is a missing value, not a dangling reference — and the oracle's
    # previous NOT IN form was NULL-poisoned in the opposite direction
    # (one NULL in either column silently zeroed the count). Both
    # engines now express the same NOT-EXISTS-with-key semantics.
    orphan_li_orders = li.filter(F.col("l_orderkey").isNotNull()).join(
        orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    )
    orphan_li_parts = li.filter(F.col("l_partkey").isNotNull()).join(
        part.select("p_partkey"),
        li["l_partkey"] == F.col("p_partkey"),
        "left_anti",
    )
    orphan_orders_cust = orders.filter(
        F.col("o_custkey").isNotNull()
    ).join(
        cust.select("c_custkey"),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_anti",
    )
    dup_orderkeys = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    null_price = li.filter(F.col("l_extendedprice").isNull())
    neg_qty = li.filter(F.col("l_quantity") <= 0)
    # cross-table consistency (both genuinely violated by this synthetic
    # generator — ship dates and order totals are drawn independently of
    # the order rows, so the report's counts discriminate, not just pass)
    shipped_before_ordered = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") < F.col("o_orderdate"))
    li_cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    # per-check domain guard (NOT a table-level cleaner): the exact-cents
    # cast/sum must only see finite in-range prices — out-of-domain rows
    # are reported by the NULL/orphan checks above, not silently dropped
    # from the whole audit
    order_sum = (
        li.filter(finite_measure("l_extendedprice"))
        .groupBy("l_orderkey")
        .agg(F.sum(li_cents).alias("li_total_e2"))
    )
    totalprice_mismatch = (
        orders.filter(finite_measure("o_totalprice"))
        .join(order_sum, orders["o_orderkey"] == F.col("l_orderkey"))
        .filter(
            F.round(F.col("o_totalprice") * 100).cast("long")
            != F.col("li_total_e2")
        )
    )
    checks = [
        ("lineitem_orphan_orderkey", orphan_li_orders),
        ("lineitem_orphan_partkey", orphan_li_parts),
        ("orders_orphan_custkey", orphan_orders_cust),
        ("orders_duplicate_pk", dup_orderkeys),
        ("lineitem_null_extendedprice", null_price),
        ("lineitem_nonpositive_quantity", neg_qty),
        ("lineitem_shipped_before_ordered", shipped_before_ordered),
        ("orders_totalprice_mismatch", totalprice_mismatch),
    ]
    out = count_row(*checks[0])
    for name, df in checks[1:]:
        out = out.unionByName(count_row(name, df))
    return out


INTEGRITY_REPORT_SQL = """
SELECT 'lineitem_orphan_orderkey' AS check_name, count(*) AS n_violations
FROM lineitem l WHERE l.l_orderkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem_orphan_partkey', count(*)
FROM lineitem l WHERE l.l_partkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'orders_orphan_custkey', count(*)
FROM orders o WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'orders_duplicate_pk', count(*)
FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
UNION ALL
SELECT 'lineitem_null_extendedprice', count(*)
FROM lineitem WHERE l_extendedprice IS NULL
UNION ALL
SELECT 'lineitem_nonpositive_quantity', count(*)
FROM lineitem WHERE l_quantity <= 0
UNION ALL
SELECT 'lineitem_shipped_before_ordered', count(*)
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate < o_orderdate
UNION ALL
SELECT 'orders_totalprice_mismatch', count(*)
FROM orders
JOIN (SELECT l_orderkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS li_total_e2
      FROM lineitem WHERE abs(l_extendedprice) < 1000000000000.0
      GROUP BY 1) li ON o_orderkey = l_orderkey
WHERE abs(o_totalprice) < 1000000000000.0
  AND CAST(round(o_totalprice * 100) AS BIGINT) != li_total_e2
"""

QUERIES["integrity_report"] = (q_integrity_report, INTEGRITY_REPORT_SQL)


# --- SCD Type-2 dimension build (round 6b) ------------------------------------


def q_priority_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build — the warehouse CDC shape: a
    customer's order-priority "state history" as versioned validity
    intervals. Orders are sequenced per customer under the total
    (o_orderdate, o_orderkey) order; consecutive runs of the same priority
    collapse into one version (gaps-and-islands: change flag → running
    sum); each version carries valid_from = first order date of the run,
    valid_to = the next version's valid_from (NULL = current), and the
    run's order count. All arithmetic is integers and timestamps — exact
    in both engines.

    Scale design (100 TB): ONE shuffle on o_custkey serves the sequencing
    window, the run collapse (partial agg on (custkey, version)) and the
    valid_to lead — Spark reuses the exchange across the three window/agg
    stages since they share the partitioning key."""
    # a NULL priority is not a trackable STATE (round 15: lag's NULL
    # propagation silently merged it into the neighboring run on one
    # engine's NULL sort order and not the other's); o_orderpriority
    # completes the total order for duplicated (date, key) rows
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull()
    )
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey", "o_orderpriority"
    )
    prev = F.lag("o_orderpriority").over(w)
    seq = orders.select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    ).withColumn(
        "chg",
        F.when(prev.isNull() | (prev != F.col("o_orderpriority")), 1)
        .otherwise(0),
    )
    seq = seq.withColumn(
        "version",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    runs = seq.groupBy("o_custkey", "version").agg(
        F.min("o_orderpriority").alias("o_orderpriority"),
        F.min("o_orderdate").alias("valid_from"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w2 = Window.partitionBy("o_custkey").orderBy("version")
    return runs.select(
        "o_custkey",
        "version",
        "o_orderpriority",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_orders",
    ).withColumn(
        "is_current",
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("long"),
    )


PRIORITY_SCD2_SQL = """
WITH seq AS (
    SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
           CASE WHEN lag(o_orderpriority) OVER w IS NULL
                     OR lag(o_orderpriority) OVER w <> o_orderpriority
                THEN 1 ELSE 0 END AS chg
    FROM orders
    WHERE o_orderpriority IS NOT NULL
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS FIRST,
                          o_orderkey NULLS FIRST,
                          o_orderpriority NULLS FIRST)
),
v AS (
    SELECT *, CAST(sum(chg) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST,
                        o_orderkey NULLS FIRST,
                        o_orderpriority NULLS FIRST
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
    FROM seq
),
runs AS (
    SELECT o_custkey, version,
           min(o_orderpriority) AS o_orderpriority,
           min(o_orderdate) AS valid_from,
           count(*) AS n_orders
    FROM v GROUP BY 1, 2
)
SELECT o_custkey, version, o_orderpriority, valid_from,
       lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
           AS valid_to,
       n_orders,
       CAST(CASE WHEN lead(valid_from) OVER (
                PARTITION BY o_custkey ORDER BY version) IS NULL
            THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM runs
"""

QUERIES["priority_scd2"] = (q_priority_scd2, PRIORITY_SCD2_SQL)


# --- Fellegi-Sunter record linkage (round 7b) ------------------------------

# Integer MILLI-weights (log-likelihood-ratio shaped, fixed by convention
# like the classifier's fixed weights): agreement adds, disagreement
# subtracts; scores stay exact BIGINTs until one final /1000 division.
_RL_W_NAME = {0: 4000, 1: 2500, 2: 1000}  # by edit distance
_RL_W_NATION = (1800, -700)               # (agree, disagree)
_RL_W_SEGMENT = (900, -400)
_RL_W_BALBUCKET = (1200, -500)
_RL_MATCH_MILLI = 5000
_RL_POSSIBLE_MILLI = 2000


def q_record_linkage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi & Sunter 1969, the classic
    entity-resolution decision model): FastSS-2 blocking proposes
    candidate pairs (names within edit distance 2 on the same bounded
    slice as `fuzzy_name_pairs_d2`), then each pair is scored by summing
    fixed per-field agreement/disagreement weights — name edit distance,
    nation, market segment, and 1000-unit account-balance bucket — and
    classified match / possible / non-match by the two FS thresholds.

    All weights are integer millis, so the score sum is exact; the only
    float op is the final /1000. FULL value oracle (the quadratic
    levenshtein join replays the candidate set — every green row is also
    a blocking-losslessness proof).

    Scale design (100 TB): candidate generation is the sub-quadratic
    FastSS-2 signature join; attribute enrichment is two equi-joins back
    to the (bucketed) customer table; scoring is a codegen'd projection.
    """
    from ..operators.dedup import edit_distance_pairs

    # entity-resolution contract (round 15, same as fuzzy_name_pairs_d2):
    # one deterministic representative row per key (duplicated key rows
    # otherwise multiply the candidate pair multiset), nameless entities
    # excluded; the oracle's c CTE mirrors the identical row_number pick
    base = (
        load_table_clean(spark, sf_dir, "customer")
        .filter(
            (F.col("c_custkey") <= FUZZY_D2_MAX_KEY)
            & F.col("c_name").isNotNull()
        )
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) DIV 100000"
            ).alias("bal_bucket"),
        )
    )
    # round 16: the representative pick is min(struct(...)) — identical
    # selection to the previous row_number window (struct ordering is
    # field-by-field ASC NULLS FIRST, the same total order; the oracle's
    # row_number CTE is unchanged) but it PARTIAL-aggregates map-side
    # instead of sort-shuffling, and the picked relation is pinned ONCE —
    # the blocking join, both enrichment sides, and the scorer otherwise
    # replayed scan+window per reference (the _emb lesson; isolated
    # record_linkage_scores best 2.7 → 1.8 s at sf0.1; entity_clusters'
    # residual cost is the closure, not the scorer).
    from ..operators._util import pin_layout as _pin_layout

    cust = _pin_layout(
        base.groupBy("c_custkey")
        .agg(
            F.min(
                F.struct("c_name", "c_nationkey", "c_mktsegment", "bal_bucket")
            ).alias("_m")
        )
        .select(
            "c_custkey",
            F.col("_m.c_name").alias("c_name"),
            F.col("_m.c_nationkey").alias("c_nationkey"),
            F.col("_m.c_mktsegment").alias("c_mktsegment"),
            F.col("_m.bal_bucket").alias("bal_bucket"),
        ),
        "c_custkey",
    ).localCheckpoint(eager=False)
    pairs = edit_distance_pairs(
        cust.select("c_custkey", "c_name"),
        id_col="c_custkey",
        text_col="c_name",
        max_dist=2,
    )
    a = cust.select(
        F.col("c_custkey").alias("id1"),
        F.col("c_nationkey").alias("nat1"),
        F.col("c_mktsegment").alias("seg1"),
        F.col("bal_bucket").alias("bal1"),
    )
    b = cust.select(
        F.col("c_custkey").alias("id2"),
        F.col("c_nationkey").alias("nat2"),
        F.col("c_mktsegment").alias("seg2"),
        F.col("bal_bucket").alias("bal2"),
    )
    name_w = F.when(F.col("dist") == 0, F.lit(_RL_W_NAME[0])).when(
        F.col("dist") == 1, F.lit(_RL_W_NAME[1])
    ).otherwise(F.lit(_RL_W_NAME[2]))
    nat_w = F.when(
        F.col("nat1") == F.col("nat2"), F.lit(_RL_W_NATION[0])
    ).otherwise(F.lit(_RL_W_NATION[1]))
    seg_w = F.when(
        F.col("seg1") == F.col("seg2"), F.lit(_RL_W_SEGMENT[0])
    ).otherwise(F.lit(_RL_W_SEGMENT[1]))
    bal_w = F.when(
        F.col("bal1") == F.col("bal2"), F.lit(_RL_W_BALBUCKET[0])
    ).otherwise(F.lit(_RL_W_BALBUCKET[1]))
    scored = (
        pairs.join(a, "id1")
        .join(b, "id2")
        .select(
            "id1",
            "id2",
            F.col("dist").alias("name_dist"),
            (F.col("nat1") == F.col("nat2")).alias("same_nation"),
            (F.col("seg1") == F.col("seg2")).alias("same_segment"),
            (F.col("bal1") == F.col("bal2")).alias("same_bal_bucket"),
            (name_w + nat_w + seg_w + bal_w).cast("long").alias("_milli"),
        )
    )
    return scored.select(
        "id1",
        "id2",
        "name_dist",
        "same_nation",
        "same_segment",
        "same_bal_bucket",
        (F.col("_milli").cast("double") / F.lit(1000.0)).alias("score"),
        F.when(F.col("_milli") >= _RL_MATCH_MILLI, F.lit("match"))
        .when(F.col("_milli") >= _RL_POSSIBLE_MILLI, F.lit("possible"))
        .otherwise(F.lit("non-match"))
        .alias("match_class"),
    )


_RL_CTES = f"""c AS (
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment, bal_bucket FROM (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // 100000
                   AS bal_bucket,
               row_number() OVER (
                   PARTITION BY c_custkey
                   ORDER BY c_name NULLS FIRST,
                            c_nationkey NULLS FIRST,
                            c_mktsegment NULLS FIRST,
                            CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                                // 100000 NULLS FIRST
               ) AS rn
        FROM customer
        WHERE c_custkey <= {FUZZY_D2_MAX_KEY} AND c_name IS NOT NULL
    ) WHERE rn = 1 AND length(c_name) <= 64
),
pairs AS (
    SELECT a.c_custkey AS id1, b.c_custkey AS id2,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS name_dist
    FROM c a JOIN c b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
),
scored AS (
    SELECT p.id1, p.id2, p.name_dist,
           a.c_nationkey = b.c_nationkey AS same_nation,
           a.c_mktsegment = b.c_mktsegment AS same_segment,
           a.bal_bucket = b.bal_bucket AS same_bal_bucket,
           (CASE p.name_dist WHEN 0 THEN {_RL_W_NAME[0]}
                             WHEN 1 THEN {_RL_W_NAME[1]}
                             ELSE {_RL_W_NAME[2]} END
            + CASE WHEN a.c_nationkey = b.c_nationkey
                   THEN {_RL_W_NATION[0]} ELSE {_RL_W_NATION[1]} END
            + CASE WHEN a.c_mktsegment = b.c_mktsegment
                   THEN {_RL_W_SEGMENT[0]} ELSE {_RL_W_SEGMENT[1]} END
            + CASE WHEN a.bal_bucket = b.bal_bucket
                   THEN {_RL_W_BALBUCKET[0]} ELSE {_RL_W_BALBUCKET[1]} END
           ) AS milli
    FROM pairs p
    JOIN c a ON a.c_custkey = p.id1
    JOIN c b ON b.c_custkey = p.id2
)"""

RECORD_LINKAGE_SCORES_SQL = f"""
WITH {_RL_CTES}
SELECT id1, id2, name_dist, same_nation, same_segment, same_bal_bucket,
       CAST(milli AS DOUBLE) / 1000.0 AS score,
       CASE WHEN milli >= {_RL_MATCH_MILLI} THEN 'match'
            WHEN milli >= {_RL_POSSIBLE_MILLI} THEN 'possible'
            ELSE 'non-match' END AS match_class
FROM scored
"""

QUERIES["record_linkage_scores"] = (
    q_record_linkage_scores,
    RECORD_LINKAGE_SCORES_SQL,
)


def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The entity-resolution END ARTIFACT: transitive closure of the
    Fellegi-Sunter MATCH pairs (milli >= the match threshold) over the
    bounded customer slice — every record mapped to its entity id (the
    cluster's min custkey; unmatched records are their own entity) with
    the entity's member count. The step a real MDM/dedup pipeline ships
    after `record_linkage_scores`. FULL value oracle (match pairs +
    recursive-CC closure).

    Scale design (100 TB): match edges come from the sub-quadratic
    FastSS-blocked scorer; the closure is the same star-contraction CC
    every dedup artifact uses (O(log n) rounds); entity sizes are one
    partial agg on the assignment relation."""
    from ..operators import graph as G

    scored = q_record_linkage_scores(spark, sf_dir)
    matches = scored.filter(F.col("match_class") == "match").select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    )
    comp = G.contracted_components(G.undirected(matches))
    base = (
        load_table_clean(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= FUZZY_D2_MAX_KEY)
        .select("c_custkey")
    )
    ent = base.join(
        comp, base["c_custkey"] == comp["id"], "left"
    ).select(
        "c_custkey",
        F.coalesce("component", F.col("c_custkey")).alias("entity_id"),
    )
    sizes = ent.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return ent.join(sizes, "entity_id").select(
        "c_custkey", "entity_id", "n_members"
    )


ENTITY_CLUSTERS_SQL = f"""
WITH RECURSIVE {_RL_CTES},
m AS (
    SELECT id1 AS a_id, id2 AS b_id FROM scored
    WHERE milli >= {_RL_MATCH_MILLI}
),
e AS (
    SELECT a_id AS src, b_id AS dst FROM m
    UNION ALL
    SELECT b_id AS src, a_id AS dst FROM m
),
reach(id, r) AS (
    SELECT src AS id, src AS r FROM e
    UNION
    SELECT e.dst AS id, reach.r AS r FROM reach JOIN e ON e.src = reach.id
),
closure AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
base AS (
    SELECT c_custkey FROM customer WHERE c_custkey <= {FUZZY_D2_MAX_KEY}
),
ent AS (
    SELECT b.c_custkey,
           COALESCE(cl.component, b.c_custkey) AS entity_id
    FROM base b LEFT JOIN closure cl ON cl.id = b.c_custkey
)
SELECT ent.c_custkey, ent.entity_id, s.n_members
FROM ent JOIN (
    SELECT entity_id, count(*) AS n_members FROM ent GROUP BY entity_id
) s USING (entity_id)
"""

QUERIES["entity_clusters"] = (q_entity_clusters, ENTITY_CLUSTERS_SQL)


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

# integrity_report deliberately ABSENT (round 16, ADVICE r15 item 1): the
# data-quality audit must see raw rows; its one arithmetic-sensitive check
# carries its own per-check domain predicate instead.
_CLEAN_TABLE_MAP = {'entity_clusters': ('customer',), 'global_sales_opportunity': ('customer', 'orders'), 'important_parts': ('lineitem',), 'min_cost_supplier': ('lineitem', 'part', 'supplier'), 'nation_profit': ('lineitem', 'orders', 'part', 'supplier'), 'record_linkage_scores': ('customer',), 'shipping_priority': ('customer', 'lineitem', 'orders'), 'returned_items': ('customer', 'lineitem', 'orders'), 'revenue_by_nation': ('customer', 'orders'), 'pricing_summary': ('lineitem',)}
for _n, _tabs in _CLEAN_TABLE_MAP.items():
    QUERIES[_n] = (
        QUERIES[_n][0],
        _clean_tables_sql(QUERIES[_n][1], *_tabs),
        *QUERIES[_n][2:],
    )
del _n, _tabs
