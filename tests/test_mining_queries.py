"""Hand-computed semantics pins for the mining suite — the subtleties the
sf0.01 oracle rows can't isolate: the Morton bit interleave, skyline
dominance at price ties, gaps-and-islands streak boundaries, attribution
window edges (inclusive end / exclusive start), and CDC change
classification.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from flink_recommendation_system_spark.plans.mining_queries import (
    _morton_expr,
    q_activity_streaks,
    q_cusum_changepoint,
    q_pareto_frontier,
    q_snapshot_diff,
    q_touch_attribution,
)

TS = datetime.datetime


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_morton_interleave_known_bits(spark):
    # x=5 (101b) → bits at even positions 0,4; y=3 (011b) → odd 1,3:
    # 1 + 2 + 8 + 16 = 27
    df = spark.range(1).select(
        _morton_expr(F.lit(5).cast("long"), F.lit(3).cast("long")).alias(
            "m"
        )
    )
    assert df.collect()[0]["m"] == 27


def test_pareto_frontier_dominance_and_ties(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "a", "B", "T", 5, 10.0),   # tied price, smaller size → dominated by 2
            (2, "b", "B", "T", 7, 10.0),   # skyline
            (3, "c", "B", "T", 7, 12.0),   # same size, pricier → dominated
            (4, "d", "B", "T", 3, 9.0),    # cheapest → skyline
            (5, "e", "B", "T", 9, 15.0),   # biggest → skyline
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(f"{d}/part.parquet")
    got = sorted(r["p_partkey"] for r in q_pareto_frontier(spark, d).collect())
    assert got == [2, 4, 5]


def test_activity_streaks_islands(spark, tmp_path):
    def ev(eid, uid, day):
        return (
            eid,
            TS(2024, 1, 1) + datetime.timedelta(days=day, hours=3),
            uid,
            "click",
            1.0,
            "{}",
        )

    # user 1 active days {0,1,2,5,6} → streaks [3 @ d0, 2 @ d5];
    # user 2 active day {3} only (two events same day dedup to one)
    d = _write_events(
        spark,
        tmp_path,
        [
            ev(1, 1, 0), ev(2, 1, 1), ev(3, 1, 2),
            ev(4, 1, 5), ev(5, 1, 6),
            ev(6, 2, 3), ev(7, 2, 3),
        ],
    )
    rows = {r["user_id"]: r for r in q_activity_streaks(spark, d).collect()}
    base = (TS(2024, 1, 1) - TS(1970, 1, 1)).days
    assert rows[1]["longest_streak"] == 3
    assert rows[1]["longest_start_d"] == base
    assert rows[1]["n_streaks"] == 2
    assert rows[2]["longest_streak"] == 1
    assert rows[2]["n_streaks"] == 1


def test_touch_attribution_window_edges(spark, tmp_path):
    t0 = TS(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, typ, sec_offset):
        return (
            eid,
            t0 + datetime.timedelta(seconds=sec_offset),
            uid,
            typ,
            1.0,
            "{}",
        )

    # purchase at t0+3600; touches at +0 (exactly 3600 before → EXCLUDED,
    # window is (ps-3600, ps]), +1 (included, first), +3600 (same second as
    # purchase → included, last), other user excluded
    d = _write_events(
        spark,
        tmp_path,
        [
            ev(10, 1, "purchase", 3600),
            ev(1, 1, "click", 0),
            ev(2, 1, "view", 1),
            ev(3, 1, "click", 3600),
            ev(4, 2, "click", 1800),
        ],
    )
    rows = q_touch_attribution(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["purchase_id"] == 10
    assert r["n_touches"] == 2
    assert r["first_touch"] == "view"
    assert r["last_touch"] == "click"


def test_cusum_flags_single_changepoint(spark, tmp_path):
    # counts per day: [1,1,1,5,5] (shift after day 2) — CUSUM |S| peaks at
    # the last pre-shift day (day index 2)
    rows = []
    eid = 0
    for day, cnt in enumerate([1, 1, 1, 5, 5]):
        for _ in range(cnt):
            eid += 1
            rows.append(
                (
                    eid,
                    TS(2024, 1, 1) + datetime.timedelta(days=day, hours=1),
                    1,
                    "click",
                    1.0,
                    "{}",
                )
            )
    d = _write_events(spark, tmp_path, rows)
    out = {r["d"]: r for r in q_cusum_changepoint(spark, d).collect()}
    base = (TS(2024, 1, 1) - TS(1970, 1, 1)).days
    flagged = [k for k, v in out.items() if v["is_changepoint"]]
    assert flagged == [base + 2]


def test_snapshot_diff_classification(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame(
        [
            # cust 1: one order before T1, another between T1 and T2 → update
            (1, 1, "O", 100.0, TS(1998, 1, 1), "1-URGENT"),
            (2, 1, "O", 50.0, TS(1999, 6, 1), "1-URGENT"),
            # cust 2: only after T1 → insert
            (3, 2, "O", 75.0, TS(1999, 2, 1), "1-URGENT"),
            # cust 3: only before T1, nothing new → unchanged
            (4, 3, "O", 20.0, TS(1997, 1, 1), "1-URGENT"),
            # cust 4: only after T2 → absent from both snapshots
            (5, 4, "O", 10.0, TS(2000, 6, 1), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    rows = {r["custkey"]: r for r in q_snapshot_diff(spark, d).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["change_type"] == "update"
    assert rows[1]["old_total"] == 100.0 and rows[1]["new_total"] == 150.0
    assert rows[2]["change_type"] == "insert"
    assert rows[2]["old_cnt"] is None and rows[2]["new_cnt"] == 1
    assert rows[3]["change_type"] == "unchanged"


def test_zorder_beats_single_column_sort_on_combined_skipping(spark):
    """The point of Z-order: per-file min/max ranges must be tight on BOTH
    dimensions. Compare the Morton layout's combined per-file range metric
    (size range + price-bucket range, averaged over files) against a
    price-only sorted layout of the same file size — the Morton layout
    must be at least as good, and strictly better on the size dimension."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_recommendation_system_spark.plans.mining_queries import (
        q_zorder_layout,
    )
    from flink_recommendation_system_spark.sources.tables import load_table
    from tests.conftest import SF001

    # sf0.01: 2000 parts -> 20 files; sf0.001's 2 files are too coarse for
    # any layout to differentiate
    z = q_zorder_layout(spark, SF001).agg(
        F.avg(
            (F.col("max_size") - F.col("min_size"))
            + (F.col("max_price_bucket") - F.col("min_price_bucket"))
        ).alias("m"),
        F.avg(F.col("max_size") - F.col("min_size")).alias("size_m"),
    ).collect()[0]

    part = load_table(spark, SF001, "part").withColumn(
        "price_e2", F.round(F.col("p_retailprice") * 100).cast("long")
    )
    w_rank = Window.orderBy("price_e2", "p_partkey")
    p = part.withColumn(
        "price_bucket", (F.ntile(64).over(w_rank) - 1).cast("long")
    ).withColumn(
        "file_id",
        ((F.row_number().over(w_rank) - F.lit(1)) / F.lit(100)).cast(
            "long"
        ),
    )
    s = (
        p.groupBy("file_id")
        .agg(
            (F.max("p_size") - F.min("p_size")).alias("sr"),
            (F.max("price_bucket") - F.min("price_bucket")).alias("pr"),
        )
        .agg(
            F.avg(F.col("sr") + F.col("pr")).alias("m"),
            F.avg("sr").alias("size_m"),
        )
        .collect()[0]
    )
    assert z["m"] <= s["m"], (z, s)
    assert z["size_m"] < s["size_m"], (z, s)


def test_weighted_median_lower_median_semantics(spark, tmp_path):
    # flag A: qty 1 w=10, qty 2 w=10 → cum at qty1 = 10, 2*10 >= 20 → median 1
    # flag B: qty 1 w=9, qty 5 w=11 → cum at qty1 = 9, 18 < 20 → median 5
    d = str(tmp_path)
    rows = [
        (1, 1, 1, 1, 1.0, 0.10, 0.0, 0.0, "A", "O", TS(1996, 1, 1)),
        (2, 1, 1, 1, 2.0, 0.10, 0.0, 0.0, "A", "O", TS(1996, 1, 1)),
        (3, 1, 1, 1, 1.0, 0.09, 0.0, 0.0, "B", "O", TS(1996, 1, 1)),
        (4, 1, 1, 1, 5.0, 0.11, 0.0, 0.0, "B", "O", TS(1996, 1, 1)),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    from flink_recommendation_system_spark.plans.mining_queries import (
        q_weighted_median,
    )

    got = {
        r["l_returnflag"]: r["weighted_median_qty"]
        for r in q_weighted_median(spark, d).collect()
    }
    assert got == {"A": 1.0, "B": 5.0}


def test_benford_digit_extraction_small_and_large(spark, tmp_path):
    # 0.50 → cents "50" → digit 5; 123.00 → "12300" → digit 1
    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, 1, "O", 0.50, TS(1996, 1, 1), "1-URGENT"),
            (2, 1, "O", 123.00, TS(1996, 1, 1), "1-URGENT"),
            (3, 1, "O", 190.00, TS(1996, 1, 1), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    from flink_recommendation_system_spark.plans.mining_queries import (
        q_benford_deviation,
    )

    got = {
        r["digit"]: r["observed"]
        for r in q_benford_deviation(spark, d).collect()
    }
    assert got == {5: 1, 1: 2}


def test_k_anonymity_negative_balance_buckets_by_floor(spark, tmp_path):
    # -0.01 and -999.99 must land in DIFFERENT buckets than +0.01, and the
    # offset keeps the floor division exact for negatives in both engines
    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "a", 0, -0.01, "SEG"),
            (2, "b", 0, 0.01, "SEG"),
            (3, "c", 0, -999.99, "SEG"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    from flink_recommendation_system_spark.plans.mining_queries import (
        q_k_anonymity,
    )

    rows = q_k_anonymity(spark, d).collect()
    # -0.01 → (1e8 - 1) // 1e5 = 999; +0.01 → 1000; -999.99 → 999 too
    # (both in the (-1000, 0) bucket) — so two classes: {999: 2, 1000: 1}
    got = {r["bal_bucket"]: r["class_size"] for r in rows}
    assert got == {999: 2, 1000: 1}
    assert all(not r["meets_k"] for r in rows)


def test_incremental_refresh_equals_full_recompute(spark):
    """The merge identity the query exists to prove: incremental base+delta
    == full recompute over the union range, on the real sf0.001 data."""
    from pyspark.sql import functions as F

    from flink_recommendation_system_spark.plans.mining_queries import (
        _INC_DELTA_END,
        q_incremental_agg_update,
    )
    from flink_recommendation_system_spark.sources.tables import load_table
    from tests.conftest import SF0001

    got = {
        tuple(r)
        for r in q_incremental_agg_update(spark, SF0001).collect()
    }
    orders = load_table(spark, SF0001, "orders")
    full = (
        orders.filter(
            F.col("o_orderdate") < F.lit(_INC_DELTA_END).cast("timestamp_ntz")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).cast("double")
                / F.lit(100.0)
            ).alias("revenue"),
        )
    )
    want = {tuple(r) for r in full.collect()}
    assert got == want and got


def test_popularity_gini_known_distribution(spark, tmp_path):
    # counts [1, 3] → sorted x=[1,3], ranks [1,2]: six = 1 + 6 = 7, sx = 4,
    # n = 2 → G = (14 - 12) / 8 = 0.25
    d = _write_events(
        spark,
        tmp_path,
        [
            (1, TS(2024, 1, 1), 1, "view", 1.0, '{"k": 7}'),
            (2, TS(2024, 1, 1), 1, "view", 1.0, '{"k": 9}'),
            (3, TS(2024, 1, 1), 2, "view", 1.0, '{"k": 9}'),
            (4, TS(2024, 1, 1), 3, "view", 1.0, '{"k": 9}'),
        ],
    )
    from flink_recommendation_system_spark.plans.mining_queries import (
        q_popularity_gini,
    )

    r = q_popularity_gini(spark, d).collect()[0]
    assert r["n"] == 2 and r["total_interactions"] == 4
    assert r["gini"] == 0.25


def test_phrase_search_positions_and_overlaps(spark, tmp_path):
    """Positions are 1-based and occurrences may overlap: in 'a b a b a b'
    the top trigram is 'a b a' (2 occurrences, at 1 and 3, overlapping)
    tied with 'b a b' (1 occurrence... actually 'a b a' wins on count)."""
    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "a b a b a b", "en", "s", 11),
            (2, "a b a x y z", "en", "s", 11),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    from flink_recommendation_system_spark.plans.llm_pipeline_queries import (
        q_phrase_search,
    )

    rows = sorted(
        (r["doc_id"], r["start_pos"], r["w1"], r["w2"], r["w3"])
        for r in q_phrase_search(spark, d).collect()
    )
    # trigram counts: 'a b a' ×3 (doc1@1, doc1@3, doc2@1), 'b a b' ×2 →
    # top phrase 'a b a'; occurrences at doc1 pos 1 and 3 OVERLAP
    assert rows == [
        (1, 1, "a", "b", "a"),
        (1, 3, "a", "b", "a"),
        (2, 1, "a", "b", "a"),
    ]


def test_markov_attribution_hand_chain(spark):
    """Removal-effect math on a journey chain small enough to solve by
    hand (no cycles → the K=12 truncation is exact here):

      u1: A → purchase          u2: A → B → purchase       u3: B (no conv)

    T: START→{A:2/3, B:1/3}; A→{CONV:1/2, B:1/2}; B→{CONV:1/2, DROP:1/2}.
    full p = 2/3·(1/2 + 1/2·1/2) + 1/3·1/2 = 2/3.
    remove A → 1/3·1/2 = 1/6 (effect 1/2);
    remove B → 2/3·1/2 = 1/3 (effect 1/3); shares 0.6 / 0.4."""
    from flink_recommendation_system_spark.plans.mining_queries import (
        markov_attribution_from_events,
    )

    rows = [
        (1, 1, "A", 10), (1, 2, "purchase", 20),
        (2, 3, "A", 10), (2, 4, "B", 20), (2, 5, "purchase", 30),
        (3, 6, "B", 10),
    ]
    ev = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, event_type STRING, s LONG"
    )
    got = {
        r["channel"]: (
            r["p_conv_full"],
            r["p_conv_removed"],
            r["removal_effect"],
            r["attribution_share"],
        )
        for r in markov_attribution_from_events(ev).collect()
    }
    assert set(got) == {"A", "B"}
    for ch, (pf, pr, eff, share) in got.items():
        assert abs(pf - 2 / 3) < 1e-5, got
    assert abs(got["A"][1] - 1 / 6) < 1e-5, got
    assert abs(got["B"][1] - 1 / 3) < 1e-5, got
    assert abs(got["A"][3] - 0.6) < 1e-5 and abs(got["B"][3] - 0.4) < 1e-5


def test_modularity_two_cliques(spark):
    """Newman modularity sanity via the registered arithmetic: two
    disjoint triangles under the perfect partition score Q = 1/2."""
    from pyspark.sql import functions as F

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(4, 5), (5, 6), (4, 6)]
    und = tri1 + tri2 + [(b, a) for a, b in tri1 + tri2]
    edges = spark.createDataFrame(und, ["src", "dst"])
    labels = spark.createDataFrame(
        [(i, 1 if i <= 3 else 2) for i in range(1, 7)], ["id", "label"]
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e2 = edges.count()  # 12
    dc = labels.join(deg, "id").groupBy("label").agg(F.sum("deg").alias("d_c"))
    la = labels.select(F.col("id").alias("src"), F.col("label").alias("l1"))
    lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("l2"))
    intra = (
        edges.join(la, "src").join(lb, "dst")
        .filter(F.col("l1") == F.col("l2"))
        .groupBy(F.col("l1").alias("label"))
        .agg(F.count(F.lit(1)).alias("i_c"))
    )
    num = (
        dc.join(intra, "label")
        .select((F.col("i_c") * e2 - F.col("d_c") * F.col("d_c")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert num / (e2 * e2) == 0.5


def test_touch_attribution_keeps_untouched_purchases(spark, tmp_path):
    """Round-13 spec fix: a direct purchase with no prior touch reports
    n_touches=0 with NULL first/last touch — it must not vanish from the
    output (the old inner join shrank every downstream denominator)."""
    t0 = TS(2024, 1, 1, 12, 0, 0)
    d = _write_events(
        spark,
        tmp_path,
        [
            (10, t0, 1, "purchase", 1.0, "{}"),  # no touches at all
            (11, t0, 2, "purchase", 1.0, "{}"),
            (1, t0 - datetime.timedelta(seconds=5), 2, "click", 1.0, "{}"),
        ],
    )
    out = {r["purchase_id"]: r for r in q_touch_attribution(spark, d).collect()}
    assert set(out) == {10, 11}
    assert out[10]["n_touches"] == 0
    assert out[10]["first_touch"] is None
    assert out[10]["last_touch"] is None
    assert out[11]["n_touches"] == 1


def test_cusum_gap_fills_zero_event_days(spark, tmp_path):
    """Round-13 spec fix: a zero-event day is a data point — an outage IS
    the changepoint. Series [5,5,5,(0),(0),5-ish...] with days 3-4 absent
    from the raw events must flag inside/adjacent to the outage, and the
    output must carry one row per calendar day including x=0 rows."""
    rows = []
    eid = 0
    # days 0-2: 5 events; days 3-4: NOTHING; days 5-6: 5 events
    for day in [0, 1, 2, 5, 6]:
        for _ in range(5):
            eid += 1
            rows.append(
                (
                    eid,
                    TS(2024, 1, 1) + datetime.timedelta(days=day, hours=1),
                    1,
                    "click",
                    1.0,
                    "{}",
                )
            )
    d = _write_events(spark, tmp_path, rows)
    out = {r["d"]: r for r in q_cusum_changepoint(spark, d).collect()}
    base = (TS(2024, 1, 1) - TS(1970, 1, 1)).days
    assert len(out) == 7  # calendar spine, not just active days
    assert out[base + 3]["x"] == 0 and out[base + 4]["x"] == 0
    # hand CUSUM: x=[5,5,5,0,0,5,5], n=7, sx=25 → dev=7x-25 =
    # [10,10,10,-25,-25,10,10]; S'=[10,20,30,5,-20,-10,0]; |S'| peaks 30
    # at day index 2 — the last pre-outage day
    flagged = [k for k, v in out.items() if v["is_changepoint"]]
    assert flagged == [base + 2]
    assert out[base + 2]["cusum_scaled"] == 30


def test_chi_square_densifies_zero_cells(spark, tmp_path):
    """Round-13 spec fix: a (type, bucket) cell with zero observations
    contributes (0-E)^2/E = E to chi-square and must appear as an
    observed=0 row; omitting it biased the test toward non-rejection."""
    from flink_recommendation_system_spark.plans.mining_queries import (
        QUERIES as MQ,
    )

    rows = []
    eid = 0
    # 'click' only in bucket 0 (hours 0-5); 'view' in all four buckets
    for h, typ in [(1, "click")] + [(1, "view"), (7, "view"),
                                    (13, "view"), (19, "view")]:
        eid += 1
        rows.append(
            (eid, TS(2024, 1, 1, h), 1, typ, 1.0, "{}")
        )
    d = _write_events(spark, tmp_path, rows)
    out = {(r["event_type"], r["hour_bucket"]): r
           for r in MQ["chi_square_cells"][0](spark, d).collect()}
    assert len(out) == 8  # 2 types x 4 buckets, dense
    zero = out[("click", 1)]
    assert zero["observed"] == 0
    # E = R*C/N = 1*1/5 (click row total 1, bucket-1 column total 1, N=5);
    # contribution = E for a zero cell
    assert zero["expected"] == round(1 * 1 / 5, 6)
    assert zero["contribution"] == zero["expected"]


def test_implicit_negatives_excludes_all_interactions(spark, tmp_path):
    """Round-13 spec fix: a product the user rated LOW (<=3) is still an
    interaction — it must never be sampled as a negative; and the catalog
    is every reviewed product, not only liked ones."""
    from flink_recommendation_system_spark.plans.mining_queries import (
        QUERIES as MQ,
    )

    t0 = TS(2024, 1, 1)
    rows = []
    # reviews_from_events maps product_id = props.k and
    # rating = floor(value) % 5 + 1, so value 4.0 → rating 5.0 (liked)
    # and value 1.0 → rating 2.0 (interacted, NOT liked).
    # user 1 likes p1, DISLIKES p2; p3 is only ever reviewed (liked) by
    # user 2 → p3 is in the catalog and is user 1's only legitimate
    # negative
    for eid, uid, pid, value in [
        (1, 1, 1, 4.0),
        (2, 1, 2, 1.0),
        (3, 2, 3, 4.0),
    ]:
        rows.append(
            (eid, t0, uid, "review", value, f'{{"k": {pid}}}')
        )
    d = _write_events(spark, tmp_path, rows)
    out = MQ["implicit_negatives"][0](spark, d).collect()
    negs = {(r["user_id"], r["product_id"]) for r in out}
    assert (1, 2) not in negs, "low-rated interaction sampled as negative"
    assert (1, 3) in negs
    assert (2, 1) in negs and (2, 2) in negs
