"""Hand-computed semantics pins for the round-6b TPC-H shapes — the
subtleties the sf0.01 oracle rows can't isolate: the argmin tie-break in
min_cost_supplier, the strict half-sum inequality in
dominant_part_suppliers, and the NOT-IN exclusion actually removing a
supplier's lines (not just the supplier row) in supplier_part_variety.

Each test materializes a minimal star schema as parquet (the query
functions take an ``sf_dir``) and checks exact expected rows.
"""

from __future__ import annotations

import datetime


from flink_recommendation_system_spark.plans.relational_queries import (
    q_dominant_part_suppliers,
    q_min_cost_supplier,
    q_supplier_part_variety,
)

TS = datetime.datetime


def _write_star(spark, tmp_path, lineitem_rows):
    """Minimal part/supplier/nation + caller-provided lineitem rows."""
    d = str(tmp_path)
    spark.createDataFrame(
        [(1, "alpha part", "Brand#1", "STANDARD", 45, 10.0),
         (2, "beta part", "Brand#1", "STANDARD", 45, 10.0),
         (3, "small gizmo", "Brand#1", "SMALL", 1, 10.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(f"{d}/part.parquet")
    spark.createDataFrame(
        [(10, "Supplier#10", 0, 100.0),
         (20, "Supplier#20", 0, 100.0),
         (30, "Supplier#30", 0, -5.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.mode("overwrite").parquet(f"{d}/supplier.parquet")
    spark.createDataFrame(
        [(0, "NATION0", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.mode("overwrite").parquet(f"{d}/nation.parquet")
    spark.createDataFrame(
        lineitem_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    return d


def _li(orderkey, partkey, suppkey, qty, price, ship):
    return (orderkey, partkey, suppkey, 1, float(qty), float(price),
            0.0, 0.0, "N", "O", ship)


def test_min_cost_supplier_tie_breaks_on_min_suppkey(spark, tmp_path):
    # part 1: suppliers 20 and 10 both hit the 5.00 minimum -> pick 10.
    # part 2: supplier 20 alone at 7.00.
    d = _write_star(spark, tmp_path, [
        _li(1, 1, 20, 1, 5.00, TS(1998, 1, 1)),
        _li(2, 1, 10, 1, 5.00, TS(1998, 1, 2)),
        _li(3, 1, 10, 1, 9.00, TS(1998, 1, 3)),
        _li(4, 2, 20, 1, 7.00, TS(1998, 1, 4)),
    ])
    rows = {
        r["p_partkey"]: (r["min_price"], r["s_name"])
        for r in q_min_cost_supplier(spark, d).collect()
    }
    assert rows == {
        1: (5.00, "Supplier#10"),
        2: (7.00, "Supplier#20"),
    }


def test_dominant_part_suppliers_half_sum_is_strict(spark, tmp_path):
    # small gizmo (part 3), 1998 volume: supp 10 ships 5, supp 20 ships 5
    # -> exactly half each, 2*5 > 10 is FALSE for both: nobody dominates.
    d = _write_star(spark, tmp_path, [
        _li(1, 3, 10, 5, 1.0, TS(1998, 6, 1)),
        _li(2, 3, 20, 5, 1.0, TS(1998, 7, 1)),
    ])
    assert q_dominant_part_suppliers(spark, d).count() == 0

    # tip supp 10 to 6 of 11 -> strict majority -> dominates; and a 1997
    # shipment must NOT count toward the 1998 window.
    d2 = _write_star(spark, tmp_path / "b", [
        _li(1, 3, 10, 6, 1.0, TS(1998, 6, 1)),
        _li(2, 3, 20, 5, 1.0, TS(1998, 7, 1)),
        _li(3, 3, 20, 50, 1.0, TS(1997, 7, 1)),  # outside the year
    ])
    got = [tuple(r) for r in q_dominant_part_suppliers(spark, d2).collect()]
    assert got == [("Supplier#10", "NATION0")]


def test_supplier_part_variety_excludes_complaint_suppliers(spark, tmp_path):
    # part 3 (Brand#1, SMALL, size 1) shipped by suppliers 10, 20 and 30;
    # 30 has negative acctbal -> NOT IN removes its lines, leaving 2.
    d = _write_star(spark, tmp_path, [
        _li(1, 3, 10, 1, 1.0, TS(1998, 1, 1)),
        _li(2, 3, 20, 1, 1.0, TS(1998, 1, 2)),
        _li(3, 3, 30, 1, 1.0, TS(1998, 1, 3)),
    ])
    rows = q_supplier_part_variety(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"]) == (
        "Brand#1", "SMALL", 1, 2,
    )


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_matches_bruteforce(spark):
    """FastSS-1 blocking must be LOSSLESS: equal output to the quadratic
    brute force, including insertion pairs (different lengths),
    substitution pairs, and exact duplicates (dist 0)."""
    from flink_recommendation_system_spark.operators.dedup import (
        edit_distance_pairs,
    )

    names = [
        "abc", "abcd",          # insertion apart
        "xbc",                  # substitution from abc
        "abc",                  # exact duplicate (dist 0)
        "zzz",                  # unrelated
        "Customer#000000001", "Customer#000000002",  # shared-prefix subst
        "Customer#00000001",    # deletion from ...001
        "a", "",                # tiny / empty edge
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(names)], "id long, s string"
    )
    got = {
        (r["id1"], r["id2"], r["dist"])
        for r in edit_distance_pairs(df, "id", "s").collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in enumerate(names)
        for j, b in enumerate(names)
        if i < j and _lev(a, b) <= 1
    }
    assert got == want and len(want) >= 5
