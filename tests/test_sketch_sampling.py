"""Round-4c operators: count-min sketch, exact-k deterministic sampling,
quality-aware dedup representatives."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from flink_recommendation_system_spark.operators.relational import (
    uniform_sample_k,
)
from flink_recommendation_system_spark.sources.tables import load_table
from tests.conftest import SF0001

W, D = 128, 4


def test_cms_never_underestimates(spark):
    li = load_table(spark, SF0001, "lineitem")
    sketch = cms_build(li, "l_partkey", W, D)
    probes = li.select("l_partkey").distinct()
    est = cms_estimate(sketch, probes, "l_partkey", W, D)
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    joined = est.join(exact, "l_partkey")
    n = joined.count()
    assert n == probes.count()
    under = joined.filter(F.col("est_cnt") < F.col("cnt")).count()
    assert under == 0  # CMS over-estimates only, never under
    # with width << #keys some collisions must exist (sanity that the
    # estimate is not just the exact count in disguise)
    assert joined.filter(F.col("est_cnt") > F.col("cnt")).count() > 0


def test_cms_sparse_size_bounded(spark):
    li = load_table(spark, SF0001, "lineitem")
    sketch = cms_build(li, "l_partkey", W, D)
    assert sketch.count() <= W * D
    # total mass per row r equals the non-null input count
    total = li.filter(F.col("l_partkey").isNotNull()).count()
    per_row = sketch.groupBy("r").agg(F.sum("cnt").alias("s")).collect()
    assert len(per_row) == D and all(r["s"] == total for r in per_row)


def test_cms_merge_linearity(spark):
    li = load_table(spark, SF0001, "lineitem")
    even = li.filter(F.col("l_orderkey") % 2 == 0)
    odd = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = cms_merge(
        cms_build(even, "l_partkey", W, D), cms_build(odd, "l_partkey", W, D)
    )
    full = cms_build(li, "l_partkey", W, D)
    sym_diff = merged.exceptAll(full).union(full.exceptAll(merged))
    assert sym_diff.count() == 0


def test_uniform_sample_exact_k_and_partition_invariant(spark):
    docs = load_table(spark, SF0001, "documents")
    s1 = uniform_sample_k(docs, 37, "doc_id")
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    assert len(ids1) == 37
    s2 = uniform_sample_k(docs.repartition(7), 37, "doc_id")
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2  # layout-invariant
    s3 = uniform_sample_k(docs, 37, "doc_id", salt="other-salt")
    ids3 = sorted(r["doc_id"] for r in s3.select("doc_id").collect())
    assert ids1 != ids3  # salt actually re-draws the sample


def test_quality_dedup_keeps_best_doc_per_cluster(spark):
    from flink_recommendation_system_spark.operators import text as T
    from flink_recommendation_system_spark.plans.llm_pipeline_queries import (
        q_deduped_corpus,
        q_deduped_corpus_quality,
        q_near_dup_clusters_lsh,
    )

    kept = q_deduped_corpus_quality(spark, SF0001)
    # same cluster structure as the min-id policy → same representative count
    assert kept.count() == q_deduped_corpus(spark, SF0001).count()

    docs = load_table(spark, SF0001, "documents")
    clusters = q_near_dup_clusters_lsh(spark, SF0001)
    scored = T.quality_stats(docs).select("doc_id", "quality_score")
    member_max = (
        clusters.join(scored, "doc_id")
        .groupBy("cluster_id")
        .agg(F.max("quality_score").alias("best"))
    )
    rep_quality = (
        kept.select("doc_id")
        .join(clusters, "doc_id")
        .join(scored, "doc_id")
        .join(member_max, "cluster_id")
    )
    # every kept representative carries its cluster's max quality score
    assert rep_quality.filter(F.col("quality_score") < F.col("best")).count() == 0


def test_publish_artifacts_quality_policy_matches_query(spark, tmp_path):
    """publish_corpus_artifacts(representative='quality') — the one-pass
    production publisher — emits exactly the rows of the registered
    deduped_corpus_quality query (which recomputes for oracle isolation)."""
    from flink_recommendation_system_spark.operators.dedup import (
        publish_corpus_artifacts,
    )
    from flink_recommendation_system_spark.plans.llm_pipeline_queries import (
        q_deduped_corpus_quality,
    )

    docs = load_table(spark, SF0001, "documents")
    paths = publish_corpus_artifacts(
        docs, str(tmp_path / "art"), representative="quality"
    )
    got = {
        r["doc_id"]
        for r in spark.read.parquet(paths["corpus"]).select("doc_id").collect()
    }
    want = {
        r["doc_id"]
        for r in q_deduped_corpus_quality(spark, SF0001)
        .select("doc_id")
        .collect()
    }
    assert got == want and got


def test_log_histogram_quantile_bounds(spark):
    from flink_recommendation_system_spark.operators.sketches import (
        HIST_SUB_BITS,
        histogram_quantiles,
        log_histogram,
        merge_log_histograms,
    )

    orders = load_table(spark, SF0001, "orders")
    hist = log_histogram(orders, "o_totalprice", scale=100)
    got = {
        (r["q_num"], r["q_den"]): r["est"]
        for r in histogram_quantiles(
            hist, [(1, 2), (9, 10), (99, 100)]
        ).collect()
    }
    import math

    vals = sorted(
        int(math.floor(r["o_totalprice"] * 100 + 0.5))
        for r in orders.select("o_totalprice").collect()
    )
    n = len(vals)
    width = 1 + 2.0 ** -HIST_SUB_BITS
    for (num, den), est in got.items():
        true = vals[(num * n + den - 1) // den - 1]  # rank ceil(q*n), 1-based
        # the true rank value lies inside the reported bucket
        assert est <= true < est * width, ((num, den), est, true)

    # merge linearity: two halves sum to the full histogram
    lo = orders.filter(F.col("o_orderkey") % 2 == 0)
    hi = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = merge_log_histograms(
        log_histogram(lo, "o_totalprice"), log_histogram(hi, "o_totalprice")
    )
    sym = merged.exceptAll(hist).union(hist.exceptAll(merged))
    assert sym.count() == 0


def test_hll_accuracy_and_merge(spark):
    from flink_recommendation_system_spark.operators.sketches import (
        HLL_B,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    li = load_table(spark, SF0001, "lineitem")
    regs = hll_registers(li, "l_partkey")
    assert regs.count() <= 1 << HLL_B  # fixed state
    est = hll_estimate(regs).collect()[0]["est"]
    exact = li.select("l_partkey").distinct().count()
    assert abs(est - exact) / exact < 0.15  # ~2.3 sigma at m=256

    # merge = per-bucket max == registers of the union
    even = li.filter(F.col("l_partkey") % 2 == 0)
    odd = li.filter(F.col("l_partkey") % 2 == 1)
    merged = hll_merge(
        hll_registers(even, "l_partkey"), hll_registers(odd, "l_partkey")
    )
    sym = merged.exceptAll(regs).union(regs.exceptAll(merged))
    assert sym.count() == 0


def test_hll_estimate_rejects_larger_b_registers(spark):
    import pytest

    from flink_recommendation_system_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    li = load_table(spark, SF0001, "lineitem")
    regs10 = hll_registers(li, "l_partkey", b=10)
    with pytest.raises(Exception, match="larger b"):
        hll_estimate(regs10, b=8).collect()


def test_hll_per_group_accuracy(spark):
    from flink_recommendation_system_spark.operators.sketches import (
        hll_estimate_by,
        hll_registers_by,
    )

    li = load_table(spark, SF0001, "lineitem")
    regs = hll_registers_by(li, "l_returnflag", "l_orderkey")
    est = {
        r["l_returnflag"]: r["est"]
        for r in hll_estimate_by(regs, "l_returnflag").collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for g, e in est.items():
        assert abs(e - exact[g]) / exact[g] < 0.2  # ~3 sigma at m=256


def test_hll_estimate_rejects_duplicate_buckets(spark):
    import pytest

    from flink_recommendation_system_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    li = load_table(spark, SF0001, "lineitem")
    regs = hll_registers(li, "l_partkey")
    raw_union = regs.unionByName(regs)  # NOT hll_merge
    with pytest.raises(Exception, match="hll_merge"):
        hll_estimate(raw_union).collect()


def test_cms_estimate_excludes_null_probes(spark):
    """Probe side shares cms_build's NULL contract (ADVICE r04): a NULL
    probe key is excluded, not silently estimated as 0."""
    from flink_recommendation_system_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    sk = cms_build(df, "k", width=64, depth=2)
    probes = spark.createDataFrame(
        [("a",), (None,)], "k string"
    )
    got = {r["k"]: r["est_cnt"] for r in
           cms_estimate(sk, probes, "k", width=64, depth=2).collect()}
    assert got == {"a": 2}


def test_histogram_quantiles_empty_input_yields_null_rows(spark):
    """An empty histogram returns one row per requested quantile with
    est NULL (ADVICE r04) — 'no data' is distinguishable from a dropped
    quantile."""
    from flink_recommendation_system_spark.operators.sketches import (
        histogram_quantiles,
    )

    empty = spark.createDataFrame([], "b int, p bigint, cnt bigint")
    got = {(r["q_num"], r["q_den"]): r["est"] for r in
           histogram_quantiles(empty, [(1, 2), (9, 10)]).collect()}
    assert got == {(1, 2): None, (9, 10): None}


def test_weighted_sample_pps_bias_and_invariance(spark):
    from flink_recommendation_system_spark.operators.relational import (
        weighted_sample_k,
    )

    # 500 light rows (w=1) + 100 heavy rows (w=100): heavy mass fraction
    # is 100*100/(100*100+500) ≈ 0.952, so a 50-row PPS draw should be
    # heavy-dominated; a uniform draw would give ~8 heavy rows.
    rows = [(i, 1) for i in range(500)] + [(1000 + i, 100) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w long")
    s1 = weighted_sample_k(df, 50, "w", "id")
    got1 = sorted(r["id"] for r in s1.select("id").collect())
    assert len(got1) == 50
    n_heavy = sum(1 for i in got1 if i >= 1000)
    assert n_heavy >= 35, f"PPS draw not weight-biased: {n_heavy}/50 heavy"

    # layout-invariant: identical draw from a different partitioning
    s2 = weighted_sample_k(df.repartition(7), 50, "w", "id")
    assert got1 == sorted(r["id"] for r in s2.select("id").collect())

    # salt re-draws; non-positive weights are excluded even with k > n
    s3 = weighted_sample_k(df, 50, "w", "id", salt="other")
    assert got1 != sorted(r["id"] for r in s3.select("id").collect())
    df0 = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -1)], "id long, w long"
    )
    assert [r["id"] for r in weighted_sample_k(df0, 10, "w", "id").collect()] == [1]
