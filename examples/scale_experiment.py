#!/usr/bin/env python
"""N× scale-up experiment for the round-2 operators (PERFORMANCE.md
"Measured 10× scale-up"): replicate the sf0.1 inputs with shifted,
disjoint ids — so the workload grows N× without changing per-entity
density — and time each operator fully evaluated at 1× and N×.

Covered here: TF-IDF (vocabulary-join path), item-based co-occurrence CF
(two-hop sparse product), incremental MinHash (new-batch-vs-store pairing),
plus the round-4 retrieval/LM/bloom operators and the round-4b span-dedup
and heavy-hitter passes.

Usage: python examples/scale_experiment.py [sf_dir] [n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators import dedup as D
from flink_recommendation_system_spark.operators import graph as G
from flink_recommendation_system_spark.operators.graph import good_reviews
from flink_recommendation_system_spark.operators.text import tf_idf_top_terms
from flink_recommendation_system_spark.plans.itemcf import item_cooccurrence
from flink_recommendation_system_spark.session import (
    LOCAL_SF_MAX_PARTITION_BYTES,
    get_spark,
)
from flink_recommendation_system_spark.sources.tables import (
    load_table,
    reviews_from_events,
)


def force(df: DataFrame) -> int:
    out = df.select(F.xxhash64(*df.columns).alias("_h")).agg(
        F.expr("bit_xor(_h)"), F.count(F.lit(1)).alias("n")
    ).collect()
    return out[0]["n"]


def replicate(df: DataFrame, n: int, shifts: dict[str, int]) -> DataFrame:
    """Union n copies with each id column shifted per replica — replicas are
    disjoint, so entity-level density (tokens/doc, likes/user) is unchanged
    and scaling should be ~linear for well-shaped plans."""
    parts = [df]
    for i in range(1, n):
        rep = df
        for col, step in shifts.items():
            rep = rep.withColumn(col, F.col(col) + F.lit(i * step))
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()


def timed(label: str, fn) -> None:
    t0 = time.time()
    n = fn()
    print(f"{label:44s} {time.time() - t0:7.2f} s  ({n} rows)")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = get_spark("scale-experiment", max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES)
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load_table(spark, sf_dir, "documents").localCheckpoint()
    docsN = replicate(docs1, n, {"doc_id": 1_000_000})
    liked1 = good_reviews(reviews_from_events(spark, sf_dir)).localCheckpoint()
    likedN = replicate(liked1, n, {"user_id": 10_000, "product_id": 1_000_000})

    def itemcf_on(liked):
        cooc = item_cooccurrence(liked)
        scores = (
            liked.join(cooc, liked["product_id"] == cooc["i"])
            .groupBy("user_id", F.col("j"))
            .agg(F.sum("cooc").alias("score"))
        )
        return lambda: force(scores)

    def incr_minhash_on(docs):
        # newest ~10% of each replica arrives as the ingestion batch
        new = docs.filter(F.col("doc_id") % 1_000_000 >= 4500)
        old = docs.filter(F.col("doc_id") % 1_000_000 < 4500)
        store = D.minhash_signatures(old).localCheckpoint()
        return lambda: force(D.incremental_minhash_pairs(new, store))

    edges1 = G.undirected(G.co_review_edges(liked1)).localCheckpoint()
    edgesN = G.undirected(G.co_review_edges(likedN)).localCheckpoint()

    timed("tfidf_top_terms 1x", lambda: force(tf_idf_top_terms(docs1)))
    timed(f"tfidf_top_terms {n}x", lambda: force(tf_idf_top_terms(docsN)))
    timed("itemcf cooc+score 1x", itemcf_on(liked1))
    timed(f"itemcf cooc+score {n}x", itemcf_on(likedN))
    timed("incremental_minhash (10% batch) 1x", incr_minhash_on(docs1))
    timed(f"incremental_minhash (10% batch) {n}x", incr_minhash_on(docsN))
    timed("pagerank(3) 1x", lambda: force(G.pagerank(edges1)))
    timed(f"pagerank(3) {n}x", lambda: force(G.pagerank(edgesN)))
    timed("star-CC 1x", lambda: force(G.connected_components_star(edges1)))
    timed(f"star-CC {n}x", lambda: force(G.connected_components_star(edgesN)))

    # round-4 operators: retrieval, LM quality scoring, bloom decontamination
    from flink_recommendation_system_spark.operators.bloom import (
        bloom_decontaminate,
    )
    from flink_recommendation_system_spark.operators.lm import bigram_lm_scores
    from flink_recommendation_system_spark.operators.retrieval import bm25_topk

    queries = spark.createDataFrame(
        [(0, "vector join data"), (1, "slow scan table"), (2, "hash merge")],
        ["query_id", "query_text"],
    )

    timed("bm25_topk 1x", lambda: force(bm25_topk(docs1, queries)))
    timed(f"bm25_topk {n}x", lambda: force(bm25_topk(docsN, queries)))
    timed("bigram_lm_scores 1x", lambda: force(bigram_lm_scores(docs1)))
    timed(f"bigram_lm_scores {n}x", lambda: force(bigram_lm_scores(docsN)))

    def bloom_on(docs, m_bits):
        # m sized with the eval corpus (module guidance) so fpp — and thus
        # the flagged-row count — stays comparable across scales
        train = docs.filter(F.col("doc_id") % 10 != 0)
        ev = docs.filter(F.col("doc_id") % 10 == 0)
        return lambda: force(
            bloom_decontaminate(train, ev, n=8, m_bits=m_bits)
        )

    timed("bloom_decontamination 1x", bloom_on(docs1, 1 << 20))
    timed(f"bloom_decontamination {n}x", bloom_on(docsN, 1 << 24))

    # round-4b operators: sub-document span dedup + exact heavy-hitters
    timed(
        "repeated_spans 1x",
        lambda: force(D.repeated_spans(docs1, n=8, min_doc_freq=2)),
    )
    timed(
        f"repeated_spans {n}x",
        lambda: force(D.repeated_spans(docsN, n=8, min_doc_freq=2)),
    )

    from flink_recommendation_system_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    ev1 = load_table(spark, sf_dir, "events").localCheckpoint()
    evN = replicate(ev1, n, {"event_id": 10_000_000})  # same users -> same
    # heavy-hitter SET at every scale; the threshold count scales with n
    timed(
        "heavy_hitters 1x",
        lambda: force(heavy_hitters_exact(ev1, "user_id", 3, 400)),
    )
    timed(
        f"heavy_hitters {n}x",
        lambda: force(heavy_hitters_exact(evN, "user_id", 3, 400)),
    )

    # round-4c sketches: state is FIXED, so N× input should cost ~N× scan
    # time and the OUTPUT (cells) stays constant-size
    from flink_recommendation_system_spark.operators.sketches import (
        cms_build,
        log_histogram,
    )

    timed("cms_build 1x", lambda: force(cms_build(ev1, "user_id", 1024, 4)))
    timed(
        f"cms_build {n}x", lambda: force(cms_build(evN, "user_id", 1024, 4))
    )
    timed("log_histogram 1x", lambda: force(log_histogram(ev1, "value")))
    timed(
        f"log_histogram {n}x", lambda: force(log_histogram(evN, "value"))
    )

    from flink_recommendation_system_spark.operators.sketches import (
        hll_registers,
    )

    timed("hll_registers 1x", lambda: force(hll_registers(ev1, "user_id")))
    timed(
        f"hll_registers {n}x", lambda: force(hll_registers(evN, "user_id"))
    )

    # interval-overlap join over per-user sessions: replicas have DISJOINT
    # users (shifted ids) but the SAME time range, so cross-replica session
    # pairs are real work — candidate volume grows ~quadratically with
    # replicas inside each grid cell, bounded by temporal density (the
    # documented blocking trade-off), not by a cross product
    from flink_recommendation_system_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    # user-shifted replica: N× means N× distinct users in the SAME time
    # range — sessions grow N×, candidate pairs inside each grid cell grow
    # ~N² (the documented temporal-density bound of the blocking scheme)
    evU = replicate(ev1, n, {"event_id": 10_000_000, "user_id": 10_000})

    def overlaps_on(ev, cutoff):
        sess = (
            ev.filter(F.col("user_id") % 1000 < 20)
            .select(
                "user_id",
                F.expr("CAST(ts DIV 1000000000 AS BIGINT)").alias("s"),
            )
            .groupBy("user_id", (F.col("s") / 1800).cast("long").alias("w"))
            .agg(F.min("s").alias("start_sec"), F.max("s").alias("end_sec"))
            .drop("w")
        )
        pairs = interval_overlap_join(
            sess, sess, grid=3600, start_col="start_sec", end_col="end_sec"
        )
        return lambda: force(
            pairs.filter(F.col("a_user_id") < F.col("b_user_id"))
        )

    timed("interval_overlap (20 users/rep) 1x", overlaps_on(ev1, 20))
    timed(f"interval_overlap (20 users/rep) {n}x", overlaps_on(evU, 20))

    # round-5 operators ------------------------------------------------------

    # SRP-bucketed embedding near-dups: replicas get their embedding array
    # ROTATED by the replica index — deterministic, norm-preserving, and it
    # decorrelates replica buckets (a straight copy would plant N exact
    # duplicates of every vector, making the OUTPUT itself grow N² — the
    # documented duplicate-density bound of any near-dup operator, not a
    # plan property).
    from flink_recommendation_system_spark.operators.similarity import (
        embedding_near_dups,
    )

    emb1 = load_table(spark, sf_dir, "embeddings").localCheckpoint()

    def rotated_embeddings(n):
        parts = [emb1]
        for i in range(1, n):
            rot = emb1.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                F.concat(
                    F.slice("embedding", i + 1, 64 - i),
                    F.slice("embedding", 1, i),
                ).alias("embedding"),
                "label",
            )
            parts.append(rot)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint()

    embN = rotated_embeddings(n)
    timed(
        "embedding_near_dups_lsh 1x",
        lambda: force(embedding_near_dups(emb1, threshold=0.3)),
    )
    timed(
        f"embedding_near_dups_lsh {n}x",
        lambda: force(embedding_near_dups(embN, threshold=0.3)),
    )

    # Adamic-Adar on disjoint edge replicas: wedge volume grows linearly.
    # The registered query's bounded (user<200) graph is the exact tier;
    # here the cap demonstrates the hub guard on the unbounded near-clique
    # (without it the full graph is ~4e9 wedges / ~120 s at 1x — measured,
    # linear in wedge count; PERFORMANCE.md).
    import warnings as _warnings

    def aa_on(edges):
        def run():
            with _warnings.catch_warnings():
                _warnings.simplefilter("ignore", UserWarning)
                return force(G.adamic_adar(edges, max_center_degree=64))
        return run

    timed("adamic_adar (cap 64) 1x", aa_on(edges1))
    timed(f"adamic_adar (cap 64) {n}x", aa_on(edgesN))

    # training-set construction: users replicate, catalog stays fixed (the
    # recommended deployment shape — a huge catalog takes the documented
    # hash-prefix pre-filter instead)
    from flink_recommendation_system_spark.operators.training import (
        conversion_labels,
        negative_sampled_pairs,
    )

    items1 = liked1.select("product_id").distinct().localCheckpoint()
    likedU = replicate(liked1, n, {"user_id": 10_000})
    timed(
        "training_pairs 1x",
        lambda: force(negative_sampled_pairs(liked1, items1)),
    )
    timed(
        f"training_pairs {n}x",
        lambda: force(negative_sampled_pairs(likedU, items1)),
    )

    def conv_on(ev):
        base = ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("CAST(ts DIV 1000000000 AS BIGINT)").alias("s"),
        )
        return lambda: force(conversion_labels(base))

    timed("click_conversion_labels 1x", conv_on(ev1))
    timed(f"click_conversion_labels {n}x", conv_on(evU))

    # round-6 operators: classifier scoring, hash-codebook PQ/ADC, frame
    # extraction, fused-bidirectional SCC
    from flink_recommendation_system_spark.operators import classifier as C
    from flink_recommendation_system_spark.operators import (
        multimodal as M,
        similarity as S,
    )

    w6 = S._lcg_vectors(1, C.N_FEATURES, seed=13)[0]

    def clf_on(docs):
        return lambda: force(
            C.linear_scores(C.quality_features(docs), w6, -0.5)
        )

    timed("classifier_scores 1x", clf_on(docs1))
    timed(f"classifier_scores {n}x", clf_on(docsN))

    q1 = emb1.filter(F.col("vec_id") < 10)
    timed(
        "pq_adc_topk 1x", lambda: force(S.pq_adc_topk(q1, emb1, k=5))
    )
    timed(
        f"pq_adc_topk {n}x (fixed queries)",
        lambda: force(S.pq_adc_topk(q1, embN, k=5)),
    )

    def frames_on(docs):
        assets = M.synthesize_assets(docs)
        return lambda: force(
            M.extract_frames(
                assets, every_n=1, decode="fake", fake_frame_bytes=128
            )
        )

    timed("frame_extraction 1x", frames_on(docs1))
    timed(f"frame_extraction {n}x", frames_on(docsN))

    # SCC on disjoint temporal-digraph replicas: component count grows n×,
    # per-replica structure unchanged — the fused loop should stay
    # ~superstep-bound (supersteps don't grow), i.e. sublinear.
    liked_ts = (
        reviews_from_events(spark, sf_dir)
        .filter((F.col("user_id") < 1000) & (F.col("rating") > 3.0))
        .groupBy("user_id", "product_id")
        .agg(F.min("ts").alias("first_ts"))
    )
    a, b = liked_ts.alias("a"), liked_ts.alias("b")
    scc_edges1 = (
        a.join(b, "product_id")
        .filter(F.col("a.first_ts") < F.col("b.first_ts"))
        .select(
            F.col("a.user_id").alias("src"), F.col("b.user_id").alias("dst")
        )
        .distinct()
        .localCheckpoint()
    )
    scc_edgesN = replicate(
        scc_edges1, n, {"src": 10_000, "dst": 10_000}
    ).localCheckpoint()
    timed(
        "scc_components 1x",
        lambda: force(G.strongly_connected_components(scc_edges1)),
    )
    timed(
        f"scc_components {n}x",
        lambda: force(G.strongly_connected_components(scc_edgesN)),
    )

    # Round-6b TPC-H shapes on replicated facts: lineitem replicas shift
    # l_orderkey/l_partkey and part replicates to match, so per-part
    # cardinality is unchanged — the argmin and share shapes should scale
    # ~linearly in fact volume (one partial-agg shuffle each, broadcast
    # dims; the 10x part dim is ~20k rows, still broadcast-sized).
    li1 = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice",
        )
        .localCheckpoint()
    )
    liN = replicate(li1, n, {"l_orderkey": 10_000_000, "l_partkey": 1_000_000})
    part1 = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_type", "p_size")
        .localCheckpoint()
    )
    partN = replicate(part1, n, {"p_partkey": 1_000_000})

    def min_cost_on(li, part):
        def run():
            dim = part.filter(
                (F.col("p_type") == "STANDARD") & (F.col("p_size") >= 40)
            ).select("p_partkey")
            cents = F.round(F.col("l_extendedprice") * 100).cast("long")
            return force(
                li.join(
                    F.broadcast(dim),
                    F.col("l_partkey") == F.col("p_partkey"),
                )
                .select("l_partkey", cents.alias("cents"), "l_suppkey")
                .groupBy("l_partkey")
                .agg(F.min(F.struct("cents", "l_suppkey")).alias("best"))
            )

        return run

    def important_on(li, reps):
        # threshold scaled by the replica count so selectivity (and the
        # output row count per replica) is scale-invariant; the factor is
        # 15000 (not the registered query's 1500) because at sf0.1 no
        # single part holds 1/1500 of a 20k-part corpus — 15000 keeps
        # ~1.2k rows/replica, a discriminating output
        def run():
            cents = F.round(F.col("l_extendedprice") * 100).cast("long")
            pp = (
                li.select("l_partkey", cents.alias("c"))
                .groupBy("l_partkey")
                .agg(F.sum("c").alias("v"))
            )
            tot = pp.agg(F.sum("v").alias("g"))
            return force(
                pp.join(F.broadcast(tot))
                .filter(F.col("v") * 15000 * reps > F.col("g"))
                .select("l_partkey", "v")
            )

        return run

    timed("min_cost_supplier core 1x", min_cost_on(li1, part1))
    timed(f"min_cost_supplier core {n}x", min_cost_on(liN, partN))
    timed("important_parts core 1x", important_on(li1, 1))
    timed(f"important_parts core {n}x", important_on(liN, n))
    spark.stop()


if __name__ == "__main__":
    main()
