#!/usr/bin/env python
"""End-to-end training-corpus hygiene pipeline — executable documentation
of how the LLM-data operators compose in production:

    raw documents
      → quality gate (length/stopword heuristics + repetition filters)
      → PII redaction (compliance pass; counts kept for audit)
      → benchmark decontamination (Bloom screen against the eval slice)
      → exact dedup (constant-size-key shuffle)
      → one-pass near-dup artifacts (signatures / pairs / clusters /
        deduped corpus — publish_corpus_artifacts)
      → semantic dedup on the survivors' embeddings (paraphrases, not
        just copies — the multi-probe IVF sublinear tier, the engine's
        measured-best recall at this threshold)
      → LM-score quality resampling (curation mixture)
      → corpus profile sketches (count-min hot sources, log-histogram
        length quantiles — fixed-state, mergeable per shard)
      → sequence-packing plan + dataset card (release artifacts)

Usage: python examples/corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators import text as T
from flink_recommendation_system_spark.operators.bloom import (
    bloom_decontaminate,
)
from flink_recommendation_system_spark.operators.dedup import (
    exact_dedup,
    publish_corpus_artifacts,
)
from flink_recommendation_system_spark.operators.lm import bigram_lm_scores
from flink_recommendation_system_spark.session import (
    LOCAL_SF_MAX_PARTITION_BYTES,
    get_spark,
)
from flink_recommendation_system_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="corpus_artifacts_")
    )
    spark = get_spark("corpus-pipeline", max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. quality gate: classic length/stopword score + repetition filters
    quality = T.quality_stats(docs).select("doc_id", "quality_score")
    repetition = T.repetition_stats(docs)
    gated = (
        docs.join(quality, "doc_id")
        .join(repetition, "doc_id")
        .filter(
            (F.col("quality_score") == 3)
            & (F.col("dup_token_ratio") < 0.9)
            & (F.col("top_bigram_ratio") < 0.9)
        )
        .select(docs.columns)
    )
    n_gated = gated.count()

    # 2. PII redaction: counts for audit, redacted text forward
    red = T.redact_pii(gated)
    gated = gated.drop("text").join(
        red.select("doc_id", F.col("redacted").alias("text")), "doc_id"
    )
    n_pii = red.filter(
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0
    ).count()

    # 3. benchmark decontamination: held-out slice stands in for the eval
    #    suite; Bloom screen — the corpus side joins only a position relation
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    dirty = bloom_decontaminate(gated, ev, n=8).select("doc_id")
    gated = gated.join(dirty, "doc_id", "left_anti")
    n_decon = gated.count()

    # 4. exact dedup BEFORE near-dup (bounds LSH candidate blowup —
    #    PERFORMANCE.md "Quadratic problems")
    exact = exact_dedup(gated)
    n_exact = exact.count()

    # 5. one signature pass → all near-dup artifacts; keep the BEST copy
    #    per cluster (quality policy), not the min-id one
    paths = publish_corpus_artifacts(exact, out, representative="quality")
    corpus = spark.read.parquet(paths["corpus"])
    n_final = corpus.count()
    n_pairs = spark.read.parquet(paths["pairs"]).count()

    # 5b. SEMANTIC dedup on the surviving docs' embeddings (doc_id ≡
    #     vec_id): the Lloyd-FITTED probe-16 multi-probe IVF tier — the
    #     engine's measured-best sublinear config (drop recall 1.0 at
    #     sf0.1 / 0.95 at the dup-dense sf1 probe, vs 0.65 unfitted
    #     probe-8 and 0.05-0.36 for banded SRP: a cosine-0.45 duplicate
    #     sits 63° apart, wider than sign-agreement banding reaches —
    #     PERFORMANCE.md r10/r12 recall tables); one occupancy-law
    #     broadcast-argmin Lloyd step, still linear end to end. Near-dup
    #     catches copies, this catches paraphrases
    from flink_recommendation_system_spark.operators.similarity import (
        semantic_dedup_ivf_refit,
    )

    emb = load_table(spark, sf_dir, "embeddings").join(
        corpus.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sem_keep = semantic_dedup_ivf_refit(
        emb, threshold=0.45, max_cells=2048
    ).select(F.col("vec_id").alias("doc_id"))
    corpus = corpus.join(sem_keep, "doc_id", "left_semi")
    n_sem = corpus.count()

    # 6. curation: LM-score buckets, deterministic resample
    scored = bigram_lm_scores(corpus)
    curated_ids = T.resample_by_score(
        scored, "avg_surprise", edges=[3.37, 3.40], rates=[1.0, 0.5, 0.25]
    ).select("doc_id")
    curated = corpus.join(curated_ids, "doc_id", "left_semi")
    n_curated = curated.count()

    # 7. release artifacts: packing plan + dataset card
    pack = T.pack_documents(curated, target_tokens=512)
    pack.write.mode("overwrite").parquet(f"{out}/packing_plan")
    n_packs = pack.agg(
        F.count_distinct("source", "pack_id").alias("n")
    ).collect()[0]["n"]

    # 7b. fixed-state corpus profile: hot sources (count-min) + length
    #     quantiles (log-histogram) — the sketches a 100 TB build keeps
    #     per shard and merges on read
    from flink_recommendation_system_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        histogram_quantiles,
        log_histogram,
    )

    sketch = cms_build(curated, "source", width=256, depth=4)
    sources = curated.select("source").distinct()
    hot = cms_estimate(sketch, sources, "source", 256, 4).orderBy(
        F.col("est_cnt").desc()
    )
    top_sources = [(r["source"], r["est_cnt"]) for r in hot.take(3)]
    hist = log_histogram(curated, "n_chars", scale=1)
    quant = {
        f"p{100 * r['q_num'] // r['q_den']}": r["est"]
        for r in histogram_quantiles(
            hist, [(1, 2), (9, 10), (99, 100)]
        ).collect()
    }

    # 8. quota-exact per-language train/val/test split of the curated set
    splits = T.stratified_split(curated, {"train": 80, "val": 10, "test": 10})
    splits.select("doc_id", "lang", "split").write.mode("overwrite").parquet(
        f"{out}/splits"
    )
    split_counts = {
        r["split"]: r["n"]
        for r in splits.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    print(f"raw documents        {n_raw}")
    print(f"after quality gate   {n_gated}")
    print(f"docs with PII        {n_pii} (redacted, kept)")
    print(f"after decontam       {n_decon}")
    print(f"after exact dedup    {n_exact}")
    print(f"near-dup pairs       {n_pairs}")
    print(f"deduped corpus       {n_final}")
    print(f"after semantic dedup {n_sem} (multi-probe IVF tier)")
    print(f"after curation       {n_curated}")
    print(f"hot sources (CMS)    {top_sources}")
    print(f"length quantiles     {quant} (chars, bucket lower bounds)")
    print(f"packed windows       {n_packs}")
    print(f"train/val/test       {split_counts}")
    print(f"artifacts under      {out}")
    spark.stop()


if __name__ == "__main__":
    main()
