#!/usr/bin/env python
"""End-to-end training-corpus hygiene pipeline — executable documentation
of how the LLM-data operators compose in production:

    raw documents
      → quality gate (length/stopword heuristics + repetition filters)
      → exact dedup (constant-size-key shuffle)
      → one-pass near-dup artifacts (signatures / pairs / clusters /
        deduped corpus — publish_corpus_artifacts)

Usage: python examples/corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators import text as T
from flink_recommendation_system_spark.operators.dedup import (
    exact_dedup,
    publish_corpus_artifacts,
)
from flink_recommendation_system_spark.session import get_spark
from flink_recommendation_system_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="corpus_artifacts_")
    )
    spark = get_spark("corpus-pipeline")
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

    # 2. exact dedup BEFORE near-dup (bounds LSH candidate blowup —
    #    PERFORMANCE.md "Quadratic problems")
    exact = exact_dedup(gated)
    n_exact = exact.count()

    # 3. one signature pass → all near-dup artifacts
    paths = publish_corpus_artifacts(exact, out)
    n_final = spark.read.parquet(paths["corpus"]).count()
    n_pairs = spark.read.parquet(paths["pairs"]).count()

    print(f"raw documents        {n_raw}")
    print(f"after quality gate   {n_gated}")
    print(f"after exact dedup    {n_exact}")
    print(f"near-dup pairs       {n_pairs}")
    print(f"final corpus         {n_final}")
    print(f"artifacts under      {out}")
    spark.stop()


if __name__ == "__main__":
    main()
