#!/usr/bin/env python
"""End-to-end tokenizer pipeline — executable documentation of how the
true-BPE surface (operators/bpe.py, round 7) composes in production:

    raw documents
      → word extraction + weighted vocabulary (the Sennrich trick: train
        on |vocab| rows, not the corpus)
      → BPE fit: N merge rounds (pair-frequency argmax, deterministic
        tie-break)
      → vocabulary ARTIFACT (token, weighted freq, dense id) — what the
        training job ships alongside the corpus
      → per-document subword counts (broadcast join-back)
      → per-language compression/fertility report (the go/no-go audit
        before committing to a tokenizer)

All artifacts written as parquet under ``out_dir``; every stage's result
is the same machinery the value-oracled queries `subword_token_counts`,
`bpe_vocab`, and `bpe_compression_stats` pin at sf0.01.

Usage: python examples/tokenizer_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators import bpe
from flink_recommendation_system_spark.session import (
    LOCAL_SF_MAX_PARTITION_BYTES,
    get_spark,
)
from flink_recommendation_system_spark.sources.tables import load_table

N_MERGES = 12


def main(sf_dir: str, out_dir: str) -> None:
    spark = get_spark("tokenizer-pipeline", max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    words = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
            )
        ).alias("word"),
    ).localCheckpoint()
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))

    merges = bpe.bpe_fit(vocab, n_merges=N_MERGES)
    print(f"learned {len(merges)} merges: {merges}")

    tokenized = bpe.bpe_tokenize_words(vocab, merges).localCheckpoint()

    # 1. vocabulary artifact
    toks = tokenized.select(
        "cnt",
        F.explode(
            F.split(
                F.expr("substring(bpe_tokens, 2, length(bpe_tokens) - 2)"),
                r"\)\(",
            )
        ).alias("token"),
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    vocab_art = (
        toks.groupBy("token")
        .agg(F.sum("cnt").alias("freq"))
        .withColumn("token_id", F.row_number().over(w).cast("long"))
    )
    vocab_art.write.mode("overwrite").parquet(f"{out_dir}/bpe_vocab")
    print(f"vocab artifact: {vocab_art.count()} subword tokens")

    # 2. per-document subword counts
    per_doc = (
        words.join(
            F.broadcast(tokenized.select("word", "n_subword_tokens")), "word"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subword_tokens").alias("n_subword_tokens"),
        )
    )
    per_doc.write.mode("overwrite").parquet(f"{out_dir}/doc_token_counts")
    print(f"doc token counts: {per_doc.count()} documents")

    # 3. per-language compression audit
    report = (
        words.join(
            F.broadcast(tokenized.select("word", "n_subword_tokens")), "word"
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_word_chars"),
            F.sum("n_subword_tokens").alias("n_subword_tokens"),
        )
        .withColumn(
            "chars_per_token",
            F.round(
                F.col("n_word_chars").cast("double")
                / F.col("n_subword_tokens").cast("double"),
                6,
            ),
        )
    )
    report.write.mode("overwrite").parquet(f"{out_dir}/compression_report")
    for r in report.orderBy("lang").collect():
        print(
            f"  {r['lang']}: {r['n_words']} words → "
            f"{r['n_subword_tokens']} tokens "
            f"({r['chars_per_token']} chars/token)"
        )
    spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="tokenizer_pipeline_")
    )
    main(sf, out)
    print("artifacts:", out)
