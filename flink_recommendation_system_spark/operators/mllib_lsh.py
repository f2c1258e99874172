"""MLlib-backed LSH variants (BASELINE.json approach: "Structured Streaming
+ MLlib").

The engine's primary near-dup/ANN paths are the hand-rolled, dependency-free
operators in ``dedup.py``/``similarity.py`` (deterministic, oracle-friendly).
These MLlib wrappers are the library-grade alternates — same shapes, fitted
models — for users who want `approxSimilarityJoin`'s tuning surface:

- ``minhash_lsh_pairs_mllib``: HashingTF over token shingles → MinHashLSH →
  approx Jaccard-distance self-join.
- ``brp_near_dups_mllib``: BucketedRandomProjectionLSH (euclidean) over the
  embedding column → approx distance self-join.

Both are seeded → deterministic given the same partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _shingle_features(docs: DataFrame, num_features: int = 1 << 18):
    from pyspark.ml.feature import HashingTF

    with_tokens = docs.select(
        "doc_id", F.array_distinct(tokens("text")).alias("toks")
    )
    tf = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=num_features, binary=True
    )
    return tf.transform(with_tokens)


def minhash_lsh_pairs_mllib(
    docs: DataFrame, threshold: float = 0.5, num_hash_tables: int = 8
) -> DataFrame:
    """Near-dup candidate pairs with Jaccard distance ≤ ``threshold``.
    Output: (a_id, b_id, jaccard_dist), a_id < b_id."""
    from pyspark.ml.feature import MinHashLSH

    feats = _shingle_features(docs)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    ).fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, threshold, distCol="jaccard_dist"
    )
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a_id"),
            F.col("datasetB.doc_id").alias("b_id"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


def brp_near_dups_mllib(
    vectors: DataFrame,
    threshold: float = 1.0,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs with euclidean distance ≤ ``threshold`` via
    BucketedRandomProjectionLSH. Output: (a_id, b_id, eucl_dist)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    v = vectors.select(
        F.col(id_col).alias("vid"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    ).fit(v)
    joined = model.approxSimilarityJoin(v, v, threshold, distCol="eucl_dist")
    return (
        joined.filter(F.col("datasetA.vid") < F.col("datasetB.vid"))
        .select(
            F.col("datasetA.vid").alias("a_id"),
            F.col("datasetB.vid").alias("b_id"),
            F.round("eucl_dist", 6).alias("eucl_dist"),
        )
    )
