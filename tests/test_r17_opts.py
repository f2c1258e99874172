"""Round-17 optimization parity tests: every operator whose internals
changed this round is pinned against its previous formulation on data
that exercises the edge cases the rewrite reasons about (singleton
clusters, duplicate ids, multiplicity-sensitive groupings)."""

from __future__ import annotations

from pyspark.sql import functions as F


# --- BPE driver-side fit (round 17: bounded-collect gate) --------------------


def test_bpe_fit_driver_matches_distributed(spark, monkeypatch):
    """The driver-side merge loop must equal the distributed rounds
    merge-for-merge — same exact integer counts, same (count DESC, x ASC,
    y ASC) tie-break, same greedy left-to-right replace — on a vocabulary
    with repeated-character words and exact count ties."""
    from flink_recommendation_system_spark.operators import bpe

    vocab = {
        "aaab": 3, "aab": 2, "abab": 5, "b": 7, "cdcd": 4,
        "aaaa": 2, "dcdc": 4,  # tie on (d,c) vs (c,d) counts
    }
    df = spark.createDataFrame(list(vocab.items()), "word string, cnt long")
    driver_merges = bpe.bpe_fit(df, n_merges=8)  # gate takes driver path
    monkeypatch.setattr(bpe, "BPE_DRIVER_FIT_MAX_VOCAB", 0)
    dist_merges = bpe.bpe_fit(df, n_merges=8)  # forced distributed path
    assert driver_merges == dist_merges


def test_bpe_fit_driver_gate_thresholds(spark, monkeypatch):
    """Exactly-at-gate vocab takes the driver path; one-over stays
    distributed — both produce identical merges."""
    from flink_recommendation_system_spark.operators import bpe

    vocab = {"abab": 5, "bc": 2, "abc": 1}
    df = spark.createDataFrame(list(vocab.items()), "word string, cnt long")
    monkeypatch.setattr(bpe, "BPE_DRIVER_FIT_MAX_VOCAB", 3)
    at_gate = bpe.bpe_fit(df, n_merges=4)
    monkeypatch.setattr(bpe, "BPE_DRIVER_FIT_MAX_VOCAB", 2)
    over_gate = bpe.bpe_fit(df, n_merges=4)
    assert at_gate == over_gate


# --- quality_representatives singleton bypass --------------------------------


def _old_quality_representatives(clusters, docs):
    """The pre-round-17 formulation (argmax over EVERY cluster including
    singletons) — kept verbatim as the parity reference."""
    from flink_recommendation_system_spark.operators.text import quality_stats

    scored = quality_stats(docs).select("doc_id", "quality_score")
    return (
        clusters.join(scored, "doc_id")
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max_by(
                "doc_id",
                F.struct(
                    F.col("quality_score"),
                    F.col("n_chars"),
                    (-F.col("doc_id")).alias("neg_id"),
                ),
            ).alias("doc_id")
        )
        .select("doc_id")
    )


def test_quality_representatives_singleton_bypass_parity(spark):
    """keep-sets must be identical AS SETS (consumers attach keep via
    left_semi, so multiplicity is immaterial) on a map mixing: multi-doc
    clusters, singleton clusters, duplicate doc_id rows inside one
    cluster, and a NULL-text doc in a singleton."""
    from flink_recommendation_system_spark.operators.dedup import (
        quality_representatives,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today ok", 52),
            (2, "the quick brown fox jumps over the lazy dog", 44),
            (3, "tiny", 4),
            (4, None, None),          # NULL text, singleton
            (5, "another fine document with plenty of the words here", 51),
            (5, "dup id short", 12),  # duplicate doc_id row
            (6, "solo document kept by construction with some words", 50),
        ],
        "doc_id long, text string, n_chars long",
    )
    clusters = spark.createDataFrame(
        [
            (1, 1), (2, 1),      # multi cluster: argmax applies
            (3, 3),              # singleton
            (4, 4),              # singleton, NULL text
            (5, 5),              # singleton with duplicated docs rows
            (6, 6),              # singleton
        ],
        "doc_id long, cluster_id long",
    )
    new = {
        r["doc_id"]
        for r in quality_representatives(clusters, docs).collect()
    }
    old = {
        r["doc_id"]
        for r in _old_quality_representatives(clusters, docs).collect()
    }
    assert new == old
    assert 1 in new and 2 not in new  # argmax picked the better copy


def test_quality_representatives_multi_cluster_duplicate_ids(spark):
    """A ≥2-row cluster whose rows share one doc_id must keep exactly
    that doc_id (goes through the argmax, not the bypass)."""
    from flink_recommendation_system_spark.operators.dedup import (
        quality_representatives,
    )

    docs = spark.createDataFrame(
        [(7, "words words words words words words words words ok go", 50)],
        "doc_id long, text string, n_chars long",
    )
    clusters = spark.createDataFrame(
        [(7, 7), (7, 7)], "doc_id long, cluster_id long"
    )
    got = {r["doc_id"] for r in quality_representatives(clusters, docs).collect()}
    assert got == {7}


# --- DSIR one-pass feature grain ---------------------------------------------


def test_dsir_log_weights_matches_two_pass_reference(spark):
    """The shared (id, _t, bucket, m) grain must reproduce the previous
    two-scan formulation exactly: same model counts, same per-doc sums,
    same 6-dp log-weights."""
    from flink_recommendation_system_spark.operators.importance import (
        dsir_log_weights,
        hashed_ngram_features,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha", "raw"),
            (2, "beta beta delta", "raw"),
            (3, "alpha beta", "target"),
            (4, "gamma delta epsilon zeta", "raw"),
            (5, "", "raw"),  # zero features: excluded by contract
        ],
        "doc_id long, text string, source string",
    )
    is_target = F.col("source") == "target"
    got = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_log_weights(docs, is_target, n_buckets=32).collect()
    }

    # reference: the old two-scan shape, inlined
    flagged = docs.withColumn("_t", is_target)
    feats = hashed_ngram_features(
        flagged, "text", "doc_id", 32, carry_cols=("_t",)
    )
    models = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("_t"), 1).otherwise(0)).alias("cr"),
    )
    totals = models.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    doc_feats = (
        feats.filter(~F.col("_t"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("m"))
    )

    def _quant(col):
        from flink_recommendation_system_spark.operators.importance import (
            _quant as q,
        )

        return q(col)

    term = _quant(
        F.log(F.coalesce(F.col("ct"), F.lit(0)) + 1)
        - F.log(F.coalesce(F.col("cr"), F.lit(0)) + 1)
    )
    offset = _quant(F.log(F.col("nr") + 32) - F.log(F.col("nt") + 32))
    want = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in (
            doc_feats.join(F.broadcast(models), "bucket", "left")
            .groupBy("doc_id")
            .agg(
                F.sum("m").alias("n_feats"),
                F.sum(F.col("m") * term).alias("_s"),
            )
            .crossJoin(F.broadcast(totals))
            .select(
                "doc_id",
                "n_feats",
                F.round(
                    F.col("_s") + F.col("n_feats") * offset, 6
                ).alias("log_weight"),
            )
        ).collect()
    }
    assert got == want
    assert 5 not in got and 3 not in got  # zero-feature + target excluded
