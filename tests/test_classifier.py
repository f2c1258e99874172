"""Invariants for the learned quality classifier (operators.classifier) —
the rows-only tier's verification, mirroring test_mllib_variants for ALS."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators import classifier as C
from flink_recommendation_system_spark.sources.tables import load_table
from tests.conftest import SF0001


def _feats(spark):
    return C.quality_features(load_table(spark, SF0001, "documents"))


def test_features_cover_every_document(spark):
    docs = load_table(spark, SF0001, "documents")
    feats = _feats(spark)
    assert feats.count() == docs.count()
    assert feats.filter(
        F.col("x0").isNull()
        | F.col("x1").isNull()
        | F.col("x2").isNull()
        | F.col("x3").isNull()
    ).count() == 0


def test_linear_scores_deterministic_and_threshold_consistent(spark):
    feats = _feats(spark)
    w = [0.25, -0.5, 1.5, 0.125]  # exact binary fractions
    a = {r.doc_id: (r.logit, r.keep) for r in C.linear_scores(feats, w, 0.5).collect()}
    b = {r.doc_id: (r.logit, r.keep) for r in C.linear_scores(feats, w, 0.5).collect()}
    assert a == b
    assert all((logit > 0) == keep for logit, keep in a.values())


def test_fit_separates_weak_labels(spark):
    """The learned model must order the classes it was trained on: mean
    logit of label-1 docs above label-0 docs, and train accuracy must beat
    the majority-class baseline (the fit actually learned the rules)."""
    feats = _feats(spark).localCheckpoint()
    weights, bias = C.fit_quality_classifier(feats)
    assert len(weights) == C.N_FEATURES
    scored = C.linear_scores(feats, weights, bias).join(
        feats.select("doc_id", "label"), "doc_id"
    )
    means = {
        r.label: r.m
        for r in scored.groupBy("label")
        .agg(F.avg("logit").alias("m"))
        .collect()
    }
    assert set(means) == {0.0, 1.0}
    assert means[1.0] > means[0.0]
    n = scored.count()
    correct = scored.filter(
        (F.col("keep") & (F.col("label") == 1.0))
        | (~F.col("keep") & (F.col("label") == 0.0))
    ).count()
    majority = (
        scored.groupBy("label").count().agg(F.max("count")).first()[0]
    )
    assert correct / n >= majority / n


def test_model_scores_feed_resampling_buckets(spark):
    """End-to-end DCLM shape: model logits → resample_by_score buckets
    (the integration the operator exists for)."""
    from flink_recommendation_system_spark.operators.text import (
        resample_by_score,
    )

    scored = C.score_with_model(load_table(spark, SF0001, "documents"))
    kept = resample_by_score(
        scored, "logit", edges=[0.0], rates=[0.25, 1.0]
    )
    # high bucket kept in full; low bucket strictly downsampled
    lo_all = scored.filter(F.col("logit") < 0.0).count()
    hi_all = scored.filter(F.col("logit") >= 0.0).count()
    lo_kept = kept.filter(F.col("bucket") == 0).count()
    hi_kept = kept.filter(F.col("bucket") == 1).count()
    assert hi_kept == hi_all
    if lo_all >= 20:
        assert lo_kept < lo_all
