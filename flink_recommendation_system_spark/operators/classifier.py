"""Model-based quality classification — the DCLM/fastText curation stage
(a learned quality model scoring every document, its scores feeding the
resampling buckets) that sits beside the rule-based gates in
``operators.text``.

Reference tie-in: the reference pipeline has only hand rules (its batch
layer filters on rating thresholds, ProductReviewAggregation.java:43-47);
a production corpus pipeline adds a learned scorer trained on weak labels
from those same rules (the DCLM recipe: heuristic labels → linear
classifier → per-doc score → resample). Both halves are here:

- ``quality_features`` / ``linear_scores``: deterministic per-doc feature
  extraction and the scoring pass as a pure column expression over a
  broadcast-able coefficient vector — engine-exact arithmetic, so with a
  FIXED weight vector the whole scoring join is value-oracle-checkable
  (the same hash-derived-constants recipe as ``pq_adc_topk``).
- ``fit_quality_classifier`` / ``score_with_model``: MLlib
  ``LogisticRegression`` on the heuristic labels, coefficients pulled
  once (metadata-sized) and applied through the same ``linear_scores``
  expression — the fit is iterative (rows-only tier, like ALS), the
  scoring stays a broadcast of ~5 doubles into a codegen'd projection,
  never a per-row Python call.

Scale shape: feature extraction and scoring are single-scan, shuffle-free
column expressions — the 100 TB pass is embarrassingly parallel; only the
FIT aggregates (MLlib L-BFGS over the feature matrix), and it can run on
a sample without changing the scoring plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import quality_stats

# Feature vector contract (order matters — weights index into it):
#   x0 = n_tokens / 100        (length, token scale)
#   x1 = mean_token_len        (already 6-dp rounded, engine-exact)
#   x2 = stopword_ratio        (already 6-dp rounded, engine-exact)
#   x3 = n_chars / 1000        (length, char scale)
# All derived with exact division by integer-power constants — no libm
# calls — so features are bit-identical across engines.
N_FEATURES = 4


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-document numeric features for the quality model: (doc_id, x0..x3
    DOUBLE, label) with label = 1 iff every rule-based gate passes
    (quality_score == 3) — the weak-supervision target the DCLM shape
    trains against."""
    # Single-pass projection over docs — NO self-join back on doc_id
    # (round 15: the join multiplied duplicated doc_id rows 2×2-fold and
    # silently dropped NULL-id rows, neither of which the oracle's inline
    # computation does). Unfeaturizable docs (NULL text / NULL n_chars →
    # NULL features) are excluded: MLlib's VectorAssembler refuses NULL
    # rows outright, and both engines must drop the same rows.
    from .text import stopword_count, tokens

    docs = docs.filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    toks = tokens("text")
    n_tok = F.size(toks)
    mean_tok_len = F.round(
        F.aggregate(
            toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
        )
        / n_tok,
        6,
    )
    sw = stopword_count("text")
    score = (
        F.when(n_tok >= 10, 1).otherwise(0)
        + F.when(F.col("n_chars") >= 50, 1).otherwise(0)
        + F.when(sw > 0, 1).otherwise(0)
    )
    return docs.select(
        "doc_id",
        (n_tok.cast("double") / F.lit(100.0)).alias("x0"),
        mean_tok_len.alias("x1"),
        F.round(sw / n_tok, 6).alias("x2"),
        (F.col("n_chars").cast("double") / F.lit(1000.0)).alias("x3"),
        (score == 3).cast("double").alias("label"),
    )


def linear_logit(weights: list[float], bias: float) -> Column:
    """The scoring expression: bias + Σ w_i·x_i in FIXED left-to-right
    order (both engines evaluate the identical float sequence), rounded to
    6 dp. Weights are plan literals — the broadcast-coefficient join
    collapsed to its codegen form."""
    if len(weights) != N_FEATURES:
        raise ValueError(f"need {N_FEATURES} weights")
    z: Column = F.lit(float(bias))
    for i, w in enumerate(weights):
        z = z + F.lit(float(w)) * F.col(f"x{i}")
    return F.round(z, 6)


def linear_scores(
    features: DataFrame, weights: list[float], bias: float
) -> DataFrame:
    """Score every row of ``quality_features`` output with a linear model:
    (doc_id, logit, keep) with keep = logit > 0 (the sigmoid-0.5
    decision boundary — monotone in the logit, so thresholds and buckets
    on the logit equal thresholds on the probability without either
    engine calling exp())."""
    scored = features.select(
        "doc_id", linear_logit(weights, bias).alias("logit")
    )
    # keep derived FROM the logit column (not a second expression copy),
    # so keep == (logit > 0) holds structurally
    return scored.select(
        "doc_id", "logit", (F.col("logit") > 0).alias("keep")
    )


def fit_quality_classifier(
    features: DataFrame, max_iter: int = 25, reg_param: float = 0.01
) -> tuple[list[float], float]:
    """Fit MLlib LogisticRegression on the weak labels; returns
    (coefficients, intercept) — metadata-sized driver constants that feed
    ``linear_scores`` (the scoring pass never touches MLlib again).
    Iterative L-BFGS fit → rows-only verification tier (invariants in
    tests/test_classifier.py), exactly like ALS."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    cols = [f"x{i}" for i in range(N_FEATURES)]
    assembled = VectorAssembler(
        inputCols=cols, outputCol="features"
    ).transform(features)
    model = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    ).fit(assembled)
    return [float(c) for c in model.coefficients], float(model.intercept)


def score_with_model(
    docs: DataFrame, max_iter: int = 25, reg_param: float = 0.01
) -> DataFrame:
    """Fit-then-score in one call (the registered-query shape; production
    fits once on a sample and reuses the constants): per-doc logit from
    the learned model plus the weak label it was trained on.

    Round 17 (guide §2.4): the feature relation feeds THREE consumers —
    the iterative MLlib fit, the scoring projection, and the weak-label
    join — and each otherwise replays the tokenization/feature extraction
    over the corpus. Pin one materialized copy (layout first, hashed on
    the join key, so the scoring↔label self-join shares the pinned
    exchange and downstream stages keep their parallelism)."""
    from ._util import pin_layout

    feats = pin_layout(quality_features(docs), "doc_id").localCheckpoint(
        eager=False
    )
    weights, bias = fit_quality_classifier(
        feats, max_iter=max_iter, reg_param=reg_param
    )
    return linear_scores(feats, weights, bias).join(
        feats.select("doc_id", F.col("label").cast("long").alias("weak_label")),
        "doc_id",
    )
