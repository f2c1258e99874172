"""DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"): select raw-pool documents
whose hashed-n-gram distribution looks like a small in-domain TARGET set.

Method (public paper, re-expressed Spark-first):

1. Features: word unigrams + adjacent bigrams (both tokens non-empty),
   hashed into ``n_buckets`` buckets (the paper's hashed n-gram feature
   space). The hash is the engine's portable md5-derived 32-bit base
   hash, so DuckDB reproduces bucket assignment exactly.
2. Fit two bag-of-buckets models with add-one smoothing: ``p_t`` over the
   target docs, ``p_r`` over the raw pool.
3. Per raw doc, the log importance weight
   ``log w = Σ_f  ln p_t(b_f) − ln p_r(b_f)``
   summed over the doc's feature occurrences; high weight = looks like
   target under the n-gram models.
4. Selection: deterministic top-k by weight (the paper samples with
   Gumbel noise; the deterministic rank is the value-oracle-able variant
   and the noiseless limit).

Cross-engine exactness (the bigram-LM construction, operators/lm.py):
every log argument is an exact integer; each per-bucket term
``ln(ct_b + 1) − ln(cr_b + 1)`` and the per-doc offset
``ln(nr + B) − ln(nt + B)`` are quantized to the 2^-38 binary grid, so
per-doc sums are order-independent exact multiples of 2^-38 (< 2^15 in
magnitude) and both engines agree bit-for-bit; 6-dp rounding at the end.

Scale design (100 TB): feature generation is PURE codegen array
expressions on the scan (explode of unigrams + adjacent bigrams — no
window, no self-join; the target flag rides through the projection, so
the corpus-sized feature stream is never shuffled to pick up labels).
Both smoothing models come out of ONE (bucket) partial-agg over that
stream (conditional sums), ≤ ``n_buckets`` rows, broadcast back; scoring
is a per-(doc, bucket) partial aggregation joined against the broadcast
model; selection is TakeOrderedAndProject. The only corpus-sized shuffle
is the (doc, bucket) aggregate — bounded by document length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import spread_small_scan as _spread
from .dedup import portable_hash32
from .text import tokens

_GRID = float(1 << 38)


def _quant(col: Column) -> Column:
    return (
        F.floor(col * F.lit(_GRID) + F.lit(0.5)).cast("double") / F.lit(_GRID)
    )


def _feature_array(toks: Column) -> Column:
    """Unigram + adjacent-bigram feature strings from a token array, as
    one codegen expression (no window/shuffle): non-empty unigrams, then
    "w_i w_{i+1}" for each adjacent pair with both sides non-empty."""
    uni = F.filter(toks, lambda t: t != "")
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    bi = F.transform(
        F.filter(
            idx,
            lambda i: (F.element_at(toks, i) != "")
            & (F.element_at(toks, i + 1) != ""),
        ),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    return F.concat(uni, bi)


def hashed_ngram_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per unigram/bigram OCCURRENCE: (id, *carry_cols, bucket).
    Hash = portable 32-bit md5 hash of the feature string mod
    ``n_buckets``. ``carry_cols`` ride through the explode so downstream
    aggregations never join the corpus-sized feature stream back to the
    document table."""
    base = _spread(docs).select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(_feature_array(tokens(text_col))).alias("feat"),
    )
    return base.select(
        id_col,
        *carry_cols,
        (portable_hash32(F.col("feat")) % n_buckets).alias("bucket"),
    )


def dsir_log_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per RAW-pool document (``is_target`` false): (id, n_feats,
    log_weight). Docs with zero features are excluded — there is nothing
    to score them on (callers keep or drop them by policy)."""
    flagged = docs.withColumn("_t", is_target)
    # Round 17 (guide §2.3 "aggregate before you shuffle"): ONE explode
    # scan of the corpus feeds BOTH the bucket model and the per-doc
    # multiplicities. The feature stream partial-aggregates straight to
    # (id, _t, bucket, m) — the finest grain any consumer needs — and the
    # bucket model re-aggregates that (sum of per-doc multiplicities ==
    # count of occurrences, exactly). Previously the token-sized explode
    # ran twice (model agg + per-doc agg); the shared grain is pinned
    # once (it is orders of magnitude smaller than the raw feature
    # stream — ≤ n_buckets rows per doc vs one row per token occurrence).
    feats = hashed_ngram_features(
        flagged, text_col, id_col, n_buckets, carry_cols=("_t",)
    )
    from ._util import pin_layout

    grain = pin_layout(
        feats.groupBy(id_col, "_t", "bucket").agg(
            F.count(F.lit(1)).alias("m")
        ),
        "bucket",
    ).localCheckpoint(eager=False)

    models = grain.groupBy("bucket").agg(
        F.sum(F.when(F.col("_t"), F.col("m")).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("_t"), F.col("m")).otherwise(0)).alias("cr"),
    )
    totals = models.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )

    doc_feats = grain.filter(~F.col("_t")).select(id_col, "bucket", "m")
    term = _quant(
        F.log(F.coalesce(F.col("ct"), F.lit(0)) + 1)
        - F.log(F.coalesce(F.col("cr"), F.lit(0)) + 1)
    )
    offset = _quant(
        F.log(F.col("nr") + n_buckets) - F.log(F.col("nt") + n_buckets)
    )
    return (
        doc_feats.join(F.broadcast(models), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("m").alias("n_feats"),
            F.sum(F.col("m") * term).alias("_s"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "n_feats",
            F.round(
                F.col("_s") + F.col("n_feats") * offset, 6
            ).alias("log_weight"),
        )
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Top-``k`` raw-pool documents by DSIR log importance weight
    (weight DESC, id ASC — deterministic)."""
    w = dsir_log_weights(docs, is_target, text_col, id_col, n_buckets)
    return w.orderBy(
        F.col("log_weight").desc(), F.col(id_col).asc()
    ).limit(k)


GUMBEL_SALT = "|dsir-gumbel-1"


def dsir_gumbel_sample(
    docs: DataFrame,
    is_target: Column,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    salt: str = GUMBEL_SALT,
) -> DataFrame:
    """DSIR's actual selection mode — weighted sampling WITHOUT
    replacement via the Gumbel-top-k trick (Xie et al. 2023 §2.2; Kool
    et al. 2019): keep the k docs maximizing ``log w + G_i`` where
    ``G_i = −ln(−ln u_i)`` is standard Gumbel noise, which samples
    proportionally to w without replacement. The noise is DERANDOMIZED
    the engine's way: ``u_i = (portable_hash32(id ‖ salt) + 0.5) / 2^32``
    — strictly inside (0,1), reproducible across runs, engines and
    partitionings, so the sample is a pure function of the corpus and
    the salt (the property a regenerable training mix needs), and the
    whole query value-oracles.

    The Gumbel term is quantized to the 2^-38 grid before the add (the
    log-weight is already a 6-dp-rounded double, identical cross-engine;
    double + grid-multiple is one IEEE add — identical too). Output:
    (id, n_feats, log_weight, gumbel_key) for the k sampled docs,
    ordered deterministically (key DESC, id ASC) at the plan level via
    TakeOrderedAndProject."""
    w = dsir_log_weights(docs, is_target, text_col, id_col, n_buckets)
    u = (
        portable_hash32(
            F.concat(F.col(id_col).cast("string"), F.lit(salt))
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    gumbel = _quant(-F.log(-F.log(u)))
    return (
        w.withColumn(
            "gumbel_key", F.round(F.col("log_weight") + gumbel, 6)
        )
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(k)
    )
