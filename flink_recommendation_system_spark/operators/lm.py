"""Corpus-trained n-gram language-model scoring — the CCNet/KenLM-style
quality signal of a training-data pipeline (Wenzek et al. 2020,
arXiv:1911.00359 train a KenLM on clean text and gate web documents by
perplexity). Full KenLM is out of scope (no external models in this
container); the in-engine equivalent is a bigram LM with add-one smoothing
trained ON the corpus itself, scoring each document by its average token
surprise. Low-surprise docs are repetitive/templated; high-surprise docs are
line noise — both tails are what a perplexity gate trims.

No reference-repo counterpart (the reference stops at relational + graph
ops); this extends the engine like operators.text does, same design
contract: hot path all built-in `pyspark.sql.functions` (JVM codegen),
cross-engine-exact arithmetic so a DuckDB oracle can value-check it.

Scale shape:
- bigram extraction: posexplode + per-doc `lead` window (the measured-fast
  pattern from repetition_stats) — sort key (doc_id, pos), narrow rows.
- model "training" is two partial-aggregated counts: c2 over (w1, w2),
  c1 over w1 — shuffle volume bounded by distinct bigrams/unigrams, the
  vocabulary, NOT the corpus. The vocabulary of a 100 TB corpus is not
  broadcastable, so scoring joins stay shuffle equi-joins on the bigram /
  prefix key (the same deliberate choice as tfidf's df join).
- per-doc aggregation groups (doc, w1, w2) first so each distinct bigram
  joins the model once per doc, not once per occurrence.

Cross-engine exactness: both log arguments are exact INTEGERS (smoothed
counts), so Spark's `ln` and DuckDB's `ln` see identical inputs; each
per-bigram surprise is quantized to the 2^-38 binary grid before the
per-document sum (multiples of 2^-38 below 2^15 sum exactly in IEEE
doubles — the pagerank/bm25 construction), making the sum
order-independent; the average is rounded to 6 dp at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import spread_small_scan as _spread

from .text import tokens

_GRID = float(1 << 38)


def _bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Adjacent bigrams in the RAW whitespace split, both tokens
    non-empty — the ONE bigram convention this engine uses everywhere
    (importance.py's ``_feature_array`` and every bigram oracle CTE share
    it). Round-13 review: this helper previously dropped empty tokens
    BEFORE pairing, so ``"x  y"`` formed the bigram (x, y) here but not
    in the oracle or the DSIR features — a silent engine-vs-oracle hash
    break waiting for a corpus with consecutive spaces."""
    # pairing is ROW-LOCAL (round 15): the window partitions on a
    # surrogate physical-row id, NOT id_col — duplicate or NULL document
    # ids otherwise interleave two rows' positions and the lead() pairs
    # tokens ACROSS documents (the oracle constructs pairs per row and
    # can never do that). The rid never reaches the output, so its
    # partition-dependent values don't affect determinism.
    pos = (
        _spread(docs)
        .withColumn("_rid", F.monotonically_increasing_id())
        .select(
            F.col(id_col),
            "_rid",
            F.posexplode(tokens(text_col)).alias("pos", "w1"),
        )
    )
    w = Window.partitionBy("_rid").orderBy("pos")
    return (
        pos.withColumn("w2", F.lead("w1").over(w))
        .filter(
            F.col("w2").isNotNull()
            & (F.col("w1") != "")
            & (F.col("w2") != "")
        )
        .select(id_col, "w1", "w2")
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document under an add-one-smoothed bigram LM trained on
    the whole corpus: ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V)`` with
    ``V`` the corpus vocabulary size. Output: (doc_id, n_bigrams,
    avg_surprise) where ``avg_surprise`` is the mean per-bigram
    ``-ln P(w2|w1)`` in nats (cross-entropy; perplexity = e^avg_surprise),
    rounded to 6 dp. Documents with fewer than 2 tokens score 0.0 with
    n_bigrams 0 — too short to evaluate, callers gate on n_bigrams.
    """
    bg = _bigrams(docs, text_col, id_col)

    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
        .agg(F.count_distinct("tok").alias("v"))
    )

    doc_bg = bg.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("m")
    )
    # -ln P = ln(c1 + V) - ln(c2 + 1); both args exact integers
    surprise = F.log(F.col("c1") + F.col("v")) - F.log(F.col("c2") + 1)
    quant = (
        F.floor(surprise * F.lit(_GRID) + F.lit(0.5)).cast("double")
        / F.lit(_GRID)
    )
    scored = (
        doc_bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.sum(F.col("m") * quant).alias("_s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(F.col("_s") / F.col("n_bigrams"), 6).alias(
                "avg_surprise"
            ),
        )
    )
    # docs too short to have a bigram still appear, scored 0
    all_docs = docs.select(id_col)
    return (
        all_docs.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("avg_surprise", F.lit(0.0)).alias("avg_surprise"),
        )
    )
