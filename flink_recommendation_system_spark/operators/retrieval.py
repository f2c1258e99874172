"""BM25 batch retrieval over the documents corpus — the quality-retrieval
primitive of a training-data pipeline (e.g. retrieving pretraining docs
relevant to a target domain, or building retrieval-augmented eval sets).

No reference-repo counterpart (the reference stops at relational + graph
ops); this extends the engine the way SURVEY.md §7 M4's text-analysis
block does, and follows the same design contract: all hot-path logic is
built-in `pyspark.sql.functions` (JVM codegen), exact arithmetic where the
oracle needs it, explicit scale shape in the plan.

Scale shape (the inverted-index join, not a scan-per-query):
- postings = explode(corpus tokens) → partial-agg tf per (doc, term):
  ONE pass over the corpus regardless of query count.
- the query term set is tiny → broadcast; df/idf are computed only for
  queried terms (semi-join first), never for the full vocabulary.
- per-(query, doc) scores partial-aggregate map-side; the only wide
  shuffle is on (query_id, doc_id), bounded by matches, not corpus size.

Cross-engine exactness: the per-term BM25 contribution is quantized to the
2^-38 binary grid before the per-document sum (same construction as
``graph.pagerank`` — multiples of 2^-38 below 2^15 sum EXACTLY in IEEE
doubles for up to 2^15 terms, so the sum is order-independent and DuckDB
reproduces it bit-for-bit); scores are rounded to 6 dp BEFORE ranking with
a doc_id tie-break, so ulp noise cannot flip ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import spread_small_scan as _spread

from .text import tokens

_GRID = float(1 << 38)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-``top_k`` documents per query.

    ``queries``: (query_id, query_text) — a small table (broadcast).
    Output: (query_id, doc_id, score, rank), rank 1 = best, ties toward the
    smaller doc_id; only documents matching ≥1 query term appear.

    idf uses the standard Lucene form ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (never negative); tf normalization is ``tf·(k1+1) / (tf + k1·(1 - b +
    b·dl/avgdl))``.
    """
    docs = _spread(docs)  # single-row-group scans serialize the postings build
    postings = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select(
        F.col(id_col), F.size(tokens(text_col)).cast("long").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(text_col)).cast("long")).alias("total_dl"),
    )

    qterms = (
        queries.select(
            "query_id", F.explode(tokens("query_text")).alias("term")
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    # df only for queried terms: semi-join the postings down first — the
    # full-vocabulary df of a 100 TB corpus is never materialized.
    queried_postings = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term", "left_semi"
    )
    df_ = queried_postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )

    scored_terms = (
        F.broadcast(qterms)
        .join(queried_postings, "term")
        .join(dl, id_col)
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1
        * (
            1.0
            - b
            + b
            * F.col("dl")
            / (F.col("total_dl").cast("double") / F.col("n_docs"))
        )
    )
    contrib = idf * tf_norm
    quant = (
        F.floor(contrib * F.lit(_GRID) + F.lit(0.5)).cast("double")
        / F.lit(_GRID)
    )
    scores = (
        scored_terms.select("query_id", id_col, quant.alias("contrib"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scores.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= top_k)
