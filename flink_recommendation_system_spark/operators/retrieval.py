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
    # dl = NUMBER OF TERMS (non-empty tokens), the same count the
    # postings side indexes (round-13 review: raw split-cell size counted
    # empty cells, so "spark  dup" normalized as dl=3 vs "spark dup"'s
    # dl=2 despite identical term content — Okapi's dl is term count)
    n_terms = F.size(
        F.filter(tokens(text_col), lambda t: t != "")
    ).cast("long")
    dl = docs.select(F.col(id_col), n_terms.alias("dl"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_terms).alias("total_dl"),
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


def similar_documents(
    docs: DataFrame,
    query_max_id: int = 20,
    top_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Doc-to-doc sparse TF-IDF cosine top-k via the inverted index — the
    "related documents" retrieval shape (dense-embedding ANN's sparse
    sibling; at 100 TB the two run side by side: sparse catches lexical
    overlap the embedding space misses).

    Integer-exact core (the mergeable-sufficient-statistics pattern):
    the per-term squared idf weight is quantized ONCE to a BIGINT grid,
    ``u(t) = floor((ln((N+1)/(df+1)) + 1)² · 2^20 + 0.5)``, after which
    dot(a, b) = Σ_t tf_a·tf_b·u(t) and ‖a‖² = Σ_t tf_a²·u(t) are exact
    BIGINT sums (order-free); cosine = dot / (√‖a‖²·√‖b‖²) is a fixed
    IEEE expression over those integers, rounded to 6 dp before ranking
    with a neighbor-id tie-break — bit-identical in DuckDB.

    Stop-term pruning: terms with df·10 > 9·N (appearing in over 90% of
    the corpus) are dropped — the standard inverted-index skew guard; at
    scale these terms dominate posting-list joins while contributing
    near-zero idf weight. Integer comparison, engine-exact. (The synthetic
    corpus's 31-word vocabulary sits at 60-80% df, so a tighter guard
    would empty the index there; real corpora Zipf far past 90%.)

    Scale shape: ONE postings pass (explode → (doc, term) partial agg);
    df/u is a per-term aggregate joined back by term (never broadcast —
    vocabulary-sized); the query side (id < ``query_max_id``) broadcasts;
    the dot join shards on term and partial-aggregates on
    (query, neighbor) — bounded by shared-term matches, not corpus².

    Output: (query_id, neighbor_id, cosine_sim, rank), rank ≤ ``top_k``.
    """
    docs = _spread(docs)
    postings = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    dft = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        F.log(
            (F.col("n_docs") + F.lit(1.0))
            / (F.col("df") + F.lit(1.0))
        )
        + F.lit(1.0)
    )
    u = F.floor(idf * idf * F.lit(float(1 << 20)) + F.lit(0.5)).cast("long")
    weights = (
        dft.crossJoin(F.broadcast(n))
        .filter(F.col("df") * 10 <= F.col("n_docs") * 9)
        .select("term", u.alias("u"))
    )
    w = postings.join(weights, "term").select(
        id_col, "term", "tf", "u"
    )
    norms = w.groupBy(id_col).agg(
        F.sum(F.col("tf") * F.col("tf") * F.col("u")).alias("norm2")
    )
    q = w.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"),
        "term",
        F.col("tf").alias("q_tf"),
    )
    dots = (
        F.broadcast(q)
        .join(w, "term")
        .filter(F.col("query_id") != F.col(id_col))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum(F.col("q_tf") * F.col("tf") * F.col("u")).alias("dot"))
    )
    qn = norms.select(
        F.col(id_col).alias("query_id"), F.col("norm2").alias("q_norm2")
    )
    cn = norms.select(
        F.col(id_col).alias("neighbor_id"), F.col("norm2").alias("c_norm2")
    )
    scored = (
        dots.join(F.broadcast(qn), "query_id")
        .join(cn, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("q_norm2").cast("double"))
                    * F.sqrt(F.col("c_norm2").cast("double"))
                ),
                6,
            ).alias("cosine_sim"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
