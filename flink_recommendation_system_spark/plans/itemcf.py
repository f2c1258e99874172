"""Item-based co-occurrence collaborative filtering — the value-checkable
recommender twin.

The engine ships two community-based recommenders (LPA pipeline,
``plans.recommendations``; MLlib ALS, ``plans.als_recommendations``). ALS is
iterative factorization and can never be value-checked by a SQL oracle
(rows-only in the driver gate). This plan adds the classic *item
neighborhood* recommender (co-visitation counting — the Amazon-style
item-to-item shape) whose scores are pure INTEGER path counts, so the DuckDB
oracle reproduces them bit-for-bit: the collaborative-filtering capability
gets a full value check, not just LPA's.

Scoring: ``score(u, i) = Σ_{j ∈ liked(u)} cooc(j, i)`` — the number of
(liked item j, co-reviewer) paths from u to i — over items u has NOT liked;
top-N per user, ties to the smaller product id.

Scale design (100 TB): this is a two-hop sparse matrix product expressed as
two shuffle joins with partial aggregation — no driver data, no Python.
The item-item co-occurrence self-join on user_id is the skew hazard (a user
who likes k items emits k² pairs), bounded by ``max_items_per_user`` (top-N
by product id, deterministic), the same default-on guard pattern as
``co_review_edges``; AQE splits residual skew. The cooc matrix is bounded
by (items/user cap)² · users and is typically broadcastable after the
HAVING-style min-count prune a production deployment would add.

Reference semantics anchor: Recommendations.java:68-77 (recommend what
related users liked, minus own likes) — same contract, item-pivoted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.graph import good_reviews

# Same rationale as MAX_REVIEWERS_PER_PRODUCT: at most this many liked items
# per user enter the co-occurrence build (lowest product ids, deterministic).
# Far above the sf-testdata cardinalities so oracles stay pinned; bounds the
# per-user pair fan-out to cap² at scale. Pass None to uncap.
MAX_ITEMS_PER_USER = 1024

TOP_N = 10


def item_cooccurrence(
    liked: DataFrame, max_items_per_user: int | None = MAX_ITEMS_PER_USER
) -> DataFrame:
    """Item-item co-occurrence counts over the distinct ``liked``
    (user_id, product_id) relation: for each ordered pair of distinct items
    (i, j), the number of users who liked both. Returns (i, j, cooc)."""
    if max_items_per_user is not None:
        w = Window.partitionBy("user_id").orderBy(F.col("product_id").asc())
        liked = (
            liked.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_items_per_user)
            .drop("_rn")
        )
    a = liked.alias("a")
    b = liked.alias("b")
    return (
        a.join(b, "user_id")
        .filter(F.col("a.product_id") != F.col("b.product_id"))
        .groupBy(
            F.col("a.product_id").alias("i"),
            F.col("b.product_id").alias("j"),
        )
        .agg(F.count(F.lit(1)).alias("cooc"))
    )


def itemcf_recommendations(
    reviews: DataFrame,
    top_n: int = TOP_N,
    max_items_per_user: int | None = MAX_ITEMS_PER_USER,
) -> DataFrame:
    """Top-``top_n`` item-neighborhood recommendations per user:
    (user_id, product_id, score, rank) with integer path-count scores,
    rank 1..top_n by (score DESC, product_id ASC)."""
    liked = good_reviews(reviews).localCheckpoint()
    cooc = item_cooccurrence(liked, max_items_per_user)

    scores = (
        liked.join(cooc, liked["product_id"] == cooc["i"])
        .groupBy(F.col("user_id"), F.col("j").alias("rec_product"))
        .agg(F.sum("cooc").alias("score"))
        .select(
            "user_id",
            F.col("rec_product").alias("product_id"),
            "score",
        )
    )
    fresh = scores.join(liked, ["user_id", "product_id"], "left_anti")
    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("product_id").asc()
    )
    return (
        fresh.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
    )


def q_itemcf_recommendations(spark, sf_dir: str) -> DataFrame:
    from ..sources.tables import reviews_from_events

    return itemcf_recommendations(reviews_from_events(spark, sf_dir))


ITEMCF_RECOMMENDATIONS_SQL = """
WITH reviews AS (
    SELECT
        CAST(user_id AS BIGINT) AS user_id,
        __PRODUCT_ID__ AS product_id,
        __RATING__ AS rating,
        CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts
    FROM events
),
liked AS (
    SELECT DISTINCT user_id, product_id
    FROM reviews
    WHERE user_id < 1000 AND rating > 3.0
      AND product_id IS NOT NULL
),
-- mirror of MAX_ITEMS_PER_USER: only the capped relation enters the
-- co-occurrence build (the Spark side caps inside item_cooccurrence), so
-- oracle parity no longer rests on the cap never binding at larger SFs
liked_capped AS (
    SELECT user_id, product_id FROM (
        SELECT user_id, product_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY product_id ASC
               ) AS _rn
        FROM liked
    ) WHERE _rn <= 1024
),
cooc AS (
    SELECT a.product_id AS i, b.product_id AS j, COUNT(*) AS cooc
    FROM liked_capped a
    JOIN liked_capped b
      ON a.user_id = b.user_id AND a.product_id <> b.product_id
    GROUP BY 1, 2
),
scores AS (
    SELECT l.user_id, c.j AS product_id, CAST(SUM(c.cooc) AS BIGINT) AS score
    FROM liked l JOIN cooc c ON l.product_id = c.i
    GROUP BY 1, 2
),
fresh AS (
    SELECT s.* FROM scores s
    WHERE NOT EXISTS (
        SELECT 1 FROM liked o
        WHERE o.user_id = s.user_id AND o.product_id = s.product_id
    )
)
SELECT user_id, product_id, score, rank FROM (
    SELECT user_id, product_id, score,
           ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY score DESC, product_id ASC
           ) AS rank
    FROM fresh
) WHERE rank <= 10
"""

QUERIES: dict[str, tuple] = {
    "itemcf_recommendations": (
        q_itemcf_recommendations,
        ITEMCF_RECOMMENDATIONS_SQL,
    ),
}


# --- offline evaluation (temporal split + ranking metrics) ------------------

# Evaluation depth and the 80/20 temporal split, as exact integer arithmetic
# on the BIGINT epoch-second ts so both engines compute the identical cutoff.
K_EVAL = 10

_G = float(1 << 38)

# 1/log2(r+1) for rank r = 1..K_EVAL, pre-quantized to the 2^-38 dyadic grid
# (floor(x*2^38+0.5)/2^38) so every DCG sum is a sum of dyadic rationals —
# exact in IEEE doubles in ANY accumulation order (the pagerank/bm25
# construction). The same literals are embedded in the DuckDB oracle below;
# Python repr round-trips doubles exactly, so both engines hold identical
# constants.
NDCG_DISCOUNTS = [
    1.0,
    0.6309297535699443,
    0.5,
    0.4306765580731735,
    0.38685280723439064,
    0.3562071871092485,
    0.3333333333321207,
    0.31546487678497215,
    0.30102999566224753,
    0.28906482631646213,
]
# Cumulative sums C[m] = Σ_{r≤m} discount_r — the ideal DCG for a user with
# m ≥ 1 relevant test items (capped at K_EVAL). Sums of ≤10 grid values are
# exact, so these are also engine-identical constants.
NDCG_IDCG_CUM = [
    1.0,
    1.6309297535699443,
    2.1309297535699443,
    2.561606311643118,
    2.9484591188775084,
    3.304666305986757,
    3.6379996393188776,
    3.9534645161038497,
    4.254494511766097,
    4.543559338082559,
]


def _quant(c):
    """Quantize to the 2^-38 dyadic grid (order-independent summation)."""
    return F.floor(c * F.lit(_G) + F.lit(0.5)).cast("double") / F.lit(_G)


def recommender_eval(reviews: DataFrame, k: int = K_EVAL) -> DataFrame:
    """Offline ranking evaluation of the item-neighborhood recommender —
    the standard temporal-holdout protocol a production recsys runs before
    shipping a model (hit rate / precision@k / recall@k / NDCG@k):

    1. Temporal 80/20 split at ``cutoff = min_ts + (max_ts-min_ts)*4 DIV 5``
       (exact BIGINT arithmetic — no percentile estimation).
    2. Train `itemcf_recommendations` on the pre-cutoff reviews only.
    3. Test positives = post-cutoff liked pairs the user had NOT liked in
       train (the recommender anti-joins train likes, so only new items are
       reachable).
    4. Per evaluated user (has recs AND ≥1 test positive): hits among the
       top-k, precision = hits/k, recall = hits/n_test, NDCG with
       1/log2(rank+1) discounts quantized to the 2^-38 grid (exact sums);
       per-user metrics re-quantized before the corpus mean so the final
       aggregation is order-independent too.

    Output: ONE row (k, users_evaluated, total_hits, hit_users, hit_rate,
    precision_at_k, recall_at_k, ndcg_at_k), means rounded to 6 dp.

    Scale design (100 TB): the split is a scalar agg broadcast into the
    scan; everything downstream is the itemcf pipeline's bounded shuffles
    plus per-user partial aggs; metric constants are literals (no lookup
    shuffle). Reference anchor: Recommendations.java:68-77 — this measures
    the contract that pipeline ships.
    """
    if k > K_EVAL:
        # ADVICE r06: the NDCG discount/IDCG tables have exactly K_EVAL
        # entries; element_at past the end yields NULL and would silently
        # degrade every NDCG value instead of failing loudly.
        raise ValueError(
            f"recommender_eval supports k <= {K_EVAL} "
            f"(NDCG tables have {K_EVAL} entries); got k={k}"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1; got k={k}")
    bounds = reviews.agg(
        F.min("ts").alias("_min_ts"), F.max("ts").alias("_max_ts")
    )
    with_cut = reviews.crossJoin(F.broadcast(bounds)).withColumn(
        "_cutoff",
        F.expr("_min_ts + ((_max_ts - _min_ts) * 4) DIV 5"),
    )
    cols = reviews.columns
    train = with_cut.filter(F.col("ts") < F.col("_cutoff")).select(cols)
    test = with_cut.filter(F.col("ts") >= F.col("_cutoff")).select(cols)

    recs = itemcf_recommendations(train, top_n=k)
    train_liked = good_reviews(train)
    test_pos = good_reviews(test).join(
        train_liked, ["user_id", "product_id"], "left_anti"
    )
    test_cnt = test_pos.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_test")
    )

    disc = F.element_at(
        F.array(*[F.lit(d) for d in NDCG_DISCOUNTS[:k]]),
        F.col("rank").cast("int"),
    )
    hits = (
        recs.join(test_pos, ["user_id", "product_id"])
        .withColumn("_d", disc)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("hits"), F.sum("_d").alias("dcg"))
    )

    rec_users = recs.select("user_id").distinct()
    per_user = (
        rec_users.join(test_cnt, "user_id")
        .join(hits, "user_id", "left")
        .withColumn("hits", F.coalesce("hits", F.lit(0)))
        .withColumn("dcg", F.coalesce("dcg", F.lit(0.0)))
        .withColumn(
            "idcg",
            F.element_at(
                F.array(*[F.lit(c) for c in NDCG_IDCG_CUM[:k]]),
                F.least(F.col("n_test"), F.lit(k)).cast("int"),
            ),
        )
        .withColumn(
            "p_q", _quant(F.col("hits").cast("double") / F.lit(float(k)))
        )
        .withColumn(
            "r_q",
            _quant(F.col("hits").cast("double") / F.col("n_test").cast("double")),
        )
        .withColumn("n_q", _quant(F.col("dcg") / F.col("idcg")))
    )
    agg = per_user.agg(
        F.count(F.lit(1)).alias("users_evaluated"),
        F.sum("hits").alias("total_hits"),
        F.sum(F.when(F.col("hits") > 0, 1).otherwise(0)).alias("hit_users"),
        F.sum("p_q").alias("_p"),
        F.sum("r_q").alias("_r"),
        F.sum("n_q").alias("_n"),
    )
    n = F.col("users_evaluated").cast("double")
    return agg.select(
        F.lit(k).cast("long").alias("k"),
        "users_evaluated",
        "total_hits",
        "hit_users",
        F.round(F.col("hit_users").cast("double") / n, 6).alias("hit_rate"),
        F.round(F.col("_p") / n, 6).alias("precision_at_k"),
        F.round(F.col("_r") / n, 6).alias("recall_at_k"),
        F.round(F.col("_n") / n, 6).alias("ndcg_at_k"),
    )


def q_recommender_eval(spark, sf_dir: str) -> DataFrame:
    from ..sources.tables import reviews_from_events

    return recommender_eval(reviews_from_events(spark, sf_dir))


RECOMMENDER_EVAL_SQL = """
WITH reviews AS (
    SELECT
        CAST(user_id AS BIGINT) AS user_id,
        __PRODUCT_ID__ AS product_id,
        __RATING__ AS rating,
        CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts
    FROM events
),
bounds AS (
    SELECT min(ts) + ((max(ts) - min(ts)) * 4) // 5 AS cutoff FROM reviews
),
train AS (
    SELECT r.* FROM reviews r, bounds b WHERE r.ts < b.cutoff
),
test AS (
    SELECT r.* FROM reviews r, bounds b WHERE r.ts >= b.cutoff
),
liked AS (
    SELECT DISTINCT user_id, product_id
    FROM train
    WHERE user_id < 1000 AND rating > 3.0
      AND product_id IS NOT NULL
),
liked_capped AS (
    SELECT user_id, product_id FROM (
        SELECT user_id, product_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY product_id ASC
               ) AS _rn
        FROM liked
    ) WHERE _rn <= 1024
),
cooc AS (
    SELECT a.product_id AS i, b.product_id AS j, COUNT(*) AS cooc
    FROM liked_capped a
    JOIN liked_capped b
      ON a.user_id = b.user_id AND a.product_id <> b.product_id
    GROUP BY 1, 2
),
scores AS (
    SELECT l.user_id, c.j AS product_id, CAST(SUM(c.cooc) AS BIGINT) AS score
    FROM liked l JOIN cooc c ON l.product_id = c.i
    GROUP BY 1, 2
),
fresh AS (
    SELECT s.* FROM scores s
    WHERE NOT EXISTS (
        SELECT 1 FROM liked o
        WHERE o.user_id = s.user_id AND o.product_id = s.product_id
    )
),
recs AS (
    SELECT user_id, product_id, rank FROM (
        SELECT user_id, product_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY score DESC, product_id ASC
               ) AS rank
        FROM fresh
    ) WHERE rank <= 10
),
test_pos AS (
    SELECT DISTINCT t.user_id, t.product_id
    FROM test t
    WHERE t.user_id < 1000 AND t.rating > 3.0
      AND NOT EXISTS (
          SELECT 1 FROM liked l
          WHERE l.user_id = t.user_id AND l.product_id = t.product_id
      )
),
test_cnt AS (
    SELECT user_id, COUNT(*) AS n_test FROM test_pos GROUP BY 1
),
disc AS (
    SELECT * FROM (VALUES
        (1,  1.0),
        (2,  0.6309297535699443),
        (3,  0.5),
        (4,  0.4306765580731735),
        (5,  0.38685280723439064),
        (6,  0.3562071871092485),
        (7,  0.3333333333321207),
        (8,  0.31546487678497215),
        (9,  0.30102999566224753),
        (10, 0.28906482631646213)
    ) AS t(rank, d)
),
idcg_cum AS (
    SELECT * FROM (VALUES
        (1,  1.0),
        (2,  1.6309297535699443),
        (3,  2.1309297535699443),
        (4,  2.561606311643118),
        (5,  2.9484591188775084),
        (6,  3.304666305986757),
        (7,  3.6379996393188776),
        (8,  3.9534645161038497),
        (9,  4.254494511766097),
        (10, 4.543559338082559)
    ) AS t(m, idcg)
),
hits AS (
    SELECT r.user_id, COUNT(*) AS hits, SUM(d.d) AS dcg
    FROM recs r
    JOIN test_pos p
      ON r.user_id = p.user_id AND r.product_id = p.product_id
    JOIN disc d ON d.rank = r.rank
    GROUP BY 1
),
per_user AS (
    SELECT ru.user_id,
           COALESCE(h.hits, 0) AS hits,
           COALESCE(h.dcg, 0.0) AS dcg,
           c.idcg,
           floor(CAST(COALESCE(h.hits, 0) AS DOUBLE) / 10.0
                 * 274877906944 + 0.5) / 274877906944 AS p_q,
           floor(CAST(COALESCE(h.hits, 0) AS DOUBLE)
                 / CAST(t.n_test AS DOUBLE)
                 * 274877906944 + 0.5) / 274877906944 AS r_q,
           floor(COALESCE(h.dcg, 0.0) / c.idcg
                 * 274877906944 + 0.5) / 274877906944 AS n_q
    FROM (SELECT DISTINCT user_id FROM recs) ru
    JOIN test_cnt t ON t.user_id = ru.user_id
    JOIN idcg_cum c ON c.m = least(t.n_test, 10)
    LEFT JOIN hits h ON h.user_id = ru.user_id
)
SELECT CAST(10 AS BIGINT) AS k,
       COUNT(*) AS users_evaluated,
       CAST(SUM(hits) AS BIGINT) AS total_hits,
       CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS hit_users,
       round(CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS hit_rate,
       round(SUM(p_q) / COUNT(*), 6) AS precision_at_k,
       round(SUM(r_q) / COUNT(*), 6) AS recall_at_k,
       round(SUM(n_q) / COUNT(*), 6) AS ndcg_at_k
FROM per_user
"""

QUERIES["recommender_eval"] = (q_recommender_eval, RECOMMENDER_EVAL_SQL)


# --- fixed-factor MF scoring twin (round 7c) --------------------------------

MF_RANK = 8
MF_TOP_K = 5


def _mf_factor_terms(side: str, id_col: str) -> list:
    """Rank-``MF_RANK`` hash-derived factor components for one side:
    component j = md5('{side}|{id}|{j}') first-8-hex as uint32, scaled to
    [-1, 1). Pure deterministic arithmetic — identical literals/functions
    in DuckDB — so dot products value-oracle exactly."""
    out = []
    for j in range(MF_RANK):
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(side), F.col(id_col), F.lit(j))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        out.append(h / F.lit(float(1 << 32)) * F.lit(2.0) - F.lit(1.0))
    return out


def q_mf_scoring_fixed(spark, sf_dir: str) -> DataFrame:
    """The SERVING machinery of a matrix-factorization recommender —
    `recommendForAllUsers`' blocked dot-product top-k — on FIXED
    hash-derived rank-8 factors (the classifier_scores / pq_adc_topk
    recipe): score(u, i) = Σ_j U[u,j]·V[i,j] as one fixed-order 8-term
    sum, seen items anti-joined away, top-MF_TOP_K per user with a full
    tie-break. The ALS Lloyd-style FIT stays rows-only
    (`als_recommendations`); this twin value-checks everything around it.

    Scale design (100 TB): the item side is the bounded catalog —
    broadcast; scoring is |users|·|catalog| codegen'd arithmetic with a
    per-user top-k window; factors are computed in the projection, never
    materialized."""
    from ..operators.graph import good_reviews
    from ..sources.tables import reviews_from_events

    reviews = reviews_from_events(spark, sf_dir)
    # NULL product ids are unscorable (round 15: Spark's concat_ws-based
    # factor hash silently SKIPS a NULL id and fabricates factors for it,
    # while the oracle's `||` null-propagates — and recommending an
    # unknown item is meaningless anyway): exclude explicitly, both sides
    liked = good_reviews(reviews).filter(F.col("product_id").isNotNull())
    users = liked.select("user_id").distinct()
    items = liked.select("product_id").distinct()
    uf = users.select(
        "user_id", *[t.alias(f"u{j}") for j, t in enumerate(_mf_factor_terms("u", "user_id"))]
    )
    vf = items.select(
        "product_id", *[t.alias(f"v{j}") for j, t in enumerate(_mf_factor_terms("i", "product_id"))]
    )
    dot = None
    for j in range(MF_RANK):
        term = F.col(f"u{j}") * F.col(f"v{j}")
        dot = term if dot is None else dot + term
    scored = (
        uf.crossJoin(F.broadcast(vf))
        .select("user_id", "product_id", F.round(dot, 6).alias("score"))
        .join(liked, ["user_id", "product_id"], "left_anti")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("product_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= MF_TOP_K)
    )


def _mf_sql_terms(side: str, col: str) -> str:
    terms = []
    for j in range(MF_RANK):
        h = (
            f"CAST(CAST('0x' || substr(md5('{side}' || '|' || {col} "
            f"|| '|' || '{j}'), 1, 8) AS BIGINT) AS DOUBLE)"
        )
        terms.append(f"({h} / {float(1 << 32)!r} * 2.0 - 1.0)")
    return terms


MF_SCORING_FIXED_SQL = f"""
WITH {{reviews}},
liked AS (
    SELECT DISTINCT user_id, product_id FROM reviews
    WHERE user_id < 1000 AND rating > 3.0
      AND product_id IS NOT NULL
),
users AS (SELECT DISTINCT user_id FROM liked),
items AS (SELECT DISTINCT product_id FROM liked),
uf AS (
    SELECT user_id,
           {", ".join(f"{t} AS u{j}" for j, t in enumerate(_mf_sql_terms("u", "user_id")))}
    FROM users
),
vf AS (
    SELECT product_id,
           {", ".join(f"{t} AS v{j}" for j, t in enumerate(_mf_sql_terms("i", "product_id")))}
    FROM items
),
scored AS (
    SELECT uf.user_id, vf.product_id,
           round({" + ".join(f"u{j} * v{j}" for j in range(MF_RANK))}, 6)
               AS score
    FROM uf CROSS JOIN vf
),
unseen AS (
    SELECT s.* FROM scored s
    LEFT JOIN liked l ON l.user_id = s.user_id
                     AND l.product_id = s.product_id
    WHERE l.user_id IS NULL
)
SELECT user_id, product_id, score, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY score DESC, product_id ASC) AS rank
    FROM unseen
) WHERE rank <= {MF_TOP_K}
"""


def _finalize_mf_sql() -> str:
    from ..oracles import REVIEWS_CTE

    return MF_SCORING_FIXED_SQL.replace("{reviews}", REVIEWS_CTE)


QUERIES["mf_scoring_fixed"] = (q_mf_scoring_fixed, _finalize_mf_sql())


# round 15: substitute the canonical dirty-data-total fragments into every
# oracle that uses the __PRODUCT_ID__/__RATING__ placeholders (single
# definition in oracles.py — inline copies cannot drift; see the
# reviews_from_events docstring for the cross-engine rationale)
from ..oracles import canonicalize as _canonicalize  # noqa: E402

for _name, _entry in list(QUERIES.items()):
    if _entry[1] and "__PRODUCT_ID__" in _entry[1] or (
        _entry[1] and "__RATING__" in _entry[1]
    ):
        QUERIES[_name] = (_entry[0], _canonicalize(_entry[1]), *_entry[2:])
del _name, _entry
