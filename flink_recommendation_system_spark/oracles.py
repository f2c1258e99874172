"""ANSI-SQL oracle equivalents (DuckDB) for the engine's queries.

The driver runs each ``__spark_entry__.queries()`` entry AND the matching SQL
here side-by-side on the same parquet tables and hash-compares the results
(row count + schema + order-insensitive value hash). Column names/types must
match the Spark output exactly.

Determinism rules shared with the Spark side:
- review derivation uses only exact operations (floor, integer modulo) — see
  ``sources.tables.reviews_from_events``;
- double aggregates are rounded (6 dp) in BOTH engines so summation order
  cannot flip the hash;
- every top-k has a full deterministic tie-break.

The LPA oracle unrolls the 5 synchronous supersteps as chained CTEs — the
whole collaborative-filtering pipeline (Recommendations.java:22-81) is
therefore hash-checkable, not just rows-only.
"""

from __future__ import annotations

# Mirror of sources.tables.reviews_from_events (see its docstring).
# Canonical dirty-data-total twins of sources.tables.reviews_from_events
# (round-15 adversarial sweep — see that docstring): malformed props and
# out-of-domain value must yield NULL IDENTICALLY in both engines, so
# every oracle CTE that re-derives product_id/rating from events MUST use
# these exact fragments. JSON parsers are NOT cross-engine aligned on
# dirty input (Spark tolerates trailing garbage, DuckDB throws on
# malformed documents, DuckDB TRY_CAST rounds '1.5'→2), so product_id is
# a STRICT full-document regex match of the wire payload shape — the
# same PRODUCT_KEY_PATTERN the Spark side compiles (Java regex and RE2
# agree exactly on it).
from .sources.tables import PRODUCT_KEY_PATTERN as _PRODUCT_KEY_PATTERN

PRODUCT_ID_EXPR_SQL = (
    "TRY_CAST(NULLIF(regexp_extract(props, '"
    + _PRODUCT_KEY_PATTERN
    + "', 1), '') AS BIGINT)"
)
RATING_EXPR_SQL = (
    "CASE WHEN value >= 0 AND value < 1000000000000000.0 THEN "
    "CAST(CAST(floor(value) AS BIGINT) % 5 + 1.0 AS DOUBLE) END"
)

def canonicalize(sql):
    """Substitute the canonical dirty-data-total fragments into an oracle
    SQL that uses the ``__PRODUCT_ID__`` / ``__RATING__`` placeholders —
    one definition, every inline copy stays in lockstep."""
    if sql is None:
        return None
    return sql.replace("__PRODUCT_ID__", PRODUCT_ID_EXPR_SQL).replace(
        "__RATING__", RATING_EXPR_SQL
    )


REVIEWS_CTE = f"""
reviews AS (
    SELECT
        CAST(user_id AS BIGINT) AS user_id,
        {PRODUCT_ID_EXPR_SQL} AS product_id,
        {RATING_EXPR_SQL} AS rating,
        CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts
    FROM events
)
""".strip()

# F1+F2 distinct 'liked' relation — operators.graph.good_reviews.
LIKED_CTE = """
liked AS (
    SELECT DISTINCT user_id, product_id
    FROM reviews
    WHERE user_id < 1000 AND rating > 3.0
      AND product_id IS NOT NULL
)
""".strip()

# A3 + U1: co-review pairs and their undirected (both-direction) edge set.
EDGES_CTES = """
pairs AS (
    SELECT DISTINCT a.user_id AS src, b.user_id AS dst
    FROM liked a
    JOIN liked b ON a.product_id = b.product_id AND a.user_id < b.user_id
),
edges AS (
    SELECT src, dst FROM pairs
    UNION ALL
    SELECT dst AS src, src AS dst FROM pairs
)
""".strip()


def lpa_ctes(iterations: int = 5) -> str:
    """Unrolled synchronous label propagation (Gelly LabelPropagation
    semantics: most frequent neighbor label, ties to the larger label;
    Recommendations.java:100-106). ``l0`` = vertex id as initial label;
    final CTE is ``l{iterations}`` with columns (id, label).
    """
    parts = ["l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges)"]
    for i in range(1, iterations + 1):
        parts.append(
            f"""l{i} AS (
    SELECT id, label FROM (
        SELECT e.dst AS id, l.label AS label,
               row_number() OVER (
                   PARTITION BY e.dst
                   ORDER BY count(*) DESC, l.label DESC
               ) AS rn
        FROM edges e
        JOIN l{i - 1} l ON e.src = l.id
        GROUP BY e.dst, l.label
    ) WHERE rn = 1
)"""
        )
    return ",\n".join(parts)


def with_reviews(body: str) -> str:
    return f"WITH {REVIEWS_CTE}\n{body}"


def graph_prefix(iterations: int = 5) -> str:
    """WITH-clause prefix: reviews → liked → pairs/edges → l0..lN."""
    return (
        f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{EDGES_CTES},\n{lpa_ctes(iterations)}"
    )


TOP_PRODUCTS_SQL = with_reviews(
    """
SELECT product_id,
       round(avg(rating), 6) AS avg_rating,
       count(*) AS review_cnt
FROM reviews
GROUP BY product_id
HAVING count(*) > 10
ORDER BY avg_rating DESC, product_id ASC
LIMIT 20
"""
)

GOOD_RATINGS_SQL = with_reviews(
    """
SELECT user_id, product_id, rating, ts
FROM reviews
WHERE user_id < 1000 AND rating > 3.0
"""
)

CO_REVIEW_EDGES_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{EDGES_CTES}\n"
    "SELECT src, dst FROM pairs"
)

GRAPH_VERTICES_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{EDGES_CTES}\n"
    "SELECT DISTINCT src AS id FROM edges"
)

UNDIRECTED_EDGES_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{EDGES_CTES}\n"
    "SELECT src, dst FROM edges"
)

LPA_LABELS_SQL = f"{graph_prefix(5)}\nSELECT id, label FROM l5"

COMMUNITY_SIZES_SQL = (
    f"{graph_prefix(5)}\n"
    "SELECT label, count(*) AS community_size FROM l5 GROUP BY label"
)

# Connected components = min vertex id reachable from each vertex; the
# recursive CTE computes the reachability closure (fine at oracle scale;
# the Spark side uses iterative min-propagation which scales linearly).
CONNECTED_COMPONENTS_SQL = (
    f"WITH RECURSIVE {REVIEWS_CTE},\n{LIKED_CTE},\n{EDGES_CTES},\n"
    """reach(id, r) AS (
    SELECT src AS id, src AS r FROM edges
    UNION
    SELECT e.dst AS id, reach.r AS r
    FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id, min(r) AS component FROM reach GROUP BY id"""
)

# Per-vertex triangle participation over the user<200 co-review subgraph
# (the full graph is a near-clique at sf0.1 — triangle listing there is
# output-bound; see _q_triangle_counts). The Spark side uses degree-ordered
# orientation for skew safety; the triangle SET is orientation-independent,
# so this simpler id-ordered (x<y<z) enumeration yields identical counts.
LIKED_200_CTE = LIKED_CTE.replace("user_id < 1000", "user_id < 200")
TRIANGLE_COUNTS_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_200_CTE},\n{EDGES_CTES},\n"
    """tri AS (
    SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
    FROM pairs e1
    JOIN pairs e2 ON e2.src = e1.dst
    JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
    SELECT x AS id FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
)
SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id"""
)


# Local clustering coefficients on the triangle tier's bounded graph:
# c(v) = 2·T(v)/(deg(v)·(deg(v)−1)), degrees from the both-direction edge
# list, vertices with deg < 2 excluded (coefficient undefined). One double
# division of exact integers → bit-for-bit.
CLUSTERING_COEFFICIENTS_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_200_CTE},\n{EDGES_CTES},\n"
    """tri AS (
    SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
    FROM pairs e1
    JOIN pairs e2 ON e2.src = e1.dst
    JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
    SELECT x AS id FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
),
tcounts AS (SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id),
deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src)
SELECT d.id, d.degree, coalesce(t.triangles, 0) AS triangles,
       round(CAST(2 * coalesce(t.triangles, 0) AS DOUBLE)
             / CAST(d.degree * (d.degree - 1) AS DOUBLE), 6)
           AS clustering_coeff
FROM deg d LEFT JOIN tcounts t ON t.id = d.id
WHERE d.degree >= 2"""
)


def pagerank_ctes(iterations: int = 3) -> str:
    """Unrolled power-iteration PageRank (damping 0.85) over the co-review
    edge set. All literals go through CAST(... AS DOUBLE) so both engines
    compute the damping constants with identical binary-double arithmetic
    (DuckDB numeric literals are DECIMAL by default, which would otherwise
    diverge from Spark's Python-double constants by 1 ulp). Contributions
    are quantized to the 2^-38 binary grid before the per-destination sum
    — multiples of 2^-38 below 1 add EXACTLY in doubles for up to 2^15
    terms — so the sum is order-independent and parity with the Spark loop
    (operators.graph.pagerank, same quantization) is exact by construction
    at every iteration, not noise-margin-based."""
    parts = [
        "outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "verts AS (SELECT DISTINCT src AS id FROM edges)",
        "nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        "pr0 AS (SELECT id, CAST(1 AS DOUBLE) / (SELECT n FROM nv) AS rank"
        " FROM verts)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"pr{i} AS (\n"
            "    SELECT e.dst AS id,\n"
            "           (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))"
            " / (SELECT n FROM nv)\n"
            "           + CAST(0.85 AS DOUBLE) * SUM(\n"
            "               floor(p.rank / o.outdeg"
            " * CAST(274877906944 AS DOUBLE)\n"
            "                     + CAST(0.5 AS DOUBLE))"
            " / CAST(274877906944 AS DOUBLE)) AS rank\n"
            f"    FROM edges e\n"
            f"    JOIN pr{i - 1} p ON p.id = e.src\n"
            "    JOIN outdeg o ON o.src = e.src\n"
            "    GROUP BY e.dst\n"
            ")"
        )
    return ",\n".join(parts)


PAGERANK_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{EDGES_CTES},\n{pagerank_ctes(3)}\n"
    "SELECT id, round(rank, 6) AS rank FROM pr3"
)

# Speed-layer serving snapshot (RealTimeRecommendations.java:89-124 as a
# batch query): every user seen in the stream gets their model recs, falling
# back to global top-products, sorted + capped at 20, ids stringified.
SERVING_SNAPSHOT_SQL = (
    f"{graph_prefix(5)},\n"
    """candidates AS (
    SELECT DISTINCT a.id AS user_id, g.product_id
    FROM l5 a
    JOIN l5 b ON a.label = b.label
    JOIN liked g ON g.user_id = b.id
),
recs AS (
    SELECT c.user_id, c.product_id
    FROM candidates c
    WHERE NOT EXISTS (
        SELECT 1 FROM liked o
        WHERE o.user_id = c.user_id AND o.product_id = c.product_id
    )
),
user_rec_lists AS (
    SELECT user_id,
           list_sort(list(DISTINCT CAST(product_id AS VARCHAR))) AS recs
    FROM recs GROUP BY user_id
),
top AS (
    SELECT product_id FROM (
        SELECT product_id, round(avg(rating), 6) AS ar, count(*) AS cnt
        FROM reviews GROUP BY product_id HAVING count(*) > 10
        ORDER BY ar DESC, product_id ASC LIMIT 20
    )
),
top_list AS (
    SELECT list_sort(list(CAST(product_id AS VARCHAR))) AS top_recs FROM top
),
users AS (SELECT DISTINCT user_id FROM reviews)
SELECT u.user_id,
       array_to_string(
           (CASE WHEN l.recs IS NOT NULL THEN l.recs ELSE t.top_recs END)[1:20],
           ',') AS recommended_products
FROM users u
LEFT JOIN user_rec_lists l ON u.user_id = l.user_id
CROSS JOIN top_list t"""
)

USER_RECOMMENDATIONS_SQL = (
    f"{graph_prefix(5)},\n"
    """candidates AS (
    SELECT DISTINCT a.id AS user_id, g.product_id
    FROM l5 a
    JOIN l5 b ON a.label = b.label
    JOIN liked g ON g.user_id = b.id
)
SELECT c.user_id, c.product_id
FROM candidates c
WHERE NOT EXISTS (
    SELECT 1 FROM liked o
    WHERE o.user_id = c.user_id AND o.product_id = c.product_id
)"""
)


# k-core decomposition (operators.graph.kcore_vertices) on the bipartite
# user-product liked graph. Peeling unrolled KCORE_ROUNDS times: rounds
# past the fixpoint are identity (no vertex below k remains), so
# over-unrolling is always safe; under-unrolling would surface as a
# value mismatch against the Spark fixpoint — which is the check working.
KCORE_K = 19
KCORE_PRODUCT_OFFSET = 1_000_000
KCORE_ROUNDS = 4


def kcore_ctes(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    parts = [
        f"""bedges0 AS (
    SELECT user_id AS src, product_id + {KCORE_PRODUCT_OFFSET} AS dst
    FROM liked
    UNION ALL
    SELECT product_id + {KCORE_PRODUCT_OFFSET} AS src, user_id AS dst
    FROM liked
)""".strip()
    ]
    for r in range(rounds):
        parts.append(
            f"""deg{r} AS (
    SELECT src, count(*) AS deg FROM bedges{r} GROUP BY src
),
alive{r} AS (SELECT src FROM deg{r} WHERE deg >= {k}),
bedges{r + 1} AS (
    SELECT e.src, e.dst FROM bedges{r} e
    JOIN alive{r} a ON e.src = a.src
    JOIN alive{r} b ON e.dst = b.src
)""".strip()
        )
    return ",\n".join(parts)


KCORE_MEMBERS_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{kcore_ctes()}\n"
    f"""SELECT CASE WHEN src >= {KCORE_PRODUCT_OFFSET}
            THEN 'product' ELSE 'user' END AS role,
       CASE WHEN src >= {KCORE_PRODUCT_OFFSET}
            THEN src - {KCORE_PRODUCT_OFFSET} ELSE src END AS id,
       count(*) AS core_degree
FROM bedges{KCORE_ROUNDS}
GROUP BY src"""
)


# Personalized PageRank (operators.graph.personalized_pagerank): seeds =
# the PPR_N_SOURCES smallest vertex ids (deterministic at every SF); same
# 2^-38 contribution grid as uniform PageRank, plus the reset CASE and the
# verts-left-join rebuild (zero-mass vertices must keep their row).
PPR_N_SOURCES = 3


def ppr_ctes(iterations: int = 3) -> str:
    parts = [
        "outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "verts AS (SELECT DISTINCT src AS id FROM edges)",
        f"srcs AS (SELECT id FROM verts ORDER BY id LIMIT {PPR_N_SOURCES})",
        "base AS (SELECT v.id,\n"
        "    CASE WHEN v.id IN (SELECT id FROM srcs)\n"
        f"         THEN CAST(1 AS DOUBLE) / CAST({PPR_N_SOURCES} AS DOUBLE)\n"
        "         ELSE CAST(0 AS DOUBLE) END AS reset\n"
        "    FROM verts v)",
        "ppr0 AS (SELECT id, reset AS rank FROM base)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"ppr{i} AS (\n"
            "    SELECT b.id,\n"
            "           (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * b.reset\n"
            "           + CAST(0.85 AS DOUBLE) * coalesce(s.mass,"
            " CAST(0 AS DOUBLE)) AS rank\n"
            "    FROM base b LEFT JOIN (\n"
            "        SELECT e.dst AS id,\n"
            "               SUM(floor(p.rank / o.outdeg"
            " * CAST(274877906944 AS DOUBLE)\n"
            "                         + CAST(0.5 AS DOUBLE))"
            " / CAST(274877906944 AS DOUBLE)) AS mass\n"
            f"        FROM edges e\n"
            f"        JOIN ppr{i - 1} p ON p.id = e.src\n"
            "        JOIN outdeg o ON o.src = e.src\n"
            "        GROUP BY e.dst\n"
            "    ) s ON s.id = b.id\n"
            ")"
        )
    return ",\n".join(parts)


PERSONALIZED_PAGERANK_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{EDGES_CTES},\n{ppr_ctes(3)}\n"
    "SELECT id, round(rank, 6) AS rank FROM ppr3"
)


# SCC value oracle: mutual reachability via a recursive-CTE transitive
# closure. SCC has no scalable SQL form, but at the DRIVER'S CHECK SCALE
# (sf0.01: ~150 vertices) the closure is <= |V|^2 ~ 22k pairs — small
# enough that DuckDB can define component(v) = min{u : v->*u AND u->*v}
# directly (vertices on no cycle have no mutual partner and stay
# singletons). This checks the Spark operator's VALUES, while its
# cycle-merging behavior at scale stays property-tested against a
# reference Tarjan (tests/test_graph_properties.py). The temporal edge
# relation derives from REVIEWS_CTE — the single definition of the
# events->reviews mapping, whose ts is epoch SECONDS exactly like the
# Spark side's reviews_from_events (an earlier inline copy compared full
# nanoseconds and agreed only because the test data has no same-second
# first-review collisions).
SCC_COMPONENTS_SQL = f"""
WITH RECURSIVE {REVIEWS_CTE},
lk AS (
    SELECT user_id, product_id, min(ts) AS first_ts
    FROM reviews WHERE user_id < 1000 AND rating > 3.0
    GROUP BY user_id, product_id
),
e AS (
    SELECT DISTINCT a.user_id AS src, b.user_id AS dst
    FROM lk a JOIN lk b ON a.product_id = b.product_id
    WHERE a.first_ts < b.first_ts
),
reach(src, dst) AS (
    SELECT src, dst FROM e
    UNION
    SELECT rr.src, e.dst FROM reach rr JOIN e ON e.src = rr.dst
),
verts AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
mutual AS (
    SELECT a.src AS id, a.dst AS other
    FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
),
comp AS (
    SELECT v.id, least(v.id, coalesce(min(m.other), v.id)) AS component
    FROM verts v LEFT JOIN mutual m ON m.id = v.id
    GROUP BY v.id
)
SELECT id, component FROM comp
"""


# Adamic-Adar link prediction on the user<200 co-review graph (same bounded
# vertex set as the triangle oracle; the graph is near-complete there, so
# the non-adjacent pairs are exactly the handful of missing links —
# link prediction's actual target set). score = Σ 1/ln(deg z) over common
# neighbors z, rounded to 6 dp before ranking; deg from the both-direction
# edge set; DuckDB's ln == Spark's log (natural).
ADAMIC_ADAR_TOP_K = 100
ADAMIC_ADAR_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_200_CTE},\n{EDGES_CTES},\n"
    f"""deg AS (
    SELECT src AS v, count(*) AS deg FROM edges GROUP BY src
),
wedges AS (
    SELECT e1.dst AS a, e2.dst AS b, e1.src AS z
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.src AND e1.dst < e2.dst
),
summed AS (
    -- BIGINT grid units, exact order-independent sum (matches the Spark
    -- side's integer-unit construction: graph.py adamic_adar)
    SELECT w.a, w.b,
           sum(CAST(floor(1.0 / ln(d.deg) * CAST(274877906944 AS DOUBLE)
                          + 0.5) AS BIGINT)) AS units
    FROM wedges w
    JOIN deg d ON d.v = w.z
    LEFT JOIN pairs p ON p.src = w.a AND p.dst = w.b
    WHERE p.src IS NULL
    GROUP BY w.a, w.b
),
scored AS (
    -- 6-dp round-half-up in exact integer arithmetic (HUGEINT widening),
    -- then ONE IEEE division of identical integers per engine
    SELECT a, b,
           CAST(CAST((CAST(units AS HUGEINT) * 1000000 + 137438953472)
                     // 274877906944 AS BIGINT) AS DOUBLE)
               / 1000000.0 AS score
    FROM summed
)
SELECT a, b, score, rank FROM (
    SELECT *, row_number() OVER (ORDER BY score DESC, a ASC, b ASC) AS rank
    FROM scored
) WHERE rank <= {ADAMIC_ADAR_TOP_K}"""
)


# Multi-source BFS hop counts on the bipartite user-product liked graph
# (the kcore vertex space): sources = the 3 smallest liked user ids, 3
# rounds unrolled. min(hops) over all levels equals BFS distance because
# level d contains every vertex at distance <= d that any distance-(d-1)
# vertex reaches; exact integers, bit-for-bit oracle.
BFS_N_SOURCES = 3
BFS_MAX_HOPS = 3


def bfs_ctes() -> str:
    off = KCORE_PRODUCT_OFFSET
    return f"""bedges AS (
    SELECT user_id AS src, product_id + {off} AS dst FROM liked
    UNION ALL
    SELECT product_id + {off} AS src, user_id AS dst FROM liked
),
d0 AS (
    SELECT CAST(user_id AS BIGINT) AS id, CAST(0 AS BIGINT) AS hops
    FROM (SELECT DISTINCT user_id FROM liked ORDER BY user_id
          LIMIT {BFS_N_SOURCES})
),
d1 AS (
    SELECT DISTINCT e.dst AS id, CAST(1 AS BIGINT) AS hops
    FROM bedges e JOIN d0 ON e.src = d0.id
),
d2 AS (
    SELECT DISTINCT e.dst AS id, CAST(2 AS BIGINT) AS hops
    FROM bedges e JOIN d1 ON e.src = d1.id
),
d3 AS (
    SELECT DISTINCT e.dst AS id, CAST(3 AS BIGINT) AS hops
    FROM bedges e JOIN d2 ON e.src = d2.id
)"""


BFS_HOPS_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{bfs_ctes()}\n"
    f"""SELECT CASE WHEN id >= {KCORE_PRODUCT_OFFSET}
            THEN 'product' ELSE 'user' END AS role,
       CASE WHEN id >= {KCORE_PRODUCT_OFFSET}
            THEN id - {KCORE_PRODUCT_OFFSET} ELSE id END AS id,
       min(hops) AS hops
FROM (SELECT * FROM d0 UNION ALL SELECT * FROM d1
      UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3)
GROUP BY 1, 2"""
)


# Sampled closeness centrality (Eppstein & Wang 2001): per-source BFS
# distances from the same 3 seeds, aggregated per vertex — n_sources
# reached, total hop sum, closeness = n_sources/total_hops. All exact
# integers plus one double division of exact ints, so the oracle is
# bit-for-bit.
def _bfs_per_source_ctes() -> str:
    off = KCORE_PRODUCT_OFFSET
    return f"""bedges AS (
    SELECT user_id AS src, product_id + {off} AS dst FROM liked
    UNION ALL
    SELECT product_id + {off} AS src, user_id AS dst FROM liked
),
ds0 AS (
    SELECT CAST(user_id AS BIGINT) AS source, CAST(user_id AS BIGINT) AS id,
           CAST(0 AS BIGINT) AS hops
    FROM (SELECT DISTINCT user_id FROM liked ORDER BY user_id
          LIMIT {BFS_N_SOURCES})
),
ds1 AS (
    SELECT DISTINCT d.source, e.dst AS id, CAST(1 AS BIGINT) AS hops
    FROM bedges e JOIN ds0 d ON e.src = d.id
),
ds2 AS (
    SELECT DISTINCT d.source, e.dst AS id, CAST(2 AS BIGINT) AS hops
    FROM bedges e JOIN ds1 d ON e.src = d.id
),
ds3 AS (
    SELECT DISTINCT d.source, e.dst AS id, CAST(3 AS BIGINT) AS hops
    FROM bedges e JOIN ds2 d ON e.src = d.id
),
dmin AS (
    SELECT source, id, min(hops) AS hops
    FROM (SELECT * FROM ds0 UNION ALL SELECT * FROM ds1
          UNION ALL SELECT * FROM ds2 UNION ALL SELECT * FROM ds3)
    GROUP BY source, id
)"""


CLOSENESS_ESTIMATES_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{_bfs_per_source_ctes()}\n"
    f"""SELECT CASE WHEN id >= {KCORE_PRODUCT_OFFSET}
            THEN 'product' ELSE 'user' END AS role,
       CASE WHEN id >= {KCORE_PRODUCT_OFFSET}
            THEN id - {KCORE_PRODUCT_OFFSET} ELSE id END AS id,
       count(*) AS n_sources,
       CAST(sum(hops) AS BIGINT) AS total_hops,
       CASE WHEN sum(hops) = 0 THEN NULL
            ELSE round(CAST(count(*) AS DOUBLE)
                       / CAST(sum(hops) AS DOUBLE), 6)
       END AS closeness
FROM dmin
GROUP BY 1, 2"""
)


# HITS hubs/authorities on the temporal co-review digraph (same edge CTE as
# SCC): 2 unrolled unnormalized iterations — every score an exact BIGINT sum,
# one final double division for the normalized authority. Mirrors
# operators.graph.hits_scores(iterations=2) bit-for-bit.
HITS_SCORES_SQL = f"""
WITH {REVIEWS_CTE},
lk AS (
    SELECT user_id, product_id, min(ts) AS first_ts
    FROM reviews WHERE user_id < 1000 AND rating > 3.0
    GROUP BY user_id, product_id
),
e AS (
    SELECT DISTINCT a.user_id AS src, b.user_id AS dst
    FROM lk a JOIN lk b ON a.product_id = b.product_id
    WHERE a.first_ts < b.first_ts
),
verts AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
a1 AS (
    SELECT v.id, CAST(coalesce(t.s, 0) AS BIGINT) AS a
    FROM verts v LEFT JOIN (
        SELECT dst, count(*) AS s FROM e GROUP BY dst
    ) t ON t.dst = v.id
),
h1 AS (
    SELECT v.id, CAST(coalesce(t.s, 0) AS BIGINT) AS h
    FROM verts v LEFT JOIN (
        SELECT e.src, sum(a1.a) AS s FROM e JOIN a1 ON a1.id = e.dst
        GROUP BY e.src
    ) t ON t.src = v.id
),
a2 AS (
    SELECT v.id, CAST(coalesce(t.s, 0) AS BIGINT) AS a
    FROM verts v LEFT JOIN (
        SELECT e.dst, sum(h1.h) AS s FROM e JOIN h1 ON h1.id = e.src
        GROUP BY e.dst
    ) t ON t.dst = v.id
),
h2 AS (
    SELECT v.id, CAST(coalesce(t.s, 0) AS BIGINT) AS h
    FROM verts v LEFT JOIN (
        SELECT e.src, sum(a2.a) AS s FROM e JOIN a2 ON a2.id = e.dst
        GROUP BY e.src
    ) t ON t.src = v.id
)
SELECT a2.id, a2.a AS authority, h2.h AS hub,
       CASE WHEN (SELECT max(a) FROM a2) > 0
            THEN round(CAST(a2.a AS DOUBLE)
                       / CAST((SELECT max(a) FROM a2) AS DOUBLE), 6)
       END AS authority_norm
FROM a2 JOIN h2 ON h2.id = a2.id
"""


# Deterministic random walks (DeepWalk corpus prep) on the bipartite liked
# graph: next hop = argmin md5(walk|step|cur|neighbor) — the portable-hash
# neighbor draw, unrolled per step; row_number implements the (hash, dst)
# argmin tie-break. Mirrors operators.graph.deterministic_random_walks.
WALK_N_WALKS = 2
WALK_STEPS = 3


def _walk_step_cte(k: int) -> str:
    prev = f"s{k - 1}"
    return f"""s{k} AS (
    SELECT source, walk_no, CAST({k} AS BIGINT) AS step, vertex FROM (
        SELECT s.source, s.walk_no, e.dst AS vertex,
               row_number() OVER (
                   PARTITION BY s.source, s.walk_no
                   ORDER BY CAST(('0x' || substr(md5(
                       CAST(s.walk_no AS VARCHAR) || '|{k}|' ||
                       CAST(s.vertex AS VARCHAR) || '|' ||
                       CAST(e.dst AS VARCHAR)), 1, 8)) AS BIGINT) ASC,
                   e.dst ASC
               ) AS rn
        FROM {prev} s JOIN bedges e ON e.src = s.vertex
    ) WHERE rn = 1
)"""


RANDOM_WALKS_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n"
    f"""bedges AS (
    SELECT user_id AS src, product_id + {KCORE_PRODUCT_OFFSET} AS dst
    FROM liked
    UNION ALL
    SELECT product_id + {KCORE_PRODUCT_OFFSET} AS src, user_id AS dst
    FROM liked
),
srcs AS (
    SELECT CAST(user_id AS BIGINT) AS source
    FROM (SELECT DISTINCT user_id FROM liked ORDER BY user_id
          LIMIT {BFS_N_SOURCES})
),
s0 AS (
    SELECT source, CAST(walk_no AS BIGINT) AS walk_no,
           CAST(0 AS BIGINT) AS step, source AS vertex
    FROM srcs, (VALUES (0), (1)) AS t(walk_no)
),
"""
    + ",\n".join(_walk_step_cte(k) for k in range(1, WALK_STEPS + 1))
    + f"""
SELECT source, walk_no, step,
       CASE WHEN vertex >= {KCORE_PRODUCT_OFFSET}
            THEN 'product' ELSE 'user' END AS role,
       CASE WHEN vertex >= {KCORE_PRODUCT_OFFSET}
            THEN vertex - {KCORE_PRODUCT_OFFSET} ELSE vertex END AS vertex
FROM (SELECT * FROM s0 UNION ALL SELECT * FROM s1
      UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
"""
)


# Sampled betweenness centrality (Brandes 2001, restricted to the 3 BFS
# seeds, 3-hop horizon) on the bipartite liked graph. Forward: exact
# per-level sigma path counts (BIGINT sums, anti-joined against earlier
# levels). Backward: each dependency term quantized to the 2^-38 grid and
# accumulated as BIGINT units (the adamic_adar construction), the single
# float expression per term parenthesized identically to the Spark side.
_BW_GRID = 274877906944  # 2^38


def _betweenness_ctes() -> str:
    off = KCORE_PRODUCT_OFFSET
    g = _BW_GRID
    term = (
        "CAST(floor((CAST(l.sigma AS DOUBLE) / CAST(w.sigma AS DOUBLE))"
        f" * (CAST(1 AS DOUBLE) + CAST(wd.units AS DOUBLE) / {g})"
        f" * {g} + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    return f"""bedges AS (
    SELECT user_id AS src, product_id + {off} AS dst FROM liked
    UNION ALL
    SELECT product_id + {off} AS src, user_id AS dst FROM liked
),
b0 AS (
    SELECT CAST(user_id AS BIGINT) AS source, CAST(user_id AS BIGINT) AS id,
           CAST(1 AS BIGINT) AS sigma
    FROM (SELECT DISTINCT user_id FROM liked ORDER BY user_id
          LIMIT {BFS_N_SOURCES})
),
b1 AS (
    SELECT n.source, n.id, n.sigma FROM (
        SELECT d.source, e.dst AS id, CAST(sum(d.sigma) AS BIGINT) AS sigma
        FROM bedges e JOIN b0 d ON e.src = d.id
        GROUP BY 1, 2
    ) n
    LEFT JOIN b0 v ON v.source = n.source AND v.id = n.id
    WHERE v.id IS NULL
),
b2 AS (
    SELECT n.source, n.id, n.sigma FROM (
        SELECT d.source, e.dst AS id, CAST(sum(d.sigma) AS BIGINT) AS sigma
        FROM bedges e JOIN b1 d ON e.src = d.id
        GROUP BY 1, 2
    ) n
    LEFT JOIN (SELECT source, id FROM b0 UNION ALL SELECT source, id FROM b1)
        v ON v.source = n.source AND v.id = n.id
    WHERE v.id IS NULL
),
b3 AS (
    SELECT n.source, n.id, n.sigma FROM (
        SELECT d.source, e.dst AS id, CAST(sum(d.sigma) AS BIGINT) AS sigma
        FROM bedges e JOIN b2 d ON e.src = d.id
        GROUP BY 1, 2
    ) n
    LEFT JOIN (SELECT source, id FROM b0 UNION ALL SELECT source, id FROM b1
               UNION ALL SELECT source, id FROM b2)
        v ON v.source = n.source AND v.id = n.id
    WHERE v.id IS NULL
),
bd3 AS (SELECT source, id, CAST(0 AS BIGINT) AS units FROM b3),
bd2 AS (
    SELECT l.source, l.id, CAST(coalesce(s.units, 0) AS BIGINT) AS units
    FROM b2 l LEFT JOIN (
        SELECT l.source, l.id, sum({term}) AS units
        FROM b2 l
        JOIN bedges e ON e.src = l.id
        JOIN b3 w ON w.source = l.source AND w.id = e.dst
        JOIN bd3 wd ON wd.source = w.source AND wd.id = w.id
        GROUP BY 1, 2
    ) s ON s.source = l.source AND s.id = l.id
),
bd1 AS (
    SELECT l.source, l.id, CAST(coalesce(s.units, 0) AS BIGINT) AS units
    FROM b1 l LEFT JOIN (
        SELECT l.source, l.id, sum({term}) AS units
        FROM b1 l
        JOIN bedges e ON e.src = l.id
        JOIN b2 w ON w.source = l.source AND w.id = e.dst
        JOIN bd2 wd ON wd.source = w.source AND wd.id = w.id
        GROUP BY 1, 2
    ) s ON s.source = l.source AND s.id = l.id
)"""


BETWEENNESS_SAMPLED_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{_betweenness_ctes()}\n"
    f"""SELECT CASE WHEN id >= {KCORE_PRODUCT_OFFSET}
            THEN 'product' ELSE 'user' END AS role,
       CASE WHEN id >= {KCORE_PRODUCT_OFFSET}
            THEN id - {KCORE_PRODUCT_OFFSET} ELSE id END AS id,
       CAST(sum(units) AS DOUBLE) / {_BW_GRID} AS betweenness
FROM (SELECT * FROM bd1 UNION ALL SELECT * FROM bd2
      UNION ALL SELECT * FROM bd3)
GROUP BY 1, 2"""
)


# HyperANF neighbourhood function (operators.hyperanf; Boldi-Vigna 2011)
# on the bipartite liked graph: per-vertex portable-HLL registers (md5
# hash, b=8), per-hop (id, bucket) MAX merge along edges, unrolled
# ANF_MAX_HOPS times; per-vertex estimates re-quantized to the 2^-20 grid
# so the per-hop totals are order-independent exact sums.
ANF_MAX_HOPS = 3
_ANF_B = 8
_ANF_M = 1 << _ANF_B
_ANF_ALPHA = 0.7213 / (1 + 1.079 / _ANF_M)
_ANF_QGRID = float(1 << 20)


def _anf_est_sql() -> str:
    """Per-vertex guarded HLL estimate over an (s, nonzero) row —
    mirrors operators.sketches._hll_guarded_est (same literals, same
    operation order)."""
    m = _ANF_M
    raw = (f"(CAST({_ANF_ALPHA!r} AS DOUBLE) * {m} * {m})"
           f" / (s + ({m} - nonzero))")
    return (
        f"round(CASE WHEN {raw} <= 2.5 * {m} AND ({m} - nonzero) > 0 "
        f"THEN CAST({m} AS DOUBLE) "
        f"* ln(CAST({m} AS DOUBLE) / ({m} - nonzero)) "
        f"ELSE {raw} END, 4)"
    )


def anf_ctes(hops: int = ANF_MAX_HOPS) -> str:
    off = KCORE_PRODUCT_OFFSET
    m = _ANF_M
    parts = [f"""bedges AS (
    SELECT user_id AS src, product_id + {off} AS dst FROM liked
    UNION ALL
    SELECT product_id + {off} AS src, user_id AS dst FROM liked
),
anf0 AS (
    SELECT id, CAST(hv % {m} AS INT) AS bucket,
           CAST(CASE WHEN hv // {m} = 0 THEN {33 - _ANF_B}
                ELSE {33 - _ANF_B} - length(bin(hv // {m})) END AS INT)
               AS rho
    FROM (
        SELECT id, CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)
                        AS BIGINT) AS hv
        FROM (SELECT DISTINCT src AS id FROM bedges)
    )
)"""]
    for h in range(1, hops + 1):
        parts.append(f"""anf{h} AS (
    SELECT id, bucket, max(rho) AS rho FROM (
        SELECT * FROM anf{h - 1}
        UNION ALL
        SELECT e.src AS id, r.bucket, r.rho
        FROM bedges e JOIN anf{h - 1} r ON r.id = e.dst
    ) GROUP BY id, bucket
)""")
    for h in range(hops + 1):
        parts.append(f"""stats{h} AS (
    SELECT {h} AS hop, count(*) AS n_vertices,
           round(sum(q), 4) AS total_reach_est,
           round(sum(q) / count(*), 6) AS avg_reach_est
    FROM (
        SELECT floor({_anf_est_sql()} * {_ANF_QGRID} + 0.5)
                   / {_ANF_QGRID} AS q
        FROM (
            SELECT id, coalesce(sum(power(2.0, -rho)), 0.0) AS s,
                   count(*) AS nonzero
            FROM anf{h} GROUP BY id
        )
    )
)""")
    return ",\n".join(parts)


NEIGHBORHOOD_FUNCTION_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{anf_ctes()}\n"
    + "\nUNION ALL\n".join(
        f"SELECT * FROM stats{h}" for h in range(ANF_MAX_HOPS + 1)
    )
)


# Newman modularity of the LPA partition (entry _q_community_modularity):
# Q = Σ_c (intra_c·E − d_c²) / E² with E the directed-double edge count —
# exact BIGINT numerator, one IEEE division, unrolled-LPA labels.
COMMUNITY_MODULARITY_SQL = (
    f"{graph_prefix(5)},\n"
    """deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
tot AS (SELECT count(*) AS e2 FROM edges),
dc AS (SELECT l.label, CAST(sum(d.deg) AS BIGINT) AS d_c
       FROM l5 l JOIN deg d USING (id) GROUP BY l.label),
intra AS (
    SELECT la.label, count(*) AS i_c
    FROM edges e
    JOIN l5 la ON la.id = e.src
    JOIN l5 lb ON lb.id = e.dst AND lb.label = la.label
    GROUP BY la.label
),
terms AS (
    SELECT (coalesce(i.i_c, 0) * t.e2 - dc.d_c * dc.d_c) AS num, t.e2
    FROM dc LEFT JOIN intra i USING (label), tot t
)
SELECT CAST(count(*) AS BIGINT) AS n_communities,
       CAST(e2 // 2 AS BIGINT) AS n_edges,
       round(CAST(sum(num) AS DOUBLE)
             / (CAST(e2 AS DOUBLE) * CAST(e2 AS DOUBLE)), 6) AS modularity
FROM terms GROUP BY e2
"""
)


# Degree assortativity (Newman 2002) on the bounded (user<200) co-review
# graph: Pearson r over (deg(src), deg(dst)) of the double relation from
# exact BIGINT sufficient statistics (entry _q_degree_assortativity).
DEGREE_ASSORTATIVITY_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_200_CTE},\n{EDGES_CTES},\n"
    """deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
m AS (
    SELECT count(*) AS n,
           CAST(sum(a.deg) AS BIGINT) AS sx,
           CAST(sum(b.deg) AS BIGINT) AS sy,
           CAST(sum(a.deg * b.deg) AS BIGINT) AS sxy,
           CAST(sum(a.deg * a.deg) AS BIGINT) AS sxx,
           CAST(sum(b.deg * b.deg) AS BIGINT) AS syy
    FROM edges e JOIN deg a ON a.id = e.src JOIN deg b ON b.id = e.dst
)
SELECT CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
       END AS assortativity
FROM m
"""
)


# Earliest-arrival temporal reachability (operators.temporal; entry
# _q_temporal_reachability): product-mediated time-respecting flow from
# the BFS_N_SOURCES smallest liked users, 2 user-hops unrolled. State
# merge = lexicographic min (arrival, hops) — row_number mirrors Spark's
# min(struct) exactly; all arithmetic is integer seconds.
def temporal_ctes(hops: int = 2) -> str:
    parts = [f"""inter AS (
    SELECT user_id AS u, product_id AS p, ts AS t
    FROM reviews WHERE user_id < 1000 AND rating > 3.0
),
s0 AS (
    SELECT CAST(id AS BIGINT) AS id, CAST(0 AS BIGINT) AS arrival,
           0 AS hops
    FROM (SELECT DISTINCT u AS id FROM inter ORDER BY u
          LIMIT {BFS_N_SOURCES})
)"""]
    for h in range(1, hops + 1):
        parts.append(f"""oi{h} AS (
    SELECT i.p, min(i.t) AS item_t
    FROM s{h - 1} s JOIN inter i ON i.u = s.id AND i.t >= s.arrival
    GROUP BY i.p
),
d{h} AS (
    SELECT i.u AS id, min(i.t) AS arrival, {h} AS hops
    FROM oi{h} o JOIN inter i ON i.p = o.p AND i.t >= o.item_t
    GROUP BY i.u
),
s{h} AS (
    SELECT id, arrival, hops FROM (
        SELECT id, arrival, hops,
               row_number() OVER (PARTITION BY id
                                  ORDER BY arrival, hops) AS rn
        FROM (SELECT * FROM s{h - 1} UNION ALL SELECT * FROM d{h})
    ) WHERE rn = 1
)""")
    return ",\n".join(parts)


TEMPORAL_REACHABILITY_SQL = (
    f"WITH {REVIEWS_CTE},\n{temporal_ctes(2)}\n"
    "SELECT id, arrival AS arrival_sec, hops FROM s2"
)


# Weighted PageRank (operators.graph.pagerank_weighted) on the co-review
# graph with edge weight = number of co-reviewed products per user pair:
# contribution rank·w/W(u) quantized to the 2^-38 grid; same literal
# discipline as pagerank_ctes (every constant through CAST AS DOUBLE).
def pagerank_weighted_ctes(iterations: int = 3) -> str:
    parts = [
        """wpairs AS (
    SELECT a.user_id AS src, b.user_id AS dst, count(*) AS w
    FROM liked a
    JOIN liked b ON a.product_id = b.product_id AND a.user_id < b.user_id
    GROUP BY 1, 2
)""",
        """wedges AS (
    SELECT src, dst, w FROM wpairs
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM wpairs
)""",
        "wout AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout"
        " FROM wedges GROUP BY src)",
        "wverts AS (SELECT DISTINCT src AS id FROM wedges)",
        "wnv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM wverts)",
        "wpr0 AS (SELECT id, CAST(1 AS DOUBLE) / (SELECT n FROM wnv)"
        " AS rank FROM wverts)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"wpr{i} AS (\n"
            "    SELECT e.dst AS id,\n"
            "           (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))"
            " / (SELECT n FROM wnv)\n"
            "           + CAST(0.85 AS DOUBLE) * SUM(\n"
            "               floor(p.rank * CAST(e.w AS DOUBLE)"
            " / CAST(o.wout AS DOUBLE)\n"
            "                     * CAST(274877906944 AS DOUBLE)\n"
            "                     + CAST(0.5 AS DOUBLE))"
            " / CAST(274877906944 AS DOUBLE)) AS rank\n"
            f"    FROM wedges e\n"
            f"    JOIN wpr{i - 1} p ON p.id = e.src\n"
            "    JOIN wout o ON o.src = e.src\n"
            "    GROUP BY e.dst\n"
            ")"
        )
    return ",\n".join(parts)


PAGERANK_WEIGHTED_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{pagerank_weighted_ctes(3)}\n"
    "SELECT id, round(rank, 6) AS rank FROM wpr3"
)


# Effective diameter from the HyperANF curve (entry _q_effective_diameter):
# smallest hop whose N(h) reaches 90% of the horizon estimate.
# horizon_reach_est = N(max_hop), the saturation test's own denominator
# (r14 graph-suite review — was max over hops, which can diverge from
# N(max_hop) if the guarded HLL estimator dips across the
# linear-counting boundary; both engines changed together).
EFFECTIVE_DIAMETER_SQL = (
    f"WITH {REVIEWS_CTE},\n{LIKED_CTE},\n{anf_ctes()},\n"
    + "\ncurve AS ("
    + "\nUNION ALL\n".join(
        f"SELECT * FROM stats{h}" for h in range(ANF_MAX_HOPS + 1)
    )
    + """),
tot AS (
    SELECT total_reach_est AS nt FROM curve
    WHERE hop = (SELECT max(hop) FROM curve)
)
SELECT (SELECT min(hop) FROM curve, tot
        WHERE round(total_reach_est / nt, 6) >= 0.9)
           AS effective_diameter,
       (SELECT nt FROM tot) AS horizon_reach_est
"""
)


# --- table-level measure-domain contract (round 15) -------------------------
# Exact-cents queries assume measure columns are sane finite numbers; the
# adversarial sweep showed the engines FAIL DIFFERENTLY out of domain
# (Spark ANSI CAST_OVERFLOW / sum overflow vs DuckDB Inf-cast errors vs
# silent HUGEINT promotion). Queries that do exact-integer arithmetic on
# a table's measures therefore read the table through a CLEANED relation:
# every measure column present and abs(col) < MEASURE_BOUND (which also
# excludes NaN/±Inf/NULL — see operators._util.finite_measure). Clean
# generator data passes the guard unchanged, so this is a no-op on the
# driver's testdata; on dirty data both engines drop the SAME rows.
# Spark twin: sources.tables.load_table_clean.
# Per-column bound: PRICE-like columns get 1e9 (a billion-currency line
# item is already absurd, and cents×rate products stay far inside BIGINT:
# 1e11 cents × 1e3 rate-e2 = 1e14 per row), RATE-like columns (discount,
# tax — fractions of 1) get 10.0, event `value` keeps the generic 1e12
# (floored longs, never multiplied).
MEASURE_GUARD_COLS: dict[str, tuple[tuple[str, float], ...]] = {
    "lineitem": (
        ("l_quantity", 1e9),
        ("l_extendedprice", 1e9),
        ("l_discount", 10.0),
        ("l_tax", 10.0),
    ),
    "orders": (("o_totalprice", 1e9),),
    "part": (("p_retailprice", 1e9),),
    "customer": (("c_acctbal", 1e9),),
    "supplier": (("s_acctbal", 1e9),),
    "events": (("value", 1e12),),
}


def _clean_cte(table: str) -> str:
    guards = " AND ".join(
        f"abs({c}) < {float(b)!r}" for c, b in MEASURE_GUARD_COLS[table]
    )
    return f"{table}_clean AS (SELECT * FROM {table} WHERE {guards})"


def clean_tables_sql(sql: str, *tables: str) -> str:
    """Rewrite ``sql`` so every reference to each named table goes through
    its cleaned relation: body references are renamed ``t`` → ``t_clean``
    (word-boundary regex; column names never collide — they carry their
    own prefixes) and the guard CTEs are prepended (merging into an
    existing WITH). Purely textual, so it composes with any oracle."""
    import re as _re

    body = sql
    for t in tables:
        body = _re.sub(rf"\b{t}\b", f"{t}_clean", body)
    ctes = ",\n".join(_clean_cte(t) for t in tables)
    m = _re.match(r"(?is)^(\s*)WITH(\s+RECURSIVE)?\s", body)
    if m:
        # merge into the existing WITH list (the RECURSIVE keyword, when
        # present, must stay immediately after WITH)
        head = body[: m.end()]
        return head + ctes + ",\n" + body[m.end():]
    return f"WITH {ctes}\n{body}"


def valid_events_sql(sql: str, also_clean: bool = False) -> str:
    """Route an oracle's ``events`` references through the valid
    event-time domain (operators._util.VALID_TS_SQL) — the oracle twin of
    ``.filter(valid_ts("ts"))`` on the Spark side. Same rename-CTE
    technique as :func:`clean_tables_sql`. ``also_clean=True`` folds the
    events measure-domain guard into the same CTE (for queries whose
    Spark side reads ``load_table_clean`` + ``valid_ts`` — use this
    INSTEAD of listing events in a clean-table map, never both)."""
    import re as _re

    from .operators._util import VALID_TS_SQL

    guards = VALID_TS_SQL
    if also_clean:
        measure = " AND ".join(
            f"abs({c}) < {float(b)!r}" for c, b in MEASURE_GUARD_COLS["events"]
        )
        guards = f"{measure} AND {VALID_TS_SQL}"
    body = _re.sub(r"\bevents\b", "events_tv", sql)
    cte = f"events_tv AS (SELECT * FROM events WHERE {guards})"
    m = _re.match(r"(?is)^(\s*)WITH(\s+RECURSIVE)?\s", body)
    if m:
        return body[: m.end()] + cte + ",\n" + body[m.end():]
    return f"WITH {cte}\n{body}"
