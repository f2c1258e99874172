"""LLM-training-data pipeline query suite: dedup, text analysis,
similarity search, multimodal (SURVEY.md §7 M4; BASELINE.json north star).

Entries: ``name → (spark_fn, oracle_sql | None)``. SQL oracles exist for
everything expressible in portable SQL — including the MinHash/SimHash
family, whose portable md5-derived base hash (operators.dedup
portable_hash32/64) makes the signature pipelines deterministic arithmetic
DuckDB reproduces bit-for-bit. Only the genuinely non-SQL paths (SRP/IVF
ANN with MLlib KMeans, ALS) are rows-only, with invariant tests in
tests/test_llm_ops.py (e.g. LSH recall vs the exact oracle-checked
baseline).

Cross-engine notes:
- DuckDB's `list_cosine_similarity` accumulates in float32 → NOT used;
  oracles spell out `list_dot_product / (sqrt·sqrt)`, which matches Spark's
  double-accumulated `zip_with/aggregate` bit-for-bit (verified).
- DuckDB `regexp_replace` needs the 'g' flag to match Spark's replace-all.
- Jaccard = int/int division → IEEE-exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import text as T
from ..sources.tables import load_table

N_QUERY_VECS = 10  # vec_id < 10 are the similarity-search query set

# The two recall AUDITS (`ann_recall_report`, `semantic_dedup_recall`) are
# pre-flight SAMPLE audits by contract (AUDIT_CLASS_QUERIES): they run
# exact brute-force ground truth plus EVERY registered tier, so their cost
# accreted with each new tier (7.5 → 12.5 s and 11.6 → 22 s across rounds
# 10-12 at sf0.1 — VERDICT r12 item 4). Bounding the audited corpus pins
# that cost: 1000 vectors is ≥ the full sf0.01 corpus (500 — the driver's
# value-hash scale is bit-identically unchanged) and large enough at
# sf0.1+ for the recall conclusions (measured before/after in
# PERFORMANCE.md r13). Both the Spark side and the DuckDB oracle apply
# the SAME bound (`_bound_audit_corpus` rewrites the oracle), so the
# audits stay hash-exact at every scale.
RECALL_AUDIT_MAX_VECS = 1000


def _bound_audit_corpus(sql: str, max_vecs: int = None) -> str:
    """Rewrite a recall-audit oracle to run over the bounded audit corpus:
    every `embeddings` table reference becomes the `emb_audit` CTE
    (vec_id < RECALL_AUDIT_MAX_VECS), injected as the first CTE of the
    outer WITH."""
    import re

    if max_vecs is None:
        max_vecs = RECALL_AUDIT_MAX_VECS
    body, n_refs = re.subn(r"\bembeddings\b", "emb_audit", sql)
    # Guards (ADVICE r13 item 3): the textual rewrite is only sound when
    # (a) at least one table reference was actually rewritten, and (b) the
    # split point is the OUTER `WITH` keyword — i.e. the first non-blank
    # text of the statement — not a 'WITH' inside a comment or literal.
    if n_refs == 0:
        raise ValueError("audit oracle has no `embeddings` reference")
    head, rest = body.split("WITH", 1)
    if head.strip():
        raise ValueError(
            "audit oracle must START with its outer WITH clause; "
            f"found leading text {head.strip()[:40]!r}"
        )
    return (
        head
        + "WITH emb_audit AS (SELECT * FROM embeddings WHERE vec_id < "
        + f"{max_vecs}),\n"
        + rest
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _run_tiers_concurrently(labeled_thunks):
    """Evaluate independent audit-tier thunks from a thread pool (guide
    §2.6 "overlap independent jobs") with per-tier error attribution
    (ADVICE r16): ``submit()`` per tier instead of ``map()``, so a failing
    tier is re-raised NAMING the tier, and siblings that have not started
    yet are cancelled instead of continuing to submit Spark jobs during
    the unwind. Results come back in submission order — the callers'
    deterministic tier/union order is unchanged."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(labeled_thunks)) as pool:
        futures = [(name, pool.submit(fn)) for name, fn in labeled_thunks]
        results = []
        failure: Exception | None = None
        for name, fut in futures:
            if failure is not None:
                fut.cancel()
                continue
            try:
                results.append(fut.result())
            except Exception as exc:
                failure = RuntimeError(
                    f"audit tier {name!r} failed: {exc}"
                )
                failure.__cause__ = exc
        if failure is not None:
            raise failure
    return results


def _pin_emb(emb: DataFrame) -> DataFrame:
    """Pin ONE materialized copy of a validated embeddings relation for
    multi-reference consumers (round 16, VERDICT r15 item 5): the
    representative-pick aggregation in ``_emb`` otherwise re-executes per
    reference (the PQ fit + query side referenced it ~17×). The
    ``pin_layout`` repartition comes FIRST: a lazily-checkpointed tiny
    relation otherwise materializes at AQE's coalesced ONE partition and
    serializes every downstream per-row-heavy stage (signature
    projections, all-pairs scoring) on one core — the _util.pin_layout
    lesson. At real scale the relation exceeds the advisory size and the
    exchange is one narrow pass."""
    from ..operators._util import pin_layout

    return pin_layout(emb, "vec_id").localCheckpoint(eager=False)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE embeddings ingest point — applies the vector-validity contract
    (round 15, adversarial sweep): embedding present, non-empty, no NULL
    or NaN elements, finite positive squared norm. Malformed vectors made
    the two engines fail differently (Spark ANSI DIVIDE_BY_ZERO on a
    zero/empty norm, NULL-element poisoning of dot products) — a vector
    store quarantines them at ingest, identically in both engines (the
    oracle twin is VALID_EMB_GUARD_SQL, applied mechanically to every
    embeddings oracle below). No-op row-wise on the clean generator data
    (verified unit norms, zero bad elements at every SF)."""
    e = F.col("embedding")
    norm_sq = F.aggregate(
        e,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(
            F.col("vec_id").isNotNull()
            & e.isNotNull()
            & (F.size(e) > 0)
            & ~F.exists(e, lambda x: x.isNull() | F.isnan(x.cast("double")))
            & (norm_sq > 0)
            & (norm_sq < F.lit(float("1e308")))
        )
        # ONE deterministic row per vec_id (round 15): vec_id-keyed
        # consumers otherwise multiply cell/pair multiplicity by the
        # physical duplication factor — and duplicated rows can differ in
        # metadata (label), so a full-row distinct is not enough.
        # Round 16: the pick is min(struct(label, embedding)) — struct
        # ordering is (label ASC NULLS FIRST, embedding ASC NULLS FIRST),
        # exactly the row_number window this replaces (parity pinned by
        # test_emb_representative_pick_matches_window) — because the
        # aggregation PARTIAL-aggregates map-side where the window
        # sort-shuffled every embedding array (guide §2.3 "aggregate
        # before you shuffle"); a no-op pass-through on clean data where
        # vec_id is already unique.
        .groupBy("vec_id")
        .agg(F.min(F.struct("label", "embedding")).alias("_m"))
        .select(
            "vec_id",
            F.col("_m.embedding").alias("embedding"),
            F.col("_m.label").alias("label"),
        )
        # NOT checkpointed here: predicates on vec_id (the grouping key)
        # still push through this aggregation to the parquet scan — the
        # recall audit's corpus bound depends on that; heavy
        # multi-reference consumers pin their own copy instead (see
        # q_pq_adc_topk)
    )


# oracle twin of the _emb vector-validity contract (see its docstring)
VALID_EMB_GUARD_SQL = (
    "vec_id IS NOT NULL "
    "AND embedding IS NOT NULL AND len(embedding) > 0 "
    "AND len(list_filter(embedding, "
    "x -> x IS NULL OR isnan(CAST(x AS DOUBLE)))) = 0 "
    "AND list_sum(list_transform(embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0 "
    "AND list_sum(list_transform(embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 1e308"
)


def valid_embeddings_sql(sql: str) -> str:
    """Route an oracle's ``embeddings`` references through the vector
    validity contract (rename-CTE technique, see oracles.clean_tables_sql)."""
    import re as _re

    body = _re.sub(r"\bembeddings\b", "embeddings_ok", sql)
    cte = (
        "embeddings_ok AS (SELECT vec_id, embedding, label FROM ("
        "SELECT vec_id, embedding, label, row_number() OVER ("
        "PARTITION BY vec_id ORDER BY label NULLS FIRST, "
        "embedding NULLS FIRST) AS _rn FROM embeddings "
        f"WHERE {VALID_EMB_GUARD_SQL}) WHERE _rn = 1)"
    )
    m = _re.match(r"(?is)^(\s*)WITH(\s+RECURSIVE)?\s", body)
    if m:
        return body[: m.end()] + cte + ",\n" + body[m.end():]
    return f"WITH {cte}\n{body}"


# --- text analysis ----------------------------------------------------------


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # counts cast to long: Spark size() is 32-bit, DuckDB len() is BIGINT
    return _docs(spark, sf_dir).select(
        "doc_id",
        T.token_count("text").cast("long").alias("n_tokens"),
        F.size(T.bpe_ish_tokens("text")).cast("long").alias("n_subword_tokens"),
    )


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), x -> x != ''))
           AS n_subword_tokens
FROM documents
"""


def q_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_stats(_docs(spark, sf_dir))


_SW = ", ".join(f"'{w}'" for w in T.STOPWORDS)
QUALITY_STATS_SQL = f"""
WITH t AS (
    SELECT doc_id, n_chars,
           string_split(text, ' ') AS toks,
           len(list_filter(string_split(text, ' '), x -> x IN ({_SW}))) AS sw
    FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       round(list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE)))
             / len(toks), 6) AS mean_token_len,
       round(CAST(sw AS DOUBLE) / len(toks), 6) AS stopword_ratio,
       (CASE WHEN len(toks) >= 10 THEN 1 ELSE 0 END
        + CASE WHEN n_chars >= 50 THEN 1 ELSE 0 END
        + CASE WHEN sw > 0 THEN 1 ELSE 0 END) AS quality_score
FROM t
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.language_id(_docs(spark, sf_dir))


_MARKER_VALUES = ", ".join(
    f"('{lang}', '{m}')" for lang, ms in T.LANG_MARKERS.items() for m in ms
)
LANGUAGE_ID_SQL = f"""
WITH markers(pred_lang, marker) AS (VALUES {_MARKER_VALUES}),
hits AS (
    SELECT d.doc_id, m.pred_lang, count(*) AS hits
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents) d
    JOIN markers m ON d.tok = m.marker
    GROUP BY d.doc_id, m.pred_lang
),
best AS (
    SELECT doc_id, pred_lang FROM (
        SELECT doc_id, pred_lang,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY hits DESC, pred_lang ASC) AS rn
        FROM hits
    ) WHERE rn = 1
)
SELECT d.doc_id, coalesce(b.pred_lang, 'und') AS pred_lang
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate inputs — full value oracle (integer
    counts, exact int/int double division, 6 dp both engines)."""
    return T.repetition_stats(_docs(spark, sf_dir))


REPETITION_STATS_SQL = """
WITH t AS (
    -- per PHYSICAL ROW (round 15): keying the bigram max on doc_id merged
    -- duplicated-id rows' counts and dropped NULL-id rows at the join —
    -- the synthesized rid mirrors the Spark side's surrogate row id (its
    -- values don't matter; it is only a grouping/join key)
    SELECT doc_id, string_split(text, ' ') AS toks,
           row_number() OVER () AS rid
    FROM documents
),
base AS (
    SELECT rid, doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd
    FROM t
),
bg AS (
    SELECT rid, toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]
               AS bigram
    FROM t, unnest(range(1, len(toks))) AS u(i)
),
bgc AS (
    SELECT rid, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2
),
mx AS (
    SELECT rid, max(c) AS mc FROM bgc GROUP BY 1
)
SELECT b.doc_id,
       round(CAST(b.n - b.nd AS DOUBLE) / b.n, 6) AS dup_token_ratio,
       CASE WHEN b.n < 2 THEN 0.0
            ELSE round(CAST(mx.mc AS DOUBLE) / (b.n - 1), 6)
       END AS top_bigram_ratio
FROM base b LEFT JOIN mx ON b.rid = mx.rid
"""


DECON_N = 8  # standard n-gram size for benchmark decontamination


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id % 10 != 0) that
    share ≥1 distinct 8-token gram with the held-out eval slice
    (doc_id % 10 == 0), with the shared-gram count. Exact integer logic →
    full value oracle. The 10% slice stands in for a real benchmark suite
    (no eval sets ship in the test data); production eval sets are a few
    MB, which is what the operator's broadcast default assumes."""
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 10 == 0)
    return T.ngram_overlap(train, eval_docs, n=DECON_N)


DECONTAMINATION_SQL = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
grams AS (
    SELECT doc_id,
           array_to_string(
               toks[CAST(i AS INT):CAST(i AS INT) + {DECON_N - 1}], ' '
           ) AS ngram
    FROM t, unnest(range(1, len(toks) - {DECON_N} + 2)) AS u(i)
),
eval_grams AS (
    SELECT DISTINCT ngram FROM grams WHERE doc_id % 10 = 0
)
SELECT g.doc_id, CAST(COUNT(DISTINCT g.ngram) AS BIGINT) AS n_overlap
FROM grams g JOIN eval_grams e ON g.ngram = e.ngram
WHERE g.doc_id % 10 != 0
GROUP BY g.doc_id
"""


MIXTURE_RATES = {
    "src0": 1.0,
    "src1": 0.75,
    "src2": 0.5,
    "src3": 0.25,
    "src4": 0.1,
}  # remaining sources are dropped — an explicit mixture recipe


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling (pretraining data mixing): deterministic
    per-source keep rates via the salted portable hash — full value oracle
    (exact integer logic, engine-identical hash)."""
    return T.sample_mixture(_docs(spark, sf_dir), MIXTURE_RATES).select(
        "doc_id", "lang", "source", "n_chars"
    )


_MIX_CASE = " ".join(
    f"WHEN '{k}' THEN {int(round(r * 1_000_000))}"
    for k, r in sorted(MIXTURE_RATES.items())
)
CORPUS_MIXTURE_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE (CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8)
            AS BIGINT) % 1000000)
      < CASE source {_MIX_CASE} ELSE NULL END
"""


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprint(_docs(spark, sf_dir))


FINGERPRINTS_SQL = """
SELECT doc_id,
       md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                          ' +', ' ', 'g')) AS fingerprint
FROM documents
"""


# --- dedup ------------------------------------------------------------------


def q_exact_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_keys(_docs(spark, sf_dir))


EXACT_DEDUP_KEYS_SQL = """
SELECT min(doc_id) AS doc_id, sha256(text) AS text_hash
FROM documents GROUP BY sha256(text)
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard over DISTINCT WORD (1-gram) SETS, blocked by lang —
    order- and multiplicity-blind BY DEFINITION (round-13 review note:
    this measure is NOT the char-5-shingle Jaccard the MinHash tiers
    estimate; `near_dup_clusters` composes the same graph-components
    machinery over either pair generator, but the two edge sets come
    from DIFFERENT similarity measures and thresholds — pick by policy,
    don't treat one as the other's exact baseline)."""
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)


NGRAM_JACCARD_SQL = """
WITH t AS (
    SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
    FROM documents
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / len(list_distinct(list_concat(a.toks, b.toks))), 6) >= 0.8
"""


def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's END PRODUCT: every document mapped to its
    near-dup cluster representative — connected components over the exact
    distinct-word-set Jaccard ≥ 0.8 pair graph, cluster id = min doc_id
    in the component, singleton docs map to themselves. Fully
    value-checked (recursive-CTE closure oracle). At scale the same
    COMPOSITION (pair graph → star-CC → representative) runs with
    minhash_lsh_pairs as the edge generator — note that generator
    estimates char-5-shingle Jaccard, a different similarity measure
    (see near_dup_clusters_lsh for the composed scale tier)."""
    from ..operators import graph as G

    docs = _docs(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.8)
    edges = G.undirected(
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )
    comp = G.contracted_components(edges)
    return (
        docs.select("doc_id")
        .join(comp, docs["doc_id"] == comp["id"], "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
    )


NEAR_DUP_CLUSTERS_SQL = """
WITH RECURSIVE t AS (
    SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
    FROM documents
),
p AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id
    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                / len(list_distinct(list_concat(a.toks, b.toks))), 6) >= 0.8
),
e AS (
    SELECT a_id AS src, b_id AS dst FROM p
    UNION ALL
    SELECT b_id AS src, a_id AS dst FROM p
),
reach(id, r) AS (
    SELECT src AS id, src AS r FROM e
    UNION
    SELECT e.dst AS id, reach.r AS r FROM reach JOIN e ON e.src = reach.id
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates (scale path) — FULL value oracle:
    the portable md5-derived base hash makes the whole signature pipeline
    deterministic arithmetic DuckDB reproduces exactly (banding included,
    since the band bucket key is the band slice itself). Recall vs the
    exact Jaccard baseline additionally asserted in tests."""
    return D.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_near_dup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact dedup → MinHash-LSH on survivors (the scale-correct ordering;
    see PERFORMANCE.md) — full value oracle, as above."""
    return D.near_dup_pipeline(_docs(spark, sf_dir))


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming≤3 near-dups via quadrant blocking — full value
    oracle: blocking is lossless (pigeonhole), so the DuckDB twin is the
    brute-force Hamming≤3 pair set over the same portable signatures."""
    return D.simhash_near_dups(_docs(spark, sf_dir))


def q_near_dup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-PATH dedup end product: doc → near-dup cluster
    representative with **MinHash-LSH edges** (banded equi-join candidates)
    and **large-star/small-star connected components** (O(log² n) rounds) —
    the exact composition a 100 TB corpus runs, where the quadratic
    exact-Jaccard edge generator of ``near_dup_clusters`` is infeasible.
    Fully value-checked: the portable base hash makes the LSH pair set
    engine-exact, and the oracle closes it with a recursive CTE."""
    from ..operators import graph as G

    docs = _docs(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    edges = G.undirected(
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )
    # contracted star-CC: LSH pair graphs are near-cliques, so one fused
    # min-neighbor round consumes almost the whole edge volume (sf0.1:
    # 374 800 pairs; CC stage 4.8 s -> 1.9 s, identical output)
    comp = G.contracted_components(edges)
    return (
        docs.select("doc_id")
        .join(comp, docs["doc_id"] == comp["id"], "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
    )


def q_deduped_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's FINAL artifact: the training corpus with near-dup
    clusters collapsed to their representative (min doc_id), using the
    scale-path cluster map (MinHash-LSH edges → star-CC). This is the
    query a 100 TB corpus build actually ships — everything else in the
    dedup suite exists to make this row set right. Fully value-checked.

    Composition order (round 8 — the repo's own round-1 lesson applied
    here, PERFORMANCE.md "Measured 10× scale-up"): **exact dedup FIRST,
    LSH on survivors.** LSH band-bucket candidate pairs grow quadratically
    in exact-duplicate cluster size (the sf1 probe measured 6.6× at 10×
    input from duplicate-cluster band collisions); exact dedup is one
    constant-size-key shuffle that bounds the candidate set to the
    distinct corpus. The final survivor set is IDENTICAL: exact copies
    share signatures, so they always land in their representative's
    cluster, and exact_dedup keeps the same min-doc_id representative the
    cluster would elect."""
    docs = _docs(spark, sf_dir)
    from ..operators import graph as G
    from ..operators._util import pin_layout as _pin_layout

    # pin the exact-dedup survivor set once (round 16): the signature
    # build and the representative semi-join otherwise each replay the
    # sha2 groupBy + semi-join over the corpus
    survivors = _pin_layout(
        D.exact_dedup(docs).select("doc_id", "text"), "doc_id"
    ).localCheckpoint(eager=False)
    pairs = D.minhash_lsh_pairs(survivors, threshold=0.5)
    edges = G.undirected(
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )
    comp = G.contracted_components(edges)
    keep = (
        survivors.select("doc_id")
        .join(comp, survivors["doc_id"] == comp["id"], "left")
        .filter(
            F.coalesce("component", F.col("doc_id")) == F.col("doc_id")
        )
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


# --- MinHash/SimHash oracle SQL ---------------------------------------------
# The signature pipelines are deterministic integer arithmetic over a
# cross-engine base hash (first 8/16 hex chars of md5 — operators.dedup
# portable_hash32/64), so DuckDB reproduces them bit-for-bit. The universal
# hash constants are embedded from the same _hash_params the Spark side uses.


def _minhash_banded_ctes(doc_filter: str, num_hashes: int, bands: int,
                         shingle_n: int) -> str:
    """CTE chain through ``banded(doc_id, band_idx, band)`` (plus ``sigs``)
    — the shared signature/banding prefix of every MinHash oracle,
    mirroring operators.dedup.minhash_signatures + _banded exactly."""
    params = D._hash_params(num_hashes)
    vals = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(params)
    )
    rows = num_hashes // bands
    return f"""
corpus AS (
    SELECT doc_id, text FROM documents {doc_filter}
),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(length(text) - {shingle_n - 1}, 1) + 1),
               i -> substr(text, i, {shingle_n})))) AS shingle
    FROM corpus
),
hx AS (
    SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS h
    FROM sh
),
hparams(i, a, b) AS (VALUES {vals}),
comp_sig AS (
    SELECT doc_id, p.i, min((h * p.a + p.b) % {D._MERSENNE61}) AS m
    FROM hx CROSS JOIN hparams p
    GROUP BY doc_id, p.i
),
sigs AS (
    SELECT doc_id, list(m ORDER BY i) AS sig FROM comp_sig GROUP BY doc_id
),
banded AS (
    SELECT doc_id, i // {rows} AS band_idx, list(m ORDER BY i) AS band
    FROM comp_sig GROUP BY doc_id, i // {rows}
)"""


def _minhash_ctes(doc_filter: str, num_hashes: int, bands: int,
                  shingle_n: int, threshold: float) -> str:
    """CTE chain ending in ``p(a_id, b_id, est_jaccard)`` — the MinHash-LSH
    pair set, mirroring operators.dedup.minhash_lsh_pairs exactly."""
    return _minhash_banded_ctes(
        doc_filter, num_hashes, bands, shingle_n
    ) + f""",
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band = b.band
     AND a.doc_id < b.doc_id
),
p AS (
    SELECT * FROM (
        SELECT c.a_id, c.b_id,
               round(CAST(len(list_filter(range(1, {num_hashes + 1}),
                     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
                     / {num_hashes}, 6) AS est_jaccard
        FROM cand c
        JOIN sigs sa ON sa.doc_id = c.a_id
        JOIN sigs sb ON sb.doc_id = c.b_id
    ) WHERE est_jaccard >= {threshold}
)"""


_EXACT_SURVIVORS = (
    "WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY sha256(text))"
)

MINHASH_NEAR_DUPS_SQL = (
    "WITH " + _minhash_ctes("", 32, 8, 5, 0.5)
    + "\nSELECT a_id, b_id, est_jaccard FROM p"
)


def q_lsh_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-audit of the LSH scale path: confusion counts of the banded
    MinHash candidate set against EXACT character-shingle Jaccard ≥ 0.5 on
    a bounded audit slice (doc_id < 200 — the bounded-exact-tier stance of
    triangle_counts). The ≥ 0.5 test is pure integers (3·|A∩B| ≥ |A|+|B|),
    so both pair sets and the single-row report are engine-exact — the
    recall/precision measurement a production dedup pipeline runs on a
    sample before trusting the banding parameters at full scale."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    sh = docs.select(
        "doc_id", F.explode(D.char_shingles("text", 5)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    exact = (
        inter.join(
            sizes.select(F.col("doc_id").alias("a_id"), F.col("sz").alias("sa")),
            "a_id",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b_id"), F.col("sz").alias("sb")),
            "b_id",
        )
        .filter(F.lit(3) * F.col("i") >= F.col("sa") + F.col("sb"))
        .select("a_id", "b_id")
    )
    # localCheckpoint both pair sets: each feeds two/three legs below
    # (intersect + union), and without materialization Spark re-executes
    # the quadratic shingle self-join and the LSH banding pipeline once
    # per leg in the same action
    exact = exact.localCheckpoint()
    lsh = (
        D.minhash_lsh_pairs(docs, threshold=0.5)
        .select("a_id", "b_id")
        .localCheckpoint()
    )
    tp = exact.intersect(lsh)
    tagged = (
        exact.withColumn("t", F.lit("exact"))
        .unionByName(lsh.withColumn("t", F.lit("lsh")))
        .unionByName(tp.withColumn("t", F.lit("tp")))
    )
    return (
        tagged.groupBy()
        .agg(
            # coalesce(0): on an empty audit slice the global agg still
            # emits one row, but sum over zero rows is NULL where the SQL
            # mirror's scalar COUNT subqueries return 0
            F.coalesce(
                F.sum((F.col("t") == "exact").cast("long")), F.lit(0)
            ).alias("n_exact"),
            F.coalesce(
                F.sum((F.col("t") == "lsh").cast("long")), F.lit(0)
            ).alias("n_lsh"),
            F.coalesce(
                F.sum((F.col("t") == "tp").cast("long")), F.lit(0)
            ).alias("n_true_pos"),
        )
        .select(
            "n_exact",
            "n_lsh",
            "n_true_pos",
            (F.col("n_lsh") - F.col("n_true_pos")).alias("n_false_pos"),
            (F.col("n_exact") - F.col("n_true_pos")).alias("n_false_neg"),
        )
    )


LSH_QUALITY_REPORT_SQL = (
    "WITH " + _minhash_ctes("WHERE doc_id < 200", 32, 8, 5, 0.5)
    + """,
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
exact AS (
    SELECT a_id, b_id FROM inter
    JOIN sz sa ON sa.doc_id = a_id
    JOIN sz sb ON sb.doc_id = b_id
    WHERE 3 * i >= sa.sz + sb.sz
),
lshp AS (SELECT a_id, b_id FROM p),
tp AS (SELECT a_id, b_id FROM exact INTERSECT SELECT a_id, b_id FROM lshp)
SELECT (SELECT count(*) FROM exact) AS n_exact,
       (SELECT count(*) FROM lshp) AS n_lsh,
       (SELECT count(*) FROM tp) AS n_true_pos,
       (SELECT count(*) FROM lshp) - (SELECT count(*) FROM tp) AS n_false_pos,
       (SELECT count(*) FROM exact) - (SELECT count(*) FROM tp) AS n_false_neg
"""
)

NEAR_DUP_PIPELINE_SQL = (
    "WITH " + _minhash_ctes(_EXACT_SURVIVORS, 32, 8, 5, 0.5)
    + "\nSELECT a_id, b_id, est_jaccard FROM p"
)

_LSH_CLOSURE_CTES = """,
e AS (
    SELECT a_id AS src, b_id AS dst FROM p
    UNION ALL
    SELECT b_id AS src, a_id AS dst FROM p
),
reach(id, r) AS (
    SELECT src AS id, src AS r FROM e
    UNION
    SELECT e.dst AS id, reach.r AS r FROM reach JOIN e ON e.src = reach.id
),
closure AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
"""

NEAR_DUP_CLUSTERS_LSH_SQL = (
    "WITH RECURSIVE " + _minhash_ctes("", 32, 8, 5, 0.5)
    + _LSH_CLOSURE_CTES
    + """
SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN closure c ON c.id = d.doc_id
"""
)

# exact-dedup-first mirror (round 8): the LSH pair CTE runs over exact
# survivors, and a dropped exact duplicate can never re-enter the corpus
# even though it no longer appears in any LSH cluster.
DEDUPED_CORPUS_SQL = (
    "WITH RECURSIVE " + _minhash_ctes(_EXACT_SURVIVORS, 32, 8, 5, 0.5)
    + _LSH_CLOSURE_CTES
    + f"""
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
{_EXACT_SURVIVORS}
  AND COALESCE(
    (SELECT c.component FROM closure c WHERE c.id = d.doc_id), d.doc_id
) = d.doc_id
"""
)


def q_deduped_corpus_aggressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AGGRESSIVE dedup artifact (operators.dedup
    minhash_bucket_edges): band-bucket stars → star-CC → survivors, NO
    pair verification — the tier a crawl-scale pipeline switches to when
    verified-pair volume goes quadratic in cluster size (round-8 sf1
    probe: 36.7 M verified pairs from 50 k docs; star edges are exactly
    docs × bands rows). More aggressive than `deduped_corpus` (band
    collision suffices to merge); same output shape. Fully value-checked
    (star edges are deterministic arithmetic; oracle closes them with the
    shared recursive-CC CTE)."""
    from ..operators import graph as G

    docs = _docs(spark, sf_dir)
    edges = D.minhash_bucket_edges(docs)
    comp = G.contracted_components(G.undirected(edges))
    keep = (
        docs.select("doc_id")
        .join(comp, docs["doc_id"] == comp["id"], "left")
        .filter(F.coalesce("component", F.col("doc_id")) == F.col("doc_id"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


DEDUPED_CORPUS_AGGRESSIVE_SQL = (
    "WITH RECURSIVE " + _minhash_banded_ctes("", 32, 8, 5)
    + """,
roots AS (
    SELECT band_idx, band, min(doc_id) AS src FROM banded GROUP BY 1, 2
),
p AS (
    SELECT DISTINCT r.src AS a_id, b.doc_id AS b_id
    FROM banded b JOIN roots r USING (band_idx, band)
    WHERE b.doc_id != r.src
)"""
    + _LSH_CLOSURE_CTES
    + """
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE COALESCE(
    (SELECT c.component FROM closure c WHERE c.id = d.doc_id), d.doc_id
) = d.doc_id
"""
)

def _simhash_sql(max_hamming: int = 3) -> str:
    """Brute-force Hamming≤k pair set over portable SimHash signatures —
    value-identical to the quadrant-blocked Spark plan (blocking is
    lossless). Per-token bit b of the 64-bit base hash = bit (b%4) of hex
    digit (16 - b//4) of md5(tok); signature packs sign bits of the ±1
    contribution sums, two's-complement (bit 63 → -2^63)."""
    sums = ",\n           ".join(
        f"SUM(CASE WHEN (dg[{16 - b // 4}] // {1 << (b % 4)}) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS s{b}"
        for b in range(64)
    )
    sig_terms = "\n         + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({-(1 << 63) if b == 63 else (1 << b)}"
        f" AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(64)
    )
    return f"""
WITH toks AS (
    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
    FROM documents
),
dgt AS (
    SELECT doc_id,
           list_transform(range(1, 17),
               j -> strpos('0123456789abcdef', substr(md5(tok), j, 1)) - 1)
               AS dg
    FROM toks
),
sums AS (
    SELECT doc_id,
           {sums}
    FROM dgt GROUP BY doc_id
),
sigs AS (
    SELECT doc_id,
           {sig_terms} AS simhash
    FROM sums
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


SIMHASH_NEAR_DUPS_SQL = _simhash_sql(3)


# --- similarity search ------------------------------------------------------


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin ONE copy of the validated store (round 16): query + corpus side
    emb = _pin_emb(_emb(spark, sf_dir))
    return S.cosine_topk(
        emb.filter(F.col("vec_id") < N_QUERY_VECS), emb, k=5
    )


# DuckDB's list_dot_product accumulates in float32; this explicit
# double-cast left-fold matches Spark's zip_with/aggregate bit-for-bit.
def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"round({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) "
        f"* sqrt({_dot_sql(b, b)})), 6)"
    )


COSINE_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < {N_QUERY_VECS}),
scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           {_cosine_sql('q.qv', 'e.embedding')} AS cosine_sim
    FROM q JOIN embeddings e ON e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_sim DESC, neighbor_id ASC)
              AS rank
    FROM scored
) WHERE rank <= 5
"""


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-k (scale path) — FULL value oracle: the
    hyperplanes are seeded Python-float constants baked into the plan, the
    signature is sign(left-fold dot) per plane, and DuckDB's
    ``list_sum(list_transform(...))`` reproduces the fold bit-for-bit, so
    the bucket assignment, candidate join, and re-rank are all
    engine-exact. Recall vs cosine_topk additionally asserted in tests."""
    emb = _pin_emb(_emb(spark, sf_dir))
    return S.lsh_topk(emb.filter(F.col("vec_id") < N_QUERY_VECS), emb, k=5)


def _lsh_topk_sql(k: int = 5, n_planes: int = 8, dim: int = 64) -> str:
    """Mirror of operators.similarity.lsh_topk: SRP bucket = packed sign
    bits of plane dots (strict > 0, weight 2^i), candidates = bucket
    equi-join, exact cosine re-rank rounded to 6 dp with id tie-break.
    The plane constants are repr()-round-tripped doubles — DuckDB parses
    them to the identical binary values Spark's literals hold."""
    planes = S._hyperplanes(dim, n_planes)
    vals = ",\n    ".join(
        f"({1 << i}, [{', '.join(repr(w) for w in plane)}]::DOUBLE[])"
        for i, plane in enumerate(planes)
    )
    dot_plane = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        "j -> CAST(e.embedding[j] AS DOUBLE) * p.plane[j]))"
    )
    return f"""
WITH planes(w, plane) AS (VALUES
    {vals}),
sigs AS (
    SELECT e.vec_id,
           SUM(CASE WHEN {dot_plane} > 0 THEN CAST(p.w AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END) AS bucket
    FROM embeddings e CROSS JOIN planes p
    GROUP BY e.vec_id
),
q AS (
    SELECT e.vec_id AS query_id, e.embedding AS qv, s.bucket
    FROM embeddings e JOIN sigs s ON s.vec_id = e.vec_id
    WHERE e.vec_id < {N_QUERY_VECS}
),
c AS (
    SELECT e.vec_id AS neighbor_id, e.embedding AS cv, s.bucket
    FROM embeddings e JOIN sigs s ON s.vec_id = e.vec_id
),
scored AS (
    SELECT q.query_id, c.neighbor_id,
           {_cosine_sql('q.qv', 'c.cv')} AS cosine_sim
    FROM q JOIN c ON q.bucket = c.bucket AND c.neighbor_id != q.query_id
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_sim DESC, neighbor_id ASC)
              AS rank
    FROM scored
) WHERE rank <= {k}
"""


LSH_TOPK_SQL = _lsh_topk_sql()


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (KMeans coarse quantizer, probe 4/16 cells) approximate top-k —
    rows-only; recall vs the exact baseline asserted in tests."""
    emb = _pin_emb(_emb(spark, sf_dir))
    return S.ivf_topk(emb.filter(F.col("vec_id") < N_QUERY_VECS), emb, k=5)


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization (ADC) approximate top-k — the third ANN tier
    beside SRP-LSH and IVF (Jégou et al. 2011): corpus compressed to m
    subspace codes, per-query distance TABLE broadcast, approximate
    distance = sum of m lookups. Rows-only (the Lloyd fit is iterative —
    deterministic but not SQL-expressible); recall vs the exact baseline
    asserted in tests like IVF."""
    # pin ONE copy of the validated store (round 16, same move as
    # q_pq_adc_topk): the Lloyd fit + query side reference it repeatedly
    # and would otherwise replay the per-vec_id representative pick each
    # time
    emb = _pin_emb(_emb(spark, sf_dir))
    return S.pq_topk_oneshot(emb.filter(F.col("vec_id") < N_QUERY_VECS), emb, k=5)


def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC machinery on a FIXED hash-derived codebook — FULL value
    oracle (the hash-exact twin of the Lloyd-fitted ``pq_topk``): codeword
    constants are shared LCG doubles, code assignment is an engine-exact
    argmin, and the ADC reduction runs on a 1e-6 integer grid so the
    m-term sum is order-independent. Value-checks the exact pipeline the
    rows-only fit feeds (VERDICT r05 item 2)."""
    # pin ONE copy of the validated store: the subquantizer slices
    # reference it ~17× and would otherwise replay the per-vec_id
    # representative window per reference (round 15)
    emb = _pin_emb(_emb(spark, sf_dir))
    return S.pq_adc_topk(
        emb.filter(F.col("vec_id") < N_QUERY_VECS), emb, k=5
    )


def _pq_adc_sql(
    k: int = 5, m: int = 8, n_codes: int = 16, dim: int = 64, seed: int = 7
) -> str:
    """Mirror of operators.similarity.pq_adc_topk: same LCG codebook
    constants (repr()-round-tripped), same left-fold L2, same integer-grid
    ADC sum — every intermediate is bit-identical across engines."""
    sub_dim = dim // m
    vals = ",\n    ".join(
        f"({s}, {c}, [{', '.join(repr(w) for w in cw)}]::DOUBLE[])"
        for s, c, cw in S.pq_fixed_codebooks(m, n_codes, sub_dim, seed)
    )

    def l2sq(vec: str, sub: str, cw: str) -> str:
        elem = f"CAST({vec}[{sub} * {sub_dim} + j] AS DOUBLE) - {cw}[j]"
        return (
            f"list_sum(list_transform(range(1, {sub_dim} + 1), "
            f"j -> ({elem}) * ({elem})))"
        )

    return f"""
WITH books(sub, code, cw) AS (VALUES
    {vals}),
cd AS (
    SELECT vec_id, sub, code FROM (
        SELECT e.vec_id, b.sub, b.code,
               row_number() OVER (
                   PARTITION BY e.vec_id, b.sub
                   ORDER BY {l2sq('e.embedding', 'b.sub', 'b.cw')} ASC,
                            b.code ASC) AS rn
        FROM embeddings e CROSS JOIN books b
    ) WHERE rn = 1
),
tbl AS (
    SELECT q.vec_id AS query_id, b.sub, b.code,
           CAST(round({l2sq('q.embedding', 'b.sub', 'b.cw')} * 1000000.0)
                AS BIGINT) AS de6
    FROM embeddings q CROSS JOIN books b
    WHERE q.vec_id < {N_QUERY_VECS}
),
scored AS (
    SELECT t.query_id, c.vec_id AS neighbor_id,
           CAST(sum(t.de6) AS DOUBLE) / 1000000.0 AS approx_dist
    FROM cd c
    JOIN tbl t ON t.sub = c.sub AND t.code = c.code
              AND t.query_id != c.vec_id
    GROUP BY 1, 2
)
SELECT query_id, neighbor_id, approx_dist, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx_dist ASC, neighbor_id ASC)
              AS rank
    FROM scored
) WHERE rank <= {k}
"""


PQ_ADC_TOPK_SQL = _pq_adc_sql()


def q_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe machinery on FIXED hash-derived centroids — FULL value
    oracle (the hash-exact twin of the KMeans-fitted ``ivf_topk``):
    argmin-L2 cell assignment, 4-of-16 cell probe, exact cosine re-rank
    within the probed cells."""
    emb = _pin_emb(_emb(spark, sf_dir))
    return S.ivf_probe_fixed(
        emb.filter(F.col("vec_id") < N_QUERY_VECS), emb, k=5
    )


def _ivf_probe_sql(
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 11,
) -> str:
    vals = ",\n    ".join(
        f"({i}, [{', '.join(repr(w) for w in cv)}]::DOUBLE[])"
        for i, cv in enumerate(S._lcg_vectors(n_cells, dim, seed))
    )
    elem = "CAST(e.embedding[j] AS DOUBLE) - c.cv[j]"
    l2sq = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"j -> ({elem}) * ({elem})))"
    )
    return f"""
WITH cents(cell, cv) AS (VALUES
    {vals}),
a AS (
    SELECT vec_id AS neighbor_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {l2sq} ASC, c.cell ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
    ) WHERE rn = 1
),
p AS (
    SELECT vec_id AS query_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {l2sq} ASC, c.cell ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
        WHERE e.vec_id < {N_QUERY_VECS}
    ) WHERE rn <= {n_probe}
),
cand AS (
    SELECT p.query_id, a.neighbor_id
    FROM p JOIN a USING (cell)
    WHERE a.neighbor_id != p.query_id
),
scored AS (
    SELECT cand.query_id, cand.neighbor_id,
           {_cosine_sql('q.embedding', 'c.embedding')} AS cosine_sim
    FROM cand
    JOIN embeddings q ON q.vec_id = cand.query_id
    JOIN embeddings c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_sim DESC, neighbor_id ASC)
              AS rank
    FROM scored
) WHERE rank <= {k}
"""


IVF_PROBE_SQL = _ivf_probe_sql()


def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of ALL THREE ANN tiers against the exact cosine
    top-k (VERDICT r08 item 7 — extends the r6 LSH-only quality report to
    IVF and PQ/ADC): per tier, how many of the exact top-k pairs the
    approximate index returns. Every tier is deterministic (seeded SRP
    hyperplanes, fixed LCG centroids/codebooks), so the whole report
    value-oracles — the speed/recall trade a production deployment
    measures on a sample before picking its index. recall_at_k =
    n_hits / n_exact, one IEEE division of two exact counts.

    Audits the BOUNDED audit corpus (RECALL_AUDIT_MAX_VECS — a no-op at
    sf ≤ 0.01, a fixed-cost sample above): the exact baselines are
    brute-force all-pairs BY DESIGN, so without the bound the audit's
    cost grew with every tier and SF bump (VERDICT r12 item 4). Tiers
    are invoked at operator level on the same sampled corpus the
    oracle's emb_audit CTE holds."""
    emb = _pin_emb(
        _emb(spark, sf_dir).filter(F.col("vec_id") < RECALL_AUDIT_MAX_VECS)
    )
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    exact_cos = (
        S.cosine_topk(qs, emb, k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    # exact L2 top-k — PQ/ADC approximates L2 distance, so its recall is
    # measured against the L2 truth, not the cosine truth (unnormalized
    # vectors rank differently under the two metrics)
    qa = qs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("_qv"),
    )
    ca = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("_cv"),
    )
    from ..operators.similarity import _l2sq

    w = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("neighbor_id").asc()
    )
    exact_l2 = (
        F.broadcast(qa)
        .join(ca, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _l2sq(F.col("_qv"), F.col("_cv")).alias("_d"),
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 5)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    tiers = [
        ("ivf", "cosine", lambda: S.ivf_probe_fixed(qs, emb, k=5), exact_cos),
        ("pq_adc", "l2", lambda: S.pq_adc_topk(qs, emb, k=5), exact_l2),
        (
            "srp_banded",
            "cosine",
            lambda: S.srp_banded_topk(qs, emb, k=5),
            exact_cos,
        ),
        ("srp_lsh", "cosine", lambda: S.lsh_topk(qs, emb, k=5), exact_cos),
    ]
    # independent tier index builds evaluated concurrently (guide §2.6,
    # same move as q_semantic_dedup_recall) — the checkpoints and the
    # output union order are unchanged; submit()-per-tier so a failure
    # names its tier (ADVICE r16)
    def _tier_result(fn):
        # checkpoint the (≤ k × n_queries)-row tier result: n_ann and
        # n_hits both read it, and without truncation each tier's full
        # index pipeline executes twice (halved the report's wall-clock)
        return fn().select("query_id", "neighbor_id").localCheckpoint()

    anns = _run_tiers_concurrently(
        [(t[0], (lambda fn=t[2]: _tier_result(fn))) for t in tiers]
    )

    out = None
    for (name, baseline, fn, exact), ann in zip(tiers, anns):
        row = (
            ann.agg(F.count(F.lit(1)).alias("n_ann"))
            .crossJoin(
                ann.join(exact, ["query_id", "neighbor_id"]).agg(
                    F.count(F.lit(1)).alias("n_hits")
                )
            )
            .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_exact")))
            .select(
                F.lit(name).alias("tier"),
                F.lit(baseline).alias("baseline"),
                "n_ann",
                "n_exact",
                "n_hits",
                F.round(F.col("n_hits") / F.col("n_exact"), 6).alias(
                    "recall_at_k"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def q_semantic_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup drop-set recall audit (VERDICT r09 item 2): per dedup
    tier, |tier-dropped ∩ exact-dropped| / |exact-dropped|, where exact =
    the all-pairs cosine≥threshold drop set (b dropped iff any lower-id a
    has 6-dp cosine ≥ t — the tier contracts' own rule with perfect
    candidate recall). A tier that silently misses most duplicate pairs
    is a correct program computing the wrong corpus — this row is the
    pre-flight number that catches it. Registered SEPARATELY from
    `ann_recall_report` (same row shape) so the per-query bench history
    of the top-k report stays comparable across rounds; like the exact
    baselines inside that report, the all-pairs ground truth here is the
    yardstick by design, linear-in-N × the dedup tiers it audits.

    Audits the BOUNDED audit corpus (RECALL_AUDIT_MAX_VECS — no-op at
    sf ≤ 0.01): the N² ground truth times four accreting tiers made the
    audit's cost drift round over round (11.6 → 22 s, VERDICT r12 item
    4); bounding the sample pins it while the adaptive tiers (cells,
    band bits) re-derive their parameters from the same sampled count on
    both engines."""
    emb = _pin_emb(
        _emb(spark, sf_dir).filter(F.col("vec_id") < RECALL_AUDIT_MAX_VECS)
    )
    from ..operators.similarity import _dot as _dotc, _norm as _normc

    # repartition BEFORE the checkpoint: the small embeddings scan
    # checkpoints to ONE partition, and a 1-partition stream side
    # serializes the all-pairs nested-loop join onto a single task
    # (measured 26.7 s → 2.6 s at sf0.1 with 32 partitions)
    rawd = (
        emb.select(
            F.col("vec_id").alias("_id"),
            F.col("embedding").cast("array<double>").alias("_r"),
            _normc(F.col("embedding").cast("array<double>")).alias("_nn"),
        )
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
        .localCheckpoint()
    )
    exact_drop = (
        rawd.alias("a")
        .join(rawd.alias("b"), F.col("a._id") < F.col("b._id"))
        .filter((F.col("a._nn") != 0.0) & (F.col("b._nn") != 0.0))
        .filter(
            F.round(
                _dotc(F.col("a._r"), F.col("b._r"))
                / (F.col("a._nn") * F.col("b._nn")),
                6,
            )
            >= SDA_THRESHOLD
        )
        .select(F.col("b._id").alias("vec_id"))
        .distinct()
        .localCheckpoint()
    )
    all_ids = emb.select("vec_id")
    # operator-level tier invocations on the SAME sampled corpus (the
    # q_* wrappers load the full table; parameters mirror them exactly)
    dedup_tiers = [
        (
            "semdedup_fixed",
            lambda: S.semantic_dedup_fixed(
                emb, n_clusters=16, threshold=0.45
            ),
        ),
        (
            "semdedup_ann",
            lambda: S.semantic_dedup_ann(
                emb,
                threshold=SDA_THRESHOLD,
                n_bands=SDA_BANDS,
                target_bucket=SDA_TARGET_BUCKET,
                max_bits=SDA_MAX_BITS,
            ),
        ),
        (
            "semdedup_ivf",
            lambda: S.semantic_dedup_ivf(
                emb,
                threshold=SDA_THRESHOLD,
                target_occ=SDI_TARGET_OCC,
                n_probe=SDI_N_PROBE,
                max_cells=SDI_MAX_CELLS,
                min_cells=SDI_MIN_CELLS,
            ),
        ),
        # round 12: the Lloyd-fitted probe-16 config — the measured-best
        # tier (0.95 at the dup-dense sf1 probe) now audits alongside the
        # occupancy-law default it improves on
        (
            "semdedup_ivf_refit",
            lambda: S.semantic_dedup_ivf_refit(
                emb,
                threshold=SDA_THRESHOLD,
                target_occ=SDI_TARGET_OCC,
                n_probe=SDR_N_PROBE,
                max_cells=SDI_MAX_CELLS,
                min_cells=SDI_MIN_CELLS,
            ),
        ),
    ]
    # The four tiers are INDEPENDENT jobs whose tiny stages leave most
    # cores idle — evaluate their drop sets from a small thread pool so
    # the next tier's tasks back-fill the current tier's stragglers
    # (guide §2.6 "overlap independent jobs"); each drop set is the same
    # eager localCheckpoint as before, just submitted concurrently, and
    # the output union keeps the deterministic tier order. submit()-per-
    # tier so a failure names its tier (ADVICE r16).
    def _drop_set(fn):
        # checkpoint: the drop set (≤ N ids) feeds n_ann AND n_hits —
        # without truncation the whole dedup tier runs twice
        kept = fn().select("vec_id")
        return all_ids.join(kept, "vec_id", "left_anti").localCheckpoint()

    drops = _run_tiers_concurrently(
        [(t[0], (lambda fn=t[1]: _drop_set(fn))) for t in dedup_tiers]
    )

    out = None
    for (name, _fn), drop in zip(dedup_tiers, drops):
        row = (
            drop.agg(F.count(F.lit(1)).alias("n_ann"))
            .crossJoin(
                drop.join(exact_drop, "vec_id").agg(
                    F.count(F.lit(1)).alias("n_hits")
                )
            )
            .crossJoin(exact_drop.agg(F.count(F.lit(1)).alias("n_exact")))
            .select(
                F.lit(name).alias("tier"),
                F.lit("drop_set").alias("baseline"),
                "n_ann",
                "n_exact",
                "n_hits",
                F.round(F.col("n_hits") / F.col("n_exact"), 6).alias(
                    "recall_at_k"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _ann_recall_tier_sql(tier: str, baseline: str, cte: str, exact: str) -> str:
    return f"""
SELECT '{tier}' AS tier, '{baseline}' AS baseline,
       (SELECT count(*) FROM {cte}) AS n_ann,
       (SELECT count(*) FROM {exact}) AS n_exact,
       (SELECT count(*) FROM {cte} t
        JOIN {exact} x USING (query_id, neighbor_id)) AS n_hits,
       round((SELECT count(*) FROM {cte} t
              JOIN {exact} x USING (query_id, neighbor_id))
             / (SELECT count(*) FROM {exact}), 6) AS recall_at_k"""


_EXACT_L2_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < {N_QUERY_VECS}),
scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(q.qv) + 1),
               i -> (CAST(q.qv[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE))
                  * (CAST(q.qv[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE))))
           AS d
    FROM q JOIN embeddings e ON e.vec_id != q.query_id
)
SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY d ASC, neighbor_id ASC) AS rank
    FROM scored
) WHERE rank <= 5
"""


def _srp_banded_topk_sql(
    k: int = 5, n_planes: int = 8, n_bands: int = 2, dim: int = 64
) -> str:
    rows = n_planes // n_bands
    planes = S._hyperplanes(dim, n_planes)
    vals = ",\n    ".join(
        f"({i // rows}, {1 << (i % rows)}, "
        f"[{', '.join(repr(w) for w in plane)}]::DOUBLE[])"
        for i, plane in enumerate(planes)
    )
    dot_plane = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        "j -> CAST(e.embedding[j] AS DOUBLE) * p.plane[j]))"
    )
    return f"""
WITH planes(band_idx, w, plane) AS (VALUES
    {vals}),
sigs AS (
    SELECT e.vec_id, p.band_idx,
           SUM(CASE WHEN {dot_plane} > 0 THEN CAST(p.w AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END) AS bucket
    FROM embeddings e CROSS JOIN planes p
    WHERE sqrt({_dot_sql('e.embedding', 'e.embedding')}) != 0
    GROUP BY e.vec_id, p.band_idx
),
cand AS (
    SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS neighbor_id
    FROM sigs qs JOIN sigs cs
      ON qs.band_idx = cs.band_idx AND qs.bucket = cs.bucket
     AND qs.vec_id != cs.vec_id
    WHERE qs.vec_id < {N_QUERY_VECS}
),
scored AS (
    SELECT c.query_id, c.neighbor_id,
           {_cosine_sql('q.embedding', 'e.embedding')} AS cosine_sim
    FROM cand c
    JOIN embeddings q ON q.vec_id = c.query_id
    JOIN embeddings e ON e.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_sim DESC, neighbor_id ASC)
              AS rank
    FROM scored
) WHERE rank <= {k}
"""


def _dedup_recall_tier_sql(tier: str, drop_cte: str, exact: str) -> str:
    return f"""
SELECT '{tier}' AS tier, 'drop_set' AS baseline,
       (SELECT count(*) FROM {drop_cte}) AS n_ann,
       (SELECT count(*) FROM {exact}) AS n_exact,
       (SELECT count(*) FROM {drop_cte} t
        JOIN {exact} x USING (vec_id)) AS n_hits,
       round((SELECT count(*) FROM {drop_cte} t
              JOIN {exact} x USING (vec_id))
             / (SELECT count(*) FROM {exact}), 6) AS recall_at_k"""


def _assemble_semantic_dedup_recall_sql(
    dedup_kept_sqls: "dict[str, str]",
    threshold: float = 0.45,
) -> str:
    """Build the dedup drop-set recall SQL (VERDICT r09 item 2).
    ``dedup_kept_sqls`` maps tier name → the tier's full kept-vec_id
    SELECT (each already a standalone WITH...SELECT, legal as a nested
    CTE body — ann_recall_report's base tiers prove the pattern); an
    exact all-pairs drop-set CTE plus one drop-recall row per tier."""
    nrm_a = f"sqrt({_dot_sql('a.embedding', 'a.embedding')})"
    nrm_b = f"sqrt({_dot_sql('b.embedding', 'b.embedding')})"
    ctes = [
        f"""exact_drop AS (
    SELECT DISTINCT b.vec_id
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {nrm_a} != 0 AND {nrm_b} != 0
      AND {_cosine_sql('a.embedding', 'b.embedding')} >= {threshold!r}
)"""
    ]
    rows = []
    for tier, kept_sql in dedup_kept_sqls.items():
        ctes.append(f"{tier}_kept AS ({kept_sql})")
        ctes.append(
            f"{tier}_drop AS (SELECT vec_id FROM embeddings "
            f"EXCEPT SELECT vec_id FROM {tier}_kept)"
        )
        rows.append(
            _dedup_recall_tier_sql(tier, f"{tier}_drop", "exact_drop")
        )
    return "WITH " + ",\n".join(ctes) + "\nUNION ALL\n".join(rows)


ANN_RECALL_REPORT_SQL = _bound_audit_corpus(f"""
WITH exact_cos AS ({COSINE_TOPK_SQL}),
exact_l2 AS ({_EXACT_L2_TOPK_SQL}),
ivf AS ({IVF_PROBE_SQL}),
pq AS ({PQ_ADC_TOPK_SQL}),
banded AS ({_srp_banded_topk_sql()}),
lsh AS ({LSH_TOPK_SQL})
{_ann_recall_tier_sql('ivf', 'cosine', 'ivf', 'exact_cos')}
UNION ALL
{_ann_recall_tier_sql('pq_adc', 'l2', 'pq', 'exact_l2')}
UNION ALL
{_ann_recall_tier_sql('srp_banded', 'cosine', 'banded', 'exact_cos')}
UNION ALL
{_ann_recall_tier_sql('srp_lsh', 'cosine', 'lsh', 'exact_cos')}
""")

# registered in the QUERIES literal below (defined after this point);
# semantic_dedup_recall's SQL is assembled at the bottom of the module
# once the SEMANTIC_DEDUP_*_SQL constants exist (module order)


def q_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring machinery (operators.classifier) with a
    FIXED hash-derived weight vector — FULL value oracle: features are
    engine-exact arithmetic over the quality_stats columns, the logit is a
    fixed-order linear expression both engines evaluate identically, and
    the keep decision is the sigmoid-0.5 boundary expressed on the logit
    (no exp() in either engine). Value-checks the exact scoring pass the
    rows-only MLlib fit (quality_classifier) feeds."""
    from ..operators import classifier as C

    feats = C.quality_features(_docs(spark, sf_dir))
    w = S._lcg_vectors(1, C.N_FEATURES, seed=13)[0]
    return C.linear_scores(feats, w, bias=-0.5)


def _classifier_scores_sql() -> str:
    from ..operators import classifier as C

    w = S._lcg_vectors(1, C.N_FEATURES, seed=13)[0]
    logit = (
        f"round(-0.5 + {w[0]!r} * (CAST(len(toks) AS DOUBLE) / 100.0) "
        f"+ {w[1]!r} * mean_token_len "
        f"+ {w[2]!r} * stopword_ratio "
        f"+ {w[3]!r} * (CAST(n_chars AS DOUBLE) / 1000.0), 6)"
    )
    return f"""
WITH t AS (
    SELECT doc_id, n_chars,
           string_split(text, ' ') AS toks,
           len(list_filter(string_split(text, ' '), x -> x IN ({_SW}))) AS sw
    FROM documents
    WHERE text IS NOT NULL AND n_chars IS NOT NULL
),
f AS (
    SELECT doc_id, toks, n_chars,
           round(list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE)))
                 / len(toks), 6) AS mean_token_len,
           round(CAST(sw AS DOUBLE) / len(toks), 6) AS stopword_ratio
    FROM t
)
SELECT doc_id, {logit} AS logit, {logit} > 0 AS keep
FROM f
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality classifier (the DCLM shape): MLlib
    LogisticRegression fit on the rule-gate weak labels, coefficients
    pulled once and applied as a codegen'd linear projection. Rows-only
    (L-BFGS fit is iterative, like ALS); separation/determinism invariants
    in tests/test_classifier.py."""
    from ..operators import classifier as C

    return C.score_with_model(_docs(spark, sf_dir))


def q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization digest (operators.similarity.
    quantize_embeddings — the 4× storage-compression path for a 100 TB
    embedding corpus) — FULL value oracle: per-vector scale, exact integer
    checksum of the quantized codes, and the max reconstruction error
    (≤ scale/2 by construction; also asserted in the oracle via the
    output). The driver canonicalizer cannot hash arrays, so the
    registered shape digests qvec to (q_sum, q_min, q_max)."""
    emb = _emb(spark, sf_dir)
    q = S.quantize_embeddings(emb)
    err = F.aggregate(
        F.zip_with(
            "orig",
            "qvec",
            lambda x, qi: F.abs(x - qi.cast("double") * F.col("scale")),
        ),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )
    # two-stage select: aliasing the ROUNDED scale as "scale" in the same
    # projection would make F.col("scale") inside the err fold resolve to
    # the lateral alias (Spark lateral column references), silently
    # computing the error against the 6-dp scale — caught by the oracle
    digested = q.select(
        "id",
        "scale",
        F.aggregate(
            "qvec", F.lit(0).cast("long"), lambda acc, qi: acc + qi
        ).alias("q_sum"),
        F.array_min("qvec").alias("q_min"),
        F.array_max("qvec").alias("q_max"),
        err.alias("_err"),
    )
    return digested.select(
        F.col("id").alias("vec_id"),
        F.round("scale", 6).alias("scale"),
        "q_sum",
        "q_min",
        "q_max",
        F.round("_err", 6).alias("max_abs_err"),
    )


EMBEDDING_QUANTIZATION_SQL = """
WITH v AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
    FROM embeddings
),
m AS (
    SELECT vec_id, dv,
           list_aggregate(list_transform(dv, x -> abs(x)), 'max') AS maxabs
    FROM v
),
q AS (
    SELECT vec_id, dv,
           CASE WHEN maxabs = 0 THEN 0.0 ELSE maxabs / 127.0 END AS scale,
           CASE WHEN maxabs = 0
                THEN list_transform(dv, x -> CAST(0 AS BIGINT))
                ELSE list_transform(
                     dv, x -> CAST(round(x * 127.0 / maxabs) AS BIGINT))
           END AS qvec
    FROM m
)
SELECT vec_id,
       round(scale, 6) AS scale,
       CAST(list_sum(qvec) AS BIGINT) AS q_sum,
       CAST(list_min(qvec) AS BIGINT) AS q_min,
       CAST(list_max(qvec) AS BIGINT) AS q_max,
       round(list_aggregate(
           list_transform(range(1, len(dv) + 1),
                          i -> abs(dv[i] - CAST(qvec[i] AS DOUBLE) * scale)),
           'max'), 6) AS max_abs_err
FROM q
"""


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data cleaning gate: keep documents passing all three
    quality heuristics, attach predicted language — the filter a corpus
    pipeline applies before tokenization/dedup."""
    # per PHYSICAL ROW (round 15): doc_id joins multiplied duplicated-id
    # rows 2x2-fold and dropped NULL-id rows; the quality gate is an
    # inline expression and the language argmax keys on a surrogate row
    # id, exactly like the oracle's row_number()-based twin
    from ..operators.text import LANG_MARKERS, stopword_count, tokens

    docs = _docs(spark, sf_dir).withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    toks = tokens("text")
    score = (
        F.when(F.size(toks) >= 10, 1).otherwise(0)
        + F.when(F.col("n_chars") >= 50, 1).otherwise(0)
        + F.when(stopword_count("text") > 0, 1).otherwise(0)
    )
    markers = spark.createDataFrame(
        [(lg, m) for lg, ms in LANG_MARKERS.items() for m in ms],
        ["pred_lang", "marker"],
    )
    hits = (
        docs.select("_rid", F.explode(toks).alias("tok"))
        .join(F.broadcast(markers), F.col("tok") == F.col("marker"))
        .groupBy("_rid", "pred_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = Window.partitionBy("_rid").orderBy(
        F.col("hits").desc(), F.col("pred_lang").asc()
    )
    best = (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_rid", "pred_lang")
    )
    return (
        docs.filter(score == 3)
        .join(best, "_rid", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            "n_chars",
        )
    )


CLEAN_CORPUS_SQL = f"""
WITH d AS (
    -- per PHYSICAL ROW (round 15, mirrors the Spark surrogate row id):
    -- doc_id joins multiplied duplicated ids and dropped NULL ids
    SELECT doc_id, lang, n_chars, text,
           string_split(text, ' ') AS toks,
           row_number() OVER () AS rid
    FROM documents
),
q AS (
    SELECT rid FROM d
    WHERE len(toks) >= 10 AND n_chars >= 50
      AND len(list_filter(toks, x -> x IN ({_SW}))) > 0
),
markers(pred_lang, marker) AS (VALUES {_MARKER_VALUES}),
hits AS (
    SELECT t.rid, m.pred_lang, count(*) AS hits
    FROM (SELECT rid, unnest(toks) AS tok FROM d) t
    JOIN markers m ON t.tok = m.marker
    GROUP BY t.rid, m.pred_lang
),
best AS (
    SELECT rid, pred_lang FROM (
        SELECT rid, pred_lang,
               row_number() OVER (PARTITION BY rid
                                  ORDER BY hits DESC, pred_lang ASC) AS rn
        FROM hits
    ) WHERE rn = 1
)
SELECT d.doc_id, d.lang, coalesce(b.pred_lang, 'und') AS pred_lang, d.n_chars
FROM d
JOIN q ON d.rid = q.rid
LEFT JOIN best b ON d.rid = b.rid
"""


# Round-4 testdata regenerated the embeddings table: the new vectors'
# max pairwise cosine is ~0.51 (was >0.9), so the old 0.9 cutoff matched
# nothing and the query silently degenerated to empty-equals-empty. 0.45
# separates the ~14 most-similar pairs at sf0.01 — a discriminating test.
EMB_DUP_THRESHOLD = 0.45


def q_embedding_near_dups_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs (cosine ≥ EMB_DUP_THRESHOLD) — the
    oracle-checked baseline for the LSH variant. Threshold low enough to
    yield rows on random synthetic embeddings."""
    emb = _pin_emb(_emb(spark, sf_dir))
    v = emb.select(
        "vec_id", "embedding", S._norm(F.col("embedding")).alias("nrm")
    )
    # Spread the streamed side of the nested-loop self-join: a small
    # single-file corpus otherwise scores all O(N²) pairs on one core.
    a = v.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = v.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.round(
                S._dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= EMB_DUP_THRESHOLD)
    )


EMBEDDING_NEAR_DUPS_SQL = f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {_cosine_sql('a.embedding', 'b.embedding')} AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= {EMB_DUP_THRESHOLD}
"""


# SRP-bucketed tier: ~0.03% of vector pairs share an 8-plane bucket on the
# synthetic corpus, so the threshold can sit lower than the exact tier's
# and still be discriminating (~13 pairs at sf0.01; measured, round 5).
EMB_LSH_THRESHOLD = 0.30
EMB_LSH_PLANES = 8


def q_embedding_near_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALE tier of ``embedding_near_dups``: SRP-bucket candidate
    equi-join + exact cosine verify (operators.similarity.embedding_near_dups)
    — the O(N²/buckets) plan that survives 100×, vs the exact tier's
    broadcast-nested-loop baseline. FULL value oracle: the seeded
    hyperplanes are plan constants DuckDB reproduces bit-for-bit (same
    recipe as lsh_topk), so bucket assignment AND the verified pair set
    are engine-exact."""
    emb = _pin_emb(_emb(spark, sf_dir))
    return S.embedding_near_dups(
        emb, threshold=EMB_LSH_THRESHOLD, n_planes=EMB_LSH_PLANES
    )


def _embedding_near_dups_lsh_sql(
    threshold: float = EMB_LSH_THRESHOLD,
    n_planes: int = EMB_LSH_PLANES,
    dim: int = 64,
) -> str:
    """Mirror of operators.similarity.embedding_near_dups: SRP bucket =
    packed sign bits (strict > 0, weight 2^i), candidates = bucket
    self-equi-join with a_id < b_id, exact cosine (round 6 dp) filter."""
    planes = S._hyperplanes(dim, n_planes)
    vals = ",\n    ".join(
        f"({1 << i}, [{', '.join(repr(w) for w in plane)}]::DOUBLE[])"
        for i, plane in enumerate(planes)
    )
    dot_plane = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        "j -> CAST(e.embedding[j] AS DOUBLE) * p.plane[j]))"
    )
    return f"""
WITH planes(w, plane) AS (VALUES
    {vals}),
sigs AS (
    SELECT e.vec_id,
           SUM(CASE WHEN {dot_plane} > 0 THEN CAST(p.w AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END) AS bucket
    FROM embeddings e CROSS JOIN planes p
    GROUP BY e.vec_id
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {_cosine_sql('a.embedding', 'b.embedding')} AS cosine_sim
FROM embeddings a JOIN sigs sa ON sa.vec_id = a.vec_id
JOIN sigs sb ON sa.bucket = sb.bucket
JOIN embeddings b ON b.vec_id = sb.vec_id AND a.vec_id < b.vec_id
WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= {threshold}
"""


EMBEDDING_NEAR_DUPS_LSH_SQL = _embedding_near_dups_lsh_sql()


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-5 TF-IDF terms — fully value-checked (exact counts, ln
    rounded to 6 dp before ranking in both engines)."""
    return T.tf_idf_top_terms(_docs(spark, sf_dir), top_k=5)


TFIDF_TOP_TERMS_SQL = """
WITH toks AS (
    SELECT doc_id, t AS term
    FROM documents, unnest(string_split(text, ' ')) AS u(t)
    WHERE t <> ''
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
df AS (
    SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, tfidf, rank FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
    ) AS rank
    FROM scored
) WHERE rank <= 5
"""


# --- multimodal -------------------------------------------------------------


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (deterministic
    fake decoder — see operators.multimodal).

    Driver-gate shape: the feature vector's values are integral doubles
    (byte-stat fake decoder), so the registered query casts them to longs
    and joins to a CSV string the harness can hash; since the corpus is
    pure ASCII the oracle recomputes the same byte stats in DuckDB —
    a full value check on the mapInPandas path."""
    assets = M.synthesize_assets(_docs(spark, sf_dir))
    feats = M.extract_features(assets, fake_decode=True)
    return feats.select(
        "asset_id",
        "modality",
        "n_bytes",
        F.concat_ws(
            ",", F.transform("features", lambda x: x.cast("long").cast("string"))
        ).alias("features"),
    )


# The fake decoder emits [len, sum(bytes) % 997, max(byte), min(byte)] over
# the utf-8 payload; text is pure ASCII in the test corpus (verified:
# strlen == length for all rows at sf0.01/sf0.1), so ord-per-char == byte.
MULTIMODAL_FEATURES_SQL = """
WITH b AS (
    SELECT doc_id,
           strlen(text) AS n,
           list_transform(range(1, strlen(text) + 1),
                          i -> ord(substr(text, i, 1))) AS bytes
    FROM documents
    WHERE doc_id IS NOT NULL AND strlen(text) = length(text)
)
SELECT doc_id AS asset_id,
       (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
       CAST(n AS BIGINT) AS n_bytes,
       CASE WHEN n = 0 THEN '0,0,0,0'
            ELSE concat_ws(',',
                 CAST(n AS BIGINT),
                 CAST(list_sum(bytes) % 997 AS BIGINT),
                 CAST(list_max(bytes) AS BIGINT),
                 CAST(list_min(bytes) AS BIGINT))
       END AS features
FROM b
"""


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas resize stage (deterministic stub decoder): full value
    check including the base64 of the resized payload — the corpus is pure
    ASCII, so DuckDB reproduces the byte truncation with substr/encode."""
    assets = M.synthesize_assets(_docs(spark, sf_dir))
    return M.resize_images(assets, target=(64, 64), fake_decode=True)


IMAGE_RESIZE_SQL = """
SELECT doc_id AS asset_id,
       CAST(64 AS BIGINT) AS width,
       CAST(64 AS BIGINT) AS height,
       CAST(least(strlen(text), 4096) AS BIGINT) AS n_bytes_out,
       to_base64(encode(substr(text, 1, 4096))) AS payload,
       CAST(CASE WHEN strlen(text) = 0 THEN 0
                 ELSE list_sum(list_transform(
                          range(1, least(strlen(text), 4096) + 1),
                          i -> ord(substr(text, i, 1)))) % 997
            END AS BIGINT) AS checksum
FROM documents
WHERE doc_id % 3 = 0 AND strlen(text) = length(text)
"""


def q_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frame_bytes=128 matches q_frame_extraction's fake tier, so the
    registered plan and the registered extraction share the exact
    frame-count arithmetic (and the ~300-550-char corpus yields a real
    multi-frame fan-out at every SF)."""
    assets = M.synthesize_assets(_docs(spark, sf_dir))
    return M.frame_sample_plan(assets, every_n=10, frame_bytes=128)


FRAME_SAMPLE_SQL = """
SELECT doc_id AS asset_id,
       unnest(generate_series(0, strlen(text) // 128 - 1, 10))
           AS frame_idx
FROM documents
WHERE doc_id % 3 = 2 AND strlen(text) = length(text)
  AND strlen(text) // 128 > 0
"""


def q_frame_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling WITH decode (mapInPandas over video payloads) —
    deterministic fake tier for the oracle (128-byte pseudo-frames, every
    frame, byte-sum checksums; the ASCII corpus makes DuckDB reproduce the
    slices exactly — the frame size is sized to the corpus' ~300-550-char
    docs so every SF yields a multi-frame fan-out); the REAL tier decodes
    uncompressed AVI and is exercised on hand-assembled fixtures in
    tests/test_multimodal_real.py."""
    assets = M.synthesize_assets(_docs(spark, sf_dir))
    return M.extract_frames(
        assets, every_n=1, decode="fake", fake_frame_bytes=128
    )


FRAME_EXTRACTION_SQL = """
WITH v AS (
    SELECT doc_id AS asset_id, text, strlen(text) // 128 AS n_frames
    FROM documents
    WHERE doc_id % 3 = 2 AND strlen(text) = length(text)
),
idx AS (
    SELECT asset_id, text,
           unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 1))
               AS frame_idx
    FROM v WHERE n_frames > 0
)
SELECT asset_id, frame_idx,
       CAST(128 AS BIGINT) AS width,
       CAST(1 AS BIGINT) AS height,
       CAST(list_sum(list_transform(
                range(1, 129),
                i -> ord(substr(text, CAST(128 * frame_idx AS INT) + i, 1))))
            % 997 AS BIGINT) AS checksum
FROM idx
"""


# --- round-4 additions: retrieval, PII, packing, chunking, histogram --------


BM25_QUERIES = [
    (0, "dup spark"),
    (1, "vector join data"),
    (2, "slow scan table"),
]
_BM25_K1, _BM25_B, _BM25_TOPK = 1.2, 0.75, 10


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 batch retrieval (inverted-index join; operators.retrieval)
    — per-term contributions quantized to the 2^-38 grid (pagerank's
    order-independent-sum construction) so the DuckDB oracle matches
    bit-for-bit."""
    from ..operators.retrieval import bm25_topk

    queries = spark.createDataFrame(BM25_QUERIES, ["query_id", "query_text"])
    return bm25_topk(
        _docs(spark, sf_dir),
        queries,
        k1=_BM25_K1,
        b=_BM25_B,
        top_k=_BM25_TOPK,
    ).select("query_id", "doc_id", "score", "rank")


_BM25_VALUES = ", ".join(f"({i}, '{t}')" for i, t in BM25_QUERIES)
BM25_TOPK_SQL = f"""
WITH q0(query_id, query_text) AS (VALUES {_BM25_VALUES}),
q AS (SELECT CAST(query_id AS BIGINT) AS query_id, query_text FROM q0),
qt AS (
    SELECT DISTINCT query_id, t.term
    FROM q, unnest(string_split(query_text, ' ')) AS t(term)
    WHERE t.term != ''
),
post AS (
    SELECT doc_id, tok AS term, count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents)
    WHERE tok != ''
    GROUP BY doc_id, tok
),
dl AS (SELECT doc_id,
              len(list_filter(string_split(text, ' '), x -> x != '')) AS dl
       FROM documents),
stats AS (
    SELECT count(*) AS n_docs,
           sum(len(list_filter(string_split(text, ' '), x -> x != '')))
               AS total_dl
    FROM documents
),
qpost AS (
    SELECT p.* FROM post p WHERE p.term IN (SELECT term FROM qt)
),
df AS (SELECT term, count(*) AS df FROM qpost GROUP BY term),
scored AS (
    SELECT qt.query_id, p.doc_id,
           floor(
               ln(1.0 + ((s.n_docs - df.df) + 0.5) / (df.df + 0.5))
               * ((p.tf * {_BM25_K1 + 1.0!r})
                  / (p.tf + {_BM25_K1!r}
                     * ({1.0 - _BM25_B!r}
                        + ({_BM25_B!r} * dl.dl)
                          / (CAST(s.total_dl AS DOUBLE) / s.n_docs))))
               * 274877906944.0 + 0.5) / 274877906944.0 AS contrib
    FROM qt
    JOIN qpost p ON qt.term = p.term
    JOIN dl ON p.doc_id = dl.doc_id
    JOIN df ON p.term = df.term
    CROSS JOIN stats s
),
agg AS (
    SELECT query_id, doc_id, round(sum(contrib), 6) AS score
    FROM scored GROUP BY query_id, doc_id
),
r AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM agg
)
SELECT query_id, doc_id, score, rank FROM r WHERE rank <= {_BM25_TOPK}
"""


# --- hybrid sparse+dense retrieval with RRF fusion (round 9) ---------------

RRF_K = 60          # the standard reciprocal-rank-fusion constant
RRF_LIST_K = 10     # per-list candidate depth
RRF_TOP_K = 5       # fused results per query


def q_hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, the shape a RAG/data-curation pipeline actually
    ships: the SAME query set ranked two ways — sparse Okapi BM25 over
    the document text (query = the query doc's own text, the
    more-like-this form) and dense cosine over the aligned embedding
    table (doc_id ≡ vec_id, verified 1:1 at every SF) — fused with
    reciprocal rank fusion, score = Σ 1/(RRF_K + rank) (Cormack et al.
    SIGIR'09). Self-matches are excluded at fusion (both engines
    identically); each list keeps its own internal ranking contract.

    FULL value oracle: BM25 contributions ride the 2^-38 grid, cosine is
    6-dp, RRF adds two IEEE divisions of integer ranks in fixed
    expression order. Scale shape: both retrievers are the registered
    sublinear forms (query-term semi-joined postings; broadcast query
    vectors); fusion is a (query, doc)-keyed full-outer join of two
    ≤|Q|·k relations — metadata-sized."""
    from ..operators.retrieval import bm25_topk

    docs = _docs(spark, sf_dir)
    emb = _pin_emb(_emb(spark, sf_dir))
    queries = docs.filter(F.col("doc_id") < N_QUERY_VECS).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    sparse = bm25_topk(
        docs, queries, k1=_BM25_K1, b=_BM25_B, top_k=RRF_LIST_K
    ).select(
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        F.col("rank").cast("long").alias("sparse_rank"),
    )
    dense = S.cosine_topk(
        emb.filter(F.col("vec_id") < N_QUERY_VECS), emb, k=RRF_LIST_K
    ).select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("dense_rank"),
    )
    fused = (
        sparse.join(dense, ["query_id", "neighbor_id"], "full_outer")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "sparse_rank",
            "dense_rank",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("sparse_rank")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")),
                    F.lit(0.0),
                )
            ).alias("rrf_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= RRF_TOP_K)
    )


def _hybrid_retrieval_rrf_sql() -> str:
    """Composes the two EXISTING oracle bodies: BM25 with q0 swapped to
    the doc-as-query set and top_k widened, cosine top-k widened — the
    swaps are asserted so a future edit to either base SQL cannot
    silently desynchronize this mirror."""
    q0_old = f"WITH q0(query_id, query_text) AS (VALUES {_BM25_VALUES}),"
    q0_new = (
        "WITH q0 AS (SELECT doc_id AS query_id, text AS query_text "
        f"FROM documents WHERE doc_id < {N_QUERY_VECS}),"
    )
    assert BM25_TOPK_SQL.count(q0_old) == 1
    sparse_sql = BM25_TOPK_SQL.replace(q0_old, q0_new)
    lim_old = f"WHERE rank <= {_BM25_TOPK}"
    assert sparse_sql.count(lim_old) == 1
    sparse_sql = sparse_sql.replace(lim_old, f"WHERE rank <= {RRF_LIST_K}")
    assert COSINE_TOPK_SQL.count("WHERE rank <= 5") == 1
    dense_sql = COSINE_TOPK_SQL.replace(
        "WHERE rank <= 5", f"WHERE rank <= {RRF_LIST_K}"
    )
    return f"""
WITH sparse0 AS ({sparse_sql}),
dense0 AS ({dense_sql}),
fused AS (
    SELECT coalesce(s.query_id, d.query_id) AS query_id,
           coalesce(s.doc_id, d.neighbor_id) AS neighbor_id,
           CAST(s.rank AS BIGINT) AS sparse_rank,
           CAST(d.rank AS BIGINT) AS dense_rank,
           coalesce(1.0 / ({RRF_K} + s.rank), 0.0)
               + coalesce(1.0 / ({RRF_K} + d.rank), 0.0) AS rrf_score
    FROM sparse0 s FULL OUTER JOIN dense0 d
      ON s.query_id = d.query_id AND s.doc_id = d.neighbor_id
)
SELECT query_id, neighbor_id, sparse_rank, dense_rank, rrf_score, rank
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rrf_score DESC, neighbor_id ASC)
              AS rank
    FROM fused WHERE neighbor_id != query_id
)
WHERE rank <= {RRF_TOP_K}
"""


HYBRID_RETRIEVAL_RRF_SQL = _hybrid_retrieval_rrf_sql()


def _inject_pii(docs: DataFrame) -> DataFrame:
    """Deterministically plant PII into a slice of the corpus (the test
    corpus is word-soup with no real PII): doc_id%7 selects an email, an
    IPv4, or a phone injection. The REGISTERED query plants + redacts so
    the redaction path is exercised on text where something matches; the
    operator itself stays pure."""
    did = F.col("doc_id")
    suffix = (
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com please"),
            ),
        )
        .when(
            did % 7 == 1,
            F.concat(
                F.lit(" server 10.0."),
                (did % 256).cast("string"),
                F.lit(".1 up"),
            ),
        )
        .when(
            did % 7 == 2,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
                F.lit(" now"),
            ),
        )
        .otherwise(F.lit(""))
    )
    return docs.select("doc_id", F.concat("text", suffix).alias("text"))


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction gate over a deterministically PII-planted corpus —
    counts per category plus the md5 of the redacted text (full value
    check of the actual replacement output)."""
    red = T.redact_pii(_inject_pii(_docs(spark, sf_dir)))
    return red.select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_phone",
        F.md5("redacted").alias("redacted_md5"),
    )


_PII_INJECT_SQL = """
    SELECT doc_id,
           text || CASE
               WHEN doc_id % 7 = 0 THEN ' contact user'
                   || CAST(doc_id AS VARCHAR) || '@example.com please'
               WHEN doc_id % 7 = 1 THEN ' server 10.0.'
                   || CAST(doc_id % 256 AS VARCHAR) || '.1 up'
               WHEN doc_id % 7 = 2 THEN ' call 555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
               ELSE '' END AS text
    FROM documents
"""
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{4}\b"
PII_REDACTION_SQL = f"""
WITH inj AS ({_PII_INJECT_SQL}),
red AS (
    SELECT doc_id,
           len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
           len(regexp_extract_all(text, '{_PII_IPV4}')) AS n_ipv4,
           len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_IPV4}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
    FROM inj
)
SELECT doc_id, n_email, n_ipv4, n_phone, md5(redacted) AS redacted_md5
FROM red
"""


PACK_TARGET_TOKENS = 512


def q_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing plan (per-source prefix sums; operators.text
    pack_documents) — exact integer logic, full value oracle."""
    return T.pack_documents(
        _docs(spark, sf_dir), target_tokens=PACK_TARGET_TOKENS
    )


CONTEXT_PACKING_SQL = f"""
WITH t AS (
    SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, source, n_tokens,
           sum(n_tokens) OVER (PARTITION BY source
                               ORDER BY doc_id NULLS FIRST,
                                        n_tokens
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum
    FROM t
)
SELECT doc_id, source, n_tokens,
       CAST((cum - n_tokens) // {PACK_TARGET_TOKENS} AS BIGINT) AS pack_id,
       CAST((cum - n_tokens) % {PACK_TARGET_TOKENS} AS BIGINT) AS pack_offset
FROM c
"""


CHUNK_CHARS = 128


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size character chunking (sequence+explode+substring codegen;
    operators.text chunk_documents) — full value oracle including the
    chunk text itself."""
    return T.chunk_documents(_docs(spark, sf_dir), chunk_chars=CHUNK_CHARS)


DOC_CHUNKS_SQL = f"""
WITH idx AS (
    SELECT doc_id, text,
           unnest(generate_series(
               0, greatest((length(text) - 1) // {CHUNK_CHARS}, 0)
           )) AS chunk_idx
    FROM documents
)
SELECT doc_id, chunk_idx,
       substr(text, CAST(chunk_idx * {CHUNK_CHARS} + 1 AS INT),
              {CHUNK_CHARS}) AS chunk_text,
       length(substr(text, CAST(chunk_idx * {CHUNK_CHARS} + 1 AS INT),
                     {CHUNK_CHARS})) AS n_chunk_chars
FROM idx
"""


HIST_BUCKET_CHARS = 100


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution (operators.text length_histogram) —
    pure partial aggregation, exact integers."""
    return T.length_histogram(
        _docs(spark, sf_dir), bucket_chars=HIST_BUCKET_CHARS
    )


LENGTH_HISTOGRAM_SQL = f"""
WITH t AS (
    -- floor division (not //, which truncates toward zero in DuckDB):
    -- histogram bins are floor-defined, and Spark's F.floor agrees on
    -- negative metadata values too (round 15)
    SELECT least(CAST(floor(n_chars / {HIST_BUCKET_CHARS}.0) AS BIGINT), 19)
               AS bucket,
           len(string_split(text, ' ')) AS nt
    FROM documents
)
SELECT bucket, bucket * {HIST_BUCKET_CHARS} AS lo_chars,
       count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS total_tokens
FROM t GROUP BY bucket
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embeddings table — KMeans is
    not SQL-expressible, so rows-only driver check; semantic invariants
    pinned in tests/test_llm_ops.py."""
    # threshold 0.45, not the paper's 0.99: the round-4 synthetic
    # embeddings' max pairwise cosine is ~0.51, so 0.99 would drop nothing
    # and the dedup would be a no-op on this corpus
    return S.semantic_dedup(
        _pin_emb(_emb(spark, sf_dir)),
        n_clusters=16,
        threshold=0.45,
    )


def q_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM cross-entropy per document (CCNet-style
    perplexity quality gate; operators.lm) — log args are exact integers,
    per-bigram surprise quantized to the 2^-38 grid before the exact sum,
    so the oracle matches bit-for-bit."""
    from ..operators.lm import bigram_lm_scores

    return bigram_lm_scores(_docs(spark, sf_dir))


_BIGRAM_LM_CTES = """t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
bg AS (
    SELECT doc_id,
           toks[CAST(i AS INT)] AS w1,
           toks[CAST(i AS INT) + 1] AS w2
    FROM t, unnest(range(1, len(toks))) AS u(i)
    WHERE toks[CAST(i AS INT)] != '' AND toks[CAST(i AS INT) + 1] != ''
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
vocab AS (
    SELECT count(DISTINCT tok) AS v
    FROM (SELECT unnest(toks) AS tok FROM t) WHERE tok != ''
),
doc_bg AS (
    SELECT doc_id, w1, w2, count(*) AS m FROM bg GROUP BY doc_id, w1, w2
),
scored AS (
    SELECT d.doc_id,
           sum(d.m) AS n_bigrams,
           sum(d.m * (floor((ln(c1.c1 + v.v) - ln(c2.c2 + 1))
                            * 274877906944.0 + 0.5) / 274877906944.0)) AS s
    FROM doc_bg d
    JOIN c2 ON d.w1 = c2.w1 AND d.w2 = c2.w2
    JOIN c1 ON d.w1 = c1.w1
    CROSS JOIN vocab v
    GROUP BY d.doc_id
),
lm_final AS (
    SELECT docs.doc_id,
           CAST(coalesce(scored.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           coalesce(round(scored.s / scored.n_bigrams, 6), 0.0)
               AS avg_surprise
    FROM (SELECT doc_id FROM documents) docs
    LEFT JOIN scored ON docs.doc_id = scored.doc_id
)"""

BIGRAM_LM_SQL = f"""
WITH {_BIGRAM_LM_CTES}
SELECT doc_id, n_bigrams, avg_surprise FROM lm_final
"""

# curation buckets: score-line thirds of the synthetic corpus (measured
# 3.26-3.61 nats), full rate for the most in-distribution bucket
RESAMPLE_EDGES = (3.37, 3.40)
RESAMPLE_RATES = (1.0, 0.5, 0.25)
RESAMPLE_SALT = "curate"


def q_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-score-driven curation (operators.text resample_by_score composed
    over operators.lm bigram_lm_scores): bucket each doc by its bigram-LM
    cross-entropy, keep buckets at different rates via the deterministic
    salted-hash acceptance — the FineWeb/DCLM quality-resampling shape,
    fully value-checkable."""
    from ..operators.lm import bigram_lm_scores

    scored = bigram_lm_scores(_docs(spark, sf_dir))
    return T.resample_by_score(
        scored,
        "avg_surprise",
        edges=list(RESAMPLE_EDGES),
        rates=list(RESAMPLE_RATES),
        salt=RESAMPLE_SALT,
    )


QUALITY_RESAMPLE_SQL = f"""
WITH {_BIGRAM_LM_CTES},
b AS (
    SELECT doc_id, n_bigrams, avg_surprise,
           CASE WHEN avg_surprise < {RESAMPLE_EDGES[0]!r} THEN 0
                WHEN avg_surprise < {RESAMPLE_EDGES[1]!r} THEN 1
                ELSE 2 END AS bucket
    FROM lm_final
)
SELECT doc_id, n_bigrams, avg_surprise, CAST(bucket AS BIGINT) AS bucket
FROM b
WHERE (CAST('0x' || substr(md5('{RESAMPLE_SALT}' || CAST(doc_id AS VARCHAR)),
            1, 8) AS BIGINT) % 1000000)
      < CASE bucket WHEN 0 THEN {int(round(RESAMPLE_RATES[0] * 1_000_000))}
                    WHEN 1 THEN {int(round(RESAMPLE_RATES[1] * 1_000_000))}
                    ELSE {int(round(RESAMPLE_RATES[2] * 1_000_000))} END
"""


BLOOM_M_BITS = 1 << 20
BLOOM_K = 3


def q_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-memory benchmark decontamination (operators.bloom): the eval
    slice's 8-gram set compressed to a 128 KiB Bloom bitmap, probed as a
    per-row codegen expression — no join on the corpus side. The DuckDB
    oracle reproduces the EXACT bit set (same md5 double-hash positions),
    so this value-checks the filter including any false positives."""
    from ..operators.bloom import bloom_decontaminate

    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 10 == 0)
    return bloom_decontaminate(
        train, eval_docs, n=DECON_N, m_bits=BLOOM_M_BITS, k=BLOOM_K
    )


BLOOM_DECONTAMINATION_SQL = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
grams AS (
    SELECT doc_id,
           array_to_string(
               toks[CAST(i AS INT):CAST(i AS INT) + {DECON_N - 1}], ' '
           ) AS ngram
    FROM t, unnest(range(1, len(toks) - {DECON_N} + 2)) AS u(i)
),
eval_h AS (
    SELECT DISTINCT
           CAST('0x' || substr(md5(ngram), 1, 8) AS BIGINT) AS h1,
           (CAST('0x' || substr(md5(ngram), 9, 8) AS BIGINT) | 1) AS h2
    FROM grams WHERE doc_id % 10 = 0
),
eval_pos AS (
    SELECT DISTINCT (h1 + i * h2) % {BLOOM_M_BITS} AS pos
    FROM eval_h, unnest(range(0, {BLOOM_K})) AS u(i)
),
train_h AS (
    SELECT DISTINCT doc_id, ngram,
           CAST('0x' || substr(md5(ngram), 1, 8) AS BIGINT) AS h1,
           (CAST('0x' || substr(md5(ngram), 9, 8) AS BIGINT) | 1) AS h2
    FROM grams WHERE doc_id % 10 != 0
),
probe AS (
    SELECT doc_id, ngram, i, (h1 + i * h2) % {BLOOM_M_BITS} AS pos
    FROM train_h, unnest(range(0, {BLOOM_K})) AS u(i)
),
hits AS (
    SELECT doc_id, ngram
    FROM probe JOIN eval_pos USING (pos)
    GROUP BY doc_id, ngram
    HAVING count(DISTINCT i) = {BLOOM_K}
)
SELECT doc_id, count(*) AS n_flagged FROM hits GROUP BY doc_id
"""


BOILER_CHUNK_CHARS = 128


def q_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level boilerplate stats (operators.dedup shared_chunk_stats):
    per-doc share of fixed-size chunks whose exact text appears in more
    than one distinct document — integer counts + one exact division,
    full value oracle."""
    return D.shared_chunk_stats(
        _docs(spark, sf_dir), chunk_chars=BOILER_CHUNK_CHARS, max_doc_freq=1
    )


BOILERPLATE_CHUNKS_SQL = f"""
WITH idx AS (
    SELECT doc_id, text,
           unnest(generate_series(
               0, greatest((length(text) - 1) // {BOILER_CHUNK_CHARS}, 0)
           )) AS chunk_idx
    FROM documents
),
chunks AS (
    SELECT doc_id,
           md5(substr(text, CAST(chunk_idx * {BOILER_CHUNK_CHARS} + 1 AS INT),
                      {BOILER_CHUNK_CHARS})) AS chunk_key
    FROM idx
),
dfreq AS (
    SELECT chunk_key, count(DISTINCT doc_id) AS doc_freq
    FROM chunks GROUP BY chunk_key
)
SELECT c.doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN d.doc_freq > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boilerplate,
       round(CAST(sum(CASE WHEN d.doc_freq > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS boilerplate_ratio
FROM chunks c JOIN dfreq d ON c.chunk_key = d.chunk_key
GROUP BY c.doc_id
"""


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DATASHEET — the single summary artifact a pipeline
    publishes with a released dataset (dataset-card / datasheet shape):
    sizes, per-language and per-source composition, exact-dup rate,
    quality-gate pass count, and length percentiles, as long-format
    (section, metric, value) rows. Every figure is exact integer/percentile
    arithmetic → full value oracle.

    Scale shape: each section is one partial-aggregated pass (the size and
    dup sections share a scan via the stats projection); output is a few
    dozen rows regardless of corpus size — the cheap-to-recompute summary
    you regenerate after every pipeline stage.
    """
    docs = _docs(spark, sf_dir)
    nt = F.size(T.tokens("text")).cast("long")
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        nt.alias("nt"),
        F.md5(T.normalized("text")).alias("fp"),
        F.sha2("text", 256).alias("ehash"),
    )

    sizes = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("nt").cast("double").alias("n_tokens"),
        F.sum("n_chars").cast("double").alias("n_chars_total"),
        F.round(F.avg("nt"), 6).alias("avg_doc_tokens"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90_chars"),
        # exact = byte-identical text (what exact_dedup_keys removes);
        # normalized = case/punct/space-folded fingerprint (a NEAR-dup
        # signal). Round-13 review: the card previously published the
        # normalized count AS the exact rate, overstating what the
        # exact-dedup stage would actually remove.
        (F.count(F.lit(1)) - F.count_distinct("ehash"))
        .cast("double")
        .alias("exact_dup_docs"),
        (F.count(F.lit(1)) - F.count_distinct("fp"))
        .cast("double")
        .alias("normalized_dup_docs"),
    ).selectExpr(
        """stack(8,
            'size','n_docs',n_docs,
            'size','n_tokens',n_tokens,
            'size','n_chars',n_chars_total,
            'size','avg_doc_tokens',avg_doc_tokens,
            'length','p50_chars',p50_chars,
            'length','p90_chars',p90_chars,
            'dedup','exact_dup_docs',exact_dup_docs,
            'dedup','normalized_dup_docs',normalized_dup_docs
        ) as (section, metric, value)"""
    )
    langs = base.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("value")
    ).select(F.lit("lang").alias("section"), F.col("lang").alias("metric"), "value")
    sources = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("value")
    ).select(
        F.lit("source").alias("section"), F.col("source").alias("metric"), "value"
    )
    quality = (
        T.quality_stats(docs)
        .agg(
            # coalesce: SUM over an empty corpus is NULL; the oracle's
            # count FILTER is 0 — the degenerate input must still match
            F.coalesce(
                F.sum((F.col("quality_score") == 3).cast("long")),
                F.lit(0),
            )
            .cast("double")
            .alias("value")
        )
        .select(
            F.lit("quality").alias("section"),
            F.lit("docs_passing_gate").alias("metric"),
            "value",
        )
    )
    return sizes.unionByName(langs).unionByName(sources).unionByName(quality)


DATASET_CARD_SQL = """
WITH base AS (
    SELECT doc_id, lang, source, n_chars,
           len(string_split(text, ' ')) AS nt,
           md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                              ' +', ' ', 'g')) AS fp,
           sha256(text) AS ehash
    FROM documents
),
quality AS (
    SELECT count(*) FILTER (
        WHERE (len(string_split(text, ' ')) >= 10)
          AND (n_chars >= 50)
          AND (len(list_filter(string_split(text, ' '),
                   x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x))) > 0)
    ) AS passing
    FROM documents
)
SELECT 'size' AS section, 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM base
UNION ALL
SELECT 'size', 'n_tokens', CAST(sum(nt) AS DOUBLE) FROM base
UNION ALL
SELECT 'size', 'n_chars', CAST(sum(n_chars) AS DOUBLE) FROM base
UNION ALL
SELECT 'size', 'avg_doc_tokens', round(avg(nt), 6) FROM base
UNION ALL
SELECT 'length', 'p50_chars', round(quantile_cont(n_chars, 0.5), 4) FROM base
UNION ALL
SELECT 'length', 'p90_chars', round(quantile_cont(n_chars, 0.9), 4) FROM base
UNION ALL
SELECT 'dedup', 'exact_dup_docs', CAST(count(*) - count(DISTINCT ehash) AS DOUBLE) FROM base
UNION ALL
SELECT 'dedup', 'normalized_dup_docs', CAST(count(*) - count(DISTINCT fp) AS DOUBLE) FROM base
UNION ALL
SELECT 'lang', lang, CAST(count(*) AS DOUBLE) FROM base GROUP BY lang
UNION ALL
SELECT 'source', source, CAST(count(*) AS DOUBLE) FROM base GROUP BY source
UNION ALL
SELECT 'quality', 'docs_passing_gate', CAST(passing AS DOUBLE) FROM quality
"""


SPAN_N = 8  # n-gram granularity of the exact-substring span pass


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup (operators.dedup repeated_spans): maximal
    token spans whose every 8-gram recurs in ≥2 distinct documents — the
    sub-document pass doc-level MinHash can't see. Pure integer logic →
    full value oracle."""
    spans = D.repeated_spans(_docs(spark, sf_dir), n=SPAN_N, min_doc_freq=2)
    return spans.select(
        "doc_id",
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("span_tokens").cast("bigint").alias("span_tokens"),
    )


REPEATED_SPANS_SQL = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
pos AS (
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
           md5(array_to_string(
               toks[CAST(i AS INT):CAST(i AS INT) + {SPAN_N - 1}], ' '
           )) AS gram_key
    FROM t, unnest(range(1, len(toks) - {SPAN_N} + 2)) AS u(i)
),
freq AS (
    SELECT gram_key FROM pos
    GROUP BY gram_key HAVING count(DISTINCT doc_id) >= 2
),
dup AS (
    SELECT doc_id, pos FROM pos JOIN freq USING (gram_key)
),
isl AS (
    SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS island
    FROM dup
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {SPAN_N - 1} AS span_end,
       max(pos) + {SPAN_N - 1} - min(pos) + 1 AS span_tokens
FROM isl GROUP BY doc_id, island
"""


SPLIT_PERCENTS = {"train": 80, "val": 10, "test": 10}


def q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-proportion per-language train/val/test split (operators.text
    stratified_split): quota-exact 80/10/10 within each lang via portable-
    hash ranking — integer logic, full value oracle."""
    out = T.stratified_split(_docs(spark, sf_dir), SPLIT_PERCENTS)
    return out.select("doc_id", "lang", "split")


STRATIFIED_SPLIT_SQL = """
WITH ranked AS (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8) AS BIGINT) NULLS FIRST,
                        doc_id NULLS FIRST
           ) AS r,
           count(*) OVER (PARTITION BY lang) AS n
    FROM documents
)
SELECT doc_id, lang,
       CASE WHEN r <= (n * 80 + 50) // 100 THEN 'train'
            WHEN r <= (n * 90 + 50) // 100 THEN 'val'
            ELSE 'test' END AS split
FROM ranked
"""


QUERIES: dict[str, tuple] = {
    "token_counts": (q_token_counts, TOKEN_COUNTS_SQL),
    "quality_stats": (q_quality_stats, QUALITY_STATS_SQL),
    "repetition_stats": (q_repetition_stats, REPETITION_STATS_SQL),
    "decontamination": (q_decontamination, DECONTAMINATION_SQL),
    "corpus_mixture": (q_corpus_mixture, CORPUS_MIXTURE_SQL),
    "language_id": (q_language_id, LANGUAGE_ID_SQL),
    "fingerprints": (q_fingerprints, FINGERPRINTS_SQL),
    "exact_dedup_keys": (q_exact_dedup_keys, EXACT_DEDUP_KEYS_SQL),
    "ngram_jaccard_pairs": (q_ngram_jaccard_pairs, NGRAM_JACCARD_SQL),
    "near_dup_clusters": (q_near_dup_clusters, NEAR_DUP_CLUSTERS_SQL),
    "near_dup_clusters_lsh": (q_near_dup_clusters_lsh, NEAR_DUP_CLUSTERS_LSH_SQL),
    "deduped_corpus": (q_deduped_corpus, DEDUPED_CORPUS_SQL),
    "deduped_corpus_aggressive": (
        q_deduped_corpus_aggressive,
        DEDUPED_CORPUS_AGGRESSIVE_SQL,
    ),
    "lsh_quality_report": (q_lsh_quality_report, LSH_QUALITY_REPORT_SQL),
    "ann_recall_report": (q_ann_recall_report, ANN_RECALL_REPORT_SQL),
    "minhash_near_dups": (q_minhash_near_dups, MINHASH_NEAR_DUPS_SQL),
    "near_dup_pipeline": (q_near_dup_pipeline, NEAR_DUP_PIPELINE_SQL),
    "simhash_near_dups": (q_simhash_near_dups, SIMHASH_NEAR_DUPS_SQL),
    "cosine_topk": (q_cosine_topk, COSINE_TOPK_SQL),
    "lsh_topk": (q_lsh_topk, LSH_TOPK_SQL),
    "ivf_topk": (q_ivf_topk, None),
    "pq_topk": (q_pq_topk, None),
    "pq_adc_topk": (q_pq_adc_topk, PQ_ADC_TOPK_SQL),
    "ivf_probe": (q_ivf_probe, IVF_PROBE_SQL),
    "classifier_scores": (q_classifier_scores, _classifier_scores_sql()),
    "quality_classifier": (q_quality_classifier, None),
    "embedding_quantization": (
        q_embedding_quantization,
        EMBEDDING_QUANTIZATION_SQL,
    ),
    "clean_corpus": (q_clean_corpus, CLEAN_CORPUS_SQL),
    "tfidf_top_terms": (q_tfidf_top_terms, TFIDF_TOP_TERMS_SQL),
    "embedding_near_dups": (q_embedding_near_dups_exact, EMBEDDING_NEAR_DUPS_SQL),
    "embedding_near_dups_lsh": (
        q_embedding_near_dups_lsh,
        EMBEDDING_NEAR_DUPS_LSH_SQL,
    ),
    "multimodal_features": (q_multimodal_features, MULTIMODAL_FEATURES_SQL),
    "image_resize": (q_image_resize, IMAGE_RESIZE_SQL),
    "frame_sample_plan": (q_frame_sample_plan, FRAME_SAMPLE_SQL),
    "frame_extraction": (q_frame_extraction, FRAME_EXTRACTION_SQL),
    "bm25_topk": (q_bm25_topk, BM25_TOPK_SQL),
    "hybrid_retrieval_rrf": (q_hybrid_retrieval_rrf, HYBRID_RETRIEVAL_RRF_SQL),
    "pii_redaction": (q_pii_redaction, PII_REDACTION_SQL),
    "context_packing": (q_context_packing, CONTEXT_PACKING_SQL),
    "doc_chunks": (q_doc_chunks, DOC_CHUNKS_SQL),
    "length_histogram": (q_length_histogram, LENGTH_HISTOGRAM_SQL),
    "semantic_dedup": (q_semantic_dedup, None),
    "bigram_lm_scores": (q_bigram_lm_scores, BIGRAM_LM_SQL),
    "boilerplate_chunks": (q_boilerplate_chunks, BOILERPLATE_CHUNKS_SQL),
    "bloom_decontamination": (q_bloom_decontamination, BLOOM_DECONTAMINATION_SQL),
    "quality_resample": (q_quality_resample, QUALITY_RESAMPLE_SQL),
    "dataset_card": (q_dataset_card, DATASET_CARD_SQL),
    "repeated_spans": (q_repeated_spans, REPEATED_SPANS_SQL),
    "stratified_split": (q_stratified_split, STRATIFIED_SPLIT_SQL),
}


def q_decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination END PRODUCT: training docs (doc_id % 10 != 0)
    with every benchmark-overlapping document removed — the anti-join
    composition of `decontamination`'s detection pass. Returns the
    surviving (doc_id, lang, source) rows; full value oracle."""
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 10 == 0)
    flagged = T.ngram_overlap(train, eval_docs, n=DECON_N).select("doc_id")
    return (
        train.join(flagged, "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
    )


DECONTAMINATED_CORPUS_SQL = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
grams AS (
    SELECT doc_id,
           array_to_string(
               toks[CAST(i AS INT):CAST(i AS INT) + {DECON_N - 1}], ' '
           ) AS ngram
    FROM t, unnest(range(1, len(toks) - {DECON_N} + 2)) AS u(i)
),
eval_grams AS (
    SELECT DISTINCT ngram FROM grams WHERE doc_id % 10 = 0
),
flagged AS (
    SELECT DISTINCT g.doc_id
    FROM grams g JOIN eval_grams USING (ngram)
    WHERE g.doc_id % 10 != 0
)
SELECT doc_id, lang, source
FROM documents d
WHERE doc_id % 10 != 0
  AND NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = d.doc_id)
"""

QUERIES["decontaminated_corpus"] = (
    q_decontaminated_corpus,
    DECONTAMINATED_CORPUS_SQL,
)


def q_contamination_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination REPORT: per source, how much of the training slice
    overlaps the held-out eval slice (count + rate) — the per-provenance
    breakdown a dataset audit publishes alongside the document-level
    decontamination pass. Exact integer counts + one rounded ratio."""
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 10 == 0)
    flagged = T.ngram_overlap(train, eval_docs, n=DECON_N).select("doc_id")
    return (
        train.join(
            flagged.withColumn("_f", F.lit(1)), "doc_id", "left"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("_f", F.lit(0))).alias("n_flagged"),
        )
        .select(
            "source",
            "n_docs",
            "n_flagged",
            F.round(
                F.col("n_flagged").cast("double") / F.col("n_docs"), 6
            ).alias("flag_rate"),
        )
    )


CONTAMINATION_BY_SOURCE_SQL = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
grams AS (
    SELECT doc_id,
           array_to_string(
               toks[CAST(i AS INT):CAST(i AS INT) + {DECON_N - 1}], ' '
           ) AS ngram
    FROM t, unnest(range(1, len(toks) - {DECON_N} + 2)) AS u(i)
),
eval_grams AS (
    SELECT DISTINCT ngram FROM grams WHERE doc_id % 10 = 0
),
flagged AS (
    SELECT DISTINCT g.doc_id
    FROM grams g JOIN eval_grams USING (ngram)
    WHERE g.doc_id % 10 != 0
)
SELECT source,
       count(*) AS n_docs,
       CAST(count(CASE WHEN f.doc_id IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_flagged,
       round(CAST(count(CASE WHEN f.doc_id IS NOT NULL THEN 1 END)
                  AS DOUBLE) / count(*), 6) AS flag_rate
FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
WHERE d.doc_id % 10 != 0
GROUP BY source
"""

QUERIES["contamination_by_source"] = (
    q_contamination_by_source,
    CONTAMINATION_BY_SOURCE_SQL,
)


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function surface over the embedding column:
    per-vector dimension count, L2 norm, min/max/mean component — all
    computed with F.aggregate/array_min/array_max (JVM codegen, no UDF),
    mirrored by DuckDB list_ functions. Rounded to 6 dp both sides."""
    emb = _emb(spark, sf_dir)
    vec = F.col("embedding").cast("array<double>")
    sq_sum = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: acc + x * x
    )
    total = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dims"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(F.array_min(vec), 6).alias("min_c"),
        F.round(F.array_max(vec), 6).alias("max_c"),
        F.round(total / F.size("embedding"), 6).alias("mean_c"),
    )


EMBEDDING_STATS_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dims,
       round(sqrt(list_sum(list_transform(
           CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm,
       round(CAST(list_min(CAST(embedding AS DOUBLE[])) AS DOUBLE), 6)
           AS min_c,
       round(CAST(list_max(CAST(embedding AS DOUBLE[])) AS DOUBLE), 6)
           AS max_c,
       round(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding), 6)
           AS mean_c
FROM embeddings
"""

QUERIES["embedding_stats"] = (q_embedding_stats, EMBEDDING_STATS_SQL)


SLIDE_CHUNK_CHARS = 256
SLIDE_STRIDE_CHARS = 128


def q_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunks (operators.text sliding_chunks):
    RAG-style windows of 256 chars every 128 — exact substring logic,
    full value oracle."""
    return T.sliding_chunks(
        _docs(spark, sf_dir),
        chunk_chars=SLIDE_CHUNK_CHARS,
        stride_chars=SLIDE_STRIDE_CHARS,
    )


SLIDING_CHUNKS_SQL = f"""
WITH idx AS (
    SELECT doc_id, text,
           unnest(generate_series(
               0, greatest((length(text) - {SLIDE_CHUNK_CHARS}
                            + {SLIDE_STRIDE_CHARS} - 1)
                           // {SLIDE_STRIDE_CHARS}, 0)
           )) AS chunk_idx
    FROM documents
)
SELECT doc_id, chunk_idx,
       substr(text, CAST(chunk_idx * {SLIDE_STRIDE_CHARS} + 1 AS INT),
              {SLIDE_CHUNK_CHARS}) AS chunk_text,
       CAST(length(substr(text,
              CAST(chunk_idx * {SLIDE_STRIDE_CHARS} + 1 AS INT),
              {SLIDE_CHUNK_CHARS})) AS BIGINT) AS n_chunk_chars
FROM idx
"""

QUERIES["sliding_chunks"] = (q_sliding_chunks, SLIDING_CHUNKS_SQL)


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL SORT surface: curriculum ordering of the corpus by quality
    score descending with doc_id tie-break, materialized as an explicit
    position column via operators.relational.global_positions — the
    range-exchange + per-partition sort + offset-metadata shape
    (distributed ``zipWithIndex``), NOT a bare ``row_number() OVER
    (ORDER BY …)``, which would funnel the whole corpus through one task
    (Exchange SinglePartition; pinned in tests/test_plan_regressions.py).
    """
    from ..operators.relational import global_positions

    scored = T.quality_stats(_docs(spark, sf_dir)).select(
        "doc_id", "quality_score"
    )
    out = global_positions(
        scored, [F.col("quality_score").desc(), F.col("doc_id").asc()]
    )
    return out.select("position", "doc_id", "quality_score")


CURRICULUM_ORDER_SQL = f"""
WITH toks AS (
    SELECT doc_id, n_chars, string_split(text, ' ') AS tk FROM documents
),
scored AS (
    SELECT doc_id,
           -- CASE gates (not boolean casts): NULL inputs score 0, the
           -- quality_stats convention both engines share (round 15)
           (CASE WHEN len(tk) >= 10 THEN 1 ELSE 0 END
            + CASE WHEN n_chars >= 50 THEN 1 ELSE 0 END
            + CASE WHEN len(list_filter(tk, x -> x IN ({_SW}))) > 0
                   THEN 1 ELSE 0 END)
               AS quality_score
    FROM toks
)
SELECT row_number() OVER (
           ORDER BY quality_score DESC, doc_id ASC NULLS FIRST
       ) AS position,
       doc_id, quality_score
FROM scored
"""

QUERIES["curriculum_order"] = (q_curriculum_order, CURRICULUM_ORDER_SQL)


SAMPLE_K, SAMPLE_SALT = 100, "eval-carveout-v1"


def q_corpus_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-100 uniform document sample (operators.relational
    uniform_sample_k): rank by the portable salted hash, keep the k
    smallest — deterministic across runs, engines, and partitionings (the
    reproducible eval-carve-out shape; `df.sample` gives a binomial count
    that depends on partitioning). TakeOrderedAndProject plan — no global
    sort. Fully value-checked."""
    from ..operators.relational import uniform_sample_k

    docs = _docs(spark, sf_dir)
    return uniform_sample_k(docs, SAMPLE_K, "doc_id", SAMPLE_SALT).select(
        "doc_id", "lang", "source", "n_chars"
    )


CORPUS_SAMPLE_K_SQL = f"""
WITH h AS (
    SELECT doc_id, lang, source, n_chars,
           CAST('0x' || substr(md5('{SAMPLE_SALT}:'
                || CAST(doc_id AS VARCHAR)), 1, 16) AS UBIGINT) AS u
    FROM documents
)
SELECT doc_id, lang, source, n_chars
FROM h
ORDER BY CAST(CAST(u AS HUGEINT)
              - CASE WHEN u >= CAST(9223372036854775808 AS UBIGINT)
                     THEN CAST(18446744073709551616 AS HUGEINT)
                     ELSE CAST(0 AS HUGEINT) END AS BIGINT) ASC NULLS LAST,
         doc_id ASC NULLS LAST
LIMIT {SAMPLE_K}
"""

QUERIES["corpus_sample_k"] = (q_corpus_sample_k, CORPUS_SAMPLE_K_SQL)


WSAMPLE_SALT = "token-budget-v1"


def q_weighted_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-100 LENGTH-WEIGHTED document sample (PPS without
    replacement — the token-budget-aware cousin of `corpus_sample_k`):
    Efraimidis-Spirakis exponential keys -ln(u)/n_chars from the portable
    hash, k smallest kept. Longer documents are proportionally likelier,
    the draw is deterministic across runs/engines/partitionings, and the
    plan is the same TakeOrderedAndProject as the uniform tier. See
    ``operators.relational.weighted_sample_k`` for the integer-exact
    log-argument + 2^-38 grid construction that makes the ranking
    cross-engine stable."""
    from ..operators.relational import weighted_sample_k

    docs = _docs(spark, sf_dir)
    return weighted_sample_k(
        docs, SAMPLE_K, "n_chars", "doc_id", WSAMPLE_SALT
    ).select("doc_id", "source", "n_chars")


WEIGHTED_CORPUS_SAMPLE_SQL = f"""
WITH h AS (
    SELECT doc_id, source, n_chars,
           CAST('0x' || substr(md5('{WSAMPLE_SALT}:'
                || CAST(doc_id AS VARCHAR)), 1, 16) AS UBIGINT) AS u
    FROM documents
    WHERE n_chars > 0
),
keys AS (
    SELECT doc_id, source, n_chars,
           floor((36.04365338911715 - ln(CAST((u >> 12) + 1 AS DOUBLE)))
                 / CAST(n_chars AS DOUBLE)
                 * 274877906944.0 + 0.5) / 274877906944.0 AS key_q
    FROM h
)
SELECT doc_id, source, n_chars
FROM keys
ORDER BY key_q ASC NULLS LAST, doc_id ASC NULLS LAST
LIMIT {SAMPLE_K}
"""

QUERIES["weighted_corpus_sample"] = (
    q_weighted_corpus_sample,
    WEIGHTED_CORPUS_SAMPLE_SQL,
)


def q_deduped_corpus_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup representatives: within each scale-path near-dup
    cluster (MinHash-LSH edges → star-CC, as `deduped_corpus`), keep the
    HIGHEST-QUALITY document instead of the min-id one — argmax by
    (quality_score DESC, n_chars DESC, doc_id ASC), the FineWeb-style "keep
    the best copy" policy. One max_by partial aggregation over the cluster
    map; no extra shuffle beyond the clustering itself. Fully
    value-checked (recursive-CTE closure + window argmax oracle).

    Round 17: the singleton-cluster bypass (score + argmax only clusters
    with ≥ 2 members) lives in ``quality_representatives`` itself, so the
    artifact twin and the corpus publisher inherit it too."""
    docs = _docs(spark, sf_dir)
    clusters = q_near_dup_clusters_lsh(spark, sf_dir)
    keep = D.quality_representatives(clusters, docs)
    return docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


DEDUPED_CORPUS_QUALITY_SQL = (
    "WITH RECURSIVE " + _minhash_ctes("", 32, 8, 5, 0.5)
    + _LSH_CLOSURE_CTES
    + f""",
cmap AS (
    SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN closure c ON c.id = d.doc_id
),
q AS (
    SELECT doc_id,
           CAST((len(string_split(text, ' ')) >= 10) AS INT)
           + CAST((n_chars >= 50) AS INT)
           + CAST((len(list_filter(string_split(text, ' '),
                        x -> x IN ({_SW}))) > 0) AS INT) AS quality_score
    FROM documents
),
keep AS (
    SELECT doc_id FROM (
        SELECT m.doc_id,
               row_number() OVER (
                   PARTITION BY m.cluster_id
                   ORDER BY q.quality_score DESC, d.n_chars DESC,
                            m.doc_id ASC
               ) AS rn
        FROM cmap m
        JOIN q ON q.doc_id = m.doc_id
        JOIN documents d ON d.doc_id = m.doc_id
    ) WHERE rn = 1
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
JOIN keep k ON k.doc_id = d.doc_id
"""
)

QUERIES["deduped_corpus_quality"] = (
    q_deduped_corpus_quality,
    DEDUPED_CORPUS_QUALITY_SQL,
)


# Process-lifetime memo of published corpus-artifact directories, keyed by
# sf_dir: in production the cluster map is written ONCE per corpus build
# and every downstream consumer reads the parquet artifact — re-deriving
# LSH+CC per query (as the oracle-isolated forms deliberately do) is the
# thing a 100 TB pipeline must not do.
_CORPUS_ARTIFACTS: dict[str, str] = {}


def _corpus_artifact_base(spark: SparkSession, sf_dir: str) -> str:
    base = _CORPUS_ARTIFACTS.get(sf_dir)
    if base is None:
        import atexit
        import shutil
        import tempfile

        base = tempfile.mkdtemp(prefix="corpus_artifacts_")
        # the memo is process-lifetime; reap the parquet tree on exit so
        # repeated bench/driver/test processes don't accumulate orphaned
        # corpus artifacts in tmp
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        D.publish_corpus_artifacts(_docs(spark, sf_dir), base)
        _CORPUS_ARTIFACTS[sf_dir] = base
    return base


def q_deduped_corpus_quality_artifact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`deduped_corpus_quality` in its PRODUCTION shape (VERDICT r08 item
    3): the doc→cluster map comes from the parquet artifact that
    `publish_corpus_artifacts` wrote (once per corpus build), so the
    query itself is ONLY the quality argmax + representative semi-join —
    no LSH, no connected components. Same output contract and oracle as
    the inline form (the publisher runs the identical
    minhash_lsh_pairs(32,8,5,0.5,"portable") → star-CC → coalesce
    composition; parity is test-pinned). First call per process pays the
    one-time publish; every later call reads the artifact."""
    base = _corpus_artifact_base(spark, sf_dir)
    clusters = spark.read.parquet(f"{base}/clusters")
    docs = _docs(spark, sf_dir)
    keep = D.quality_representatives(clusters, docs)
    return docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


QUERIES["deduped_corpus_quality_artifact"] = (
    q_deduped_corpus_quality_artifact,
    DEDUPED_CORPUS_QUALITY_SQL,
)


EPOCH_SHUFFLE_SEED = "epoch-0"


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EPOCH SHUFFLE: the corpus in a seeded pseudo-random
    global order with explicit contiguous positions — what a training run
    does to its data every epoch (change the seed, get an independent
    permutation; same seed reproduces bit-for-bit on any cluster layout).
    Order = portable salted hash of doc_id (ties impossible: doc_id is
    unique, and the id tie-break is kept anyway for NULL-safety). The sort
    is the distributed ``global_positions`` shape — RangePartitioning, no
    single-task sort (plan pinned for curriculum_order, same machinery).
    Fully value-checked."""
    from ..operators.dedup import portable_hash64
    from ..operators.relational import global_positions

    docs = _docs(spark, sf_dir).select("doc_id")
    h = portable_hash64(
        F.concat(
            F.lit(EPOCH_SHUFFLE_SEED), F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    keyed = docs.select("doc_id", h.alias("h"))
    out = global_positions(
        keyed, [F.col("h").asc_nulls_last(), F.col("doc_id").asc()]
    )
    return out.select("position", "doc_id")


EPOCH_SHUFFLE_SQL = f"""
WITH u AS (
    SELECT doc_id,
           CAST('0x' || substr(md5('{EPOCH_SHUFFLE_SEED}:'
                || CAST(doc_id AS VARCHAR)), 1, 16) AS UBIGINT) AS uh
    FROM documents
),
h AS (
    SELECT doc_id,
           CAST(CAST(uh AS HUGEINT)
                - CASE WHEN uh >= CAST(9223372036854775808 AS UBIGINT)
                       THEN CAST(18446744073709551616 AS HUGEINT)
                       ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS hh
    FROM u
)
SELECT row_number() OVER (ORDER BY hh ASC NULLS LAST, doc_id ASC) AS position,
       doc_id
FROM h
"""

QUERIES["epoch_shuffle"] = (q_epoch_shuffle, EPOCH_SHUFFLE_SQL)


DOMAIN_CAP = 20


def q_domain_capped_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (anti-hoarding curation): at most DOMAIN_CAP docs per
    source, chosen by portable-hash rank — quota-exact, full value
    oracle."""
    return T.domain_capped_corpus(_docs(spark, sf_dir), DOMAIN_CAP).select(
        "doc_id", "lang", "source", "n_chars"
    )


DOMAIN_CAPPED_CORPUS_SQL = f"""
SELECT doc_id, lang, source, n_chars FROM (
    SELECT doc_id, lang, source, n_chars,
           row_number() OVER (
               PARTITION BY source
               ORDER BY CAST('0x' || substr(md5('domcap'
                             || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                        ASC NULLS FIRST,
                        doc_id ASC NULLS FIRST
           ) AS rn
    FROM documents
) WHERE rn <= {DOMAIN_CAP}
"""


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (sample ∝ size^0.5): target 40% of
    the corpus, small sources upweighted — exact BIGINT thresholds, full
    value oracle."""
    docs = _docs(spark, sf_dir)
    target = docs.count() * 2 // 5
    return T.temperature_mixture(docs, target_total=target).select(
        "doc_id", "lang", "source", "n_chars"
    )


TEMPERATURE_MIXTURE_SQL = """
WITH t AS (SELECT 2 * count(*) // 5 AS target FROM documents),
w AS (
    SELECT source, count(*) AS n,
           CAST(floor(sqrt(count(*))) AS BIGINT) AS w
    FROM documents GROUP BY source
),
tw AS (SELECT sum(w) AS tw FROM w),
thr AS (
    SELECT source,
           least(CAST(1000000 AS BIGINT),
                 (CAST(1000000 AS BIGINT) * t.target * w.w) // (tw.tw * w.n))
           AS thr
    FROM w CROSS JOIN tw CROSS JOIN t
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d JOIN thr USING (source)
WHERE (CAST('0x' || substr(md5('temp' || CAST(d.doc_id AS VARCHAR)), 1, 8)
            AS BIGINT) % 1000000) < thr.thr
"""


QUERIES["domain_capped_corpus"] = (
    q_domain_capped_corpus,
    DOMAIN_CAPPED_CORPUS_SQL,
)
QUERIES["temperature_mixture"] = (
    q_temperature_mixture,
    TEMPERATURE_MIXTURE_SQL,
)


# --- PMI collocations (round 6b) ---------------------------------------------

# Bigrams must recur at least this often to be scored (rare pairs have
# degenerate, noise-dominated PMI — the standard Church & Hanks guard).
PMI_MIN_COUNT = 5
PMI_TOP_K = 100


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations (Church & Hanks 1990) —
    the classic corpus-linguistics "find the multi-word expressions" pass:
    ``pmi(x,y) = ln(c_xy · N) − ln(c_x· · c_·y)`` over the corpus bigram
    relation, marginals taken from the same relation so the distribution
    is self-consistent. Both log arguments are exact BIGINT products
    (c_x·c_y ≤ N² keeps sf1-scale counts far inside 2^63), each term is
    quantized to the 2^-38 dyadic grid before the 6-dp rounding, and the
    top-k orders by (pmi DESC, w1, w2) — fully deterministic cross-engine.

    Scale design (100 TB): one corpus scan builds the bigram relation
    (localCheckpoint'd — counts, marginals and the total reuse it without
    re-tokenizing); three partial-agg shuffles on token keys; the scalar
    total broadcasts. The min-count HAVING prunes the scored relation to
    the recurring tail before any join."""
    from ..operators.lm import _bigrams

    docs = _docs(spark, sf_dir)
    bg = _bigrams(docs, "text", "doc_id").localCheckpoint()
    cxy = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= PMI_MIN_COUNT)
    )
    cx = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c_x"))
    cy = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("c_y"))
    n = bg.agg(F.count(F.lit(1)).alias("n_total"))
    raw = F.log(F.col("c_xy") * F.col("n_total")) - F.log(
        F.col("c_x") * F.col("c_y")
    )
    quant = (
        F.floor(raw * F.lit(274877906944.0) + F.lit(0.5)).cast("double")
        / F.lit(274877906944.0)
    )
    return (
        cxy.join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "c_xy", F.round(quant, 6).alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(PMI_TOP_K)
    )


PMI_COLLOCATIONS_SQL = """
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
bg AS (
    SELECT doc_id,
           toks[CAST(i AS INT)] AS w1,
           toks[CAST(i AS INT) + 1] AS w2
    FROM t, unnest(range(1, len(toks))) AS u(i)
    WHERE toks[CAST(i AS INT)] != '' AND toks[CAST(i AS INT) + 1] != ''
),
cxy AS (
    SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2
    HAVING count(*) >= 5
),
cx AS (SELECT w1, count(*) AS c_x FROM bg GROUP BY 1),
cy AS (SELECT w2, count(*) AS c_y FROM bg GROUP BY 1),
n AS (SELECT count(*) AS n_total FROM bg)
SELECT w1, w2, c_xy,
       round(floor((ln(c_xy * n_total) - ln(c_x * c_y))
                   * 274877906944.0 + 0.5) / 274877906944.0, 6) AS pmi
FROM cxy JOIN cx USING (w1) JOIN cy USING (w2) CROSS JOIN n
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT 100
"""

QUERIES["pmi_collocations"] = (q_pmi_collocations, PMI_COLLOCATIONS_SQL)


# --- PPJoin exact set-similarity join (round 6b) ------------------------------

# Exact rational threshold t = 1/2: every prune/accept test is integer
# arithmetic (2·|∩| ≥ |A|+|B|−|∩|), no float thresholding anywhere.
PPJOIN_T_NUM, PPJOIN_T_DEN = 1, 2


def q_ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join via prefix filtering (PPJoin family)
    — the third dedup tier beside the quadratic exact baseline
    (`ngram_jaccard_pairs`) and the approximate banded MinHash
    (`minhash_near_dups`): EXACT Jaccard ≥ 1/2 pairs at sub-quadratic
    candidate cost. The oracle is the plain quadratic join, so every green
    check is a standing losslessness proof of the prefix filter.

    Registered on the deterministic doc_id % 4 == 0 quarter slice: this
    word-soup generator is pathologically self-similar (t=1/2 qualifies
    ~2.3M of the 12.5M same-lang pairs at sf0.1 — the OUTPUT, not the
    filter, is the cost), so the registered tier bounds the slice the way
    `triangle_counts` bounds its near-clique; the operator itself is
    unbounded and the slice keeps ~1.5k exact pairs at the driver's
    sf0.01 check scale."""
    from ..operators.dedup import prefix_filter_jaccard_pairs

    # one deterministic row per doc id (round 15): the prefix filter's
    # size/overlap arithmetic is doc-keyed, so physically duplicated ids
    # inflated overlaps past the set algebra (jaccard "1.39"); textless
    # docs have no set to join
    docs = _docs(spark, sf_dir).filter(
        (F.col("doc_id") % 4 == 0) & F.col("text").isNotNull()
    )
    w_rep = Window.partitionBy("doc_id").orderBy(
        F.col("lang").asc(), F.col("text").asc()
    )
    docs = (
        docs.withColumn("_rn", F.row_number().over(w_rep))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return prefix_filter_jaccard_pairs(
        docs,
        threshold_num=PPJOIN_T_NUM,
        threshold_den=PPJOIN_T_DEN,
    )


PPJOIN_PAIRS_SQL = """
WITH rep AS (
    SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY lang NULLS FIRST,
                                           text NULLS FIRST) AS rn
        FROM documents
        WHERE doc_id % 4 = 0 AND text IS NOT NULL
    ) WHERE rn = 1
),
toks AS (
    SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' ')))
               AS tok
    FROM rep
),
sz AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
inter AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
    FROM toks a
    JOIN toks b ON a.tok = b.tok AND a.lang = b.lang
                AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT a_id, b_id,
       round(CAST(i AS DOUBLE)
             / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = a_id
JOIN sz sb ON sb.doc_id = b_id
WHERE i * 2 >= (sa.sz + sb.sz - i) * 1
"""

QUERIES["ppjoin_pairs"] = (q_ppjoin_pairs, PPJOIN_PAIRS_SQL)


# --- positional phrase search (round 6b) ---------------------------------------


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search — the retrieval shape BM25 can't express
    (BM25 is bag-of-words; phrases need positions): enumerate trigram
    occurrences, pick the corpus's most frequent trigram (tie-broken
    lexicographically) as the query phrase, and return every (doc, start
    position) occurrence. All keys are strings and exact integers.

    Positions never leave the row: ONE posexplode over the token array
    with element_at lookahead for w2/w3 — no positional self-joins, no
    shuffle until the trigram count (which is map-side combined) — where
    a naive positional-index formulation (the oracle SQL's shape) pays
    two offset-equality joins over the full postings relation.

    Scale design (100 TB): the trigram enumeration is embarrassingly
    parallel per document; a KNOWN query phrase additionally prunes via a
    token-sharded positional inverted index — the corpus-wide trigram
    count here exists only to derive a deterministic query phrase at
    every SF."""
    from ..operators.text import tokens

    docs = _docs(spark, sf_dir)
    tri = (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.posexplode(F.col("toks")).alias("p0", "w1"),
        )
        .select(
            "doc_id",
            (F.col("p0") + 1).cast("long").alias("start_pos"),
            "w1",
            F.try_element_at(F.col("toks"), F.col("p0") + 2).alias("w2"),
            F.try_element_at(F.col("toks"), F.col("p0") + 3).alias("w3"),
        )
        .filter(
            F.col("w2").isNotNull()
            & F.col("w3").isNotNull()
            & (F.col("w1") != "")
            & (F.col("w2") != "")
            & (F.col("w3") != "")
        )
        .localCheckpoint()
    )
    top = (
        tri.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w1", "w2", "w3")
        .limit(1)
        .select("w1", "w2", "w3")
    )
    return tri.join(F.broadcast(top), ["w1", "w2", "w3"]).select(
        "doc_id", "start_pos", "w1", "w2", "w3"
    )


PHRASE_SEARCH_SQL = """
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
tri AS (
    -- ROW-LOCAL trigram enumeration via list indexing (round 15): the
    -- previous positional SELF-JOINS keyed on doc_id multiplied each
    -- occurrence 2x2-fold for physically duplicated doc ids — the Spark
    -- side's element_at lookahead never leaves the row, and neither
    -- does this
    SELECT doc_id, CAST(i AS BIGINT) AS start_pos,
           toks[CAST(i AS INT)] AS w1,
           toks[CAST(i AS INT) + 1] AS w2,
           toks[CAST(i AS INT) + 2] AS w3
    FROM t, unnest(range(1, len(toks) - 1)) AS u(i)
    WHERE toks[CAST(i AS INT)] != ''
      AND toks[CAST(i AS INT) + 1] != ''
      AND toks[CAST(i AS INT) + 2] != ''
),
top AS (
    SELECT w1, w2, w3 FROM tri
    GROUP BY 1, 2, 3
    ORDER BY count(*) DESC, w1 ASC, w2 ASC, w3 ASC
    LIMIT 1
)
SELECT tri.doc_id, tri.start_pos, tri.w1, tri.w2, tri.w3
FROM tri JOIN top USING (w1, w2, w3)
"""

QUERIES["phrase_search"] = (q_phrase_search, PHRASE_SEARCH_SQL)


# --- classifier calibration report (round 6b) -----------------------------------


def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the quality classifier — the MLOps
    calibration report: bucket the (hash-derived, value-oracled) linear
    model's logit into width-0.25 bins and report, per bin, the document
    count, the weak-label positive count, and the observed positive rate.
    A calibrated scorer's observed rate rises monotonically with the bin.

    Determinism: the logit is the same fixed-order 6-dp expression as
    `classifier_scores`; the bin is floor((logit + 100) / 0.25) — division
    by 0.25 is an exact power-of-two scaling, so identical logit doubles
    bin identically in both engines; counts are integers and the rate is
    one IEEE division rounded 6 dp.

    Scale design (100 TB): scoring is a codegen'd projection (weights are
    plan literals); the report is one partial-aggregated groupBy to a
    ≤ few-dozen-bin grid."""
    from ..operators import classifier as C

    feats = C.quality_features(_docs(spark, sf_dir))
    logit = C.linear_logit(S._lcg_vectors(1, C.N_FEATURES, seed=13)[0], -0.5)
    binned = feats.select(
        F.floor((logit + F.lit(100.0)) / F.lit(0.25)).alias("bin"),
        F.col("label").cast("long").alias("y"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("positives"),
        )
        .select(
            "bin",
            (F.col("bin") * F.lit(0.25) - F.lit(100.0)).alias("bin_lo"),
            "n",
            "positives",
            F.round(
                F.col("positives").cast("double") / F.col("n").cast("double"),
                6,
            ).alias("observed_rate"),
        )
    )


def _classifier_calibration_sql() -> str:
    from ..operators import classifier as C

    w = S._lcg_vectors(1, C.N_FEATURES, seed=13)[0]
    logit = (
        f"round(-0.5 + {w[0]!r} * (CAST(len(toks) AS DOUBLE) / 100.0) "
        f"+ {w[1]!r} * mean_token_len "
        f"+ {w[2]!r} * stopword_ratio "
        f"+ {w[3]!r} * (CAST(n_chars AS DOUBLE) / 1000.0), 6)"
    )
    return f"""
WITH t AS (
    SELECT doc_id, n_chars,
           string_split(text, ' ') AS toks,
           len(list_filter(string_split(text, ' '), x -> x IN ({_SW}))) AS sw
    FROM documents
    WHERE text IS NOT NULL AND n_chars IS NOT NULL
),
f AS (
    SELECT doc_id, toks, n_chars, sw,
           round(list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE)))
                 / len(toks), 6) AS mean_token_len,
           round(CAST(sw AS DOUBLE) / len(toks), 6) AS stopword_ratio
    FROM t
),
scored AS (
    SELECT CAST(floor(({logit} + 100.0) / 0.25) AS BIGINT) AS bin,
           (CASE WHEN len(toks) >= 10 THEN 1 ELSE 0 END
            + CASE WHEN n_chars >= 50 THEN 1 ELSE 0 END
            + CASE WHEN sw > 0 THEN 1 ELSE 0 END) AS qs
    FROM f
)
SELECT bin, CAST(bin AS DOUBLE) * 0.25 - 100.0 AS bin_lo,
       count(*) AS n,
       CAST(sum(CASE WHEN qs = 3 THEN 1 ELSE 0 END) AS BIGINT) AS positives,
       round(CAST(sum(CASE WHEN qs = 3 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS observed_rate
FROM scored
GROUP BY bin
"""


QUERIES["classifier_calibration"] = (
    q_classifier_calibration,
    _classifier_calibration_sql(),
)


# --- true fixed-merge BPE subword tokenization (VERDICT r06 item 3) --------

N_BPE_MERGES = 12


def _bpe_corpus(spark: SparkSession, sf_dir: str):
    """Shared front end for the three BPE queries (subword_token_counts,
    bpe_compression_stats, bpe_vocab): lowercase [a-z]+ word extraction
    (with doc_id and lang carried for the rollups), the weighted
    vocabulary, and the fitted merge table. ONE definition so the word
    regex and merge count can never desynchronize from the shared
    unrolled-CTE oracle body (`_bpe_unrolled_with`).

    Returns (words(doc_id, lang, word), vocab(word, cnt), merges)."""
    from ..operators import bpe

    docs = _docs(spark, sf_dir)
    words = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: x != "",
            )
        ).alias("word"),
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    merges = bpe.bpe_fit(vocab, n_merges=N_BPE_MERGES)
    return words, vocab, merges


def q_subword_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document subword token counts under a TRUE learned-merge BPE
    tokenizer (Sennrich et al. 2016), replacing the `bpe_ish_tokens`
    regex proxy as the engine's real subword path: train N_BPE_MERGES
    merges on the corpus vocabulary (adjacent-pair frequency argmax per
    round, ties broken (count DESC, x ASC, y ASC)), then apply the fixed
    merge table greedily left-to-right and sum per document.

    Output: (doc_id, n_words, n_subword_tokens); words are the lowercase
    [a-z]+ runs. FULL value oracle: the DuckDB side re-trains the same
    merges via unrolled-merge CTEs (the LPA unrolled-fixpoint recipe;
    materialized per round so the CTE graph stays linear) — a green row
    proves fit AND apply, merge for merge.

    Scale design (100 TB): see operators/bpe.py — the corpus is touched
    twice (vocab build, broadcast join-back); training rounds run on the
    vocabulary only, with a 1-row metadata collect per round."""
    from ..operators import bpe

    words, vocab, merges = _bpe_corpus(spark, sf_dir)
    tokenized = bpe.bpe_tokenize_words(vocab.select("word"), merges)
    counts = (
        words.join(
            F.broadcast(tokenized.select("word", "n_subword_tokens")),
            "word",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subword_tokens").alias("n_subword_tokens"),
        )
    )
    # every document gets a row (round-13 review): a doc with no [a-z]+
    # runs counts 0/0 instead of vanishing — a downstream consumer must
    # see "zero tokens", not "unscored"
    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_subword_tokens", F.lit(0).cast("long")).alias(
                "n_subword_tokens"
            ),
        )
    )


def _bpe_unrolled_with(n_merges: int = N_BPE_MERGES) -> str:
    """Shared WITH-body: vocab build + unrolled BPE training (one
    (pairs, argmax, replace) CTE triple per merge round) + the per-word
    token counts as ``fin(word, n_sub)``. AS MATERIALIZED is
    load-bearing: each round references the previous ~4×, so
    un-materialized CTE inlining would expand the plan exponentially."""
    rounds = []
    prev = "v0"
    for r in range(1, n_merges + 1):
        rounds.append(f"""p{r} AS MATERIALIZED (
    SELECT t.toks[i] AS x, t.toks[i + 1] AS y, t.cnt
    FROM (SELECT cnt, string_split(substr(s, 2, length(s) - 2), ')(') AS toks
          FROM {prev}) t,
         unnest(range(1, len(t.toks))) AS u(i)
),
m{r} AS MATERIALIZED (
    SELECT '(' || x || ')(' || y || ')' AS pat, '(' || x || y || ')' AS rep
    FROM (SELECT x, y, sum(cnt) AS c FROM p{r} GROUP BY 1, 2
          ORDER BY c DESC, x ASC, y ASC LIMIT 1)
),
v{r} AS MATERIALIZED (
    SELECT word, cnt,
           CASE WHEN (SELECT count(*) FROM m{r}) = 0 THEN s
                ELSE replace(s, (SELECT pat FROM m{r}), (SELECT rep FROM m{r}))
           END AS s
    FROM {prev}
)""")
        prev = f"v{r}"
    body = ",\n".join(rounds)
    return f"""WITH w0 AS MATERIALIZED (
    SELECT doc_id, lang, word FROM (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        FROM documents
    ) WHERE word != ''
),
vc AS MATERIALIZED (SELECT word, count(*) AS cnt FROM w0 GROUP BY 1),
v0 AS MATERIALIZED (
    SELECT word, cnt, regexp_replace(word, '(.)', '(\\1)', 'g') AS s FROM vc
),
{body},
fin AS (
    SELECT word, length(s) - length(replace(s, '(', '')) AS n_sub
    FROM {prev}
)"""


def _subword_token_counts_sql(n_merges: int = N_BPE_MERGES) -> str:
    return f"""
{_bpe_unrolled_with(n_merges)}
SELECT d.doc_id,
       coalesce(c.n_words, 0) AS n_words,
       coalesce(c.n_subword_tokens, 0) AS n_subword_tokens
FROM (SELECT doc_id FROM documents) d
LEFT JOIN (
    SELECT w.doc_id, count(*) AS n_words,
           CAST(sum(f.n_sub) AS BIGINT) AS n_subword_tokens
    FROM w0 w JOIN fin f USING (word)
    GROUP BY 1
) c USING (doc_id)
"""


SUBWORD_TOKEN_COUNTS_SQL = _subword_token_counts_sql()

QUERIES["subword_token_counts"] = (
    q_subword_token_counts,
    SUBWORD_TOKEN_COUNTS_SQL,
)


# --- fixed-centroid SemDeDup twin (VERDICT r06 item 6) ---------------------


def q_semantic_dedup_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`semantic_dedup`'s assignment + within-cell dedup machinery on
    FIXED hash-derived centroids — FULL value oracle (the PQ/IVF recipe);
    the KMeans variant stays rows-only beside it.

    AUDIT-CLASS / SAMPLE-SCALE-ONLY (``AUDIT_CLASS_QUERIES``): a fixed
    cell count makes the within-cell pair volume Σ|cell|² grow ~N²/c —
    superlinear BY DESIGN. This is the bracketing baseline the recall
    audit measures the sublinear tiers against; production pipelines run
    `semantic_dedup_ivf_refit` (occupancy-law cells, linear candidate
    volume)."""
    return S.semantic_dedup_fixed(
        _pin_emb(_emb(spark, sf_dir)),
        n_clusters=16, threshold=0.45
    )


def _semantic_dedup_fixed_sql(
    n_clusters: int = 16,
    threshold: float = 0.45,
    dim: int = 64,
    seed: int = 11,
) -> str:
    """Assignment arithmetic lives on the exact 2^-20 grid (round 10 —
    mirrors the BLAS assignment in operators.similarity; see
    ivf_cell_assignments): centroid literals are pre-quantized and the
    normalized vectors snap to the grid in the n CTE. Zero vectors pass
    through the same generic rank (their v is the zero vector, so d =
    Σ cq² per cell — the Spark side computes that argmin driver-side,
    same exact sums, same (d, cell) tie-break)."""
    vals = ",\n    ".join(
        f"({i}, [{', '.join(repr(w) for w in cv)}]::DOUBLE[])"
        for i, cv in enumerate(
            S.quantized_unit_centroids(n_clusters, dim, seed)
        )
    )
    grid = float(1 << S.IVF_GRID_BITS)
    nrm = f"sqrt({_dot_sql('e.embedding', 'e.embedding')})"
    l2sq = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"j -> (n.v[j] - c.cv[j]) * (n.v[j] - c.cv[j])))"
    )
    return f"""
WITH cents(cell, cv) AS (VALUES
    {vals}),
n AS (
    SELECT e.vec_id,
           list_transform(
               CASE WHEN {nrm} != 0
                    THEN list_transform(e.embedding,
                                        x -> CAST(x AS DOUBLE) / {nrm})
                    ELSE list_transform(e.embedding,
                                        x -> CAST(x AS DOUBLE))
               END,
               x -> floor(x * {grid!r} + 0.5) / {grid!r}) AS v
    FROM embeddings e
),
assigned AS (
    SELECT vec_id, cell FROM (
        SELECT n.vec_id, c.cell,
               row_number() OVER (PARTITION BY n.vec_id
                                  ORDER BY {l2sq} ASC, c.cell ASC) AS rn
        FROM n CROSS JOIN cents c
    ) WHERE rn = 1
),
withv AS (
    SELECT a.vec_id, a.cell, e.embedding
    FROM assigned a JOIN embeddings e USING (vec_id)
),
dropped AS (
    SELECT DISTINCT b.vec_id
    FROM withv a JOIN withv b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE CASE WHEN sqrt({_dot_sql('a.embedding', 'a.embedding')}) != 0
                AND sqrt({_dot_sql('b.embedding', 'b.embedding')}) != 0
               THEN {_cosine_sql('a.embedding', 'b.embedding')}
          END >= {threshold!r}
)
SELECT w.vec_id, CAST(w.cell AS BIGINT) AS cell
FROM withv w LEFT JOIN dropped d ON w.vec_id = d.vec_id
WHERE d.vec_id IS NULL
"""


SEMANTIC_DEDUP_FIXED_SQL = _semantic_dedup_fixed_sql()

QUERIES["semantic_dedup_fixed"] = (
    q_semantic_dedup_fixed,
    SEMANTIC_DEDUP_FIXED_SQL,
)


# --- √N-cell SemDeDup scale twin (round 8, VERDICT r07 item 3) --------------


def q_semantic_dedup_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`semantic_dedup_fixed` at the SemDeDup √N cell-count law — the
    SCALE-SHAPED configuration is the oracle-checked one: cells grow with
    corpus size, so Σ|cell|² stays ~N^1.5-bounded instead of quadratic
    (measured at sf1: 31.6 s at √N=141 cells vs 54.7 s at the 16-cell
    pin). The cell count is the only adaptive input — one metadata-sized
    count() (the same adaptive-planning trade AQE makes) feeding the same
    deterministic hash-derived LCG centroids, which the DuckDB oracle
    regenerates bit-exactly in SQL (recursive-CTE LCG over HUGEINT, the
    identical IEEE ops), so the oracle follows the law at ANY sf.

    AUDIT-CLASS / SAMPLE-SCALE-ONLY (``AUDIT_CLASS_QUERIES``): ~N^1.5 is
    still superlinear BY DESIGN — this is the SemDeDup paper's cell-count
    law kept as the mid-point baseline between the fixed-cell tier and
    the occupancy-law production tier; production pipelines run
    `semantic_dedup_ivf_refit`."""
    import math

    emb = _pin_emb(_emb(spark, sf_dir))
    n_cells = int(math.sqrt(emb.count()))
    return S.semantic_dedup_fixed(
        emb, n_clusters=n_cells, threshold=0.45
    )


def _semantic_dedup_sqrt_sql(
    threshold: float = 0.45, dim: int = 64, seed: int = 11
) -> str:
    """Mirror of q_semantic_dedup_sqrt with SQL-generated centroids:
    the LCG state recurrence runs in HUGEINT (products < 2^126), the
    [-1,1] mapping and L2 normalization are the same IEEE-double ops as
    operators.similarity._lcg_unit_vectors (verified bit-exact), and
    n_cells = floor(sqrt(count(*))) — the identical double sqrt the
    Spark side computes. Assignment arithmetic lives on the exact 2^-20
    grid (round 10; see _semantic_dedup_fixed_sql)."""
    grid = float(1 << S.IVF_GRID_BITS)
    nrm = f"sqrt({_dot_sql('e.embedding', 'e.embedding')})"
    l2sq = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"j -> (n.v[j] - c.cv[j]) * (n.v[j] - c.cv[j])))"
    )
    return f"""
WITH RECURSIVE params AS (
    SELECT CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS n_cells
    FROM embeddings
),
lcg(idx, state) AS (
    SELECT 0, CAST({seed} AS HUGEINT)
    UNION ALL
    SELECT idx + 1,
           (state * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
           % CAST(9223372036854775808 AS HUGEINT)
    FROM lcg WHERE idx < (SELECT n_cells * {dim} FROM params)
),
comp AS (
    SELECT (idx - 1) // {dim} AS cell, (idx - 1) % {dim} AS j,
           CAST(state AS DOUBLE) / 9223372036854775808.0 * 2.0 - 1.0 AS x
    FROM lcg WHERE idx >= 1
),
rawc AS (SELECT cell, list(x ORDER BY j) AS rv FROM comp GROUP BY cell),
cents AS (
    -- normalize, then snap to the exact 2^-20 grid (round 10 — the
    -- quantized_unit_centroids mirror; see _semantic_dedup_fixed_sql)
    SELECT cell,
           list_transform(
               list_transform(rv, x -> x
                   / sqrt(list_sum(list_transform(rv, y -> y * y)))),
               x -> floor(x * {grid!r} + 0.5) / {grid!r}) AS cv
    FROM rawc
),
n AS (
    SELECT e.vec_id,
           list_transform(
               CASE WHEN {nrm} != 0
                    THEN list_transform(e.embedding,
                                        x -> CAST(x AS DOUBLE) / {nrm})
                    ELSE list_transform(e.embedding,
                                        x -> CAST(x AS DOUBLE))
               END,
               x -> floor(x * {grid!r} + 0.5) / {grid!r}) AS v
    FROM embeddings e
),
assigned AS (
    SELECT vec_id, cell FROM (
        SELECT n.vec_id, c.cell,
               row_number() OVER (PARTITION BY n.vec_id
                                  ORDER BY {l2sq} ASC, c.cell ASC) AS rn
        FROM n CROSS JOIN cents c
    ) WHERE rn = 1
),
withv AS (
    SELECT a.vec_id, a.cell, e.embedding
    FROM assigned a JOIN embeddings e USING (vec_id)
),
dropped AS (
    SELECT DISTINCT b.vec_id
    FROM withv a JOIN withv b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE CASE WHEN sqrt({_dot_sql('a.embedding', 'a.embedding')}) != 0
                AND sqrt({_dot_sql('b.embedding', 'b.embedding')}) != 0
               THEN {_cosine_sql('a.embedding', 'b.embedding')}
          END >= {threshold!r}
)
SELECT w.vec_id, CAST(w.cell AS BIGINT) AS cell
FROM withv w LEFT JOIN dropped d ON w.vec_id = d.vec_id
WHERE d.vec_id IS NULL
"""


SEMANTIC_DEDUP_SQRT_SQL = _semantic_dedup_sqrt_sql()

QUERIES["semantic_dedup_sqrt"] = (
    q_semantic_dedup_sqrt,
    SEMANTIC_DEDUP_SQRT_SQL,
)


# --- Zipf-law fit (round 8) ----------------------------------------------------

ZIPF_TOP_RANKS = 1000
_ZIPF_GRID = 68719476736.0  # 2^36: |ln|² terms < 2^16 → 52-bit exact sums


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus word-frequency distribution — the
    classic corpus-statistics audit (natural text fits slope ≈ −1 in
    log-rank/log-frequency; synthetic or template-heavy corpora deviate,
    which is exactly what a data-quality review looks for): OLS of
    ln(freq) against ln(rank) over the top-1000 ranks.

    Cross-engine exactness: each ln is quantized to the 2^-36 grid and
    each OLS cross-term (x·y, x·x) is RE-quantized after the multiply, so
    every sufficient-statistic sum is an order-independent sum of dyadic
    rationals (< 2^16 in magnitude at 2^-36 grain = 52 significand bits —
    exact); the slope/intercept closed forms are then fixed scalar
    expressions over identical doubles. Rank ties break on the term
    string, identically in both engines.

    Scale design (100 TB): one token-explode scan → per-term partial-agg
    counts → global top-R by (freq, term) (TakeOrderedAndProject-sized R)
    → one single-row aggregate."""
    docs = _docs(spark, sf_dir)
    freq = (
        docs.select(F.explode(T.tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("term").asc())
    ranked = freq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= ZIPF_TOP_RANKS
    )

    def q(c):
        return (
            F.floor(c * F.lit(_ZIPF_GRID) + F.lit(0.5)).cast("double")
            / F.lit(_ZIPF_GRID)
        )

    x = q(F.log(F.col("rank").cast("double")))
    y = q(F.log(F.col("freq").cast("double")))
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(q(x * y)).alias("sxy"),
        F.sum(q(x * x)).alias("sxx"),
    )
    n = F.col("n").cast("double")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.select(
        F.col("n").alias("n_types_ranked"),
        F.when(
            den != 0.0,
            F.round(
                (n * F.col("sxy") - F.col("sx") * F.col("sy")) / den, 6
            ),
        ).alias("zipf_slope"),
        F.when(
            den != 0.0,
            F.round(
                (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
                / den,
                6,
            ),
        ).alias("intercept"),
    )


ZIPF_FIT_SQL = f"""
WITH freq AS (
    SELECT tok AS term, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    WHERE tok != ''
    GROUP BY tok
),
ranked AS (
    SELECT freq, row_number() OVER (ORDER BY freq DESC, term ASC) AS rank
    FROM freq QUALIFY rank <= {ZIPF_TOP_RANKS}
),
m AS (
    SELECT count(*) AS n,
           sum(floor(ln(CAST(rank AS DOUBLE)) * {_ZIPF_GRID!r} + 0.5)
               / {_ZIPF_GRID!r}) AS sx,
           sum(floor(ln(CAST(freq AS DOUBLE)) * {_ZIPF_GRID!r} + 0.5)
               / {_ZIPF_GRID!r}) AS sy,
           sum(floor((floor(ln(CAST(rank AS DOUBLE)) * {_ZIPF_GRID!r} + 0.5)
                      / {_ZIPF_GRID!r})
                     * (floor(ln(CAST(freq AS DOUBLE)) * {_ZIPF_GRID!r} + 0.5)
                        / {_ZIPF_GRID!r})
                     * {_ZIPF_GRID!r} + 0.5) / {_ZIPF_GRID!r}) AS sxy,
           sum(floor((floor(ln(CAST(rank AS DOUBLE)) * {_ZIPF_GRID!r} + 0.5)
                      / {_ZIPF_GRID!r})
                     * (floor(ln(CAST(rank AS DOUBLE)) * {_ZIPF_GRID!r} + 0.5)
                        / {_ZIPF_GRID!r})
                     * {_ZIPF_GRID!r} + 0.5) / {_ZIPF_GRID!r}) AS sxx
    FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_types_ranked,
       CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx != 0.0
            THEN round((CAST(n AS DOUBLE) * sxy - sx * sy)
                       / (CAST(n AS DOUBLE) * sxx - sx * sx), 6)
       END AS zipf_slope,
       CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx != 0.0
            THEN round((sy * sxx - sx * sxy)
                       / (CAST(n AS DOUBLE) * sxx - sx * sx), 6)
       END AS intercept
FROM m
"""


# --- Heaps'-law vocabulary growth (round 8) -------------------------------------


def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve — Zipf's companion corpus
    statistic (natural text grows vocabulary ≈ K·n^β, β ≈ 0.4-0.6; a
    template corpus saturates early, which is the quality signal): the
    distinct-type count after the first N/8, N/4, N/2 and N documents in
    doc_id order. Exact integers end to end: each term's FIRST document
    is one min-aggregate, and vocab_at_k counts terms whose first doc
    falls inside the prefix — no running distinct state, so the curve
    costs one scan + one vocabulary-sized aggregate however large the
    corpus.

    Output: (prefix_docs, vocab_size), 4 rows."""
    # a doc without an id has no place in a doc_id-ordered prefix (round
    # 15: Spark sorts NULL ids first, DuckDB last — the N-th boundary
    # silently became NULL in the oracle and the full-corpus row vanished)
    docs = _docs(spark, sf_dir).filter(F.col("doc_id").isNotNull())
    n = docs.count()
    firsts = (
        docs.select("doc_id", F.explode(T.tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    ks = [n // 8, n // 4, n // 2, n]
    grid = spark.createDataFrame([(k,) for k in ks], "prefix_docs LONG")
    ordered = docs.select("doc_id").orderBy("doc_id").limit(n)
    # prefix membership by doc_id RANK, not raw id (ids need not be dense):
    # the k-th smallest doc_id is the prefix boundary
    bounds = (
        ordered.withColumn(
            "rn", F.row_number().over(Window.orderBy("doc_id"))
        )
        .join(F.broadcast(grid), F.col("rn") == F.col("prefix_docs"))
        .select("prefix_docs", F.col("doc_id").alias("bound"))
    )
    return (
        F.broadcast(bounds)
        .join(firsts, firsts["first_doc"] <= bounds["bound"])
        .groupBy("prefix_docs")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )


HEAPS_LAW_SQL = """
WITH d AS (SELECT * FROM documents WHERE doc_id IS NOT NULL),
firsts AS (
    SELECT tok AS term, min(doc_id) AS first_doc
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM d)
    WHERE tok != ''
    GROUP BY tok
),
n AS (SELECT count(*) AS n FROM d),
grid AS (
    SELECT CAST(k AS BIGINT) AS prefix_docs FROM (
        SELECT unnest([ (SELECT n FROM n) // 8,
                        (SELECT n FROM n) // 4,
                        (SELECT n FROM n) // 2,
                        (SELECT n FROM n) ]) AS k)
),
bounds AS (
    SELECT g.prefix_docs, r.doc_id AS bound
    FROM grid g JOIN (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
        FROM d
    ) r ON r.rn = g.prefix_docs
)
SELECT b.prefix_docs, count(*) AS vocab_size
FROM bounds b JOIN firsts f ON f.first_doc <= b.bound
GROUP BY b.prefix_docs
"""


# --- Flesch-style readability scoring (round 8) -------------------------------


def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability per document (operators.text readability_scores) —
    vowel-run syllable proxy with the Flesch floors; exact integer counts
    feeding one fixed two-division expression. FULL value oracle."""
    return T.readability_scores(_docs(spark, sf_dir))


READABILITY_SCORES_SQL = """
WITH t AS (
    SELECT doc_id,
           greatest(len(list_filter(string_split_regex(text, '[.!?]'),
                                    s -> trim(s) != '')), 1) AS n_sentences,
           list_filter(string_split(text, ' '), w -> w != '') AS ws
    FROM documents
),
w AS (
    SELECT doc_id, n_sentences, unnest(ws) AS word FROM t
),
agg AS (
    SELECT doc_id,
           first(n_sentences) AS n_sentences,
           count(*) AS n_words,
           sum(greatest(len(list_filter(
                   string_split_regex(lower(word), '[^aeiou]+'),
                   p -> p != '')), 1)) AS n_syllables
    FROM w GROUP BY doc_id
),
-- every document gets a row: wordless docs score 0 counts + NULL flesch
dense AS (
    SELECT t.doc_id,
           coalesce(agg.n_sentences, t.n_sentences) AS n_sentences,
           coalesce(agg.n_words, 0) AS n_words,
           coalesce(agg.n_syllables, 0) AS n_syllables
    FROM t LEFT JOIN agg USING (doc_id)
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       round(CASE WHEN n_words > 0 THEN 206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             END,
             4) AS flesch_score
FROM dense
"""


# --- sparse TF-IDF document similarity search (round 8) ----------------------

SIMILAR_DOCS_MAX_QUERY_ID = 20
SIMILAR_DOCS_K = 3


def q_similar_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-to-doc sparse TF-IDF cosine top-3 (operators.retrieval
    similar_documents) — the inverted-index "related documents" query,
    dense ANN's sparse sibling. Integer-exact core: per-term squared-idf
    weights quantized once to a BIGINT grid, dot products and norms as
    exact BIGINT sums, one IEEE division at the end. Stop-terms
    (df·10 > 9·N) pruned by integer comparison. FULL value oracle."""
    from ..operators.retrieval import similar_documents

    return similar_documents(
        _docs(spark, sf_dir),
        query_max_id=SIMILAR_DOCS_MAX_QUERY_ID,
        top_k=SIMILAR_DOCS_K,
    )


SIMILAR_DOCUMENTS_SQL = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
postings AS (
    SELECT doc_id, tok AS term, count(*) AS tf
    FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
    WHERE tok != ''
    GROUP BY doc_id, tok
),
n AS (SELECT count(*) AS n_docs FROM documents),
weights AS (
    SELECT term,
           CAST(floor((ln((n_docs + 1.0) / (df + 1.0)) + 1.0)
                      * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0)
                      * 1048576.0 + 0.5) AS BIGINT) AS u
    FROM (SELECT term, count(*) AS df FROM postings GROUP BY term), n
    WHERE df * 10 <= n_docs * 9
),
w AS (
    SELECT p.doc_id, p.term, p.tf, wt.u
    FROM postings p JOIN weights wt USING (term)
),
norms AS (
    SELECT doc_id, CAST(sum(tf * tf * u) AS BIGINT) AS norm2
    FROM w GROUP BY doc_id
),
dots AS (
    SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
           CAST(sum(q.tf * c.tf * q.u) AS BIGINT) AS dot
    FROM w q JOIN w c ON q.term = c.term AND q.doc_id != c.doc_id
    WHERE q.doc_id < {SIMILAR_DOCS_MAX_QUERY_ID}
    GROUP BY 1, 2
),
scored AS (
    SELECT d.query_id, d.neighbor_id,
           round(CAST(d.dot AS DOUBLE)
                 / (sqrt(CAST(nq.norm2 AS DOUBLE))
                    * sqrt(CAST(nc.norm2 AS DOUBLE))), 6) AS cosine_sim
    FROM dots d
    JOIN norms nq ON nq.doc_id = d.query_id
    JOIN norms nc ON nc.doc_id = d.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_sim DESC, neighbor_id ASC)
              AS rank
    FROM scored
) WHERE rank <= {SIMILAR_DOCS_K}
"""


# --- DSIR importance resampling (round 8) -----------------------------------

DSIR_TARGET_SOURCE = "src1"  # the in-domain target slice (5% of the corpus)
DSIR_BUCKETS = 1024
DSIR_TOP_K = 100


def q_dsir_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators.importance; Xie et al. 2023): rank
    the raw pool by hashed-n-gram importance weight against the
    `source = 'src1'` target slice and keep the top 100 — the
    train-like-the-target curation stage between quality filtering and
    mixing. FULL value oracle: portable md5 bucket hashing, integer log
    arguments, 2^-38-grid quantized terms (the bigram-LM construction),
    deterministic (weight DESC, doc_id ASC) selection."""
    from ..operators.importance import dsir_select

    docs = _docs(spark, sf_dir)
    return dsir_select(
        docs,
        F.col("source") == DSIR_TARGET_SOURCE,
        k=DSIR_TOP_K,
        n_buckets=DSIR_BUCKETS,
    )


_DSIR_CTES = f"""t AS (
    SELECT doc_id, (source = '{DSIR_TARGET_SOURCE}') AS is_t,
           string_split(text, ' ') AS toks
    FROM documents
),
uni AS (
    SELECT doc_id, is_t, unnest(toks) AS feat FROM t
),
bi AS (
    SELECT doc_id, is_t,
           toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS feat
    FROM t, unnest(range(1, len(toks))) AS u(i)
    WHERE toks[CAST(i AS INT)] != '' AND toks[CAST(i AS INT) + 1] != ''
),
feats AS (
    SELECT doc_id, is_t,
           CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT) % {DSIR_BUCKETS}
               AS bucket
    FROM (SELECT * FROM uni WHERE feat != '' UNION ALL SELECT * FROM bi)
),
tc AS (SELECT bucket, count(*) AS ct FROM feats WHERE is_t GROUP BY 1),
rc AS (SELECT bucket, count(*) AS cr FROM feats WHERE NOT is_t GROUP BY 1),
tot AS (SELECT
    -- NOT is_t (not ELSE): a NULL-source doc is neither target nor raw,
    -- matching the Spark side's when(~_t, 1).otherwise(0) (round 15)
    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt,
    sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS nr
    FROM feats),
docf AS (
    SELECT doc_id, bucket, count(*) AS m
    FROM feats WHERE NOT is_t GROUP BY 1, 2
),
scored AS (
    SELECT d.doc_id, sum(d.m) AS n_feats,
           sum(d.m * (floor((ln(coalesce(tc.ct, 0) + 1)
                             - ln(coalesce(rc.cr, 0) + 1))
                            * 274877906944.0 + 0.5) / 274877906944.0)) AS s
    FROM docf d LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
    GROUP BY d.doc_id
),
weighted AS (
    SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
           round(s + n_feats * (floor((ln(nr + {DSIR_BUCKETS})
                                       - ln(nt + {DSIR_BUCKETS}))
                                      * 274877906944.0 + 0.5)
                                / 274877906944.0), 6) AS log_weight
    FROM scored, tot
)"""

DSIR_SELECTED_SQL = f"""
WITH {_DSIR_CTES}
SELECT doc_id, n_feats, log_weight
FROM weighted
ORDER BY log_weight DESC, doc_id ASC
LIMIT {DSIR_TOP_K}
"""

QUERIES["dsir_selected"] = (q_dsir_selected, DSIR_SELECTED_SQL)


def q_dsir_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's actual selection mode (operators.importance
    dsir_gumbel_sample): weighted sampling WITHOUT replacement via
    Gumbel-top-k, with the Gumbel noise derandomized through the portable
    hash — the sample is a pure function of corpus + salt, so the whole
    draw value-oracles (the deterministic-rank variant `dsir_selected`
    is the noiseless limit beside it)."""
    from ..operators.importance import dsir_gumbel_sample

    return dsir_gumbel_sample(
        _docs(spark, sf_dir),
        F.col("source") == DSIR_TARGET_SOURCE,
        k=DSIR_TOP_K,
        n_buckets=DSIR_BUCKETS,
    )


def _dsir_sampled_sql() -> str:
    from ..operators.importance import GUMBEL_SALT

    u = (f"(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || "
         f"'{GUMBEL_SALT}'), 1, 8) AS BIGINT) AS DOUBLE) + 0.5) "
         f"/ 4294967296.0")
    gq = (f"floor(-ln(-ln({u})) * 274877906944.0 + 0.5) "
          f"/ 274877906944.0")
    return f"""
WITH {_DSIR_CTES}
SELECT doc_id, n_feats, log_weight,
       round(log_weight + {gq}, 6) AS gumbel_key
FROM weighted
ORDER BY gumbel_key DESC, doc_id ASC
LIMIT {DSIR_TOP_K}
"""


DSIR_SAMPLED_SQL = _dsir_sampled_sql()

QUERIES["dsir_sampled"] = (q_dsir_sampled, DSIR_SAMPLED_SQL)
QUERIES["similar_documents"] = (q_similar_documents, SIMILAR_DOCUMENTS_SQL)
QUERIES["readability_scores"] = (q_readability_scores, READABILITY_SCORES_SQL)
QUERIES["zipf_fit"] = (q_zipf_fit, ZIPF_FIT_SQL)
QUERIES["heaps_law"] = (q_heaps_law, HEAPS_LAW_SQL)


# --- contrastive hard-negative mining (round 7b) ---------------------------


def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive pair mining for embedding fine-tuning: per query
    vector (vec_id < N_QUERY_VECS), nearest same-label positive and the
    3 nearest different-label hard negatives by exact cosine. FULL value
    oracle (deterministic arithmetic end to end)."""
    emb = _pin_emb(_emb(spark, sf_dir))
    return S.hard_negative_mining(
        emb.filter(F.col("vec_id") < N_QUERY_VECS), emb, n_pos=1, n_neg=3
    )


HARD_NEGATIVE_MINING_SQL = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv, label AS q_label
    FROM embeddings
    WHERE vec_id < {N_QUERY_VECS}
      AND sqrt({_dot_sql('embedding', 'embedding')}) != 0
),
c AS (
    SELECT vec_id, embedding, label FROM embeddings
    WHERE sqrt({_dot_sql('embedding', 'embedding')}) != 0
),
scored AS (
    SELECT q.query_id,
           CASE WHEN q.q_label = e.label THEN 'pos' ELSE 'neg' END AS role,
           e.vec_id AS neighbor_id,
           {_cosine_sql('q.qv', 'e.embedding')} AS cosine_sim
    FROM q JOIN c e ON e.vec_id != q.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id, role
                                 ORDER BY cosine_sim DESC, neighbor_id ASC)
              AS rank
    FROM scored
)
SELECT query_id, role, rank, neighbor_id, cosine_sim
FROM ranked
WHERE (role = 'pos' AND rank <= 1) OR (role = 'neg' AND rank <= 3)
"""

QUERIES["hard_negative_mining"] = (
    q_hard_negative_mining,
    HARD_NEGATIVE_MINING_SQL,
)


# --- ANN-candidate hard-negative mining twin (round 8, VERDICT r07 #4) ------

HNM_ANN_PLANES = 8
HNM_ANN_BANDS = 2


def q_hard_negative_mining_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`hard_negative_mining`'s 100 TB candidate path, demonstrated
    end-to-end: candidates from banded SRP buckets (share ≥1 of 2
    four-bit band buckets with the query) instead of the full corpus,
    then the identical exact-cosine scoring/ranking contract. FULL value
    oracle — the hyperplanes are seeded Python-float constants on both
    engines and the candidate set is deterministic integer banding."""
    emb = _pin_emb(_emb(spark, sf_dir))
    return S.hard_negative_mining_ann(
        emb.filter(F.col("vec_id") < N_QUERY_VECS),
        emb,
        n_pos=1,
        n_neg=3,
        n_planes=HNM_ANN_PLANES,
        n_bands=HNM_ANN_BANDS,
    )


def _hard_negative_mining_ann_sql(
    n_pos: int = 1,
    n_neg: int = 3,
    n_planes: int = HNM_ANN_PLANES,
    n_bands: int = HNM_ANN_BANDS,
    dim: int = 64,
) -> str:
    """Mirror of operators.similarity.hard_negative_mining_ann: per-band
    SRP bucket = packed sign bits (strict > 0, band-local weight
    2^(i % rows)), candidates = DISTINCT pairs sharing any (band_idx,
    bucket), exact 6-dp cosine re-rank per (query, role)."""
    rows = n_planes // n_bands
    planes = S._hyperplanes(dim, n_planes)
    vals = ",\n    ".join(
        f"({i // rows}, {1 << (i % rows)}, "
        f"[{', '.join(repr(w) for w in plane)}]::DOUBLE[])"
        for i, plane in enumerate(planes)
    )
    dot_plane = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        "j -> CAST(e.embedding[j] AS DOUBLE) * p.plane[j]))"
    )
    return f"""
WITH planes(band_idx, w, plane) AS (VALUES
    {vals}),
sigs AS (
    SELECT e.vec_id, p.band_idx,
           SUM(CASE WHEN {dot_plane} > 0 THEN CAST(p.w AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END) AS bucket
    FROM embeddings e CROSS JOIN planes p
    WHERE sqrt({_dot_sql('e.embedding', 'e.embedding')}) != 0
    GROUP BY e.vec_id, p.band_idx
),
cand AS (
    SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS neighbor_id
    FROM sigs qs JOIN sigs cs
      ON qs.band_idx = cs.band_idx AND qs.bucket = cs.bucket
     AND qs.vec_id != cs.vec_id
    WHERE qs.vec_id < {N_QUERY_VECS}
),
scored AS (
    SELECT c.query_id,
           CASE WHEN q.label = e.label THEN 'pos' ELSE 'neg' END AS role,
           c.neighbor_id,
           {_cosine_sql('q.embedding', 'e.embedding')} AS cosine_sim
    FROM cand c
    JOIN embeddings q ON q.vec_id = c.query_id
    JOIN embeddings e ON e.vec_id = c.neighbor_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id, role
                                 ORDER BY cosine_sim DESC, neighbor_id ASC)
              AS rank
    FROM scored
)
SELECT query_id, role, rank, neighbor_id, cosine_sim
FROM ranked
WHERE (role = 'pos' AND rank <= {n_pos}) OR (role = 'neg' AND rank <= {n_neg})
"""


HARD_NEGATIVE_MINING_ANN_SQL = _hard_negative_mining_ann_sql()

QUERIES["hard_negative_mining_ann"] = (
    q_hard_negative_mining_ann,
    HARD_NEGATIVE_MINING_ANN_SQL,
)


# --- ANN-candidate SemDeDup tier (round 9, VERDICT r08 item 2) --------------

SDA_BANDS = 2
SDA_TARGET_BUCKET = 24
SDA_MAX_BITS = 24
SDA_THRESHOLD = 0.45


def q_semantic_dedup_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop on banded-SRP ANN candidates — the sublinear
    composition that closes the dedup suite's last superlinear stage
    (VERDICT r08 item 2, the analog of `hard_negative_mining_ann`):
    bits-per-band adapt to corpus size so bucket occupancy (and so
    candidate volume per row) stays ~constant. FULL value oracle: the
    plane table is the same seeded-LCG literal set on both engines and
    the adaptive bits formula is one shared metadata-sized count()."""
    return S.semantic_dedup_ann(
        _pin_emb(_emb(spark, sf_dir)),
        threshold=SDA_THRESHOLD,
        n_bands=SDA_BANDS,
        target_bucket=SDA_TARGET_BUCKET,
        max_bits=SDA_MAX_BITS,
    )


def _semantic_dedup_ann_sql(
    threshold: float = SDA_THRESHOLD,
    n_bands: int = SDA_BANDS,
    target_bucket: int = SDA_TARGET_BUCKET,
    max_bits: int = SDA_MAX_BITS,
    dim: int = 64,
) -> str:
    """Mirror of operators.similarity.semantic_dedup_ann: band b uses
    planes [b*max_bits, b*max_bits + bits), bit j weighted 2^j, bits =
    clamp(ceil(log2(N / target_bucket)), 4, max_bits) — the identical
    IEEE log2/ceil the Spark side computes driver-side."""
    planes = S._hyperplanes(dim, n_bands * max_bits)
    vals = ",\n    ".join(
        f"({i // max_bits}, {i % max_bits}, {1 << (i % max_bits)}, "
        f"[{', '.join(repr(w) for w in plane)}]::DOUBLE[])"
        for i, plane in enumerate(planes)
    )
    dot_plane = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        "j -> CAST(e.embedding[j] AS DOUBLE) * p.plane[j]))"
    )
    return f"""
WITH params AS (
    -- structurally identical to the Spark side's
    -- min(max_bits, max(4, ceil(log2(max(n, 2) / target_bucket)))) —
    -- including the max(n, 2) degenerate-N guard (ADVICE r09: without
    -- the mirrored greatest(count(*), 2) the two expressions only agree
    -- because both clamp to 4 today; keep them the same shape)
    SELECT CAST(least({max_bits}, greatest(4,
               ceil(log2(CAST(greatest(count(*), 2) AS DOUBLE)
                         / {float(target_bucket)!r}))))
           AS INT) AS bits
    FROM embeddings
),
planes(band_idx, bit_idx, w, plane) AS (VALUES
    {vals}),
sigs AS (
    SELECT e.vec_id, p.band_idx,
           SUM(CASE WHEN {dot_plane} > 0 THEN CAST(p.w AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END) AS bucket
    FROM embeddings e CROSS JOIN planes p CROSS JOIN params
    WHERE p.bit_idx < params.bits
      AND sqrt({_dot_sql('e.embedding', 'e.embedding')}) != 0
    GROUP BY e.vec_id, p.band_idx
),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM sigs a JOIN sigs b
      ON a.band_idx = b.band_idx AND a.bucket = b.bucket
     AND a.vec_id < b.vec_id
),
dropped AS (
    SELECT DISTINCT c.id_b AS vec_id
    FROM cand c
    JOIN embeddings x ON x.vec_id = c.id_a
    JOIN embeddings y ON y.vec_id = c.id_b
    WHERE {_cosine_sql('x.embedding', 'y.embedding')} >= {threshold!r}
)
SELECT e.vec_id
FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.vec_id
WHERE d.vec_id IS NULL
"""


SEMANTIC_DEDUP_ANN_SQL = _semantic_dedup_ann_sql()

QUERIES["semantic_dedup_ann"] = (
    q_semantic_dedup_ann,
    SEMANTIC_DEDUP_ANN_SQL,
)


# --- multi-probe IVF SemDeDup (round 10, VERDICT r09 item 2) ----------------

SDI_TARGET_OCC = 16
SDI_N_PROBE = 8
# the cap exists only to bound the BAKED centroid literal table — it must
# sit far above every SF the query actually runs at, or the occupancy law
# breaks and candidate volume turns quadratic (round-10 sf1 probe: the
# original 128 cap left 20k vectors at 1250/cell ≈ 200M candidate pairs —
# a GC storm; 2048 keeps the clamp non-binding through ~32k vectors)
SDI_MAX_CELLS = 2048
SDI_MIN_CELLS = 8


def q_semantic_dedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop on multi-probe IVF-cell candidates — the
    HIGH-RECALL sublinear tier (VERDICT r09 item 2). The banded-SRP
    generator of `semantic_dedup_ann` measures 0.12-0.36 drop-set recall
    at threshold 0.45 (a cosine-0.45 pair sits 63° apart — wider than
    sign-agreement banding reaches); probing each vector's 8 nearest of
    N/16 fixed cells measures 0.95-1.00 pair recall vs the exact
    all-pairs drop set (see `ann_recall_report`'s drop_set rows). FULL
    value oracle: prefix-stable LCG unit-centroid literals, IEEE
    left-fold L2, (d asc, cell asc) tie-break, 6-dp cosine."""
    return S.semantic_dedup_ivf(
        _pin_emb(_emb(spark, sf_dir)),
        threshold=SDA_THRESHOLD,
        target_occ=SDI_TARGET_OCC,
        n_probe=SDI_N_PROBE,
        max_cells=SDI_MAX_CELLS,
        min_cells=SDI_MIN_CELLS,
    )


def _ivf_sql_fragments(
    dim: int, seed: int, n_bake: int, threshold: float
) -> dict[str, str]:
    """The exactness-critical SQL fragments BOTH IVF-tier oracles share —
    one copy of the grid-snap formula, the baked pre-quantized centroid
    literal, the L2 rank expression, and the cand/dropped/kept tail, so
    a future fix to any of them cannot silently diverge between the
    probe-8 and the Lloyd-refit mirrors (they must stay bit-identical to
    the same Spark-side machinery in operators.similarity)."""
    grid = float(1 << S.IVF_GRID_BITS)
    nrm = f"sqrt({_dot_sql('e.embedding', 'e.embedding')})"
    return {
        "cents_vals": ",\n    ".join(
            f"({i}, [{', '.join(repr(w) for w in cv)}]::DOUBLE[])"
            for i, cv in enumerate(
                S.quantized_unit_centroids(n_bake, dim, seed)
            )
        ),
        "grid": repr(grid),
        "n_cte": f"""n AS (
    SELECT e.vec_id,
           list_transform(e.embedding,
               x -> floor(CAST(x AS DOUBLE) / {nrm} * {grid!r} + 0.5)
                    / {grid!r}) AS v
    FROM embeddings e WHERE {nrm} != 0
)""",
        "l2sq": (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"j -> (n.v[j] - c.cv[j]) * (n.v[j] - c.cv[j])))"
        ),
        "tail": f"""cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM assigned a JOIN assigned b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
),
dropped AS (
    SELECT DISTINCT c.id_b AS vec_id
    FROM cand c
    JOIN embeddings x ON x.vec_id = c.id_a
    JOIN embeddings y ON y.vec_id = c.id_b
    WHERE {_cosine_sql('x.embedding', 'y.embedding')} >= {threshold!r}
)
SELECT e.vec_id
FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.vec_id
WHERE d.vec_id IS NULL""",
    }


def _ivf_params_cte(
    target_occ: int,
    max_cells: int,
    min_cells: int,
    pinned_cells: int | None,
) -> str:
    """The adaptive clamp(ceil(N/occ), min, max) cell-count CTE, or a
    pinned constant (the streaming contract, where cell boundaries must
    not move between ingestion batches)."""
    if pinned_cells is not None:
        return f"SELECT CAST({pinned_cells} AS INT) AS n_cells"
    return f"""SELECT CAST(least({max_cells}, greatest({min_cells},
               ceil(CAST(count(*) AS DOUBLE) / {float(target_occ)!r})))
           AS INT) AS n_cells
    FROM embeddings"""


def _semantic_dedup_ivf_sql(
    threshold: float = SDA_THRESHOLD,
    target_occ: int = SDI_TARGET_OCC,
    n_probe: int = SDI_N_PROBE,
    max_cells: int = SDI_MAX_CELLS,
    min_cells: int = SDI_MIN_CELLS,
    dim: int = 64,
    seed: int = 11,
    pinned_cells: int | None = None,
) -> str:
    """Mirror of operators.similarity.semantic_dedup_ivf: the baked
    centroid table holds all ``max_cells`` LCG unit centroids (cell i's
    components are positions [i*dim, (i+1)*dim) of one seeded stream, so
    the prefix never shifts as n_cells adapts); params computes the same
    clamp(ceil(N / target_occ), min_cells, max_cells) the Spark side
    computes driver-side; assignment ranks (L2 asc, cell asc) and keeps
    the top n_probe. ``pinned_cells`` replaces the adaptive params CTE
    with a constant — the streaming-contract configuration
    (semantic_dedup_incremental), where cell boundaries must not move
    between ingestion batches.

    Assignment arithmetic is the EXACT-GRID domain of
    ``operators.similarity.ivf_cell_assignments``: the baked centroids
    are pre-quantized to the 2^-20 grid and the normalized vectors snap
    to it in the n CTE, so this direct Σ(v−c)² fold is bit-identical to
    the Spark side's numpy matmul decomposition (every intermediate is
    exactly representable — order-independent sums)."""
    f = _ivf_sql_fragments(
        dim, seed, max(max_cells, pinned_cells or 0), threshold
    )
    params = _ivf_params_cte(target_occ, max_cells, min_cells, pinned_cells)
    return f"""
WITH params AS (
    {params}
),
cents(cell, cv) AS (VALUES
    {f["cents_vals"]}),
{f["n_cte"]},
assigned AS (
    SELECT vec_id, cell FROM (
        SELECT n.vec_id, c.cell,
               row_number() OVER (PARTITION BY n.vec_id
                                  ORDER BY {f["l2sq"]} ASC, c.cell ASC) AS rn
        FROM n CROSS JOIN cents c CROSS JOIN params
        WHERE c.cell < params.n_cells
    ) WHERE rn <= {n_probe}
),
{f["tail"]}
"""


SEMANTIC_DEDUP_IVF_SQL = _semantic_dedup_ivf_sql()

QUERIES["semantic_dedup_ivf"] = (
    q_semantic_dedup_ivf,
    SEMANTIC_DEDUP_IVF_SQL,
)


# --- Lloyd-fitted probe-16 SemDeDup tier (round 12) --------------------------

SDR_N_PROBE = 16


def q_semantic_dedup_ivf_refit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FITTED high-recall SemDeDup configuration (round 12 — VERDICT
    r11 noted the engine's own measured-best config was not registered):
    one exact-grid Lloyd step refines the LCG seed centroids, then
    probe-16 multi-probe assignment feeds the standard keep/drop. The
    round-10 dup-dense sf1 probe measured this at **0.95 drop-set
    recall** vs 0.65 for the unfitted probe-8 tier (PERFORMANCE.md r10
    recall table) — the published SemDeDup prescribes fitted k-means
    cells, and this is that prescription in oracle-checkable form. FULL
    value oracle: the Lloyd mean is an order-independent sum of 2^-20
    grid multiples + one IEEE division, re-snapped to the grid so the
    probe-16 assignment's BLAS decomposition stays bit-exact."""
    return S.semantic_dedup_ivf_refit(
        _pin_emb(_emb(spark, sf_dir)),
        threshold=SDA_THRESHOLD,
        target_occ=SDI_TARGET_OCC,
        n_probe=SDR_N_PROBE,
        max_cells=SDI_MAX_CELLS,
        min_cells=SDI_MIN_CELLS,
    )


def _semantic_dedup_ivf_refit_sql(
    threshold: float = SDA_THRESHOLD,
    target_occ: int = SDI_TARGET_OCC,
    n_probe: int = SDR_N_PROBE,
    max_cells: int = SDI_MAX_CELLS,
    min_cells: int = SDI_MIN_CELLS,
    dim: int = 64,
    seed: int = 11,
) -> str:
    """Mirror of operators.similarity.semantic_dedup_ivf_refit (one Lloyd
    step): probe-1 seed assignment → per-(cell, dim) exact-grid mean,
    re-snapped to the 2^-20 grid (empty cells keep their seed centroid)
    → probe-``n_probe`` assignment against the refitted table → the
    shared cand/drop/kept tail. Exactness: the mean numerator is a sum
    of grid multiples (order-independent in any engine), the division is
    one IEEE op, and the re-quantized centroids return every distance
    intermediate to the exact-representable domain, so DuckDB's direct
    Σ(v−c)² fold equals the Spark side's BLAS decomposition bit for
    bit."""
    f = _ivf_sql_fragments(dim, seed, max_cells, threshold)
    params = _ivf_params_cte(target_occ, max_cells, min_cells, None)
    grid = f["grid"]
    return f"""
WITH params AS (
    {params}
),
cents(cell, cv) AS (VALUES
    {f["cents_vals"]}),
{f["n_cte"]},
a1 AS (
    SELECT vec_id, cell FROM (
        SELECT n.vec_id, c.cell,
               row_number() OVER (PARTITION BY n.vec_id
                                  ORDER BY {f["l2sq"]} ASC, c.cell ASC) AS rn
        FROM n CROSS JOIN cents c CROSS JOIN params
        WHERE c.cell < params.n_cells
    ) WHERE rn = 1
),
sums AS (
    SELECT a1.cell AS cell, t.j AS pos, sum(n.v[t.j]) AS s,
           count(*) AS cnt
    FROM n JOIN a1 USING (vec_id) CROSS JOIN range(1, {dim} + 1) t(j)
    GROUP BY 1, 2
),
refit AS (
    SELECT c0.cell AS cell, coalesce(u.cv, c0.cv) AS cv
    FROM cents c0 CROSS JOIN params LEFT JOIN (
        SELECT cell,
               list(floor(s / cnt * {grid} + 0.5) / {grid}
                    ORDER BY pos) AS cv
        FROM sums GROUP BY cell
    ) u ON u.cell = c0.cell
    WHERE c0.cell < params.n_cells
),
assigned AS (
    SELECT vec_id, cell FROM (
        SELECT n.vec_id, c.cell,
               row_number() OVER (PARTITION BY n.vec_id
                                  ORDER BY {f["l2sq"]} ASC, c.cell ASC) AS rn
        FROM n CROSS JOIN refit c
    ) WHERE rn <= {n_probe}
),
{f["tail"]}
"""


SEMANTIC_DEDUP_IVF_REFIT_SQL = _semantic_dedup_ivf_refit_sql()

QUERIES["semantic_dedup_ivf_refit"] = (
    q_semantic_dedup_ivf_refit,
    SEMANTIC_DEDUP_IVF_REFIT_SQL,
)


# --- incremental-ingestion SemDeDup batch twin (round 10, VERDICT r09
# item 5) -------------------------------------------------------------------

SDS_N_CELLS = 128  # pinned stream cell count (streaming/semantic_dedup.py)


def q_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAMING semantic-dedup ingestion tier
    (streaming.semantic_dedup): the corpus is replayed as 3 deterministic
    ingestion batches (vec_id % 3 — id order and arrival order decoupled),
    each batch's pairs generated INCREMENTALLY against the accumulated
    assignment/vector stores via `incremental_semantic_pairs` (new×store ∪
    new×new on shared pinned IVF cells — store×store never re-paired),
    kept = corpus minus the accumulated drop verdicts. The oracle is the
    PINNED-CELL batch SQL — so this driver row value-checks the
    incremental machinery's central claim: the union of per-batch pair
    sets reproduces the batch tier's keep/drop decision exactly
    (replay == batch, the same contract tests/test_streaming_semantic_dedup
    pins against the live file-source stream)."""
    from ..operators.similarity import ivf_cell_assignments

    emb = _pin_emb(_emb(spark, sf_dir))
    dropped = None
    store_assign = None
    store_vecs = None
    for i in range(3):
        batch = emb.filter(F.col("vec_id") % 3 == i)
        # checkpoint ONLY the per-batch assignment (the HOF distance
        # projection feeds both the pair join and the store); the store
        # unions stay lazy — 3-deep union lineage over checkpointed
        # leaves is cheap, and the %3 batches are disjoint by
        # construction so the semi-join guard (pytest-pinned in
        # test_streaming_semantic_dedup) would only add driver jobs here
        new_assign = ivf_cell_assignments(
            batch, SDS_N_CELLS, SDI_N_PROBE
        ).localCheckpoint()
        p = S.incremental_semantic_pairs(
            batch,
            store_assign if store_assign is not None
            else new_assign.limit(0),
            store_vecs if store_vecs is not None else batch.limit(0),
            threshold=SDA_THRESHOLD,
            n_cells=SDS_N_CELLS,
            n_probe=SDI_N_PROBE,
            new_assign=new_assign,
            check_disjoint=False,
        ).select(F.col("id_b").alias("vec_id"))
        dropped = p if dropped is None else dropped.unionByName(p)
        store_assign = (
            new_assign
            if store_assign is None
            else store_assign.unionByName(new_assign)
        )
        store_vecs = (
            batch
            if store_vecs is None
            else store_vecs.unionByName(batch)
        )
    return (
        emb.select("vec_id")
        .join(dropped.distinct(), "vec_id", "left_anti")
        .select("vec_id")
    )


SEMANTIC_DEDUP_INCREMENTAL_SQL = _semantic_dedup_ivf_sql(
    pinned_cells=SDS_N_CELLS
)

QUERIES["semantic_dedup_incremental"] = (
    q_semantic_dedup_incremental,
    SEMANTIC_DEDUP_INCREMENTAL_SQL,
)


# --- artifact-backed SemDeDup steady state (round 10) ------------------------

_SEMANTIC_ARTIFACTS: dict[str, str] = {}


def _semantic_artifact_base(spark: SparkSession, sf_dir: str) -> str:
    base = _SEMANTIC_ARTIFACTS.get(sf_dir)
    if base is None:
        import atexit
        import shutil
        import tempfile

        base = tempfile.mkdtemp(prefix="semantic_artifacts_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        S.semantic_dedup_ivf(
            _emb(spark, sf_dir),
            threshold=SDA_THRESHOLD,
            target_occ=SDI_TARGET_OCC,
            n_probe=SDI_N_PROBE,
            max_cells=SDI_MAX_CELLS,
            min_cells=SDI_MIN_CELLS,
        ).write.parquet(f"{base}/kept")
        _SEMANTIC_ARTIFACTS[sf_dir] = base
    return base


def q_semantic_dedup_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`semantic_dedup_ivf` in its PRODUCTION shape (the
    `deduped_corpus_quality_artifact` pattern): the kept-id set comes
    from the parquet artifact published once per corpus build, so the
    query itself is ONLY an artifact read + semi-join against the live
    embeddings table — no assignment, no candidate join, no cosine pass.
    Same output contract and oracle as the inline tier (the publisher
    runs the identical semantic_dedup_ivf composition; parity is
    test-pinned). First call per process pays the one-time publish;
    every later call reads the artifact."""
    base = _semantic_artifact_base(spark, sf_dir)
    kept = spark.read.parquet(f"{base}/kept")
    return (
        _emb(spark, sf_dir)
        .select("vec_id")
        .join(kept, "vec_id", "left_semi")
    )


QUERIES["semantic_dedup_artifact"] = (
    q_semantic_dedup_artifact,
    SEMANTIC_DEDUP_IVF_SQL,
)

# the SemDeDup drop-set recall audit (VERDICT r09 item 2) — assembled
# here because the dedup tier SQL constants are defined after the top-k
# report's mid-module registration
SEMANTIC_DEDUP_RECALL_SQL = _bound_audit_corpus(
    _assemble_semantic_dedup_recall_sql(
        {
            "semdedup_fixed": (
                f"SELECT vec_id FROM ({SEMANTIC_DEDUP_FIXED_SQL}) _f"
            ),
            "semdedup_ann": SEMANTIC_DEDUP_ANN_SQL,
            "semdedup_ivf": SEMANTIC_DEDUP_IVF_SQL,
            "semdedup_ivf_refit": SEMANTIC_DEDUP_IVF_REFIT_SQL,
        },
        threshold=SDA_THRESHOLD,
    )
)
QUERIES["semantic_dedup_recall"] = (
    q_semantic_dedup_recall,
    SEMANTIC_DEDUP_RECALL_SQL,
)


# --- one unrolled Lloyd iteration (round 9, VERDICT r08 item 6) -------------

KMEANS_K = 8


def q_kmeans_one_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration on the sf embeddings — fixed LCG init →
    assign → exact-grid mean update → re-assign. FULL value oracle: the
    2^-20 input grid makes the mean numerator an order-independent exact
    sum, so both engines produce bit-identical centroids and argmins."""
    return S.kmeans_one_step(_emb(spark, sf_dir), k=KMEANS_K)


def _kmeans_one_step_sql(
    k: int = KMEANS_K, dim: int = 64, seed: int = 11
) -> str:
    vals = ",\n    ".join(
        f"({i}, [{', '.join(repr(w) for w in cv)}]::DOUBLE[])"
        for i, cv in enumerate(S._lcg_unit_vectors(k, dim, seed))
    )
    l2sq = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        "j -> (q.v[j] - c.cv[j]) * (q.v[j] - c.cv[j])))"
    )
    return f"""
WITH cents0(cell, cv) AS (VALUES
    {vals}),
q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) / 1048576.0)
           AS v
    FROM embeddings
),
a1 AS (
    SELECT vec_id, cell AS cell_init FROM (
        SELECT q.vec_id, c.cell,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {l2sq} ASC, c.cell ASC) AS rn
        FROM q CROSS JOIN cents0 c
    ) WHERE rn = 1
),
sums AS (
    SELECT a1.cell_init AS cell, t.j AS pos, sum(q.v[t.j]) AS s,
           count(*) AS c
    FROM q JOIN a1 USING (vec_id) CROSS JOIN range(1, {dim} + 1) t(j)
    GROUP BY 1, 2
),
cents1 AS (
    SELECT c0.cell, coalesce(u.cv, c0.cv) AS cv
    FROM cents0 c0 LEFT JOIN (
        SELECT cell, list(s / c ORDER BY pos) AS cv FROM sums GROUP BY cell
    ) u USING (cell)
),
a2 AS (
    SELECT vec_id, cell AS cell_next FROM (
        SELECT q.vec_id, c.cell,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {l2sq} ASC, c.cell ASC) AS rn
        FROM q CROSS JOIN cents1 c
    ) WHERE rn = 1
)
SELECT a1.vec_id, CAST(a1.cell_init AS BIGINT) AS cell_init,
       CAST(a2.cell_next AS BIGINT) AS cell_next
FROM a1 JOIN a2 USING (vec_id)
"""


KMEANS_ONE_STEP_SQL = _kmeans_one_step_sql()

QUERIES["kmeans_one_step"] = (q_kmeans_one_step, KMEANS_ONE_STEP_SQL)


# --- BPE tokenizer compression report (round 7b) ---------------------------


def q_bpe_compression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer compression report — the fertility/
    compression audit run before committing to a tokenizer (chars per
    subword token by language; languages a merge table under-serves show
    low compression): fit the corpus BPE (same N_BPE_MERGES recipe as
    `subword_token_counts`), apply, roll up per lang. FULL value oracle
    via the shared unrolled-merge CTE body.

    Scale design (100 TB): identical to subword_token_counts plus one
    partial-agg'd rollup to ≤ |langs| rows."""
    from ..operators import bpe

    words, vocab, merges = _bpe_corpus(spark, sf_dir)
    tokenized = bpe.bpe_tokenize_words(vocab.select("word"), merges)
    return (
        words.join(
            F.broadcast(tokenized.select("word", "n_subword_tokens")),
            "word",
        )
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_word_chars"),
            F.sum("n_subword_tokens").alias("n_subword_tokens"),
        )
        .withColumn(
            "chars_per_token",
            F.round(
                F.col("n_word_chars").cast("double")
                / F.col("n_subword_tokens").cast("double"),
                6,
            ),
        )
    )


BPE_COMPRESSION_STATS_SQL = f"""
{_bpe_unrolled_with()},
wl AS (
    -- lang rides the word extraction itself (round 15): a join back to
    -- documents on doc_id cross-attributed words between duplicated-id
    -- rows whose lang variants differ, and dropped NULL-id docs
    SELECT lang, doc_id, word FROM w0
)
SELECT wl.lang,
       count(DISTINCT wl.doc_id) AS n_docs,
       count(*) AS n_words,
       CAST(sum(length(wl.word)) AS BIGINT) AS n_word_chars,
       CAST(sum(f.n_sub) AS BIGINT) AS n_subword_tokens,
       round(CAST(sum(length(wl.word)) AS DOUBLE)
             / CAST(sum(f.n_sub) AS DOUBLE), 6) AS chars_per_token
FROM wl JOIN fin f USING (word)
GROUP BY 1
"""

QUERIES["bpe_compression_stats"] = (
    q_bpe_compression_stats,
    BPE_COMPRESSION_STATS_SQL,
)


# --- BPE vocabulary artifact (round 7c) ------------------------------------


def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer ARTIFACT a training pipeline ships: the subword
    vocabulary after N_BPE_MERGES merges — every distinct subword token
    with its corpus frequency (occurrences weighted by word count) and
    its dense token id (frequency DESC, token ASC — the conventional
    id assignment). FULL value oracle via the shared unrolled body.

    Scale design (100 TB): everything past the corpus vocab build runs
    on the vocabulary relation; the token explode is bounded by tokens
    per word."""
    from ..operators import bpe

    _words, vocab, merges = _bpe_corpus(spark, sf_dir)
    tokenized = bpe.bpe_tokenize_words(vocab, merges)
    toks = tokenized.select(
        "cnt",
        F.explode(
            F.split(
                F.expr("substring(bpe_tokens, 2, length(bpe_tokens) - 2)"),
                r"\)\(",
            )
        ).alias("token"),
    )
    freq = toks.groupBy("token").agg(F.sum("cnt").alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return freq.withColumn(
        "token_id", F.row_number().over(w).cast("long")
    )


BPE_VOCAB_SQL = f"""
{_bpe_unrolled_with()},
toks AS (
    SELECT v.cnt,
           unnest(string_split(substr(v.s, 2, length(v.s) - 2), ')(')) AS token
    FROM v{N_BPE_MERGES} v
),
freq AS (
    SELECT token, CAST(sum(cnt) AS BIGINT) AS freq FROM toks GROUP BY 1
)
SELECT token, freq,
       row_number() OVER (ORDER BY freq DESC, token ASC) AS token_id
FROM freq
"""

QUERIES["bpe_vocab"] = (q_bpe_vocab, BPE_VOCAB_SQL)


# round 15: route every embeddings-reading oracle through the vector
# validity contract (the Spark twin is the _emb ingest guard above).
# Mechanical: any registered SQL that references the embeddings table
# gets the rename-CTE wrap; queries already green on dirty data are
# unaffected row-wise (the guard is a no-op on valid vectors).
import re as _re_r15  # noqa: E402

for _n, _entry in list(QUERIES.items()):
    _sql = _entry[1]
    if _sql and _re_r15.search(r"\bembeddings\b", _sql):
        QUERIES[_n] = (_entry[0], valid_embeddings_sql(_sql), *_entry[2:])
del _n, _entry, _sql
