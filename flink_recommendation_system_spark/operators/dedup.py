"""Deduplication operators for large-scale training-data pipelines
(SURVEY.md §7 M4): exact, n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup.

Scale design:
- exact dedup shuffles a constant-size hash key, never the document body;
- MinHash/LSH turns the quadratic all-pairs problem into a band-bucket
  equi-join (candidate pairs only), the standard 100 TB-safe shape;
- SimHash is computed entirely JVM-side (explode + codegen column
  expressions, no Python in the hot path); near-dup = small Hamming
  distance on a 64-bit signature via a lossless quadrant-block equi-join;
- brute-force n-gram Jaccard is kept as the *oracle-checkable baseline* and
  is intentionally bounded (same-lang blocking) — at scale you run the LSH
  variant and use this only to validate recall on samples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._util import pin_layout as _pin
from ._util import spread_small_scan as _spread
from .text import tokens


def exact_dedup_keys(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical representative per exact-duplicate cluster: group on
    sha256(text), keep the smallest doc_id (deterministic winner).
    Output: (doc_id, text_hash)."""
    return (
        docs.select("doc_id", F.sha2(F.col(text_col), 256).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text_hash")
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Documents with exact-duplicate bodies removed (keep min doc_id)."""
    keys = exact_dedup_keys(docs, text_col).select("doc_id")
    return docs.join(keys, "doc_id", "left_semi")


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.6, block_col: str = "lang"
) -> DataFrame:
    """Near-duplicate pairs by Jaccard similarity of distinct-token sets,
    blocked on ``block_col`` (same-language candidates only) — the exact,
    quadratic baseline. Output: (a_id, b_id, jaccard) with a_id < b_id.

    Adaptive fast path: when the corpus vocabulary fits in 64 distinct
    tokens, each document's token set is packed into ONE 64-bit mask
    (bit id = rank of the token in sorted vocab — engine-independent), and
    per-pair work collapses to `bit_count(a & b)` — constant-time integer
    ops instead of hashing two arrays. Values are identical (same distinct-
    token Jaccard), so the oracle is unaffected. Vocabulary discovery is a
    tiny driver-side count, the same adaptive-planning trade AQE makes.
    """
    toks = (
        docs.select(
            F.col("doc_id"),
            F.col(block_col).alias("_block"),
            F.array_distinct(tokens("text")).alias("toks"),
        )
        .withColumn("sz", F.size("toks"))
    )
    vocab = (
        toks.select(F.explode("toks").alias("tok"))
        .distinct()
        .withColumn(
            "bit_id",
            F.row_number().over(Window.orderBy(F.col("tok").asc())) - 1,
        )
    )
    vocab_size = vocab.count()
    if vocab_size <= 64:
        # masks build per PHYSICAL ROW (round 15): grouping on doc_id
        # merged duplicated-id rows, re-adding shared bits so sum ≠ OR
        # (corrupted masks) AND collapsing the per-row pair multiset the
        # quadratic path and the oracle both produce — the surrogate rid
        # keeps "bits are unique per GROUP" true by construction
        masks = (
            toks.withColumn("_rid", F.monotonically_increasing_id())
            .select(
                "_rid", "doc_id", "_block", "sz",
                F.explode("toks").alias("tok"),
            )
            .join(F.broadcast(vocab), "tok")
            .groupBy("_rid", "doc_id", "_block", "sz")
            .agg(
                # bits are unique per row (distinct tokens) → sum == OR
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), bit_id)")).alias(
                    "mask"
                )
            )
        )
        a = masks.alias("a")
        b = masks.alias("b")
        inter = F.bit_count(F.col("a.mask").bitwiseAND(F.col("b.mask"))).cast(
            "long"
        )
        union = F.col("a.sz") + F.col("b.sz") - inter
        jac = F.round(inter.cast("double") / union, 6)
        size_ok = (
            F.least(F.col("a.sz"), F.col("b.sz")).cast("double")
            >= F.greatest(F.col("a.sz"), F.col("b.sz")) * threshold
        )
        return (
            a.join(b, F.col("a._block") == F.col("b._block"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .filter(size_ok)
            .select(
                F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"),
                jac.alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
    a = toks.alias("a")
    b = toks.alias("b")
    # One set op per pair: |A∪B| = |A|+|B|-|A∩B| (toks are distinct), so
    # array_union never materializes.
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.col("a.sz") + F.col("b.sz") - inter
    jac = F.round(inter.cast("double") / union, 6)
    # Lossless prune before the expensive set ops: jaccard(A,B) ≤
    # min(|A|,|B|)/max(|A|,|B|), so pairs whose size ratio is below the
    # threshold can never qualify. Cheap integer predicate in the join
    # condition — cuts the quadratic candidate set without changing results.
    size_ok = (
        F.least(F.col("a.sz"), F.col("b.sz")).cast("double")
        >= F.greatest(F.col("a.sz"), F.col("b.sz")) * threshold
    )
    return (
        a.join(b, F.col("a._block") == F.col("b._block"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(size_ok)
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- MinHash + LSH -----------------------------------------------------------

# Fixed random-ish odd multipliers for the universal-hash family
# h_i(x) = (a_i * x + b_i) mod 2^61-1 over a base hash of the shingle.
_MERSENNE61 = (1 << 61) - 1


def portable_hash32(c: Column) -> Column:
    """Unsigned 32-bit base hash computable identically in Spark and DuckDB:
    the first 8 hex chars of md5 as an integer. Spark: ``conv(substr(md5(x),
    1, 8), 16, 10)``; DuckDB: ``CAST('0x' || substr(md5(x), 1, 8) AS
    BIGINT)``. Verified value-identical (tests/test_llm_ops.py)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def portable_hash64(c: Column) -> Column:
    """Signed 64-bit base hash computable identically in Spark and DuckDB:
    the first 16 hex chars of md5, two's-complement. Spark's ``conv`` with a
    negative target base yields the signed interpretation; the DuckDB twin
    parses via UBIGINT and subtracts 2^64 for values ≥ 2^63."""
    return F.conv(F.substring(F.md5(c), 1, 16), 16, -10).cast("long")


def _base32(c: Column, base_hash: str) -> Column:
    """32-bit shingle hash: ``"portable"`` → md5-derived (cross-engine,
    oracle-checkable); ``"fast"`` → xxhash64 masked to 32 bits (cheaper,
    Spark-only — DuckDB has no xxhash64, so fast-path outputs can only be
    rows-checked)."""
    if base_hash == "portable":
        return portable_hash32(c)
    if base_hash == "fast":
        return F.xxhash64(c).bitwiseAND(F.lit((1 << 32) - 1))
    raise ValueError(f"unknown base_hash {base_hash!r}")


def _base64(c: Column, base_hash: str) -> Column:
    """64-bit token hash, same portability contract as ``_base32``."""
    if base_hash == "portable":
        return portable_hash64(c)
    if base_hash == "fast":
        return F.xxhash64(c)
    raise ValueError(f"unknown base_hash {base_hash!r}")


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    # Deterministic LCG-generated (a, b) pairs; no runtime randomness.
    # Domains sized so h*a+b never overflows int64 (h < 2^32, a < 2^30,
    # b < 2^61 → h*a+b < 2^62 + 2^61 < 2^63).
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state | 1) % (1 << 30)
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE61
        params.append((a | 1, b))
    return params


def char_shingles(col: str | Column, n: int = 5) -> Column:
    """Character n-gram shingle set of the text (distinct). NOTE: not on
    the MinHash hot path — ``minhash_signatures`` generates shingles by
    exploding an index column instead (all-codegen; the higher-order
    ``transform`` here is CodegenFallback), and skips the distinct because
    min over a multiset equals min over its set."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - n + 1, F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(n))))


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    shingle_n: int = 5,
    base_hash: str = "portable",
) -> DataFrame:
    """MinHash signature per document: min over shingles of each universal
    hash of a 32-bit base hash of the shingle (``base_hash``: "portable" =
    md5-derived, identical in DuckDB → full value oracle; "fast" = xxhash64).
    Output: (doc_id, sig ARRAY<BIGINT>).

    Physical design: explode a shingle INDEX column and generate each
    shingle with a codegen ``substr`` — no higher-order functions anywhere
    (``transform``-built shingle arrays are CodegenFallback, interpreted
    per element; the hash-side HOF form measured ~10× slower in round 1).
    Duplicate shingles are NOT deduped: min over a multiset equals min
    over its set, so the signature is unchanged and the dedup pass is pure
    cost. All ``num_hashes`` universal hashes are plain codegen column
    expressions over one partially-aggregated ``min`` each, so shuffle
    volume is num_hashes longs per doc regardless of document size.
    """
    n = shingle_n
    # NULL-text docs are unfingerprintable and EXCLUDED (round 15): Spark's
    # greatest() IGNORES NULLs, so length(NULL)-n+1 fell through to the
    # 1-shingle floor and every NULL-text doc got an identical all-NULL
    # signature — one giant spurious bucket in the verification-free
    # aggressive tier (DuckDB's range over a NULL bound yields no rows, so
    # the oracle never saw them)
    exploded = (
        _spread(docs)
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.length("text") - n + 1, F.lit(1))
                )
            ).alias("i"),
        )
        .select(
            "doc_id", F.col("text").substr(F.col("i"), F.lit(n)).alias("shingle")
        )
        .withColumn("h", _base32(F.col("shingle"), base_hash))
    )
    params = _hash_params(num_hashes)
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE61)).alias(
            f"m{i}"
        )
        for i, (a, b) in enumerate(params)
    ]
    agg = exploded.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id",
        F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
    base_hash: str = "portable",
) -> DataFrame:
    """MinHash-LSH near-dup candidates: band the signature (rows =
    num_hashes/bands), bucket-join on (band_idx, band), then verify
    candidates with the estimated Jaccard (fraction of equal signature
    components). Output: (a_id, b_id, est_jaccard), a_id < b_id.

    This is the scale path: no quadratic pair generation — candidate pairs
    come from an equi-join on band buckets.
    """
    sigs = minhash_signatures(
        docs, num_hashes, shingle_n, base_hash
    ).localCheckpoint()
    # the checkpointed signature table inherits the AQE-coalesced 1-2
    # partition layout of the signature partial-agg; the band join and the
    # 32-component verification fold downstream are CPU-bound, so re-pin
    # (a cheap exchange of num_hashes longs per doc over an
    # already-materialized relation) — see _util.pin_layout
    sigs = _pin(sigs, "doc_id")
    return minhash_pairs_from_signatures(sigs, num_hashes, bands, threshold)


def minhash_pairs_from_signatures(
    sigs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidate generation + verification over an EXISTING signature
    table (``minhash_signatures`` output, in-memory or parquet) — lets one
    signature pass feed pairs, clustering, and dedup without recomputation
    (see ``publish_corpus_artifacts``)."""
    banded = _banded(sigs, num_hashes, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    return _verify_pairs(cand, sigs, num_hashes, threshold)


def minhash_bucket_edges(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    base_hash: str = "portable",
) -> DataFrame:
    """Verification-free banded-MinHash candidate edges — the AGGRESSIVE
    dedup tier production crawl pipelines run when near-dup clusters are
    huge: every doc links to the MIN doc_id of each of its band buckets
    (a star per bucket), and docs sharing any bucket merge transitively.

    Why it exists beside ``minhash_lsh_pairs``: emitting all VERIFIED
    pairs is Θ(Σ|cluster|²) — the round-8 sf1 probe measured 36.7 M
    verified pairs from 50 k docs (one giant near-dup cluster), 98× pair
    growth at 10× input. Star edges are LINEAR: exactly docs × bands
    rows before dedup, whatever the cluster structure. The trade is
    precision — a pair sharing one band merges even if its estimated
    Jaccard is below threshold (P[band collision] at similarity s is
    1−(1−s^r)^b) — which is why this is a separate, honestly-named tier
    and not a rewrite of the verified one. Recall is a superset of the
    verified tier's by construction.

    Output: (src, dst) star edges, src = bucket min < dst, distinct.
    """
    sigs = minhash_signatures(
        docs, num_hashes, shingle_n, base_hash
    ).localCheckpoint()
    sigs = _pin(sigs, "doc_id")
    banded = _banded(sigs, num_hashes, bands)
    roots = banded.groupBy("band_idx", "band").agg(
        F.min("doc_id").alias("src")
    )
    return (
        banded.join(roots, ["band_idx", "band"])
        .filter(F.col("doc_id") != F.col("src"))
        .select("src", F.col("doc_id").alias("dst"))
        .distinct()
    )


def _banded(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band_idx, band ARRAY<BIGINT>) — one row per signature band.

    The bucket key is the band slice ITSELF, not a hash of it: Spark
    shuffles and equi-joins array columns natively, the rows-per-band
    payload is a few longs (no material cost over a 32-bit digest), and
    exact band equality means the candidate set has zero hash-collision
    noise — which is what lets the DuckDB oracle reproduce the pair set
    exactly (a murmur3 band_hash would be Spark-only)."""
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must be a positive multiple of "
            f"bands={bands}; otherwise trailing signature components would "
            "silently drop out of every band"
        )
    rows = num_hashes // bands
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("sig"), i * rows + 1, rows)
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band"),
    )


def _verify_pairs(
    cand: DataFrame, sigs: DataFrame, num_hashes: int, threshold: float
) -> DataFrame:
    """Attach the estimated Jaccard (fraction of equal signature components)
    to candidate (a_id, b_id) pairs and keep those above threshold."""
    sa = sigs.select(F.col("doc_id").alias("a_id"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("b_id"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / num_hashes
    )
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def publish_minhash_signatures(
    docs: DataFrame,
    path: str,
    num_hashes: int = 32,
    shingle_n: int = 5,
    base_hash: str = "portable",
) -> None:
    """Persist the corpus signature store — the state an incremental
    near-dup pipeline carries between ingestion batches. At 100 TB this is
    the whole point: signatures are num_hashes longs per doc (vs the raw
    bodies), and new batches pair against THIS table instead of re-pairing
    the corpus."""
    minhash_signatures(docs, num_hashes, shingle_n, base_hash).write.mode(
        "overwrite"
    ).parquet(path)


#: Meta columns embedded in published band tables (constant literals —
#: parquet RLE encodes them to nothing) so a consumer can validate the
#: banding parameters instead of trusting the caller to remember them.
_BAND_META_COLS = ("num_hashes", "bands", "base_hash")


def publish_minhash_bands(
    store_sigs: DataFrame,
    path: str,
    num_hashes: int = 32,
    bands: int = 8,
    base_hash: str = "portable",
) -> None:
    """Persist the BANDED projection of a signature store, partitioned by
    band_idx. A continuous-ingestion deployment publishes this alongside
    ``publish_minhash_signatures`` so each batch's candidate join reads the
    banded parquet directly instead of re-deriving the banding from the
    signature table — the per-batch store cost drops from an O(corpus)
    projection to a partition-pruned scan of exactly the band rows the
    join touches.

    The full banding config ``(num_hashes, bands, base_hash)`` is embedded
    as constant meta columns (free under parquet RLE): a consumer joining
    against a store published with ANY different config — including
    equal-rows-per-band configs like 16/4 vs 32/8, or a different base
    hash, where band-array lengths alone cannot reveal the mismatch —
    fails loudly instead of silently dropping every cross-store candidate.
    ``base_hash`` is declarative: state the hash that produced
    ``store_sigs`` (the signature table does not carry it)."""
    banded = (
        _banded(store_sigs, num_hashes, bands)
        .withColumn("num_hashes", F.lit(num_hashes))
        .withColumn("bands", F.lit(bands))
        .withColumn("base_hash", F.lit(base_hash))
    )
    banded.write.mode("overwrite").partitionBy("band_idx").parquet(path)


def incremental_minhash_pairs(
    new_docs: DataFrame,
    store_sigs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
    base_hash: str = "portable",
    check_disjoint: bool = True,
    store_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs *introduced by a new ingestion batch* against an
    existing corpus signature store (``publish_minhash_signatures`` /
    ``minhash_signatures`` output): candidates are (new × store) ∪
    (new × new) — store × store is never re-paired, because those pairs were
    emitted when their docs arrived. This is the continuous-ingestion shape:
    per-batch PAIRING cost scales with the batch and its collisions, not the
    corpus. The banding projection of ``store_sigs`` is an O(corpus) scan
    per batch (narrow, no shuffle) unless ``store_bands`` — a persisted
    ``publish_minhash_bands`` table — is supplied, in which case the
    candidate join reads the pre-banded parquet as-is.

    Contract: ``new_docs`` ids are disjoint from the store's — a violated
    contract would silently emit self-pairs/collapsed pairs through the
    least/greatest canonicalization, so ``check_disjoint`` (default on)
    asserts id-disjointness with one cheap semi-join count. Output:
    (a_id, b_id, est_jaccard) with a_id < b_id, identical values to running
    ``minhash_lsh_pairs`` on the full corpus and keeping pairs that touch a
    new doc (asserted in tests).
    """
    new_sigs = minhash_signatures(
        new_docs, num_hashes, shingle_n, base_hash
    ).localCheckpoint()
    return incremental_pairs_from_signatures(
        new_sigs,
        store_sigs,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        check_disjoint=check_disjoint,
        store_bands=store_bands,
        base_hash=base_hash,
    )


def incremental_pairs_from_signatures(
    new_sigs: DataFrame,
    store_sigs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    check_disjoint: bool = True,
    store_bands: DataFrame | None = None,
    base_hash: str | None = None,
) -> DataFrame:
    """``incremental_minhash_pairs`` with the batch's signatures ALREADY
    computed — the form callers use when the signature pass is shared with
    other sinks (streaming.near_dup computes sigs once per micro-batch and
    feeds both the store write and this join). ``base_hash`` (when known)
    is validated against a meta-carrying ``store_bands`` table; pass None
    to skip that dimension of the check."""
    if check_disjoint:
        overlap = (
            new_sigs.select("doc_id")
            .join(store_sigs.select("doc_id"), "doc_id", "left_semi")
            .limit(1)
            .count()
        )
        if overlap:
            raise ValueError(
                "incremental_minhash_pairs: new_docs doc_ids overlap the "
                "signature store; pairs would silently collapse. Dedup the "
                "batch against the store first."
            )
    nb = _banded(new_sigs, num_hashes, bands)
    if store_bands is not None:
        # Guard the silent-mismatch hazard: a band table published with a
        # different (num_hashes, bands, base_hash) produces band values the
        # new side can never equal, so every cross-store candidate would
        # quietly vanish. Meta-carrying tables (publish_minhash_bands)
        # validate all three; legacy tables fall back to the structural
        # checks (rows-per-band + band count), which cannot catch
        # equal-ratio or base-hash mismatches.
        if all(c in store_bands.columns for c in _BAND_META_COLS):
            meta = store_bands.select(*_BAND_META_COLS).take(1)
            if meta:
                m = meta[0]
                mismatches = []
                if m["num_hashes"] != num_hashes:
                    mismatches.append(
                        f"num_hashes {m['num_hashes']} != {num_hashes}"
                    )
                if m["bands"] != bands:
                    mismatches.append(f"bands {m['bands']} != {bands}")
                if base_hash is not None and m["base_hash"] != base_hash:
                    mismatches.append(
                        f"base_hash {m['base_hash']!r} != {base_hash!r}"
                    )
                if mismatches:
                    raise ValueError(
                        "store_bands published with different banding "
                        f"config ({'; '.join(mismatches)}); republish the "
                        "band table with matching parameters"
                    )
            sb = store_bands.drop(*_BAND_META_COLS)
        else:
            first = store_bands.select(F.size("band").alias("n")).take(1)
            expected = num_hashes // bands
            if first and first[0]["n"] != expected:
                raise ValueError(
                    f"store_bands rows-per-band {first[0]['n']} != "
                    f"num_hashes//bands {expected}; republish the band "
                    "table with matching parameters"
                )
            n_band_idx = store_bands.agg(
                (F.max("band_idx") + 1).alias("n")
            ).take(1)
            if n_band_idx and n_band_idx[0]["n"] not in (None, bands):
                raise ValueError(
                    f"store_bands band count {n_band_idx[0]['n']} != "
                    f"bands {bands}; republish the band table with "
                    "matching parameters"
                )
            sb = store_bands
    else:
        sb = _banded(store_sigs, num_hashes, bands)

    band_keys = ["band_idx", "band"]
    cross = (
        nb.alias("a")
        .join(sb.alias("b"), band_keys)
        # equal ids never pair (the incremental_semantic_pairs guard,
        # mirrored here by the r14 review): for disjoint inputs this is a
        # no-op, and under at-least-once redelivery (the same doc re-sent
        # in a LATER batch, past the before_batch store exclusion) it
        # stops the est_jaccard-1.0 self-pair from dropping the document
        # against its own store copy
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("a_id"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("b_id"),
        )
    )
    within = (
        nb.alias("a")
        .join(
            nb.alias("b"),
            band_keys,
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
    )
    cand = cross.unionByName(within).distinct()
    all_sigs = store_sigs.select("doc_id", "sig").unionByName(
        new_sigs.select("doc_id", "sig")
    )
    return _verify_pairs(cand, all_sigs, num_hashes, threshold)


def near_dup_pipeline(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
    base_hash: str = "portable",
) -> DataFrame:
    """Production near-dup ordering: **exact dedup first, MinHash second.**

    LSH candidate generation is quadratic in exact-duplicate cluster size
    (measured: a corpus of 10 exact copies exploded candidates 30,000×,
    PERFORMANCE.md), while exact dedup is a single constant-size-key
    shuffle. Running it first bounds the near-dup candidate set to the
    distinct corpus. Output: (a_id, b_id, est_jaccard) over exact-dedup
    survivors (cluster representatives, min doc_id).
    """
    survivors = exact_dedup(docs)
    return minhash_lsh_pairs(
        survivors, num_hashes, bands, shingle_n, threshold, base_hash
    )


# --- SimHash ----------------------------------------------------------------


def simhash(docs: DataFrame, base_hash: str = "portable") -> DataFrame:
    """64-bit SimHash over whitespace tokens, fully JVM-side: per token a
    64-bit base hash (``base_hash``: "portable" = md5-derived signed 64,
    identical in DuckDB → full value oracle; "fast" = xxhash64); per bit
    position, sum of ±1 contributions across tokens; the signature packs
    the sign bits. Output: (doc_id, simhash BIGINT).

    Physical design (same explode+codegen pattern as ``minhash_signatures``):
    explode distinct tokens to rows, evaluate the 64 per-bit ±1 contributions
    as plain codegen column expressions, and partial-aggregate one ``sum``
    per bit. The previous form — 64 higher-order ``F.aggregate`` folds over
    the token array — is CodegenFallback (interpreted per element per bit);
    this form stays inside whole-stage codegen and ships 64 longs per doc
    through the shuffle regardless of document size. NULL-text documents
    are EXCLUDED (round 15): they have no features to fingerprint — the
    old ``explode_outer`` assigned them all signature 0, which made every
    pair of them a spurious Hamming-0 "near-dup" (quadratic junk on a
    dirty corpus), while the oracle's token unnest never saw them at all.
    """
    toked = _spread(docs).select(
        "doc_id",
        F.explode(F.array_distinct(tokens("text"))).alias("tok"),
    ).withColumn("h", _base64(F.col("tok"), base_hash))

    def contrib(b: int):
        return (
            F.when(F.col("tok").isNull(), 0)
            .when(
                F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                1,
            )
            .otherwise(-1)
        )

    agg = toked.groupBy("doc_id").agg(
        *[F.sum(contrib(b)).alias(f"s{b}") for b in range(64)]
    )
    sig = None
    for b in range(64):
        # bit 63 is the sign bit of the packed long: add -2^63 (two's
        # complement) instead of the unrepresentable +2^63 literal.
        weight = F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")
        bit = F.when(F.col(f"s{b}") > 0, weight).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    return agg.select("doc_id", sig.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures: native popcount of
    XOR — one codegen expression (the hand-unrolled 64-term shift/mask sum
    this replaces built a 190-node tree that defeats whole-stage codegen,
    the same lesson as the unrolled dot product in PERFORMANCE.md)."""
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


def simhash_near_dups(
    docs: DataFrame, max_hamming: int = 3, base_hash: str = "portable"
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance. Candidate generation
    blocks on 16-bit signature quadrants (a pair within Hamming ≤ 3 of a
    64-bit signature must agree exactly on ≥1 of 4 quadrants — pigeonhole),
    so this is bucket-equi-join shaped, not quadratic. The blocking is
    LOSSLESS for ``max_hamming ≤ 3``, so the output is exactly {pairs with
    Hamming ≤ max_hamming} — which is why the DuckDB oracle can use the
    simpler brute-force formulation and still match value-for-value.
    ``max_hamming > 3`` breaks the pigeonhole guarantee (4 differing bits
    can touch all 4 quadrants) and is rejected rather than silently
    missing pairs; for larger radii use narrower blocks (8 × 8-bit blocks
    are lossless to Hamming ≤ 7) or MinHash."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming={max_hamming} outside [0, 3]: quadrant blocking "
            "is only lossless up to Hamming 3; silently returning a "
            "partial pair set would violate the output contract"
        )
    sigs = simhash(docs, base_hash).localCheckpoint()
    quads = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), q * 16).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for q in range(4)
                ]
            )
        ).alias("quad_idx", "quad"),
    )
    a = quads.alias("a")
    b = quads.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.quad_idx") == F.col("b.quad_idx"))
            & (F.col("a.quad") == F.col("b.quad"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.doc_id").alias("b_id"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def quality_representatives(clusters: DataFrame, docs: DataFrame) -> DataFrame:
    """The keep-the-best-copy survivor per near-dup cluster: argmax by
    (quality_score DESC, n_chars DESC, doc_id ASC) over a (doc_id,
    cluster_id) cluster map — the single definition of the FineWeb-style
    representative policy, shared by ``publish_corpus_artifacts`` and the
    registered ``deduped_corpus_quality`` query (parity test-pinned).
    Output: 1-column (doc_id); consumers attach it with a left_semi, so
    its row multiplicity is free.

    Round 17 (guide §2.3, VERDICT r16 item 2): a singleton cluster always
    elects its own member — the argmax over a 1-element group is the
    identity — so the expensive part (text tokenization in
    ``quality_stats`` + the per-cluster argmax shuffle) now runs only
    over clusters with ≥ 2 map rows; size-1 clusters keep their doc_id by
    construction. On a production corpus the singleton majority bypasses
    the scoring pass entirely. Value-identical on all inputs: a size-1
    group's argmax returns its only doc_id whatever its score, and a
    size-≥2 group whose rows share one doc_id (duplicated ids) returns
    that doc_id from the argmax exactly as before. The cluster map is
    materialized once (three consumers would otherwise re-derive the
    LSH + connected-components lineage)."""
    from ._util import pin_layout
    from .text import quality_stats

    cmap = pin_layout(clusters, "cluster_id").localCheckpoint(eager=False)
    sizes = cmap.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("_n"))
    multi_clusters = sizes.filter(F.col("_n") >= 2).select("cluster_id")
    multi = cmap.join(multi_clusters, "cluster_id", "left_semi")
    singles = cmap.join(
        multi_clusters, "cluster_id", "left_anti"
    ).select("doc_id")
    # score ONLY the docs that sit in a real (≥2-member) cluster — the
    # semi-join precedes quality_stats so the tokenization pass prunes
    multi_docs = docs.join(
        multi.select("doc_id"), "doc_id", "left_semi"
    )
    scored = quality_stats(multi_docs).select("doc_id", "quality_score")
    best = (
        multi.join(scored, "doc_id")
        .join(multi_docs.select("doc_id", "n_chars"), "doc_id")
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
    return best.unionByName(singles)


def publish_corpus_artifacts(
    docs: DataFrame,
    base_path: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
    base_hash: str = "portable",
    representative: str = "min_id",
) -> dict[str, str]:
    """One-pass corpus-hygiene publication — the production shape of the
    dedup suite. Computes MinHash signatures ONCE and derives every
    artifact from them (the registered per-query forms recompute for
    oracle isolation; a 100 TB build must not):

    - ``signatures/``  (doc_id, sig)            — the incremental-ingest state
    - ``pairs/``       (a_id, b_id, est_jaccard) — near-dup edges
    - ``clusters/``    (doc_id, cluster_id)      — star-CC doc→canonical map
    - ``corpus/``      deduped documents          — cluster representatives only

    ``representative`` picks the survivor per cluster: ``"min_id"`` (the
    cluster id itself) or ``"quality"`` — argmax by (quality_score,
    n_chars, -doc_id), the FineWeb-style keep-the-best-copy policy
    (requires ``text``/``n_chars`` columns; one extra max_by partial agg
    over the cluster map, no additional shuffle of the corpus).

    Returns {artifact: path}. All four are plain parquet; downstream
    training jobs read ``corpus/``, the next ingestion batch reads
    ``signatures/`` (and optionally a ``publish_minhash_bands`` table).
    """
    if representative not in ("min_id", "quality"):
        raise ValueError(f"unknown representative policy {representative!r}")
    from .graph import contracted_components, undirected

    paths = {
        name: f"{base_path}/{name}"
        for name in ("signatures", "pairs", "clusters", "corpus")
    }
    sigs = minhash_signatures(
        docs, num_hashes, shingle_n, base_hash
    ).localCheckpoint()
    sigs.write.mode("overwrite").parquet(paths["signatures"])

    pairs = minhash_pairs_from_signatures(
        sigs, num_hashes, bands, threshold
    ).localCheckpoint()
    pairs.write.mode("overwrite").parquet(paths["pairs"])

    comp = contracted_components(
        undirected(
            pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        )
    )
    clusters = (
        docs.select("doc_id")
        .join(comp, docs["doc_id"] == comp["id"], "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
        .localCheckpoint()
    )
    clusters.write.mode("overwrite").parquet(paths["clusters"])

    if representative == "quality":
        keep = quality_representatives(clusters, docs)
    else:
        keep = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
            "doc_id"
        )
    docs.join(keep, "doc_id", "left_semi").write.mode("overwrite").parquet(
        paths["corpus"]
    )
    return paths


def shared_chunk_stats(
    docs: DataFrame,
    chunk_chars: int = 128,
    max_doc_freq: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk-level boilerplate detection (the Dolma/CCNet paragraph-dedup
    shape, on fixed-size chunks since the corpus has no newline structure):
    split every document into ``chunk_chars`` chunks, count how many
    DISTINCT documents each exact chunk text appears in, and report per
    document how much of it is shared boilerplate — chunks whose document
    frequency exceeds ``max_doc_freq``. Output: (doc_id, n_chunks,
    n_boilerplate, boilerplate_ratio) with the ratio rounded to 6 dp;
    empty documents have one empty chunk, which (being shared corpus-wide)
    counts as boilerplate by construction.

    Scale shape: the only shuffles are keyed by chunk fingerprint
    (md5 of the chunk text — the 100 TB-safe move: the shuffle carries a
    32-byte key, never the chunk body) and by doc_id for the final
    per-document rollup. Both aggregations are partial (map-side combine).
    A removal pass is the natural next step (rebuild text from kept
    chunks), but the detection stats are the oracle-checkable product.
    """
    from .text import chunk_documents

    chunks = chunk_documents(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        chunk_chars=chunk_chars,
    ).select("doc_id", "chunk_idx", F.md5("chunk_text").alias("chunk_key"))
    dfreq = chunks.groupBy("chunk_key").agg(
        F.count_distinct("doc_id").alias("doc_freq")
    )
    return (
        chunks.join(dfreq, "chunk_key")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(
                F.when(F.col("doc_freq") > max_doc_freq, 1).otherwise(0)
            ).alias("n_boilerplate"),
        )
        .select(
            F.col("doc_id").alias(id_col),
            "n_chunks",
            "n_boilerplate",
            F.round(
                F.col("n_boilerplate").cast("double") / F.col("n_chunks"), 6
            ).alias("boilerplate_ratio"),
        )
    )


def repeated_spans(
    docs: DataFrame,
    n: int = 8,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring span dedup — the suffix-array-style pass of
    "Deduplicating Training Data Makes Language Models Better" (Lee et al.
    2022), re-expressed as n-gram fingerprints + island merging: find, per
    document, the MAXIMAL token spans every one of whose n-grams also
    appears in at least ``min_doc_freq - 1`` OTHER documents. Those spans
    are verbatim cross-document repeats (licenses, headers, templated
    boilerplate) that a removal pass would cut mid-document — doc-level
    near-dup (MinHash) can't see them when the rest of the doc differs.

    Reference anchor: complements the doc-granularity dedup the reference's
    pipeline performs on exact review tuples (``DataPreparation.java``
    DISTINCT); this is the sub-document generalization a 100 TB corpus
    needs.

    Algorithm (all codegen + two keyed shuffles, no Python):
      1. every n-gram occurrence → (doc_id, pos, gram_key=md5(gram)); the
         shuffle carries the 16-byte key, never the gram text;
      2. gram doc-frequency via partial-aggregated count_distinct;
      3. keep positions whose gram is cross-document frequent;
      4. gaps-and-islands per doc (pos - row_number() is constant within a
         run of consecutive duplicated positions) → merge to maximal spans
         [start_pos, end_pos + n - 1].

    Output: (doc_id, span_start, span_end, span_tokens) in TOKEN indices
    (0-based, end inclusive). Exact integer logic → fully oracle-checkable.

    Scale: step 2's group key is the gram hash — partial agg bounds the
    shuffle by distinct grams; step 4's window sort is per-doc (bounded by
    doc length, never global). At 100 TB, positions-of-frequent-grams is
    the only materialized intermediate and is proportional to the
    duplicated volume, not the corpus.
    """
    # gram construction is ROW-LOCAL (round 15 — see lm._bigrams): the
    # lead window partitions on a surrogate physical-row id so duplicate
    # or NULL doc ids cannot interleave two rows' positions; the island
    # stage below stays doc-keyed, exactly like the oracle
    grams = (
        docs.withColumn("_rid", F.monotonically_increasing_id()).select(
            F.col(id_col).alias("doc_id"),
            "_rid",
            F.posexplode(tokens(text_col)).alias("pos", "t0"),
        )
    )
    w_row = Window.partitionBy("_rid").orderBy("pos")
    lead_cols = [F.col("t0")] + [
        F.lead("t0", k).over(w_row).alias(f"t{k}") for k in range(1, n)
    ]
    w = Window.partitionBy("doc_id").orderBy("pos")
    positioned = (
        grams.select("doc_id", "pos", *lead_cols)
        .filter(F.col(f"t{n - 1}").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.md5(F.concat_ws(" ", *[f"t{k}" for k in range(n)])).alias(
                "gram_key"
            ),
        )
    )
    dfreq = positioned.groupBy("gram_key").agg(
        F.count_distinct("doc_id").alias("doc_freq")
    )
    dup_pos = (
        positioned.join(
            dfreq.filter(F.col("doc_freq") >= min_doc_freq).select("gram_key"),
            "gram_key",
            "left_semi",
        )
        .select("doc_id", "pos")
    )
    island = (F.col("pos") - F.row_number().over(w)).alias("island")
    return (
        dup_pos.select("doc_id", "pos", island)
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 1,
    max_len: int = 64,
) -> DataFrame:
    """Edit-distance near-duplicate candidate join (entity-resolution /
    fuzzy-dedup tier — the dedup family the exact/MinHash/SimHash/embedding
    tiers don't cover): all id pairs whose strings are within Levenshtein
    distance ``max_dist`` (1 or 2), found via FastSS deletion-neighborhood
    blocking.

    Blocking (Bocek et al., "Fast Similarity Search in Large Dictionaries"):
    each string emits L+1 signatures — itself plus every single-character
    deletion. Two strings within edit distance 1 ALWAYS share a signature
    (substitution at i → both delete i; insertion → the shorter string IS
    one of the longer's deletions; equality → the identity signature), so
    the signature equi-join is a lossless candidate generator and the
    final ``levenshtein`` check is exact verification, not a filter over
    a heuristic. Naive prefix/suffix pigeonhole blocking degenerates on
    shared-prefix corpora (every TPC-H name starts 'Customer#' → one
    quadratic block); deletion blocks stay near-singleton regardless of
    shared affixes, so candidates scale linearly in row count.

    At 100 TB: the signature explode is a bounded (L+1)× row
    amplification with no shuffle; candidates shuffle once on the
    signature, the pair-distinct shuffles once on (id1, id2); the
    verification uses Spark's thresholded ``levenshtein(l, r, 1)``
    (O(L) band, early-exit) rather than the full O(L²) matrix.

    ``max_dist`` ∈ {1, 2}. FastSS-1 emits L+1 signatures per row (self +
    single deletions). FastSS-2 (VERDICT r06 item 5) emits the full
    ≤2-deletion neighborhood — 1 + L + C(L,2) signatures — because
    ed(s, t) ≤ k guarantees the k-deletion neighborhoods intersect
    (delete the ≤k mismatched positions from each side), so the blocking
    stays lossless at k=2; the quadratic amplification is why the k=2
    tier carries a ``max_len`` length cap (rows with
    ``length(text) > max_len`` are EXCLUDED from the join — a documented
    input contract, mirrored by the oracle — bounding amplification at
    1 + max_len + C(max_len, 2) ≈ 2 k signatures/row at the default 64).
    """
    if max_dist not in (1, 2):
        raise ValueError(
            "edit_distance_pairs supports max_dist in {1, 2} (FastSS-1/2)"
        )
    # a sub-split-size input scans as ONE partition and this operator's
    # whole cost is CPU downstream of it (signature explode, then the
    # banded-levenshtein verification of every candidate — measured 7.5 s
    # single-core vs 1.5 s spread at sf0.1, where the broadcast self-join
    # preserves the scan's 1-partition layout end to end); no-op at real
    # scale where the table has many splits
    df = _spread(df)
    deletions = (
        f"transform(sequence(1, length({text_col})), "
        f"i -> concat(substring({text_col}, 1, i-1), "
        f"substring({text_col}, i+1, length({text_col}))))"
    )
    sig_arrays = f"array_prepend({deletions}, {text_col})"
    if max_dist == 2:
        # ordered position pairs i < j, deleting both; the inner sequence
        # guard (i+1 > L → CASE to empty) avoids Spark's DESCENDING
        # sequence(a, b) when a > b
        two_del = (
            f"CASE WHEN length({text_col}) >= 2 THEN "
            f"flatten(transform(sequence(1, length({text_col}) - 1), "
            f"i -> transform(sequence(i + 1, length({text_col})), "
            f"j -> concat(substring({text_col}, 1, i-1), "
            f"substring({text_col}, i+1, j-i-1), "
            f"substring({text_col}, j+1, length({text_col}))))))"
            f" ELSE CAST(array() AS ARRAY<STRING>) END"
        )
        sig_arrays = f"concat({sig_arrays}, {two_del})"
        df = df.filter(F.length(F.col(text_col)) <= max_len)
    # the signature string only needs to EQUI-join — hash it to a 64-bit
    # key (separate projection: generators can't nest in expressions) so
    # the self-join exchanges 8-byte longs instead of ~L-char strings; a
    # hash collision merely adds a candidate the exact verify removes
    sigs = df.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(F.expr(sig_arrays)).alias("_sig_str"),
    ).select(
        F.col(id_col),
        F.col(text_col),
        F.xxhash64("_sig_str").alias("sig"),
    )
    if max_dist == 2:
        # dedup (id, sig) BEFORE the join: at k=2 one string emits the
        # same variant via many deletion-position choices (e.g. repeated
        # characters), and a near-pair can share dozens of signatures —
        # the distinct caps candidate multiplicity at |distinct shared
        # sigs| for one extra (bounded, pre-shrunk) shuffle. At k=1 the
        # multiplicity is ≤ 2, not worth the exchange.
        sigs = sigs.distinct()
        # pin the post-distinct layout on the join key: AQE coalesces the
        # small distinct exchange to ONE partition (size-based, blind to
        # downstream CPU) and the broadcast self-join then runs every
        # banded-levenshtein verification on a single core (measured
        # 5.4 → 1.9 s at sf0.1) — see _util.pin_layout
        sigs = _pin(sigs, "sig")
    a, b = sigs.alias("a"), sigs.alias("b")
    dist = F.levenshtein(
        F.col(f"a.{text_col}"), F.col(f"b.{text_col}"), max_dist
    )  # -1 when the band exceeds max_dist
    # verify BEFORE the pair-dedup: the banded levenshtein is a cheap
    # map-side scalar, while the distinct is a shuffle — filtering first
    # shrinks the shuffle to the true pairs (× their shared-signature
    # multiplicity) and drops the strings from the exchanged rows
    # entirely (dist is functionally determined by the pair)
    return (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            dist.cast("long").alias("dist"),
        )
        .filter(F.col("dist") >= 0)
        .distinct()
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    threshold_num: int = 1,
    threshold_den: int = 2,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT set-similarity join by prefix filtering (the PPJoin family —
    Chaudhuri et al. 2006, Xiao et al. 2008): all pairs with distinct-token
    Jaccard ≥ t, threshold given as the exact rational t = threshold_num /
    threshold_den so every pruning and acceptance test is pure integer
    arithmetic. Unlike `minhash_lsh_pairs` (approximate) this returns the
    EXACT pair set of `ngram_jaccard_pairs` WITHOUT the all-pairs join:

    1. order each document's token set by (global document frequency ASC,
       token ASC) — rarest first, a single total order shared by all docs;
    2. PREFIX = the first |s| − ceil(t·|s|) + 1 tokens. Two sets with
       Jaccard ≥ t MUST share a prefix token under any common total order
       (pigeonhole: missing all of A's prefix leaves fewer than ceil(t·|A|)
       common elements) — rarest-first makes prefixes selective;
    3. candidates = equi-join on (block, prefix token), id-ordered, plus
       the length filter t·max(|A|,|B|) ≤ min(|A|,|B|) (integer form);
    4. exact verification: intersection counted via two candidate-bounded
       equi-joins; accept iff t_den·|∩| ≥ t_num·(|A|+|B|−|∩|).

    Output: (a_id, b_id, jaccard) with a_id < b_id — the same contract as
    `ngram_jaccard_pairs`, so the quadratic SQL baseline is the value
    oracle AND a standing losslessness proof of the filter.

    Scale design (100 TB): every join is a bucketed equi-join on token or
    pair keys; the candidate volume is bounded by the prefix postings'
    Σ df² over RARE tokens (frequency-ascending ordering puts each doc's
    rarest tokens in its prefix), not by N²; verification touches only
    candidates. At 10× document count the frequent-token postings never
    enter the prefix join — the standard reason PPJoin scales where naive
    token-inverted-index joins explode.
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must be a rational in (0, 1]")
    tn, td = threshold_num, threshold_den
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(block_col).alias("_block"),
            F.explode(F.array_distinct(tokens(text_col))).alias("tok"),
        )
        .localCheckpoint()
    )
    sz = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    df = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("freq").asc(), F.col("tok").asc()
    )
    ranked = (
        toks.join(df, "tok")
        .withColumn("rn", F.row_number().over(w))
        .join(sz, "doc_id")
        # prefix length |s| - ceil(t*|s|) + 1; ceil(sz*tn/td) via integer
        # DIV so the whole pruning test really is integer-exact (ADVICE
        # r06: `/` is double division — a last-ulp error at adversarial
        # magnitudes could shorten the prefix by 1 and drop a pair)
        .filter(
            F.col("rn")
            <= F.col("sz")
            - F.expr(f"(sz * {tn} + {td - 1}) DIV {td}")
            + 1
        )
        .select("doc_id", "_block", "tok", "sz")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a._block") == F.col("b._block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            F.least(F.col("a.sz"), F.col("b.sz")) * td
            >= F.greatest(F.col("a.sz"), F.col("b.sz")) * tn
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.sz").alias("a_sz"),
            F.col("b.sz").alias("b_sz"),
        )
        .distinct()
    )
    t1 = toks.select(F.col("doc_id").alias("a_id"), "tok")
    t2 = toks.select(F.col("doc_id").alias("b_id"), "tok")
    inter = (
        cand.join(t1, "a_id")
        .join(t2, ["b_id", "tok"])
        .groupBy("a_id", "b_id", "a_sz", "b_sz")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    union = F.col("a_sz") + F.col("b_sz") - F.col("i")
    return inter.filter(F.col("i") * td >= union * tn).select(
        "a_id",
        "b_id",
        F.round(F.col("i").cast("double") / union.cast("double"), 6).alias(
            "jaccard"
        ),
    )
