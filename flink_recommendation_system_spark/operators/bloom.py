"""Bloom-filter decontamination — the fixed-memory variant of the
benchmark-overlap gate (`text.ngram_overlap`).

At 100 TB the distinct-gram set of a large eval/blocklist side may itself be
too big to broadcast as rows; the Bloom filter caps the broadcast at
``m_bits`` BITS regardless of how many grams it holds (RocksDB/Parquet
row-group filters and Spark's own runtime-filter rewrite use exactly this
shape). Probing is O(k) per row — no corpus-side shuffle keyed on the eval
side, ever.

Determinism/oracle story: positions come from double hashing
(Kirsch-Mitzenmacher 2006: ``pos_i = (h1 + i·h2) mod m``) over the two
32-bit halves of ONE md5 — the same cross-engine portable-hash family as
`dedup.portable_hash32/64` — so a DuckDB oracle reproduces the EXACT bit
set, including false positives: the oracle materializes the set-bit
positions as rows and demands all ``k`` probe positions hit, which is
bit-for-bit the bitmap semantics.

Three physical probe shapes, same semantics (equivalence test-pinned):

- ``impl="join"`` (default, pure JVM): the set bits live as a broadcast
  hash relation of position ints; probing explodes k positions per gram
  and broadcast-joins, keeping all-k hits. Fit is fully DISTRIBUTED —
  nothing ever collects to the driver. Broadcast size is bounded by
  ``min(k·n, m_bits)`` ints.
- ``impl="arrow"``: the classic bit ARRAY held once per executor inside an
  Arrow-vectorized probe (hashes still computed JVM-side; numpy does the
  bit tests batch-at-a-time). Use when the filter is a persisted model
  artifact (`bloom_fit` output) — e.g. a streaming gate probing a filter
  fitted yesterday. Measured equal to "join" at sf0.1 (1.9 s for 212k
  grams).
- `bloom_might_contain` (expression): the bitmap as an array LITERAL in
  the plan. Only for tiny filters (tests, m ≤ ~2^16): Spark copies the
  whole array into every output row of the enclosing operator — measured
  12.7 s vs 1.9 s at m=2^20 on the same input. Kept because it is the
  only form usable as a bare Column predicate with no session at hand.

Memory/accuracy: with ``n`` distinct grams, load factor ``≈ 1-e^(-kn/m)``
and fpp ``≈ load^k``. The defaults (m=2^20, k=3) hold ~20k grams at fpp
~1e-4; size m up with the eval corpus (m=2^27 holds ~10M grams at the same
load — 16 MiB as a bitmap, and the position relation stays ≤ m ints).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # optional: ONLY bloom_probe_arrow needs the Python data libs —
    # the pure-JVM join impl and bloom_fit/bloom_positions must stay
    # importable in a minimal environment without them (and pandas_udf
    # resolves the probe's "pd.Series" type hints via module globals,
    # so the names must exist at module level when present)
    import numpy as np
    import pandas as pd
except ImportError:  # pragma: no cover - exercised only in minimal envs
    np = None
    pd = None

from .text import token_ngrams

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 3


def _h1_h2(c: Column) -> tuple[Column, Column]:
    """Two independent 32-bit hashes from one md5: the first and second
    8-hex-char halves; h2 forced odd so the double-hash stride never
    degenerates on power-of-two ``m``."""
    md5 = F.md5(c)
    h1 = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long")
    return h1, h2.bitwiseOR(F.lit(1).cast("long"))


def _positions(c: Column, m_bits: int, k: int) -> list[Column]:
    h1, h2 = _h1_h2(c)
    return [(h1 + F.lit(i) * h2) % F.lit(m_bits) for i in range(k)]


def _positions_hoisted(
    df: DataFrame, key_col: str, m_bits: int, k: int, out: str, *, pos_only: bool
):
    """Explode the k probe positions with (h1, h2) hoisted into a
    PROJECTION first: expressions inside a Generate's array are not
    common-subexpression eliminated, so inlining ``_positions`` there pays
    2k md5s per key in the slower Generate node (the count-min-sketch
    lesson, operators.sketches._with_h1_h2). Output: the input columns
    plus ``out`` (position), and ``_probe_i`` unless ``pos_only``."""
    h1, h2 = _h1_h2(F.col(key_col))
    hashed = df.select("*", h1.alias("__h1"), h2.alias("__h2"))
    arr = F.array(
        *[
            (F.col("__h1") + F.lit(i) * F.col("__h2")) % F.lit(m_bits)
            for i in range(k)
        ]
    )
    if pos_only:
        exploded = hashed.select("*", F.explode(arr).alias(out))
    else:
        exploded = hashed.select(
            "*", F.posexplode(arr).alias("_probe_i", out)
        )
    return exploded.drop("__h1", "__h2")


def _check_m(m_bits: int) -> None:
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")


def bloom_positions(
    keys: DataFrame,
    key_col: str = "ngram",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """The filter's set-bit positions as a 1-column DataFrame ``(pos)`` —
    the fully distributed fit (nothing transits the driver); feed it to
    ``bloom_probe_join`` or aggregate it with ``bloom_fit`` into a bitmap
    artifact."""
    _check_m(m_bits)
    return (
        _positions_hoisted(
            keys.select(key_col), key_col, m_bits, k, "pos", pos_only=True
        )
        .select("pos")
        .distinct()
    )


def bloom_fit(
    keys: DataFrame,
    key_col: str = "ngram",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> list[int]:
    """Fit a Bloom filter over ``keys[key_col]``: returns the bitmap as a
    list of ``m_bits/64`` signed 64-bit words (a model artifact — the ONLY
    driver-side materialization is the distinct set-bit positions, bounded
    by ``min(k·|keys|, m_bits)`` ints, not the key rows)."""
    _check_m(m_bits)
    pos_rows = bloom_positions(keys, key_col, m_bits, k).collect()
    words = [0] * (m_bits // 64)
    for r in pos_rows:
        words[r.pos >> 6] |= 1 << (r.pos & 63)
    # to signed 64-bit (Spark LongType literals)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    c: Column, words: list[int], m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> Column:
    """Membership test with the bitmap inlined as an array LITERAL — tiny
    filters only (see module docstring; the enclosing operator copies the
    array into every row it emits)."""
    bitmap = F.lit(words)
    test = F.lit(True)
    for pos in _positions(c, m_bits, k):
        word = F.element_at(bitmap, F.floor(pos / 64).cast("int") + 1)
        # shift amount is a column → go through the SQL registry form,
        # whose second argument is a full expression
        bit = (
            F.call_function(
                "shiftrightunsigned", word, (pos % 64).cast("int")
            )
            % 2
        )
        test = test & (bit == 1)
    return test


def bloom_probe_join(
    rows: DataFrame,
    positions: DataFrame,
    key_col: str = "ngram",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Keep the rows whose ``key_col`` the filter (given as its set-bit
    ``positions``) flags: probe each DISTINCT key (explode its k positions,
    broadcast-join the position relation, demand all k hit), then semi-join
    the flagged keys back to the input — true semi-join semantics, so input
    multiplicity is preserved (duplicated rows stay duplicated) and the
    k-position explosion pays per distinct key, not per row."""
    _check_m(m_bits)
    keys = rows.select(key_col).distinct()
    probes = _positions_hoisted(keys, key_col, m_bits, k, "pos", pos_only=True)
    flagged = (
        # positions must act as a SET: a duplicated pos row (e.g. a raw
        # union of two fitted filters) would otherwise double-count one
        # hit and let a key with only k-1 set bits pass the == k check
        probes.join(F.broadcast(positions.select("pos").distinct()), "pos")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == k)
        .select(key_col)
    )
    return rows.join(flagged, key_col, "semi")


def bloom_probe_arrow(
    rows: DataFrame,
    words: list[int],
    key_col: str = "ngram",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Keep the rows the fitted bitmap flags: hashes computed JVM-side,
    bit tests Arrow-batched in numpy with the bitmap held once per
    executor (never per row)."""
    from pyspark.sql.functions import pandas_udf

    if np is None or pd is None:
        raise ImportError(
            "bloom_probe_arrow needs numpy+pandas; use impl='join' "
            "(pure JVM) in environments without them"
        )
    _check_m(m_bits)
    warr = np.array(words, dtype=np.int64).view(np.uint64)
    m_u, k_n = np.uint64(m_bits), k

    @pandas_udf("boolean")
    def _probe(h1: "pd.Series", h2: "pd.Series") -> "pd.Series":
        a = h1.to_numpy(np.int64).astype(np.uint64)
        b = h2.to_numpy(np.int64).astype(np.uint64)
        ok = np.ones(len(a), dtype=bool)
        for i in range(k_n):
            p = (a + np.uint64(i) * b) % m_u
            ok &= (
                (warr[p >> np.uint64(6)] >> (p & np.uint64(63)))
                & np.uint64(1)
            ) == 1
        return pd.Series(ok)

    h1, h2 = _h1_h2(F.col(key_col))
    # NULL keys drop deterministically, matching impl="join" (md5(NULL) is
    # NULL, which pandas delivers as NaN and int64-casts to INT64_MIN — the
    # row would otherwise be probed at an arbitrary bit position and kept
    # or dropped by luck)
    return (
        rows.filter(F.col(key_col).isNotNull())
        .withColumn("_h1", h1)
        .withColumn("_h2", h2)
        .filter(_probe("_h1", "_h2"))
        .drop("_h1", "_h2")
    )


def bloom_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    impl: str = "join",
) -> DataFrame:
    """`text.ngram_overlap` with the eval side compressed into a Bloom
    filter: per training doc, the count of its distinct n-grams the filter
    flags (⊇ the exact overlap — false positives possible at the filter's
    fpp, never false negatives). Returns (doc_id, n_flagged) for flagged
    docs only, mirroring ``ngram_overlap``'s output contract.

    ``impl="join"`` (default) never touches the driver; ``impl="arrow"``
    routes through a fitted bitmap artifact (see module docstring).
    """
    eval_grams = token_ngrams(eval_docs, n).select("ngram").distinct()
    grams = token_ngrams(docs, n).select("doc_id", "ngram").distinct()
    if impl == "join":
        flagged = bloom_probe_join(
            grams, bloom_positions(eval_grams, m_bits=m_bits, k=k),
            m_bits=m_bits, k=k,
        )
    elif impl == "arrow":
        flagged = bloom_probe_arrow(
            grams, bloom_fit(eval_grams, m_bits=m_bits, k=k),
            m_bits=m_bits, k=k,
        )
    else:
        raise ValueError(f"unknown impl {impl!r}")
    return flagged.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_flagged"))
