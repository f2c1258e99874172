"""Bloom-filter decontamination — the fixed-memory variant of the
benchmark-overlap gate (`text.ngram_overlap`).

At 100 TB the distinct-gram set of a large eval/blocklist side may itself be
too big to broadcast as rows; the Bloom filter caps the broadcast at
``m_bits/8`` bytes REGARDLESS of how many grams it holds (RocksDB/Parquet
row-group filters and Spark's own runtime-filter rewrite use exactly this
shape). The filter is fitted once (a model artifact, like `ivf_fit`'s
centroids), then probing is a per-row codegen expression — no join at all
on the corpus side.

Determinism/oracle story: positions come from double hashing
(Kirsch-Mitzenmacher 2006: ``pos_i = (h1 + i·h2) mod m``) over the two
32-bit halves of ONE md5 — the same cross-engine portable-hash family as
`dedup.portable_hash32/64` — so a DuckDB oracle reproduces the EXACT bit
set, including false positives: the oracle materializes the set-bit
positions as rows and demands all ``k`` probe positions hit, which is
bit-for-bit the bitmap semantics.

Memory/accuracy: with ``n`` distinct grams, load factor ``≈ 1-e^(-kn/m)``
and fpp ``≈ load^k``. The defaults (m=2^20, k=3) hold ~20k grams at fpp
~1e-4 in 128 KiB; size m up with the eval corpus (m=2^27 = 16 MiB
broadcasts fine and holds ~10M grams).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    pos_rows = (
        keys.select(
            F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias(
                "pos"
            )
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos_rows:
        words[r.pos >> 6] |= 1 << (r.pos & 63)
    # to signed 64-bit (Spark LongType literals)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    c: Column, words: list[int], m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> Column:
    """Membership test as a pure codegen expression (no join): all ``k``
    probe bits set in the broadcast bitmap literal."""
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


def bloom_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """`text.ngram_overlap` with the eval side compressed into a Bloom
    filter: per training doc, the count of its distinct n-grams the filter
    flags (⊇ the exact overlap — false positives possible at the filter's
    fpp, never false negatives). Returns (doc_id, n_flagged) for flagged
    docs only, mirroring ``ngram_overlap``'s output contract.

    The corpus side is one scan + per-row probe + per-doc partial agg;
    nothing about the eval side is shuffled or joined.
    """
    bitmap = bloom_fit(
        token_ngrams(eval_docs, n).select("ngram").distinct(),
        m_bits=m_bits,
        k=k,
    )
    grams = token_ngrams(docs, n).select("doc_id", "ngram").distinct()
    return (
        grams.filter(bloom_might_contain(F.col("ngram"), bitmap, m_bits, k))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_flagged"))
    )
