"""True fixed-merge byte-pair-encoding tokenization (VERDICT r06 item 3).

Implements the standard Sennrich et al. 2016 BPE recipe ("Neural Machine
Translation of Rare Words with Subword Units") the way a corpus-curation
pipeline runs it at scale:

- **Fit** operates on the VOCABULARY (distinct words weighted by corpus
  frequency), not the corpus — the classic trick that makes BPE training
  cost O(|vocab|) per round regardless of corpus size. Each round counts
  adjacent token pairs (weighted by word count), picks the most frequent
  pair with a deterministic tie-break (count DESC, then pair
  lexicographically ASC), and merges every occurrence of that pair
  greedily left-to-right.
- **Apply** is R chained literal string replacements inside whole-stage
  codegen — no Python in the loop.

Token sequences are represented as paren-wrapped strings: the word "the"
starts as ``(t)(h)(e)``; merging (t, h) rewrites ``(t)(h)`` → ``(th)``
giving ``(th)(e)``. Because ``replace`` in both Spark and DuckDB is
literal, non-overlapping, and left-to-right, one replace-all per merge
rule IS the greedy left-to-right BPE merge pass (e.g. ``(a)(a)(a)`` with
rule (a, a) becomes ``(aa)(a)``, exactly the fold semantics), and the
whole apply step is engine-exact string arithmetic — which is what makes
the operator value-oracle-checkable via unrolled-merge CTEs (the LPA
unrolled-fixpoint recipe).

Scale design (100 TB): the corpus is touched exactly twice — once to
build the weighted vocabulary (one partial-agg'd groupBy) and once to
join the per-word token counts back (broadcast: the vocab is orders of
magnitude smaller than the corpus). Each fit round runs on the vocab
only: a bounded (max word length)× pair explode, one partial-agg'd
count, and a 1-row argmax whose collect is metadata-sized loop control
(the ``operators/bloom.py`` contract), then a codegen'd literal replace.
Lineage is truncated per round like every other iterative operator.

This supersedes ``text.bpe_ish_tokens`` (the regex pretokenizer proxy),
which remains a documented fast approximation for scan-speed statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["wrap_chars", "token_count_col", "bpe_fit", "bpe_tokenize_words"]


def wrap_chars(col: Column) -> Column:
    """``"the"`` → ``"(t)(h)(e)"`` — the initial character-level token
    string. Assumes paren-free input (the word extractors feed [a-z]+
    runs only)."""
    return F.regexp_replace(col, "(.)", "($1)")


def token_count_col(s: Column) -> Column:
    """Number of tokens in a wrapped token string = count of '('."""
    return (
        F.length(s) - F.length(F.replace(s, F.lit("("), F.lit("")))
    ).cast("long")


def _adjacent_pairs(toks: Column) -> Column:
    """array<struct<x,y>> of adjacent token pairs; [] for 1-token words.

    Built with two slices + zip (slice length size-1 is 0 for singleton
    words, so there is no descending-``sequence`` edge case)."""
    left = F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    right = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    return F.zip_with(left, right, lambda x, y: F.struct(x.alias("x"), y.alias("y")))


# Driver-side fit gate (round 17): vocabularies at or below this row
# count are collected once and the merge loop runs in pure Python —
# 1 Spark job total instead of one distributed argmax job per round.
# Above it (a 100 TB crawl's typo-heavy open vocabulary is NOT
# metadata-bounded) the fit stays fully distributed, unchanged.
BPE_DRIVER_FIT_MAX_VOCAB = 500_000


def _bpe_fit_driver(
    rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The merge loop on a collected vocabulary — BIT-IDENTICAL to the
    distributed rounds: exact integer pair counts (Python int == Spark
    BIGINT sum), the same (count DESC, x ASC, y ASC) argmax (tokens are
    [a-z]+ substrings, so Python's code-point ordering == Spark's UTF-8
    byte ordering), and the same greedy left-to-right literal replace
    (``str.replace`` is literal, non-overlapping, left-to-right — the
    exact ``F.replace`` semantics the module docstring proves out).
    This is how reference BPE trainers run the loop (Sennrich et al.
    2016 release: vocabulary in memory, merges sequential)."""
    toks_list = [([c for c in w], int(c)) for w, c in rows]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for toks, cnt in toks_list:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (x, y), _c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((x, y))
        merged = x + y
        for toks, _cnt in toks_list:
            i = 0
            while i < len(toks) - 1:
                if toks[i] == x and toks[i + 1] == y:
                    toks[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def bpe_fit(
    vocab: DataFrame,
    n_merges: int = 12,
    word_col: str = "word",
    count_col: str = "cnt",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a weighted vocabulary
    (word, count). Returns the ordered merge list [(x, y), ...]; may be
    shorter than ``n_merges`` if the vocabulary runs out of adjacent
    pairs (every word fully merged).

    Round 17 (guide §1.2, the ``markov_attribution``/``pq_fit``
    bounded-collect pattern): when the vocabulary is metadata-sized
    (≤ ``BPE_DRIVER_FIT_MAX_VOCAB`` rows — decided by one cheap count
    over the checkpointed vocab) it is collected ONCE and the merge loop
    runs on the driver, replacing ``n_merges`` distributed argmax jobs
    (each of which re-evaluated the growing replace chain over the vocab)
    with pure Python over the same exact integers — bit-identical merges
    (see ``_bpe_fit_driver``). Past the gate the fit stays distributed:
    each round's argmax is ONE row collected for loop control, all
    counting partial-aggregated.
    """
    v = vocab.select(
        F.col(word_col).alias("word"),
        F.col(count_col).cast("long").alias("cnt"),
        wrap_chars(F.col(word_col)).alias("s"),
    ).localCheckpoint()
    if v.count() <= BPE_DRIVER_FIT_MAX_VOCAB:
        rows = v.select("word", "cnt").collect()
        return _bpe_fit_driver(
            [(r["word"], r["cnt"]) for r in rows], n_merges
        )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        toks = F.split(
            F.expr("substring(s, 2, length(s) - 2)"), r"\)\("
        )
        top = (
            v.select("cnt", F.explode(_adjacent_pairs(toks)).alias("p"))
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("x").asc(), F.col("y").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        x, y = top[0]["x"], top[0]["y"]
        merges.append((x, y))
        # no per-round checkpoint: the state after r rounds is just r
        # chained literal replaces over the ONE checkpointed vocab — a
        # narrow codegen projection that is cheaper to recompute inside
        # the next round's argmax than to materialize every round
        # (measured: dropping the 12 intermediate localCheckpoints cut
        # the fit's job count nearly in half)
        v = v.withColumn(
            "s",
            F.replace(
                F.col("s"), F.lit(f"({x})({y})"), F.lit(f"({x}{y})")
            ),
        )
    return merges


def bpe_tokenize_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Apply a fixed merge table to distinct words: adds ``bpe_tokens``
    (the wrapped token string) and ``n_subword_tokens``. Pure chained
    literal replaces — stays in whole-stage codegen."""
    s = wrap_chars(F.col(word_col))
    for x, y in merges:
        s = F.replace(s, F.lit(f"({x})({y})"), F.lit(f"({x}{y})"))
    return words.withColumn("bpe_tokens", s).withColumn(
        "n_subword_tokens", token_count_col(F.col("bpe_tokens"))
    )
