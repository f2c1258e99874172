"""Text-analysis operators for large-scale training-data pipelines
(SURVEY.md §7 M4; BASELINE.json north star).

All hot-path logic is built-in `pyspark.sql.functions` (JVM-side, codegen),
no Python UDFs: tokenization is `split`, counting is higher-order array
functions, fingerprinting is built-in hash functions. At 100 TB these run
inside whole-stage codegen with predicate pushdown intact.

Operates on the `documents` table (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._util import spread_small_scan as _spread

# Small public stopword set (subset of the classic English list).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# Marker tokens for the n-gram/keyword language-ID heuristic. Deliberately
# tiny and deterministic — the point is the *operator shape* (explode →
# marker join → per-doc argmax), which is how a real lexicon-based LID runs
# at scale. Ties break toward the lexicographically smaller language code.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization as a column expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def bpe_ish_tokens(col: str | Column = "text") -> Column:
    """Regex PRETOKENIZER approximation of subword counting: split on
    whitespace AND punctuation boundaries, keeping alphanumeric runs
    (GPT-2 style pretokenization on \\w/\\W boundaries). This is the
    documented fast approximation for scan-speed statistics — the TRUE
    learned-merge BPE tokenizer lives in ``operators/bpe.py`` (fit +
    greedy merge apply, value-oracled end to end as the
    ``subword_token_counts`` query)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(c, "[^a-zA-Z0-9]+")
    return F.filter(arr, lambda x: x != "")


def token_count(col: str | Column = "text") -> Column:
    """RAW whitespace-split cell count — deliberately including empty
    cells, so an empty document counts 1 and "x  y" counts 3. This is the
    parity-pinned convention every consumer (token_counts, quality_stats,
    dataset_card, length_histogram, context_packing) AND their DuckDB
    oracles share via ``len(string_split(text, ' '))``; term-level
    consumers that need non-empty tokens (BM25 dl, bigrams, readability)
    filter explicitly. Changing this to non-empty counting must change
    every oracle with it."""
    return F.size(tokens(col))


def stopword_count(col: str | Column = "text") -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.isin(*STOPWORDS)))


def quality_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality scoring: token count, mean token length,
    stopword ratio, and a composite quality score. Mirrors the classic
    C4/Gopher-style length+stopword heuristics, all JVM-side."""
    toks = tokens("text")
    n_tok = F.size(toks)
    mean_tok_len = F.round(
        F.aggregate(toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t))
        / n_tok,
        6,
    )
    sw_ratio = F.round(stopword_count("text") / n_tok, 6)
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        sw_ratio.alias("stopword_ratio"),
        # Quality: long enough, not stopword-soup. Deterministic integer
        # rules so oracles agree exactly. Each gate is CASE-shaped
        # (when/otherwise), NOT a boolean cast: on a NULL input the SQL
        # CASE falls to ELSE 0 while a cast NULL boolean stays NULL and
        # poisons the whole score (round-15 adversarial find).
        (
            F.when(n_tok >= 10, 1).otherwise(0)
            + F.when(F.col("n_chars") >= 50, 1).otherwise(0)
            + F.when(stopword_count("text") > 0, 1).otherwise(0)
        ).alias("quality_score"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Lexicon-based language ID: explode tokens, join the marker lexicon,
    argmax hits per document (ties → smaller lang code), docs with no
    marker hits → 'und'.

    Scale shape: the lexicon is broadcast (tiny dim table); the token
    explode is map-side; one shuffle on doc_id for the argmax.
    """
    spark = docs.sparkSession
    markers = spark.createDataFrame(
        [(lang, m) for lang, ms in LANG_MARKERS.items() for m in ms],
        ["pred_lang", "marker"],
    )
    hits = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .join(F.broadcast(markers), F.col("tok") == F.col("marker"))
        .groupBy("doc_id", "pred_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), F.col("pred_lang").asc()
    )
    best = hits.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).select("doc_id", "pred_lang")
    return (
        docs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("pred_lang", F.lit("und")).alias("pred_lang")
        )
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition heuristics: the fraction of
    tokens that are repeats of an earlier token, and the share of bigram
    slots taken by the single most frequent bigram. High values flag the
    boilerplate/spam documents a training-corpus gate drops. Output:
    (doc_id, dup_token_ratio, top_bigram_ratio), both rounded to 6 dp;
    documents with fewer than 2 tokens have top_bigram_ratio 0.

    Convention note (r14 review): the bigram here is a raw-SLOT
    statistic — adjacent raw split cells, EMPTY cells included, with the
    denominator n_raw_cells − 1 — deliberately different from the LM
    family's non-empty-bigram convention (``lm._bigrams``, the r13
    repo-wide unification): the ratio measures what fraction of
    adjacency SLOTS one pair occupies, so numerator and denominator
    must count the same slot population. The DuckDB oracle mirrors the
    slot form exactly.

    Scale shape: token stats are per-row codegen expressions; bigrams come
    from posexplode + a per-doc ``lead`` window — measured 3.5× faster at
    sf0.1 than building the bigram array with a higher-order ``transform``
    (CodegenFallback, interpreted per element; same lesson as the MinHash
    signature rewrite in PERFORMANCE.md). The window sort key is
    (doc_id, pos) over already-narrow rows; both aggregations after it are
    partial, so shuffle volume is bounded by distinct (doc, bigram).
    """
    # The whole statistic is PER PHYSICAL ROW (round 15): pairing,
    # aggregation, and the join back all key on a surrogate row id, never
    # doc_id — duplicate/NULL doc ids otherwise interleave two rows'
    # positions in the lead() window AND merge their bigram counts in the
    # per-doc max, neither of which the oracle's per-row construction does.
    toks = tokens("text")
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # PIN the surrogate row ids (round 16, ADVICE r15 item 5):
    # monotonically_increasing_id is nondeterministic, and the token-stat
    # and bigram branches below recompute this relation independently —
    # a task retry or split-planning change between the two recomputed
    # branches could assign different rids and silently mispair per-row
    # stats. The checkpoint materializes ONE rid assignment both branches
    # read (and saves the second scan).
    rows = docs.withColumn(
        "_rid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=False)
    base = rows.select(
        "doc_id",
        "_rid",
        F.round((n_tok - n_distinct).cast("double") / n_tok, 6).alias(
            "dup_token_ratio"
        ),
        n_tok.alias("_n"),
    )
    pos = rows.select("_rid", F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy("_rid").orderBy("pos")
    top = (
        pos.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("_rid", F.concat_ws(" ", "tok", "nxt").alias("bigram"))
        .groupBy("_rid", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("_rid")
        .agg(F.max("c").alias("_mc"))
    )
    return (
        base.join(top, "_rid", "left")
        .select(
            "doc_id",
            "dup_token_ratio",
            F.when(
                F.col("_n") < 2, F.lit(0.0)
            )
            .otherwise(
                F.round(
                    F.col("_mc").cast("double") / (F.col("_n") - 1), 6
                )
            )
            .alias("top_bigram_ratio"),
        )
    )


def normalized(col: str | Column = "text") -> Column:
    """Normalization for fingerprinting: lowercase, strip non-alphanumerics
    (keeping spaces), collapse runs of spaces."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(F.lower(c), "[^a-z0-9 ]", ""), " +", " "
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of the normalized text — the constant-size
    key used for exact-dup clustering at scale (shuffle on a 16-byte key
    instead of the full document)."""
    return docs.select(
        "doc_id", F.md5(normalized("text")).alias("fingerprint")
    )


def tf_idf_top_terms(
    docs: DataFrame, top_k: int = 5, text_col: str = "text"
) -> DataFrame:
    """Per-document top-``top_k`` terms by smoothed TF-IDF
    (``tf · (ln((N+1)/(df+1)) + 1)``, the sklearn smoothing so unseen-term
    idf stays finite). Output: (doc_id, term, tf, tfidf, rank), ties to the
    lexicographically smaller term. SURVEY.md §7 M4 names MLlib's HashingTF/
    IDF here; this hand-rolled form is preferred because it is exact (no
    feature hashing collisions) and fully oracle-checkable in SQL.

    Scale shape: explode → partial-agg term counts (shuffle bounded by
    distinct (doc, term)); document frequencies join on term — left to
    Catalyst/AQE, since the vocabulary of a 100 TB corpus is NOT
    broadcastable; the single-row corpus count is. tfidf is rounded to 6 dp
    BEFORE ranking in both engines so ulp noise in ``ln`` cannot flip ranks.
    """
    toks = docs.select(
        "doc_id", F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
    )


def token_ngrams(docs: DataFrame, n: int, id_col: str = "doc_id") -> DataFrame:
    """(id, ngram) — every n-token gram of each document (space-joined),
    duplicates preserved. Physical shape: posexplode + n-1 ``lead`` columns
    over ONE per-doc window (single sort, all codegen) — the same
    explode-over-HOF lesson as ``repetition_stats``."""
    # row-local pairing via surrogate rid (round 15 — see lm._bigrams)
    pos = (
        _spread(docs)
        .withColumn("_rid", F.monotonically_increasing_id())
        .select(id_col, "_rid", F.posexplode(tokens("text")).alias("pos", "t0"))
    )
    w = Window.partitionBy("_rid").orderBy("pos")
    cols = [F.col("t0")] + [
        F.lead("t0", k).over(w).alias(f"t{k}") for k in range(1, n)
    ]
    with_leads = pos.select(id_col, *cols)
    return with_leads.filter(F.col(f"t{n - 1}").isNotNull()).select(
        id_col,
        F.concat_ws(" ", *[f"t{k}" for k in range(n)]).alias("ngram"),
    )


def ngram_overlap(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark DECONTAMINATION: per training document, the number of
    distinct n-token grams it shares with the (held-out) eval set — the
    standard pre-training hygiene check (docs overlapping an eval benchmark
    leak test data). Returns (doc_id, n_overlap) for contaminated docs
    only; drop or audit them upstream. Output is exact integer logic →
    fully oracle-checkable.

    Scale shape: real benchmark suites are a few MB of text, so their
    distinct gram set broadcasts (``broadcast_eval=True``, default) and
    the corpus grams stream through one map-side equi-join plus one
    partial-aggregated distinct count per doc — the corpus is never
    self-joined. If the "eval" side is itself corpus-scale (e.g. cross-
    corpus overlap audits), pass ``broadcast_eval=False`` to let the
    optimizer pick a shuffle join instead of forcing a driver collect.
    """
    corpus_grams = token_ngrams(docs, n)
    eval_grams = (
        token_ngrams(eval_docs, n).select("ngram").distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    return (
        corpus_grams.join(eval_grams, "ngram")
        .groupBy("doc_id")
        .agg(F.count_distinct("ngram").alias("n_overlap"))
    )


# PII patterns kept to syntax RE2 (DuckDB) and java.util.regex (Spark)
# interpret identically: character classes, bounded repetition, \b word
# boundaries — no backreferences or lookaround. Order matters: emails are
# redacted before IPs/phones so digit runs inside a redacted token can't
# be re-matched.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction — the compliance gate of a training-data
    pipeline: count and mask emails, IPv4 addresses, and phone-shaped
    digit runs. Output: (doc_id, n_email, n_ipv4, n_phone, redacted).

    Counts are taken per pattern on the ORIGINAL text (audit metric);
    redaction applies the patterns sequentially in ``PII_PATTERNS`` order.
    Everything is codegen ``regexp_count``/``regexp_replace`` — per-row,
    no shuffle, scan-speed at 100 TB; at that scale this runs fused into
    the same stage as the cleaning gate that follows it.
    """
    out = docs.select(
        "doc_id",
        F.col(text_col).alias("_t"),
        *[
            F.regexp_count(F.col(text_col), F.lit(pat))
            .cast("long")
            .alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ],
    )
    red = F.col("_t")
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return out.select(
        "doc_id",
        *[f"n_{name}" for name, _, _ in PII_PATTERNS],
        red.alias("redacted"),
    )


def pack_documents(
    docs: DataFrame,
    target_tokens: int = 2048,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window PACKING plan: concatenate each group's documents in
    id order and cut the token stream into ``target_tokens`` windows — the
    GPT-style sequence-packing step that turns a deduped corpus into
    fixed-length training rows. Output: (doc_id, <group_col>, n_tokens,
    pack_id, pack_offset) where ``pack_id`` is the window the document
    STARTS in and ``pack_offset`` its token offset within that window.
    Exact integer logic (prefix sums) → fully oracle-checkable.

    Scale shape: one window prefix-sum per group, ordered by id — a single
    sort within each group partition. Groups are the parallelism unit: a
    100 TB corpus packs per domain shard (choose ``group_col`` with
    bounded group size, e.g. a (source, day) composite), never as one
    global ordered stream.
    """
    n_tok = F.size(tokens("text")).cast("long")
    # n_tokens joins the sort key (round 15): multiple NULL ids within a
    # group are otherwise order-ambiguous and their prefix sums engine-
    # arbitrary; equal-length ties that remain are interchangeable (the
    # output multiset is identical either way)
    w = (
        Window.partitionBy(group_col)
        .orderBy(
            F.col(id_col).asc(),
            F.size(tokens("text")).cast("long").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tok).over(w)
    return docs.select(
        id_col,
        group_col,
        n_tok.alias("n_tokens"),
        F.floor((cum - n_tok) / target_tokens).alias("pack_id"),
        ((cum - n_tok) % target_tokens).alias("pack_offset"),
    )


def chunk_documents(docs: DataFrame, chunk_chars: int = 1024) -> DataFrame:
    """Split each document into fixed-size character chunks (the
    context-window chunking step for embedding/indexing pipelines).
    Output: (doc_id, chunk_idx, chunk_text, n_chunk_chars); empty documents
    produce one empty chunk (chunk_idx 0) so no doc silently disappears.

    Per-row codegen (sequence + explode + substring): no shuffle, and the
    explode fan-out is bounded by document length / chunk_chars.
    """
    last_idx = F.greatest(
        F.floor((F.length("text") - 1) / chunk_chars), F.lit(0)
    ).cast("long")
    idx = F.explode(F.sequence(F.lit(0).cast("long"), last_idx)).alias(
        "chunk_idx"
    )
    chunked = docs.select("doc_id", F.col("text"), idx)
    chunk = F.substring(
        F.col("text"), (F.col("chunk_idx") * chunk_chars + 1).cast("int"), chunk_chars
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("n_chunk_chars"),
    )


def length_histogram(
    docs: DataFrame, bucket_chars: int = 100, max_buckets: int = 20
) -> DataFrame:
    """Sequence-length distribution — the corpus-shape diagnostic every
    packing/truncation decision starts from. Buckets n_chars into
    ``bucket_chars``-wide bins (last bin open-ended), counting docs and
    total whitespace tokens per bin. Output: (bucket, lo_chars, n_docs,
    total_tokens). Pure partial aggregation: one tiny shuffle of
    ``max_buckets`` rows.
    """
    b = F.least(
        F.floor(F.col("n_chars") / bucket_chars), F.lit(max_buckets - 1)
    ).cast("long")
    return (
        docs.select(
            b.alias("bucket"),
            F.size(tokens("text")).cast("long").alias("_nt"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
        )
        .select(
            "bucket",
            (F.col("bucket") * bucket_chars).alias("lo_chars"),
            "n_docs",
            "total_tokens",
        )
    )


def sample_mixture(
    docs: DataFrame,
    rates: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic DOMAIN-MIXTURE subsampling — the data-mixing step of a
    pretraining pipeline: keep each row of domain ``d`` with probability
    ``rates[d]`` (domains absent from ``rates`` are dropped), decided by a
    salted portable hash of the row id, NOT randomness. Properties a 100 TB
    mixing job needs: reproducible across runs/engines/partitionings,
    per-row (no shuffle, no sampleBy scan of the key distribution), and
    re-runnable incrementally (a doc's verdict never changes). Change
    ``salt`` to draw an independent mixture.

    The keep decision is ``portable_hash32(salt || id) % 1e6 <
    round(rate * 1e6)`` — exact integer logic, value-checkable in SQL.
    """
    from .dedup import portable_hash32

    thresholds = {k: int(round(r * 1_000_000)) for k, r in rates.items()}
    thr: Column = F.lit(None).cast("long")
    for k, t in sorted(thresholds.items()):
        thr = F.when(F.col(key_col) == k, F.lit(t)).otherwise(thr)
    u = F.pmod(
        portable_hash32(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        ),
        F.lit(1_000_000),
    )
    return docs.filter(u < thr)


def resample_by_score(
    scored: DataFrame,
    score_col: str,
    edges: list[float],
    rates: list[float],
    id_col: str = "doc_id",
    salt: str = "resample",
) -> DataFrame:
    """Deterministic QUALITY-WEIGHTED resampling — the curation step that
    turns a model score into a mixture (the FineWeb/DCLM shape: keep
    high-quality buckets at full rate, downsample the rest). ``edges``
    split the score line into ``len(edges)+1`` buckets (bucket i =
    score < edges[i], last bucket = the rest); each bucket keeps rows at
    ``rates[i]`` via the same salted-portable-hash acceptance as
    ``sample_mixture`` — reproducible across runs/engines/partitionings,
    no shuffle, incrementally re-runnable. Output: the kept rows plus
    their ``bucket``.

    Scale note: fixed ``edges`` keep the decision per-row. Deriving edges
    from global quantiles (approx_percentile over the score) is a separate
    tiny aggregation — do it once, then pass the constants here, so the
    100 TB scoring pass stays embarrassingly parallel.
    """
    from .dedup import portable_hash32

    if len(rates) != len(edges) + 1:
        raise ValueError("need len(rates) == len(edges) + 1")
    bucket: Column = F.lit(len(edges)).cast("long")
    for i in range(len(edges) - 1, -1, -1):
        bucket = F.when(F.col(score_col) < edges[i], F.lit(i)).otherwise(
            bucket
        )
    thr: Column = F.lit(None).cast("long")
    for i, r in enumerate(rates):
        thr = F.when(bucket == i, F.lit(int(round(r * 1_000_000)))).otherwise(
            thr
        )
    u = F.pmod(
        portable_hash32(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        ),
        F.lit(1_000_000),
    )
    return scored.withColumn("bucket", bucket).filter(u < thr)


def stratified_split(
    docs: DataFrame,
    percents: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic EXACT-proportion stratified split — the train/val/test
    carve-up of a curated corpus, holding the stratum mix constant across
    splits (per-language here, the standard guard against a val set whose
    language balance drifts from train). Unlike ``sample_mixture`` (per-row
    Bernoulli, proportions only in expectation) this is QUOTA-exact: within
    each stratum rows are ranked by a portable hash of their id (stable
    pseudo-random order, reproducible across runs/engines/partitionings)
    and the r-th of n rows lands in the first split whose ROUNDED
    cumulative boundary covers it: ``r <= (c * n + 50) div 100`` for
    cumulative percent c — pure integer logic, so a stratum of 1000 docs
    at 80/10/10 yields exactly 800/100/100 and the DuckDB oracle agrees
    bit-for-bit. Round-half-up boundaries make SMALL strata favor the
    large split (a singleton stratum goes to train, not test — the naive
    ``r*100 <= c*n`` rule dumps every stratum's remainder into the LAST
    split, which skewed a 44-doc corpus to 16% test).

    ``percents`` maps split name → integer percent, in the order given
    (must sum to 100). Output: input rows + a ``split`` column.

    Scale shape: one window sort per stratum (rank by hash) — the same
    per-stratum-bounded sort every quota operator needs; no driver-side
    state, no collect. Skewed strata sort within their partition group;
    at 100 TB you'd range-partition within stratum first, which AQE's
    skew handling approximates.
    """
    from .dedup import portable_hash32

    if sum(percents.values()) != 100:
        raise ValueError("percents must sum to 100")
    w = Window.partitionBy(stratum_col).orderBy(
        portable_hash32(F.col(id_col).cast("string")), F.col(id_col)
    )
    n = Window.partitionBy(stratum_col)
    r = F.row_number().over(w)
    n_rows = F.count(F.lit(1)).over(n)
    # build the CASE from the first split outward: the rounded boundary
    # (c*n + 50) div 100 is the last rank belonging to cumulative quota c
    split = None
    cum = 0
    for name, pct in percents.items():
        cum += pct
        cond = r <= F.floor((n_rows * cum + 50) / 100)
        split = F.when(cond, F.lit(name)) if split is None else split.when(
            cond, F.lit(name)
        )
    return docs.withColumn("split", split)


def sliding_chunks(
    docs: DataFrame, chunk_chars: int = 1024, stride_chars: int = 512
) -> DataFrame:
    """Overlapping sliding-window chunking — the RAG-indexing variant of
    ``chunk_documents``: windows of ``chunk_chars`` starting every
    ``stride_chars`` (stride < size ⇒ overlap, so no retrieval-relevant
    span is ever split across a boundary without also appearing whole in
    a neighbor). Output: (doc_id, chunk_idx, chunk_text, n_chunk_chars);
    empty documents keep one empty chunk. The last window starts at the
    last stride position that still contains unseen text.

    Same per-row codegen shape as the fixed chunker (sequence + explode +
    substring): no shuffle; fan-out bounded by doc length / stride.
    """
    if stride_chars <= 0 or chunk_chars <= 0:
        raise ValueError("chunk_chars and stride_chars must be positive")
    # last start = the last stride position with UNSEEN text:
    # ceil((len - chunk)/stride), floored at 0 — the naive
    # floor((len-1)/stride) emits pure-suffix windows already fully
    # covered by their predecessor whenever chunk > stride (a duplicate
    # chunk for roughly every document at the defaults)
    last_idx = F.greatest(
        F.floor(
            (F.length("text") - chunk_chars + stride_chars - 1)
            / stride_chars
        ),
        F.lit(0),
    ).cast("long")
    idx = F.explode(F.sequence(F.lit(0).cast("long"), last_idx)).alias(
        "chunk_idx"
    )
    chunked = docs.select("doc_id", F.col("text"), idx)
    chunk = F.substring(
        F.col("text"),
        (F.col("chunk_idx") * stride_chars + 1).cast("int"),
        chunk_chars,
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("n_chunk_chars"),
    )


def domain_capped_corpus(
    docs: DataFrame,
    cap: int,
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "domcap",
) -> DataFrame:
    """Per-domain document cap — the anti-hoarding step of corpus curation
    (no single domain may contribute more than ``cap`` docs): within each
    domain, rows are ranked by the salted portable hash of their id (a
    stable pseudo-random order — reproducible across runs, engines, and
    partitionings, and a doc's verdict never changes as OTHER docs of the
    same domain come and go only if the population is fixed; the ordering
    is what makes the kept subset unbiased rather than
    first-N-by-ingest-order) and only the ``cap`` lowest survive.

    One per-domain window sort, no other shuffle; quota-EXACT (unlike the
    Bernoulli mixers, which hold rates only in expectation)."""
    from .dedup import portable_hash32

    if cap < 0:
        raise ValueError("cap must be >= 0")
    w = Window.partitionBy(key_col).orderBy(
        portable_hash32(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        ).asc(),
        F.col(id_col).asc(),
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def temperature_mixture(
    docs: DataFrame,
    target_total: int,
    alpha: float = 0.5,
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based source mixing (the multilingual-pretraining
    recipe: sample sources ∝ size^alpha, so small domains are upweighted
    relative to their natural share): keep each doc of source s with
    probability ``min(1, target_total · w_s / (Σw · n_s))`` where
    ``w_s = n_s^alpha`` — decided by the salted portable hash, like
    ``sample_mixture``, so the draw is reproducible everywhere.

    EXACT cross-engine arithmetic: alpha is restricted to {0.0, 0.5, 1.0}
    (w = 1, floor(sqrt(n)) — IEEE sqrt is correctly rounded so the floor
    is engine-identical — or n), and the acceptance threshold is pure
    BIGINT math: ``hash % 1e6 < (1e6·T·w_s) DIV (Σw·n_s)``. The per-source
    weights are one tiny count aggregation, broadcast back; the corpus
    pass stays per-row."""
    from .dedup import portable_hash32

    if alpha not in (0.0, 0.5, 1.0):
        raise ValueError(
            "alpha restricted to {0.0, 0.5, 1.0} for exact integer "
            "thresholds (see docstring)"
        )
    if target_total < 0:
        raise ValueError("target_total must be >= 0")
    sizes = docs.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    if alpha == 0.0:
        wcol = F.lit(1).cast("long")
    elif alpha == 1.0:
        wcol = F.col("_n")
    else:
        wcol = F.floor(F.sqrt(F.col("_n"))).cast("long")
    weights = sizes.select(key_col, "_n", wcol.alias("_w"))
    total_w = weights.agg(F.sum("_w").alias("_tw"))
    thr = (
        weights.crossJoin(F.broadcast(total_w))
        .select(
            key_col,
            F.least(
                F.lit(1_000_000).cast("long"),
                F.expr(f"(CAST(1000000 AS BIGINT) * {target_total} * _w)"
                       " DIV (_tw * _n)"),
            ).alias("_thr"),
        )
    )
    u = F.pmod(
        portable_hash32(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        ),
        F.lit(1_000_000),
    )
    return (
        docs.join(F.broadcast(thr), key_col)
        .filter(u < F.col("_thr"))
        .drop("_thr")
    )


def readability_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch-reading-ease-style readability per document — the classic
    text-quality gate feature (very low or very high scores flag
    boilerplate and noise). Syllables are approximated by maximal vowel
    runs per word (the standard heuristic when no dictionary ships with
    the engine), with the Flesch ≥1-per-word floor; sentences split on
    [.!?] with a ≥1 floor (corpora without sentence punctuation score as
    one sentence).

    Cross-engine exactness: n_words / n_syllables / n_sentences are exact
    integers (explode → partial-agg counts), and the score
    ``206.835 − 1.015·(w/s) − 84.6·(syl/w)`` is a FIXED expression over
    them — two IEEE divisions, identical in DuckDB; rounded to 4 dp.

    Per-document contract (round-13 review): EVERY input document gets a
    row — a wordless document (empty/whitespace text) scores n_words = 0,
    n_syllables = 0, n_sentences = 1 (the floor) and flesch_score = NULL
    (the formula divides by n_words; "unreadable" is a NULL score, not a
    missing row a downstream gate would treat as unscored).

    Scale shape: one scan → token explode → per-doc partial agg (the
    token_counts plan family); the sentence count rides the explode as a
    carried column (computed once per doc row, F.first on the agg)."""
    from ._util import spread_small_scan as _spread

    sent = F.greatest(
        F.size(
            F.filter(
                F.split(F.col(text_col), r"[.!?]"),
                lambda s: F.trim(s) != "",
            )
        ),
        F.lit(1),
    )
    exploded = _spread(docs).select(
        "doc_id",
        sent.alias("n_sentences"),
        F.explode(tokens(text_col)).alias("word"),
    ).filter(F.col("word") != "")
    syl = F.greatest(
        F.size(
            F.filter(
                F.split(F.lower(F.col("word")), "[^aeiou]+"),
                lambda p: p != "",
            )
        ),
        F.lit(1),
    )
    agg = exploded.groupBy("doc_id").agg(
        F.first("n_sentences").alias("n_sentences"),
        F.count(F.lit(1)).alias("n_words"),
        F.sum(syl).alias("n_syllables"),
    )
    # all-docs re-join (the bigram_lm_scores convention): wordless docs
    # still appear, with zero counts and a NULL score
    all_docs = docs.select("doc_id", sent.alias("_ns"))
    agg = all_docs.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_sentences", F.col("_ns")).alias("n_sentences"),
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("n_syllables", F.lit(0)).alias("n_syllables"),
    )
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    y = F.col("n_syllables").cast("double")
    return agg.select(
        "doc_id",
        "n_words",
        F.col("n_syllables").cast("long").alias("n_syllables"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.lit(206.835)
                - F.lit(1.015) * (w / s)
                - F.lit(84.6) * (y / w),
            ),
            4,
        ).alias("flesch_score"),
    )
